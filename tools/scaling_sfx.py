"""Large-SF scaling spot-sweep (VERDICT r12 item 8).

At sf0.1 the bench is job-overhead-bound: every 32-vs-8-core ratio is
~1 and five queries run FASTER on 8 cores, so the §2 parallelism
claims are unmeasurable.  This probe synthesizes a deterministic 10x
upscale of sf0.1 under /tmp (``sfx1``: fact tables replicated with
shifted keys; document text and embeddings perturbed per replica so
dedup/ANN selectivity scales instead of exploding; /root/testdata
itself is never touched) and times a representative batch set solo at
the given core count.  Run once per core count:

    SPARK_GRAFT_CPUS=32 python tools/scaling_sfx.py
    SPARK_GRAFT_CPUS=8  python tools/scaling_sfx.py

Timings print as one parseable line per query; the committed table
lives in SCALING.md.  This is measurement tooling only — no query code
reads sfx1 outside this probe, and nothing is cached across runs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_sfx1"
REPLICAS = 10

# linear-or-better batch representatives + the paths VERDICT named
# (blocked ANN, suffix, C4) — no streaming (replay floor is fixed) and
# no exact all-pairs grid (honest quadratic, times out the probe)
QUERIES = [
    "q1_pricing_summary",
    "q9_product_type_profit",
    "q18_large_volume_customer",
    "n1_exact_dedup",
    "n4_lang_id",
    "n2_c4_span_dedup",
    "n4_gopher_rules",
    "a19_heavy_hitters_mg",
    "n2_suffix_array_spans",
    "n3_knn_graph_blocked",
    "n6_curriculum_order",
    "x8_kmeans_embeddings",
]


def _gen() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(DST, exist_ok=True)
    marker = os.path.join(DST, "_COMPLETE")
    if os.path.exists(marker):
        return

    def read(name):
        return pq.read_table(os.path.join(SRC, f"{name}.parquet"))

    def write(name, t):
        pq.write_table(t, os.path.join(DST, f"{name}.parquet"))

    # dimensions: unchanged
    for name in ("customer", "part", "supplier", "nation", "region"):
        write(name, read(name))

    def shifted(t, col, stride, i):
        arr = pc.add(t.column(col), stride * i)
        return t.set_column(t.schema.get_field_index(col), col, arr)

    def repl(name, key_cols, mutate=None):
        # one part FILE per replica (a directory named <name>.parquet):
        # a single fat file caps scan parallelism at one input split
        # whatever the core count — exactly the serial artifact this
        # probe exists to rule out
        t = read(name)
        strides = {c: int(pc.max(t.column(c)).as_py()) + 1 for c in key_cols}
        d = os.path.join(DST, f"{name}.parquet")
        os.makedirs(d, exist_ok=True)
        for i in range(REPLICAS):
            ti = t
            for c in key_cols:
                ti = shifted(ti, c, strides[c], i)
            if mutate is not None:
                ti = mutate(ti, i)
            pq.write_table(ti, os.path.join(d, f"part-{i:03d}.parquet"))

    repl("lineitem", ["l_orderkey"])
    repl("orders", ["o_orderkey"])
    repl("events", ["event_id"])

    def mut_docs(t, i):
        if i == 0:
            return t
        suffix = f" r{i}"
        text = pc.binary_join_element_wise(
            t.column("text").cast(pa.string()), suffix, ""
        )
        t = t.set_column(t.schema.get_field_index("text"), "text", text)
        nch = pc.add(t.column("n_chars"), len(suffix))
        return t.set_column(
            t.schema.get_field_index("n_chars"), "n_chars",
            nch.cast(t.schema.field("n_chars").type),
        )

    repl("documents", ["doc_id"], mutate=mut_docs)

    def mut_emb(t, i):
        if i == 0:
            return t
        emb = t.column("embedding").to_pylist()
        arr = np.array(emb, dtype=np.float64)
        # deterministic per-replica rotation of components: keeps the
        # distribution, kills cross-replica exact/near duplicates
        arr = np.roll(arr, i, axis=1) + i * 1e-4
        return t.set_column(
            t.schema.get_field_index("embedding"), "embedding",
            pa.array(list(arr), type=t.schema.field("embedding").type),
        )

    repl("embeddings", ["vec_id"], mutate=mut_emb)
    with open(marker, "w") as f:
        f.write("ok")


def main() -> None:
    _gen()
    from flink_1_19_source_spark.registry import queries
    from flink_1_19_source_spark.session import get_spark

    qs = queries()
    spark = get_spark(app_name="sfx1-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count()))
    spark.read.parquet(os.path.join(DST, "lineitem.parquet")).count()
    for name in QUERIES:
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            n = len(qs[name](spark, DST).collect())
            samples.append(round(time.perf_counter() - t0, 2))
            spark.catalog.clearCache()
            for rdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                rdd.unpersist(False)
        print(
            f"SFX1 cpus={cpus} {name}: best={min(samples)}"
            f" samples={samples} rows={n}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
