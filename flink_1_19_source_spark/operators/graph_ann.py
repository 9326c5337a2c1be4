"""HNSW-family graph ANN (N3) — layered proximity graph + beam search.

The industry-default ANN index family (Malkov & Yashunin 2016,
"Efficient and robust approximate nearest neighbor search using
Hierarchical Navigable Small World graphs") expressed for a relational
engine:

- **Layer assignment** is geometric and deterministic: an md5 hash of
  the vector id picks level 2 with p=1/16, level 1 with p=3/16, else
  level 0 (HNSW's exponentially-decaying level distribution, hash-gated
  like every sampling decision in this engine so the oracle replays it).
- **Per-layer graph**: each node keeps its top-M neighbors by
  similarity within the layer's node set — built as an exact
  DISTRIBUTED block-pair product: both sides are hash-packed into
  ~BLOCK_ROWS sub-matrices, every (src block, dst block) pair computes
  an int64 block product in one Arrow task and keeps per-src top-M
  within the pair, and one global per-src rank window reduces the
  B-blocks-of-top-M candidates to the exact global top-M.  Nothing is
  ever collected to the driver and no single task sees more than two
  blocks, so the build scales horizontally: work is B_src x B_dst
  independent tasks (the unavoidable N^2/BLOCK^2 of an exact kNN
  graph), shuffle volume is N x B_dst x M candidate rows.  At 100 TB
  the same kernel runs with candidate blocking (LSH/IVF bucket ids
  replacing the all-pairs block grid, exactly the ivf_probe machinery)
  to go sub-quadratic; the all-pairs grid here is the exact-build
  correctness reference for that path.
- **Search**: greedy descent through the upper layers (2 steps per
  layer, beam 1), then a fixed-round ef-beam expansion over the
  layer-0 graph — each round one frontier-expand join + rank, the X8
  bounded-iteration pattern.

Numeric contract (what makes the DuckDB oracle exact): components are
quantized to integers (round(x * 2^15)); every dot product and norm is
exact int64 arithmetic; similarity = dot / sqrt(na * nb) evaluated as
IEEE double ops on exactly-representable integers — one
correctly-rounded op chain with NO accumulation-order dependence, so
numpy, the JVM, and DuckDB produce bit-identical doubles.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SCALE = 32768  # 2^15 component quantization
DIM = 64

M_EDGES = 12     # neighbors kept per node, every layer
EF_BEAM = 16     # beam width at layer 0
K_ROUNDS = 2     # layer-0 expansion rounds
UPPER_STEPS = 2  # greedy steps per upper layer

#: Target rows per packed sub-matrix block in the distributed build —
#: block payload ~= BLOCK_ROWS x DIM x 8 bytes must sit comfortably in
#: one shuffle row; per-pair task overhead argues for bigger blocks
#: (measured at sf0.1: 512 is 3x faster than 256, flat beyond).  Any
#: corpus above MIN_SPLIT rows is forced into >= 2 blocks so the
#: distributed selection (block-local top-m + global rank window) is
#: the plan the oracle certifies at EVERY test scale, not just at 100 TB.
BLOCK_ROWS = 512
MIN_SPLIT = 64


def _qv_expr(vec_col: str):
    """The scale-2^15 component quantization expression (shared by every
    quantizing entry point so the numeric contract cannot drift)."""
    return F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * SCALE).cast("long"),
    )


def _nq_expr():
    """Exact integer self-dot of the quantized ``qv`` column."""
    return F.aggregate(
        F.zip_with("qv", "qv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantized(vectors: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(vec_id, qv array<long>, nq long): scale-2^15 quantized
    components plus the exact integer self-dot (the norm term)."""
    q = vectors.select(
        F.col(id_col).alias("vec_id"), _qv_expr(vec_col).alias("qv")
    )
    return q.withColumn("nq", _nq_expr())


def with_levels(q: DataFrame) -> DataFrame:
    """Geometric HNSW level from the id hash: p(>=1)=1/4, p(>=2)=1/16."""
    h = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 31, 2), 16, 10
    ).cast("int")
    return q.withColumn(
        "lvl",
        F.when(h % 16 == 0, 2).when(h % 4 == 0, 1).otherwise(0),
    )


def _sim_expr(dot, na, nb):
    return dot.cast("double") / F.sqrt(
        na.cast("double") * nb.cast("double")
    )


def layer_edges(layer: DataFrame, m: int = M_EDGES) -> DataFrame:
    """Exact top-m directed neighbor edges within one layer, by the
    distributed block-pair build (see cross_topm).  Returns
    (src, dst, sim) ordered per src by (sim desc, dst asc)."""
    return cross_topm(layer, layer, m)


def _n_blocks(df: DataFrame, n: int | None = None) -> int:
    """Block count for the packed build: one count() aggregate (a
    1-row job, never row data to the driver) — or, when the caller
    already KNOWS the row count (the streaming folds track cumulative
    index size arithmetically), the count job is skipped.  Returns 0
    for an empty frame so callers can early-out; >= 2 above MIN_SPLIT
    rows (see BLOCK_ROWS note)."""
    if n is None:
        n = df.count()
    nb = -(-n // BLOCK_ROWS)
    return max(nb, 2) if n > MIN_SPLIT else nb


def _packed(
    df: DataFrame, n_blocks: int, with_lvl: bool, extra: tuple = ()
) -> DataFrame:
    """Hash-pack quantized rows into (blk, pack array<struct<...>>) —
    each pack is one sub-matrix of <= ~BLOCK_ROWS vectors, small enough
    for a single Arrow task to hold two of them."""
    fields = (
        [F.col("vec_id"), F.col("qv"), F.col("nq")]
        + ([F.col("lvl")] if with_lvl else [])
        + [F.col(c) for c in extra]
    )
    return (
        df.withColumn(
            "blk",
            F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_blocks)).cast("int"),
        )
        .groupBy("blk")
        .agg(F.collect_list(F.struct(*fields)).alias("pack"))
    )


def _unpack(pack, with_lvl: bool):
    import numpy as np

    ids = np.fromiter(
        (e["vec_id"] for e in pack), dtype=np.int64, count=len(pack)
    )
    mat = np.array([e["qv"] for e in pack], dtype=np.int64)
    nrm = np.fromiter(
        (e["nq"] for e in pack), dtype=np.int64, count=len(pack)
    )
    if not with_lvl:
        return ids, mat, nrm
    lvl = np.fromiter(
        (e["lvl"] for e in pack), dtype=np.int64, count=len(pack)
    )
    return ids, mat, nrm, lvl


def _block_sims(a, b):
    """Bit-exact block similarity matrix: int64 block product, then the
    one correctly-rounded double op chain of the numeric contract."""
    import numpy as np

    a_ids, a_mat, a_nrm = a[0], a[1], a[2]
    b_ids, b_mat, b_nrm = b[0], b[1], b[2]
    dots = a_mat @ b_mat.T  # exact int64
    sims = dots.astype(np.float64) / np.sqrt(
        a_nrm[:, None].astype(np.float64)
        * b_nrm[None, :].astype(np.float64)
    )
    return a_ids, b_ids, sims


def _pair_topm(a_ids, b_ids, sims, m, b_mask=None):
    """Per-src top-m within ONE block pair — self-pairs excluded by id,
    order (sim desc, dst asc), optional extra b-side boolean mask.  The
    single selection kernel shared by every blocked build (exact grid,
    layered grid, IVF-blocked), so a tie-break or masking change cannot
    drift between them."""
    import numpy as np

    out_src, out_dst, out_sim = [], [], []
    for i in range(len(a_ids)):
        mask = b_ids != a_ids[i]
        if b_mask is not None:
            mask &= b_mask
        cand_ids = b_ids[mask]
        cand_sim = sims[i][mask]
        order = np.lexsort((cand_ids, -cand_sim))[:m]
        out_src.extend([a_ids[i]] * len(order))
        out_dst.extend(cand_ids[order])
        out_sim.extend(cand_sim[order])
    return out_src, out_dst, out_sim


def cross_topm(src_df: DataFrame, dst_df: DataFrame,
               m: int = M_EDGES,
               n_src: int | None = None,
               n_dst: int | None = None) -> DataFrame:
    """Exact top-m (src, dst, sim) edges from each src row to the dst
    set, self-pairs excluded by id — fully distributed: both sides are
    hash-packed into sub-matrix blocks, every (src blk, dst blk) pair
    computes its int64 block product in one task and keeps per-src
    top-m WITHIN the pair, and one rank window takes the exact global
    top-m (a true global top-m neighbor always survives its own
    block's top-m: fewer than m closer vectors exist globally, so
    fewer exist in any dst block).  No driver collect anywhere —
    pinned by tests/test_r11_ops.py.  Shared by the one-shot layer
    build and the streaming incremental build (src=new/dst=all and
    src=old/dst=new passes)."""
    import numpy as np

    spark = src_df.sparkSession
    nb = _n_blocks(dst_df, n_dst)
    if nb == 0:
        return spark.createDataFrame(
            [], "src long, dst long, sim double"
        )
    na = nb if src_df is dst_df else max(1, _n_blocks(src_df, n_src))
    pairs = (
        _packed(src_df, na, False)
        .select(F.col("pack").alias("apack"))
        .crossJoin(
            _packed(dst_df, nb, False).select(F.col("pack").alias("bpack"))
        )
    )

    def gen(batches):
        for pdf in batches:
            for apack, bpack in zip(pdf["apack"], pdf["bpack"]):
                a = _unpack(apack, False)
                b = _unpack(bpack, False)
                a_ids, b_ids, sims = _block_sims(a, b)
                out_src, out_dst, out_sim = _pair_topm(
                    a_ids, b_ids, sims, m
                )
                yield pd.DataFrame(
                    {"src": out_src, "dst": out_dst, "sim": out_sim}
                )

    cand = pairs.mapInPandas(gen, "src long, dst long, sim double")
    w = Window.partitionBy("src").orderBy(F.col("sim").desc(), F.col("dst"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= m)
        .select("src", "dst", "sim")
    )


def cross_topm_layered(src_df: DataFrame, dst_df: DataFrame,
                       m: int = M_EDGES,
                       n_src: int | None = None,
                       n_dst: int | None = None) -> DataFrame:
    """Per-LAYER exact top-m edges in ONE pass: for every layer lv in
    (2, 1, 0), each src row with lvl >= lv keeps its top-m among dst
    rows with lvl >= lv.  Same distributed block-pair shape as
    cross_topm (no driver collect); the per-pair kernel emits per-src
    per-layer block top-m and one (lvl, src) rank window finishes the
    exact global selection.  Returns (lvl, src, dst, sim)."""
    import numpy as np

    spark = src_df.sparkSession
    nb = _n_blocks(dst_df, n_dst)
    if nb == 0:
        return spark.createDataFrame(
            [], "lvl int, src long, dst long, sim double"
        )
    na = nb if src_df is dst_df else max(1, _n_blocks(src_df, n_src))
    pairs = (
        _packed(src_df, na, True)
        .select(F.col("pack").alias("apack"))
        .crossJoin(
            _packed(dst_df, nb, True).select(F.col("pack").alias("bpack"))
        )
    )

    def gen(batches):
        for pdf in batches:
            for apack, bpack in zip(pdf["apack"], pdf["bpack"]):
                a_ids, a_mat, a_nrm, a_lvl = _unpack(apack, True)
                b_ids, b_mat, b_nrm, b_lvl = _unpack(bpack, True)
                _, _, sims = _block_sims(
                    (a_ids, a_mat, a_nrm), (b_ids, b_mat, b_nrm)
                )
                out_lvl, out_src, out_dst, out_sim = [], [], [], []
                for lv in (2, 1, 0):
                    sel = a_lvl >= lv
                    src, dst, sim = _pair_topm(
                        a_ids[sel], b_ids, sims[sel], m,
                        b_mask=b_lvl >= lv,
                    )
                    out_lvl.extend([lv] * len(src))
                    out_src.extend(src)
                    out_dst.extend(dst)
                    out_sim.extend(sim)
                yield pd.DataFrame(
                    {"lvl": out_lvl, "src": out_src, "dst": out_dst,
                     "sim": out_sim}
                )

    cand = pairs.mapInPandas(
        gen, "lvl int, src long, dst long, sim double"
    )
    w = Window.partitionBy("lvl", "src").orderBy(
        F.col("sim").desc(), F.col("dst")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= m)
        .select("lvl", "src", "dst", "sim")
    )


def cross_topm_layered_bidir(
    new_df: DataFrame,
    all_df: DataFrame,
    m: int = M_EDGES,
    n_new: int | None = None,
    n_all: int | None = None,
) -> DataFrame:
    """BOTH incremental-build directions of the streaming ingest fold in
    ONE block-pair pass: per-NEW-src per-layer top-m over the full node
    set (the insert's own neighbor search) AND per-OLD-src per-layer
    top-m over the new set (existing nodes adopting better neighbors).
    ``all_df`` must carry an int ``is_new`` column (1 = row is in
    ``new_df``); new/old srcs are disjoint, so one global (lvl, src)
    rank window finishes BOTH exact selections at once.

    Why it is identical to the former two cross_topm_layered calls: the
    (new blk x all blk) grid covers every (new, old) pair exactly once
    (the b-blocks partition the full set, the a-blocks partition new),
    and the old->new sims are the TRANSPOSE of the new->old half of the
    sims matrix each pair task already computed — so the second
    direction adds zero block products, no second packing of the
    accumulated index (formerly an index-sized groupBy per batch), no
    second crossJoin job, and roughly half the per-batch plan.  Per-pair
    top-m stays a safe reduction in both directions (fewer than m
    closer vectors exist globally, so fewer exist in any block), and
    the shared window splits by construction into the two per-direction
    windows the old code ran.  Returns (lvl, src, dst, sim)."""
    import numpy as np

    spark = new_df.sparkSession
    nb = _n_blocks(all_df, n_all)
    if nb == 0:
        return spark.createDataFrame(
            [], "lvl int, src long, dst long, sim double"
        )
    na = max(1, _n_blocks(new_df, n_new))
    pairs = (
        _packed(new_df, na, True)
        .select(F.col("pack").alias("apack"))
        .crossJoin(
            _packed(all_df, nb, True, extra=("is_new",))
            .select(F.col("pack").alias("bpack"))
        )
    )

    def gen(batches):
        for pdf in batches:
            for apack, bpack in zip(pdf["apack"], pdf["bpack"]):
                a_ids, a_mat, a_nrm, a_lvl = _unpack(apack, True)
                b_ids = np.fromiter(
                    (e["vec_id"] for e in bpack), dtype=np.int64,
                    count=len(bpack),
                )
                b_mat = np.array([e["qv"] for e in bpack], dtype=np.int64)
                b_nrm = np.fromiter(
                    (e["nq"] for e in bpack), dtype=np.int64,
                    count=len(bpack),
                )
                b_lvl = np.fromiter(
                    (e["lvl"] for e in bpack), dtype=np.int64,
                    count=len(bpack),
                )
                b_old = np.fromiter(
                    (e["is_new"] == 0 for e in bpack), dtype=bool,
                    count=len(bpack),
                )
                _, _, sims = _block_sims(
                    (a_ids, a_mat, a_nrm), (b_ids, b_mat, b_nrm)
                )
                sims_t = sims.T
                out_lvl, out_src, out_dst, out_sim = [], [], [], []
                for lv in (2, 1, 0):
                    a_in = a_lvl >= lv
                    b_in = b_lvl >= lv
                    # direction 1: new src -> full set
                    src, dst, sim = _pair_topm(
                        a_ids[a_in], b_ids, sims[a_in], m, b_mask=b_in
                    )
                    out_lvl.extend([lv] * len(src))
                    out_src.extend(src)
                    out_dst.extend(dst)
                    out_sim.extend(sim)
                    # direction 2 (transposed): old src -> new set
                    sel_b = b_in & b_old
                    src, dst, sim = _pair_topm(
                        b_ids[sel_b], a_ids, sims_t[sel_b], m,
                        b_mask=a_in,
                    )
                    out_lvl.extend([lv] * len(src))
                    out_src.extend(src)
                    out_dst.extend(dst)
                    out_sim.extend(sim)
                yield pd.DataFrame(
                    {"lvl": out_lvl, "src": out_src, "dst": out_dst,
                     "sim": out_sim}
                )

    cand = pairs.mapInPandas(
        gen, "lvl int, src long, dst long, sim double"
    )
    w = Window.partitionBy("lvl", "src").orderBy(
        F.col("sim").desc(), F.col("dst")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= m)
        .select("lvl", "src", "dst", "sim")
    )


def _score(cand: DataFrame, nodes: DataFrame, qset: DataFrame) -> DataFrame:
    """Attach sim(query, node) to (query_id, node) pairs — the exact
    left-fold integer dot, JVM-side.  The fold (one aggregate() over
    zip_with) is arithmetically IDENTICAL to a 64-term unrolled sum
    (same left-to-right int64 adds, exact, no rounding anywhere), but
    its expression tree is O(1) instead of O(DIM): search_layers calls
    _score once per walk round, and the unrolled tree made Catalyst
    analysis + codegen the dominant cost of the whole search (measured
    2.7x on the full layered walk at sf0.1).  Candidate volume here is
    beam-sized — queries x (M+1) rows — so interpreted evaluation of
    the fold is noise; the blocked BUILD kernels keep their numpy
    int64 block product, which is where bulk-pair volume lives."""
    n = nodes.select(
        F.col("vec_id").alias("node"), F.col("qv").alias("nv"),
        F.col("nq").alias("nn"),
    )
    q = qset.select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qvq"),
        F.col("nq").alias("qn"),
    )
    dot = F.aggregate(
        F.zip_with("qvq", "nv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        cand.join(n, "node")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id", "node",
            _sim_expr(dot, F.col("qn"), F.col("nn")).alias("sim"),
        )
    )


def hnsw_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Layered-graph beam search: (query_id, neighbor_id, sim, rank).

    Deterministic contract (replayed verbatim by the SQL oracle):
    entry point = (max level, min id) node; UPPER_STEPS greedy steps at
    layers 2 then 1 (a step re-ranks {current} ∪ its layer neighbors,
    ties to the lower id; an empty layer leaves the cursor unchanged);
    K_ROUNDS ef-beam rounds on layer 0; final top-k excludes the query
    itself."""
    nodes = with_levels(
        quantized(vectors, id_col, vec_col)
    ).localCheckpoint(eager=True)
    qset = quantized(queries, id_col, vec_col).localCheckpoint(eager=True)

    # all three layers' edges in ONE distributed block-pair pass: a src
    # at level L contributes its top-M within every layer <= L
    # (identical to per-layer layer_edges, test-pinned)
    ranked = cross_topm_layered(nodes, nodes).localCheckpoint(eager=True)
    edges = {
        lv: ranked.filter(F.col("lvl") == lv).select("src", "dst", "sim")
        for lv in (2, 1, 0)
    }
    return search_layers(nodes, edges, qset, k)


def search_layers(
    nodes: DataFrame,
    edges: dict[int, DataFrame],
    qset: DataFrame,
    k: int = 5,
) -> DataFrame:
    """The deterministic layered beam search over PREBUILT (nodes,
    per-layer edges) — shared verbatim by the one-shot build
    (hnsw_topk) and the streaming incremental build, so the two
    cannot drift.  ``nodes``/``qset`` are quantized frames with
    (vec_id, qv, nq[, lvl])."""
    ep = (
        nodes.orderBy(F.col("lvl").desc(), F.col("vec_id"))
        .limit(1)
        .select(F.col("vec_id").alias("node"))
    )
    cur = qset.select(F.col("vec_id").alias("query_id")).crossJoin(
        F.broadcast(ep)
    )

    def best_of(cand: DataFrame, width: int) -> DataFrame:
        scored = _score(cand.distinct(), nodes, qset)
        w = Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("node")
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= width)
            .select("query_id", "node")
        )

    # materialize every SECOND round: each un-checkpointed round only
    # doubles the (tiny, already-materialized) previous frontier in the
    # plan, and halving the action count halves the per-job overhead
    # that dominates at beam sizes this small
    for lv in (2, 1):
        for step in range(UPPER_STEPS):
            nbr = cur.join(
                edges[lv], cur["node"] == edges[lv]["src"]
            ).select("query_id", F.col("dst").alias("node"))
            cur = best_of(cur.unionByName(nbr), 1)
            if step % 2 == 1:
                cur = cur.localCheckpoint(eager=True)

    beam = cur
    for rnd in range(K_ROUNDS):
        nbr = beam.join(
            edges[0], beam["node"] == edges[0]["src"]
        ).select("query_id", F.col("dst").alias("node"))
        beam = best_of(beam.unionByName(nbr), EF_BEAM)
        if rnd % 2 == 1:
            beam = beam.localCheckpoint(eager=True)

    final = _score(beam, nodes, qset).filter(
        F.col("query_id") != F.col("node")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("node")
    )
    return (
        final.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("node").alias("neighbor_id"),
            F.round("sim", 9).alias("sim"),
            "rank",
        )
    )


def knn_graph_blocked(
    vectors: DataFrame,
    centroids,
    m: int = M_EDGES,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SUB-QUADRATIC kNN-graph construction via IVF candidate blocking —
    the declared layer-0 build at extreme scale, now implemented: every
    vector lands in its ONE nearest coarse list (the IVF corpus-side
    convention) and probes its ``nprobe`` nearest lists as a source;
    candidates are the list-keyed join of the two (each (src, dst) pair
    can match at most once — dst has one list), scored under the graph
    tier's quantized-int64 similarity contract (order-free exact dot,
    bit-identical doubles in numpy/JVM/DuckDB) and reduced to per-src
    top-m by ONE rank window; output sim is rounded to 9 dp.

    Work is sum over lists of |probes(list)| x |list| ~= N^2 x
    nprobe / K instead of the block-pair grid's N^2 — with K grown as
    sqrt(N) (the FAISS sizing rule) that is O(N^1.5), and the join is
    an ordinary shuffle join on list_id: no broadcast of either side,
    no driver collect, and per-task memory bounded by ~BLOCK_ROWS
    regardless of list skew (lists larger than BLOCK_ROWS are
    hash-split into sub-blocks — see _list_packed — so the largest
    list never has to fit in one Arrow row).  The exact
    block-pair build (cross_topm) is this operator's recall reference;
    the floor is pinned in tests/test_r11_ops.py.  Returns
    (src, dst, cosine_sim, rank <= m)."""
    # ONE quantization + ONE assignment Arrow pass feeds BOTH sides
    # (the corpus list is the probe list's first element).  Assignment
    # runs on the raw doubles (the certified IVF convention);
    # SIMILARITY uses the graph tier's quantized-int64 contract, so the
    # scoring sum is order-free and numpy/JVM/DuckDB doubles agree
    # bit-for-bit.  Materialize the assigned frame once: both derived
    # sides would otherwise re-run the Arrow assignment inside every
    # join task; at 100 TB this materialization IS the index layout —
    # list_id as the stored table's partition key.
    af = ivf_assigned_quantized(
        vectors, centroids, nprobe, id_col, vec_col
    ).localCheckpoint(eager=True)
    dstf = af.select(
        "vec_id", "qv", "nq", F.col("list_c").alias("list_id")
    )
    srcf = af.select(
        "vec_id", "qv", "nq", F.explode("ls_p").alias("list_id")
    )
    cand = ivf_list_topm(srcf, dstf, m)
    w = Window.partitionBy("src").orderBy(
        F.col("cosine_sim").desc(), F.col("dst")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= m)
        .select(
            "src", "dst", F.round("cosine_sim", 9).alias("cosine_sim"),
            "rank",
        )
    )


def ivf_assigned_quantized(
    vectors: DataFrame,
    centroids,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_lvl: bool = False,
) -> DataFrame:
    """Quantize + coarse-assign one vector set in a single pass:
    (vec_id, qv, nq[, lvl], list_c, ls_p) where ``list_c`` is the one
    nearest corpus list (the IVF storage convention) and ``ls_p`` the
    ``nprobe`` nearest probe lists.  Assignment runs on the raw doubles
    (the certified IVF convention); similarity downstream uses the
    quantized-int64 contract.  This is the frame the STREAMING blocked
    ingest checkpoints per node — assignments are computed once at
    arrival and never re-derived, exactly how a 100 TB index stores
    list_id as the table's partition key."""
    from .similarity import _centroid_assign_udf, as_double

    # ONE assignment pass: the corpus list is by definition the first
    # of the nprobe probe lists (same stable argsort, same tie-break),
    # so list_c = ls_p[1] — no second Arrow pass over the vectors.
    # ONE projection (r13): quantization and assignment both derive
    # from the same input row, so the former quantized-frame ⋈ assigned-
    # frame self-join was a join of two selects of the same scan —
    # Catalyst planned it as a real join per call (an extra exchange or
    # broadcast per ingest batch); emitting every column in a single
    # select removes it with bit-identical values.
    probe_assign = _centroid_assign_udf(centroids, max(nprobe, 1))
    q = vectors.select(
        F.col(id_col).alias("vec_id"),
        _qv_expr(vec_col).alias("qv"),
        probe_assign(as_double(F.col(vec_col))).alias("ls_p"),
    ).withColumn("nq", _nq_expr()).withColumn(
        "list_c", F.element_at("ls_p", 1)
    )
    if with_lvl:
        q = with_levels(q)
    return q


def _list_packed(
    assigned: DataFrame, pack_col: str, extra: tuple = ()
) -> DataFrame:
    """Pack one side's IVF-assigned quantized rows into
    (list_id, <pack_col>) sub-matrix rows, each holding <= ~BLOCK_ROWS
    vectors: lists larger than BLOCK_ROWS are hash-split into
    ceil(|list|/BLOCK_ROWS) sub-blocks (the _packed machinery applied
    WITHIN each list), so no shuffle row — and no single pair-task —
    ever grows with list size or skew.  The per-list sub-block counts
    ride a broadcast join: one row per list, i.e. codebook-sized (K ~
    sqrt(N) under the FAISS sizing rule), the same bounded-metadata
    contract as the codebook itself."""
    counts = assigned.groupBy("list_id").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    nsub = F.greatest(
        F.ceil(F.col("_cnt") / F.lit(BLOCK_ROWS)), F.lit(1)
    ).cast("int")
    sized = assigned.join(
        F.broadcast(counts.select("list_id", nsub.alias("_nsub"))),
        "list_id",
    )
    return (
        sized.withColumn(
            "_sub",
            F.pmod(F.xxhash64(F.col("vec_id")), F.col("_nsub")).cast("int"),
        )
        .groupBy("list_id", "_sub")
        .agg(
            F.collect_list(
                F.struct("vec_id", "qv", "nq", *extra)
            ).alias(pack_col)
        )
        .select("list_id", pack_col)
    )


def ivf_list_topm(srcf: DataFrame, dstf: DataFrame,
                  m: int = M_EDGES) -> DataFrame:
    """Per-src top-m candidate edges from the IVF list join — the
    shared kernel of the one-shot blocked build (knn_graph_blocked)
    and the blocked streaming ingest.  ``srcf``/``dstf`` are quantized
    frames carrying (vec_id, qv, nq, list_id) — srcf exploded over its
    nprobe probe lists, dstf over its one corpus list.  Each side is
    packed into <= ~BLOCK_ROWS sub-blocks per list (_list_packed), the
    join on list_id crosses the sub-blocks, and the SAME numpy int64
    block kernel as the exact build scores each pair — per-src top-m
    within the (sub-)pair is a safe reduction (fewer than m closer
    vectors exist globally, so fewer exist in any subset); the caller
    finishes with one global per-src rank window.  The per-pair cost is
    a BLAS-shaped integer product instead of a per-row Catalyst array
    fold (the fold drops out of codegen and runs interpreted —
    measured ~20x slower at 1M candidate pairs)."""
    pairs = _list_packed(srcf, "apack").join(
        _list_packed(dstf, "bpack"), "list_id"
    )

    def gen(batches):
        for pdf in batches:
            for apack, bpack in zip(pdf["apack"], pdf["bpack"]):
                a = _unpack(apack, False)
                b = _unpack(bpack, False)
                a_ids, b_ids, sims = _block_sims(a, b)
                out_src, out_dst, out_sim = _pair_topm(
                    a_ids, b_ids, sims, m
                )
                yield pd.DataFrame(
                    {"src": out_src, "dst": out_dst,
                     "cosine_sim": out_sim}
                )

    return pairs.mapInPandas(
        gen, "src long, dst long, cosine_sim double"
    )


def ivf_list_topm_bidir(
    fwd_src: DataFrame,
    rev_src: DataFrame,
    dst: DataFrame,
    m: int = M_EDGES,
) -> DataFrame:
    """BOTH blocked-ingest directions in ONE list-keyed packed join:
    ``fwd_src`` rows (the batch's arrivals, exploded over probe lists)
    score against EVERY ``dst`` row in the list; ``rev_src`` rows (the
    accumulated index probing the batch) score only against the dst
    rows flagged ``is_new`` = 1 — exactly the two ivf_list_topm calls
    the fold ran, whose second call re-packed the index AND the batch
    per micro-batch (two more shuffles, one more kernel job, double the
    plan).  The kernel runs two exact block products per pair (fwd
    rows x all dst, rev rows x new dst) — no masked waste, identical
    arithmetic; src ids are disjoint across directions (the fold's
    anti-join), so the caller's per-src top-m selection splits into
    the two per-direction selections the old code ran.  ``dst`` must
    carry an int ``is_new`` column."""
    import numpy as np

    src = fwd_src.withColumn("_fwd", F.lit(1)).unionByName(
        rev_src.withColumn("_fwd", F.lit(0))
    )
    pairs = _list_packed(src, "apack", extra=("_fwd",)).join(
        _list_packed(dst, "bpack", extra=("is_new",)), "list_id"
    )

    def gen(batches):
        for pdf in batches:
            for apack, bpack in zip(pdf["apack"], pdf["bpack"]):
                a_ids = np.fromiter(
                    (e["vec_id"] for e in apack), dtype=np.int64,
                    count=len(apack),
                )
                a_mat = np.array([e["qv"] for e in apack], dtype=np.int64)
                a_nrm = np.fromiter(
                    (e["nq"] for e in apack), dtype=np.int64,
                    count=len(apack),
                )
                a_fwd = np.fromiter(
                    (e["_fwd"] == 1 for e in apack), dtype=bool,
                    count=len(apack),
                )
                b_ids = np.fromiter(
                    (e["vec_id"] for e in bpack), dtype=np.int64,
                    count=len(bpack),
                )
                b_mat = np.array([e["qv"] for e in bpack], dtype=np.int64)
                b_nrm = np.fromiter(
                    (e["nq"] for e in bpack), dtype=np.int64,
                    count=len(bpack),
                )
                b_new = np.fromiter(
                    (e["is_new"] == 1 for e in bpack), dtype=bool,
                    count=len(bpack),
                )
                out_src, out_dst, out_sim = [], [], []
                if a_fwd.any():
                    ids, dsts, sims = _block_sims(
                        (a_ids[a_fwd], a_mat[a_fwd], a_nrm[a_fwd]),
                        (b_ids, b_mat, b_nrm),
                    )
                    s, d, v = _pair_topm(ids, dsts, sims, m)
                    out_src.extend(s)
                    out_dst.extend(d)
                    out_sim.extend(v)
                a_rev = ~a_fwd
                if a_rev.any() and b_new.any():
                    ids, dsts, sims = _block_sims(
                        (a_ids[a_rev], a_mat[a_rev], a_nrm[a_rev]),
                        (b_ids[b_new], b_mat[b_new], b_nrm[b_new]),
                    )
                    s, d, v = _pair_topm(ids, dsts, sims, m)
                    out_src.extend(s)
                    out_dst.extend(d)
                    out_sim.extend(v)
                yield pd.DataFrame(
                    {"src": out_src, "dst": out_dst,
                     "cosine_sim": out_sim}
                )

    return pairs.mapInPandas(
        gen, "src long, dst long, cosine_sim double"
    )
