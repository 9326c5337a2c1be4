"""Solo per-query timing (median of N) at $SPARK_GRAFT_SF_DIR — the
same timed action as bench.py (collect on a warmed session, scrub
between runs) without the 419-query session history, for A/B
adjudication of individual optimizations.

Usage:
    python tools/solo_time.py [-nN] name [name ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if args and args[0].startswith("-n"):
        runs = int(args[0][2:])
        args = args[1:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from flink_1_19_source_spark.registry import queries
    from flink_1_19_source_spark.session import get_spark

    qs = queries()
    spark = get_spark(app_name="solo")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    def scrub() -> None:
        spark.catalog.clearCache()
        for rdd in list(
            spark.sparkContext._jsc.getPersistentRDDs().values()
        ):
            rdd.unpersist(False)
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    for name in names:
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            rows = qs[name](spark, sf_dir).collect()
            _ = len(rows)
            samples.append(round(time.perf_counter() - t0, 3))
            scrub()
        print(
            f"{name}: median={statistics.median(samples):.3f}"
            f" samples={samples} load={os.getloadavg()}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
