#!/usr/bin/env python
"""Time named queries solo on a fresh session (bench methodology:
collect() on a warmed session), printing per-query seconds.

Usage:
    python tools/solo_time.py <query> [<query> ...]
    SPARK_GRAFT_SOLO_SF=/root/testdata/sf0.1 python tools/solo_time.py ...
    SPARK_GRAFT_SOLO_RUNS=3 python tools/solo_time.py ...   # median of N
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SOLO_SF", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_SOLO_RUNS", "1"))

    from flink_1_19_source_spark.registry import queries
    from flink_1_19_source_spark.session import get_spark

    spark = get_spark(app_name="solo-time")
    spark.sparkContext.setLogLevel("ERROR")
    # warm like bench.py does
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    qs = queries()
    for name in names:
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            rows = qs[name](spark, sf_dir).collect()
            _ = len(rows)
            samples.append(time.perf_counter() - t0)
        med = statistics.median(samples)
        print(
            f"SOLO {name}: {med:.3f}s"
            + (f" (runs: {[round(s, 3) for s in samples]})" if runs > 1 else ""),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
