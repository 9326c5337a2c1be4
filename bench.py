#!/usr/bin/env python
"""Benchmark harness: time every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Timing is end-to-end per query (plan + execute + materialize via
collect()) on a warmed SparkSession, so it captures what a user pays:
Catalyst planning, shuffles, and Arrow/JVM boundaries included.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from flink_1_19_source_spark.registry import queries
    from flink_1_19_source_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = queries()
    # warm the JVM / codegen / parquet footer caches with one trivial pass
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    times: dict[str, float] = {}
    failed: dict[str, str] = {}
    for name in sorted(qs):
        t0 = time.perf_counter()
        try:
            rows = qs[name](spark, sf_dir).collect()
            _ = len(rows)
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as ex:  # keep benching; a failed query is reported
            failed[name] = f"{type(ex).__name__}: {ex}"[:200]

    total = round(sum(times.values()), 3)
    out = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if failed:
        out["failed"] = failed
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
