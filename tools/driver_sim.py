"""Replay the driver's correctness pass locally (sf0.01 by default).

Runs every query in the current certification window (or names given on
argv) on Spark AND its DuckDB oracle, comparing with the strict local
replica in tests/oracle.py.  Prints one PASS/FAIL line per query and a
summary; exit code 1 on any failure.

Usage:
    python3 tools/driver_sim.py                 # first-50 window
    python3 tools/driver_sim.py all             # every registered query
    python3 tools/driver_sim.py q1_pricing_summary n3_lsh_topk
    SPARK_GRAFT_SIM_SF=/root/testdata/sf0.001 python3 tools/driver_sim.py
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main() -> int:
    from flink_1_19_source_spark.registry import REGISTRY, queries
    from flink_1_19_source_spark.session import get_spark
    from oracle import assert_query_matches

    queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01")
    args = sys.argv[1:]
    if args == ["all"]:
        names = list(REGISTRY)
    elif args:
        names = args
    else:
        names = list(REGISTRY)[:50]

    spark = get_spark(app_name="driver-sim", shuffle_partitions=8)
    failed: list[str] = []
    for i, name in enumerate(names, 1):
        t0 = time.time()
        try:
            if REGISTRY[name].oracle is None:
                n = REGISTRY[name].fn(spark, sf_dir).count()
                print(f"[{i}/{len(names)}] ROWS-ONLY {name}: {n} rows "
                      f"({time.time()-t0:.1f}s)", flush=True)
                continue
            assert_query_matches(spark, sf_dir, name)
            print(f"[{i}/{len(names)}] PASS {name} ({time.time()-t0:.1f}s)",
                  flush=True)
        except Exception:
            failed.append(name)
            print(f"[{i}/{len(names)}] FAIL {name} ({time.time()-t0:.1f}s)",
                  flush=True)
            traceback.print_exc()
    print(f"\n{len(names) - len(failed)}/{len(names)} green; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
