#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries to plans/r12/.

Usage:
    python tools/explain_query.py <suffix> <query> [<query> ...]

Writes plans/r12/<query>_<suffix>.txt for each name (suffix = "before" /
"after").  Batch queries dump the full pre-execution physical plan.
Streaming / drain-style queries (whose returned frame is a materialized
checkpoint or memory-sink table) additionally note that the plan shown
is the post-drain frame — their interesting plans are the per-batch
foreachBatch jobs, which PLANS.md documents separately.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r12",
    )
    os.makedirs(out_dir, exist_ok=True)

    from flink_1_19_source_spark.registry import queries
    from flink_1_19_source_spark.session import get_spark

    spark = get_spark(app_name="explain-r12", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} ({suffix}) — explain('formatted') at "
                    f"{sf_dir}\n\n")
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
