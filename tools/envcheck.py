#!/usr/bin/env python
"""Environment sanity gate — fails loudly when the interpreter or testdata
drifts from what the driver runs, instead of shipping a round-wide
regression (the round-3 lesson: tests were green against a side Spark
install + stale events.parquet while every driver query died at load).

Checks:
1. the active ``pyspark`` is the pip install inside THIS interpreter's
   site-packages (not a side /opt/spark or SPARK_HOME shadow);
2. ``events.ts`` in every testdata SF loads through ``tables.load_table``
   as a plain µs TimestampType (whatever the parquet physically stores);
3. DuckDB can see the same parquet (oracle side of the driver contract).

Run directly (``python3 tools/envcheck.py``) or import ``check_env`` from
a conftest/session hook.
"""

from __future__ import annotations

import os
import sys


def check_env(spark=None, sf_dirs: list[str] | None = None) -> list[str]:
    problems: list[str] = []

    import pyspark

    exe_prefix = os.path.dirname(os.path.dirname(sys.executable))
    if exe_prefix not in pyspark.__file__:
        problems.append(
            f"pyspark at {pyspark.__file__} is not inside the active "
            f"interpreter prefix {exe_prefix} — a side install (SPARK_HOME?) "
            "is shadowing the pip pyspark the driver uses"
        )

    import duckdb  # noqa: F401  (oracle side must import)

    sf_dirs = sf_dirs or [
        d
        for d in (
            "/root/testdata/sf0.001",
            "/root/testdata/sf0.01",
            "/root/testdata/sf0.1",
        )
        if os.path.isdir(d)
    ]

    own_session = spark is None
    if own_session:
        from flink_1_19_source_spark.session import get_spark

        spark = get_spark(app_name="envcheck", shuffle_partitions=4)

    from flink_1_19_source_spark.tables import load_table

    for sf_dir in sf_dirs:
        dt = dict(load_table(spark, sf_dir, "events").dtypes)["ts"]
        if dt != "timestamp":
            problems.append(
                f"{sf_dir}/events.parquet: load_table produced ts::{dt}, "
                "expected plain µs timestamp — the dtype-conditional load "
                "in tables.py does not cover this file's physical type"
            )

    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        problems.append(f"session timeZone is {tz!r}, expected UTC")

    # with SPARK_HOME set, the JVM (and worker-side python files) come from
    # that install, not pip — a version skew between the two is the kind of
    # silent split that costs a round
    if spark.version != pyspark.__version__:
        problems.append(
            f"JVM spark {spark.version} != driver pyspark "
            f"{pyspark.__version__} (SPARK_HOME={os.environ.get('SPARK_HOME')})"
        )

    if own_session:
        spark.stop()
    return problems


def main() -> int:
    import pyspark

    print(f"python:  {sys.executable}")
    print(f"pyspark: {pyspark.__version__} ({pyspark.__file__})")
    problems = check_env()
    if problems:
        for p in problems:
            print(f"ENVCHECK FAIL: {p}", file=sys.stderr)
        return 1
    print("envcheck: OK")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    raise SystemExit(main())
