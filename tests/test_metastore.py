"""S11 catalog persistence: metadata created by one JVM must be visible
to a later, fresh JVM through the same Derby-backed Hive metastore —
the half of HiveCatalog parity the in-memory session catalog can't
show. Two sequential subprocesses, nothing shared but the metastore
and warehouse directories."""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

_CREATE = """
import sys
sys.path.insert(0, {repo!r})
from flink_1_19_source_spark.sources.metastore import durable_catalog_session
spark = durable_catalog_session({wh!r}, {ms!r}, app_name="ms-create")
spark.sql("CREATE DATABASE IF NOT EXISTS durable_db")
spark.sql("DROP TABLE IF EXISTS durable_db.kv")
spark.sql("CREATE TABLE durable_db.kv (k INT, v STRING) USING PARQUET")
spark.sql("INSERT INTO durable_db.kv VALUES (1, 'a'), (2, 'b'), (3, 'c')")
print("CREATED", spark.sql("SELECT COUNT(*) c FROM durable_db.kv").first().c)
spark.stop()
"""

_READ = """
import sys
sys.path.insert(0, {repo!r})
from flink_1_19_source_spark.sources.metastore import durable_catalog_session
spark = durable_catalog_session({wh!r}, {ms!r}, app_name="ms-read")
tables = [r.tableName for r in spark.sql("SHOW TABLES IN durable_db").collect()]
rows = sorted((r.k, r.v) for r in spark.sql("SELECT * FROM durable_db.kv").collect())
print("TABLES", tables)
print("ROWS", rows)
spark.stop()
"""


def _run(script: str) -> str:
    p = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert p.returncode == 0, f"stdout:\n{p.stdout}\nstderr:\n{p.stderr[-3000:]}"
    return p.stdout


def test_catalog_metadata_survives_across_jvms():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory(prefix="sgraft_ms_") as d:
        wh, ms = os.path.join(d, "warehouse"), os.path.join(d, "metastore")
        out1 = _run(_CREATE.format(repo=repo, wh=wh, ms=ms))
        assert "CREATED 3" in out1, out1
        out2 = _run(_READ.format(repo=repo, wh=wh, ms=ms))
        assert "TABLES ['kv']" in out2, out2
        assert "ROWS [(1, 'a'), (2, 'b'), (3, 'c')]" in out2, out2
