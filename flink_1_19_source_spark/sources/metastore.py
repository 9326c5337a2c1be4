"""Durable catalog (SURVEY §2.1 S11) — Hive-metastore-backed sessions.

Flink's HiveCatalog persists databases/tables across jobs and engines.
Spark ships the same capability: ``enableHiveSupport()`` with an
embedded Derby metastore (both the spark-hive and derby jars are in the
stock distribution) gives CREATE DATABASE/TABLE metadata that SURVIVES
the session — a second, later JVM pointed at the same metastore path
sees and queries the tables the first one created.

``durable_catalog_session`` pins the two locations that make the
catalog durable:

- ``metastore_dir``: the Derby database holding table metadata
  (``javax.jdo.option.ConnectionURL``). Single-process Derby is the
  embedded tier; a shared deployment swaps the URL for a network
  metastore (Thrift/MySQL/Postgres) — same session code.
- ``warehouse_dir``: managed-table storage.

The catalog *operations* surface (DDL, SHOW/DESCRIBE, INSERT, resolve)
is certified by ``src_catalog_surface`` on the in-memory catalog; this
module closes the persistence half. tests/test_metastore.py proves it
with two sequential JVMs.

Note: Spark allows one metastore client per JVM, so this builder is for
dedicated catalog sessions (separate process from the analytics
session), mirroring how a metastore service is deployed for real.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def durable_catalog_session(
    warehouse_dir: str,
    metastore_dir: str,
    app_name: str = "sgraft-durable-catalog",
    master: str | None = None,
) -> SparkSession:
    os.makedirs(warehouse_dir, exist_ok=True)
    os.makedirs(metastore_dir, exist_ok=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "4")
    return (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.catalogImplementation", "hive")
        .config(
            "javax.jdo.option.ConnectionURL",
            f"jdbc:derby:;databaseName={os.path.join(metastore_dir, 'metastore_db')};create=true",
        )
        .config("spark.sql.warehouse.dir", warehouse_dir)
        # derby.log otherwise lands in the process CWD
        .config(
            "spark.driver.extraJavaOptions",
            f"-Dderby.stream.error.file={os.path.join(metastore_dir, 'derby.log')}",
        )
        .config("spark.ui.enabled", "false")
        .enableHiveSupport()
        .getOrCreate()
    )
