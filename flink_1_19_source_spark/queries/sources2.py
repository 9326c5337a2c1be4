"""Session-catalog surface (SURVEY §2.1 S11, §2.2 S12).

Flink's HiveCatalog gives SQL DDL a durable namespace: CREATE
DATABASE/TABLE, SHOW/DESCRIBE introspection, INSERT INTO, and
queries resolved through the catalog. Spark ships the same SQL surface
on its built-in session catalog (in-memory metastore + spark-warehouse
storage) — that covers every catalog *operation* the reference's SQL
tests exercise, certified here. The persistence half (metadata
surviving across sessions/engines) is covered by the Derby-backed Hive
metastore in sources/metastore.py, proven across two separate JVMs in
tests/test_metastore.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table


@register(
    "src_catalog_surface",
    oracle="""
    SELECT r.r_name, COUNT(*) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    survey="S11 S12",
)
def src_catalog_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog DDL round-trip (S11): CREATE DATABASE → CTAS a managed
    parquet table into the warehouse → SHOW TABLES / DESCRIBE must
    list it → INSERT INTO appends → final query resolves the table
    through the catalog (database-qualified name, full Catalyst
    lifecycle). Flink: the same statements against HiveCatalog."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    region.createOrReplaceTempView("cat_region_src")
    nation.createOrReplaceTempView("cat_nation_src")

    spark.sql("CREATE DATABASE IF NOT EXISTS graft_cat")
    spark.sql("DROP TABLE IF EXISTS graft_cat.region_t")
    # the in-memory catalog forgets managed tables across sessions while
    # their warehouse directories persist — exactly the S11 metastore
    # persistence gap; clear any orphaned location so CTAS can recreate
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    if wh.startswith("file:"):
        shutil.rmtree(
            wh.removeprefix("file:") + "/graft_cat.db/region_t",
            ignore_errors=True,
        )
    # CTAS with a predicate, then INSERT the rest — exercises both the
    # create-from-query and append write paths through the catalog
    spark.sql(
        "CREATE TABLE graft_cat.region_t USING PARQUET AS "
        "SELECT * FROM cat_region_src WHERE r_regionkey < 3"
    )
    spark.sql(
        "INSERT INTO graft_cat.region_t "
        "SELECT * FROM cat_region_src WHERE r_regionkey >= 3"
    )

    tables = {r.tableName for r in spark.sql("SHOW TABLES IN graft_cat").collect()}
    if "region_t" not in tables:
        raise AssertionError("catalog does not list region_t")
    described = {r.col_name for r in spark.sql("DESCRIBE TABLE graft_cat.region_t").collect()}
    if not {"r_regionkey", "r_name"} <= described:
        raise AssertionError(f"DESCRIBE missing columns: {described}")

    return spark.sql(
        """
        SELECT r.r_name, COUNT(*) AS n_nations
        FROM graft_cat.region_t r
        JOIN cat_nation_src n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    )


@register(
    "src_compacted_write",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents WHERE lang IN ('en', 'fr')
    """,
    survey="S1 S2",
)
def src_compacted_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compacted partitioned sink (S1/S2): repartition-on-key before a
    partitionBy write, so each lang directory holds one file instead of
    tasks×partitions slivers (the 100 TB small-file failure mode), then
    a partition-pruned read-back of two languages. The file-count bound
    is asserted, not assumed."""
    import glob
    import os as _os

    from ..sources import formats

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    path = _os.path.join(formats.scratch(sf_dir, "compact_docs"), "documents")
    formats.compacted_partitioned_write(d, path, ["lang"])

    for part_dir in glob.glob(_os.path.join(path, "lang=*")):
        files = [f for f in _os.listdir(part_dir) if f.endswith(".parquet")]
        if len(files) > 2:
            raise AssertionError(
                f"compaction failed: {part_dir} has {len(files)} files"
            )

    return (
        spark.read.parquet(path)
        .filter(F.col("lang").isin("en", "fr"))
        .select("doc_id", "lang", "n_chars")
    )
