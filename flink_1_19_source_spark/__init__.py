"""flink_1_19_source_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference (`maoxingda/flink-1.19-source`, i.e. the
Apache Flink 1.19 API surface — see /root/repo/SURVEY.md). The engine is
NOT a port: logical plans are declared with the DataFrame/SQL API and
Catalyst/Tungsten pick the physical strategy; custom operators (CUMULATE
windows, as-of joins, streaming Top-N, MinHash-LSH dedup, ...) compose
public DataFrame primitives and Arrow-batched pandas UDFs.

Layout
------
- ``session``    SparkSession factory tuned for scale (AQE, UTC, Arrow).
- ``tables``     table-spec layer: testdata registry + watermark/PK metadata.
- ``registry``   query registry: name -> (PySpark impl, DuckDB oracle SQL).
- ``functions``  Flink built-in scalar/agg function surface on Spark.
- ``operators``  custom batch operators (cumulate, as-of join, top-n, dedup,
                 similarity, text analysis, multimodal).
- ``streaming``  Structured Streaming counterparts (watermarks, windows,
                 stateful ops, changelog sinks).
- ``queries``    the SURVEY §2 coverage suite: every operator as a
                 registered query with a DuckDB oracle.
"""

from .registry import REGISTRY, register, queries, oracle_sql  # noqa: F401
from .session import get_spark  # noqa: F401
from .tables import load_table, register_views  # noqa: F401

__version__ = "0.1.0"
