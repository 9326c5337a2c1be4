"""Flink-SQL compatibility shim (SURVEY §2.8): run Flink-flavored SQL on
Spark. Two mechanisms, both conservative and documented:

1. **Name aliases** — Flink built-ins whose Spark equivalent takes the
   same arguments under a different name are rewritten textually
   (word-boundary + '(' match, string-literal-safe enough for the
   documented subset).
2. **Registered shims** — Flink built-ins with no same-argument Spark
   twin are registered once per session as Spark SQL functions
   (Python UDFs; compat path, not the perf path — the engine's native
   queries use built-in expressions).

Covered subset (extend as needed): SPLIT_INDEX, TRUNCATE, STRCMP,
RAND_INTEGER, JSON_VALUE, REGEXP, TO_BASE64, FROM_BASE64.
Flink semantics sources: Flink 1.19 "System (Built-in) Functions" docs
(upstream: flink-table-common BuiltInFunctionDefinitions).
"""

from __future__ import annotations

import math
import random
import re

from pyspark.sql import DataFrame, SparkSession

#: Flink name → same-args Spark name
NAME_ALIASES = {
    "JSON_VALUE": "get_json_object",
    "REGEXP": "rlike",
    "TO_BASE64": "base64",
    "FROM_BASE64": "unbase64",
    "CHARACTER_LENGTH": "char_length",
}

_REGISTERED_FLAG = "_sg_flink_shims_registered"


def _split_index(s, d, i):
    """Flink SPLIT_INDEX(str, delim, idx): 0-based, NULL out of range."""
    if s is None or d is None or i is None:
        return None
    parts = s.split(d)
    return parts[i] if 0 <= i < len(parts) else None


def _truncate(x, d):
    """Flink TRUNCATE(numeric, int): truncate toward zero to d decimals."""
    if x is None or d is None:
        return None
    f = 10.0 ** d
    return math.trunc(x * f) / f


def _strcmp(a, b):
    if a is None or b is None:
        return None
    return 0 if a == b else (-1 if a < b else 1)


def _rand_integer(n):
    return None if n is None else random.randrange(n)


def register_shims(spark: SparkSession) -> None:
    """Idempotently register the Flink-name UDF shims on this session."""
    if spark.conf.get(f"spark.{_REGISTERED_FLAG}", "no") == "yes":
        return
    from pyspark.sql.types import DoubleType, IntegerType, StringType

    spark.udf.register("SPLIT_INDEX", _split_index, StringType())
    spark.udf.register("TRUNCATE", _truncate, DoubleType())
    spark.udf.register("STRCMP", _strcmp, IntegerType())
    spark.udf.register("RAND_INTEGER", _rand_integer, IntegerType())
    spark.conf.set(f"spark.{_REGISTERED_FLAG}", "yes")


#: session conf key the streaming layer publishes its combined watermark
#: under (streaming/partition_watermark.PartitionWatermarkTracker.publish)
WATERMARK_CONF = "spark.sg.currentWatermark"

_SIMILAR_RE = re.compile(
    r"(\bNOT\s+)?\bSIMILAR\s+TO\s+'([^']*)'", flags=re.IGNORECASE
)

_CURRENT_WM_RE = re.compile(r"\bCURRENT_WATERMARK\s*\([^)]*\)", flags=re.IGNORECASE)


def _rewrite_similar_to(query: str) -> str:
    """``x [NOT] SIMILAR TO '<literal>'`` → ``x [NOT] RLIKE '^(?:rx)$'``
    with the SQL:2016→regex translation from functions/similar_to.py.
    Literal patterns only (the documented dialect subset); RLIKE keeps the
    preceding operand expression untouched, so no operand parsing needed."""
    from .similar_to import similar_to_regex

    def sub(m: re.Match) -> str:
        neg = "NOT " if m.group(1) else ""
        rx = similar_to_regex(m.group(2)).replace("\\", "\\\\").replace("'", "''")
        return f"{neg}RLIKE '^(?:{rx})$'"

    return _SIMILAR_RE.sub(sub, query)


def _rewrite_current_watermark(query: str, spark: SparkSession | None) -> str:
    """``CURRENT_WATERMARK(rowtime)`` → the session's published combined
    watermark as a timestamp literal (NULL before any watermark exists —
    Flink's contract for a fresh pipeline). Statement-time evaluation: the
    right granularity for the micro-batch surface, where the watermark is
    constant within a batch."""
    if spark is None or not _CURRENT_WM_RE.search(query):
        return query
    wm = spark.conf.get(WATERMARK_CONF, None)
    lit = f"TIMESTAMP'{wm}'" if wm else "CAST(NULL AS TIMESTAMP)"
    return _CURRENT_WM_RE.sub(lit, query)


def translate(query: str, spark: SparkSession | None = None) -> str:
    """Rewrite the Flink dialect onto Spark SQL: name aliases, SIMILAR TO,
    CURRENT_WATERMARK."""
    out = query
    for flink_name, spark_name in NAME_ALIASES.items():
        out = re.sub(
            rf"\b{flink_name}\s*\(", f"{spark_name}(", out, flags=re.IGNORECASE
        )
    out = _rewrite_similar_to(out)
    out = _rewrite_current_watermark(out, spark)
    return out


def flink_sql(spark: SparkSession, query: str) -> DataFrame:
    """Execute Flink-flavored SQL: alias-translate, ensure shims, run.
    Tables must already be registered as views (tables.register_views)."""
    register_shims(spark)
    return spark.sql(translate(query, spark))
