"""User-defined function surface (SURVEY §2.10: Flink TableFunction →
Python UDTF; ScalarFunction → Arrow-vectorized pandas UDF).

Flink's ``TableFunction`` emits 0..N rows per input row and is consumed
with a lateral join. Spark's Python UDTF is the direct equivalent; the
lateral-join shape (`LATERAL TABLE(f(x))`) maps to
``df.lateralJoin(udtf(...))`` / SQL `... , LATERAL f(...)`.

Flink's ``ScalarFunction`` (PyFlink offers both row and pandas variants)
maps to ``pandas_udf`` — the Arrow-batched path, the only sanctioned
Python scalar path at 100 TB (row-at-a-time ``F.udf`` is 10-100× slower
and appears nowhere in this engine's hot paths).
"""

# NOTE: no `from __future__ import annotations` here — postponed
# annotations break pandas_udf type-hint resolution (see project memory).
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from ..registry import register
from ..tables import load_table


@udtf(returnType="pos: int, tok: string, tok_len: int")
class TokenizeUDTF:
    """Flink TableFunction equivalent: one input string → N token rows."""

    def eval(self, text: str):
        if text is None:
            return
        for i, t in enumerate(text.lower().split()):
            yield i, t, len(t)


@register(
    "udtf_tokenize_lateral",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(LOWER(text), '\\s+'),
                           x -> x <> '') AS tk
        FROM documents WHERE doc_id < 40
    )
    SELECT doc_id,
           CAST(generate_subscripts(tk, 1) - 1 AS INTEGER) AS pos,
           UNNEST(tk) AS tok,
           CAST(LEN(UNNEST(tk)) AS INTEGER) AS tok_len
    FROM t
    """,
    survey="2.10-TableFunction R4",
)
def udtf_tokenize_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF consumed laterally: each document row fans out to one
    row per token with its position and length — Flink's
    `LATERAL TABLE(tokenize(text))`."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    spark.udtf.register("sg_tokenize", TokenizeUDTF)
    d.select("doc_id", "text").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT doc_id, t.pos, t.tok, t.tok_len "
        "FROM udtf_docs, LATERAL sg_tokenize(text) t"
    )


def _scalar_udfs():
    # built lazily: pandas_udf parses its DDL return type against the
    # active session, so module-import time (no session yet) is too early
    @pandas_udf("double")
    def log_balance(bal: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.round(np.log1p(np.maximum(bal.to_numpy(), 0.0)), 9))

    @pandas_udf("string")
    def name_norm(name: pd.Series) -> pd.Series:
        return name.str.slice(0, 8).str.upper()

    return log_balance, name_norm


@register(
    "udf_scalar_pandas",
    oracle="""
    SELECT c_custkey,
           ROUND(LN(1 + GREATEST(c_acctbal, 0)), 9) AS log_bal,
           UPPER(SUBSTRING(c_name, 1, 8)) AS name_norm,
           c_mktsegment
    FROM customer
    """,
    survey="2.10-ScalarFunction R1",
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink ScalarFunction → pandas UDF (2.10): two Arrow-vectorized
    scalar UDFs (numpy math, pandas string kernel) applied per-row with
    batch transfer — PyFlink's pandas ScalarFunction equivalent. The
    DuckDB oracle recomputes both in SQL, proving scalar semantics."""
    log_balance, name_norm = _scalar_udfs()
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        log_balance("c_acctbal").alias("log_bal"),
        name_norm("c_name").alias("name_norm"),
        "c_mktsegment",
    )
