"""User-defined table function coverage (SURVEY §2.10: Flink
TableFunction → Python UDTF, Spark 3.5+).

Flink's ``TableFunction`` emits 0..N rows per input row and is consumed
with a lateral join. Spark's Python UDTF is the direct equivalent; the
lateral-join shape (`LATERAL TABLE(f(x))`) maps to
``df.lateralJoin(udtf(...))`` / SQL `... , LATERAL f(...)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

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
