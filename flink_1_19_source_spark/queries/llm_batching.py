"""N6 — training-batch formation beyond greedy packing (SURVEY §2.11).

Length-bucketed batching: the padding-efficiency device every LLM
training loader uses when sequences are padded to the longest in the
batch — group documents into power-of-two token-length buckets, form
fixed-count batches inside each bucket by deterministic hash order, and
report the padding waste.  Fully declarative (no sequential fold, no
UDF): the bucket is integer bit-arithmetic, batch assignment is one
per-bucket rank window, waste is an aggregate — the whole schedule is
one shuffle on the bucket key at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import text_analysis as ta
from ..registry import register
from ..tables import load_table

_BATCH_DOCS = 8


@register(
    "n6_length_bucketed_batches",
    oracle=r"""
    WITH per_doc AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(LOWER(text), '\s+'),
                       t -> t <> '')) AS BIGINT) AS nt
      FROM documents
    ), b AS (
      SELECT doc_id, nt,
             CAST(CASE WHEN nt <= 1 THEN 1
                       ELSE power(2, LENGTH(bin(nt - 1))) END AS BIGINT)
               AS bucket
      FROM per_doc WHERE nt > 0
    ), r AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY bucket
               ORDER BY md5(CONCAT('batch:', CAST(doc_id AS VARCHAR))),
                        doc_id) AS rk
      FROM b
    )
    SELECT bucket, CAST((rk - 1) // 8 AS BIGINT) AS batch_no,
           COUNT(*) AS n_docs,
           CAST(MAX(nt) AS BIGINT) AS max_nt,
           CAST(COUNT(*) * MAX(nt) AS BIGINT) AS padded_tokens,
           CAST(COUNT(*) * MAX(nt) - SUM(nt) AS BIGINT) AS padding_waste
    FROM r GROUP BY 1, 2
    """,
    survey="N6",
)
def n6_length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LENGTH-BUCKETED batch formation — the padding-efficiency
    schedule for pad-to-longest training: documents land in
    power-of-two token-length buckets (bucket = smallest power of two
    >= n_tokens, computed as 2^bit_length(nt-1) — pure integer bit
    arithmetic, no log/float), batches of 8 form inside each bucket by
    md5 hash rank (the house deterministic-sampling device), and each
    batch reports its padded size and waste (n_docs*max_nt - sum_nt).
    Bucketing bounds per-batch waste to <2x of optimal structurally
    (all lengths in a bucket are within a factor 2); the non-vacuity
    test pins that it actually beats unbucketed hash-order batching on
    this corpus.  One shuffle on the bucket key; at 100 TB the rank
    window is per-bucket and the report is one aggregate."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "doc_id", F.size(ta.tokens(F.col("text"))).cast("long").alias("nt")
    ).filter(F.col("nt") > 0)
    bucket = F.when(F.col("nt") <= 1, F.lit(1)).otherwise(
        F.pow(F.lit(2.0), F.length(F.bin(F.col("nt") - 1)).cast("double"))
    ).cast("long")
    b = per_doc.withColumn("bucket", bucket)
    w = Window.partitionBy("bucket").orderBy(
        F.md5(F.concat(F.lit("batch:"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    r = b.withColumn("rk", F.row_number().over(w))
    return (
        r.withColumn(
            "batch_no", ((F.col("rk") - 1) / F.lit(_BATCH_DOCS))
            .cast("long")
        )
        .groupBy("bucket", "batch_no")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("nt").cast("long").alias("max_nt"),
            (F.count(F.lit(1)) * F.max("nt")).cast("long")
            .alias("padded_tokens"),
            (F.count(F.lit(1)) * F.max("nt") - F.sum("nt")).cast("long")
            .alias("padding_waste"),
        )
    )
