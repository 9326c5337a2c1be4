"""N7 — the TRAINING MANIFEST: the artifact a training run consumes.

SEVENTH composite: token-budget epoch repeats x deterministic shuffle
x token-contiguous shard cuts, emitted as the instance-level manifest
(source, shard_no, pos_in_shard, doc_id, rep, nt) a sequence loader
reads.  Every stage is a certified device — the Muennighoff repeat
schedule (shared _epoch_doc_repeats core), the md5 order key (the
house reproducible-shuffle contract), and budgeted shard cuts as one
per-source cumulative window (shard = start-offset div B, so an
instance belongs to the shard where it starts — how loaders actually
cut shards, and embarrassingly parallel at any corpus size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import text_analysis as ta
from ..registry import register
from ..tables import load_table
from .llm_surprisal import _epoch_doc_repeats

_SHARD_TOKENS = 2048

_MANIFEST_ORACLE = rf"""
    WITH per_doc AS (
      SELECT source, doc_id,
             CAST(len(list_filter(string_split_regex(LOWER(text), '\s+'),
                       t -> t <> '')) AS BIGINT) AS nt
      FROM documents
    ), pd AS (
      SELECT * FROM per_doc WHERE nt > 0
    ), src AS (
      SELECT source, CAST(SUM(nt) AS BIGINT) AS t_tokens, COUNT(*) AS n_docs
      FROM pd GROUP BY source
    ), tot AS (
      SELECT SUM(t_tokens) AS tt, COUNT(*) AS ns FROM src
    ), alloc AS (
      SELECT source, t_tokens,
             LEAST(4, ((4 * tot.tt) // tot.ns) // t_tokens) AS full_epochs,
             CASE WHEN ((4 * tot.tt) // tot.ns) // t_tokens >= 4 THEN 0
                  ELSE ((4 * tot.tt) // tot.ns) % t_tokens
             END AS rem
      FROM src, tot
    ), ranked AS (
      SELECT p.source, p.doc_id, p.nt,
             SUM(p.nt) OVER (
               PARTITION BY p.source
               ORDER BY md5(CONCAT('epoch:', CAST(p.doc_id AS VARCHAR))),
                        p.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS csum
      FROM pd p
    ), reps AS (
      SELECT r.source, r.doc_id, r.nt,
             a.full_epochs
             + CASE WHEN r.csum <= a.rem THEN 1 ELSE 0 END AS repeats
      FROM ranked r JOIN alloc a ON a.source = r.source
    ), inst AS (
      SELECT source, doc_id, nt,
             UNNEST(range(1, CAST(repeats + 1 AS BIGINT))) AS rep
      FROM reps WHERE repeats >= 1
    ), keyed AS (
      SELECT *, md5(CONCAT('manifest:', CAST(doc_id AS VARCHAR), ':',
                           CAST(rep AS VARCHAR))) AS hk
      FROM inst
    ), cs AS (
      SELECT source, doc_id, nt, rep, hk,
             SUM(nt) OVER (
               PARTITION BY source ORDER BY hk, doc_id, rep
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS csum
      FROM keyed
    )
    SELECT source,
           CAST((csum - nt) // {_SHARD_TOKENS} AS BIGINT) AS shard_no,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY source, (csum - nt) // {_SHARD_TOKENS}
               ORDER BY hk, doc_id, rep) AS BIGINT) AS pos_in_shard,
           doc_id, CAST(rep AS BIGINT) AS rep, nt
    FROM cs
"""


@register(
    "pipeline_training_manifest",
    oracle=_MANIFEST_ORACLE,
    survey="N7 N6",
)
def pipeline_training_manifest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SEVENTH composite: the TRAINING MANIFEST — repeat schedule →
    deterministic shuffle → token-budgeted shard cuts, as instance
    rows (source, shard_no, pos_in_shard, doc_id, rep, nt).  Repeats
    come from the certified token-budget core (full epochs + the
    hash-ranked partial epoch, per source); each (doc, repeat)
    instance gets the reproducible md5 order key; shards of
    ~2048 tokens are cut along that order with ONE per-source
    cumulative window (shard = start-offset div B).  Same seed ⇒
    byte-identical manifest on any engine — the data-order
    reproducibility contract a training run needs to resume or audit.
    100 TB shape: the schedule is domain-sized, the shuffle key is
    map-side, and the shard cut is a per-source window — no global
    sort anywhere; shard files then write out partitioned by
    (source, shard_no)."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "source", "doc_id",
        F.size(ta.tokens(F.col("text"))).cast("long").alias("nt"),
    ).filter(F.col("nt") > 0)
    reps = _epoch_doc_repeats(per_doc)
    inst = (
        per_doc.join(reps, "doc_id")
        .filter(F.col("repeats") >= 1)
        .select(
            "source", "doc_id", "nt",
            F.explode(
                F.sequence(F.lit(1), F.col("repeats"))
            ).alias("rep"),
        )
    )
    keyed = inst.withColumn(
        "hk",
        F.md5(
            F.concat(
                F.lit("manifest:"), F.col("doc_id").cast("string"),
                F.lit(":"), F.col("rep").cast("string"),
            )
        ),
    )
    worder = Window.partitionBy("source").orderBy("hk", "doc_id", "rep")
    cs = keyed.withColumn(
        "csum",
        F.sum("nt").over(
            worder.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn(
        "shard_no",
        F.expr(f"(csum - nt) div {_SHARD_TOKENS}").cast("long"),
    )
    wpos = Window.partitionBy("source", "shard_no").orderBy(
        "hk", "doc_id", "rep"
    )
    return cs.select(
        "source", "shard_no",
        F.row_number().over(wpos).cast("long").alias("pos_in_shard"),
        "doc_id", F.col("rep").cast("long").alias("rep"), "nt",
    )
