"""N4 continuation — trained text classification: char-trigram Naive
Bayes language identification with exact-integer surprisal scores (the
CLD/langdetect family's algorithm, engine-replayable edition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table


def trigram_nb_classify(d: DataFrame) -> DataFrame:
    """Char-trigram Naive Bayes over (doc_id, lang, text): train
    add-one-smoothed per-language trigram models, classify every doc by
    minimum total surprisal in EXACT whole bits — bit_length((T_l + V)
    // (n + 1)) - 1, the float-free floor-log2 — ties broken lang asc.
    Deterministic and engine-replayable; see the query docstring for
    the scale shape.  Returns (doc_id, true_lang, pred_lang, correct).
    """
    from ..operators import text_analysis as ta

    norm = d.select(
        "doc_id", "lang", ta.normalize(F.col("text")).alias("t")
    ).filter(F.char_length("t") >= 3)
    tris = norm.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, char_length(t) - 2),"
                " i -> substring(t, i, 3))"
            )
        ).alias("tri"),
    )
    doc_tris = tris.groupBy(
        "doc_id", F.col("lang").alias("true_lang"), "tri"
    ).agg(F.count(F.lit(1)).alias("c"))
    train = tris.groupBy("lang", "tri").agg(F.count(F.lit(1)).alias("n"))
    totals = train.groupBy("lang").agg(F.sum("n").alias("tl"))
    vocab = train.select("tri").distinct().groupBy().agg(
        F.count(F.lit(1)).alias("v")
    )
    bits = (
        F.length(F.bin(F.expr("(tl + v) div (coalesce(n, 0) + 1)"))) - 1
    )
    scored = (
        doc_tris.crossJoin(
            F.broadcast(totals.withColumnRenamed("lang", "cand"))
        )
        .crossJoin(F.broadcast(vocab))
        .join(
            train.withColumnRenamed("lang", "m_lang").withColumnRenamed(
                "tri", "tri_m"
            ),
            (F.col("cand") == F.col("m_lang"))
            & (F.col("tri") == F.col("tri_m")),
            "left",
        )
        .groupBy("doc_id", "true_lang", "cand")
        .agg(F.sum(F.col("c") * bits).alias("bits"))
    )
    w = Window.partitionBy("doc_id").orderBy("bits", "cand")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id", "true_lang",
            F.col("cand").alias("pred_lang"),
            (F.col("cand") == F.col("true_lang")).alias("correct"),
        )
    )


@register(
    "n4_lang_id_trigram_nb",
    oracle=r"""
    WITH norm AS (
      SELECT doc_id, lang,
             TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')) AS t
      FROM documents
    ), tris AS (
      SELECT doc_id, lang, substring(t, i, 3) AS tri
      FROM (SELECT doc_id, lang, t, UNNEST(range(1, len(t) - 1)) AS i
            FROM norm WHERE len(t) >= 3)
    ), doc_tris AS (
      SELECT doc_id, lang AS true_lang, tri, COUNT(*) AS c
      FROM tris GROUP BY doc_id, lang, tri
    ), train AS (
      SELECT lang, tri, COUNT(*) AS n FROM tris GROUP BY lang, tri
    ), totals AS (
      SELECT lang, SUM(n) AS tl FROM train GROUP BY lang
    ), vocab AS (
      SELECT COUNT(DISTINCT tri) AS v FROM train
    ), scored AS (
      SELECT d.doc_id, d.true_lang, l.lang AS cand,
             SUM(d.c * (LENGTH(bin((l.tl + vocab.v)
                                   // (COALESCE(tr.n, 0) + 1))) - 1))
               AS bits
      FROM doc_tris d
      CROSS JOIN totals l
      CROSS JOIN vocab
      LEFT JOIN train tr ON tr.lang = l.lang AND tr.tri = d.tri
      GROUP BY d.doc_id, d.true_lang, l.lang
    ), best AS (
      SELECT doc_id, true_lang, cand AS pred_lang,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY bits, cand) AS rk
      FROM scored
    )
    SELECT doc_id, true_lang, pred_lang,
           pred_lang = true_lang AS correct
    FROM best WHERE rk = 1
    """,
    survey="N4",
)
def n4_lang_id_trigram_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram Naive Bayes language ID — the TRAINED classifier
    behind CLD/langdetect, next to n4_lang_id's stopword heuristic:
    per-language trigram models with add-one smoothing, documents
    classified by minimum total surprisal, every score an exact integer
    (bits = bit_length((T_l + V) // (n + 1)) - 1, the same float-free
    floor-log2 the LM quality gate certifies) so both engines pick
    identical argmins — the driver hash certifies the classifier's
    DECISIONS end-to-end, not just its plumbing.

    Honest caveat, verified: this fixture's `lang` labels are
    independent of its synthetic text (the stopword heuristic also
    scores at chance), so accuracy here is meaningless by construction;
    the classifier's discriminative power is pinned in
    tests/test_r8_ops.py on a PLANTED corpus with real per-language
    character distributions (>90% accuracy through this same core).

    100 TB shape: training is one (lang, trigram)-keyed count shuffle;
    scoring joins doc trigrams against the model co-partitioned on the
    trigram key with a bounded x|langs| candidate fan-out; the
    per-language totals and vocab scalar broadcast."""
    return trigram_nb_classify(load_table(spark, sf_dir, "documents"))
