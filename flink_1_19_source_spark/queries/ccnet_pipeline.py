"""N7 — ninth composite: the CCNet pipeline order, end to end.

CCNet [Wenzek et al. 2020] processes a crawl as: paragraph-level
dedup FIRST (so boilerplate never pollutes the LM), then language id,
then LM scoring, then per-language perplexity BUCKETS (head / middle /
tail) — the split downstream consumers select from, not a hard gate.
This module chains exactly those certified cores in that order:
the chunk-dedup core of n1_chunk_dedup, the marker-argmax language id
of n4_lang_id, the exact-integer surprisal core of
n4_lm_surprisal_filter, and the NTILE bucket rule of n4_ccnet_buckets
— all over text REBUILT from the surviving chunks, so the LM trains
on the deduplicated corpus as the paper specifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import text_analysis as ta
from ..registry import register
from ..tables import load_table
from .llm2 import _chunks_and_kept
from .llm_surprisal import _surprisal_scores_from

_CCNET_ORACLE = r"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), chunks AS (
      SELECT doc_id, i AS chunk_id,
             array_to_string(w[i*10+1 : i*10+10], ' ') AS chunk_text
      FROM w, UNNEST(range(CAST(ceil(len(w)/10.0) AS BIGINT))) t(i)
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY chunk_text
                                   ORDER BY doc_id, chunk_id) AS rn
      FROM chunks
    ), kept AS (
      SELECT doc_id, chunk_id, chunk_text FROM ranked WHERE rn = 1
    ), reb AS (
      SELECT t.doc_id, t.n_chunks, COALESCE(k.n_kept, 0) AS n_kept,
             k.rebuilt
      FROM (SELECT doc_id, COUNT(*) AS n_chunks
            FROM chunks GROUP BY doc_id) t
      LEFT JOIN (SELECT doc_id, COUNT(*) AS n_kept,
                        string_agg(chunk_text, ' ' ORDER BY chunk_id)
                          AS rebuilt
                 FROM kept GROUP BY doc_id) k ON k.doc_id = t.doc_id
    ), toks AS (
      SELECT doc_id, n_chunks, n_kept,
             CASE WHEN rebuilt IS NULL THEN []
                  ELSE list_filter(string_split_regex(LOWER(rebuilt),
                                                      '\s+'),
                                   t -> t <> '') END AS tk
      FROM reb
    ), lid AS (
      SELECT doc_id,
        len(list_filter(tk, t -> list_contains(
          ['der','die','und','das','ist','nicht'], t))) AS s_de,
        len(list_filter(tk, t -> list_contains(
          ['the','and','of','to','is','it'], t))) AS s_en,
        len(list_filter(tk, t -> list_contains(
          ['el','los','y','es','una','para'], t))) AS s_es,
        len(list_filter(tk, t -> list_contains(
          ['le','les','et','est','une','pour'], t))) AS s_fr,
        len(list_filter(tk, t -> list_contains(
          ['de5','shi4','le5','zai4','he2','you3'], t))) AS s_zh
      FROM toks
    ), langd AS (
      SELECT t.doc_id, t.n_chunks, t.n_kept, t.tk,
             CASE WHEN t.n_kept = 0 THEN 'none'
                  ELSE CASE GREATEST(s_de, s_en, s_es, s_fr, s_zh)
                    WHEN s_de THEN 'de' WHEN s_en THEN 'en'
                    WHEN s_es THEN 'es' WHEN s_fr THEN 'fr'
                    ELSE 'zh' END END AS det_lang
      FROM toks t JOIN lid ON lid.doc_id = t.doc_id
    ), big AS (
      SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
      FROM (SELECT doc_id, tk, UNNEST(range(1, len(tk))) AS i
            FROM langd WHERE len(tk) >= 2)
    ), c2 AS (
      SELECT w1, w2, COUNT(*) AS n2 FROM big GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, SUM(n2) AS n1 FROM c2 GROUP BY w1
    ), v AS (
      SELECT COUNT(*) AS nv FROM (
        SELECT DISTINCT w1 AS w FROM big
        UNION SELECT DISTINCT w2 FROM big)
    ), scored AS (
      SELECT b.doc_id,
             LENGTH(bin((c1.n1 + v.nv) // (c2.n2 + 1))) - 1 AS bits
      FROM big b
      JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
      JOIN c1 ON b.w1 = c1.w1
      CROSS JOIN v
    ), agg AS (
      SELECT doc_id, SUM(bits) AS sum_bits, COUNT(*) AS n_bigrams
      FROM scored GROUP BY doc_id
    ), lab AS (
      SELECT l.doc_id,
             NTILE(3) OVER (PARTITION BY l.det_lang
                            ORDER BY (1000 * a.sum_bits) // a.n_bigrams,
                                     l.doc_id) AS tercile
      FROM agg a JOIN langd l ON l.doc_id = a.doc_id
    )
    SELECT l.det_lang AS lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(l.n_chunks) AS BIGINT) AS n_chunks,
           CAST(SUM(l.n_chunks - l.n_kept) AS BIGINT) AS n_dup_chunks,
           CAST(SUM(CASE WHEN b.tercile IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
           CAST(SUM(CASE WHEN b.tercile = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_head,
           CAST(SUM(CASE WHEN b.tercile = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_middle,
           CAST(SUM(CASE WHEN b.tercile = 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_tail,
           CAST(SUM(len(l.tk)) AS BIGINT) AS tokens_kept
    FROM langd l LEFT JOIN lab b ON b.doc_id = l.doc_id
    GROUP BY l.det_lang
"""


@register(
    "pipeline_ccnet_end_to_end",
    oracle=_CCNET_ORACLE,
    survey="N1 N4 N6 N7",
)
def pipeline_ccnet_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NINTH composite — the CCNet pipeline in the paper's stage order
    [Wenzek et al. 2020]: corpus-first CHUNK DEDUP (the n1_chunk_dedup
    core; documents are rebuilt from surviving chunks, so boilerplate
    is gone before anything downstream sees the text) → LANGUAGE ID on
    the deduplicated text (n4_lang_id's marker argmax; chunk-emptied
    docs report 'none') → exact-integer SURPRISAL scoring with the LM
    trained on the deduplicated corpus (`_surprisal_scores_from` — the
    paper's reason for dedup-first) → per-detected-language
    head/middle/tail perplexity TERCILES (n4_ccnet_buckets' NTILE
    rule).  One row per detected language with per-stage attrition:
    chunk totals and duplicates removed, scored-doc counts, the three
    bucket populations, and surviving token volume.

    100 TB shape: the corpus text is read ONCE (the chunk explode);
    dedup is one chunk-keyed shuffle; the LM is the certified
    one-shuffle bigram join over the REBUILT tokens; buckets are one
    rank window per language; the report is ~6 rows."""
    d = load_table(spark, sf_dir, "documents")
    chunks, kept = _chunks_and_kept(d)
    reb = (
        chunks.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_chunks"))
        .join(
            kept.groupBy("doc_id").agg(
                F.count(F.lit(1)).alias("n_kept"),
                F.array_join(
                    F.expr(
                        "transform(array_sort(collect_list("
                        "struct(chunk_id, chunk_text))), x -> x.chunk_text)"
                    ),
                    " ",
                ).alias("rebuilt"),
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id", "n_chunks",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"), "rebuilt",
        )
    )
    langd = reb.select(
        "doc_id", "n_chunks", "n_kept",
        F.coalesce(ta.tokens(F.col("rebuilt")), F.array()).alias("tk"),
        F.when(F.col("n_kept") == 0, F.lit("none"))
        .otherwise(ta.lang_id(F.col("rebuilt")))
        .alias("det_lang"),
    ).localCheckpoint(eager=True)
    scores = _surprisal_scores_from(langd.select("doc_id", "tk")).select(
        "doc_id", "mean_millibits"
    )
    wt = Window.partitionBy("det_lang").orderBy("mean_millibits", "doc_id")
    lab = (
        scores.join(langd.select("doc_id", "det_lang"), "doc_id")
        .withColumn("tercile", F.ntile(3).over(wt))
        .select("doc_id", "tercile")
    )
    full = langd.join(lab, "doc_id", "left")
    return full.groupBy(F.col("det_lang").alias("lang")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chunks").cast("long").alias("n_chunks"),
        F.sum(F.col("n_chunks") - F.col("n_kept")).cast("long")
        .alias("n_dup_chunks"),
        F.sum(F.when(F.col("tercile").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_scored"),
        F.sum(F.when(F.col("tercile") == 1, 1).otherwise(0)).cast("long")
        .alias("n_head"),
        F.sum(F.when(F.col("tercile") == 2, 1).otherwise(0)).cast("long")
        .alias("n_middle"),
        F.sum(F.when(F.col("tercile") == 3, 1).otherwise(0)).cast("long")
        .alias("n_tail"),
        F.sum(F.size("tk")).cast("long").alias("tokens_kept"),
    )
