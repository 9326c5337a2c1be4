"""End-to-end training-data-pipeline queries (SURVEY §2.11 N2/N4/N6).

The composed shapes a 100 TB pretraining-data run actually executes —
not single operators but the pipelines built from them:

* deterministic stratified sampling and train/val/test assignment
  (N6, operators/sampling.py) — hash-gated, engine-reproducible;
* near-dup *removal* — pair mining → connected components → canonical
  keep → filtered corpus, the full N2 path joined up;
* quality filtering — keep/drop with a reason code per document (N4).

Everything here is pure Catalyst expressions plus the already-proven
operators; every query is DuckDB-oracled, including the recursive-CTE
replication of connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, sampling, text_analysis as ta
from ..registry import register
from ..tables import load_table


# --------------------------------------------------------------------------
# N6 — deterministic sampling / splits
# --------------------------------------------------------------------------
#: per-language sampling rates for the stratified-sample query; hex
#: thresholds are sampling.threshold_hex(rate) and are inlined in the
#: oracle so both engines apply the identical hash gate.
_RATES = {"en": 0.25, "fr": 0.5, "es": 0.75, "zh": 0.125, "de": 1.0}


@register(
    "n6_stratified_sample",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5('r3:' || CAST(doc_id AS VARCHAR)), 1, 4) <
          CASE lang WHEN 'en' THEN '4000' WHEN 'fr' THEN '8000'
                    WHEN 'es' THEN 'c000' WHEN 'zh' THEN '2000'
                    WHEN 'de' THEN 'g' ELSE '0000' END
    """,
    survey="N6",
)
def n6_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language downsampling with a deterministic hash gate — the
    reproducible replacement for ``df.sampleBy`` (same row set on every
    run, every engine, any partitioning). en 25%, fr 50%, es 75%,
    zh 12.5%, de 100%."""
    d = load_table(spark, sf_dir, "documents")
    return sampling.stratified_sample(
        d, "doc_id", "lang", _RATES, salt="r3"
    ).select("doc_id", "lang", "source")


@register(
    "n6_train_val_test_split",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) < 'c000'
                  THEN 'train'
                WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) < 'e000'
                  THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    survey="N6",
)
def n6_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 75/12.5/12.5 train/val/test assignment by document
    id hash — the same document lands in the same split across pipeline
    re-runs and engines (leak-free eval sets)."""
    d = load_table(spark, sf_dir, "documents")
    split = sampling.assign_split(
        F.col("doc_id"), "split", {"train": 0.75, "val": 0.125, "test": 0.125}
    )
    return d.select("doc_id", "lang", split)


# --------------------------------------------------------------------------
# N2 — end-to-end near-dup removal
# --------------------------------------------------------------------------
@register(
    "n2_dedup_end_to_end",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(LOWER(text), '\\s+'), t -> t <> '') AS tk
      FROM documents WHERE doc_id < 200
    ), sh AS (
      SELECT doc_id, list_distinct(
        CASE WHEN len(tk) >= 3 THEN
          list_transform(range(0, len(tk) - 2),
                         i -> array_to_string(list_slice(tk, i + 1, i + 3), ' '))
        ELSE [array_to_string(tk, ' ')] END) AS shingles
      FROM toks
    ), ex0 AS (
      SELECT doc_id, UNNEST(shingles) AS s FROM sh
    ), dfc AS (
      SELECT s, COUNT(*) AS df FROM ex0 GROUP BY s
    ), ex AS (
      SELECT ex0.doc_id, ex0.s FROM ex0 JOIN dfc ON ex0.s = dfc.s
      WHERE dfc.df <= 10
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS sz FROM ex GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), edges AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= 0.2
    ), und AS (
      SELECT id_a AS src, id_b AS dst FROM edges
      UNION SELECT id_b, id_a FROM edges
    ), reach AS (
      WITH RECURSIVE r AS (
        SELECT src, dst FROM und
        UNION
        SELECT r.src, u.dst FROM r JOIN und u ON r.dst = u.src
      ) SELECT * FROM r
    ), comp AS (
      SELECT src AS id, LEAST(src, MIN(dst)) AS component
      FROM reach GROUP BY src
    )
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d
    WHERE d.doc_id < 200
      AND d.doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
    """,
    survey="N2 N1",
)
def n2_dedup_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full near-dup *removal* pipeline, joined up: stop-shingle-
    capped exact-Jaccard pair mining → connected components → keep the
    min-id canonical per cluster → anti-join the rest out of the
    corpus. This is the query a data pipeline runs nightly; the
    per-stage operators are certified individually by
    n2_ngram_jaccard_capped / n2_dedup_clusters, and the oracle here
    replays the whole chain (recursive CTE for the components).

    Scale: the pair miner is df-capped (fan-out ≤ cap² per shingle),
    components is O(diameter) rounds of one key shuffle each, and the
    final anti-join broadcasts only the drop-list (near-dup clusters
    are a small fraction of the corpus)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = dedup.ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.2, stop_shingle_df_cap=10
    )
    comp = dedup.connected_components(pairs)
    drop = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    return d.join(F.broadcast(drop), "doc_id", "left_anti").select(
        "doc_id", "lang", "n_chars"
    )


# --------------------------------------------------------------------------
# N4 — quality filtering with reason codes
# --------------------------------------------------------------------------
@register(
    "n4_quality_filter",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(LOWER(text), '\\s+'),
                             t -> t <> '')) AS n_tokens,
             ROUND(CAST(len(list_distinct(
                     list_filter(string_split_regex(LOWER(text), '\\s+'),
                                 t -> t <> ''))) AS DOUBLE)
                   / len(list_filter(string_split_regex(LOWER(text), '\\s+'),
                                     t -> t <> '')), 9) AS uniq_ratio,
             ROUND(CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                   / len(list_filter(string_split_regex(LOWER(text), '\\s+'),
                                     t -> t <> '')), 9) AS avg_token_len
      FROM documents
    )
    SELECT doc_id, n_tokens, uniq_ratio, avg_token_len,
           CASE WHEN n_tokens < 20 THEN 'too_short'
                WHEN n_tokens > 90 THEN 'too_long'
                WHEN uniq_ratio < 0.35 THEN 'too_repetitive'
                WHEN avg_token_len < 4.0 OR avg_token_len > 5.0
                  THEN 'weird_token_len'
                ELSE 'ok' END AS reason,
           CASE WHEN n_tokens < 20 THEN 'too_short'
                WHEN n_tokens > 90 THEN 'too_long'
                WHEN uniq_ratio < 0.35 THEN 'too_repetitive'
                WHEN avg_token_len < 4.0 OR avg_token_len > 5.0
                  THEN 'weird_token_len'
                ELSE 'ok' END = 'ok' AS keep
    FROM s
    """,
    survey="N4",
)
def n4_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality gate: token count, token-uniqueness ratio
    (repetition detector) and average token length, folded into a
    keep/drop decision with the first failing rule as the reason code —
    the filter stage of a pretraining-data pipeline. One scan, pure
    expressions, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    toks = ta.tokens(F.col("text"))
    n_tokens = F.size(toks)
    uniq_ratio = F.round(
        F.size(F.array_distinct(toks)).cast("double") / n_tokens, 9
    )
    avg_token_len = F.round(
        F.length(F.regexp_replace(F.col("text"), " ", "")).cast("double") / n_tokens, 9
    )
    reason = (
        F.when(n_tokens < 20, "too_short")
        .when(n_tokens > 90, "too_long")
        .when(uniq_ratio < 0.35, "too_repetitive")
        .when((avg_token_len < 4.0) | (avg_token_len > 5.0), "weird_token_len")
        .otherwise("ok")
    )
    return d.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        uniq_ratio.alias("uniq_ratio"),
        avg_token_len.alias("avg_token_len"),
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
    )


# --------------------------------------------------------------------------
# N1 — dedup analytics: cross-source duplicate matrix
# --------------------------------------------------------------------------
@register(
    "n1_cross_source_dup_matrix",
    oracle="""
    WITH fp AS (
      SELECT doc_id, source,
             MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    )
    SELECT LEAST(a.source, b.source) AS src_a,
           GREATEST(a.source, b.source) AS src_b,
           COUNT(*) AS n_dup_pairs
    FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
    survey="N1 N4",
)
def n1_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup *analytics*: which source pairs share duplicated documents —
    the report a crawl-mixing decision reads before dropping a feed.
    One self-join on the 32-byte normalized fingerprint (never the text),
    so the 100 TB shuffle moves digests, not documents."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", ta.fingerprint(F.col("text")).alias("fp")
    )
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.least(F.col("a.source"), F.col("b.source")).alias("src_a"),
            F.greatest(F.col("a.source"), F.col("b.source")).alias("src_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_dup_pairs"))
    )


# --------------------------------------------------------------------------
# N6 — corpus mixing: data-derived rebalance gate
# --------------------------------------------------------------------------
@register(
    "n6_mix_rebalance",
    oracle="""
    WITH stats AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM stats),
    rates AS (
      SELECT lang, n, LEAST(1.0, (0.2 * t) / n) AS rate FROM stats, tot
    ),
    gated AS (
      SELECT d.doc_id, d.lang, r.rate
      FROM documents d JOIN rates r ON d.lang = r.lang
      WHERE CAST(concat('0x', substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8))
                 AS BIGINT)
            < CAST(FLOOR(r.rate * 4294967296) AS BIGINT)
    )
    SELECT lang, ROUND(ANY_VALUE(rate), 9) AS rate, COUNT(*) AS n_kept
    FROM gated GROUP BY lang
    """,
    survey="N6",
)
def n6_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing toward a target distribution (uniform 20% per
    language): per-stratum keep rates are DERIVED FROM THE DATA
    (target/actual, capped at 1), then applied as a deterministic 32-bit
    md5 gate — the same document survives on every engine and every
    re-run. The rates join is a broadcast (one row per stratum); the gate
    itself is map-only. This is n6_stratified_sample's production sibling:
    rates as data, not constants."""
    d = load_table(spark, sf_dir, "documents")
    stats = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    tot = stats.agg(F.sum("n").cast("double").alias("t"))
    rates = stats.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.least(F.lit(1.0), (F.lit(0.2) * F.col("t")) / F.col("n")).alias("rate"),
    )
    h32 = F.conv(
        F.substring(F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    gated = (
        d.join(F.broadcast(rates), "lang")
        .filter(h32 < F.floor(F.col("rate") * F.lit(4294967296.0)).cast("long"))
    )
    return gated.groupBy("lang").agg(
        F.round(F.first("rate"), 9).alias("rate"),
        F.count(F.lit(1)).alias("n_kept"),
    )


@register(
    "n6_curriculum_order",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id) AS stratum_rank
      FROM documents
    )
    SELECT doc_id, lang, CAST(stratum_rank AS BIGINT) AS stratum_rank,
           CAST(ROW_NUMBER() OVER (ORDER BY stratum_rank, lang, doc_id)
                AS BIGINT) AS global_pos
    FROM ranked
    """,
    survey="N6 O1 T1",
)
def n6_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic curriculum ordering: rank documents within each
    language stratum by a quality proxy (length), then interleave the
    strata round-robin — rank-1 docs of every language first, then
    rank-2, ... The output is a reproducible training manifest position
    for every document.  Two distributed phases: a per-stratum window
    (hash exchange on lang) and the global interleave via the house
    range-partition pattern (dense_rank_distributed: repartitionByRange
    on the interleave key, per-range-partition local row_number, plus
    broadcast per-partition offsets) — (stratum_rank, lang, doc_id) is
    unique per row, so the dense rank IS the global position, and no
    single task ever sorts the whole corpus (an unpartitioned
    row_number window would plan as Exchange SinglePartition)."""
    from pyspark.sql.window import Window

    from ..operators.suffix_array import dense_rank_distributed

    d = load_table(spark, sf_dir, "documents")
    ranked = d.select(
        "doc_id",
        "lang",
        F.row_number()
        .over(Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id")))
        .cast("long")
        .alias("stratum_rank"),
    )
    return dense_rank_distributed(
        ranked, ["stratum_rank", "lang", "doc_id"], "global_pos"
    ).select("doc_id", "lang", "stratum_rank", "global_pos")


# --------------------------------------------------------------------------
# The flagship composite: full corpus pipeline in ONE oracled query
# --------------------------------------------------------------------------
def _corpus_e2e_oracle() -> str:
    from ..operators.corpus import EMAIL_RE, IPV4_RE, PHONE_RE

    return f"""
    WITH injected AS (
      SELECT doc_id, lang,
             text ||
             CASE WHEN doc_id % 7 = 0
                  THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                  ELSE '' END ||
             CASE WHEN doc_id % 11 = 0
                  THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                       || '.0.' || CAST(doc_id % 100 AS VARCHAR)
                  ELSE '' END ||
             CASE WHEN doc_id % 13 = 0
                  THEN ' call +1-555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                       || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END AS text
      FROM documents
    ), red AS (
      SELECT doc_id, lang,
             regexp_replace(regexp_replace(regexp_replace(text,
                 '{EMAIL_RE}', '<EMAIL>', 'g'),
                 '{PHONE_RE}', '<PHONE>', 'g'),
                 '{IPV4_RE}', '<IP>', 'g') AS text
      FROM injected
    ), tok AS (
      SELECT doc_id, lang, text,
             list_filter(string_split_regex(LOWER(text), '\\s+'),
                         t -> t <> '') AS tk
      FROM red
    ), flag AS (
      SELECT doc_id, lang, text, tk, len(tk) AS n_tokens,
             NOT (len(tk) < 20 OR len(tk) > 90
                  OR CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) < 0.35
                  OR CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE) / len(tk) < 4.0
                  OR CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE) / len(tk) > 5.0)
               AS q_ok
      FROM tok
    ), bmark AS (
      SELECT doc_id FROM documents WHERE doc_id % 10 = 7
    ), dedup AS (
      SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY md5(text)
                                        ORDER BY doc_id) AS rn
      FROM flag WHERE q_ok
    ), gsets AS (
      SELECT doc_id, list_distinct(
        CASE WHEN len(tk) >= 5 THEN
          list_transform(range(0, len(tk) - 4),
                         i -> array_to_string(list_slice(tk, i + 1, i + 5), ' '))
        ELSE [array_to_string(tk, ' ')] END) AS grams
      FROM flag
    ), bgrams AS (
      SELECT DISTINCT UNNEST(grams) AS g FROM gsets
      WHERE doc_id IN (SELECT doc_id FROM bmark)
    ), cgrams AS (
      SELECT g.doc_id, UNNEST(g.grams) AS g
      FROM gsets g JOIN dedup d ON d.doc_id = g.doc_id AND d.rn = 1
      WHERE g.doc_id NOT IN (SELECT doc_id FROM bmark)
    ), contam AS (
      SELECT c.doc_id,
             ROUND(CAST(COUNT(b.g) AS DOUBLE) / COUNT(*), 9) AS rate
      FROM cgrams c LEFT JOIN bgrams b ON c.g = b.g
      GROUP BY c.doc_id
    ), assigned AS (
      SELECT f.doc_id, f.lang, f.n_tokens,
             CASE
               WHEN f.doc_id IN (SELECT doc_id FROM bmark) THEN 'benchmark'
               WHEN NOT f.q_ok THEN 'dropped_quality'
               WHEN d.rn > 1 THEN 'dropped_dup'
               WHEN c.rate > 0.2 THEN 'dropped_contaminated'
               WHEN substr(md5('split:' || CAST(f.doc_id AS VARCHAR)), 1, 4)
                      < 'c000' THEN 'train'
               WHEN substr(md5('split:' || CAST(f.doc_id AS VARCHAR)), 1, 4)
                      < 'e000' THEN 'val'
               ELSE 'test'
             END AS split
      FROM flag f
      LEFT JOIN dedup d ON d.doc_id = f.doc_id
      LEFT JOIN contam c ON c.doc_id = f.doc_id
    )
    SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM assigned GROUP BY split, lang
    """


@register("pipeline_corpus_end_to_end", oracle=_corpus_e2e_oracle(),
          survey="N1 N4 N6")
def pipeline_corpus_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE composite: a full pretraining-data pipeline in one oracled
    query — PII redaction → quality gate → corpus-first exact dedup →
    benchmark-contamination drop (>20% 5-gram overlap) → deterministic
    train/val/test assignment — reported as per-(split, lang) doc/token
    counts, with every dropped stage visible as a pseudo-split. Each
    stage reuses the certified operator (corpus.pii_redact,
    text_analysis.tokens, window keep-first, corpus.contamination,
    md5-gate splits); the oracle chains the same stages in SQL, so the
    hash certifies the whole pipeline's composition, not just its
    parts."""
    from pyspark.sql.window import Window

    from ..operators import corpus as corp
    from ..operators import text_analysis as ta
    from .llm2 import _inject_pii

    d = load_table(spark, sf_dir, "documents")
    injected = _inject_pii(d).join(d.select("doc_id", "lang"), "doc_id")
    red = injected.select(
        "doc_id", "lang", corp.pii_redact(F.col("text")).alias("text")
    )
    toks = ta.tokens(F.col("text"))
    n_tokens = F.size(toks)
    uq = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    atl = F.length(F.regexp_replace(F.col("text"), " ", "")).cast("double") / n_tokens
    flag = red.select(
        "doc_id",
        "lang",
        "text",
        n_tokens.cast("long").alias("n_tokens"),
        (
            ~(
                (n_tokens < 20)
                | (n_tokens > 90)
                | (uq < 0.35)
                | (atl < 4.0)
                | (atl > 5.0)
            )
        ).alias("q_ok"),
    ).localCheckpoint(eager=True)

    bmark = F.col("doc_id") % 10 == 7
    dedup = (
        flag.filter("q_ok")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(F.md5("text")).orderBy("doc_id")
            ),
        )
        .select("doc_id", "rn")
    )
    survivors = (
        flag.join(dedup, "doc_id", "left")
        .filter(~bmark & F.col("q_ok") & (F.col("rn") == 1))
        .select("doc_id", "text")
    )
    bench = flag.filter(bmark).select("doc_id", "text")
    contam = corp.contamination(survivors, bench, "doc_id", "text", n=5).select(
        "doc_id", F.col("contamination").alias("rate")
    )

    h = F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 4)
    assigned = (
        flag.join(dedup, "doc_id", "left")
        .join(contam, "doc_id", "left")
        .select(
            "lang",
            "n_tokens",
            F.when(bmark, "benchmark")
            .when(~F.col("q_ok"), "dropped_quality")
            .when(F.col("rn") > 1, "dropped_dup")
            .when(F.col("rate") > 0.2, "dropped_contaminated")
            .when(h < "c000", "train")
            .when(h < "e000", "val")
            .otherwise("test")
            .alias("split"),
        )
    )
    return assigned.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


# --------------------------------------------------------------------------
# N7 #2 — multimodal pipeline: model gate → verbatim-overlap dedup →
#          real decode → per-language corpus report
# --------------------------------------------------------------------------
def _pme_oracle() -> str:
    from .llm2 import _QC_B_MILLI, _QC_MILLI, _SSD_DF_CAP, _SSD_K

    w = _QC_MILLI
    return f"""
    WITH base AS (
      SELECT doc_id, text, lang FROM documents WHERE doc_id < 300
    ), feats AS (
      SELECT doc_id, text, lang,
             {w[0]} * CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                           t -> t <> '')) AS BIGINT)
             + {w[1]} * CAST(LEN(text) AS BIGINT)
             + {w[2]} * CAST(LEN(text)
                 - LEN(regexp_replace(text, '[.,!?;]', '', 'g')) AS BIGINT)
             + {w[3]} * CAST(LEN(text)
                 - LEN(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT)
             + {w[4]} * CAST(LEN(text)
                 - LEN(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT)
             + {_QC_B_MILLI} AS milli
      FROM base
    ), gated AS (
      SELECT * FROM feats WHERE milli >= 0
    ), g AS (
      SELECT doc_id, UNNEST(range(1, LEN(text) - {_SSD_K} + 2)) AS pos, text
      FROM gated WHERE LEN(text) >= {_SSD_K}
    ), h AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(substr(text, pos, {_SSD_K})), 1, 15))
                  AS BIGINT) AS hg
      FROM g
    ), ok AS (
      SELECT hg FROM h GROUP BY hg
      HAVING COUNT(DISTINCT doc_id) <= {_SSD_DF_CAP}
    ), hc AS (SELECT h.* FROM h JOIN ok ON h.hg = ok.hg),
    dupped AS (
      SELECT DISTINCT b.doc_id
      FROM hc a JOIN hc b ON a.hg = b.hg AND a.doc_id < b.doc_id
    ), survivors AS (
      SELECT g2.doc_id, g2.lang FROM gated g2
      WHERE g2.doc_id NOT IN (SELECT doc_id FROM dupped)
    ), px AS (
      SELECT s.doc_id, s.lang,
             s.doc_id % 13 + 4 AS w, s.doc_id % 7 + 3 AS h,
             UNNEST(range(0, (s.doc_id % 13 + 4) * (s.doc_id % 7 + 3))) AS i
      FROM survivors s
    ), decoded AS (
      SELECT doc_id, lang,
             CAST(COUNT(*) AS BIGINT) AS n_px,
             CAST(SUM((doc_id*31 + (i // w)*17 + (i % w)*7) % 256)
                  AS BIGINT) AS sum_r
      FROM px GROUP BY doc_id, lang
    ), stage_counts AS (
      SELECT (SELECT COUNT(*) FROM base) AS n_base,
             (SELECT COUNT(*) FROM gated) AS n_gated,
             (SELECT COUNT(*) FROM survivors) AS n_deduped
    )
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(d.n_px) AS BIGINT) AS total_px,
           CAST(SUM(d.sum_r) AS BIGINT) AS total_r,
           CAST(MAX(sc.n_base) AS BIGINT) AS n_base,
           CAST(MAX(sc.n_gated) AS BIGINT) AS n_gated,
           CAST(MAX(sc.n_deduped) AS BIGINT) AS n_deduped
    FROM decoded d CROSS JOIN stage_counts sc
    GROUP BY d.lang
    """


@register("pipeline_media_end_to_end", oracle=_pme_oracle(), survey="N7 N4 N2 N5")
def pipeline_media_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second end-to-end pipeline (N7): model-score gate (the r6 batch
    inference stage) → verbatim substring-overlap dedup (drop any doc
    sharing a ≥30-char span with a lower-id survivor) → REAL PNG decode
    of the survivors' media → per-language corpus report with per-stage
    attrition columns.  Every stage is an independently certified r6
    operator; the composition is oracled as ONE query so stage coupling
    (gate-then-dedup ordering, dedup scoped to gated docs only) is
    value-verified too.  Scale shape: gate is map-only, dedup is the
    df-capped gram-hash join, decode is map-only — one keyed shuffle
    plus the final small agg."""
    from .llm_media_stages import _png_feature_pipeline
    from .llm2 import _QC_B_MILLI, _QC_MILLI, _SSD_DF_CAP, _SSD_K

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    t = F.col("text")

    def count_removed(pattern: str):
        return (
            F.length(t) - F.length(F.regexp_replace(t, pattern, ""))
        ).cast("long")

    w = list(_QC_MILLI)
    # integer milli-unit gate (see llm2._QC_MILLI): boundary docs cannot
    # flip between engines' float/decimal literal semantics
    milli = (
        w[0] * F.size(
            F.filter(F.split(t, r"\s+"), lambda x: x != F.lit(""))
        ).cast("long")
        + w[1] * F.length(t).cast("long")
        + w[2] * count_removed(r"[.,!?;]")
        + w[3] * count_removed(r"[0-9]")
        + w[4] * count_removed(r"[A-Z]")
        + F.lit(_QC_B_MILLI)
    )
    gated = d.select("doc_id", "text", "lang").filter(milli >= 0)
    n_base = d.count()
    n_gated = gated.count()

    g = gated.filter(F.length("text") >= _SSD_K).select(
        "doc_id",
        F.col("text"),
        F.explode(
            F.sequence(F.lit(1), F.length("text") - F.lit(_SSD_K - 1))
        ).alias("pos"),
    )
    h = g.select(
        "doc_id",
        F.conv(
            F.substring(
                F.md5(F.substring(F.col("text"), F.col("pos"), _SSD_K)), 1, 15
            ),
            16,
            10,
        )
        .cast("long")
        .alias("hg"),
    )
    ok = (
        h.groupBy("hg")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") <= _SSD_DF_CAP)
        .select("hg")
    )
    hc = h.join(ok, "hg", "left_semi")
    dupped = (
        hc.alias("a")
        .join(
            hc.alias("b"),
            (F.col("a.hg") == F.col("b.hg"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
    )
    survivors = gated.select("doc_id", "lang").join(
        dupped, "doc_id", "left_anti"
    )
    n_deduped = survivors.count()

    decoded = _png_feature_pipeline(survivors.select("doc_id")).select(
        "doc_id", "n_px", "sum_r"
    )
    return (
        survivors.join(decoded, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_px").alias("total_px"),
            F.sum("sum_r").alias("total_r"),
        )
        .select(
            "lang",
            "n_docs",
            "total_px",
            "total_r",
            F.lit(n_base).alias("n_base"),
            F.lit(n_gated).alias("n_gated"),
            F.lit(n_deduped).alias("n_deduped"),
        )
    )


@register(
    "n6_epoch_shuffle",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang,
             md5('epoch7:' || CAST(doc_id AS VARCHAR)) AS hk
      FROM documents
    ), sharded AS (
      SELECT doc_id, lang, hk,
             CAST(concat('0x', substr(hk, 1, 8)) AS BIGINT) % 8 AS shard
      FROM keyed
    )
    SELECT doc_id, lang,
           CAST(shard AS INTEGER) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY hk, doc_id)
                AS BIGINT) AS pos_in_shard
    FROM sharded
    """,
    survey="N6",
)
def n6_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle + shard assignment (N6): the order a
    training run visits the corpus, reproducible from (seed, doc_id)
    alone.  shard = top-32-bits-of-md5 mod S (map-only — at 100 TB this
    is the output partitioning, no global sort anywhere); position
    within a shard = rank of the md5 key inside it (sort is per-shard,
    embarrassingly parallel).  Changing the seed string reshuffles every
    epoch; same seed ⇒ byte-identical order on any engine — the
    data-order reproducibility contract training infra needs."""
    d = load_table(spark, sf_dir, "documents")
    hk = F.md5(F.concat(F.lit("epoch7:"), F.col("doc_id").cast("string")))
    keyed = d.select("doc_id", "lang", hk.alias("hk")).withColumn(
        "shard",
        (F.conv(F.substring("hk", 1, 8), 16, 10).cast("long") % 8).cast("int"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("shard").orderBy("hk", "doc_id")
    return keyed.select(
        "doc_id",
        "lang",
        "shard",
        F.row_number().over(w).cast("long").alias("pos_in_shard"),
    )


@register(
    "n6_temperature_mix",
    oracle="""
    WITH stats AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM stats),
    temp AS (
      SELECT lang, n, SQRT(n / t) AS w FROM stats, tot
    ), z AS (SELECT SUM(w) AS z FROM temp),
    rates AS (
      -- target share p_l^0.5 / Z; keep rate scaled so the LARGEST
      -- upsample factor is exactly 1 (pure downsampling, no repeats):
      -- rate_l = (target_l / actual_l) / max_l(target_l / actual_l)
      SELECT lang, n, (w / z) / (n / t) AS boost FROM temp, z, tot
    ), mx AS (SELECT MAX(boost) AS mb FROM rates),
    final AS (
      -- quantize to 9 dp BEFORE the gate: z and mb come from
      -- order-dependent double sums, so a last-ulp spread between
      -- engines could otherwise flip boundary docs
      SELECT lang, n, ROUND(boost / mb, 9) AS rate FROM rates, mx
    ),
    gated AS (
      SELECT d.doc_id, d.lang, f.rate
      FROM documents d JOIN final f ON d.lang = f.lang
      WHERE CAST(concat('0x', substr(md5('temp:' || CAST(d.doc_id AS VARCHAR)), 1, 8))
                 AS BIGINT)
            < CAST(FLOOR(f.rate * 4294967296) AS BIGINT)
    )
    SELECT lang, ROUND(ANY_VALUE(rate), 9) AS rate, COUNT(*) AS n_kept
    FROM gated GROUP BY lang
    """,
    survey="N6",
)
def n6_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled multilingual sampling [the mBERT/XLM-R
    exponent-smoothing scheme]: target language shares are
    p_l^(1/T) / Z with T=2 (i.e. sqrt — deliberately, since sqrt is
    IEEE-exact and libm-free, so both engines derive bit-identical
    rates), normalized so the most-boosted language keeps rate 1.0 —
    pure deterministic downsampling of the over-represented languages,
    no repeats.  Rates are data-derived (one broadcast row per
    language), the gate is the same map-only 32-bit md5 hash used by
    every sampling op, and the oracle recomputes rates AND the kept
    set exactly."""
    d = load_table(spark, sf_dir, "documents")
    stats = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    tot = stats.agg(F.sum("n").cast("double").alias("t"))
    temp = stats.crossJoin(F.broadcast(tot)).select(
        "lang", "n", "t", F.sqrt(F.col("n") / F.col("t")).alias("w")
    )
    z = temp.agg(F.sum("w").alias("z"))
    rates = temp.crossJoin(F.broadcast(z)).select(
        "lang", "n",
        ((F.col("w") / F.col("z")) / (F.col("n") / F.col("t"))).alias("boost"),
    )
    mx = rates.agg(F.max("boost").alias("mb"))
    # Quantize the rate to 9 dp BEFORE the hash gate: z (and mb) are
    # order-dependent double SUMs, so Spark and DuckDB could disagree in
    # the last ulp; the gate threshold floor(rate * 2^32) must be derived
    # from a bit-identical rate in both engines.
    final = rates.crossJoin(F.broadcast(mx)).select(
        "lang", F.round(F.col("boost") / F.col("mb"), 9).alias("rate")
    )
    h32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("temp:"), F.col("doc_id").cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    gated = d.join(F.broadcast(final), "lang").filter(
        h32 < F.floor(F.col("rate") * F.lit(4294967296.0)).cast("long")
    )
    return gated.groupBy("lang").agg(
        F.round(F.first("rate"), 9).alias("rate"),
        F.count(F.lit(1)).alias("n_kept"),
    )
