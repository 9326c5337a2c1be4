"""Corpus-hygiene pipeline queries (SURVEY §2.11 N4/N6 extensions).

The second tier of training-data operations beyond dedup/similarity:
PII redaction, benchmark-contamination (eval-set leakage) checks,
Gopher-style repetition signals, and greedy sequence packing. Every
query is DuckDB-value-hash-oracled; the regex constants are shared
between the Spark implementation and the generated oracle SQL so both
engines apply byte-identical patterns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import corpus
from ..registry import register
from ..tables import load_table

# --------------------------------------------------------------------------
# N4 — PII detection / redaction
# --------------------------------------------------------------------------
# The synthetic documents table is PII-free word salad, so the fixture
# deterministically injects synthetic PII (emails / IPv4 / phones keyed
# off doc_id) on BOTH engines; the operator under test is the detection/
# redaction pass, the injection is just input construction. Residual
# docs (doc_id not divisible by 7/11/13) double as the false-positive
# probe: their counts must be exactly zero.

_PII_ORACLE = f"""
WITH injected AS (
  SELECT doc_id,
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
)
SELECT doc_id,
       len(regexp_extract_all(text, '{corpus.EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(text, '{corpus.PHONE_RE}')) AS n_phones,
       len(regexp_extract_all(text, '{corpus.IPV4_RE}')) AS n_ips,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
           '{corpus.EMAIL_RE}', '<EMAIL>', 'g'),
           '{corpus.PHONE_RE}', '<PHONE>', 'g'),
           '{corpus.IPV4_RE}', '<IP>', 'g')) AS redacted_fp
FROM injected
"""


def _inject_pii(d: DataFrame) -> DataFrame:
    i = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    email = F.concat(F.lit(" contact user"), s(i), F.lit("@example.com"))
    ip = F.concat(F.lit(" from 10."), s(i % 256), F.lit(".0."), s(i % 100))
    phone = F.concat(
        F.lit(" call +1-555-"),
        F.lpad(s(i % 1000), 3, "0"),
        F.lit("-"),
        F.lpad(s(i % 10000), 4, "0"),
    )
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(i % 7 == 0, email).otherwise(F.lit("")),
            F.when(i % 11 == 0, ip).otherwise(F.lit("")),
            F.when(i % 13 == 0, phone).otherwise(F.lit("")),
        ).alias("text"),
    )


@register("n4_pii_redact", oracle=_PII_ORACLE, survey="N4")
def n4_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass: per-document counts per PII class + the redacted
    text's fingerprint. Pure Catalyst regexps — one codegen'd scan, no
    shuffle; at 100 TB this is a map-only rewrite of the corpus."""
    d = _inject_pii(load_table(spark, sf_dir, "documents"))
    counts = corpus.pii_counts(F.col("text"))
    return d.select(
        "doc_id",
        *[c.alias(name) for name, c in counts.items()],
        F.md5(corpus.pii_redact(F.col("text"))).alias("redacted_fp"),
    )


# --------------------------------------------------------------------------
# N4 — benchmark contamination (eval-set leakage)
# --------------------------------------------------------------------------
@register(
    "n4_contamination",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(LOWER(text), '\\s+'), t -> t <> '') AS tk
      FROM documents
    ), sh AS (
      SELECT doc_id, list_distinct(
        CASE WHEN len(tk) >= 5 THEN
          list_transform(range(0, len(tk) - 4),
                         i -> array_to_string(list_slice(tk, i + 1, i + 5), ' '))
        ELSE [array_to_string(tk, ' ')] END) AS grams
      FROM toks
    ), bench AS (
      SELECT DISTINCT UNNEST(grams) AS gram FROM sh WHERE doc_id % 10 = 7
    ), corp AS (
      SELECT doc_id, UNNEST(grams) AS gram FROM sh WHERE doc_id % 10 <> 7
    )
    SELECT c.doc_id, COUNT(*) AS n_grams, COUNT(b.gram) AS n_hit,
           ROUND(CAST(COUNT(b.gram) AS DOUBLE) / COUNT(*), 9) AS contamination
    FROM corp c LEFT JOIN bench b ON c.gram = b.gram
    GROUP BY c.doc_id
    """,
    survey="N4 N2",
)
def n4_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set leakage check: 5-gram overlap of each corpus document
    against a held-out benchmark slice (docs with doc_id % 10 == 7 stand
    in for the eval set). The benchmark gram set is broadcast — the
    corpus side never shuffles for the join."""
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 10 == 7)
    # fixture repartition: the one-file test corpus is a single input
    # split; real corpora shard naturally (see n4_repetition_signals)
    corp = d.filter(F.col("doc_id") % 10 != 7).repartition(24)
    return corpus.contamination(corp, bench, "doc_id", "text", n=5)


# --------------------------------------------------------------------------
# N4 — repetition / quality signals (Gopher-style)
# --------------------------------------------------------------------------
@register(
    "n4_repetition_signals",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(LOWER(text), '\\s+'), t -> t <> '') AS tk
      FROM documents
    ), bi AS (
      SELECT doc_id, tk,
             CASE WHEN len(tk) >= 2 THEN
               list_transform(range(0, len(tk) - 1),
                              i -> array_to_string(list_slice(tk, i + 1, i + 2), ' '))
             ELSE CAST([] AS VARCHAR[]) END AS bg
      FROM toks
    )
    SELECT doc_id,
           len(tk) AS n_tokens,
           ROUND(CASE WHEN len(tk) > 0
                 THEN 1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk)
                 ELSE 0.0 END, 9) AS dup_token_frac,
           ROUND(CASE WHEN len(tk) > 0
                 THEN CAST(list_max(list_transform(list_distinct(tk),
                      x -> len(list_filter(tk, t -> t = x)))) AS DOUBLE) / len(tk)
                 ELSE 0.0 END, 9) AS top_token_frac,
           ROUND(CASE WHEN len(bg) > 0
                 THEN CAST(list_max(list_transform(list_distinct(bg),
                      x -> len(list_filter(bg, t -> t = x)))) AS DOUBLE) / len(bg)
                 ELSE 0.0 END, 9) AS top_bigram_frac
    FROM bi
    """,
    survey="N4",
)
def n4_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetitiousness metrics (duplicate-token / top-token / top-bigram
    fractions) as per-row array expressions: no explode, no shuffle —
    the whole filter is a map-only scan at any corpus size.

    The repartition is a local-fixture artifact: the test corpus is ONE
    parquet file → one input split, which would serialize the fold onto a
    single core. A real corpus has thousands of files and needs no
    repartition (map-only over natural splits)."""
    d = load_table(spark, sf_dir, "documents").repartition(24)
    sig = corpus.repetition_signals(F.col("text"))
    return d.select("doc_id", *[c.alias(name) for name, c in sig.items()])


# --------------------------------------------------------------------------
# N4 — token-budget distribution (exact percentiles)
# --------------------------------------------------------------------------
@register(
    "n4_token_percentiles",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           ROUND(AVG(nt), 9) AS mean_tokens,
           ROUND(quantile_cont(nt, 0.5), 9) AS p50,
           ROUND(quantile_cont(nt, 0.9), 9) AS p90,
           ROUND(quantile_cont(nt, 0.99), 9) AS p99,
           MAX(nt) AS max_tokens
    FROM (SELECT lang,
                 len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                   AS nt
          FROM documents)
    GROUP BY lang
    """,
    survey="N4 A5",
)
def n4_token_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget distribution per language: EXACT p50/p90/p99 of the
    BPE-ish token count (Spark `percentile` vs DuckDB `quantile_cont`,
    both R-7 linear interpolation — bit-identical, unlike approx
    sketches). The shape a data-mixing run uses to size context budgets.
    At 100 TB swap `percentile` for `approx_percentile` — the grouping
    and scan shape stay identical."""
    from ..operators.text_analysis import bpe_ish_token_count

    d = load_table(spark, sf_dir, "documents")
    nt = d.select("lang", bpe_ish_token_count(F.col("text")).alias("nt"))
    return nt.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("nt"), 9).alias("mean_tokens"),
        F.round(F.expr("percentile(nt, 0.5D)"), 9).alias("p50"),
        F.round(F.expr("percentile(nt, 0.9D)"), 9).alias("p90"),
        F.round(F.expr("percentile(nt, 0.99D)"), 9).alias("p99"),
        F.max("nt").alias("max_tokens"),
    )


# --------------------------------------------------------------------------
# N6 — greedy sequence packing
# --------------------------------------------------------------------------
_PACK_BUDGET = 256

@register(
    "n6_sequence_packing",
    oracle=f"""
    WITH RECURSIVE base AS (
      SELECT doc_id, source,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
               AS n_tokens,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS idx
      FROM documents
    ), p AS (
      SELECT source, idx, doc_id, n_tokens, n_tokens AS run,
             CAST(0 AS BIGINT) AS pack_id
      FROM base WHERE idx = 1
      UNION ALL
      SELECT b.source, b.idx, b.doc_id, b.n_tokens,
             CASE WHEN p.run + b.n_tokens > {_PACK_BUDGET}
                  THEN b.n_tokens ELSE p.run + b.n_tokens END,
             CASE WHEN p.run + b.n_tokens > {_PACK_BUDGET}
                  THEN p.pack_id + 1 ELSE p.pack_id END
      FROM p JOIN base b ON b.source = p.source AND b.idx = p.idx + 1
    )
    SELECT source, doc_id, n_tokens, pack_id FROM p
    """,
    survey="N6",
)
def n6_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequential packing of documents into 256-token training
    sequences, deterministic by (source, doc_id) order. The oracle replays
    the identical fold as a recursive CTE. At 100 TB the pack group is a
    bounded hash bucket instead of `source`; groups pack in parallel, one
    Arrow task each."""
    d = load_table(spark, sf_dir, "documents")
    return corpus.pack_sequences(
        d, group_col="source", order_col="doc_id", text_col="text",
        budget=_PACK_BUDGET,
    )


# --------------------------------------------------------------------------
# N1/N4 — corpus-level duplicate-chunk removal (CCNet-style)
# --------------------------------------------------------------------------
@register(
    "n1_chunk_dedup",
    oracle="""
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
    ), agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             md5(string_agg(chunk_text, ' ' ORDER BY chunk_id)) AS kept_fp
      FROM kept GROUP BY doc_id
    ), tot AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks
      FROM chunks GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_chunks, COALESCE(a.n_kept, 0) AS n_kept, a.kept_fp
    FROM tot t LEFT JOIN agg a ON t.doc_id = a.doc_id
    """,
    survey="N1 N4",
)
def n1_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplicate-chunk removal (the CCNet/C4 paragraph-dedup
    pass, on 10-word chunks since the synthetic corpus has no newlines):
    every distinct chunk keeps only its corpus-first occurrence
    (doc_id, chunk_id order); documents are re-assembled from surviving
    chunks. Chunking is map-only array expressions (no word-level
    shuffle); the dedup is ONE shuffle keyed on the chunk (at 100 TB,
    key the shuffle on md5(chunk) — 16 bytes instead of the text — and
    keep first by (doc_id, chunk_id) min, same plan shape). Output:
    per-doc chunk counts + fingerprint of the deduped text."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select("doc_id", F.split("text", " ").alias("w"))
    chunks = w.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, cast(ceil(size(w)/10.0) as int) - 1),"
                " i -> array_join(slice(w, i*10+1, 10), ' '))"
            )
        ).alias("chunk_id", "chunk_text"),
    )
    from pyspark.sql.window import Window

    rn = F.row_number().over(
        Window.partitionBy("chunk_text").orderBy("doc_id", "chunk_id")
    )
    kept = chunks.withColumn("rn", rn).filter(F.col("rn") == 1)
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(struct(chunk_id, chunk_text))),"
                    " x -> x.chunk_text)"
                ),
                " ",
            )
        ).alias("kept_fp"),
    )
    tot = chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    return tot.join(agg, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        "kept_fp",
    )
