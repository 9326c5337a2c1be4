"""Corpus-hygiene pipeline queries (SURVEY §2.11 N4/N6 extensions).

The second tier of training-data operations beyond dedup/similarity:
PII redaction, benchmark-contamination (eval-set leakage) checks,
Gopher-style repetition signals, and greedy sequence packing. Every
query is DuckDB-value-hash-oracled; the regex constants are shared
between the Spark implementation and the generated oracle SQL so both
engines apply byte-identical patterns.
"""

from __future__ import annotations

import pandas as pd

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
def _chunks_and_kept(d: DataFrame):
    """Shared chunk-dedup core (n1_chunk_dedup and the CCNet composite):
    10-word chunks, corpus-first occurrence kept by (doc_id, chunk_id)
    rank over the chunk text.  Returns (all chunks, surviving chunks)."""
    from pyspark.sql.window import Window

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
    rn = F.row_number().over(
        Window.partitionBy("chunk_text").orderBy("doc_id", "chunk_id")
    )
    kept = chunks.withColumn("rn", rn).filter(F.col("rn") == 1)
    return chunks, kept


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
    chunks, kept = _chunks_and_kept(load_table(spark, sf_dir, "documents"))
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


# --------------------------------------------------------------------------
# N4 — URL extraction + canonicalization (web-corpus hygiene)
# --------------------------------------------------------------------------
# Word-salad corpus has no URLs: the fixture injects synthetic ones
# (mixed case, default ports, unsorted query params, fragments) keyed off
# doc_id on BOTH engines; the operator under test is the canonicalizer.

# (?i) so the injected uppercase-scheme URL (doc_id%5) actually matches —
# identical inline-flag semantics in Java regex (Spark) and RE2 (DuckDB).
_URL_RE = r"(?i)https?://[^\s]+"


@register(
    "n4_url_canonicalize",
    oracle=f"""
    WITH injected AS (
      SELECT doc_id,
             text ||
             CASE WHEN doc_id % 5 = 0
                  THEN ' see HTTPS://WWW.Example.COM:443/path/Page/?b=2&a=1#frag'
                  ELSE '' END ||
             CASE WHEN doc_id % 7 = 0
                  THEN ' http://Host' || CAST(doc_id % 20 AS VARCHAR)
                       || '.org:80/x/'
                  ELSE '' END ||
             CASE WHEN doc_id % 11 = 0
                  THEN ' https://cdn.example.com/a?z=1&y=2&x=3'
                  ELSE '' END AS text
      FROM documents
    ), urls AS (
      SELECT doc_id, UNNEST(regexp_extract_all(text, '{_URL_RE}')) AS u
      FROM injected
    ), parts AS (
      SELECT doc_id, u,
             LOWER(regexp_extract(u, '^([A-Za-z]+)://', 1)) AS scheme,
             LOWER(regexp_extract(u, '^[A-Za-z]+://([^/?#:]+)', 1)) AS host,
             regexp_extract(u, '^[A-Za-z]+://[^/?#]*:(\\d+)', 1) AS port,
             regexp_extract(u, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path,
             regexp_extract(u, '\\?([^#]*)', 1) AS q
      FROM urls
    ), canon AS (
      SELECT doc_id,
             scheme || '://' || host ||
             CASE WHEN port = '' OR (scheme = 'https' AND port = '443')
                       OR (scheme = 'http' AND port = '80')
                  THEN '' ELSE ':' || port END ||
             CASE WHEN path = '' THEN '/'
                  WHEN LEN(path) > 1 AND path LIKE '%/'
                  THEN SUBSTRING(path, 1, LEN(path) - 1)
                  ELSE path END ||
             CASE WHEN q = '' THEN ''
                  ELSE '?' || array_to_string(list_sort(string_split(q, '&')), '&')
             END AS cu
      FROM parts
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_urls,
           array_to_string(list_sort(array_agg(cu)), ',') AS canon_urls
    FROM canon GROUP BY doc_id
    """,
    survey="N4 2.8-string",
)
def n4_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (the web-corpus dedup-key normalizer:
    lowercase scheme/host, strip default ports, drop fragments, sort
    query params, trim trailing slashes) — pure codegen'd regex/string
    expressions, map-only until the per-doc agg. Canonical URLs are THE
    dedup/join key for crawl corpora; a 100 TB pass runs at scan speed."""
    d = load_table(spark, sf_dir, "documents")
    i = F.col("doc_id")
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                i % 5 == 0,
                F.lit(" see HTTPS://WWW.Example.COM:443/path/Page/?b=2&a=1#frag"),
            ).otherwise(F.lit("")),
            F.when(
                i % 7 == 0,
                F.concat(
                    F.lit(" http://Host"),
                    (i % 20).cast("string"),
                    F.lit(".org:80/x/"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                i % 11 == 0, F.lit(" https://cdn.example.com/a?z=1&y=2&x=3")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    urls = injected.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(_URL_RE), F.lit(0))
        ).alias("u"),
    )
    u = F.col("u")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z]+)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z]+://([^/?#:]+)", 1))
    port = F.regexp_extract(u, r"^[A-Za-z]+://[^/?#]*:(\d+)", 1)
    path = F.regexp_extract(u, r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    q = F.regexp_extract(u, r"\?([^#]*)", 1)
    canon = urls.select(
        "doc_id",
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(
                (port == "")
                | ((scheme == "https") & (port == "443"))
                | ((scheme == "http") & (port == "80")),
                F.lit(""),
            ).otherwise(F.concat(F.lit(":"), port)),
            F.when(path == "", F.lit("/"))
            .when(
                (F.length(path) > 1) & path.endswith("/"),
                F.expr("substring(" + "regexp_extract(u, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1)"
                       + ", 1, length(regexp_extract(u, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1)) - 1)"),
            )
            .otherwise(path),
            F.when(q == "", F.lit("")).otherwise(
                F.concat(
                    F.lit("?"), F.array_join(F.array_sort(F.split(q, "&")), "&")
                )
            ),
        ).alias("cu"),
    )
    return canon.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.array_join(F.array_sort(F.collect_list("cu")), ",").alias("canon_urls"),
    )


# --------------------------------------------------------------------------
# N1/N2 — incremental dedup: today's batch vs the historical corpus
# --------------------------------------------------------------------------
def _incr_dedup_oracle(num_hashes: int = 32, bands: int = 8, seed: int = 42) -> str:
    from ..operators import dedup as dd
    from .llm import _SHINGLE_HASH_CTES

    pa, pb = dd.minhash_perms(num_hashes, seed)
    rpb = num_hashes // bands
    perms = ", ".join(f"({k}, {a}, {b})" for k, (a, b) in enumerate(zip(pa, pb)))
    return f"""
    WITH {_SHINGLE_HASH_CTES},
    perms(k, a, b) AS (VALUES {perms}),
    sig AS (
      SELECT doc_id, k, MIN(((h % 2147483647) * a + b) % 2147483647) AS sv
      FROM hv CROSS JOIN perms GROUP BY doc_id, k
    ), bandkey AS (
      SELECT doc_id, k // {rpb} AS band,
             string_agg(CAST(sv AS VARCHAR), ',' ORDER BY k) AS key
      FROM sig GROUP BY doc_id, k // {rpb}
    ),
    base_fp AS (SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id < 400),
    new_docs AS (SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id >= 400),
    base_bands AS (SELECT DISTINCT band, key FROM bandkey WHERE doc_id < 400),
    near AS (
      SELECT DISTINCT bk.doc_id
      FROM bandkey bk JOIN base_bands bb ON bk.band = bb.band AND bk.key = bb.key
      WHERE bk.doc_id >= 400
    )
    SELECT n.doc_id,
           n.fp IN (SELECT fp FROM base_fp) AS exact_dup,
           n.doc_id IN (SELECT doc_id FROM near) AS near_dup,
           NOT (n.fp IN (SELECT fp FROM base_fp)
                OR n.doc_id IN (SELECT doc_id FROM near)) AS kept
    FROM new_docs n
    """


@register("n1_incremental_dedup", oracle=_incr_dedup_oracle(), survey="N1 N2")
def n1_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the production daily-increment pattern: the
    NEW batch (doc_id >= 400) is checked against the HISTORICAL corpus
    (doc_id < 400) without ever reshuffling history's rows: history is
    reduced to (a) distinct content digests and (b) distinct LSH band
    bucket keys (operators/dedup.minhash_band_buckets), both broadcast;
    the new batch probes them map-side. exact_dup = content digest seen
    before; near_dup = shares any MinHash band bucket with history; kept
    = neither. At 100 TB the history digests/bucket keys live as compact
    tables maintained across days — the batch never joins history's
    documents, only its fingerprints."""
    from ..operators import dedup as dd

    d = load_table(spark, sf_dir, "documents")
    base, newd = d.filter(F.col("doc_id") < 400), d.filter(F.col("doc_id") >= 400)

    base_fp = base.select(F.md5("text").alias("fp")).distinct().withColumn(
        "_e", F.lit(1)
    )
    flags = newd.select("doc_id", F.md5("text").alias("fp")).join(
        F.broadcast(base_fp), "fp", "left"
    )

    buckets = dd.minhash_band_buckets(d, "doc_id", "text")
    base_keys = buckets.filter(F.col("id") < 400).select("bk").distinct()
    near = (
        buckets.filter(F.col("id") >= 400)
        .join(F.broadcast(base_keys), "bk", "left_semi")
        .select(F.col("id").alias("doc_id"))
        .distinct()
        .withColumn("_n", F.lit(1))
    )
    return flags.join(near, "doc_id", "left").select(
        "doc_id",
        F.col("_e").isNotNull().alias("exact_dup"),
        F.col("_n").isNotNull().alias("near_dup"),
        (F.col("_e").isNull() & F.col("_n").isNull()).alias("kept"),
    )


@register(
    "n4_boilerplate_strip",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), chunks AS (
      SELECT doc_id, i AS chunk_id,
             array_to_string(w[i*10+1 : i*10+10], ' ') AS chunk_text
      FROM w, UNNEST(range(CAST(ceil(len(w)/10.0) AS BIGINT))) t(i)
    ), df AS (
      SELECT chunk_text, COUNT(*) AS n FROM chunks GROUP BY chunk_text
    ), kept AS (
      SELECT c.doc_id, c.chunk_id, c.chunk_text
      FROM chunks c JOIN df ON df.chunk_text = c.chunk_text
      WHERE df.n < 3
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
    survey="N4 N1",
)
def n4_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal (the C4 rule: drop any line occurring ≥ 3
    times corpus-wide — headers, footers, cookie banners; chunk = the
    10-word unit, as n1_chunk_dedup): every occurrence of a frequent
    chunk is dropped from every document (unlike dedup's keep-first).
    Plan: map-only chunking, one chunk-keyed agg for document
    frequencies, re-join on the same shuffle key — at 100 TB, key the
    frequency table on md5(chunk) and broadcast only the over-threshold
    survivors (boilerplate sets are small)."""
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
    dfreq = chunks.groupBy("chunk_text").agg(F.count(F.lit(1)).alias("n"))
    kept = chunks.join(dfreq.filter(F.col("n") < 3), "chunk_text")
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


# --------------------------------------------------------------------------
# N2 — exact substring-duplicate SPANS across documents
# --------------------------------------------------------------------------
# The "dedup of repeated substrings" shape (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better"): not whole-document or
# whole-shingle-set similarity, but the maximal VERBATIM character spans two
# documents share — the unit a substring-dedup pass actually cuts.

_SSD_K = 30        # gram length: spans shorter than this are invisible
_SSD_DF_CAP = 20   # stop-gram cap: grams in > cap docs are dropped


@register(
    "n2_substring_dup_spans",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id < 300 AND LEN(text) >= {_SSD_K}
    ), g AS (
      SELECT doc_id, UNNEST(range(1, LEN(text) - {_SSD_K} + 2)) AS pos, text
      FROM d
    ), h AS (
      SELECT doc_id, pos,
             CAST(concat('0x', substr(md5(substr(text, pos, {_SSD_K})), 1, 15))
                  AS BIGINT) AS hg
      FROM g
    ), ok AS (
      SELECT hg FROM h GROUP BY hg
      HAVING COUNT(DISTINCT doc_id) <= {_SSD_DF_CAP}
    ), hc AS (
      SELECT h.* FROM h JOIN ok ON h.hg = ok.hg
    ), cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa, b.pos AS pb
      FROM hc a JOIN hc b ON a.hg = b.hg AND a.doc_id < b.doc_id
    ), isl AS (
      SELECT *, pa - ROW_NUMBER() OVER (
               PARTITION BY id_a, id_b, pa - pb ORDER BY pa) AS grp
      FROM cand
    )
    SELECT id_a, id_b,
           CAST(MIN(pa) AS BIGINT) AS start_a,
           CAST(MIN(pb) AS BIGINT) AS start_b,
           CAST(COUNT(*) + {_SSD_K} - 1 AS BIGINT) AS span_len
    FROM isl GROUP BY id_a, id_b, pa - pb, grp
    """,
    survey="N2 N1",
)
def n2_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-duplicate spans across documents (the Lee et al.
    substring-dedup unit): every maximal verbatim character run ≥ K=30
    shared by two docs, reported as (start_a, start_b, span_len).

    Spark-first, zero Python: explode char-gram positions (sequence), a
    60-bit md5 gram hash (8-byte shuffle key — gram text never shuffles),
    a stop-gram df-cap bounding any gram's fan-out at cap² (the same
    skew rule as the shingle/LSH caps), the hash-equality self-join, and
    diagonal island detection (pos_a - row_number per (pair, pa-pb))
    to coalesce overlapping gram hits into maximal spans. At 100 TB the
    join is candidate-bounded by the cap and each span costs O(len)
    grams — the paper's suffix-array pass re-expressed as three shuffles.
    Both engines join on the identical hash, so a (cosmologically
    unlikely) md5-prefix collision would affect both sides equally."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 300) & (F.length("text") >= _SSD_K))
    )
    g = d.select(
        "doc_id",
        F.col("text"),
        F.explode(
            F.sequence(F.lit(1), F.length("text") - F.lit(_SSD_K - 1))
        ).alias("pos"),
    )
    h = g.select(
        "doc_id",
        "pos",
        F.conv(
            F.substring(F.md5(F.substring(F.col("text"), F.col("pos"), _SSD_K)), 1, 15),
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
    a, b = hc.alias("a"), hc.alias("b")
    cand = a.join(
        b,
        (F.col("a.hg") == F.col("b.hg")) & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.col("a.pos").alias("pa"),
        F.col("b.pos").alias("pb"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("id_a", "id_b", F.col("pa") - F.col("pb")).orderBy("pa")
    isl = cand.withColumn("grp", F.col("pa") - F.row_number().over(w))
    return (
        isl.groupBy("id_a", "id_b", (F.col("pa") - F.col("pb")).alias("diag"), "grp")
        .agg(
            F.min("pa").alias("start_a"),
            F.min("pb").alias("start_b"),
            (F.count(F.lit(1)) + F.lit(_SSD_K - 1)).alias("span_len"),
        )
        .select("id_a", "id_b", "start_a", "start_b", "span_len")
    )


# --------------------------------------------------------------------------
# N4 — batch model inference (quality-classifier scoring pass)
# --------------------------------------------------------------------------
# The fastText-style quality-classifier step every corpus pipeline runs:
# a trained model scores each document and a threshold gates it.  The
# "model" here is a logistic regression with baked weights (a stand-in
# with the same Arrow-batched signature any sklearn/torch scorer uses);
# features are closed-form text statistics, so DuckDB recomputes the
# logit exactly — both engines evaluate the identical left-to-right
# float expression, making the hash bit-stable without trusting libm.

# weights in MILLI units: the logit is computed as integer milli-units
# (10*f1 - 2*f2 + 50*f3 - 30*f4 + 4*f5 + 50) so the keep gate is pure
# integer arithmetic — no engine's float-vs-decimal literal semantics can
# flip a boundary document (DuckDB parses 0.01 as DECIMAL; Spark floats).
_QC_MILLI = (10, -2, 50, -30, 4)
# bias (milli) chosen so the keep gate genuinely SPLITS the test corpora
# (~half kept at every SF) — a threshold no document ever crosses would
# certify the gate vacuously
_QC_B_MILLI = 50


@register(
    "n4_model_score_batch",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                  t -> t <> '')) AS BIGINT) AS f_tokens,
             CAST(LEN(text) AS BIGINT) AS f_chars,
             CAST(LEN(text) - LEN(regexp_replace(text, '[.,!?;]', '', 'g'))
                  AS BIGINT) AS f_punct,
             CAST(LEN(text) - LEN(regexp_replace(text, '[0-9]', '', 'g'))
                  AS BIGINT) AS f_digits,
             CAST(LEN(text) - LEN(regexp_replace(text, '[A-Z]', '', 'g'))
                  AS BIGINT) AS f_upper
      FROM documents
    )
    SELECT doc_id, f_tokens, f_chars, f_punct, f_digits, f_upper,
           ROUND(({_QC_MILLI[0]} * f_tokens + {_QC_MILLI[1]} * f_chars
                 + {_QC_MILLI[2]} * f_punct + {_QC_MILLI[3]} * f_digits
                 + {_QC_MILLI[4]} * f_upper + {_QC_B_MILLI})
                 / 1000.0, 9) AS logit,
           ({_QC_MILLI[0]} * f_tokens + {_QC_MILLI[1]} * f_chars
                 + {_QC_MILLI[2]} * f_punct + {_QC_MILLI[3]} * f_digits
                 + {_QC_MILLI[4]} * f_upper + {_QC_B_MILLI}) >= 0 AS keep
    FROM feats
    """,
    survey="N4 2.10",
)
def n4_model_score_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch model inference over the corpus (the quality-classifier
    scoring pass): integer text features extracted in Catalyst, then an
    Arrow-vectorized pandas UDF applies the model — per-batch pandas
    arithmetic in fixed evaluation order, the exact signature a real
    sklearn/torch/fastText scorer plugs into (swap the closure body,
    keep the plan).  Map-only: at 100 TB inference cost is one scan and
    the model broadcasts as task-closure constants.  The oracle
    recomputes features AND the logit relationally — a drifted feature
    or a reordered accumulation breaks the hash."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")

    def count_removed(pattern: str):
        return (
            F.length(t) - F.length(F.regexp_replace(t, pattern, ""))
        ).cast("long")

    feats = d.select(
        "doc_id",
        # filter empty tokens like the oracle's list_filter(...) does —
        # split(trim(...)) alone yields 1 token for an empty document
        F.size(
            F.filter(F.split(t, r"\s+"), lambda x: x != F.lit(""))
        ).cast("long").alias("f_tokens"),
        F.length(t).cast("long").alias("f_chars"),
        count_removed(r"[.,!?;]").alias("f_punct"),
        count_removed(r"[0-9]").alias("f_digits"),
        count_removed(r"[A-Z]").alias("f_upper"),
    )
    w = list(_QC_MILLI)
    b = _QC_B_MILLI

    @pandas_udf(DoubleType())
    def model(
        f1: pd.Series, f2: pd.Series, f3: pd.Series, f4: pd.Series, f5: pd.Series
    ) -> pd.Series:
        # integer milli-unit accumulation, ONE final float division —
        # exact on any engine; a real model would run its matmul here
        milli = w[0] * f1 + w[1] * f2 + w[2] * f3 + w[3] * f4 + w[4] * f5 + b
        return milli / 1000.0

    logit = model("f_tokens", "f_chars", "f_punct", "f_digits", "f_upper")
    # the keep gate is PURE integer arithmetic — boundary docs cannot
    # flip between engines' float/decimal literal semantics
    milli_expr = (
        w[0] * F.col("f_tokens") + w[1] * F.col("f_chars")
        + w[2] * F.col("f_punct") + w[3] * F.col("f_digits")
        + w[4] * F.col("f_upper") + b
    )
    return feats.select(
        "doc_id", "f_tokens", "f_chars", "f_punct", "f_digits", "f_upper",
        F.round(logit, 9).alias("logit"),
        (milli_expr >= 0).alias("keep"),
    )
