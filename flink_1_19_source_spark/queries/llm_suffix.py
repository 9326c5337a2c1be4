"""N2 — exact substring dedup via a distributed suffix array.

The real unit from Lee et al. 2022: duplicated-token-span extraction
through prefix-doubling suffix ranks (operators/suffix_array.py), the
method the dedup literature actually specifies — no gram hashing, no
document-frequency caps, corpus-global.  The DuckDB oracle verifies the
same span set through the L-gram equivalence (a window of length L is
duplicated iff the L-gram starting there is), so the two engines agree
by theorem, not by sharing an algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import suffix_array
from ..registry import register
from ..tables import load_table

_SA_L = 8  # minimum duplicated span length, in tokens (power of two)

_LEADS = " || CHR(1) || ".join(
    f"LEAD(token, {i}) OVER w" for i in range(1, _SA_L)
)

_SA_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
  FROM documents
), t AS (
  SELECT doc_id, UNNEST(range(1, len(tk) + 1)) AS p1, tk FROM d
), tok AS (
  SELECT doc_id, p1 - 1 AS tpos, tk[p1] AS token FROM t
), g AS (
  SELECT doc_id, tpos,
         token || CHR(1) || {_LEADS} AS gram,
         LEAD(token, {_SA_L - 1}) OVER w IS NOT NULL AS fl
  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY tpos)
), dupg AS (
  SELECT gram FROM g WHERE fl GROUP BY gram HAVING COUNT(*) >= 2
), hit AS (
  SELECT doc_id, tpos FROM g JOIN dupg USING (gram) WHERE g.fl
), brk AS (
  SELECT doc_id, tpos,
         CASE WHEN tpos - LAG(tpos) OVER (PARTITION BY doc_id
                  ORDER BY tpos) > {_SA_L} THEN 1 ELSE 0 END AS b
  FROM hit
), isl AS (
  SELECT doc_id, tpos,
         SUM(b) OVER (PARTITION BY doc_id ORDER BY tpos) AS grp
  FROM brk
)
SELECT doc_id,
       CAST(MIN(tpos) AS BIGINT) AS span_start,
       CAST(MAX(tpos) + {_SA_L} AS BIGINT) AS span_end,
       CAST(MAX(tpos) + {_SA_L} - MIN(tpos) AS BIGINT) AS span_tokens
FROM isl GROUP BY doc_id, grp
"""


@register(
    "n2_suffix_array_spans",
    oracle=_SA_ORACLE,
    survey="N2 N1",
)
def n2_suffix_array_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-token spans via DISTRIBUTED SUFFIX-ARRAY ranks
    (Lee et al. 2022's actual unit; upgrades the char-gram-island
    approximation in n2_substring_dup_spans, which hashes grams and
    df-caps hot ones — this query has neither, so its span set is the
    exact corpus-global answer).

    Plan shape: tokenize map-side -> concatenated corpus positions with
    per-doc unique separators -> ceil(log2 L)=3 prefix-doubling rounds,
    each {self-join on gpos+k, distributed dense rank (range-partitioned
    row_number + broadcast partition offsets — never a single-task
    window)} -> rank groups with count >= 2 are the duplicated windows
    -> per-doc gaps-and-islands coalesce into maximal spans.  At 100 TB
    every round is one join plus one sort-shuffle over the token
    table — the Manber-Myers loop as O(log L) relational passes, with
    L=8 the bounded resolution a min-span-length dedup needs (the full
    suffix ORDER would be the same loop run to log2 N)."""
    docs = load_table(spark, sf_dir, "documents")
    return suffix_array.duplicate_token_spans(
        docs, "doc_id", "text", length=_SA_L
    )


_CUT_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
  FROM documents
), t AS (
  SELECT doc_id, UNNEST(range(1, len(tk) + 1)) AS p1, tk FROM d
), tok AS (
  SELECT doc_id, p1 - 1 AS tpos, tk[p1] AS token FROM t
), g AS (
  SELECT doc_id, tpos,
         token || CHR(1) || {_LEADS} AS gram,
         LEAD(token, {_SA_L - 1}) OVER w IS NOT NULL AS fl
  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY tpos)
), dupg AS (
  SELECT gram FROM g WHERE fl GROUP BY gram HAVING COUNT(*) >= 2
), hit AS (
  SELECT doc_id, tpos, gram FROM g JOIN dupg USING (gram) WHERE g.fl
), cutw AS (
  SELECT doc_id, tpos FROM (
    SELECT doc_id, tpos,
           ROW_NUMBER() OVER (PARTITION BY gram
                              ORDER BY doc_id, tpos) AS rn
    FROM hit
  ) WHERE rn > 1
), brk AS (
  SELECT doc_id, tpos,
         CASE WHEN tpos - LAG(tpos) OVER (PARTITION BY doc_id
                  ORDER BY tpos) > {_SA_L} THEN 1 ELSE 0 END AS b
  FROM cutw
), isl AS (
  SELECT doc_id, tpos,
         SUM(b) OVER (PARTITION BY doc_id ORDER BY tpos) AS grp
  FROM brk
), spans AS (
  SELECT doc_id, MAX(tpos) + {_SA_L} - MIN(tpos) AS cut_len
  FROM isl GROUP BY doc_id, grp
), cuts AS (
  SELECT doc_id, SUM(cut_len) AS cut_tokens, COUNT(*) AS n_cut_spans
  FROM spans GROUP BY doc_id
), dl AS (
  SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tok FROM d
)
SELECT dl.doc_id, dl.n_tok,
       CAST(COALESCE(cuts.cut_tokens, 0) AS BIGINT) AS cut_tokens,
       CAST(dl.n_tok - COALESCE(cuts.cut_tokens, 0) AS BIGINT)
         AS kept_tokens,
       CAST(COALESCE(cuts.n_cut_spans, 0) AS BIGINT) AS n_cut_spans
FROM dl LEFT JOIN cuts ON cuts.doc_id = dl.doc_id
"""


@register(
    "n2_exactsubstr_cut",
    oracle=_CUT_ORACLE,
    survey="N2 N1",
)
def n2_exactsubstr_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ExactSubstr CUT — the dedup ACTION of Lee et al. 2022 on top
    of the span machinery: every duplicated L-token window keeps its
    globally-FIRST occurrence (min (doc_id, position) within the
    window's suffix-rank group) and every other occurrence's interval
    is cut; overlapping cuts merge per document, and each document
    reports (n_tok, cut_tokens, kept_tokens, n_cut_spans) — the
    before/after budget a dedup run ships.  Canonical-occurrence
    selection is one rank window over the duplicated-window groups;
    everything else is the span machinery's plan, so at 100 TB the
    cost is the O(log L) prefix-doubling passes plus one extra
    group-keyed window.  The oracle verifies through the same L-gram
    equivalence theorem as n2_suffix_array_spans — same sets, different
    algorithm; the keep-at-least-one guarantee is test-pinned."""
    docs = load_table(spark, sf_dir, "documents")
    return suffix_array.exactsubstr_cut(
        docs, "doc_id", "text", length=_SA_L
    )
