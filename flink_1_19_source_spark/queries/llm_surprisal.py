"""N4/N6 — exact-integer LM gates and token-budget scheduling
(SURVEY §2.11): the bigram integer-surprisal filter (CCNet's
perplexity gate, exact edition), Kneser-Ney smoothed surprisal, the
quality->mix end-to-end composite, and token-budget epoch schedules.
Split out of queries/llm_dsir.py (same registry names) to keep modules
under the house size bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table
from .llm_dsir import _hare_quota_select

# --------------------------------------------------------------------------
# N4 — integer-surprisal bigram LM quality gate (the CCNet perplexity
# filter, exact-arithmetic edition)
# --------------------------------------------------------------------------
@register(
    "n4_lm_surprisal_filter",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(LOWER(text), '\s+'),
                         t -> t <> '') AS tk
      FROM documents
    ), big AS (
      SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
      FROM (SELECT doc_id, tk, UNNEST(range(1, len(tk))) AS i
            FROM toks WHERE len(tk) >= 2)
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
      SELECT doc_id, CAST(SUM(bits) AS BIGINT) AS sum_bits,
             COUNT(*) AS n_bigrams
      FROM scored GROUP BY doc_id
    ), thr AS (
      SELECT (1000 * SUM(sum_bits)) // SUM(n_bigrams) AS t FROM agg
    )
    SELECT doc_id, sum_bits, CAST(n_bigrams AS BIGINT) AS n_bigrams,
           CAST((1000 * sum_bits) // n_bigrams AS BIGINT)
             AS mean_millibits,
           (1000 * sum_bits) // n_bigrams <= t AS keep
    FROM agg, thr
    """,
    survey="N4",
)
def n4_lm_surprisal_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality gate [CCNet, Wenzek et al. 2020
    run perplexity filters over crawl text; this is the exact-integer
    edition an SQL oracle can replay bit-for-bit]: train add-one-
    smoothed bigram counts on the corpus, score every document by its
    total SURPRISAL measured in whole bits — per bigram occurrence,
    floor(log2((c(w1)+V) / (c(w1,w2)+1))), computed exactly as
    bit_length((c1+V) // (c2+1)) - 1 (floor-div then bit-length equals
    the real floor(log2) because A//B <= A/B < A//B + 1) — and keep
    documents whose mean surprisal (millibits, integer division) is at
    most the corpus mean.  High-surprisal docs are the gibberish /
    boilerplate tail a perplexity gate drops; no log(), no float, no
    engine drift.

    100 TB shape: one corpus pass explodes bigrams; counts are ONE
    bigram-keyed shuffle; scoring joins corpus bigrams against the
    count tables co-partitioned on the same keys (never broadcast —
    bigram vocab outgrows memory); the vocab size and the global
    threshold are the only scalars."""
    return _surprisal_scores(spark, sf_dir)


def _surprisal_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text_analysis as ta

    d = load_table(spark, sf_dir, "documents")
    return _surprisal_scores_from(
        d.select("doc_id", ta.tokens(F.col("text")).alias("tk"))
    )


def _surprisal_scores_from(tk_df: DataFrame) -> DataFrame:
    """Shared surprisal-gate core over a (doc_id, tk) tokens frame —
    called by n4_lm_surprisal_filter, pipeline_quality_mix_end_to_end
    and pipeline_crawl_end_to_end so the gate cannot drift between the
    certified operator and the composites."""
    tk = tk_df.filter(F.size("tk") >= 2)
    big = tk.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(tk) - 2),"
                " i -> struct(tk[i] AS w1, tk[i + 1] AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = c2.groupBy("w1").agg(F.sum("n2").alias("n1"))
    v = (
        big.select(F.col("w1").alias("w"))
        .union(big.select("w2"))
        .distinct()
        .groupBy()
        .agg(F.count(F.lit(1)).alias("nv"))
    )
    bits = (
        F.length(
            F.bin(
                F.expr("(n1 + nv) div (n2 + 1)")
            )
        )
        - 1
    )
    agg = (
        big.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.sum(bits).cast("long").alias("sum_bits"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )
    thr = agg.groupBy().agg(
        F.expr("(1000 * SUM(sum_bits)) div SUM(n_bigrams)").alias("t")
    )
    mean_mb = F.expr("(1000 * sum_bits) div n_bigrams")
    return (
        agg.crossJoin(F.broadcast(thr))
        .select(
            "doc_id", "sum_bits", "n_bigrams",
            mean_mb.cast("long").alias("mean_millibits"),
            (mean_mb <= F.col("t")).alias("keep"),
        )
    )


# --------------------------------------------------------------------------
# N7 — fifth composite: quality gate -> quota apportionment, attrition
# visible per language
# --------------------------------------------------------------------------
@register(
    "pipeline_quality_mix_end_to_end",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(LOWER(text), '\s+'),
                         t -> t <> '') AS tk
      FROM documents
    ), big AS (
      SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
      FROM (SELECT doc_id, tk, UNNEST(range(1, len(tk))) AS i
            FROM toks WHERE len(tk) >= 2)
    ), c2 AS (
      SELECT w1, w2, COUNT(*) AS n2 FROM big GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, SUM(n2) AS n1 FROM c2 GROUP BY w1
    ), v AS (
      SELECT COUNT(*) AS nv FROM (
        SELECT DISTINCT w1 AS w FROM big
        UNION SELECT DISTINCT w2 FROM big)
    ), scoredoc AS (
      SELECT b.doc_id,
             SUM(LENGTH(bin((c1.n1 + v.nv) // (c2.n2 + 1))) - 1)
               AS sum_bits,
             COUNT(*) AS n_bigrams
      FROM big b
      JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
      JOIN c1 ON b.w1 = c1.w1
      CROSS JOIN v
      GROUP BY b.doc_id
    ), thr AS (
      SELECT (1000 * SUM(sum_bits)) // SUM(n_bigrams) AS t FROM scoredoc
    ), kd AS (
      SELECT d.doc_id, d.lang
      FROM documents d JOIN scoredoc s ON d.doc_id = s.doc_id
      CROSS JOIN thr
      WHERE (1000 * s.sum_bits) // s.n_bigrams <= thr.t
    ), c AS (
      SELECT lang, COUNT(*) AS cnt FROM kd GROUP BY lang
    ), w AS (
      SELECT lang, cnt, CAST(FLOOR(SQRT(cnt)) AS BIGINT) AS wt FROM c
    ), tot AS (
      SELECT SUM(wt) AS tw, (SELECT COUNT(*) // 2 FROM kd) AS budget
      FROM w
    ), q AS (
      SELECT lang, cnt, (budget * wt) // tw AS q0,
             (budget * wt) % tw AS rem, budget
      FROM w, tot
    ), r AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rk,
             budget - SUM(q0) OVER () AS leftover
      FROM q
    ), quota AS (
      SELECT lang,
             LEAST(q0 + CASE WHEN rk <= leftover THEN 1 ELSE 0 END,
                   cnt) AS quota
      FROM r
    ), ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR))) AS hrk
      FROM kd
    ), sel AS (
      SELECT ranked.lang, COUNT(*) AS n_selected
      FROM ranked JOIN quota ON ranked.lang = quota.lang
      WHERE hrk <= quota GROUP BY ranked.lang
    ), alls AS (
      SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
    ), qual AS (
      SELECT lang, COUNT(*) AS n_quality FROM kd GROUP BY lang
    )
    SELECT a.lang, a.n_docs,
           COALESCE(qual.n_quality, 0) AS n_quality,
           COALESCE(sel.n_selected, 0) AS n_selected
    FROM alls a
    LEFT JOIN qual ON a.lang = qual.lang
    LEFT JOIN sel ON a.lang = sel.lang
    """,
    survey="N7 N4 N6",
)
def pipeline_quality_mix_end_to_end(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FIFTH end-to-end composite (N7): the r8 stages chained — the
    exact-integer bigram SURPRISAL gate (n4_lm_surprisal_filter) drops
    high-perplexity documents, then Hare QUOTA apportionment
    (n6_quota_mix) rebalances the survivors across languages with a
    budget of kept//2 — per-language attrition visible at every stage
    (n_docs → n_quality → n_selected), the report a data-mixing run
    actually ships.  Both stages are the individually-certified
    operators called through their shared cores, so the composite
    cannot drift from them; corpus text is touched once (the bigram
    pass), everything after runs on per-language counts."""
    scores = _surprisal_scores(spark, sf_dir)
    kept = scores.filter(F.col("keep")).select("doc_id")
    d = load_table(spark, sf_dir, "documents")
    kd = d.join(kept, "doc_id").select("doc_id", "lang")
    sel = _hare_quota_select(kd)
    alls = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    qual = kd.groupBy("lang").agg(F.count(F.lit(1)).alias("n_quality"))
    chosen = sel.groupBy("lang").agg(F.count(F.lit(1)).alias("n_selected"))
    return (
        alls.join(qual, "lang", "left")
        .join(chosen, "lang", "left")
        .select(
            "lang", "n_docs",
            F.coalesce("n_quality", F.lit(0)).alias("n_quality"),
            F.coalesce("n_selected", F.lit(0)).alias("n_selected"),
        )
    )


# --------------------------------------------------------------------------
# N4 — Kneser-Ney smoothed LM surprisal gate (exact-rational edition)
# --------------------------------------------------------------------------
@register(
    "n4_kn_surprisal_filter",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(LOWER(text), '\s+'),
                         t -> t <> '') AS tk
      FROM documents
    ), big AS (
      SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
      FROM (SELECT doc_id, tk, UNNEST(range(1, len(tk))) AS i
            FROM toks WHERE len(tk) >= 2)
    ), c2 AS (
      SELECT w1, w2, COUNT(*) AS n2 FROM big GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, SUM(n2) AS n1, COUNT(*) AS n1p FROM c2 GROUP BY w1
    ), cont AS (
      SELECT w2, COUNT(*) AS n1c FROM c2 GROUP BY w2
    ), tot AS (
      SELECT COUNT(*) AS ncc FROM c2
    ), scored AS (
      -- P_KN = max(4*n2-3, 0)/(4*n1) + (3*n1p/(4*n1)) * (n1c/ncc)
      --      = [max(4*n2-3, 0)*ncc + 3*n1p*n1c] / (4*n1*ncc)
      SELECT b.doc_id,
             LENGTH(bin((4 * c1.n1 * tot.ncc)
                        // (GREATEST(4 * c2.n2 - 3, 0) * tot.ncc
                            + 3 * c1.n1p * cont.n1c))) - 1 AS bits
      FROM big b
      JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
      JOIN c1 ON b.w1 = c1.w1
      JOIN cont ON b.w2 = cont.w2
      CROSS JOIN tot
    ), agg AS (
      SELECT doc_id, CAST(SUM(bits) AS BIGINT) AS sum_bits,
             COUNT(*) AS n_bigrams
      FROM scored GROUP BY doc_id
    ), thr AS (
      SELECT (1000 * SUM(sum_bits)) // SUM(n_bigrams) AS t FROM agg
    )
    SELECT doc_id, sum_bits, CAST(n_bigrams AS BIGINT) AS n_bigrams,
           CAST((1000 * sum_bits) // n_bigrams AS BIGINT)
             AS mean_millibits,
           (1000 * sum_bits) // n_bigrams <= t AS keep
    FROM agg, thr
    """,
    survey="N4",
)
def n4_kn_surprisal_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KNESER-NEY smoothed LM surprisal gate [Kneser & Ney 1995; Chen &
    Goodman 1999's benchmark smoothing — what KenLM ships and what real
    CCNet-style perplexity filters actually run, vs the add-one
    baseline in n4_lm_surprisal_filter]: absolute discounting with
    d = 3/4 backing off to the CONTINUATION distribution — how many
    distinct contexts a word completes, not how often it occurs (the
    "San Francisco" effect: 'francisco' is frequent but only ever
    continues 'san', so its unigram backoff weight is tiny).

    Exactness device: with d = 3/4 every P_KN is one rational with
    denominator 4*c(w1)*|bigram types| —
    [max(4 c12 - 3, 0)·Ncc + 3·N1+(w1·)·N1+(·w2)] / (4 c1 Ncc) —
    and KN is a PROPER distribution (the per-context mass telescopes
    to 1), so den >= num and whole-bit surprisal is
    bit_length(den // num) - 1, exactly as the add-one gate.  No
    log(), no float, no engine drift; the numerator stays under
    4·c1·Ncc <= 4·10^5·10^6 well inside int64 at sf100.

    100 TB shape identical to the add-one gate: one bigram explode, one
    bigram-keyed shuffle for counts, continuation counts ride the SAME
    c2 table (no extra corpus pass), scoring co-partitions on the
    bigram key, scalars (Ncc, threshold) broadcast."""
    from ..operators import text_analysis as ta

    d = load_table(spark, sf_dir, "documents")
    tk = d.select("doc_id", ta.tokens(F.col("text")).alias("tk")).filter(
        F.size("tk") >= 2
    )
    big = tk.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(tk) - 2),"
                " i -> struct(tk[i] AS w1, tk[i + 1] AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = c2.groupBy("w1").agg(
        F.sum("n2").alias("n1"), F.count(F.lit(1)).alias("n1p")
    )
    cont = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("n1c"))
    tot = c2.groupBy().agg(F.count(F.lit(1)).alias("ncc"))
    bits = (
        F.length(
            F.bin(
                F.expr(
                    "(4 * n1 * ncc) div (greatest(4 * n2 - 3, 0) * ncc"
                    " + 3 * n1p * n1c)"
                )
            )
        )
        - 1
    )
    agg = (
        big.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum(bits).cast("long").alias("sum_bits"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )
    thr = agg.groupBy().agg(
        F.expr("(1000 * SUM(sum_bits)) div SUM(n_bigrams)").alias("t")
    )
    mean_mb = F.expr("(1000 * sum_bits) div n_bigrams")
    return (
        agg.crossJoin(F.broadcast(thr))
        .select(
            "doc_id", "sum_bits", "n_bigrams",
            mean_mb.cast("long").alias("mean_millibits"),
            (mean_mb <= F.col("t")).alias("keep"),
        )
    )


# --------------------------------------------------------------------------
# N6 — token-budget epoch allocation (the data-constrained repeat schedule)
# --------------------------------------------------------------------------
@register(
    "n6_token_budget_epochs",
    oracle=r"""
    WITH per_doc AS (
      SELECT source, doc_id,
             CAST(len(list_filter(string_split_regex(LOWER(text), '\s+'),
                       t -> t <> '')) AS BIGINT) AS nt
      FROM documents
    ), src AS (
      SELECT source, CAST(SUM(nt) AS BIGINT) AS t_tokens,
             COUNT(*) AS n_docs
      FROM per_doc GROUP BY source
    ), tot AS (
      SELECT SUM(t_tokens) AS tt, COUNT(*) AS ns FROM src
    ), alloc AS (
      SELECT source, t_tokens, n_docs,
             (4 * tot.tt) // tot.ns AS share,
             LEAST(4, ((4 * tot.tt) // tot.ns) // t_tokens)
               AS full_epochs,
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
      FROM per_doc p
    ), partial AS (
      SELECT r.source,
             CAST(COUNT(*) FILTER (WHERE r.csum <= a.rem) AS BIGINT)
               AS partial_docs,
             CAST(COALESCE(SUM(r.nt) FILTER (WHERE r.csum <= a.rem), 0)
                  AS BIGINT) AS partial_tokens
      FROM ranked r JOIN alloc a ON a.source = r.source
      GROUP BY r.source
    )
    SELECT a.source, a.t_tokens, CAST(a.full_epochs AS BIGINT)
             AS full_epochs,
           p.partial_docs, p.partial_tokens,
           CAST(a.full_epochs * a.t_tokens + p.partial_tokens AS BIGINT)
             AS tokens_alloc
    FROM alloc a JOIN partial p ON p.source = a.source
    """,
    survey="N6",
)
def n6_token_budget_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-BUDGET epoch allocation — the data-constrained repeat
    schedule [Muennighoff et al. 2023, "Scaling Data-Constrained
    Language Models": under a fixed training-token budget, small
    high-value sources REPEAT up to a diminishing-returns cap (~4
    epochs) while large sources train under one pass]: each source gets
    an equal integer share of a 4x-total budget; full epochs =
    min(4, share // source_tokens) (the cap BINDS for roughly half
    the sources on this corpus — pinned non-vacuous in
    tests/test_r8_tail.py); the remainder fills a PARTIAL epoch
    chosen by md5 hash rank with a running-token cutoff — deterministic,
    shuffle-free selection, the house sampling device.

    Every quantity is exact integer arithmetic (shares by floor
    division, remainders zeroed when the cap binds, cumulative token
    sums over the hash order), so both engines derive identical
    schedules.  Scale shape: one corpus pass for per-doc token counts,
    one source-keyed agg, the ≤|sources| allocation table broadcast
    back, and the partial-epoch pick is a per-source window over the
    hash order — no global sort, no collect."""
    from ..operators import text_analysis as ta

    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "source", "doc_id",
        F.size(ta.tokens(F.col("text"))).cast("long").alias("nt"),
    )
    return _token_budget_epochs_core(per_doc)


def _token_budget_epochs_core(per_doc: DataFrame) -> DataFrame:
    """Shared epoch-allocation core over a (source, doc_id, nt) frame —
    called by n6_token_budget_epochs and pipeline_crawl_end_to_end so
    the schedule arithmetic cannot drift between the certified operator
    and the composite."""
    alloc, ranked = _epoch_alloc_ranked(per_doc)
    partial = (
        ranked.join(
            F.broadcast(alloc.select("source", "rem")), "source"
        )
        .groupBy("source")
        .agg(
            F.count(F.when(F.col("csum") <= F.col("rem"), 1))
            .cast("long").alias("partial_docs"),
            F.coalesce(
                F.sum(F.when(F.col("csum") <= F.col("rem"), F.col("nt"))),
                F.lit(0),
            ).cast("long").alias("partial_tokens"),
        )
    )
    return (
        alloc.join(partial, "source")
        .select(
            "source", F.col("t_tokens").cast("long").alias("t_tokens"),
            F.col("full_epochs").cast("long").alias("full_epochs"),
            "partial_docs", "partial_tokens",
            (F.col("full_epochs") * F.col("t_tokens")
             + F.col("partial_tokens")).cast("long").alias("tokens_alloc"),
        )
    )


def _epoch_doc_repeats(per_doc: DataFrame) -> DataFrame:
    """Per-DOCUMENT repeat count under the same schedule: full epochs
    of the doc's source plus one if the doc falls in the hash-ranked
    partial epoch — the document-level view pipeline_audit_trail
    reports (shares the exact alloc/rank arithmetic above)."""
    alloc, ranked = _epoch_alloc_ranked(per_doc)
    return (
        ranked.join(
            F.broadcast(alloc.select("source", "rem", "full_epochs")),
            "source",
        )
        .select(
            "doc_id",
            (F.col("full_epochs")
             + F.when(F.col("csum") <= F.col("rem"), 1).otherwise(0))
            .cast("long").alias("repeats"),
        )
    )


def _epoch_alloc_ranked(per_doc: DataFrame):
    """(alloc, ranked) internals of the token-budget schedule."""
    from pyspark.sql.window import Window

    src = per_doc.groupBy("source").agg(
        F.sum("nt").alias("t_tokens"), F.count(F.lit(1)).alias("n_docs")
    )
    tot = src.groupBy().agg(
        F.sum("t_tokens").alias("tt"), F.count(F.lit(1)).alias("ns")
    )
    alloc = (
        src.crossJoin(F.broadcast(tot))
        .withColumn("share", F.expr("(4 * tt) div ns"))
        .withColumn(
            "full_epochs",
            F.least(F.lit(4), F.expr("share div t_tokens")),
        )
        .withColumn(
            "rem",
            F.when(F.expr("share div t_tokens") >= 4, F.lit(0))
            .otherwise(F.expr("share % t_tokens")),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("epoch:"), F.col("doc_id").cast("string"))),
        "doc_id",
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = per_doc.withColumn("csum", F.sum("nt").over(w))
    return alloc, ranked


# --------------------------------------------------------------------------
# N4 — CCNet perplexity-bucket partitioning (head / middle / tail)
# --------------------------------------------------------------------------
@register(
    "n4_ccnet_buckets",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(LOWER(text), '\s+'),
                         t -> t <> '') AS tk
      FROM documents
    ), big AS (
      SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
      FROM (SELECT doc_id, tk, UNNEST(range(1, len(tk))) AS i
            FROM toks WHERE len(tk) >= 2)
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
      SELECT doc_id, CAST(SUM(bits) AS BIGINT) AS sum_bits,
             COUNT(*) AS n_bigrams
      FROM scored GROUP BY doc_id
    ), lab AS (
      SELECT a.doc_id, d.lang,
             CAST((1000 * a.sum_bits) // a.n_bigrams AS BIGINT)
               AS mean_millibits,
             NTILE(3) OVER (PARTITION BY d.lang
                            ORDER BY (1000 * a.sum_bits) // a.n_bigrams,
                                     a.doc_id) AS tercile
      FROM agg a JOIN documents d ON d.doc_id = a.doc_id
    )
    SELECT doc_id, lang, mean_millibits,
           CASE tercile WHEN 1 THEN 'head'
                        WHEN 2 THEN 'middle'
                        ELSE 'tail' END AS bucket
    FROM lab
    """,
    survey="N4 N6",
)
def n4_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet perplexity-bucket partitioning [Wenzek et al. 2020: after
    LM scoring, each language's crawl is SPLIT into head / middle /
    tail perplexity terciles, and downstream consumers pick buckets
    rather than hard-dropping — the published pipeline keeps the split,
    not a boolean gate].  This is the bucket step over the certified
    exact-integer surprisal core (`_surprisal_scores_from` — the same
    shared code path as n4_lm_surprisal_filter and the crawl composite,
    so gate and buckets cannot drift): per LANGUAGE, documents rank by
    mean surprisal in millibits (ascending — fluent first) and NTILE(3)
    labels the terciles head/middle/tail, ties pinned by doc_id.

    100 TB shape: the scoring pass is the certified one-shuffle bigram
    join; the bucket label is ONE rank window partitioned by language —
    per-language state never exceeds one partition's sort, and the
    NTILE boundary needs no global pass beyond the per-lang window.
    Docs with <2 tokens carry no bigram evidence and stay out, exactly
    as in the gate."""
    scores = _surprisal_scores(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy("mean_millibits", "doc_id")
    lab = (
        scores.join(d, "doc_id")
        .withColumn("tercile", F.ntile(3).over(w))
    )
    return lab.select(
        "doc_id", "lang", "mean_millibits",
        F.when(F.col("tercile") == 1, F.lit("head"))
        .when(F.col("tercile") == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )

