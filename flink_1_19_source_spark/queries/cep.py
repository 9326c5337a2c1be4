"""CEP / MATCH_RECOGNIZE coverage queries (SURVEY §2.9 X5).

Pattern: A B+ C over per-user event sequences where A=signup,
B=click|view, C=purchase (anything else breaks contiguity). The DuckDB
oracle replays the same semantics with string_agg + regex — left-to-right
non-overlapping matching is exactly Python's ``finditer`` and
MATCH_RECOGNIZE's AFTER MATCH SKIP PAST LAST ROW.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import cep
from ..registry import register
from ..tables import load_table

_SYMBOLS = {"signup": "A", "click": "B", "view": "B", "purchase": "C"}


@register(
    "x5_match_recognize_abc",
    oracle="""
    WITH sym AS (
        SELECT user_id,
               string_agg(CASE event_type WHEN 'signup' THEN 'A'
                                          WHEN 'click' THEN 'B'
                                          WHEN 'view' THEN 'B'
                                          WHEN 'purchase' THEN 'C'
                                          ELSE 'X' END,
                          '' ORDER BY ts, event_id) AS s
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(regexp_extract_all(s, 'AB+C')) AS BIGINT) AS n_matches,
           CAST(COALESCE(list_max(list_transform(regexp_extract_all(s, 'AB+C'),
                                                 m -> LEN(m))), 0) AS BIGINT)
             AS longest_match
    FROM sym
    WHERE len(regexp_extract_all(s, 'AB+C')) > 0
    """,
    survey="X5",
)
def x5_match_recognize_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE, aggregate form: count of A B+ C matches per user +
    longest match length — the Catalyst fast path (JVM regex over the
    sorted per-key symbol string; operators/cep.match_counts). The
    span-returning NFA engine (match_recognize_lite) stays the general
    operator; its agreement with this path is pinned by
    tests/test_oracle.py + test_properties.py."""
    e = load_table(spark, sf_dir, "events")
    return cep.match_counts(
        e,
        key_col="user_id",
        ts_col="ts",
        id_col="event_id",
        symbol=cep.classify(_SYMBOLS)(F.col("event_type")),
        pattern="AB+C",
    ).withColumnRenamed("key", "user_id")


@register(
    "x5_adjacent_pair",
    oracle="""
    SELECT user_id, event_id AS signup_id, next_id AS purchase_id
    FROM (
        SELECT user_id, event_id, event_type, ts,
               LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS next_type,
               LEAD(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS next_id
        FROM events
    )
    WHERE event_type = 'signup' AND next_type = 'purchase'
    """,
    survey="X5 O2",
)
def x5_adjacent_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window+lag batch subset of CEP: signup immediately followed by
    purchase in the same user's sequence (pure Catalyst, no Python)."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("next_type", F.lead("event_type").over(w))
        .withColumn("next_id", F.lead("event_id").over(w))
        .filter((F.col("event_type") == "signup") & (F.col("next_type") == "purchase"))
        .select(
            "user_id",
            F.col("event_id").alias("signup_id"),
            F.col("next_id").alias("purchase_id"),
        )
    )


@register(
    "x5_pattern_within",
    oracle="""
    WITH nxt AS (
      SELECT user_id, event_id, ts, event_type,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_purchase_ts
      FROM events
    )
    SELECT user_id, event_id AS signup_event_id, ts AS signup_ts,
           next_purchase_ts AS purchase_ts,
           CAST(epoch_ms(next_purchase_ts) - epoch_ms(ts) AS BIGINT)
             AS latency_ms
    FROM nxt
    WHERE event_type = 'signup'
      AND next_purchase_ts <= ts + INTERVAL 30 MINUTE
    """,
    survey="X5 O2",
)
def x5_pattern_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP time-constrained pattern — Flink
    ``Pattern.begin(signup).followedBy(purchase).within(30 min)``
    (relaxed contiguity: interleaved events allowed; each signup matches
    its FIRST subsequent purchase inside the window). Spark-first: no
    range join at all — one per-key sort window computes the next
    purchase timestamp for every row (min-over-following on the
    time-ordered stream), then a filter keeps signups whose next
    purchase lands within the bound. One shuffle, codegen'd; the same
    shape Flink's NFA evaluates with its within-timer."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = e.withColumn(
        "next_purchase_ts",
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).over(w),
    )
    return (
        nxt.filter(
            (F.col("event_type") == "signup")
            & (
                F.col("next_purchase_ts")
                <= F.col("ts") + F.expr("INTERVAL 30 MINUTES")
            )
        )
        .select(
            "user_id",
            F.col("event_id").alias("signup_event_id"),
            F.col("ts").alias("signup_ts"),
            F.col("next_purchase_ts").alias("purchase_ts"),
            (F.unix_millis("next_purchase_ts") - F.unix_millis("ts")).alias(
                "latency_ms"
            ),
        )
    )


@register(
    "s_pattern_within_stream",
    oracle="""
    WITH nxt AS (
      SELECT user_id, event_id, ts, event_type,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_purchase_ts
      FROM events
    )
    SELECT user_id, event_id AS signup_event_id, ts AS signup_ts,
           next_purchase_ts AS purchase_ts,
           CAST(epoch_ms(next_purchase_ts) - epoch_ms(ts) AS BIGINT)
             AS latency_ms
    FROM nxt
    WHERE event_type = 'signup'
      AND next_purchase_ts <= ts + INTERVAL 30 MINUTE
    """,
    survey="X5-S X2 X3",
    tags=("streaming",),
)
def s_pattern_within_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING CEP with a time constraint —
    ``Pattern.begin(signup).followedBy(purchase).within(30 min)`` on
    keyed state (streaming/cep_stream.pattern_within_stream): pending
    signups wait in per-user state; the first subsequent purchase inside
    the window closes them (append emission on the closing event);
    expired pendings are purged, Flink's within-timer ≡ state TTL (X3).
    Same answer as the batch twin x5_pattern_within — and the oracle IS
    the batch twin's SQL."""
    import os

    from ..streaming import replay
    from ..streaming.cep_stream import pattern_within_stream
    from .streaming_queries import (
        _CHUNKS, _FILES_PER_TRIGGER, _drain_to_memory, _work_dir,
    )

    wd = _work_dir(sf_dir, "s_pwithin")
    sdf = replay.replay_table(
        spark, sf_dir, "events", os.path.join(wd, "src"), chunks=_CHUNKS,
        order_by=["ts", "event_id"],
        files_per_trigger=_FILES_PER_TRIGGER,
    )
    sym = (
        F.when(F.col("event_type") == "signup", "S")
        .when(F.col("event_type") == "purchase", "P")
        .otherwise("X")
    )
    out = pattern_within_stream(
        sdf, "user_id", "ts", "event_id", sym, within_ms=30 * 60 * 1000
    )
    res = _drain_to_memory(spark, out, "s_pwithin_q", "append", wd)
    return res.select(
        F.col("key").alias("user_id") if "key" in res.columns else F.col("user_id"),
        "signup_event_id",
        "signup_ts",
        "purchase_ts",
        "latency_ms",
    )


# ---------------------------------------------------------------------------
# X5 — AFTER MATCH SKIP modes + MEASURES (Flink after-match strategy)
# ---------------------------------------------------------------------------
# Pattern C B* C (purchase, any clicks/views, purchase): chains of
# consecutive purchases make the two skip policies genuinely diverge —
# TO NEXT ROW emits every consecutive-purchase edge, PAST LAST ROW
# alternates through each chain (greedy non-overlapping = odd edges).
# The oracle replays that relationally: next-non-B window → C→C edges →
# island detection for chains → position parity for the greedy subset.
_SKIP_ORACLE_BASE = """
    WITH ev AS (
      SELECT user_id, event_id, ts,
             CASE event_type WHEN 'purchase' THEN 'C'
                             WHEN 'click' THEN 'B'
                             WHEN 'view' THEN 'B'
                             ELSE 'X' END AS sym,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ), nxt AS (
      SELECT *,
             MIN(CASE WHEN sym <> 'B' THEN rn END)
               OVER (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS nnb_rn
      FROM ev
    ), edges AS (
      SELECT e.user_id, e.rn AS srn, n2.rn AS ern,
             e.event_id AS start_id, n2.event_id AS end_id,
             e.ts AS first_ts, n2.ts AS last_ts
      FROM nxt e JOIN ev n2
        ON n2.user_id = e.user_id AND n2.rn = e.nnb_rn
      WHERE e.sym = 'C' AND n2.sym = 'C'
    ), chains AS (
      SELECT *, CASE WHEN srn = LAG(ern)
                       OVER (PARTITION BY user_id ORDER BY srn)
                     THEN 0 ELSE 1 END AS new_chain
      FROM edges
    ), pos AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, chain_id
                                   ORDER BY srn) AS p
      FROM (SELECT *, SUM(new_chain)
                        OVER (PARTITION BY user_id ORDER BY srn) AS chain_id
            FROM chains)
    )
"""

_SKIP_SELECT = """
    SELECT {mode} AS skip_mode, user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY srn)
                AS BIGINT) AS match_no,
           start_id, end_id,
           CAST(ern - srn + 1 AS BIGINT) AS n_rows,
           CAST(ern - srn - 1 AS BIGINT) AS b_rows,
           first_ts, last_ts
    FROM pos {where}
"""

_SKIP_SYMBOL_SQL = (
    "CASE event_type WHEN 'purchase' THEN 'C' WHEN 'click' THEN 'B' "
    "WHEN 'view' THEN 'B' ELSE 'X' END"
)


def _skip_symbol():
    return (
        F.when(F.col("event_type") == "purchase", "C")
        .when(F.col("event_type").isin("click", "view"), "B")
        .otherwise("X")
    )


@register(
    "x5_skip_modes",
    oracle=_SKIP_ORACLE_BASE
    + _SKIP_SELECT.format(mode="'past_last_row'", where="WHERE p % 2 = 1")
    + " UNION ALL "
    + _SKIP_SELECT.format(mode="'to_next_row'", where=""),
    survey="X5",
)
def x5_skip_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE AFTER MATCH SKIP PAST LAST ROW vs SKIP TO NEXT ROW
    on the same pattern (C B* C), with MEASURES (FIRST(ts), LAST(ts),
    COUNT(*), COUNT(B.*)) per match [docs: match_recognize
    after-match-strategy]. PAST LAST ROW is greedy non-overlapping;
    TO NEXT ROW re-opens the scan one row after each match start, so
    purchase chains produce overlapping matches. Both policies come out
    of ONE keyed shuffle + linear scan (skip="both" — the event data is
    shuffled and Arrow-transferred once, operators/cep
    .match_recognize_skip)."""
    e = load_table(spark, sf_dir, "events")
    return cep.match_recognize_skip(
        e, "user_id", "ts", "event_id", _skip_symbol(), "CB*C", skip="both"
    ).withColumnRenamed("key", "user_id")


@register(
    "s_skip_modes_stream",
    oracle=_SKIP_ORACLE_BASE
    + _SKIP_SELECT.format(mode="'to_next_row'", where=""),
    survey="X5-S X2",
    tags=("streaming",),
)
def s_skip_modes_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING AFTER MATCH SKIP TO NEXT ROW — the overlap-allowed
    policy on keyed state (streaming/cep_stream.streaming_match_skip):
    the NFA buffer keeps one past each match START (an overlapping match
    may still complete later), emits each match with its measures as the
    closing purchase arrives, and converges to the batch twin
    x5_skip_modes' to_next_row half — whose SQL is this oracle."""
    import os

    from ..streaming import replay
    from ..streaming.cep_stream import streaming_match_skip
    from .streaming_queries import (
        _CHUNKS, _FILES_PER_TRIGGER, _drain_to_memory, _work_dir,
    )

    wd = _work_dir(sf_dir, "s_skipmodes")
    sdf = replay.replay_table(
        spark, sf_dir, "events", os.path.join(wd, "src"), chunks=_CHUNKS,
        order_by=["ts", "event_id"],
        files_per_trigger=_FILES_PER_TRIGGER,
    )
    out = streaming_match_skip(
        sdf, "user_id", "ts", "event_id", _skip_symbol(), "CB*C",
        start_chars="C", skip="to_next_row",
    )
    res = _drain_to_memory(spark, out, "s_skipmodes_q", "append", wd)
    return res.select(
        F.lit("to_next_row").alias("skip_mode"),
        F.col("key").alias("user_id"),
        "match_no", "start_id", "end_id", "n_rows", "b_rows",
        "first_ts", "last_ts",
    )


_PERMUTE_PATTERN = "(ABC|ACB|BAC|BCA|CAB|CBA)"


@register(
    "x5_permute",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, ts,
             CASE event_type WHEN 'signup' THEN 'A'
                             WHEN 'click' THEN 'B'
                             WHEN 'purchase' THEN 'C'
                             ELSE 'X' END AS sym,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ), tri AS (
      SELECT user_id, rn, event_id AS start_id, ts AS first_ts, sym,
             LEAD(sym, 1) OVER w AS s2,
             LEAD(sym, 2) OVER w AS s3,
             LEAD(event_id, 2) OVER w AS end_id,
             LEAD(ts, 2) OVER w AS last_ts
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY rn)
    ), hits AS (
      SELECT * FROM tri
      WHERE sym || s2 || s3 IN ('ABC','ACB','BAC','BCA','CAB','CBA')
    )
    SELECT user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn)
                AS BIGINT) AS match_no,
           start_id, end_id,
           CAST(3 AS BIGINT) AS n_rows,
           CAST(1 AS BIGINT) AS b_rows,
           first_ts, last_ts
    FROM hits
    """,
    survey="X5",
)
def x5_permute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE ``PATTERN (PERMUTE (A, B, C))`` [docs:
    match_recognize#pattern] with AFTER MATCH SKIP TO NEXT ROW: signup,
    click and purchase contiguous in ANY order.  PERMUTE compiles to the
    alternation of all orderings — exactly how Flink's planner expands
    it into its NFA — and the overlap-allowed skip makes every
    qualifying triad a match.  The oracle needs no regex at all: two
    LEADs build each 3-row window and a set-membership check replays the
    permutation test relationally."""
    e = load_table(spark, sf_dir, "events")
    sym = (
        F.when(F.col("event_type") == "signup", "A")
        .when(F.col("event_type") == "click", "B")
        .when(F.col("event_type") == "purchase", "C")
        .otherwise("X")
    )
    return cep.match_recognize_skip(
        e, "user_id", "ts", "event_id", sym, _PERMUTE_PATTERN,
        skip="to_next_row",
    ).withColumnRenamed("key", "user_id")


@register(
    "x5_quantifier_alternation",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, ts,
             CASE event_type WHEN 'signup' THEN 'S'
                             WHEN 'click' THEN 'C'
                             WHEN 'view' THEN 'V'
                             WHEN 'purchase' THEN 'P'
                             ELSE 'X' END AS sym,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ), cum AS (
      SELECT *,
             SUM(CASE WHEN sym = 'C' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY rn) AS cc,
             SUM(CASE WHEN sym = 'V' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY rn) AS cv,
             MIN(CASE WHEN sym NOT IN ('C', 'V') THEN rn END)
               OVER (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS nrun
      FROM ev
    ), m AS (
      SELECT s.user_id, s.rn AS srn,
             s.event_id AS start_id, e.event_id AS end_id,
             e.rn - s.rn + 1 AS n_rows,
             e.cc - s.cc AS n_c, e.cv - s.cv AS n_v,
             s.ts AS first_ts, e.ts AS last_ts
      FROM cum s JOIN cum e
        ON e.user_id = s.user_id AND e.rn = s.nrun
      WHERE s.sym = 'S' AND e.sym = 'P'
        AND e.rn - s.rn - 1 BETWEEN 2 AND 3
    )
    SELECT user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY srn)
                AS BIGINT) AS match_no,
           start_id, end_id,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_c AS BIGINT) AS n_c,
           CAST(n_v AS BIGINT) AS n_v,
           first_ts, last_ts
    FROM m
    """,
    survey="X5",
)
def x5_quantifier_alternation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE ``PATTERN (S (C|V){2,3} P)`` — alternation inside
    a BOUNDED quantifier [docs: match_recognize#pattern quantifiers],
    with per-variable MEASURES COUNT(C.*)/COUNT(V.*): a signup, then two
    or three click-or-view events, closed by a purchase.  Because P and
    S both terminate a [CV]-run, the quantifier must consume the ENTIRE
    run between S and the next non-[CV] row — so greedy non-overlapping
    matching (AFTER MATCH SKIP PAST LAST ROW) is provably equivalent to
    the relational replay: S matches iff its following click/view run
    has length 2..3 and ends at a purchase.  The oracle exploits exactly
    that: next-non-[CV] window + prefix-sum C/V counts, no regex."""
    e = load_table(spark, sf_dir, "events")
    sym = (
        F.when(F.col("event_type") == "signup", "S")
        .when(F.col("event_type") == "click", "C")
        .when(F.col("event_type") == "view", "V")
        .when(F.col("event_type") == "purchase", "P")
        .otherwise("X")
    )
    return cep.match_recognize_measures(
        e, "user_id", "ts", "event_id", sym, "S[CV]{2,3}P",
        count_syms=("C", "V"),
    ).withColumnRenamed("key", "user_id")


@register(
    "s_quantifier_stream",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, ts,
             CASE event_type WHEN 'signup' THEN 'S'
                             WHEN 'click' THEN 'C'
                             WHEN 'view' THEN 'V'
                             WHEN 'purchase' THEN 'P'
                             ELSE 'X' END AS sym,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ), cum AS (
      SELECT *,
             SUM(CASE WHEN sym = 'C' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY rn) AS cc,
             MIN(CASE WHEN sym NOT IN ('C', 'V') THEN rn END)
               OVER (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS nrun
      FROM ev
    ), m AS (
      SELECT s.user_id, s.rn AS srn,
             s.event_id AS start_id, e.event_id AS end_id,
             e.rn - s.rn + 1 AS n_rows, e.cc - s.cc AS b_rows,
             s.ts AS first_ts, e.ts AS last_ts
      FROM cum s JOIN cum e
        ON e.user_id = s.user_id AND e.rn = s.nrun
      WHERE s.sym = 'S' AND e.sym = 'P'
        AND e.rn - s.rn - 1 BETWEEN 2 AND 3
    )
    SELECT user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY srn)
                AS BIGINT) AS match_no,
           start_id, end_id,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(b_rows AS BIGINT) AS b_rows,
           first_ts, last_ts
    FROM m
    """,
    survey="X5-S X2",
    tags=("streaming",),
)
def s_quantifier_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING bounded-quantifier pattern — ``S (C|V){2,3} P`` on
    keyed state, matches emitted as their closing purchase arrives
    (COUNT(C.*) rides as the measure; the streaming NFA counts one
    designated variable).  Because every match starts at an S and spans
    no other S, the to-next-row policy coincides with the per-S first-
    completion rule the batch twin x5_quantifier_alternation proves —
    the drained stream hash-matches the same relational replay."""
    import os

    from ..streaming import replay
    from ..streaming.cep_stream import streaming_match_skip
    from .streaming_queries import (
        _CHUNKS, _FILES_PER_TRIGGER, _drain_to_memory, _work_dir,
    )

    wd = _work_dir(sf_dir, "s_quant")
    sdf = replay.replay_table(
        spark, sf_dir, "events", os.path.join(wd, "src"), chunks=_CHUNKS,
        order_by=["ts", "event_id"],
        files_per_trigger=_FILES_PER_TRIGGER,
    )
    sym = (
        F.when(F.col("event_type") == "signup", "S")
        .when(F.col("event_type") == "click", "C")
        .when(F.col("event_type") == "view", "V")
        .when(F.col("event_type") == "purchase", "P")
        .otherwise("X")
    )
    out = streaming_match_skip(
        sdf, "user_id", "ts", "event_id", sym, "S[CV]{2,3}P",
        start_chars="S", skip="to_next_row", count_sym="C",
    )
    res = _drain_to_memory(spark, out, "s_quant_q", "append", wd)
    return res.select(
        F.col("key").alias("user_id"),
        "match_no", "start_id", "end_id", "n_rows", "b_rows",
        "first_ts", "last_ts",
    )


# --------------------------------------------------------------------------
# X5 — AFTER MATCH SKIP TO <variable> + SUBSET (the long-tail clauses)
# --------------------------------------------------------------------------
_SKIP_TO_PATTERN = "C(?P<b1>B*)(?P<mid>C)(?P<b2>B*)(?P<last>C)"

_SKIP_TO_SELECT = """
    , pairs AS (
      SELECT a.user_id, a.srn, a.start_id, a.first_ts,
             b.srn AS mid_rn, b.ern, b.end_id, b.last_ts
      FROM pos a JOIN pos b
        ON b.user_id = a.user_id AND b.chain_id = a.chain_id
       AND b.p = a.p + 1
      WHERE a.p % 2 = 1
    )
    SELECT p.user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY p.user_id ORDER BY p.srn)
                AS BIGINT) AS match_no,
           p.start_id, p.end_id,
           CAST(p.ern - p.srn + 1 AS BIGINT) AS n_rows,
           CAST(p.ern - p.mid_rn AS BIGINT) AS s_rows,
           p.first_ts, p.last_ts,
           sf.ts AS s_first_ts, p.last_ts AS s_last_ts
    FROM pairs p
    JOIN ev sf ON sf.user_id = p.user_id
       AND sf.rn = CASE WHEN p.ern - p.mid_rn > 1
                        THEN p.mid_rn + 1 ELSE p.ern END
"""


@register(
    "x5_skip_to_variable",
    oracle=_SKIP_ORACLE_BASE + _SKIP_TO_SELECT,
    survey="X5",
)
def x5_skip_to_variable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE ``AFTER MATCH SKIP TO C3`` + ``SUBSET`` — the X5
    long-tail clauses [docs: match_recognize#after-match-strategy]:

        PATTERN (C1 B1* C2 B2* C3)
        SUBSET S = (B2, C3)
        MEASURES FIRST(ts), LAST(ts), COUNT(*), COUNT(S.*),
                 FIRST(S.ts), LAST(S.ts)
        AFTER MATCH SKIP TO C3

    Three purchases separated by clicks; after a match the scan resumes
    AT the third purchase, which becomes the next match's FIRST purchase
    — chained purchase runs produce matches sharing their boundary row
    (distinct from both PAST LAST ROW, which skips the shared row, and
    TO NEXT ROW, which also admits the mid-purchase start — the fuzz
    test pins all three apart).  The SUBSET measures aggregate the union
    of the B2 and C3 variables' rows.  Oracle: the purchase-chain edge
    table — a chain of k purchases yields matches at odd edge positions
    (p, p+1), exactly the resume-at-boundary recurrence.  Pattern
    variables are regex named groups; resume = SKIP TO <group>
    (operators/cep.match_recognize_skip_to, one keyed shuffle + linear
    scan).  Flink's cannot-advance guard (SKIP TO FIRST C1 would loop)
    raises identically."""
    e = load_table(spark, sf_dir, "events")
    return cep.match_recognize_skip_to(
        e, "user_id", "ts", "event_id", _skip_symbol(), _SKIP_TO_PATTERN,
        resume_group="last", subset_groups=("b2", "last"),
    ).withColumnRenamed("key", "user_id")


@register(
    "s_skip_to_variable_stream",
    oracle=_SKIP_ORACLE_BASE + _SKIP_TO_SELECT,
    survey="X5-S X2",
    tags=("streaming",),
)
def s_skip_to_variable_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of x5_skip_to_variable: SKIP TO <variable> +
    SUBSET measures on keyed state.  The buffer keeps from the resume
    row (it starts the next match — SKIP TO LAST semantics), so a
    chained run completes across micro-batches as its closing purchases
    arrive.  Emission is prefix-stable because the quantified variables
    (B*) exclude the boundary symbol C — a completed match can never be
    extended by later rows, the same stability argument as
    s_skip_modes_stream.  Converges to the batch twin's oracle at any
    chunking."""
    import os

    from ..streaming import replay
    from ..streaming.cep_stream import streaming_match_skip_to
    from .streaming_queries import (
        _CHUNKS, _FILES_PER_TRIGGER, _drain_to_memory, _work_dir,
    )

    wd = _work_dir(sf_dir, "s_skipto")
    sdf = replay.replay_table(
        spark, sf_dir, "events", os.path.join(wd, "src"), chunks=_CHUNKS,
        order_by=["ts", "event_id"],
        files_per_trigger=_FILES_PER_TRIGGER,
    )
    out = streaming_match_skip_to(
        sdf, "user_id", "ts", "event_id", _skip_symbol(), _SKIP_TO_PATTERN,
        start_chars="C", resume_group="last", subset_groups=("b2", "last"),
    )
    res = _drain_to_memory(spark, out, "s_skipto_q", "append", wd)
    return res.select(
        F.col("key").alias("user_id"),
        "match_no", "start_id", "end_id", "n_rows", "s_rows",
        "first_ts", "last_ts", "s_first_ts", "s_last_ts",
    )


# --------------------------------------------------------------------------
# X5 — reluctant (lazy) quantifiers vs greedy, side by side
# --------------------------------------------------------------------------
_RELUCTANT_ORACLE = """
    WITH ev AS (
      SELECT user_id, event_id, ts,
             CASE event_type WHEN 'signup' THEN 'S'
                             WHEN 'click' THEN 'C'
                             WHEN 'view' THEN 'C'
                             WHEN 'purchase' THEN 'P'
                             ELSE 'X' END AS sym,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ), cum AS (
      SELECT *, SUM(CASE WHEN sym = 'C' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY rn) AS cc
      FROM ev
    ), bound AS (
      SELECT *, MIN(CASE WHEN sym NOT IN ('C', 'P') THEN rn END)
                  OVER (PARTITION BY user_id ORDER BY rn
                        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                  AS nb
      FROM cum
    ), ends AS (
      SELECT s.user_id, s.rn AS srn, s.event_id AS start_id,
             s.ts AS first_ts, s.cc AS scc,
             MIN(p.rn) AS lazy_rn, MAX(p.rn) AS greedy_rn
      FROM bound s JOIN ev p
        ON p.user_id = s.user_id AND p.sym = 'P' AND p.rn > s.rn
       AND p.rn < COALESCE(s.nb, 9223372036854775807)
      WHERE s.sym = 'S'
      GROUP BY s.user_id, s.rn, s.event_id, s.ts, s.cc
    ), modes AS (
      SELECT 'lazy' AS quantifier, user_id, srn, start_id, first_ts, scc,
             lazy_rn AS ern
      FROM ends
      UNION ALL
      SELECT 'greedy', user_id, srn, start_id, first_ts, scc, greedy_rn
      FROM ends
    )
    SELECT m.quantifier, m.user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY m.quantifier, m.user_id
                                   ORDER BY m.srn) AS BIGINT) AS match_no,
           m.start_id, pe.event_id AS end_id,
           CAST(m.ern - m.srn + 1 AS BIGINT) AS n_rows,
           CAST(pe.cc - m.scc AS BIGINT) AS b_rows,
           m.first_ts, pe.ts AS last_ts
    FROM modes m JOIN cum pe
      ON pe.user_id = m.user_id AND pe.rn = m.ern
"""


def _reluctant_symbol():
    return (
        F.when(F.col("event_type") == "signup", "S")
        .when(F.col("event_type").isin("click", "view"), "C")
        .when(F.col("event_type") == "purchase", "P")
        .otherwise("X")
    )


@register(
    "x5_reluctant_quantifier",
    oracle=_RELUCTANT_ORACLE,
    survey="X5",
)
def x5_reluctant_quantifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reluctant vs greedy quantifiers [docs: match_recognize#quantifiers
    — `*?`/`+?` variants]: ``PATTERN (S M*? P)`` vs ``PATTERN (S M* P)``
    where M matches clicks/views AND purchases — the class overlapping
    the terminator is exactly when laziness matters: the reluctant match
    ends at a signup's FIRST following purchase, the greedy one at the
    LAST purchase of the same uninterrupted click/purchase run.  Both
    policies run as plain regex laziness through the same keyed-scan
    operator (the NFA engine implements `*?` natively — zero new
    operator code), with MEASURES (COUNT(*), COUNT(click rows),
    FIRST/LAST ts).  The oracle computes each signup's run boundary and
    MIN/MAX purchase relationally; matches can never span another
    signup (S terminates the quantified class), which is what makes the
    per-signup formulation equal to the sequential scan."""
    e = load_table(spark, sf_dir, "events")

    def half(pattern: str, tag: str) -> DataFrame:
        return cep.match_recognize_skip(
            e, "user_id", "ts", "event_id", _reluctant_symbol(), pattern,
            skip="past_last_row", count_sym="C",
        ).select(
            F.lit(tag).alias("quantifier"),
            F.col("key").alias("user_id"),
            "match_no", "start_id", "end_id", "n_rows", "b_rows",
            "first_ts", "last_ts",
        )

    return half("S[CP]*?P", "lazy").unionByName(half("S[CP]*P", "greedy"))


_RELUCTANT_LAZY_ORACLE = """
    WITH ev AS (
      SELECT user_id, event_id, ts,
             CASE event_type WHEN 'signup' THEN 'S'
                             WHEN 'click' THEN 'C'
                             WHEN 'view' THEN 'C'
                             WHEN 'purchase' THEN 'P'
                             ELSE 'X' END AS sym,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ), cum AS (
      SELECT *, SUM(CASE WHEN sym = 'C' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY rn) AS cc
      FROM ev
    ), bound AS (
      SELECT *, MIN(CASE WHEN sym NOT IN ('C', 'P') THEN rn END)
                  OVER (PARTITION BY user_id ORDER BY rn
                        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                  AS nb
      FROM cum
    ), ends AS (
      SELECT s.user_id, s.rn AS srn, s.event_id AS start_id,
             s.ts AS first_ts, s.cc AS scc, MIN(p.rn) AS ern
      FROM bound s JOIN ev p
        ON p.user_id = s.user_id AND p.sym = 'P' AND p.rn > s.rn
       AND p.rn < COALESCE(s.nb, 9223372036854775807)
      WHERE s.sym = 'S'
      GROUP BY s.user_id, s.rn, s.event_id, s.ts, s.cc
    )
    SELECT e.user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY e.user_id ORDER BY e.srn)
                AS BIGINT) AS match_no,
           e.start_id, pe.event_id AS end_id,
           CAST(e.ern - e.srn + 1 AS BIGINT) AS n_rows,
           CAST(pe.cc - e.scc AS BIGINT) AS b_rows,
           e.first_ts, pe.ts AS last_ts
    FROM ends e JOIN cum pe
      ON pe.user_id = e.user_id AND pe.rn = e.ern
"""


@register(
    "s_reluctant_quantifier_stream",
    oracle=_RELUCTANT_LAZY_ORACLE,
    survey="X5-S X2",
    tags=("streaming",),
)
def s_reluctant_quantifier_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING reluctant quantifier — ``PATTERN (S M*? P)`` on keyed
    state: the lazy policy is the one that streams soundly, because a
    match closes at the FIRST terminator and can never be extended by
    later rows (prefix-stable emission — Flink's streaming CEP has the
    same property for reluctant matches).  The greedy variant is
    deliberately batch-only: its match end moves with every further
    in-class row, so it is only decidable at the run boundary.  Emits
    each signup's first-purchase match with measures as the purchase
    arrives; converges to the lazy half of x5_reluctant_quantifier's
    oracle at any chunking."""
    import os

    from ..streaming import replay
    from ..streaming.cep_stream import streaming_match_skip
    from .streaming_queries import (
        _CHUNKS, _FILES_PER_TRIGGER, _drain_to_memory, _work_dir,
    )

    wd = _work_dir(sf_dir, "s_reluctant")
    sdf = replay.replay_table(
        spark, sf_dir, "events", os.path.join(wd, "src"), chunks=_CHUNKS,
        order_by=["ts", "event_id"],
        files_per_trigger=_FILES_PER_TRIGGER,
    )
    out = streaming_match_skip(
        sdf, "user_id", "ts", "event_id", _reluctant_symbol(), "S[CP]*?P",
        start_chars="S", skip="past_last_row", count_sym="C",
    )
    res = _drain_to_memory(spark, out, "s_reluctant_q", "append", wd)
    return res.select(
        F.col("key").alias("user_id"),
        "match_no", "start_id", "end_id", "n_rows", "b_rows",
        "first_ts", "last_ts",
    )
