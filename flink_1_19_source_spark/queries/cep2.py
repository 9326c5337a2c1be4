"""CEP / MATCH_RECOGNIZE advanced modes (SURVEY §2.9 X5, §2.1 S12).

Row-pattern EXCLUSIONS ({- B -}), ITERATIVE conditions (DEFINE
referencing FIRST(A.value) — admissibility depends on the partial
match), and the verbatim MATCH_RECOGNIZE statement path (incl. WITHIN).
Split out of queries/cep.py (same registry names) to keep modules under
the house size bound.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import cep
from ..registry import register
from ..streaming import replay
from ..tables import load_table
from .cep import _SYMBOLS  # noqa: F401  (shared symbol map)

# --------------------------------------------------------------------------
# X5 — row-pattern exclusions: PATTERN (A {- B+ -} C)
# --------------------------------------------------------------------------
_EXCLUSION_ORACLE = """
    WITH ev AS (
      SELECT user_id, event_id, ts,
             CASE event_type WHEN 'signup' THEN 'A'
                             WHEN 'click' THEN 'B'
                             WHEN 'view' THEN 'B'
                             WHEN 'purchase' THEN 'C'
                             ELSE 'X' END AS sym,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ), nxt AS (
      SELECT *, MIN(CASE WHEN sym <> 'B' THEN rn END)
                  OVER (PARTITION BY user_id ORDER BY rn
                        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                  AS nb
      FROM ev
    ), m AS (
      -- a match per signup whose following B-run (>= 1 row) ends at a
      -- purchase; matches are structurally disjoint (the run contains
      -- no A), so non-overlapping scan = all qualifying signups
      SELECT s.user_id, s.rn AS srn, s.event_id AS start_id,
             s.ts AS first_ts, s.nb
      FROM nxt s
      WHERE s.sym = 'A' AND s.nb IS NOT NULL AND s.nb >= s.rn + 2
    )
    SELECT m.user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY m.user_id ORDER BY m.srn)
                AS BIGINT) AS match_no,
           m.start_id, e.event_id AS end_id,
           CAST(2 AS BIGINT) AS n_rows,
           CAST(m.nb - m.srn - 1 AS BIGINT) AS excl_rows,
           m.first_ts, e.ts AS last_ts
    FROM m JOIN ev e
      ON e.user_id = m.user_id AND e.rn = m.nb AND e.sym = 'C'
"""


@register(
    "x5_exclusion",
    oracle=_EXCLUSION_ORACLE,
    survey="X5",
)
def x5_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE row-pattern exclusion [ISO SQL:2016; the one
    MATCH_RECOGNIZE clause Flink 1.19 documents as unsupported —
    surfaced here to the standard's semantics, closing the X5 syntax
    table]:

        PATTERN (A {- B+ -} C)
        MEASURES FIRST(ts), LAST(ts), COUNT(*)   -- included rows only

    The click/view run B+ is REQUIRED for the match (the automaton
    advances through it) but its rows drop from the output: n_rows is
    always 2 (the signup + the purchase), first/last span the included
    rows, and excl_rows counts what the exclusion removed.  Oracle: the
    relational formulation — a signup qualifies iff its following
    B-run has length >= 1 and terminates at a purchase (window-function
    run arithmetic, no regex).  Engine: operators/cep.
    match_recognize_exclusion — exclusion sections become named regex
    groups whose spans are subtracted; one keyed shuffle, linear scan.
    Fuzzed against a reference scan in tests/test_properties.py."""
    e = load_table(spark, sf_dir, "events")
    return cep.match_recognize_exclusion(
        e, "user_id", "ts", "event_id",
        cep.classify(_SYMBOLS)(F.col("event_type")), "A{-B+-}C",
    ).withColumnRenamed("key", "user_id")


@register(
    "s_exclusion_stream",
    oracle=_EXCLUSION_ORACLE,
    survey="X5-S X2",
    tags=("streaming",),
)
def s_exclusion_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of x5_exclusion: the same exclusion engine
    (shared ``exclusion_matches`` scan) over keyed incremental state —
    a match completes when its purchase arrives, the excluded click run
    having advanced the NFA across micro-batches without ever being
    buffered into the emitted measures.  Emission is prefix-stable (B+
    cannot extend past the closing C), so the drained stream converges
    to the batch twin's oracle at any chunking."""
    import os

    from ..streaming import replay
    from ..streaming.cep_stream import streaming_match_exclusion
    from .streaming_queries import (
        _CHUNKS, _FILES_PER_TRIGGER, _drain_to_memory, _work_dir,
    )

    wd = _work_dir(sf_dir, "s_exclusion")
    sdf = replay.replay_table(
        spark, sf_dir, "events", os.path.join(wd, "src"), chunks=_CHUNKS,
        order_by=["ts", "event_id"],
        files_per_trigger=_FILES_PER_TRIGGER,
    )
    out = streaming_match_exclusion(
        sdf, "user_id", "ts", "event_id",
        cep.classify(_SYMBOLS)(F.col("event_type")), "A{-B+-}C",
        start_chars="A",
    )
    res = _drain_to_memory(spark, out, "s_exclusion_q", "append", wd)
    return res.select(
        F.col("key").alias("user_id"),
        "match_no", "start_id", "end_id", "n_rows", "excl_rows",
        "first_ts", "last_ts",
    )


# --------------------------------------------------------------------------
# X5 — ITERATIVE conditions (Flink CEP IterativeCondition / DEFINE
# referencing FIRST(A.value)): the last MATCH_RECOGNIZE evaluation mode —
# a row's admissibility depends on the partial match, so symbols cannot
# be pre-classified.  PATTERN (A B+ C), A = any signup (its value is the
# entry anchor), B = click|view priced ABOVE the anchor, C = a purchase
# priced BELOW it — "a run above the entry price ending in a dip".
#
# Oracle derivation (why plain window SQL can replay an NFA): only 'A'
# rows can start a match and every A unconditionally re-anchors, so the
# live anchor at any row is simply the latest preceding signup; a
# purchase row closes a match iff EVERY row strictly between that anchor
# and itself is a valid B (click/view, value > anchor value) and its own
# value is below the anchor with >= 1 B.  Any intervening failed C or
# foreign row voids exactly the same attempts the NFA's backtracking
# would — the disjoint symbol alphabet collapses the scan to a closed
# per-anchor-group form (groups = running count of signups).
# --------------------------------------------------------------------------
_ITER_ORACLE = """
    WITH ev AS (
      SELECT user_id, event_id, ts, value,
             CASE event_type WHEN 'signup' THEN 'A'
                             WHEN 'click' THEN 'B'
                             WHEN 'view' THEN 'B'
                             WHEN 'purchase' THEN 'C'
                             ELSE 'X' END AS sym,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ), anch AS (
      SELECT *,
             SUM(CASE WHEN sym = 'A' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY rn) AS grp
      FROM ev
    ), g1 AS (
      SELECT *,
             FIRST_VALUE(value) OVER w AS anchor_value,
             FIRST_VALUE(rn) OVER w AS anchor_rn,
             FIRST_VALUE(event_id) OVER w AS anchor_id,
             FIRST_VALUE(ts) OVER w AS anchor_ts
      FROM anch WHERE grp >= 1
      WINDOW w AS (PARTITION BY user_id, grp ORDER BY rn)
    ), g2 AS (
      SELECT *,
             COALESCE(SUM(CASE WHEN rn > anchor_rn
                                AND NOT (sym = 'B' AND value > anchor_value)
                               THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id, grp ORDER BY rn
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS bad_before
      FROM g1
    )
    SELECT user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY anchor_rn)
                AS BIGINT) AS match_no,
           anchor_id AS start_id, event_id AS end_id,
           CAST(rn - anchor_rn - 1 AS BIGINT) AS b_rows,
           anchor_value, value AS end_value,
           anchor_ts AS start_ts, ts AS end_ts
    FROM g2
    WHERE sym = 'C' AND value < anchor_value
      AND bad_before = 0 AND rn - anchor_rn >= 2
"""

def _iter_symbol():
    return (
        F.when(F.col("event_type") == "signup", "A")
        .when(F.col("event_type").isin("click", "view"), "B")
        .when(F.col("event_type") == "purchase", "C")
        .otherwise("X")
    )


@register(
    "x5_iterative_condition",
    oracle=_ITER_ORACLE,
    survey="X5 X2",
)
def x5_iterative_condition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE with ITERATIVE conditions — Flink CEP's
    IterativeCondition / SQL ``DEFINE B AS B.value > FIRST(A.value),
    C AS C.value < FIRST(A.value)`` over PATTERN (A B+ C): row
    admissibility depends on the match being built (the anchoring
    signup's value), the evaluation mode the static-classification CEP
    paths above cannot express.  One shuffle on user_id, O(1) scan state
    per key (operators/cep.iterative_step — the same step function the
    streaming twin runs incrementally)."""
    e = load_table(spark, sf_dir, "events")
    return cep.match_recognize_iterative(
        e, "user_id", "ts", "event_id", "value", _iter_symbol()
    ).withColumnRenamed("key", "user_id")


@register(
    "s_iterative_condition_stream",
    oracle=_ITER_ORACLE,
    survey="X5-S X2",
    tags=("streaming",),
)
def s_iterative_condition_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING iterative-condition CEP: the identical automaton
    (operators/cep.iterative_step) advanced per micro-batch in keyed
    state — and because iterative A B+ C attempts are decidable
    row-by-row, the state is the CONSTANT-SIZE automaton tuple, no
    undecided-suffix buffer at all (the other streaming CEP paths must
    retain one).  Matches are emitted the moment their closing purchase
    arrives; the drained stream hash-matches the batch closed form."""
    import os

    from ..streaming import replay
    from ..streaming.cep_stream import streaming_match_iterative
    from .streaming_queries import (
        _CHUNKS, _FILES_PER_TRIGGER, _drain_to_memory, _work_dir,
    )

    wd = _work_dir(sf_dir, "s_iter_cond")
    sdf = replay.replay_table(
        spark, sf_dir, "events", os.path.join(wd, "src"), chunks=_CHUNKS,
        order_by=["ts", "event_id"],
        files_per_trigger=_FILES_PER_TRIGGER,
    )
    out = streaming_match_iterative(
        sdf, "user_id", "ts", "event_id", "value", _iter_symbol()
    )
    res = _drain_to_memory(spark, out, "s_iter_cond_q", "append", wd)
    return res.select(
        F.col("key").alias("user_id"),
        "match_no", "start_id", "end_id", "b_rows",
        "anchor_value", "end_value", "start_ts", "end_ts",
    )


@register(
    "sql_match_recognize",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, ts,
             CASE event_type WHEN 'signup' THEN 'S'
                             WHEN 'click' THEN 'C'
                             WHEN 'purchase' THEN 'P'
                             ELSE 'X' END AS sym,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ), cum AS (
      SELECT *,
             MIN(CASE WHEN sym <> 'C' THEN rn END)
               OVER (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS nrun
      FROM ev
    )
    SELECT s.user_id,
           s.ts AS start_ts, e.ts AS end_ts,
           CAST(e.rn - s.rn - 1 AS BIGINT) AS clicks,
           CAST(e.rn - s.rn + 1 AS BIGINT) AS total_rows
    FROM cum s JOIN cum e
      ON e.user_id = s.user_id AND e.rn = s.nrun
    WHERE s.sym = 'S' AND e.sym = 'P' AND e.rn - s.rn - 1 >= 1
    """,
    survey="S12 X5",
)
def sql_match_recognize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VERBATIM Flink MATCH_RECOGNIZE statement executes through the
    dialect layer (S12 closure — Spark has no row-pattern SQL, so
    functions/flink_sql.run_match_recognize parses the statement and
    drives the certified CEP operator): PARTITION BY / ORDER BY /
    MEASURES (FIRST, LAST, COUNT(V.*), COUNT(*)) / PATTERN with
    quantifiers / DEFINE literal-equality predicates, ONE ROW PER MATCH
    with AFTER MATCH SKIP PAST LAST ROW; WITHIN since r9
    (sql_match_recognize_within).  Out-of-subset clauses (SUBSET,
    SKIP TO, ALL ROWS PER MATCH) raise and route to their dedicated
    operator entry points — the same split Flink's own planner makes
    between MATCH_RECOGNIZE features and CEP-library-only ones.

    The oracle replays S C+ P relationally: every match starts at an S
    and spans only C rows, so the first non-C row after each S decides
    the match — the same argument the quantifier family fuzz-proves."""
    from ..functions.flink_mr import run_match_recognize
    from ..tables import register_views

    register_views(spark, sf_dir)
    return run_match_recognize(
        spark,
        """
        SELECT user_id, start_ts, end_ts, clicks, total_rows
        FROM events
        MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(S.ts) AS start_ts, LAST(P.ts) AS end_ts,
                   COUNT(C.*) AS clicks, COUNT(*) AS total_rows
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (S C+ P)
          DEFINE S AS S.event_type = 'signup',
                 C AS C.event_type = 'click',
                 P AS P.event_type = 'purchase'
        ) AS mr
        """,
    )


@register(
    "sql_match_recognize_within",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, ts,
             CASE event_type WHEN 'signup' THEN 'S'
                             WHEN 'click' THEN 'C'
                             WHEN 'purchase' THEN 'P'
                             ELSE 'X' END AS sym,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ), cum AS (
      SELECT *,
             MIN(CASE WHEN sym <> 'C' THEN rn END)
               OVER (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS nrun
      FROM ev
    )
    SELECT s.user_id,
           s.ts AS start_ts, e.ts AS end_ts,
           CAST(e.rn - s.rn - 1 AS BIGINT) AS clicks
    FROM cum s JOIN cum e
      ON e.user_id = s.user_id AND e.rn = s.nrun
    WHERE s.sym = 'S' AND e.sym = 'P' AND e.rn - s.rn - 1 >= 1
      AND e.ts <= s.ts + INTERVAL 24 HOUR
    """,
    survey="S12 X5",
)
def sql_match_recognize_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``PATTERN (...) WITHIN INTERVAL`` through the VERBATIM statement
    path (r9 — previously routed to the operator entry point only): the
    time-constrained row-pattern match, Flink 1.19's MATCH_RECOGNIZE
    WITHIN clause.  The bound runs as a post-filter on completed
    matches, which equals the NFA's within-timer under the statement
    subset's guarantees — DEFINE classes are disjoint (overlap raises)
    and the start variable appears once at pattern head, so a discarded
    too-long match cannot contain another match's start row and a
    timed-out partial is also a failed scan attempt; the repeated-
    start-variable shape where that argument breaks raises as
    out-of-subset.  The 24-hour bound BINDS on this corpus (98 -> 61
    matches at sf0.01 — non-vacuity pinned in tests/test_r9_ops.py)."""
    from ..functions.flink_mr import run_match_recognize
    from ..tables import register_views

    register_views(spark, sf_dir)
    return run_match_recognize(
        spark,
        """
        SELECT user_id, start_ts, end_ts, clicks
        FROM events
        MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(S.ts) AS start_ts, LAST(P.ts) AS end_ts,
                   COUNT(C.*) AS clicks
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (S C+ P) WITHIN INTERVAL '24' HOUR
          DEFINE S AS S.event_type = 'signup',
                 C AS C.event_type = 'click',
                 P AS P.event_type = 'purchase'
        ) AS mr
        """,
    )
