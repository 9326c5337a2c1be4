"""SIMILAR TO translation + CURRENT_WATERMARK surface tests."""

import datetime as dt
import re

import pytest

from flink_1_19_source_spark.functions.flink_sql import (
    WATERMARK_CONF,
    translate,
)
from flink_1_19_source_spark.functions.similar_to import similar_to_regex

from .conftest import *  # noqa: F401,F403  (spark fixture)


@pytest.mark.parametrize(
    "pattern,text,matches",
    [
        ("%green%", "dark green metal", True),
        ("%green%", "dark metal", False),
        ("a_c", "abc", True),
        ("a_c", "ac", False),
        ("(ECONOMY|STANDARD)%", "STANDARD BRUSHED", True),
        ("(ECONOMY|STANDARD)%", "PROMO BRUSHED", False),
        ("Brand#[0-9]{2}", "Brand#13", True),
        ("Brand#[0-9]{2}", "Brand#1", False),
        # SQL dialect: '.' '^' '$' are literals, not regex specials
        ("%.%", "end.", True),
        ("%.%", "no dot", False),
        ("^x$", "^x$", True),
        ("^x$", "x", False),
    ],
)
def test_similar_to_sql_semantics(pattern, text, matches):
    rx = similar_to_regex(pattern)
    assert bool(re.fullmatch(rx, text)) is matches


def test_similar_to_unterminated_class_raises():
    with pytest.raises(ValueError):
        similar_to_regex("ab[cd")


def test_translate_rewrites_similar_to():
    out = translate("SELECT a SIMILAR TO '%x%' AS m, b NOT SIMILAR TO 'a_' AS n FROM t")
    assert "SIMILAR" not in out.upper().replace("RLIKE", "")
    assert "RLIKE '^(?:.*x.*)$'" in out
    assert "NOT RLIKE '^(?:a.)$'" in out


def test_translate_escapes_backslashes_for_sql_literal():
    # '.' is a literal dot in SQL SIMILAR TO → regex \. → SQL text \\.
    out = translate("SELECT a SIMILAR TO 'a.b' FROM t")
    assert "RLIKE '^(?:a\\\\.b)$'" in out


def test_current_watermark_substitution(spark):
    spark.conf.set(WATERMARK_CONF, "2024-01-01 12:00:00")
    out = translate("SELECT * FROM t WHERE ts <= CURRENT_WATERMARK(ts)", spark)
    assert "TIMESTAMP'2024-01-01 12:00:00'" in out
    assert spark.sql(
        "SELECT " + translate("CURRENT_WATERMARK(ts)", spark) + " AS wm"
    ).first().wm == dt.datetime(2024, 1, 1, 12)


def test_current_watermark_null_when_unpublished(spark):
    spark.conf.unset(WATERMARK_CONF)
    out = translate("SELECT CURRENT_WATERMARK(ts) AS wm", spark)
    assert "CAST(NULL AS TIMESTAMP)" in out


def test_dialect_shims_are_inlined_expressions_not_python_udfs(spark):
    """SPLIT_INDEX / STRCMP / TRUNCATE are SQL-defined functions whose
    bodies Catalyst inlines — the executed plan must contain no Python
    evaluation node (the r4 row-at-a-time shim regression class)."""
    from flink_1_19_source_spark.functions.flink_sql import flink_sql

    df = flink_sql(
        spark,
        """SELECT SPLIT_INDEX(CAST(id AS STRING) || '.x.y', '.', 1) AS a,
                  STRCMP(CAST(id AS STRING), '3') AS b,
                  TRUNCATE(id * 1.111, 2) AS c
           FROM range(10)""",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    rows = df.collect()
    assert all(r.a == "x" for r in rows)  # ['<id>','x','y'] → index 1
    assert [r.b for r in rows][:5] == [-1, -1, -1, 0, 1]  # '0'..'4' vs '3'
    assert rows[1].c == 1.11  # trunc(1.111, 2)


def test_window_tvf_translation_shapes():
    """The Flink windowing-TVF rewrite: TUMBLE maps to window(), HOP and
    CUMULATE to covering-window expansions, SESSION restructures the
    aggregation onto session_window()."""
    import pytest

    from flink_1_19_source_spark.functions.flink_sql import translate

    t = translate(
        "SELECT * FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts),"
        " INTERVAL '1' HOUR))"
    )
    assert "window(ts, '1 hour')" in t and "window_start" in t

    h = translate(
        "SELECT * FROM TABLE(HOP(TABLE events, DESCRIPTOR(ts),"
        " INTERVAL '15' MINUTE, INTERVAL '1' HOUR))"
    )
    assert "explode(sequence(0, 3))" in h and "window_end > ts" in h

    c = translate(
        "SELECT * FROM TABLE(CUMULATE(TABLE events, DESCRIPTOR(ts),"
        " INTERVAL '15' MINUTE, INTERVAL '1' HOUR))"
    )
    assert "explode(sequence(1, 4))" in c

    s = translate(
        "SELECT window_start, window_end, user_id, COUNT(*) AS n"
        " FROM TABLE(SESSION(TABLE events PARTITION BY user_id,"
        " DESCRIPTOR(ts), INTERVAL '10' MINUTE))"
        " GROUP BY window_start, window_end, user_id"
        " ORDER BY window_start"
    )
    assert "GROUP BY session_window(ts, '10 minute'), user_id" in s
    assert "session_window(ts, '10 minute').start AS window_start" in s
    assert "session_window(ts, '10 minute').end AS window_end" in s
    # ORDER BY resolves against the output alias, not the raw expr
    assert "ORDER BY window_start" in s
    assert "TABLE(" not in s

    # the non-aggregated shape does not exist in Flink 1.19 — reject it
    with pytest.raises(ValueError, match="GROUP BY"):
        translate(
            "SELECT * FROM TABLE(SESSION(TABLE events, DESCRIPTOR(ts),"
            " INTERVAL '10' MINUTE))"
        )


def test_window_restructure_survives_embedded_from_tokens():
    """The SELECT-list/FROM split must be paren/quote-aware: a FROM
    inside EXTRACT(... FROM ...) or a 'FROM' string literal is not the
    statement's FROM and must not truncate the rewrite."""
    from flink_1_19_source_spark.functions.flink_sql import translate

    s = translate(
        "SELECT window_start, EXTRACT(HOUR FROM window_start) AS hr,"
        " ' FROM ' AS lit, user_id, COUNT(*) AS n"
        " FROM TABLE(SESSION(TABLE events PARTITION BY user_id,"
        " DESCRIPTOR(ts), INTERVAL '10' MINUTE))"
        " GROUP BY window_start, window_end, user_id"
    )
    # the embedded tokens survive and window_start resolves in BOTH
    # the bare item and inside EXTRACT
    assert "EXTRACT(HOUR FROM session_window(ts, '10 minute').start)" in s
    assert "' FROM '" in s
    assert "session_window(ts, '10 minute').start AS window_start" in s
    assert "GROUP BY session_window(ts, '10 minute'), user_id" in s


def test_legacy_group_window_translation_shapes():
    from flink_1_19_source_spark.functions.flink_sql import translate

    q = translate(
        "SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS ws, COUNT(*) n "
        "FROM events GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)"
    )
    assert "window(ts, '1 hour').start" in q
    assert "GROUP BY window(ts, '1 hour')" in q

    # HOP arg order flips: Flink (slide, size) -> Spark (size, slide)
    q = translate(
        "SELECT HOP_END(ts, INTERVAL '15' MINUTE, INTERVAL '1' HOUR) "
        "FROM events GROUP BY HOP(ts, INTERVAL '15' MINUTE, INTERVAL '1' HOUR)"
    )
    assert "window(ts, '1 hour', '15 minute').end" in q
    assert "GROUP BY window(ts, '1 hour', '15 minute')" in q

    q = translate(
        "SELECT SESSION_START(ts, INTERVAL '10' MINUTE) AS ws, COUNT(*) n "
        "FROM events GROUP BY SESSION(ts, INTERVAL '10' MINUTE)"
    )
    assert "session_window(ts, '10 minute').start" in q
    assert "GROUP BY session_window(ts, '10 minute')" in q


def test_agg_on_tvf_collapses_onto_native_window_expression():
    """The agg-on-TVF shape must group by Spark's window() expression —
    the plan Catalyst optimizes AND the only form Structured Streaming
    accepts in append mode (plain derived columns lose the watermark);
    the non-aggregated scan keeps the per-row covering-window form."""
    from flink_1_19_source_spark.functions.flink_sql import translate

    q = translate(
        "SELECT window_start, window_end, COUNT(*) AS n"
        " FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))"
        " GROUP BY window_start, window_end"
    )
    assert "GROUP BY window(ts, '1 hour')" in q
    assert "window(ts, '1 hour').start AS window_start" in q
    assert "LATERAL VIEW" not in q

    h = translate(
        "SELECT window_start, window_end, COUNT(*) AS n"
        " FROM TABLE(HOP(TABLE events, DESCRIPTOR(ts),"
        " INTERVAL '15' MINUTE, INTERVAL '1' HOUR))"
        " GROUP BY window_start, window_end"
    )
    # Spark window() is (size, slide): Flink's argument order flips
    assert "GROUP BY window(ts, '1 hour', '15 minute')" in h
    assert "explode" not in h

    # CUMULATE has no native grouping expression: stays the explode form
    c = translate(
        "SELECT window_start, window_end, COUNT(*) AS n"
        " FROM TABLE(CUMULATE(TABLE events, DESCRIPTOR(ts),"
        " INTERVAL '15' MINUTE, INTERVAL '1' HOUR))"
        " GROUP BY window_start, window_end"
    )
    assert "explode(sequence(1, 4))" in c


def test_tvf_restructure_edge_shapes():
    """r7 self-review pins: expression-embedded tokens substitute the
    raw field extraction (no alias mid-expression), CTE/nested shapes
    fall back to the per-row form, and the SESSION guards raise instead
    of silently corrupting."""
    from flink_1_19_source_spark.functions.flink_sql import translate

    q = translate(
        "SELECT window_start, window_end - window_start AS dur,"
        " MAX(window_start) AS mx, COUNT(*) AS n"
        " FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))"
        " GROUP BY window_start, window_end"
    )
    assert "AS window_end -" not in q and "AS window_start)" not in q
    assert "window(ts, '1 hour').end - window(ts, '1 hour').start AS dur" in q
    assert "MAX(window(ts, '1 hour').start) AS mx" in q

    cte = translate(
        "WITH e AS (SELECT * FROM events) SELECT window_start, window_end,"
        " COUNT(*) AS n"
        " FROM TABLE(TUMBLE(TABLE e, DESCRIPTOR(ts), INTERVAL '1' HOUR))"
        " GROUP BY window_start, window_end"
    )
    assert cte.startswith("WITH e AS") and "window_start" in cte

    with pytest.raises(ValueError, match="one SESSION TVF"):
        translate(
            "SELECT window_start, window_end, COUNT(*) n FROM"
            " TABLE(SESSION(TABLE a, DESCRIPTOR(ts), INTERVAL '1' MINUTE))"
            " GROUP BY window_start, window_end UNION ALL"
            " SELECT window_start, window_end, COUNT(*) n FROM"
            " TABLE(SESSION(TABLE b, DESCRIPTOR(ts), INTERVAL '1' MINUTE))"
            " GROUP BY window_start, window_end"
        )
    with pytest.raises(ValueError, match="PARTITION BY key"):
        translate(
            "SELECT window_start, window_end, COUNT(*) n FROM"
            " TABLE(SESSION(TABLE events PARTITION BY user_id,"
            " DESCRIPTOR(ts), INTERVAL '30' MINUTE))"
            " GROUP BY window_start, window_end"
        )


def test_state_ttl_hint_parse_strict():
    """FLIP-373 hint extraction: aliases map to seconds, the hint is
    stripped from the statement, absent hint returns {}, and malformed
    items RAISE — a TTL typo silently meaning 'infinite retention' is
    the failure mode the hint exists to prevent."""
    import pytest

    from flink_1_19_source_spark.functions.flink_sql import parse_state_ttl

    q = ("SELECT /*+ STATE_TTL('o'='4h', 'l'='90 s') */ o.id "
         "FROM orders o JOIN lineitem l ON o.id = l.oid")
    clean, ttls = parse_state_ttl(q)
    assert ttls == {"o": 4 * 3600, "l": 90}
    assert "STATE_TTL" not in clean and clean.startswith("SELECT  o.id")

    assert parse_state_ttl("SELECT 1") == ("SELECT 1", {})

    with pytest.raises(ValueError, match="malformed STATE_TTL"):
        parse_state_ttl("SELECT /*+ STATE_TTL('o'='forever') */ 1")
    with pytest.raises(ValueError, match="malformed STATE_TTL"):
        parse_state_ttl("SELECT /*+ STATE_TTL() */ 1")
    with pytest.raises(ValueError, match="malformed STATE_TTL"):
        # one good item + one broken one must still raise
        parse_state_ttl("SELECT /*+ STATE_TTL('a'='2s', 'b'=bogus) */ 1")


def test_translate_strips_state_ttl_hint(spark):
    """Spark's hint grammar rejects STATE_TTL's quoted k='v' items, so a
    verbatim Flink 1.19 hinted statement must run through translate():
    the hint is validated + stripped (TTL has no batch semantics), and a
    malformed hint still raises rather than translating to silence."""
    import pytest

    from flink_1_19_source_spark.functions.flink_sql import translate

    got = spark.sql(
        translate("SELECT /*+ STATE_TTL('v'='3s') */ 1 AS x")
    ).collect()
    assert got[0].x == 1
    with pytest.raises(ValueError, match="malformed STATE_TTL"):
        translate("SELECT /*+ STATE_TTL('v'=bogus) */ 1 AS x")
