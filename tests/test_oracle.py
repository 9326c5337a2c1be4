"""Every registered query with an oracle must match DuckDB exactly.

This is the local replica of the driver's t2 correctness gate, run at
sf0.001 for speed (the driver runs sf0.01; run with
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full check).
"""

from __future__ import annotations

import pytest

from flink_1_19_source_spark.registry import REGISTRY, queries

from .oracle import assert_query_matches

queries()  # populate REGISTRY
ORACLED = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_match(spark, sf_dir, name):
    assert_query_matches(spark, sf_dir, name)


def test_every_query_is_oracled():
    """Since r5 every registered query carries a full value-hash oracle;
    a new rows-only registration would silently weaken the gate — fail
    loudly instead and force the author to build an oracle (seeded
    constants / md5 bridges / generated SQL all work — see memory of
    prior rounds in operators/sketches.py, dedup.py, kmeans.py)."""
    assert ROWS_ONLY == [], ROWS_ONLY


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
