"""Local replica of the driver's DuckDB-oracle comparison.

The driver runs each ``queries()[name]`` on Spark and ``oracle_sql()[name]``
on DuckDB (tables pre-registered as views), then compares row-count, schema
(column names) and an order-insensitive value-hash. We replicate that
*strictly* here — exact value equality after sorting columns by name and
rows by value — so anything that passes locally passes any reasonable
driver hash.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from flink_1_19_source_spark.tables import TABLE_NAMES, table_path


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for name in TABLE_NAMES:
            con.sql(
                f"CREATE VIEW {name} AS SELECT * FROM '{table_path(sf_dir, name)}'"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def _canon_dtype(dt) -> str:
    """Normalize a pandas dtype for strict comparison.

    The driver's value-hash is dtype-*kind*-sensitive: int64 9 and float64
    9.0 hash differently (f_math_family failed CORRECTNESS_r01 on exactly
    this), but int32 vs int64 passed (o6_topn_pattern: Spark row_number
    int32 vs DuckDB ROW_NUMBER int64 was driver-green) — consistent with a
    pandas hash_array-style hash that widens every integer to uint64 and
    every float to float64 before hashing bit patterns. Mirror that:

    - integer widths (incl. unsigned) collapse to "int";
    - float widths collapse to "float";
    - datetime64 resolutions collapse to "datetime" (values are compared
      via isoformat, which is resolution-exact anyway);
    - int vs float vs bool vs object stay DISTINCT — that is the drift
      class the driver actually rejects.
    """
    s = str(dt)
    if s.startswith("datetime64"):
        return "datetime"
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    if s.startswith(("float", "Float")):
        return "float"
    return s


def assert_dtypes_match(name: str, got: pd.DataFrame, want: pd.DataFrame) -> None:
    for col in sorted(got.columns):
        g, w = _canon_dtype(got[col].dtype), _canon_dtype(want[col].dtype)
        assert g == w, (
            f"{name}: dtype mismatch on column {col!r}: spark={g} duckdb={w} "
            f"(driver hash is dtype-strict — cast one side)"
        )


def _canon_cell(v):
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_cell(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, float):
        if math.isnan(v):
            # pandas can't distinguish NULL from NaN (a NULL boolean/int
            # arrives as NaN from DuckDB but None from Spark) — canonicalize
            # both to NULL; engine queries never emit real NaN doubles.
            return "<NULL>"
        return v
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if v is None or v is pd.NaT:
        return "<NULL>"
    return v


def canon_rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def assert_query_matches(spark, sf_dir: str, name: str) -> None:
    from flink_1_19_source_spark.registry import REGISTRY, queries

    queries()  # populate
    spec = REGISTRY[name]
    got = spec.fn(spark, sf_dir).toPandas()
    assert spec.oracle is not None, f"{name}: no oracle (rows-only query)"
    want = run_oracle(spec.oracle, sf_dir)

    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch spark={sorted(got.columns)} duckdb={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rowcount spark={len(got)} duckdb={len(want)}"
    assert_dtypes_match(name, got, want)

    grows, wrows = canon_rows(got), canon_rows(want)
    for i, (g, w) in enumerate(zip(grows, wrows)):
        assert g == w, f"{name}: row {i} differs\n  spark : {g}\n  duckdb: {w}"
