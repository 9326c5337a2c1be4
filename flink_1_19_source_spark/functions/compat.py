"""Flink built-in functions that need a shim on Spark.

Most of Flink 1.19's scalar library (SURVEY.md §2.8; upstream:
flink-table-common BuiltInFunctionDefinitions.java) maps 1:1 onto
``pyspark.sql.functions``. The handful that don't are implemented here as
*column expressions* (JVM-side, codegen-able — never Python UDFs), so they
stay inside whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_index(col: Column, delim: str, idx: int) -> Column:
    """Flink SPLIT_INDEX(str, delim, idx): 0-based field extract; NULL when
    out of range (element_at is 1-based and errors/NULLs differently)."""
    arr = F.split(col, F.lit(delim), -1)
    return F.when(F.size(arr) > idx, arr.getItem(idx))


def rand_integer(bound: int, seed: int | None = None) -> Column:
    """Flink RAND_INTEGER(bound): uniform int in [0, bound)."""
    r = F.rand(seed) if seed is not None else F.rand()
    return F.floor(r * bound).cast("int")


def truncate(col: Column, n: int = 0) -> Column:
    """Flink TRUNCATE(x, n): truncate toward zero to n decimal digits."""
    p = F.lit(10.0) ** n
    return (
        F.when(col >= 0, F.floor(col * p) / p).otherwise(-(F.floor(-col * p) / p))
    )


def log2(col: Column) -> Column:
    return F.log2(col)


def hash_code(col: Column) -> Column:
    """Flink HASH_CODE(str) → Java String.hashCode-ish; we standardize on
    Spark's murmur3 ``hash`` (documented deviation: different constants,
    same contract — deterministic int hash)."""
    return F.hash(col)


def to_multiset_string(list_col: Column) -> Column:
    """Canonical string form of a MULTISET (Flink COLLECT result):
    'elem:count,...' sorted by element. Flink's MULTISET renders as a
    map elem→count; a sorted string makes it engine-comparable."""
    counted = F.transform(
        F.array_distinct(list_col),
        lambda x: F.concat_ws(
            ":",
            x.cast("string"),
            F.size(F.filter(list_col, lambda y: y == x)).cast("string"),
        ),
    )
    return F.array_join(F.array_sort(counted), ",")


def listagg(col: Column, delim: str = ",") -> Column:
    """Flink LISTAGG with deterministic (sorted) order. Flink's own LISTAGG
    is arrival-ordered — nondeterministic after a shuffle — so the engine
    standardizes on sorted order for reproducibility at scale."""
    return F.array_join(F.array_sort(F.collect_list(col)), delim)


def parse_url(col: Column, part: str) -> Column:
    return F.parse_url(col, F.lit(part))


def is_json(col: Column) -> Column:
    """Flink IS JSON predicate ≈ try-parse succeeds."""
    return F.try_parse_json(col).isNotNull()
