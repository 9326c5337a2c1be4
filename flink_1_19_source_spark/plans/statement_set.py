"""EXECUTE STATEMENT SET (SURVEY §2.1 S12) — Flink's multi-sink job.

Flink compiles ``EXECUTE STATEMENT SET BEGIN INSERT ...; INSERT ...; END``
into ONE job whose source vertices are shared across all INSERTs — a
table scanned by N statements is read once [docs: "INSERT INTO ...
STATEMENT SET"; upstream: flink-table-planner StatementSetOperation].

Spark-first analog: each INSERT is its own action, so naive execution
re-scans the shared subplan once per sink. The statement set marks the
shared frame and persists it (MEMORY_AND_DISK) for the duration of the
writes — the second and later sinks read the materialized scan
(``InMemoryTableScan`` in their plans, asserted in tests/test_plans.py),
which is exactly the shared-source-vertex property. At 100 TB the same
pattern holds with a disk-backed persist or, for fully decoupled sinks,
a write-once-read-many staging table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class StatementSet:
    """Collects INSERT statements and executes them as one logical job.

    ``shared`` is the subplan common to the statements (the scanned
    source table in the typical fan-out); it is persisted across the
    whole execute() so every sink reads it once.
    """

    shared: DataFrame | None = None
    _inserts: list[tuple[str, DataFrame, str]] = field(default_factory=list)

    def add_insert(self, path: str, df: DataFrame, fmt: str = "parquet") -> "StatementSet":
        self._inserts.append((path, df, fmt))
        return self

    def execute(self) -> None:
        if not self._inserts:
            raise ValueError("empty statement set")
        if self.shared is not None:
            self.shared.persist()
        try:
            for path, df, fmt in self._inserts:
                df.write.mode("overwrite").format(fmt).save(path)
        finally:
            if self.shared is not None:
                self.shared.unpersist()
