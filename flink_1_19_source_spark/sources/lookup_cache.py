"""Partial-caching lookup join (SURVEY §2.3 J7, §2.1 S8 runtime).

Flink's lookup join default is NOT a full-table load: each task fetches
only the keys it actually probes, through an LRU cache
('lookup.cache' = PARTIAL [docs: jdbc connector lookup options]); the
broadcast path (j7_lookup_broadcast) is the 'FULL' cache. This module
implements the PARTIAL contract: per Arrow batch, the task diffs the
probe keys against its process-local cache, point-fetches only the
misses from the dimension store, and enriches rows locally — zero
shuffle on the probe side, fetch volume ∝ distinct keys per task, not
rows.

The dimension store here is a parquet file probed with predicate-pushdown
point reads (pyarrow filters → row-group pruning) — the same fetch shape
as a remote KV/JDBC point lookup; swap ``_fetch`` for a JDBC/HTTP client
at deploy. Cache effectiveness is measured with Spark accumulators and
ASSERTED by the caller (fetched keys < probed rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def lookup_join_partial_cache(
    probe: DataFrame,
    key_col: str,
    dim_path: str,
    dim_key: str,
    dim_cols: list[str],
    out_schema: StructType,
    fetched_acc,
    probed_acc,
) -> DataFrame:
    """Enrich ``probe`` with ``dim_cols`` looked up by key, fetching each
    distinct key at most once per task (LRU-style cache; unbounded here —
    a real deployment caps it, evicting LRU)."""

    def gen(batches):
        import pyarrow.parquet as pq

        cache: dict = {}

        def fetch(keys: list) -> None:
            if not keys:
                return
            t = pq.read_table(
                dim_path,
                columns=[dim_key] + dim_cols,
                filters=[(dim_key, "in", keys)],
            ).to_pandas()
            for row in t.itertuples(index=False):
                cache[getattr(row, dim_key)] = tuple(
                    getattr(row, c) for c in dim_cols
                )
            for k in keys:  # negative caching: misses cached as None
                cache.setdefault(k, None)
            fetched_acc.add(len(keys))

        for pdf in batches:
            probed_acc.add(len(pdf))
            misses = sorted(set(pdf[key_col].tolist()) - cache.keys())
            fetch(misses)
            for i, c in enumerate(dim_cols):
                pdf[c] = pdf[key_col].map(
                    lambda k, i=i: cache[k][i] if cache[k] is not None else None
                )
            yield pdf

    return probe.mapInPandas(gen, out_schema)
