"""Bounded append-only segment stores for streaming ingest indexes.

A long-running ingest stream (the MinHash/chunk-hash dedup gates, the
IVF index builder, the sketch-maintenance streams) appends one parquet
segment per micro-batch.  Without folding, both the per-batch driver
listing and every index read grow O(#batches) — a slow leak over weeks
of uptime even though per-batch *compute* stays O(batch).

``SegmentStore`` bounds it: every ``compact_every`` appends it folds
all live files into ONE compacted segment, optionally re-aggregating
via ``merge`` so the folded state is bounded by the DOMAIN (distinct
chunk hashes, sketch cells, band buckets) rather than stream length.
Live file count is therefore ≤ compact_every at all times.

Crash-safety contract (X4), designed for foreachBatch replay where the
batch in flight at a crash is re-run with the SAME batch id:

- ``seg-<bid>`` is written with overwrite → a replayed append of a
  not-yet-compacted batch converges trivially (same rows, same path).
- A compaction writes ``compact-<bid>`` from every live compacted +
  raw segment, then deletes its inputs.  ``_SUCCESS`` (written last by
  Spark's committer) is the commit mark: a torn compaction (no
  _SUCCESS) is invisible to readers and rebuilt from its still-present
  inputs on replay; a committed one (crash before the input sweep) is
  detected, the rewrite skipped, and the leftover inputs swept on the
  replayed call.
- An append whose bid is already covered by a committed compaction
  (crash after the fold, replay of the folded batch) is SKIPPED — its
  rows already live in the compact file, and rewriting ``seg-<bid>``
  would double them (harmless for min/distinct probes, fatal for
  summing merges).

At 100 TB the same contract holds with ``compact_every`` sized so a
fold touches hours — not weeks — of segments; the fold itself is one
bounded distributed job, and probes between folds read ≤ K files.
"""

from __future__ import annotations

import glob
import os
import shutil
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


class SegmentStore:
    """Crash-safe, self-compacting parquet segment store.

    ``merge`` (optional) re-aggregates rows when folding — e.g.
    ``groupBy(hash).min(key)`` for a keep-first index or
    ``groupBy(cell).sum(count)`` for a mergeable sketch — keeping the
    compacted file bounded by the domain, not the stream.
    """

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        compact_every: int = 4,
        merge: Optional[Callable[[DataFrame], DataFrame]] = None,
    ) -> None:
        assert compact_every >= 2, "compact_every < 2 never amortizes"
        self.spark = spark
        self.base_dir = base_dir
        self.compact_every = compact_every
        self.merge = merge
        os.makedirs(base_dir, exist_ok=True)

    # -- listing ---------------------------------------------------------
    def _segs(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.base_dir, "seg-*")))

    def _compacts(self, committed_only: bool = True) -> list[str]:
        out = sorted(glob.glob(os.path.join(self.base_dir, "compact-*")))
        if committed_only:
            out = [
                p for p in out
                if os.path.exists(os.path.join(p, "_SUCCESS"))
            ]
        return out

    def _last_compacted_bid(self) -> int:
        cs = self._compacts()
        if not cs:
            return -1
        return max(int(os.path.basename(p).rsplit("-", 1)[1]) for p in cs)

    # -- API -------------------------------------------------------------
    def append(self, df: DataFrame, bid: int) -> None:
        """Write batch ``bid``'s segment; fold every ``compact_every``.

        A bid at or below the last committed compaction is a crash
        replay of an already-folded batch: the segment write is skipped
        (rows are in the compact), but the boundary fold still runs so
        an interrupted input sweep completes.
        """
        if bid > self._last_compacted_bid():
            df.write.mode("overwrite").parquet(
                os.path.join(self.base_dir, f"seg-{bid:04d}")
            )
        if (bid + 1) % self.compact_every == 0:
            self._compact(bid)

    def paths(self) -> list[str]:
        """Every live (readable) file: committed compacts + raw segs."""
        return self._compacts() + self._segs()

    def read(self) -> DataFrame | None:
        ps = self.paths()
        if not ps:
            return None
        return self.spark.read.parquet(*ps)

    def live_file_count(self) -> int:
        return len(self.paths())

    # -- folding ---------------------------------------------------------
    def _compact(self, bid: int) -> None:
        out = os.path.join(self.base_dir, f"compact-{bid:04d}")
        if not os.path.exists(os.path.join(out, "_SUCCESS")):
            inputs = [p for p in self.paths() if p != out]
            if not inputs:
                return
            df = self.spark.read.parquet(*inputs)
            if self.merge is not None:
                df = self.merge(df)
            df.write.mode("overwrite").parquet(out)
        # committed: sweep everything the fold covered (all other live
        # files and any torn older compacts) — idempotent on replay
        for p in self._compacts(committed_only=False) + self._segs():
            if p != out:
                shutil.rmtree(p, ignore_errors=True)
