"""Watermark alignment (SURVEY §2.9 X1 — Flink FLIP-182/217, 1.17+).

``watermark alignment group``: the source coordinator pauses any
partition/split whose event-time watermark has run more than the allowed
drift ahead of the slowest unfinished split. Splits report their
watermark after every fetch; the coordinator broadcasts the global
minimum; fast splits sit out fetch rounds until the floor catches up.

Simulation shape: because a "fetch" here is an offset-range parquet scan,
the per-fetch watermark REPORTS are precomputed in ONE aggregate pass
(max event time per (partition, fetch index) — ≤ offsets/step rows
collected, the exact numbers each fetch would have reported), and the
poll loop itself is pure driver arithmetic over those P-sized reports —
the same coordinator state Flink holds, zero row data on the driver. At
deploy the reports come from the live reader tasks instead; the pausing
algorithm is unchanged.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def aligned_consume(spark, topic, max_drift_ms: int, step_offsets: dict[int, int]):
    """Run the alignment poll loop; returns (consumed DataFrame, stats).

    The scheduling invariant — a partition is never fetched while its
    watermark exceeds the slowest unfinished partition's by more than
    ``max_drift_ms`` — is structural in the loop; ``stats`` carries
    rounds / paused_rounds (pausing must actually engage under skewed
    ``step_offsets``) and the per-partition fetch trace.
    """
    end = topic.end_offsets(spark)
    if not end:
        raise ValueError("empty topic")

    # one pass: the watermark report each fetch would make (CASE over
    # partitions, since step sizes differ per partition)
    case = None
    for p in end:
        s = step_offsets.get(p, 1)
        branch = F.floor(F.col("offset") / F.lit(s))
        case = (
            F.when(F.col("partition") == p, branch)
            if case is None
            else case.when(F.col("partition") == p, branch)
        )
    reports_rows = (
        topic.read_batch(spark)
        .select("partition", case.alias("fetch"), "timestamp")
        .groupBy("partition", "fetch")
        .agg(F.max("timestamp").alias("mx"))
        .collect()
    )
    report: dict[tuple[int, int], int] = {
        (r["partition"], int(r["fetch"])): int(
            r["mx"].replace(tzinfo=dt.timezone.utc).timestamp() * 1000
        )
        for r in reports_rows
    }

    pos = {p: 0 for p in end}
    fetch_idx = {p: 0 for p in end}
    wm: dict[int, int] = {}
    rounds = paused_rounds = 0
    trace = []  # (pre-round watermarks, unfinished, read_set) per round
    fetched: dict[int, list[tuple[int, int]]] = {p: [] for p in end}
    while any(pos[p] < end[p] for p in end):
        rounds += 1
        unfinished = [p for p in end if pos[p] < end[p]]
        have = [wm[p] for p in unfinished if p in wm]
        floor_wm = min(have) if have else None
        # NB: read_set is never empty — the floor partition itself always
        # satisfies wm[p] == floor_wm <= floor_wm + drift, and a partition
        # with no report yet is always admitted.
        read_set = [
            p
            for p in unfinished
            if p not in wm or floor_wm is None or wm[p] <= floor_wm + max_drift_ms
        ]
        if len(read_set) < len(unfinished):
            paused_rounds += 1
        trace.append((dict(wm), list(unfinished), list(read_set)))
        for p in read_set:
            rep = report.get((p, fetch_idx[p]))
            if rep is not None:
                wm[p] = max(wm.get(p, rep), rep)
            fetch_idx[p] += 1
            nxt = min(pos[p] + step_offsets.get(p, 1), end[p])
            fetched[p].append((pos[p], nxt))
            pos[p] = nxt

    # Materialize exactly what the poll loop fetched: the union of the
    # per-fetch offset ranges (adjacent ranges coalesced — a skip leaves a
    # gap, a double-read leaves a duplicate range, so a scheduler bug shows
    # up in the hash instead of being papered over by a fresh [0, end) scan).
    ranges: list[tuple[int, int, int]] = []
    for p, spans in fetched.items():
        for start, stop in spans:
            if ranges and ranges[-1][0] == p and ranges[-1][2] == start:
                ranges[-1] = (p, ranges[-1][1], stop)
            else:
                ranges.append((p, start, stop))
    if not ranges:
        # Empty topic (all end offsets 0): the poll loop never ran, so an
        # empty bounded read stands in for the zero fetched ranges.
        empty = topic.read_batch(
            spark,
            starting_offsets={p: 0 for p in end},
            ending_offsets={p: 0 for p in end},
        )
        return empty, {
            "rounds": rounds, "paused_rounds": paused_rounds, "trace": trace,
        }
    parts = [
        topic.read_batch(
            spark,
            starting_offsets={p: start},
            # ending offset 0 excludes every other partition from this read
            ending_offsets={q: (stop if q == p else 0) for q in end},
        )
        for p, start, stop in ranges
    ]
    consumed = parts[0]
    for part in parts[1:]:
        consumed = consumed.unionByName(part)
    return consumed, {"rounds": rounds, "paused_rounds": paused_rounds, "trace": trace}
