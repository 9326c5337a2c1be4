"""Physical-plan audit helpers (SURVEY §4).

Flink exposes optimizer effects through EXPLAIN / compiled-plan JSON;
Catalyst's equivalent is the formatted explain. These helpers make plan
properties assertable in tests so regressions in pushdown / broadcast /
codegen show up as test failures, not 100 TB surprises:

- parquet scans must show PushedFilters + pruned ReadSchema;
- dimension joins must be BroadcastHashJoin (no shuffle of the fact side);
- hot expression pipelines must sit inside WholeStageCodegen spans;
- partitioned reads must prune partitions (PartitionFilters).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def scans(df: DataFrame) -> list[str]:
    """The Scan node descriptions from the formatted plan."""
    txt = plan_text(df)
    out = []
    block: list[str] = []
    for line in txt.splitlines():
        if line.startswith("(") and "Scan " in line:
            if block:
                out.append("\n".join(block))
            block = [line]
        elif block:
            if line.startswith("(") or not line.strip():
                out.append("\n".join(block))
                block = []
            else:
                block.append(line)
    if block:
        out.append("\n".join(block))
    return out


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    return any(
        "PushedFilters" in s and fragment in s.split("PushedFilters", 1)[1]
        for s in scans(df)
    )


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets each scan actually reads (column pruning check)."""
    import re

    out = []
    for s in scans(df):
        m = re.search(r"ReadSchema: struct<([^>]*)>", s)
        if m:
            out.append({c.split(":")[0].strip() for c in m.group(1).split(",") if c})
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_text(df, "simple")


def _tree_indent(line: str) -> int:
    """Column where the node text starts in a simple-explain tree line
    (the gutter is spaces plus the :- / +- / | connectors)."""
    for i, ch in enumerate(line):
        if ch not in " :+-|":
            return i
    return len(line)


def single_partition_is_aggregate_sized(df: DataFrame) -> bool:
    """True iff every ``Exchange SinglePartition`` in the plan feeds
    from already-aggregated rows — its subtree reaches an Aggregate
    node before any scan — so the single task only ever sees
    group-count-sized input (e.g. the one-row-per-shuffle-partition
    offset table of the house range-partitioned rank).  A
    SinglePartition exchange whose subtree scans a table directly is
    the corpus-sized one-task global sort/window anti-pattern that
    cannot survive a 100x scale-up."""
    lines = plan_text(df, "simple").splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        base = _tree_indent(line)
        sub: list[str] = []
        for ln in lines[i + 1:]:
            if not ln.strip() or _tree_indent(ln) <= base:
                break
            sub.append(ln)
        # EVERY scan in the subtree must pass through an Aggregate on
        # ITS OWN ancestor path — first-Aggregate-wins over the flat
        # line list would let a multi-child operator (one aggregated
        # branch, one scanned branch) feed corpus rows through.  A
        # node's parent is the nearest line above with smaller indent.
        for j, ln in enumerate(sub):
            if "Scan" not in ln:  # FileScan / Scan parquet / ExistingRDD
                continue
            depth = _tree_indent(ln)
            ok = False
            for k in range(j - 1, -1, -1):
                dk = _tree_indent(sub[k])
                if dk < depth:
                    if "Aggregate" in sub[k]:
                        ok = True
                        break
                    depth = dk
            if not ok:
                return False
    return True


def has_whole_stage_codegen(df: DataFrame) -> bool:
    # with AQE on, codegen spans appear only in the FINAL adaptive plan —
    # execute this exact Dataset first, then read its finalized plan.
    # Codegen'd operators carry a "* " marker in explain output.
    df.collect()
    txt = plan_text(df, "formatted")
    return "WholeStageCodegen" in txt or "+- * " in txt or ":- * " in txt


def shuffle_count(df: DataFrame) -> int:
    return plan_text(df, "simple").count("Exchange hashpartitioning") + plan_text(
        df, "simple"
    ).count("Exchange rangepartitioning")
