"""Physical-plan inspection: assert the plans we WANT, not just plans
that pass — predicate pushdown reached the parquet scan, column
pruning shrank ReadSchema, small dims broadcast, no accidental
cartesian products (SURVEY.md §4; the scale contract of every
operator)."""
from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists each parquet scan actually reads (pruning check)."""
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_str(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def has_cartesian(df: DataFrame) -> bool:
    return "CartesianProduct" in explain_str(df)


def wholestage_codegen_ids(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider = more fused)."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df))))


def assert_pushed(df: DataFrame, *fragments: str) -> None:
    plan = explain_str(df)
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    joined = ";".join(m)
    for frag in fragments:
        assert frag in joined, f"expected pushed filter {frag!r}, got {joined!r}"


def executed_exchanges(df: DataFrame) -> int:
    """DISTINCT Exchange nodes in the plan DAG: the simple-mode tree
    reprints every cached relation's build plan inline under each of
    its InMemoryRelation references (nested caches expand
    recursively), but every reprint of one physical node carries the
    SAME [plan_id=N] while a genuinely re-evaluated subtree plans
    fresh nodes with fresh ids — so the unique-plan_id count is the
    number of exchanges that can execute (cached builds count once;
    they fill the cache at most once). The r6 depth-skip heuristic
    under-/over-counted nested cache expansions, whose block
    indentation restarts shallower than the InMemoryRelation line
    (r7 fix)."""
    plan = explain_str(df, "simple")
    return len(set(re.findall(r"Exchange (?:hash|range|Single)[^\[]*\[plan_id=(\d+)\]", plan)))


def single_partition_windows(df: DataFrame) -> int:
    """Number of Window nodes fed by an Exchange SinglePartition — the
    unpartitioned-global-window anti-pattern (one task sorts ALL
    rows). In the simple physical-plan tree the pattern prints as
    Window -> [Sort ->] Exchange SinglePartition, so the exchange sits
    within two lines below the window node."""
    lines = explain_str(df, "simple").splitlines()
    n = 0
    for i, line in enumerate(lines):
        if re.search(r"\bWindow\b", line):
            below = "\n".join(lines[i + 1 : i + 3])
            if "Exchange SinglePartition" in below:
                n += 1
    return n


def assert_pruned(df: DataFrame, table_cols: dict[str, int]) -> None:
    """Assert each scan reads at most the given column counts."""
    schemas = read_schemas(df)
    assert schemas, "no parquet scans found"
    for cols in schemas:
        limit = max(table_cols.values())
        assert len(cols) <= limit, f"scan reads {cols} (> {limit} columns; pruning failed)"
