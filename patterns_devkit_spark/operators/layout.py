"""Data-layout operators: Z-order (Morton) clustering keys.

Multi-column clustering for scan pruning: a table sorted on (a, b)
prunes well on `a` but not on `b` alone; sorting by the Morton
interleave of (a, b) gives BOTH columns locality within each file /
row group, so Parquet min-max statistics prune filters on either
column — the OPTIMIZE ZORDER of lakehouse table formats, built here
from plain codegen'd bit arithmetic (no UDF).

Scale shape: the z-value is a map-side expression; clustering a write
is sortWithinPartitions(zvalue) (no extra shuffle beyond the write's
own layout), and a full-table re-cluster is repartitionByRange(zvalue)
+ sortWithinPartitions — one range shuffle, the same cost as any
global sort. Reference parity: the reference's hosted store exposes no
layout controls (node.py documents logical semantics only); this is a
SURVEY.md §2.10-class scale extension.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zvalue(cols: list[str | Column], bits: int | None = None) -> Column:
    """Morton/Z-order interleave of k NON-NEGATIVE integer columns into
    one BIGINT sort key: bit i of column j lands at position i*k + j.

    bits = bits kept per column (low bits; default 62//k so the result
    fits a signed 64-bit int). Values are truncated to `bits` — for
    clustering that is exactly right: high-order locality is preserved,
    and equal truncations sort adjacently. Negative inputs would need
    an offset first (caller's contract, asserted cheaply via
    greatest(col, 0) being the identity on valid data)."""
    k = len(cols)
    if k < 1:
        raise ValueError("zvalue needs at least one column")
    if bits is None:
        bits = 62 // k
    if bits * k > 62:
        raise ValueError(f"bits*k = {bits * k} exceeds the 62-bit budget of a signed BIGINT")
    cs = [(F.col(c) if isinstance(c, str) else c).cast("long") for c in cols]
    out: Column | None = None
    for i in range(bits):
        for j, c in enumerate(cs):
            term = F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j)
            out = term if out is None else out.bitwiseOR(term)
    return out


def write_bucketed(
    df,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a BUCKETED managed table: rows are hash-split on
    ``bucket_cols`` into ``num_buckets`` files per partition, and the
    bucketing spec is recorded in the session catalog.

    Why it matters at 100 TB: two tables bucketed the same way on their
    join key are ALREADY co-partitioned on disk — Catalyst drops the
    Exchange on both sides of the join (and the Sort, when sortBy
    matches), so a repeated big-big join becomes map-side work. That
    turns the most expensive recurring shuffle of a warehouse into a
    one-time layout cost, the same contract as Hive/Iceberg bucketing.
    Asserted in tests/test_plan_quality.py: a bucketed-bucketed join
    plans with zero Exchange operators.

    (The engine's versioned tables use hive-style partition_by +
    cluster_by for pruning; bucketing complements them for JOIN
    co-location and lives in the Spark session catalog because the
    bucket spec must be visible to the planner.)"""
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)
