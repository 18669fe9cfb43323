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
