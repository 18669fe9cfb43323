"""Data-quality constraint auditing (Deequ-style check suites).

A constraint suite runs as a handful of aggregate-only scans (one per
table referenced, Catalyst collapses per-table checks into one pass
where possible) plus an anti-join per referential-integrity rule, and
yields ONE small row per constraint: (constraint, n_rows,
n_violations, passed). Nothing here is per-row output, so auditing a
100 TB table costs a scan, not a shuffle of the data.

Reference parity: patterns-devkit surfaces table schema/row-count
invariants through the SDK (reference patterns/node.py Table schema /
record_count docs); this operator generalizes that to declarative
value-level checks a curation pipeline gates on.
"""
from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    """One declarative constraint over a named dataframe."""

    name: str
    table: str
    kind: str  # unique | not_null | in_set | in_range | ref
    cols: list[str] = field(default_factory=list)
    values: list = field(default_factory=list)
    lo: float | None = None
    hi: float | None = None
    ref_table: str | None = None
    ref_col: str | None = None


def _agg_audit(df: DataFrame, check: Check) -> DataFrame:
    n_rows = F.count(F.lit(1)).cast("long")
    if check.kind == "unique":
        # violations = surplus rows beyond one per distinct key
        viol = (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in check.cols])).cast("long")
    elif check.kind == "not_null":
        viol = F.sum(F.col(check.cols[0]).isNull().cast("long")).cast("long")
    elif check.kind == "in_set":
        viol = F.sum((~F.col(check.cols[0]).isin(check.values)).cast("long")).cast("long")
    elif check.kind == "in_range":
        c = F.col(check.cols[0])
        viol = F.sum(((c < F.lit(check.lo)) | (c > F.lit(check.hi))).cast("long")).cast("long")
    else:
        raise ValueError(f"unknown check kind {check.kind}")
    return df.agg(
        F.lit(check.name).alias("check_name"),
        n_rows.alias("n_rows"),
        F.coalesce(viol, F.lit(0)).alias("n_violations"),
    )


def _ref_audit(child: DataFrame, parent: DataFrame, check: Check) -> DataFrame:
    orphans = child.join(
        parent.select(F.col(check.ref_col).alias("__pk")).distinct(),
        child[check.cols[0]] == F.col("__pk"),
        "left_anti",
    )
    total = child.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    bad = orphans.agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
    return total.crossJoin(bad).select(
        F.lit(check.name).alias("check_name"), "n_rows", "n_violations"
    )


def constraint_audit(tables: dict[str, DataFrame], checks: list[Check]) -> DataFrame:
    """Evaluate every check and return one row per constraint with
    ``passed = (n_violations == 0)`` as 0/1."""
    parts = []
    for ck in checks:
        df = tables[ck.table]
        if ck.kind == "ref":
            parts.append(_ref_audit(df, tables[ck.ref_table], ck))
        else:
            parts.append(_agg_audit(df, ck))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", (F.col("n_violations") == 0).cast("long"))
