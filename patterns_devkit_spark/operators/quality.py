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


def _viol_expr(check: Check):
    """The violation-count aggregate expression for a non-ref check."""
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
    return viol


def _ref_audit(child: DataFrame, parent: DataFrame, check: Check) -> DataFrame:
    # ONE pass over the child: a left join against the distinct parent
    # keys marks orphans (non-null FK with no parent hit) and a single
    # conditional aggregation emits total + violation counts — the old
    # shape ran a separate total-count scan plus an anti-join scan per
    # ref rule (r6 opt; parent side's broadcast decision left to the
    # planner, which matters when the parent is itself a fact table)
    p = (
        parent.select(F.col(check.ref_col).alias("__pk"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    j = child.select(F.col(check.cols[0]).alias("__ck")).join(
        p, F.col("__ck") == F.col("__pk"), "left"
    )
    orphan = F.col("__ck").isNotNull() & F.col("__hit").isNull()
    return j.agg(
        F.lit(check.name).alias("check_name"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.coalesce(F.sum(orphan.cast("long")), F.lit(0)).cast("long").alias("n_violations"),
    )


def constraint_audit(tables: dict[str, DataFrame], checks: list[Check]) -> DataFrame:
    """Evaluate every check and return one row per constraint with
    ``passed = (n_violations == 0)`` as 0/1.

    All non-ref checks against the SAME table fold into ONE
    aggregation pass (their violation counts become columns of a
    single agg, unpivoted back to rows with ``stack``), so auditing a
    100 TB table costs one scan regardless of how many value checks it
    carries — the old per-check aggregates relied on Catalyst to
    collapse them and it never did (q120 planned 8 scans for 6
    checks; r6 opt). Row order follows table grouping, not the input
    check list (callers compare content, not order)."""
    parts = []
    by_table: dict[str, list[Check]] = {}
    for ck in checks:
        if ck.kind == "ref":
            parts.append(_ref_audit(tables[ck.table], tables[ck.ref_table], ck))
        else:
            by_table.setdefault(ck.table, []).append(ck)
    for tbl, cks in by_table.items():
        df = tables[tbl]
        aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
        for i, ck in enumerate(cks):
            aggs.append(F.coalesce(_viol_expr(ck), F.lit(0)).cast("long").alias(f"__v{i}"))
        one = df.agg(*aggs)
        stack_args = ", ".join(f"'{ck.name}', __v{i}" for i, ck in enumerate(cks))
        parts.append(
            one.select(
                F.expr(
                    f"stack({len(cks)}, {stack_args}) AS (check_name, n_violations)"
                ),
                F.col("__n").alias("n_rows"),
            ).select("check_name", "n_rows", "n_violations")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", (F.col("n_violations") == 0).cast("long"))
