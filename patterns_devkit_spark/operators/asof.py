"""As-of join: for each left row, the most recent right row with
right_ts <= left_ts (optionally per key).

Spark has no native as-of join; this is the union-tag-window
formulation (SURVEY.md §2 custom operators, pyspark_guide 'As-of /
range join'): union both sides tagged, sort within key by
(ts, side-tag), and carry the last-seen right row forward with
last_value(ignorenulls). ONE shuffle on the key — same cost as a
regular join — versus the range-join nested loop; this is the shape
that survives 100 TB. Ties (right_ts == left_ts) resolve to the right
row, i.e. '<=' semantics; among equal right_ts the largest tiebreak
column wins (deterministic).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tiebreak: str | None = None,
    prefix: str = "asof_",
    tolerance: str | int | float | None = None,
) -> DataFrame:
    """Returns left columns + prefixed right_cols of the as-of match
    (nulls when no right row precedes).

    tolerance bounds the lookback (pandas merge_asof semantics): a
    match older than `tolerance` before left_ts yields nulls. Pass an
    interval string ("5 minutes") for timestamp ts columns or a number
    for numeric ts columns; evaluated as one more codegen'd predicate
    on the carried match — no plan-shape change."""
    lcols = left.columns
    rkeep = [c for c in right_cols]
    tb = tiebreak if tiebreak is not None else (rkeep[0] if rkeep else right_ts)

    l_tagged = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        # typed null in the tiebreak's NATIVE type: casting to double
        # would null out string tiebreaks and make equal-ts ordering
        # nondeterministic (the pandas variant tie-breaks by native sort)
        F.lit(None).cast(right.schema[tb].dataType).alias("__tb"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rkeep],
    )
    r_tagged = right.select(
        # key columns come from the right side under the left's names;
        # all other left columns are typed nulls
        *[F.col(c).alias(c) if c in on else F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(tb).alias("__tb"),
        *[F.col(c).alias(f"__r_{c}") for c in rkeep],
    )
    u = l_tagged.unionByName(r_tagged)
    # right rows sort before left rows at equal ts (__side 0 < 1) => '<='
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"{prefix}{c}") for c in rkeep]
    if tolerance is None:
        return (
            u.select(*lcols, F.col("__side"), *carried)
            .filter(F.col("__side") == 1)
            .drop("__side")
        )
    matched_ts = F.last(
        F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True
    ).over(w).alias("__asof_ts")
    bound = F.expr(f"INTERVAL {tolerance}") if isinstance(tolerance, str) else F.lit(tolerance)
    sel = (
        u.select(*lcols, F.col("__side"), F.col("__ts"), *carried, matched_ts)
        .filter(F.col("__side") == 1)
    )
    ok = F.col("__asof_ts").isNotNull() & (F.col("__ts") <= F.col("__asof_ts") + bound)
    return sel.select(
        *lcols,
        *[F.when(ok, F.col(f"{prefix}{c}")).otherwise(F.lit(None)).alias(f"{prefix}{c}") for c in rkeep],
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    prefix: str = "asof_",
    tolerance=None,
) -> DataFrame:
    """Alternative implementation: cogrouped pandas `merge_asof` per
    key (pyspark_guide's 'applyInPandas with pd.merge_asof per group').
    Same '<=' semantics as asof_join; among equal right_ts the
    LAST-sorted row wins (sort by (ts, right_cols) mirrors the
    union-window tie-break). Useful when per-group data fits in memory
    and the pandas path is preferred; the union-window form is the
    default at scale."""
    import pandas as pd
    from pyspark.sql import types as T

    out_fields = [f for f in left.schema.fields] + [
        T.StructField(f"{prefix}{c}", right.schema[c].dataType, True) for c in right_cols
    ]
    out_schema = T.StructType(out_fields)
    lcols = left.columns

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        l_sorted = l_pdf.sort_values(left_ts, kind="mergesort")
        if r_pdf.empty:
            out = l_sorted.copy()
            for c in right_cols:
                out[f"{prefix}{c}"] = None
            return out[list(l_pdf.columns) + [f"{prefix}{c}" for c in right_cols]]
        r_sorted = r_pdf.sort_values([right_ts, *right_cols], kind="mergesort")[[right_ts, *right_cols]]
        r_renamed = r_sorted.rename(columns={c: f"{prefix}{c}" for c in right_cols})
        merged = pd.merge_asof(
            l_sorted, r_renamed, left_on=left_ts, right_on=right_ts,
            direction="backward", allow_exact_matches=True, suffixes=("", "__r"),
            tolerance=tolerance,
        )
        return merged[list(l_pdf.columns) + [f"{prefix}{c}" for c in right_cols]]

    return (
        left.groupBy(*on)
        .cogroup(right.groupBy(*on))
        .applyInPandas(merge, out_schema)
    )
