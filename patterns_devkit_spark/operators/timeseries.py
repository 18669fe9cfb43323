"""Time-series operators: SCD Type-2 history compression, forward
fill, and grid resampling with linear interpolation.

Reference parity: patterns-devkit pipelines build slowly-changing
history tables and gap-filled series from append-only event streams
(reference patterns/node.py documents the append/upsert stream model
these derive from); these operators give that workload first-class,
scale-safe Spark implementations.

Determinism rules (cross-engine, see queries.py docstring): every
ordering includes a unique tiebreak column; interpolated values are
emitted as exact integer (numerator, denominator) pairs rather than
IEEE quotients so the DuckDB oracle hash-matches bit-for-bit.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_compress(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse an event log into SCD Type-2 validity segments: one row
    per run of consecutive equal ``attr_col`` values per key, with
    ``valid_from`` / ``valid_to`` (null = current) / ``version`` /
    ``is_current``.

    Scale shape: two window passes over the same (key, ts) ordering —
    Catalyst reuses one hash-partitioning by key, so the whole compress
    is a single shuffle; no self-join against the previous snapshot.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changed = (
        F.lag(attr_col).over(w).isNull()
        | (F.lag(attr_col).over(w) != F.col(attr_col))
    )
    starts = df.withColumn("__chg", changed.cast("int")).filter(F.col("__chg") == 1)
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return (
        starts.select(
            key_col,
            attr_col,
            F.col(ts_col).alias("valid_from"),
            F.lead(ts_col).over(w2).alias("valid_to"),
            F.row_number().over(w2).cast("long").alias("version"),
        )
        .withColumn("is_current", F.col("valid_to").isNull().cast("long"))
    )


def forward_fill(
    df: DataFrame,
    value_col: Column,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    out_col: str = "ffill",
) -> DataFrame:
    """Last-observation-carried-forward per key: ``out_col`` is the most
    recent non-null ``value_col`` at-or-before each row. One shuffle
    (hash by key), running state handled by the window — no as-of
    self-join."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.last(value_col, ignorenulls=True).over(w)).withColumn(
        "n_obs_so_far", F.count(value_col).over(w).cast("long")
    )


def resample_linear(
    points: DataFrame,
    key_col: str,
    ms_col: str,
    val_col: str,
    grid_ms: int,
) -> DataFrame:
    """Resample an irregular integer-valued series onto a fixed grid
    with linear interpolation between consecutive observations.

    ``points`` must carry epoch-millis ``ms_col`` (bigint) and an
    integer ``val_col``; duplicate timestamps per key are collapsed to
    their max. For every grid instant g in [t0, t1) between
    consecutive points the interpolated value is emitted as the exact
    rational ``(interp_num, interp_den)`` with
    ``interp_num = v0*(t1-t0) + (v1-v0)*(g-t0)`` and
    ``interp_den = t1-t0`` — integer arithmetic only, so the result is
    engine-independent (no IEEE division order to disagree on).

    Scale shape: one shuffle (window by key) + a generator whose output
    is proportional to the grid coverage, not to pairwise combinations.
    The ``sequence`` bounds are guarded: Spark's ``sequence(a, b)``
    yields a DESCENDING array when b < a (never empty), so degenerate
    segments must be filtered before the explode.
    """
    dedup = points.groupBy(key_col, ms_col).agg(F.max(val_col).alias("__v0"))
    w = Window.partitionBy(key_col).orderBy(ms_col)
    seg = (
        dedup.withColumn("__ms1", F.lead(ms_col).over(w))
        .withColumn("__v1", F.lead("__v0").over(w))
        .filter(F.col("__ms1").isNotNull() & (F.col("__ms1") > F.col(ms_col)))
    )
    g_lo = F.expr(f"({ms_col} + {grid_ms - 1}) DIV {grid_ms}")
    g_hi = F.expr(f"(__ms1 + {grid_ms - 1}) DIV {grid_ms} - 1")
    seg = seg.withColumn("__glo", g_lo).withColumn("__ghi", g_hi).filter(
        F.col("__glo") <= F.col("__ghi")
    )
    grid = seg.select(
        key_col,
        F.col(ms_col).alias("__ms0"),
        "__v0",
        "__ms1",
        "__v1",
        F.explode(F.sequence(F.col("__glo"), F.col("__ghi"))).alias("__g"),
    )
    gms = F.col("__g") * F.lit(grid_ms)
    return grid.select(
        key_col,
        F.timestamp_millis(gms).alias("grid_ts"),
        (
            F.col("__v0") * (F.col("__ms1") - F.col("__ms0"))
            + (F.col("__v1") - F.col("__v0")) * (gms - F.col("__ms0"))
        ).cast("long").alias("interp_num"),
        (F.col("__ms1") - F.col("__ms0")).cast("long").alias("interp_den"),
    )
