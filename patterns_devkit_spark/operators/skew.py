"""Skew-handling operators: salted joins and two-phase aggregation.

AQE's skew-join splitting (on by default in session.py) covers sort-
merge joins; these cover what it can't:
- salted_broadcastable_join: replicate the SMALL side per salt so a
  hot key's rows spread over `salt` reducers instead of one.
- salted_two_phase_agg: partial agg on (key, salt) then final on key —
  for aggregations where one key dominates a shuffle partition.

Salts are DETERMINISTIC (xxhash64 of tie-break columns, not rand()),
so Spark task retries recompute identical rows — retry-safe lineage.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(cols: Sequence[str], n: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n)).cast("int")


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
    salt_by: list[str] | None = None,
) -> DataFrame:
    """Join a skewed fact to a small dim: the fact gets a deterministic
    per-row salt, the dim is exploded x`salt`, and the join key becomes
    (key, salt) — a hot key now lands on `salt` partitions. Output
    equals the plain join (salt columns dropped)."""
    sb = salt_by or skewed.columns
    left = skewed.withColumn("__salt", _salt_col(sb, salt))
    right = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))).withColumn(
        "__salt", F.col("__salt").cast("int")
    )
    out = left.join(right, on + ["__salt"], how)
    return out.drop("__salt")


def salted_two_phase_agg(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: dict[str, str],
    salt: int = 16,
    salt_by: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: phase 1 aggregates on
    (key, salt) — the hot key's load spreads over `salt` reducers —
    phase 2 combines partials on key. Supports decomposable aggs:
    count, sum, min, max.

    agg_exprs: {output_col: "count" | "sum:col" | "min:col" | "max:col"}
    """
    sb = salt_by or df.columns
    salted = df.withColumn("__salt", _salt_col(sb, salt))
    phase1, phase2 = [], []
    for out, spec in agg_exprs.items():
        if spec == "count":
            phase1.append(F.count(F.lit(1)).alias(f"__p_{out}"))
            phase2.append(F.sum(f"__p_{out}").alias(out))
        else:
            op, col = spec.split(":", 1)
            fn = {"sum": F.sum, "min": F.min, "max": F.max}[op]
            phase1.append(fn(col).alias(f"__p_{out}"))
            phase2.append({"sum": F.sum, "min": F.min, "max": F.max}[op](f"__p_{out}").alias(out))
    partial = salted.groupBy(*key_cols, "__salt").agg(*phase1)
    return partial.groupBy(*key_cols).agg(*phase2)


def skew_profile(df: DataFrame, key_cols: Sequence[str], top_n: int = 10) -> DataFrame:
    """Diagnose join/agg key skew BEFORE paying for a bad shuffle: the
    top-N hottest keys with their count, rank, and hot_factor_permille
    = cnt / (total/n_keys) × 1000 (1000 = perfectly uniform; 50000 = a
    key 50× hotter than uniform — salt it or let AQE split it).

    One hash-agg shuffle over the keys + a broadcast of the 3-number
    global stats; output is top_n rows regardless of input size. The
    top-N is taken with orderBy().limit() — TakeOrderedAndProject, a
    distributed partial top-k — and ranked only AFTER the limit, so no
    global window ever sees the full key set (a billion-key profile
    would otherwise sort every key in one partition)."""
    from pyspark.sql.window import Window

    # eager checkpoint: the key-count aggregate feeds BOTH the 3-number
    # stats branch and the top-N branch; without it each branch re-runs
    # the full input scan+agg (r6 opt — the q215 defect class). The
    # frame is key-grain (already aggregated), so materializing it is
    # bounded by key cardinality, not input rows.
    cnt = df.groupBy(*key_cols).agg(F.count(F.lit(1)).cast("long").alias("cnt")).localCheckpoint(
        eager=True
    )
    stats = cnt.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("total"),
        F.max("cnt").cast("long").alias("max_cnt"),
    )
    order_cols = [F.col("cnt").desc()] + [F.col(c).asc() for c in key_cols]
    top = cnt.orderBy(*order_cols).limit(top_n)
    ranked = top.withColumn(
        "rk", F.row_number().over(Window.orderBy(*order_cols)).cast("long")
    )
    return ranked.crossJoin(F.broadcast(stats)).withColumn(
        "hot_factor_permille", F.expr("(cnt * 1000 * n_keys) DIV total")
    )
