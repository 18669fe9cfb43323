"""Mergeable sketch operators: count-min and HyperLogLog-style
distinct, built on the repo's cross-engine deterministic hash family
(det_hash.md5_long) so DuckDB replays every register bit-for-bit.

Why these exist at 100 TB: exact heavy-hitter and distinct counts
need a shuffle keyed on the full domain (tokens, users); a sketch is
a FIXED-SIZE, MERGEABLE partial aggregate — each executor folds its
partition into a few KB, and the combine is elementwise (sum for
count-min, max for HLL registers), i.e. a map-side-combine-friendly
hash aggregate whose reduce input is O(partitions × sketch), not
O(rows). The reference exposes approximate aggregates through its
warehouse ("approx" hints in SURVEY.md §2.9/q54); these are the
engine-side mergeable forms.

Determinism rules (repo-wide, queries.py docstring): hash = first 15
hex digits of md5 as a positive bigint; register ranks use
length(bin(x)) — both engines produce the minimal binary string — so
no floating log2 anywhere; estimates are exact integer arithmetic
(decimal-38 / HUGEINT with explicit floor via (n - n % d) / d).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .det_hash import md5_long

# -- count-min sketch --------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_bucket(col: Column | str, depth_idx: int, width: int = CMS_WIDTH) -> Column:
    """Row j of the hash family: md5('<j>|' || key) % width."""
    c = F.col(col) if isinstance(col, str) else col
    return md5_long(F.concat(F.lit(f"{depth_idx}|"), c)) % F.lit(width)


def cms_build(
    weighted: DataFrame,
    key_col: str = "key",
    weight_col: str = "w",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(j, b, cnt): the sketch matrix from per-key weights. Input is
    the (key, weight) aggregate — hash the DISTINCT domain once, not
    every raw row (the raw-row form is the same sum by linearity).
    Output is <= depth*width rows regardless of corpus size."""
    hashed = weighted.select(
        F.col(weight_col).alias("__w"),
        *[cms_bucket(key_col, j, width).alias(f"__b{j}") for j in range(depth)],
    )
    stacked = hashed.select(
        "__w",
        F.expr(
            "stack(%d, %s) as (j, b)"
            % (depth, ", ".join(f"{j}, __b{j}" for j in range(depth)))
        ),
    )
    return stacked.groupBy("j", "b").agg(F.sum("__w").alias("cnt"))


def cms_estimate(
    weighted: DataFrame,
    sketch: DataFrame,
    key_col: str = "key",
    weight_col: str = "w",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(key, weight, est): point-query every key against the sketch;
    est = min over rows j of sketch[j][h_j(key)] — an OVERestimate,
    never under (the count-min law; pytest-gated). The sketch is tiny,
    so the lookup is a broadcast join per hashed key."""
    hashed = weighted.select(
        F.col(key_col).alias("key"),
        F.col(weight_col).alias("w"),
        *[cms_bucket(key_col, j, width).alias(f"__b{j}") for j in range(depth)],
    )
    stacked = hashed.select(
        "key",
        "w",
        F.expr(
            "stack(%d, %s) as (j, b)"
            % (depth, ", ".join(f"{j}, __b{j}" for j in range(depth)))
        ),
    )
    return (
        stacked.join(F.broadcast(sketch), ["j", "b"])
        .groupBy("key", "w")
        .agg(F.min("cnt").alias("est"))
    )


# -- HyperLogLog-style mergeable distinct ------------------------------

HLL_M = 64  # registers (b=6 index bits)
HLL_RHO_MAX = 55  # md5_long gives 60 bits; 54 remain after the index
HLL_SCALE = 56  # 2^(SCALE - rho) is integral for every rho <= RHO_MAX
# alpha_64 = 0.7213/(1 + 1.079/64) rounded to a fixed rational — the
# SPEC'd constant both engines share (bias constant from the HLL paper)
HLL_ALPHA_NUM = 709
HLL_ALPHA_DEN = 1000


def hll_register(col: Column | str, m: int = HLL_M) -> tuple[Column, Column]:
    """(reg, rho) for a key: register index = h % m; rank = leading-
    zero count of the remaining bits + 1, computed integer-exactly as
    (RHO_MAX) - length(bin(h DIV m)) + 1 via the minimal binary string
    (no floating log2). h DIV m == 0 => all remaining bits zero =>
    rho = RHO_MAX."""
    c = F.col(col) if isinstance(col, str) else col
    h = md5_long(c.cast("string"))  # hash the decimal string form (oracle: CAST(x AS VARCHAR))
    # m is a power of two: h DIV m as an exact bit shift (h/m would be
    # DOUBLE division — lossy past 2^53; h has 60 bits)
    shift = m.bit_length() - 1
    if m != 1 << shift:
        raise ValueError(f"HLL register count must be a power of two, got {m}")
    w = F.shiftright(h, shift)
    rho_max = 60 - shift + 1  # = HLL_RHO_MAX for m=64
    rho = F.when(w == 0, F.lit(rho_max)).otherwise(
        F.lit(rho_max) - F.length(F.bin(w))
    )
    return (h % F.lit(m)).alias("reg"), rho.alias("rho")


def hll_registers(df: DataFrame, key_col: str, group_cols: list[str], m: int = HLL_M) -> DataFrame:
    """(group..., reg, rho): per-group register maxima — the mergeable
    sketch state. Merging groups = max over the same registers (max is
    associative/commutative/idempotent, so re-aggregation at any
    coarser grain equals the direct computation — the property that
    makes the sketch shuffle-cheap at 100 TB)."""
    reg, rho = hll_register(key_col, m)
    return df.select(*group_cols, reg, rho).groupBy(*group_cols, "reg").agg(
        F.max("rho").alias("rho")
    )


def hll_estimate(registers: DataFrame, group_cols: list[str], m: int = HLL_M) -> DataFrame:
    """(group..., n_est): the raw HLL estimate from per-group register
    maxima, exact-integer end to end:

        S = sum over m registers of 2^(SCALE - rho)   (empty reg: rho=0)
        est = floor(alpha * m^2 * 2^SCALE / S)

    2^x is exact in IEEE doubles (mantissa 1), so pow-then-cast is
    exact; the division floors via (n - n % d) / d on decimal-38
    (HUGEINT on the DuckDB side) — no decimal rounding anywhere."""
    present = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), F.lit(HLL_SCALE) - F.col("rho")).cast("decimal(38,0)")).alias("s_present"),
        F.count(F.lit(1)).alias("n_regs"),
    )
    s = present.withColumn(
        "s",
        F.col("s_present")
        + (F.lit(m) - F.col("n_regs")).cast("decimal(38,0)")
        * F.pow(F.lit(2.0), F.lit(HLL_SCALE)).cast("decimal(38,0)"),
    )
    num = (
        F.lit(HLL_ALPHA_NUM * m * m).cast("decimal(38,0)")
        * F.pow(F.lit(2.0), F.lit(HLL_SCALE)).cast("decimal(38,0)")
    )
    den = F.lit(HLL_ALPHA_DEN).cast("decimal(38,0)") * F.col("s")
    return s.select(
        *group_cols,
        ((num - num % den) / den).cast("long").alias("n_est"),
        F.col("n_regs").cast("long").alias("n_registers_used"),
    )
