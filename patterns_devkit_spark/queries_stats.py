"""Statistical-testing battery (q247+): the nonparametric /
inference operators the earlier batteries did not cover — rank tests
(Mann-Whitney U), distribution comparison (two-sample KS), rank
correlation (Spearman), sequential change detection (CUSUM), and
survival analysis (risk-set hazard).

Reference scope: the reference exposes arbitrary SQL over tables
(reference node.py:83-131 read_sql) and its users run exactly this
class of analysis downstream; these are the §2.9-tail extension
operators expressed Spark-first.

Discipline (same as the rest of the repo):
  - every global rank / prefix sum runs through the two-pass
    range-partitioned operators (operators/windows.py) — never an
    unpartitioned `Window.orderBy` (Exchange SinglePartition);
  - driver-hashed values are integer-exact (cents bigints, doubled
    ranks so tie mid-ranks stay integral, DECIMAL(38)/HUGEINT cross
    terms where products exceed int64 — the q221/q245 discipline);
  - doubles appear only in ONE final expression per query, written
    with identical association on both engines, quantized once.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from .queries import query, t

# =====================================================================
# q247 — Mann-Whitney U rank test (urgent vs low-priority order value)
# =====================================================================


@query(
    "q247_mann_whitney",
    """
    WITH y AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_a,
             CAST(round(o_totalprice * 100) AS BIGINT) AS v
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ),
    vg AS (
      SELECT v,
             CAST(sum(is_a) AS BIGINT) AS ca,
             CAST(sum(1 - is_a) AS BIGINT) AS cb
      FROM y GROUP BY v
    ),
    cum AS (
      SELECT v, ca, cb, ca + cb AS c,
             CAST(sum(ca + cb) OVER (ORDER BY v) AS BIGINT) AS cc
      FROM vg
    ),
    agg AS (
      SELECT CAST(sum(ca) AS BIGINT) AS n_a,
             CAST(sum(cb) AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_tied_values,
             sum(CAST(ca AS HUGEINT) * (2 * (cc - c) + c + 1)) AS two_r_a,
             sum(CAST(c AS HUGEINT) * c * c - c) AS tie_term
      FROM cum
    )
    SELECT n_a, n_b, n_tied_values,
           CAST(two_r_a - CAST(n_a AS HUGEINT) * (n_a + 1) AS DOUBLE) / 2.0 AS u_a,
           round(
             CAST(two_r_a - CAST(n_a AS HUGEINT) * (n_a + 1)
                  - CAST(n_a AS HUGEINT) * n_b AS DOUBLE)
             / (2.0 * sqrt(
                 (CAST(n_a AS DOUBLE) * n_b / 12.0)
                 * ((n_a + n_b + 1.0)
                    - CAST(tie_term AS DOUBLE) / (n_a + n_b) / (n_a + n_b - 1.0))
               )),
             6) AS z_stat
    FROM agg
    """,
)
def q247(spark, sf_dir):
    """Mann-Whitney U: do urgent orders carry different value than
    low-priority ones, without assuming normality? (The rank-based
    companion to q218's t-test / q245's ANOVA.)

    Integer-exact core: at VALUE grain (cents), the tie-averaged rank
    doubled is 2*C + c + 1 (C = strictly-smaller count, c = tie
    count) — an integer, so the rank sum, U, and the tie-correction
    term Σ(c³−c) are all exact HUGEINT/DECIMAL(38) quantities that
    hash identically across engines. Doubles appear only in the final
    z expression (shared association, correctly-rounded IEEE ops),
    rounded once.

    100 TB shape: one hash-agg collapses rows to distinct-value
    grain; the global cumulative count is the two-pass
    range-partitioned prefix sum (operators/windows.global_prefix_sum
    — bucket-local window + broadcast per-bucket offsets), never a
    single-partition sort; the test statistic is a one-row reduce.
    DECIMAL(38) rank sums because 2R_A ~ n² passes int64 around
    n ≈ 3e9 rows (the q245 discipline)."""
    from .operators.windows import global_prefix_sum

    y = t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_a"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    vg = y.groupBy("v").agg(
        F.sum("is_a").cast("long").alias("ca"),
        F.sum(1 - F.col("is_a")).cast("long").alias("cb"),
    ).withColumn("c", F.col("ca") + F.col("cb"))
    cum = global_prefix_sum(vg, "v", True, [F.col("v")], "c", out_col="cc")
    agg = cum.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).cast("long").alias("n_tied_values"),
        F.sum(
            F.expr("CAST(ca AS DECIMAL(38,0)) * (2 * (cc - c) + c + 1)")
        ).alias("two_r_a"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c * c - c")).alias("tie_term"),
    )
    return agg.select(
        "n_a",
        "n_b",
        "n_tied_values",
        F.expr(
            "CAST(two_r_a - CAST(n_a AS DECIMAL(38,0)) * (n_a + 1) AS DOUBLE) / 2.0"
        ).alias("u_a"),
        F.expr(
            "round("
            " CAST(two_r_a - CAST(n_a AS DECIMAL(38,0)) * (n_a + 1)"
            "      - CAST(n_a AS DECIMAL(38,0)) * n_b AS DOUBLE)"
            " / (2.0 * sqrt("
            "     (CAST(n_a AS DOUBLE) * n_b / 12.0)"
            "     * ((n_a + n_b + 1.0)"
            "        - CAST(tie_term AS DOUBLE) / (n_a + n_b) / (n_a + n_b - 1.0))"
            "   )),"
            " 6)"
        ).alias("z_stat"),
    )


# =====================================================================
# q248 — two-sample Kolmogorov-Smirnov distance (returned vs kept)
# =====================================================================


@query(
    "q248_ks_two_sample",
    """
    WITH y AS (
      SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_a,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS v
      FROM lineitem
    ),
    vg AS (
      SELECT v,
             CAST(sum(is_a) AS BIGINT) AS ca,
             CAST(sum(1 - is_a) AS BIGINT) AS cb
      FROM y GROUP BY v
    ),
    cum AS (
      SELECT v,
             CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cum_a,
             CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cum_b
      FROM vg
    ),
    tot AS (
      SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b FROM vg
    ),
    diff AS (
      SELECT v,
             abs(CAST(cum_a AS HUGEINT) * (SELECT n_b FROM tot)
                 - CAST(cum_b AS HUGEINT) * (SELECT n_a FROM tot)) AS d
      FROM cum
    ),
    mx AS (SELECT max(d) AS d_max FROM diff)
    SELECT (SELECT n_a FROM tot) AS n_a,
           (SELECT n_b FROM tot) AS n_b,
           CAST((SELECT min(v) FROM diff, mx WHERE d = d_max) AS BIGINT) AS ks_at_cents,
           round(CAST((SELECT d_max FROM mx) AS DOUBLE)
                 / (CAST((SELECT n_a FROM tot) AS DOUBLE) * (SELECT n_b FROM tot)),
                 6) AS ks_stat
    """,
)
def q248(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov distance between the price
    distributions of returned ('R') and kept line items — the
    distribution-drift test q216's PSI bins approximate, computed
    exactly. Cross-multiplied form: D·n_a·n_b = max|cum_a·n_b −
    cum_b·n_a| is an exact integer (DECIMAL(38)/HUGEINT: the product
    is ~n² and passes int64 near 3e9 rows), so the argmax value and
    the quantized statistic hash identically across engines;
    `ks_at_cents` breaks ties by smallest value.

    100 TB shape: rows collapse to distinct-value grain in one
    hash-agg; the two ECDFs are two two-pass range-partitioned prefix
    sums (bucket-local windows + broadcast offsets — both parallel,
    no single-partition sort); the max and argmax are one-row
    reduces broadcast back. Nothing re-scans the fact table."""
    from .operators.windows import global_prefix_sum

    y = t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_a"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
    )
    vg = y.groupBy("v").agg(
        F.sum("is_a").cast("long").alias("ca"),
        F.sum(1 - F.col("is_a")).cast("long").alias("cb"),
    )
    c1 = global_prefix_sum(vg, "v", True, [F.col("v")], "ca", out_col="cum_a")
    c2 = global_prefix_sum(c1, "v", True, [F.col("v")], "cb", out_col="cum_b")
    tot = vg.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    diff = c2.crossJoin(F.broadcast(tot)).select(
        "v",
        "n_a",
        "n_b",
        F.expr(
            "abs(CAST(cum_a AS DECIMAL(38,0)) * n_b - CAST(cum_b AS DECIMAL(38,0)) * n_a)"
        ).alias("d"),
    )
    mx = diff.agg(F.max("d").alias("d_max"))
    return (
        diff.crossJoin(F.broadcast(mx))
        .where(F.col("d") == F.col("d_max"))
        .groupBy("n_a", "n_b", "d_max")
        .agg(F.min("v").cast("long").alias("ks_at_cents"))
        .select(
            "n_a",
            "n_b",
            "ks_at_cents",
            F.expr(
                "round(CAST(d_max AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b), 6)"
            ).alias("ks_stat"),
        )
    )
