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
    hash-agg; BOTH ECDFs ride a single two-pass range-partitioned
    sweep (operators/windows.global_prefix_sum_multi — one bucketing,
    one window shuffle computing both running counts; no
    single-partition sort); the max and argmax are one-row reduces
    broadcast back. The single evaluation is STRUCTURAL, not an AQE
    accident: the distinct-cents grain is localCheckpointed before its
    four consumers (boundary sample, bucket totals, window sweep,
    grand totals), so the fact table is scanned exactly once — plan-
    gated in test_plan_quality (q165 precedent). (Measured: also
    checkpointing the derived diff table costs MORE than the window
    recompute it saves — the diff consumers re-run only the ~100k-row
    distinct-grain window over the checkpointed input, while a second
    checkpoint materializes DECIMAL(38) rows; 3.8s vs 2.8s warm at
    sf0.1.)"""
    from .operators.windows import global_prefix_sum_multi

    y = t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_a"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
    )
    vg = y.groupBy("v").agg(
        F.sum("is_a").cast("long").alias("ca"),
        F.sum(1 - F.col("is_a")).cast("long").alias("cb"),
    ).localCheckpoint()  # bounded: distinct price-cents grain
    c2 = global_prefix_sum_multi(
        vg, "v", True, [F.col("v")], ["ca", "cb"], ["cum_a", "cum_b"]
    )
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
    # argmax in ONE aggregation: max(struct(d, -v)) picks the largest d
    # and, among ties, the smallest v (struct max compares fields in
    # order) — identical to the previous max-then-filter-then-min form,
    # which evaluated the whole window-sweep subtree TWICE per
    # execution (once under the broadcast d_max, once under the filter)
    return diff.agg(
        F.max("n_a").alias("n_a"),  # constant on every row (broadcast tot)
        F.max("n_b").alias("n_b"),
        F.max(F.struct(F.col("d"), (-F.col("v")).alias("nv"))).alias("m"),
    ).select(
        "n_a",
        "n_b",
        (-F.col("m.nv")).cast("long").alias("ks_at_cents"),
        F.expr(
            "round(CAST(m.d AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b), 6)"
        ).alias("ks_stat"),
    )


# =====================================================================
# q249 — Spearman rank correlation (customer spend vs order count)
# =====================================================================


@query(
    "q249_spearman_rank_corr",
    """
    WITH cust AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey
    ),
    xg AS (
      SELECT spend AS v, CAST(count(*) AS BIGINT) AS c FROM cust GROUP BY spend
    ),
    xr AS (
      SELECT v, 2 * (CAST(sum(c) OVER (ORDER BY v) AS BIGINT) - c) + c + 1 AS dr
      FROM xg
    ),
    yg AS (
      SELECT n_orders AS v, CAST(count(*) AS BIGINT) AS c FROM cust GROUP BY n_orders
    ),
    yr AS (
      SELECT v, 2 * (CAST(sum(c) OVER (ORDER BY v) AS BIGINT) - c) + c + 1 AS dr
      FROM yg
    ),
    ranked AS (
      SELECT xr.dr AS dx, yr.dr AS dy
      FROM cust
      JOIN xr ON xr.v = cust.spend
      JOIN yr ON yr.v = cust.n_orders
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(CAST(dx AS HUGEINT)) AS sx,
             sum(CAST(dy AS HUGEINT)) AS sy,
             sum(CAST(dx AS HUGEINT) * dx) AS sxx,
             sum(CAST(dy AS HUGEINT) * dy) AS syy,
             sum(CAST(dx AS HUGEINT) * dy) AS sxy
      FROM ranked
    )
    SELECT n,
           round(
             CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
                    * CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE)),
             6) AS rho
    FROM m
    """,
)
def q249(spark, sf_dir):
    """Spearman rank correlation between a customer's total spend and
    their order count — the monotone-association companion to q79's
    Pearson (outlier-robust, scale-free). Tie-averaged ranks doubled
    (2C + c + 1 at distinct-value grain) stay integral, so all five
    moment sums are exact DECIMAL(38)/HUGEINT quantities and rho is
    one shared-association double expression, rounded once.

    100 TB shape: one hash-agg to customer grain; each measure's rank
    map is a distinct-value-grain aggregate + two-pass
    range-partitioned prefix sum (operators/windows.global_prefix_sum
    — no single-partition sort) joined back by value equality (plain
    hash joins on the value key); the correlation is a one-row
    reduce of five DECIMAL(38) sums. HUGEINT/DECIMAL because the
    cross terms ~4n^3 pass int64 near n ~ 1e5 customers."""
    from .operators.windows import global_prefix_sum

    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    cust = t(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.sum(cents).cast("long").alias("spend"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )

    def _rank_map(col: str):
        vg = cust.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        cc = global_prefix_sum(vg, "v", True, [F.col("v")], "c", out_col="cc")
        return cc.select(
            "v", (2 * (F.col("cc") - F.col("c")) + F.col("c") + 1).alias("dr")
        )

    xr, yr = _rank_map("spend"), _rank_map("n_orders")
    ranked = (
        cust.join(xr, cust["spend"] == xr["v"])
        .drop("v")
        .withColumnRenamed("dr", "dx")
        .join(yr, cust["n_orders"] == yr["v"])
        .drop("v")
        .withColumnRenamed("dr", "dy")
    )
    m = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr("CAST(dx AS DECIMAL(38,0))")).alias("sx"),
        F.sum(F.expr("CAST(dy AS DECIMAL(38,0))")).alias("sy"),
        F.sum(F.expr("CAST(dx AS DECIMAL(38,0)) * dx")).alias("sxx"),
        F.sum(F.expr("CAST(dy AS DECIMAL(38,0)) * dy")).alias("syy"),
        F.sum(F.expr("CAST(dx AS DECIMAL(38,0)) * dy")).alias("sxy"),
    )
    return m.select(
        "n",
        F.expr(
            "round("
            " CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)"
            " / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)"
            "        * CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE)),"
            " 6)"
        ).alias("rho"),
    )


# =====================================================================
# q250 — CUSUM change-point detection on daily revenue
# =====================================================================


@query(
    "q250_cusum_changepoint",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY day
    ),
    seq AS (
      SELECT day, x,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS idx,
             CAST(sum(x) OVER (ORDER BY day) AS BIGINT) AS pre
      FROM daily
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS total FROM daily
    ),
    dev AS (
      SELECT day,
             CAST(tot.n AS HUGEINT) * pre - CAST(idx AS HUGEINT) * tot.total AS s_n
      FROM seq, tot
    ),
    mx AS (SELECT max(abs(s_n)) AS d_max FROM dev)
    SELECT (SELECT n FROM tot) AS n_days,
           strftime((SELECT min(day) FROM dev, mx WHERE abs(s_n) = d_max),
                    '%Y-%m-%d') AS changepoint_day,
           CAST((SELECT CASE WHEN s_n >= 0 THEN 1 ELSE -1 END FROM dev, mx
                 WHERE abs(s_n) = d_max ORDER BY day LIMIT 1) AS BIGINT) AS direction,
           CAST((SELECT (1000 * d_max) // (CAST(tot.n AS HUGEINT) * tot.total)
                 FROM mx, tot) AS BIGINT) AS excursion_permille
    """,
)
def q250(spark, sf_dir):
    """CUSUM change-point scan over daily revenue: the day where the
    cumulative deviation from the global mean peaks — the classic
    level-shift detector (complement to q142's seasonal z-scores,
    which flag points, not regime changes). Mean-free integer form:
    S_d * n = n * prefix_d - idx_d * total, so the argmax day, its
    direction, and the permille excursion are exact
    HUGEINT/DECIMAL(38) quantities (prefix * n passes int64 at
    warehouse scale); ties break to the earliest day.

    100 TB shape: the only full scan is the hash-agg to DAY grain
    (map-side combined). The prefix/index windows then run at
    calendar grain — a few thousand rows bounded by the date span,
    not the data volume — so an unpartitioned window here is a
    deliberate post-aggregation choice (same reasoning as q122/q169),
    not the row-grain anti-pattern."""
    from pyspark.sql.window import Window

    daily = t(spark, sf_dir, "orders").groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("x"))
    w = Window.orderBy("day")
    seq = daily.select(
        "day",
        "x",
        F.row_number().over(w).cast("long").alias("idx"),
        F.sum("x").over(w).cast("long").alias("pre"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("total"),
    )
    dev = seq.crossJoin(F.broadcast(tot)).select(
        "day",
        "n",
        "total",
        F.expr(
            "CAST(n AS DECIMAL(38,0)) * pre - CAST(idx AS DECIMAL(38,0)) * total"
        ).alias("s_n"),
    )
    mx = dev.agg(F.max(F.abs(F.col("s_n"))).alias("d_max"))
    hit = (
        dev.crossJoin(F.broadcast(mx))
        .where(F.abs(F.col("s_n")) == F.col("d_max"))
        .groupBy("n", "total", "d_max")
        .agg(
            F.min("day").alias("cp_day"),
            F.min_by(
                F.when(F.col("s_n") >= 0, 1).otherwise(-1), F.col("day")
            ).cast("long").alias("direction"),
        )
    )
    return hit.select(
        F.col("n").alias("n_days"),
        F.date_format("cp_day", "yyyy-MM-dd").alias("changepoint_day"),
        "direction",
        F.expr(
            "CAST((1000 * d_max) div (CAST(n AS DECIMAL(38,0)) * total) AS BIGINT)"
        ).alias("excursion_permille"),
    )


# =====================================================================
# q251 — repeat-purchase survival: risk sets, censoring, hazard
# =====================================================================


@query(
    "q251_survival_hazard",
    """
    WITH o AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS day FROM orders
    ),
    horizon AS (SELECT max(day) AS maxday FROM o),
    firsts AS (SELECT o_custkey, min(day) AS d1 FROM o GROUP BY o_custkey),
    seconds AS (
      SELECT f.o_custkey, min(o.day) AS d2
      FROM firsts f JOIN o ON o.o_custkey = f.o_custkey AND o.day > f.d1
      GROUP BY f.o_custkey
    ),
    subj AS (
      SELECT f.o_custkey,
             CASE WHEN s.d2 IS NOT NULL THEN date_diff('day', f.d1, s.d2)
                  ELSE date_diff('day', f.d1, (SELECT maxday FROM horizon))
             END AS t,
             CASE WHEN s.d2 IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM firsts f LEFT JOIN seconds s ON s.o_custkey = f.o_custkey
    ),
    tg AS (
      SELECT CAST(t AS BIGINT) AS t,
             CAST(sum(ev) AS BIGINT) AS d_events,
             CAST(sum(1 - ev) AS BIGINT) AS c_censored
      FROM subj GROUP BY t
    ),
    risk AS (
      SELECT t, d_events, c_censored,
             CAST((SELECT count(*) FROM subj) AS BIGINT)
               - CAST(sum(d_events + c_censored) OVER (ORDER BY t) AS BIGINT)
               + (d_events + c_censored) AS n_risk
      FROM tg
    )
    SELECT t AS t_days, n_risk, d_events, c_censored,
           CAST((1000 * d_events) // n_risk AS BIGINT) AS hazard_permille
    FROM risk ORDER BY t LIMIT 30
    """,
)
def q251(spark, sf_dir):
    """Discrete-time survival analysis of repeat purchase: for each
    duration t (days from a customer's first order day to their next
    LATER order day), the risk set n_t (customers still unresolved at
    t), events d_t (repeat at t), right-censored exits c_t (never
    reordered; censored at the dataset horizon), and the exact
    integer hazard floor(1000*d_t/n_t) — the life-table q88's cohort
    retention cannot express because it ignores censoring. Same-day
    repeat orders count as the first purchase event (duration is
    day-grain by construction).

    100 TB shape: two hash-aggs to customer grain (first day; min
    later day via a self-join on the customer key — a co-partitioned
    shuffle join) plus a scalar horizon broadcast. The risk-set
    cumsum then runs at DURATION grain — bounded by the calendar span
    like q250, so the unpartitioned window is a post-aggregation
    choice, not the row-grain anti-pattern."""
    from pyspark.sql.window import Window

    o = t(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("day")
    )
    # ONE customer-grain pass feeds everything (r6 opt — the plan ran
    # 5 orders scans): the per-customer agg also carries max(day), so
    # the dataset horizon is an agg over the (checkpointed) firsts
    # frame instead of its own scan; the eager checkpoint stops the
    # seconds join and the subject build re-running the aggregate.
    firsts = (
        o.groupBy("o_custkey")
        .agg(F.min("day").alias("d1"), F.max("day").alias("dmax"))
        .localCheckpoint(eager=True)
    )
    horizon = firsts.agg(F.max("dmax").alias("maxday"))
    seconds = (
        firsts.select("o_custkey", "d1")
        .join(o, "o_custkey")
        .where(F.col("day") > F.col("d1"))
        .groupBy("o_custkey")
        .agg(F.min("day").alias("d2"))
    )
    subj = (
        firsts.select("o_custkey", "d1")
        .join(seconds, "o_custkey", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("d2").isNotNull(), F.datediff(F.col("d2"), F.col("d1"))
            )
            .otherwise(F.datediff(F.col("maxday"), F.col("d1")))
            .cast("long")
            .alias("t"),
            F.when(F.col("d2").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    tg = subj.groupBy("t").agg(
        F.sum("ev").cast("long").alias("d_events"),
        F.sum(1 - F.col("ev")).cast("long").alias("c_censored"),
    )
    # n_risk = customers still unresolved at t = sum over t' >= t of
    # (events + censored): a REVERSE running sum over the bounded
    # duration-grain frame — replaces the separate n_total aggregate
    # (which re-ran the whole subject pipeline) and the
    # total-minus-prefix arithmetic; same single bounded window.
    w = Window.orderBy(F.col("t").desc())
    risk = tg.withColumn(
        "n_risk",
        F.sum(F.col("d_events") + F.col("c_censored")).over(w).cast("long"),
    )
    return (
        risk.select(
            F.col("t").alias("t_days"),
            "n_risk",
            "d_events",
            "c_censored",
            F.expr("CAST((1000 * d_events) DIV n_risk AS BIGINT)").alias(
                "hazard_permille"
            ),
        )
        .orderBy("t_days")
        .limit(30)
    )


# =====================================================================
# q252 — readability scoring (integer-exact Flesch variant)
# =====================================================================


@query(
    "q252_readability",
    """
    WITH m AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                  w -> w <> '')) AS BIGINT) AS words,
             greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT),
                      1) AS sentences,
             greatest(CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT),
                      1) AS syllables
      FROM documents
    )
    SELECT doc_id, words, sentences, syllables,
           CAST(206835000 - (1015000000 * words) // sentences
                          - (84600000 * syllables) // words AS BIGINT) AS flesch_micro
    FROM m
    WHERE words > 0
    ORDER BY flesch_micro, doc_id LIMIT 25
    """,
)
def q252(spark, sf_dir):
    """Flesch reading-ease scoring over the corpus — the readability
    axis of the text-quality family (q40 stats, q70 quality score,
    q41 lang-id): words per sentence + syllables per word, with
    syllable nuclei approximated as maximal [aeiouy]+ runs (the
    standard codec-free heuristic). The score is kept integer-exact
    in micro-units via floor division — 206.835e6 − 1.015e9·W/S −
    84.6e6·Y/W — so the bottom-25 selection and every output value
    hash identically across engines (no float boundary risk at the
    LIMIT edge). Returns the 25 hardest-to-read docs.

    100 TB shape: embarrassingly parallel — three codegen'd regexp
    counters per row, zero joins, zero shuffles except the final
    TakeOrdered(25) (partial per-partition top-k, driver merges 25
    rows per partition)."""
    d = t(spark, sf_dir, "documents")
    m = d.select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.trim(F.col("text")), r"\s+"), lambda w: w != F.lit("")
            )
        )
        .cast("long")
        .alias("words"),
        F.greatest(
            F.regexp_count(F.col("text"), F.lit(r"[.!?]+")).cast("long"), F.lit(1)
        ).alias("sentences"),
        F.greatest(
            F.regexp_count(F.lower(F.col("text")), F.lit("[aeiouy]+")).cast("long"),
            F.lit(1),
        ).alias("syllables"),
    )
    return (
        m.where(F.col("words") > 0)
        .select(
            "doc_id",
            "words",
            "sentences",
            "syllables",
            F.expr(
                "CAST(206835000 - (1015000000 * words) DIV sentences"
                " - (84600000 * syllables) DIV words AS BIGINT)"
            ).alias("flesch_micro"),
        )
        .orderBy("flesch_micro", "doc_id")
        .limit(25)
    )


# =====================================================================
# q253 — randomization test (deterministic hash relabeling)
# =====================================================================

from .operators.det_hash import MINHASH_PRIME as _P
from .operators.det_hash import minhash_params as _affine_params

_PERM_R = 64  # null replicates
_PERM_AB = _affine_params(_PERM_R, seed=17)
_PERM_A = "[" + ",".join(str(a) for a, _ in _PERM_AB) + "]"
_PERM_B = "[" + ",".join(str(b) for _, b in _PERM_AB) + "]"
_PERM_A_SQL = "array(" + _PERM_A[1:-1] + ")"
_PERM_B_SQL = "array(" + _PERM_B[1:-1] + ")"


@query(
    "q253_randomization_test",
    f"""
    WITH y AS (
      SELECT CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
               % {_P} AS h,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_a,
             CAST(round(o_totalprice * 100) AS BIGINT) AS v
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ),
    obs AS (
      SELECT abs(CAST(sum(CASE WHEN is_a = 1 THEN v END) AS DOUBLE)
                   / sum(CASE WHEN is_a = 1 THEN 1 END)
                 - CAST(sum(CASE WHEN is_a = 0 THEN v END) AS DOUBLE)
                   / sum(CASE WHEN is_a = 0 THEN 1 END)) AS d_obs
      FROM y
    ),
    relabeled AS (
      SELECT r.r,
             (({_PERM_A}[CAST(r.r AS INT) + 1] * h + {_PERM_B}[CAST(r.r AS INT) + 1])
              % {_P}) % 2 AS g,
             v
      FROM y, unnest(range({_PERM_R})) AS r(r)
    ),
    nulls AS (
      SELECT r,
             abs(CAST(sum(CASE WHEN g = 1 THEN v END) AS DOUBLE)
                   / sum(CASE WHEN g = 1 THEN 1 END)
                 - CAST(sum(CASE WHEN g = 0 THEN v END) AS DOUBLE)
                   / sum(CASE WHEN g = 0 THEN 1 END)) AS d_null
      FROM relabeled GROUP BY r
    )
    SELECT round((SELECT d_obs FROM obs) / 100.0, 6) AS obs_diff_dollars,
           CAST({_PERM_R} AS BIGINT) AS n_replicates,
           CAST(1 + (SELECT count(*) FROM nulls, obs WHERE d_null >= d_obs)
                AS BIGINT) AS p_numer,
           round(CAST(1 + (SELECT count(*) FROM nulls, obs WHERE d_null >= d_obs)
                      AS DOUBLE) / ({_PERM_R} + 1), 6) AS p_value
    """,
)
def q253(spark, sf_dir):
    """Randomization test for the urgent-vs-low mean order value gap:
    rebuild the null distribution by RELABELING every order with a
    deterministic coin per replicate, recompute the absolute mean
    difference, and count how often the null beats the observed gap —
    p = (1 + #{d_null >= d_obs})/(R+1). No RNG anywhere: one md5 per
    ROW (not per draw) reduced mod 2^31-1, then each replicate's coin
    is an affine remix (a_r*h + b_r) mod p from the det_hash LCG
    literal family (the q35/q38 discipline) — products stay below
    2^62, so the identical int64 arithmetic runs on both engines and
    the p-value is oracle-exact. Means are doubles built from exact
    cents sums with shared association.

    100 TB shape: R=64 replicates are a generated-column explode
    feeding ONE hash-agg keyed (replicate, coin) — map-side combine
    collapses each partition to 2R partial sums, so the shuffle is
    O(partitions * 2R) rows regardless of data size; per-row CPU is
    one md5 + R multiply-adds, the irreducible price of resampling.
    No replicate ever materializes a resampled table."""
    from .operators.det_hash import md5_long

    y = t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        (md5_long(F.col("o_orderkey").cast("string")) % _P).alias("h"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_a"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    obs = y.agg(
        F.expr(
            "abs(CAST(sum(CASE WHEN is_a = 1 THEN v END) AS DOUBLE)"
            "      / sum(CASE WHEN is_a = 1 THEN 1 END)"
            "    - CAST(sum(CASE WHEN is_a = 0 THEN v END) AS DOUBLE)"
            "      / sum(CASE WHEN is_a = 0 THEN 1 END))"
        ).alias("d_obs")
    )
    relabeled = y.withColumn(
        "r", F.explode(F.sequence(F.lit(0), F.lit(_PERM_R - 1)))
    ).select(
        "r",
        F.expr(
            f"((element_at({_PERM_A_SQL}, CAST(r AS INT) + 1) * h"
            f"  + element_at({_PERM_B_SQL}, CAST(r AS INT) + 1)) % {_P}) % 2"
        ).alias("g"),
        "v",
    )
    nulls = relabeled.groupBy("r").agg(
        F.expr(
            "abs(CAST(sum(CASE WHEN g = 1 THEN v END) AS DOUBLE)"
            "      / sum(CASE WHEN g = 1 THEN 1 END)"
            "    - CAST(sum(CASE WHEN g = 0 THEN v END) AS DOUBLE)"
            "      / sum(CASE WHEN g = 0 THEN 1 END))"
        ).alias("d_null")
    )
    beat = (
        nulls.crossJoin(F.broadcast(obs))
        .where(F.col("d_null") >= F.col("d_obs"))
        .agg(F.count(F.lit(1)).alias("n_beat"))
    )
    return beat.crossJoin(F.broadcast(obs)).select(
        F.expr("round(d_obs / 100.0, 6)").alias("obs_diff_dollars"),
        F.lit(_PERM_R).cast("long").alias("n_replicates"),
        (1 + F.col("n_beat")).cast("long").alias("p_numer"),
        F.expr(f"round(CAST(1 + n_beat AS DOUBLE) / ({_PERM_R} + 1), 6)").alias(
            "p_value"
        ),
    )


# =====================================================================
# q254 — Poisson bootstrap confidence interval (deterministic)
# =====================================================================

_BOOT_R = 40  # bootstrap replicates
_BOOT_AB = _affine_params(_BOOT_R, seed=19)
_BOOT_A = "[" + ",".join(str(a) for a, _ in _BOOT_AB) + "]"
_BOOT_B = "[" + ",".join(str(b) for _, b in _BOOT_AB) + "]"
_BOOT_A_SQL = "array(" + _BOOT_A[1:-1] + ")"
_BOOT_B_SQL = "array(" + _BOOT_B[1:-1] + ")"

# Poisson(1) CDF thresholds for inverse-transform sampling: P(X<=k)
_POIS_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
]


def _pois_case(u_expr: str) -> str:
    """Shared-SQL inverse-CDF when-chain: Poisson(1) draw from a
    uniform in [0,1). Identical expression text on both engines."""
    branches = " ".join(
        f"WHEN {u_expr} < {c!r} THEN {k}" for k, c in enumerate(_POIS_CDF)
    )
    return f"CASE {branches} ELSE {len(_POIS_CDF)} END"


@query(
    "q254_poisson_bootstrap",
    f"""
    WITH y AS (
      SELECT CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
               % {_P} AS h,
             CAST(round(o_totalprice * 100) AS BIGINT) AS v
      FROM orders
    ),
    draws AS (
      SELECT r.r, v,
             {_pois_case(f"(CAST(({_BOOT_A}[CAST(r.r AS INT) + 1] * h + {_BOOT_B}[CAST(r.r AS INT) + 1]) % {_P} AS DOUBLE) / {_P})")} AS w
      FROM y, unnest(range({_BOOT_R})) AS r(r)
    ),
    reps AS (
      SELECT r,
             CAST(sum(CAST(w AS BIGINT) * v) AS DOUBLE) / sum(CAST(w AS BIGINT)) AS m
      FROM draws GROUP BY r
    ),
    ranked AS (
      SELECT m, row_number() OVER (ORDER BY m) AS i FROM reps
    ),
    pt AS (SELECT CAST(sum(v) AS DOUBLE) / count(*) AS mean_cents,
                  CAST(count(*) AS BIGINT) AS n FROM y)
    SELECT (SELECT n FROM pt) AS n,
           CAST({_BOOT_R} AS BIGINT) AS n_replicates,
           round((SELECT mean_cents FROM pt) / 100.0, 6) AS mean_dollars,
           round((SELECT m FROM ranked WHERE i = 2) / 100.0, 6) AS ci_lo_dollars,
           round((SELECT m FROM ranked WHERE i = {_BOOT_R - 1}) / 100.0, 6) AS ci_hi_dollars
    """,
)
def q254(spark, sf_dir):
    """95% bootstrap confidence interval for the mean order value via
    the POISSON bootstrap — the resampling scheme that actually works
    distributed: instead of drawing n rows with replacement (global
    coordination), each row independently receives a Poisson(1)
    multiplicity per replicate, drawn by inverse-CDF from a
    deterministic uniform. The uniform is one md5 per ROW reduced mod
    2^31-1, affine-remixed per replicate with det_hash LCG literals
    (int64-safe products — the q253/q35 family), then divided by p:
    identical doubles on both engines, so the interval is
    oracle-exact. R=40 replicate means; the CI is the 2nd / 39th
    order statistic (~2.5% / 97.5%). (Kleiner et al.'s
    scalable-bootstrap motivation; per-row independence is the
    standard streaming form.)

    100 TB shape: same as q253 — explode R generated replicates into
    ONE hash-agg with map-side combine (shuffle O(partitions * R));
    order statistics over R rows ride a 40-row sort. The when-chain
    inverse-CDF and the affine remix are codegen'd JVM arithmetic."""
    from .operators.det_hash import md5_long
    from pyspark.sql.window import Window

    y = t(spark, sf_dir, "orders").select(
        (md5_long(F.col("o_orderkey").cast("string")) % _P).alias("h"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    draws = y.withColumn(
        "r", F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1)))
    ).select(
        "r",
        "v",
        F.expr(
            _pois_case(
                f"(CAST((element_at({_BOOT_A_SQL}, CAST(r AS INT) + 1) * h"
                f" + element_at({_BOOT_B_SQL}, CAST(r AS INT) + 1)) % {_P} AS DOUBLE)"
                f" / {_P})"
            )
        ).alias("w"),
    )
    # ONE pass over orders: each replicate group sees every row exactly
    # once, so sum(v) / count(*) within ANY group equals the full-scan
    # point estimate bit-for-bit (exact bigint sum, same double
    # division) — the separate `pt` aggregate re-scanned orders, and
    # the two order-statistic filters consumed `ranked` through two
    # more plan branches (r6 opt: 1 scan + 1 bounded 40-row window
    # instead of 2 scans + 3 branches)
    reps = draws.groupBy("r").agg(
        F.expr("CAST(sum(CAST(w AS BIGINT) * v) AS DOUBLE) / sum(CAST(w AS BIGINT))").alias("m"),
        F.sum("v").alias("sv"),
        F.count(F.lit(1)).alias("cnt"),
    )
    ranked = reps.select(
        "m", "sv", "cnt", F.row_number().over(Window.orderBy("m")).alias("i")
    )
    return ranked.agg(
        F.max("cnt").cast("long").alias("n"),
        F.lit(_BOOT_R).cast("long").alias("n_replicates"),
        F.max(F.expr("CAST(sv AS DOUBLE) / cnt")).alias("mean_cents"),
        F.max(F.when(F.col("i") == 2, F.col("m"))).alias("lo"),
        F.max(F.when(F.col("i") == _BOOT_R - 1, F.col("m"))).alias("hi"),
    ).select(
        "n",
        "n_replicates",
        F.expr("round(mean_cents / 100.0, 6)").alias("mean_dollars"),
        F.expr("round(lo / 100.0, 6)").alias("ci_lo_dollars"),
        F.expr("round(hi / 100.0, 6)").alias("ci_hi_dollars"),
    )


# =====================================================================
# q255 — Theil-Sen robust trend slope (daily revenue)
# =====================================================================


@query(
    "q255_theil_sen",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY day
    ),
    pairs AS (
      SELECT CAST(a.x - b.x AS DOUBLE) / date_diff('day', b.day, a.day) AS slope
      FROM daily a JOIN daily b ON a.day > b.day
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             quantile_cont(slope, 0.5) AS med
      FROM pairs
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
           n_pairs,
           round(med / 100.0, 6) AS slope_dollars_per_day
    FROM m
    """,
)
def q255(spark, sf_dir):
    """Theil-Sen estimator of the revenue trend: the MEDIAN of all
    pairwise day-to-day slopes — the robust line fit that a single
    promotional spike cannot drag the way q162's least-squares slope
    can (breakdown point 29%). Slopes are dy/dx doubles built from
    exact integers (cents delta over day delta); both engines sort
    the same doubles and take the same interpolated median
    (percentile == quantile_cont semantics), rounded once.

    100 TB shape: the fact scan collapses to DAY grain first, so the
    pairwise self-join is calendar^2 — ~3M pairs for a 7-year span,
    CONSTANT in data volume (the q253 trick: grain before anything
    quadratic). The median is exact order-statistic SELECTION via the
    two-pass global_row_number (bucket-local ranks + broadcast
    offsets), not Spark's object-hash `percentile` collect (10s ->
    ~1s on the same pairs); the bounded pair set is localCheckpointed
    once so the selection's boundary/total/rank passes don't re-run
    the nested-loop join. n_pairs is the closed form C(n_days, 2) —
    days are distinct by construction. The ORACLE verifies with a
    genuinely different algorithm (quantile_cont over a full sort) —
    an independent cross-check, not a replay (the q215 discipline)."""
    from .operators.windows import global_row_number

    daily = t(spark, sf_dir, "orders").groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("x"))
    a = daily.select(F.col("day").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("day").alias("db"), F.col("x").alias("xb"))
    pairs = a.join(b, F.col("da") > F.col("db")).select(
        (
            (F.col("xa") - F.col("xb")).cast("double")
            / F.datediff(F.col("da"), F.col("db"))
        ).alias("slope")
    ).localCheckpoint()  # bounded (calendar^2); reused by 3 selection passes
    ranked = global_row_number(pairs, "slope", True, [F.col("slope")], out_col="rn")
    nd = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days")).select(
        "n_days",
        (F.col("n_days") * (F.col("n_days") - 1) / 2).cast("long").alias("n_pairs"),
        # interpolated median = mean of the order statistics at
        # positions (N+1)//2 and (N+2)//2 (equal when N is odd)
        F.expr("(n_days * (n_days - 1) DIV 2 + 1) DIV 2").alias("k1"),
        F.expr("(n_days * (n_days - 1) DIV 2 + 2) DIV 2").alias("k2"),
    )
    return (
        ranked.crossJoin(F.broadcast(nd))
        .where((F.col("rn") == F.col("k1")) | (F.col("rn") == F.col("k2")))
        .groupBy("n_days", "n_pairs")
        .agg(F.expr("round(avg(slope) / 100.0, 6)").alias("slope_dollars_per_day"))
        .select("n_days", "n_pairs", "slope_dollars_per_day")
    )


# =====================================================================
# q256 — Benjamini-Hochberg FDR screen over randomization p-values
# =====================================================================

_FDR_R = 64  # null replicates per hypothesis family
_FDR_AB = _affine_params(_FDR_R, seed=23)
_FDR_A = "[" + ",".join(str(a) for a, _ in _FDR_AB) + "]"
_FDR_B = "[" + ",".join(str(b) for _, b in _FDR_AB) + "]"
_FDR_A_SQL = "array(" + _FDR_A[1:-1] + ")"
_FDR_B_SQL = "array(" + _FDR_B[1:-1] + ")"
# BH level alpha = 1/_FDR_ALPHA_INV (kept integral for the exact test)
_FDR_ALPHA_INV = 10


@query(
    "q256_fdr_screen",
    f"""
    WITH y AS (
      SELECT CAST(('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
               % {_P} AS h,
             n.n_name AS nation,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS v
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS nn, CAST(sum(v) AS BIGINT) AS ss FROM y
    ),
    obs AS (
      SELECT nation, CAST(count(*) AS BIGINT) AS n_i, CAST(sum(v) AS BIGINT) AS s_i
      FROM y GROUP BY nation
    ),
    obs_d AS (
      SELECT o.nation,
             abs(CAST(o.s_i AS DOUBLE) / o.n_i
                 - CAST(t.ss - o.s_i AS DOUBLE) / (t.nn - o.n_i)) AS d_obs
      FROM obs o, tot t
    ),
    bands AS (
      SELECT nation,
             CAST(sum(n_i) OVER (ORDER BY nation) - n_i AS DOUBLE)
               / (SELECT nn FROM tot) AS lo,
             CAST(sum(n_i) OVER (ORDER BY nation) AS DOUBLE)
               / (SELECT nn FROM tot) AS hi
      FROM obs
    ),
    draws AS (
      SELECT r.r,
             CAST(({_FDR_A}[CAST(r.r AS INT) + 1] * y.h + {_FDR_B}[CAST(r.r AS INT) + 1])
                  % {_P} AS DOUBLE) / {_P} AS frac,
             y.v
      FROM y, unnest(range({_FDR_R})) AS r(r)
    ),
    null_groups AS (
      SELECT d.r, b.nation,
             CAST(count(*) AS BIGINT) AS n_ir, CAST(sum(d.v) AS BIGINT) AS s_ir
      FROM draws d JOIN bands b ON d.frac >= b.lo AND d.frac < b.hi
      GROUP BY d.r, b.nation
    ),
    null_d AS (
      SELECT g.nation,
             abs(CAST(g.s_ir AS DOUBLE) / g.n_ir
                 - CAST(t.ss - g.s_ir AS DOUBLE) / (t.nn - g.n_ir)) AS d_null
      FROM null_groups g, tot t
    ),
    pvals AS (
      SELECT o.nation,
             CAST(1 + (SELECT count(*) FROM null_d nd
                       WHERE nd.nation = o.nation AND nd.d_null >= o.d_obs)
                  AS BIGINT) AS p_numer
      FROM obs_d o
    ),
    ranked AS (
      SELECT nation, p_numer,
             CAST(row_number() OVER (ORDER BY p_numer, nation) AS BIGINT) AS k,
             CAST(count(*) OVER () AS BIGINT) AS m
      FROM pvals
    ),
    kstar AS (
      SELECT COALESCE(max(k), 0) AS k_max FROM ranked
      WHERE p_numer * {_FDR_ALPHA_INV} * m <= k * {_FDR_R + 1}
    )
    SELECT nation, k AS p_rank, p_numer,
           round(CAST(p_numer AS DOUBLE) / {_FDR_R + 1}, 6) AS p_value,
           CAST(CASE WHEN k <= (SELECT k_max FROM kstar) THEN 1 ELSE 0 END
                AS BIGINT) AS rejected
    FROM ranked ORDER BY p_rank, nation
    """,
)
def q256(spark, sf_dir):
    """Benjamini-Hochberg FDR screen over 25 simultaneous hypotheses
    — "which nations' mean order value differs from the rest?" — with
    EXACT arithmetic end to end: each per-nation p-value comes from
    the q253 randomization machinery (R=64 deterministic relabelings;
    null nation labels drawn from the observed nation distribution by
    inverting its empirical CDF with the shared affine-LCG uniform),
    so p = p_numer/(R+1) is a rational, and the BH step-up test
    p_(k) <= alpha*k/m runs as the integer cross-multiplication
    p_numer*alpha_inv*m <= k*(R+1) — no float boundary anywhere in
    the accept/reject decision.

    100 TB shape: the R-replicate fan-out is the q253 explode into
    ONE hash-agg at (replicate, nation) grain — map-side combine
    bounds the shuffle at O(partitions * R * m); the CDF-band lookup
    is a 25-row broadcast range join; everything after is m-row
    (25) arithmetic. Dimension joins (customer -> nation) are the
    standard broadcast star shape."""
    from .operators.det_hash import md5_long
    from pyspark.sql.window import Window

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # cache the hashed fact frame once (eager fill): the global total,
    # the per-nation observed stats and the R-replicate draw fan-out
    # all re-read it, and the tot/obs broadcasts were additionally
    # re-evaluated under every crossJoin branch — 48 parquet scans in
    # the final plan before this (r6 opt)
    y = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(
            (md5_long(F.col("o_orderkey").cast("string")) % _P).alias("h"),
            F.col("n_name").alias("nation"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        )
        .persist()
    )
    y.count()
    # 1-row / 25-row aggregates, each broadcast into several branches:
    # checkpoint so every consumer reads the materialized rows
    tot = y.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("v").cast("long").alias("ss"),
    ).localCheckpoint(eager=True)
    obs = y.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_i"),
        F.sum("v").cast("long").alias("s_i"),
    ).localCheckpoint(eager=True)
    obs_d = obs.crossJoin(F.broadcast(tot)).select(
        "nation",
        F.expr(
            "abs(CAST(s_i AS DOUBLE) / n_i - CAST(ss - s_i AS DOUBLE) / (nn - n_i))"
        ).alias("d_obs"),
    )
    wb = Window.orderBy("nation")
    bands = obs.crossJoin(F.broadcast(tot)).select(
        "nation",
        ((F.sum("n_i").over(wb) - F.col("n_i")).cast("double") / F.col("nn")).alias("lo"),
        (F.sum("n_i").over(wb).cast("double") / F.col("nn")).alias("hi"),
    )
    draws = y.withColumn(
        "r", F.explode(F.sequence(F.lit(0), F.lit(_FDR_R - 1)))
    ).select(
        "r",
        F.expr(
            f"CAST((element_at({_FDR_A_SQL}, CAST(r AS INT) + 1) * h"
            f" + element_at({_FDR_B_SQL}, CAST(r AS INT) + 1)) % {_P} AS DOUBLE) / {_P}"
        ).alias("frac"),
        "v",
    )
    null_groups = (
        draws.join(
            F.broadcast(bands),
            (F.col("frac") >= F.col("lo")) & (F.col("frac") < F.col("hi")),
        )
        .groupBy("r", "nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ir"),
            F.sum("v").cast("long").alias("s_ir"),
        )
    )
    null_d = null_groups.crossJoin(F.broadcast(tot)).select(
        "nation",
        F.expr(
            "abs(CAST(s_ir AS DOUBLE) / n_ir - CAST(ss - s_ir AS DOUBLE) / (nn - n_ir))"
        ).alias("d_null"),
    )
    beats = (
        null_d.join(F.broadcast(obs_d), "nation")
        .where(F.col("d_null") >= F.col("d_obs"))
        .groupBy("nation")
        .agg(F.count(F.lit(1)).cast("long").alias("n_beat"))
    )
    # eager checkpoint of the 25-row p-value table: `ranked` is
    # consumed by BOTH the BH threshold aggregate and the final select,
    # and its lineage contains the whole R x N randomization pipeline —
    # without the barrier that pipeline executed twice per run
    pvals = (
        obs_d.join(beats, "nation", "left")
        .select(
            "nation",
            (1 + F.coalesce(F.col("n_beat"), F.lit(0))).cast("long").alias("p_numer"),
        )
        .localCheckpoint(eager=True)
    )
    wr = Window.orderBy("p_numer", "nation")
    ranked = pvals.select(
        "nation",
        "p_numer",
        F.row_number().over(wr).cast("long").alias("k"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("m"),
    )
    kstar = ranked.where(
        F.col("p_numer") * _FDR_ALPHA_INV * F.col("m") <= F.col("k") * (_FDR_R + 1)
    ).agg(F.coalesce(F.max("k"), F.lit(0)).cast("long").alias("k_max"))
    return (
        ranked.crossJoin(F.broadcast(kstar))
        .select(
            "nation",
            F.col("k").alias("p_rank"),
            "p_numer",
            F.expr(f"round(CAST(p_numer AS DOUBLE) / {_FDR_R + 1}, 6)").alias("p_value"),
            F.when(F.col("k") <= F.col("k_max"), 1).otherwise(0).cast("long").alias("rejected"),
        )
        .orderBy("p_rank", "nation")
    )


# =====================================================================
# q257 — Kendall tau-b (daily revenue vs daily order count)
# =====================================================================


@query(
    "q257_kendall_tau",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM orders GROUP BY day
    ),
    pairs AS (
      SELECT CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END AS conc,
             CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END AS disc,
             CASE WHEN a.x = b.x AND a.y <> b.y THEN 1 ELSE 0 END AS tie_x,
             CASE WHEN a.y = b.y AND a.x <> b.x THEN 1 ELSE 0 END AS tie_y
      FROM daily a JOIN daily b ON a.day > b.day
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n0,
             CAST(sum(conc) AS BIGINT) AS c,
             CAST(sum(disc) AS BIGINT) AS d,
             CAST(sum(tie_x) AS BIGINT) AS tx,
             CAST(sum(tie_y) AS BIGINT) AS ty
      FROM pairs
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
           c AS concordant, d AS discordant,
           round(CAST(c - d AS DOUBLE)
                 / sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE)),
                 6) AS tau_b
    FROM m
    """,
)
def q257(spark, sf_dir):
    """Kendall tau-b between daily revenue and daily order volume —
    the concordance-based companion to q249's Spearman (robust to any
    monotone transform, interpretable as P(concordant) −
    P(discordant)). Every pair is classified with pure integer sign
    tests, so C, D and the tie counts are exact and tau-b is one
    shared-association double expression over five bigints. Tie
    handling is the full tau-b denominator sqrt((n0−tx)(n0−ty)).

    100 TB shape: the q255 pattern — collapse the fact scan to DAY
    grain first, so the quadratic pair stage is calendar^2 (~3M
    pairs, CONSTANT in data volume) and the whole statistic is one
    hash-agg over it. Row-grain Kendall is O(n^2) and never
    materializes here; for entity-grain tau use the q249 rank maps
    plus a merge-sort inversion count instead."""
    daily = t(spark, sf_dir, "orders").groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("x"),
        F.count(F.lit(1)).cast("long").alias("y"),
    )
    a = daily.select(F.col("day").alias("da"), F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = daily.select(F.col("day").alias("db"), F.col("x").alias("xb"), F.col("y").alias("yb"))
    pairs = a.join(b, F.col("da") > F.col("db")).select(
        F.expr("CASE WHEN (xa - xb) * (ya - yb) > 0 THEN 1 ELSE 0 END").alias("conc"),
        F.expr("CASE WHEN (xa - xb) * (ya - yb) < 0 THEN 1 ELSE 0 END").alias("disc"),
        F.expr("CASE WHEN xa = xb AND ya <> yb THEN 1 ELSE 0 END").alias("tie_x"),
        F.expr("CASE WHEN ya = yb AND xa <> xb THEN 1 ELSE 0 END").alias("tie_y"),
    )
    m = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum("conc").cast("long").alias("c"),
        F.sum("disc").cast("long").alias("d"),
        F.sum("tie_x").cast("long").alias("tx"),
        F.sum("tie_y").cast("long").alias("ty"),
    )
    nd = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return m.crossJoin(F.broadcast(nd)).select(
        "n_days",
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        F.expr(
            "round(CAST(c - d AS DOUBLE)"
            " / sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE)), 6)"
        ).alias("tau_b"),
    )


# =====================================================================
# q258 — seasonal-naive forecast backtest (MASE)
# =====================================================================


@query(
    "q258_forecast_backtest",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY day
    ),
    lagged AS (
      SELECT day, x,
             lag(x, 7) OVER (ORDER BY day) AS x_wk,
             lag(x, 1) OVER (ORDER BY day) AS x_d1
      FROM daily
    ),
    m AS (
      SELECT CAST(count(x_wk) AS BIGINT) AS n_scored,
             CAST(sum(abs(x - x_wk)) AS BIGINT) AS sae_seasonal,
             CAST(sum(CASE WHEN x_wk IS NOT NULL THEN abs(x - x_d1) END)
                  AS BIGINT) AS sae_naive
      FROM lagged
    )
    SELECT n_scored,
           round(CAST(sae_seasonal AS DOUBLE) / n_scored / 100.0, 6) AS mae_dollars,
           round(CAST(sae_seasonal AS DOUBLE) / sae_naive, 6) AS mase
    FROM m
    """,
)
def q258(spark, sf_dir):
    """Forecast-quality backtest: score the SEASONAL-NAIVE forecast
    (predict each day with the same weekday last week) against the
    one-step naive baseline via MASE = sum|x_t − x_{t−7}| /
    sum|x_t − x_{t−1}| over the common scored window — the
    scale-free forecast metric (MASE < 1 beats the naive walk;
    Hyndman & Koehler's recommended default). Both error sums are
    exact cents bigints; the two output ratios are single
    shared-association double expressions. The evaluation harness
    any forecasting node plugs into — swap the lag-7 column for a
    model's prediction column and the metric machinery is unchanged.

    100 TB shape: one hash-agg to day grain, then lags at CALENDAR
    grain (the q250/q251 post-aggregation exemption) and a one-row
    reduce. Nothing beyond the first agg touches data volume."""
    from pyspark.sql.window import Window

    daily = t(spark, sf_dir, "orders").groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("x"))
    w = Window.orderBy("day")
    lagged = daily.select(
        "x",
        F.lag("x", 7).over(w).alias("x_wk"),
        F.lag("x", 1).over(w).alias("x_d1"),
    )
    m = lagged.agg(
        F.count("x_wk").cast("long").alias("n_scored"),
        F.sum(F.abs(F.col("x") - F.col("x_wk"))).cast("long").alias("sae_seasonal"),
        F.sum(
            F.when(F.col("x_wk").isNotNull(), F.abs(F.col("x") - F.col("x_d1")))
        ).cast("long").alias("sae_naive"),
    )
    return m.select(
        "n_scored",
        F.expr("round(CAST(sae_seasonal AS DOUBLE) / n_scored / 100.0, 6)").alias(
            "mae_dollars"
        ),
        F.expr("round(CAST(sae_seasonal AS DOUBLE) / sae_naive, 6)").alias("mase"),
    )
