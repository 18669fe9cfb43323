"""Pipeline-depth battery (q114-q158 + sdk08-sdk10): SCD Type-2
history, bucketed interval joins, forward fill, grid resampling with
exact-rational interpolation, ordered list aggregation, lateral top-n,
declarative constraint audits, weighted medians, vocabulary build,
integer PageRank, skew diagnostics, embedding centroids, weighted
sampling, domain mixing, threshold sweeps, dedup survivor selection,
INTERSECT ALL, pointer-jumping hierarchy traversal, and the engine's
version-diff/zero-copy-clone ops under the oracle gate.

Every query is oracle-paired. Determinism rules are the repo-wide ones
(queries.py docstring): integer decisions only (cents / milli units,
rational num/den pairs instead of IEEE division), unique tiebreak
columns in every ordering, identical aliases on both engines.
"""
from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .operators import intervals as iv_ops
from .operators import timeseries as ts_ops
from .operators import windows as win_ops
from .operators.quality import Check, constraint_audit
from .queries import query, t

# =====================================================================
# q114 — SCD Type-2 compression of an event log
# =====================================================================


@query(
    "q114_scd2",
    """
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    s AS (
      SELECT user_id, event_type, ts, event_id FROM o
      WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type,
           ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           CAST(row_number() OVER w AS BIGINT) AS version,
           CAST(lead(ts) OVER w IS NULL AS BIGINT) AS is_current
    FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q114(spark, sf_dir):
    """Slowly-changing-dimension type-2 build: collapse each user's
    event_type runs into validity segments (valid_from/valid_to/
    version/is_current). operators/timeseries.scd2_compress — one
    shuffle, two stacked windows on the same key ordering."""
    return ts_ops.scd2_compress(
        t(spark, sf_dir, "events"), "user_id", "event_type", "ts", "event_id"
    )


# =====================================================================
# q115 — incident windows x purchases: point-in-interval join
# =====================================================================


@query(
    "q115_interval_join",
    """
    WITH e AS (SELECT ts, event_id FROM events WHERE event_type = 'error'),
    f AS (
      SELECT ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 600000
                  THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (ORDER BY ts, event_id)
    ),
    i AS (
      SELECT ts, sum(is_new) OVER (ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS iid
      FROM f
    ),
    inc AS (
      SELECT CAST(iid AS BIGINT) AS incident_id, min(ts) AS start_ts, max(ts) AS end_ts,
             CAST(count(*) AS BIGINT) AS n_errors
      FROM i GROUP BY 1
    ),
    p AS (SELECT ts, CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase')
    SELECT inc.incident_id, inc.start_ts, inc.end_ts, inc.n_errors,
           CAST(count(p.ts) AS BIGINT) AS n_purchases,
           CAST(coalesce(sum(p.cents), 0) AS BIGINT) AS purchase_cents
    FROM inc LEFT JOIN p ON p.ts >= inc.start_ts AND p.ts <= inc.end_ts
    GROUP BY 1, 2, 3, 4
    """,
)
def q115(spark, sf_dir):
    """Error incidents (global 10-min-gap sessionization of error
    events) joined to the purchases that happened during each. The
    oracle's range join is a nested-loop; the Spark side goes through
    operators/intervals.point_in_interval_join — hour-bucketed
    equi-join, O(points + covered buckets), no BroadcastNestedLoop.
    The global window is safe here because incidents derive from the
    *filtered* error stream (a tiny fraction of events); at 100 TB
    you'd shard incident detection by service/tenant key first."""
    ev = t(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select("ts", "event_id")
    w = Window.orderBy("ts", "event_id")
    gap_ms = F.unix_micros("ts") / 1000 - F.unix_micros(F.lag("ts").over(w)) / 1000
    flagged = err.withColumn(
        "is_new",
        F.when(F.lag("ts").over(w).isNull() | (gap_ms > 600000), 1).otherwise(0),
    )
    wsum = Window.orderBy("ts", "event_id").rowsBetween(Window.unboundedPreceding, 0)
    inc = (
        flagged.withColumn("iid", F.sum("is_new").over(wsum))
        .groupBy(F.col("iid").cast("long").alias("incident_id"))
        .agg(
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.count(F.lit(1)).cast("long").alias("n_errors"),
        )
        .withColumn("start_ms", F.expr("unix_micros(start_ts) DIV 1000"))
        .withColumn("end_ms", F.expr("unix_micros(end_ts) DIV 1000"))
    )
    pur = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.expr("unix_micros(ts) DIV 1000").alias("p_ms"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    # incidents are sessionized-error aggregates — orders of magnitude
    # smaller than the point stream — so broadcast the exploded
    # interval side (the operator honors the caller's hint)
    hits = iv_ops.point_in_interval_join(F.broadcast(inc), pur, "start_ms", "end_ms", "p_ms")
    stats = hits.groupBy("incident_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.sum("cents").cast("long").alias("purchase_cents"),
    )
    return (
        inc.join(F.broadcast(stats), "incident_id", "left")
        .select(
            "incident_id",
            "start_ts",
            "end_ts",
            "n_errors",
            F.coalesce("n_purchases", F.lit(0)).cast("long").alias("n_purchases"),
            F.coalesce("purchase_cents", F.lit(0)).cast("long").alias("purchase_cents"),
        )
    )


# =====================================================================
# q116 — forward fill (last observation carried forward)
# =====================================================================


@query(
    "q116_forward_fill",
    """
    SELECT user_id, event_id,
           last_value(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100) AS BIGINT) END IGNORE NULLS)
             OVER w AS last_purchase_cents,
           CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
             OVER w AS BIGINT) AS n_obs_so_far
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q116(spark, sf_dir):
    """Forward fill: at every event, the user's most recent purchase
    amount (cents) so far — IGNORE NULLS last_value vs Spark's
    F.last(ignorenulls=True). operators/timeseries.forward_fill; one
    shuffle."""
    ev = t(spark, sf_dir, "events")
    purchase_cents = F.when(
        F.col("event_type") == "purchase", F.round(F.col("value") * 100).cast("long")
    )
    out = ts_ops.forward_fill(
        ev, purchase_cents, "user_id", "ts", "event_id", out_col="last_purchase_cents"
    )
    return out.select("user_id", "event_id", "last_purchase_cents", "n_obs_so_far")


# =====================================================================
# q117 — grid resample with exact-rational linear interpolation
# =====================================================================

_GRID_MS = 21_600_000  # 6 hours


@query(
    "q117_resample_interp",
    f"""
    WITH p0 AS (
      SELECT user_id, epoch_ms(ts) AS ms, CAST(round(value * 1000) AS BIGINT) AS vm
      FROM events WHERE event_type = 'purchase'
    ),
    p AS (SELECT user_id, ms, max(vm) AS vm FROM p0 GROUP BY 1, 2),
    seg AS (
      SELECT user_id, ms, vm, lead(ms) OVER w AS ms1, lead(vm) OVER w AS vm1
      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ms)
    ),
    segf AS (SELECT * FROM seg WHERE ms1 IS NOT NULL AND ms1 > ms),
    grid AS (
      SELECT user_id, ms, vm, ms1, vm1, g
      FROM segf, unnest(generate_series((ms + {_GRID_MS - 1}) // {_GRID_MS},
                                        (ms1 + {_GRID_MS - 1}) // {_GRID_MS} - 1)) AS u(g)
    )
    SELECT user_id,
           make_timestamp(g * {_GRID_MS} * 1000) AS grid_ts,
           CAST(vm * (ms1 - ms) + (vm1 - vm) * (g * {_GRID_MS} - ms) AS BIGINT) AS interp_num,
           CAST(ms1 - ms AS BIGINT) AS interp_den
    FROM grid
    """,
)
def q117(spark, sf_dir):
    """Resample each user's purchase-value series onto a 6-hour grid
    with linear interpolation. The interpolated value is emitted as an
    exact integer rational (num, den) — engine-independent, no IEEE
    division. operators/timeseries.resample_linear; output scales with
    grid coverage, not with pairwise combinations."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    pts = ev.select(
        "user_id",
        F.expr("unix_micros(ts) DIV 1000").alias("ms"),
        F.round(F.col("value") * 1000).cast("long").alias("vm"),
    )
    return ts_ops.resample_linear(pts, "user_id", "ms", "vm", _GRID_MS)


# =====================================================================
# q118 — ordered list aggregation (listagg / string_agg)
# =====================================================================


@query(
    "q118_listagg",
    """
    SELECT o_orderpriority,
           string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS keys_csv,
           CAST(count(*) AS BIGINT) AS n_keys
    FROM orders WHERE o_orderkey % 97 = 0
    GROUP BY o_orderpriority
    """,
)
def q118(spark, sf_dir):
    """Ordered string aggregation: collect_list gives no ordering
    guarantee, so sort numerically post-collect (array_sort on the
    bigint array) and only then stringify+join — matching the oracle's
    ORDER BY inside string_agg."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    return o.groupBy("o_orderpriority").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("o_orderkey")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("keys_csv"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )


# =====================================================================
# q119 — lateral top-n per group
# =====================================================================


@query(
    "q119_lateral_topn",
    """
    SELECT r.r_name AS region, x.c_custkey, x.acctbal_cents
    FROM region r, LATERAL (
      SELECT c.c_custkey, CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE n.n_regionkey = r.r_regionkey
      ORDER BY c.c_acctbal DESC, c.c_custkey ASC
      LIMIT 3
    ) x
    """,
)
def q119(spark, sf_dir):
    """Top-3 customers by account balance per region. The oracle uses a
    correlated LATERAL subquery; Spark expresses the same thing as a
    rank-filter window after broadcast-joining the tiny dims — the
    standard Spark rewrite of lateral top-n (one shuffle on the window
    key instead of one subquery per outer row)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    joined = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]).join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    w = Window.partitionBy("r_name").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        joined.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= 3)
        .select(
            F.col("r_name").alias("region"),
            "c_custkey",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_cents"),
        )
    )


# =====================================================================
# q120 — declarative constraint audit (Deequ-style check suite)
# =====================================================================


@query(
    "q120_constraint_audit",
    """
    WITH rows AS (
      SELECT 'orders_pk_unique' AS check_name,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations
      FROM orders
      UNION ALL
      SELECT 'lineitem_line_unique', CAST(count(*) AS BIGINT),
             CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'lineitem_fk_orders',
             (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
             (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      UNION ALL
      SELECT 'quantity_in_1_50', CAST(count(*) AS BIGINT),
             CAST(coalesce(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END), 0) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'status_in_set', CAST(count(*) AS BIGINT),
             CAST(coalesce(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END), 0) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'custkey_not_null', CAST(count(*) AS BIGINT),
             CAST(coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
      FROM orders
    )
    SELECT check_name, n_rows, n_violations,
           CAST(n_violations = 0 AS BIGINT) AS passed
    FROM rows
    """,
)
def q120(spark, sf_dir):
    """Constraint suite over the fixture warehouse: primary-key
    uniqueness (lineitem's (l_orderkey, l_linenumber) is known
    NON-unique in this fixture — the audit must report it, not assume
    it), referential integrity, range and set membership, null checks.
    operators/quality.constraint_audit — aggregate-only scans + one
    anti-join; output is one row per constraint regardless of table
    size."""
    tables = {
        "orders": t(spark, sf_dir, "orders"),
        "lineitem": t(spark, sf_dir, "lineitem"),
    }
    checks = [
        Check("orders_pk_unique", "orders", "unique", cols=["o_orderkey"]),
        Check("lineitem_line_unique", "lineitem", "unique", cols=["l_orderkey", "l_linenumber"]),
        Check("lineitem_fk_orders", "lineitem", "ref", cols=["l_orderkey"],
              ref_table="orders", ref_col="o_orderkey"),
        Check("quantity_in_1_50", "lineitem", "in_range", cols=["l_quantity"], lo=1, hi=50),
        Check("status_in_set", "orders", "in_set", cols=["o_orderstatus"],
              values=["O", "F", "P"]),
        Check("custkey_not_null", "orders", "not_null", cols=["o_custkey"]),
    ]
    return constraint_audit(tables, checks)


# =====================================================================
# q121 — weighted median via cumulative-weight window
# =====================================================================


@query(
    "q121_weighted_median",
    """
    WITH w AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(round(l_quantity) AS BIGINT) AS wt
      FROM lineitem
    ),
    agg AS (SELECT l_returnflag, cents, sum(wt) AS wt FROM w GROUP BY 1, 2),
    cum AS (
      SELECT l_returnflag, cents,
             sum(wt) OVER (PARTITION BY l_returnflag ORDER BY cents) AS cw,
             sum(wt) OVER (PARTITION BY l_returnflag) AS tw
      FROM agg
    )
    SELECT l_returnflag, CAST(min(cents) AS BIGINT) AS wmedian_cents
    FROM cum WHERE 2 * cw >= tw GROUP BY l_returnflag
    """,
)
def q121(spark, sf_dir):
    """Weighted median of extended price (quantity-weighted) per return
    flag: collapse to distinct values first (ties would make the
    cumulative frame ambiguous), then one cumulative-weight window and
    a min over the crossing point. Integer cents/weights end-to-end."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.round(F.col("l_quantity")).cast("long").alias("wt"),
    )
    agg = li.groupBy("l_returnflag", "cents").agg(F.sum("wt").alias("wt"))
    wcum = Window.partitionBy("l_returnflag").orderBy("cents")
    wtot = Window.partitionBy("l_returnflag")
    cum = agg.select(
        "l_returnflag",
        "cents",
        F.sum("wt").over(wcum).alias("cw"),
        F.sum("wt").over(wtot).alias("tw"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(F.min("cents").cast("long").alias("wmedian_cents"))
    )


# =====================================================================
# q122 — vocabulary build (min-count filter + deterministic token ids)
# =====================================================================


@query(
    "q122_vocab_build",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
      FROM documents
    ),
    f AS (
      SELECT token, CAST(count(*) AS BIGINT) AS tf,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM tok WHERE token <> '' GROUP BY 1
    )
    SELECT CAST(row_number() OVER (ORDER BY tf DESC, token ASC) - 1 AS BIGINT) AS token_id,
           token, tf, df
    FROM f WHERE tf >= 10
    """,
)
def q122(spark, sf_dir):
    """Tokenizer-vocabulary construction: term + document frequencies,
    min-count pruning, then dense contiguous ids assigned by (tf desc,
    token asc) — the deterministic ordering a BPE/word-level tokenizer
    trainer needs for reproducible vocab files. The global row_number
    runs AFTER the min-count filter on vocabulary-sized data, and via
    the two-pass range-partitioned rank
    (operators/windows.global_row_number) — parallel even at
    web-corpus vocabulary sizes (plan-gated)."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    f = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.count_distinct("doc_id").cast("long").alias("df"),
    ).filter(F.col("tf") >= 10)
    return win_ops.global_row_number(
        f, "tf", False, [F.col("tf").desc(), F.col("token").asc()], out_col="__rn"
    ).select(
        (F.col("__rn") - 1).cast("long").alias("token_id"), "token", "tf", "df"
    )


# =====================================================================
# q123 — integer PageRank over the nation trade graph
# =====================================================================

_PR_EDGES_SQL = """
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst, CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
"""

_PR_STEP = """
    {nxt} AS (
      SELECT n.node,
             CAST(150000 + (850 * coalesce(sum((r.r * e.w) // o.ow), 0)) // 1000 AS BIGINT) AS r
      FROM nodes n
      LEFT JOIN edges e ON e.dst = n.node
      LEFT JOIN {cur} r ON r.node = e.src
      LEFT JOIN outw o ON o.src = e.src
      GROUP BY 1
    )"""


@query(
    "q123_pagerank",
    f"""
    WITH edges AS ({_PR_EDGES_SQL}),
    outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
    nodes AS (SELECT DISTINCT src AS node FROM edges
              UNION SELECT DISTINCT dst FROM edges),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
    {_PR_STEP.format(nxt="r1", cur="r0")},
    {_PR_STEP.format(nxt="r2", cur="r1")},
    {_PR_STEP.format(nxt="r3", cur="r2")}
    SELECT node AS nationkey, r AS rank_scaled FROM r3
    """,
)
def q123(spark, sf_dir):
    """PageRank (3 fixed iterations, integer-scaled, damping 0.85) over
    the supplier-nation -> customer-nation trade graph. The oracle
    unrolls the identical integer recurrence as three CTE levels;
    operators/graph_algo.pagerank runs it as an iterative DataFrame
    loop with lineage checkpoints — the shape that holds at a
    billion-edge graph (one join + one agg per iteration)."""
    li = t(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    edges = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    from .operators.graph_algo import pagerank

    out = pagerank(edges, iterations=3)
    return out.select(F.col("node").alias("nationkey"), "rank_scaled")


# =====================================================================
# q124 — join-key skew diagnostics
# =====================================================================


@query(
    "q124_skew_profile",
    """
    WITH c AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys, CAST(sum(cnt) AS BIGINT) AS total,
             CAST(max(cnt) AS BIGINT) AS max_cnt
      FROM c
    ),
    top AS (
      SELECT user_id, cnt,
             CAST(row_number() OVER (ORDER BY cnt DESC, user_id ASC) AS BIGINT) AS rk
      FROM c
    )
    SELECT t.user_id, t.cnt, t.rk, s.n_keys, s.total, s.max_cnt,
           CAST((t.cnt * 1000 * s.n_keys) // s.total AS BIGINT) AS hot_factor_permille
    FROM top t CROSS JOIN s WHERE t.rk <= 10
    """,
)
def q124(spark, sf_dir):
    """Key-skew diagnostics ahead of a shuffle: the 10 hottest user_id
    keys with hot_factor_permille (1000 = uniform). Pairs with the
    mitigations in operators/skew.py (salted join / two-phase agg) —
    diagnose first, salt only what's hot. Aggregate-only: top-10 rows
    out regardless of table size."""
    from .operators.skew import skew_profile

    return skew_profile(t(spark, sf_dir, "events"), ["user_id"], top_n=10)


# =====================================================================
# q125 — per-label embedding centroids (positional vector aggregation)
# =====================================================================


@query(
    "q125_centroid",
    """
    WITH e AS (
      SELECT label, u.pos, CAST(embedding[u.pos + 1] AS DOUBLE) AS v
      FROM embeddings, unnest(range(len(embedding))) AS u(pos)
    )
    SELECT CAST(label AS BIGINT) AS label, CAST(pos AS BIGINT) AS pos,
           CAST(sum(CAST(round(v * 1000) AS BIGINT)) AS BIGINT) AS sum_milli,
           CAST(count(*) AS BIGINT) AS n_vecs
    FROM e GROUP BY 1, 2
    """,
)
def q125(spark, sf_dir):
    """Per-label centroid of the embedding column in positional form:
    posexplode -> integer-milli sums per (label, dimension). Emitting
    (sum_milli, n_vecs) instead of the float mean keeps the result
    exact and engine-independent (callers divide); the explode is
    linear in rows x dim with map-side partial aggregation — the
    scalable layout for vector averaging (no collect, no UDF)."""
    e = t(spark, sf_dir, "embeddings").select(
        F.col("label").cast("long").alias("label"),
        F.posexplode("embedding").alias("pos", "v"),
    )
    return e.groupBy("label", F.col("pos").cast("long").alias("pos")).agg(
        F.sum(F.round(F.col("v").cast("double") * 1000).cast("long")).cast("long").alias("sum_milli"),
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
    )


# =====================================================================
# q126 — deterministic weighted sample (bottom-k by hash/weight priority)
# =====================================================================


@query(
    "q126_weighted_sample",
    """
    WITH pr AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
               // greatest(n_chars, 1) AS priority
      FROM documents
    ),
    r AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY source
                                        ORDER BY priority ASC, doc_id ASC) AS BIGINT) AS rk
      FROM pr
    )
    SELECT source, doc_id, n_chars, CAST(priority AS BIGINT) AS priority, rk
    FROM r WHERE rk <= 5
    """,
)
def q126(spark, sf_dir):
    """Weighted sampling, deterministic: per-source bottom-k on
    priority = md5(doc_id) DIV weight — longer documents (weight =
    n_chars) get proportionally smaller priorities, i.e. higher
    selection odds, and the same inputs always pick the same sample
    (retry-safe, oracle-checkable; contrast seeded TABLESAMPLE q60).
    One shuffle (window by source)."""
    from .operators.det_hash import md5_long

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        (
            md5_long(F.col("doc_id").cast("string"))
        ).alias("__h"),
    )
    pr = d.withColumn("priority", F.expr("__h DIV greatest(n_chars, 1)"))
    w = Window.partitionBy("source").orderBy(F.col("priority").asc(), F.col("doc_id").asc())
    return (
        pr.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select("source", "doc_id", "n_chars", F.col("priority").cast("long").alias("priority"), "rk")
    )


# =====================================================================
# q127 — domain mixing (deterministic per-source acceptance sampling)
# =====================================================================


@query(
    "q127_domain_mix",
    """
    WITH d AS (
      SELECT doc_id, source,
             100 + (CAST(substr(source, 4) AS BIGINT) * 47) % 900 AS target_permille,
             CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
               % 1000 AS h
      FROM documents
    )
    SELECT source, CAST(max(target_permille) AS BIGINT) AS target_permille,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(coalesce(sum(CASE WHEN h < target_permille THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_kept
    FROM d GROUP BY source
    """,
)
def q127(spark, sf_dir):
    """Training-mixture construction: each source gets a target keep
    rate (permille), and a document survives iff md5('mix:'||doc_id)
    mod 1000 falls under it — deterministic acceptance sampling, so
    reruns and task retries keep the exact same corpus (no seeded RNG
    divergence across engines or executors). Map-side filter + one
    hash-agg; at 100 TB the mixture step adds zero shuffles to a
    pipeline because acceptance is a pure column predicate."""
    from .operators.det_hash import md5_long

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        (100 + (F.substring("source", 4, 10).cast("long") * 47) % 900).alias(
            "target_permille"
        ),
        (md5_long(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))) % 1000).alias("h"),
    )
    return d.groupBy("source").agg(
        F.max("target_permille").cast("long").alias("target_permille"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("h") < F.col("target_permille")).cast("long")).cast("long").alias("n_kept"),
    )


# =====================================================================
# q128 — quality-filter threshold sweep (keep-rate calibration)
# =====================================================================


@query(
    "q128_threshold_sweep",
    """
    WITH s AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_words,
             round(cast(len(list_filter(string_split_regex(trim(text), '\\s+'),
                       x -> list_contains(['the','a','an','and','or','of','to','in','is','it'], lower(x)))) AS double)
                   / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6) AS stopword_ratio
      FROM documents
    ),
    q AS (
      SELECT round(0.7 * least(cast(n_words AS double) / 50.0, 1.0)
                 + 0.3 * least(stopword_ratio * 5.0, 1.0), 6) AS score
      FROM s
    ),
    b AS (
      SELECT CAST(floor(score * 10) AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n
      FROM q GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM b)
    SELECT b.bin AS threshold_decile, b.n AS n_in_bin,
           CAST(sum(b.n) OVER (ORDER BY b.bin DESC) AS BIGINT) AS n_at_or_above,
           CAST((sum(b.n) OVER (ORDER BY b.bin DESC)) * 1000 // tot.total AS BIGINT) AS keep_permille
    FROM b CROSS JOIN tot
    """,
)
def q128(spark, sf_dir):
    """Quality-filter calibration: bin the q70 quality score into
    deciles and report, for every candidate threshold, how much of the
    corpus survives (keep_permille) — the sweep a curation pipeline
    runs BEFORE committing to a cutoff. Histogram agg + an 11-row
    cumulative window: the expensive part (scoring) is one scan."""
    from .operators import text as text_ops

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    q = text_ops.quality_score(d, "text").select(
        F.floor(F.col("quality_score") * 10).cast("long").alias("bin")
    )
    b = q.groupBy("bin").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = b.agg(F.sum("n").cast("long").alias("total"))
    w = Window.orderBy(F.col("bin").desc())
    return (
        b.crossJoin(F.broadcast(tot))
        .select(
            F.col("bin").alias("threshold_decile"),
            F.col("n").alias("n_in_bin"),
            F.sum("n").over(w).cast("long").alias("n_at_or_above"),
            F.expr(
                "CAST(sum(n) OVER (ORDER BY bin DESC) * 1000 DIV total AS BIGINT)"
            ).alias("keep_permille"),
        )
    )


# =====================================================================
# q129 — dedup survivor selection (cluster representative policy)
# =====================================================================


@query(
    "q129_cluster_representative",
    """
    WITH norm AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             md5(array_to_string(string_split_regex(trim(text), '\\s+')[1:4], ' ')) AS fp
      FROM documents
    ),
    sized AS (
      SELECT *, CAST(count(*) OVER (PARTITION BY fp) AS BIGINT) AS n_members,
             CAST(row_number() OVER (PARTITION BY fp
                                     ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS pick
      FROM norm
    )
    SELECT fp AS cluster_fp, n_members, doc_id AS representative_id, n_chars,
           CAST(n_members - 1 AS BIGINT) AS n_dropped
    FROM sized WHERE pick = 1 AND n_members >= 2
    """,
)
def q129(spark, sf_dir):
    """Dedup survivor policy: within each shared-opening cluster (docs
    whose first 4 tokens fingerprint identically — the prefix-blocking
    key span dedup uses), KEEP the longest document (ties: smallest
    doc_id) and count what gets dropped — the 'keep-longest'
    representative rule curation pipelines apply after clustering. One
    shuffle: both windows share the fp partitioning."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.md5(
            F.array_join(F.slice(F.split(F.trim("text"), r"\s+"), 1, 4), " ")
        ).alias("fp"),
    )
    wp = Window.partitionBy("fp")
    wr = Window.partitionBy("fp").orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    sized = d.withColumn("n_members", F.count(F.lit(1)).over(wp).cast("long")).withColumn(
        "pick", F.row_number().over(wr).cast("long")
    )
    return (
        sized.filter((F.col("pick") == 1) & (F.col("n_members") >= 2))
        .select(
            F.col("fp").alias("cluster_fp"),
            "n_members",
            F.col("doc_id").alias("representative_id"),
            "n_chars",
            (F.col("n_members") - 1).cast("long").alias("n_dropped"),
        )
    )


# =====================================================================
# q130 — INTERSECT ALL (multiset intersection, completes the family)
# =====================================================================


@query(
    "q130_intersect_all",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q130(spark, sf_dir):
    """INTERSECT ALL: multiset intersection keeps min(multiplicity)
    copies per value — completing the set-op family (q19 UNION/
    INTERSECT/EXCEPT, q48 EXCEPT ALL). Spark's native intersectAll
    lowers to one aggregate + generate, no join."""
    o = t(spark, sf_dir, "orders")
    left = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    right = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return left.intersectAll(right)


# =====================================================================
# q131 — hierarchy traversal (recursive CTE vs pointer jumping)
# =====================================================================


@query(
    "q131_hierarchy",
    """
    WITH RECURSIVE anc(node, root, depth) AS (
      SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey < 10
      UNION ALL
      SELECT p.p_partkey, a.root, a.depth + 1
      FROM part p JOIN anc a ON a.node = p.p_partkey // 10
      WHERE p.p_partkey >= 10
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(root AS BIGINT) AS root,
           CAST(depth AS BIGINT) AS depth
    FROM anc
    """,
)
def q131(spark, sf_dir):
    """Hierarchy resolution over a synthetic BOM forest (parent =
    partkey DIV 10, roots are partkeys < 10): every part mapped to its
    root ancestor and depth. The oracle walks the tree with a
    recursive CTE (O(depth) sequential joins); the Spark side uses
    operators/graph_algo.tree_paths pointer jumping — O(log depth)
    self-join rounds, the formulation that survives deep hierarchies
    on a cluster."""
    from .operators.graph_algo import tree_paths

    p = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node"),
        F.when(F.col("p_partkey") >= 10, F.expr("p_partkey DIV 10")).alias("parent"),
    )
    return tree_paths(p, rounds=5).select(
        F.col("node").cast("long").alias("node"),
        F.col("root").cast("long").alias("root"),
        F.col("depth").cast("long").alias("depth"),
    )


# =====================================================================
# sdk08 / sdk09 — version diff and zero-copy clone through the engine
# =====================================================================


@query(
    "sdk08_version_diff",
    """
    SELECT 'added' AS change, o_orderkey FROM orders WHERE o_orderkey % 10 = 5
    UNION ALL
    SELECT 'updated' AS change, o_orderkey FROM orders WHERE o_orderkey % 10 = 0
    """,
)
def sdk08(spark, sf_dir):
    """Table.diff_versions under the oracle gate: version 1 holds the
    o_orderkey%10<5 slice, version 2 is an upsert that rewrites the
    %10==0 rows (status 'X') and inserts the %10==5 rows. The keyed
    diff must report exactly those as updated/added (upsert never
    removes). The oracle states the expected change set in closed
    form."""
    from .node.node import Table
    from .queries import _temp_engine

    eng = _temp_engine(spark)
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    with eng.node_context("w", outputs={"out": "dv_orders"}):
        tbl = Table("out", "w")
        tbl.init(schema={"o_orderkey": "bigint", "o_orderstatus": "text"}, unique_on="o_orderkey")
        tbl.upsert(o.filter(F.col("o_orderkey") % 10 < 5))
        tbl.flush()
        v1 = tbl.get_active_version().version_id
        batch2 = o.filter(
            (F.col("o_orderkey") % 10 == 0) | (F.col("o_orderkey") % 10 == 5)
        ).withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 10 == 0, F.lit("X")).otherwise(F.col("o_orderstatus")),
        )
        tbl.upsert(batch2)
        tbl.flush()
        v2 = tbl.get_active_version().version_id
        return tbl.diff_versions(v1, v2, key_cols=["o_orderkey"]).select(
            "change", F.col("o_orderkey").cast("long").alias("o_orderkey")
        )


@query(
    "sdk09_clone",
    """
    SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 7 = 0
    """,
)
def sdk09(spark, sf_dir):
    """Table.clone_from under the oracle gate: clone a customer slice
    into a second table without copying bytes (hardlinked files) and
    read the clone back — it must equal the source slice exactly. The
    bench number, when benched, is pure metadata cost."""
    from .node.node import Table
    from .queries import _temp_engine

    eng = _temp_engine(spark)
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    with eng.node_context("w", outputs={"src": "cl_src", "dst": "cl_dst"}):
        src = Table("src", "w")
        src.append(c.filter(F.col("c_custkey") % 7 == 0))
        src.flush()
        Table("dst", "w").clone_from("cl_src")
    with eng.node_context("r", inputs={"in": "cl_dst"}):
        return Table("in", "r").read_spark()


# =====================================================================
# q132 — COUNT(DISTINCT) OVER via the dense_rank rewrite
# =====================================================================


@query(
    "q132_window_count_distinct",
    """
    SELECT event_id, event_type,
           CAST(count(DISTINCT user_id) OVER (PARTITION BY event_type) AS BIGINT)
             AS n_distinct_users
    FROM events
    """,
)
def q132(spark, sf_dir):
    """COUNT(DISTINCT) OVER a partition — DuckDB has it natively;
    Spark's window aggregates reject DISTINCT, so the standard rewrite
    is max(dense_rank) over the same partition ordered by the counted
    column (nulls excluded would need a CASE; user_id is non-null
    here). Both windows share one hash-partitioning on event_type —
    a single shuffle, no join back. Scale note: ANY windowed distinct
    (native or rewritten) funnels each partition through one task; for
    few-distinct-value partition keys over huge data, the scale form
    is groupBy(key).agg(count_distinct(...)) + broadcast join back."""
    ev = t(spark, sf_dir, "events")
    w_rank = Window.partitionBy("event_type").orderBy("user_id")
    w_all = Window.partitionBy("event_type")
    return ev.select(
        "event_id",
        "event_type",
        F.max(F.dense_rank().over(w_rank)).over(w_all).cast("long").alias("n_distinct_users"),
    )


# =====================================================================
# q133 — relational division (customers covering EVERY priority class)
# =====================================================================


@query(
    "q133_relational_division",
    """
    WITH pr AS (SELECT count(DISTINCT o_orderpriority) AS n_all FROM orders)
    SELECT o.o_custkey,
           CAST(count(DISTINCT o.o_orderpriority) AS BIGINT) AS n_priorities,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o CROSS JOIN pr
    GROUP BY o.o_custkey, pr.n_all
    HAVING count(DISTINCT o.o_orderpriority) = pr.n_all
    """,
)
def q133(spark, sf_dir):
    """Relational division ('for all' queries): customers whose orders
    cover EVERY priority class that exists. The set-containment join is
    rewritten as count-distinct-equals-total — one hash aggregate plus
    a 1-row broadcast of the divisor cardinality, the scale form of
    division (a NOT EXISTS double negation would be two correlated
    anti-joins)."""
    o = t(spark, sf_dir, "orders")
    n_all = o.agg(F.count_distinct("o_orderpriority").alias("n_all"))
    per_cust = o.groupBy("o_custkey").agg(
        F.count_distinct("o_orderpriority").cast("long").alias("n_priorities"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )
    return (
        per_cust.crossJoin(F.broadcast(n_all))
        .filter(F.col("n_priorities") == F.col("n_all"))
        .select("o_custkey", "n_priorities", "n_orders")
    )


# =====================================================================
# q134 — inter-arrival gaps (reorder cadence per customer)
# =====================================================================


@query(
    "q134_interarrival",
    """
    WITH g AS (
      SELECT o_custkey,
             date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS gap_days
      FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey,
           CAST(count(gap_days) AS BIGINT) AS n_gaps,
           CAST(min(gap_days) AS BIGINT) AS min_gap_days,
           CAST(max(gap_days) AS BIGINT) AS max_gap_days,
           CAST(sum(gap_days) AS BIGINT) AS total_gap_days
    FROM g WHERE gap_days IS NOT NULL
    GROUP BY o_custkey
    """,
)
def q134(spark, sf_dir):
    """Inter-arrival analysis: day gaps between each customer's
    consecutive orders (lag over the per-customer date ordering,
    integer day arithmetic — sum/count emitted instead of an IEEE
    mean). One shuffle; the window and the aggregate share the
    o_custkey partitioning."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return g.groupBy("o_custkey").agg(
        F.count("gap_days").cast("long").alias("n_gaps"),
        F.min("gap_days").cast("long").alias("min_gap_days"),
        F.max("gap_days").cast("long").alias("max_gap_days"),
        F.sum("gap_days").cast("long").alias("total_gap_days"),
    )


@query(
    "sdk10_cdc_apply",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 10 = 2 THEN 'X' ELSE o_orderstatus END AS o_orderstatus
    FROM orders WHERE o_orderkey % 10 IN (0, 2, 3, 4, 5)
    """,
)
def sdk10(spark, sf_dir):
    """Table.apply_cdc under the oracle gate: start from the
    o_orderkey%10<5 slice, then apply one CDC batch that DELETES the
    %10==1 keys, UPDATES the %10==2 keys to status 'X', and INSERTS
    the %10==5 keys. The oracle states the post-merge table in closed
    form — deletes are the operation plain upsert can't express."""
    from .node.node import Table
    from .queries import _temp_engine

    eng = _temp_engine(spark)
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    with eng.node_context("w", outputs={"out": "cdc_orders"}):
        tbl = Table("out", "w")
        tbl.init(schema={"o_orderkey": "bigint", "o_orderstatus": "text"}, unique_on="o_orderkey")
        tbl.upsert(o.filter(F.col("o_orderkey") % 10 < 5))
        tbl.flush()
        batch = (
            o.filter(F.col("o_orderkey") % 10 == 1).withColumn("op", F.lit("D"))
            .unionByName(
                o.filter(F.col("o_orderkey") % 10 == 2)
                .withColumn("o_orderstatus", F.lit("X"))
                .withColumn("op", F.lit("I"))
            )
            .unionByName(
                o.filter(F.col("o_orderkey") % 10 == 5).withColumn("op", F.lit("I"))
            )
        )
        tbl.apply_cdc(batch)
    with eng.node_context("r", inputs={"in": "cdc_orders"}):
        return Table("in", "r").read_spark()


# =====================================================================
# q135 — running median (percentile as a window aggregate)
# =====================================================================


@query(
    "q135_running_median",
    """
    SELECT user_id, event_id,
           CAST(round(2 * median(CAST(round(value * 100) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS BIGINT)
             AS median_x2_cents
    FROM events WHERE event_type = 'purchase'
    """,
)
def q135(spark, sf_dir):
    """Running median of each user's purchase amounts: Spark has no
    dedicated median window function, but any declarative aggregate is
    window-capable — exact percentile(0.5) over a running frame equals
    DuckDB's windowed median (both interpolate the even-count middle
    pair, so 2x the value is integer-exact). Scale note: an exact
    windowed percentile buffers the frame per row; for unbounded
    streams the approx_percentile variant bounds memory."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(2 * F.expr("percentile(CAST(round(value * 100) AS BIGINT), 0.5)").over(w))
        .cast("long")
        .alias("median_x2_cents"),
    )


# =====================================================================
# q136 — schema-drift union (UNION ALL BY NAME)
# =====================================================================


@query(
    "q136_union_by_name",
    """
    SELECT id, cents, NULL AS qty
    FROM (SELECT o_orderkey AS id, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders WHERE o_orderkey % 50 = 0)
    UNION ALL
    SELECT id, NULL AS cents, qty
    FROM (SELECT l_orderkey AS id, CAST(round(l_quantity) AS BIGINT) AS qty
          FROM lineitem WHERE l_orderkey % 50 = 0 AND l_linenumber = 1)
    """,
)
def q136(spark, sf_dir):
    """Schema-drift union: two sources with different columns unify by
    NAME with null-fill (unionByName allowMissingColumns) — the append
    semantics the engine's merge-schema write path uses, exercised at
    the query layer. The oracle spells out the aligned projection the
    rewrite produces."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0).select(
        F.col("o_orderkey").alias("id"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .filter((F.col("l_orderkey") % 50 == 0) & (F.col("l_linenumber") == 1))
        .select(
            F.col("l_orderkey").alias("id"),
            F.round(F.col("l_quantity")).cast("long").alias("qty"),
        )
    )
    return o.unionByName(li, allowMissingColumns=True).select(
        "id", F.col("cents").cast("long").alias("cents"), F.col("qty").cast("long").alias("qty")
    )


# =====================================================================
# q137 — time-weighted average (TWAP) as exact rationals
# =====================================================================


@query(
    "q137_twap",
    """
    WITH p AS (
      SELECT user_id, epoch_ms(ts) AS ms, CAST(round(value * 1000) AS BIGINT) AS vm
      FROM events WHERE event_type = 'purchase'
    ),
    seg AS (
      SELECT user_id, vm, lead(ms) OVER w - ms AS dur_ms
      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ms)
    )
    SELECT user_id,
           CAST(sum(vm * dur_ms) AS BIGINT) AS twap_num,
           CAST(sum(dur_ms) AS BIGINT) AS twap_den,
           CAST(count(*) AS BIGINT) AS n_segments
    FROM seg WHERE dur_ms IS NOT NULL AND dur_ms > 0
    GROUP BY user_id
    """,
)
def q137(spark, sf_dir):
    """Time-weighted average purchase value per user: each observation
    holds until the next one (step interpolation), so TWAP =
    sum(v*dt)/sum(dt) over the observed span — emitted as the exact
    integer rational (num, den). One shuffle: the lead window and the
    aggregate share the user partitioning. The step-function weighting
    is what q116's forward fill integrates to."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    p = ev.select(
        "user_id",
        F.expr("unix_micros(ts) DIV 1000").alias("ms"),
        F.round(F.col("value") * 1000).cast("long").alias("vm"),
    )
    w = Window.partitionBy("user_id").orderBy("ms")
    seg = p.select(
        "user_id", "vm", (F.lead("ms").over(w) - F.col("ms")).alias("dur_ms")
    ).filter(F.col("dur_ms").isNotNull() & (F.col("dur_ms") > 0))
    return seg.groupBy("user_id").agg(
        F.sum(F.col("vm") * F.col("dur_ms")).cast("long").alias("twap_num"),
        F.sum("dur_ms").cast("long").alias("twap_den"),
        F.count(F.lit(1)).cast("long").alias("n_segments"),
    )


# =====================================================================
# q138 — group-wise min-max feature scaling (integer permille)
# =====================================================================


@query(
    "q138_minmax_scale",
    """
    WITH v AS (
      SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    s AS (
      SELECT event_id, event_type, cents,
             min(cents) OVER (PARTITION BY event_type) AS lo,
             max(cents) OVER (PARTITION BY event_type) AS hi
      FROM v
    )
    SELECT event_id, event_type,
           CAST(CASE WHEN hi > lo THEN ((cents - lo) * 1000) // (hi - lo)
                     ELSE 0 END AS BIGINT) AS scaled_permille
    FROM s
    """,
)
def q138(spark, sf_dir):
    """Min-max feature scaling per group (the normalization step of
    feature prep): value rescaled to [0, 1000] permille within its
    event_type's observed range — integer arithmetic, constant-range
    groups degenerate to 0. Scale note: the window form shares one
    partitioning; for few groups over huge data the groupBy +
    broadcast-join-back form avoids per-group single tasks (same
    rewrite as q132's note)."""
    ev = t(spark, sf_dir, "events").select(
        "event_id", "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    w = Window.partitionBy("event_type")
    s = ev.select(
        "event_id",
        "event_type",
        "cents",
        F.min("cents").over(w).alias("lo"),
        F.max("cents").over(w).alias("hi"),
    )
    return s.select(
        "event_id",
        "event_type",
        F.when(
            F.col("hi") > F.col("lo"),
            F.expr("((cents - lo) * 1000) DIV (hi - lo)"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("scaled_permille"),
    )


# =====================================================================
# q139 — market-basket co-occurrence (order-blocked pair counting)
# =====================================================================


@query(
    "q139_basket_pairs",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey % 100 AS item FROM lineitem
    ),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b, CAST(count(*) AS BIGINT) AS co_orders
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.item < b.item
      GROUP BY 1, 2
    ),
    freq AS (SELECT item, CAST(count(*) AS BIGINT) AS n_orders FROM items GROUP BY 1)
    SELECT p.item_a, p.item_b, p.co_orders, fa.n_orders AS n_a, fb.n_orders AS n_b
    FROM pairs p JOIN freq fa ON fa.item = p.item_a JOIN freq fb ON fb.item = p.item_b
    ORDER BY p.co_orders DESC, p.item_a ASC, p.item_b ASC LIMIT 20
    """,
)
def q139(spark, sf_dir):
    """Market-basket affinity: items (part groups) co-occurring in the
    same order, with each item's own order frequency for lift
    computation. The pair join is BLOCKED on the order key — pairs per
    order are bounded by basket size squared, never corpus-pairwise —
    and the top-20 is TakeOrderedAndProject. Integer counts only;
    callers derive lift = co/(n_a*n_b/N) from the exact pieces."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", (F.col("l_partkey") % 100).alias("item")
    ).distinct()
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("co_orders"))
    )
    freq = li.groupBy("item").agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    fa = freq.select(F.col("item").alias("item_a"), F.col("n_orders").alias("n_a"))
    fb = freq.select(F.col("item").alias("item_b"), F.col("n_orders").alias("n_b"))
    return (
        pairs.join(F.broadcast(fa), "item_a")
        .join(F.broadcast(fb), "item_b")
        .select("item_a", "item_b", "co_orders", "n_a", "n_b")
        .orderBy(F.col("co_orders").desc(), F.col("item_a").asc(), F.col("item_b").asc())
        .limit(20)
    )


# =====================================================================
# q140 — cumulative distinct users (first-touch rewrite)
# =====================================================================


@query(
    "q140_cumulative_distinct",
    """
    WITH first_touch AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
    ),
    per_day AS (
      SELECT first_day, CAST(count(*) AS BIGINT) AS new_users
      FROM first_touch GROUP BY first_day
    )
    SELECT strftime(first_day, '%Y-%m-%d') AS day, new_users,
           CAST(sum(new_users) OVER (ORDER BY first_day) AS BIGINT) AS cumulative_users
    FROM per_day
    """,
)
def q140(spark, sf_dir):
    """Cumulative distinct users per day via the first-touch rewrite:
    a naive 'COUNT(DISTINCT user) up to each day' re-scans the prefix
    per day (quadratic); min(first day) per user + a running sum over
    the per-day NEW-user counts gives the identical series with one
    aggregate + a days-sized window. Day emitted as an ISO string
    (raw DATE output dtypes drift between engines)."""
    ev = t(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    per_day = first.groupBy("first_day").agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    w = Window.orderBy("first_day")
    return per_day.select(
        F.date_format("first_day", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    )


# =====================================================================
# q141 — revenue concentration (exact-rational Gini coefficient)
# =====================================================================


@query(
    "q141_concentration",
    """
    WITH c AS (
      SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT cents, CAST(row_number() OVER (ORDER BY cents ASC, o_custkey ASC) AS BIGINT) AS i
      FROM c
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST(2 * sum(i * cents) - (count(*) + 1) * sum(cents) AS BIGINT) AS gini_num,
           CAST(count(*) * sum(cents) AS BIGINT) AS gini_den
    FROM r
    """,
)
def q141(spark, sf_dir):
    """Revenue concentration across customers as an exact-rational Gini
    coefficient: with spend sorted ascending and ranked i=1..n,
    G = (2*sum(i*x) - (n+1)*sum(x)) / (n*sum(x)) — numerator and
    denominator emitted as exact int64 (products stay well under 2^63
    at warehouse scale since x is per-customer cents). The global rank
    runs over customer-level aggregates via the two-pass
    range-partitioned form (operators/windows.global_row_number) —
    no single-partition sort at any customer count (plan-gated)."""
    o = t(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    r = win_ops.global_row_number(
        c, "cents", True,
        [F.col("cents").asc(), F.col("o_custkey").asc()], out_col="i",
    ).select("cents", "i")
    return r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("total_cents"),
        (2 * F.sum(F.col("i") * F.col("cents"))
         - (F.count(F.lit(1)) + 1) * F.sum("cents")).cast("long").alias("gini_num"),
        (F.count(F.lit(1)) * F.sum("cents")).cast("long").alias("gini_den"),
    )


# =====================================================================
# q142 — seasonal-baseline anomaly detection (hour-of-day profile)
# =====================================================================


@query(
    "q142_seasonal_anomaly",
    """
    WITH hourly AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts,
             CAST(hour(ts) AS BIGINT) AS hod,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    base AS (
      SELECT hod, CAST(sum(n) AS BIGINT) AS tot, CAST(count(*) AS BIGINT) AS n_hours
      FROM hourly GROUP BY hod
    )
    SELECT h.hour_ts, h.hod, h.n,
           CAST((h.n * b.n_hours * 1000) // b.tot AS BIGINT) AS vs_baseline_permille
    FROM hourly h JOIN base b ON b.hod = h.hod
    WHERE (h.n * b.n_hours * 1000) // b.tot >= 1500
       OR (h.n * b.n_hours * 1000) // b.tot <= 500
    """,
)
def q142(spark, sf_dir):
    """Seasonality-aware anomaly detection: each wall-clock hour's
    event count compared to the average for its hour-of-day across the
    whole window (the seasonal baseline); hours at >=150% or <=50% of
    baseline are flagged. Integer permille against the exact rational
    baseline (n * n_hours / total) — no IEEE division. The baseline
    table is 24 rows: broadcast join, zero extra shuffles over the
    hourly rollup."""
    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour_ts"),
        F.hour("ts").cast("long").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    base = hourly.groupBy("hod").agg(
        F.sum("n").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("n_hours"),
    )
    joined = hourly.join(F.broadcast(base), "hod").withColumn(
        "vs_baseline_permille", F.expr("(n * n_hours * 1000) DIV tot")
    )
    return joined.filter(
        (F.col("vs_baseline_permille") >= 1500) | (F.col("vs_baseline_permille") <= 500)
    ).select("hour_ts", "hod", "n", "vs_baseline_permille")


# =====================================================================
# q143 — audience overlap between event types (set similarity)
# =====================================================================


@query(
    "q143_audience_overlap",
    """
    WITH a AS (SELECT DISTINCT event_type, user_id FROM events),
    sizes AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users FROM a GROUP BY 1),
    pairs AS (
      SELECT x.event_type AS type_a, y.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM a x JOIN a y ON x.user_id = y.user_id AND x.event_type < y.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_both, sa.n_users AS n_a, sb.n_users AS n_b,
           CAST((p.n_both * 1000) // least(sa.n_users, sb.n_users) AS BIGINT)
             AS overlap_permille
    FROM pairs p
    JOIN sizes sa ON sa.event_type = p.type_a
    JOIN sizes sb ON sb.event_type = p.type_b
    """,
)
def q143(spark, sf_dir):
    """Audience overlap (Szymkiewicz-Simpson coefficient, permille)
    between every pair of event types: |A∩B| / min(|A|,|B|) from a
    user-blocked self-join of the distinct (type, user) pairs — the
    join fans out per USER (bounded by types²), never corpus-pairwise.
    Sizes broadcast back onto the pair aggregate."""
    a = t(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    sizes = a.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    x, y = a.alias("x"), a.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"), F.col("y.event_type").alias("type_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.expr("(n_both * 1000) DIV least(n_a, n_b)").cast("long").alias("overlap_permille"),
        )
    )


# =====================================================================
# q144 — time-to-convert distribution (signup -> first purchase)
# =====================================================================


@query(
    "q144_time_to_convert",
    """
    WITH s AS (
      SELECT user_id, min(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS first_purchase_ts
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
      GROUP BY e.user_id
    ),
    d AS (
      SELECT s.user_id,
             epoch_ms(p.first_purchase_ts) - epoch_ms(s.signup_ts) AS ms_to_convert
      FROM s JOIN p ON p.user_id = s.user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           CAST(min(ms_to_convert) AS BIGINT) AS min_ms,
           CAST(max(ms_to_convert) AS BIGINT) AS max_ms,
           CAST(round(2 * median(ms_to_convert)) AS BIGINT) AS median_x2_ms,
           CAST(sum(ms_to_convert) AS BIGINT) AS total_ms
    FROM d
    """,
)
def q144(spark, sf_dir):
    """Conversion latency: per user, the gap from first signup to
    first at-or-after purchase, distilled to integer-exact
    distribution stats (median doubled — the interpolated even-count
    middle stays integral). Two aggregates + one key join; no windows
    over raw events."""
    ev = t(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("signup_ts")
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    d = s.join(p, "user_id").select(
        (
            F.expr("unix_micros(first_purchase_ts) DIV 1000")
            - F.expr("unix_micros(signup_ts) DIV 1000")
        ).alias("ms_to_convert")
    )
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.min("ms_to_convert").cast("long").alias("min_ms"),
        F.max("ms_to_convert").cast("long").alias("max_ms"),
        F.round(2 * F.expr("percentile(ms_to_convert, 0.5)")).cast("long").alias("median_x2_ms"),
        F.sum("ms_to_convert").cast("long").alias("total_ms"),
    )


# =====================================================================
# q145 — winsorization (percentile clipping, integer 2x-scale)
# =====================================================================


@query(
    "q145_winsorize",
    """
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
    ),
    b AS (
      SELECT event_type,
             CAST(round(2 * quantile_cont(cents, 0.05)) AS BIGINT) AS p05_x2,
             CAST(round(2 * quantile_cont(cents, 0.95)) AS BIGINT) AS p95_x2
      FROM v GROUP BY event_type
    )
    SELECT v.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(least(greatest(2 * v.cents, b.p05_x2), b.p95_x2)) AS BIGINT)
             AS sum_clipped_x2,
           CAST(sum(CASE WHEN 2 * v.cents < b.p05_x2 OR 2 * v.cents > b.p95_x2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           b.p05_x2, b.p95_x2
    FROM v JOIN b ON b.event_type = v.event_type
    GROUP BY v.event_type, b.p05_x2, b.p95_x2
    """,
)
def q145(spark, sf_dir):
    """Winsorization: clip each group's values at its exact p05/p95
    (the robust-preprocessing step before training on heavy-tailed
    features). Exact interpolated percentiles are compared and clipped
    on the 2x-integer scale so the even-count .5 interpolations stay
    integral on both engines. Two aggregates over one partitioning;
    the 5-row bounds table broadcasts back."""
    v = t(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    b = v.groupBy("event_type").agg(
        F.round(2 * F.expr("percentile(cents, 0.05)")).cast("long").alias("p05_x2"),
        F.round(2 * F.expr("percentile(cents, 0.95)")).cast("long").alias("p95_x2"),
    )
    j = v.join(F.broadcast(b), "event_type")
    clipped = F.least(F.greatest(2 * F.col("cents"), F.col("p05_x2")), F.col("p95_x2"))
    return j.groupBy("event_type", "p05_x2", "p95_x2").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(clipped).cast("long").alias("sum_clipped_x2"),
        F.sum(
            ((2 * F.col("cents") < F.col("p05_x2")) | (2 * F.col("cents") > F.col("p95_x2"))).cast("long")
        ).cast("long").alias("n_clipped"),
    ).select("event_type", "n", "sum_clipped_x2", "n_clipped", "p05_x2", "p95_x2")


# =====================================================================
# q146 — null-safe join equality (<=> / IS NOT DISTINCT FROM)
# =====================================================================


@query(
    "q146_null_safe_join",
    """
    WITH a AS (
      SELECT o_orderkey, nullif(o_orderpriority, '1-URGENT') AS pr
      FROM orders WHERE o_orderkey % 40 = 0
    ),
    b AS (
      SELECT nullif(o_orderpriority, '1-URGENT') AS pr,
             CAST(count(*) AS BIGINT) AS n_in_class
      FROM orders GROUP BY 1
    )
    SELECT coalesce(a.pr, '<null>') AS priority_class,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(b.n_in_class) AS BIGINT) AS class_size
    FROM a JOIN b ON a.pr IS NOT DISTINCT FROM b.pr
    GROUP BY 1
    """,
)
def q146(spark, sf_dir):
    """Null-safe join equality: the urgent class is nulled out on both
    sides, and the join must still match null-to-null — Spark's <=>
    (eqNullSafe) vs SQL's IS NOT DISTINCT FROM. A plain equi-join
    would silently drop the whole null-key class (the classic lost-
    rows bug this operator exists to prevent)."""
    o = t(spark, sf_dir, "orders")
    pr = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    a = o.filter(F.col("o_orderkey") % 40 == 0).select("o_orderkey", pr.alias("pr"))
    b = o.select(pr.alias("pr")).groupBy("pr").agg(
        F.count(F.lit(1)).cast("long").alias("n_in_class")
    )
    return (
        a.join(b, a["pr"].eqNullSafe(b["pr"]))
        .groupBy(F.coalesce(a["pr"], F.lit("<null>")).alias("priority_class"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("n_in_class").cast("long").alias("class_size"),
        )
    )


# =====================================================================
# q147 — A/B proportion comparison (exact chi-square rationals)
# =====================================================================


@query(
    "q147_ab_proportions",
    """
    WITH assign AS (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS grp,
             CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
               AS converted
      FROM events GROUP BY user_id
    ),
    cells AS (
      SELECT CAST(sum(CASE WHEN grp = 0 AND converted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN grp = 0 AND converted = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN grp = 1 AND converted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN grp = 1 AND converted = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM assign
    )
    SELECT a, b, c, d,
           CAST((a + b + c + d) * (a*d - b*c) * (a*d - b*c) AS BIGINT) AS chi2_num,
           CAST((a+b) * (c+d) * (a+c) * (b+d) AS BIGINT) AS chi2_den
    FROM cells
    """,
)
def q147(spark, sf_dir):
    """A/B experiment readout: users split by id parity, outcome =
    converted (any purchase). The 2x2 contingency cells and the exact
    chi-square statistic as an integer rational
    N*(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)) — significance testing with
    zero IEEE ambiguity (callers compare the rational to the critical
    value). One aggregate over per-user flags."""
    ev = t(spark, sf_dir, "events")
    assign = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("long")).alias("converted")
    ).withColumn("grp", (F.col("user_id") % 2).cast("long"))
    cells = assign.agg(
        F.sum(((F.col("grp") == 0) & (F.col("converted") == 1)).cast("long")).cast("long").alias("a"),
        F.sum(((F.col("grp") == 0) & (F.col("converted") == 0)).cast("long")).cast("long").alias("b"),
        F.sum(((F.col("grp") == 1) & (F.col("converted") == 1)).cast("long")).cast("long").alias("c"),
        F.sum(((F.col("grp") == 1) & (F.col("converted") == 0)).cast("long")).cast("long").alias("d"),
    )
    ad_bc = F.col("a") * F.col("d") - F.col("b") * F.col("c")
    return cells.select(
        "a", "b", "c", "d",
        ((F.col("a") + F.col("b") + F.col("c") + F.col("d")) * ad_bc * ad_bc)
        .cast("long").alias("chi2_num"),
        ((F.col("a") + F.col("b")) * (F.col("c") + F.col("d"))
         * (F.col("a") + F.col("c")) * (F.col("b") + F.col("d")))
        .cast("long").alias("chi2_den"),
    )


# =====================================================================
# q148 — point-in-time join against SCD2 validity windows
# =====================================================================


@query(
    "q148_pit_join",
    """
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    s AS (
      SELECT user_id, event_type, ts, event_id FROM o
      WHERE prev IS NULL OR prev <> event_type
    ),
    dim AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM s
    ),
    p AS (
      SELECT event_id, user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.cents, d.state
    FROM p JOIN dim d
      ON d.user_id = p.user_id
     AND p.ts >= d.valid_from
     AND (d.valid_to IS NULL OR p.ts < d.valid_to)
    """,
)
def q148(spark, sf_dir):
    """Point-in-time join (the feature-store lookup): each purchase
    joined to the SCD2 state segment (q114's dimension) valid AT its
    timestamp — equi key + half-open validity range, so every fact
    matches exactly one segment and training labels can't leak future
    state. The range residual rides the user_id equi-join (bounded per
    user, no nested loop); at 100 TB both sides hash-partition on the
    entity key once."""
    ev = t(spark, sf_dir, "events")
    dim = ts_ops.scd2_compress(ev, "user_id", "event_type", "ts", "event_id").select(
        "user_id",
        F.col("event_type").alias("state"),
        "valid_from",
        "valid_to",
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.col("user_id").alias("p_user"),
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    j = p.join(
        dim,
        (F.col("p_user") == dim["user_id"])
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
    )
    return j.select("event_id", F.col("p_user").alias("user_id"), "cents", "state")


# =====================================================================
# q149 — deterministic train/val/test split (stratified by source)
# =====================================================================


@query(
    "q149_train_split",
    """
    WITH s AS (
      SELECT doc_id, source,
             CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
               % 100 AS h
      FROM documents
    ),
    labeled AS (
      SELECT source,
             CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split
      FROM s
    )
    SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs
    FROM labeled GROUP BY source, split
    """,
)
def q149(spark, sf_dir):
    """Train/val/test assignment by content-stable hash (md5 of a
    salted doc id, 80/10/10): membership survives reshuffles, reruns,
    and corpus growth — a document never migrates between splits, the
    property random splits lack. Reported per source so stratification
    skew is visible. Pure map-side predicate + one aggregate."""
    from .operators.det_hash import md5_long

    d = t(spark, sf_dir, "documents").select(
        "source",
        (md5_long(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100).alias("h"),
    )
    labeled = d.select(
        "source",
        F.when(F.col("h") < 80, "train").when(F.col("h") < 90, "val").otherwise("test").alias("split"),
    )
    return labeled.groupBy("source", "split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


# =====================================================================
# q150 — class-balance audit (imbalance vs majority class)
# =====================================================================


@query(
    "q150_class_balance",
    """
    WITH c AS (
      SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n
      FROM embeddings GROUP BY label
    ),
    m AS (SELECT CAST(max(n) AS BIGINT) AS n_max, CAST(sum(n) AS BIGINT) AS total FROM c)
    SELECT c.label, c.n,
           CAST((c.n * 1000) // m.n_max AS BIGINT) AS vs_majority_permille,
           CAST((c.n * 1000) // m.total AS BIGINT) AS share_permille
    FROM c CROSS JOIN m
    """,
)
def q150(spark, sf_dir):
    """Class-balance audit over the labeled embedding set: each class's
    size against the majority class and against the total (integer
    permille) — the imbalance report that decides whether training
    needs reweighting/resampling. One aggregate + a 2-number
    broadcast."""
    c = t(spark, sf_dir, "embeddings").groupBy(F.col("label").cast("long").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    m = c.agg(
        F.max("n").cast("long").alias("n_max"), F.sum("n").cast("long").alias("total")
    )
    return c.crossJoin(F.broadcast(m)).select(
        "label",
        "n",
        F.expr("(n * 1000) DIV n_max").cast("long").alias("vs_majority_permille"),
        F.expr("(n * 1000) DIV total").cast("long").alias("share_permille"),
    )


# =====================================================================
# q151 — cross-source duplicate leakage audit
# =====================================================================


@query(
    "q151_cross_source_leakage",
    """
    WITH f AS (
      SELECT DISTINCT source,
             md5(array_to_string(string_split_regex(trim(text), '\\s+')[1:4], ' ')) AS fp
      FROM documents
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b, CAST(count(*) AS BIGINT) AS n_shared
      FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, n_shared FROM pairs
    """,
)
def q151(spark, sf_dir):
    """Cross-source duplicate leakage: fingerprints (4-token opening,
    q129's blocking key) appearing in MORE THAN ONE source — the audit
    that catches train/eval contamination when corpora are assembled
    from overlapping crawls. The pair join blocks on the fingerprint
    (inverted-index shape, never corpus-pairwise); distinct-first
    keeps each (source, fp) once regardless of how many docs share
    it."""
    d = t(spark, sf_dir, "documents").select(
        "source",
        F.md5(F.array_join(F.slice(F.split(F.trim("text"), r"\s+"), 1, 4), " ")).alias("fp"),
    ).distinct()
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


# =====================================================================
# q152 — fulfillment lag distribution (fact-to-fact latency)
# =====================================================================


@query(
    "q152_fulfillment_lag",
    """
    WITH lag_days AS (
      SELECT o.o_orderpriority,
             date_diff('day', o.o_orderdate, l.l_shipdate) AS d
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(min(d) AS BIGINT) AS min_days,
           CAST(max(d) AS BIGINT) AS max_days,
           CAST(sum(d) AS BIGINT) AS total_days,
           CAST(round(2 * median(d)) AS BIGINT) AS median_x2_days
    FROM lag_days GROUP BY o_orderpriority
    """,
)
def q152(spark, sf_dir):
    """Order-to-ship latency per priority class: the fact-to-fact lag
    join (lineitem back to its order header) reduced to integer-exact
    distribution stats. The join key is the natural shuffle key both
    tables would be bucketed on at 100 TB; median doubled for the
    even-count interpolation."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_orderdate")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("d"),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.min("d").cast("long").alias("min_days"),
        F.max("d").cast("long").alias("max_days"),
        F.sum("d").cast("long").alias("total_days"),
        F.round(2 * F.expr("percentile(d, 0.5)")).cast("long").alias("median_x2_days"),
    )


# =====================================================================
# q153 — next-event baseline accuracy (Markov argmax eval)
# =====================================================================


@query(
    "q153_next_event_baseline",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    ),
    model AS (
      SELECT event_type, next_type AS predicted
      FROM (SELECT event_type, next_type,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY n DESC, next_type DESC) AS rk
            FROM trans)
      WHERE rk = 1
    )
    SELECT s.event_type,
           m.predicted,
           CAST(count(*) AS BIGINT) AS n_evals,
           CAST(sum(CASE WHEN s.next_type = m.predicted THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
    FROM seq s JOIN model m ON m.event_type = s.event_type
    WHERE s.next_type IS NOT NULL
    GROUP BY s.event_type, m.predicted
    """,
)
def q153(spark, sf_dir):
    """Baseline model evaluation ON the engine: a first-order Markov
    predictor (most frequent next event per current event, ties to the
    lexically larger — identical rank ordering on both engines) scored against the
    actual next events — the train-and-eval loop a pipeline runs to
    sanity-check features. The 5-row model broadcasts back onto the
    sequence scan; one window + two aggregates."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    trans = seq.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wm = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("next_type").desc()
    )
    model = (
        trans.withColumn("rk", F.row_number().over(wm))
        .filter(F.col("rk") == 1)
        .select("event_type", F.col("next_type").alias("predicted"))
    )
    return (
        seq.join(F.broadcast(model), "event_type")
        .groupBy("event_type", "predicted")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_evals"),
            F.sum((F.col("next_type") == F.col("predicted")).cast("long")).cast("long").alias("n_correct"),
        )
    )


# =====================================================================
# q154 — freshness / staleness audit
# =====================================================================


@query(
    "q154_freshness",
    """
    WITH per_type AS (
      SELECT event_type, max(ts) AS latest_ts, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type
    ),
    g AS (SELECT max(latest_ts) AS global_latest FROM per_type)
    SELECT p.event_type, p.latest_ts, p.n,
           CAST((epoch_ms(g.global_latest) - epoch_ms(p.latest_ts)) // 60000 AS BIGINT)
             AS staleness_minutes
    FROM per_type p CROSS JOIN g
    """,
)
def q154(spark, sf_dir):
    """Freshness audit: per stream (event type), the latest observed
    timestamp and its staleness in whole minutes behind the most
    recent data anywhere — the ops telemetry a pipeline alerts on
    before trusting a downstream join. Aggregate-only; the global
    watermark is a 1-row broadcast."""
    ev = t(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.max("ts").alias("latest_ts"), F.count(F.lit(1)).cast("long").alias("n")
    )
    g = per_type.agg(F.max("latest_ts").alias("global_latest"))
    return per_type.crossJoin(F.broadcast(g)).select(
        "event_type",
        "latest_ts",
        "n",
        F.expr(
            "(unix_micros(global_latest) DIV 1000 - unix_micros(latest_ts) DIV 1000) DIV 60000"
        ).cast("long").alias("staleness_minutes"),
    )


# =====================================================================
# q155 — array set algebra (intersect / union / except sizes)
# =====================================================================


@query(
    "q155_array_set_ops",
    """
    WITH sides AS (
      SELECT l_orderkey,
             array_agg(DISTINCT l_partkey % 50) FILTER (l_linenumber % 2 = 1) AS odd_items,
             array_agg(DISTINCT l_partkey % 50) FILTER (l_linenumber % 2 = 0) AS even_items,
             CAST(count(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY l_orderkey HAVING count(*) >= 4
    ),
    filled AS (
      SELECT l_orderkey, n_lines,
             coalesce(odd_items, []) AS odd_items,
             coalesce(even_items, []) AS even_items
      FROM sides
    )
    SELECT l_orderkey, n_lines,
           CAST(len(list_intersect(odd_items, even_items)) AS BIGINT) AS n_common,
           CAST(len(list_distinct(list_concat(odd_items, even_items))) AS BIGINT) AS n_union,
           CAST(len(list_filter(odd_items, x -> NOT list_contains(even_items, x))) AS BIGINT)
             AS n_odd_only
    FROM filled
    """,
)
def q155(spark, sf_dir):
    """Array set algebra: each order's odd-line vs even-line item sets
    compared with intersect/union/except — the JVM array functions
    (array_intersect/array_union/array_except) against DuckDB's list
    algebra. Only SIZES are emitted, so element order inside the
    arrays never reaches the comparator. Single hash-agg shuffle."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_partkey") % 50).alias("item"),
        (F.col("l_linenumber") % 2 == 1).alias("is_odd"),
    )
    sides = li.groupBy("l_orderkey").agg(
        F.array_distinct(
            F.collect_list(F.when(F.col("is_odd"), F.col("item")))
        ).alias("odd_items"),
        F.array_distinct(
            F.collect_list(F.when(~F.col("is_odd"), F.col("item")))
        ).alias("even_items"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    ).filter(F.col("n_lines") >= 4)
    return sides.select(
        "l_orderkey",
        "n_lines",
        F.size(F.array_intersect("odd_items", "even_items")).cast("long").alias("n_common"),
        F.size(F.array_union("odd_items", "even_items")).cast("long").alias("n_union"),
        F.size(F.array_except("odd_items", "even_items")).cast("long").alias("n_odd_only"),
    )


# =====================================================================
# q156 — sliding context-window features (last-3 event n-gram)
# =====================================================================


@query(
    "q156_context_window",
    """
    SELECT event_id, user_id,
           array_to_string(list(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), '>') AS context3
    FROM events
    """,
)
def q156(spark, sf_dir):
    """Sliding context features: each event's trailing 3-event type
    sequence joined into one token ('view>click>purchase') — the
    n-gram-of-actions feature a sequence model trains on. collect_list
    over a bounded ROWS frame preserves frame order on both engines
    (the frame is processed in ORDER BY order), so the joined string
    is deterministic without sorting. One shuffle."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.array_join(F.collect_list("event_type").over(w), ">").alias("context3"),
    )


# =====================================================================
# q157 — pagination (total-order LIMIT/OFFSET)
# =====================================================================


@query(
    "q157_pagination",
    """
    SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey ASC
    LIMIT 10 OFFSET 10
    """,
)
def q157(spark, sf_dir):
    """Pagination: page 2 (rows 11-20) of customers by balance under a
    TOTAL order (unique tiebreak makes every page stable across runs —
    the property OFFSET silently lacks without it). Spark's offset()
    still plans via a global top-(limit+offset) pushdown, not a full
    sort."""
    c = t(spark, sf_dir, "customer")
    return (
        c.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .offset(10)
        .limit(10)
        .select(
            "c_custkey",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_cents"),
        )
    )


# =====================================================================
# q158 — nearest-in-time join (merge_asof direction='nearest')
# =====================================================================


@query(
    "q158_nearest_join",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    v AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'),
    back AS (
      SELECT p.event_id,
             (SELECT max(v.ts) FROM v
               WHERE v.user_id = p.user_id AND v.ts <= p.ts) AS b_ts
      FROM p
    ),
    fwd AS (
      SELECT p.event_id,
             (SELECT min(v.ts) FROM v
               WHERE v.user_id = p.user_id AND v.ts >= p.ts) AS f_ts
      FROM p
    )
    SELECT p.event_id, p.user_id,
           CASE
             WHEN back.b_ts IS NULL THEN fwd.f_ts
             WHEN fwd.f_ts IS NULL THEN back.b_ts
             WHEN epoch_ms(p.ts) - epoch_ms(back.b_ts)
                  <= epoch_ms(fwd.f_ts) - epoch_ms(p.ts) THEN back.b_ts
             ELSE fwd.f_ts
           END AS nearest_view_ts
    FROM p JOIN back ON back.event_id = p.event_id
           JOIN fwd ON fwd.event_id = p.event_id
    """,
)
def q158(spark, sf_dir):
    """Nearest-event join (pandas merge_asof direction='nearest'): each
    purchase matched to the CLOSEST view in time, backward or forward,
    ties to the earlier side. Spark runs the single-shuffle
    union-window trick twice (backward last + forward first over one
    user partitioning) and picks the smaller absolute gap — no range
    join, no correlated subquery per row (that's the oracle's job)."""
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts")
    )
    tagged = p.select(
        "event_id", "user_id", "ts", F.col("ts").alias("evt_ts"), F.lit(1).alias("is_p"),
        F.lit(None).cast("timestamp").alias("v_ts"),
    ).unionByName(
        v.select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            F.col("v_ts").alias("ts"),
            F.col("v_ts").alias("evt_ts"),
            F.lit(0).alias("is_p"),
            "v_ts",
        )
    )
    # backward: last view at-or-before; views sort before purchases on ties
    wb = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_p").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward: first view at-or-after; views sort after purchases on ties
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_p").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    enriched = tagged.withColumn("b_ts", F.last("v_ts", ignorenulls=True).over(wb)).withColumn(
        "f_ts", F.first("v_ts", ignorenulls=True).over(wf)
    )
    out = enriched.filter(F.col("is_p") == 1)
    b_gap = F.expr("unix_micros(ts) - unix_micros(b_ts)")
    f_gap = F.expr("unix_micros(f_ts) - unix_micros(ts)")
    return out.select(
        "event_id",
        "user_id",
        F.when(F.col("b_ts").isNull(), F.col("f_ts"))
        .when(F.col("f_ts").isNull(), F.col("b_ts"))
        .when(b_gap <= f_gap, F.col("b_ts"))
        .otherwise(F.col("f_ts"))
        .alias("nearest_view_ts"),
    )
