"""Scale-pattern battery (q159+): runtime Bloom-filter join pruning,
distribution-diversity audits, exponential-decay feature engineering,
exact integer trend regression, and late/out-of-order data audits.

Every query is oracle-paired and integer-deterministic (repo rules,
queries.py docstring): the Bloom filter reuses the cross-engine md5
hash family from operators/det_hash.py so BOTH engines build the
bit-identical bitmap; slopes and decayed sums are exact bigints.
"""
from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .operators.det_hash import md5_long
from .queries import query, t

# =====================================================================
# q159 — runtime Bloom-filter join pruning (deterministic, replayable)
# =====================================================================

_BLOOM_BITS = 1024  # 16 x 64-bit words


@query(
    "q159_bloom_prune",
    f"""
    WITH dim AS (
      SELECT c_custkey FROM customer WHERE c_acctbal > 9900
    ),
    bloom AS (
      SELECT (CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT) % {_BLOOM_BITS}) // 64 AS w,
             bit_or(CAST(1 AS BIGINT) << CAST((CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT) % {_BLOOM_BITS}) % 64 AS INT)) AS mask
      FROM dim GROUP BY 1
    ),
    probe AS (
      SELECT o.o_orderpriority, o.o_custkey,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
             (CAST('0x' || substr(md5(CAST(o.o_custkey AS VARCHAR)), 1, 15) AS BIGINT) % {_BLOOM_BITS}) AS p
      FROM orders o
    ),
    cand AS (
      SELECT pr.o_orderpriority, pr.o_custkey, pr.cents
      FROM probe pr JOIN bloom b ON pr.p // 64 = b.w
      WHERE (b.mask >> CAST(pr.p % 64 AS INT)) & 1 = 1
    )
    SELECT c.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(count(d.c_custkey) AS BIGINT) AS n_matched,
           CAST(coalesce(sum(CASE WHEN d.c_custkey IS NOT NULL THEN c.cents END), 0) AS BIGINT)
             AS matched_cents
    FROM cand c LEFT JOIN dim d ON c.o_custkey = d.c_custkey
    GROUP BY 1
    """,
)
def q159(spark, sf_dir):
    """Runtime-filter pattern: build a 1024-bit Bloom filter over a
    small dimension key set (high-balance customers), probe the fact
    scan with it BEFORE the join, then resolve exactly. At 100 TB this
    is the semi-join pushdown that keeps a selective dim join from
    shuffling the full fact table: the bitmap is a 16-row broadcast,
    the probe is map-side bit math, and only bloom survivors reach the
    exact join. Spark's own bloom runtime filters aren't SQL-exposed
    (might_contain is internal), so the filter is built from the
    cross-engine md5 hash family (operators/det_hash.py) — the DuckDB
    oracle replays the identical bitmap, so n_candidates (bloom hits,
    including false positives) is hash-checked too, not just the exact
    end result. Bloom has no false negatives: n_matched/matched_cents
    equal the plain join's by construction."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    dim = cust.filter(F.col("c_acctbal") > 9900).select("c_custkey")
    p_dim = md5_long(F.col("c_custkey").cast("string")) % F.lit(_BLOOM_BITS)
    bloom = (
        dim.select(p_dim.alias("p"))
        .select(
            F.expr("p DIV 64").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("bitval"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bitval)").alias("mask"))
    )
    p_fact = md5_long(F.col("o_custkey").cast("string")) % F.lit(_BLOOM_BITS)
    probe = orders.select(
        "o_orderpriority",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        p_fact.alias("p"),
    )
    cand = (
        probe.join(F.broadcast(bloom), F.expr("p DIV 64") == F.col("w"))
        .filter(F.expr("(shiftright(mask, CAST(p % 64 AS INT)) & 1) = 1"))
        .select("o_orderpriority", "o_custkey", "cents")
    )
    marked = cand.join(
        F.broadcast(dim.withColumn("__hit", F.lit(1))),
        cand["o_custkey"] == dim["c_custkey"],
        "left",
    )
    return marked.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.count("__hit").cast("long").alias("n_matched"),
        F.coalesce(F.sum(F.when(F.col("__hit") == 1, F.col("cents"))), F.lit(0))
        .cast("long")
        .alias("matched_cents"),
    )


# =====================================================================
# q160 — Simpson diversity / concentration audit per document source
# =====================================================================


@query(
    "q160_source_diversity",
    """
    WITH c AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY source, lang
    )
    SELECT source,
           CAST(sum(n) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_langs,
           CAST(sum(n * n) AS BIGINT) AS simpson_num,
           CAST(sum(n) * sum(n) AS BIGINT) AS simpson_den,
           min(CASE WHEN rk = 1 THEN lang END) AS top_lang,
           CAST(min(CASE WHEN rk = 1 THEN n END) AS BIGINT) AS top_lang_n
    FROM (
      SELECT *, row_number() OVER (PARTITION BY source ORDER BY n DESC, lang ASC) AS rk
      FROM c
    )
    GROUP BY source
    """,
)
def q160(spark, sf_dir):
    """Language-diversity audit per corpus source: Simpson index as an
    exact rational (sum n_i^2 over N^2 — the probability two random
    docs share a language), language count, and the dominant language
    with its count. The float-free counterpart of entropy dashboards: a
    training-mix monitor alerts when one source collapses to a single
    language. Two hash aggregations, shuffle keyed on (source, lang)
    then source — no skew risk beyond the source cardinality itself."""
    docs = t(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("source").orderBy(F.col("n").desc(), F.col("lang").asc())
    ranked = c.withColumn("rk", F.row_number().over(w))
    return ranked.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("simpson_num"),
        (F.sum("n") * F.sum("n")).cast("long").alias("simpson_den"),
        F.min(F.when(F.col("rk") == 1, F.col("lang"))).alias("top_lang"),
        F.min(F.when(F.col("rk") == 1, F.col("n"))).cast("long").alias("top_lang_n"),
    )


# =====================================================================
# q161 — exponential-decay recency features (exact powers of two)
# =====================================================================


@query(
    "q161_decay_features",
    """
    WITH p AS (
      SELECT user_id, ts, event_id, CAST(round(value * 100) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_used,
           CAST(sum(cents * (CAST(1 AS BIGINT) << CAST(8 - rn AS INT))) AS BIGINT)
             AS decay_num,
           CAST(255 AS BIGINT) AS decay_den,
           max(ts) AS latest_purchase_ts
    FROM p WHERE rn <= 8
    GROUP BY user_id
    """,
)
def q161(spark, sf_dir):
    """Recency-weighted spend feature: each user's last 8 purchases,
    weighted by halving powers (newest x128 ... 8th x1), emitted as an
    exact rational (num / 255) instead of an IEEE EWMA — the standard
    'decayed activity' feature of churn/LTV models, computable in one
    window + one aggregation with no per-user state. The window is
    bounded (rn <= 8) so the shuffle carries at most 8 rows per user
    regardless of history length — the property that keeps the feature
    join viable when one user has millions of events."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "ts",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 8)
    )
    weighted = p.withColumn(
        "wcents", F.expr("cents * shiftleft(CAST(1 AS BIGINT), CAST(8 - rn AS INT))")
    )
    return weighted.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_used"),
        F.sum("wcents").cast("long").alias("decay_num"),
        F.lit(255).cast("long").alias("decay_den"),
        F.max("ts").alias("latest_purchase_ts"),
    )


# =====================================================================
# q162 — per-stream trend slope (exact integer least squares)
# =====================================================================


@query(
    "q162_trend_slope",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) AS slope_num,
           CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS slope_den,
           CASE WHEN count(*) * sum(x * y) - sum(x) * sum(y) > 0 THEN 'up'
                WHEN count(*) * sum(x * y) - sum(x) * sum(y) < 0 THEN 'down'
                ELSE 'flat' END AS trend
    FROM daily GROUP BY event_type
    """,
)
def q162(spark, sf_dir):
    """Is each event stream growing or shrinking? Ordinary least
    squares slope of daily event counts vs epoch-day, kept as the exact
    integer rational (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) — translation-
    invariant, so no min-day recentring pass is needed and the whole
    query is two hash aggregations. The drift detector a pipeline runs
    per source before retraining; slope sign is bit-identical across
    engines because no division ever happens."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).cast("long").alias("x"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    n = F.count(F.lit(1))
    num = (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y")).cast("long")
    den = (n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")).cast("long")
    return daily.groupBy("event_type").agg(
        n.cast("long").alias("n_days"),
        num.alias("slope_num"),
        den.alias("slope_den"),
        F.when(num > 0, F.lit("up")).when(num < 0, F.lit("down")).otherwise(F.lit("flat")).alias("trend"),
    )


# =====================================================================
# q163 — late / out-of-order data audit
# =====================================================================


@query(
    "q163_late_data_audit",
    """
    WITH o AS (
      SELECT event_type, ts,
             max(ts) OVER (PARTITION BY event_type ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS seen_max
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN ts < seen_max THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(coalesce(max(CASE WHEN ts < seen_max
                 THEN epoch_ms(seen_max) - epoch_ms(ts) END), 0) AS BIGINT) AS max_late_ms
    FROM o GROUP BY event_type
    """,
)
def q163(spark, sf_dir):
    """Out-of-orderness audit per stream: treating event_id as arrival
    order, how many events carry a timestamp older than the running
    maximum already seen, and by how much at worst. This is the number
    a streaming pipeline uses to SIZE ITS WATERMARK (streams.py uses
    10-minute delays; this query is how you'd justify one from data).
    One window per event_type + one aggregation; the running max is a
    rows-frame prefix scan, no self-join."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    o = ev.select("event_type", "ts", F.max("ts").over(w).alias("seen_max"))
    late_ms = F.expr("unix_micros(seen_max) DIV 1000 - unix_micros(ts) DIV 1000")
    return o.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(F.when(F.col("ts") < F.col("seen_max"), 1).otherwise(0))
        .cast("long")
        .alias("n_late"),
        F.coalesce(F.max(F.when(F.col("ts") < F.col("seen_max"), late_ms)), F.lit(0))
        .cast("long")
        .alias("max_late_ms"),
    )
