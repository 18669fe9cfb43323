"""Scale-pattern battery (q159-q176): runtime Bloom-filter join
pruning, distribution-diversity audits, exponential-decay features,
exact integer trend regression, late/out-of-order data audits,
mergeable-bitmap distinct (single- and multi-grain via GROUPING SETS),
triangle counting on a support-sparsified graph, shingle novelty,
label-margin mislabel detection, multi-touch attribution, ABC
classification, rank normalization, burstiness, join-explosion and
partition-layout pre-flight advisors, dup-cluster histograms, and
snapshot data-diff.

Every query is oracle-paired and integer-deterministic (repo rules,
queries.py docstring): the Bloom filter reuses the cross-engine md5
hash family from operators/det_hash.py so BOTH engines build the
bit-identical bitmap; slopes and decayed sums are exact bigints.
"""
from __future__ import annotations

import pandas as pd  # module-scope: pandas_udf resolves 'pd.Series' hints here
from pyspark.sql import Window
from pyspark.sql import functions as F

from .operators import det_hash as det_ops
from .operators import similarity as sim_ops
from .operators import windows as win_ops
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
      SELECT (CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT) % {_BLOOM_BITS}) // 63 AS w,
             bit_or(CAST(1 AS BIGINT) << CAST((CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT) % {_BLOOM_BITS}) % 63 AS INT)) AS mask
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
      FROM probe pr JOIN bloom b ON pr.p // 63 = b.w
      WHERE (b.mask >> CAST(pr.p % 63 AS INT)) & 1 = 1
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
    shuffling the full fact table: the bitmap is a 17-row broadcast (63-bit words: DuckDB rejects signed 1<<63, the q164 convention),
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
            F.expr("p DIV 63").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))").alias("bitval"),
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
        probe.join(F.broadcast(bloom), F.expr("p DIV 63") == F.col("w"))
        .filter(F.expr("(shiftright(mask, CAST(p % 63 AS INT)) & 1) = 1"))
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


# =====================================================================
# q164 — exact distinct via bitmaps (mergeable, rolling 7-day window)
# =====================================================================


@query(
    "q164_bitmap_distinct",
    """
    WITH daily AS (
      SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
             user_id // 63 AS bucket,
             bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT)) AS m
      FROM events GROUP BY 1, 2
    ),
    rolled AS (
      SELECT x, bucket, m,
             bit_or(m) OVER (PARTITION BY bucket ORDER BY x
                             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS m7
      FROM daily
    )
    SELECT strftime(DATE '1970-01-01' + to_days(CAST(x AS INT)), '%Y-%m-%d') AS day,
           CAST(sum(bit_count(m)) AS BIGINT) AS n_active,
           CAST(sum(bit_count(m7)) AS BIGINT) AS n_active_7d
    FROM rolled GROUP BY x
    """,
)
def q164(spark, sf_dir):
    """Exact distinct-user counts as MERGEABLE bitmaps: users land in
    63-bit words keyed by user_id DIV 63 (bit 63 stays clear: DuckDB
    rejects signed 1<<63, and cross-engine parity beats one wasted
    bit), each day's activity is a
    bit_or aggregate, and daily distinct = sum of popcounts. Because
    bitmaps merge by OR (unlike counts, which can't be added), the
    trailing-7-day active-user number — the metric COUNT(DISTINCT)
    OVER a range frame cannot express — is just a windowed bit_or of
    the daily words. This is the roaring-bitmap pattern OLAP stores
    use for exact distinct at scale: state is O(id-space/63) per
    grain, re-aggregable to any coarser window without rescanning
    events. One shuffle on (day, bucket), one bounded window per
    bucket, then a per-day sum."""
    ev = t(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).cast("long").alias("x"),
            F.expr("user_id DIV 63").alias("bucket"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))").alias("bit"),
        )
        .groupBy("x", "bucket")
        .agg(F.expr("bit_or(bit)").alias("m"))
    )
    w = Window.partitionBy("bucket").orderBy("x").rangeBetween(-6, 0)
    rolled = daily.withColumn("m7", F.expr("bit_or(m)").over(w))
    return rolled.groupBy("x").agg(
        F.sum(F.bit_count("m")).cast("long").alias("n_active"),
        F.sum(F.bit_count("m7")).cast("long").alias("n_active_7d"),
    ).select(
        F.date_format(F.expr("date_add(DATE '1970-01-01', CAST(x AS INT))"), "yyyy-MM-dd").alias("day"),
        "n_active",
        "n_active_7d",
    )


# =====================================================================
# q165 — triangle count / global clustering coefficient
# =====================================================================


@query(
    "q165_triangle_count",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    deg AS (
      SELECT u AS node, count(*) AS d FROM (
        SELECT u FROM e UNION ALL SELECT v FROM e
      ) t(u) GROUP BY u
    ),
    tri AS (
      SELECT count(*) AS n_tri
      FROM e e1 JOIN e e2 ON e2.u = e1.v JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT n_tri FROM tri) AS BIGINT) AS n_triangles,
           CAST((SELECT sum(d * (d - 1) / 2) FROM deg) AS BIGINT) AS n_wedges
    """,
)
def q165(spark, sf_dir):
    """Triangle counting on the part co-purchase graph (parts linked
    when co-ordered in >= 2 distinct orders): triangles + wedge count
    give the global clustering coefficient 3*tri/wedges — the graph-
    shape diagnostic for entity-resolution graphs (a dedup cluster
    with high transitivity is a true clique; low transitivity means
    chaining). Pair generation is order-blocked (bounded fan-out per
    order, the market-basket shape of q139), and the support >= 2
    threshold is the sparsifier: the raw co-order pairs grow linearly
    with orders (1.2M at sf0.1) but the supported edge set stays ~3.5k
    — the same measured-at-10x argument SCALE.md makes for max_df in
    dedup. The triangle join is the standard edge-ordered (u < v)
    two-hop equi-join — each triangle counted exactly once, shuffles
    keyed on node ids, never all-pairs. (A first cut used the
    part->supplier co-supply projection; measured at sf0.1 it is
    near-complete — avg 30 suppliers/part, 8.7M pairs — so the graph
    choice, not the join strategy, is what keeps this scalable.)"""
    li = t(spark, sf_dir, "lineitem")
    lo = li.select("l_orderkey", "l_partkey").distinct()
    a, b = lo.alias("a"), lo.alias("b")
    e = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey")) & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= 2)
        .select("u", "v")
        # The ~3.5k-row supported-edge set feeds FIVE consumers (deg,
        # e1/e2/e3, n_edges). Round 2 relied on ReusedExchange to
        # dedupe the repeated subtree, but canonicalization proved
        # fragile (r3 bench regressed 1.1s -> 2.4-3.0s when the reuse
        # didn't fire). localCheckpoint materializes the tiny edge set
        # once and truncates lineage — every consumer reads the cached
        # blocks, no plan-identity gamble (same pattern as q255's
        # selection passes; VERDICT r3 item 3). Cost: O(edges) memory,
        # bounded by the support sparsifier at any sf.
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(e3, (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")))
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges"),
    )
    n_edges = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (
        stats.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            F.col("n_tri").cast("long").alias("n_triangles"),
            "n_wedges",
        )
    )


# =====================================================================
# q166 — shingle novelty scoring (marginal new content per document)
# =====================================================================


@query(
    "q166_shingle_novelty",
    """
    WITH toks AS (
      SELECT doc_id AS id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), sh AS (
      SELECT DISTINCT id, array_to_string(w[CAST(i AS BIGINT):CAST(i+2 AS BIGINT)], ' ') AS sh
      FROM toks, unnest(range(1, greatest(len(w) - 1, 1))) AS u(i)
      WHERE len(w) >= 3
    ),
    firsts AS (SELECT sh, min(id) AS first_id FROM sh GROUP BY sh)
    SELECT s.id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN f.first_id = s.id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           CAST(1000 * sum(CASE WHEN f.first_id = s.id THEN 1 ELSE 0 END) // count(*) AS BIGINT)
             AS novelty_permille
    FROM sh s JOIN firsts f ON f.sh = s.sh
    GROUP BY s.id
    """,
)
def q166(spark, sf_dir):
    """Novelty scoring for corpus curation: what fraction of each
    document's 3-word shingles has never appeared in any LOWER-id
    document? Deduplication asks 'is this a copy'; novelty asks 'how
    much marginal content does this add' — the greedy-selection score
    data-mixing pipelines use when packing a token budget. min(id) per
    shingle is one hash aggregate over the exploded shingles (same
    inverted-index dataflow as dedup.py — shuffle on the shingle, then
    on doc_id), so novelty rides the exact pipeline the dedup ops
    already paid for."""
    from .operators.det_hash import distinct_shingles

    docs = t(spark, sf_dir, "documents")
    sh = distinct_shingles(docs, "doc_id", "text", 3)
    firsts = sh.groupBy("sh").agg(F.min("id").alias("first_id"))
    joined = sh.join(firsts, "sh")
    return joined.groupBy(F.col("id").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.sum(F.when(F.col("first_id") == F.col("id"), 1).otherwise(0)).cast("long").alias("n_novel"),
        F.expr(
            "CAST(1000 * sum(CASE WHEN first_id = id THEN 1 ELSE 0 END) DIV count(*) AS BIGINT)"
        ).alias("novelty_permille"),
    )


# =====================================================================
# q167 — label-quality audit via centroid margins (mislabel detection)
# =====================================================================


@query(
    "q167_label_margin",
    """
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000000, 0) AS BIGINT)) AS ei
      FROM embeddings
    ),
    ep AS (
      SELECT vec_id, label, CAST(i AS INT) AS d, ei[CAST(i AS INT)] AS v
      FROM e, unnest(range(1, 65)) AS u(i)
    ),
    cent AS (
      SELECT label AS clabel, d,
             CAST((sum(v) - ((sum(v) % count(*) + count(*)) % count(*))) // count(*) AS BIGINT) AS c
      FROM ep GROUP BY label, d
    ),
    dist AS (
      SELECT ep.vec_id, ep.label, cent.clabel,
             sum((ep.v - cent.c) * (ep.v - cent.c)) AS dist
      FROM ep JOIN cent ON ep.d = cent.d
      GROUP BY 1, 2, 3
    ),
    own AS (SELECT vec_id, label, dist AS d_own FROM dist WHERE label = clabel),
    other AS (
      SELECT vec_id, min(dist) AS d_other FROM dist WHERE label <> clabel GROUP BY vec_id
    )
    SELECT o.label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN t.d_other < o.d_own THEN 1 ELSE 0 END) AS BIGINT) AS n_suspect,
           CAST(sum(t.d_other - o.d_own) AS BIGINT) AS sum_margin
    FROM own o JOIN other t ON t.vec_id = o.vec_id
    GROUP BY o.label
    """,
)
def q167(spark, sf_dir):
    """Label-quality audit: for every embedding, squared-L2 distance
    (in exact integer micro-units) to its OWN label centroid vs the
    nearest OTHER label centroid; a vector closer to a foreign
    centroid (negative margin) is a mislabel suspect — the standard
    confident-learning screen run before training on labeled data.
    Everything is integer-exact (micro-quantization + TRUE bigint
    floor-mean centroids via (sum - pmod) DIV n on both engines — no
    double rounding at any magnitude), so the oracle replays the
    audit bit-for-bit. Shape: one explode over dims, one
    centroid aggregate (10 labels x 64 dims — a broadcast), one
    per-(vector,label) distance aggregate — linear scans, shuffles on
    vec_id, never pairwise between vectors."""
    from .operators.det_hash import quantized_embedding

    emb = t(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", "label", quantized_embedding("embedding").alias("ei"))
    ep = e.select("vec_id", "label", F.posexplode("ei").alias("d", "v"))
    # no persist: both consumers sit in one plan (scan re-read is cheap;
    # nothing pinned for the session)
    # exact bigint floor division (sum - pmod(sum, n)) DIV n: both
    # engines' integer division truncates toward zero, so subtracting
    # the non-negative pmod makes the quotient an exact floor at ANY
    # |sum| — no double rounding even past 2^53
    cent = ep.groupBy(F.col("label").alias("clabel"), "d").agg(
        F.expr("CAST((sum(v) - pmod(sum(v), count(*))) DIV count(*) AS BIGINT)").alias("c")
    )
    dist = (
        ep.join(F.broadcast(cent), "d")
        .groupBy("vec_id", "label", "clabel")
        .agg(F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))).alias("dist"))
    )
    own = dist.filter(F.col("label") == F.col("clabel")).select(
        "vec_id", "label", F.col("dist").alias("d_own")
    )
    other = (
        dist.filter(F.col("label") != F.col("clabel"))
        .groupBy("vec_id")
        .agg(F.min("dist").alias("d_other"))
    )
    j = own.join(other, "vec_id")
    return j.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum(F.when(F.col("d_other") < F.col("d_own"), 1).otherwise(0)).cast("long").alias("n_suspect"),
        F.sum(F.col("d_other") - F.col("d_own")).cast("long").alias("sum_margin"),
    )


# =====================================================================
# q168 — linear multi-touch attribution (integer milli-credit)
# =====================================================================


@query(
    "q168_linear_attribution",
    """
    WITH conv AS (
      SELECT event_id AS conv_id, user_id, ts,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT event_id AS touch_id, user_id, ts, event_type
      FROM events WHERE event_type IN ('view', 'click')
    ),
    pairs AS (
      SELECT c.conv_id, c.cents, t.touch_id, t.event_type
      FROM conv c JOIN touch t
        ON t.user_id = c.user_id
       AND t.ts < c.ts
       AND t.ts >= c.ts - INTERVAL 7 DAY
    ),
    credited AS (
      SELECT event_type, touch_id, conv_id,
             cents * 1000 // count(*) OVER (PARTITION BY conv_id) AS millicents
      FROM pairs
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(count(DISTINCT conv_id) AS BIGINT) AS n_conversions,
           CAST(sum(millicents) AS BIGINT) AS credited_millicents
    FROM credited GROUP BY event_type
    """,
)
def q168(spark, sf_dir):
    """Linear multi-touch attribution: every view/click by the same
    user in the 7 days before a purchase shares that purchase's value
    equally. Credit is exact integer milli-cents (cents*1000 DIV
    n_touches — floor division, identical on both engines), so the
    marketing-mix numbers the pipeline reports are bit-stable. The
    pair join is user-blocked with a bounded lookback — at 100 TB
    you'd additionally bucket by (user, week) so the range predicate
    becomes an equi-join on the bucket (the q115 interval pattern);
    per-conversion touch counts come from a window over the already-
    joined pairs, not a second scan."""
    ev = t(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.col("ts").alias("cts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    touch = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("touch_id"),
        "user_id",
        F.col("ts").alias("tts"),
        "event_type",
    )
    pairs = conv.join(touch, "user_id").filter(
        (F.col("tts") < F.col("cts"))
        & (F.col("tts") >= F.col("cts") - F.expr("INTERVAL 7 DAY"))
    )
    w = Window.partitionBy("conv_id")
    credited = pairs.select(
        "event_type",
        "touch_id",
        "conv_id",
        F.expr("cents * 1000").alias("mc"),
        F.count(F.lit(1)).over(w).alias("n"),
    ).withColumn("millicents", F.expr("mc DIV n"))
    return credited.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.countDistinct("conv_id").cast("long").alias("n_conversions"),
        F.sum("millicents").cast("long").alias("credited_millicents"),
    )


# =====================================================================
# q169 — ABC / Pareto classification (exact cumulative-share classes)
# =====================================================================


@query(
    "q169_abc_classification",
    """
    WITH rev AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, cents,
             sum(cents) OVER (ORDER BY cents DESC, l_partkey ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(cents) OVER () AS total
      FROM rev
    ),
    classed AS (
      SELECT *,
             CASE WHEN cum * 100 <= total * 80 THEN 'A'
                  WHEN cum * 100 <= total * 95 THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked
    )
    SELECT abc,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(cents) AS BIGINT) AS class_cents,
           CAST(min(cents) AS BIGINT) AS min_part_cents
    FROM classed GROUP BY abc
    """,
)
def q169(spark, sf_dir):
    """ABC / Pareto analysis: parts ranked by revenue, classed A while
    the running total stays within 80% of global revenue, B to 95%,
    C after — the inventory-prioritization primitive, with every
    boundary decision on exact integer cents (cum*100 <= total*80, no
    percentage floats). One aggregation to part grain, then the
    running sum via the two-pass range-partitioned prefix sum
    (operators/windows.global_prefix_sum: per-range subtotals
    broadcast back as offsets), and the grand total as a broadcast
    scalar — no single-partition window at any part cardinality
    (plan-gated)."""
    li = t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast("long").alias("cents")
    )
    total = rev.agg(F.sum("cents").cast("long").alias("total"))
    classed = win_ops.global_prefix_sum(
        rev, "cents", False,
        [F.col("cents").desc(), F.col("l_partkey").asc()], "cents", out_col="cum",
    ).crossJoin(F.broadcast(total)).withColumn(
        "abc",
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C"),
    )
    return classed.groupBy("abc").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("cents").cast("long").alias("class_cents"),
        F.min("cents").cast("long").alias("min_part_cents"),
    )


# =====================================================================
# q170 — quantile (rank) normalization of vector norms per label
# =====================================================================


@query(
    "q170_quantile_normalize",
    """
    WITH e AS (
      SELECT vec_id, label,
             list_sum(list_transform(embedding::DOUBLE[],
                      x -> CAST(round(x * 1000000, 0) AS BIGINT)
                           * CAST(round(x * 1000000, 0) AS BIGINT))) AS norm_sq
      FROM embeddings
    )
    SELECT vec_id, label, CAST(norm_sq AS BIGINT) AS norm_sq,
           CAST(rank() OVER (PARTITION BY label ORDER BY norm_sq, vec_id) AS BIGINT) AS rnk,
           CAST(count(*) OVER (PARTITION BY label) AS BIGINT) AS n_label
    FROM e
    """,
)
def q170(spark, sf_dir):
    """Rank/quantile normalization: each vector's squared norm (exact
    integer micro-units) mapped to its within-label rank out of
    n_label — the distribution-free feature transform (rank / n is the
    empirical CDF value) ML prep uses when magnitudes across labels
    aren't comparable. One explode-free aggregate per row (the norm is
    a higher-order sum over the array — per-row map-side work) and one
    window per label. Ties carry a vec_id tiebreak so the rank is
    deterministic on both engines."""
    emb = t(spark, sf_dir, "embeddings")
    from .operators.det_hash import quantized_embedding

    e = emb.select(
        "vec_id",
        "label",
        F.aggregate(
            F.zip_with(quantized_embedding("embedding"), quantized_embedding("embedding"), lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("norm_sq"),
    )
    w = Window.partitionBy("label").orderBy("norm_sq", "vec_id")
    wn = Window.partitionBy("label")
    return e.select(
        "vec_id",
        "label",
        F.col("norm_sq").cast("long").alias("norm_sq"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n_label"),
    )


# =====================================================================
# q171 — burstiness / overdispersion audit (exact Fano pieces)
# =====================================================================


@query(
    "q171_burstiness",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(y) AS BIGINT) AS n_events,
           CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS BIGINT) AS var_num,
           CAST(count(*) * sum(y) AS BIGINT) AS var_den_times_mean,
           CASE WHEN count(*) * sum(y * y) - sum(y) * sum(y) > count(*) * sum(y)
                THEN 'bursty' ELSE 'regular' END AS dispersion
    FROM daily GROUP BY event_type
    """,
)
def q171(spark, sf_dir):
    """Burstiness audit per stream: the Fano factor (variance over
    mean of daily counts) kept as exact integer pieces — n*Σy²-( Σy)²
    vs n*Σy, so 'variance > mean' (overdispersion, bursty arrivals vs
    Poisson-like) is an integer comparison both engines decide
    identically. Bursty streams need different watermark and
    partition-sizing choices than regular ones (cf. q163's lateness
    audit); this is the classifier that routes them. Two hash
    aggregations, nothing else."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    n = F.count(F.lit(1))
    var_num = (n * F.sum(F.col("y") * F.col("y")) - F.sum("y") * F.sum("y")).cast("long")
    var_den = (n * F.sum("y")).cast("long")
    return daily.groupBy("event_type").agg(
        n.cast("long").alias("n_days"),
        F.sum("y").cast("long").alias("n_events"),
        var_num.alias("var_num"),
        var_den.alias("var_den_times_mean"),
        F.when(var_num > var_den, "bursty").otherwise("regular").alias("dispersion"),
    )


# =====================================================================
# q172 — join-explosion pre-flight audit (fan-out estimation)
# =====================================================================


@query(
    "q172_join_explosion_audit",
    """
    WITH lf AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS n_l FROM lineitem GROUP BY 1),
    rf AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS n_r FROM orders GROUP BY 1),
    prof AS (
      SELECT coalesce(lf.k, rf.k) AS k,
             coalesce(n_l, 0) AS n_l, coalesce(n_r, 0) AS n_r,
             coalesce(n_l, 0) * coalesce(n_r, 0) AS est_pairs
      FROM lf FULL OUTER JOIN rf ON lf.k = rf.k
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN n_l > 0 AND n_r > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_matching_keys,
           CAST(sum(CASE WHEN n_l = 0 OR n_r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dangling_keys,
           CAST(sum(est_pairs) AS BIGINT) AS est_join_rows,
           CAST(max(est_pairs) AS BIGINT) AS max_key_pairs,
           CAST(max(n_l) AS BIGINT) AS max_left_fanout,
           CAST(max(n_r) AS BIGINT) AS max_right_fanout
    FROM prof
    """,
)
def q172(spark, sf_dir):
    """Join pre-flight: per-key fan-out profiles of both join sides,
    combined into the EXACT output cardinality the equi-join would
    produce (sum over keys of n_l*n_r), the hottest key's pair count,
    and dangling-key counts — the estimate you run BEFORE a 100 TB
    join to decide broadcast vs shuffle vs salt (complements q124's
    single-side skew profile with the pair-count view; AQE reacts at
    runtime, this predicts from two cheap aggregates). Each side
    reduces to (key, count) before the profile join, so the audit
    never materializes the join it is predicting."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    lf = li.groupBy(F.col("l_orderkey").alias("k")).agg(F.count(F.lit(1)).cast("long").alias("n_l"))
    rf = o.groupBy(F.col("o_orderkey").alias("k")).agg(F.count(F.lit(1)).cast("long").alias("n_r"))
    prof = (
        lf.join(rf, "k", "full_outer")
        .select(
            F.coalesce(F.col("n_l"), F.lit(0)).alias("n_l"),
            F.coalesce(F.col("n_r"), F.lit(0)).alias("n_r"),
        )
        .withColumn("est_pairs", F.col("n_l") * F.col("n_r"))
    )
    return prof.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(F.when((F.col("n_l") > 0) & (F.col("n_r") > 0), 1).otherwise(0)).cast("long").alias("n_matching_keys"),
        F.sum(F.when((F.col("n_l") == 0) | (F.col("n_r") == 0), 1).otherwise(0)).cast("long").alias("n_dangling_keys"),
        F.sum("est_pairs").cast("long").alias("est_join_rows"),
        F.max("est_pairs").cast("long").alias("max_key_pairs"),
        F.max("n_l").cast("long").alias("max_left_fanout"),
        F.max("n_r").cast("long").alias("max_right_fanout"),
    )


# =====================================================================
# q173 — duplicate-cluster-size histogram (dataset-health summary)
# =====================================================================


@query(
    "q173_dup_cluster_histogram",
    """
    WITH fp AS (
      SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS f,
             CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY 1
    )
    SELECT CASE WHEN n = 1 THEN '1_unique'
                WHEN n = 2 THEN '2_pair'
                WHEN n <= 5 THEN '3_small'
                ELSE '4_large' END AS cluster_bucket,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(n) AS BIGINT) AS n_docs,
           CAST(sum(n - 1) AS BIGINT) AS n_removable
    FROM fp GROUP BY 1
    """,
)
def q173(spark, sf_dir):
    """Dataset-health histogram of exact-duplicate cluster sizes: how
    many fingerprints are unique / pairs / small / large clusters, the
    docs they hold, and n_removable = docs dedup would delete — the
    one-screen summary a curation run reports before and after (q33
    lists the winners; this is its rollup). Two hash aggregations on
    the md5 fingerprint; the second runs on cluster grain (#distinct
    texts), so the histogram costs no more than exact dedup itself."""
    from .operators.text import fingerprint

    docs = t(spark, sf_dir, "documents")
    fp = fingerprint(docs).groupBy("fingerprint").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    bucket = (
        F.when(F.col("n") == 1, "1_unique")
        .when(F.col("n") == 2, "2_pair")
        .when(F.col("n") <= 5, "3_small")
        .otherwise("4_large")
    )
    return fp.groupBy(bucket.alias("cluster_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.sum("n").cast("long").alias("n_docs"),
        F.sum(F.col("n") - 1).cast("long").alias("n_removable"),
    )


# =====================================================================
# q174 — multi-grain exact distinct in one pass (bitmaps x grouping sets)
# =====================================================================


@query(
    "q174_multigrain_distinct",
    """
    WITH daily AS (
      SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
             event_type,
             user_id // 63 AS bucket,
             bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT)) AS m
      FROM events GROUP BY 1, 2, 3
    ),
    g AS (
      SELECT x, event_type, bucket, bit_or(m) AS mm
      FROM daily
      GROUP BY GROUPING SETS ((x, bucket), (event_type, bucket), (bucket))
    )
    SELECT CASE WHEN x IS NOT NULL THEN 'by_day'
                WHEN event_type IS NOT NULL THEN 'by_type'
                ELSE 'total' END AS grain,
           CASE WHEN x IS NOT NULL THEN strftime(DATE '1970-01-01' + to_days(CAST(x AS INT)), '%Y-%m-%d')
                WHEN event_type IS NOT NULL THEN event_type
                ELSE 'ALL' END AS grain_key,
           CAST(sum(bit_count(mm)) AS BIGINT) AS n_distinct_users
    FROM g GROUP BY 1, 2
    """,
)
def q174(spark, sf_dir):
    """Exact distinct users at THREE grains — per day, per event type,
    and global — from ONE scan of events: the per-(day, type, bucket)
    bitmaps of q164 re-aggregate under GROUPING SETS by OR-ing words,
    then popcount. COUNT(DISTINCT) at k grains costs k expand-shuffles
    of raw rows; mergeable bitmaps pay one base aggregation and re-roll
    O(buckets)-sized state — the cube-of-distincts pattern an activity
    dashboard runs hourly at 100 TB. Uses the DataFrame groupingSets
    API over the bitmap grain, never re-expanding events."""
    ev = t(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).cast("long").alias("x"),
            "event_type",
            F.expr("user_id DIV 63").alias("bucket"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))").alias("bit"),
        )
        .groupBy("x", "event_type", "bucket")
        .agg(F.expr("bit_or(bit)").alias("m"))
    )
    g = daily.groupingSets(
        [["x", "bucket"], ["event_type", "bucket"], ["bucket"]], "x", "event_type", "bucket"
    ).agg(F.expr("bit_or(m)").alias("mm"))
    grain = (
        F.when(F.col("x").isNotNull(), "by_day")
        .when(F.col("event_type").isNotNull(), "by_type")
        .otherwise("total")
    )
    grain_key = (
        F.when(
            F.col("x").isNotNull(),
            F.date_format(F.expr("date_add(DATE '1970-01-01', CAST(x AS INT))"), "yyyy-MM-dd"),
        )
        .when(F.col("event_type").isNotNull(), F.col("event_type"))
        .otherwise(F.lit("ALL"))
    )
    return g.groupBy(grain.alias("grain"), grain_key.alias("grain_key")).agg(
        F.sum(F.bit_count("mm")).cast("long").alias("n_distinct_users")
    )


# =====================================================================
# q175 — partition-layout advisor (cardinality / balance / skew rules)
# =====================================================================


@query(
    "q175_partition_advisor",
    """
    WITH base AS (
      SELECT event_type,
             strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             CAST(user_id % 256 AS VARCHAR) AS ubucket
      FROM events
    ),
    stats AS (
      SELECT 'event_type' AS candidate, count(*) AS n_parts,
             max(n) AS max_rows, min(n) AS min_rows, sum(n) AS total
      FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1)
      UNION ALL
      SELECT 'day', count(*), max(n), min(n), sum(n)
      FROM (SELECT day, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1)
      UNION ALL
      SELECT 'user_bucket', count(*), max(n), min(n), sum(n)
      FROM (SELECT ubucket, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1)
    )
    SELECT candidate,
           CAST(n_parts AS BIGINT) AS n_parts,
           CAST(max_rows AS BIGINT) AS max_rows,
           CAST(min_rows AS BIGINT) AS min_rows,
           CAST(max_rows * n_parts * 1000 // total AS BIGINT) AS skew_permille,
           CASE WHEN n_parts < 4 THEN 'too_few_partitions'
                WHEN n_parts > 10000 THEN 'too_many_partitions'
                WHEN max_rows * n_parts * 1000 // total > 3000 THEN 'skewed'
                ELSE 'ok' END AS verdict
    FROM stats
    """,
)
def q175(spark, sf_dir):
    """Partition-layout advisor: for each candidate partition column
    (low-cardinality type, daily date, hashed user bucket) — partition
    count, largest/smallest partition, and skew as max/mean in
    permille — with an integer-rule verdict (enough partitions for
    parallelism, few enough for the metastore, hottest partition under
    3x mean). This is `Table.init(partition_by=...)` decided FROM DATA
    instead of folklore, the pre-flight for the engine's hive-layout
    writes (node.py partition_by) the same way q172 pre-flights a
    join. One shared projection, three hash aggregations over it."""
    ev = t(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        (F.col("user_id") % 256).cast("string").alias("ubucket"),
    )  # no persist: three cheap aggregates over one column-pruned scan

    def stats(col, label):
        per = base.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("n"))
        return per.agg(
            F.lit(label).alias("candidate"),
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.max("n").cast("long").alias("max_rows"),
            F.min("n").cast("long").alias("min_rows"),
            F.sum("n").cast("long").alias("total"),
        )

    s = (
        stats("event_type", "event_type")
        .unionByName(stats("day", "day"))
        .unionByName(stats("ubucket", "user_bucket"))
    )
    skew = F.expr("max_rows * n_parts * 1000 DIV total")
    return s.select(
        "candidate",
        "n_parts",
        "max_rows",
        "min_rows",
        skew.cast("long").alias("skew_permille"),
        F.when(F.col("n_parts") < 4, "too_few_partitions")
        .when(F.col("n_parts") > 10000, "too_many_partitions")
        .when(skew > 3000, "skewed")
        .otherwise("ok")
        .alias("verdict"),
    )


# =====================================================================
# q176 — snapshot data-diff (added / removed / changed via row hashes)
# =====================================================================


@query(
    "q176_snapshot_diff",
    """
    WITH snap_a AS (
      SELECT o_orderkey, o_orderpriority, o_orderstatus,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 103 <> 0
    ),
    snap_b AS (
      SELECT o_orderkey, o_orderpriority, o_orderstatus,
             CAST(round(o_totalprice * 100) AS BIGINT)
               + CASE WHEN o_orderkey % 13 = 0 THEN 500 ELSE 0 END AS cents
      FROM orders WHERE o_orderkey % 101 <> 0
    ),
    hashed AS (
      SELECT coalesce(a.o_orderkey, b.o_orderkey) AS k,
             coalesce(a.o_orderpriority, b.o_orderpriority) AS prio,
             md5(concat_ws('|', CAST(a.o_orderkey AS VARCHAR), a.o_orderstatus,
                           CAST(a.cents AS VARCHAR))) AS ha,
             md5(concat_ws('|', CAST(b.o_orderkey AS VARCHAR), b.o_orderstatus,
                           CAST(b.cents AS VARCHAR))) AS hb,
             a.o_orderkey IS NULL AS miss_a, b.o_orderkey IS NULL AS miss_b
      FROM snap_a a FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
    )
    SELECT prio AS o_orderpriority,
           CAST(sum(CASE WHEN miss_a THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
           CAST(sum(CASE WHEN miss_b THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           CAST(sum(CASE WHEN NOT miss_a AND NOT miss_b AND ha <> hb THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed,
           CAST(sum(CASE WHEN NOT miss_a AND NOT miss_b AND ha = hb THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unchanged
    FROM hashed GROUP BY prio
    """,
)
def q176(spark, sf_dir):
    """Dataset regression diff: two snapshots of the same keyed table
    (here simulated — one drops every 103rd key, the other drops every
    101st and bumps every 13th price) compared by full-outer join on
    the key and an md5 row hash over the remaining columns — the
    added/removed/changed/unchanged report a pipeline runs when a
    refactored job must produce 'the same table'. The row hash is
    md5(concat_ws) over integer-rendered columns, bit-identical across
    engines (det_hash.py rules), so even the CHANGED classification is
    oracle-checked, not just the counts. One key-partitioned shuffle
    join; hash comparison is map-side. The engine-native counterpart
    over table versions is Table.version_diff (sdk08) — this is the
    pure-SQL form for arbitrary snapshots."""
    o = t(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    snap_a = base.filter(F.col("o_orderkey") % 103 != 0)
    snap_b = base.filter(F.col("o_orderkey") % 101 != 0).withColumn(
        "cents",
        F.col("cents") + F.when(F.col("o_orderkey") % 13 == 0, 500).otherwise(0),
    )

    def rh(side):
        return F.md5(
            F.concat_ws(
                "|",
                F.col(f"{side}.o_orderkey").cast("string"),
                F.col(f"{side}.o_orderstatus"),
                F.col(f"{side}.cents").cast("string"),
            )
        )

    j = snap_a.alias("a").join(
        snap_b.alias("b"), F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer"
    )
    hashed = j.select(
        F.coalesce(F.col("a.o_orderpriority"), F.col("b.o_orderpriority")).alias("prio"),
        F.col("a.o_orderkey").isNull().alias("miss_a"),
        F.col("b.o_orderkey").isNull().alias("miss_b"),
        rh("a").alias("ha"),
        rh("b").alias("hb"),
    )
    return hashed.groupBy(F.col("prio").alias("o_orderpriority")).agg(
        F.sum(F.when(F.col("miss_a"), 1).otherwise(0)).cast("long").alias("n_added"),
        F.sum(F.when(F.col("miss_b"), 1).otherwise(0)).cast("long").alias("n_removed"),
        F.sum(
            F.when(~F.col("miss_a") & ~F.col("miss_b") & (F.col("ha") != F.col("hb")), 1).otherwise(0)
        ).cast("long").alias("n_changed"),
        F.sum(
            F.when(~F.col("miss_a") & ~F.col("miss_b") & (F.col("ha") == F.col("hb")), 1).otherwise(0)
        ).cast("long").alias("n_unchanged"),
    )


# =====================================================================
# q177 — class-balancing resample plan (integer oversampling factors)
# =====================================================================


@query(
    "q177_resample_plan",
    """
    WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
    m AS (SELECT max(n) AS max_n FROM c)
    SELECT c.lang, c.n,
           CAST(m.max_n // c.n AS BIGINT) AS repeat_factor,
           CAST(m.max_n % c.n AS BIGINT) AS n_extra,
           CAST(m.max_n // c.n * c.n + m.max_n % c.n AS BIGINT) AS n_after
    FROM c CROSS JOIN m
    """,
)
def q177(spark, sf_dir):
    """Class-balancing plan for an imbalanced corpus: per language,
    the integer repeat factor and per-class extra-sample count that
    bring every class exactly to the majority count (floor factor +
    remainder — n_after == max_n by construction). This is the PLAN
    table an oversampling pass joins against (repeat via
    explode(sequence(1, repeat_factor)) plus a deterministic-hash
    pick of n_extra docs, the q149 split machinery) — computing it
    first keeps the expensive replication scan single-purpose. One
    aggregation and a 1-row broadcast."""
    docs = t(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n"))
    m = c.agg(F.max("n").alias("max_n"))
    return c.crossJoin(F.broadcast(m)).select(
        "lang",
        "n",
        F.expr("max_n DIV n").cast("long").alias("repeat_factor"),
        (F.col("max_n") % F.col("n")).cast("long").alias("n_extra"),
        F.expr("max_n DIV n * n + max_n % n").cast("long").alias("n_after"),
    )


# =====================================================================
# q178 — minimal k-purchase burst window per user
# =====================================================================


@query(
    "q178_burst_window",
    """
    WITH p AS (
      SELECT user_id, ts,
             lead(ts, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ts3
      FROM events WHERE event_type = 'purchase'
    ),
    spans AS (
      SELECT user_id, epoch_ms(ts3) - epoch_ms(ts) AS span_ms
      FROM p WHERE ts3 IS NOT NULL
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(min(span_ms) AS BIGINT) AS min_span_ms
    FROM spans GROUP BY user_id
    """,
)
def q178(spark, sf_dir):
    """User-level burst detection: the tightest time window containing
    3 consecutive purchases per user (min over lead(ts,2)-ts) — the
    velocity feature fraud and rate-limit rules key on, and the
    min-span variant of q161's recency decay. The k-window reduces to
    ONE ordered lead per user (no self-join over the k-subsets);
    shuffle is the per-user window partition, output one row per user
    with >= 3 purchases."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id")
        .withColumn("ts3", F.lead("ts", 2).over(w))
        .filter(F.col("ts3").isNotNull())
    )
    span = F.expr("unix_micros(ts3) DIV 1000 - unix_micros(ts) DIV 1000")
    return p.select("user_id", span.alias("span_ms")).groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.min("span_ms").cast("long").alias("min_span_ms"),
    )


# =====================================================================
# q179 — Python UDTF (table function) under the oracle gate
# =====================================================================


@query(
    "q179_udtf_sentences",
    r"""
    WITH s AS (
      SELECT doc_id, trim(piece) AS sentence
      FROM documents, unnest(string_split_regex(text, '[.!?]+\s+')) AS u(piece)
      WHERE trim(piece) <> ''
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_sentences,
           CAST(max(len(sentence)) AS BIGINT) AS max_sent_chars,
           CAST(sum(len(sentence)) AS BIGINT) AS total_sent_chars
    FROM s GROUP BY doc_id
    """,
)
def q179(spark, sf_dir):
    """Python UDTF (Spark 4 table function, SURVEY.md §2.8) under the
    DRIVER'S oracle gate, not just pytest: sentence segmentation as a
    LATERAL table function — each doc fans out to N rows, which scalar
    UDFs cannot do — aggregated back to per-doc sentence stats. The
    split rule ('[.!?]+\\s+', RE2-compatible, empty pieces dropped,
    pieces trimmed) is chosen so DuckDB's string_split_regex replays
    it exactly. At scale the UDTF runs per-partition (Arrow-optimized
    when eligible); the aggregate shuffles doc_id grain only."""
    from pyspark.sql.functions import udtf

    class SplitRe2:
        def eval(self, doc_id, text):
            if text is None:
                return
            import re

            # re.ASCII + explicit ASCII strip set: pin to the oracle's
            # RE2 \s and trim() (ASCII-only) so Unicode whitespace in
            # future fixtures can't drift the two engines apart
            for piece in re.split(r"[.!?]+\s+", text, flags=re.ASCII):
                p = piece.strip(" \t\n\r\f\v")
                if p:
                    yield doc_id, p, len(p)

    fn = udtf(SplitRe2, returnType="doc_id bigint, sentence string, n_chars int")
    spark.udtf.register("split_sentences_re2", fn)
    docs = t(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("__q179_docs")
    return spark.sql(
        """
        SELECT s.doc_id,
               CAST(count(*) AS BIGINT) AS n_sentences,
               CAST(max(s.n_chars) AS BIGINT) AS max_sent_chars,
               CAST(sum(s.n_chars) AS BIGINT) AS total_sent_chars
        FROM __q179_docs d, LATERAL split_sentences_re2(d.doc_id, d.text) s
        GROUP BY s.doc_id
        """
    )


# =====================================================================
# q180 — grouped-agg pandas UDAF under the oracle gate
# =====================================================================


@query(
    "q180_udaf_iqr",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           round(quantile_cont(l_quantity, 0.75) - quantile_cont(l_quantity, 0.25), 6) AS iqr_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q180(spark, sf_dir):
    """Custom aggregation (GROUPED_AGG pandas UDF, §2.8) under the
    oracle gate: interquartile range per group, a reduction Spark's
    built-in aggregate set lacks as one function. pandas' linear
    quantile interpolation is definitionally quantile_cont, and
    l_quantity is integral, so the interpolated quartiles land on
    .0/.25/.5/.75 — exactly representable doubles, bit-identical
    across engines. GROUPED_AGG ships each group's column as ONE
    Arrow batch: right for bounded group sizes; the documented
    relaxation at huge groups is approx_percentile."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def iqr(v: pd.Series) -> float:  # Series -> scalar: inferred GROUPED_AGG
        return float(v.quantile(0.75) - v.quantile(0.25))

    li = t(spark, sf_dir, "lineitem")
    # a GROUPED_AGG pandas UDF can't share an agg with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT): run it alone, join the tiny
    # per-group counts after
    iqrs = li.groupBy("l_returnflag").agg(F.round(iqr("l_quantity"), 6).alias("iqr_qty"))
    counts = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return counts.join(iqrs, "l_returnflag").select("l_returnflag", "n", "iqr_qty")


# =====================================================================
# q181 — session-grain conversion by engagement bucket
# =====================================================================


@query(
    "q181_session_conversion",
    """
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, event_type,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM o
    ),
    sess AS (
      SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      FROM s GROUP BY user_id, sid
    )
    SELECT CASE WHEN n_events = 1 THEN '1'
                WHEN n_events <= 4 THEN '2-4'
                WHEN n_events <= 9 THEN '5-9'
                ELSE '10+' END AS engagement_bucket,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           CAST(1000 * sum(converted) // count(*) AS BIGINT) AS conversion_permille
    FROM sess GROUP BY 1
    """,
)
def q181(spark, sf_dir):
    """Conversion at SESSION grain: 30-minute-gap sessionization (the
    q31 machinery), each session flagged converted if it contains a
    purchase, rolled up by engagement bucket — the 'do longer sessions
    convert more' product question, which needs the session as the
    unit of analysis (q87's funnel is user-grain). Per-user windows
    shuffle once on user_id; sessions and buckets are integer-exact,
    conversion as permille floor division. The 100 TB note from q115
    applies: sessionization partitions by user, so no global window
    exists anywhere."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = F.expr("unix_micros(ts) DIV 1000") - F.expr(
        "unix_micros(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) DIV 1000"
    )
    o = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.lag("ts").over(w).isNull() | (gap_ms > 1800000), 1).otherwise(0).alias("is_new"),
    )
    ws = w.rowsBetween(Window.unboundedPreceding, 0)
    s = o.withColumn("sid", F.sum("is_new").over(ws))
    sess = s.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("converted"),
    )
    bucket = (
        F.when(F.col("n_events") == 1, "1")
        .when(F.col("n_events") <= 4, "2-4")
        .when(F.col("n_events") <= 9, "5-9")
        .otherwise("10+")
    )
    return sess.groupBy(bucket.alias("engagement_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("converted").cast("long").alias("n_converted"),
        F.expr("CAST(1000 * sum(converted) DIV count(*) AS BIGINT)").alias("conversion_permille"),
    )


# =====================================================================
# q182 — near-zero-variance feature screen
# =====================================================================


@query(
    "q182_nzv_screen",
    """
    WITH f AS (
      SELECT 'l_quantity' AS feature, CAST(l_quantity * 100 AS BIGINT) AS v FROM lineitem
      UNION ALL SELECT 'l_discount', CAST(round(l_discount * 100) AS BIGINT) FROM lineitem
      UNION ALL SELECT 'l_tax', CAST(round(l_tax * 100) AS BIGINT) FROM lineitem
    ),
    per_val AS (
      SELECT feature, v, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY feature, v
    )
    SELECT feature,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(1000 * max(n) // sum(n) AS BIGINT) AS top_share_permille,
           CAST(1000 * count(*) // sum(n) AS BIGINT) AS distinct_permille,
           CASE WHEN 1000 * max(n) // sum(n) > 950 OR count(*) = 1 THEN 'drop'
                ELSE 'keep' END AS verdict
    FROM per_val GROUP BY feature
    """,
)
def q182(spark, sf_dir):
    """Near-zero-variance screen over candidate numeric features (the
    caret-style preprocessing gate): per feature, distinct-value
    count, the dominant value's share, and a drop/keep verdict when
    one value exceeds 95% — constant-ish columns waste model capacity
    and break scaling. Features are unpivoted into (feature, value)
    rows once (integer cents units), so adding a feature is one UNION
    branch and the screen stays two hash aggregations keyed on
    (feature, value) then feature — never a per-column driver loop."""
    li = t(spark, sf_dir, "lineitem")
    f = (
        li.select(F.lit("l_quantity").alias("feature"), (F.col("l_quantity") * 100).cast("long").alias("v"))
        .unionAll(
            li.select(F.lit("l_discount").alias("feature"), F.round(F.col("l_discount") * 100).cast("long").alias("v"))
        )
        .unionAll(
            li.select(F.lit("l_tax").alias("feature"), F.round(F.col("l_tax") * 100).cast("long").alias("v"))
        )
    )
    per_val = f.groupBy("feature", "v").agg(F.count(F.lit(1)).cast("long").alias("n"))
    top_share = F.expr("1000 * max(n) DIV sum(n)")
    return per_val.groupBy("feature").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum("n").cast("long").alias("n_rows"),
        top_share.cast("long").alias("top_share_permille"),
        F.expr("1000 * count(*) DIV sum(n)").cast("long").alias("distinct_permille"),
        F.when((top_share > 950) | (F.count(F.lit(1)) == 1), "drop").otherwise("keep").alias("verdict"),
    )


# =====================================================================
# q183 — shingle document-frequency spectrum (max_df evidence)
# =====================================================================


@query(
    "q183_shingle_df_spectrum",
    """
    WITH toks AS (
      SELECT doc_id AS id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), sh AS (
      SELECT DISTINCT id, array_to_string(w[CAST(i AS BIGINT):CAST(i+2 AS BIGINT)], ' ') AS sh
      FROM toks, unnest(range(1, greatest(len(w) - 1, 1))) AS u(i)
      WHERE len(w) >= 3
    ),
    dfs AS (SELECT sh, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY sh)
    SELECT CASE WHEN df = 1 THEN '1'
                WHEN df = 2 THEN '2'
                WHEN df <= 5 THEN '3-5'
                WHEN df <= 20 THEN '6-20'
                ELSE '21+' END AS df_bucket,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(df) AS BIGINT) AS n_postings,
           CAST(sum(df * (df - 1) / 2) AS BIGINT) AS n_candidate_pairs
    FROM dfs GROUP BY 1
    """,
)
def q183(spark, sf_dir):
    """Frequency-of-frequencies spectrum of 3-gram shingles: how many
    shingles occur in exactly k documents, their posting counts, and —
    the column that matters — the C(df,2) candidate pairs each bucket
    would inject into the dedup join. This is the EVIDENCE for the
    stop-shingle cap the dedup pipeline hard-codes (max_df=20,
    dedup.py): the 21+ bucket's pair count is the quadratic work the
    cap deletes, and re-running this query is how you'd retune max_df
    on a new corpus (same role Good-Turing counts play for smoothing).
    Rides the distinct-shingle dataflow (one explode + two hash aggs),
    so the audit costs no more than the dedup pass it tunes."""
    from .operators.det_hash import distinct_shingles

    docs = t(spark, sf_dir, "documents")
    sh = distinct_shingles(docs, "doc_id", "text", 3)
    dfs = sh.groupBy("sh").agg(F.count(F.lit(1)).cast("long").alias("df"))
    bucket = (
        F.when(F.col("df") == 1, "1")
        .when(F.col("df") == 2, "2")
        .when(F.col("df") <= 5, "3-5")
        .when(F.col("df") <= 20, "6-20")
        .otherwise("21+")
    )
    return dfs.groupBy(bucket.alias("df_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.sum("df").cast("long").alias("n_postings"),
        F.sum(F.col("df") * (F.col("df") - 1) / 2).cast("long").alias("n_candidate_pairs"),
    )


# =====================================================================
# q184 — zero-filled reporting grid (date spine x dimension complete)
# =====================================================================


@query(
    "q184_zero_fill_grid",
    """
    WITH bounds AS (
      SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events
    ),
    spine AS (
      SELECT (d0 + to_days(CAST(i AS INT))) AS day
      FROM bounds, unnest(range(0, datediff('day', d0, d1) + 1)) AS u(i)
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    actual AS (
      SELECT CAST(ts AS DATE) AS day, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day, t.event_type,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n_events,
           CASE WHEN a.n IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM spine s CROSS JOIN types t
    LEFT JOIN actual a ON a.day = s.day AND a.event_type = t.event_type
    """,
)
def q184(spark, sf_dir):
    """Dimension-complete reporting grid: every (day, event_type) cell
    between the observed date bounds, zero-filled where no events
    landed and flagged as a gap — the shape dashboards and gap-alert
    jobs need (a missing day must APPEAR, which plain GROUP BY can
    never produce). The spine is generated (sequence over the date
    range), the dim set is a DISTINCT scan, and their cross join is
    days x types — small by construction — broadcast-left-joined onto
    the aggregated facts, so the fact table is still touched exactly
    once. Complements q117 (grid + interpolation per series) with the
    categorical zero-fill case."""
    ev = t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.to_date(F.min("ts")).alias("d0"), F.to_date(F.max("ts")).alias("d1")
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    types = ev.select("event_type").distinct()
    actual = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    grid = spine.crossJoin(types)
    return (
        grid.join(F.broadcast(actual), ["day", "event_type"], "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
            F.when(F.col("n").isNull(), 1).otherwise(0).alias("is_gap"),
        )
    )


# =====================================================================
# q185 — order-invariant table checksum (cross-engine fingerprint)
# =====================================================================


@query(
    "q185_table_checksum",
    """
    WITH h AS (
      SELECT o_orderpriority,
             CAST('0x' || substr(md5(concat_ws('|', CAST(o_orderkey AS VARCHAR),
                                              o_orderstatus,
                                              CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR))),
                                 1, 15) AS BIGINT) % 2147483647 AS hv
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(hv) % 2147483647 AS BIGINT) AS checksum,
           CAST(bit_xor(hv) AS BIGINT) AS xor_fold
    FROM h GROUP BY o_orderpriority
    """,
)
def q185(spark, sf_dir):
    """Order-invariant table fingerprint: each row hashed (md5 of its
    canonical string form, folded to 31 bits), combined with two
    commutative reductions — modular sum and XOR — plus the row count.
    Two tables are replicas iff their fingerprints match, with no sort
    and no row shipping: this is the cheap cross-cluster integrity
    check behind replication audits (and the same idea as the
    driver's own value-hash gate). The 31-bit fold keeps the modular
    sum inside int64 up to ~4e9 rows per group; beyond that the
    documented widening is decimal(38) partial sums. One scan, one
    hash aggregation."""
    from .operators.det_hash import md5_long

    o = t(spark, sf_dir, "orders")
    row_str = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
    )
    h = o.select(
        "o_orderpriority", (md5_long(row_str) % F.lit(2147483647)).alias("hv")
    )
    return h.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.sum("hv") % F.lit(2147483647)).cast("long").alias("checksum"),
        F.expr("bit_xor(hv)").cast("long").alias("xor_fold"),
    )


# =====================================================================
# q186 — point-in-time training matrix (leakage-free features + label)
# =====================================================================


@query(
    "q186_training_matrix",
    """
    WITH b AS (SELECT CAST(max(ts) AS DATE) - 7 AS cutoff FROM events),
    feat AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_events_14d,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_purchases_14d,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                   THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT) AS cents_14d
      FROM events, b
      WHERE CAST(ts AS DATE) < b.cutoff AND CAST(ts AS DATE) >= b.cutoff - 14
      GROUP BY user_id
    ),
    lab AS (
      SELECT DISTINCT user_id, 1 AS label
      FROM events, b
      WHERE event_type = 'purchase'
        AND CAST(ts AS DATE) >= b.cutoff AND CAST(ts AS DATE) < b.cutoff + 7
    )
    SELECT f.user_id, f.n_events_14d, f.n_purchases_14d, f.cents_14d,
           CAST(coalesce(l.label, 0) AS BIGINT) AS label
    FROM feat f LEFT JOIN lab l ON l.user_id = f.user_id
    """,
)
def q186(spark, sf_dir):
    """Materialize a leakage-free training matrix: features aggregated
    STRICTLY before a cutoff (14-day activity window), binary label
    from STRICTLY after it (purchase within 7 days) — the
    point-in-time discipline (q148's PIT join, applied) that keeps a
    churn/propensity model from training on its own answer. The
    cutoff derives deterministically from the data (max date - 7), so
    both engines draw identical windows; features and label are each
    one filtered aggregation, joined on user. At 100 TB both scans
    push their date predicates to the parquet reader and shuffle only
    user grain."""
    ev = t(spark, sf_dir, "events")
    b = ev.agg(F.date_sub(F.to_date(F.max("ts")), 7).alias("cutoff"))
    e = ev.crossJoin(F.broadcast(b)).withColumn("d", F.to_date("ts"))
    feat = (
        e.filter((F.col("d") < F.col("cutoff")) & (F.col("d") >= F.date_sub(F.col("cutoff"), 14)))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events_14d"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("n_purchases_14d"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.round(F.col("value") * 100).cast("long"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("cents_14d"),
        )
    )
    lab = (
        e.filter(
            (F.col("event_type") == "purchase")
            & (F.col("d") >= F.col("cutoff"))
            & (F.col("d") < F.date_add(F.col("cutoff"), 7))
        )
        .select("user_id")
        .distinct()
        .withColumn("label", F.lit(1))
    )
    return feat.join(lab, "user_id", "left").select(
        "user_id",
        "n_events_14d",
        "n_purchases_14d",
        "cents_14d",
        F.coalesce(F.col("label"), F.lit(0)).cast("long").alias("label"),
    )


# =====================================================================
# q187 — keyset (seek) pagination: the scale form of q157
# =====================================================================


@query(
    "q187_keyset_pagination",
    """
    WITH page1 AS (
      SELECT c_acctbal, c_custkey FROM customer
      ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 10
    ),
    last AS (
      SELECT c_acctbal AS lb, c_custkey AS lk FROM page1
      ORDER BY c_acctbal ASC, c_custkey DESC LIMIT 1
    )
    SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
    FROM customer, last
    WHERE c_acctbal < lb OR (c_acctbal = lb AND c_custkey > lk)
    ORDER BY c_acctbal DESC, c_custkey ASC
    LIMIT 10
    """,
)
def q187(spark, sf_dir):
    """Keyset (seek) pagination — the scale form of q157's
    LIMIT/OFFSET: the client passes page 1's LAST key back as
    literals, and page 2 is `WHERE (bal, key) after (last_bal,
    last_key) ORDER BY ... LIMIT n`. OFFSET must still read and
    discard every earlier row (fine for page 2, quadratic for page
    10,000 — the documented small-result form); the seek predicate
    prunes AT THE SCAN (row-group min/max on the pushed filter,
    plan-gated in tests/test_plan_quality.py) and the LIMIT plans as
    TakeOrdered — per-page cost stays flat at any page depth. The
    boundary fetch is one TakeOrdered job collecting a single row
    (the client-state handshake of every keyset API); identical
    output to q157's rows 11-20."""
    c = t(spark, sf_dir, "customer")
    last = (
        c.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .select("c_acctbal", "c_custkey")
        .limit(10)
        .collect()[-1]
    )
    lb, lk = last["c_acctbal"], last["c_custkey"]
    seek = (F.col("c_acctbal") < F.lit(lb)) | (
        (F.col("c_acctbal") == F.lit(lb)) & (F.col("c_custkey") > F.lit(lk))
    )
    return (
        c.filter(seek)
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .limit(10)
        .select(
            "c_custkey",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_cents"),
        )
    )


# =====================================================================
# q188 — OOV-rate audit under vocabulary truncation
# =====================================================================


@query(
    "q188_oov_audit",
    r"""
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents
    ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
        ORDER BY cnt DESC, tok ASC LIMIT 50
      )
    )
    SELECT t.lang,
           CAST(count(DISTINCT t.doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST((1000 * sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
             AS oov_millis
    FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
    GROUP BY t.lang ORDER BY t.lang
    """,
)
def q188(spark, sf_dir):
    """Out-of-vocabulary audit for tokenizer/vocab sizing: build the
    top-50-by-frequency vocabulary (total order: count desc, token asc
    — deterministic at the truncation boundary), then measure per-lang
    token counts and the OOV fraction in integer millis. The tokenizer
    prep loop every LLM pipeline runs before committing to a vocab
    size. Scale shape: one explode + one hash-agg builds the vocab,
    the vocab (V rows, bounded by the LIMIT) broadcasts back against
    the token stream — the corpus is scanned twice but never shuffled
    at token grain beyond the count agg; no windows, no driver loops.
    Reference analogue: the token-count/vocab surface of SURVEY.md
    §2.10 (q67/q122), extended to the truncation-impact audit."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    )
    vocab = (
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(50)
        .select("tok", F.lit(1).alias("__in_vocab"))
    )
    flagged = toks.join(F.broadcast(vocab), "tok", "left")
    oov = F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)).cast("long")
    return (
        flagged.groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_tokens"),
            oov.alias("n_oov"),
        )
        .withColumn("oov_millis", F.expr("(1000 * n_oov) DIV n_tokens"))
        .orderBy("lang")
    )


# =====================================================================
# q189 — MinHash estimator calibration (estimated vs exact Jaccard)
# =====================================================================


@query("q189_minhash_calibration", det_ops.minhash_calibration_oracle_sql())
def q189(spark, sf_dir):
    """Estimator-quality audit for the MinHash dedup path (q35): for
    every LSH candidate pair, the estimated Jaccard (signature
    agreement / 32) is compared against the EXACT shingle-set Jaccard,
    and the signed error is bucketed in tenths. This is how a pipeline
    owner decides whether 32 hashes are enough before trusting the
    near-dup verdicts at 100 TB — the calibration histogram is the
    evidence. All integer millis (floor division on both engines), so
    the DuckDB oracle hash-checks the audit bit-for-bit, including the
    zero-intersection candidates (banding collisions with no shared
    shingle survive via the LEFT JOIN). Scale shape: candidates come
    from the banded equi-join (never all-pairs); the exact-Jaccard pass
    joins shingles only for candidate ids — O(candidates x
    shingles/doc), the same bound as the generate-then-verify dedup
    (q106)."""
    d = t(spark, sf_dir, "documents")
    # ONE tokenize+explode+distinct pass serves BOTH stages (r7 opt,
    # guide §2.2): the signature pipeline consumes the persisted
    # distinct-shingle frame (min over the distinct set == min over
    # the multiset, so sharing is value-preserving) and the exact-
    # Jaccard verify aggregates the same frame into per-doc sorted
    # arrays — previously each stage re-ran its own shingle pass over
    # the documents scan. The count() barrier fills the cache before
    # the consumers race for it (r6 lesson).
    sh = det_ops.distinct_shingles(d, "doc_id", "text", 3).persist()
    sh.count()
    pairs = det_ops.minhash_lsh_pairs_det(d, shingles=sh)
    # verification at CANDIDATE grain (r7 opt, the q259/q206 shape):
    # per-doc sorted shingle arrays + ONE array_intersect per pair —
    # |candidates| is tiny next to |shingle rows|, so two broadcast
    # joins replace the old (pairs ⋈ sh_a) ⋈ sh_b left join that
    # shuffled the FULL shingle frame on (id, sh) plus a separate
    # size aggregate and its two join-backs. Sizes ride in the same
    # groupBy. size(array_intersect) over distinct per-doc sets ==
    # the old per-pair match count, zero-intersection pairs included
    # (empty intersect -> 0, same as the left join's count of NULLs).
    docsh = sh.groupBy("id").agg(
        F.sort_array(F.collect_list("sh")).alias("shl"),
        F.count(F.lit(1)).alias("n_sh"),
    )
    da = docsh.select(
        F.col("id").alias("id_a"), F.col("shl").alias("sha"), F.col("n_sh").alias("sza")
    )
    db = docsh.select(
        F.col("id").alias("id_b"), F.col("shl").alias("shb"), F.col("n_sh").alias("szb")
    )
    calib = (
        pairs.select("id_a", "id_b", "n_sig_agree")
        .join(da, "id_a")
        .join(db, "id_b")
        .withColumn("inter", F.size(F.array_intersect("sha", "shb")).cast("long"))
        .withColumn("est_millis", F.expr("(1000 * n_sig_agree) DIV 32"))
        .withColumn("exact_millis", F.expr("(1000 * inter) DIV (sza + szb - inter)"))
    )
    return (
        calib.withColumn("err_bucket", F.expr("(est_millis - exact_millis + 1000) DIV 100"))
        .groupBy("err_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min(F.expr("est_millis - exact_millis")).cast("long").alias("min_err_millis"),
            F.max(F.expr("est_millis - exact_millis")).cast("long").alias("max_err_millis"),
        )
        .orderBy("err_bucket")
    )


# =====================================================================
# q190 — hard-negative mining over labeled embeddings
# =====================================================================


@query(
    "q190_hard_negatives",
    """
    SELECT query_id, query_label, neighbor_id, neighbor_label,
           CAST(rank AS BIGINT) AS rank, round(cos, 6) AS cosine FROM (
      SELECT q.vec_id AS query_id, q.label AS query_label,
             c.vec_id AS neighbor_id, c.label AS neighbor_label,
             list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cos,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                                         c.vec_id ASC) AS rank
      FROM embeddings q JOIN embeddings c ON q.label <> c.label
      WHERE q.vec_id < 20
    ) WHERE rank <= 3
    """,
)
def q190(spark, sf_dir):
    """Hard-negative mining — the contrastive-training data prep: for
    each query vector, the top-3 most-similar embeddings with a
    DIFFERENT label (near the query in cosine space yet labeled
    otherwise: exactly the negatives a contrastive or reranker loss
    wants). Plan shape mirrors q37: broadcast(queries) against one
    candidate scan with the label-inequality predicate applied during
    the join (no same-label pair is ever scored), zip_with dot products
    JVM-side, then a per-query top-k window — partitioned by query_id,
    never global. At 100 TB the candidate scan is
    embarrassingly parallel and the only shuffle is the per-query
    top-k at |Q| x k rows."""
    emb = t(spark, sf_dir, "embeddings")
    q = sim_ops.with_norm(emb.filter(F.col("vec_id") < 20), "embedding").select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("__vec").alias("qv"),
        F.col("__norm").alias("qn"),
    )
    c = sim_ops.with_norm(emb, "embedding").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("__vec").alias("cv"),
        F.col("__norm").alias("cn"),
    )
    scored = c.join(
        F.broadcast(q), F.col("query_label") != F.col("neighbor_label")
    ).select(
        "query_id", "query_label", "neighbor_id", "neighbor_label",
        sim_ops.cosine("qv", "cv", "qn", "cn").alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select(
            "query_id", "query_label", "neighbor_id", "neighbor_label",
            "rank", F.round("cos", 6).alias("cosine"),
        )
    )


# =====================================================================
# q191 — token-budget curation (greedy quality-ordered prefix)
# =====================================================================


@query(
    "q191_token_budget",
    r"""
    WITH st AS (
      SELECT doc_id, source,
             len(string_split_regex(trim(text), '\s+')) AS n_tok,
             len(list_distinct(string_split_regex(trim(text), '\s+'))) AS n_dist
      FROM documents
    ),
    sc AS (
      SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok,
             CAST((1000 * n_dist) // n_tok AS BIGINT) AS score
      FROM st WHERE n_tok > 0
    ),
    b AS (SELECT CAST(sum(n_tok) // 4 AS BIGINT) AS budget FROM sc),
    cum AS (
      SELECT doc_id, source, n_tok,
             sum(n_tok) OVER (ORDER BY score DESC, doc_id ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM sc
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(n_tok) AS BIGINT) AS tokens_kept
    FROM cum, b WHERE cum <= budget
    GROUP BY source ORDER BY source
    """,
)
def q191(spark, sf_dir):
    """Token-budget curation — 'take the best documents until the
    budget is spent', the data-mixing step that turns scored corpora
    into a training set: score each doc by lexical diversity (distinct
    tokens per token, integer millis), order by (score desc, doc_id),
    and keep the greedy prefix whose running token total fits the
    budget (sum(n_tok)/4, computed from the data so both engines use
    the same literal-free budget). The running total uses the
    scale-safe two-pass partitioned prefix sum (operators/windows
    .global_prefix_sum — repartitionByRange on score, bucket-local
    window, broadcast per-bucket offsets), NOT a single-partition
    global window: the exact pattern SCALE.md §34 prescribes, reused
    here at doc grain. Output is the per-source kept-doc/token rollup
    a mixing report shows."""
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    sc = (
        d.select(
            "doc_id", "source",
            F.size(toks).cast("long").alias("n_tok"),
            F.size(F.array_distinct(toks)).cast("long").alias("n_dist"),
        )
        .filter(F.col("n_tok") > 0)
        .withColumn("score", F.expr("(1000 * n_dist) DIV n_tok"))
    )
    budget = sc.agg((F.sum("n_tok") / F.lit(4)).cast("long").alias("budget"))
    cum = win_ops.global_prefix_sum(
        sc, "score", False,
        [F.col("score").desc(), F.col("doc_id").asc()],
        "n_tok", out_col="cum",
    )
    return (
        cum.crossJoin(F.broadcast(budget))
        .filter(F.col("cum") <= F.col("budget"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_tok").cast("long").alias("tokens_kept"),
        )
        .orderBy("source")
    )


# =====================================================================
# q192 — deterministic exact-k stratified sample
# =====================================================================


@query(
    "q192_stratified_sample",
    """
    SELECT lang, doc_id, CAST(rank AS BIGINT) AS rank, n_chars FROM (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) ASC,
                        doc_id ASC
             ) AS rank
      FROM documents
    ) WHERE rank <= 5
    ORDER BY lang, rank
    """,
)
def q192(spark, sf_dir):
    """Deterministic exact-k-per-stratum sampling: 5 docs per lang,
    chosen by ordering each stratum on the cross-engine md5 hash of the
    doc id — a uniform-at-rest, seedless, fully REPRODUCIBLE sample
    (rerun, retry, or re-shard and you get the same rows), which is
    what makes samples auditable in a training pipeline. This is the
    hash-checked counterpart of q60's seeded TABLESAMPLE (the one
    rows-only entry in the registry): TABLESAMPLE's RNG is
    engine-specific by design, while the hash-order sample is verified
    bit-for-bit against DuckDB. Scale shape: one hash-partitioned
    window per stratum (never a global sort); with bounded k the
    per-stratum top-k could also plan as a partial TakeOrdered — the
    window form keeps exact ranks for the audit trail."""
    d = t(spark, sf_dir, "documents")
    key = det_ops.md5_long(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(key.asc(), F.col("doc_id").asc())
    return (
        d.select("lang", "doc_id", "n_chars", F.row_number().over(w).cast("long").alias("rank"))
        .filter(F.col("rank") <= 5)
        .select("lang", "doc_id", "rank", "n_chars")
        .orderBy("lang", "rank")
    )


# =====================================================================
# q193 — temperature-scaled domain-mixing plan (alpha = 0.5)
# =====================================================================


@query(
    "q193_mixing_plan",
    """
    WITH n AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n_docs,
             CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000) AS BIGINT) AS w_milli
      FROM n
    ),
    tot AS (SELECT sum(w_milli) AS sum_w FROM w)
    SELECT source, n_docs, w_milli,
           CAST((1000 * w_milli) // sum_w AS BIGINT) AS alloc_docs,
           CAST((1000 * ((1000 * w_milli) // sum_w)) // n_docs AS BIGINT) AS epoch_millis
    FROM w, tot
    ORDER BY source
    """,
)
def q193(spark, sf_dir):
    """Temperature-scaled domain mixing (the multilingual/multi-domain
    sampling rule p_i ~ n_i^alpha with alpha = 0.5): per source, the
    sampling weight floor(sqrt(n_i)*1000), its integer share of a
    1000-doc epoch budget, and the implied per-domain epoch rate in
    millis (>1000 means the domain repeats within one epoch — the
    oversampling alarm a mixing report exists to raise). sqrt is
    IEEE-correctly-rounded in both engines, so floor(sqrt*1000) is
    deterministic cross-engine; everything after is integer floor
    division. Scale shape: one hash-agg to domain grain (a handful of
    rows at any corpus size), then a scalar-broadcast total — the
    plan every mixing-schedule computation should have."""
    d = t(spark, sf_dir, "documents")
    n = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    w = n.withColumn(
        "w_milli", F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1000).cast("long")
    )
    tot = w.agg(F.sum("w_milli").alias("sum_w"))
    return (
        w.crossJoin(F.broadcast(tot))
        .withColumn("alloc_docs", F.expr("(1000 * w_milli) DIV sum_w"))
        .withColumn("epoch_millis", F.expr("(1000 * alloc_docs) DIV n_docs"))
        .select("source", "n_docs", "w_milli", "alloc_docs", "epoch_millis")
        .orderBy("source")
    )


# =====================================================================
# q194 — context-window packing manifest (concatenate-then-chunk)
# =====================================================================

_CTX_LEN = 2048


@query(
    "q194_packing_manifest",
    rf"""
    WITH st AS (
      SELECT doc_id, CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
      FROM documents
    ),
    cum AS (
      SELECT doc_id, n_tok,
             sum(n_tok) OVER (ORDER BY doc_id ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM st
    ),
    placed AS (
      SELECT doc_id, n_tok,
             (cum - n_tok) // {_CTX_LEN} AS shard_id,
             CASE WHEN (cum - n_tok) // {_CTX_LEN} <> (cum - 1) // {_CTX_LEN}
                  THEN 1 ELSE 0 END AS straddles
      FROM cum
    )
    SELECT CAST(shard_id AS BIGINT) AS shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS start_tokens,
           CAST(sum(straddles) AS BIGINT) AS n_straddlers
    FROM placed
    GROUP BY shard_id ORDER BY shard_id
    """,
)
def q194(spark, sf_dir):
    """Concatenate-then-chunk packing manifest (GPT-style pretraining
    prep): lay every document's tokens end-to-end in doc_id order,
    split the tape into 2048-token context windows, and report
    per shard how many documents START there, their token mass, and
    how many straddle the shard boundary (the rows a loader must
    split or mask across windows). The running offset comes from the
    scale-safe two-pass partitioned prefix sum — at 100 TB the tape
    offset is exactly the computation that must NOT be a
    single-partition window sort, and here it is not (plan-gated
    family, tests/test_global_windows.py). All-integer output,
    hash-checked against DuckDB's window form."""
    d = t(spark, sf_dir, "documents")
    st = d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tok"),
    )
    cum = win_ops.global_prefix_sum(
        st, "doc_id", True, [F.col("doc_id").asc()], "n_tok", out_col="cum"
    )
    placed = cum.select(
        "doc_id", "n_tok",
        F.expr(f"(cum - n_tok) DIV {_CTX_LEN}").alias("shard_id"),
        F.expr(
            f"CASE WHEN (cum - n_tok) DIV {_CTX_LEN} <> (cum - 1) DIV {_CTX_LEN} THEN 1 ELSE 0 END"
        ).alias("straddles"),
    )
    return (
        placed.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("start_tokens"),
            F.sum("straddles").cast("long").alias("n_straddlers"),
        )
        .orderBy("shard_id")
    )
