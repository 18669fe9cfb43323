"""Extended relational coverage (registered into the same QUERIES/
ORACLES battery): range frames, percentiles, array aggregation, null
semantics, multiset set-ops, regexp_extract_all, ntile/percent_rank/
cume_dist, native pivot, date arithmetic, scalar subqueries, approx
aggregates. Same determinism rules as queries.py."""
from __future__ import annotations

import pandas as pd  # module-scope: pandas_udf resolves 'pd.Series' hints here
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators import det_hash, windows
from .queries import ORACLES, QUERIES, cents_sum, query, t


@query(
    "q44_range_between",
    """
    SELECT o_orderkey, o_totalprice,
           count(*) OVER (ORDER BY o_totalprice RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_within_1000
    FROM orders
    """,
)
def q44(spark, sf_dir):
    """RANGE frame (peer/value-based, no tie-break needed): for each
    order, how many orders cost within $1000 less. Scale form: the
    naive `Window.orderBy(o_totalprice)` is an Exchange
    SinglePartition sort of every order; banded_range_count
    range-buckets on price and replicates only the $1000 halo below
    each boundary, so the sort parallelizes (plan-gated in
    tests/test_plan_quality.py)."""
    o = t(spark, sf_dir, "orders")
    return windows.banded_range_count(
        o.select("o_orderkey", "o_totalprice"),
        "o_totalprice", low=-1000, high=0, out_col="n_within_1000",
    ).select("o_orderkey", "o_totalprice", "n_within_1000")


@query(
    "q45_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
           round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
           round(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q45(spark, sf_dir):
    """Exact interpolated percentiles (Spark percentile == DuckDB
    quantile_cont)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("median_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 6).alias("p90_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 6).alias("p25_price"),
    )


@query(
    "q46_array_agg",
    """
    SELECT n_regionkey,
           to_json(list_sort(list(n_name))) AS nations_json,
           len(list(n_name)) AS n_nations
    FROM nation GROUP BY n_regionkey
    """,
)
def q46(spark, sf_dir):
    """Array aggregation: collect_list + sort, serialized to JSON so
    the oracle compare never sorts raw array cells (driver-safe)."""
    n = t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.to_json(F.array_sort(F.collect_list("n_name"))).alias("nations_json"),
        F.size(F.collect_list("n_name")).cast("long").alias("n_nations"),
    )


@query(
    "q47_null_semantics",
    """
    SELECT o_orderstatus,
           count(*) AS n_rows,
           count(nullif(o_orderpriority, '1-URGENT')) AS n_not_urgent,
           cast(sum(CASE WHEN nullif(o_orderpriority, '1-URGENT') IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_urgent,
           coalesce(max(nullif(o_orderpriority, o_orderpriority)), 'all-null') AS coalesced
    FROM orders GROUP BY o_orderstatus
    """,
)
def q47(spark, sf_dir):
    """NULL semantics: count(col) skips nulls, nullif, coalesce over an
    all-null aggregate."""
    o = t(spark, sf_dir, "orders")
    not_urgent = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(not_urgent).alias("n_not_urgent"),
        F.sum(F.when(not_urgent.isNull(), 1).otherwise(0)).alias("n_urgent"),
        F.coalesce(F.max(F.nullif(F.col("o_orderpriority"), F.col("o_orderpriority"))), F.lit("all-null")).alias(
            "coalesced"
        ),
    )


@query(
    "q48_except_all",
    """
    SELECT l_returnflag FROM lineitem WHERE l_quantity < 25
    EXCEPT ALL
    SELECT l_returnflag FROM lineitem WHERE l_quantity < 10
    """,
)
def q48(spark, sf_dir):
    """Multiset EXCEPT ALL (duplicate-preserving difference)."""
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") < 25).select("l_returnflag")
    b = li.filter(F.col("l_quantity") < 10).select("l_returnflag")
    return a.exceptAll(b)


@query(
    "q49_regexp_extract_all",
    """
    SELECT c_custkey,
           to_json(regexp_extract_all(c_name, '[0-9]+')) AS digit_runs_json,
           cast(len(regexp_extract_all(c_name, '[0-9]+')) AS bigint) AS n_runs
    FROM customer
    """,
)
def q49(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    runs = F.regexp_extract_all("c_name", F.lit("[0-9]+"), 0)
    return c.select(
        "c_custkey", F.to_json(runs).alias("digit_runs_json"), F.size(runs).cast("long").alias("n_runs")
    )


@query(
    "q50_ntile_dist",
    """
    SELECT o_orderkey,
           cast(ntile(4) OVER w AS bigint) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cum_dist
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
)
def q50(spark, sf_dir):
    """ntile/percent_rank/cume_dist at ROW grain — rebased onto the
    two-pass global_row_number (r4: this was the last row-grain
    single-partition window in the registry). Under the total order
    (price, orderkey) all three are closed forms of (rn, N):
    rank = rn, percent_rank = (rn-1)/(N-1), cume_dist = rn/N, and
    ntile(4) is the SQL-standard first-(N%4)-tiles-get-one-extra
    arithmetic — identical to the engines' builtins given a total
    order."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked = windows.global_row_number(
        o, "o_totalprice", True,
        [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()], "rn",
    )
    n_total = o.count()  # parquet-footer count: one metadata job
    q_, rem = divmod(int(n_total), 4)
    big = rem * (q_ + 1)
    rn = F.col("rn")
    tile = F.when(
        rn <= F.lit(big), F.floor((rn - 1) / F.lit(q_ + 1))
    ).otherwise(F.lit(rem) + F.floor((rn - F.lit(big) - 1) / F.lit(max(q_, 1))))
    return ranked.select(
        "o_orderkey",
        (tile + 1).cast("long").alias("quartile"),
        F.round((rn - 1) / F.lit(n_total - 1), 6).alias("pct_rank"),
        F.round(rn / F.lit(n_total), 6).alias("cum_dist"),
    )


@query(
    "q51_pivot_native",
    f"""
    SELECT l_linestatus,
           {', '.join(f"sum(CASE WHEN l_returnflag = '{f}' THEN l_quantity END) AS {f}" for f in 'ANR')}
    FROM lineitem GROUP BY l_linestatus
    """,
)
def q51(spark, sf_dir):
    """DataFrame-native pivot with an explicit value list (the scale-
    safe form: no distinct-scan to discover columns)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum("l_quantity"))
    )


@query(
    "q52_date_arithmetic",
    """
    SELECT cast(date_diff('day', o_orderdate, l_shipdate) AS bigint) AS ship_delay_days,
           count(*) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY ship_delay_days
    """,
)
def q52(spark, sf_dir):
    """Date arithmetic across a join: shipping delay distribution."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("long").alias("ship_delay_days"))
        .groupBy("ship_delay_days")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q53_scalar_subquery",
    """
    SELECT o_orderpriority, count(*) AS n_big
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    GROUP BY o_orderpriority
    """,
)
def q53(spark, sf_dir):
    """Uncorrelated scalar subquery in a predicate (via Spark SQL so
    Catalyst plans the subquery as a broadcast scalar)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("q53_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_big
        FROM q53_orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM q53_orders)
        GROUP BY o_orderpriority
        """
    )


@query(
    "q54_approx_aggs",
    # Sketch values are engine-specific (HLL++/GK), so the HASHED output
    # is the error-bound CLAIM: the oracle states the bound must hold
    # per group; the Spark side computes sketch AND exact and checks.
    # A drifting sketch implementation turns a row FALSE -> hash mismatch.
    """
    SELECT l_returnflag,
           TRUE AS parts_within_5pct,
           TRUE AS median_within_1pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q54(spark, sf_dir):
    """Approximate aggregates (HLL++ count-distinct, GK quantiles)
    under a driver-visible error-bound gate: emit whether each group's
    sketch lands within the documented bound of the EXACT value."""
    li = t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("apx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("apx_med"),
        F.countDistinct("l_partkey").alias("ex_parts"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("ex_med"),
    )
    return agg.select(
        "l_returnflag",
        (F.abs(F.col("apx_parts") - F.col("ex_parts")) / F.col("ex_parts") <= 0.05).alias("parts_within_5pct"),
        (F.abs(F.col("apx_med") - F.col("ex_med")) / F.col("ex_med") <= 0.01).alias("median_within_1pct"),
    )


@query(
    "q55_map_struct",
    """
    SELECT o_orderstatus AS status,
           round(cast(sum(cast(round(o_totalprice*100) as bigint)) as double)/100.0, 2) AS total,
           count(*) AS n,
           to_json({'status': o_orderstatus, 'n': count(*)}) AS info_json
    FROM orders GROUP BY o_orderstatus
    """,
)
def q55(spark, sf_dir):
    """Struct construction serialized to JSON text (nested types kept
    cross-engine comparable)."""
    o = t(spark, sf_dir, "orders")
    agg = o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        cents_sum(F.col("o_totalprice"), "total"), F.count(F.lit(1)).alias("n")
    )
    return agg.select(
        "status",
        F.round("total", 2).alias("total"),
        "n",
        F.to_json(F.struct(F.col("status").alias("status"), F.col("n").alias("n"))).alias("info_json"),
    )


@query(
    "q56_cosine_topk_np",
    ORACLES["q37_cosine_topk"],
)
def q56(spark, sf_dir):
    """Same exact top-k cosine as q37, via the Arrow/numpy GEMM path
    (operators/similarity.cosine_topk_np) — the 100 TB throughput
    variant, held to the same DuckDB oracle."""
    from .operators.similarity import cosine_topk_np

    emb = t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20)
    out = cosine_topk_np(emb, queries_df, k=5)
    return out.withColumn("rank", F.col("rank").cast("long"))


@query(
    "q57_time_rollup",
    """
    SELECT cast(extract(year FROM ts) AS bigint) AS y,
           cast(extract(month FROM ts) AS bigint) AS m,
           cast(extract(day FROM ts) AS bigint) AS d,
           count(*) AS n, round(sum(value), 6) AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((y), (y, m), (y, m, d))
    """,
)
def q57(spark, sf_dir):
    """Hypertable-style time-hierarchy rollup: one pass produces
    year / year-month / year-month-day aggregates (grouping sets —
    single shuffle, no three separate scans)."""
    ev = t(spark, sf_dir, "events")
    ev.select(
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
        F.dayofmonth("ts").cast("long").alias("d"),
        "value",
    ).createOrReplaceTempView("q57_events")
    return spark.sql(
        """
        SELECT y, m, d, count(*) AS n, round(sum(value), 6) AS sum_value
        FROM q57_events
        GROUP BY GROUPING SETS ((y), (y, m), (y, m, d))
        """
    )


@query(
    "q58_dedup_clusters",
    # connected components ARE SQL-expressible: min reachable id via a
    # recursive CTE (terminates — UNION dedups the reach set). The edge
    # set is q34's inverted-index jaccard SQL thresholded at 0.35.
    """
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[CAST(i AS BIGINT):CAST(i+2 AS BIGINT)], ' ') AS sh
      FROM toks, unnest(range(1, greatest(len(w)-1, 1))) AS u(i)
      WHERE sh <> ''
    ), sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id_a, id_b, round(cast(n_inter AS double)/(sa.n_sh + sb.n_sh - n_inter), 6) AS jac
      FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
    ), thr AS (
      SELECT id_a, id_b FROM pairs WHERE jac >= 0.35
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM thr UNION ALL SELECT id_b, id_a FROM thr
    ), reach(n, m) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m
    )
    SELECT n AS doc_id, min(m) AS cluster_id,
           CAST(min(m) = n AS BOOLEAN) AS is_canonical
    FROM reach GROUP BY n
    """,
)
def q58(spark, sf_dir):
    """Fuzzy-dedup clustering: n-gram Jaccard pairs (>=0.35) ->
    connected components -> every doc labeled with its cluster and
    whether it is the canonical survivor. The oracle replays the
    components as a recursive CTE (min reachable id), so even the
    iterative algorithm is hash-checked."""
    from .operators.dedup import ngram_jaccard_pairs
    from .operators.graph_algo import dedup_clusters

    docs = t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", 3).filter(F.col("jaccard") >= 0.35)
    return dedup_clusters(docs, pairs, "doc_id")


@query(
    "q59_first_last_value",
    """
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def q59(spark, sf_dir):
    """first_value / last_value analytic windows (full-frame last)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
    )


@query("q60_tablesample")  # engine-specific RNG -> rows-only check
def q60(spark, sf_dir):
    """Bernoulli sampling with a fixed seed (deterministic within
    Spark; cross-engine RNGs differ, so rows-only — the deterministic
    cross-engine variant is q28's hash-mod sample)."""
    li = t(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_sampled")
    )


@query(
    "q61_grouped_pandas",
    """
    SELECT event_id, event_type,
           round(value - avg(value) OVER (PARTITION BY event_type), 6) AS centered
    FROM events
    """,
)
def q61(spark, sf_dir):
    """Grouped-map pandas (applyInPandas): per-group mean-centering —
    arbitrary per-group pandas logic under the oracle gate (the
    reference's 'Python node over pandas' §2.8 pattern, distributed
    per group instead of driver-side)."""
    from pyspark.sql import types as TT

    ev = t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    schema = TT.StructType(
        [
            TT.StructField("event_id", TT.LongType()),
            TT.StructField("event_type", TT.StringType()),
            TT.StructField("centered", TT.DoubleType()),
        ]
    )

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        # sum/len rather than .mean() to match SQL avg exactly
        mean = float(pdf["value"].sum()) / len(pdf)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "centered": (pdf["value"] - mean).round(6),
            }
        )

    return ev.groupBy("event_type").applyInPandas(center, schema)


@query(
    "q62_pandas_udf",
    """
    SELECT doc_id,
           cast(len(string_split_regex(trim(text), '\\s+')) AS bigint) AS n_tokens,
           upper(substr(trim(text), 1, 10)) AS head
    FROM documents
    """,
)
def q62(spark, sf_dir):
    """Scalar pandas UDF (Arrow-vectorized) under the oracle gate."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def n_tokens(s: pd.Series) -> pd.Series:
        return s.str.strip().str.split(r"\s+").map(len).astype("int64")

    @pandas_udf("string")
    def head10(s: pd.Series) -> pd.Series:
        return s.str.strip().str.slice(0, 10).str.upper()

    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", n_tokens("text").alias("n_tokens"), head10("text").alias("head"))


@query(
    "q63_dedup_pipeline",
    # the scale-safe dedup pipeline (exact-dedup pre-pass -> stop-shingle
    # cap -> similarity threshold), oracle encoding the SAME rules:
    # sizes from pre-cap shingles, intersections over capped shingles,
    # threshold on the 6dp-rounded jaccard, best-match ties to smaller id
    """
    WITH keepers AS (
      SELECT min(doc_id) AS doc_id
      FROM documents
      GROUP BY md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
    ), docs AS (
      SELECT d.doc_id, d.text FROM documents d JOIN keepers k ON d.doc_id = k.doc_id
    ), toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM docs
    ), sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[CAST(i AS BIGINT):CAST(i+2 AS BIGINT)], ' ') AS sh
      FROM toks, unnest(range(1, greatest(len(w)-1, 1))) AS u(i)
      WHERE sh <> ''
    ), sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    hot AS (SELECT sh FROM sh GROUP BY sh
           HAVING count(*) > greatest(20, (SELECT count(*) FROM documents) // 250)),
    sh2 AS (SELECT * FROM sh WHERE sh NOT IN (SELECT sh FROM hot)),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh2 a JOIN sh2 b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id_a, id_b, round(cast(n_inter AS double)/(sa.n_sh + sb.n_sh - n_inter), 6) AS jac
      FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
    ), thr AS (
      SELECT * FROM pairs WHERE jac >= 0.1
    ), sym AS (
      SELECT id_a AS id, id_b AS other, jac FROM thr
      UNION ALL SELECT id_b, id_a, jac FROM thr
    )
    SELECT id AS doc_id, other AS best_match_id, jac AS best_jaccard FROM (
      SELECT id, other, jac, row_number() OVER (PARTITION BY id ORDER BY jac DESC, other ASC) AS rn
      FROM sym
    ) WHERE rn = 1
    """,
)
def q63(spark, sf_dir):
    """Benched representative of n-gram dedup: the pipeline SCALE.md
    prescribes (exact dedup -> stop-shingle cap -> 0.1 jaccard
    threshold), not the uncapped pairwise call. The cap is
    CORPUS-SCALED, max(20, n_docs/250): a fixed absolute cap silently
    excludes EVERY shingle once average shingle df passes it (the sf1
    sweep caught q63 returning zero pairs on the 50k-doc fixture,
    whose 31-word vocabulary makes all shingles hot — SCALE.md §65);
    a df cap that grows with the corpus keeps the stop-shingle
    semantics (drop non-discriminative shingles) without erasing the
    index. The oracle computes the same scaled cap via a scalar
    subquery."""
    from .operators import dedup as dedup_ops

    docs = t(spark, sf_dir, "documents")
    cap = max(20, docs.count() // 250)  # parquet-footer count
    return dedup_ops.dedup_pipeline(docs, max_df=cap)


@query(
    "sdk06_upsert_partitioned",
    """
    SELECT CAST(o_orderkey % 16 AS BIGINT) AS o_bucket, o_orderkey,
           CASE WHEN o_orderkey % 16 = 3 AND o_orderkey % 100 < 10
                THEN o_totalprice + 1000 ELSE o_totalprice END AS o_totalprice
    FROM orders
    WHERE o_orderkey % 100 < 50
       OR (o_orderkey % 16 = 3 AND o_orderkey % 100 >= 50 AND o_orderkey % 100 < 60)
    """,
)
def sdk06(spark, sf_dir):
    """Partition-scoped upsert under the bench + oracle gate: the
    partition column is part of unique_on, so the MERGE rewrites ONLY
    the touched o_bucket=3 partition and hardlinks the other 15 — the
    bounded-rewrite path that survives 100 TB (sdk02 benches the
    unbounded full-table MERGE for contrast). The oracle states full
    MERGE semantics, proving the scoped path's result equivalence."""
    from .node.node import Table
    from .queries import _temp_engine

    eng = _temp_engine(spark)
    o = t(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 16).cast("long").alias("o_bucket"), "o_orderkey", "o_totalprice"
    )
    with eng.node_context("w", outputs={"out": "o_part_upsert"}):
        tbl = Table("out", "w")
        tbl.init(unique_on=["o_bucket", "o_orderkey"], partition_by="o_bucket")
        tbl.append(o.filter(F.col("o_orderkey") % 100 < 50))
        tbl.flush()
        updates = o.filter((F.col("o_bucket") == 3) & (F.col("o_orderkey") % 100 < 10)).withColumn(
            "o_totalprice", F.col("o_totalprice") + 1000
        )
        inserts = o.filter(
            (F.col("o_bucket") == 3) & (F.col("o_orderkey") % 100 >= 50) & (F.col("o_orderkey") % 100 < 60)
        )
        tbl.upsert(updates.unionByName(inserts))
    with eng.node_context("r", inputs={"in": "o_part_upsert"}):
        return Table("in", "r").read_spark()


@query(
    "sdk14_upsert_skewed",
    """
    SELECT CAST(o_orderkey % 16 AS BIGINT) AS o_bucket, o_orderkey,
           CASE WHEN (o_orderkey % 16 = 3 AND o_orderkey % 100 < 36)
                  OR (o_orderkey % 16 = 5 AND o_orderkey % 100 < 4)
                THEN o_totalprice + 1000 ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey % 100 < 50
    """,
)
def sdk14(spark, sf_dir):
    """Skewed-key MERGE (VERDICT r3 item 6): ONE hot partition
    (o_bucket=3) receives ~90% of the update batch, a cold partition
    (o_bucket=5) the rest — the adversarial shape for partition-scoped
    upsert. The scoped path only re-reads/rewrites the TWO touched
    partitions (hot-partition size, not table size, bounds the
    rewrite) and hardlinks the other 14; AQE handles the imbalanced
    anti-join sides. The oracle states full MERGE semantics over the
    whole table, proving result equivalence. Benched next to sdk02
    (unbounded) and sdk06 (uniform scoped) — ratios in SCALE.md."""
    from .node.node import Table
    from .queries import _temp_engine

    eng = _temp_engine(spark)
    o = t(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 16).cast("long").alias("o_bucket"), "o_orderkey", "o_totalprice"
    )
    with eng.node_context("w", outputs={"out": "o_skew_upsert"}):
        tbl = Table("out", "w")
        tbl.init(unique_on=["o_bucket", "o_orderkey"], partition_by="o_bucket")
        tbl.append(o.filter(F.col("o_orderkey") % 100 < 50))
        tbl.flush()
        hot = o.filter(
            (F.col("o_bucket") == 3) & (F.col("o_orderkey") % 100 < 36)
        )
        cold = o.filter(
            (F.col("o_bucket") == 5) & (F.col("o_orderkey") % 100 < 4)
        )
        tbl.upsert(
            hot.unionByName(cold).withColumn("o_totalprice", F.col("o_totalprice") + 1000)
        )
    with eng.node_context("r", inputs={"in": "o_skew_upsert"}):
        return Table("in", "r").read_spark()


@query(
    "q64_salted_join",
    """
    SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
           sum(l_quantity) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
)
def q64(spark, sf_dir):
    """Skew machinery under the driver gate: salted_join's output must
    equal the PLAIN join (the oracle states the unsalted semantics).
    Deterministic xxhash64 salts spread a hot suppkey over 8 reducers;
    the dim side replicates x8 (operators/skew.py)."""
    from .operators import skew

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_quantity", "l_orderkey", "l_linenumber"
    )
    sup = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    joined = skew.salted_join(li, sup, ["suppkey"], salt=8, salt_by=["l_orderkey", "l_linenumber"])
    return joined.groupBy(F.col("s_nationkey").cast("long").alias("s_nationkey")).agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


@query(
    "q65_salted_two_phase_agg",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           sum(l_quantity) AS sum_qty,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q65(spark, sf_dir):
    """Two-phase salted aggregation == plain aggregation (oracle states
    the one-phase semantics). Money summed as cents-bigint so the
    partial/final decomposition is order-free and cross-engine exact."""
    from .operators import skew

    li = t(spark, sf_dir, "lineitem").withColumn(
        "cents", F.round(F.col("l_extendedprice") * 100).cast("long")
    )
    out = skew.salted_two_phase_agg(
        li,
        ["l_returnflag"],
        {
            "n": "count",
            "sum_qty": "sum:l_quantity",
            "min_price": "min:l_extendedprice",
            "max_price": "max:l_extendedprice",
            "total_cents": "sum:cents",
        },
        salt=16,
        salt_by=["l_orderkey", "l_linenumber"],
    )
    return out.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        "sum_qty",
        "min_price",
        "max_price",
        F.col("total_cents").cast("long").alias("total_cents"),
    )


@query("q66_ivf_topk", det_hash.ivf_oracle_sql())
def q66(spark, sf_dir):
    """IVF ANN (partition-based scale path, complementing q38's
    hash-based LSH): deterministic integer coarse quantizer, probed
    clusters only — the full approximate pipeline replayed by the
    DuckDB oracle."""
    from .operators import det_hash as det_ops

    emb = t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20)
    return det_ops.ivf_topk(emb, queries_df, k=5)


@query(
    "q67_token_counts",
    r"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_pieces,
           CAST(len(list_filter(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'),
                                p -> regexp_matches(p, '^[^A-Za-z0-9]$'))) AS BIGINT) AS n_punct_pieces
    FROM documents
    """,
)
def q67(spark, sf_dir):
    """Token budgeting: whitespace + BPE-ish piece counts (GPT-2-style
    pre-tokenizer regex, kept to a Java/RE2-identical subset)."""
    from .operators import text as text_ops

    return text_ops.token_counts(t(spark, sf_dir, "documents").select("doc_id", "text")).select(
        "doc_id", "n_ws_tokens", "n_bpe_pieces", "n_punct_pieces"
    )


@query(
    "q68_bottomk_fingerprint",
    """
    WITH grams AS (
      SELECT DISTINCT doc_id,
             CAST('0x' || substr(md5(substr(text, CAST(i AS INT), 8)), 1, 15) AS BIGINT) AS h
      FROM documents, unnest(range(1, greatest(length(text) - 6, 1))) AS u(i)
      WHERE length(text) >= 8
    )
    SELECT doc_id, CAST(rk AS BIGINT) AS rk, h AS gram_hash FROM (
      SELECT doc_id, h, row_number() OVER (PARTITION BY doc_id ORDER BY h ASC) AS rk FROM grams
    ) WHERE rk <= 4
    """,
)
def q68(spark, sf_dir):
    """Winnowing-style bottom-k sketch over char 8-grams (rolling-hash
    document fingerprinting, min-wise estimator) — all-integer, so the
    oracle replays the sketch exactly."""
    from .operators import text as text_ops

    return text_ops.bottomk_fingerprint(t(spark, sf_dir, "documents").select("doc_id", "text"))


@query(
    "q69_frame_sample",
    # payloads are UTF-8 of ASCII text, so DuckDB replays the byte
    # slicing with substr + md5 — frame boundaries, sampling stride,
    # hashes and sizes all hash-checked
    """
    WITH frames AS (
      SELECT doc_id AS media_id,
             CAST(f AS BIGINT) AS frame_idx,
             md5(substr(text, CAST(f * 256 + 1 AS INT), 256)) AS frame_hash,
             CAST(least(256, length(text) - f * 256) AS BIGINT) AS frame_bytes
      FROM documents,
           unnest(range(0, CAST(ceil(length(text) / 256.0) AS BIGINT))) AS u(f)
      WHERE f % 4 = 0
    )
    SELECT * FROM frames
    """,
)
def q69(spark, sf_dir):
    """Multimodal frame sampling: every 4th 256-byte frame per payload,
    per-frame hash + size via one mapInPandas pass (keyframe-extraction
    plumbing with a byte-slicing stub decoder)."""
    from .operators import multimodal as mm_ops

    d = t(spark, sf_dir, "documents")
    media = mm_ops.binarize(d, "doc_id", "text", "source", mime="text/plain")
    return mm_ops.frame_sample(media, frame_size=256, every_nth=4)


@query(
    "q70_quality_score",
    """
    WITH s AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_words,
             round(cast(len(list_filter(string_split_regex(trim(text), '\\s+'),
                       x -> list_contains(['the','a','an','and','or','of','to','in','is','it'], lower(x)))) AS double)
                   / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6) AS stopword_ratio
      FROM documents
    )
    SELECT doc_id,
           round(0.7 * least(cast(n_words AS double) / 50.0, 1.0)
               + 0.3 * least(stopword_ratio * 5.0, 1.0), 6) AS quality_score
    FROM s
    """,
)
def q70(spark, sf_dir):
    """C4/Gopher-style rule-based quality score (closed form over the
    text_stats signals) — the filter a training-data pipeline applies
    before dedup."""
    from .operators import text as text_ops

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    return text_ops.quality_score(d, "text").select("doc_id", "quality_score")


@query(
    "q71_tfidf_top_terms",
    # ranking keys are INTEGERS (tf desc, df asc, term) so ordering is
    # cross-engine exact; the tf-idf score itself is a value column
    # (ln over identical exact operands, rounded 6dp on both sides)
    """
    WITH toks AS (
      SELECT doc_id, lower(t.tok) AS term FROM (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents
      ) t
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, tf, df, round(score, 6) AS tfidf
    FROM (
      SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf, CAST(d.df AS BIGINT) AS df,
             tf.tf * (ln((n.n_docs + 1.0) / (d.df + 1.0)) + 1.0) AS score,
             row_number() OVER (PARTITION BY tf.doc_id ORDER BY tf.tf DESC, d.df ASC, tf.term ASC) AS rk
      FROM tf JOIN dfreq d ON tf.term = d.term, n
    ) WHERE rk <= 3
    """,
)
def q71(spark, sf_dir):
    """TF-IDF top-3 terms per document (smoothed idf): the relevance-
    scoring primitive of the text-analysis family. Shape: two hash
    aggregations + a term-keyed join + per-doc top-k; the corpus size
    joins in as a broadcast scalar, never a driver constant."""
    from .operators.text import tokens as tok_fn

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select("doc_id", F.explode(tok_fn("text")).alias("raw")).select(
        "doc_id", F.lower(F.col("raw")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf") * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tf").desc(), F.col("df").asc(), F.col("term").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", F.col("rk").cast("long").alias("rk"), "term", "tf", "df", F.round("score", 6).alias("tfidf"))
    )


# curation-stage battery (q72-q78) registers on import
from . import queries_curation  # noqa: E402,F401  (registration side effect)


# =====================================================================
# Relational surface, round-2 additions: statistical aggregates,
# boolean/bitwise aggregates, deterministic mode, gaps-and-islands,
# explicit-bucket histograms
# =====================================================================

@query(
    "q79_regression_stats",
    """
    WITH b AS (
      SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    s AS (
      SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(CAST(sum(x) AS HUGEINT) AS DOUBLE) AS sx,
             CAST(CAST(sum(y) AS HUGEINT) AS DOUBLE) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
             CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
             CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM b GROUP BY l_returnflag
    )
    SELECT l_returnflag, n_rows,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope_cents,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) AS intercept_cents,
           round((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr,
           round(((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
               * ((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))), 6) AS r2
    FROM s
    """,
)
def q79(spark, sf_dir):
    """Least-squares regression / correlation of price-cents on
    quantity per returnflag, via EXACT integer moment sums (decimal-38
    accumulation in Spark == HUGEINT in DuckDB — overflow-proof at any
    SF) cast to double only for the closed-form slope/intercept/corr/r2
    (identical IEEE op sequence on both engines). The built-in
    regr_*/corr aggregates compute running-variance doubles whose
    summation order is engine-dependent — this formulation is the
    cross-engine-deterministic equivalent. One hash aggregation."""
    li = t(spark, sf_dir, "lineitem")
    b = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    dec = "decimal(38,0)"
    s = b.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(dec)).cast("double").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).cast("double").alias("sxy"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    dxy = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dxx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dyy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = dxy / dxx
    corr = dxy / F.sqrt(dxx * dyy)
    return s.select(
        "l_returnflag",
        "n_rows",
        F.round(slope, 6).alias("slope_cents"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias("intercept_cents"),
        F.round(corr, 6).alias("corr"),
        F.round(corr * corr, 6).alias("r2"),
    )


@query(
    "q80_bool_aggs",
    """
    SELECT o_orderstatus,
           CAST(bool_and(o_totalprice > 1000) AS BIGINT) AS all_over_1000,
           CAST(bool_or(o_orderpriority = '1-URGENT') AS BIGINT) AS any_urgent,
           CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
           CAST(count(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT) AS n_big
    FROM orders GROUP BY o_orderstatus
    """,
)
def q80(spark, sf_dir):
    """Boolean aggregates (bool_and / bool_or) + filtered counts
    (count_if) — cast to BIGINT on both sides so the comparator never
    hashes raw booleans."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000).cast("long").alias("all_over_1000"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").cast("long").alias("any_urgent"),
        F.count_if(F.col("o_orderpriority") == "1-URGENT").cast("long").alias("n_urgent"),
        F.count_if(F.col("o_totalprice") > 200000).cast("long").alias("n_big"),
    )


@query(
    "q81_bitwise_aggs",
    """
    SELECT o_orderstatus,
           CAST(bit_and(o_custkey) AS BIGINT) AS band,
           CAST(bit_or(o_custkey) AS BIGINT) AS bor,
           CAST(bit_xor(o_custkey) AS BIGINT) AS bxor
    FROM orders GROUP BY o_orderstatus
    """,
)
def q81(spark, sf_dir):
    """Bitwise AND/OR/XOR aggregates over integer keys (set-membership
    sketch primitives) — integer-exact by construction."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bit_and("o_custkey").cast("long").alias("band"),
        F.bit_or("o_custkey").cast("long").alias("bor"),
        F.bit_xor("o_custkey").cast("long").alias("bxor"),
    )


@query(
    "q82_mode",
    """
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, CAST(cnt AS BIGINT) AS mode_count
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY o_orderstatus ORDER BY cnt DESC, o_orderpriority ASC) AS rn
      FROM c
    ) WHERE rn = 1
    """,
)
def q82(spark, sf_dir):
    """Deterministic mode: most frequent value with an explicit
    (count desc, value asc) tie-break — the built-in mode() returns an
    arbitrary tie winner in both engines, so the deterministic
    count+argmax form is the oracle-safe equivalent."""
    o = t(spark, sf_dir, "orders")
    c = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("o_orderstatus").orderBy(F.col("cnt").desc(), F.col("o_orderpriority").asc())
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("mode_priority"), F.col("cnt").cast("long").alias("mode_count"))
    )


@query(
    "q83_gaps_islands",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    isl AS (
      SELECT user_id, d,
             CAST(d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INT) AS DATE) AS island
      FROM days
    ),
    runs AS (
      SELECT user_id, island, count(*) AS run_len FROM isl GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(sum(run_len) AS BIGINT) AS n_active_days,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(max(run_len) AS BIGINT) AS longest_streak
    FROM runs GROUP BY user_id
    """,
)
def q83(spark, sf_dir):
    """Gaps-and-islands: consecutive-active-day runs per user via the
    date-minus-row_number trick (retention/streak analytics). Two hash
    aggregations + one window, all keyed on user_id — single shuffle."""
    e = t(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn("island", F.date_sub(F.col("d"), F.row_number().over(w)))
    runs = isl.groupBy("user_id", "island").agg(F.count(F.lit(1)).alias("run_len"))
    return runs.groupBy("user_id").agg(
        F.sum("run_len").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.max("run_len").cast("long").alias("longest_streak"),
    )


@query(
    "q84_histogram",
    """
    SELECT CAST(least(floor(o_totalprice / 60000.0), 9) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(round(o_totalprice * 100)) AS BIGINT) AS min_cents,
           CAST(max(round(o_totalprice * 100)) AS BIGINT) AS max_cents
    FROM orders GROUP BY bucket
    """,
)
def q84(spark, sf_dir):
    """Fixed-width histogram with an explicit bucket expression
    (floor-divide + cap) — the same integer bucketing both engines
    evaluate identically; min/max tracked in exact cents."""
    o = t(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 60000.0), F.lit(9)).cast("long")
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min(F.round(F.col("o_totalprice") * 100)).cast("long").alias("min_cents"),
        F.max(F.round(F.col("o_totalprice") * 100)).cast("long").alias("max_cents"),
    )


@query(
    "q87_funnel",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT v.user_id,
           CAST(CASE WHEN p.t3 IS NOT NULL THEN 3 WHEN c.t2 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS stage,
           epoch_us(v.t1) AS t1_us,
           epoch_us(c.t2) AS t2_us,
           epoch_us(p.t3) AS t3_us
    FROM v LEFT JOIN c ON v.user_id = c.user_id LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def q87(spark, sf_dir):
    """Ordered funnel (view -> click -> purchase): earliest qualifying
    event per stage, each stage strictly after the previous one — the
    conversion-analysis primitive. Three key-local aggregations joined
    on user_id (one shuffle key throughout; at scale the per-type
    filters push to the scan). Timestamps emitted as epoch micros."""
    e = t(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("t1"))
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    out = v.join(c, "user_id", "left").join(p, "user_id", "left")
    stage = (
        F.when(F.col("t3").isNotNull(), 3).when(F.col("t2").isNotNull(), 2).otherwise(1)
    )
    return out.select(
        "user_id",
        stage.cast("long").alias("stage"),
        F.unix_micros("t1").alias("t1_us"),
        F.unix_micros("t2").alias("t2_us"),
        F.unix_micros("t3").alias("t3_us"),
    )


@query(
    "q88_cohort_retention",
    """
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
    ),
    act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
    SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', f.cohort_day, a.d) AS BIGINT) AS day_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM act a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY f.cohort_day, day_offset
    """,
)
def q88(spark, sf_dir):
    """Cohort retention triangle: users grouped by first-active day,
    counted per day-offset since their cohort day. Two aggregations
    keyed on user_id then (cohort, offset) — the retention-analytics
    primitive, all integer dates/counts. cohort_day is emitted as an
    ISO string: raw DATE columns arrive as object dtype from Spark but
    datetime64 from DuckDB, which some comparators hash differently."""
    e = t(spark, sf_dir, "events")
    act = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    firsts = act.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        act.join(firsts, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("d", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


@query(
    "q89_event_transitions",
    """
    WITH ordered AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
    FROM ordered WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def q89(spark, sf_dir):
    """First-order event-transition counts (the Markov/path-analysis
    matrix): lead() over each user's (ts, event_id)-ordered stream —
    the unique event_id tiebreak makes ordering cross-engine exact —
    then one aggregation over (from, to). Single shuffle on user_id."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select("user_id", "event_type", F.lead("event_type").over(w).alias("next_type"))
    return (
        o.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# =====================================================================
# sdk16 — deletion-vector DELETE through the engine
# =====================================================================


@query(
    "sdk16_delete_vectors",
    """
    SELECT o_orderkey, o_orderstatus FROM orders
    WHERE NOT (o_orderkey % 97 = 0) AND NOT (o_orderkey % 89 = 1)
    """,
)
def sdk16(spark, sf_dir):
    """Row-level DELETE as pure metadata (tests/test_deletion_vectors
    has the invariant battery; this puts the engine path under the
    driver's oracle gate): two stacked sparse deletes (~1% each) via
    delete_where(vectorized=True) — every parquet file is CARRIED into
    the new version and the matched rows' (file, row_index)
    coordinates become a broadcast read-time mask. At 100 TB this is
    the difference between deleting 1% of rows from TB-sized files and
    rewriting them; compaction materializes the mask later. The oracle
    states the surviving complement in closed form."""
    from .node.node import Table
    from .queries import _temp_engine

    eng = _temp_engine(spark)
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    with eng.node_context("w", outputs={"out": "o_dv"}):
        tbl = Table("out", "w")
        tbl.append(o.coalesce(4))
        tbl.flush()
        tbl.delete_where("o_orderkey % 97 = 0", vectorized=True)
        tbl.delete_where("o_orderkey % 89 = 1", vectorized=True)
        return tbl.read_spark()


# =====================================================================
# sdk17 — deletion-vector UPDATE through the engine
# =====================================================================


@query(
    "sdk17_update_vectors",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 97 = 0 THEN 'U' ELSE o_orderstatus END
             AS o_orderstatus
    FROM orders
    WHERE NOT (o_orderkey % 89 = 1)
    """,
)
def sdk17(spark, sf_dir):
    """Merge-on-read UPDATE (update_where(vectorized=True), Delta-style
    deletion vectors; tests/test_deletion_vectors.py has the invariant
    battery — this puts the path under the driver's oracle gate): a
    sparse DV delete followed by a sparse DV update. The update carries
    EVERY file of the parent version (hardlinks locally, pure manifest
    refs on object storage), masks the matched rows' old images via
    (file, row_index) deletion vectors, and writes only the ~1%
    updated images as new files — at 100 TB, an UPDATE of 100 rows
    inside TB-sized parquet is O(files) metadata plus a 100-row write,
    never a rewrite. The oracle states the final state in closed form."""
    from .node.node import Table
    from .queries import _temp_engine

    eng = _temp_engine(spark)
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    with eng.node_context("w", outputs={"out": "o_dvu"}):
        tbl = Table("out", "w")
        tbl.append(o.coalesce(4))
        tbl.flush()
        tbl.delete_where("o_orderkey % 89 = 1", vectorized=True)
        tbl.update_where({"o_orderstatus": "'U'"}, "o_orderkey % 97 = 0", vectorized=True)
        return tbl.read_spark()


# =====================================================================
# sdk18 — merge-on-read upsert (deletion-vector MERGE) through the engine
# =====================================================================


@query(
    "sdk18_merge_on_read_upsert",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 101 = 0 THEN 'M' ELSE o_orderstatus END
             AS o_orderstatus
    FROM orders
    UNION ALL
    SELECT -o_orderkey AS o_orderkey, 'N' AS o_orderstatus
    FROM orders WHERE o_orderkey % 103 = 0 AND o_orderkey > 0
    """,
)
def sdk18(spark, sf_dir):
    """Merge-on-read MERGE (init(merge_on_read=True); the invariant
    battery is tests/test_merge_on_read.py — this puts the path under
    the driver's oracle gate): one upsert batch mixing ~1% updates
    (keys scattered across every file) with ~1% inserts. The flush
    carries EVERY parent file, masks the matched keys' old images via
    (file, row_index) deletion vectors, and appends only the batch —
    where the rewriting MERGE would rewrite the whole unpartitioned
    table, this is O(files) metadata + a 2%-sized write. The oracle
    states the merged state in closed form (updates via CASE, inserts
    via UNION ALL on negated keys that cannot collide)."""
    from .node.node import Table
    from .queries import _temp_engine

    eng = _temp_engine(spark)
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    batch = (
        o.filter(F.col("o_orderkey") % 101 == 0)
        .withColumn("o_orderstatus", F.lit("M"))
        .unionByName(
            o.filter((F.col("o_orderkey") % 103 == 0) & (F.col("o_orderkey") > 0)).select(
                (-F.col("o_orderkey")).alias("o_orderkey"), F.lit("N").alias("o_orderstatus")
            )
        )
    )
    with eng.node_context("w", outputs={"out": "o_mor"}):
        tbl = Table("out", "w")
        tbl.init(unique_on=["o_orderkey"], merge_on_read=True)
        tbl.append(o.coalesce(4))
        tbl.flush()
        tbl.upsert(batch)
        tbl.flush()
        return tbl.read_spark()


# =====================================================================
# sdk19 — REORG purge of deletion vectors through the engine
# =====================================================================


@query(
    "sdk19_purge_deletes",
    """
    SELECT o_orderkey, o_orderstatus FROM orders
    WHERE NOT (o_orderkey % 97 = 0)
    """,
)
def sdk19(spark, sf_dir):
    """REORG-style mask materialization (Table.purge_deletes; Delta
    `REORG TABLE ... APPLY (PURGE)` analogue): after a sparse DV
    delete, purge rewrites ONLY the files carrying mask entries and
    carries every clean file zero-copy — the bounded maintenance op
    when masks accumulate on a few hot files of a huge table (full
    compaction would rewrite everything). Content must be IDENTICAL
    before and after the purge; the oracle states the surviving
    complement in closed form, so a purge that dropped or resurrected
    a single row hash-mismatches."""
    from .node.node import Table
    from .queries import _temp_engine

    eng = _temp_engine(spark)
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    with eng.node_context("w", outputs={"out": "o_purge"}):
        tbl = Table("out", "w")
        tbl.append(o.coalesce(4))
        tbl.flush()
        tbl.delete_where("o_orderkey % 97 = 0", vectorized=True)
        tbl.purge_deletes()
        return tbl.read_spark()


# =====================================================================
# sdk20 — branch fork/merge workflow through the engine
# =====================================================================


@query(
    "sdk20_branch_merge",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 101 = 0 THEN 'B' ELSE o_orderstatus END
             AS o_orderstatus
    FROM orders
    WHERE NOT (o_orderkey % 97 = 0)
    """,
)
def sdk20(spark, sf_dir):
    """Branch workflow under the oracle gate (Engine.create_branch /
    merge_branch; tests/test_branches.py has the conflict matrix):
    fork a zero-copy branch of the orders table, run a scattered
    UPDATE and a DV DELETE on the branch while main stays untouched,
    then merge — the branch's changes land on main as ONE CDC batch
    computed from the fork point (metadata fast path under DV
    lineage). The oracle states the post-merge state in closed form;
    a merge that dropped, duplicated, or resurrected a row
    hash-mismatches."""
    from .node.node import Table
    from .queries import _temp_engine

    eng = _temp_engine(spark)
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    with eng.node_context("w", outputs={"out": "o_main"}):
        tbl = Table("out", "w")
        tbl.init(unique_on=["o_orderkey"], merge_on_read=True)
        tbl.append(o.coalesce(4))
        tbl.flush()
    phys = eng.create_branch("o_main", "fix")
    with eng.node_context("b", outputs={"out": phys}):
        bt = Table("out", "w")
        bt.update_where({"o_orderstatus": "'B'"}, "o_orderkey % 101 = 0", vectorized=True)
        bt.delete_where("o_orderkey % 97 = 0", vectorized=True)
    eng.merge_branch("o_main", "fix")
    with eng.node_context("r", outputs={"out": "o_main"}):
        return Table("out", "w").read_spark()


# =====================================================================
# sdk21 — generated partition column + pruning through the engine
# =====================================================================


@query(
    "sdk21_generated_partition",
    """
    SELECT o_orderkey, o_orderstatus,
           CAST(o_orderkey % 8 AS BIGINT) AS bucket
    FROM orders
    WHERE o_orderkey % 8 = 3
    """,
)
def sdk21(spark, sf_dir):
    """Generated partition column (init(generated_columns=...,
    partition_by=...); tests/test_generated_columns.py asserts the
    hive layout): writers never supply `bucket` — it is computed at
    the write choke point (GENERATED ALWAYS AS) and becomes the hive
    partition key, so the filtered read below is partition PRUNING at
    scan time (1/8th of the files listed, the rest never opened). The
    oracle recomputes the generator in closed form; a drifting or
    null-filled generated value hash-mismatches."""
    from .node.node import Table
    from .queries import _temp_engine

    eng = _temp_engine(spark)
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    with eng.node_context("w", outputs={"out": "o_gen"}):
        tbl = Table("out", "w")
        tbl.init(generated_columns={"bucket": "o_orderkey % 8"}, partition_by="bucket")
        tbl.append(o.coalesce(4))
        tbl.flush()
        return tbl.read_spark().filter("bucket = 3").select(
            "o_orderkey", "o_orderstatus", F.col("bucket").cast("long").alias("bucket")
        )


# =====================================================================
# sdk22 — lineage-aware MV refresh after source DELETE/UPDATE
# =====================================================================


@query(
    "sdk22_mv_delete_refresh",
    """
    SELECT o_orderstatus,
           CAST(SUM(CASE WHEN o_orderkey % 101 = 0 THEN 0
                         ELSE CAST(round(o_totalprice * 100) AS BIGINT) END
               ) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_orders
    FROM orders
    WHERE NOT (o_orderkey % 97 = 0)
    GROUP BY o_orderstatus
    """,
)
def sdk22(spark, sf_dir):
    """Lineage-aware materialized-view refresh (VERDICT r5 #1;
    node/matview.py, tests/test_matview_lineage.py): after the MV is
    folded, a deletion-vector DELETE and a vectorized UPDATE land on
    the source; the next plain refresh() — exactly what
    GraphRunner.run_all invokes on the source's data event — must
    classify the window as DV lineage and apply the SIGNED fold
    (masked old images -1, new images +1) instead of serving the
    stale aggregate. The oracle recomputes the post-DML aggregate in
    closed form (deleted keys excluded, updated keys re-priced to 0),
    so a stale, double-counted, or mis-signed group hash-mismatches.
    Reference parity: the devkit re-runs derived SQL nodes on source
    events (node.py:356-373); this is the O(change) version of that
    contract."""
    from .node.node import Table
    from .queries import _temp_engine

    eng = _temp_engine(spark)
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    with eng.node_context("w", outputs={"out": "o_mv_src"}):
        tbl = Table("out", "w")
        tbl.init(add_monotonic_id="mid")
        tbl.append(
            o.withColumn(
                "cents", F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
            ).coalesce(4)
        )
        tbl.flush()
    mv = eng.create_materialized_view(
        "o_mv",
        source="o_mv_src",
        order_by="mid",
        dims=["o_orderstatus"],
        measures={"revenue_cents": ("sum", "cents"), "n_orders": ("count", "*")},
    )
    mv.refresh()
    with eng.node_context("dml", outputs={"out": "o_mv_src"}):
        tbl = Table("out", "w")
        tbl.delete_where("o_orderkey % 97 = 0", vectorized=True)
        tbl.update_where({"cents": "0"}, "o_orderkey % 101 = 0", vectorized=True)
    mv.refresh()  # the auto path: classify → signed fold, never stale
    return mv.read_spark().select(
        "o_orderstatus",
        F.col("revenue_cents").cast("long").alias("revenue_cents"),
        F.col("n_orders").cast("long").alias("n_orders"),
    )


# =====================================================================
# sdk23 — SQL MERGE INTO routed through execute_sql
# =====================================================================


@query(
    "sdk23_sql_merge",
    """
    SELECT o_orderkey AS k,
           CAST(CASE WHEN o_orderkey % 5 = 0
                     THEN CAST(round(o_totalprice * 100) AS BIGINT) + o_orderkey
                     ELSE CAST(round(o_totalprice * 100) AS BIGINT) END
                AS BIGINT) AS cents
    FROM orders
    WHERE NOT (o_orderkey % 5 = 0 AND o_orderkey % 2 = 1)
    UNION ALL
    SELECT -o_orderkey AS k, CAST(o_orderkey AS BIGINT) AS cents
    FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey <> 0
    """,
)
def sdk23(spark, sf_dir):
    """SQL MERGE INTO through execute_sql (node/node.py _execute_merge;
    tests/test_sql_merge.py has the clause matrix): the standard
    upsert statement — conditional UPDATE with a cross-alias
    expression, clause-ordered DELETE, column-list INSERT — compiles
    to ONE apply_cdc batch over the engine's MERGE machinery
    (deletion-vector path on merge-on-read targets). Reference
    contract: arbitrary DML via execute_sql (node.py:356-373). The
    oracle states the post-merge table in closed form: matched even
    keys re-priced, matched odd keys deleted, a disjoint negative-key
    set inserted — a misrouted clause, double-applied row, or
    resurrected delete hash-mismatches."""
    from .node.node import Table
    from .queries import _temp_engine

    eng = _temp_engine(spark)
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.col("o_orderkey"),
    )
    src = (
        o.filter("o_orderkey % 5 = 0")
        .select(F.col("k"), F.col("o_orderkey").cast("long").alias("delta"))
        .unionByName(
            # o_orderkey 0 exists in the fixture: -0 would collide with
            # the matched key 0 (apply_cdc would last-wins-dedup where
            # the closed-form oracle keeps both) — exclude it
            o.filter("o_orderkey % 7 = 0 AND o_orderkey <> 0").select(
                (-F.col("k")).alias("k"), F.col("o_orderkey").cast("long").alias("delta")
            )
        )
    )
    with eng.node_context("w", outputs={"out": "m_tgt", "src": "m_src"}):
        tbl = Table("out", "w")
        tbl.init(unique_on=["k"])
        tbl.append(o.select("k", "cents").coalesce(4))
        tbl.flush()
        sp = Table("src", "w")
        sp.append(src.coalesce(2))
        sp.flush()
        tbl.execute_sql(
            "MERGE INTO {{ this }} AS t USING {{ m_src }} AS s ON t.k = s.k "
            "WHEN MATCHED AND s.delta % 2 = 0 THEN UPDATE SET t.cents = t.cents + s.delta "
            "WHEN MATCHED THEN DELETE "
            "WHEN NOT MATCHED THEN INSERT (k, cents) VALUES (s.k, s.delta)"
        )
        return tbl.read_spark().select("k", F.col("cents").cast("long").alias("cents"))


# =====================================================================
# sdk24 — branch sync (main->branch) + echo-suppressed merge-back
# =====================================================================


@query(
    "sdk24_branch_sync",
    """
    SELECT o_orderkey AS k,
           CAST(CASE WHEN o_orderkey % 13 = 0 THEN o_orderkey
                     WHEN o_orderkey % 11 = 0
                          THEN CAST(round(o_totalprice * 100) AS BIGINT) + 1
                     ELSE CAST(round(o_totalprice * 100) AS BIGINT) END
                AS BIGINT) AS cents
    FROM orders
    WHERE o_orderkey % 7 <> 0
    UNION ALL
    SELECT -o_orderkey AS k, CAST(o_orderkey AS BIGINT) AS cents
    FROM orders WHERE o_orderkey % 19 = 0 AND o_orderkey <> 0
    """,
)
def sdk24(spark, sf_dir):
    """Branch SYNC lifecycle under the oracle gate (Engine.sync_branch
    + the echo-suppressed merge_branch; tests/test_branches.py has the
    conflict matrix): fork a branch, edit disjoint keys on the branch
    (%11 bump) while MAIN keeps moving (%13 re-price, %7 delete, %19
    insert), sync main->branch (fork point advances), then merge back.
    Echo suppression must keep the merge to the branch's own edits —
    a sync that dropped main's changes, re-merged them as phantom
    branch edits, or resurrected a deleted key hash-mismatches the
    closed-form post-merge table."""
    from .node.node import Table
    from .queries import _temp_engine

    eng = _temp_engine(spark)
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    with eng.node_context("w", outputs={"out": "o_sync"}):
        tbl = Table("out", "w")
        tbl.init(unique_on=["k"], merge_on_read=True)
        tbl.append(o.coalesce(4))
        tbl.flush()
    phys = eng.create_branch("o_sync", "lived")
    with eng.node_context("b", outputs={"out": phys}):
        bt = Table("out", "w")
        # branch edits keys DISJOINT from main's (%13/%7 excluded): the
        # default on_conflict='error' sync must pass untouched
        bt.update_where(
            {"cents": "cents + 1"},
            "k % 11 = 0 AND k % 13 <> 0 AND k % 7 <> 0",
            vectorized=True,
        )
    with eng.node_context("m", outputs={"out": "o_sync"}):
        mt = Table("out", "w")
        mt.update_where({"cents": "k"}, "k % 13 = 0", vectorized=True)
        mt.delete_where("k % 7 = 0", vectorized=True)
        mt.upsert(
            o.filter("k % 19 = 0 AND k <> 0").select(
                (-F.col("k")).alias("k"), F.col("k").cast("long").alias("cents")
            )
        )
        mt.flush()
    eng.sync_branch("o_sync", "lived")
    eng.merge_branch("o_sync", "lived")
    with eng.node_context("r", outputs={"out": "o_sync"}):
        return Table("out", "w").read_spark().select(
            "k", F.col("cents").cast("long").alias("cents")
        )
