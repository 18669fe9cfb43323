"""Plan-quality gates: the physical plans we ship, not just correct
answers. Pushdown reaches the scan, pruning shrinks ReadSchema, dims
broadcast, stream cursors prune, no cartesian products (SURVEY.md §4)."""
import pytest
from pyspark.sql import functions as F

from patterns_devkit_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
    has_cartesian,
    pushed_filters,
    read_schemas,
)
from patterns_devkit_spark.queries import QUERIES, t


def test_q01_pushdown_and_pruning(spark, sf_dir):
    df = QUERIES["q01_pricing_summary"](spark, sf_dir)
    pushed = ";".join(pushed_filters(df))
    assert "l_shipdate" in pushed  # predicate reached the parquet scan
    (cols,) = read_schemas(df)
    # 7 of 11 lineitem columns needed; shipdate pruned after pushdown
    assert set(cols) <= {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_shipdate",
    }


def test_q06_all_filters_pushed(spark, sf_dir):
    df = QUERIES["q06_forecast_revenue"](spark, sf_dir)
    pushed = ";".join(pushed_filters(df))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_q03_broadcasts_filtered_dim(spark, sf_dir):
    df = QUERIES["q03_shipping_priority"](spark, sf_dir)
    assert has_broadcast_join(df)
    assert not has_cartesian(df)


def test_q05_star_join_no_cartesian(spark, sf_dir):
    df = QUERIES["q05_region_volume"](spark, sf_dir)
    assert has_broadcast_join(df)  # nation/region broadcast
    assert not has_cartesian(df)


def test_stream_cursor_pushes_to_scan(engine, sf_dir):
    """The incremental stream slice must prune via parquet min/max:
    cursor filter appears in PushedFilters of the versioned read."""
    from patterns_devkit_spark import Table

    with engine.node_context("w", outputs={"out": "ev"}):
        tb = Table("out", "w")
        tb.init(strictly_monotonic_ordering="event_id")
        tb.append(t(engine.spark, sf_dir, "events").select("event_id", "value"))
    with engine.node_context("c", inputs={"in": "ev"}):
        tb = Table("in", "r")
        s = tb.as_stream()
        s.seek(500)
        sl = s._slice()
        pushed = ";".join(pushed_filters(sl))
        assert "event_id" in pushed and "GreaterThan" in pushed


def test_no_query_has_cartesian(spark, sf_dir):
    """Theta/cross-style queries must not degenerate to CartesianProduct."""
    for name in ("q09_theta_join", "q34_ngram_jaccard", "q37_cosine_topk"):
        df = QUERIES[name](spark, sf_dir)
        assert not has_cartesian(df), f"{name} plan has a cartesian product"


def test_corpus_batch_plans(spark, sf_dir):
    """q201/q204: broadcast dictionary joins, TakeOrdered top-k, no
    cartesian, no single-partition window anywhere in the batch."""
    from patterns_devkit_spark.plans.inspect import single_partition_windows

    q201 = QUERIES["q201_dsir_importance"](spark, sf_dir)
    assert has_broadcast_join(q201)  # 4096-row weight table broadcasts
    assert not has_cartesian(q201)
    assert "TakeOrderedAndProject" in explain_str(q201)
    assert single_partition_windows(q201) == 0

    q204 = QUERIES["q204_pmi_collocations"](spark, sf_dir)
    assert not has_cartesian(q204)  # the N scalar joins via broadcast, not cartesian
    assert has_broadcast_join(q204)
    assert "TakeOrderedAndProject" in explain_str(q204)
    assert single_partition_windows(q204) == 0


def test_q189_signature_subtree_single_evaluation(spark, sf_dir):
    """The MinHash signature+banding pipeline must appear ONCE in
    q189's plan (n_sig_agree rides through the intersection join; the
    r7 rewrite additionally shares ONE shingle pass between the
    signature and the exact-Jaccard verify and verifies candidates by
    array_intersect over two broadcast joins). Counted via
    executed_exchanges (unique plan_ids — cached-build reprints share
    an id, genuine re-evaluations plan fresh nodes): the r7 plan holds
    8 distinct exchanges (sh build 2, sig build 2, docsh aggregate 2 —
    the one remaining 2x-tier duplication, cheap over the cached
    shingles — and the final bucket agg + sort). Gate with slack so
    AQE/version drift doesn't flake, but a re-introduced signature or
    shingle re-evaluation (+2 or more) trips it."""
    from patterns_devkit_spark.plans.inspect import executed_exchanges

    df = QUERIES["q189_minhash_calibration"](spark, sf_dir)
    n_exchanges = executed_exchanges(df)
    assert n_exchanges <= 9, f"q189 plans {n_exchanges} distinct exchanges (subtree re-evaluation?)"


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = explain_str(QUERIES["q18_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # no global sort for LIMIT k


def test_projection_pruning_generic(spark, sf_dir):
    """A 2-column projection reads 2 columns, not 11."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    (cols,) = read_schemas(li)
    assert cols == ["l_orderkey", "l_quantity"]


def test_contamination_broadcasts_benchmark(spark, sf_dir):
    """q73: the benchmark gram set is the broadcast side of the
    inverted-index join; no cartesian."""
    df = QUERIES["q73_contamination"](spark, sf_dir)
    assert has_broadcast_join(df)
    assert not has_cartesian(df)


def test_regression_stats_single_shuffle(spark, sf_dir):
    """q79: exact-moment regression is ONE hash aggregation — a single
    exchange in the plan."""
    plan = explain_str(QUERIES["q79_regression_stats"](spark, sf_dir))
    assert plan.count("Exchange") <= 2  # partial+final agg pair, no joins


def test_bigram_lm_broadcasts_model(spark, sf_dir):
    """q77: the bigram frequency table (the 'model') broadcasts back
    onto the gram stream — no shuffle join on the big side."""
    df = QUERIES["q77_bigram_lm"](spark, sf_dir)
    assert has_broadcast_join(df)
    assert not has_cartesian(df)


def test_stratified_sample_no_shuffle(spark, sf_dir):
    """q75: hash-bucket sampling is map-side only — zero exchanges."""
    plan = explain_str(QUERIES["q75_stratified_sample"](spark, sf_dir))
    assert "Exchange" not in plan


def test_fuzzy_match_is_blocked_join(spark, sf_dir):
    """q90: the Levenshtein compare runs over a blocking-key equi-join,
    never a cartesian all-pairs name compare."""
    df = QUERIES["q90_fuzzy_match"](spark, sf_dir)
    assert not has_cartesian(df)


def test_zscore_broadcasts_stats(spark, sf_dir):
    """q93: the tiny per-type stats table broadcasts back onto the
    event scan — the big side never shuffles for the join."""
    df = QUERIES["q93_zscore_outliers"](spark, sf_dir)
    assert has_broadcast_join(df)
    assert not has_cartesian(df)


def test_argmax_single_agg(spark, sf_dir):
    """q95: native max_by/min_by is one partial+final hash aggregate —
    no window sort, at most one exchange pair."""
    plan = explain_str(QUERIES["q95_argmax"](spark, sf_dir))
    assert "Window" not in plan
    assert plan.count("Exchange") <= 2


def test_winnowing_shuffles_only_on_doc(spark, sf_dir):
    """q96: k-gram explode + window + agg all key on doc_id — no joins,
    no cartesian, bounded exchange count."""
    df = QUERIES["q96_winnowing"](spark, sf_dir)
    assert not has_cartesian(df)
    plan = explain_str(df, "simple")
    assert plan.count("Exchange") <= 3


def test_interval_join_is_broadcast_equi_not_nested_loop(spark, sf_dir):
    """q115's range predicate must run as a bucketed equi-join with the
    small interval side broadcast — not BroadcastNestedLoopJoin."""
    df = QUERIES["q115_interval_join"](spark, sf_dir)
    plan = explain_str(df)
    assert has_broadcast_join(df)
    assert "BroadcastNestedLoop" not in plan
    assert not has_cartesian(df)


def test_skew_profile_broadcasts_global_stats(spark, sf_dir):
    df = QUERIES["q124_skew_profile"](spark, sf_dir)
    assert has_broadcast_join(df)
    assert not has_cartesian(df)


def test_domain_mix_single_shuffle(spark, sf_dir):
    """q127's acceptance predicate is map-side; only the per-source agg
    shuffles."""
    df = QUERIES["q127_domain_mix"](spark, sf_dir)
    plan = explain_str(df)
    # formatted explain renders each node in the tree AND the detail
    # listing: "Exchange (n)" appears once per physical exchange
    assert plan.count("Exchange (") <= 1


def test_centroid_partial_agg_before_shuffle(spark, sf_dir):
    """q125 must partial-aggregate the exploded (label, pos) rows
    map-side: one exchange, and it carries aggregated not raw rows."""
    df = QUERIES["q125_centroid"](spark, sf_dir)
    plan = explain_str(df)
    assert plan.count("Exchange (") <= 1
    assert "Generate" in plan  # posexplode stayed in-plan (no UDF)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Co-located join: both sides bucketed on the join key -> Catalyst
    plans the join with ZERO Exchange operators (the one-time layout
    cost replaces the recurring shuffle — the 100 TB contract)."""
    from patterns_devkit_spark.operators.layout import write_bucketed

    # (spark.sql.warehouse.dir is static; managed tables land in the
    # gitignored ./spark-warehouse and are dropped below)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force the issue
    try:
        orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        write_bucketed(orders, "b_orders", ["o_orderkey"], 4, sort_cols=["o_orderkey"])
        write_bucketed(li, "b_lineitem", ["l_orderkey"], 4, sort_cols=["l_orderkey"])
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = explain_str(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_aqe_enabled_in_session(spark):
    """AQE (runtime re-planning incl. skew-join splitting at its
    production-scale thresholds) is on in every engine session; the
    explicit mitigations for what AQE can't rewrite live in
    operators/skew.py and are equivalence-tested there."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_bloom_prune_is_broadcast_map_side(spark, sf_dir):
    """q159: both the 16-row bitmap and the dim keyset broadcast; the
    fact table never shuffles before the bloom filter applies."""
    df = QUERIES["q159_bloom_prune"](spark, sf_dir)
    plan = explain_str(df)
    assert has_broadcast_join(df)
    assert "BroadcastNestedLoop" not in plan
    assert not has_cartesian(df)
    # orders scan feeds a broadcast join, not an Exchange: the only
    # shuffles are the bloom build (16 rows) and the final aggregate
    n_shuffles = plan.count("Exchange (") - plan.count("BroadcastExchange (")
    assert n_shuffles <= 2


def test_bitmap_distinct_bounded_shuffles(spark, sf_dir):
    """q164: daily bitmap agg + per-bucket window + day agg — no joins,
    no cartesian, bounded exchange count."""
    df = QUERIES["q164_bitmap_distinct"](spark, sf_dir)
    plan = explain_str(df)
    assert not has_cartesian(df)
    assert "Join" not in plan
    assert plan.count("Exchange (") <= 3


def test_triangle_count_equi_joins_only(spark, sf_dir):
    """q165: the two-hop triangle join must stay equi-join (hash or
    sort-merge) — the final 1-row stat combine may broadcast-nest."""
    df = QUERIES["q165_triangle_count"](spark, sf_dir)
    plan = explain_str(df)
    assert not has_cartesian(df)
    # edge joins are equi-joins on (u, v)
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or has_broadcast_join(df)


def test_triangle_count_sparsifier_bounds_two_hop(spark, sf_dir):
    """q165 100x gate (VERDICT r2 item 4): the support>=2 sparsifier
    must sit BELOW the two-hop join in the plan (pairwise work runs on
    the bounded supported-edge set, never the raw co-occurrence
    pairs), and at runtime the bound must actually bite — the
    supported set is a strict fraction of raw pairs, and its growth is
    sub-linear in corpus size (measured 26% of raw pairs at sf0.001,
    3% at sf0.01: the co-purchase graph converges while raw pairs grow
    with the scan; SCALE.md 35)."""
    from pyspark.sql import functions as F

    from patterns_devkit_spark.queries import t as load

    df = QUERIES["q165_triangle_count"](spark, sf_dir)
    plan = explain_str(df)
    # static gate (r4 form): the edge set is materialized ONCE via
    # localCheckpoint — the sparsifying filter ran while building the
    # checkpointed RDD, so the final plan shows the (tiny) cached scan
    # instead of the filter expression; the single-evaluation gate is
    # test_q165_edge_set_single_evaluation, and the sparsifier's
    # effect is asserted at runtime below.
    assert "ExistingRDD" in plan
    # runtime gate: supported edges are a strict fraction of raw pairs
    li = load(spark, sf_dir, "lineitem")
    lo = li.select("l_orderkey", "l_partkey").distinct()
    a, b = lo.alias("a"), lo.alias("b")
    pairs = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey")) & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .groupBy(F.col("a.l_partkey"), F.col("b.l_partkey"))
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    raw = pairs.count()
    supported = pairs.filter(F.col("n_co") >= 2).count()
    assert supported < 0.5 * raw, f"sparsifier not biting: {supported}/{raw}"
    # adaptive gate: at this scale AQE broadcasts the small sides —
    # the executed plan is broadcast-dominated, SMJ only on the
    # (bounded) two-hop pair
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert final.count("SortMergeJoin") <= 2
    assert final.count("BroadcastHashJoin") >= final.count("SortMergeJoin")


def test_keyset_pagination_pushes_seek_and_takes_ordered(spark, sf_dir):
    """q187 (VERDICT r2 item 7): the seek predicate reaches the
    parquet scan (row-group pruning at any page depth) and the page
    LIMIT plans as TakeOrdered — no global sort, no offset discard.
    The seek page must equal the OFFSET page row-for-row."""
    df = QUERIES["q187_keyset_pagination"](spark, sf_dir)
    pushed = ";".join(pushed_filters(df))
    assert "c_acctbal" in pushed, f"seek predicate not pushed: {pushed}"
    assert "TakeOrderedAndProject" in explain_str(df)
    offset_page = QUERIES["q157_pagination"](spark, sf_dir).collect()
    assert df.collect() == offset_page


def test_profiling_batch_plans(spark, sf_dir):
    """q209/q212/q213/q214: hash-before-shuffle audit shapes — top-k
    via TakeOrdered, broadcast stats joins, no cartesian, and the PPS
    prefix sum runs on the two-pass operator (zero single-partition
    windows at row grain)."""
    from patterns_devkit_spark.plans.inspect import single_partition_windows

    q209 = QUERIES["q209_dup_span_coverage"](spark, sf_dir)
    assert not has_cartesian(q209)
    assert "TakeOrderedAndProject" in explain_str(q209)
    assert single_partition_windows(q209) == 0

    q212 = QUERIES["q212_numeric_histogram"](spark, sf_dir)
    assert has_broadcast_join(q212)  # 3-row min/max stats broadcast
    assert single_partition_windows(q212) == 0

    q213 = QUERIES["q213_fk_integrity_audit"](spark, sf_dir)
    assert not has_cartesian(q213)

    q214 = QUERIES["q214_systematic_pps_sample"](spark, sf_dir)
    assert single_partition_windows(q214) == 0  # two-pass prefix sum, not a global window
    assert not has_cartesian(q214)


def test_q220_two_pass_running_peak(spark, sf_dir):
    """Max drawdown composes global_prefix_sum + global_running_max:
    zero single-partition windows at row grain."""
    from patterns_devkit_spark.plans.inspect import single_partition_windows

    df = QUERIES["q220_max_drawdown"](spark, sf_dir)
    assert single_partition_windows(df) == 0
    assert not has_cartesian(df)


def test_q225_skyline_two_pass(spark, sf_dir):
    """Skyline rides the exclusive two-pass running max — zero
    single-partition windows."""
    from patterns_devkit_spark.plans.inspect import single_partition_windows

    df = QUERIES["q225_skyline"](spark, sf_dir)
    assert single_partition_windows(df) == 0


def test_stats_batch_plans(spark, sf_dir):
    """q247-q249: value-grain rank/ECDF machinery rides the two-pass
    prefix-sum operator — zero single-partition windows at row/value
    grain (the VERDICT r2 anti-pattern must not reappear); q252 is a
    pure TakeOrdered scan with no shuffle-heavy machinery."""
    from patterns_devkit_spark.plans.inspect import single_partition_windows

    for name in (
        "q247_mann_whitney",
        "q248_ks_two_sample",
        "q249_spearman_rank_corr",
    ):
        df = QUERIES[name](spark, sf_dir)
        assert single_partition_windows(df) == 0, name
        assert not has_cartesian(df), name

    q252 = QUERIES["q252_readability"](spark, sf_dir)
    assert "TakeOrderedAndProject" in explain_str(q252)
    assert single_partition_windows(q252) == 0


def test_resampling_batch_plans(spark, sf_dir):
    """q253/q254: replicate fan-out must stay a generated-column
    explode into ONE map-side-combined hash-agg — partial aggregation
    present, no cartesian, and the only window in q254 runs on R=40
    replicate rows (post-aggregation grain, allowed)."""
    from patterns_devkit_spark.plans.inspect import single_partition_windows

    q253 = QUERIES["q253_randomization_test"](spark, sf_dir)
    assert not has_cartesian(q253)
    assert single_partition_windows(q253) == 0
    s = explain_str(q253)
    assert "partial" in s.lower()  # map-side combine before the replicate shuffle

    q254 = QUERIES["q254_poisson_bootstrap"](spark, sf_dir)
    assert not has_cartesian(q254)
    # the single-partition window is the 40-row replicate ranking —
    # bounded by R, not by data volume
    assert single_partition_windows(q254) <= 1


def test_q255_bounded_pairwise_and_selection(spark, sf_dir):
    """Theil-Sen: the pairwise join runs at day grain (bounded), the
    median is two-pass order-statistic selection — no data-sized
    single-partition window, no percentile object-agg."""
    from patterns_devkit_spark.plans.inspect import single_partition_windows

    df = QUERIES["q255_theil_sen"](spark, sf_dir)
    assert single_partition_windows(df) == 0
    assert "Percentile" not in explain_str(df)


def test_q256_fdr_broadcast_bands(spark, sf_dir):
    """FDR screen: the empirical-CDF band lookup must be a broadcast
    join (25-row bands), the replicate fan-out map-side combined."""
    df = QUERIES["q256_fdr_screen"](spark, sf_dir)
    s = explain_str(df)
    assert "BroadcastNestedLoopJoin" in s or has_broadcast_join(df)
    assert "partial" in s.lower()
    assert not has_cartesian(df)


def test_q165_edge_set_single_evaluation(spark, sf_dir):
    """VERDICT r3 item 3: the supported-edge subtree feeds five
    consumers; it must be materialized ONCE (localCheckpoint), never
    re-evaluated per consumer. With the checkpoint, every consumer
    scans the cached edge RDD and the plan carries only the handful of
    post-edge shuffles (~6); a re-introduced per-consumer evaluation
    re-plans the distinct+self-join+agg pipeline 5x (~20+ exchanges)
    and trips the ceiling."""
    import re as _re

    from patterns_devkit_spark.plans.inspect import explain_str

    df = QUERIES["q165_triangle_count"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    n_exchanges = len(_re.findall(r"Exchange (?:hash|range|Single)", plan))
    assert n_exchanges <= 10, f"q165 plans {n_exchanges} exchanges (edge subtree re-evaluated?)"
    assert "Scan ExistingRDD" in plan, "edge set no longer checkpointed"


def test_prefix_join_shingle_single_evaluation(spark, sf_dir):
    """q206/q259 (prefix-filter joins): the distinct-shingle subtree
    feeds five consumers (df, sizes, prefix ordering, both
    verification sides); it must materialize ONCE (localCheckpoint) —
    re-introducing per-consumer evaluation replans the explode+distinct
    5x (q259 measured 10 scans / 19 exchanges before the rebase; 0 /
    9 after)."""
    import re as _re

    from patterns_devkit_spark.plans.inspect import explain_str

    for key, ceiling in (("q259_prefix_filter_t80", 12), ("q206_prefix_filter_join", 14)):
        df = QUERIES[key](spark, sf_dir)
        plan = explain_str(df, mode="simple")
        n_exchanges = len(_re.findall(r"Exchange (?:hash|range|Single)", plan))
        assert n_exchanges <= ceiling, f"{key} plans {n_exchanges} exchanges (shingles re-evaluated?)"
        assert "Scan ExistingRDD" in plan, f"{key}: shingle set no longer checkpointed"


def test_aqe_skew_join_split_engages(spark):
    """VERDICT r4 item 7 (read-path skew): a hot-key JOIN (one key =
    50% of rows) must be handled by AQE's skew-join split — the FINAL
    adaptive plan carries the `skew=true` marker on the sort-merge
    join and the result is unchanged. sdk14 covers write-path skew;
    this is the read-side evidence. Thresholds are scaled down so the
    test corpus trips the same code path production data trips at
    256MB partitions (measured at 5M rows: split ~1.5x faster than
    the unsplit hot partition; SCALE.md). The salted_join operator
    (operators/skew.py) remains the rewrite for joins AQE can't split
    (broadcast-ineligible non-SMJ shapes)."""
    conf = spark.conf
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {}
    for k, v in keys.items():
        try:
            saved[k] = conf.get(k)
        except Exception:
            saved[k] = None
        conf.set(k, v)
    try:
        fact = spark.range(1_000_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(500_001).select(F.col("id").alias("k"), (F.col("id") * 3).alias("w"))
        j = fact.join(dim, "k").agg(F.sum(F.col("v") + F.col("w")).alias("s"))
        got = j.collect()[0]["s"]
        executed = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in executed, "AQE skew-join split did not engage on the hot key"
        # correctness unchanged: hot key 0 matches dim w=0 for 500k fact
        # rows; odd keys k<=500000 match w=3k
        expect = sum(v for v in range(1_000_000) if v % 2 == 0) + sum(
            k + 3 * k for k in range(1, 500_001, 2)
        )
        assert got == expect
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_q248_distinct_grain_single_evaluation(spark, sf_dir):
    """VERDICT r4 item 5: q248's distinct-cents grain feeds four
    consumers (boundary sample, bucket totals, window sweep, grand
    totals). It must be materialized ONCE (localCheckpoint) so the
    single evaluation is structural, not an AQE ReusedExchange
    accident: the final plan scans the checkpointed RDD and contains
    NO parquet scan at all (the fact table was consumed during the
    eager checkpoint). A re-introduced per-consumer evaluation brings
    the lineitem scan back into the plan and blows the exchange
    ceiling (was ~12 pre-rebase)."""
    import re as _re

    from patterns_devkit_spark.plans.inspect import explain_str

    df = QUERIES["q248_ks_two_sample"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    n_exchanges = len(_re.findall(r"Exchange (?:hash|range|Single)", plan))
    assert n_exchanges <= 8, f"q248 plans {n_exchanges} exchanges (grain re-evaluated?)"
    assert "Scan ExistingRDD" in plan, "distinct-cents grain no longer checkpointed"
    assert not _re.search(r"Scan parquet|FileScan", plan), "fact table re-entered the final plan"


def test_registry_wide_no_row_grain_global_windows(spark, sf_dir):
    """VERDICT r3 item 4: sweep EVERY registry query through the
    single-partition-window detector. A Window over an Exchange
    SinglePartition is only acceptable when its input is provably
    bounded (post-aggregation calendar/cell/shortlist grain) — each
    such query is whitelisted here WITH its justification, so a new
    batch cannot reintroduce a row-grain global window (the round-2
    scale-killer) without failing this gate."""
    from patterns_devkit_spark.plans.inspect import single_partition_windows

    # query -> (max allowed single-partition windows, bounded-input justification)
    WHITELIST = {
        "q105_share_of_total": (1, "window over the already-aggregated 5-row segment table"),
        "q110_contingency": (1, "event_type x day-of-week contingency cells (35 rows)"),
        "q115_interval_join": (2, "incident windows over the filtered error stream; shard by tenant at 100 TB"),
        "q128_threshold_sweep": (1, "11-row decile-histogram cumulative"),
        "q140_cumulative_distinct": (1, "running sum over per-day new-user counts (calendar grain)"),
        "q215_exact_quantile_select": (1, "4096-row bucket-histogram cumulative (two-pass selection)"),
        "q226_weighted_median": (1, "4096-row weight-histogram cumulative (two-pass selection)"),
        "q238_gains_table": (1, "cumulative capture over 10 decile rows"),
        "q240_new_vs_returning": (1, "calendar-day grain"),
        "q250_cusum_changepoint": (2, "CUSUM over per-day aggregates (calendar grain)"),
        "q251_survival_hazard": (1, "hazard table at tenure-duration grain (bounded by day span)"),
        "q254_poisson_bootstrap": (1, "rank over the 40 replicate means (bounded by _BOOT_R; r6 single-pass form)"),
        "q256_fdr_screen": (4, "BH sweep over 25 hypothesis cells x bounded replicate grain"),
        "q258_forecast_backtest": (1, "lag features at calendar-day grain"),
    }
    offenders = {}
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        n = single_partition_windows(df)
        allowed, _why = WHITELIST.get(name, (0, ""))
        if n > allowed:
            offenders[name] = n
    assert not offenders, (
        f"row-grain single-partition windows (not whitelisted): {offenders} — "
        "rebase onto operators/windows.global_* or whitelist with a bounded-grain justification"
    )


def test_r6_shared_subtree_scan_ceilings(spark, sf_dir):
    """Round-6 optimization gates: queries whose shared subtrees were
    re-evaluated once per consumer branch (up to 160 parquet scans of
    one table in q223's final plan) are now materialized once via
    eager localCheckpoint / cached points. Pin the FINAL-plan parquet
    scan count so a refactor cannot silently reintroduce the
    multiplication — the checkpoint fill jobs add at most the second
    number of construction-time scans, which this gate does not see.
    Ceilings are the post-fix counts + 0 slack."""
    import re as _re

    from patterns_devkit_spark.plans.inspect import explain_str

    CEILINGS = {
        "q223_bfs_khop": 0,               # was 160 (edge build per hop)
        "q256_fdr_screen": 0,             # was 48 (tot/obs/ranked re-runs)
        "q227_node_graph_features": 0,    # was 22 (edge build x5)
        "q210_kmeans_lloyd": 1,           # was 16 (points + argmin join-back)
        "q233_ordered_funnel": 0,         # was 14 (nested funnel stages)
        "q236_classifier_eval": 1,        # was 13 (points/argmin/confusion)
        "q222_association_rules": 0,      # was 10 (basket x6)
        "q196_hll_mergeable_distinct": 0, # was 9 (cust/merged x2 each)
        "q19_set_ops": 0,                 # was 6 (key sets x3 each)
        "q251_survival_hazard": 1,        # was 6 (firsts/horizon/n_total)
        "q215_exact_quantile_select": 2,  # was 6 (meta per broadcast branch)
        "q226_weighted_median": 2,        # was 6 (same)
        "q198_bm25_retrieval": 0,         # was 4 tokenize passes
        "q195_countmin_heavy_hitters": 0, # was 2 tf evaluations
        "q124_skew_profile": 0,           # was 2 key-count evaluations
        "q120_constraint_audit": 4,       # was 8 (per-check scans)
    }
    offenders = {}
    for name, ceiling in CEILINGS.items():
        df = QUERIES[name](spark, sf_dir)
        n = len(_re.findall(r"\(\d+\) Scan parquet", explain_str(df)))
        if n > ceiling:
            offenders[name] = (n, ceiling)
    assert not offenders, (
        f"final-plan parquet scans exceed the r6 single-evaluation ceilings: {offenders} "
        "(a shared subtree is being re-evaluated per consumer again)"
    )
