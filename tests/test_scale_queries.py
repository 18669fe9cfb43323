"""Property gates for the scale-pattern battery (queries_scale.py) —
invariants the DuckDB oracle can't state (it replays the same
computation): Bloom's no-false-negative law against the PLAIN join,
bitmap distinct against COUNT(DISTINCT), the join pre-flight's
cardinality prediction against the ACTUAL join, ABC conservation."""
from pyspark.sql import functions as F

from patterns_devkit_spark.queries import QUERIES, t


def test_bloom_prune_no_false_negatives(spark, sf_dir):
    """q159's exact results must equal the plain (bloom-free) join —
    the filter may only add candidates, never drop matches."""
    res = {
        r["o_orderpriority"]: (r["n_matched"], r["matched_cents"])
        for r in QUERIES["q159_bloom_prune"](spark, sf_dir).collect()
    }
    cust = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900).select("c_custkey")
    plain = (
        t(spark, sf_dir, "orders")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
        )
    )
    expected = {r["o_orderpriority"]: (r["n"], r["cents"]) for r in plain.collect()}
    assert {k: v for k, v in res.items() if v[0] > 0} == expected
    # and the bloom really pruned: candidates are a strict subset of orders
    n_orders = t(spark, sf_dir, "orders").count()
    n_cand = sum(
        r["n_candidates"] for r in QUERIES["q159_bloom_prune"](spark, sf_dir).collect()
    )
    assert n_cand < n_orders


def test_bitmap_distinct_matches_count_distinct(spark, sf_dir):
    """q164's popcount-of-bitmap daily numbers == COUNT(DISTINCT)."""
    res = {r["day"]: r["n_active"] for r in QUERIES["q164_bitmap_distinct"](spark, sf_dir).collect()}
    ev = t(spark, sf_dir, "events")
    exact = {
        r["day"]: r["n"]
        for r in ev.groupBy(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert res == exact


def test_join_preflight_predicts_actual_cardinality(spark, sf_dir):
    """q172's est_join_rows is EXACT for the equi-join it profiles."""
    row = QUERIES["q172_join_explosion_audit"](spark, sf_dir).collect()[0]
    actual = (
        t(spark, sf_dir, "lineitem")
        .join(t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert row["est_join_rows"] == actual


def test_abc_classification_conserves_revenue(spark, sf_dir):
    """q169: class cents sum to global revenue; the A class exists and
    out-earns C per part (min A part cents >= max C boundary shape)."""
    rows = {r["abc"]: r for r in QUERIES["q169_abc_classification"](spark, sf_dir).collect()}
    li = t(spark, sf_dir, "lineitem")
    total = li.agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("c")
    ).collect()[0]["c"]
    assert sum(r["class_cents"] for r in rows.values()) == total
    assert "A" in rows
    if "C" in rows:
        assert rows["A"]["min_part_cents"] >= rows["C"]["min_part_cents"]


def test_snapshot_diff_counts_are_consistent(spark, sf_dir):
    """q176: added/removed/changed/unchanged partition the key space —
    totals reconcile with the two snapshot sizes."""
    rows = QUERIES["q176_snapshot_diff"](spark, sf_dir).collect()
    n_added = sum(r["n_added"] for r in rows)
    n_removed = sum(r["n_removed"] for r in rows)
    n_common = sum(r["n_changed"] + r["n_unchanged"] for r in rows)
    o = t(spark, sf_dir, "orders")
    n_a = o.filter(F.col("o_orderkey") % 103 != 0).count()
    n_b = o.filter(F.col("o_orderkey") % 101 != 0).count()
    assert n_common + n_removed == n_a
    assert n_common + n_added == n_b
    assert sum(r["n_changed"] for r in rows) > 0


def test_q206_prefix_filter_candidates_complete(spark, sf_dir):
    """Prefix-filter completeness law (the reason q206's candidate cut
    is safe): its surviving pairs must EQUAL the uncapped brute-force
    inverted-index pairs at Jaccard >= 1/2 — no true pair lost to the
    prefix restriction."""
    from pyspark.sql import functions as F

    from patterns_devkit_spark.operators.dedup import ngram_jaccard_pairs
    from patterns_devkit_spark.queries import QUERIES, t

    got = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["q206_prefix_filter_join"](spark, sf_dir).collect()
    }
    docs = t(spark, sf_dir, "documents")
    brute = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", 3)
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    }
    assert got == brute and brute  # equal AND non-trivial
