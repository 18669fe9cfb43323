"""Property gates for the mergeable-sketch batch (operators/sketches.py,
queries_sketch.py). Parity pins the outputs bit-for-bit against DuckDB;
these tests pin the sketch LAWS the outputs rely on."""
import pytest
from pyspark.sql import functions as F

from patterns_devkit_spark.operators import sketches as sk
from patterns_devkit_spark.queries import QUERIES


def test_countmin_never_underestimates(spark, sf_dir):
    """The count-min law: est >= true count for EVERY key (one-sided
    error), not just the reported top-20."""
    from patterns_devkit_spark.operators.text import tokens
    from patterns_devkit_spark.queries import t

    docs = t(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(tokens("text")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    sketch = sk.cms_build(tf, key_col="token", weight_col="tf")
    est = sk.cms_estimate(tf, sketch, key_col="token", weight_col="tf")
    assert est.filter(F.col("est") < F.col("w")).count() == 0
    # sketch is genuinely bounded regardless of vocab size
    assert sketch.count() <= sk.CMS_DEPTH * sk.CMS_WIDTH


def test_countmin_linearity_raw_rows_equal_weighted(spark):
    """Folding raw occurrences (weight 1 each) gives the SAME sketch as
    folding per-key totals — the linearity that lets executors sketch
    partitions independently at 100 TB."""
    raw = spark.createDataFrame(
        [(k,) for k in ["a", "a", "a", "b", "b", "c"]], "key string"
    ).withColumn("w", F.lit(1))
    weighted = raw.groupBy("key").agg(F.sum("w").alias("w"))
    s_raw = {(r["j"], r["b"]): r["cnt"] for r in sk.cms_build(raw).collect()}
    s_wtd = {(r["j"], r["b"]): r["cnt"] for r in sk.cms_build(weighted).collect()}
    assert s_raw == s_wtd


def test_hll_merge_equals_direct(spark, sf_dir):
    """Register merge (elementwise max over partials) == direct
    computation at the coarse grain — the mergeability law."""
    from patterns_devkit_spark.queries import t

    cust = (
        t(spark, sf_dir, "customer")
        .join(t(spark, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_regionkey", "n_nationkey", "c_custkey")
    )
    fine = sk.hll_registers(cust, "c_custkey", ["n_regionkey", "n_nationkey"])
    merged = fine.groupBy("n_regionkey", "reg").agg(F.max("rho").alias("rho"))
    direct = sk.hll_registers(cust, "c_custkey", ["n_regionkey"])
    m = {(r["n_regionkey"], r["reg"]): r["rho"] for r in merged.collect()}
    d = {(r["n_regionkey"], r["reg"]): r["rho"] for r in direct.collect()}
    assert m == d


def test_hll_estimate_tracks_cardinality(spark):
    """The estimator is monotone-ish and lands within a loose band
    (it's a 64-register sketch; the oracle pins exactness, this pins
    sanity): 1000 distinct keys -> est within 35%."""
    df = spark.range(1000).select(F.col("id").alias("k")).withColumn("g", F.lit(1))
    regs = sk.hll_registers(df, "k", ["g"])
    est = sk.hll_estimate(regs, ["g"]).collect()[0]["n_est"]
    assert 650 <= est <= 1350, est


def test_hll_rejects_non_power_of_two_registers(spark):
    with pytest.raises(ValueError, match="power of two"):
        sk.hll_register("x", m=48)


def test_semdedup_verdicts_are_consistent(spark, sf_dir):
    """Every dup points to a LOWER id in the SAME cluster, and the
    integer threshold agrees with float cosine to within quantization
    noise (>= 0.9499)."""
    out = QUERIES["q197_semdedup"](spark, sf_dir).collect()
    cid = {r["vec_id"]: r["cid"] for r in out}
    dups = [(r["vec_id"], r["dup_of"]) for r in out if r["is_dup"] == 1]
    assert all(d < v and cid[d] == cid[v] for v, d in dups)
    if dups:
        from patterns_devkit_spark.queries import t

        emb = {
            r["vec_id"]: r["embedding"]
            for r in t(spark, sf_dir, "embeddings").collect()
        }
        import math

        for v, d in dups[:20]:
            a, b = emb[v], emb[d]
            dot = sum(x * y for x, y in zip(a, b))
            cos = dot / math.sqrt(sum(x * x for x in a) * sum(y * y for y in b))
            assert cos >= 0.9499, (v, d, cos)


def test_bottomk_sample_is_mergeable(spark):
    """Bottom-k of a union == bottom-k of merged per-part bottom-k's —
    the law that lets q200's sample combine per-partition partials
    with O(k) state instead of a group-wide sort."""
    from patterns_devkit_spark.operators.det_hash import md5_long

    k = 16
    df = spark.range(500).select(F.col("id"), md5_long(F.col("id").cast("string")).alias("h"))
    direct = [r["id"] for r in df.orderBy("h", "id").limit(k).collect()]
    parts = [df.filter(F.col("id") % 3 == i).orderBy("h", "id").limit(k) for i in range(3)]
    merged_df = parts[0].unionByName(parts[1]).unionByName(parts[2])
    merged = [r["id"] for r in merged_df.orderBy("h", "id").limit(k).collect()]
    assert direct == merged
