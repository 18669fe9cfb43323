"""Deterministic synthetic fixture generator — same schema/domains as
the driver's /root/testdata tables (TESTDATA.md / FIXTURES.md), at ANY
scale factor. Used to produce the sf1 (100x-of-correctness-sf) tier the
round-3 verdict asked for ("run the engine at a true 100x").

Design: the generator is itself scale-shaped — every table is a
`spark.range` plus codegen'd column expressions (xxhash64-derived
uniforms, seed folded into the salt), no Python RNG, no driver loops,
so it would generate the 100 TB tier on a cluster the same way it
generates 6M rows on local[32]. Determinism: row content is a pure
function of (row id, salt) — independent of partitioning or order.

Domains were profiled from the driver's sf0.1 tier (see git history /
SCALE.md §64): same tables, same column names/types, same value
domains (mktsegments, part vocab 8x8, Brand#1-25, 6 p_types, 31-word
document vocab, en 41% + 4 langs, 20 sources, dim-64 unit embeddings
in 10 label clusters, events over 2024-01 with near-monotone ts).
Row counts: customer 150k/sf, supplier 10k/sf, part 200k/sf, orders
1.5M/sf, lineitem ~3.9x orders (1+Binomial(6,.5) lines/order), events
1M/sf, documents max(500, 50k/sf), embeddings max(500, 20k/sf) — the
same curves the driver tiers follow. The documents corpus embeds
near-dup structure (2% word-perturbed copies, ~1% exact copies) so the
dedup/similarity families have real candidates at every sf.

Usage: python tools/gen_testdata.py <sf> <outdir> [--files N]
"""
from __future__ import annotations

import math
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
_DENOM = float(1 << 40)

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["zh", "fr", "es", "de"]  # en handled separately (41%)
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]


def _u(key, salt: int):
    """Uniform [0,1) as a pure codegen'd function of (key, salt)."""
    return F.pmod(F.xxhash64(key, F.lit(SEED), F.lit(salt)), F.lit(1 << 40)) / F.lit(_DENOM)


def _h(key, salt: int, mod: int):
    """Uniform integer in [0, mod)."""
    return F.pmod(F.xxhash64(key, F.lit(SEED), F.lit(salt)), F.lit(mod)).cast("int")


def _pick(arr: list[str], key, salt: int):
    return F.element_at(F.array(*[F.lit(x) for x in arr]), _h(key, salt, len(arr)) + 1)


def _money(key, salt: int, lo: float, hi: float):
    return F.round(F.lit(lo) + _u(key, salt) * F.lit(hi - lo), 2)


def gen_region(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(REGIONS)], "r_regionkey int, r_name string"
    )


def gen_nation(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(i, f"NATION_{i}", i % 5) for i in range(25)],
        "n_nationkey int, n_name string, n_regionkey int",
    )


def gen_customer(spark: SparkSession, n: int) -> DataFrame:
    k = F.col("id")
    return spark.range(n).select(
        k.alias("c_custkey"),
        F.format_string("Customer#%09d", k).alias("c_name"),
        _h(k, 101, 25).alias("c_nationkey"),
        _money(k, 102, -1000.0, 10000.0).alias("c_acctbal"),
        _pick(SEGMENTS, k, 103).alias("c_mktsegment"),
    )


def gen_supplier(spark: SparkSession, n: int) -> DataFrame:
    k = F.col("id")
    return spark.range(n).select(
        k.alias("s_suppkey"),
        F.format_string("Supplier#%09d", k).alias("s_name"),
        _h(k, 111, 25).alias("s_nationkey"),
        _money(k, 112, -1000.0, 10000.0).alias("s_acctbal"),
    )


def gen_part(spark: SparkSession, n: int) -> DataFrame:
    k = F.col("id")
    return spark.range(n).select(
        k.alias("p_partkey"),
        F.concat(_pick(ADJS, k, 121), F.lit(" "), _pick(NOUNS, k, 122)).alias("p_name"),
        F.format_string("Brand#%d", _h(k, 123, 25) + 1).alias("p_brand"),
        _pick(PTYPES, k, 124).alias("p_type"),
        (_h(k, 125, 50) + 1).alias("p_size"),
        F.round(F.lit(900.0) + F.pmod(k, F.lit(1000)) * F.lit(0.1), 2).alias("p_retailprice"),
    )


def gen_orders(spark: SparkSession, n: int, n_cust: int) -> DataFrame:
    k = F.col("id")
    day = _h(k, 134, 2405)
    return spark.range(n).select(
        k.alias("o_orderkey"),
        F.pmod(F.xxhash64(k, F.lit(SEED), F.lit(131)), F.lit(n_cust)).alias("o_custkey"),
        _pick(["O", "P", "F"], k, 132).alias("o_orderstatus"),
        _money(k, 133, 1000.0, 500000.0).alias("o_totalprice"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("1995-01-01 00:00:00")) + day.cast("long") * 86400
        ).alias("o_orderdate"),
        _pick(PRIORITIES, k, 135).alias("o_orderpriority"),
    )


def gen_lineitem(spark: SparkSession, n_orders: int, n_part: int, n_supp: int) -> DataFrame:
    # lines per order = 1 + Binomial(6, 0.5): mean 4, range 1..7 —
    # matches the driver's ~3.9 lines/order Poisson-ish shape.
    ok = F.col("o")
    nlines = (
        F.lit(1)
        + sum(
            F.when(_u(F.col("id"), 140 + i) < 0.5, 1).otherwise(0) for i in range(6)
        )
    )
    base = (
        spark.range(n_orders)
        .withColumn("ln", F.explode(F.sequence(F.lit(1), nlines)))
        .select(F.col("id").alias("o"), "ln")
    )
    k = F.xxhash64(ok, F.col("ln").cast("long"), F.lit(SEED))
    day = F.pmod(F.xxhash64(k, F.lit(157)), F.lit(2498)).cast("long")
    return base.select(
        ok.alias("l_orderkey"),
        F.pmod(F.xxhash64(k, F.lit(151)), F.lit(n_part)).alias("l_partkey"),
        F.pmod(F.xxhash64(k, F.lit(152)), F.lit(n_supp)).alias("l_suppkey"),
        F.col("ln").cast("int").alias("l_linenumber"),
        (F.pmod(F.xxhash64(k, F.lit(153)), F.lit(50)) + 1).cast("double").alias("l_quantity"),
        F.round(
            F.lit(900.0)
            + F.pmod(F.xxhash64(k, F.lit(154)), F.lit(1 << 40)) / F.lit(_DENOM) * 104100.0,
            2,
        ).alias("l_extendedprice"),
        F.round(F.pmod(F.xxhash64(k, F.lit(155)), F.lit(11)).cast("double") / 100.0, 2).alias(
            "l_discount"
        ),
        F.round(F.pmod(F.xxhash64(k, F.lit(156)), F.lit(9)).cast("double") / 100.0, 2).alias(
            "l_tax"
        ),
        F.element_at(
            F.array(F.lit("A"), F.lit("N"), F.lit("R")),
            F.pmod(F.xxhash64(k, F.lit(158)), F.lit(3)).cast("int") + 1,
        ).alias("l_returnflag"),
        F.element_at(
            F.array(F.lit("O"), F.lit("F")),
            F.pmod(F.xxhash64(k, F.lit(159)), F.lit(2)).cast("int") + 1,
        ).alias("l_linestatus"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("1995-01-02 00:00:00")) + day * 86400
        ).alias("l_shipdate"),
    )


def gen_events(spark: SparkSession, n: int, n_users: int) -> DataFrame:
    k = F.col("id")
    span_us = 30 * 86400 * 1_000_000  # 2024-01, 30 days
    step = span_us / max(n, 1)
    base_us = F.lit(1704067200000000).cast("long")  # 2024-01-01 UTC in micros
    off = (k.cast("double") * F.lit(step) + _u(k, 161) * F.lit(step * 0.999)).cast("long")
    heavy = _u(k, 165) > 0.95
    return spark.range(n).select(
        k.alias("event_id"),
        F.timestamp_micros(base_us + off).alias("ts"),
        F.pmod(F.xxhash64(k, F.lit(SEED), F.lit(162)), F.lit(n_users)).alias("user_id"),
        _pick(EVENT_TYPES, k, 163).alias("event_type"),
        F.round(
            F.when(heavy, F.lit(100.0) + _u(k, 166) * 460.0).otherwise(_u(k, 164) * 100.0), 2
        ).alias("value"),
        F.format_string('{"k": %d}', _h(k, 167, 100)).alias("props"),
    )


def gen_documents(spark: SparkSession, n: int) -> DataFrame:
    k = F.col("id")
    # dup structure: id%97==96 -> exact copy of id-2; id%50==49 ->
    # near-dup of id-1 with ~8% word substitutions.
    near = (F.pmod(k, F.lit(50)) == 49) & (k >= 1)
    exact = (F.pmod(k, F.lit(97)) == 96) & (k >= 2) & ~near
    base = F.when(exact, k - 2).otherwise(F.when(near, k - 1).otherwise(k))
    voc = F.array(*[F.lit(w) for w in VOCAB])
    n_words = (F.lit(10) + F.pmod(F.xxhash64(base, F.lit(SEED), F.lit(171)), F.lit(91))).cast("int")
    j = F.col("j")
    base_word = F.element_at(
        voc, F.pmod(F.xxhash64(F.col("b"), j.cast("long"), F.lit(SEED), F.lit(172)), F.lit(31)).cast("int") + 1
    )
    sub_word = F.element_at(
        voc, F.pmod(F.xxhash64(F.col("doc_id"), j.cast("long"), F.lit(SEED), F.lit(173)), F.lit(31)).cast("int") + 1
    )
    use_sub = F.col("near") & (
        F.pmod(F.xxhash64(F.col("doc_id"), j.cast("long"), F.lit(SEED), F.lit(174)), F.lit(100)) < 8
    )
    # collect_list has no ordering guarantee — sort (j, w) structs
    # inside the agg so text is deterministic under any partitioning.
    words = (
        spark.range(n)
        .select(
            k.alias("doc_id"), base.alias("b"), near.alias("near"),
            F.explode(F.sequence(F.lit(1), n_words)).alias("j"),
        )
        .select(
            "doc_id", "b", "j",
            F.when(use_sub, sub_word).otherwise(base_word).alias("w"),
        )
        .groupBy("doc_id", "b")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(F.struct("j", "w"))), lambda s: s["w"]),
                " ",
            ).alias("text")
        )
    )
    bk = F.col("b")
    return words.select(
        "doc_id",
        "text",
        F.when(F.pmod(F.xxhash64(bk, F.lit(SEED), F.lit(175)), F.lit(100)) < 41, F.lit("en"))
        .otherwise(
            F.element_at(
                F.array(*[F.lit(x) for x in LANGS]),
                F.pmod(F.xxhash64(bk, F.lit(SEED), F.lit(176)), F.lit(4)).cast("int") + 1,
            )
        )
        .alias("lang"),
        F.format_string(
            "src%d", F.pmod(F.xxhash64(F.col("doc_id"), F.lit(SEED), F.lit(177)), F.lit(20)).cast("int")
        ).alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )


def gen_embeddings(spark: SparkSession, n: int, dim: int = 64) -> DataFrame:
    k = F.col("id")
    label = _h(k, 181, 10)
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            # cluster center: pure function of (label, j)
            (F.pmod(F.xxhash64(F.col("label").cast("long"), j.cast("long"), F.lit(SEED), F.lit(182)), F.lit(1 << 40))
             / F.lit(_DENOM) - 0.5) * 2.0
            # per-vector noise
            + (F.pmod(F.xxhash64(F.col("vec_id"), j.cast("long"), F.lit(SEED), F.lit(183)), F.lit(1 << 40))
               / F.lit(_DENOM) - 0.5) * 0.5
        ),
    )
    with_raw = spark.range(n).select(k.alias("vec_id"), label.alias("label")).withColumn("raw", raw)
    norm = F.sqrt(F.aggregate("raw", F.lit(0.0), lambda a, x: a + x * x))
    return with_raw.select(
        "vec_id",
        F.transform("raw", lambda x: (x / norm).cast("float")).alias("embedding"),
        F.col("label").cast("int").alias("label"),
    )


def generate(spark: SparkSession, sf: float, outdir: str, n_files: int = 8) -> None:
    n_cust = int(150000 * sf)
    n_supp = int(10000 * sf)
    n_part = int(200000 * sf)
    n_ord = int(1500000 * sf)
    n_evt = int(1000000 * sf)
    n_users = max(1, int(15000 * sf))
    n_doc = max(500, int(50000 * sf))
    n_emb = max(500, int(20000 * sf))
    small = dict(
        region=gen_region(spark),
        nation=gen_nation(spark),
        customer=gen_customer(spark, n_cust),
        supplier=gen_supplier(spark, n_supp),
        part=gen_part(spark, n_part),
    )
    big = dict(
        orders=gen_orders(spark, n_ord, n_cust),
        lineitem=gen_lineitem(spark, n_ord, n_part, n_supp),
        events=gen_events(spark, n_evt, n_users),
        documents=gen_documents(spark, n_doc),
        embeddings=gen_embeddings(spark, n_emb),
    )
    import glob
    import os
    import shutil

    for name, df in {**small, **big}.items():
        files = 1 if name in small else max(1, min(n_files, int(math.ceil(sf * 8))))
        tmp = f"{outdir}/__tmp_{name}"
        df.repartition(files).write.mode("overwrite").parquet(tmp)
        parts = sorted(glob.glob(f"{tmp}/part-*.parquet"))
        if len(parts) == 1:
            shutil.move(parts[0], f"{outdir}/{name}.parquet")
            shutil.rmtree(tmp)
        else:
            # multi-file: keep as a directory named <name>.parquet
            dest = f"{outdir}/{name}.parquet"
            if os.path.isdir(dest) or os.path.isfile(dest):
                shutil.rmtree(dest) if os.path.isdir(dest) else os.remove(dest)
            os.makedirs(dest)
            for p in parts:
                shutil.move(p, dest)
            shutil.rmtree(tmp)
        print(f"wrote {name}", flush=True)


if __name__ == "__main__":
    sf = float(sys.argv[1])
    outdir = sys.argv[2]
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    import os

    os.makedirs(outdir, exist_ok=True)
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("gen_testdata")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("PDS_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    generate(spark, sf, outdir, n_files)
    spark.stop()
    print("DONE")
