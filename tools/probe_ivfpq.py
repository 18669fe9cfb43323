"""Fine-grained phase probe inside ivfpq_topk's construction chain.

Replicates the q264 body with a Phase() around every driver action so
each sequential job's cost is visible (VERDICT r6 item 1).

    PYTHONPATH=. python tools/probe_ivfpq.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from patterns_devkit_spark.operators import det_hash as dh  # noqa: E402
from patterns_devkit_spark.queries import t  # noqa: E402
from patterns_devkit_spark.session import get_spark  # noqa: E402
from tools.probe_ann import Phase  # noqa: E402


def run_once(spark, sf_dir: str) -> None:
    sc = spark.sparkContext
    candidates = t(spark, sf_dir, "embeddings")
    queries = candidates.filter(F.col("vec_id") < 20)
    id_col, vec_col, dim, m, k = "vec_id", "embedding", 64, 8, 5

    t0 = time.time()
    with Phase(sc, "J1 count"):
        n = candidates.count()
    with Phase(sc, "J2 repartition+persist (lazy)"):
        e = (
            candidates.select(F.col(id_col).alias("id"), dh.quantized_embedding(vec_col).alias("ei"))
            .repartition(dh._ann_partitions(sc, n))
            .persist()
        )
    nlist = max(16, n // 256)
    n_codes = min(256, max(16, n // 64))
    seeds = e.orderBy("id").limit(nlist).select(F.col("id").alias("cid"), "ei")
    k_eff = min(nlist, n)
    with Phase(sc, "J3 seed collect"):
        seed_rows = sorted(seeds.collect(), key=lambda r: r["cid"])
    super_src = seed_rows[: dh._isqrt_super(nlist)]
    SC = np.array([r["ei"] for r in super_src], dtype="int64")
    sgids = np.array([r["cid"] for r in super_src], dtype="int64")
    with Phase(sc, "J4 twolevel (partials collect)"):
        a2c, cent1 = dh.twolevel_coarse(
            e, seeds, SC, sgids,
            mean_sql="CAST(floor(sum(s) / sum(n)) AS BIGINT)",
            emit_residuals=True, k=k_eff, seed_rows=seed_rows,
        )
    with Phase(sc, "J5 res persist (lazy)"):
        res = a2c.persist()
    with Phase(sc, "J6 rseed collect (fills res cache)"):
        rseed_rows = res.orderBy("id").limit(n_codes).collect()
    S = np.array([r["ei"] for r in rseed_rows], dtype="int64")
    ids0 = np.arange(len(rseed_rows), dtype="int64")
    dsub = dim // m
    books0 = [(ids0, S[:, s * dsub:(s + 1) * dsub]) for s in range(m)]
    with Phase(sc, "J7 pq partials collect"):
        pc_rows = (
            dh._pq_partials(res, books0)
            .groupBy("s", "code", "j")
            .agg(F.floor(F.sum("sm") / F.sum("n")).cast("long").alias("c"))
            .collect()
        )
    print(f"  {'CONSTRUCT TOTAL':<38} {time.time() - t0:7.3f}s")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("probe_ivfpq")
    spark.sparkContext.setLogLevel("ERROR")
    run_once(spark, sf_dir)  # warm-up
    for i in range(reps):
        spark.catalog.clearCache()
        print(f"-- ivfpq construct rep {i} --")
        run_once(spark, sf_dir)


if __name__ == "__main__":
    main()
