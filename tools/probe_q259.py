"""Phase-split probe INSIDE q259 (VERDICT r7 item 6): replicates the
query body with a Phase timer around each internal step so the 2.2 s
decomposes — checkpoint, prefix index, candidate join, verify.

    PYTHONPATH=. python tools/probe_q259.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from patterns_devkit_spark.operators.det_hash import distinct_shingles  # noqa: E402
from patterns_devkit_spark.queries import t  # noqa: E402
from patterns_devkit_spark.session import get_spark  # noqa: E402
from tools.probe_ann import Phase  # noqa: E402


def run_once(spark, sf_dir: str) -> None:
    sc = spark.sparkContext
    docs = t(spark, sf_dir, "documents")
    t0 = time.time()
    with Phase(sc, "p1 shingles localCheckpoint"):
        sh = distinct_shingles(docs, "doc_id", "text", 3).localCheckpoint()
    with Phase(sc, "p2 build lazy prefix/cand/verify"):
        dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).cast("long").alias("df"))
        sizes = sh.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
        w = Window.partitionBy("id").orderBy("df", "sh")
        ordered = sh.join(dfreq, "sh").withColumn("pos", F.row_number().over(w))
        prefix = (
            ordered.join(sizes, "id")
            .filter(F.col("pos") <= F.col("n_sh") - F.expr("(4 * n_sh + 4) DIV 5") + 1)
            .select("id", "sh")
        )
        a, b = prefix.alias("a"), prefix.alias("b")
        cand = (
            a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
    with Phase(sc, "p3 cand count (isolated)"):
        n_cand = cand.count()
    with Phase(sc, "p4 full query noop"):
        docsh = sh.groupBy("id").agg(F.sort_array(F.collect_list("sh")).alias("shl"))
        sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na"))
        sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb"))
        da = docsh.select(F.col("id").alias("id_a"), F.col("shl").alias("sha"))
        db = docsh.select(F.col("id").alias("id_b"), F.col("shl").alias("shb"))
        inter = (
            cand.join(sa, "id_a")
            .join(sb, "id_b")
            .filter(5 * F.least("na", "nb") >= 4 * F.greatest("na", "nb"))
            .join(da, "id_a")
            .join(db, "id_b")
            .select(
                "id_a", "id_b", "na", "nb",
                F.size(F.array_intersect("sha", "shb")).cast("long").alias("n_inter"),
            )
        )
        out = (
            inter.filter(9 * F.col("n_inter") >= 4 * (F.col("na") + F.col("nb")))
            .select(
                "id_a", "id_b", "n_inter",
                (F.col("na") + F.col("nb") - F.col("n_inter")).alias("n_union"),
                F.expr("CAST((1000 * n_inter) DIV (na + nb - n_inter) AS BIGINT)").alias("jac_millis"),
            )
            .orderBy("id_a", "id_b")
        )
        out.write.format("noop").mode("overwrite").save()
    print(f"  {'TOTAL':<38} {time.time() - t0:7.3f}s  n_cand={n_cand}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("probe_q259")
    spark.sparkContext.setLogLevel("ERROR")
    run_once(spark, sf_dir)  # warm-up
    for r in range(reps):
        spark.catalog.clearCache()
        print(f"-- rep {r} --")
        run_once(spark, sf_dir)


if __name__ == "__main__":
    main()
