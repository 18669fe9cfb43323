"""Phase-split probe for sdk20_branch_merge (VERDICT r6 item 4).

Re-runs the sdk20 lifecycle with a wall timer + job count around each
engine call, so the 4.8 s bench entry decomposes into named phases.

    PYTHONPATH=. python tools/probe_sdk20.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from patterns_devkit_spark.queries import t, _temp_engine  # noqa: E402
from patterns_devkit_spark.session import get_spark  # noqa: E402
from tools.probe_ann import Phase  # noqa: E402


def run_once(spark, sf_dir: str) -> None:
    from patterns_devkit_spark.node.node import Table

    sc = spark.sparkContext
    eng = _temp_engine(spark)
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    t0 = time.time()
    with eng.node_context("w", outputs={"out": "o_main"}):
        tbl = Table("out", "w")
        with Phase(sc, "init+append+flush"):
            tbl.init(unique_on=["o_orderkey"], merge_on_read=True)
            tbl.append(o.coalesce(4))
            tbl.flush()
    with Phase(sc, "create_branch"):
        phys = eng.create_branch("o_main", "fix")
    with eng.node_context("b", outputs={"out": phys}):
        bt = Table("out", "w")
        with Phase(sc, "update_where DV"):
            bt.update_where({"o_orderstatus": "'B'"}, "o_orderkey % 101 = 0", vectorized=True)
        with Phase(sc, "delete_where DV"):
            bt.delete_where("o_orderkey % 97 = 0", vectorized=True)
    with Phase(sc, "merge_branch"):
        eng.merge_branch("o_main", "fix")
    with eng.node_context("r", outputs={"out": "o_main"}):
        with Phase(sc, "read+noop"):
            Table("out", "w").read_spark().write.format("noop").mode("overwrite").save()
    print(f"  {'TOTAL':<38} {time.time() - t0:7.3f}s")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("probe_sdk20")
    spark.sparkContext.setLogLevel("ERROR")
    run_once(spark, sf_dir)  # warm-up
    for i in range(reps):
        spark.catalog.clearCache()
        print(f"-- sdk20 rep {i} --")
        run_once(spark, sf_dir)


if __name__ == "__main__":
    main()
