"""Fine-grain phase probe INSIDE merge_branch for sdk20 (VERDICT r7
item 4): replicates Engine.merge_branch's body with a Phase timer
around each internal step, so the ~21-job merge decomposes.

    PYTHONPATH=. python tools/probe_sdk20_fine.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from patterns_devkit_spark.queries import t, _temp_engine  # noqa: E402
from patterns_devkit_spark.session import get_spark  # noqa: E402
from tools.probe_ann import Phase  # noqa: E402


def run_once(spark, sf_dir: str) -> None:
    from patterns_devkit_spark.node.node import Table

    sc = spark.sparkContext
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

    # ---- merge_branch body, instrumented ----
    t0 = time.time()
    table, branch = "o_main", "fix"
    cat = eng.catalog
    meta = cat.table_meta(table) or {}
    info = (meta.get("branches") or {}).get(branch)
    keys = meta.get("unique_on")
    with eng.node_context("__branch__", outputs={"b": info["table"], "m": table}):
        bt, mt = Table("b", "w"), Table("m", "w")
        eng._check_branch_schemas("merge_branch", table, branch, mt, bt)
        with Phase(sc, "m1 branch change_feed build"):
            feed = bt.change_feed(info["fork_branch"], key_cols=list(keys))
        with Phase(sc, "m2 read fork base"):
            base = mt.read_spark(version=info["fork_main"])
        with Phase(sc, "m3 suppress+localCheckpoint"):
            feed = eng._suppress_echoes(feed, base, list(keys)).localCheckpoint()
        with Phase(sc, "m4 feed.count"):
            n_changes = feed.count()
        if n_changes:
            with Phase(sc, "m5 main change_feed build"):
                main_changed = (
                    mt.change_feed(info["fork_main"], key_cols=list(keys))
                    .select(*keys)
                    .distinct()
                )
            with Phase(sc, "m6 conflict probe collect"):
                sample = (
                    feed.select(*keys)
                    .join(main_changed, on=list(keys), how="inner")
                    .limit(5)
                    .collect()
                )
            assert not sample
            with Phase(sc, "m7 apply_cdc"):
                mt.apply_cdc(feed)
    with Phase(sc, "m8 drop_branch"):
        eng.drop_branch(table, branch)
    print(f"  {'MERGE TOTAL':<38} {time.time() - t0:7.3f}s  n_changes={n_changes}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("probe_sdk20_fine")
    spark.sparkContext.setLogLevel("ERROR")
    run_once(spark, sf_dir)  # warm-up
    for i in range(reps):
        spark.catalog.clearCache()
        print(f"-- merge fine rep {i} --")
        run_once(spark, sf_dir)


if __name__ == "__main__":
    main()
