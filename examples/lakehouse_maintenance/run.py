"""Lakehouse maintenance tour: the merge-on-read / branching feature
set composed end to end on one table (run via its test, or import
`main(engine, sf_dir)`).

1.  Load customers as a merge-on-read table (unique_on + stats on the
    key so upsert probes file-skip).
2.  Right-to-be-forgotten: DELETE one nation's customers as pure
    metadata (deletion vectors — no file rewritten; time travel still
    serves the pre-delete version until GC).
3.  Corrections feed: a scattered merge-on-read upsert (masks old
    images, appends the batch).
4.  Risky backfill on a BRANCH: fork zero-copy, rewrite a segment on
    the branch, merge back with conflict detection.
5.  Export hygiene: purge_deletes() materializes the masks by
    rewriting only masked files, then a replica converges via
    change_feed -> apply_cdc (computed O(change) while the lineage
    was DV-shaped).

Every step's expected state is asserted by the accompanying test
(tests/test_example_lakehouse_maintenance.py)."""
from pyspark.sql import functions as F

from patterns_devkit_spark import Table


def main(engine, sf_dir):
    spark = engine.spark
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )

    out = {}
    with engine.node_context("load", outputs={"out": "customers"}):
        t = Table("out", "w")
        t.init(unique_on=["c_custkey"], merge_on_read=True, stat_columns=["c_custkey"])
        t.append(cust.repartition(4))
        t.flush()
        out["v_loaded"] = t.get_active_version().version_id

        # 2. right-to-be-forgotten: nation 7's customers vanish as
        # metadata — every parquet file is carried, none rewritten
        out["n_forgotten"] = t.delete_where("c_nationkey = 7", vectorized=True)
        out["v_forgotten"] = t.get_active_version().version_id

        # 3. corrections: zero the balance of every 97th customer
        out["n_corrected"] = t.update_where(
            {"c_acctbal": "0.0"}, "c_custkey % 97 = 0", vectorized=True
        )

    # 4. risky backfill on a branch: bump nation 3's balances by 10%
    phys = engine.create_branch("customers", "backfill")
    with engine.node_context("backfill", outputs={"out": phys}):
        bt = Table("out", "w")
        out["n_backfilled"] = bt.update_where(
            {"c_acctbal": "round(c_acctbal * 1.1, 2)"}, "c_nationkey = 3"
        )
    out["n_merged"] = engine.merge_branch("customers", "backfill")

    with engine.node_context("maint", outputs={"out": "customers"}):
        t = Table("out", "w")
        # 5. hygiene before export: materialize the remaining masks
        # bounded (only masked files rewrite)
        out["n_purged"] = t.purge_deletes()
        out["v_final"] = t.get_active_version().version_id
        out["final_count"] = len(t.read_spark().select("c_custkey").collect())

    # replica converges on the change batch alone
    with engine.node_context("rep", outputs={"out": "customers_replica"}):
        r = Table("out", "w")
        r.init(unique_on=["c_custkey"])
        with engine.node_context("src", outputs={"out": "customers"}):
            src = Table("out", "w")
            r.append(src.read_spark(version=out["v_forgotten"]))
            r.flush()
            feed = src.change_feed(out["v_forgotten"])
        r.apply_cdc(feed)
        out["replica_count"] = len(r.read_spark().select("c_custkey").collect())
    return out
