"""Lakehouse maintenance tour: the merge-on-read / branching feature
set composed end to end on one table (run via its test, or import
`main(engine, sf_dir)`).

1.  Load customers as a merge-on-read table (unique_on + stats on the
    key so upsert probes file-skip).
2.  Right-to-be-forgotten: DELETE one nation's customers as pure
    metadata (deletion vectors — no file rewritten; time travel still
    serves the pre-delete version until GC).
3.  Risky backfill starts on a LONG-LIVED BRANCH: fork zero-copy,
    rewrite a segment on the branch while main keeps moving.
4.  Main keeps moving: a scattered vectorized correction, then a VIP
    bonus applied with the standard SQL `MERGE INTO` statement routed
    through execute_sql (compiles to one CDC batch on the DV path).
5.  The branch catches up with `sync_branch` (main's feed applied to
    the branch, corrections win conflicts, fork point advances), then
    `merge_branch` lands ONLY the branch's surviving edits — the
    synced rows are echo-suppressed.
6.  Export hygiene: purge_deletes() materializes the masks by
    rewriting only masked files, then a replica converges via
    change_feed -> apply_cdc, consumed under `pin_window` so a
    concurrent vacuum cannot collect the feed's base version.

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

    # Everything below churns main through MORE versions than the
    # retention window keeps — v_forgotten (the replica's feed base)
    # survives ONLY because the pin holds it open (engine.pin_window:
    # GC in this or any other process skips pinned versions)
    with engine.pin_window("customers", out["v_forgotten"]):
        # 3. risky backfill forks NOW — main will keep moving underneath
        phys = engine.create_branch("customers", "backfill")
        with engine.node_context("backfill", outputs={"out": phys}):
            bt = Table("out", "w")
            out["n_backfilled"] = bt.update_where(
                {"c_acctbal": "round(c_acctbal * 1.1, 2)"}, "c_nationkey = 3"
            )

        # 4. main keeps moving while the branch lives: a scattered
        # correction, then a VIP bonus via the standard SQL MERGE statement
        with engine.node_context("corrections", outputs={"out": "customers", "adj": "adjustments"}):
            t = Table("out", "w")
            out["n_corrected"] = t.update_where(
                {"c_acctbal": "0.0"}, "c_custkey % 97 = 0", vectorized=True
            )
            adj = Table("adj", "w")
            adj.replace(
                cust.filter("c_custkey % 131 = 0").select(
                    "c_custkey", F.lit(5.0).alias("bonus")
                ).coalesce(1)
            )
            adj.flush()
            out["n_bonus"] = adj.record_count
            t.execute_sql(
                "MERGE INTO {{ this }} AS t USING {{ adjustments }} AS s "
                "ON t.c_custkey = s.c_custkey "
                "WHEN MATCHED THEN UPDATE SET t.c_acctbal = round(t.c_acctbal + s.bonus, 2)"
            )

        # 5. the long-lived branch catches up, then lands: corrections win
        # the overlap (a nation-3 VIP keeps main's bonus, not the bump);
        # the merge carries ONLY the branch's surviving edits — everything
        # synced in is echo-suppressed
        out["n_synced"] = engine.sync_branch("customers", "backfill", on_conflict="main_wins")
        out["n_merged"] = engine.merge_branch("customers", "backfill")

        with engine.node_context("maint", outputs={"out": "customers"}):
            t = Table("out", "w")
            # 6. hygiene before export: materialize the remaining masks
            # bounded (only masked files rewrite)
            out["n_purged"] = t.purge_deletes()
            out["v_final"] = t.get_active_version().version_id
            out["final_count"] = len(t.read_spark().select("c_custkey").collect())

        # replica converges on the change batch alone (the outer
        # pin_window still holds v_forgotten open)
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
