"""examples/lakehouse_maintenance end-to-end: DV delete, MoR
corrections, branch backfill + merge, purge, and CDC replication
composed on one table — final state checked against a from-scratch
computation on the raw parquet."""
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.lakehouse_maintenance.run import main  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_lakehouse_maintenance_example(engine):
    out = main(engine, SF)
    spark = engine.spark
    cust = spark.read.parquet(f"{SF}/customer.parquet").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    survivors = cust.filter("c_nationkey <> 7")
    assert out["n_forgotten"] == cust.filter("c_nationkey = 7").count()
    assert out["n_corrected"] == survivors.filter("c_custkey % 97 = 0").count()
    assert out["n_backfilled"] == survivors.filter("c_nationkey = 3").count()
    # the long-lived branch caught up with ALL of main's movement
    # (corrections + SQL-MERGE bonus) before landing
    assert out["n_synced"] >= out["n_corrected"]
    # merge applies the value-changed backfill rows (nation-3 rows
    # whose 10% bump actually changes the stored balance)
    assert out["n_merged"] >= 1
    assert out["final_count"] == survivors.count() == out["replica_count"]

    # final content equals the closed-form expectation: corrections
    # zero %97, the MERGE bonus adds 5 to %131 ON TOP of corrections,
    # and the branch's 10% nation-3 bump lands only where main did not
    # touch the key (sync ran main_wins)
    base = F.when(F.col("c_custkey") % 97 == 0, F.lit(0.0)).otherwise(F.col("c_acctbal"))
    expect = survivors.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 131 == 0, F.round(base + 5.0, 2))
        .when(
            (F.col("c_nationkey") == 3) & (F.col("c_custkey") % 97 != 0),
            F.round(F.col("c_acctbal") * 1.1, 2),
        )
        .otherwise(base)
        .alias("bal"),
    )
    with engine.node_context("check", outputs={"out": "customers"}):
        from patterns_devkit_spark import Table

        got = Table("out", "w").read_spark().select("c_custkey", "c_acctbal")
    diff = (
        got.join(expect, "c_custkey")
        .filter(F.abs(F.col("c_acctbal") - F.col("bal")) > 1e-6)
        .count()
    )
    assert diff == 0
