"""examples/warehouse_tour end-to-end: two fact batches fold the join
MV incrementally, the zero-copy renamed dim column flows through the
late-bound SQL view, and the published mart equals a from-scratch join
aggregate. A re-run with no new data is a no-op."""
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from patterns_devkit_spark.graph.runner import GraphRunner  # noqa: E402

APP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "warehouse_tour",
)
SF = "/root/testdata/sf0.001"


def test_warehouse_tour_example(engine):
    runner = GraphRunner(engine, APP)
    executed = runner.run_all()
    assert executed.count("load0001") == 2  # request_new_run loop, 2 batches
    assert executed.count("publish1") >= 1

    spark = engine.spark
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    expect = {
        r["nation"]: (r["revenue_cents"], r["n_orders"])
        for r in orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy(nation.n_name.alias("nation"))
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("revenue_cents"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
        .collect()
    }
    vid = engine.catalog.get_active_version("mart_report")
    got = {
        r["nation"]: (r["revenue_cents"], r["n_orders"])
        for r in spark.read.parquet(engine.catalog.version_dir("mart_report", vid)).collect()
    }
    assert got == expect

    # the renamed dim column is physical 'n_name' at rest, logical in SQL
    meta = engine.catalog.table_meta("nation_t")
    assert (meta.get("colmap") or {}).get("nation_name") == "n_name"

    # no new data -> nothing refolds, the report version stays put
    before = engine.catalog.get_active_version("mart_report")
    runner.run_all()
    assert engine.catalog.get_active_version("mart_report") == before

    # auto_compact_after=2: the second fact batch tripped compaction —
    # the active orders version is a single file with all rows
    import glob

    odir = engine.catalog.active_dir("orders_t")
    assert len(glob.glob(os.path.join(odir, "**", "*.parquet"), recursive=True)) == 1

    # tag the published mart and read it back by name after more churn
    from patterns_devkit_spark import Table

    with engine.node_context("ops", inputs={"in": "mart_report"}):
        Table("in", "r").tag("release-1")
    rows = engine.sql(
        "SELECT count(*) AS n FROM {{ mart_report@release-1 }}"
    ).collect()
    assert rows[0]["n"] == len(expect)
