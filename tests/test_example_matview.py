"""examples/matview_reporting end-to-end: the declarative flavor of the
incremental-ELT app — the feed appends order batches, the engine folds
the MV on each data event, and the SQL publisher reports off the MV.
The MV content must equal a from-scratch batch recompute after every
refresh, and a no-new-data re-run is a no-op end to end."""
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from patterns_devkit_spark import Table  # noqa: E402
from patterns_devkit_spark.graph.runner import GraphRunner  # noqa: E402

APP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "matview_reporting",
)
SF = "/root/testdata/sf0.001"


def test_matview_reporting_example(engine):
    runner = GraphRunner(engine, APP)
    executed = runner.run_all()
    assert executed.count("setup001") == 2  # request_new_run loop, 2 batches
    assert executed.count("report01") >= 1

    orders = engine.spark.read.parquet(f"{SF}/orders.parquet")
    expect = {
        r["o_orderstatus"]: r
        for r in orders.groupBy("o_orderstatus")
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("revenue_cents"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.max(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("max_order_cents"),
        )
        .collect()
    }

    mv = engine.materialized_view("sales_by_status")
    got = {r["o_orderstatus"]: r for r in mv.read_spark().collect()}
    assert set(got) == set(expect)
    for k, e in expect.items():
        assert got[k]["revenue_cents"] == e["revenue_cents"], k
        assert got[k]["n_orders"] == e["n_orders"], k
        assert got[k]["max_order_cents"] == e["max_order_cents"], k

    with engine.node_context("chk", inputs={"in": "status_report"}):
        report = Table("in", "r").read()
    assert len(report) == len(expect)
    revs = [r["revenue_cents"] for r in report]
    assert revs == sorted(revs, reverse=True)
    assert all(r["avg_order_cents"] == r["revenue_cents"] // r["n_orders"] for r in report)

    # no new data -> MV untouched, publisher not re-triggered
    v = engine.catalog.get_active_version("sales_by_status")
    executed2 = GraphRunner(engine, APP).run_all()
    assert engine.catalog.get_active_version("sales_by_status") == v
    assert executed2.count("report01") == 0
