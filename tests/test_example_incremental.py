"""examples/incremental_sessions end-to-end: the feed/stream/upsert
loop maintains per-user aggregates that exactly equal a from-scratch
batch recompute, stays idempotent on an empty re-run, and the SQL node
publishes the top users — the reference's incremental-ELT shape run
through the public node surface."""
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from patterns_devkit_spark import Table  # noqa: E402
from patterns_devkit_spark.graph.runner import GraphRunner  # noqa: E402

APP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "incremental_sessions",
)
SF = "/root/testdata/sf0.001"


def _expected(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    return {
        r["user_id"]: r
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long").alias("n_purchases"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.max("event_id").cast("long").alias("last_event"),
        )
        .collect()
    }


def test_incremental_user_stats_example(engine):
    runner = GraphRunner(engine, APP)
    executed = runner.run_all()
    # the feed ran once per batch (request_new_run loop); the runner
    # coalesces data events per run_all, so stats consumed one delta
    assert executed.count("feed0001") == 3
    assert executed.count("ustats01") == 1
    assert executed.count("top00001") == 1

    with engine.node_context(
        "check", inputs={"raw": "events_raw", "s": "user_stats", "t": "top_users"}
    ):
        raw_n = Table("raw", "r").record_count
        stats = Table("s", "r").read()
        top = Table("t", "r").read()

    ev = engine.spark.read.parquet(f"{SF}/events.parquet")
    assert raw_n == ev.count()  # all batches landed, no dupes

    expect = _expected(engine.spark)
    assert len(stats) == len(expect)
    for r in stats:
        e = expect[r["user_id"]]
        assert r["n_events"] == e["n_events"], r["user_id"]
        assert r["n_purchases"] == e["n_purchases"], r["user_id"]
        # value merged additively across 3 deltas (rounded per merge):
        # allow only rounding-grain drift vs the one-shot sum
        assert abs(r["total_value"] - e["total_value"]) < 1e-3, r["user_id"]
        assert r["last_event"] == e["last_event"], r["user_id"]

    # top-users SQL node: ordered, bounded, consistent with stats
    assert len(top) == 10
    vals = [r["total_value"] for r in top]
    assert vals == sorted(vals, reverse=True)
    best = max(stats, key=lambda r: (r["total_value"], -r["user_id"]))
    assert top[0]["user_id"] == best["user_id"]

    # idempotence: nothing new -> the stream consumes nothing and the
    # stats content is unchanged
    runner2 = GraphRunner(engine, APP)
    runner2.run_all()
    with engine.node_context("check2", inputs={"s": "user_stats"}):
        assert sorted(Table("s", "r").read(), key=lambda r: r["user_id"]) == sorted(
            stats, key=lambda r: r["user_id"]
        )

    # second delta: new events arrive OUT OF BAND (monotonic ids past
    # the fixture high-water mark); the stream picks up exactly the
    # delta and the upsert merges additively with the existing stats
    hi = int(ev.agg(F.max("event_id")).collect()[0][0])
    u1 = stats[0]["user_id"]
    new_events = [
        {"event_id": hi + 1, "user_id": u1, "event_type": "purchase", "value": 10.5},
        {"event_id": hi + 2, "user_id": u1, "event_type": "view", "value": 1.0},
        {"event_id": hi + 3, "user_id": -42, "event_type": "purchase", "value": 2.25},
    ]
    runner3 = GraphRunner(engine, APP)  # event offset snapshots here
    with engine.node_context("feeder2", outputs={"raw": "events_raw"}):
        Table("raw", "w").append(new_events)
    executed3 = runner3.run_all()
    assert executed3.count("ustats01") == 1  # delta consumed once
    # feed itself was a no-op (state says the backlog is done)
    with engine.node_context("check3", inputs={"raw": "events_raw", "s": "user_stats"}):
        assert Table("raw", "r").record_count == raw_n + 3
        stats2 = {r["user_id"]: r for r in Table("s", "r").read()}
    prev1 = next(r for r in stats if r["user_id"] == u1)
    assert stats2[u1]["n_events"] == prev1["n_events"] + 2
    assert stats2[u1]["n_purchases"] == prev1["n_purchases"] + 1
    assert abs(stats2[u1]["total_value"] - (prev1["total_value"] + 11.5)) < 1e-3
    assert stats2[u1]["last_event"] == hi + 2
    assert stats2[-42] == {
        "user_id": -42, "n_events": 1, "n_purchases": 1,
        "total_value": 2.25, "last_event": hi + 3,
    }
    # untouched users rode through the partition-scoped MERGE intact
    for r in stats:
        if r["user_id"] != u1:
            assert stats2[r["user_id"]] == r
