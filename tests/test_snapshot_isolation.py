"""Engine.snapshot(): repeatable-read across tables — reads inside the
block pin every table's active version; concurrent pointer flips become
visible only after exit; writes inside raise."""
import pytest

from patterns_devkit_spark import Table


def _write(engine, store, rows, replace=False):
    with engine.node_context("w", outputs={"out": store}):
        tb = Table("out", "w")
        (tb.replace if replace else tb.append)(rows)
        tb.flush()


def test_snapshot_pins_reads_across_tables(engine):
    _write(engine, "f", [{"k": 1, "v": 10}])
    _write(engine, "d", [{"k": 1, "name": "old"}])
    with engine.snapshot():
        pre_f = engine.sql("SELECT sum(v) AS s FROM {{ f }}").collect()[0]["s"]
        pre_d = engine.sql("SELECT count(*) AS n FROM {{ d }}").collect()[0]["n"]
        assert (pre_f, pre_d) == (10, 1)
    # writes land between snapshots
    _write(engine, "f", [{"k": 9, "v": 900}], replace=True)
    with engine.snapshot():
        post = engine.sql("SELECT sum(v) AS s FROM {{ f }}").collect()[0]["s"]
        assert post == 900  # a new snapshot sees the new state


def test_snapshot_consistent_under_concurrent_flip(engine, tmp_path):
    """The core guarantee: a second engine handle (same warehouse)
    flips a table while the first holds a snapshot — the held snapshot
    keeps reading the pinned version until exit."""
    from patterns_devkit_spark import Engine

    _write(engine, "t", [{"a": 1}])
    writer = Engine(engine.catalog.root, spark=engine.spark)
    with engine.snapshot():
        before = engine.sql("SELECT count(*) AS n FROM {{ t }}").collect()[0]["n"]
        with writer.node_context("w", outputs={"out": "t"}):
            wt = Table("out", "w")
            wt.replace([{"a": 1}, {"a": 2}, {"a": 3}])
            wt.flush()
        # reload the reader's catalog view of the doc? The reader holds
        # its own pinned map — reads stay at the pinned version even
        # though the writer advanced the live pointer
        during = engine.sql("SELECT count(*) AS n FROM {{ t }}").collect()[0]["n"]
        assert before == during == 1
    # Note: json-backend engines cache the doc in memory; the pinned
    # snapshot is what guaranteed consistency above. A fresh handle
    # sees the writer's state:
    fresh = Engine(engine.catalog.root, spark=engine.spark)
    assert fresh.sql("SELECT count(*) AS n FROM {{ t }}").collect()[0]["n"] == 3


def test_writes_inside_snapshot_raise(engine):
    _write(engine, "t2", [{"a": 1}])
    with engine.snapshot():
        with pytest.raises(RuntimeError, match="snapshot"):
            _write(engine, "t2", [{"a": 2}], replace=True)
        with pytest.raises(RuntimeError, match="snapshot"):
            engine.catalog.set_active_version("t2", None)
    # after exit, writes work again
    _write(engine, "t2", [{"a": 2}])
    with engine.node_context("r", inputs={"in": "t2"}):
        assert len(Table("in", "r").read()) == 2


def test_time_travel_latest_respects_snapshot(engine):
    _write(engine, "t3", [{"a": 1}])
    with engine.snapshot():
        n = engine.sql("SELECT count(*) AS n FROM {{ t3@latest }}").collect()[0]["n"]
        assert n == 1
