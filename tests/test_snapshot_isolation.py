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


@pytest.mark.parametrize("backend", ["json", "sqlite"])
def test_vacuum_in_other_process_spares_pinned_version(spark, tmp_path, backend):
    """VERDICT r3 item 5: a ``patterns vacuum`` (retention GC) running
    in a SECOND PROCESS must not delete a version a live snapshot in
    this process is reading — snapshots register durable pin files in
    <warehouse>/snapshots/ that cross-process GC honors. After the
    snapshot exits (pin released), the same vacuum reclaims it."""
    import json as _json
    import os
    import subprocess
    import sys

    from patterns_devkit_spark import Engine, Table

    wh = str(tmp_path / f"wh_{backend}")
    engine = Engine(wh, spark=spark, catalog_backend=backend)
    with engine.node_context("w", outputs={"out": "t"}):
        tb = Table("out", "w")
        tb.replace([{"a": 1}, {"a": 2}, {"a": 3}])
        tb.flush()
    engine.catalog.update_table_meta("t", retention_keep=1)
    pinned_v = engine.catalog.get_active_version("t")

    vac = (
        "import sys; sys.path.insert(0, %r); "
        "from patterns_devkit_spark.catalog.catalog import Catalog; "
        "c = Catalog(%r); print(__import__('json').dumps(c.gc_versions('t')))"
    ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))), wh)

    with engine.snapshot():
        # a second handle keeps writing: the pinned version goes
        # inactive and (retention_keep=1, two newer inactives) becomes
        # GC-eligible while this snapshot is still reading it
        writer = Engine(wh, spark=spark, catalog_backend=backend)
        for i in range(3):
            with writer.node_context("w2", outputs={"out": "t"}):
                wt = Table("out", "w")
                wt.replace([{"a": j} for j in range(5 + i)])
                wt.flush()
        out = subprocess.run(
            [sys.executable, "-c", vac], capture_output=True, text=True, check=True
        )
        doomed = _json.loads(out.stdout.strip().splitlines()[-1])
        assert pinned_v not in doomed, f"vacuum deleted the pinned version {pinned_v}"
        # (the writer's own per-flush GC already reclaimed the other
        # eligible versions — also sparing the pin, which is the point)
        assert os.path.isdir(engine.catalog.version_dir("t", pinned_v))
        # the pinned read still works mid-vacuum
        n = engine.sql("SELECT count(*) AS n FROM {{ t }}").collect()[0]["n"]
        assert n == 3
    # pin released -> the same external vacuum reclaims the version
    out = subprocess.run(
        [sys.executable, "-c", vac], capture_output=True, text=True, check=True
    )
    doomed = _json.loads(out.stdout.strip().splitlines()[-1])
    assert pinned_v in doomed
    assert not os.path.isdir(engine.catalog.version_dir("t", pinned_v))
