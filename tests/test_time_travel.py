"""Timestamp time travel (Delta/Iceberg 'TIMESTAMP AS OF' parity):
every active-pointer flip records a [commit-epoch, vid] publish-log
entry (catalog.set_active_version), and catalog.resolve_version
accepts an ISO-8601 date/datetime anywhere a version id or tag works —
read_spark(version=...), the {{ store@ref }} SQL template, diff — and
answers "which version was ACTIVE at that instant". Restores
re-publish old versions with fresh timestamps; instants whose
then-active version was GC'd (or that predate the table) resolve to
nothing rather than silently falling back to other data."""
import datetime as dt
import time

import pytest

from patterns_devkit_spark import Table


def _iso(epoch: float) -> str:
    return dt.datetime.fromtimestamp(epoch, tz=dt.timezone.utc).isoformat()


def test_as_of_resolves_the_version_active_at_that_instant(engine):
    with engine.node_context("w", outputs={"out": "asof"}):
        t = Table("out", "w")
        t0 = time.time()
        time.sleep(0.01)
        t.replace([{"k": 1}])
        t.flush()
        v1 = t.get_active_version().version_id
        time.sleep(0.01)
        t1 = time.time()
        time.sleep(0.01)
        t.replace([{"k": 2}])
        t.flush()
        v2 = t.get_active_version().version_id

        cat = engine.catalog
        assert cat.resolve_version("asof", _iso(t1)) == v1
        assert cat.resolve_version("asof", _iso(time.time())) == v2
        # an instant before the table existed resolves to nothing
        assert cat.resolve_version("asof", _iso(t0)) is None
        with pytest.raises(KeyError):
            t.read_spark(version=_iso(t0))
        # read path: AS-OF between the publishes sees v1's rows
        assert [r["k"] for r in t.read_spark(version=_iso(t1)).collect()] == [1]
        # naive timestamps are treated as UTC
        naive = _iso(t1).replace("+00:00", "")
        assert cat.resolve_version("asof", naive) == v1


def test_as_of_in_sql_template(engine):
    with engine.node_context("w", outputs={"out": "asoft"}):
        t = Table("out", "w")
        t.replace([{"k": 10}])
        t.flush()
        time.sleep(0.01)
        mid = time.time()
        time.sleep(0.01)
        t.replace([{"k": 20}])
        t.flush()
    rows = engine.sql("SELECT k FROM {{ asoft@" + _iso(mid) + " }}").collect()
    assert [r["k"] for r in rows] == [10]
    rows = engine.sql("SELECT k FROM {{ asoft@latest }}").collect()
    assert [r["k"] for r in rows] == [20]


def test_restore_republishes_with_a_fresh_timestamp(engine):
    with engine.node_context("w", outputs={"out": "asofr"}):
        t = Table("out", "w")
        t.replace([{"k": 1}])
        t.flush()
        v1 = t.get_active_version().version_id
        time.sleep(0.01)
        t.replace([{"k": 2}])
        t.flush()
        v2 = t.get_active_version().version_id
        time.sleep(0.01)
        mid = time.time()
        time.sleep(0.01)
        t.restore(v1)
        cat = engine.catalog
        # history before the restore still answers v2
        assert cat.resolve_version("asofr", _iso(mid)) == v2
        # after the restore, AS-OF now answers the restored version
        # (restore publishes a fresh manifest-clone of v1, so the log
        # gains a new entry rather than rewriting history)
        now_vid = cat.resolve_version("asofr", _iso(time.time()))
        assert now_vid == cat.get_active_version("asofr")
        assert [r["k"] for r in t.read_spark(version=_iso(time.time())).collect()] == [1]


def test_as_of_gc_d_version_resolves_to_nothing(engine):
    with engine.node_context("w", outputs={"out": "asofg"}):
        t = Table("out", "w")
        t.replace([{"k": 0}])
        t.flush()
        time.sleep(0.01)
        early = time.time()
        time.sleep(0.01)
        for i in range(1, 7):  # push v1 beyond default retention
            t.replace([{"k": i}])
            t.flush()
        cat = engine.catalog
        meta = cat.table_meta("asofg")
        assert cat.resolve_version("asofg", _iso(early)) is None or (
            cat.resolve_version("asofg", _iso(early)) in meta["versions"]
        )
        # the then-active version is gone from retention, so the read
        # must raise rather than fall back to a different snapshot
        first = (meta.get("publish_log") or [])[0][1]
        if first not in meta["versions"]:
            with pytest.raises(KeyError):
                t.read_spark(version=_iso(early))


def test_sys_versions_exposes_published_at(engine):
    with engine.node_context("w", outputs={"out": "asofs"}):
        t = Table("out", "w")
        t.replace([{"k": 1}])
        t.flush()
    engine.register_system_views()
    rows = engine.spark.sql(
        "SELECT published_at FROM __sys_versions WHERE table_name = 'asofs' AND is_active"
    ).collect()
    assert len(rows) == 1 and rows[0]["published_at"] is not None
    # round-trips through the resolver: reading AS-OF the published
    # instant returns that same version
    assert (
        engine.catalog.resolve_version("asofs", rows[0]["published_at"])
        == engine.catalog.get_active_version("asofs")
    )


def test_as_of_is_content_exact_under_in_place_appends(engine):
    """Appends mutate the ACTIVE version in place (no pointer flip) —
    the manifest commit stamps must still reconstruct the exact file
    set visible at the instant, not the version's latest content."""
    with engine.node_context("w", outputs={"out": "asofa"}):
        t = Table("out", "w")
        t.append([{"k": 1}])
        t.flush()
        time.sleep(0.02)
        mid = time.time()
        time.sleep(0.02)
        t.append([{"k": 2}])
        t.flush()
        # same version both times: this is the in-place case
        meta = engine.catalog.table_meta("asofa")
        assert len([e for e in meta["publish_log"] if e[1] is not None]) == 1
        assert sorted(r["k"] for r in t.read_spark(version=_iso(mid)).collect()) == [1]
        assert sorted(r["k"] for r in t.read_spark().collect()) == [1, 2]
        assert sorted(r["k"] for r in t.read_spark(version=_iso(time.time())).collect()) == [1, 2]
    rows = engine.sql("SELECT k FROM {{ asofa@" + _iso(mid) + " }}").collect()
    assert sorted(r["k"] for r in rows) == [1]


def test_as_of_append_grain_survives_reference_link_mode(engine, monkeypatch):
    """Stamped-subset reads go through the grouped-basePath file reader
    (_read_version_files), so they must work when zero-copy carries are
    pure manifest refs (object-storage simulation)."""
    monkeypatch.setenv("PDS_LINK_MODE", "reference")
    with engine.node_context("w", outputs={"out": "asofref"}):
        t = Table("out", "w")
        t.append([{"k": 1}])
        t.flush()
        time.sleep(0.02)
        mid = time.time()
        time.sleep(0.02)
        t.append([{"k": 2}])
        t.flush()
        assert sorted(r["k"] for r in t.read_spark(version=_iso(mid)).collect()) == [1]


def test_publish_log_compacts_under_gc_preserving_as_of_gaps(engine):
    """gc_versions compacts publish-log runs whose versions were
    reclaimed (one boundary entry per dead run) so hot upsert tables
    don't grow the catalog doc without bound — while a timestamp
    inside a GC'd span still resolves to None, never to older data."""
    with engine.node_context("w", outputs={"out": "plog"}):
        t = Table("out", "w")
        t.init(unique_on=["id"], retention_keep=2)
        t.replace([{"id": 1, "v": -1}])
        t.flush()
        time.sleep(0.01)
        mid = time.time()  # instant whose active version will be GC'd
        time.sleep(0.01)
        for i in range(12):
            t.upsert([{"id": 1, "v": i}])
            t.flush()
    cat = engine.catalog
    meta = cat.table_meta("plog")
    log = meta["publish_log"]
    retained = set(meta["versions"])
    # bounded: at most one dead boundary entry between retained entries
    dead_runs = 0
    prev_dead = False
    for _, v in log:
        is_dead = v is None or v not in retained
        if is_dead:
            assert not prev_dead, "consecutive dead entries survived compaction"
            dead_runs += 1
        prev_dead = is_dead
    assert len(log) <= len(retained) * 2 + dead_runs + 2
    # the GC'd span still answers "unrecoverable", not older data
    assert cat.resolve_version("plog", _iso(mid)) is None
    # and the live window still resolves
    assert cat.resolve_version("plog", _iso(time.time())) == meta["active_version"]
