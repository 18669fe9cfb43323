"""Version tags: named, GC-exempt pins on table versions (the
Iceberg tag surface over the manifest catalog — node/manifest.py's
"version = file list" contract makes a tag a pure metadata pin).
Tags resolve anywhere a version id does: Table.get_version /
read_spark(version=), the {{ store@ref }} SQL template, and they
exempt their version from retention GC and targeted drop_version
until dropped. The writable-branch counterpart is clone_from
(zero-copy manifest fork), tested in test_pipeline_ops."""
import pytest

from patterns_devkit_spark import Table


def _write_versions(t, n, start=0):
    """n single-row replace versions, values start..start+n-1."""
    for i in range(start, start + n):
        t.replace([{"k": i}])
        t.flush()


def test_tag_pin_read_spark_and_sql_template(engine):
    with engine.node_context("w", outputs={"out": "tt"}):
        t = Table("out", "w")
        t.replace([{"k": 1}])
        t.flush()
        v1 = t.get_active_version().version_id
        assert t.tag("baseline") == v1
        t.replace([{"k": 2}])
        t.flush()
        # by-tag read sees the pinned version, not the active one
        assert [r["k"] for r in t.read_spark(version="baseline").collect()] == [1]
        assert [r["k"] for r in t.read_spark().collect()] == [2]
        assert t.tags() == {"baseline": v1}
        tagged_rows = [v for v in t.list_versions() if v["tags"]]
        assert tagged_rows and tagged_rows[0]["version_id"] == v1
    rows = engine.sql("SELECT k FROM {{ tt@baseline }}").collect()
    assert [r["k"] for r in rows] == [1]


def test_tagged_version_survives_retention_gc(engine):
    with engine.node_context("w", outputs={"out": "tg"}):
        t = Table("out", "w")
        _write_versions(t, 1)
        v1 = t.get_active_version().version_id
        t.tag("keepme", v1)
        # default retention keeps 3 inactive versions; 8 more writes
        # push v1 far beyond the window
        _write_versions(t, 8, start=1)
        meta = engine.catalog.table_meta("tg")
        assert v1 in meta["versions"], "tagged version was GC'd"
        assert [r["k"] for r in t.read_spark(version="keepme").collect()] == [0]
        # untagged versions beyond retention are gone
        assert len(meta["versions"]) <= 5  # active + 3 retained + tagged
        # dropping the tag releases the version at the next GC
        t.drop_tag("keepme")
        engine.catalog.gc_versions("tg")
        assert v1 not in engine.catalog.table_meta("tg")["versions"]


def test_drop_version_refuses_tagged(engine):
    with engine.node_context("w", outputs={"out": "td"}):
        t = Table("out", "w")
        _write_versions(t, 2)
        old = [v["version_id"] for v in t.list_versions() if not v["is_active"]][0]
        t.tag("audit", old)
        with pytest.raises(ValueError, match="tagged"):
            engine.catalog.drop_version("td", old)
        t.drop_tag("audit")
        engine.catalog.drop_version("td", old)  # now fine


def test_tag_name_validation_and_unknown_version(engine):
    with engine.node_context("w", outputs={"out": "tv"}):
        t = Table("out", "w")
        _write_versions(t, 1)
        for bad in ("v0000001", "latest", "1abc", "", "has space"):
            with pytest.raises(ValueError):
                t.tag(bad)
        with pytest.raises(KeyError):
            t.tag("ok", version="v9999999")
        # retag moves the pin atomically
        v1 = t.get_active_version().version_id
        t.tag("ptr")
        _write_versions(t, 1, start=1)
        v2 = t.get_active_version().version_id
        t.tag("ptr", v2)
        assert t.tags() == {"ptr": v2} and v1 != v2


def test_restore_change_feed_and_diff_accept_tags(engine):
    """A tag resolves anywhere a version id does: restore(tag),
    diff_versions(tag, 'latest'), change_feed(tag)."""
    with engine.node_context("w", outputs={"out": "tr"}):
        t = Table("out", "w")
        t.init(unique_on=["k"])
        t.replace([{"k": 1, "v": "a"}])
        t.flush()
        t.tag("gold")
        t.replace([{"k": 1, "v": "b"}, {"k": 2, "v": "c"}])
        t.flush()
        d = t.diff_versions("gold", "latest", key_cols=["k"]).collect()
        changes = {(r["change"], r["k"]) for r in d}
        assert changes == {("updated", 1), ("added", 2)}
        feed = t.change_feed("gold").collect()
        assert {(r["op"], r["k"]) for r in feed} == {("U", 1), ("I", 2)}
        t.restore("gold")
        assert sorted((r["k"], r["v"]) for r in t.read()) == [(1, "a")]


def test_tag_refused_inside_snapshot(engine):
    with engine.node_context("w", outputs={"out": "ts"}):
        t = Table("out", "w")
        _write_versions(t, 1)
        with engine.snapshot():
            with pytest.raises(RuntimeError):
                t.tag("nope")


def test_cli_tag_roundtrip(engine, tmp_path):
    import subprocess
    import sys

    with engine.node_context("w", outputs={"out": "tc"}):
        t = Table("out", "w")
        _write_versions(t, 1)
        vid = t.get_active_version().version_id

    def cli(*args):
        return subprocess.run(
            [sys.executable, "-m", "patterns_devkit_spark.cli", "--warehouse", engine.catalog.root, *args],
            capture_output=True,
            text=True,
        )

    r = cli("tag", "tc", "release-1")
    assert r.returncode == 0 and "release-1" in r.stdout
    r = cli("tag", "tc")
    assert r.returncode == 0 and f"release-1\t{vid}" in r.stdout
    r = cli("list", "tags", "--json")
    assert r.returncode == 0 and '"tag": "release-1"' in r.stdout
    r = cli("tag", "tc", "release-1", "--drop")
    assert r.returncode == 0
    # a fresh process-independent Engine sees the subprocess's drops
    from patterns_devkit_spark import Engine

    fresh = Engine(engine.catalog.root, spark=engine.spark)
    assert fresh.catalog.tags("tc") == {}
