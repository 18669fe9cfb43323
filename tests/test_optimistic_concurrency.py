"""Optimistic concurrency: read-modify-write paths (upsert MERGE,
DELETE/UPDATE rewrite) flip the active pointer with a compare-and-swap
against the version they READ — a concurrent writer's flip in between
raises ConcurrentWriteError instead of silently losing its update."""
import pytest

from patterns_devkit_spark import ConcurrentWriteError, Engine, Table


def test_concurrent_upsert_raises_and_retry_succeeds(engine):
    with engine.node_context("w", outputs={"out": "acct"}):
        ta = Table("out", "w")
        ta.init(unique_on=["id"])
        ta.append([{"id": 1, "bal": 10}])
        ta.flush()

    # writer B (second handle on the same warehouse) advances the table
    other = Engine(engine.catalog.root, spark=engine.spark)
    with other.node_context("w", outputs={"out": "acct"}):
        tb = Table("out", "w")
        tb.upsert([{"id": 2, "bal": 20}])
        tb.flush()

    # writer A still holds the pre-B catalog view: its MERGE read base
    # is stale, so the CAS flip must refuse (no lost update)
    with engine.node_context("w", outputs={"out": "acct"}):
        ta = Table("out", "w")
        ta.upsert([{"id": 3, "bal": 30}])
        with pytest.raises(ConcurrentWriteError, match="active version moved"):
            ta.flush()

    # retry on a fresh view sees B's row and lands A's
    fresh = Engine(engine.catalog.root, spark=engine.spark)
    with fresh.node_context("w", outputs={"out": "acct"}):
        tf = Table("out", "w")
        tf.upsert([{"id": 3, "bal": 30}])
        tf.flush()
        rows = sorted((r["id"], r["bal"]) for r in tf.read())
        assert rows == [(1, 10), (2, 20), (3, 30)]


def test_concurrent_delete_raises(engine):
    with engine.node_context("w", outputs={"out": "t"}):
        ta = Table("out", "w")
        ta.append([{"id": 1}, {"id": 2}])
        ta.flush()
    other = Engine(engine.catalog.root, spark=engine.spark)
    with other.node_context("w", outputs={"out": "t"}):
        Table("out", "w").replace([{"id": 9}])
    with engine.node_context("w", outputs={"out": "t"}):
        with pytest.raises(ConcurrentWriteError):
            Table("out", "w").delete_where("id = 1")


def test_single_writer_unaffected(engine):
    with engine.node_context("w", outputs={"out": "t2"}):
        tb = Table("out", "w")
        tb.init(unique_on=["id"])
        tb.append([{"id": 1, "v": 1}])
        tb.flush()
        tb.upsert([{"id": 1, "v": 2}, {"id": 2, "v": 3}])
        tb.flush()
        tb.execute_sql("UPDATE {{ this }} SET v = v + 1 WHERE id = 1")
        tb.execute_sql("DELETE FROM {{ this }} WHERE id = 2")
        rows = sorted((r["id"], r["v"]) for r in tb.read())
        assert rows == [(1, 3)]


def test_cas_failure_drops_orphan_version(engine):
    """ADVICE r3: a refused CAS used to leave the just-written version
    registered forever (orphan dir + metadata accumulating on every
    retry); the write path now drops it before re-raising."""
    import os

    with engine.node_context("w", outputs={"out": "acct2"}):
        ta = Table("out", "w")
        ta.init(unique_on=["id"])
        ta.append([{"id": 1, "bal": 10}])
        ta.flush()
    other = Engine(engine.catalog.root, spark=engine.spark)
    with other.node_context("w", outputs={"out": "acct2"}):
        Table("out", "w").upsert([{"id": 2, "bal": 20}])
    before = set(Engine(engine.catalog.root, spark=engine.spark).catalog.table_meta("acct2")["versions"])
    with engine.node_context("w", outputs={"out": "acct2"}):
        ta = Table("out", "w")
        ta.upsert([{"id": 3, "bal": 30}])
        with pytest.raises(ConcurrentWriteError):
            ta.flush()
    after_cat = Engine(engine.catalog.root, spark=engine.spark).catalog
    after = set(after_cat.table_meta("acct2")["versions"])
    assert after == before, f"orphan versions left behind: {sorted(after - before)}"
    for v in after:
        assert os.path.isdir(after_cat.version_dir("acct2", v))


def test_intermediate_mutator_cannot_clobber_concurrent_flip(engine):
    """ADVICE r3 (medium): an intermediate mutator (set_record_count
    et al.) persisting a stale whole-document view must NOT erase a
    flip another handle committed in between — every mutator now
    read-merge-writes through the backend's single commit point."""
    with engine.node_context("w", outputs={"out": "rmw"}):
        ta = Table("out", "w")
        ta.append([{"id": 1}])
        ta.flush()
    cat_a = engine.catalog
    # handle B commits a new active version behind A's back
    other = Engine(engine.catalog.root, spark=engine.spark)
    with other.node_context("w", outputs={"out": "rmw"}):
        Table("out", "w").replace([{"id": 1}, {"id": 2}])
    b_active = other.catalog.table_meta("rmw")["active_version"]
    # A's in-memory doc predates B's flip; this mutator used to persist
    # the stale doc wholesale and silently roll the pointer back
    cat_a.set_record_count("rmw", cat_a.table_meta("rmw")["versions"][0], 1)
    fresh = Engine(engine.catalog.root, spark=engine.spark)
    assert fresh.catalog.table_meta("rmw")["active_version"] == b_active
