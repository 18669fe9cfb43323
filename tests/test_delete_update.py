"""SQL DELETE / UPDATE on the engine write path (file-scoped rewrite +
atomic version flip). The warehouse-side DML every MERGE-capable store
adds on top of the reference's execute_sql surface (node.py:356-373):
DELETE removes matching rows, UPDATE rewrites them in place; both write
a NEW version (time travel keeps the old rows) and rewrite ONLY the
parquet files that contain matched rows — untouched files are
hardlinked (inode-verified below)."""
import os

import pytest

from patterns_devkit_spark import Table

from conftest import REFERENCE_LINK_MODE, carried_refs_into, physical_parquet


def _append_flush(t, rows):
    t.append(rows)
    t.flush()


def test_delete_where_rows_and_versioning(engine):
    with engine.node_context("w", outputs={"out": "del1"}):
        t = Table("out", "w")
        _append_flush(t, [{"id": i, "v": i * 10} for i in range(10)])
        v_before = t.get_active_version().version_id
        n = t.delete_where("id >= 7")
        assert n == 3
        assert t.record_count == 7
        assert t.get_active_version().version_id != v_before
        # time travel: the pre-delete version still holds all 10 rows
        assert t.read_spark(version=v_before).count() == 10
    with engine.node_context("r", inputs={"in": "del1"}):
        rows = Table("in", "r").read()
        assert sorted(r["id"] for r in rows) == list(range(7))


def test_delete_null_predicate_keeps_row(engine):
    """Standard SQL DELETE: a NULL predicate does not match."""
    with engine.node_context("w", outputs={"out": "del2"}):
        t = Table("out", "w")
        _append_flush(t, [{"id": 1, "v": None}, {"id": 2, "v": 5}, {"id": 3, "v": 50}])
        n = t.delete_where("v > 10")  # NULL > 10 is NULL -> kept
        assert n == 1
        assert sorted(r["id"] for r in t.read()) == [1, 2]


def test_delete_zero_match_is_noop(engine):
    with engine.node_context("w", outputs={"out": "del3"}):
        t = Table("out", "w")
        _append_flush(t, [{"id": 1}])
        v = t.get_active_version().version_id
        assert t.delete_where("id > 99") == 0
        assert t.get_active_version().version_id == v  # no new version


def test_delete_untouched_files_hardlinked(engine):
    """Three appended files; predicate hits one -> the other two are
    hardlinked (same inode) into the new version, never rewritten."""
    with engine.node_context("w", outputs={"out": "del4"}):
        t = Table("out", "w")
        _append_flush(t, [{"id": 1, "grp": "a"}])
        _append_flush(t, [{"id": 2, "grp": "b"}])
        _append_flush(t, [{"id": 3, "grp": "c"}])
        old_dir = t.get_active_version().storage
        old_inodes = {
            f: os.stat(os.path.join(old_dir, f)).st_ino
            for f in os.listdir(old_dir)
            if f.endswith(".parquet")
        }
        assert len(old_inodes) == 3
        assert t.delete_where("grp = 'b'") == 1
        new_v = t.get_active_version()
        new_dir = new_v.storage
        if REFERENCE_LINK_MODE:
            # object-storage mode: zero-copy = the untouched files are
            # NOT physically copied; the manifest carries 2 refs into
            # the old version instead
            old_v = os.path.basename(old_dir.rstrip(os.sep))
            carried = carried_refs_into(
                t._engine.catalog, "del4", new_v.version_id, old_v
            )
            assert len(carried) == 2
            phys = set(physical_parquet(new_dir))
            assert not (phys & set(old_inodes)), "untouched file was copied"
        else:
            new_inodes = {
                os.stat(os.path.join(new_dir, f)).st_ino
                for f in os.listdir(new_dir)
                if f.endswith(".parquet")
            }
            # the two untouched files' inodes survive into the new version
            linked = set(old_inodes.values()) & new_inodes
            assert len(linked) == 2
        assert sorted(r["id"] for r in t.read()) == [1, 3]


def test_update_where_old_row_semantics(engine):
    """SET expressions read the OLD row (swap test), and assignments
    with embedded commas parse (paren-aware SET split)."""
    with engine.node_context("w", outputs={"out": "upd1"}):
        t = Table("out", "w")
        _append_flush(t, [{"id": 1, "a": 1, "b": 100}, {"id": 2, "a": 2, "b": 200}])
        n = t.update_where({"a": "b", "b": "a"}, "id = 2")  # swap
        assert n == 1
        rows = {r["id"]: r for r in t.read()}
        assert rows[2]["a"] == 200 and rows[2]["b"] == 2
        assert rows[1]["a"] == 1 and rows[1]["b"] == 100  # untouched
        assert t.record_count == 2


def test_execute_sql_delete_and_update(engine):
    """The reference's DML entrypoint routes DELETE/UPDATE statements
    (with {{ table }} templating) through the file-scoped rewrite."""
    with engine.node_context("w", outputs={"out": "dml1"}):
        t = Table("out", "w")
        _append_flush(t, [{"id": i, "qty": i} for i in range(6)])
        t.execute_sql("DELETE FROM {{ table }} WHERE id >= 4")
        assert sorted(r["id"] for r in t.read()) == [0, 1, 2, 3]
        t.execute_sql("UPDATE {{ table }} SET qty = qty * 10, id = id + 100 WHERE qty >= 2")
        rows = sorted((r["id"], r["qty"]) for r in t.read())
        assert rows == [(0, 0), (1, 1), (102, 20), (103, 30)]


def test_update_partitioned_moves_partition(engine):
    """An UPDATE that changes the partition column moves the row to the
    new hive dir; untouched partitions stay hardlinked."""
    with engine.node_context("w", outputs={"out": "updp"}):
        t = Table("out", "w")
        t.init(partition_by="grp")
        _append_flush(t, [{"id": 1, "grp": "a"}, {"id": 2, "grp": "b"}, {"id": 3, "grp": "c"}])
        n = t.update_where({"grp": "'z'"}, "grp = 'b'")
        assert n == 1
        new_dir = t.get_active_version().storage
        dirs = {e for e in os.listdir(new_dir) if e.startswith("grp=")}
        assert "grp=z" in dirs and "grp=b" not in dirs
        rows = sorted((r["id"], r["grp"]) for r in t.read())
        assert rows == [(1, "a"), (2, "z"), (3, "c")]


def test_parse_set_clause_malformed_raises():
    from patterns_devkit_spark.node.node import _parse_set_clause

    assert _parse_set_clause("a = 1, b = concat(x, ',', y)") == {
        "a": "1",
        "b": "concat(x, ',', y)",
    }
    with pytest.raises(ValueError):
        _parse_set_clause("a = ")
