"""Zero-copy ALTER TABLE (node/evolution.py): add/rename/drop are
metadata-only catalog updates; files at rest keep PHYSICAL names and
are never rewritten. Proofs below check parquet footers and file sets
directly, not just read results."""
import glob
import os

import pyarrow.parquet as pq
import pytest

from patterns_devkit_spark import Table


def _files(engine, store):
    d = engine.catalog.active_dir(store)
    return sorted(glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True))


def _footer_cols(path):
    return list(pq.read_schema(path).names)


def test_add_column_metadata_only(engine):
    with engine.node_context("w", outputs={"out": "t"}):
        tb = Table("out", "w")
        tb.append(engine.spark.createDataFrame([(1, "x"), (2, "y")], "id long, name string").coalesce(1))
        tb.flush()
        before = _files(engine, "t")
        tb.add_column("tag", "string")
        assert _files(engine, "t") == before  # no rewrite, no new version
        rows = sorted(tb.read(), key=lambda r: r["id"])
        assert [r["tag"] for r in rows] == [None, None]
        tb.append([{"id": 3, "name": "z", "tag": "new"}])
        tb.flush()
    with engine.node_context("r", inputs={"in": "t"}):
        rows = sorted(Table("in", "r").read(), key=lambda r: r["id"])
        assert [r["tag"] for r in rows] == [None, None, "new"]


def test_add_column_with_default(engine):
    with engine.node_context("w", outputs={"out": "t"}):
        tb = Table("out", "w")
        tb.append(engine.spark.createDataFrame([(1,), (2,)], "id long").coalesce(1))
        tb.flush()
        tb.add_column("score", "bigint", default="7")
        rows = sorted(tb.read(), key=lambda r: r["id"])
        assert [r["score"] for r in rows] == [7, 7]  # pre-ADD rows read the default
        tb.append([{"id": 3}])  # post-ADD write missing the column
        tb.flush()
        rows = sorted(tb.read(), key=lambda r: r["id"])
        assert [r["score"] for r in rows] == [7, 7, 7]
        # SQL over the logical schema sees the default too
        n = tb.read_sql("SELECT count(*) AS n FROM {{ this }} WHERE score = 7")[0]["n"]
        assert n == 3


def test_rename_column_zero_copy(engine):
    with engine.node_context("w", outputs={"out": "t"}):
        tb = Table("out", "w")
        tb.append(engine.spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, amount double").coalesce(1))
        tb.flush()
        before = _files(engine, "t")
        inodes = {os.stat(f).st_ino for f in before}
        tb.rename_column("amount", "price")
        # zero-copy proof: same files, same inodes, footer still 'amount'
        after = _files(engine, "t")
        assert after == before and {os.stat(f).st_ino for f in after} == inodes
        assert "amount" in _footer_cols(after[0]) and "price" not in _footer_cols(after[0])
        rows = sorted(tb.read(), key=lambda r: r["id"])
        assert [r["price"] for r in rows] == [10.0, 20.0]
        assert all("amount" not in r for r in rows)
        # writes after the rename use the logical name but land physical
        tb.append([{"id": 3, "price": 30.0}])
        tb.flush()
        newest = max(_files(engine, "t"), key=os.path.getmtime)
        assert "amount" in _footer_cols(newest) and "price" not in _footer_cols(newest)
        rows = sorted(tb.read(), key=lambda r: r["id"])
        assert [r["price"] for r in rows] == [10.0, 20.0, 30.0]


def test_drop_then_readd_does_not_resurrect(engine):
    with engine.node_context("w", outputs={"out": "t"}):
        tb = Table("out", "w")
        tb.append(engine.spark.createDataFrame([(1, "secret")], "id long, note string").coalesce(1))
        tb.flush()
        tb.drop_column("note")
        assert "note" not in {f.name for f in tb.schema.fields}
        assert "note" not in tb.read()[0]
        # re-adding the same name maps to a FRESH physical column
        tb.add_column("note", "string")
        assert tb.read()[0]["note"] is None  # old 'secret' must NOT reappear
        tb.append([{"id": 2, "note": "fresh"}])
        tb.flush()
        rows = sorted(tb.read(), key=lambda r: r["id"])
        assert [r["note"] for r in rows] == [None, "fresh"]
        newest = max(_files(engine, "t"), key=os.path.getmtime)
        cols = _footer_cols(newest)
        assert "note__2" in cols and "note" not in cols  # fresh physical name at rest


def test_alter_sql_surface(engine):
    with engine.node_context("w", outputs={"out": "t"}):
        tb = Table("out", "w")
        tb.append([{"id": 1, "v": 5}])
        tb.flush()
        tb.execute_sql("ALTER TABLE {{ this }} ADD COLUMN lbl string DEFAULT 'unset'")
        tb.execute_sql("ALTER TABLE {{ this }} RENAME COLUMN v TO value")
        tb.execute_sql("ALTER TABLE {{ this }} DROP COLUMN lbl")
        row = tb.read()[0]
        assert row["value"] == 5 and "v" not in row and "lbl" not in row


def test_rename_then_dml_and_sql_views(engine):
    with engine.node_context("w", outputs={"out": "t"}):
        tb = Table("out", "w")
        tb.append(
            engine.spark.createDataFrame(
                [(1, "a", 10), (2, "b", 20), (3, "a", 30)], "id long, grp string, v long"
            ).coalesce(1)
        )
        tb.flush()
        tb.rename_column("v", "val")
        # DML through logical names: update + delete route through the
        # file-scoped rewrite and must keep physical files consistent
        tb.execute_sql("UPDATE {{ this }} SET val = val + 1 WHERE grp = 'a'")
        tb.execute_sql("DELETE FROM {{ this }} WHERE id = 2")
        rows = sorted(tb.read(), key=lambda r: r["id"])
        assert [(r["id"], r["val"]) for r in rows] == [(1, 11), (3, 31)]
        # engine SQL views expose logical names
        res = tb.read_sql("SELECT sum(val) AS s FROM {{ this }}")
        assert res[0]["s"] == 42


def test_protected_columns_refuse_alter(engine):
    with engine.node_context("w", outputs={"out": "t"}):
        tb = Table("out", "w")
        tb.init(unique_on=["id"], partition_by=["grp"])
        tb.append([{"id": 1, "grp": "a", "v": 1}])
        tb.flush()
        with pytest.raises(ValueError):
            tb.rename_column("id", "id2")
        with pytest.raises(ValueError):
            tb.drop_column("grp")


def test_rename_survives_upsert_and_versions(engine):
    with engine.node_context("w", outputs={"out": "t"}):
        tb = Table("out", "w")
        tb.init(unique_on=["id"])
        tb.append(engine.spark.createDataFrame([(1, 10), (2, 20)], "id long, v long").coalesce(1))
        tb.flush()
        tb.rename_column("v", "score")
        tb.upsert([{"id": 2, "score": 99}, {"id": 3, "score": 30}])
        tb.flush()
        rows = sorted(tb.read(), key=lambda r: r["id"])
        assert [(r["id"], r["score"]) for r in rows] == [(1, 10), (2, 99), (3, 30)]
        # at rest every file is uniformly physical ('v')
        for f in _files(engine, "t"):
            cols = _footer_cols(f)
            assert "v" in cols and "score" not in cols


def test_maintenance_ops_after_rename(engine):
    """compact and clone must stay consistent with the column mapping:
    compact rewrites PHYSICAL files untouched by the rename, clone
    carries the mapping so linked files still read logically."""
    with engine.node_context("w", outputs={"out": "t"}):
        tb = Table("out", "w")
        for i in range(3):  # several small appends -> multiple files
            tb.append(engine.spark.createDataFrame([(i, i * 1.0)], "id long, amount double").coalesce(1))
            tb.flush()
        tb.rename_column("amount", "price")
        tb.compact()
        rows = sorted(tb.read(), key=lambda r: r["id"])
        assert [r["price"] for r in rows] == [0.0, 1.0, 2.0]
        newest = max(_files(engine, "t"), key=os.path.getmtime)
        cols = _footer_cols(newest)
        assert "amount" in cols and "price" not in cols  # compacted file still physical
    with engine.node_context("w2", outputs={"out": "t_clone"}):
        cl = Table("out", "w")
        cl.clone_from("t")
        rows = sorted(cl.read(), key=lambda r: r["id"])
        assert [r["price"] for r in rows] == [0.0, 1.0, 2.0]  # mapping travels with the clone
