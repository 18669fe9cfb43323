"""Deletion vectors: row-level DELETE as pure metadata
(delete_where(vectorized=True)) — every file is CARRIED into the new
version (hardlink fast path / pure manifest refs) and the matched
rows' (file ref, parquet row_index) coordinates become a version-level
mask applied by every read. The 100 TB shape: deleting 100 rows from a
100 GB file costs O(files) metadata, not a rewrite. Invariants:

- reads (read_spark / SQL templates / version reads) never see masked
  rows, under BOTH link modes;
- rewriting writers (classic DELETE/UPDATE, upsert MERGE, compact)
  MATERIALIZE the mask — they read mask-applied and write clean
  parquet, never resurrecting deleted rows via carried files;
- zero-copy carries of a masked version (restore, clone) carry the
  mask with the files;
- past max_dv_rows matches the write falls back to the bounded
  rewrite (a mask bigger than its data is the wrong trade)."""
import glob
import os

import pytest

from patterns_devkit_spark import Table


def _mk(engine, name, files=2, rows=30):
    t = Table("out", "w")
    t.append(
        engine.spark.createDataFrame(
            [(i, i % 3) for i in range(rows)], "id long, grp long"
        ).coalesce(files)
    )
    t.flush()
    return t


def test_dv_delete_masks_rows_without_rewriting(engine):
    with engine.node_context("n", outputs={"out": "dv1"}):
        t = _mk(engine, "dv1")
        v1 = t.get_active_version().version_id
        n = t.delete_where("grp = 1", vectorized=True)
        assert n == 10
        v2 = t.get_active_version().version_id
        assert v2 != v1
        ids = sorted(r["id"] for r in t.read_spark().collect())
        assert len(ids) == 20 and all(i % 3 != 1 for i in ids)
        # pure metadata: record count maintained without a count job,
        # DV map covers both carried files, old version intact
        assert engine.catalog.get_record_count("dv1", v2) == 20
        dvs = engine.catalog.get_deletion_vectors("dv1", v2)
        assert sum(len(v) for v in dvs.values()) == 10
        assert len(t.read_spark(version=v1).collect()) == 30
        # SQL template reads apply the mask too
        rows = t.read_sql("SELECT count(*) AS n FROM {{ this }} WHERE grp = 1")
        assert rows[0]["n"] == 0


def test_dv_delete_is_zero_copy(engine):
    from tests.conftest import REFERENCE_LINK_MODE

    with engine.node_context("n", outputs={"out": "dvz"}):
        t = _mk(engine, "dvz")
        v1 = t.get_active_version().version_id
        d1 = engine.catalog.version_dir("dvz", v1)
        inodes_before = {os.stat(p).st_ino for p in glob.glob(d1 + "/**/*.parquet", recursive=True)}
        t.delete_where("grp = 1", vectorized=True)
        v2 = t.get_active_version().version_id
        d2 = engine.catalog.version_dir("dvz", v2)
        files2 = glob.glob(d2 + "/**/*.parquet", recursive=True)
        if REFERENCE_LINK_MODE:
            # object-storage simulation: nothing physical in the new
            # version at all — the manifest refs the old files
            assert files2 == []
            refs = engine.catalog.get_manifest("dvz", v2)
            assert refs and all(r.startswith(f"dvz/{v1}/") for r in refs)
        else:
            assert {os.stat(p).st_ino for p in files2} == inodes_before


def test_dv_stacked_deletes_union(engine):
    with engine.node_context("n", outputs={"out": "dvs"}):
        t = _mk(engine, "dvs")
        assert t.delete_where("grp = 1", vectorized=True) == 10
        assert t.delete_where("grp = 2", vectorized=True) == 10
        ids = sorted(r["id"] for r in t.read_spark().collect())
        assert len(ids) == 10 and all(i % 3 == 0 for i in ids)
        # deleting already-deleted rows is a no-op, not a double count
        assert t.delete_where("grp = 1", vectorized=True) == 0


def test_dv_append_after_mask(engine):
    with engine.node_context("n", outputs={"out": "dva"}):
        t = _mk(engine, "dva")
        t.delete_where("grp = 1", vectorized=True)
        t.append([{"id": 100, "grp": 1}])
        t.flush()
        ids = sorted(r["id"] for r in t.read_spark().collect())
        # the new row is visible (appended files carry no mask);
        # previously masked rows stay masked
        assert 100 in ids and len(ids) == 21


def test_rewriting_writers_materialize_the_mask(engine):
    # classic rewrite DELETE on a masked table must not resurrect
    with engine.node_context("n", outputs={"out": "dvm"}):
        t = _mk(engine, "dvm")
        t.delete_where("grp = 1", vectorized=True)
        n = t.delete_where("grp = 2")  # rewrite path
        assert n == 10
        v = t.get_active_version().version_id
        assert engine.catalog.get_deletion_vectors("dvm", v) == {}
        ids = sorted(r["id"] for r in t.read_spark().collect())
        assert len(ids) == 10 and all(i % 3 == 0 for i in ids)

    # upsert MERGE on a masked table must not resurrect either
    with engine.node_context("n", outputs={"out": "dvu"}):
        t = Table("out", "w")
        t.init(unique_on=["id"])
        t.append(
            engine.spark.createDataFrame(
                [(i, i % 3) for i in range(30)], "id long, grp long"
            ).coalesce(2)
        )
        t.flush()
        t.delete_where("grp = 1", vectorized=True)
        t.upsert([{"id": 0, "grp": 7}])
        t.flush()
        rows = {r["id"]: r["grp"] for r in t.read_spark().collect()}
        assert rows[0] == 7 and len(rows) == 20
        assert all(g != 1 for i, g in rows.items() if i != 0)

    # compact materializes: clean files, empty mask, same rows
    with engine.node_context("n", outputs={"out": "dvc"}):
        t = _mk(engine, "dvc", files=4)
        t.delete_where("grp = 1", vectorized=True)
        before = sorted(r["id"] for r in t.read_spark().collect())
        t.compact(target_files=1)
        v = t.get_active_version().version_id
        assert engine.catalog.get_deletion_vectors("dvc", v) == {}
        assert sorted(r["id"] for r in t.read_spark().collect()) == before


def test_dv_mask_rides_zero_copy_carries(engine):
    with engine.node_context("n", outputs={"out": "dvr", "cl": "dvr_clone"}):
        t = _mk(engine, "dvr")
        t.delete_where("grp = 1", vectorized=True)
        masked = t.get_active_version().version_id
        t.delete_where("grp = 2", vectorized=True)
        # restore to the singly-masked version: carried files + mask
        t.restore(masked)
        ids = sorted(r["id"] for r in t.read_spark().collect())
        assert len(ids) == 20 and all(i % 3 != 1 for i in ids)
        # clone of a masked table carries the mask across tables
        c = Table("cl", "w")
        c.clone_from("dvr")
        cids = sorted(r["id"] for r in c.read_spark().collect())
        assert cids == ids


def test_dv_mask_applies_to_pruned_reads(engine):
    # regression: read_pruned used to read the kept file subset
    # WITHOUT the mask, resurrecting deleted rows whenever skipping
    # actually dropped a file
    with engine.node_context("n", outputs={"out": "dvpr"}):
        t = Table("out", "w")
        t.init(stat_columns=["id", "grp"])
        df = engine.spark.createDataFrame(
            [(i, i % 3) for i in range(30)], "id long, grp long"
        )
        t.append(df.where("id < 15").coalesce(1))
        t.flush()
        t.append(df.where("id >= 15").coalesce(1))
        t.flush()
        t.delete_where("grp = 1", vectorized=True)
        kept, total = t.prune_files([("id", ">=", 15)])
        assert (len(kept), total) == (1, 2)  # skipping really engaged
        rows = t.read_pruned([("id", ">=", 15)]).collect()
        assert len(rows) == 10 and all(r["grp"] != 1 for r in rows)


def test_dv_mask_applies_to_as_of_subset_reads(engine):
    # regression: a timestamp read that resolves a stamped FILE SUBSET
    # of a masked version (instant between the DV publish and a later
    # in-place append) used to skip the mask — all deleted rows
    # resurrected at exactly the instants time travel promises to be
    # content-exact for
    import time

    with engine.node_context("n", outputs={"out": "dvaof"}):
        t = _mk(engine, "dvaof")
        t.delete_where("grp = 1", vectorized=True)
        engine.register_system_views()
        inst = engine.spark.sql(
            "SELECT published_at FROM __sys_versions"
            " WHERE table_name = 'dvaof' AND is_active"
        ).collect()[0]["published_at"]
        time.sleep(0.05)
        t.append([{"id": 100, "grp": 0}])
        t.flush()
        got = t.read_spark(version=inst).collect()
        assert len(got) == 20 and all(r["grp"] != 1 for r in got)
        assert all(r["id"] != 100 for r in got)  # append excluded
        now = t.read_spark().collect()
        assert len(now) == 21  # current read still sees the append


def test_dv_update_masks_old_images(engine):
    from tests.conftest import REFERENCE_LINK_MODE, physical_parquet

    with engine.node_context("n", outputs={"out": "dvu2"}):
        t = _mk(engine, "dvu2")
        v1 = t.get_active_version().version_id
        d1 = engine.catalog.version_dir("dvu2", v1)
        inodes_before = {
            os.stat(p).st_ino for p in glob.glob(d1 + "/**/*.parquet", recursive=True)
        }
        n = t.update_where({"grp": "grp + 10"}, "grp = 1", vectorized=True)
        assert n == 10
        v2 = t.get_active_version().version_id
        rows = {r["id"]: r["grp"] for r in t.read_spark().collect()}
        # record count unchanged; every matched row updated exactly once
        assert len(rows) == 30
        assert all(g == 11 if i % 3 == 1 else g == i % 3 for i, g in rows.items())
        assert engine.catalog.get_record_count("dvu2", v2) == 30
        # old images masked, not rewritten: DV entries cover them and
        # the parent's files are carried zero-copy
        dvs = engine.catalog.get_deletion_vectors("dvu2", v2)
        assert sum(len(v) for v in dvs.values()) == 10
        d2 = engine.catalog.version_dir("dvu2", v2)
        files2 = physical_parquet(d2)
        if REFERENCE_LINK_MODE:
            # own files = ONLY the updated images; parent files carried
            # as pure manifest refs
            refs = engine.catalog.get_manifest("dvu2", v2)
            ext = [r for r in refs if r.startswith(f"dvu2/{v1}/")]
            assert len(ext) == 2 and len(files2) >= 1
        else:
            assert inodes_before < set(files2.values())  # carried + new
        # the parent version still reads un-updated
        old = {r["id"]: r["grp"] for r in t.read_spark(version=v1).collect()}
        assert all(g == i % 3 for i, g in old.items())


def test_dv_update_stacks_on_dv_delete(engine):
    with engine.node_context("n", outputs={"out": "dvud"}):
        t = _mk(engine, "dvud")
        assert t.delete_where("grp = 2", vectorized=True) == 10
        # the masked rows are invisible to the update's predicate
        assert t.update_where({"grp": "99"}, "grp >= 1", vectorized=True) == 10
        rows = {r["id"]: r["grp"] for r in t.read_spark().collect()}
        assert len(rows) == 20
        assert all(g == 99 if i % 3 == 1 else g == 0 for i, g in rows.items())
        # a rewriting writer afterwards materializes the whole mask
        t.delete_where("grp = 0")
        v = t.get_active_version().version_id
        assert engine.catalog.get_deletion_vectors("dvud", v) == {}
        rows = {r["id"]: r["grp"] for r in t.read_spark().collect()}
        assert len(rows) == 10 and set(rows.values()) == {99}


def test_dv_update_falls_back_past_threshold(engine):
    with engine.node_context("n", outputs={"out": "dvuf"}):
        t = _mk(engine, "dvuf")
        n = t.update_where({"grp": "7"}, "grp = 1", vectorized=True, max_dv_rows=3)
        assert n == 10  # applied via the rewrite fallback
        v = t.get_active_version().version_id
        assert engine.catalog.get_deletion_vectors("dvuf", v) == {}
        rows = {r["id"]: r["grp"] for r in t.read_spark().collect()}
        assert len(rows) == 30 and all(g == 7 if i % 3 == 1 else g == i % 3 for i, g in rows.items())


def _mk_three_files(engine, spark):
    # three single-file appends with disjoint id ranges (ids 0-9 /
    # 10-19 / 20-29) so file-level behavior is controllable
    t = Table("out", "w")
    df = spark.createDataFrame([(i, i % 3) for i in range(30)], "id long, grp long")
    for lo in (0, 10, 20):
        t.append(df.where(f"id >= {lo} AND id < {lo + 10}").coalesce(1))
        t.flush()
    return t


def test_masked_rewrite_is_bounded(engine):
    # a classic (rewriting) DELETE on a masked table must rewrite ONLY
    # files that contain matches or carry mask entries — it used to
    # rewrite the whole table the moment any mask existed
    from tests.conftest import REFERENCE_LINK_MODE, physical_parquet

    with engine.node_context("n", outputs={"out": "dvb"}):
        t = _mk_three_files(engine, engine.spark)
        v1 = t.get_active_version().version_id
        # mask lives only in file 1 (ids 0-9)
        assert t.delete_where("id IN (1, 4)", vectorized=True) == 2
        v2 = t.get_active_version().version_id
        # classic delete matches only file 2 (ids 10-19)
        assert t.delete_where("id IN (12, 15)") == 2
        v3 = t.get_active_version().version_id
        assert engine.catalog.get_deletion_vectors("dvb", v3) == {}
        ids = sorted(r["id"] for r in t.read_spark().collect())
        assert ids == [i for i in range(30) if i not in (1, 4, 12, 15)]
        # file 3 (ids 20-29): clean and unmatched -> carried zero-copy
        if REFERENCE_LINK_MODE:
            refs = engine.catalog.get_manifest("dvb", v3)
            ext = [r for r in refs if not r.startswith(f"dvb/{v3}/")]
            assert len(ext) == 1  # exactly one carried file
        else:
            d1 = engine.catalog.version_dir("dvb", v1)
            d3 = engine.catalog.version_dir("dvb", v3)
            shared = set(physical_parquet(d1).values()) & set(physical_parquet(d3).values())
            assert len(shared) == 1


def test_purge_deletes_materializes_only_masked_files(engine):
    from tests.conftest import REFERENCE_LINK_MODE, physical_parquet

    with engine.node_context("n", outputs={"out": "dvg"}):
        t = _mk_three_files(engine, engine.spark)
        v1 = t.get_active_version().version_id
        assert t.delete_where("id IN (2, 13)", vectorized=True) == 2  # masks files 1+2
        before = sorted(r["id"] for r in t.read_spark().collect())
        n = t.purge_deletes()
        assert n == 2
        v = t.get_active_version().version_id
        assert engine.catalog.get_deletion_vectors("dvg", v) == {}
        assert sorted(r["id"] for r in t.read_spark().collect()) == before
        assert engine.catalog.get_record_count("dvg", v) == 28
        # file 3 never masked -> carried; files 1+2 rewritten clean
        if REFERENCE_LINK_MODE:
            refs = engine.catalog.get_manifest("dvg", v)
            ext = [r for r in refs if not r.startswith(f"dvg/{v}/")]
            assert len(ext) == 1
        else:
            d1 = engine.catalog.version_dir("dvg", v1)
            dv = engine.catalog.version_dir("dvg", v)
            shared = set(physical_parquet(d1).values()) & set(physical_parquet(dv).values())
            assert len(shared) == 1
        # idempotent: nothing left to purge
        assert t.purge_deletes() == 0


def test_sys_versions_reports_masked_rows(engine):
    with engine.node_context("n", outputs={"out": "dvsv"}):
        t = _mk(engine, "dvsv")
        t.delete_where("grp = 1", vectorized=True)
    engine.register_system_views()
    rows = {
        r["version_id"]: (r["record_count"], r["n_masked_rows"])
        for r in engine.spark.sql(
            "SELECT version_id, record_count, n_masked_rows FROM __sys_versions"
            " WHERE table_name = 'dvsv'"
        ).collect()
    }
    assert (30, 0) in rows.values() and (20, 10) in rows.values()


def test_dv_falls_back_to_rewrite_past_threshold(engine):
    with engine.node_context("n", outputs={"out": "dvf"}):
        t = _mk(engine, "dvf")
        n = t.delete_where("grp = 1", vectorized=True, max_dv_rows=3)
        assert n == 10  # deleted via the rewrite fallback
        v = t.get_active_version().version_id
        assert engine.catalog.get_deletion_vectors("dvf", v) == {}
        assert len(t.read_spark().collect()) == 20


def test_sys_files_census(engine):
    from tests.conftest import REFERENCE_LINK_MODE

    with engine.node_context("n", outputs={"out": "dvsf"}):
        t = _mk(engine, "dvsf")
        t.delete_where("grp = 1", vectorized=True)
    engine.register_system_views()
    rows = engine.spark.sql(
        "SELECT version_id, is_carried, n_masked_rows FROM __sys_files"
        " WHERE table_name = 'dvsf'"
    ).collect()
    v2 = engine.catalog.get_active_version("dvsf")
    v2_rows = [r for r in rows if r["version_id"] == v2]
    assert len(v2_rows) == 2  # both parent files present in the census
    assert sum(r["n_masked_rows"] for r in v2_rows) == 10
    if REFERENCE_LINK_MODE:
        assert all(r["is_carried"] for r in v2_rows)  # pure refs
    else:
        assert all(not r["is_carried"] for r in v2_rows)  # hardlinked own


def test_truncate_clears_deletion_vectors(engine):
    """truncate() rewrites the version in place — a mask left behind
    would inflate __sys_versions.n_masked_rows, count against future
    DV budgets, and be carried forward by the ref remap forever."""
    with engine.node_context("n", outputs={"out": "dvtr"}):
        t = _mk(engine, "dvtr")
        assert t.delete_where("grp = 1", vectorized=True) == 10
        av = t.get_active_version().version_id
        assert engine.catalog.get_deletion_vectors("dvtr", av)
        t.truncate()
        assert engine.catalog.get_deletion_vectors("dvtr", av) == {}
        # a fresh DV delete after truncate budgets from zero
        t.append(
            engine.spark.createDataFrame(
                [(i, i % 3) for i in range(12)], "id long, grp long"
            ).coalesce(1)
        )
        t.flush()
        assert t.delete_where("grp = 0", vectorized=True, max_dv_rows=10) == 4
        v = t.get_active_version().version_id
        assert sum(len(x) for x in engine.catalog.get_deletion_vectors("dvtr", v).values()) == 4
        assert sorted(r["id"] for r in t.read_spark().collect()) == [
            i for i in range(12) if i % 3 != 0
        ]


def test_dv_update_keeps_flat_parent_layout(engine):
    """Vectorized UPDATE on a table whose files landed BEFORE
    partition_by was declared must write the updated images FLAT:
    hive dirs next to carried root files form the mixed dataset Spark
    silently drops rows from (same guard as purge_deletes/MoR-upsert)."""
    with engine.node_context("w", outputs={"out": "dvflat"}):
        t = Table("out", "w")
        t.init(unique_on=["k"])  # flat layout first
        t.append(
            engine.spark.createDataFrame(
                [(i, f"g{i % 3}", float(i)) for i in range(30)],
                "k long, grp string, v double",
            ).coalesce(2)
        )
        t.flush()
        t.init(partition_by="grp")  # declared AFTER the files landed
        assert t.update_where({"v": "v + 1000"}, "k = 0", vectorized=True) == 1
        got = {r["k"]: r["v"] for r in t.read_spark().collect()}
    expected = {i: float(i) for i in range(30)}
    expected[0] = 1000.0
    assert got == expected  # 30 rows: nothing silently dropped
    # and the updated image really landed flat (no grp= dirs)
    v = engine.catalog.get_active_version("dvflat")
    d = engine.catalog.version_dir("dvflat", v)
    assert not glob.glob(os.path.join(d, "grp=*"))
