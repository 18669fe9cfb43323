"""Merge-on-read upsert (init(merge_on_read=...)): the deletion-vector
MERGE. An upsert whose keys scatter across the table masks the OLD
images of matched keys via (file, row_index) deletion vectors and
appends only the batch — O(files) metadata + the batch write, never a
rewrite. Invariants:

- reads see exactly the merged state (new images win, old masked);
- files of the parent version are carried zero-copy under BOTH link
  modes; only the batch lands as new files;
- masks accumulate across flushes and the ACCUMULATED total is
  bounded: past the budget the flush falls back to the rewriting
  MERGE, which materializes;
- compact() materializes; last-wins batch dedup still applies;
- record counts are maintained with no count job."""
import glob
import os

from patterns_devkit_spark import Table


def _mk(engine, name, rows=30, files=3, **init):
    t = Table("out", "w")
    t.init(unique_on=["id"], merge_on_read=True, **init)
    t.append(
        engine.spark.createDataFrame(
            [(i, i * 10) for i in range(rows)], "id long, v long"
        ).coalesce(files)
    )
    t.flush()
    return t


def test_mor_upsert_masks_and_appends(engine):
    from tests.conftest import REFERENCE_LINK_MODE, physical_parquet

    with engine.node_context("n", outputs={"out": "mor1"}):
        t = _mk(engine, "mor1")
        v1 = t.get_active_version().version_id
        d1 = engine.catalog.version_dir("mor1", v1)
        ino1 = {os.stat(p).st_ino for p in glob.glob(d1 + "/**/*.parquet", recursive=True)}
        t.upsert([{"id": 0, "v": -1}, {"id": 29, "v": -2}, {"id": 100, "v": 5}])
        t.flush()
        v2 = t.get_active_version().version_id
        rows = {r["id"]: r["v"] for r in t.read_spark().collect()}
        assert len(rows) == 31 and rows[0] == -1 and rows[29] == -2 and rows[100] == 5
        assert rows[5] == 50  # untouched keys intact
        # pure metadata: two old images masked, count maintained
        dvs = engine.catalog.get_deletion_vectors("mor1", v2)
        assert sum(len(x) for x in dvs.values()) == 2
        assert engine.catalog.get_record_count("mor1", v2) == 31
        d2 = engine.catalog.version_dir("mor1", v2)
        files2 = physical_parquet(d2)
        if REFERENCE_LINK_MODE:
            refs = engine.catalog.get_manifest("mor1", v2)
            ext = [r for r in refs if r.startswith(f"mor1/{v1}/")]
            # parent files = pure refs; own files = just the batch
            assert len(ext) == 3 and len(files2) >= 1
        else:
            assert ino1 < set(files2.values())  # carried + the batch file
        # parent version unchanged (time travel)
        old = {r["id"]: r["v"] for r in t.read_spark(version=v1).collect()}
        assert old[0] == 0 and 100 not in old


def test_mor_upserts_stack_and_compact_materializes(engine):
    with engine.node_context("n", outputs={"out": "mor2"}):
        t = _mk(engine, "mor2")
        t.upsert([{"id": 3, "v": -3}])
        t.flush()
        t.upsert([{"id": 3, "v": -4}, {"id": 7, "v": -7}])
        t.flush()
        rows = {r["id"]: r["v"] for r in t.read_spark().collect()}
        assert len(rows) == 30 and rows[3] == -4 and rows[7] == -7
        v = t.get_active_version().version_id
        # mask accumulates: first flush masked id=3 once, second masked
        # the id=3 REPLACEMENT (in v2's own file) plus id=7
        assert sum(len(x) for x in engine.catalog.get_deletion_vectors("mor2", v).values()) == 3
        t.compact(target_files=1)
        v = t.get_active_version().version_id
        assert engine.catalog.get_deletion_vectors("mor2", v) == {}
        rows = {r["id"]: r["v"] for r in t.read_spark().collect()}
        assert len(rows) == 30 and rows[3] == -4 and rows[7] == -7


def test_mor_budget_falls_back_to_rewrite(engine):
    with engine.node_context("n", outputs={"out": "mor3"}):
        t = _mk(engine, "mor3")
        t.init(merge_on_read=4)  # tiny accumulated-mask budget
        t.upsert([{"id": i, "v": -i} for i in range(3)])  # 3 ≤ 4: MoR
        t.flush()
        v = t.get_active_version().version_id
        assert sum(len(x) for x in engine.catalog.get_deletion_vectors("mor3", v).values()) == 3
        # next flush would push the accumulated mask past 4: the
        # rewriting MERGE takes over AND materializes the old mask
        t.upsert([{"id": 10, "v": -10}, {"id": 11, "v": -11}])
        t.flush()
        v = t.get_active_version().version_id
        assert engine.catalog.get_deletion_vectors("mor3", v) == {}
        rows = {r["id"]: r["v"] for r in t.read_spark().collect()}
        assert len(rows) == 30
        assert rows[0] == 0 == -0 and rows[1] == -1 and rows[10] == -10 and rows[11] == -11


def test_mor_sql_dml_routes_to_deletion_vectors(engine):
    # execute_sql DELETE/UPDATE on a merge_on_read table takes the DV
    # forms instead of the rewrite
    with engine.node_context("n", outputs={"out": "mor7"}):
        t = _mk(engine, "mor7")
        t.execute_sql("DELETE FROM {{ this }} WHERE id % 3 = 1")
        v = t.get_active_version().version_id
        assert sum(len(x) for x in engine.catalog.get_deletion_vectors("mor7", v).values()) == 10
        t.execute_sql("UPDATE {{ this }} SET v = -1 WHERE id % 3 = 2")
        v = t.get_active_version().version_id
        assert sum(len(x) for x in engine.catalog.get_deletion_vectors("mor7", v).values()) == 20
        rows = {r["id"]: r["v"] for r in t.read_spark().collect()}
        assert len(rows) == 20
        assert all(v == -1 if i % 3 == 2 else v == i * 10 for i, v in rows.items())


def test_dv_accumulated_budget_triggers_rewrite(engine):
    # stacked DV deletes must not grow the mask past the budget: the
    # write that would exceed it falls back to the materializing rewrite
    with engine.node_context("n", outputs={"out": "mor8"}):
        t = _mk(engine, "mor8")
        assert t.delete_where("id < 6", vectorized=True, max_dv_rows=10) == 6
        v = t.get_active_version().version_id
        assert sum(len(x) for x in engine.catalog.get_deletion_vectors("mor8", v).values()) == 6
        # 6 accumulated + 6 fresh > 10: rewrite, mask cleared
        assert t.delete_where("id >= 24", vectorized=True, max_dv_rows=10) == 6
        v = t.get_active_version().version_id
        assert engine.catalog.get_deletion_vectors("mor8", v) == {}
        assert len(t.read_spark().collect()) == 18


def test_mor_batch_dedup_last_wins(engine):
    with engine.node_context("n", outputs={"out": "mor4"}):
        t = _mk(engine, "mor4")
        t.upsert([{"id": 7, "v": 1}, {"id": 7, "v": 2}])
        t.flush()
        rows = {r["id"]: r["v"] for r in t.read_spark().collect()}
        assert rows[7] == 2 and len(rows) == 30


def test_mor_insert_only_batch_is_pure_append(engine):
    with engine.node_context("n", outputs={"out": "mor5"}):
        t = _mk(engine, "mor5")
        t.upsert([{"id": 200, "v": 1}, {"id": 201, "v": 2}])
        t.flush()
        v = t.get_active_version().version_id
        # no key matched: nothing masked, just appended
        assert engine.catalog.get_deletion_vectors("mor5", v) == {}
        assert engine.catalog.get_record_count("mor5", v) == 32
        assert len(t.read_spark().collect()) == 32


def test_mor_probe_prunes_files_by_key_stats(engine):
    # the old-image probe file-skips on the key: an upsert whose keys
    # fall in one file's min/max range probes exactly that file — and
    # the skipped files provably hold no match, so the result is
    # identical to the full probe
    with engine.node_context("n", outputs={"out": "morp"}):
        t = Table("out", "w")
        t.init(unique_on=["id"], merge_on_read=True, stat_columns=["id"])
        df = engine.spark.createDataFrame(
            [(i, i * 10) for i in range(30)], "id long, v long"
        )
        for lo in (0, 10, 20):  # three files with disjoint id ranges
            t.append(df.where(f"id >= {lo} AND id < {lo + 10}").coalesce(1))
            t.flush()
        batch = engine.spark.createDataFrame([(25, -25), (27, -27)], "id long, v long")
        kept = t._key_probe_files(batch, "id", 2, engine.catalog.get_active_version("morp"))
        assert kept is not None and len(kept) == 1  # only the 20-29 file
        t.upsert([{"id": 25, "v": -25}, {"id": 27, "v": -27}])
        t.flush()
        rows = {r["id"]: r["v"] for r in t.read_spark().collect()}
        assert len(rows) == 30 and rows[25] == -25 and rows[27] == -27
        assert rows[5] == 50 and rows[15] == 150  # untouched files intact
        v = t.get_active_version().version_id
        dvs = engine.catalog.get_deletion_vectors("morp", v)
        assert sum(len(x) for x in dvs.values()) == 2
        # every masked coordinate sits in the probed (20-29) file
        assert len(dvs) == 1


def test_mor_apply_cdc_is_dv_shaped(engine):
    # apply_cdc on a merge_on_read table masks every touched key's old
    # image ('D' included) and appends only the I/U rows — the replica
    # side of CDC becomes O(change) too, and the replica's OWN feeds
    # stay on the metadata fast path (files all carried)
    with engine.node_context("n", outputs={"out": "morc"}):
        t = _mk(engine, "morc")
        v1 = t.get_active_version().version_id
        t.apply_cdc(
            [
                {"op": "U", "id": 3, "v": -3},
                {"op": "D", "id": 5, "v": None},
                {"op": "I", "id": 77, "v": 77},
            ]
        )
        v2 = t.get_active_version().version_id
        rows = {r["id"]: r["v"] for r in t.read_spark().collect()}
        assert len(rows) == 30 and rows[3] == -3 and rows[77] == 77 and 5 not in rows
        # DV-shaped: old images of the two EXISTING touched keys masked
        dvs = engine.catalog.get_deletion_vectors("morc", v2)
        assert sum(len(x) for x in dvs.values()) == 2
        assert engine.catalog.get_record_count("morc", v2) == 30
        # lineage intact: the replica's own change feed takes the
        # metadata fast path and reports exactly the applied batch
        fast = t._change_feed_dv_fast(v1, v2, ["id"])
        assert fast is not None
        got = sorted((r["op"], r["id"]) for r in fast.collect())
        assert got == [("D", 5), ("I", 77), ("U", 3)]


def test_mor_stream_sees_new_images(engine):
    # the MoR upsert appends NEW row versions: a stream cursor past the
    # initial load picks up exactly the batch's images
    with engine.node_context("n", outputs={"out": "mor6"}):
        t = Table("out", "w")
        t.init(unique_on=["id"], merge_on_read=True, add_monotonic_id="seq")
        t.append([{"id": i, "v": i} for i in range(5)])
        t.flush()
        s = t.as_stream(order_by="seq")
        first = list(s.consume_records())
        assert len(first) == 5
        s.checkpoint()
        t.upsert([{"id": 2, "v": -2}, {"id": 9, "v": 9}])
        t.flush()
        delta = list(s.consume_records())
        assert sorted((r["id"], r["v"]) for r in delta) == [(2, -2), (9, 9)]


def test_mor_integer_budget_is_not_bool(engine):
    """init(merge_on_read=1) declares a 1-row mask budget; SQL DML must
    honour it (``1 in (True, None, False)`` is True — the old
    membership test silently swapped in the 100k default)."""
    from patterns_devkit_spark.node.node import _mor_budget

    assert _mor_budget(1) == 1
    assert _mor_budget(7) == 7
    assert _mor_budget(True) == 100_000
    assert _mor_budget(None) == 100_000
    with engine.node_context("n", outputs={"out": "morb1"}):
        t = Table("out", "w")
        t.init(unique_on=["id"], merge_on_read=1)
        t.append(
            engine.spark.createDataFrame(
                [(i, i * 10) for i in range(20)], "id long, v long"
            ).coalesce(1)
        )
        t.flush()
        # 4 doomed rows > budget 1: the SQL DELETE must take the
        # materializing rewrite, leaving NO mask
        t.execute_sql("DELETE FROM {{ this }} WHERE id < 4")
        v = t.get_active_version().version_id
        assert engine.catalog.get_deletion_vectors("morb1", v) == {}
        assert len(t.read_spark().collect()) == 16
        # a single-row DELETE fits the declared budget: DV path
        t.execute_sql("DELETE FROM {{ this }} WHERE id = 5")
        v = t.get_active_version().version_id
        assert sum(len(x) for x in engine.catalog.get_deletion_vectors("morb1", v).values()) == 1
        assert len(t.read_spark().collect()) == 15
