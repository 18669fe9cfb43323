"""Catalog commit batching (catalog.commit_batch): a write path's
finalize section — manifest, record count, file stats, hwm, CAS flip,
GC — lands in ONE backend transaction instead of one per field. The
laws that must hold:

- N nested mutators, one backend transaction (the metadata-plane
  shape a remote metastore needs: one conditional put per commit).
- A CAS refusal (ConcurrentWriteError) inside the batch rolls the
  WHOLE batch back — no stats/counts of the orphan version commit.
- Reads inside the batch see the batch's writes (read-your-writes).
- GC file deletion inside a batch is deferred until AFTER the
  metadata commit (crash ordering of SCALE.md §68 preserved).
"""
import os

import pytest

from patterns_devkit_spark import Table
from patterns_devkit_spark.catalog.catalog import ConcurrentWriteError


def test_upsert_finalize_is_one_transaction(engine, monkeypatch):
    from patterns_devkit_spark.catalog import backends

    with engine.node_context("w", outputs={"out": "cb1"}):
        t = Table("out", "w")
        t.init(unique_on=["k"])
        t.append([{"k": 1, "v": 1}])
        t.flush()

        calls = []
        orig = backends.JsonFileBackend.transaction

        def counting(self):
            calls.append(1)
            return orig(self)

        monkeypatch.setattr(backends.JsonFileBackend, "transaction", counting)
        t.upsert([{"k": 1, "v": 2}])
        t.flush()
        # full-merge upsert: create_new_version + manifest record + ONE
        # batched finalize (count/stats/flip/gc) + schema ddl = 4, not 7
        assert len(calls) <= 4, f"{len(calls)} backend transactions for one upsert"
        assert [r["v"] for r in t.read()] == [2]


def test_cas_refusal_rolls_back_whole_batch(engine):
    cat = engine.catalog
    with engine.node_context("w", outputs={"out": "cb2"}):
        t = Table("out", "w")
        t.init(unique_on=["k"])
        t.append([{"k": 1, "v": 1}])
        t.flush()
        base = t.get_active_version().version_id

        # simulate a concurrent writer landing between the read and the
        # CAS flip: flip the pointer to a fresh version under the upsert
        real_create = cat.create_new_version
        ours = []

        def hijack(name):
            vid = real_create(name)
            ours.append(vid)
            # another "writer" commits a flip the moment our version id
            # is allocated (before our CAS) — the classic lost-update race
            other = real_create(name)
            cat.set_active_version(name, other)
            return vid

        cat.create_new_version = hijack
        try:
            t.upsert([{"k": 1, "v": 99}])
            with pytest.raises(ConcurrentWriteError):
                t.flush()
        finally:
            cat.create_new_version = real_create
        # the refused upsert's version is dropped (orphan cleanup), so
        # none of its batched metadata survived the rollback either
        meta = cat.table_meta("cb2")
        assert ours and ours[0] not in meta["versions"]
        assert ours[0] not in (meta.get("record_counts") or {})
        assert ours[0] not in (meta.get("manifests") or {})
        assert base in meta["versions"]


def test_read_your_writes_inside_batch(engine):
    cat = engine.catalog
    with engine.node_context("w", outputs={"out": "cb3"}):
        t = Table("out", "w")
        t.append([{"k": 1}])
        t.flush()
        vid = t.get_active_version().version_id
    with cat.commit_batch():
        cat.set_record_count("cb3", vid, 777)
        assert cat.get_record_count("cb3", vid) == 777  # visible pre-commit
    assert cat.get_record_count("cb3", vid) == 777  # committed


def test_batch_abort_discards_everything(engine):
    cat = engine.catalog
    with engine.node_context("w", outputs={"out": "cb4"}):
        t = Table("out", "w")
        t.append([{"k": 1}])
        t.flush()
        vid = t.get_active_version().version_id
    before = cat.get_record_count("cb4", vid)
    with pytest.raises(RuntimeError, match="boom"):
        with cat.commit_batch():
            cat.set_record_count("cb4", vid, 123456)
            raise RuntimeError("boom")
    assert cat.get_record_count("cb4", vid) == before


def test_gc_file_deletion_deferred_past_commit(engine, monkeypatch):
    """Inside a batch, gc's physical unlink must happen AFTER the
    backend commit: at save() time the doomed version's files must
    still exist on disk (metadata first, files after)."""
    from patterns_devkit_spark.catalog import backends

    cat = engine.catalog
    with engine.node_context("w", outputs={"out": "cb5"}):
        t = Table("out", "w")
        # 6 replace versions: beyond default retention of 3
        for i in range(6):
            t.replace([{"k": i}])
            t.flush()
    meta = cat.table_meta("cb5")
    doomed_candidate = meta["versions"][0]
    ddir = cat.version_dir("cb5", doomed_candidate)

    seen_at_save = {}
    orig_save = backends.JsonFileBackend.save

    def spying(self, doc):
        if os.path.isdir(ddir):
            seen_at_save["existed"] = True
        return orig_save(self, doc)

    monkeypatch.setattr(backends.JsonFileBackend, "save", spying)
    with cat.commit_batch():
        dropped = cat.gc_versions("cb5")
    if doomed_candidate in dropped:
        assert seen_at_save.get("existed"), "files deleted before the metadata commit"
        assert not os.path.isdir(ddir) or not os.listdir(ddir)
