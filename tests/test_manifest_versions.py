"""Manifest-based versions (node/manifest.py): zero-copy semantics must
survive WITHOUT hardlinks — PDS_LINK_MODE=reference simulates object
storage, where a carry is a pure metadata (manifest) edit and GC
ref-counts files across every retained manifest. The default hardlink
mode keeps the inode tests elsewhere green; these tests prove the
reference mode reads/writes identically with zero materialization."""
import os

import pytest

from patterns_devkit_spark import Engine, Table


@pytest.fixture()
def ref_engine(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("PDS_LINK_MODE", "reference")
    return Engine(str(tmp_path / "wh_ref"), spark=spark)


def _parquet_files(d):
    out = []
    for root, _dirs, files in os.walk(d):
        out.extend(os.path.join(root, f) for f in files if f.endswith(".parquet"))
    return out


def _read_all(engine, store):
    with engine.node_context("r", inputs={"in": store}):
        return Table("in", "r").read()


def test_scoped_upsert_carries_by_reference(ref_engine):
    """Partition-scoped MERGE in reference mode: the new version's
    directory holds ONLY the rewritten partition; untouched partitions
    are manifest refs into the parent version — and the read resolves
    them transparently."""
    rows = [{"k": i, "grp": f"g{i % 3}", "v": float(i)} for i in range(30)]
    with ref_engine.node_context("w", outputs={"out": "pt"}):
        t = Table("out", "w")
        t.init(unique_on=["k"], partition_by="grp")
        t.append(rows)
        t.flush()
        v1 = t.get_active_version()
        t.upsert([{"k": 0, "grp": "g0", "v": 999.0}, {"k": 100, "grp": "g0", "v": 1.5}])
        t.flush()
        v2 = t.get_active_version()
        n2 = t.record_count
    # zero materialization: v2's dir holds only grp=g0 files
    v2_parts = {os.path.basename(os.path.dirname(p)) for p in _parquet_files(v2.storage)}
    assert v2_parts == {"grp=g0"}
    # the manifest carries g1/g2 as refs into v1
    refs = ref_engine.catalog.get_manifest("pt", v2.version_id)
    ext = [r for r in refs if r.startswith(f"pt/{v1.version_id}/")]
    assert ext and all("grp=g1" in r or "grp=g2" in r for r in ext)
    # full merge semantics hold through the manifest read
    got = {r["k"]: r["v"] for r in _read_all(ref_engine, "pt")}
    expected = {i: float(i) for i in range(30)}
    expected[0] = 999.0
    expected[100] = 1.5
    assert got == expected and n2 == 31


def test_read_pruned_covers_carried_files(ref_engine):
    """The skipping index must cover carried files: a partition-key
    predicate over a reference-carried partition still returns its
    rows (stats backfill groups by source directory)."""
    rows = [{"k": i, "grp": f"g{i % 3}", "v": float(i)} for i in range(30)]
    with ref_engine.node_context("w", outputs={"out": "pp"}):
        t = Table("out", "w")
        t.init(unique_on=["k"], partition_by="grp")
        t.append(rows)
        t.flush()
        t.upsert([{"k": 0, "grp": "g0", "v": 999.0}])
        t.flush()
        # g1 was carried by reference; prune must keep + read its files
        kept, total = t.prune_files([("grp", "=", "g1")])
        assert total > 0 and 0 < len(kept) < total
        got = sorted(r["k"] for r in t.read_pruned([("grp", "=", "g1")]).collect())
    assert got == sorted(i for i in range(30) if i % 3 == 1)


def test_delete_where_carries_by_reference(ref_engine):
    """File-scoped DELETE: untouched files are not copied into the new
    version — refs only — and the rows survive. (coalesce(1) so each
    partition is ONE file and the touched file has survivors; a
    records-list append fans out to 1-row files on local[32].)"""
    with ref_engine.node_context("w", outputs={"out": "dt"}):
        t = Table("out", "w")
        t.init(partition_by="grp")
        rows = [{"k": i, "grp": f"g{i % 3}", "v": i} for i in range(30)]
        t.append(ref_engine.spark.createDataFrame(rows).coalesce(1))
        t.flush()
        v1 = t.get_active_version()
        n = t.delete_where("grp = 'g0' AND k >= 10")
        v2 = t.get_active_version()
    assert n == len([i for i in range(10, 30) if i % 3 == 0])
    # only g0 rewritten; g1/g2 carried as refs
    v2_parts = {os.path.basename(os.path.dirname(p)) for p in _parquet_files(v2.storage)}
    assert v2_parts == {"grp=g0"}
    refs = ref_engine.catalog.get_manifest("dt", v2.version_id)
    assert any(r.startswith(f"dt/{v1.version_id}/") for r in refs)
    got = sorted(r["k"] for r in _read_all(ref_engine, "dt"))
    assert got == sorted(i for i in range(30) if not (i % 3 == 0 and i >= 10))


def test_clone_restore_are_pure_metadata(ref_engine):
    """Shallow clone and RESTORE in reference mode write NO files at
    all — the new version is a manifest."""
    with ref_engine.node_context("w", outputs={"out": "src"}):
        t = Table("out", "w")
        t.append([{"a": i} for i in range(10)])
        t.flush()
    with ref_engine.node_context("w2", outputs={"out": "dst"}):
        c = Table("out", "w")
        v = c.clone_from("src")
        assert _parquet_files(v.storage) == []  # zero-copy, zero files
    assert sorted(r["a"] for r in _read_all(ref_engine, "dst")) == list(range(10))
    # restore: flip back to the pre-replace content via a manifest-only version
    with ref_engine.node_context("w", outputs={"out": "src"}):
        t = Table("out", "w")
        old = t.get_active_version().version_id
        t.replace([{"a": 99}])
        rv = t.restore(old)
        assert _parquet_files(rv.storage) == []
    assert sorted(r["a"] for r in _read_all(ref_engine, "src")) == list(range(10))


def test_gc_refcounts_shared_files(ref_engine):
    """Retention GC must spare files of a doomed version that newer
    manifests still reference, and delete the rest."""
    cat = ref_engine.catalog
    with ref_engine.node_context("w", outputs={"out": "gt"}):
        t = Table("out", "w")
        t.init(unique_on=["k"], partition_by="grp")
        t.append([{"k": i, "grp": f"g{i % 3}", "v": i} for i in range(30)])
        t.flush()
        v1 = t.get_active_version().version_id
        cat.update_table_meta("gt", retention_keep=1)
        # three scoped upserts -> v1 falls out of retention, but its
        # untouched-partition files are still referenced by the chain
        for j in range(3):
            t.upsert([{"k": 0, "grp": "g0", "v": 100 + j}])
            t.flush()
    meta = cat.table_meta("gt")
    assert v1 not in meta["versions"]  # GC'd as a VERSION
    active = meta["active_version"]
    refs = cat.get_manifest("gt", active)
    shared = [r for r in refs if r.startswith(f"gt/{v1}/")]
    assert shared  # active still references v1 files
    troot = os.path.join(cat.root, "tables")
    for r in shared:
        assert os.path.exists(os.path.join(troot, r)), f"GC deleted live file {r}"
    # and the reads still work after GC
    got = {r["k"]: r["v"] for r in _read_all(ref_engine, "gt")}
    assert got[0] == 102 and len(got) == 30


def test_clone_survives_source_gc_and_drop(ref_engine):
    """Cross-table ref-count: a reference-mode clone keeps its source
    files alive through the source's retention GC AND through DROP
    TABLE of the source."""
    cat = ref_engine.catalog
    with ref_engine.node_context("w", outputs={"out": "csrc"}):
        t = Table("out", "w")
        t.append([{"a": i} for i in range(5)])
        t.flush()
    with ref_engine.node_context("w2", outputs={"out": "cdst"}):
        Table("out", "w").clone_from("csrc")
    # churn the source so its cloned version ages out of retention
    cat.update_table_meta("csrc", retention_keep=1)
    with ref_engine.node_context("w", outputs={"out": "csrc"}):
        t = Table("out", "w")
        for j in range(4):
            t.replace([{"a": -j}])
    assert sorted(r["a"] for r in _read_all(ref_engine, "cdst")) == list(range(5))
    cat.drop_table("csrc")
    assert cat.table_meta("csrc") is None
    assert sorted(r["a"] for r in _read_all(ref_engine, "cdst")) == list(range(5))


def test_append_onto_cloned_version_keeps_refs(ref_engine):
    """Appending into a version whose manifest carries external refs
    must preserve those refs (and the count) across the manifest
    refresh."""
    with ref_engine.node_context("w", outputs={"out": "asrc"}):
        t = Table("out", "w")
        t.append([{"a": i} for i in range(5)])
        t.flush()
    with ref_engine.node_context("w2", outputs={"out": "adst"}):
        c = Table("out", "w")
        c.clone_from("asrc")
        c.append([{"a": 100}])
        c.flush()
        assert c.record_count == 6
    got = sorted(r["a"] for r in _read_all(ref_engine, "adst"))
    assert got == [0, 1, 2, 3, 4, 100]


def test_truncate_drops_carried_refs(ref_engine):
    with ref_engine.node_context("w", outputs={"out": "tsrc"}):
        t = Table("out", "w")
        t.append([{"a": 1}])
        t.flush()
    with ref_engine.node_context("w2", outputs={"out": "tdst"}):
        c = Table("out", "w")
        c.clone_from("tsrc")
        c.truncate()
        vid = c.get_active_version().version_id
        assert c.record_count == 0
    refs = ref_engine.catalog.get_manifest("tdst", vid)
    assert all(r.startswith(f"tdst/{vid}/") for r in refs)
    assert _read_all(ref_engine, "tdst") == []


def test_hardlink_mode_manifests_are_self_contained(engine, monkeypatch):
    """Default (hardlink) mode invariant: every write records a
    manifest whose refs all point into the version's own directory —
    the local fast path stays directory-self-contained. (Pinned to
    hardlink mode so the reference-mode sweep doesn't retarget it.)"""
    monkeypatch.setenv("PDS_LINK_MODE", "hardlink")
    with engine.node_context("w", outputs={"out": "hm"}):
        t = Table("out", "w")
        t.init(unique_on=["k"], partition_by="grp")
        t.append([{"k": i, "grp": f"g{i % 2}", "v": i} for i in range(10)])
        t.flush()
        t.upsert([{"k": 0, "grp": "g0", "v": 99}])
        t.flush()
        vid = t.get_active_version().version_id
    refs = engine.catalog.get_manifest("hm", vid)
    assert refs and all(r.startswith(f"hm/{vid}/") for r in refs)


def test_partition_by_after_flat_append_stays_consistent(engine):
    """REGRESSION: declaring partition_by AFTER a flat version exists
    must not corrupt that version. An append into the flat version
    keeps the flat layout (Spark cannot read root files mixed with
    partition dirs — flat rows silently drop), and the next upsert
    full-merges (the per-file manifest check sees the flat files where
    the old dir-listing check did not) — no rows lost, and the rewrite
    adopts the hive layout."""
    with engine.node_context("w", outputs={"out": "mx"}):
        t = Table("out", "w")
        t.init(unique_on=["k"])  # flat layout first
        t.append([{"k": i, "grp": f"g{i % 3}", "v": float(i)} for i in range(15)])
        t.flush()
        t.init(partition_by="grp")
        t.append([{"k": i, "grp": f"g{i % 3}", "v": float(i)} for i in range(15, 30)])
        t.flush()  # append keeps the version's FLAT layout
        v1 = t.get_active_version()
        assert all(
            "grp=" not in r for r in engine.catalog.get_manifest("mx", v1.version_id)
        ), "append mixed hive dirs into a flat version"
        t.upsert([{"k": 0, "grp": "g0", "v": 999.0}])
        t.flush()
        v2 = t.get_active_version()
    got = {r["k"]: r["v"] for r in _read_all(engine, "mx")}
    expected = {i: float(i) for i in range(30)}
    expected[0] = 999.0
    assert got == expected
    # the full-merge rewrite adopted the declared partitioning
    assert all("grp=" in r for r in engine.catalog.get_manifest("mx", v2.version_id))
