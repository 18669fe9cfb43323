"""File-level data skipping (node/skipping.py, Table.read_pruned).

The engine's catalog keeps per-file column min/max/null stats harvested
from parquet footers at write time; reads plan file pruning from that
metadata (the lakehouse zone-map pattern — at 100 TB the planner must
not open O(files) footers per query). Correctness never depends on the
stats: read_pruned re-applies the predicate as a real Spark filter and
must equal read_spark().filter(...) in every case.
"""
import os

import pytest

from patterns_devkit_spark import Table
from patterns_devkit_spark.node import skipping


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_write_records_file_stats_and_pruned_read_matches_full(engine):
    """Three appends -> >=3 files; a range predicate on the ordering
    column prunes non-overlapping files and returns identical rows."""
    with engine.node_context("w", outputs={"out": "fs1"}):
        t = Table("out", "w")
        t.init(strictly_monotonic_ordering="id")
        for lo in (0, 100, 200):
            t.append([{"id": lo + i, "v": f"x{lo + i}"} for i in range(10)])
            t.flush()
    with engine.node_context("r", inputs={"in": "fs1"}):
        t = Table("in", "r")
        vid = engine.catalog.get_active_version("fs1")
        stats = engine.catalog.get_file_stats("fs1", vid)
        assert stats and len(stats) >= 3
        assert all("id" in e["cols"] and e["cols"]["id"]["min"] is not None for e in stats.values())
        kept, total = t.prune_files([("id", ">=", 200)])
        assert total == len(stats) and 0 < len(kept) < total
        pruned = t.read_pruned([("id", ">=", 200)])
        full = t.read_spark().filter("id >= 200")
        assert _rows(pruned) == _rows(full)
        # the scan actually lists fewer files, not just filters rows
        assert len(set(pruned.inputFiles())) < len(set(t.read_spark().inputFiles()))


def test_partition_column_pruning_from_hive_path(engine):
    """partition_by columns are not stored in the files; stats recover
    their per-file value from the hive path segment."""
    with engine.node_context("w", outputs={"out": "fs2"}):
        t = Table("out", "w")
        t.init(partition_by="region")
        t.append([{"region": r, "v": i} for i, r in enumerate(["a", "a", "b", "c"])])
    with engine.node_context("r", inputs={"in": "fs2"}):
        t = Table("in", "r")
        kept, total = t.prune_files([("region", "=", "b")])
        assert total >= 3 and len(kept) < total
        assert all("region=b" in rel for rel in kept)
        assert _rows(t.read_pruned([("region", "=", "b")])) == _rows(
            t.read_spark().filter("region = 'b'")
        )


def test_absent_column_prunes_pre_evolution_files(engine):
    """Files written before a column existed read as NULL for it, so a
    value predicate provably never matches them."""
    with engine.node_context("w", outputs={"out": "fs3"}):
        t = Table("out", "w")
        t.init(stat_columns=["id", "extra"])
        t.append([{"id": 1}])
        t.flush()
        t.append([{"id": 2, "extra": "y"}])
        t.flush()
    with engine.node_context("r", inputs={"in": "fs3"}):
        t = Table("in", "r")
        kept, total = t.prune_files([("extra", "=", "y")])
        assert total == 2 and len(kept) == 1
        assert _rows(t.read_pruned([("extra", "=", "y")])) == _rows(
            t.read_spark().filter("extra = 'y'")
        )


def test_lazy_backfill_covers_undeclared_columns_and_caches(engine):
    """Predicate on a column outside the write-time stat set: one
    footer walk backfills the catalog, then pruning works."""
    with engine.node_context("w", outputs={"out": "fs4"}):
        t = Table("out", "w")
        t.init(strictly_monotonic_ordering="id")
        t.append([{"id": 1, "score": 10}])
        t.flush()
        t.append([{"id": 2, "score": 99}])
        t.flush()
    with engine.node_context("r", inputs={"in": "fs4"}):
        t = Table("in", "r")
        vid = engine.catalog.get_active_version("fs4")
        before = engine.catalog.get_file_stats("fs4", vid)
        assert all("score" not in e["cols"] for e in before.values())
        kept, total = t.prune_files([("score", ">", 50)])
        assert total == 2 and len(kept) == 1
        after = engine.catalog.get_file_stats("fs4", vid)
        assert all("score" in e["cols"] for e in after.values())
        # id stats from write time must survive the merge
        assert all("id" in e["cols"] for e in after.values())


def test_missing_stats_graceful_full_scan(engine):
    """A version with no stats at all (simulated wipe) still answers
    correctly via the fallback full scan + filter."""
    with engine.node_context("w", outputs={"out": "fs5"}):
        t = Table("out", "w")
        t.append([{"id": i} for i in range(5)])
    meta = engine.catalog.ensure_table("fs5")
    meta.pop("file_stats", None)
    with engine.node_context("r", inputs={"in": "fs5"}):
        t = Table("in", "r")
        # backfill path recomputes; also exercise an op with no stats value overlap
        assert _rows(t.read_pruned([("id", "between", (1, 3))])) == _rows(
            t.read_spark().filter("id between 1 and 3")
        )


def test_gc_drops_file_stats_with_version(engine):
    with engine.node_context("w", outputs={"out": "fs6"}):
        t = Table("out", "w")
        t.init(strictly_monotonic_ordering="id", schema={"id": "Integer"})
        for i in range(6):  # enough flushed versions to trip retention GC
            t.replace([{"id": i}])
            t.flush()
    meta = engine.catalog.table_meta("fs6")
    live = set(meta["versions"])
    assert set(meta.get("file_stats", {})) <= live


def test_prune_ops_matrix(engine):
    """Every supported op both prunes when provable and matches the
    plain filtered read."""
    with engine.node_context("w", outputs={"out": "fs7"}):
        t = Table("out", "w")
        t.init(stat_columns=["k"])
        for lo in (0, 50):
            t.append([{"k": lo + i} for i in range(10)])
            t.flush()
    cases = [
        (("k", "=", 55), "k = 55"),
        (("k", "<", 5), "k < 5"),
        (("k", "<=", 9), "k <= 9"),
        (("k", ">", 55), "k > 55"),
        (("k", ">=", 50), "k >= 50"),
        (("k", "between", (2, 4)), "k between 2 and 4"),
        (("k", "in", [3, 4, 5]), "k in (3,4,5)"),
    ]
    with engine.node_context("r", inputs={"in": "fs7"}):
        t = Table("in", "r")
        for pred, sql in cases:
            kept, total = t.prune_files([pred])
            # sorted writes give disjoint per-file ranges: every op must
            # prove SOME files out (each flush spans multiple files)
            assert 0 < len(kept) < total, (pred, kept, total)
            assert _rows(t.read_pruned([pred])) == _rows(t.read_spark().filter(sql)), pred


def test_unknown_op_rejected(engine):
    with engine.node_context("w", outputs={"out": "fs8"}):
        Table("out", "w").append([{"k": 1}])
    with engine.node_context("r", inputs={"in": "fs8"}):
        with pytest.raises(ValueError, match="unknown predicate op"):
            Table("in", "r").prune_files([("k", "!=", 1)])


def test_collect_file_stats_all_null_file(engine, tmp_path, spark):
    """All-null files are bounded (min=max=None, nulls==rows) and
    prunable by any value predicate."""
    d = str(tmp_path / "nulls")
    spark.createDataFrame([(None,), (None,)], "v int").coalesce(1).write.parquet(d)
    stats = skipping.collect_file_stats(d, ["v"])
    (entry,) = stats.values()
    assert entry["cols"]["v"] == {"min": None, "max": None, "nulls": 2}
    assert skipping.prune(stats, [("v", "=", 1)]) == []
