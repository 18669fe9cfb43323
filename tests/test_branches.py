"""Table branches (Engine.create_branch / merge_branch / drop_branch):
the Iceberg/Nessie branch workflow composed from the engine's verified
primitives — fork = zero-copy clone + GC-exempt fork-marker tags on
both sides; branch writes get the FULL SDK surface (it's a table);
merge = the branch's CDC feed since the fork applied to main, with
three-way conflict detection against main's own feed since the fork."""
import glob
import os

import pytest

from patterns_devkit_spark import BranchMergeConflict, Table


def _mk_main(engine, name="base", rows=10):
    with engine.node_context("mk", outputs={"out": name}):
        t = Table("out", "w")
        t.init(unique_on=["id"], merge_on_read=True)
        t.append(
            engine.spark.createDataFrame(
                [(i, i * 10) for i in range(rows)], "id long, v long"
            ).coalesce(2)
        )
        t.flush()


def test_branch_fork_is_zero_copy(engine):
    from tests.conftest import REFERENCE_LINK_MODE, physical_parquet

    _mk_main(engine)
    main_v = engine.catalog.get_active_version("base")
    phys = engine.create_branch("base", "exp")
    assert phys == "base__br_exp"
    info = engine.list_branches("base")["exp"]
    assert info["fork_main"] == main_v
    bdir = engine.catalog.version_dir(phys, info["fork_branch"])
    if REFERENCE_LINK_MODE:
        # pure manifest refs into main's version dir, nothing physical
        assert physical_parquet(bdir) == {}
        refs = engine.catalog.get_manifest(phys, info["fork_branch"])
        assert refs and all(r.startswith(f"base/{main_v}/") for r in refs)
    else:
        mdir = engine.catalog.version_dir("base", main_v)
        assert set(physical_parquet(bdir).values()) == set(physical_parquet(mdir).values())
    engine.drop_branch("base", "exp")


def test_branch_write_merge_round_trip(engine):
    _mk_main(engine)
    phys = engine.create_branch("base", "exp")
    with engine.node_context("b", outputs={"out": phys}):
        bt = Table("out", "w")
        bt.upsert([{"id": 2, "v": -2}, {"id": 50, "v": 50}])
        bt.flush()
        bt.delete_where("id = 7", vectorized=True)
    # main untouched while the branch diverges
    with engine.node_context("m", outputs={"out": "base"}):
        assert len(Table("out", "w").read_spark().collect()) == 10
    n = engine.merge_branch("base", "exp")
    assert n == 3  # U(2), I(50), D(7)
    assert engine.list_branches("base") == {}  # merged branches drop
    with engine.node_context("m", outputs={"out": "base"}):
        rows = {r["id"]: r["v"] for r in Table("out", "w").read_spark().collect()}
    assert len(rows) == 10 and rows[2] == -2 and rows[50] == 50 and 7 not in rows
    # fork-marker tag on main is gone: GC unpinned
    assert f"fork.exp" not in (engine.catalog.table_meta("base") or {}).get("tags", {})


def test_branch_merge_conflicts(engine):
    _mk_main(engine)
    engine.create_branch("base", "c1")
    with engine.node_context("b", outputs={"out": "base__br_c1"}):
        t = Table("out", "w")
        t.upsert([{"id": 3, "v": 300}, {"id": 4, "v": 400}])
        t.flush()
    with engine.node_context("m", outputs={"out": "base"}):
        t = Table("out", "w")
        t.upsert([{"id": 3, "v": 999}])
        t.flush()
    with pytest.raises(BranchMergeConflict, match="both changed"):
        engine.merge_branch("base", "c1")
    # main_wins: the conflicting key keeps main's value, the clean
    # branch change still lands
    assert engine.merge_branch("base", "c1", on_conflict="main_wins") == 1
    with engine.node_context("m", outputs={"out": "base"}):
        rows = {r["id"]: r["v"] for r in Table("out", "w").read_spark().collect()}
    assert rows[3] == 999 and rows[4] == 400

    # branch_wins: branch overwrites main's concurrent change
    engine.create_branch("base", "c2")
    with engine.node_context("b", outputs={"out": "base__br_c2"}):
        t = Table("out", "w")
        t.upsert([{"id": 5, "v": 555}])
        t.flush()
    with engine.node_context("m", outputs={"out": "base"}):
        t = Table("out", "w")
        t.upsert([{"id": 5, "v": 111}])
        t.flush()
    assert engine.merge_branch("base", "c2", on_conflict="branch_wins") == 1
    with engine.node_context("m", outputs={"out": "base"}):
        rows = {r["id"]: r["v"] for r in Table("out", "w").read_spark().collect()}
    assert rows[5] == 555


def test_branch_fork_survives_main_churn(engine):
    # main advances many versions after the fork: the fork-marker tag
    # pins the fork point through retention GC, so conflict detection
    # still sees main's full post-fork window
    _mk_main(engine)
    engine.create_branch("base", "slow")
    with engine.node_context("m", outputs={"out": "base"}):
        t = Table("out", "w")
        for i in range(5):  # > DEFAULT_RETENTION versions
            t.upsert([{"id": 1, "v": 1000 + i}])
            t.flush()
    with engine.node_context("b", outputs={"out": "base__br_slow"}):
        t = Table("out", "w")
        t.upsert([{"id": 1, "v": -1}])
        t.flush()
    with pytest.raises(BranchMergeConflict):
        engine.merge_branch("base", "slow")
    engine.drop_branch("base", "slow")
    assert engine.list_branches("base") == {}
    assert not engine.catalog.table_meta("base__br_slow")


def test_branch_validation(engine):
    _mk_main(engine)
    with pytest.raises(ValueError, match="invalid branch name"):
        engine.create_branch("base", "bad-name!")
    engine.create_branch("base", "dup")
    with pytest.raises(ValueError, match="already exists"):
        engine.create_branch("base", "dup")
    with pytest.raises(ValueError, match="unknown branch"):
        engine.merge_branch("base", "nope")
    engine.drop_branch("base", "dup")
    with pytest.raises(ValueError, match="unknown table"):
        engine.create_branch("missing", "x")


def test_branch_from_tagged_release(engine):
    # bugfix-from-release: fork off a TAG, fix on the branch, merge —
    # conflict detection runs against the historical fork point, so
    # everything main changed since the release counts as "theirs"
    _mk_main(engine)
    with engine.node_context("m", outputs={"out": "base"}):
        t = Table("out", "w")
        t.tag("rel1")
        t.upsert([{"id": 0, "v": 1000}])  # main moves on after the release
        t.flush()
    engine.create_branch("base", "fix", from_version="rel1")
    info = engine.list_branches("base")["fix"]
    assert info["fork_main"] == engine.catalog.resolve_version("base", "rel1")
    # the branch content is the RELEASE state, not today's head
    with engine.node_context("b", outputs={"out": "base__br_fix"}):
        bt = Table("out", "w")
        rows = {r["id"]: r["v"] for r in bt.read_spark().collect()}
        assert rows[0] == 0  # pre-upsert value
        bt.upsert([{"id": 9, "v": -9}])
        bt.flush()
    assert engine.merge_branch("base", "fix") == 1
    with engine.node_context("m", outputs={"out": "base"}):
        rows = {r["id"]: r["v"] for r in Table("out", "w").read_spark().collect()}
    assert rows[9] == -9 and rows[0] == 1000  # fix landed, head kept


# -- main->branch sync (r6: the missing direction VERDICT r5 named) ----


def _vals(engine, store):
    with engine.node_context("r", outputs={"out": store}):
        return {r["id"]: r["v"] for r in Table("out", "w").read_spark().collect()}


def test_sync_branch_catches_up_and_merge_sees_only_branch_edits(engine):
    """Branch edits key 1; main edits key 5, inserts 50, deletes 7.
    sync_branch applies main's changes to the branch WITHOUT touching
    the branch's own edit; the fork point moves, so a later
    merge_branch applies ONLY the branch's edit — the synced rows are
    echo-suppressed, no false conflict, no redundant writes."""
    _mk_main(engine)
    engine.create_branch("base", "lived")
    with engine.node_context("b", outputs={"out": "base__br_lived"}):
        bt = Table("out", "w")
        bt.upsert([{"id": 1, "v": -1}])
        bt.flush()
    with engine.node_context("m", outputs={"out": "base"}):
        mt = Table("out", "w")
        mt.upsert([{"id": 5, "v": 555}, {"id": 50, "v": 500}])
        mt.flush()
        mt.delete_where("id = 7", vectorized=True)
    n = engine.sync_branch("base", "lived")
    assert n == 3  # U(5), I(50), D(7)
    assert _vals(engine, "base__br_lived") == {
        **{i: i * 10 for i in range(10) if i != 7},
        1: -1, 5: 555, 50: 500,
    }
    # fork point moved to the synced main version and stays GC-pinned
    info = engine.list_branches("base")["lived"]
    assert info["fork_main"] == engine.catalog.get_active_version("base")
    assert (engine.catalog.table_meta("base") or {}).get("tags", {})["fork.lived"] == info["fork_main"]
    # main keeps moving AFTER the sync on an untouched key
    with engine.node_context("m", outputs={"out": "base"}):
        mt = Table("out", "w")
        mt.upsert([{"id": 8, "v": 888}])
        mt.flush()
    # merge back: ONLY the branch's own edit lands; synced keys are
    # echoes (same content as main@fork) and must not conflict with 8
    n = engine.merge_branch("base", "lived")
    assert n == 1
    assert _vals(engine, "base") == {
        **{i: i * 10 for i in range(10) if i not in (1, 5, 7, 8)},
        1: -1, 5: 555, 8: 888, 50: 500,
    }


def test_sync_branch_conflict_modes(engine):
    """Both sides changed key 3 since the fork: 'error' raises,
    'main_wins' overwrites the branch's row, 'branch_wins' keeps it —
    a RESOLUTION (git rebase -X ours): the branch's value lands at the
    next merge without re-flagging, because the fork point moved past
    main's superseded change."""
    _mk_main(engine)
    engine.create_branch("base", "s1")
    engine.create_branch("base", "s2")
    for store in ("base__br_s1", "base__br_s2"):
        with engine.node_context("b", outputs={"out": store}):
            t = Table("out", "w")
            t.upsert([{"id": 3, "v": 333}])
            t.flush()
    with engine.node_context("m", outputs={"out": "base"}):
        t = Table("out", "w")
        t.upsert([{"id": 3, "v": 999}, {"id": 4, "v": 444}])
        t.flush()
    with pytest.raises(BranchMergeConflict, match="both changed"):
        engine.sync_branch("base", "s1")
    n = engine.sync_branch("base", "s1", on_conflict="main_wins")
    assert n == 2
    assert _vals(engine, "base__br_s1")[3] == 999  # main overwrote
    n = engine.sync_branch("base", "s2", on_conflict="branch_wins")
    assert n == 1  # only key 4 synced
    assert _vals(engine, "base__br_s2")[3] == 333  # branch kept its edit
    # the conflict was resolved branch-side: the merge lands it silently
    assert engine.merge_branch("base", "s2") == 1
    assert _vals(engine, "base")[3] == 333
    engine.drop_branch("base", "s1")


def test_sync_branch_noop_when_main_unchanged(engine):
    """No main movement since the fork: zero rows, fork point stays."""
    _mk_main(engine)
    engine.create_branch("base", "idle")
    info0 = engine.list_branches("base")["idle"]
    assert engine.sync_branch("base", "idle") == 0
    assert engine.list_branches("base")["idle"] == info0
    engine.drop_branch("base", "idle")


def test_sync_then_main_rewrites_synced_key_conflicts_at_merge(engine):
    """Main changes key 5 -> synced into the branch -> main changes 5
    AGAIN: the branch now carries a stale value for 5; merge must flag
    it, not silently clobber main's newer row."""
    _mk_main(engine)
    engine.create_branch("base", "stale")
    with engine.node_context("m", outputs={"out": "base"}):
        t = Table("out", "w")
        t.upsert([{"id": 5, "v": 555}])
        t.flush()
    engine.sync_branch("base", "stale")
    # branch edits key 5 on top of the synced value
    with engine.node_context("b", outputs={"out": "base__br_stale"}):
        t = Table("out", "w")
        t.upsert([{"id": 5, "v": -5}])
        t.flush()
    with engine.node_context("m", outputs={"out": "base"}):
        t = Table("out", "w")
        t.upsert([{"id": 5, "v": 777}])
        t.flush()
    with pytest.raises(BranchMergeConflict, match="both changed"):
        engine.merge_branch("base", "stale")
    assert engine.merge_branch("base", "stale", on_conflict="main_wins") == 0
    assert _vals(engine, "base")[5] == 777


def test_branch_schema_divergence_refused_by_name(engine):
    """ALTER on the branch only: merge and sync both refuse up front
    naming the drifted columns, instead of failing inside apply_cdc."""
    _mk_main(engine)
    engine.create_branch("base", "alt")
    with engine.node_context("b", outputs={"out": "base__br_alt"}):
        t = Table("out", "w")
        t.execute_sql("ALTER TABLE {{ this }} ADD COLUMN note string")
        t.upsert([{"id": 1, "v": -1, "note": "x"}])
        t.flush()
    with pytest.raises(ValueError, match="branch-only: \\[\\('note'"):
        engine.merge_branch("base", "alt")
    with pytest.raises(ValueError, match="schemas .* diverged"):
        engine.sync_branch("base", "alt")
    # the supported path: the SAME alter on main unblocks the merge
    with engine.node_context("m", outputs={"out": "base"}):
        Table("out", "w").execute_sql("ALTER TABLE {{ this }} ADD COLUMN note string")
    assert engine.merge_branch("base", "alt") >= 1


def test_sync_twice_same_key_no_spurious_conflict(engine):
    """Review r6: the sync conflict probe must not count rows an
    EARLIER sync applied as branch edits. Main changes key 5 (sync #1),
    then changes 5 again — sync #2 under the default 'error' mode must
    apply cleanly (the branch never edited 5), and merge must land
    nothing (the branch has no edits of its own)."""
    _mk_main(engine)
    engine.create_branch("base", "tw")
    with engine.node_context("m", outputs={"out": "base"}):
        t = Table("out", "w")
        t.upsert([{"id": 5, "v": 501}])
        t.flush()
    assert engine.sync_branch("base", "tw") == 1
    with engine.node_context("m", outputs={"out": "base"}):
        t = Table("out", "w")
        t.upsert([{"id": 5, "v": 502}])
        t.flush()
    assert engine.sync_branch("base", "tw") == 1  # no BranchMergeConflict
    assert _vals(engine, "base__br_tw")[5] == 502
    assert engine.merge_branch("base", "tw") == 0
    assert _vals(engine, "base")[5] == 502  # never reverted to 501


def test_sync_merge_keys_only_table(engine):
    """Review r6: echo suppression must also work on a table whose
    unique key IS the whole row (zero value columns) — membership
    sets. Main inserts/deletes members, sync applies them, merge must
    see no branch edits and raise no spurious conflict."""
    with engine.node_context("mk", outputs={"out": "members"}):
        t = Table("out", "w")
        t.init(unique_on=["id"], merge_on_read=True)
        t.append(engine.spark.createDataFrame([(i,) for i in range(6)], "id long").coalesce(1))
        t.flush()
    engine.create_branch("members", "mm")
    with engine.node_context("b", outputs={"out": "members__br_mm"}):
        bt = Table("out", "w")
        bt.upsert([{"id": 100}])  # genuine branch insert
        bt.flush()
    with engine.node_context("m", outputs={"out": "members"}):
        mt = Table("out", "w")
        mt.upsert([{"id": 50}])
        mt.flush()
        mt.delete_where("id = 2", vectorized=True)
    assert engine.sync_branch("members", "mm") == 2  # I(50), D(2)
    n = engine.merge_branch("members", "mm")
    assert n == 1  # only the branch's own insert
    with engine.node_context("r", outputs={"out": "members"}):
        ids = {r["id"] for r in Table("out", "w").read_spark().collect()}
    assert ids == {0, 1, 3, 4, 5, 50, 100}
