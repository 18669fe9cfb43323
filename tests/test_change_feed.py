"""CDC-OUT (Table.change_feed) round-trips into apply_cdc: a replica
fed only change batches converges to the source — the replication
pair without snapshot shipping."""
from patterns_devkit_spark import Table


def _rows(tb):
    return sorted((r["id"], r["v"], r["tag"]) for r in tb.read())


def test_change_feed_round_trip(engine):
    with engine.node_context("w", outputs={"out": "src"}):
        src = Table("out", "w")
        src.init(unique_on=["id"])
        src.append(
            engine.spark.createDataFrame(
                [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")], "id long, v long, tag string"
            ).coalesce(1)
        )
        src.flush()
        v1 = engine.catalog.get_active_version("src")
        # evolve: update 2, delete 3, insert 4
        src.upsert([{"id": 2, "v": 99, "tag": "b"}, {"id": 4, "v": 40, "tag": "d"}])
        src.flush()
        src.delete_where("id = 3")
        v2 = engine.catalog.get_active_version("src")
        feed = src.change_feed(v1, v2)
        ops = {r["id"]: r["op"] for r in feed.collect()}
        assert ops == {2: "U", 3: "D", 4: "I"}
        src_rows = _rows(src)

    # replica starts from the v1 snapshot, then applies ONLY the feed
    with engine.node_context("r", outputs={"out": "replica"}):
        rep = Table("out", "w")
        rep.init(unique_on=["id"])
        rep.append(src.read_spark(version=v1))
        rep.flush()
        rep.apply_cdc(feed)
        assert _rows(rep) == src_rows


def test_change_feed_noop_and_key_requirement(engine):
    import pytest

    with engine.node_context("w", outputs={"out": "s2"}):
        tb = Table("out", "w")
        tb.init(unique_on=["id"])
        tb.append([{"id": 1, "v": 1}])
        tb.flush()
        v = engine.catalog.get_active_version("s2")
        assert tb.change_feed(v, v).count() == 0  # identical versions -> empty feed
    with engine.node_context("w2", outputs={"out": "s3"}):
        tb = Table("out", "w")
        tb.append([{"x": 1}])
        tb.flush()
        v = engine.catalog.get_active_version("s3")
        with pytest.raises(ValueError, match="key_cols"):
            tb.change_feed(v)


def test_change_feed_dv_fast_path_matches_fingerprint_diff(engine):
    # a DV-lineage window (MoR upsert + DV delete) computes the feed
    # from mask deltas + new files; it must equal the fingerprint diff
    # exactly — including filtering value-identical re-emitted images
    with engine.node_context("w", outputs={"out": "cfd"}):
        t = Table("out", "w")
        t.init(unique_on=["id"], merge_on_read=True)
        t.append(
            engine.spark.createDataFrame(
                [(i, i * 10) for i in range(20)], "id long, v long"
            ).coalesce(2)
        )
        t.flush()
        v1 = engine.catalog.get_active_version("cfd")
        t.upsert([{"id": 3, "v": -3}, {"id": 50, "v": 50}, {"id": 4, "v": 40}])
        t.flush()  # U(3), I(50), value-identical re-emit of 4
        t.delete_where("id = 7", vectorized=True)
        v2 = engine.catalog.get_active_version("cfd")
        fast = t._change_feed_dv_fast(v1, v2, ["id"])
        assert fast is not None  # lineage applies: fast path engaged
        got = sorted((r["op"], r["id"], r["v"]) for r in fast.collect())
        slow = sorted(
            (r["op"], r["id"], r["v"])
            for r in t.change_feed(v1, v2, use_dv_fast=False).collect()
        )
        assert got == slow == [("D", 7, 70), ("I", 50, 50), ("U", 3, -3)]
        # purge rewrites masked files: containment broken, fast path
        # declines, public API falls back to the identical diff
        t.purge_deletes()
        v3 = engine.catalog.get_active_version("cfd")
        assert t._change_feed_dv_fast(v1, v3, ["id"]) is None
        assert sorted(
            (r["op"], r["id"], r["v"]) for r in t.change_feed(v1, v3).collect()
        ) == got


def test_change_feed_dv_fast_intra_window_churn(engine):
    # a key born AND deleted between the two versions contributes
    # nothing (its mask entry lands on a file newer than version_a);
    # a key updated twice emits one 'U' with the final image
    with engine.node_context("w", outputs={"out": "cfc"}):
        t = Table("out", "w")
        t.init(unique_on=["id"], merge_on_read=True)
        # 5 versions land inside the window: keep v1 retained
        engine.catalog.update_table_meta("cfc", retention_keep=10)
        t.append([{"id": 1, "v": 1}, {"id": 2, "v": 2}])
        t.flush()
        v1 = engine.catalog.get_active_version("cfc")
        t.upsert([{"id": 9, "v": 9}])
        t.flush()
        t.delete_where("id = 9", vectorized=True)  # churn: born + gone
        t.upsert([{"id": 1, "v": 100}])
        t.flush()
        t.upsert([{"id": 1, "v": 200}])
        t.flush()  # updated twice: final image wins
        v2 = engine.catalog.get_active_version("cfc")
        fast = t._change_feed_dv_fast(v1, v2, ["id"])
        assert fast is not None
        got = sorted((r["op"], r["id"], r["v"]) for r in fast.collect())
        assert got == [("U", 1, 200)]
        assert got == sorted(
            (r["op"], r["id"], r["v"])
            for r in t.change_feed(v1, v2, use_dv_fast=False).collect()
        )


def test_change_feed_dv_fast_round_trips_into_apply_cdc(engine):
    with engine.node_context("w", outputs={"out": "cfr"}):
        src = Table("out", "w")
        src.init(unique_on=["id"], merge_on_read=True)
        src.append(
            engine.spark.createDataFrame(
                [(i, i, "x") for i in range(10)], "id long, v long, tag string"
            ).coalesce(1)
        )
        src.flush()
        v1 = engine.catalog.get_active_version("cfr")
        src.upsert([{"id": 2, "v": -2, "tag": "u"}, {"id": 11, "v": 11, "tag": "i"}])
        src.flush()
        src.delete_where("id = 5", vectorized=True)
        feed = src.change_feed(v1)
        src_rows = sorted((r["id"], r["v"], r["tag"]) for r in src.read())
    with engine.node_context("r", outputs={"out": "cfr_rep"}):
        rep = Table("out", "w")
        rep.init(unique_on=["id"])
        rep.append(src.read_spark(version=v1))
        rep.flush()
        rep.apply_cdc(feed)
        assert sorted((r["id"], r["v"], r["tag"]) for r in rep.read()) == src_rows


def test_change_feed_across_schema_evolution(engine):
    # reads pin to the catalog's MERGED schema, so a feed spanning an
    # ALTER ADD COLUMN compares both sides under the same columns —
    # the old side null-filled, new values counting as changes
    with engine.node_context("w", outputs={"out": "cfev"}):
        t = Table("out", "w")
        t.init(unique_on=["id"])
        t.append([{"id": 1, "v": 1}, {"id": 2, "v": 2}])
        t.flush()
        v1 = engine.catalog.get_active_version("cfev")
        t.execute_sql("ALTER TABLE {{ this }} ADD COLUMN tag string")
        t.upsert([{"id": 2, "v": 20, "tag": "x"}, {"id": 3, "v": 3, "tag": "y"}])
        t.flush()
        feed = t.change_feed(v1)
        got = sorted((r["op"], r["id"], r["v"], r["tag"]) for r in feed.collect())
        assert got == [("I", 3, 3, "y"), ("U", 2, 20, "x")]


def test_table_changes_per_commit_granularity(engine):
    # Engine.table_changes: one I/U/D row per change PER COMMIT, each
    # tagged with its _commit_version — unlike change_feed's net batch.
    # A key updated in two commits appears twice; the net diff shows it
    # once (or, for set-then-revert, not at all).
    with engine.node_context("w", outputs={"out": "cdf"}):
        t = Table("out", "w")
        t.init(unique_on=["id"], merge_on_read=True, retention_keep=10)
        t.append([{"id": 1, "v": 1}, {"id": 2, "v": 2}])
        t.flush()
        v1 = engine.catalog.get_active_version("cdf")
        t.upsert([{"id": 1, "v": 100}])
        t.flush()
        v2 = engine.catalog.get_active_version("cdf")
        t.upsert([{"id": 1, "v": 1}])  # revert: net effect is NOTHING
        t.flush()
        t.delete_where("id = 2", vectorized=True)
        v4 = engine.catalog.get_active_version("cdf")
    cdf = engine.table_changes("cdf", v1)
    got = sorted(
        (r["_commit_version"], r["op"], r["id"], r["v"]) for r in cdf.collect()
    )
    assert [(op, i, v) for _, op, i, v in got] == [("U", 1, 100), ("U", 1, 1), ("D", 2, 2)]
    assert got[0][0] == v2 and got[2][0] == v4
    # the NET feed over the same window: the revert cancels out
    with engine.node_context("w2", outputs={"out": "cdf"}):
        net = Table("out", "w").change_feed(v1)
        assert sorted((r["op"], r["id"]) for r in net.collect()) == [("D", 2)]
    # tag-addressed windows resolve; unretained endpoints refuse
    import pytest

    with pytest.raises(ValueError, match="newer than the window end"):
        engine.table_changes("cdf", v4, v1)


def test_table_changes_walks_publish_order_not_creation_order(engine):
    """A WAP write_staged version is CREATED early but PUBLISHED late
    (or abandoned, never published): the per-commit feed must follow
    the publish log, or the staged version interleaves as a phantom /
    misordered _commit_version step (ADVICE r5)."""
    with engine.node_context("w", outputs={"out": "cdfwap"}):
        t = Table("out", "w")
        t.init(unique_on=["id"], merge_on_read=True, retention_keep=10)
        t.append([{"id": 1, "v": 1}, {"id": 2, "v": 2}])
        t.flush()
        v1 = engine.catalog.get_active_version("cdfwap")
        # stage the future table state NOW (creation order puts it
        # between v1 and v2) ...
        staged = t.write_staged(
            [{"id": 1, "v": 1}, {"id": 2, "v": 2}, {"id": 3, "v": 3}]
        )
        # ... a second staging that will be ABANDONED (never published)
        ghost = t.write_staged([{"id": 9, "v": 9}])
        # a normal commit lands in between
        t.upsert([{"id": 1, "v": 100}])
        t.flush()
        v2 = engine.catalog.get_active_version("cdfwap")
        # publish the early staging LAST
        t.publish(staged.version_id)
        v3 = engine.catalog.get_active_version("cdfwap")
        assert v3 == staged.version_id
    cdf = engine.table_changes("cdfwap", v1)
    got = sorted((r["_commit_version"], r["op"], r["id"], r["v"]) for r in cdf.collect())
    commits = [c for c, *_ in got]
    # the ghost never shows; the chain is v1 -> v2 -> v3 in PUBLISH order
    assert ghost.version_id not in commits
    assert set(commits) == {v2, v3}
    assert (v2, "U", 1, 100) in got          # the in-between commit is a step
    assert (v3, "U", 1, 1) in got            # publish reverts it
    assert (v3, "I", 3, 3) in got
    # reversed window still refuses
    import pytest

    with pytest.raises(ValueError, match="newer than the window end"):
        engine.table_changes("cdfwap", v3, v1)


def test_feed_window_survives_vacuum_under_pin_window(engine):
    """VERDICT r5 item 7: a feed spanning k versions silently depended
    on retention_keep > k. With the window held open by
    engine.pin_window, retention GC (this process or `patterns
    vacuum`) must NOT collect its versions; after release the next GC
    collects them and change_feed refuses BY NAME instead of failing
    inside a Spark read."""
    import pytest

    with engine.node_context("w", outputs={"out": "cdfpin"}):
        t = Table("out", "w")
        t.init(unique_on=["id"], merge_on_read=True, retention_keep=1)
        t.append([{"id": 1, "v": 1}, {"id": 2, "v": 2}])
        t.flush()
        v0 = engine.catalog.get_active_version("cdfpin")
        with engine.pin_window("cdfpin", v0) as vids:
            assert vids == [v0]
            # churn far past retention_keep=1 while the window is open
            for i in range(4):
                t.upsert([{"id": 1, "v": 100 + i}, {"id": 10 + i, "v": i}])
                t.flush()
            engine.catalog.gc_versions("cdfpin")
            assert v0 in (engine.catalog.table_meta("cdfpin") or {})["versions"]
            feed = t.change_feed(v0)
            got = {(r["op"], r["id"]) for r in feed.collect()}
            assert ("U", 1) in got and ("I", 10) in got
        # released: the next GC may collect v0, and the feed refuses clearly
        engine.catalog.gc_versions("cdfpin")
        assert v0 not in (engine.catalog.table_meta("cdfpin") or {})["versions"]
        with pytest.raises(ValueError, match="not retained"):
            t.change_feed(v0)
    with pytest.raises(ValueError, match="not retained"):
        engine.table_changes("cdfpin", v0)
