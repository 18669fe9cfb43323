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
