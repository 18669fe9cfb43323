"""Stream cursor laws (node.py:18-81) + State semantics
(node.py:417-505): consume -> checkpoint -> rollback -> rewind -> seek,
exactly-once across executions."""
import datetime as dt

import pytest

from patterns_devkit_spark import State, Table


def _seed(engine, n=10):
    with engine.node_context("seed", outputs={"out": "s_t"}):
        t = Table("out", "w")
        t.init(strictly_monotonic_ordering="id")
        t.append([{"id": i, "v": f"r{i}"} for i in range(n)])


def test_stream_exactly_once_across_executions(engine):
    _seed(engine)
    with engine.node_context("c", inputs={"in": "s_t"}):
        s = Table("in", "r").as_stream()
        assert [r["id"] for r in s] == list(range(10))
    with engine.node_context("c", inputs={"in": "s_t"}):
        s = Table("in", "r").as_stream()
        assert list(s) == []  # all consumed


def test_stream_crash_replays_from_checkpoint(engine):
    _seed(engine)
    with pytest.raises(RuntimeError, match="boom"):
        with engine.node_context("c", inputs={"in": "s_t"}):
            s = Table("in", "r").as_stream()
            it = s.consume_records()
            for _ in range(3):
                next(it)
            s.checkpoint()  # persist at id=2
            for _ in range(4):
                next(it)
            raise RuntimeError("boom")  # crash: no exec-end commit
    with engine.node_context("c", inputs={"in": "s_t"}):
        s = Table("in", "r").as_stream()
        # replays from the checkpoint, not from the crash position
        assert [r["id"] for r in s] == list(range(3, 10))


def test_stream_rollback_and_rewind_and_seek(engine):
    _seed(engine)
    with engine.node_context("c2", inputs={"in": "s_t"}):
        s = Table("in", "r").as_stream()
        it = s.consume_records()
        next(it), next(it)
        s.rollback()
        assert next(s.consume_records())["id"] == 0
        s.seek(6)  # strictly greater (node.py:70-76)
        assert [r["id"] for r in s.consume_records()] == [7, 8, 9]
        s.rewind()
        assert len(list(s.consume_records())) == 10


def test_stream_default_ordering_and_missing(engine):
    _seed(engine)  # declared strictly_monotonic_ordering="id"
    with engine.node_context("c3", inputs={"in": "s_t"}):
        s = Table("in", "r").as_stream()
        assert s.order_by_field == "id"
    with engine.node_context("w", outputs={"out": "no_ord"}):
        Table("out", "w").append([{"x": 1}])
    with engine.node_context("c4", inputs={"in": "no_ord"}):
        with pytest.raises(ValueError, match="no default ordering"):
            Table("in", "r").as_stream()


def test_stream_starting_value_and_metadata(engine):
    _seed(engine)
    with engine.node_context("c5", inputs={"in": "s_t"}):
        s = Table("in", "r").as_stream(order_by="id", starting_value=7)
        recs = list(s.consume_records(with_metadata=True))
        assert [r["record"]["id"] for r in recs] == [8, 9]
        assert recs[0]["order_by_value"] == 8


def test_multiple_streams_different_orderings(engine):
    """node.py:196-197: multiple simultaneous streams, one cursor per
    (node, table, order_by)."""
    with engine.node_context("seed", outputs={"out": "m_t"}):
        t = Table("out", "w")
        t.append([{"id": i, "neg": -i} for i in range(5)])
    with engine.node_context("c6", inputs={"in": "m_t"}):
        t = Table("in", "r")
        s1 = t.as_stream(order_by="id")
        list(s1)
    with engine.node_context("c6", inputs={"in": "m_t"}):
        t = Table("in", "r")
        s2 = t.as_stream(order_by="neg")
        assert len(list(s2)) == 5  # independent cursor


def test_state_roundtrip_and_reset(engine):
    with engine.node_context("n1"):
        st = State()
        st.set_value("k", 42)
        st.set_value("when", dt.datetime(2024, 5, 1, 12))
    with engine.node_context("n1"):
        st = State()
        assert st.get_value("k") == 42
        assert st.get_datetime("when") == dt.datetime(2024, 5, 1, 12)
        assert st.get_value("missing", "d") == "d"
        st.reset()
        assert st.get() == {}


def test_state_should_continue_budget(engine):
    import time as _time

    with engine.node_context("n2", execution_time_limit=1000):
        st = State()
        assert st.should_continue() is True
    # sub-600s limits trip at 80% of the limit — NOT at t=0 (the old
    # min(0.8L, L-120) went negative for L < 120 and starved the node)
    with engine.node_context("n3", execution_time_limit=0.1):
        st = State()
        assert st.should_continue() is True  # fresh execution has headroom
        _time.sleep(0.12)
        assert st.should_continue() is False  # past 80% of the budget


def test_request_new_run_recorded(engine):
    ctx = engine.node_context("n4")
    with ctx:
        st = State()
        st.request_new_run(trigger_downstream=False, wait_atleast_seconds=5)
    assert ctx.requested_new_run == {"trigger_downstream": False, "wait_atleast_seconds": 5}


def test_consume_spark_and_records_cursor_parity(engine):
    """VERDICT r3 item 8: the dataframe-form stream consumption
    (consume_spark — the 100 TB path) obeys the SAME exactly-once
    cursor laws as the reference's record-at-a-time consume_records:
    identical rows, identical committed cursor, interchangeable across
    executions on the same table + named cursor."""
    _seed(engine, 8)
    # node A consumes the first half record-at-a-time (bounded by seek)
    with engine.node_context("ca", inputs={"in": "s_t"}):
        got_a = [r["id"] for r in Table("in", "r").as_stream(order_by="id")]
    # node B consumes the same table dataframe-form
    with engine.node_context("cb", inputs={"in": "s_t"}):
        df = Table("in", "r").as_stream(order_by="id").consume_spark()
        got_b = sorted(r["id"] for r in df.collect())
    assert got_a == got_b == list(range(8))
    # both committed the same cursor value
    cur_a = engine.catalog.get_cursor("ca", "s_t", "id")
    cur_b = engine.catalog.get_cursor("cb", "s_t", "id")
    assert cur_a == cur_b == 7
    # the two forms are interchangeable mid-stream: append more rows,
    # consume the delta with the OTHER form under each node id
    with engine.node_context("seed", outputs={"out": "s_t"}):
        t = Table("out", "w")
        t.append([{"id": 8, "v": "r8"}, {"id": 9, "v": "r9"}])
    with engine.node_context("ca", inputs={"in": "s_t"}):
        df = Table("in", "r").as_stream(order_by="id").consume_spark()
        assert sorted(r["id"] for r in df.collect()) == [8, 9]
    with engine.node_context("cb", inputs={"in": "s_t"}):
        assert [r["id"] for r in Table("in", "r").as_stream(order_by="id")] == [8, 9]
    # exactly-once holds across forms: nothing left on either cursor
    with engine.node_context("ca", inputs={"in": "s_t"}):
        assert Table("in", "r").as_stream(order_by="id").consume_spark() is None
    with engine.node_context("cb", inputs={"in": "s_t"}):
        assert list(Table("in", "r").as_stream(order_by="id")) == []
