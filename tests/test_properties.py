"""Property-based tests (SURVEY.md §5.2-3): stream exactly-once under
random crash points, upsert algebraic laws. Example counts are small —
every example runs real Spark jobs."""
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from patterns_devkit_spark import Engine, Table

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@pytest.fixture()
def mk_engine(spark, tmp_path_factory):
    def make():
        return Engine(str(tmp_path_factory.mktemp("wh")), spark=spark)

    return make


@given(
    crash_after=st.integers(min_value=0, max_value=9),
    checkpoint_at=st.integers(min_value=0, max_value=9),
)
@settings(**SETTINGS)
def test_stream_no_loss_dups_only_past_checkpoint(mk_engine, crash_after, checkpoint_at):
    """Crash at a random point: records up to the last checkpoint are
    never redelivered; records after it are redelivered (at-least-once
    between checkpoints, exactly-once up to the checkpoint) —
    node.py:40-63."""
    engine = mk_engine()
    with engine.node_context("seed", outputs={"out": "t"}):
        tb = Table("out", "w")
        tb.init(strictly_monotonic_ordering="id")
        tb.append([{"id": i} for i in range(10)])

    first_run: list[int] = []
    try:
        with engine.node_context("c", inputs={"in": "t"}):
            s = Table("in", "r").as_stream()
            for rec in s.consume_records():
                first_run.append(rec["id"])
                if rec["id"] == checkpoint_at:
                    s.checkpoint()
                if rec["id"] == crash_after:
                    raise RuntimeError("crash")
    except RuntimeError:
        crashed = True
    else:
        crashed = False

    second_run: list[int] = []
    with engine.node_context("c", inputs={"in": "t"}):
        s = Table("in", "r").as_stream()
        second_run = [r["id"] for r in s.consume_records()]

    if crashed:
        persisted = checkpoint_at if checkpoint_at <= crash_after else None
        expected = list(range((persisted + 1) if persisted is not None else 0, 10))
    else:
        expected = []  # clean exit commits the full position
    assert second_run == expected
    # no record lost overall
    assert sorted(set(first_run) | set(second_run)) == list(range(10))


@given(
    batch1=st.dictionaries(st.integers(0, 5), st.integers(0, 100), min_size=1, max_size=5),
    batch2=st.dictionaries(st.integers(0, 5), st.integers(0, 100), min_size=1, max_size=5),
)
@settings(**SETTINGS)
def test_upsert_laws(mk_engine, batch1, batch2):
    """upsert(b1); upsert(b2) == dict-merge(b1, b2); upsert(x); upsert(x)
    == upsert(x) (idempotence) — node.py:318-334."""
    engine = mk_engine()
    with engine.node_context("w", outputs={"out": "u"}):
        tb = Table("out", "w")
        tb.init(unique_on=["k"])
        tb.upsert([{"k": k, "v": v} for k, v in batch1.items()])
        tb.flush()
        tb.upsert([{"k": k, "v": v} for k, v in batch2.items()])
        tb.flush()
        tb.upsert([{"k": k, "v": v} for k, v in batch2.items()])  # idempotent re-apply
    with engine.node_context("r", inputs={"in": "u"}):
        got = {r["k"]: r["v"] for r in Table("in", "r").read()}
    assert got == {**batch1, **batch2}


@given(sizes=st.lists(st.integers(1, 7), min_size=1, max_size=4))
@settings(**SETTINGS)
def test_monotonic_ids_dense_across_flushes(mk_engine, sizes):
    """ids stay unique, dense, and lexically ordered across any flush
    pattern (SURVEY.md §7.3-1)."""
    engine = mk_engine()
    with engine.node_context("w", outputs={"out": "m"}):
        tb = Table("out", "w")
        tb.init(add_monotonic_id="mid")
        seq = 0
        for sz in sizes:
            tb.append([{"i": seq + j} for j in range(sz)])
            tb.flush()
            seq += sz
    with engine.node_context("r", inputs={"in": "m"}):
        rows = Table("in", "r").read()
    total = sum(sizes)
    assert len({r["mid"] for r in rows}) == total
    by_mid = sorted(rows, key=lambda r: r["mid"])
    assert [r["i"] for r in by_mid] == list(range(total))


@given(
    lefts=st.lists(st.tuples(st.integers(1, 3), st.integers(0, 30)), min_size=1, max_size=8),
    rights=st.lists(st.tuples(st.integers(1, 3), st.integers(0, 30)), min_size=1, max_size=8),
)
@settings(**SETTINGS)
def test_asof_join_matches_naive(spark, lefts, rights):
    """asof_join(union-window formulation) == the O(n*m) naive
    definition: latest right with rts <= lts per key, ties -> larger
    tiebreak."""
    from patterns_devkit_spark.operators.asof import asof_join

    lefts = list({(k, ts) for k, ts in lefts})
    rights = list({(k, ts) for k, ts in rights})
    left = spark.createDataFrame([(k, ts, i) for i, (k, ts) in enumerate(lefts)], ["k", "lts", "lid"])
    right = spark.createDataFrame([(k, ts, 100 + i) for i, (k, ts) in enumerate(rights)], ["k", "rts", "rid"])
    out = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts", right_cols=["rid"], tiebreak="rid")
    got = {(r["k"], r["lts"]): r["asof_rid"] for r in out.collect()}

    expected = {}
    for k, lts in lefts:
        cands = [(ts, 100 + i) for i, (rk, ts) in enumerate(rights) if rk == k and ts <= lts]
        expected[(k, lts)] = max(cands)[1] if cands else None
    assert got == expected


@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=50))
@settings(**SETTINGS)
def test_jvm_base32_equals_python(spark, ns):
    """encode_base32_col (conv+translate+lpad, zero-Python write path)
    emits byte-identical strings to ids.encode_base32."""
    from pyspark.sql import functions as F

    from patterns_devkit_spark.node.ids import encode_base32, encode_base32_col

    df = spark.createDataFrame([(n,) for n in ns], "n long")
    got = {r["n"]: r["s"] for r in df.select("n", encode_base32_col(F.col("n")).alias("s")).collect()}
    assert got == {n: encode_base32(n) for n in ns}


@given(
    data=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50), st.sampled_from("abc")),
        min_size=1,
        max_size=25,
        unique_by=lambda r: (r[0], r[1]),
    )
)
@settings(**{**SETTINGS, "max_examples": 4})
def test_scd2_reconstructs_pointwise_state(spark, data):
    """SCD2 law: for every source event, exactly ONE validity segment
    of its key contains its timestamp (valid_from <= ts < valid_to),
    and that segment carries the attr the key had at that moment (the
    attr of the latest event at-or-before ts)."""
    from patterns_devkit_spark.operators.timeseries import scd2_compress

    rows = [(k, ts, attr) for (k, ts, attr) in data]
    df = spark.createDataFrame(rows, "k long, ts long, attr string")
    segs = scd2_compress(df, "k", "attr", "ts", "ts").collect()
    by_key = {}
    for s in segs:
        by_key.setdefault(s.k, []).append(s)
    import bisect

    for k, ts, _attr in rows:
        latest = max(
            (r for r in rows if r[0] == k and r[1] <= ts), key=lambda r: r[1]
        )
        covering = [
            s
            for s in by_key[k]
            if s.valid_from <= ts and (s.valid_to is None or ts < s.valid_to)
        ]
        assert len(covering) == 1, (k, ts, covering)
        assert covering[0].attr == latest[2]


@given(
    intervals=st.lists(
        st.tuples(st.integers(0, 100), st.integers(0, 40)), min_size=1, max_size=8
    ),
    points=st.lists(st.integers(0, 160), min_size=1, max_size=30),
)
@settings(**{**SETTINGS, "max_examples": 4})
def test_interval_join_equiv_naive_random(spark, intervals, points):
    from pyspark.sql import functions as F

    from patterns_devkit_spark.operators.intervals import point_in_interval_join

    iv = spark.createDataFrame(
        [(i, s, s + d) for i, (s, d) in enumerate(intervals)], "iid long, s long, e long"
    )
    pt = spark.createDataFrame(
        [(i, p) for i, p in enumerate(points)], "pid long, p long"
    )
    fast = point_in_interval_join(iv, pt, "s", "e", "p", bucket_ms=16)
    naive = iv.join(pt, (F.col("p") >= F.col("s")) & (F.col("p") <= F.col("e")))
    assert {(r.iid, r.pid) for r in fast.collect()} == {
        (r.iid, r.pid) for r in naive.collect()
    }


@given(
    schedule=st.lists(
        st.tuples(
            st.sampled_from(["L", "R", "B"]),  # which side(s) get a batch
            st.lists(st.tuples(st.integers(0, 4), st.integers(1, 9)), min_size=1, max_size=4),
        ),
        min_size=1,
        max_size=4,
    ),
    refresh_each=st.booleans(),
)
@settings(**SETTINGS)
def test_join_mv_any_schedule_equals_full_recompute(mk_engine, schedule, refresh_each):
    """IVM law: for ANY interleaving of left/right/both appends and any
    refresh cadence (per-batch or once at the end), the folded join
    view equals the from-scratch join aggregate."""
    from pyspark.sql import functions as F

    engine = mk_engine()

    def append(store, rows):
        with engine.node_context("w", outputs={"out": store}):
            tb = Table("out", "w")
            tb.init(add_monotonic_id="mid")
            tb.append(rows)
            tb.flush()

    mv = engine.create_materialized_join_view(
        "jp",
        left="lt",
        right="rt",
        on=["k"],
        order_by={"lt": "mid", "rt": "mid"},
        dims=["k"],
        measures={"s": ("sum", "lv * rv"), "n": ("count", "*")},
    )
    for side, pairs in schedule:
        if side in ("L", "B"):
            append("lt", [{"k": k, "lv": v} for k, v in pairs])
        if side in ("R", "B"):
            append("rt", [{"k": k, "rv": v + 10} for k, v in pairs])
        if refresh_each:
            mv.refresh()
    mv.refresh()

    got = mv.read_spark()
    got_rows = sorted(tuple(r) for r in got.collect()) if got is not None else []
    with engine.node_context("r", inputs={"a": "lt", "b": "rt"}):
        l_df = Table("a", "r").read_spark()
        r_df = Table("b", "r").read_spark()
    if "k" not in l_df.columns or "k" not in r_df.columns:
        # one side never received data: the join view must be empty
        assert got_rows == []
        return
    expect = (
        l_df.join(r_df, "k")
        .groupBy("k")
        .agg(F.sum(F.expr("lv * rv")).alias("s"), F.count(F.lit(1)).alias("n"))
    )
    expect_rows = sorted(tuple(r) for r in expect.collect())
    assert got_rows == expect_rows
