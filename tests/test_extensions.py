"""Partitioned writes + pruning, SQL function registry, webhook HTTP
server, component expansion, stateful streaming."""
import json
import textwrap
import urllib.request

from pyspark.sql import functions as F
from pyspark.sql import types as T

from patterns_devkit_spark import Table
from patterns_devkit_spark.plans.inspect import explain_str

from conftest import assert_partition_zero_copy


def test_partitioned_write_and_pruning(engine, sf_dir):
    from patterns_devkit_spark.queries import t as load_table

    ev = load_table(engine.spark, sf_dir, "events")
    with engine.node_context("w", outputs={"out": "ev_part"}):
        t = Table("out", "w")
        t.init(partition_by="event_type")
        t.append(ev.select("event_id", "event_type", "value"))
    import os

    with engine.node_context("r", inputs={"in": "ev_part"}):
        t = Table("in", "r")
        av = t.get_active_version()
        # hive-style partition dirs on disk
        assert any(d.startswith("event_type=") for d in os.listdir(av.storage))
        df = t.read_spark().filter(F.col("event_type") == "click")
        plan = explain_str(df)
        # partition filter prunes at scan, not post-scan
        assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]
        n_click = df.count()
        assert 0 < n_click < ev.count()


def test_register_function_used_from_sql(engine):
    from patterns_devkit_spark.functions.registry import register_builtin_library

    names = register_builtin_library(engine)
    assert names == ["norm_text", "token_count_py"]
    with engine.node_context("w", outputs={"out": "txt"}):
        Table("out", "w").append([{"s": "  Hello   World "}, {"s": "a b c"}])
    with engine.node_context("r", inputs={"in": "txt"}):
        t = Table("in", "r")
        rows = t.read_sql(
            f"select norm_text(s) as ns, token_count_py(s) as tc from {t.sql_name} order by tc"
        )
        assert rows == [{"ns": "hello world", "tc": 2}, {"ns": "a b c", "tc": 3}]


def test_webhook_http_roundtrip(engine, tmp_path):
    """Live HTTP POST -> backing table append -> handler node responds
    via respond_to_request -> HTTP body carries the response."""
    from patterns_devkit_spark.graph.runner import GraphRunner
    from patterns_devkit_spark.sources.webhook_server import serve_background

    (tmp_path / "graph.yml").write_text(
        textwrap.dedent(
            """
            functions:
              - webhook: intake
              - node_file: handler.py
                id: handler1
                inputs: {req: intake}
            stores: []
            """
        )
    )
    (tmp_path / "handler.py").write_text(
        textwrap.dedent(
            """
            from patterns import Table, respond_to_request
            reqs = Table("req", "r")
            for rec in reqs.as_stream():  # webhook tables default to patterns_id ordering
                respond_to_request(rec["patterns_request_key"], {"echo": rec["msg"], "ok": True})
            """
        )
    )
    runner = GraphRunner(engine, str(tmp_path))
    import random

    port = random.randint(20000, 40000)
    th, base = serve_background(runner, port=port)
    import time

    for _ in range(50):
        try:
            urllib.request.urlopen(f"{base}/health", timeout=1)
            break
        except Exception:
            time.sleep(0.2)
    req = urllib.request.Request(
        f"{base}/webhooks/intake",
        data=json.dumps({"msg": "hi"}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        body = json.loads(resp.read())
        assert resp.status == 200
        assert body == {"echo": "hi", "ok": True}
    # unknown webhook -> 404
    req = urllib.request.Request(
        f"{base}/webhooks/nope", data=b"{}", headers={"Content-Type": "application/json"}, method="POST"
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_component_uses_expansion(engine, tmp_path):
    """uses: org/component@v1 expands from the local components
    registry like a subgraph (reference edit.py:175-200)."""
    (tmp_path / "graph.yml").write_text(
        textwrap.dedent(
            """
            functions:
              - node_file: feed.py
                id: feed0001
                outputs: {out: src}
              - uses: acme/doubler@v1
                id: comp0001
                inputs: {cin: src}
                outputs: {cout: result}
            stores:
              - table: src
              - table: result
            """
        )
    )
    (tmp_path / "feed.py").write_text("from patterns import Table\nTable('out','w').append([{'x': 21}])\n")
    comp = tmp_path / "components" / "acme_doubler_v1"
    comp.mkdir(parents=True)
    (comp / "graph.yml").write_text(
        textwrap.dedent(
            """
            functions:
              - node_file: double.sql
                id: dbl00001
                inputs: {a: cin}
                outputs: {result: cout}
            stores:
              - table: cin
              - table: cout
            exposes:
              inputs: [cin]
              outputs: [cout]
            """
        )
    )
    (comp / "double.sql").write_text("SELECT x * 2 AS y FROM {{ a }}")
    from patterns_devkit_spark.graph.runner import GraphRunner

    runner = GraphRunner(engine, str(tmp_path))
    runner.run_all()
    with engine.node_context("check", inputs={"in": "result"}):
        assert Table("in", "r").read() == [{"y": 42}]


def test_stateful_running_totals(engine, tmp_path):
    from patterns_devkit_spark.streaming.stateful import running_totals
    from patterns_devkit_spark.streaming.streams import spool_stream, write_stream_to_table

    spool = tmp_path / "spool"
    spool.mkdir()
    rows = [
        {"user_id": 1, "value": 10.0},
        {"user_id": 1, "value": 5.0},
        {"user_id": 2, "value": 1.0},
    ]
    (spool / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("value", T.DoubleType())]
    )
    stream = spool_stream(engine, str(spool), schema)
    agg = running_totals(stream, "user_id", "value")
    q = write_stream_to_table(
        engine, agg, "running", str(tmp_path / "ck"), output_mode="update", unique_on="user_id"
    )
    q.awaitTermination(180)
    with engine.node_context("r", inputs={"in": "running"}):
        got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in Table("in", "r").read()}
    assert got == {1: (2, 15.0), 2: (1, 1.0)}


def test_partition_scoped_upsert(engine):
    """Upsert on a partitioned table only rewrites touched partitions;
    untouched partition files are HARDLINKED into the new version
    (same inode), and results equal full-MERGE semantics."""
    import os

    rows = [{"k": i, "grp": f"g{i % 3}", "v": float(i)} for i in range(30)]
    with engine.node_context("w", outputs={"out": "pt"}):
        t = Table("out", "w")
        t.init(unique_on=["k"], partition_by="grp")
        t.append(rows)
        t.flush()
        v1_dir = t.get_active_version().storage
        # upsert touches ONLY grp=g0 (update k=0, insert k=100)
        t.upsert([{"k": 0, "grp": "g0", "v": 999.0}, {"k": 100, "grp": "g0", "v": 1.5}])
        t.flush()
        v2_dir = t.get_active_version().storage
    assert v1_dir != v2_dir
    # correctness: merge semantics hold
    with engine.node_context("r", inputs={"in": "pt"}):
        got = {r["k"]: r["v"] for r in Table("in", "r").read()}
    expected = {i: float(i) for i in range(30)}
    expected[0] = 999.0
    expected[100] = 1.5
    assert got == expected
    # untouched partitions zero-copy carried, touched rewritten
    for part in ("grp=g1", "grp=g2"):
        assert_partition_zero_copy(engine.catalog, "pt", v1_dir, v2_dir, part, rewritten=False)
    assert_partition_zero_copy(engine.catalog, "pt", v1_dir, v2_dir, "grp=g0", rewritten=True)


def test_upsert_key_move_across_partitions(engine):
    """A key whose partition value CHANGES in the upsert batch must not
    leave its stale row alive in the old (otherwise-untouched)
    partition: table-wide unique_on holds (reference node.py upsert
    contract), while genuinely untouched partitions stay hardlinked."""
    import os

    rows = [{"k": i, "grp": f"g{i % 3}", "v": float(i)} for i in range(30)]
    with engine.node_context("w", outputs={"out": "pt_move"}):
        t = Table("out", "w")
        t.init(unique_on=["k"], partition_by="grp")
        t.append(rows)
        t.flush()
        v1_dir = t.get_active_version().storage
        # k=1 lived in grp=g1; the update MOVES it to g0
        t.upsert([{"k": 1, "grp": "g0", "v": -1.0}])
        t.flush()
        v2_dir = t.get_active_version().storage
    with engine.node_context("r", inputs={"in": "pt_move"}):
        got = [(r["k"], r["grp"], r["v"]) for r in Table("in", "r").read()]
    assert len(got) == 30 and len({k for k, _, _ in got}) == 30  # no dup keys
    assert (1, "g0", -1.0) in got and not any(k == 1 and g == "g1" for k, g, _ in got)

    # g2 untouched -> zero-copy carried; g1 held the moved key -> rewritten
    assert_partition_zero_copy(engine.catalog, "pt_move", v1_dir, v2_dir, "grp=g2", rewritten=False)
    assert_partition_zero_copy(engine.catalog, "pt_move", v1_dir, v2_dir, "grp=g1", rewritten=True)


def test_upsert_null_partition_value_full_merge(engine):
    """Null partition values can't be scoped (isin(None) matches
    nothing; dir-name compare breaks on __HIVE_DEFAULT_PARTITION__):
    the upsert must fall back to the full merge and stay correct."""
    with engine.node_context("w", outputs={"out": "pt_null"}):
        t = Table("out", "w")
        t.init(unique_on=["k"], partition_by="grp")
        t.append([{"k": 1, "grp": "g0", "v": 1.0}, {"k": 2, "grp": None, "v": 2.0}])
        t.flush()
        t.upsert([{"k": 2, "grp": None, "v": 22.0}, {"k": 3, "grp": "g1", "v": 3.0}])
        t.flush()
    with engine.node_context("r", inputs={"in": "pt_null"}):
        got = {r["k"]: (r["grp"], r["v"]) for r in Table("in", "r").read()}
    assert got == {1: ("g0", 1.0), 2: (None, 22.0), 3: ("g1", 3.0)}


def test_upsert_flat_old_layout_full_merge(engine):
    """If the active version predates partition_by (flat dir, no
    'col=' subdirs), the scoped path has nothing to hardlink and would
    silently drop old rows — it must fall back to the full merge."""
    rows = [{"k": i, "grp": f"g{i % 3}", "v": float(i)} for i in range(30)]
    with engine.node_context("w", outputs={"out": "pt_flat"}):
        t = Table("out", "w")
        t.init(unique_on=["k"])  # no partition_by yet -> flat layout
        t.append(rows)
        t.flush()
        t.init(partition_by="grp")  # declared AFTER the first version
        t.upsert([{"k": 0, "grp": "g0", "v": 999.0}])
        t.flush()
    with engine.node_context("r", inputs={"in": "pt_flat"}):
        got = {r["k"]: r["v"] for r in Table("in", "r").read()}
    expected = {i: float(i) for i in range(30)}
    expected[0] = 999.0
    assert got == expected


def test_update_mode_multibatch_upserts_not_appends(engine, tmp_path):
    """Update-mode aggregates re-emit a key's row in later batches; the
    sink must upsert so the table holds ONE current row per key, not a
    history of stale re-emissions (two spool files forced into two
    micro-batches via maxFilesPerTrigger=1)."""
    from pyspark.sql import functions as F

    from patterns_devkit_spark.streaming.streams import write_stream_to_table

    spool = tmp_path / "spool2"
    spool.mkdir()
    (spool / "b1.json").write_text(json.dumps({"user_id": 1, "value": 10.0}))
    (spool / "b2.json").write_text(json.dumps({"user_id": 1, "value": 5.0}))
    schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("value", T.DoubleType())]
    )
    stream = (
        engine.spark.readStream.format("json")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(spool))
    )
    agg = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value")
    )
    q = write_stream_to_table(
        engine, agg, "upd_multi", str(tmp_path / "ck2"), output_mode="update", unique_on="user_id"
    )
    q.awaitTermination(180)
    with engine.node_context("r", inputs={"in": "upd_multi"}):
        rows = Table("in", "r").read()
    # one row per key, holding the LATEST running values
    assert rows == [{"user_id": 1, "n_events": 2, "total_value": 15.0}]


def test_update_mode_requires_unique_on(engine, tmp_path):
    import pytest as _pytest

    from patterns_devkit_spark.streaming.streams import write_stream_to_table

    schema = T.StructType([T.StructField("user_id", T.LongType())])
    stream = engine.spark.readStream.format("json").schema(schema).load(str(tmp_path))
    with _pytest.raises(ValueError, match="unique_on"):
        write_stream_to_table(engine, stream, "x", str(tmp_path / "ck3"), output_mode="update")


def test_upsert_skewed_hot_partition_hardlinks(engine):
    """VERDICT r3 item 6, skew fixture: ~90% of the update batch lands
    in ONE hot partition; the scoped MERGE must still rewrite only the
    touched partitions (hot + the one cold partition) and hardlink
    every other partition — the rewrite is bounded by the HOT
    partition's size, never the table's."""
    import os

    # 16 partitions; updates: 90 rows -> grp g3 (hot), 10 rows -> g5
    rows = [{"k": i, "grp": f"g{i % 16}", "v": float(i)} for i in range(1600)]
    updates = [{"k": k, "grp": "g3", "v": 0.5} for k in range(3, 1600, 16)][:90]
    updates += [{"k": k, "grp": "g5", "v": 0.25} for k in range(5, 1600, 16)][:10]
    assert len(updates) == 100
    with engine.node_context("w", outputs={"out": "pt_skew"}):
        t = Table("out", "w")
        t.init(unique_on=["k"], partition_by="grp")
        t.append(rows)
        t.flush()
        v1_dir = t.get_active_version().storage
        t.upsert(updates)
        t.flush()
        v2_dir = t.get_active_version().storage
    with engine.node_context("r", inputs={"in": "pt_skew"}):
        got = {r["k"]: r["v"] for r in Table("in", "r").read()}
    expected = {i: float(i) for i in range(1600)}
    for u in updates:
        expected[u["k"]] = u["v"]
    assert got == expected

    for i in range(16):
        part = f"grp=g{i}"
        assert_partition_zero_copy(
            engine.catalog, "pt_skew", v1_dir, v2_dir, part, rewritten=i in (3, 5)
        )


def test_auto_compact_after_threshold(engine, spark):
    """init(auto_compact_after=N): once an append flush leaves the
    active version with >= N files, compaction runs automatically —
    the active version becomes a compacted one with identical data;
    below the threshold nothing compacts."""
    import glob
    import os as _os

    with engine.node_context("w", outputs={"out": "ac"}):
        t = Table("out", "w")
        t.init(auto_compact_after=4)

        def n_files():
            d = t.get_active_version().storage
            return len(glob.glob(_os.path.join(d, "**", "*.parquet"), recursive=True))

        for i in range(3):
            t.append(spark.createDataFrame([(i,)], "k long").coalesce(1))
            t.flush()
        assert n_files() == 3  # under threshold: untouched
        v_before = t.get_active_version().version_id
        t.append(spark.createDataFrame([(3,)], "k long").coalesce(1))
        t.flush()  # 4th file -> auto compact
        assert t.get_active_version().version_id != v_before
        assert n_files() == 1
        assert sorted(r["k"] for r in t.read()) == [0, 1, 2, 3]
        # compaction result is a fresh version; appends keep accreting
        t.append(spark.createDataFrame([(4,)], "k long").coalesce(1))
        t.flush()
        assert n_files() == 2
        assert sorted(r["k"] for r in t.read()) == [0, 1, 2, 3, 4]
