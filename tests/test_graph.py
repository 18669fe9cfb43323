"""Graph spec parsing, validation errors, node execution, event
propagation, webhooks, subgraphs, cron (SURVEY.md §2.6, §3.1-§3.3)."""
import datetime as dt
import os
import textwrap

import pytest

from patterns_devkit_spark import Table
from patterns_devkit_spark.graph.runner import GraphCompileError, GraphRunner
from patterns_devkit_spark.graph.scheduler import Scheduler, cron_matches
from patterns_devkit_spark.graph.spec import parse_graph, validate


def write(tmp_path, rel, content):
    p = tmp_path / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(textwrap.dedent(content))
    return str(p)


def make_app(tmp_path):
    write(
        tmp_path,
        "graph.yml",
        """
        title: Test app
        functions:
          - node_file: gen.py
            id: gen00001
            outputs: {out: raw}
          - node_file: agg.sql
            id: agg00001
            inputs: {src: raw}
            outputs: {result: agg}
            parameters: {min_v: 2}
          - webhook: hooks
        stores:
          - table: raw
          - table: agg
        """,
    )
    write(
        tmp_path,
        "gen.py",
        """
        from patterns import Table
        out = Table("out", "w")
        out.init(unique_on=["id"])
        out.append([{"id": i, "v": i * 10} for i in range(5)])
        """,
    )
    write(
        tmp_path,
        "agg.sql",
        """
        SELECT count(*) AS n, sum(v) AS total FROM {{ src }} WHERE v >= {{ min_v }}
        """,
    )
    return str(tmp_path)


def test_parse_and_validate_ok(tmp_path):
    app = make_app(tmp_path)
    spec = parse_graph(app)
    assert spec.title == "Test app"
    assert [n.kind for n in spec.functions] == ["python", "sql", "webhook"]
    assert spec.store_names() == {"raw", "agg", "hooks"}
    assert validate(spec) == []


def test_validation_errors(engine, tmp_path):
    write(
        tmp_path,
        "graph.yml",
        """
        functions:
          - node_file: missing.py
            id: dup00001
            outputs: {out: nope}
          - node_file: bad.sql
            id: dup00001
            outputs: {result: agg}
        stores:
          - table: agg
        """,
    )
    write(tmp_path, "bad.sql", "SELECT * FROM {{ unknown_store }}")
    spec = parse_graph(str(tmp_path))
    msgs = [e["message"] for e in validate(spec)]
    assert any("duplicate node id" in m for m in msgs)
    assert any("undeclared store" in m for m in msgs)
    assert any("missing node file" in m for m in msgs)
    assert any("unresolved template reference" in m for m in msgs)
    with pytest.raises(GraphCompileError) as exc:
        GraphRunner(engine, str(tmp_path))
    assert len(exc.value.errors) >= 4


def test_python_then_sql_node_end_to_end(engine, tmp_path):
    runner = GraphRunner(engine, make_app(tmp_path))
    runner.run_node("gen00001")
    runner.run_node("agg00001")
    with engine.node_context("check", inputs={"in": "agg"}):
        rows = Table("in", "r").read()
        assert rows == [{"n": 4, "total": 100}]  # v in {10,20,30,40}


def test_run_all_event_propagation(engine, tmp_path):
    runner = GraphRunner(engine, make_app(tmp_path))
    executed = runner.run_all()
    # gen runs as source; its create event triggers the sql node
    assert executed[0] == "gen00001" and "agg00001" in executed
    with engine.node_context("check", inputs={"in": "agg"}):
        assert Table("in", "r").read()[0]["n"] == 4


def test_webhook_post_and_respond(engine, tmp_path):
    app = make_app(tmp_path)
    runner = GraphRunner(engine, app)
    key = runner.webhook_post("hooks", {"msg": "hi"})
    with engine.node_context("check", inputs={"in": "hooks"}):
        rows = Table("in", "r").read()
        assert rows[0]["msg"] == "hi"
        assert rows[0]["patterns_request_key"] == key
    # respond_to_request flows through the engine registry
    from patterns_devkit_spark import respond_to_request

    with engine.node_context("responder"):
        respond_to_request(key, {"ok": True})
    assert engine.get_response(key) == {"ok": True}


def test_subgraph_exposes(engine, tmp_path):
    write(
        tmp_path,
        "graph.yml",
        """
        functions:
          - node_file: feed.py
            id: feed0001
            outputs: {out: base}
          - node_file: sub/graph.yml
            id: subg0001
            inputs: {sub_in: base}
            outputs: {sub_out: final}
        stores:
          - table: base
          - table: final
        """,
    )
    write(tmp_path, "feed.py", "from patterns import Table\nTable('out','w').append([{'x': 5}])\n")
    write(
        tmp_path,
        "sub/graph.yml",
        """
        functions:
          - node_file: double.sql
            id: dbl00001
            inputs: {src: sub_in}
            outputs: {result: sub_out}
        stores:
          - table: sub_in
          - table: sub_out
        exposes:
          inputs: [sub_in]
          outputs: [sub_out]
        """,
    )
    write(tmp_path, "sub/double.sql", "SELECT x * 2 AS y FROM {{ src }}")
    runner = GraphRunner(engine, str(tmp_path))
    runner.run_all()
    with engine.node_context("check", inputs={"in": "final"}):
        assert Table("in", "r").read() == [{"y": 10}]


def test_cron_matcher():
    t = dt.datetime(2024, 5, 6, 14, 30)  # Monday
    assert cron_matches("30 14 * * *", t)
    assert cron_matches("*/15 * * * *", t)
    assert cron_matches("* * * * 1", t)
    assert not cron_matches("31 14 * * *", t)
    assert not cron_matches("* * * * 0", t)
    assert cron_matches("0-45/15 14 6 5 *", t)
    with pytest.raises(ValueError):
        cron_matches("* * *", t)


def test_scheduler_runs_due_nodes(engine, tmp_path):
    write(
        tmp_path,
        "graph.yml",
        """
        functions:
          - node_file: tick.py
            id: tick0001
            trigger: "30 * * * *"
            outputs: {out: ticks}
        stores:
          - table: ticks
        """,
    )
    write(tmp_path, "tick.py", "from patterns import Table\nTable('out','w').append([{'t': 1}])\n")
    runner = GraphRunner(engine, str(tmp_path))
    sched = Scheduler(runner)
    assert sched.run_pending(dt.datetime(2024, 1, 1, 10, 29)) == []
    assert sched.run_pending(dt.datetime(2024, 1, 1, 10, 30)) == ["tick0001"]
    # same tick twice -> no rerun
    assert sched.run_pending(dt.datetime(2024, 1, 1, 10, 30)) == []


def test_request_new_run_requeues(engine, tmp_path):
    write(
        tmp_path,
        "graph.yml",
        """
        functions:
          - node_file: chunked.py
            id: chunk001
            outputs: {out: progress}
        stores:
          - table: progress
        """,
    )
    write(
        tmp_path,
        "chunked.py",
        """
        from patterns import Table, State
        st = State()
        n = st.get_value("runs", 0)
        Table("out", "w").append([{"run": n}])
        st.set_value("runs", n + 1)
        if n < 2:
            st.request_new_run()
        """,
    )
    runner = GraphRunner(engine, str(tmp_path))
    executed = runner.run_all()
    assert executed.count("chunk001") == 3  # initial + 2 requeues


def test_missing_required_parameter_compile_error(engine, tmp_path):
    """Reference error class: 'Parameter X has no default or value'
    surfaces at graph compile, not at node runtime."""
    write(
        tmp_path,
        "graph.yml",
        """
        functions:
          - node_file: needs_param.py
            id: needy001
        stores: []
        """,
    )
    write(
        tmp_path,
        "needs_param.py",
        """
        from patterns import Parameter
        x = Parameter("api_key", type=str)
        y = Parameter("optional", type=int, default=3)
        """,
    )
    spec = parse_graph(str(tmp_path))
    msgs = [e["message"] for e in validate(spec)]
    assert "Parameter 'api_key' has no default or value" in msgs
    assert not any("optional" in m for m in msgs)


def test_connection_parameter_resolves_secret(engine):
    from patterns_devkit_spark import Connection, Parameter

    engine.set_secret("warehouse_db", {"host": "db.internal", "user": "svc", "password": "hunter2"})
    with engine.node_context("n", parameters={"db": "warehouse_db"}):
        conn = Parameter("db", type=Connection)
        assert conn["host"] == "db.internal"
        assert isinstance(conn, Connection)
    with engine.node_context("n2", parameters={"db": "nope"}):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="no secret named"):
            Parameter("db", type=Connection)


def test_incremental_aggregation_pipeline(engine, tmp_path):
    """The engine's flagship incremental pattern: a consumer node
    stream-reads new rows (exactly-once cursor), upserts running
    per-key aggregates — run 1 processes the backlog, run 2 only the
    delta. (SURVEY.md §1.4 incremental micro-batch model.)"""
    write(
        tmp_path,
        "graph.yml",
        """
        functions:
          - node_file: rollup.py
            id: rollup01
            inputs: {src: events_t}
            outputs: {out: totals}
        stores:
          - table: events_t
          - table: totals
        """,
    )
    write(
        tmp_path,
        "rollup.py",
        """
        from pyspark.sql import functions as F
        from patterns import Table

        src = Table("src", "r")
        out = Table("out", "w")
        out.init(unique_on=["k"])
        stream = src.as_stream(order_by="event_id")
        batch = stream.consume_spark()
        if batch is not None:
            delta = batch.groupBy("k").agg(
                F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
            )
            prev = out.read_spark()
            if "k" in prev.columns:
                merged = (
                    delta.alias("d")
                    .join(prev.alias("p"), "k", "left")
                    .select(
                        "k",
                        (F.col("d.n") + F.coalesce(F.col("p.n"), F.lit(0))).alias("n"),
                        (F.col("d.s") + F.coalesce(F.col("p.s"), F.lit(0.0))).alias("s"),
                    )
                )
            else:
                merged = delta
            out.upsert(merged)
        """,
    )
    from patterns_devkit_spark.graph.runner import GraphRunner

    runner = GraphRunner(engine, str(tmp_path))
    with engine.node_context("feed", outputs={"o": "events_t"}):
        Table("o", "w").append([{"event_id": i, "k": i % 2, "v": 1.0} for i in range(10)])
    runner.run_node("rollup01")
    with engine.node_context("chk", inputs={"i": "totals"}):
        got = {r["k"]: (r["n"], r["s"]) for r in Table("i", "r").read()}
        assert got == {0: (5, 5.0), 1: (5, 5.0)}
    # second batch: only the delta is consumed (cursor advanced)
    with engine.node_context("feed", outputs={"o": "events_t"}):
        Table("o", "w").append([{"event_id": i, "k": 0, "v": 2.0} for i in range(10, 13)])
    runner.run_node("rollup01")
    with engine.node_context("chk", inputs={"i": "totals"}):
        got = {r["k"]: (r["n"], r["s"]) for r in Table("i", "r").read()}
        assert got == {0: (8, 11.0), 1: (5, 5.0)}
    # third run with no new data: no-op
    runner.run_node("rollup01")
    with engine.node_context("chk", inputs={"i": "totals"}):
        got = {r["k"]: (r["n"], r["s"]) for r in Table("i", "r").read()}
        assert got == {0: (8, 11.0), 1: (5, 5.0)}


def test_wait_atleast_seconds_scheduled_not_capped(engine, tmp_path):
    """request_new_run(wait_atleast_seconds=N) schedules the requeue at
    now+N (reference node.py:482-500). The old code slept min(N, 1) —
    silently violating the contract. Fake clock: no real time passes."""
    write(
        tmp_path,
        "graph.yml",
        """
        functions:
          - node_file: waiter.py
            id: waiter01
            outputs: {out: wprog}
        stores:
          - table: wprog
        """,
    )
    write(
        tmp_path,
        "waiter.py",
        """
        from patterns import Table, State
        st = State()
        n = st.get_value("runs", 0)
        Table("out", "w").append([{"run": n}])
        st.set_value("runs", n + 1)
        if n < 1:
            st.request_new_run(wait_atleast_seconds=30)
        """,
    )
    runner = GraphRunner(engine, str(tmp_path))
    fake = {"t": 100.0}
    slept: list[float] = []

    def fclock():
        return fake["t"]

    def fsleep(s):
        slept.append(s)
        fake["t"] += s

    runner._clock = fclock
    runner._sleep = fsleep
    executed = runner.run_all()
    assert executed.count("waiter01") == 2  # initial + requeued run
    assert sum(slept) >= 30.0  # the FULL wait elapsed on the (fake) clock


def test_store_schema_declaration_applied(engine, tmp_path):
    """`stores: - table: t, schema: {...}` reaches the catalog at graph
    load: the declared schema wins over first-write inference
    (reference edit.py:128-141 — stores carry schemas in graph.yml)."""
    write(
        tmp_path,
        "graph.yml",
        """
        functions:
          - node_file: feed.py
            id: feed0001
            outputs: {out: typed}
        stores:
          - table: typed
            schema:
              k: Text
              v: Float
        """,
    )
    # the node writes ints for v; the declared Float schema must win
    write(tmp_path, "feed.py", "from patterns import Table\nTable('out','w').append([{'k': 'a', 'v': 1}])\n")
    runner = GraphRunner(engine, str(tmp_path))
    runner.run_all()
    with engine.node_context("r", inputs={"in": "typed"}):
        tbl = Table("in", "r")
        dtypes = dict(tbl.read_spark().dtypes)
        assert dtypes["v"] == "double" and dtypes["k"] == "string"
        assert tbl.read() == [{"k": "a", "v": 1.0}]


def test_component_install_and_overwrite_protection(tmp_path):
    """Versioned component registry: install copies the source in,
    re-install of the same version REFUSES without overwrite (versions
    are immutable — reference services/download.py + directory-editor
    overwrite protection), and resolve names the missing-install fix."""
    import pytest as _pytest

    from patterns_devkit_spark.graph.components import (
        ComponentError,
        install_component,
        list_components,
        resolve_component,
    )

    src = tmp_path / "src"
    src.mkdir()
    (src / "graph.yml").write_text("functions: []\nstores: []\n")
    gdir = tmp_path / "app"
    gdir.mkdir()
    dst = install_component(str(gdir), "acme/enrich@v1", str(src))
    assert dst.endswith("components/acme_enrich_v1")
    assert list_components(str(gdir)) == ["acme/enrich@v1"]
    with _pytest.raises(ComponentError, match="immutable"):
        install_component(str(gdir), "acme/enrich@v1", str(src))
    (src / "extra.sql").write_text("SELECT 1 AS x")
    install_component(str(gdir), "acme/enrich@v1", str(src), overwrite=True)
    assert (gdir / "components" / "acme_enrich_v1" / "extra.sql").exists()
    # a second version coexists
    install_component(str(gdir), "acme/enrich@v2", str(src))
    assert list_components(str(gdir)) == ["acme/enrich@v1", "acme/enrich@v2"]
    assert resolve_component(str(gdir), "acme/enrich@v2").endswith("acme_enrich_v2")
    with _pytest.raises(ComponentError, match="not installed"):
        resolve_component(str(gdir), "acme/enrich@v9")
    with _pytest.raises(ComponentError, match="invalid component ref"):
        resolve_component(str(gdir), "not-a-ref")


def test_component_publish_semver_latest(tmp_path):
    """Publish/list/@latest (VERDICT r2 item 9): publishing v1/v2/v10
    orders numerically (not lexically), @latest resolves to the
    highest semver, pre-releases sort below their release, and a
    re-publish of an existing version is refused (immutability)."""
    import subprocess
    import sys

    import pytest as _pytest

    from patterns_devkit_spark.graph.components import (
        ComponentError,
        publish_component,
        resolve_component,
        resolve_latest,
        semver_key,
    )

    src = tmp_path / "comp"
    src.mkdir()
    (src / "graph.yml").write_text("title: c\nfunctions: []\n")
    gdir = tmp_path / "app"
    gdir.mkdir()
    for v in ("v1", "v2", "v10", "v10.1-rc1"):
        publish_component(str(gdir), f"acme/enrich@{v}", str(src))
    # numeric, not lexical: v10 > v2; rc sorts below its release
    assert semver_key("v10") > semver_key("v2") > semver_key("v1")
    assert semver_key("10.1") > semver_key("10.1-rc1")
    assert resolve_latest(str(gdir), "acme", "enrich") == "v10.1-rc1"
    publish_component(str(gdir), "acme/enrich@v10.1", str(src))
    assert resolve_latest(str(gdir), "acme", "enrich") == "v10.1"
    # @latest resolves through resolve_component (the runner's path)
    assert resolve_component(str(gdir), "acme/enrich@latest").endswith("acme_enrich_v10.1")
    # immutability: version re-publish refused
    with _pytest.raises(ComponentError, match="immutable"):
        publish_component(str(gdir), "acme/enrich@v2", str(src))
    # CLI surface: publish a zip + list marks latest
    from patterns_devkit_spark.graph.archive import compress_directory

    z = tmp_path / "comp.zip"
    z.write_bytes(compress_directory(src).getvalue())
    r = subprocess.run(
        [sys.executable, "-m", "patterns_devkit_spark.cli", "component", "publish",
         "beta/pack@v1", str(z), "--dir", str(gdir)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "patterns_devkit_spark.cli", "component", "list",
         "--dir", str(gdir)],
        capture_output=True, text=True,
    )
    assert "beta/pack@v1  (latest)" in r.stdout
    assert "acme/enrich@v10.1  (latest)" in r.stdout
    assert r.stdout.index("acme/enrich@v2") < r.stdout.index("acme/enrich@v10")
    r = subprocess.run(
        [sys.executable, "-m", "patterns_devkit_spark.cli", "component", "resolve",
         "acme/enrich@latest", "--dir", str(gdir)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0 and r.stdout.strip().endswith("acme_enrich_v10.1")
