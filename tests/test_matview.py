"""Incremental materialized views (node/matview.py): dims + mergeable
measures folded per refresh over only the appended delta; the applied
cursor rides the MV version and flips atomically with the pointer
(exactly-once). Incremental result must equal the full recompute after
every refresh — that's the invariant each test asserts."""
import pytest

from patterns_devkit_spark import MaterializedView, Table


def _append(engine, store, rows):
    with engine.node_context("w", outputs={"out": store}):
        t = Table("out", "w")
        t.init(add_monotonic_id="mid")
        t.append(rows)
        t.flush()


def _mv_rows(mv):
    df = mv.read_spark()
    return sorted(tuple(r) for r in df.collect()) if df is not None else []


def test_incremental_equals_full_recompute(engine):
    _append(engine, "sales", [{"grp": "a", "amt": 10}, {"grp": "b", "amt": 5}])
    mv = engine.create_materialized_view(
        "sales_by_grp",
        source="sales",
        order_by="mid",
        dims=["grp"],
        measures={"total": ("sum", "amt"), "n": ("count", "*"), "mx": ("max", "amt")},
    )
    assert mv.refresh() == 2
    assert _mv_rows(mv) == [("a", 10, 1, 10), ("b", 5, 1, 5)]

    # second batch: touched group folds, new group appears, untouched survives
    _append(engine, "sales", [{"grp": "a", "amt": 7}, {"grp": "c", "amt": 99}])
    assert mv.refresh() == 2
    assert _mv_rows(mv) == [("a", 17, 2, 10), ("b", 5, 1, 5), ("c", 99, 1, 99)]

    # idempotent: nothing new -> no-op, no version churn
    v = engine.catalog.get_active_version("sales_by_grp")
    assert mv.refresh() == 0
    assert engine.catalog.get_active_version("sales_by_grp") == v


def test_min_max_merge_and_where(engine):
    _append(engine, "ev", [{"k": "x", "v": 5, "ok": True}, {"k": "x", "v": 1, "ok": False}])
    mv = engine.create_materialized_view(
        "ev_mv", source="ev", order_by="mid", dims=["k"],
        measures={"lo": ("min", "v"), "hi": ("max", "v")}, where="ok",
    )
    mv.refresh()
    assert _mv_rows(mv) == [("x", 5, 5)]  # filtered row excluded
    _append(engine, "ev", [{"k": "x", "v": 3, "ok": True}])
    mv.refresh()
    assert _mv_rows(mv) == [("x", 3, 5)]


def test_grand_total_no_dims(engine):
    _append(engine, "g", [{"v": 1}, {"v": 2}])
    mv = engine.create_materialized_view(
        "g_mv", source="g", order_by="mid", dims=[], measures={"s": ("sum", "v")},
    )
    mv.refresh()
    _append(engine, "g", [{"v": 4}])
    mv.refresh()
    assert _mv_rows(mv) == [(7,)]


def test_exactly_once_cursor_rides_version(engine):
    """Simulated crash between version write and pointer flip: restore
    the OLD pointer -> its paired cursor makes the next refresh re-apply
    the same delta exactly once (no double count)."""
    _append(engine, "s2", [{"grp": "a", "amt": 1}])
    mv = engine.create_materialized_view(
        "s2_mv", source="s2", order_by="mid", dims=["grp"], measures={"t": ("sum", "amt")},
    )
    mv.refresh()
    v1 = engine.catalog.get_active_version("s2_mv")
    _append(engine, "s2", [{"grp": "a", "amt": 10}])
    mv.refresh()
    # crash simulation: flip back to v1 (as if the new flip never landed)
    engine.catalog.set_active_version("s2_mv", v1)
    assert mv.refresh() == 1  # delta re-applied relative to v1's cursor
    assert _mv_rows(mv) == [("a", 11)]


def test_full_refresh_recomputes_after_source_rewrite(engine):
    _append(engine, "s3", [{"grp": "a", "amt": 2}, {"grp": "a", "amt": 3}])
    mv = engine.create_materialized_view(
        "s3_mv", source="s3", order_by="mid", dims=["grp"], measures={"t": ("sum", "amt")},
    )
    mv.refresh()
    # source DELETE invalidates the incremental fold -> full refresh
    with engine.node_context("w", outputs={"out": "s3"}):
        Table("out", "w").delete_where("amt = 3")
    assert _mv_rows(mv) == [("a", 5)]  # stale until full refresh
    mv.refresh(full=True)
    assert _mv_rows(mv) == [("a", 2)]


def test_engine_refresh_all_and_reload_handle(engine):
    _append(engine, "s4", [{"grp": "z", "amt": 1}])
    engine.create_materialized_view(
        "s4_mv", source="s4", order_by="mid", dims=["grp"], measures={"t": ("sum", "amt")},
    )
    out = engine.refresh_materialized_views()
    assert out["s4_mv"] == 1
    # spec round-trips through the catalog: a fresh handle refreshes
    mv2 = MaterializedView(engine, "s4_mv")
    assert mv2.refresh() == 0
    assert _mv_rows(mv2) == [("z", 1)]


def test_sys_matviews_view(engine):
    _append(engine, "s5", [{"grp": "a", "amt": 3}])
    mv = engine.create_materialized_view(
        "s5_mv", source="s5", order_by="mid", dims=["grp"], measures={"t": ("sum", "amt")},
    )
    mv.refresh()
    engine.register_system_views()
    row = engine.spark.sql("SELECT * FROM __sys_matviews WHERE view_name = 's5_mv'").collect()[0]
    assert row["source"] == "s5" and row["dims"] == "grp"
    assert row["measures"] == "t=sum(amt)" and row["applied_cursor"] is not None
    assert row["stale"] is False  # just refreshed: cursor == source HWM
    _append(engine, "s5", [{"grp": "b", "amt": 9}])
    engine.register_system_views()
    row = engine.spark.sql("SELECT stale FROM __sys_matviews WHERE view_name = 's5_mv'").collect()[0]
    assert row["stale"] is True  # source advanced past the applied cursor


def test_cli_mv_roundtrip(tmp_path):
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run_cli(args, cwd):
        env = {**os.environ, "PYTHONPATH": repo}
        return subprocess.run(
            [sys.executable, "-m", "patterns_devkit_spark.cli", *args],
            cwd=cwd, env=env, capture_output=True, text=True, timeout=120,
        )

    wh = str(tmp_path / "wh")
    app = tmp_path / "mvapp"
    app.mkdir()
    (app / "graph.yml").write_text(
        "functions:\n  - node_file: gen.py\n    id: gen00001\n    outputs: {out: sales}\nstores:\n  - table: sales\n"
    )
    (app / "gen.py").write_text(
        "from patterns import Table\n"
        "t = Table('out', 'w')\n"
        "t.init(add_monotonic_id='mid')\n"
        "t.append([{'g': 'x', 'v': 2}, {'g': 'y', 'v': 5}])\n"
    )
    r = run_cli(["--warehouse", wh, "trigger", "gen00001"], str(app))
    assert r.returncode == 0, r.stdout + r.stderr
    r = run_cli(
        ["--warehouse", wh, "mv", "create", "sales_mv", "--source", "sales",
         "--order-by", "mid", "--dims", "g", "--measures", "total=sum:v,n=count:*"],
        str(app),
    )
    assert r.returncode == 0 and "created" in r.stdout, r.stdout + r.stderr
    r = run_cli(["--warehouse", wh, "mv", "refresh"], str(app))
    assert r.returncode == 0 and "sales_mv: 2 delta rows applied" in r.stdout, r.stdout + r.stderr
    r = run_cli(["--warehouse", wh, "mv", "list"], str(app))
    assert "source=sales" in r.stdout and "total=sum(v)" in r.stdout


def test_graph_runner_auto_refreshes_mv(engine, tmp_path):
    """run_all: a source node's data event eagerly folds the MV delta,
    and the MV's own update event triggers ITS downstream consumer in
    the same drain loop."""
    import textwrap

    from patterns_devkit_spark.graph.runner import GraphRunner

    (tmp_path / "graph.yml").write_text(
        textwrap.dedent(
            """
            functions:
              - node_file: gen.py
                id: gen00001
                outputs: {out: mv_src}
              - node_file: pub.py
                id: pub00001
                inputs: {in: mv_agg}
                outputs: {out: mv_pub}
            stores:
              - table: mv_src
              - table: mv_agg
              - table: mv_pub
            """
        )
    )
    (tmp_path / "gen.py").write_text(
        textwrap.dedent(
            """
            from patterns import Table
            t = Table('out', 'w')
            t.init(add_monotonic_id='mid')
            t.append([{'g': 'a', 'v': 1}, {'g': 'a', 'v': 2}, {'g': 'b', 'v': 5}])
            """
        )
    )
    (tmp_path / "pub.py").write_text(
        textwrap.dedent(
            """
            from patterns import Table
            rows = Table('in', 'r').read()
            Table('out', 'w').replace(rows)
            """
        )
    )
    engine.create_materialized_view(
        "mv_agg", source="mv_src", order_by="mid", dims=["g"], measures={"t": ("sum", "v")},
    )
    runner = GraphRunner(engine, str(tmp_path))
    executed = runner.run_all()
    assert "gen00001" in executed and "pub00001" in executed
    with engine.node_context("chk", inputs={"in": "mv_pub"}):
        rows = sorted((r["g"], r["t"]) for r in Table("in", "r").read())
    assert rows == [("a", 3), ("b", 5)]


def test_mv_over_streamed_table(engine, tmp_path):
    """Streaming -> engine table -> MV composition: a readStream spool
    appends into a monotonic-id table, and successive MV refreshes fold
    exactly the streamed deltas — the streaming materialized-view shape
    without any special-casing (the sink gives the MV its append-only,
    evented source)."""
    import json

    from pyspark.sql import types as T

    from patterns_devkit_spark.streaming.streams import spool_stream, write_stream_to_table

    spool = tmp_path / "spool"
    spool.mkdir()
    schema = T.StructType(
        [T.StructField("g", T.StringType()), T.StructField("v", T.LongType())]
    )
    # the sink table declares the monotonic id the MV cursors on
    with engine.node_context("init", outputs={"out": "stream_src"}):
        Table("out", "w").init(add_monotonic_id="mid")
    mv = engine.create_materialized_view(
        "stream_mv", source="stream_src", order_by="mid", dims=["g"], measures={"t": ("sum", "v")},
    )

    (spool / "b1.json").write_text("\n".join(json.dumps(r) for r in [{"g": "a", "v": 1}, {"g": "b", "v": 2}]))
    q = write_stream_to_table(
        engine, spool_stream(engine, str(spool), schema), "stream_src",
        str(tmp_path / "ck"), output_mode="append",
    )
    q.awaitTermination(120)
    assert mv.refresh() == 2

    (spool / "b2.json").write_text(json.dumps({"g": "a", "v": 10}))
    q = write_stream_to_table(
        engine, spool_stream(engine, str(spool), schema), "stream_src",
        str(tmp_path / "ck"), output_mode="append",
    )
    q.awaitTermination(120)
    assert mv.refresh() == 1  # only the new micro-batch folds
    assert _mv_rows(mv) == [("a", 11), ("b", 2)]


def test_validation_errors(engine):
    with pytest.raises(ValueError, match="unsupported aggregate"):
        engine.create_materialized_view(
            "bad", source="s", order_by="mid", dims=["g"], measures={"a": ("avg", "v")},
        )
    with pytest.raises(KeyError, match="no materialized view"):
        MaterializedView(engine, "nope")


# -- two-source incremental JOIN views (IVM delta rule) ----------------

def _jmv(engine, name="rev_by_cat"):
    return engine.create_materialized_join_view(
        name,
        left="orders_t",
        right="items_t",
        on=["oid"],
        order_by={"orders_t": "mid", "items_t": "mid"},
        dims=["cat"],
        measures={"revenue": ("sum", "qty * price"), "n_pairs": ("count", "*")},
    )


def _full_join_expect(engine):
    with engine.node_context("r", inputs={"a": "orders_t", "b": "items_t"}):
        a = Table("a", "r").read_spark()
        b = Table("b", "r").read_spark()
    j = a.join(b, "oid").groupBy("cat").agg(
        __import__("pyspark.sql.functions", fromlist=["sum"]).sum(
            __import__("pyspark.sql.functions", fromlist=["expr"]).expr("qty * price")
        ).alias("revenue"),
        __import__("pyspark.sql.functions", fromlist=["count"]).count(
            __import__("pyspark.sql.functions", fromlist=["lit"]).lit(1)
        ).alias("n_pairs"),
    )
    return sorted(tuple(r) for r in j.collect())


def test_join_mv_staggered_appends_equal_full_recompute(engine):
    """Left-only, right-only, and both-sides batches — after every
    refresh the folded view equals the from-scratch join aggregate
    (the IVM invariant). Late-arriving right rows joining OLD left
    rows exercise the L_old x ΔR term."""
    _append(engine, "orders_t", [{"oid": 1, "cat": "x", "price": 10}, {"oid": 2, "cat": "y", "price": 5}])
    _append(engine, "items_t", [{"oid": 1, "qty": 2}])
    mv = _jmv(engine)
    assert mv.refresh() == 3
    assert _mv_rows(mv) == _full_join_expect(engine) == [("x", 20, 1)]

    # right-only batch: joins ONLY pre-cursor left rows (L_old x dR)
    _append(engine, "items_t", [{"oid": 2, "qty": 3}, {"oid": 1, "qty": 1}])
    assert mv.refresh() == 2
    assert _mv_rows(mv) == _full_join_expect(engine) == [("x", 30, 2), ("y", 15, 1)]

    # both-sides batch: dL x dR pairs must land exactly once
    _append(engine, "orders_t", [{"oid": 3, "cat": "x", "price": 100}])
    _append(engine, "items_t", [{"oid": 3, "qty": 4}, {"oid": 2, "qty": 1}])
    assert mv.refresh() == 3
    assert _mv_rows(mv) == _full_join_expect(engine) == [("x", 430, 3), ("y", 20, 2)]

    # idempotent no-op
    v = engine.catalog.get_active_version("rev_by_cat")
    assert mv.refresh() == 0
    assert engine.catalog.get_active_version("rev_by_cat") == v


def test_join_mv_crash_replay_exactly_once(engine):
    """Flip back to the previous MV version (simulated crash before
    the pointer flip): its paired CURSOR PAIR re-applies the same
    two-source delta without double-counting."""
    _append(engine, "orders_t", [{"oid": 1, "cat": "x", "price": 10}])
    _append(engine, "items_t", [{"oid": 1, "qty": 1}])
    mv = _jmv(engine, "j2")
    mv.refresh()
    v1 = engine.catalog.get_active_version("j2")
    _append(engine, "items_t", [{"oid": 1, "qty": 5}])
    mv.refresh()
    engine.catalog.set_active_version("j2", v1)
    assert mv.refresh() == 1
    assert _mv_rows(mv) == [("x", 60, 2)]


def test_join_mv_unmatched_delta_advances_cursor(engine):
    """A delta row with no join partner contributes nothing but MUST
    advance the cursor — when its partner arrives later, the pair is
    produced by the other delta term, not reprocessed twice."""
    _append(engine, "orders_t", [{"oid": 7, "cat": "z", "price": 2}])
    _append(engine, "items_t", [{"oid": 99, "qty": 1}])  # no partner either
    mv = _jmv(engine, "j3")
    assert mv.refresh() == 2  # both unmatched rows consumed as delta
    assert _mv_rows(mv) == []
    _append(engine, "items_t", [{"oid": 7, "qty": 6}])
    assert mv.refresh() == 1  # pair produced by L_old x dR, exactly once
    assert _mv_rows(mv) == [("z", 12, 1)]
    assert mv.refresh() == 0


def test_graph_runner_refreshes_join_mv_on_either_source(engine, tmp_path):
    """run_all folds a join MV when EITHER source table gets a data
    event."""
    import os

    gdir = tmp_path / "g"
    os.makedirs(gdir)
    (gdir / "graph.yml").write_text(
        "functions:\n"
        "  - node_file: feed.py\n"
        "    id: aaaaaaa1\n"
        "    outputs: {o: orders_t, i: items_t}\n"
        "stores:\n"
        "  - table: orders_t\n"
        "  - table: items_t\n"
    )
    (gdir / "feed.py").write_text(
        "from patterns_devkit_spark import Table\n"
        "ot = Table('o', 'w')\n"
        "it = Table('i', 'w')\n"
        "ot.init(add_monotonic_id='mid')\n"
        "it.init(add_monotonic_id='mid')\n"
        "ot.append({'oid': 1, 'cat': 'x', 'price': 3})\n"
        "it.append({'oid': 1, 'qty': 2})\n"
    )
    _jmv(engine, "jg")
    from patterns_devkit_spark.graph.runner import GraphRunner

    r = GraphRunner(engine, str(gdir))
    r.run_all()
    mv = engine.materialized_view("jg")
    assert _mv_rows(mv) == [("x", 6, 1)]


def test_join_mv_where_references_order_column(engine):
    """ADVICE r3: a join-MV whose `where` (or a measure) references a
    source's ordering column used to drop that column before the join
    and raise AnalysisException on every refresh. Referenced ordering
    columns are now carried through when unambiguous; the same name
    ordering BOTH sides is rejected up front at create_join."""
    import pytest as _pytest

    _append(engine, "orders_t", [{"oid": 1, "cat": "x", "price": 10}])
    # right source with a DISTINCT ordering name so the reference is
    # unambiguous after the join
    with engine.node_context("w", outputs={"out": "items2_t"}):
        t = Table("out", "w")
        t.init(add_monotonic_id="imid")
        t.append([{"oid": 1, "qty": 2}])
        t.flush()
    mv = engine.create_materialized_join_view(
        "rev_ord_ref",
        left="orders_t",
        right="items2_t",
        on=["oid"],
        order_by={"orders_t": "mid", "items2_t": "imid"},
        dims=["cat"],
        measures={"revenue": ("sum", "qty * price")},
        where="imid >= 0",  # references the right source's ordering column
    )
    assert mv.refresh() == 2
    assert _mv_rows(mv) == [("x", 20)]

    # ambiguous case: `mid` orders BOTH sides -> rejected with guidance
    _append(engine, "items_t", [{"oid": 1, "qty": 2}])
    with _pytest.raises(ValueError, match="ambiguous"):
        engine.create_materialized_join_view(
            "rev_ord_bad",
            left="orders_t",
            right="items_t",
            on=["oid"],
            order_by={"orders_t": "mid", "items_t": "mid"},
            dims=["cat"],
            measures={"revenue": ("sum", "qty * price")},
            where="mid >= 0",
        )
