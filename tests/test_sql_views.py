"""Catalog-registered SQL views: {{ ref }} templates stored as text,
expanded recursively at query time (late-bound to the versions active
THEN), cycle-guarded, persisted across engine reloads and both catalog
backends."""
import pytest

from patterns_devkit_spark import Table


def _write(engine, store, rows):
    with engine.node_context("w", outputs={"out": store}):
        tb = Table("out", "w")
        tb.append(rows)
        tb.flush()


def test_view_basic_and_late_binding(engine):
    _write(engine, "sales", [{"g": "a", "v": 10}, {"g": "b", "v": 5}])
    engine.create_view("big_sales", "SELECT g, v FROM {{ sales }} WHERE v >= 10")
    with engine.node_context("r", inputs={"in": "sales"}):
        tb = Table("in", "r")
        rows = tb.read_sql("SELECT g, v FROM {{ big_sales }} ORDER BY g")
        assert rows == [{"g": "a", "v": 10}]
        # late binding: new data appears through the view without
        # re-creating it
    _write(engine, "sales", [{"g": "c", "v": 70}])
    with engine.node_context("r", inputs={"in": "sales"}):
        rows = Table("in", "r").read_sql("SELECT g, v FROM {{ big_sales }} ORDER BY g")
        assert rows == [{"g": "a", "v": 10}, {"g": "c", "v": 70}]


def test_view_over_view_and_cycle_guard(engine):
    _write(engine, "t1", [{"x": 1}, {"x": 2}, {"x": 3}])
    engine.create_view("v1", "SELECT x FROM {{ t1 }} WHERE x > 1")
    engine.create_view("v2", "SELECT sum(x) AS s FROM {{ v1 }}")
    with engine.node_context("r", inputs={"in": "t1"}):
        assert Table("in", "r").read_sql("SELECT s FROM {{ v2 }}") == [{"s": 5}]
    engine.create_view("c1", "SELECT * FROM {{ c2 }}")
    engine.create_view("c2", "SELECT * FROM {{ c1 }}")
    with engine.node_context("r", inputs={"in": "t1"}):
        with pytest.raises(Exception, match="circular"):
            Table("in", "r").read_sql("SELECT * FROM {{ c1 }}")


def test_view_sql_surface_and_persistence(engine):
    _write(engine, "t2", [{"x": 4}])
    with engine.node_context("w", outputs={"out": "t2"}):
        tb = Table("out", "w")
        tb.execute_sql("CREATE VIEW doubled AS SELECT x * 2 AS y FROM {{ t2 }}")
    # survives an engine reload (catalog persistence)
    from patterns_devkit_spark import Engine

    eng2 = Engine(engine.catalog.root, spark=engine.spark)
    assert "doubled" in eng2.catalog.view_names()
    with eng2.node_context("r", inputs={"in": "t2"}):
        assert Table("in", "r").read_sql("SELECT y FROM {{ doubled }}") == [{"y": 8}]
    with eng2.node_context("w", outputs={"out": "t2"}):
        Table("out", "w").execute_sql("DROP VIEW doubled")
    assert eng2.catalog.view_names() == []


def test_view_name_collision_with_table(engine):
    _write(engine, "t3", [{"x": 1}])
    with pytest.raises(ValueError, match="already names a table"):
        engine.create_view("t3", "SELECT 1")


def test_view_sees_renamed_columns(engine):
    """Views compose with zero-copy ALTER: the store ref inside the
    view resolves through the logical projection."""
    _write(engine, "t4", [{"a": 1, "b": 10}])
    with engine.node_context("w", outputs={"out": "t4"}):
        Table("out", "w").rename_column("b", "amount")
    engine.create_view("t4v", "SELECT a, amount FROM {{ t4 }}")
    with engine.node_context("r", inputs={"in": "t4"}):
        assert Table("in", "r").read_sql("SELECT amount FROM {{ t4v }}") == [{"amount": 10}]


def test_cli_view_and_alter(tmp_path):
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run_cli(args, cwd):
        env = {**os.environ, "PYTHONPATH": repo}
        return subprocess.run(
            [sys.executable, "-m", "patterns_devkit_spark.cli", *args],
            cwd=cwd, env=env, capture_output=True, text=True, timeout=180,
        )

    wh = str(tmp_path / "wh")
    app = tmp_path / "vapp"
    app.mkdir()
    (app / "graph.yml").write_text(
        "functions:\n  - node_file: gen.py\n    id: gen00001\n    outputs: {out: tt}\nstores:\n  - table: tt\n"
    )
    (app / "gen.py").write_text(
        "from patterns import Table\n"
        "t = Table('out', 'w')\n"
        "t.append([{'a': 1, 'b': 2}])\n"
    )
    r = run_cli(["--warehouse", wh, "trigger", "gen00001"], str(app))
    assert r.returncode == 0, r.stdout + r.stderr
    r = run_cli(["--warehouse", wh, "view", "create", "vv", "SELECT a FROM {{ tt }}"], str(app))
    assert r.returncode == 0 and "created view vv" in r.stdout, r.stdout + r.stderr
    r = run_cli(["--warehouse", wh, "view", "list"], str(app))
    assert "vv: SELECT a FROM" in r.stdout
    r = run_cli(["--warehouse", wh, "alter", "rename", "tt", "b", "--to", "bee"], str(app))
    assert r.returncode == 0, r.stdout + r.stderr
    r = run_cli(["--warehouse", wh, "alter", "add", "tt", "c", "--type", "string", "--default", "'x'"], str(app))
    assert r.returncode == 0, r.stdout + r.stderr
    r = run_cli(["--warehouse", wh, "view", "drop", "vv"], str(app))
    assert r.returncode == 0 and "dropped" in r.stdout
    # the alters landed in the catalog (backend-agnostic read)
    from patterns_devkit_spark.catalog.catalog import Catalog

    ddl = (Catalog(wh).table_meta("tt") or {})["schema_ddl"]
    assert "bee" in ddl and "c string" in ddl.lower()


def test_sys_views_and_join_mv_listing(engine):
    """__sys_views lists catalog SQL views; __sys_matviews renders a
    two-source join view (dict ordering/cursor stringified, staleness
    from either side)."""
    _write(engine, "l1", [{"k": 1, "mid": 1}])
    _write(engine, "r1", [{"k": 1, "v": 2, "mid": 1}])
    engine.create_view("sv", "SELECT 1 AS one")
    engine.create_materialized_join_view(
        "jmv", left="l1", right="r1", on=["k"],
        order_by={"l1": "mid", "r1": "mid"},
        dims=[], measures={"s": ("sum", "v")},
    )
    engine.materialized_view("jmv").refresh()
    engine.register_system_views()
    vs = {r["view_name"]: r["sql"] for r in engine.spark.sql("SELECT * FROM __sys_views").collect()}
    assert vs.get("sv") == "SELECT 1 AS one"
    m = {r["view_name"] if "view_name" in r.__fields__ else r["mv_name"]: r
         for r in engine.spark.sql("SELECT * FROM __sys_matviews").collect()}
    row = list(m.values())[0]
    assert "l1+r1" in str(tuple(row))


def test_engine_level_sql(engine):
    """engine.sql(): ad-hoc rendered SQL without a node context —
    stores, views, parameters, and time travel all resolve."""
    _write(engine, "tq", [{"a": 1}, {"a": 2}])
    v1 = engine.catalog.get_active_version("tq")
    with engine.node_context("w", outputs={"out": "tq"}):
        tb = Table("out", "w")
        tb.replace([{"a": 1}, {"a": 2}, {"a": 3}])  # new version; v1 keeps 2 rows
        tb.flush()
    engine.create_view("tq_big", "SELECT a FROM {{ tq }} WHERE a >= {{ lo }}")
    rows = engine.sql("SELECT sum(a) AS s FROM {{ tq_big }}", parameters={"lo": 2}).collect()
    assert rows[0]["s"] == 5
    pinned = engine.sql("SELECT count(*) AS n FROM {{ tq@%s }}" % v1).collect()
    assert pinned[0]["n"] == 2


def test_qualified_or_quoted_view_name_rejected(engine):
    """ADVICE r3: a CREATE/DROP VIEW whose name doesn't fit the plain
    \\w+ form must be REJECTED, not fall through template rendering
    into a session-scoped Spark temp view (silent divergence)."""
    import pytest as _pytest

    from patterns_devkit_spark import Table

    with engine.node_context("w", outputs={"out": "vt"}):
        tb = Table("out", "w")
        tb.append([{"a": 1}])
        tb.flush()
        for bad in (
            'CREATE VIEW "quoted name" AS SELECT 1',
            "CREATE VIEW cat.schema.v AS SELECT 1",
            "CREATE OR REPLACE VIEW `tick` AS SELECT 1",
            "DROP VIEW cat.v",
        ):
            with _pytest.raises(ValueError, match="plain identifiers"):
                tb.execute_sql(bad)
