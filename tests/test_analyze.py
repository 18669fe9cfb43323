"""Table.analyze() — per-column statistics in one aggregate job,
stored per version in the catalog and queryable via the
__sys_column_stats system view."""
from pyspark.sql import functions as F

from patterns_devkit_spark import Table


def test_analyze_exact_bounds_and_approx_ndv(engine):
    with engine.node_context("w", outputs={"out": "an1"}):
        t = Table("out", "w")
        t.append([{"id": i, "grp": f"g{i % 7}", "val": None if i % 10 == 0 else i * 2} for i in range(1000)])
    with engine.node_context("r", inputs={"in": "an1"}):
        st = Table("in", "r").analyze()
    assert st["rows"] == 1000
    c = st["cols"]
    assert c["id"]["min"] == 0 and c["id"]["max"] == 999 and c["id"]["n_nonnull"] == 1000
    assert c["val"]["n_nonnull"] == 900  # every 10th is null
    assert c["grp"]["min"] == "g0" and c["grp"]["max"] == "g6"
    # HLL++ approx NDV within 5% of truth on each column
    for col, truth in (("id", 1000), ("grp", 7), ("val", 900)):
        ndv = c[col]["ndv_approx"]
        assert abs(ndv - truth) <= max(1, truth * 0.05), (col, ndv)
    # persisted in the catalog for the active version
    vid = engine.catalog.get_active_version("an1")
    assert engine.catalog.get_column_stats("an1", vid)["rows"] == 1000


def test_analyze_surfaces_in_system_view(engine):
    with engine.node_context("w", outputs={"out": "an2"}):
        t = Table("out", "w")
        t.append([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    with engine.node_context("r", inputs={"in": "an2"}):
        Table("in", "r").analyze()
    engine.register_system_views()
    rows = (
        engine.spark.table("__sys_column_stats")
        .filter(F.col("table_name") == "an2")
        .collect()
    )
    by_col = {r["column"]: r for r in rows}
    assert set(by_col) == {"a", "b"}
    assert by_col["a"]["n_rows"] == 2 and by_col["a"]["min"] == "1" and by_col["a"]["max"] == "2"


def test_analyze_noop_without_data_or_connection(engine):
    with engine.node_context("w", outputs={}):
        assert Table("nope", "w", required=False).analyze() is None
    with engine.node_context("w2", outputs={"out": "an3"}):
        t = Table("out", "w")
        assert t.analyze() is None  # declared but never written
