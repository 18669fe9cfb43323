"""Cross-warehouse export -> import round trip (Engine.import_table,
the inverse of Table.export). --link is a zero-copy parquet attach
(hardlinks, inode-asserted); csv/jsonl re-encode through the reader."""
import os

from patterns_devkit_spark import Engine, Table


def test_parquet_link_roundtrip_across_warehouses(engine, spark, tmp_path):
    with engine.node_context("w", outputs={"out": "src_tbl"}):
        t = Table("out", "w")
        t.append([{"id": i, "v": f"x{i}"} for i in range(20)])
        t.flush()
        n = t.export(str(tmp_path / "handoff"))
        assert n == 20

    other = Engine(str(tmp_path / "wh2"), spark=spark)
    n = other.import_table("imported", str(tmp_path / "handoff"), link=True)
    assert n == 20
    with other.node_context("r", inputs={"in": "imported"}):
        rows = Table("in", "r").read()
        assert sorted(r["id"] for r in rows) == list(range(20))

    # zero-copy: imported parquet files share inodes with the export
    src_inodes = {
        os.stat(os.path.join(r, f)).st_ino
        for r, _d, fs in os.walk(tmp_path / "handoff")
        for f in fs
        if f.endswith(".parquet")
    }
    dst_dir = other.catalog.active_dir("imported")
    dst_inodes = {
        os.stat(os.path.join(r, f)).st_ino
        for r, _d, fs in os.walk(dst_dir)
        for f in fs
        if f.endswith(".parquet")
    }
    assert dst_inodes and dst_inodes <= src_inodes


def test_csv_import_reencodes(engine, spark, tmp_path):
    with engine.node_context("w", outputs={"out": "csv_src"}):
        t = Table("out", "w")
        t.append([{"k": 1, "s": "a"}, {"k": 2, "s": "b"}])
        t.flush()
        t.export(str(tmp_path / "csv_out"), format="csv", single_file=True)
    n = engine.import_table("csv_back", str(tmp_path / "csv_out"), format="csv")
    assert n == 2
    with engine.node_context("r", inputs={"in": "csv_back"}):
        rows = sorted((r["k"], r["s"]) for r in Table("in", "r").read())
        assert rows == [(1, "a"), (2, "b")]


def test_import_versions_and_events(engine, tmp_path):
    with engine.node_context("w", outputs={"out": "seed"}):
        t = Table("out", "w")
        t.append([{"a": 1}])
        t.flush()
        t.export(str(tmp_path / "e1"))
    engine.import_table("tgt", str(tmp_path / "e1"), link=True)
    v1 = engine.catalog.get_active_version("tgt")
    engine.import_table("tgt", str(tmp_path / "e1"), link=True)  # second import = new version
    assert engine.catalog.get_active_version("tgt") != v1
    events, _ = engine.catalog.read_events()
    kinds = [e["kind"] for e in events if e["table"] == "tgt"]
    assert "create" in kinds and "update" in kinds
