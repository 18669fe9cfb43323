"""Generated columns (init(generated_columns={col: sql_expr})): the
Delta GENERATED ALWAYS AS analogue — computed at every write from the
row's other columns, user-supplied values ignored, composing with
partition_by so writers get derived-date partition pruning for free."""
import glob
import os

from patterns_devkit_spark import Table


def test_generated_columns_compute_on_write(engine):
    with engine.node_context("n", outputs={"out": "gen1"}):
        t = Table("out", "w")
        t.init(
            unique_on=["id"],
            generated_columns={"bucket": "id % 3", "double_v": "v * 2"},
        )
        t.append([{"id": 1, "v": 10}, {"id": 2, "v": 20}])
        t.flush()
        rows = {r["id"]: (r["bucket"], r["double_v"]) for r in t.read_spark().collect()}
        assert rows == {1: (1, 20), 2: (2, 40)}
        # user-supplied values are ignored (GENERATED ALWAYS semantics)
        t.upsert([{"id": 1, "v": 50, "bucket": 99, "double_v": -1}])
        t.flush()
        rows = {r["id"]: (r["bucket"], r["double_v"]) for r in t.read_spark().collect()}
        assert rows[1] == (1, 100)
        # classic UPDATE recomputes from the updated row
        t.update_where({"v": "7"}, "id = 2")
        rows = {r["id"]: (r["bucket"], r["double_v"]) for r in t.read_spark().collect()}
        assert rows[2] == (2, 14)


def test_generated_partition_column_prunes(engine):
    with engine.node_context("n", outputs={"out": "gen2"}):
        t = Table("out", "w")
        t.init(generated_columns={"grp": "id % 2"}, partition_by="grp")
        t.append(
            engine.spark.createDataFrame([(i,) for i in range(10)], "id long").coalesce(1)
        )
        t.flush()
        v = t.get_active_version()
        # hive layout on the generated column
        dirs = {os.path.basename(p) for p in glob.glob(v.storage + "/grp=*")}
        assert dirs == {"grp=0", "grp=1"}
        got = sorted(r["id"] for r in t.read_spark().filter("grp = 1").collect())
        assert got == [1, 3, 5, 7, 9]
