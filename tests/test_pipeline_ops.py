"""Unit semantics for the pipeline-depth operators (timeseries,
intervals, quality) behind q114-q121. Each test builds a tiny crafted
frame where the expected answer is hand-checkable, plus equivalence
against a naive formulation where one exists."""
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from patterns_devkit_spark.operators import intervals as iv_ops  # noqa: E402
from patterns_devkit_spark.operators import timeseries as ts_ops  # noqa: E402
from patterns_devkit_spark.operators.quality import Check, constraint_audit  # noqa: E402


def test_scd2_compress_segments(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 10, 100),
            (1, "a", 20, 101),
            (1, "b", 30, 102),
            (1, "a", 40, 103),
            (2, "x", 10, 104),
        ],
        "k long, attr string, ts long, eid long",
    )
    out = ts_ops.scd2_compress(df, "k", "attr", "ts", "eid")
    rows = {(r.k, r.version): r for r in out.collect()}
    assert len(rows) == 4  # a(10-30), b(30-40), a(40-), x(10-)
    assert rows[(1, 1)].attr == "a" and rows[(1, 1)].valid_from == 10
    assert rows[(1, 1)].valid_to == 30 and rows[(1, 1)].is_current == 0
    assert rows[(1, 2)].attr == "b" and rows[(1, 2)].valid_to == 40
    assert rows[(1, 3)].attr == "a" and rows[(1, 3)].valid_to is None
    assert rows[(1, 3)].is_current == 1
    assert rows[(2, 1)].is_current == 1


def test_forward_fill_carries_last_non_null(spark):
    df = spark.createDataFrame(
        [(1, 1, None), (1, 2, 10), (1, 3, None), (1, 4, 20), (1, 5, None), (2, 1, None)],
        "k long, ts long, v long",
    )
    out = ts_ops.forward_fill(df, F.col("v"), "k", "ts", "ts", out_col="f")
    got = {(r.k, r.ts): (r.f, r.n_obs_so_far) for r in out.collect()}
    assert got[(1, 1)] == (None, 0)
    assert got[(1, 3)] == (10, 1)
    assert got[(1, 5)] == (20, 2)
    assert got[(2, 1)] == (None, 0)


def test_resample_linear_exact_rational(spark):
    # one segment: t=0 ms v=100, t=4h v=500 -> hourly grid at 0,1,2,3h
    h = 3_600_000
    df = spark.createDataFrame(
        [(1, 0, 100), (1, 4 * h, 500)], "k long, ms long, vm long"
    )
    out = ts_ops.resample_linear(df, "k", "ms", "vm", h).collect()
    assert len(out) == 4
    by_ts = {r.grid_ts.hour: (r.interp_num, r.interp_den) for r in out}
    # v(g) = 100 + 400*(g/4h): num/den must reduce to 100,200,300,400
    for hour, expect in [(0, 100), (1, 200), (2, 300), (3, 400)]:
        num, den = by_ts[hour]
        assert num == expect * den


def test_resample_skips_degenerate_and_descending_sequence_trap(spark):
    # duplicate timestamp (collapsed) + a segment shorter than the grid
    # (no covered grid instant) must yield zero rows, not a descending
    # sequence explosion (F.sequence(1, 0) == [1, 0]).
    df = spark.createDataFrame(
        [(1, 1000, 5), (1, 1000, 7), (1, 2000, 9)], "k long, ms long, vm long"
    )
    assert ts_ops.resample_linear(df, "k", "ms", "vm", 3_600_000).count() == 0


def test_point_in_interval_join_matches_naive(spark):
    iv = spark.createDataFrame(
        [(1, 0, 10_000_000), (2, 5_000_000, 5_000_000), (3, 20_000_000, 30_000_000)],
        "iid long, s long, e long",
    )
    pts = spark.createDataFrame(
        [(i, i * 1_000_000) for i in range(35)], "pid long, p long"
    )
    fast = iv_ops.point_in_interval_join(iv, pts, "s", "e", "p", bucket_ms=3_600_000)
    naive = iv.join(pts, (F.col("p") >= F.col("s")) & (F.col("p") <= F.col("e")))
    a = {(r.iid, r.pid) for r in fast.collect()}
    b = {(r.iid, r.pid) for r in naive.collect()}
    assert a == b and len(a) > 0
    # zero-width interval still matches its exact point
    assert (2, 5) in a


def test_constraint_audit_kinds(spark):
    child = spark.createDataFrame(
        [(1, 1, None), (1, 2, 5), (1, 2, 60), (9, 3, 7)], "fk long, ln long, q long"
    )
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    out = constraint_audit(
        {"c": child, "p": parent},
        [
            Check("uniq", "c", "unique", cols=["fk", "ln"]),
            Check("nn", "c", "not_null", cols=["q"]),
            Check("rng", "c", "in_range", cols=["q"], lo=1, hi=50),
            Check("set", "c", "in_set", cols=["fk"], values=[1]),
            Check("fk", "c", "ref", cols=["fk"], ref_table="p", ref_col="pk"),
        ],
    )
    got = {r.check_name: (r.n_rows, r.n_violations, r.passed) for r in out.collect()}
    assert got["uniq"] == (4, 1, 0)  # (1,2) appears twice
    assert got["nn"] == (4, 1, 0)
    assert got["rng"] == (4, 1, 0)  # 60 out of range (nulls don't violate range)
    assert got["set"] == (4, 1, 0)  # fk=9
    assert got["fk"] == (4, 1, 0)  # fk=9 orphan


def test_pagerank_integer_recurrence(spark):
    from patterns_devkit_spark.operators.graph_algo import pagerank

    # chain 1 -> 2 -> 3 (node 3 dangling). Hand-rolled recurrence with
    # scale=1e6, damping=850 permille:
    #   it1: r=[150000, 1000000, 1000000]
    #   it2: r=[150000, 277500, 1000000]
    #   it3: r=[150000, 277500, 385875]
    edges = spark.createDataFrame([(1, 2, 1), (2, 3, 1)], "src long, dst long, w long")
    got = {r.node: r.rank_scaled for r in pagerank(edges, iterations=3).collect()}
    assert got == {1: 150000, 2: 277500, 3: 385875}


def test_diff_versions_keyed_and_fingerprint(engine):
    from patterns_devkit_spark.node.node import Table

    with engine.node_context("n", outputs={"out": "dv"}):
        tbl = Table("out", "w")
        tbl.init(schema={"id": "bigint", "v": "text"}, unique_on="id")
        tbl.upsert([{"id": 1, "v": "a"}, {"id": 2, "v": "b"}, {"id": 3, "v": "c"}])
        tbl.flush()
        v1 = tbl.get_active_version().version_id
        tbl.upsert([{"id": 2, "v": "B"}, {"id": 4, "v": "d"}])
        tbl.flush()
        v2 = tbl.get_active_version().version_id

        keyed = {(r.change, r.id) for r in tbl.diff_versions(v1, v2, key_cols=["id"]).collect()}
        assert keyed == {("updated", 2), ("added", 4)}

        fps = tbl.diff_versions(v1, v2).collect()
        changes = sorted((r.change, r.n) for r in fps)
        # row (2,'b') removed, rows (2,'B') and (4,'d') added
        assert changes == [("added", 1), ("added", 1), ("removed", 1)]


def test_clone_from_zero_copy_and_divergence(engine):
    import os

    from patterns_devkit_spark.node.node import Table

    with engine.node_context("n", outputs={"out": "src_t", "cl": "dst_t"}):
        src = Table("out", "w")
        src.init(schema={"id": "bigint", "v": "text"}, unique_on="id")
        src.upsert([{"id": 1, "v": "a"}, {"id": 2, "v": "b"}])
        src.flush()

        dst = Table("cl", "w")
        tv = dst.clone_from("src_t")
        assert tv is not None

        # zero-copy: hardlink mode — every cloned parquet file shares an
        # inode with source; reference mode — the clone is a pure
        # manifest of refs into src_t, nothing physically copied
        from conftest import REFERENCE_LINK_MODE

        src_v = engine.catalog.get_active_version("src_t")
        src_dir = engine.catalog.version_dir("src_t", src_v)
        dst_dir = engine.catalog.version_dir("dst_t", tv.version_id)
        if REFERENCE_LINK_MODE:
            refs = engine.catalog.get_manifest("dst_t", tv.version_id) or []
            assert refs and all(r.startswith(f"src_t/{src_v}/") for r in refs)
            phys = [
                fn for _r, _d, fs in os.walk(dst_dir) for fn in fs if fn.endswith(".parquet")
            ]
            assert not phys, "clone physically copied files in reference mode"
        else:
            linked = 0
            for root, _d, files in os.walk(dst_dir):
                for fn in files:
                    if fn.endswith(".parquet"):
                        rel = os.path.relpath(os.path.join(root, fn), dst_dir)
                        assert os.stat(os.path.join(src_dir, rel)).st_ino == os.stat(
                            os.path.join(root, fn)
                        ).st_ino
                        linked += 1
            assert linked > 0

        # same data, copied metadata (unique_on enables upsert on clone)
        assert sorted(r["id"] for r in dst.read()) == [1, 2]
        dst.upsert([{"id": 2, "v": "B"}, {"id": 3, "v": "c"}])
        dst.flush()
        assert sorted(r["id"] for r in dst.read()) == [1, 2, 3]
        # source unaffected by the clone's divergent write
        assert sorted(r["v"] for r in src.read()) == ["a", "b"]


def test_incremental_dedup_across_batches(engine):
    from patterns_devkit_spark.node.node import Table
    from patterns_devkit_spark.operators.dedup import incremental_dedup

    spark = engine.spark
    with engine.node_context("n", outputs={"out": "seen_fp"}):
        seen = Table("out", "w")
        seen.init(schema={"fingerprint": "text", "keep_id": "bigint"}, unique_on="fingerprint")

        b1 = spark.createDataFrame(
            [(1, "alpha beta"), (2, "alpha  BETA"), (3, "gamma")], "doc_id long, text string"
        )
        s1 = incremental_dedup(b1, seen)
        # intra-batch: 1 and 2 normalize identically -> min id wins
        assert sorted(r.doc_id for r in s1.collect()) == [1, 3]

        b2 = spark.createDataFrame(
            [(4, "ALPHA beta"), (5, "delta"), (6, "delta")], "doc_id long, text string"
        )
        s2 = incremental_dedup(b2, seen)
        # 4 is a dup of batch-1 history; 5/6 intra-dedup to 5
        assert sorted(r.doc_id for r in s2.collect()) == [5]

        # retry idempotence: replaying batch 2 yields nothing new
        s3 = incremental_dedup(b2, seen)
        assert s3.count() == 0
        assert seen.record_count == 3  # alpha-beta, gamma, delta


def test_tree_paths_pointer_jumping(spark):
    from patterns_devkit_spark.operators.graph_algo import tree_paths

    # forest: 1 -> 2 -> 3 -> 4 (chain, root 1), 10 (isolated root)
    nodes = spark.createDataFrame(
        [(1, None), (2, 1), (3, 2), (4, 3), (10, None)], "node long, parent long"
    )
    got = {r.node: (r.root, r.depth) for r in tree_paths(nodes, rounds=3).collect()}
    assert got == {1: (1, 0), 2: (1, 1), 3: (1, 2), 4: (1, 3), 10: (10, 0)}


def test_udtf_lateral_from_sql(engine):
    from patterns_devkit_spark.functions.registry import register_udtf

    register_udtf(engine, "split_sentences")
    out = engine.spark.sql(
        "SELECT t.id, s.sent_idx, s.sentence, s.n_chars "
        "FROM VALUES (1, 'Hello there. How are you? Fine!'), (2, 'One.') AS t(id, txt), "
        "LATERAL split_sentences(t.txt) s"
    ).collect()
    got = {(r.id, r.sent_idx): r.sentence for r in out}
    assert got[(1, 0)] == "Hello there."
    assert got[(1, 1)] == "How are you?"
    assert got[(1, 2)] == "Fine!"
    assert got[(2, 0)] == "One."
    assert all(r.n_chars == len(r.sentence) for r in out)


def test_grouped_agg_udaf_from_sql(engine):
    from patterns_devkit_spark.functions.registry import register_grouped_agg

    register_grouped_agg(engine, "iqr")
    rows = engine.spark.sql(
        "SELECT k, iqr(CAST(v AS DOUBLE)) AS spread FROM VALUES "
        "('a', 1.0), ('a', 2.0), ('a', 3.0), ('a', 4.0), ('a', 5.0), ('b', 10.0), ('b', 10.0) "
        "AS t(k, v) GROUP BY k ORDER BY k"
    ).collect()
    assert rows[0].spread == 2.0  # q75-q25 of 1..5
    assert rows[1].spread == 0.0


def test_apply_cdc_insert_update_delete(engine):
    from patterns_devkit_spark.node.node import Table

    with engine.node_context("n", outputs={"out": "cdc_t"}):
        tbl = Table("out", "w")
        tbl.init(schema={"id": "bigint", "v": "text"}, unique_on="id")
        tbl.upsert([{"id": 1, "v": "a"}, {"id": 2, "v": "b"}, {"id": 3, "v": "c"}])
        tbl.flush()

        tbl.apply_cdc(
            [
                {"id": 2, "v": "B2", "op": "U", "seq": 10},
                {"id": 2, "v": "B1", "op": "U", "seq": 5},   # older change loses
                {"id": 3, "v": None, "op": "D", "seq": 1},
                {"id": 4, "v": "d", "op": "I", "seq": 1},
            ],
            seq_col="seq",
        )
        got = {r["id"]: r["v"] for r in tbl.read()}
        assert got == {1: "a", 2: "B2", 4: "d"}  # 3 deleted, latest U wins

        # delete-then-reinsert within one batch: higher seq wins
        tbl.apply_cdc(
            [
                {"id": 4, "v": None, "op": "D", "seq": 1},
                {"id": 4, "v": "d2", "op": "I", "seq": 2},
            ],
            seq_col="seq",
        )
        got = {r["id"]: r["v"] for r in tbl.read()}
        assert got == {1: "a", 2: "B2", 4: "d2"}


def test_restore_old_version(engine):
    from patterns_devkit_spark.node.node import Table

    with engine.node_context("n", outputs={"out": "rst"}):
        tbl = Table("out", "w")
        tbl.init(schema={"id": "bigint", "v": "text"}, unique_on="id")
        tbl.upsert([{"id": 1, "v": "a"}])
        tbl.flush()
        v1 = tbl.get_active_version().version_id
        tbl.upsert([{"id": 1, "v": "CHANGED"}, {"id": 2, "v": "b"}])
        tbl.flush()
        assert sorted(r["v"] for r in tbl.read()) == ["CHANGED", "b"]

        tv = tbl.restore(v1)
        assert tv.version_id != v1  # restore is a NEW version
        assert [r["v"] for r in tbl.read()] == ["a"]
        # and the restore itself is undoable while retained
        import pytest as _pytest

        with _pytest.raises((ValueError, KeyError)):
            tbl.restore("nonexistent-version")
