"""Lineage-aware MV refresh (VERDICT r5 #1): refresh() classifies the
source window since the applied snapshot and never silently serves a
stale aggregate — append-pure windows fold the cursor delta,
deletion-vector commits take a signed O(change) fold for invertible
measure sets (sum/count), and everything else (rewrite DELETE/UPDATE,
compaction, truncate, min/max measures, legacy versions) triggers the
full recompute automatically. The law in every test: after refresh(),
the view equals a from-scratch recompute of the current source."""
import pytest

from patterns_devkit_spark import MaterializedView, Table


def _append(engine, store, rows, **init):
    with engine.node_context("w", outputs={"out": store}):
        t = Table("out", "w")
        t.init(add_monotonic_id="mid", **init)
        t.append(rows)
        t.flush()


def _mv_rows(mv):
    df = mv.read_spark()
    return sorted(tuple(r) for r in df.collect()) if df is not None else []


def _spy(monkeypatch):
    """Count which refresh strategies actually ran."""
    calls = {"invert": 0, "full": 0}
    orig_invert = MaterializedView._invert_fold
    orig_single = MaterializedView._refresh_single

    def inv(self, *a, **k):
        calls["invert"] += 1
        return orig_invert(self, *a, **k)

    def single(self, full=False):
        if full:
            calls["full"] += 1
        return orig_single(self, full)

    monkeypatch.setattr(MaterializedView, "_invert_fold", inv)
    monkeypatch.setattr(MaterializedView, "_refresh_single", single)
    return calls


def test_refresh_recomputes_after_rewrite_delete(engine, monkeypatch):
    """A classic (rewriting) DELETE breaks file containment: plain
    refresh() must detect it and recompute — the r5 'stale until
    refresh(full=True)' behavior was the defect."""
    _append(engine, "lin1", [{"g": "a", "v": 2}, {"g": "a", "v": 3}, {"g": "b", "v": 7}])
    mv = engine.create_materialized_view(
        "lin1_mv", source="lin1", order_by="mid", dims=["g"], measures={"t": ("sum", "v")},
    )
    mv.refresh()
    calls = _spy(monkeypatch)
    with engine.node_context("w", outputs={"out": "lin1"}):
        Table("out", "w").delete_where("v = 3")
    assert mv.refresh() > 0
    assert calls["full"] == 1 and calls["invert"] == 0
    assert _mv_rows(mv) == [("a", 2), ("b", 7)]
    # and the next refresh is a clean no-op (applied snapshot advanced)
    assert mv.refresh() == 0


def test_refresh_inverts_dv_delete(engine, monkeypatch):
    """delete_where(vectorized=True) is DV lineage: the signed fold
    applies the masked old images as -1, never rescanning the source."""
    _append(engine, "lin2", [{"g": "a", "v": 2}, {"g": "a", "v": 3}, {"g": "b", "v": 7}])
    mv = engine.create_materialized_view(
        "lin2_mv", source="lin2", order_by="mid", dims=["g"],
        measures={"t": ("sum", "v"), "n": ("count", "*")},
    )
    mv.refresh()
    calls = _spy(monkeypatch)
    with engine.node_context("w", outputs={"out": "lin2"}):
        assert Table("out", "w").delete_where("v = 3", vectorized=True) == 1
    assert mv.refresh() == 1  # one masked image applied
    assert calls["invert"] == 1 and calls["full"] == 0
    assert _mv_rows(mv) == [("a", 2, 1), ("b", 7, 1)]
    assert mv.refresh() == 0


def test_refresh_inverts_dv_update(engine, monkeypatch):
    _append(engine, "lin3", [{"g": "a", "v": 2}, {"g": "b", "v": 7}])
    mv = engine.create_materialized_view(
        "lin3_mv", source="lin3", order_by="mid", dims=["g"],
        measures={"t": ("sum", "v"), "n": ("count", "*")},
    )
    mv.refresh()
    calls = _spy(monkeypatch)
    with engine.node_context("w", outputs={"out": "lin3"}):
        assert Table("out", "w").update_where({"v": "v + 100"}, "g = 'a'", vectorized=True) == 1
    # old image -1, new image +1 (note: the updated image keeps its
    # mid BELOW the cursor — lineage, not the cursor, finds it)
    assert mv.refresh() == 2
    assert calls["invert"] == 1 and calls["full"] == 0
    assert _mv_rows(mv) == [("a", 102, 1), ("b", 7, 1)]


def test_refresh_inverts_mor_upsert(engine, monkeypatch):
    with engine.node_context("w", outputs={"out": "lin4"}):
        t = Table("out", "w")
        t.init(unique_on=["id"], add_monotonic_id="mid", merge_on_read=True)
        t.append([{"id": 1, "g": "a", "v": 2}, {"id": 2, "g": "b", "v": 7}])
        t.flush()
    mv = engine.create_materialized_view(
        "lin4_mv", source="lin4", order_by="mid", dims=["g"],
        measures={"t": ("sum", "v"), "n": ("count", "*")},
    )
    mv.refresh()
    calls = _spy(monkeypatch)
    with engine.node_context("w", outputs={"out": "lin4"}):
        t = Table("out", "w")
        t.upsert([{"id": 1, "g": "a", "v": 50}, {"id": 3, "g": "c", "v": 9}])
        t.flush()
    assert mv.refresh() == 3  # masked old image + 2 new images
    assert calls["invert"] == 1 and calls["full"] == 0
    assert _mv_rows(mv) == [("a", 50, 1), ("b", 7, 1), ("c", 9, 1)]
    assert mv.refresh() == 0


def test_minmax_measures_force_recompute_on_dv_delete(engine, monkeypatch):
    """min/max cannot be inverted: a DV delete must recompute, and the
    result must equal the recompute (the max may DROP)."""
    _append(engine, "lin5", [{"g": "a", "v": 2}, {"g": "a", "v": 9}])
    mv = engine.create_materialized_view(
        "lin5_mv", source="lin5", order_by="mid", dims=["g"], measures={"mx": ("max", "v")},
    )
    mv.refresh()
    calls = _spy(monkeypatch)
    with engine.node_context("w", outputs={"out": "lin5"}):
        Table("out", "w").delete_where("v = 9", vectorized=True)
    assert mv.refresh() > 0
    assert calls["full"] == 1 and calls["invert"] == 0
    assert _mv_rows(mv) == [("a", 2)]


def test_emptied_group_disappears(engine):
    """A group whose source rows are all masked must vanish from the
    view — exactly like a recompute (hidden support counter)."""
    _append(engine, "lin6", [{"g": "a", "v": 1}, {"g": "b", "v": 5}, {"g": "b", "v": 6}])
    mv = engine.create_materialized_view(
        "lin6_mv", source="lin6", order_by="mid", dims=["g"],
        measures={"t": ("sum", "v"), "n": ("count", "*")},
    )
    mv.refresh()
    with engine.node_context("w", outputs={"out": "lin6"}):
        Table("out", "w").delete_where("g = 'b'", vectorized=True)
    mv.refresh()
    assert _mv_rows(mv) == [("a", 1, 1)]


def test_all_null_sum_reads_null_after_invert(engine):
    """Sum over a group whose surviving rows all have NULL expr must
    read NULL after the signed fold (0 would differ from a recompute):
    the hidden per-measure non-null counter decides."""
    _append(engine, "lin7", [{"g": "a", "v": 5}, {"g": "a", "v": None}])
    mv = engine.create_materialized_view(
        "lin7_mv", source="lin7", order_by="mid", dims=["g"],
        measures={"t": ("sum", "v"), "n": ("count", "*")},
    )
    mv.refresh()
    assert _mv_rows(mv) == [("a", 5, 2)]
    with engine.node_context("w", outputs={"out": "lin7"}):
        assert Table("out", "w").delete_where("v = 5", vectorized=True) == 1
    mv.refresh()
    assert _mv_rows(mv) == [("a", None, 1)]


def test_full_refresh_clears_view_when_source_emptied(engine):
    """The r5 escape hatch had a hole: with every source row deleted,
    refresh(full=True) early-returned 0 and left the view stale. Both
    the manual hatch and the auto-classified path must CLEAR it."""
    _append(engine, "lin8", [{"g": "a", "v": 1}])
    mv = engine.create_materialized_view(
        "lin8_mv", source="lin8", order_by="mid", dims=["g"], measures={"t": ("sum", "v")},
    )
    mv.refresh()
    with engine.node_context("w", outputs={"out": "lin8"}):
        Table("out", "w").delete_where("true")
    assert mv.refresh() == 1  # auto-classified rewrite -> cleared
    assert _mv_rows(mv) == []
    assert mv.refresh() == 0  # and stays a no-op


def test_truncate_source_forces_recompute(engine):
    """truncate() destructively REPLACES a published version's files in
    place — the one same-version mutation that is not an append; the
    captured-manifest containment check catches it."""
    _append(engine, "lin9", [{"g": "a", "v": 1}, {"g": "b", "v": 2}])
    mv = engine.create_materialized_view(
        "lin9_mv", source="lin9", order_by="mid", dims=["g"], measures={"t": ("sum", "v")},
    )
    mv.refresh()
    with engine.node_context("w", outputs={"out": "lin9"}):
        Table("out", "w").truncate()
    mv.refresh()
    assert _mv_rows(mv) == []


def test_append_after_invert_stays_cheap(engine, monkeypatch):
    """After a signed fold the applied snapshot advances: a subsequent
    plain append folds through the cursor path (no invert, no full)."""
    _append(engine, "lin10", [{"g": "a", "v": 1}])
    mv = engine.create_materialized_view(
        "lin10_mv", source="lin10", order_by="mid", dims=["g"],
        measures={"t": ("sum", "v"), "n": ("count", "*")},
    )
    mv.refresh()
    with engine.node_context("w", outputs={"out": "lin10"}):
        Table("out", "w").delete_where("v = 1", vectorized=True)
    mv.refresh()
    calls = _spy(monkeypatch)
    _append(engine, "lin10", [{"g": "a", "v": 10}, {"g": "c", "v": 3}])
    assert mv.refresh() == 2
    assert calls["invert"] == 0 and calls["full"] == 0
    assert _mv_rows(mv) == [("a", 10, 1), ("c", 3, 1)]


def test_exactly_once_invert_crash_replay(engine):
    """Crash simulation around a signed fold: flipping the MV pointer
    back re-applies the SAME change window against the old (cursor,
    snapshot) pair — never double-subtracting."""
    _append(engine, "lin11", [{"g": "a", "v": 2}, {"g": "a", "v": 3}])
    mv = engine.create_materialized_view(
        "lin11_mv", source="lin11", order_by="mid", dims=["g"],
        measures={"t": ("sum", "v"), "n": ("count", "*")},
    )
    mv.refresh()
    v1 = engine.catalog.get_active_version("lin11_mv")
    with engine.node_context("w", outputs={"out": "lin11"}):
        Table("out", "w").delete_where("v = 3", vectorized=True)
    mv.refresh()
    assert _mv_rows(mv) == [("a", 2, 1)]
    # crash: the new flip never landed
    engine.catalog.set_active_version("lin11_mv", v1)
    assert mv.refresh() == 1  # same masked image re-applied, once
    assert _mv_rows(mv) == [("a", 2, 1)]


def test_join_mv_recomputes_on_source_delete(engine):
    _append(engine, "jl", [{"k": 1, "g": "a", "lv": 2}, {"k": 2, "g": "b", "lv": 3}])
    with engine.node_context("w", outputs={"out": "jr"}):
        t = Table("out", "w")
        t.init(add_monotonic_id="rid")
        t.append([{"k": 1, "rv": 10}, {"k": 2, "rv": 20}])
        t.flush()
    mv = engine.create_materialized_join_view(
        "jmv", left="jl", right="jr", on=["k"],
        order_by={"jl": "mid", "jr": "rid"}, dims=["g"],
        measures={"t": ("sum", "lv * rv")},
    )
    mv.refresh()
    assert _mv_rows(mv) == [("a", 20), ("b", 60)]
    with engine.node_context("w", outputs={"out": "jl"}):
        Table("out", "w").delete_where("k = 2", vectorized=True)
    mv.refresh()
    assert _mv_rows(mv) == [("a", 20)]


def test_runner_never_serves_stale_aggregate(engine, tmp_path):
    """The orchestrated path that motivated the fix: run_all
    auto-refreshes after ANY source commit — a DELETE event must leave
    the MV equal to a recompute, and its downstream consumer must see
    the corrected aggregate."""
    import textwrap

    from pyspark.sql import functions as F

    from patterns_devkit_spark.graph.runner import GraphRunner

    (tmp_path / "graph.yml").write_text(
        textwrap.dedent(
            """
            functions:
              - node_file: gen.py
                id: gen00001
                outputs: {out: rsrc}
              - node_file: pub.py
                id: pub00001
                inputs: {in: ragg}
                outputs: {out: rpub}
            stores:
              - table: rsrc
              - table: ragg
              - table: rpub
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
        "ragg", source="rsrc", order_by="mid", dims=["g"],
        measures={"t": ("sum", "v"), "n": ("count", "*")},
    )
    GraphRunner(engine, str(tmp_path)).run_all()
    mv = engine.materialized_view("ragg")
    assert _mv_rows(mv) == [("a", 3, 2), ("b", 5, 1)]

    # a source DELETE lands while a live orchestrator is watching
    # (runners consume the event backlog at construction)
    runner = GraphRunner(engine, str(tmp_path))
    with engine.node_context("del", outputs={"out": "rsrc"}):
        Table("out", "w").delete_where("v = 2", vectorized=True)
    runner.run_all(include_sources=False)
    # the law: MV equals a from-scratch recompute of the live source
    with engine.node_context("chk", inputs={"in": "rsrc"}):
        src = Table("in", "r").read_spark()
    expect = sorted(
        tuple(r)
        for r in src.groupBy("g")
        .agg(F.sum("v").alias("t"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert _mv_rows(mv) == expect == [("a", 1, 1), ("b", 5, 1)]
    # and the MV's own update event re-triggered the publisher
    with engine.node_context("chk2", inputs={"in": "rpub"}):
        pub = sorted((r["g"], r["t"], r["n"]) for r in Table("in", "r").read())
    assert pub == [("a", 1, 1), ("b", 5, 1)]


def test_reserved_prefix_rejected(engine):
    with pytest.raises(ValueError, match="__mv"):
        engine.create_materialized_view(
            "badmv", source="x", order_by="mid", dims=["g"],
            measures={"__mv_support": ("sum", "v")},
        )


def test_mv_hidden_columns_invisible_to_generic_reads(engine):
    """Review r6: the support/non-null counters are stored bookkeeping,
    not the view's contract — engine.sql over {{ mv }}, Table.read_spark,
    and Table.read must all serve only the declared columns, while the
    fold keeps using them internally (version-dir reads)."""
    from patterns_devkit_spark import Table

    with engine.node_context("n", outputs={"out": "hsrc"}):
        t = Table("out", "w")
        t.init()
        t.append([{"grp": "a", "amt": 1, "mid": 1}, {"grp": "b", "amt": 2, "mid": 2}])
        t.flush()
    mv = engine.create_materialized_view(
        "hsrc_mv", source="hsrc", order_by="mid", dims=["grp"], measures={"t": ("sum", "amt")}
    )
    mv.refresh()
    assert engine.sql("SELECT * FROM {{ hsrc_mv }}").columns == ["grp", "t"]
    with engine.node_context("r", inputs={"in": "hsrc_mv"}):
        tr = Table("in", "r")
        assert tr.read_spark().columns == ["grp", "t"]
        assert all(set(r) == {"grp", "t"} for r in tr.read())
    # the hidden columns still exist physically and keep the fold exact
    with engine.node_context("n", outputs={"out": "hsrc"}):
        Table("out", "w").append([{"grp": "a", "amt": 10, "mid": 3}])
        Table("out", "w").flush()
    mv.refresh()
    assert sorted((r["grp"], r["t"]) for r in mv.read_spark().collect()) == [("a", 11), ("b", 2)]
