"""Incremental materialized views with lineage-aware refresh.

The engine-side generalization of the incremental-ELT pattern the repo
ships as an example app (examples/incremental_sessions: stream-consume
-> additive upsert -> publish): declare dims + mergeable measures ONCE
and the engine derives the incremental merge. Reference parity: the
devkit keeps derived tables fresh by re-running SQL nodes over full
inputs (node.py:356-373 execute_sql + graph re-triggering); this is
the 100 TB form, where a refresh costs O(delta + |view|) for appends
and O(change + |view|) for deletion-vector commits, never a rescan of
the source.

Exactly-once: the applied (cursor, source snapshot) pair is recorded
PER MV VERSION in the catalog and flipped atomically with the version
pointer — a crash between the version write and the flip leaves the
previous pair active, so a re-run re-applies the same delta into a new
version instead of double-counting it into the current one.

Refresh classifies the source window since the last fold (VERDICT r5
item 1 — the orchestrated path must never publish a stale aggregate
as fresh):

- **append-pure** (manifest of the applied snapshot still contained,
  no new deletion-vector entries on its files): fold only rows with
  ``order_by`` past the cursor — today's cheap path.
- **DV lineage with masked rows** (delete_where/update_where
  ``vectorized=True``, merge-on-read upserts): for invertible measure
  sets (sum/count only) apply a SIGNED fold — new-file images count
  +1, masked old images count -1 — still O(change), exactly equal to
  a recompute (hidden per-group support and per-sum non-null counters
  keep emptied groups and all-NULL sums exact). min/max cannot be
  inverted; those views full-recompute instead.
- **rewrite / compaction / truncate / schema change / GC'd window /
  legacy (pre-classification) version**: full recompute.

``refresh(full=True)`` remains the manual escape hatch and now also
CLEARS the view when every source row is gone (previously a stale
no-op). A grand-total view (no dims) over zero source rows is EMPTY,
not a single NULL row — consistent across fold and recompute.

Mergeability contract (why only sum/count/min/max): these fold under
INSERTs — sum/count by addition, min/max by least/greatest. avg is
derived: materialize sum + count and divide at read time.
"""
from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, functions as F

_ORD = "__mv_ord"
_CNT = "__mv_n"
_SUP = "__mv_support"

_AGGS = ("sum", "count", "min", "max")
_INVERTIBLE = ("sum", "count")


def _nn(out: str) -> str:
    """Hidden per-measure non-null counter for sum inversion: a group
    whose remaining rows all have NULL expr must read sum = NULL after
    a signed fold (0 would be wrong), exactly like a recompute."""
    return f"__mv_nn_{out}"


def _hidden_names(measures: dict) -> list[str]:
    return [_SUP] + [_nn(out) for out, (agg, _e) in measures.items() if agg == "sum"]


def _hidden_partials(measures: dict) -> list:
    cols = [F.count(F.lit(1)).alias(_SUP)]
    for out, (agg, expr) in measures.items():
        if agg == "sum":
            cols.append(F.count(F.expr(expr)).alias(_nn(out)))
    return cols


def _partial(agg: str, expr: str, out: str):
    if agg == "sum":
        return F.sum(F.expr(expr)).alias(out)
    if agg == "count":
        return (F.count(F.lit(1)) if expr in ("*", "", None) else F.count(F.expr(expr))).alias(out)
    if agg == "min":
        return F.min(F.expr(expr)).alias(out)
    if agg == "max":
        return F.max(F.expr(expr)).alias(out)
    raise ValueError(f"unsupported aggregate {agg!r} (mergeable set: {_AGGS})")


def _combine(agg: str, old, new):
    if agg in ("sum", "count"):
        zero = F.lit(0)
        return F.coalesce(old, zero) + F.coalesce(new, zero)
    # Spark's least/greatest skip NULLs, which is exactly merge semantics
    return F.least(old, new) if agg == "min" else F.greatest(old, new)


def _check_measures(dims: list[str], measures: dict) -> None:
    for out, (agg, expr) in measures.items():
        if agg not in _AGGS:
            raise ValueError(f"measure {out!r}: unsupported aggregate {agg!r} (mergeable set: {_AGGS})")
        if out in dims:
            raise ValueError(f"measure {out!r} collides with a dim column")
    for name in list(measures) + list(dims):
        if name.startswith("__mv"):
            raise ValueError(f"{name!r}: the __mv prefix is reserved for the view's bookkeeping columns")


class MaterializedView:
    """Handle over a catalog-registered incremental materialized view."""

    def __init__(self, engine, name: str):
        self.engine = engine
        self.name = name
        spec = engine.catalog.get_matview_spec(name)
        if spec is None:
            raise KeyError(f"no materialized view named {name!r}")
        self.spec = spec

    # -- creation --------------------------------------------------------

    @classmethod
    def create(
        cls,
        engine,
        name: str,
        source: str,
        order_by: str,
        dims: list[str],
        measures: dict[str, tuple[str, str]],
        where: str | None = None,
    ) -> "MaterializedView":
        """Register the view spec; the first refresh() materializes it.
        ``order_by`` must be monotonically increasing across source
        appends (add_monotonic_id / add_created orderings qualify) —
        the same strictly-greater cursor contract as Stream."""
        _check_measures(dims, measures)
        engine.catalog.set_matview_spec(
            name,
            {
                "source": source,
                "order_by": order_by,
                "dims": list(dims),
                "measures": {k: list(v) for k, v in measures.items()},
                "where": where,
            },
        )
        return cls(engine, name)

    @classmethod
    def create_join(
        cls,
        engine,
        name: str,
        left: str,
        right: str,
        on: list[str],
        order_by: dict[str, str],
        dims: list[str],
        measures: dict[str, tuple[str, str]],
        where: str | None = None,
    ) -> "MaterializedView":
        """Two-source incremental JOIN view (classic IVM delta rule):
        the view aggregates ``left JOIN right USING (on)``; each
        refresh applies  ΔL ⋈ R_snapshot  ∪  L_old ⋈ ΔR  — every new
        pair is produced exactly once (ΔL x ΔR pairs land in the first
        term; the second term's L_old excludes ΔL). ``order_by`` maps
        EACH source table to its strictly-monotonic append ordering;
        the pair of applied cursors rides the MV version exactly like
        the single-source case. Non-append commits on either source
        trigger a full recompute (the signed fold is single-source
        only)."""
        _check_measures(dims, measures)
        if set(order_by) != {left, right}:
            raise ValueError("order_by must map BOTH source tables to their append orderings")
        # where/measure expressions may reference an ordering column —
        # it is then carried through the join (ADVICE r3) — but only if
        # that is unambiguous: the SAME name ordering both sides cannot
        # be kept on both (AMBIGUOUS_REFERENCE on every refresh)
        referenced = " ".join([where or ""] + [expr for (_agg, expr) in measures.values()])
        if order_by[left] == order_by[right]:
            ob = order_by[left]
            if re.search(rf"\b{re.escape(ob)}\b", referenced):
                raise ValueError(
                    f"where/measures reference ordering column {ob!r}, which orders BOTH "
                    "sources — the reference would be ambiguous after the join; rename one "
                    "source's ordering column (e.g. add_monotonic_id with a distinct name)"
                )
        engine.catalog.set_matview_spec(
            name,
            {
                "type": "join",
                "left": left,
                "right": right,
                "on": list(on),
                "order_by": dict(order_by),
                "dims": list(dims),
                "measures": {k: list(v) for k, v in measures.items()},
                "where": where,
            },
        )
        return cls(engine, name)

    # -- source snapshots & window classification -------------------------

    def _capture_applied(self, table: str) -> dict | None:
        """Pin the source's (version, file list) BEFORE planning any
        read, and read exactly that list: a concurrent in-place append
        that lands mid-refresh is then neither folded nor recorded, so
        the next refresh classifies its files as new and folds them
        exactly once."""
        cat = self.engine.catalog
        av = cat.get_active_version(table)
        if av is None:
            return None
        refs = cat.get_manifest(table, av)
        # refs None (legacy un-manifested version) is meaningful: the
        # file set is unknown, so the next refresh cannot classify the
        # window and must recompute — never coerce to []
        return {"version": av, "refs": list(refs) if refs is not None else None}

    def _snapshot_df(self, table: str, rec: dict) -> DataFrame | None:
        """Mask-applied read of the captured snapshot (explicit file
        list through the manifest read path: logical projection +
        deletion vectors applied, basePath grouped per source dir)."""
        from .node import TableVersion, _dv_filter, _read_version_files

        cat = self.engine.catalog
        vid, refs = rec["version"], rec["refs"]
        if not cat.version_has_data(table, vid):
            return None
        if not refs:  # legacy un-manifested version: whole-version read
            return TableVersion(self.engine, table, vid).as_dataframe()
        dvs = cat.get_deletion_vectors(table, vid)
        df = _read_version_files(self.engine, table, vid, refs, with_meta=bool(dvs))
        return _dv_filter(self.engine, df, dvs) if dvs else df

    def _classify(self, table: str, mv_active: str, rec_now: dict | None):
        """('append' | 'invert' | 'full', window_meta) for the source
        window between the MV's applied snapshot and the freshly
        CAPTURED one (``rec_now``). Classification and the fold read
        the same captured file list, so what this refresh folds and
        what it records as applied agree even under concurrent
        in-place appends."""
        from .node import _dv_window_meta

        cat = self.engine.catalog
        rec = (cat.get_matview_applied(self.name, mv_active) or {}).get(table)
        if not rec or rec.get("version") is None or rec_now is None:
            return "full", None  # legacy/unknown lineage: correctness first
        v_now = rec_now["version"]
        refs_then = rec.get("refs")  # None = unknown file set → full
        win = (
            _dv_window_meta(
                self.engine,
                table,
                rec["version"],
                v_now,
                refs_a=list(refs_then),
                refs_b=rec_now.get("refs"),
            )
            if refs_then is not None
            else None
        )
        if win is None:
            return "full", None  # rewrite/compaction/truncate/schema change/GC
        if not win["gone_pairs"]:
            return "append", win
        if all(agg in _INVERTIBLE for (agg, _e) in self.spec["measures"].values()):
            return "invert", {**win, "v_then": rec["version"], "v_now": v_now}
        return "full", None  # min/max cannot be inverted

    # -- refresh ---------------------------------------------------------

    def refresh(self, full: bool = False) -> int:
        """Fold source changes since the last refresh into the view;
        returns the number of change rows applied (0 = no-op, no new
        version; a full refresh that only CLEARS the view returns 1).
        ``full=True`` forces the recompute; otherwise the source
        window is classified and the cheapest exact strategy runs."""
        if self.spec.get("type") == "join":
            return self._refresh_join(full)
        return self._refresh_single(full)

    def _refresh_single(self, full: bool = False) -> int:
        cat = self.engine.catalog
        spec = self.spec
        src_name = spec["source"]
        ob, dims, measures = spec["order_by"], spec["dims"], spec["measures"]
        active = cat.get_active_version(self.name)
        cursor = None if (full or active is None) else cat.get_matview_cursor(self.name, active)

        rec = self._capture_applied(src_name)
        applied = {src_name: rec} if rec else {}

        if not full and cursor is not None:
            mode, win = self._classify(src_name, active, rec)
            if mode == "full":
                return self._refresh_single(full=True)
            if mode == "invert":
                return self._invert_fold(win, cursor, active, applied)
            # mode == "append": the cursor fold below is exact

        src = self._snapshot_df(src_name, rec) if rec else None
        if src is None:
            if full and active is not None and cat.version_has_data(self.name, active):
                self._write_cleared(measures, active, applied)
                return 1
            return 0

        delta = src
        if cursor is not None:
            delta = delta.filter(F.col(ob) > F.lit(cursor))
        if spec.get("where"):
            delta = delta.filter(F.expr(spec["where"]))

        partial = delta.groupBy(*dims).agg(
            *[_partial(agg, expr, out) for out, (agg, expr) in measures.items()],
            *_hidden_partials(measures),
            F.max(ob).alias(_ORD),
            F.count(F.lit(1)).alias(_CNT),
        )
        partial = partial.persist()
        try:
            stats = partial.agg(F.max(_ORD).alias("m"), F.sum(_CNT).alias("n")).collect()[0]
            n_delta = int(stats["n"] or 0)
            if n_delta == 0:
                if full and active is not None and cat.version_has_data(self.name, active):
                    # every source row gone (or filtered): clear, don't stale
                    self._write_cleared(measures, active, applied)
                    return 1
                return 0
            new_cursor = stats["m"]

            fresh = partial.select(*[*dims, *measures, *_hidden_names(measures)])
            self._fold_and_flip(fresh, dims, measures, full, active, new_cursor, applied)
            return n_delta
        finally:
            partial.unpersist()

    def _invert_fold(self, win: dict, cursor, active, applied: dict) -> int:
        """Signed O(change) fold for a DV-lineage window: images in
        files ADDED since the applied snapshot enter +1 (mask-applied
        as of now — updated images may keep an order value below the
        cursor, so lineage, not the cursor, decides what is new);
        old images MASKED since then enter -1, restricted to rows the
        view had folded (order <= cursor). Carried files contribute
        nothing: under the capture discipline every row of a captured
        file at or below the cursor is already folded, and none sits
        above it (the cursor is the max order of the captured scan).
        The result equals a recompute exactly, including emptied
        groups (hidden support counter) and all-NULL sums (hidden
        non-null counters)."""
        from .node import _dv_filter, _read_version_files, _ref_idx_local_df

        cat = self.engine.catalog
        spec = self.spec
        src_name = spec["source"]
        ob, dims, measures = spec["order_by"], spec["dims"], spec["measures"]
        hidden = _hidden_names(measures)
        v_then, v_now = win["v_then"], win["v_now"]

        dv_now = cat.get_deletion_vectors(src_name, v_now)
        new_refs = win["new_refs"]
        plus = None
        if new_refs:
            plus = _read_version_files(self.engine, src_name, v_now, new_refs, with_meta=True)
            sub = {r: v for r, v in dv_now.items() if r in set(new_refs)}
            plus = _dv_filter(self.engine, plus, sub) if sub else plus.drop("__dv_ref", "__dv_idx")

        gone_pairs = win["gone_pairs"]
        refs_with_gone = sorted({r for r, _ in gone_pairs})
        minus = (
            _read_version_files(self.engine, src_name, v_then, refs_with_gone, with_meta=True)
            .join(
                F.broadcast(_ref_idx_local_df(self.engine.spark, gone_pairs)),
                ["__dv_ref", "__dv_idx"],
                "inner",
            )
            .drop("__dv_ref", "__dv_idx")
            # rows the view never folded (in-place appends past the
            # cursor that died inside the window) must not subtract
            .filter(F.col(ob) <= F.lit(cursor))
        )
        if spec.get("where"):
            minus = minus.filter(F.expr(spec["where"]))
            if plus is not None:
                plus = plus.filter(F.expr(spec["where"]))

        def _signed_partial(df: DataFrame, with_ord: bool) -> DataFrame:
            aggs = [
                *[_partial(agg, expr, out) for out, (agg, expr) in measures.items()],
                *_hidden_partials(measures),
                F.count(F.lit(1)).alias(_CNT),
            ]
            if with_ord:
                aggs.append(F.max(ob).alias(_ORD))
            return df.groupBy(*dims).agg(*aggs)

        p_plus = _signed_partial(plus, True).persist() if plus is not None else None
        p_minus = _signed_partial(minus, False).persist()
        try:
            n_plus, plus_max = 0, None
            if p_plus is not None:
                st = p_plus.agg(F.sum(_CNT).alias("n"), F.max(_ORD).alias("m")).collect()[0]
                n_plus, plus_max = int(st["n"] or 0), st["m"]
            n_minus = int(p_minus.agg(F.sum(_CNT).alias("n")).collect()[0]["n"] or 0)
            if n_plus + n_minus == 0:
                return 0
            new_cursor = cursor if plus_max is None else max(cursor, plus_max)

            signed_cols = list(measures) + hidden
            if p_plus is None:
                delta = p_minus.select(
                    *dims, *[(-F.coalesce(F.col(c), F.lit(0))).alias(c) for c in signed_cols]
                )
            else:
                pp, mm = p_plus.alias("p"), p_minus.alias("m")
                cond = [pp[d].eqNullSafe(mm[d]) for d in dims] if dims else [F.lit(True)]
                delta = pp.join(mm, on=cond, how="full_outer").select(
                    *[F.coalesce(pp[d], mm[d]).alias(d) for d in dims],
                    *[
                        (F.coalesce(pp[c], F.lit(0)) - F.coalesce(mm[c], F.lit(0))).alias(c)
                        for c in signed_cols
                    ],
                )
            self._fold_and_flip(delta, dims, measures, False, active, new_cursor, applied)
            return n_plus + n_minus
        finally:
            p_minus.unpersist()
            if p_plus is not None:
                p_plus.unpersist()

    def _write_cleared(self, measures: dict, active, applied: dict) -> None:
        """Flip to an EMPTY view version (every source row deleted or
        filtered): schema preserved, hidden bookkeeping normalized."""
        cat = self.engine.catalog
        old = self.engine.spark.read.parquet(cat.version_dir(self.name, active)).limit(0)
        for h in _hidden_names(measures):
            if h not in old.columns:
                old = old.withColumn(h, F.lit(None).cast("long"))
        self._flip(old, None, applied)

    def _fold_and_flip(
        self, fresh: DataFrame, dims, measures, full: bool, active, new_cursor, applied: dict
    ) -> None:
        """Shared tail: mergeable full-outer fold of the (possibly
        signed) delta partial into the stored aggregate, then the
        atomic (version, cursor, applied-snapshot) flip. The join
        input is O(|view| + |delta groups|) — never the source."""
        cat = self.engine.catalog
        hidden = _hidden_names(measures)
        merged = fresh
        if not full and active is not None and cat.version_has_data(self.name, active):
            old = self.engine.spark.read.parquet(cat.version_dir(self.name, active))
            # full outer join on dims: untouched groups pass through
            # from the old side, new groups from the partial, touched
            # groups combine mergeably.
            o, p = old.alias("o"), fresh.alias("p")
            # grand-total views (no dims) are a 1x1 full outer join
            cond = [o[d].eqNullSafe(p[d]) for d in dims] if dims else [F.lit(True)]
            joined = o.join(p, on=cond, how="full_outer")
            merged = joined.select(
                *[F.coalesce(o[d], p[d]).alias(d) for d in dims],
                *[_combine(measures[c][0], o[c], p[c]).alias(c) for c in measures],
                *[
                    (F.coalesce(o[h], F.lit(0)) + F.coalesce(p[h], F.lit(0))).alias(h)
                    for h in hidden
                ],
            )
        # groups whose rows are all gone disappear, like a recompute
        merged = merged.filter(F.col(_SUP) > 0)
        # sums whose surviving rows are all NULL read NULL, not 0
        merged = merged.select(
            *dims,
            *[
                (
                    F.when(F.col(_nn(c)) <= 0, F.lit(None)).otherwise(F.col(c)).alias(c)
                    if measures[c][0] == "sum"
                    else F.col(c)
                )
                for c in measures
            ],
            *hidden,
        )
        self._flip(merged, new_cursor, applied)

    def _flip(self, merged: DataFrame, new_cursor, applied: dict) -> None:
        cat = self.engine.catalog
        vid = cat.create_new_version(self.name)
        out_dir = cat.version_dir(self.name, vid)
        merged.write.mode("overwrite").parquet(out_dir)
        from . import manifest as _mf

        # Spark work (count, schema inference) BEFORE the commit batch;
        # then manifest/count/schema/cursor/applied/flip/GC land in ONE
        # catalog commit — (version, cursor, snapshot) atomicity holds
        # by transaction, not just by flip ordering.
        n_rows = self.engine.spark.read.parquet(out_dir).count()
        ddl = ",".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in self.engine.spark.read.parquet(out_dir).schema.fields
        )
        with cat.commit_batch():
            _mf.record(cat, self.name, vid)  # MV versions are always own-dir
            cat.set_record_count(self.name, vid, n_rows)
            # hidden_columns: the support/non-null counters are stored
            # bookkeeping, NOT the view's read contract — generic read
            # paths (read_spark / SQL views) project them out
            # (node.py _drop_hidden)
            cat.update_table_meta(
                self.name,
                schema_ddl=ddl,
                hidden_columns=_hidden_names(self.spec.get("measures") or {}),
            )
            cat.set_matview_cursor(self.name, vid, new_cursor)
            cat.set_matview_applied(self.name, vid, applied)
            cat.set_active_version(self.name, vid)
            cat.gc_versions(self.name)
        cat.append_event(self.name, "update", node_id=f"__mv__{self.name}")

    def _refresh_join(self, full: bool = False) -> int:
        """IVM delta rule for a two-source join view:
        ΔM = ΔL ⋈ R_snapshot ∪ L_old ⋈ ΔR, folded mergeably. Each
        (l, r) pair is produced exactly once across all refreshes: the
        first term owns every pair whose L row is new (including
        ΔL x ΔR), the second term's L_old excludes ΔL. Snapshot
        consistency comes from the captured (version, files) pair per
        source; the cursor pair {left: max(ob_l), right: max(ob_r)}
        rides the MV version, so a crash replays the same delta into a
        NEW version instead of double-counting. A non-append commit on
        EITHER source (delete/update/rewrite/MoR upsert) triggers the
        full recompute — the signed fold is single-source only."""
        cat = self.engine.catalog
        spec = self.spec
        l_name, r_name = spec["left"], spec["right"]
        ob_l = spec["order_by"][l_name]
        ob_r = spec["order_by"][r_name]
        dims, measures, on = spec["dims"], spec["measures"], spec["on"]
        active = cat.get_active_version(self.name)
        cursors = None if (full or active is None) else cat.get_matview_cursor(self.name, active)
        cl = (cursors or {}).get("left")
        cr = (cursors or {}).get("right")

        rec_l = self._capture_applied(l_name)
        rec_r = self._capture_applied(r_name)
        applied = {k: v for k, v in ((l_name, rec_l), (r_name, rec_r)) if v}

        if not full and cursors is not None:
            for name_, rec_ in ((l_name, rec_l), (r_name, rec_r)):
                mode, _win = self._classify(name_, active, rec_)
                if mode != "append":  # invert is single-source only
                    return self._refresh_join(full=True)

        left_df = self._snapshot_df(l_name, rec_l) if rec_l else None
        right_df = self._snapshot_df(r_name, rec_r) if rec_r else None
        if left_df is None or right_df is None:
            if full and active is not None and cat.version_has_data(self.name, active):
                self._write_cleared(measures, active, applied)
                return 1
            return 0

        dl = left_df.filter(F.col(ob_l) > F.lit(cl)) if cl is not None else left_df
        dr = right_df.filter(F.col(ob_r) > F.lit(cr)) if cr is not None else right_df
        l_old = left_df.filter(F.col(ob_l) <= F.lit(cl)) if cl is not None else None

        # cursor advance covers UNMATCHED delta rows too: maxes come
        # from the source deltas, never from the joined pairs
        dstat = dl.agg(F.max(ob_l).alias("m"), F.count(F.lit(1)).alias("n")).collect()[0]
        rstat = dr.agg(F.max(ob_r).alias("m"), F.count(F.lit(1)).alias("n")).collect()[0]
        n_delta = int(dstat["n"] or 0) + int(rstat["n"] or 0)
        if n_delta == 0:
            if full and active is not None and cat.version_has_data(self.name, active):
                self._write_cleared(measures, active, applied)
                return 1
            return 0
        new_cursor = {
            "left": dstat["m"] if dstat["m"] is not None else cl,
            "right": rstat["m"] if rstat["m"] is not None else cr,
        }

        # order columns have done their job (delta slicing + cursor
        # maxes); drop them before pairing so identically named
        # orderings on both sides (e.g. add_monotonic_id on each) don't
        # collide in the join output — UNLESS the where filter or a
        # measure expression references them (ADVICE r3: dropping a
        # referenced ordering column made every refresh raise
        # AnalysisException). Other shared non-join column names are
        # the caller's contract to avoid.
        keep = set(dims) | set(on)
        referenced = " ".join(
            [spec.get("where") or ""] + [expr for (_agg, expr) in measures.values()]
        )
        if ob_l != ob_r:  # same-name-on-both-sides is rejected in create_join
            for ob in (ob_l, ob_r):
                if re.search(rf"\b{re.escape(ob)}\b", referenced):
                    keep.add(ob)

        def _strip(df, ob):
            return df.drop(ob) if (ob in df.columns and ob not in keep) else df

        pairs = _strip(dl, ob_l).join(_strip(right_df, ob_r), on=on)
        if l_old is not None:
            pairs = pairs.unionByName(_strip(l_old, ob_l).join(_strip(dr, ob_r), on=on))
        if spec.get("where"):
            pairs = pairs.filter(F.expr(spec["where"]))

        fresh = pairs.groupBy(*dims).agg(
            *[_partial(agg, expr, out) for out, (agg, expr) in measures.items()],
            *_hidden_partials(measures),
        )
        self._fold_and_flip(fresh, dims, measures, full, active, new_cursor, applied)
        return n_delta

    # -- read ------------------------------------------------------------

    def read_spark(self) -> DataFrame | None:
        cat = self.engine.catalog
        av = cat.get_active_version(self.name)
        if av is None or not cat.version_has_data(self.name, av):
            return None
        df = self.engine.spark.read.parquet(cat.version_dir(self.name, av))
        return df.drop(*[c for c in df.columns if c.startswith("__mv_")])
