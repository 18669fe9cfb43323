"""Incremental materialized views over append-only source tables.

The engine-side generalization of the incremental-ELT pattern the repo
ships as an example app (examples/incremental_sessions: stream-consume
-> additive upsert -> publish): declare dims + mergeable measures ONCE
and the engine derives the incremental merge — each refresh aggregates
only the source rows appended since the last refresh and folds the
partial into the stored aggregate. Reference parity: the devkit keeps
derived tables fresh by re-running SQL nodes over full inputs
(node.py:356-373 execute_sql + graph re-triggering); this is the
100 TB form, where a refresh costs O(delta + |view|), never a rescan
of the source.

Exactly-once: the applied-cursor is recorded PER MV VERSION in the
catalog and flipped atomically with the version pointer — a crash
between the version write and the flip leaves the previous (version,
cursor) pair active, so a re-run re-applies the same delta into a new
version instead of double-counting it into the current one.

Mergeability contract (why only sum/count/min/max): these fold under
INSERTs — sum/count by addition, min/max by least/greatest. Deletes or
updates on the source are NOT folded (min/max are not invertible);
`refresh(full=True)` recomputes from scratch for that case. avg is
derived: materialize sum + count and divide at read time.
"""
from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, functions as F

_ORD = "__mv_ord"
_CNT = "__mv_n"

_AGGS = ("sum", "count", "min", "max")


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
        for out, (agg, expr) in measures.items():
            if agg not in _AGGS:
                raise ValueError(f"measure {out!r}: unsupported aggregate {agg!r} (mergeable set: {_AGGS})")
            if out in dims:
                raise ValueError(f"measure {out!r} collides with a dim column")
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
        the single-source case. Source deletes/updates are not folded
        (refresh(full=True) is the escape hatch)."""
        for out, (agg, expr) in measures.items():
            if agg not in _AGGS:
                raise ValueError(f"measure {out!r}: unsupported aggregate {agg!r} (mergeable set: {_AGGS})")
            if out in dims:
                raise ValueError(f"measure {out!r} collides with a dim column")
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

    # -- refresh ---------------------------------------------------------

    def _table_df(self, table: str) -> DataFrame | None:
        """Current snapshot of a source table through the engine's read
        boundary (logical schema, column mapping applied)."""
        cat = self.engine.catalog
        av = cat.get_active_version(table)
        if av is None or not cat.version_has_data(table, av):
            return None
        from .node import TableVersion

        return TableVersion(self.engine, table, av).as_dataframe()

    def _source_df(self) -> DataFrame | None:
        return self._table_df(self.spec["source"])

    def refresh(self, full: bool = False) -> int:
        if self.spec.get("type") == "join":
            return self._refresh_join(full)
        return self._refresh_single(full)

    def _refresh_single(self, full: bool = False) -> int:
        """Fold source rows appended since the last refresh into the
        view; returns the number of delta rows applied (0 = no-op, no
        new version). ``full=True`` recomputes from the whole source
        (the escape hatch for source deletes/updates)."""
        cat = self.engine.catalog
        spec = self.spec
        src = self._source_df()
        if src is None:
            return 0
        ob, dims, measures = spec["order_by"], spec["dims"], spec["measures"]
        active = cat.get_active_version(self.name)
        cursor = None if (full or active is None) else cat.get_matview_cursor(self.name, active)

        delta = src
        if cursor is not None:
            delta = delta.filter(F.col(ob) > F.lit(cursor))
        if spec.get("where"):
            delta = delta.filter(F.expr(spec["where"]))

        partial = delta.groupBy(*dims).agg(
            *[_partial(agg, expr, out) for out, (agg, expr) in measures.items()],
            F.max(ob).alias(_ORD),
            F.count(F.lit(1)).alias(_CNT),
        )
        partial = partial.persist()
        try:
            stats = partial.agg(F.max(_ORD).alias("m"), F.sum(_CNT).alias("n")).collect()[0]
            n_delta = int(stats["n"] or 0)
            if n_delta == 0:
                return 0
            new_cursor = stats["m"]

            fresh = partial.select(*[*dims, *measures])
            self._fold_and_flip(fresh, dims, measures, full, active, new_cursor)
            return n_delta
        finally:
            partial.unpersist()

    def _fold_and_flip(self, fresh: DataFrame, dims, measures, full: bool, active, new_cursor) -> None:
        """Shared tail: mergeable full-outer fold of the delta partial
        into the stored aggregate, then the atomic (version, cursor)
        flip. The join input is O(|view| + |delta groups|) — never the
        source."""
        cat = self.engine.catalog
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
            )

        vid = cat.create_new_version(self.name)
        out_dir = cat.version_dir(self.name, vid)
        merged.write.mode("overwrite").parquet(out_dir)
        from . import manifest as _mf

        # Spark work (count, schema inference) BEFORE the commit batch;
        # then manifest/count/schema/cursor/flip/GC land in ONE catalog
        # commit — (version, cursor) atomicity now holds by transaction,
        # not just by flip ordering.
        n_rows = self.engine.spark.read.parquet(out_dir).count()
        ddl = ",".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in self.engine.spark.read.parquet(out_dir).schema.fields
        )
        with cat.commit_batch():
            _mf.record(cat, self.name, vid)  # MV versions are always own-dir
            cat.set_record_count(self.name, vid, n_rows)
            cat.update_table_meta(self.name, schema_ddl=ddl)
            cat.set_matview_cursor(self.name, vid, new_cursor)
            cat.set_active_version(self.name, vid)
            cat.gc_versions(self.name)
        cat.append_event(self.name, "update", node_id=f"__mv__{self.name}")

    def _refresh_join(self, full: bool = False) -> int:
        """IVM delta rule for a two-source join view:
        ΔM = ΔL ⋈ R_snapshot ∪ L_old ⋈ ΔR, folded mergeably. Each
        (l, r) pair is produced exactly once across all refreshes: the
        first term owns every pair whose L row is new (including
        ΔL x ΔR), the second term's L_old excludes ΔL. Snapshot
        consistency comes from reading ONE active version per source;
        the cursor pair {left: max(ob_l), right: max(ob_r)} rides the
        MV version, so a crash replays the same delta into a NEW
        version instead of double-counting (same exactly-once story as
        the single-source fold)."""
        cat = self.engine.catalog
        spec = self.spec
        left_df = self._table_df(spec["left"])
        right_df = self._table_df(spec["right"])
        if left_df is None or right_df is None:
            return 0
        ob_l = spec["order_by"][spec["left"]]
        ob_r = spec["order_by"][spec["right"]]
        dims, measures, on = spec["dims"], spec["measures"], spec["on"]
        active = cat.get_active_version(self.name)
        cursors = None if (full or active is None) else cat.get_matview_cursor(self.name, active)
        cl = (cursors or {}).get("left")
        cr = (cursors or {}).get("right")

        dl = left_df.filter(F.col(ob_l) > F.lit(cl)) if cl is not None else left_df
        dr = right_df.filter(F.col(ob_r) > F.lit(cr)) if cr is not None else right_df
        l_old = left_df.filter(F.col(ob_l) <= F.lit(cl)) if cl is not None else None

        # cursor advance covers UNMATCHED delta rows too: maxes come
        # from the source deltas, never from the joined pairs
        dstat = dl.agg(F.max(ob_l).alias("m"), F.count(F.lit(1)).alias("n")).collect()[0]
        rstat = dr.agg(F.max(ob_r).alias("m"), F.count(F.lit(1)).alias("n")).collect()[0]
        n_delta = int(dstat["n"] or 0) + int(rstat["n"] or 0)
        if n_delta == 0:
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
            *[_partial(agg, expr, out) for out, (agg, expr) in measures.items()]
        )
        self._fold_and_flip(fresh, dims, measures, full, active, new_cursor)
        return n_delta

    # -- read ------------------------------------------------------------

    def read_spark(self) -> DataFrame | None:
        cat = self.engine.catalog
        av = cat.get_active_version(self.name)
        if av is None or not cat.version_has_data(self.name, av):
            return None
        return self.engine.spark.read.parquet(cat.version_dir(self.name, av))
