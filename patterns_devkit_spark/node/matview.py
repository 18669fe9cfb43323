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

    # -- refresh ---------------------------------------------------------

    def _source_df(self) -> DataFrame | None:
        cat = self.engine.catalog
        src = self.spec["source"]
        av = cat.get_active_version(src)
        if av is None or not cat.version_has_data(src, av):
            return None
        ddl = (cat.table_meta(src) or {}).get("schema_ddl")
        reader = self.engine.spark.read
        if ddl:
            from pyspark.sql import types as T

            try:
                return reader.schema(T.StructType.fromDDL(ddl)).parquet(cat.version_dir(src, av))
            except Exception:
                pass
        return reader.option("mergeSchema", "true").parquet(cat.version_dir(src, av))

    def refresh(self, full: bool = False) -> int:
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

            out_cols = [*dims, *measures]
            fresh = partial.select(*out_cols)
            merged = fresh
            if not full and active is not None and cat.version_has_data(self.name, active):
                old = self.engine.spark.read.parquet(cat.version_dir(self.name, active))
                # full outer join on dims: untouched groups pass through
                # from the old side, new groups from the partial, touched
                # groups combine mergeably. The join input is O(|view| +
                # |delta groups|) — never the source.
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
            n_rows = self.engine.spark.read.parquet(out_dir).count()
            cat.set_record_count(self.name, vid, n_rows)
            cat.update_table_meta(
                self.name,
                schema_ddl=",".join(
                    f"{f.name} {f.dataType.simpleString()}"
                    for f in self.engine.spark.read.parquet(out_dir).schema.fields
                ),
            )
            # cursor rides the version: flip below makes (version, cursor)
            # visible atomically
            cat.set_matview_cursor(self.name, vid, new_cursor)
            cat.set_active_version(self.name, vid)
            cat.gc_versions(self.name)
            cat.append_event(self.name, "update", node_id=f"__mv__{self.name}")
            return n_delta
        finally:
            partial.unpersist()

    # -- read ------------------------------------------------------------

    def read_spark(self) -> DataFrame | None:
        cat = self.engine.catalog
        av = cat.get_active_version(self.name)
        if av is None or not cat.version_has_data(self.name, av):
            return None
        return self.engine.spark.read.parquet(cat.version_dir(self.name, av))
