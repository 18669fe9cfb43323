"""System (information_schema-style) views over the engine catalog.

The reference exposes warehouse introspection through its hosted API
(`patterns list`, CLI commands/list.py: graphs, nodes and their output
tables); a local engine wants the same observability as QUERYABLE
tables, the way every warehouse ships information_schema /
system.tables. These builders turn the catalog document into small
Spark DataFrames — O(tables + versions + cursors) rows, built on the
driver, never touching table data — so operational queries ("which
table grew", "where is each stream cursor", "what got GC'd") are just
SQL over `__sys_*` views, usable from read_sql / SQL nodes like any
other relation.
"""
from __future__ import annotations

import datetime as _dt

import os
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame

from .catalog import DEFAULT_RETENTION

if TYPE_CHECKING:  # pragma: no cover
    from ..node.node import Engine

_T = "table_name string, active_version string, n_versions long, record_count long, unique_on string, partition_by string, retention_keep long, has_declared_schema boolean"
_V = "table_name string, version_id string, is_active boolean, has_data boolean, record_count long, n_files long, n_bytes long, tags string, published_at string, n_masked_rows long"
_F = (
    "table_name string, version_id string, ref string, n_bytes long, "
    "is_carried boolean, n_masked_rows long, has_stats boolean"
)
_S = "node_id string, table_name string, order_by string, cursor string"
_E = "ts double, table_name string, kind string, node_id string"
_C = (
    "table_name string, version_id string, column string, n_rows long, "
    "n_nonnull long, ndv_approx long, min string, max string, analyzed_ts double"
)
_M = (
    "view_name string, source string, order_by string, dims string, "
    "measures string, where_clause string, active_version string, applied_cursor string, "
    "source_hwm string, stale boolean"
)


def _version_files(d: str) -> tuple[int, int]:
    n, total = 0, 0
    for root, _dirs, files in os.walk(d):
        for fn in files:
            if fn.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, fn))
    return n, total


def system_dataframes(engine: "Engine") -> dict[str, DataFrame]:
    """{view_name: DataFrame} for tables / versions / streams / events."""
    cat = engine.catalog
    spark = engine.spark

    t_rows, v_rows, f_rows = [], [], []
    for name in cat.table_names():
        meta = cat.table_meta(name) or {}
        active = meta.get("active_version")
        versions = meta.get("versions", [])
        counts = meta.get("record_counts", {})
        uo = meta.get("unique_on") or []
        pb = meta.get("partition_by") or []
        if isinstance(pb, str):
            pb = [pb]
        t_rows.append(
            (
                name,
                active,
                len(versions),
                counts.get(active),
                ",".join(uo) or None,
                ",".join(pb) or None,
                meta.get("retention_keep") or DEFAULT_RETENTION,
                bool(meta.get("schema_ddl")),
            )
        )
        for vid in versions:
            refs = (meta.get("manifests") or {}).get(vid)
            if refs is not None:
                # manifest version: census the real file set (refs may
                # point into other versions' dirs — node/manifest.py)
                troot = os.path.join(cat.root, "tables")
                nf, nb = len(refs), 0
                for ref in refs:
                    try:
                        nb += os.path.getsize(os.path.join(troot, ref))
                    except OSError:
                        pass
            else:
                d = cat.version_dir(name, vid)
                nf, nb = _version_files(d) if os.path.isdir(d) else (0, 0)
            vtags = ",".join(sorted(tg for tg, tv in (meta.get("tags") or {}).items() if tv == vid))
            pub = max(
                (ets for ets, ev in (meta.get("publish_log") or []) if ev == vid),
                default=None,
            )
            # round UP to the next whole microsecond: isoformat() would
            # otherwise truncate the float epoch, and parsing the
            # printed instant back (resolve_version AS-OF) could land
            # just BEFORE the stored publish time
            pub_iso = (
                None
                if pub is None
                else (
                    _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
                    + _dt.timedelta(microseconds=int(pub * 1_000_000) + 1)
                ).isoformat()
            )
            # deletion-vector observability: how many row images this
            # version masks (0 = clean; reads on masked versions pay a
            # broadcast anti-join of this many coordinates)
            n_dv = sum(len(ix) for ix in cat.get_deletion_vectors(name, vid).values())
            v_rows.append((name, vid, vid == active, nf > 0, counts.get(vid), nf, nb, vtags, pub_iso, n_dv))
            # per-file census (__sys_files — Iceberg 'files' metadata
            # table analogue): manifest refs when present, else the
            # legacy directory walk synthesized into own refs
            from ..node import manifest as _mf

            dvs_v = cat.get_deletion_vectors(name, vid)
            stats_v = cat.get_file_stats(name, vid) or {}
            file_refs = refs if refs is not None else [
                f"{name}/{vid}/{rel}"
                for rel in _mf.walk_version_files(cat.version_dir(name, vid))
            ]
            troot_f = os.path.join(cat.root, "tables")
            own_prefix = f"{name}/{vid}/"
            for ref in file_refs:
                try:
                    fb = os.path.getsize(os.path.join(troot_f, ref))
                except OSError:
                    fb = None
                skey = _mf.stats_key(ref, name, vid)
                f_rows.append(
                    (
                        name,
                        vid,
                        ref,
                        fb,
                        not ref.startswith(own_prefix),
                        len(dvs_v.get(ref) or ()),
                        skey in stats_v,
                    )
                )

    s_rows = [
        (node_id, table, order_by, None if val is None else str(val))
        for node_id, table, order_by, val in cat.cursors()
    ]

    events, _ = cat.read_events()
    e_rows = [(e.get("ts"), e.get("table"), e.get("kind"), e.get("node_id")) for e in events]

    c_rows = []
    for name in cat.table_names():
        meta = cat.table_meta(name) or {}
        for vid in meta.get("versions", []):
            st = cat.get_column_stats(name, vid)
            if not st:
                continue
            for col, s in (st.get("cols") or {}).items():
                c_rows.append(
                    (
                        name,
                        vid,
                        col,
                        st.get("rows"),
                        s.get("n_nonnull"),
                        s.get("ndv_approx"),
                        None if s.get("min") is None else str(s["min"]),
                        None if s.get("max") is None else str(s["max"]),
                        st.get("ts"),
                    )
                )

    m_rows = []
    for name in cat.matview_names():
        spec = cat.get_matview_spec(name) or {}
        active = cat.get_active_version(name)
        cur = cat.get_matview_cursor(name, active)
        # staleness from catalog metadata alone: the source's write-time
        # order HWM vs the applied cursor (no scan; None = unknown)
        if spec.get("type") == "join":
            # two-source join view: sources/orderings joined for display;
            # staleness = either source's HWM past its paired cursor
            src = f"{spec.get('left')}+{spec.get('right')}"
            ob_disp = ",".join(f"{k}:{v}" for k, v in (spec.get("order_by") or {}).items())
            stale = None
            for side, tbl in (("left", spec.get("left")), ("right", spec.get("right"))):
                t_active = cat.get_active_version(tbl) if tbl else None
                hwm_s = cat.get_order_hwm(tbl, t_active) if t_active else None
                c_s = (cur or {}).get(side) if isinstance(cur, dict) else None
                if hwm_s is not None:
                    try:
                        side_stale = c_s is None or hwm_s > c_s
                    except TypeError:
                        side_stale = None
                    stale = side_stale if stale is None else (stale or side_stale)
            hwm = None
        else:
            src = spec.get("source")
            ob_disp = spec.get("order_by")
            src_active = cat.get_active_version(src) if src else None
            hwm = cat.get_order_hwm(src, src_active) if src_active else None
            stale = None
            if hwm is not None:
                try:
                    stale = cur is None or hwm > cur
                except TypeError:
                    stale = None
        m_rows.append(
            (
                name,
                src,
                ob_disp,
                ",".join(spec.get("dims") or []),
                ",".join(f"{k}={a}({e})" for k, (a, e) in (spec.get("measures") or {}).items()),
                spec.get("where"),
                active,
                None if cur is None else str(cur),
                None if hwm is None else str(hwm),
                stale,
            )
        )

    vw_rows = [(n, cat.get_view(n)) for n in cat.view_names()]

    return {
        "__sys_views": spark.createDataFrame(vw_rows, "view_name string, sql string"),
        "__sys_matviews": spark.createDataFrame(m_rows, _M),
        "__sys_tables": spark.createDataFrame(t_rows, _T),
        "__sys_versions": spark.createDataFrame(v_rows, _V),
        "__sys_files": spark.createDataFrame(f_rows, _F),
        "__sys_streams": spark.createDataFrame(s_rows, _S),
        "__sys_events": spark.createDataFrame(e_rows, _E),
        "__sys_column_stats": spark.createDataFrame(c_rows, _C),
    }
