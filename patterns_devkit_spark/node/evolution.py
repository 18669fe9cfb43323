"""Zero-copy schema evolution — Iceberg/Delta-style column mapping
(engine extension; the reference's hosted schema editing surface is
closed, reference node.py:117-139 only documents declared schemas).

Contract: in-memory DataFrames ALWAYS carry LOGICAL column names;
parquet files at rest ALWAYS carry PHYSICAL names. ALTER operations
are metadata-only catalog updates — no file is ever rewritten by DDL:

- RENAME a->b keeps the physical name `a` in every file forever and
  re-points logical `b` at it (``colmap``).
- DROP hides the physical column (``dropped_cols``); readers simply
  never select it (schema projection doubles as column pruning).
- ADD extends the logical schema; files written before the ADD read
  the column as NULL, or as the declared NOT NULL DEFAULT
  (``column_defaults``, applied with coalesce at read — exact
  because a defaulted added column is declared non-null).
- Re-adding a previously used name allocates a FRESH physical name
  (``name__N``) so old at-rest data can never resurrect.

At 100 TB this is the only viable ALTER: a rename/drop/add touches
one catalog row, not 100 TB of parquet. The write boundary
(`Table._writer`) converts logical->physical so all files stay
uniformly physical; the read boundary (`TableVersion.as_dataframe`)
projects physical->logical.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def colmap(meta: dict) -> dict[str, str]:
    """logical -> physical (non-identity entries only)."""
    return dict(meta.get("colmap") or {})


def dropped_cols(meta: dict) -> list[str]:
    """Physical names hidden by DROP COLUMN (still present at rest)."""
    return list(meta.get("dropped_cols") or [])


def column_defaults(meta: dict) -> dict[str, str]:
    """logical -> SQL literal applied to rows stored before the ADD."""
    return dict(meta.get("column_defaults") or {})


def has_mapping(meta: dict) -> bool:
    """True when reads need a projection (rename/drop/default active)."""
    return bool(meta.get("colmap") or meta.get("column_defaults") or meta.get("dropped_cols"))


def physical_name(meta: dict, logical: str) -> str:
    return colmap(meta).get(logical, logical)


def physical_struct(meta: dict, logical: T.StructType) -> T.StructType:
    """The at-rest schema for the current logical schema: same fields,
    physical names. Dropped physicals are absent — reading with this
    struct prunes them at the parquet scan."""
    cm = colmap(meta)
    return T.StructType(
        [T.StructField(cm.get(f.name, f.name), f.dataType, True) for f in logical.fields]
    )


def to_physical(df: DataFrame, meta: dict) -> DataFrame:
    """Write-boundary conversion: rename logical columns to their
    physical names. Tolerant of already-physical input (maintenance
    rewrites): only columns present are renamed."""
    cm = colmap(meta)
    for logical, physical in cm.items():
        if logical in df.columns and physical not in df.columns:
            df = df.withColumnRenamed(logical, physical)
    return df


def to_logical_loose(df: DataFrame, meta: dict) -> DataFrame:
    """Inverse renames only (physical -> logical), keeping every other
    column — for staged/raw reads whose schema may be AHEAD of the
    catalog (write-audit-publish)."""
    for logical, physical in colmap(meta).items():
        if physical in df.columns and logical not in df.columns:
            df = df.withColumnRenamed(physical, logical)
    return df


def logical_projection(
    df: DataFrame, meta: dict, logical: T.StructType, extra: tuple = ()
) -> DataFrame:
    """Read-boundary projection: select every LOGICAL field from its
    physical column (NULL-filled when absent from the files, e.g. a
    merged-schema fallback read predating an ADD), applying declared
    defaults via coalesce. ``extra`` names pass-through columns (e.g.
    the row-provenance columns deletion vectors and DV deletes ride)."""
    cm = colmap(meta)
    dfl = column_defaults(meta)
    cols: list[Column] = []
    for f in logical.fields:
        ph = cm.get(f.name, f.name)
        c = F.col(ph) if ph in df.columns else F.lit(None).cast(f.dataType)
        if f.name in dfl:
            c = F.coalesce(c, F.expr(dfl[f.name]).cast(f.dataType))
        cols.append(c.alias(f.name))
    return df.select(*cols, *[F.col(e) for e in extra])


def protected_columns(meta: dict) -> set[str]:
    """Columns ALTER must not rename or drop: physical layout, merge
    keys, stream ordering, and skipping-index columns all reference
    them positionally in file paths / footers / catalog stats."""
    out: set[str] = set()
    for key in ("strictly_monotonic_ordering", "created_ordering", "add_monotonic_id", "add_created"):
        v = meta.get(key)
        if isinstance(v, str) and v:
            out.add(v)
    for key in ("partition_by", "cluster_by", "unique_on", "stat_columns", "bloom_columns"):
        out.update(meta.get(key) or [])
    return out


def used_physical_names(meta: dict, logical: T.StructType) -> set[str]:
    cm = colmap(meta)
    used = {cm.get(f.name, f.name) for f in logical.fields}
    used.update(dropped_cols(meta))
    return used


def fresh_physical_name(meta: dict, logical_schema: T.StructType, name: str) -> str:
    """A physical name for a newly added logical column that cannot
    collide with any live or dropped at-rest column."""
    used = used_physical_names(meta, logical_schema)
    if name not in used:
        return name
    k = 2
    while f"{name}__{k}" in used:
        k += 1
    return f"{name}__{k}"
