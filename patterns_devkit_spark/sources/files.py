"""File import sources: land external files as versioned engine tables.

The reference has no client-side file connectors (storage is an opaque
SQL DB; external systems are reached from Python nodes via Connection
credentials — reference node.py:96-99,508-510). Ours are Spark native:
parquet/csv/json/text/binaryFile readers feeding Table.append /
write_dataframe_as_new_version, so imports get versioning + events for
free and the scan parallelism is Spark's.
"""
from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from ..node.node import Engine, Table

_FORMATS = {"parquet", "csv", "json", "text", "binaryFile", "orc"}


def read_files(engine: Engine, path: str, format: str = "parquet", **options: Any) -> DataFrame:
    if format not in _FORMATS:
        raise ValueError(f"unsupported format {format!r} (one of {sorted(_FORMATS)})")
    reader = engine.spark.read.format(format)
    if format == "csv":
        options.setdefault("header", "true")
        options.setdefault("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def import_files(
    engine: Engine,
    store: str,
    path: str,
    format: str = "parquet",
    mode: str = "replace",
    node_id: str = "import",
    **options: Any,
) -> int:
    """Import files into an engine table as a new version (replace) or
    an append to the active version. Returns the imported row count."""
    df = read_files(engine, path, format, **options)
    with engine.node_context(node_id, outputs={"out": store}):
        tbl = Table("out", "w")
        if mode == "replace":
            tbl.write_dataframe_as_new_version(df)
        elif mode == "append":
            tbl.append(df)
            tbl.flush()
        else:
            raise ValueError(f"mode must be replace|append, got {mode!r}")
        return tbl.record_count or 0


def import_media_dir(engine: Engine, store: str, path: str, node_id: str = "import_media") -> int:
    """Binary/multimodal import: spark.read.format('binaryFile') lands
    (path, modificationTime, length, content) — content stays an opaque
    BinaryType column for operators/multimodal.py."""
    return import_files(engine, store, path, format="binaryFile", node_id=node_id)
