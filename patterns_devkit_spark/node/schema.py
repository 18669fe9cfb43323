"""Schema system: inferred by default, declared or hinted optionally.

Implements the reference's schema semantics (reference:
patterns/node/node.py:134-136,272-296,303-304 — schema inferred from
written records unless declared; per-field "schema hints" override
inferred types using CommonModel field-type names).

Spark mapping (SURVEY.md §1.3): CommonModel type names map onto Spark
SQL types; hints become an explicit ``cast()`` layer applied before
write; evolution across appends is union-of-fields normalization
(missing columns become typed nulls), the client-side equivalent of
``mergeSchema=true``.
"""
from __future__ import annotations

from typing import Any, Iterable, Mapping

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# CommonModel field-type name -> Spark type (public commonmodel package
# names; reference patterns/node/node.py:273,283 uses these in hints).
_COMMONMODEL_TO_SPARK: dict[str, T.DataType] = {
    "text": T.StringType(),
    "string": T.StringType(),
    "varchar": T.StringType(),
    "integer": T.LongType(),
    "int": T.LongType(),
    "bigint": T.LongType(),
    "float": T.DoubleType(),
    "double": T.DoubleType(),
    "real": T.DoubleType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "decimal": T.DecimalType(38, 9),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
    "timestamp": T.TimestampType(),
    "time": T.StringType(),
    "json": T.StringType(),  # stored as JSON text; parse on demand with from_json
    "binary": T.BinaryType(),
    "longtext": T.StringType(),
    "longbinary": T.BinaryType(),
}


def commonmodel_type_to_spark(name: str) -> T.DataType:
    """Resolve a CommonModel field-type name (e.g. 'Text', 'Integer',
    'Decimal(16,2)') to a Spark DataType. Unknown names fall through to
    Spark's own DDL parser so 'array<float>' etc. also work."""
    key = name.strip().lower()
    if "(" in key:
        base = key.split("(", 1)[0]
        if base == "decimal":
            args = key.split("(", 1)[1].rstrip(")").split(",")
            p = int(args[0])
            s = int(args[1]) if len(args) > 1 else 0
            return T.DecimalType(p, s)
        key = base
    if key in _COMMONMODEL_TO_SPARK:
        return _COMMONMODEL_TO_SPARK[key]
    return T.DataType.fromDDL(name)


def schema_dict_to_struct(schema: Mapping[str, str]) -> T.StructType:
    """A declared schema: dict of field name -> CommonModel type name
    (reference node.py:272 'a dictionary of field names to field types')."""
    return T.StructType(
        [T.StructField(fname, commonmodel_type_to_spark(ftype), True) for fname, ftype in schema.items()]
    )


def records_to_dataframe(
    spark: SparkSession,
    records: Any,
    declared_schema: T.StructType | None = None,
) -> DataFrame:
    """Normalize the reference's accepted record forms — a list of dicts
    with str keys, a single dict, or a pandas DataFrame (reference
    node.py:300-315,143-153) — into a Spark DataFrame.

    Inference goes through pandas + Arrow (vectorized) rather than
    row-at-a-time sampling; a declared schema wins over inference
    (node.py:303-304).
    """
    if isinstance(records, DataFrame):
        df = records
    elif isinstance(records, pd.DataFrame):
        df = spark.createDataFrame(records, schema=declared_schema)
    elif isinstance(records, Mapping):
        df = spark.createDataFrame(pd.DataFrame([dict(records)]), schema=declared_schema)
    elif isinstance(records, Iterable):
        rows = [dict(r) for r in records]
        if not rows and declared_schema is None:
            raise ValueError("cannot infer schema from zero records; declare a schema via Table.init()")
        # union-of-keys normalization: pandas fills missing keys with NaN/None
        df = spark.createDataFrame(pd.DataFrame(rows), schema=declared_schema)
    else:
        raise TypeError(f"unsupported records type: {type(records)!r}")
    if declared_schema is not None and not isinstance(records, (pd.DataFrame, Mapping, list)):
        df = conform_to_schema(df, declared_schema)
    return df


def apply_schema_hints(df: DataFrame, hints: Mapping[str, str] | None) -> DataFrame:
    """Per-field type overrides (reference node.py:273,283): cast the
    named columns to the hinted CommonModel types; other columns keep
    their inferred types."""
    if not hints:
        return df
    cols = []
    for field in df.schema.fields:
        if field.name in hints:
            cols.append(F.col(field.name).cast(commonmodel_type_to_spark(hints[field.name])).alias(field.name))
        else:
            cols.append(F.col(field.name))
    return df.select(*cols)


def conform_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Union-of-fields normalization for schema evolution across appends
    (SURVEY.md §1.3): reorder/cast existing columns to the target,
    adding typed nulls for columns the batch lacks. Columns present in
    the batch but not the target are KEPT (appended after), matching
    merge-schema append behavior."""
    existing = {f.name for f in df.schema.fields}
    cols = []
    for field in target.fields:
        if field.name in existing:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    extras = [F.col(f.name) for f in df.schema.fields if f.name not in {x.name for x in target.fields}]
    return df.select(*cols, *extras)


def merge_schemas(a: T.StructType, b: T.StructType) -> T.StructType:
    """Union of fields; on name collision the first (existing table)
    schema's type wins — appended batches are cast to it."""
    fields = list(a.fields)
    names = {f.name for f in fields}
    for f in b.fields:
        if f.name not in names:
            fields.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(fields)
