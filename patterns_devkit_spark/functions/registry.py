"""SQL-callable function registration (SURVEY.md §2.8).

The reference's UDF story is arbitrary Python in nodes plus packaged
components; the Spark mapping for "make custom logic callable from SQL
nodes / read_sql" is spark.udf.register. Pandas (Arrow-vectorized)
UDFs are the default here — row-at-a-time Python UDFs are the
documented slow path and exist for completeness."""
from __future__ import annotations

from typing import Any, Callable

import pandas as pd  # needed at module scope: pandas_udf resolves the
# functions' 'pd.Series' type hints via this module's globals

from pyspark.sql import types as T

from ..node.node import Engine


def register_function(
    engine: Engine,
    name: str,
    fn: Callable,
    return_type: str | T.DataType = "string",
    vectorized: bool = True,
) -> None:
    """Register fn as a SQL-callable function.

    vectorized=True wraps fn as a pandas_udf: fn receives/returns
    pandas Series (Arrow batches, ~10-100x the throughput of per-row
    Python). vectorized=False registers a plain per-row UDF.
    """
    rt = T.DataType.fromDDL(return_type) if isinstance(return_type, str) else return_type
    if vectorized:
        from pyspark.sql.functions import pandas_udf

        engine.spark.udf.register(name, pandas_udf(fn, rt))
    else:
        engine.spark.udf.register(name, fn, rt)


def register_builtin_library(engine: Engine) -> list[str]:
    """Engine-bundled SQL functions used by pipelines/components."""

    def norm_text(s: pd.Series) -> pd.Series:
        return s.str.strip().str.lower().str.replace(r"\s+", " ", regex=True)

    def token_count(s: pd.Series) -> pd.Series:
        return s.str.strip().str.split(r"\s+").map(len).astype("int64")

    register_function(engine, "norm_text", norm_text, "string")
    register_function(engine, "token_count_py", token_count, "bigint")
    return ["norm_text", "token_count_py"]
