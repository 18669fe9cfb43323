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


def register_udtf(
    engine: Engine,
    name: str,
    udtf_cls: type | None = None,
) -> str:
    """Register a Python user-defined TABLE function (Spark 4 UDTF) —
    the table-in/table-out SQL surface the reference expresses as
    Python nodes (reference node.py:143-153: arbitrary code between
    tables). A UDTF is callable in FROM position:

        SELECT s.* FROM my_table t, LATERAL split_sentences(t.text) s

    Default implementation (when udtf_cls is None): split_sentences —
    yields one row per '.'/'!'/'?'-terminated span with its index and
    char length. Arrow-optimized when the plan allows; each input row
    fans out to N output rows, which plain scalar UDFs cannot do.
    """
    from pyspark.sql.functions import udtf

    if udtf_cls is None:

        class SplitSentences:
            def eval(self, text: str):
                if text is None:
                    return
                import re

                spans = [s.strip() for s in re.split(r"(?<=[.!?])\s+", text.strip())]
                for i, s in enumerate(sp for sp in spans if sp):
                    yield i, s, len(s)

        udtf_cls = SplitSentences
        returns = "sent_idx int, sentence string, n_chars int"
    else:
        returns = getattr(udtf_cls, "returnType", "value string")

    wrapped = udtf(udtf_cls, returnType=returns)
    engine.spark.udtf.register(name, wrapped)
    return name


def register_grouped_agg(
    engine: Engine,
    name: str,
    fn: Callable | None = None,
    return_type: str = "double",
) -> str:
    """Register a GROUPED_AGG pandas UDF — the custom-aggregation slot
    of §2.8 (SQL-callable in GROUP BY queries and over windows).
    Default: interquartile range (iqr), a reduction the built-in agg
    set lacks as a single function."""
    from pyspark.sql.functions import pandas_udf

    if fn is None:

        def fn(v: pd.Series):
            return float(v.quantile(0.75) - v.quantile(0.25))

    inner = fn

    # Series -> scalar type hints make Spark infer GROUPED_AGG (the
    # non-deprecated form of the old PandasUDFType constant), whether
    # or not the caller annotated their function.
    def agg(v: pd.Series) -> float:
        return inner(v)

    rt = T.DataType.fromDDL(return_type)
    engine.spark.udf.register(name, pandas_udf(agg, rt))
    return name
