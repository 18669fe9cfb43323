"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash -> CORRECTNESS_r{N}.json).

All implementations live in ``patterns_devkit_spark.queries``; the
engine itself is ``patterns_devkit_spark`` (see SURVEY.md §2 for the
operator inventory each entry covers).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from patterns_devkit_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 THROUGH the engine:
    fixture parquet -> engine table -> {{ }} SQL node -> versioned
    write -> read back (SURVEY.md §7.1 M2 minimum slice)."""
    return _q.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents. Every query is oracle-
    paired except q60 (seeded TABLESAMPLE — sampling is engine-seeded
    by design; q28 is its deterministic counterpart). The approximate
    operators (MinHash/SimHash/LSH/IVF, q35/q36/q38/q66) use
    cross-engine deterministic hash families (operators/det_hash.py),
    so their oracles replay the full approximate pipeline."""
    return dict(_q.ORACLES)
