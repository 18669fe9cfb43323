"""Event-time windowing over event tables.

The reference has no event-time semantics (its streams are ordered
cursors, reference node.py:18-81); these are the extension operators
(SURVEY.md §2.9 tail): tumbling/sliding windows via F.window (batch-
computable, so DuckDB time_bucket can verify) and gap-based
sessionization via the lag/cumsum formulation (one shuffle on the
session key; identical semantics expressible in ANSI SQL for the
oracle). The same expressions run under Structured Streaming with
withWatermark — see streaming/.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def tumbling(df: DataFrame, ts_col: str, duration: str, group_cols: list[str] | None = None) -> DataFrame:
    """Tumbling window aggregate: (window_start, *group_cols, n, sum)."""
    g = df.groupBy(F.window(ts_col, duration).alias("w"), *(group_cols or []))
    return g.agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value")).select(
        F.col("w.start").alias("window_start"), *(group_cols or []), "n_events", "sum_value"
    )


def sliding(df: DataFrame, ts_col: str, duration: str, slide: str, group_cols: list[str] | None = None) -> DataFrame:
    g = df.groupBy(F.window(ts_col, duration, slide).alias("w"), *(group_cols or []))
    return g.agg(F.count(F.lit(1)).alias("n_events")).select(
        F.col("w.start").alias("window_start"), *(group_cols or []), "n_events"
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_minutes: int = 30,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    key's previous event exceeds the gap. Output one row per session:
    (key, session_id, session_start, session_end, n_events, sum_value).

    Formulation: lag(ts) over (key order ts) -> is_new flag -> running
    sum = session index. Both window passes share one shuffle on key.
    """
    w_order = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col(order_tiebreak).asc())
    gap = F.lit(gap_minutes * 60)
    prev_ts = F.lag(ts_col).over(w_order)
    is_new = F.when(
        prev_ts.isNull() | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)) > gap), 1
    ).otherwise(0)
    with_sess = df.withColumn("__new", is_new).withColumn(
        "session_id", F.sum("__new").over(w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )
    return with_sess.groupBy(key_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )
