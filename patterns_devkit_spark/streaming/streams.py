"""Structured Streaming execution mode.

The reference's streams are ordered cursors over tables, not event-
time streams (reference node.py:18-81); SURVEY.md §2.9 adds event-time
operators as extensions. This module runs those same operators under
Structured Streaming for webhook/event-spool sources:

- spool_stream: readStream over a directory (the webhook spool),
- windowed aggregation with watermark-based late-data handling,
- foreachBatch sink writing micro-batches into ENGINE tables, so
  streaming output gets versioning + data events and triggers
  downstream graph nodes exactly like batch writes.

The batch/streaming operators are the same DataFrame expressions
(window/session_window work in both modes) — one definition, two
execution modes, which is the Spark-idiomatic answer to the
reference's single batch/"stream" API.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..node.node import Engine, Table


def spool_stream(engine: Engine, path: str, schema: T.StructType, format: str = "json") -> DataFrame:
    """readStream over a spool directory (webhook/event landing zone)."""
    return engine.spark.readStream.format(format).schema(schema).load(path)


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    duration: str = "5 minutes",
    watermark: str = "10 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window counts with a watermark: late rows beyond the
    watermark are dropped, state is bounded — the scale-safe default."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration).alias("w"), *(group_cols or []))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), *(group_cols or []), "n_events")
    )


def session_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    key_col: str = "user_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Native streaming sessionization via session_window (the batch
    equivalent is operators/windows.sessionize)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("session_start"), F.col("w.end").alias("session_end"), key_col, "n_events")
    )


def write_stream_to_table(
    engine: Engine,
    stream: DataFrame,
    store: str,
    checkpoint_dir: str,
    node_id: str = "stream_sink",
    output_mode: str = "update",
    available_now: bool = True,
):
    """foreachBatch sink into an engine table: each micro-batch appends
    through the Table SDK, so streaming writes emit data events and
    version like any other write (exactly-once per batch via the
    checkpoint + idempotent-append pairing)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        with engine.node_context(node_id, outputs={"out": store}):
            tbl = Table("out", "w")
            tbl.append(batch_df)
            tbl.flush()

    writer = (
        stream.writeStream.foreachBatch(sink)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
