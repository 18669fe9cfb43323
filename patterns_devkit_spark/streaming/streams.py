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
    unique_on: str | list[str] | None = None,
):
    """foreachBatch sink into an engine table, so streaming writes emit
    data events and version like any other write.

    Semantics per output mode:
    - ``update`` (aggregates): REQUIRES ``unique_on`` — update mode
      re-emits a group's row every time a later batch changes it, so
      the sink must upsert on the group keys or the table accumulates
      stale duplicates. (raises if unique_on is missing.)
    - ``complete``: the whole result is re-emitted every batch — the
      sink REPLACES the table (versioned, so readers still flip
      atomically).
    - ``append`` (watermark-finalized or append-only streams): plain
      appends.

    Replay/retry: foreachBatch can re-run a batch after a failure; the
    sink records the last committed batch_id in node state (committed
    atomically with node cursors at context exit) and skips batches it
    already committed. Upserts make replay additionally idempotent at
    the row level; the pure-append path is at-least-once in the crash
    window between table flush and state commit."""
    if output_mode == "update" and unique_on is None:
        raise ValueError(
            "output_mode='update' re-emits updated aggregate rows; pass "
            "unique_on=<group keys> so the sink upserts, or use "
            "output_mode='append' with a watermark"
        )
    state_key = f"__stream_last_batch::{store}"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from ..node.node import State

        with engine.node_context(node_id, outputs={"out": store}):
            st = State()
            committed = st.get_value(state_key)
            if committed is not None and batch_id <= committed:
                return  # replayed batch: already in the table
            tbl = Table("out", "w")
            if output_mode == "complete":
                tbl.replace(batch_df)
            elif unique_on is not None:
                tbl.init(unique_on=unique_on)
                tbl.upsert(batch_df)
            else:
                tbl.append(batch_df)
            tbl.flush()
            st.set_value(state_key, batch_id)

    writer = (
        stream.writeStream.foreachBatch(sink)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: first occurrence of each key wins;
    duplicates arriving within the watermark horizon are dropped and
    state for keys older than the watermark is evicted (bounded state —
    the property plain dropDuplicates lacks in streaming mode). This is
    the ingest-time half of the dedup family (operators/dedup.exact is
    the batch half): at 100 TB you dedup the firehose before it ever
    lands, then run batch near-dup on the survivors."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch joins against a
    batch-side dimension table — the lookup-enrich half of streaming
    ingest (the stream-stream variant above is for two live feeds).
    Pass ``Table.read_spark()`` as ``dim`` to enrich against an ENGINE
    table: the scan is planned against the table's active version DIR,
    so a catalog version flip mid-stream does not tear a micro-batch
    (each batch reads a consistent snapshot; restart the query to pick
    up a new version). ``broadcast_dim`` (default) hints the dim to
    every executor so the unbounded streaming side never shuffles —
    the only stream-static shape that scales; disable it only for dims
    too large to broadcast, which at 100 TB means the dim belongs in a
    key-value store, not a join."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=on, how=how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    within: str = "5 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join with a time-range bound
    (the click-to-impression enrich pattern): both sides buffer only
    `watermark + within` of state; the range predicate lets Spark
    evict matched/expired rows instead of holding both streams forever
    — the only join shape that survives unbounded inputs."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner")
