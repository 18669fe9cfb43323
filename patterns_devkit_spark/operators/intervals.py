"""Interval operators: point-in-interval join without an equi-key.

A range predicate join (``p.ts BETWEEN i.start AND i.end``) with no
equality column gives Spark a BroadcastNestedLoopJoin — O(|P|·|I|)
compares. ``point_in_interval_join`` makes it an equi-join by bucketing
time: each interval explodes into the fixed-width buckets it covers,
each point maps to exactly one bucket, and the join key is the bucket
id with the BETWEEN as a cheap residual. Compare cost drops to
O(|P| + sum(interval_span/bucket)) and the join shuffles/broadcasts
like any equi-join — the standard overlap-join strategy documented in
the Spark literature (and what range-join hints do natively on DBR).

Because a point belongs to exactly ONE bucket, an (interval, point)
pair can match in at most one bucket row — no post-join dedup needed
(dedup would force an extra shuffle).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    intervals: DataFrame,
    points: DataFrame,
    start_ms: str,
    end_ms: str,
    point_ms: str,
    bucket_ms: int = 3_600_000,
) -> DataFrame:
    """Inner-join ``points`` to every interval containing them
    (``start <= p <= end``, epoch-millis columns). Returns the joined
    frame (all interval columns + all point columns).

    ``bucket_ms`` trades explode factor against join selectivity: it
    should be on the order of the median interval span. Intervals
    covering many buckets emit span/bucket rows — bounded and linear,
    never pairwise.
    """
    # integer DIV, not float division: epoch-millis near 2^41 divided as
    # double can land a hair under the true quotient and truncate to the
    # wrong bucket.
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"{start_ms} DIV {bucket_ms}"),
                F.expr(f"{end_ms} DIV {bucket_ms}"),
            )
        ),
    )
    pt = points.withColumn("__bucket", F.expr(f"{point_ms} DIV {bucket_ms}"))
    joined = iv.join(
        pt,
        (iv["__bucket"] == pt["__bucket"])
        & (pt[point_ms] >= iv[start_ms])
        & (pt[point_ms] <= iv[end_ms]),
    )
    return joined.drop("__bucket")
