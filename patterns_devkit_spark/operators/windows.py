"""Event-time windowing over event tables, plus scale-safe GLOBAL
window primitives (two-pass range-partitioned prefix/rank/ntile).

The reference has no event-time semantics (its streams are ordered
cursors, reference node.py:18-81); these are the extension operators
(SURVEY.md §2.9 tail): tumbling/sliding windows via F.window (batch-
computable, so DuckDB time_bucket can verify) and gap-based
sessionization via the lag/cumsum formulation (one shuffle on the
session key; identical semantics expressible in ANSI SQL for the
oracle). The same expressions run under Structured Streaming with
withWatermark — see streaming/.

The global_* family replaces `Window.orderBy(...)` (which Spark plans
as Exchange SinglePartition -> Sort -> Window: one task sorts ALL
rows) with the classic two-pass form that stays parallel at any
scale:

  1. bucket rows by range on the leading sort key (boundaries from
     approxQuantile — one cheap sampling job; the RESULT is exact for
     ANY boundary choice, so sampling error only affects balance);
  2. run the window partitioned by bucket (one parallel hash
     shuffle), producing bucket-local ranks / prefix sums;
  3. aggregate one total per bucket (tiny: num_buckets rows), take
     the exclusive cumulative offsets, and add them back as a literal
     map lookup (the "broadcast per-partition offsets" step — here a
     driver-collected literal since the offsets table is O(buckets)).

Rows tied on the leading key always share a bucket (bucket(v) depends
only on v), so ordering by the remaining keys inside the bucket
reproduces the exact global order. Keys must be non-null.
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
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


# =====================================================================
# Scale-safe global windows (two-pass range-partitioned)
# =====================================================================

_B = "__pdk_bucket"  # internal helper column; dropped before return


def _default_buckets(df: DataFrame) -> int:
    return max(2, df.sparkSession.sparkContext.defaultParallelism)


def _boundaries(df: DataFrame, key_col: str, num_buckets: int, rel_err: float = 0.001) -> list[float]:
    """Range-bucket cut points from approxQuantile (deterministic GK
    sketch; nulls ignored — callers guarantee non-null keys). Under
    heavy skew quantiles repeat; duplicates are dropped (empty buckets
    are harmless — correctness never depends on the boundary choice)."""
    if num_buckets <= 1:
        return []
    probs = [i / num_buckets for i in range(1, num_buckets)]
    return sorted(set(df.stat.approxQuantile(key_col, probs, rel_err)))


def _bucket_expr(key: Column, bnds: list[float], ascending: bool) -> Column:
    """Monotone bucket id in [0, len(bnds)] — a codegen'd when-chain
    (no interpreted higher-order functions in the per-row path). Ties
    on the key always map to the same bucket."""
    terms = [
        F.when((key >= F.lit(b)) if ascending else (key <= F.lit(b)), 1).otherwise(0)
        for b in bnds
    ]
    return reduce(lambda a, b: a + b, terms, F.lit(0)).cast("int")


def _offset_expr(offsets: dict[int, int]) -> Column:
    """Literal-map lookup bucket -> exclusive prefix offset. O(buckets)
    entries, so a driver-side literal is the broadcast."""
    if not offsets:
        return F.lit(0).cast("long")
    pairs: list[Column] = []
    for b in sorted(offsets):
        pairs.append(F.lit(int(b)))
        pairs.append(F.lit(int(offsets[b])))
    return F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(_B)), F.lit(0)
    ).cast("long")


def _two_pass(
    df: DataFrame,
    bucket_key: str,
    ascending: bool,
    order_exprs: list[Column],
    local_col: Column,
    total_agg: Column,
    num_buckets: int | None,
) -> tuple[DataFrame, dict[int, int], int]:
    """Shared core: bucket, run `local_col` over the bucket-local
    window, aggregate `total_agg` per bucket, and return
    (bucketed df with '__pdk_local', exclusive offsets, grand total).
    The per-bucket totals job re-reads the (column-pruned) input — an
    O(n) map-side partial aggregate, the price of pass one."""
    p = num_buckets or _default_buckets(df)
    bnds = _boundaries(df, bucket_key, p)
    dfb = df.withColumn(_B, _bucket_expr(F.col(bucket_key), bnds, ascending))
    totals = {
        r[_B]: r["__t"]
        for r in dfb.groupBy(_B).agg(total_agg.alias("__t")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(totals):
        offsets[b] = acc
        acc += int(totals[b])
    w = Window.partitionBy(_B).orderBy(*order_exprs)
    return dfb.withColumn("__pdk_local", local_col.over(w)), offsets, acc


def global_row_number(
    df: DataFrame,
    bucket_key: str,
    ascending: bool,
    order_exprs: list[Column],
    out_col: str = "rn",
    num_buckets: int | None = None,
) -> DataFrame:
    """Exact global row_number() over a total order, without a
    single-partition sort: bucket-local row_number + per-bucket count
    offsets. `order_exprs` must start with `bucket_key` in the
    `ascending` direction and end with a tiebreaker making the order
    total."""
    out, offsets, _ = _two_pass(
        df, bucket_key, ascending, order_exprs,
        F.row_number(), F.count(F.lit(1)), num_buckets,
    )
    return out.withColumn(
        out_col, (F.col("__pdk_local").cast("long") + _offset_expr(offsets))
    ).drop(_B, "__pdk_local")


def global_prefix_sum(
    df: DataFrame,
    bucket_key: str,
    ascending: bool,
    order_exprs: list[Column],
    value_col: str,
    out_col: str = "cum",
    num_buckets: int | None = None,
) -> DataFrame:
    """Exact global running sum (ROWS UNBOUNDED PRECEDING .. CURRENT
    ROW) of an integral column over a total order: bucket-local
    running sum + per-bucket sum offsets."""
    out, offsets, _ = _two_pass(
        df, bucket_key, ascending, order_exprs,
        F.sum(value_col), F.sum(value_col), num_buckets,
    )
    return out.withColumn(
        out_col, (F.col("__pdk_local").cast("long") + _offset_expr(offsets))
    ).drop(_B, "__pdk_local")


def global_prefix_sum_multi(
    df: DataFrame,
    bucket_key: str,
    ascending: bool,
    order_exprs: list[Column],
    value_cols: list[str],
    out_cols: list[str],
    num_buckets: int | None = None,
) -> DataFrame:
    """`global_prefix_sum` for SEVERAL integral columns in ONE sweep:
    same bucketing, ONE per-bucket totals job (k sums per bucket) and
    ONE bucket-partitioned window shuffle computing all k running
    sums — vs k full two-pass sweeps (k input re-evaluations, k
    shuffles) when called column-by-column. The ECDF/rank-pair shape
    (e.g. two-sample tests: cumulative counts of both arms over one
    value order) is the motivating caller."""
    if len(value_cols) != len(out_cols):
        raise ValueError("value_cols and out_cols must align")
    p = num_buckets or _default_buckets(df)
    bnds = _boundaries(df, bucket_key, p)
    dfb = df.withColumn(_B, _bucket_expr(F.col(bucket_key), bnds, ascending))
    totals_rows = (
        dfb.groupBy(_B)
        .agg(*[F.sum(c).alias(f"__t{i}") for i, c in enumerate(value_cols)])
        .collect()
    )
    w = Window.partitionBy(_B).orderBy(*order_exprs)
    out = dfb
    for i, (vc, oc) in enumerate(zip(value_cols, out_cols)):
        offsets: dict[int, int] = {}
        acc = 0
        for r in sorted(totals_rows, key=lambda r: r[_B]):
            offsets[r[_B]] = acc
            acc += int(r[f"__t{i}"])
        out = out.withColumn(
            oc, (F.sum(vc).over(w).cast("long") + _offset_expr(offsets))
        )
    return out.drop(_B)


def global_ntile(
    df: DataFrame,
    bucket_key: str,
    ascending: bool,
    order_exprs: list[Column],
    n: int,
    out_col: str = "tile",
    num_buckets: int | None = None,
) -> DataFrame:
    """Exact global ntile(n) over a total order via the two-pass rank
    plus the SQL-standard closed form (first n_rows % n tiles take
    one extra row) — identical to Spark's and DuckDB's ntile given a
    total order. The grand total comes from the offsets pass, so no
    extra job."""
    out, offsets, total = _two_pass(
        df, bucket_key, ascending, order_exprs,
        F.row_number(), F.count(F.lit(1)), num_buckets,
    )
    rn = F.col("__pdk_local").cast("long") + _offset_expr(offsets)
    q, rem = divmod(int(total), n)
    big = rem * (q + 1)
    q_safe = max(q, 1)  # rn > big is unreachable when q == 0; guard ANSI div-by-zero
    tile = F.when(
        rn <= F.lit(big), (rn - 1) / F.lit(q + 1)
    ).otherwise(
        F.lit(rem) + (rn - F.lit(big) - 1) / F.lit(q_safe)
    )
    return out.withColumn(
        out_col, (F.floor(tile) + 1).cast("long")
    ).drop(_B, "__pdk_local")


def global_running_max(
    df: DataFrame,
    bucket_key: str,
    ascending: bool,
    order_exprs: list[Column],
    value_col: str,
    out_col: str = "runmax",
    num_buckets: int | None = None,
    exclusive: bool = False,
) -> DataFrame:
    """Exact global running MAX over a total order, without a
    single-partition sort: bucket-local running max combined (via
    greatest) with the max over all STRICTLY-PRIOR buckets. The
    prior-bucket maxima are a cumulative fold of the O(buckets)
    per-bucket totals on the driver — max is not additive, so this
    cannot reuse _two_pass's additive offsets. Composes with
    global_prefix_sum for running-peak / max-drawdown shapes.
    ``exclusive=True`` gives the strictly-before max (NULL on the
    global first row) — the domination test skylines need."""
    p = num_buckets or _default_buckets(df)
    bnds = _boundaries(df, bucket_key, p)
    dfb = df.withColumn(_B, _bucket_expr(F.col(bucket_key), bnds, ascending))
    totals = {
        r[_B]: r["__t"]
        for r in dfb.groupBy(_B).agg(F.max(value_col).alias("__t")).collect()
    }
    offsets: dict[int, int] = {}
    acc = None
    for b in sorted(totals):
        if acc is not None:
            offsets[b] = acc
        if totals[b] is not None:
            acc = totals[b] if acc is None else max(acc, totals[b])
    w = Window.partitionBy(_B).orderBy(*order_exprs)
    frame = w.rowsBetween(Window.unboundedPreceding, -1 if exclusive else 0)
    local = F.max(value_col).over(frame)
    if offsets:
        pairs: list[Column] = []
        for b in sorted(offsets):
            pairs.append(F.lit(int(b)))
            pairs.append(F.lit(int(offsets[b])))
        prior = F.element_at(F.create_map(*pairs), F.col(_B)).cast("long")
        out = F.greatest(local, prior)  # greatest skips NULLs (bucket 0 / first row)
    else:
        out = local
    return dfb.withColumn(out_col, out.cast("long")).drop(_B)


def banded_range_count(
    df: DataFrame,
    value_col: str,
    low: float,
    high: float = 0.0,
    out_col: str = "n_in_range",
    num_buckets: int | None = None,
) -> DataFrame:
    """Exact count(*) OVER (ORDER BY value RANGE BETWEEN |low|
    PRECEDING AND CURRENT ROW) without a global sort (low <= high <= 0
    frames; mirror values for leading frames).

    Rows whose frame reaches below their bucket's lower boundary need
    rows from earlier buckets: every row within |low| below a boundary
    is replicated into that boundary's bucket as a frame-only "halo"
    row (the replicated-overlap technique of distributed range joins).
    Halo fan-out is bounded by rows-per-|low|-band x boundaries; halo
    rows feed frames but are not emitted."""
    assert low <= high <= 0, "trailing frames only (mirror the value column for leading)"
    p = num_buckets or _default_buckets(df)
    bnds = _boundaries(df, value_col, p)
    v = F.col(value_col)
    own = _bucket_expr(v, bnds, True)
    halo = F.array_compact(
        F.array(
            *[
                F.when(
                    (v < F.lit(b)) & (v >= F.lit(b + low)), F.lit(i + 1)
                ).otherwise(F.lit(None).cast("int"))
                for i, b in enumerate(bnds)
            ]
        )
    ) if bnds else F.array().cast("array<int>")
    # posexplode_outer: __pdk_all is never empty (it always holds the
    # own bucket), and the outer form stops InferFiltersFromGenerate
    # from cloning the when-chain into a vacuous size(...)>0 filter.
    exploded = (
        df.withColumn("__pdk_all", F.concat(F.array(own), halo))
        .select("*", F.posexplode_outer("__pdk_all"))
        .withColumnRenamed("pos", "__pdk_pos")
        .withColumnRenamed("col", _B)
    )
    w = Window.partitionBy(_B).orderBy(v).rangeBetween(low, high)
    return (
        exploded.withColumn(out_col, F.count(F.lit(1)).over(w))
        .filter(F.col("__pdk_pos") == 0)
        .drop("__pdk_all", "__pdk_pos", _B)
    )
