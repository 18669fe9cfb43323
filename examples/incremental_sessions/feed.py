"""Feed: append the events fixture in monotonic event_id batches, one
batch per execution, requesting a follow-up run until the backlog is
loaded — the incremental-ingest loop of reference node.py:482-500."""
from patterns import Parameter, State, Table, get_spark
from pyspark.sql import functions as F

sf_dir = Parameter("sf_dir")
n_batches = Parameter("n_batches", type=int, default=3)

state = State()
raw = Table("raw", "w")
raw.init(strictly_monotonic_ordering="event_id")

batch = int(state.get_value("next_batch", 0))
if batch < n_batches:
    spark = get_spark()
    # ts intentionally excluded: the stats grain tracks last_event by
    # event_id, so the fixture's nanos-timestamp encoding never matters
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type", "value"
    )
    hi = ev.agg(F.max("event_id").alias("m")).collect()[0]["m"]
    per = int(hi) // n_batches + 1
    lo, up = batch * per, (batch + 1) * per
    raw.append(ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < up)))
    state.set_value("next_batch", batch + 1)
    if batch + 1 < n_batches:
        state.request_new_run()
