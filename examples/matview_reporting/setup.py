"""Seed node: declare the MV (idempotent) and append one batch of the
orders fixture per run. The engine — not this node — maintains the
`sales_by_status` aggregate: GraphRunner folds the appended delta into
the MV when it sees this table's data event."""
from patterns import Parameter, State, Table, current_engine, get_spark

sf_dir = Parameter("sf_dir")

state = State()
out = Table("out", "w")
out.init(add_monotonic_id="mid")

# engine-level declaration (safe to repeat: the spec just overwrites)
engine = current_engine()
engine.create_materialized_view(
    "sales_by_status",
    source="sales_raw",
    order_by="mid",
    dims=["o_orderstatus"],
    measures={
        "revenue_cents": ("sum", "CAST(round(o_totalprice * 100) AS BIGINT)"),
        "n_orders": ("count", "*"),
        "max_order_cents": ("max", "CAST(round(o_totalprice * 100) AS BIGINT)"),
    },
)

batch = int(state.get_value("next_batch", 0))
if batch < 2:
    spark = get_spark()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    half = o.filter((o.o_orderkey % 2) == batch)
    out.append(half)
    state.set_value("next_batch", batch + 1)
    if batch == 0:
        state.request_new_run()
