"""Loader: dims once (with a zero-copy column rename), facts in two
batches. The engine — not this node — maintains `rev_by_nat`: the
GraphRunner folds the two-source join MV whenever either source emits
a data event (IVM delta rule, SCALE.md §51)."""
from patterns import Parameter, State, Table, current_engine, get_spark

sf_dir = Parameter("sf_dir")

state = State()
orders_t = Table("orders", "w")
# auto_compact_after: the two append batches land one file each; the
# second flush trips the threshold and the engine compacts
# automatically (a new version — the MV cursor is unaffected because
# compaction adds no rows above the applied high-water mark)
orders_t.init(add_monotonic_id="mid", auto_compact_after=2)
cust_t = Table("cust", "w")
cust_t.init(add_monotonic_id="mid")
nation_t = Table("nations", "w")

engine = current_engine()
# engine-level declarations (safe to repeat: specs just overwrite)
engine.create_materialized_join_view(
    "rev_by_nat",
    left="orders_t",
    right="cust_t",
    on=["c_custkey"],
    order_by={"orders_t": "mid", "cust_t": "mid"},
    dims=["c_nationkey"],
    measures={"revenue_cents": ("sum", "cents"), "n_orders": ("count", "*")},
)
engine.create_view(
    "rev_named",
    "SELECT n.nation_name AS nation, a.revenue_cents, a.n_orders "
    "FROM {{ rev_by_nat }} a JOIN {{ nation_t }} n ON n.n_nationkey = a.c_nationkey",
)

spark = get_spark()
batch = int(state.get_value("next_batch", 0))
if batch < 2:
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr(
            "o_orderkey",
            "o_custkey AS c_custkey",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        )
    )
    if batch == 0:
        cust_t.append(
            spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey", "c_nationkey")
        )
        nation_t.append(
            spark.read.parquet(f"{sf_dir}/nation.parquet").select("n_nationkey", "n_name")
        )
        nation_t.flush()
        # zero-copy rename: metadata-only, the parquet file keeps
        # 'n_name' at rest; the view above reads the LOGICAL name
        nation_t.rename_column("n_name", "nation_name")
    orders_t.append(orders.filter(orders.o_orderkey % 2 == batch))
    state.set_value("next_batch", batch + 1)
    if batch == 0:
        state.request_new_run()
