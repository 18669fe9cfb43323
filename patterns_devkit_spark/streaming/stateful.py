"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md guidance: 'applyInPandasWithState for custom stateful
operators').

running_totals: per-key running (count, sum) maintained in GroupState
across micro-batches — the building block for counters, rate limits,
dedup-seen-sets, and cursor-like progress that the reference keeps in
its server-side State."""
from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
)


def running_totals(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    output_mode: str = "update",
) -> DataFrame:
    """Stateful per-key running aggregates over a stream: each
    micro-batch updates (n, total) in GroupState and emits the new
    running values for keys seen in the batch."""
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )

    def update(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "total_value": [round(total, 6)]})

    return stream.groupBy(key_col).applyInPandasWithState(
        update, out_schema, STATE_SCHEMA, output_mode, GroupStateTimeout.NoTimeout
    )
