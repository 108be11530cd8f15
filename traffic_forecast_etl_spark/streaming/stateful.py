"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming state at all (its "real-time" plane is
a polled batch with ON-CONFLICT dedup — SURVEY §2.7); built-in
streaming aggregations cover counts/sums/windows (micro_batch.py).
This module is the escape hatch the engine exposes for operators whose
semantics are ORDER-DEPENDENT per key — the one thing windowed
aggregation cannot express — demonstrated with a per-key exponential
moving average (EWMA):

    ewma_1 = x_1;  ewma_t = alpha * x_t + (1 - alpha) * ewma_(t-1)

State per key is O(1) (running ewma + event count + last timestamp),
the Spark state store checkpoints it per micro-batch, and the group's
rows arrive as Arrow batches — the standard scalable shape for custom
stateful logic (state size bounds memory, not stream length). The
GroupStateTimeout knob evicts idle keys in a real 24/7 deployment;
the AvailableNow harness here never needs it.

Parity: the same recurrence has the closed form

    ewma_T = (1-a)^(T-1) * x_1 + a * sum_(t=2..T) (1-a)^(T-t) * x_t

with only non-negative exponents (underflow of ancient terms to 0 is
exactly the semantics) — catalog query ``st3_stateful_ewma`` checks
the streaming operator against DuckDB evaluating that closed form.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("ewma", T.DoubleType()),
        T.StructField("n", T.LongType()),
        T.StructField("last_ts", T.LongType()),  # epoch micros of last applied event
        T.StructField("last_id", T.LongType()),
    ]
)


def streaming_ewma(
    events: DataFrame,
    alpha: float = 0.1,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key stateful EWMA over a stream. Emits (key, n_events,
    ewma) per key per micro-batch in UPDATE semantics — downstream
    sees the latest running value.

    Rows inside a micro-batch are sorted by (ts, order_col) before
    applying the recurrence — Spark hands the group's batch rows in
    arbitrary order. ACROSS batches ordering is the source's job
    (watermark + replayable source); same contract as every streaming
    engine's event-time operator.
    """

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows) == 0:  # timeout tick — nothing to update
            return
        rows = rows.sort_values([ts_col, order_col], ignore_index=True)
        if state.exists:
            ewma, n, last_ts, last_id = state.get
        else:
            ewma, n, last_ts, last_id = 0.0, 0, -1, -1
        for ts, oid, x in zip(
            rows[ts_col].astype("int64"),  # pandas datetime64[us/ns] -> int
            rows[order_col],
            rows[value_col],
        ):
            ewma = float(x) if n == 0 else alpha * float(x) + (1.0 - alpha) * ewma
            n += 1
            last_ts, last_id = int(ts), int(oid)
        state.update((ewma, n, last_ts, last_id))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "ewma": [ewma]})

    return (
        events.select(key_col, ts_col, order_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
