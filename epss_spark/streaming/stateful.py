"""Stateful streaming quantization — the flagship kernel as a stream.

Batch quantization (operators/quantize.py) needs each key's full in-range
history; a stream can't re-sort history per micro-batch. Instead each key
carries ONE piece of state — its last seen (time, value) — and every
incoming row emits iff its value differs from that state. This is the
applyInPandasWithState pattern from the PySpark Structured Streaming API:
per-key state, Arrow-batched, watermark-bounded.

At scale: state is 16 bytes/key (plus key), partitioned by the shuffle on
the grouping key; 1B keys ≈ tens of GB of state across a cluster —
checkpointed incrementally by the state store, never recomputed.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

CHANGES_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("prev_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType()),  # epoch micros
        StructField("last_value", DoubleType()),
    ]
)


def streaming_changed_values(events: DataFrame) -> DataFrame:
    """Streaming equivalent of changed_scores over (user_id, ts, value):
    one state entry per key, append-mode output of change events.

    The state function is a nested closure so it pickles by value —
    workers never need this package importable."""

    def quantize_group(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # Emit rows whose value differs from the key's running last value.
        # Rows inside a micro-batch are processed in event-time order; the
        # cross-batch contract holds as long as the source replays in order
        # per key (true for date-partitioned snapshot drops).
        import pandas as _pd

        (user_id,) = key
        if state.exists:
            last_ts, last_value = state.get
        else:
            last_ts, last_value = None, None

        out_ts, out_val, out_prev = [], [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"] if "event_id" in pdf else ["ts"])
            for ts, value in zip(pdf["ts"], pdf["value"]):
                if last_value is None or value != last_value:
                    out_ts.append(ts)
                    out_val.append(value)
                    out_prev.append(last_value)
                    last_value = value
                last_ts = int(_pd.Timestamp(ts).value // 1000)
        state.update((last_ts, last_value))
        if out_ts:
            yield _pd.DataFrame(
                {
                    "user_id": [user_id] * len(out_ts),
                    "ts": out_ts,
                    "value": out_val,
                    "prev_value": out_prev,
                }
            )

    return (
        events.withWatermark("ts", "1 day")
        .groupBy("user_id")
        .applyInPandasWithState(
            quantize_group,
            outputStructType=CHANGES_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
