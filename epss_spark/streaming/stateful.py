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
        #
        # A key's micro-batch rows can arrive as SEVERAL Arrow chunks
        # (arrow.maxRecordsPerBatch), and chunk order follows raw file
        # order, not event time — so all chunks are concatenated and
        # sorted ONCE before the change test (a per-chunk sort would
        # process chunk 2's earlier timestamps after chunk 1's tail,
        # emitting spurious changes and storing a non-final last value).
        # Memory is one key's rows within one micro-batch — the same
        # bound applyInPandasWithState already imposes on the state
        # function's inputs.
        #
        # The change test is vectorized (shift/compare over numpy):
        # "changed" is a consecutive comparison, so after sorting, row i
        # changes iff v[i] != v[i-1] (with the state's last value standing
        # in at i=0) — the running last-emitted value always equals the
        # last-seen value, so no sequential dependency survives.
        import numpy as np
        import pandas as _pd

        (user_id,) = key
        if state.exists:
            last_ts, last_value = state.get
        else:
            last_ts, last_value = None, None
        has_state = last_value is not None

        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            if state.exists:
                state.update((last_ts, last_value))
            return
        pdf = chunks[0] if len(chunks) == 1 else _pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"] if "event_id" in pdf else ["ts"])
        v = pdf["value"].to_numpy()
        n = len(v)
        mask = np.empty(n, dtype=bool)
        np.not_equal(v[1:], v[:-1], out=mask[1:])
        # NaN semantics match the scalar spec: NaN != anything is True
        mask[0] = (not has_state) or bool(v[0] != last_value)
        prev = np.empty(n, dtype=object)
        prev[1:] = v[:-1]
        prev[0] = last_value if has_state else None
        keep = np.flatnonzero(mask)
        out = None
        if keep.size:
            sub = pdf.iloc[keep]
            out = _pd.DataFrame(
                {
                    "user_id": np.full(keep.size, user_id, dtype="int64"),
                    "ts": sub["ts"].to_numpy(),
                    "value": sub["value"].to_numpy(),
                    "prev_value": _pd.Series(prev[keep], dtype="float64"),
                }
            )
        last_value = float(v[-1])
        last_ts = int(_pd.Timestamp(pdf["ts"].iloc[-1]).value // 1000)
        state.update((last_ts, last_value))
        if out is not None:
            yield out

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
