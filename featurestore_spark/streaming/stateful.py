"""Custom stateful streaming operators via applyInPandasWithState.

`session_window` (streaming/ops.py) emits session *intervals*; the
reference's W1 semantics assign incrementing session *numbers* per
entity (eventFunctions.scala:77-96), which no built-in streaming
operator expresses. This is the (c)-tier custom-operator pattern:
per-group state = (last event time, session counter), carried across
micro-batches by the state store.

Within a micro-batch, events of a group are sorted by event time and
scanned; across batches the state continues the numbering. Correct
under ordered arrival (per-entity event time monotone across
batches — the usual log-ingestion case); late events would need a
watermark + retraction design, out of scope here as in the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("session", LongType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("session_no", LongType()),
    ]
)


def stateful_sessionize(
    events: DataFrame,
    timeout_seconds: float,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-event session numbers (1-based, increment when the gap to
    the previous event exceeds the timeout), continuous across
    micro-batches. Works on a streaming OR batch grouped input."""
    gap_us = int(timeout_seconds * 1_000_000)

    def assign(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            last_ts_us, session_no = state.get
        else:
            last_ts_us, session_no = None, 0
        frames = [pdf for pdf in pdfs]
        pdf = pd.concat(frames).sort_values([ts_col, id_col])
        ts_us = pdf[ts_col].astype("int64")  # pandas datetime64[us/ns] -> int
        unit_div = 1000 if str(pdf[ts_col].dtype).endswith("[ns]") else 1
        sessions = []
        for t in ts_us:
            t_us = int(t) // unit_div
            if last_ts_us is None or t_us - last_ts_us > gap_us:
                session_no += 1
            last_ts_us = t_us
            sessions.append(session_no)
        state.update((last_ts_us, session_no))
        yield pd.DataFrame(
            {
                "user_id": pdf[entity_col].astype("int64"),
                "event_id": pdf[id_col].astype("int64"),
                "ts": pdf[ts_col],
                "session": pd.Series(sessions, index=pdf.index, dtype="int64"),
            }
        )

    return events.groupBy(entity_col).applyInPandasWithState(
        assign,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
