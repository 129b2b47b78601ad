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
    session_col: str = "session",
) -> DataFrame:
    """Per-event session numbers (1-based, increment when the gap to
    the previous event exceeds the timeout), continuous across
    micro-batches. Streaming input only — Spark rejects
    applyInPandasWithState in batch queries; use
    `operators.events.sessionize` for batch.

    The output schema is DERIVED from the input: (entity_col, id_col,
    ts_col) keep their incoming names and types, plus a long
    `session_col` — string entity ids work as-is (ADVICE r1: the
    hardcoded long user_id/event_id schema cast-failed on any other
    shape).
    """
    gap_us = int(timeout_seconds * 1_000_000)
    in_schema = events.schema
    out_schema = StructType(
        [
            in_schema[entity_col],
            in_schema[id_col],
            in_schema[ts_col],
            StructField(session_col, LongType()),
        ]
    )

    def assign(key, pdfs, state: GroupState):
        import pandas as pd

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
                entity_col: pdf[entity_col],
                id_col: pdf[id_col],
                ts_col: pdf[ts_col],
                session_col: pd.Series(sessions, index=pdf.index, dtype="int64"),
            }
        )

    return events.groupBy(entity_col).applyInPandasWithState(
        assign,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
