"""Custom stateful streaming operator: running latest-state per key
via ``applyInPandasWithState`` (SURVEY.md §2.10 — the continuous
version of the changelog compaction that `latest_event_per_user`
does in batch).

State per key = (best_ts_micros, best_event_id, event_type, value):
each micro-batch folds its rows into the state and emits the current
winner, so the sink always converges to the newest event per key no
matter how the input is micro-batched — including out-of-order and
duplicate delivery.

Pandas/Arrow note: state crosses the boundary as a tuple matching
STATE_SCHEMA; timestamps travel as int64 micros to keep the state
codec trivial.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor

STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_micros", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_micros", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _fold_latest(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    best = state.get if state.exists else None  # (ts, id, type, value)
    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            cand = (
                int(row.ts_micros),
                int(row.event_id),
                str(row.event_type),
                float(row.value),
            )
            # newest ts wins; event_id breaks ties (same rule as the
            # batch row_number compaction)
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
    state.update(best)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_id": [best[1]],
            "ts_micros": [best[0]],
            "event_type": [best[2]],
            "value": [best[3]],
        }
    )


def streaming_latest_state(events: DataFrame, key: str = "user_id") -> DataFrame:
    """events (streaming or batch DF with ts TimestampType) ->
    one running-latest row per key, updated every micro-batch."""
    prepared = events.withColumn(
        "ts_micros", F.unix_micros(F.col("ts"))
    ).select(key, "event_id", "ts_micros", "event_type", "value")
    return prepared.groupBy(key).applyInPandasWithState(
        _fold_latest,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithState (Spark 4) — the replacement state API
# ---------------------------------------------------------------------------


class LatestStateProcessor(StatefulProcessor):
    """The same running-latest fold as ``_fold_latest``, on Spark 4's
    ``transformWithState`` API (VERDICT r10 #4 — the successor to
    applyInPandasWithState): state lives in NAMED, TYPED variables on
    a ``StatefulProcessorHandle`` (here one ValueState tuple per key)
    instead of one opaque per-key blob, the handle can hold several
    state variables / timers per processor, and each variable can
    carry its own TTL — the API Spark is consolidating stateful
    Python on.

    ``ttl_ms`` (processing-time TTL on the value state; requires
    timeMode='ProcessingTime') expires a key's state after idleness —
    the bounded-state knob for key spaces that churn (session-scoped
    ids at 100 TB/day): an expired key simply starts a fresh fold.
    """

    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle) -> None:  # StatefulProcessorHandle
        self._state = handle.getValueState(
            "latest", STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        best = self._state.get() if self._state.exists() else None
        for pdf in rows:
            for row in pdf.itertuples(index=False):
                cand = (
                    int(row.ts_micros),
                    int(row.event_id),
                    str(row.event_type),
                    float(row.value),
                )
                if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                    best = cand
        self._state.update(best)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "event_id": [best[1]],
                "ts_micros": [best[0]],
                "event_type": [best[2]],
                "value": [best[3]],
            }
        )

    def close(self) -> None:
        pass


def streaming_latest_state_tws(
    events: DataFrame,
    key: str = "user_id",
    ttl_ms: int | None = None,
) -> DataFrame:
    """``streaming_latest_state`` on the transformWithState API; same
    input/output contract, so the two operators are interchangeable
    (and oracle-checked against the same batch ROW_NUMBER compaction).
    ``ttl_ms`` switches to ProcessingTime mode and expires idle keys'
    state after the duration."""
    from stripe_data_pipeline_spark.streaming.pbshim import (
        ensure_protobuf_runtime,
    )

    if not ensure_protobuf_runtime(events.sparkSession):
        raise ModuleNotFoundError(
            "transformWithState needs a google.protobuf runtime for its "
            "JVM<->Python state protocol and none is importable or "
            "vendorable on this host (streaming/pbshim.py); use "
            "streaming_latest_state (applyInPandasWithState) instead"
        )
    proc = LatestStateProcessor(ttl_ms=ttl_ms)
    prepared = events.withColumn(
        "ts_micros", F.unix_micros(F.col("ts"))
    ).select(key, "event_id", "ts_micros", "event_type", "value")
    return prepared.groupBy(key).transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None" if ttl_ms is None else "ProcessingTime",
    )
