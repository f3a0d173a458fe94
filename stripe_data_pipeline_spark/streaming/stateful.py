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
