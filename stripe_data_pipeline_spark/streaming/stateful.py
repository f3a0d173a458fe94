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


class LatestStateBootstrapProcessor(LatestStateProcessor):
    """``LatestStateProcessor`` with INITIAL-STATE bootstrap (VERDICT
    r11 #8 — the batch->streaming migration every production team
    performs): the new streaming query starts from the batch mart's
    current per-key state via ``transformWithStateInPandas(
    initialState=...)`` instead of refolding history. Spark calls
    ``handleInitialState`` once per bootstrapped key before its first
    input rows; it may only SEED state (no emissions), so the
    migration seeds the serving mart from the batch rows separately
    and lets update-mode emissions converge it. Correctness is
    load-bearing: a key whose overall latest lives in the batch half
    but that receives new streaming rows would emit a WRONG
    stream-only maximum if the seed were dropped."""

    def handleInitialState(self, key, initialState, timerValues) -> None:
        row = (
            next(initialState.itertuples(index=False))
            if isinstance(initialState, pd.DataFrame)
            else initialState
        )
        self._state.update(
            (
                int(row.ts_micros),
                int(row.event_id),
                str(row.event_type),
                float(row.value),
            )
        )


def streaming_latest_state_tws_bootstrap(
    events: DataFrame,
    initial: DataFrame,
    key: str = "user_id",
) -> DataFrame:
    """``streaming_latest_state_tws`` bootstrapped from a batch mart:
    ``initial`` carries one row per key in OUTPUT_SCHEMA shape (the
    batch mart's current latest); the stream folds NEW events on top
    of that seeded state. Same output contract, same batch ROW_NUMBER
    oracle over the union of both halves."""
    from stripe_data_pipeline_spark.streaming.pbshim import (
        ensure_protobuf_runtime,
    )

    if not ensure_protobuf_runtime(events.sparkSession):
        raise ModuleNotFoundError(
            "transformWithState needs a google.protobuf runtime "
            "(streaming/pbshim.py)"
        )
    prepared = events.withColumn(
        "ts_micros", F.unix_micros(F.col("ts"))
    ).select(key, "event_id", "ts_micros", "event_type", "value")
    return prepared.groupBy(key).transformWithStateInPandas(
        statefulProcessor=LatestStateBootstrapProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
        initialState=initial.groupBy(key),
    )


# ---------------------------------------------------------------------------
# transformWithState TIMERS — session close on inactivity
# ---------------------------------------------------------------------------

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("status", T.StringType()),   # open | closed
        T.StructField("n_events", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
    ]
)

_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
    ]
)


class SessionTimeoutProcessor(StatefulProcessor):
    """Inactivity-closed sessions on transformWithState TIMERS — the
    third leg of the new state API after named state and TTL: every
    batch refreshes the key's state AND re-registers a processing-time
    timer ``gap_ms`` ahead (deleting the previous one); when no batch
    touches the key before the timer fires, ``handleExpiredTimer``
    emits the key's CLOSED session row and evicts the state — the
    push-based session close a foreachBatch poller can't express
    (nothing arrives to trigger it; the ENGINE calls back). Per-key
    cost: one state tuple + one registered timer."""

    def __init__(self, gap_ms: int = 2000) -> None:
        self._gap_ms = gap_ms

    def init(self, handle) -> None:
        self._handle = handle
        self._state = handle.getValueState("sess", _SESSION_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        cur = self._state.get() if self._state.exists() else (0, -1)
        n, last = int(cur[0]), int(cur[1])
        for pdf in rows:
            for row in pdf.itertuples(index=False):
                n += 1
                last = max(last, int(row.event_id))
        self._state.update((n, last))
        # slide the inactivity timer: drop the old one, arm a new one
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._handle.registerTimer(
            timerValues.getCurrentProcessingTimeInMs() + self._gap_ms
        )
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "status": ["open"],
                "n_events": [n],
                "last_event_id": [last],
            }
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        cur = self._state.get() if self._state.exists() else (0, -1)
        self._state.clear()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "status": ["closed"],
                "n_events": [int(cur[0])],
                "last_event_id": [int(cur[1])],
            }
        )

    def close(self) -> None:
        pass


def streaming_session_timeout(
    events: DataFrame, gap_ms: int = 2000, key: str = "user_id"
) -> DataFrame:
    """Per-key inactivity sessions: 'open' rows on every update,
    one 'closed' row when the processing-time gap elapses with no new
    events (timer-driven state eviction)."""
    from stripe_data_pipeline_spark.streaming.pbshim import (
        ensure_protobuf_runtime,
    )

    if not ensure_protobuf_runtime(events.sparkSession):
        raise ModuleNotFoundError(
            "transformWithState needs a google.protobuf runtime "
            "(streaming/pbshim.py)"
        )
    prepared = events.select(key, "event_id")
    return prepared.groupBy(key).transformWithStateInPandas(
        statefulProcessor=SessionTimeoutProcessor(gap_ms=gap_ms),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime",
    )


# ---------------------------------------------------------------------------
# transformWithState LIST + MAP state — running per-key profile
# ---------------------------------------------------------------------------

PROFILE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_types", T.LongType()),
        T.StructField("top_type", T.StringType()),
        T.StructField("recent_ids", T.StringType()),  # csv of last-N ids
    ]
)


class UserProfileProcessor(StatefulProcessor):
    """Running per-user profile on the remaining state-variable types
    (completing the transformWithState sweep: ValueState/TTL/timers
    elsewhere in this module):

    - ``MapState[event_type -> count]``: per-type counters updated
      point-wise — the engine stores each map ENTRY as its own
      state-store key, so a key's map can grow wide without
      rewriting a blob per update (what a ValueState of a dict
      would do);
    - ``ListState`` of recent event ids, truncated to the newest
      ``keep`` client-side — append is O(1) in the store.

    Emissions are deterministic: top_type breaks count ties by the
    SMALLEST type string, recent ids are sorted ascending."""

    def __init__(self, keep: int = 5) -> None:
        self._keep = keep

    def init(self, handle) -> None:
        self._counts = handle.getMapState(
            "type_counts", "event_type string", "cnt bigint"
        )
        self._recent = handle.getListState("recent", "event_id bigint")

    def handleInputRows(self, key, rows, timerValues):
        for pdf in rows:
            for row in pdf.itertuples(index=False):
                t = str(row.event_type)
                cur = (
                    int(self._counts.getValue((t,))[0])
                    if self._counts.containsKey((t,))
                    else 0
                )
                self._counts.updateValue((t,), (cur + 1,))
                self._recent.appendValue((int(row.event_id),))
        ids = sorted(int(r[0]) for r in self._recent.get())
        if len(ids) > self._keep:
            ids = ids[-self._keep:]
            self._recent.clear()
            self._recent.put([(i,) for i in ids])
        counts = {
            str(k[0]): int(v[0]) for k, v in self._counts.iterator()
        }
        top = min(
            counts, key=lambda t: (-counts[t], t)
        )  # max count, ties to smallest type
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [sum(counts.values())],
                "n_types": [len(counts)],
                "top_type": [top],
                "recent_ids": [",".join(str(i) for i in ids)],
            }
        )

    def close(self) -> None:
        pass


def streaming_user_profile(
    events: DataFrame, keep: int = 5, key: str = "user_id"
) -> DataFrame:
    """Per-key running profile (per-type MapState counters + a
    bounded ListState of recent event ids), emitted every update."""
    from stripe_data_pipeline_spark.streaming.pbshim import (
        ensure_protobuf_runtime,
    )

    if not ensure_protobuf_runtime(events.sparkSession):
        raise ModuleNotFoundError(
            "transformWithState needs a google.protobuf runtime "
            "(streaming/pbshim.py)"
        )
    prepared = events.select(key, "event_id", "event_type")
    return prepared.groupBy(key).transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(keep=keep),
        outputStructType=PROFILE_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
