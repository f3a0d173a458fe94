"""As-of join semantics on a hand-built fixture: backward, inclusive,
NULL when nothing precedes."""

from __future__ import annotations

import datetime as dt

from stripe_data_pipeline_spark.operators.asof import asof_join

TS = dt.datetime


def test_asof_backward_inclusive_and_null(spark):
    left = spark.createDataFrame(
        [
            (1, 10, TS(2024, 1, 5)),   # after r2 -> matches r2
            (2, 10, TS(2024, 1, 3)),   # exactly at r2 -> inclusive match
            (3, 10, TS(2024, 1, 1)),   # before any right row -> NULL
            (4, 99, TS(2024, 1, 9)),   # key with no right rows -> NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, TS(2024, 1, 2), 100),
            (10, TS(2024, 1, 3), 200),
            (10, TS(2024, 1, 8), 300),  # after every left ts -> never matched
        ],
        "user_id long, rts timestamp, val long",
    )
    out = asof_join(left, right, key="user_id", left_ts="ts", right_ts="rts",
                    payload=["val"])
    got = {r["event_id"]: r["val"] for r in out.collect()}
    assert got == {1: 200, 2: 200, 3: None, 4: None}
    assert out.count() == 4  # every left row preserved
