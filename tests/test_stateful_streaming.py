"""applyInPandasWithState: running latest-state over a file stream,
converging across micro-batches to the batch compaction's answer."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from stripe_data_pipeline_spark.streaming.events import EVENT_SCHEMA
from stripe_data_pipeline_spark.streaming.stateful import streaming_latest_state


def _write_ndjson(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _event(i, ts, user=1, typ="click", value=1.0):
    return {
        "event_id": i,
        "ts": ts,
        "user_id": user,
        "event_type": typ,
        "value": value,
        "props": "{}",
    }


def _drain(spark, inbox, ckpt, target):
    """Drain the drop through the stateful operator into a parquet
    state table (update-mode merge by key) — a sink that supports
    checkpoint recovery, unlike the memory sink."""
    from stripe_data_pipeline_spark.incremental import merge_upsert

    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(inbox))

    def merge(batch, _id):
        if not batch.isEmpty():
            merge_upsert(batch.sparkSession, str(target), batch, keys=["user_id"])

    q = (
        streaming_latest_state(stream)
        .writeStream.foreachBatch(merge)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        r["user_id"]: r["event_id"]
        for r in spark.read.parquet(str(target)).collect()
    }


def test_latest_state_converges_across_batches(spark, tmp_path):
    inbox, ckpt, target = tmp_path / "inbox", tmp_path / "ckpt", tmp_path / "state"

    _write_ndjson(
        inbox / "b1.json",
        [
            _event(1, "2024-01-01T00:00:00Z", user=1, typ="a"),
            _event(2, "2024-01-01T02:00:00Z", user=1, typ="b"),
            _event(3, "2024-01-01T01:00:00Z", user=2, typ="c"),
        ],
    )
    got = _drain(spark, inbox, ckpt, target)
    assert got == {1: 2, 2: 3}

    # second drop: out-of-order (older event) must NOT displace state;
    # newer event for user 2 must
    _write_ndjson(
        inbox / "b2.json",
        [
            _event(4, "2024-01-01T01:30:00Z", user=1, typ="late"),
            _event(5, "2024-01-01T03:00:00Z", user=2, typ="new"),
        ],
    )
    got = _drain(spark, inbox, ckpt, target)
    # user 1's state survived (event 2 still newest); user 2 advanced
    assert got == {1: 2, 2: 5}


def test_stateful_matches_batch_compaction(spark, sf_dir, tmp_path):
    from stripe_data_pipeline_spark.io import read_table
    from stripe_data_pipeline_spark.streaming.events import latest_state_per_key

    events = read_table(spark, sf_dir, "events")
    # batch path
    batch = {
        r["user_id"]: r["event_id"] for r in latest_state_per_key(events).collect()
    }
    # stream path: one drop containing everything
    inbox, ckpt = tmp_path / "inbox", tmp_path / "ckpt"
    inbox.mkdir(parents=True)
    events.withColumn("ts", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")).coalesce(
        1
    ).write.mode("overwrite").json(str(inbox / "all"))
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(inbox / "all"))
    q = (
        streaming_latest_state(stream)
        .writeStream.format("memory")
        .queryName("latest_all")
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        r["user_id"]: r["event_id"]
        for r in spark.sql("SELECT * FROM latest_all").collect()
    }
    assert streamed == batch


# ---------------------------------------------------------------------------
# transformWithState (Spark 4) — the successor API, same fold contract
# ---------------------------------------------------------------------------


def _drain_tws(spark, inbox, ckpt, target, ttl_ms=None):
    from stripe_data_pipeline_spark.incremental import merge_upsert
    from stripe_data_pipeline_spark.streaming.stateful import (
        streaming_latest_state_tws,
    )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(inbox))

    def merge(batch, _id):
        if not batch.isEmpty():
            merge_upsert(batch.sparkSession, str(target), batch, keys=["user_id"])

    writer = (
        streaming_latest_state_tws(stream, ttl_ms=ttl_ms)
        .writeStream.foreachBatch(merge)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
    )
    if ttl_ms is None:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        # ProcessingTime timeMode (required for TTL) keeps issuing
        # empty state-cleanup batches forever, so neither availableNow
        # termination nor processAllAvailable ever returns — poll for
        # the completed DATA batch instead, then stop
        import time

        q = writer.start()
        deadline = time.time() + 120
        while time.time() < deadline:
            if any(
                getattr(p, "numInputRows", 0) > 0
                for p in (q.recentProgress or [])
            ):
                break
            time.sleep(0.25)
        else:
            q.stop()
            raise AssertionError("TTL drain never processed its batch")
        q.stop()
        q.awaitTermination()
    return {
        r["user_id"]: r["event_id"]
        for r in spark.read.parquet(str(target)).collect()
    }


def test_tws_latest_state_converges_across_batches(spark, tmp_path):
    """transformWithState (named ValueState on the handle) must fold
    to the same winners as the applyInPandasWithState operator —
    including out-of-order delivery across separate drains (state
    recovered from the RocksDB checkpoint)."""
    inbox, ckpt, target = tmp_path / "in", tmp_path / "ck", tmp_path / "st"
    _write_ndjson(
        inbox / "b1.json",
        [_event(1, "2024-01-01T00:00:00Z"), _event(2, "2024-01-03T00:00:00Z")],
    )
    got = _drain_tws(spark, inbox, ckpt, target)
    assert got == {1: 2}
    # older event arrives later: state must keep the newer winner
    _write_ndjson(inbox / "b2.json", [_event(3, "2024-01-02T00:00:00Z")])
    got = _drain_tws(spark, inbox, ckpt, target)
    assert got == {1: 2}
    # genuinely newer event replaces it
    _write_ndjson(inbox / "b3.json", [_event(4, "2024-01-04T00:00:00Z")])
    got = _drain_tws(spark, inbox, ckpt, target)
    assert got == {1: 4}


def test_tws_value_state_ttl_expires_idle_keys(spark, tmp_path):
    """ValueState TTL (processing-time): after the TTL elapses between
    drains, the key's state is gone — an OLDER event then wins the
    fresh fold, which is observable proof of expiry (without TTL the
    newer batch-1 winner would survive, as the test above pins)."""
    import time

    inbox, ckpt, target = tmp_path / "in", tmp_path / "ck", tmp_path / "st"
    _write_ndjson(inbox / "b1.json", [_event(10, "2024-06-01T00:00:00Z")])
    got = _drain_tws(spark, inbox, ckpt, target, ttl_ms=1000)
    assert got == {1: 10}
    time.sleep(3.0)  # let the 1s TTL lapse
    _write_ndjson(inbox / "b2.json", [_event(11, "2024-01-01T00:00:00Z")])
    got = _drain_tws(spark, inbox, ckpt, target, ttl_ms=1000)
    assert got == {1: 11}  # expired state: the OLDER event wins anew


def test_tws_timer_closes_idle_session(spark, tmp_path):
    """transformWithState TIMERS: after gap_ms of inactivity the
    ENGINE calls handleExpiredTimer — the session's 'closed' row is
    emitted by a no-data batch (push-based close; nothing arrives to
    trigger it) and the state is evicted."""
    import time

    from stripe_data_pipeline_spark.streaming.stateful import (
        streaming_session_timeout,
    )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    inbox, ckpt = tmp_path / "in", tmp_path / "ck"
    _write_ndjson(
        inbox / "b1.json",
        [_event(1, "2024-01-01T00:00:00Z"), _event(2, "2024-01-01T00:00:01Z")],
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(inbox))
    rows: list = []

    def sink(batch, _id):
        rows.extend(batch.collect())  # foreachBatch runs driver-side

    q = (
        streaming_session_timeout(stream, gap_ms=1500)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if any(r["status"] == "closed" for r in rows):
                break
            time.sleep(0.25)
        else:
            raise AssertionError(f"no closed session within 90s: {rows}")
    finally:
        q.stop()
        q.awaitTermination()
    opens = [r for r in rows if r["status"] == "open"]
    closed = [r for r in rows if r["status"] == "closed"]
    assert opens and opens[-1]["n_events"] == 2
    assert closed[0]["user_id"] == 1
    assert closed[0]["n_events"] == 2
    assert closed[0]["last_event_id"] == 2


def test_tws_map_and_list_state_profile(spark, tmp_path):
    """MapState per-type counters + bounded ListState recents — the
    remaining transformWithState variable types. Two drains: counters
    accumulate point-wise across batches (recovered from the RocksDB
    checkpoint), the recents list truncates to the newest 5."""
    from stripe_data_pipeline_spark.streaming.stateful import (
        streaming_user_profile,
    )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    inbox, ckpt = tmp_path / "in", tmp_path / "ck"
    rows: list = []

    def drain():
        stream = spark.readStream.schema(EVENT_SCHEMA).json(str(inbox))
        q = (
            streaming_user_profile(stream, keep=5)
            .writeStream.foreachBatch(lambda b, _id: rows.extend(b.collect()))
            .outputMode("update")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r["user_id"]: r for r in rows}

    _write_ndjson(
        inbox / "b1.json",
        [_event(i, "2024-01-01T00:00:00Z", typ=t)
         for i, t in [(1, "view"), (2, "view"), (3, "click")]],
    )
    got = drain()
    assert got[1]["n_events"] == 3 and got[1]["n_types"] == 2
    assert got[1]["top_type"] == "view"
    assert got[1]["recent_ids"] == "1,2,3"
    # second drain: counters accumulate, list truncates to newest 5
    _write_ndjson(
        inbox / "b2.json",
        [_event(i, "2024-01-01T00:01:00Z", typ=t)
         for i, t in [(4, "click"), (5, "click"), (6, "buy")]],
    )
    rows.clear()
    got = drain()
    assert got[1]["n_events"] == 6 and got[1]["n_types"] == 3
    assert got[1]["top_type"] == "click"  # 3 clicks > 2 views
    assert got[1]["recent_ids"] == "2,3,4,5,6"  # keep=5, id 1 aged out


def test_statestore_reader_covers_map_and_list_state(spark, tmp_path):
    """State introspection across the remaining variable types
    (extending the driver's statestore_reader_check, which covers
    ValueState): after draining the profile query, the MapState
    counters and the ListState recents read back as DataFrames and
    must equal what the processor emitted."""
    from stripe_data_pipeline_spark.streaming.stateful import (
        streaming_user_profile,
    )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    inbox, ckpt = tmp_path / "in", tmp_path / "ck"
    _write_ndjson(
        inbox / "b1.json",
        [_event(i, "2024-01-01T00:00:00Z", typ=t)
         for i, t in [(1, "view"), (2, "view"), (3, "click")]],
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(inbox))
    rows: list = []
    (
        streaming_user_profile(stream, keep=5)
        .writeStream.foreachBatch(lambda b, _id: rows.extend(b.collect()))
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    counts = (
        spark.read.format("statestore")
        .option("stateVarName", "type_counts")
        .load(str(ckpt))
    )
    got_counts = {
        (r["key"]["user_id"], r["user_map_key"]["event_type"]):
            r["user_map_value"]["cnt"]
        for r in counts.collect()
    }
    assert got_counts == {(1, "view"): 2, (1, "click"): 1}
    recents = (
        spark.read.format("statestore")
        .option("stateVarName", "recent")
        .option("flattenCollectionTypes", "true")
        .load(str(ckpt))
    )
    got_recent = sorted(
        r["list_element"]["event_id"] for r in recents.collect()
    )
    assert got_recent == [1, 2, 3]
