"""Structured Streaming tests (SURVEY.md §2.10): AvailableNow drain of
an event drop with dedup + foreachBatch merge; changelog compaction."""

from __future__ import annotations

import json

from stripe_data_pipeline_spark.streaming.events import (
    latest_state_per_key,
    stream_events_to_table,
    windowed_event_counts,
)


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


def test_stream_drain_dedup_merge(spark, tmp_path):
    inbox = tmp_path / "inbox"
    target = str(tmp_path / "events_table")
    ckpt = str(tmp_path / "ckpt")

    _write_ndjson(
        inbox / "batch1.json",
        [
            _event(1, "2024-01-01T00:00:00Z"),
            _event(2, "2024-01-01T01:00:00Z"),
            _event(2, "2024-01-01T01:00:00Z"),  # duplicate delivery
        ],
    )
    stream_events_to_table(spark, str(inbox), target, ckpt)
    got = spark.read.parquet(target)
    assert sorted(r["event_id"] for r in got.collect()) == [1, 2]

    # second drop: one new file; checkpoint means batch1 is not re-read,
    # and re-delivered event 2 merges idempotently
    _write_ndjson(
        inbox / "batch2.json",
        [_event(2, "2024-01-01T01:00:00Z"), _event(3, "2024-01-01T02:00:00Z")],
    )
    stream_events_to_table(spark, str(inbox), target, ckpt)
    got = spark.read.parquet(target)
    assert sorted(r["event_id"] for r in got.collect()) == [1, 2, 3]


def test_latest_state_compaction(spark, sf_dir):
    from stripe_data_pipeline_spark.io import read_table

    events = read_table(spark, sf_dir, "events")
    latest = latest_state_per_key(events)
    assert latest.count() == events.select("user_id").distinct().count()
    # the kept row per user is the max-ts row
    row = latest.filter(latest["user_id"] == 0).first()
    mx = events.filter(events["user_id"] == 0).agg({"ts": "max"}).first()[0]
    assert row["ts"] == mx


def test_windowed_counts_match_batch_groupby(spark, sf_dir):
    from pyspark.sql import functions as F

    from stripe_data_pipeline_spark.io import read_table

    events = read_table(spark, sf_dir, "events")
    win = windowed_event_counts(events, "1 hour")
    total = win.agg(F.sum("n_events")).first()[0]
    assert total == events.count()
