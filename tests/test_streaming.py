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


def test_streaming_dedup_mart_collapses_planted_duplicates(spark, tmp_path):
    """Dedup-on-ingest: exact-duplicate contents planted across TWO
    source files (two micro-batches under maxFilesPerTrigger=1) must
    collapse to one mart row per content — including cross-batch dups,
    which only the merge sink (not per-batch dropDuplicates) catches."""
    from stripe_data_pipeline_spark.catalog.streaming_queries import (
        _materialized_streaming_dedup_mart,
    )

    src = tmp_path / "src"
    src.mkdir()
    a = spark.createDataFrame(
        [
            (1, "the quick brown fox", "en", 19),
            (2, "unique doc alpha", "en", 16),
            (3, "THE  QUICK   brown fox ", "en", 23),  # dup of 1 after norm
        ],
        "doc_id long, text string, lang string, n_chars long",
    )
    b = spark.createDataFrame(
        [
            (4, "the quick brown fox", "en", 19),  # cross-batch dup of 1
            (5, "unique doc beta", "en", 15),
        ],
        "doc_id long, text string, lang string, n_chars long",
    )
    # the source globs documents*.parquet: materialize each batch as a
    # single plain parquet FILE so maxFilesPerTrigger=1 yields two
    # micro-batches with the dup split across them
    import glob
    import shutil

    for name, df in (("documents_a.parquet", a), ("documents_b.parquet", b)):
        ds = src / ("_ds_" + name)
        df.coalesce(1).write.parquet(str(ds))
        part = glob.glob(str(ds / "part-*.parquet"))[0]
        shutil.move(part, src / name)
        shutil.rmtree(ds)
    mart = _materialized_streaming_dedup_mart(spark, str(src))
    rows = mart.collect()
    keys = [r["content_key"] for r in rows]
    # 5 docs; docs 1, 3 (same batch) and 4 (cross-batch) share one
    # normalized content -> 3 unique contents survive
    assert len(keys) == len(set(keys)) == 3


def test_windowed_counts_complete_mode_across_batches(spark, sf_dir, tmp_path):
    """Cross-batch window state: the same window key arriving in
    DIFFERENT micro-batches must accumulate, and complete mode must
    emit every window's final count — equal to the batch rollup over
    the union. (The catalog's streaming_windowed_counts_mart_check
    runs this topology; at the driver's SF events is a single file /
    single batch, so this test is what actually exercises multi-batch
    state.)"""
    import os

    from pyspark.sql import functions as F

    from stripe_data_pipeline_spark.io import read_table

    events = read_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = str(tmp_path / "drop")
    # three overlapping hash slices -> same hour windows span batches
    for i in range(3):
        events.filter(F.col("event_id") % 3 == i).coalesce(1).write.parquet(
            os.path.join(src, f"part{i}"),
        )
        # flatten: move the part file up as events_<i>.parquet
        import glob as g
        import shutil

        f = g.glob(os.path.join(src, f"part{i}", "*.parquet"))[0]
        shutil.move(f, os.path.join(src, f"events_{i}.parquet"))
        shutil.rmtree(os.path.join(src, f"part{i}"))

    schema = spark.read.parquet(os.path.join(src, "events_0.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events_*.parquet")
        .parquet(src)
        .withWatermark("ts", "1 hour")
    )
    out = windowed_event_counts(stream, window="1 hour")
    mart = str(tmp_path / "mart")

    def overwrite(batch, _bid):
        batch.write.mode("overwrite").parquet(mart)

    (
        out.writeStream.foreachBatch(overwrite)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.read.parquet(mart).collect()
    }
    want = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in windowed_event_counts(events, window="1 hour").collect()
    }
    assert got == want


def test_session_window_exact_gap_boundary_merges(spark):
    """Pin the semantics the streaming_session_windows_mart_check
    oracle encodes: an event landing EXACTLY gap after the previous
    one merges into the session ([start, last+gap) ranges touching
    counts as overlap), while gap+1s starts a new session; session
    end is last event + gap."""
    import datetime as dt

    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base),
        (1, base + dt.timedelta(minutes=30)),          # == gap: merges
        (1, base + dt.timedelta(minutes=60, seconds=1)),  # > gap: new
        (2, base),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = sorted(
        (
            r["user_id"],
            r["session_window"]["start"],
            r["session_window"]["end"],
            r["n"],
        )
        for r in df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert got == [
        (1, base, base + dt.timedelta(minutes=60), 2),
        (
            1,
            base + dt.timedelta(minutes=60, seconds=1),
            base + dt.timedelta(minutes=90, seconds=1),
            1,
        ),
        (2, base, base + dt.timedelta(minutes=30), 1),
    ]


def test_streaming_session_windows_match_batch_sessionization(spark, sf_dir):
    """The streamed session mart == batch session_window == the
    lag/cumsum sessionization shape (the oracle's formulation), on
    the real events table."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stripe_data_pipeline_spark.catalog.streaming_queries import (
        q_streaming_session_windows_mart_check,
    )
    from stripe_data_pipeline_spark.io import read_table

    got = {
        (r["user_id"], r["session_start"]): (
            r["session_end"],
            r["n_events"],
            r["session_cents"],
        )
        for r in q_streaming_session_windows_mart_check(
            spark, sf_dir
        ).collect()
    }
    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts")
    secs = F.col("ts").cast("timestamp").cast("long")  # NTZ -> epoch
    brk = F.when(
        secs - F.lag(secs).over(w) > 1800,
        1,
    ).otherwise(0)
    sess = (
        ev.withColumn("brk", brk)
        .withColumn(
            "sid",
            F.sum("brk").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            (F.max("ts") + F.expr("interval 30 minutes")).alias(
                "session_end"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
            .cast("bigint")
            .alias("session_cents"),
        )
    )
    want = {
        (r["user_id"], r["session_start"]): (
            r["session_end"],
            r["n_events"],
            r["session_cents"],
        )
        for r in sess.collect()
    }
    assert got == want
