"""Streaming→mart integration query (SURVEY.md §2.10; VERDICT r02 #8).

The streaming machinery (file source → ``foreachBatch`` merge →
``Trigger.AvailableNow``) was previously proven only in pytest; this
module registers a driver-checkable query that runs the ACTUAL
streaming write path over the events table and oracle-checks the
resulting mart against plain batch SQL. Same unified-engine claim the
batch/streaming invoice pipeline makes (streaming/invoices.py): the
streaming sink's table must equal what one batch query computes.

At 100 TB the pattern is identical — the file source lists new
objects per trigger, each micro-batch is an ordinary Spark job, and
the merge sink rewrites only touched partitions; AvailableNow drains
a backlog with bounded batches (maxFilesPerTrigger) instead of one
giant job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stripe_data_pipeline_spark.catalog.registry import register
from stripe_data_pipeline_spark.functions.money import sum_usd_cents, sum_usd_cents_sql
from stripe_data_pipeline_spark.incremental import merge_upsert
from stripe_data_pipeline_spark.io import convert_nanos_ts

# Session-scoped cache: sf_dir -> merged mart path. Keyed by sf_dir
# PATH only (stale if the parquet changes mid-process — fine for the
# immutable driver test data); dirs removed at interpreter exit.
_STREAM_MART_CACHE: dict[str, str] = {}


def _cleanup_stream_cache() -> None:
    import shutil

    for p in _STREAM_MART_CACHE.values():
        shutil.rmtree(p, ignore_errors=True)


def _materialized_streaming_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the events table through readStream → foreachBatch
    merge_upsert(event_id) with Trigger.AvailableNow + checkpoint,
    then read the merged mart back.

    The merge key is the natural unique key (event_id), so the final
    table is exactly the deduplicated event set regardless of how the
    source splits micro-batches (maxFilesPerTrigger=1 forces at least
    one batch boundary per input file)."""
    import atexit
    import os
    import tempfile

    path = _STREAM_MART_CACHE.get(sf_dir)
    if path is not None:
        return spark.read.parquet(os.path.join(path, "mart"))

    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="streaming_mart_")
    mart_path = os.path.join(root, "mart")
    ckpt = os.path.join(root, "ckpt")

    # The file-stream source monitors a DIRECTORY; sf_dir is the watch
    # dir with a glob pinning it to the events table's files.
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    staged = convert_nanos_ts(raw)

    def merge(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        merge_upsert(
            batch.sparkSession,
            mart_path,
            batch.dropDuplicates(["event_id"]),
            keys=["event_id"],
        )

    (
        staged.writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    _STREAM_MART_CACHE[sf_dir] = root
    return spark.read.parquet(mart_path)


@register(
    "streaming_merge_mart_check",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {sum_usd_cents_sql("value")} AS total_value,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts
FROM events
GROUP BY event_type
""",
    doc="Streaming→mart round trip: events drained via readStream + "
    "foreachBatch merge_upsert(event_id) under Trigger.AvailableNow "
    "with a checkpoint, then the MERGED TABLE (not the stream) is "
    "aggregated and must bit-match the batch oracle over the same "
    "input — proving the streaming sink writes exactly the batch "
    "table (streaming/invoices.py pattern, driver-checkable).",
)
def q_streaming_merge_mart_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    mart = _materialized_streaming_mart(spark, sf_dir)
    return mart.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        sum_usd_cents(F.col("value")).alias("total_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def _materialized_streaming_dedup_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-on-ingest: drain the documents table through readStream →
    per-batch content fingerprinting → ``foreachBatch``
    merge_upsert(content_key) — the streaming form of
    dedup.exact_dedup_keepers. Whichever copy of a duplicated content
    wins the merge is arrival-order-dependent, so the CHECK aggregates
    order-insensitively (unique-content counts); at 100 TB this is the
    standard dedup-on-arrival pattern: state is the mart itself, keyed
    by a 16-byte content hash, and each micro-batch merges only its
    own keys."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark.operators.dedup import normalized_text

    cache_key = sf_dir + "#dedup"
    path = _STREAM_MART_CACHE.get(cache_key)
    if path is not None:
        return spark.read.parquet(os.path.join(path, "mart"))

    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="streaming_dedup_mart_")
    mart_path = os.path.join(root, "mart")
    ckpt = os.path.join(root, "ckpt")

    import glob as _glob

    schema = spark.read.parquet(
        sorted(_glob.glob(f"{sf_dir}/documents*.parquet"))[0]
    ).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "documents*.parquet")
        .parquet(sf_dir)
    )
    staged = raw.select(
        F.md5(normalized_text()).alias("content_key"),
        "doc_id",
        "lang",
        "n_chars",
    )

    def merge(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        merge_upsert(
            batch.sparkSession,
            mart_path,
            batch.dropDuplicates(["content_key"]),
            keys=["content_key"],
        )

    (
        staged.writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    _STREAM_MART_CACHE[cache_key] = root
    return spark.read.parquet(mart_path)


@register(
    "streaming_dedup_mart_check",
    oracle=r"""
SELECT COUNT(DISTINCT k) AS n_rows,
       COUNT(DISTINCT k) AS n_unique_contents
FROM (
    SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS k
    FROM documents
)
""",
    doc="Streaming dedup-on-ingest round trip: documents drained via "
    "readStream + per-batch content fingerprint + foreachBatch "
    "merge_upsert(content_key), then the MERGED mart is counted — "
    "row count must equal distinct-content count (one survivor per "
    "content) and both must equal the batch oracle's unique-content "
    "count. The check aggregates order-insensitively because which "
    "duplicate copy survives is arrival-order-dependent; the unique "
    "content SET is not.",
)
def q_streaming_dedup_mart_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    mart = _materialized_streaming_dedup_mart(spark, sf_dir)
    return mart.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("content_key").alias("n_unique_contents"),
    )


def _materialized_windowed_counts_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregation through the streaming
    engine into a table: events drain via readStream, flow through
    ``windowed_event_counts`` (watermark + window(1 hour) groupBy —
    the §2.10 stateful-agg shape), and ``foreachBatch`` in COMPLETE
    output mode overwrites the mart each micro-batch, so the final
    table is every window's final count. Complete mode (rather than
    append) is what makes an AvailableNow backlog drain exactly equal
    to the batch rollup: append would hold back windows the watermark
    hasn't closed when the stream ends. At 100 TB the same topology
    runs continuously and the overwrite becomes a partition-scoped
    merge on window_start."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark.streaming.events import windowed_event_counts

    cache_key = sf_dir + "#windows"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is not None:
        return spark.read.parquet(os.path.join(root, "mart"))

    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="streaming_windows_mart_")
    mart_path = os.path.join(root, "mart")
    ckpt = os.path.join(root, "ckpt")

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # watermarks require TIMESTAMP (LTZ); the session is pinned UTC so
    # the cast is value-preserving, and the window bounds are cast back
    # to NTZ below to match the engine's (and the oracle's) ts typing.
    staged = (
        convert_nanos_ts(raw)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
    )
    windows = windowed_event_counts(staged, window="1 hour").select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        F.col("window_end").cast("timestamp_ntz").alias("window_end"),
        "event_type",
        "n_events",
    )

    def overwrite(batch: DataFrame, _batch_id: int) -> None:
        batch.write.mode("overwrite").parquet(mart_path)

    (
        windows.writeStream.foreachBatch(overwrite)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    _STREAM_MART_CACHE[cache_key] = root
    return spark.read.parquet(mart_path)


@register(
    "streaming_windowed_counts_mart_check",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       COUNT(*) AS n_events
FROM events
GROUP BY 1, 2, 3
""",
    doc="Streaming watermarked windowed aggregation -> table: hourly "
    "tumbling-window event counts computed BY THE STREAMING ENGINE "
    "(readStream, watermark, window groupBy, AvailableNow drain, "
    "complete-mode foreachBatch overwrite) must bit-match the batch "
    "date_trunc rollup — the unified-engine guarantee for the "
    "stateful-aggregation shape (SURVEY.md §2.10).",
)
def q_streaming_windowed_counts_mart_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _materialized_windowed_counts_mart(spark, sf_dir)


def _materialized_streaming_atomic_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming drain into the CRASH-ATOMIC manifest sink, then a
    compaction pass: readStream → foreachBatch
    ``manifest_table.merge_upsert_atomic`` partitioned by event_type,
    so every micro-batch is one atomic manifest commit (a crash
    between batches leaves the mart on a complete batch-N snapshot —
    exactly-once at the table level on top of the checkpoint's
    at-least-once re-delivery), followed by ``compact_partition`` on
    every partition (streaming merges leave one file set per batch;
    compaction is just another commit) and a retention vacuum. The
    final aggregate must still bit-match the batch oracle after all
    three protocols ran."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark import manifest_table as MT

    cache_key = sf_dir + "#atomic"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is not None:
        return MT.read_table(spark, os.path.join(root, "mart"))

    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="streaming_atomic_mart_")
    mart_path = os.path.join(root, "mart")
    ckpt = os.path.join(root, "ckpt")

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    staged = convert_nanos_ts(raw)

    def merge(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        # txn_app/txn_version = the Delta txnAppId idiom: a crashed
        # micro-batch re-delivered with the same epoch id is SKIPPED
        # by the manifest's per-app version ledger — exactly-once on
        # top of the checkpoint's at-least-once, without relying on
        # key idempotency (tests/test_manifest_table.py replays one).
        MT.merge_upsert_atomic(
            batch.sparkSession,
            mart_path,
            batch.dropDuplicates(["event_id"]),
            keys=["event_id"],
            partition_by="event_type",
            txn_app="streaming_atomic_mart",
            txn_version=int(batch_id),
        )

    (
        staged.writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    m = MT.read_manifest(mart_path)
    for pv in list(m["parts"]):
        MT.compact_partition(spark, mart_path, pv, target_rows_per_file=1_000_000)
    MT.vacuum(mart_path, grace_sec=0)  # single-writer demo: immediate reap
    _STREAM_MART_CACHE[cache_key] = root
    return MT.read_table(spark, mart_path)


@register(
    "streaming_atomic_merge_mart_check",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {sum_usd_cents_sql("value")} AS total_value,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts
FROM events
GROUP BY event_type
""",
    doc="Streaming -> crash-atomic mart -> compaction round trip: "
    "events drain through foreachBatch into the manifest-committed "
    "sink (one atomic MANIFEST rename per micro-batch, partitioned "
    "by event_type), then EVERY partition is compacted and the table "
    "vacuumed — and the result must still bit-match the batch "
    "oracle. Composes the three manifest_table protocols (atomic "
    "merge, compaction-as-commit, retention vacuum) under one "
    "driver-checked aggregate; per-boundary crash atomicity is "
    "pinned by tests/test_manifest_table.py.",
)
def q_streaming_atomic_merge_mart_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    mart = _materialized_streaming_atomic_mart(spark, sf_dir)
    return mart.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        sum_usd_cents(F.col("value")).alias("total_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def _materialized_streaming_mor_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streamed CDC feed with DELETES landing in the crash-atomic
    mart (r10, VERDICT r9 #7 — composing the two newest subsystems):
    the events table is staged as three feed files (event_id mod 3,
    mtimes forcing batch order 0,1,2), drained via readStream →
    ``foreachBatch``, and each micro-batch runs the full CDC
    protocol against the manifest table:

    1. if the mart has PENDING merge-on-read deletes, materialize
       them first (``apply_deletes``) — ``merge_upsert_atomic``
       REFUSES to run while deletes are pending (the resurrection
       guard), so a CDC loop must drain the delete backlog before
       upserting; this exercises that guard on every batch after
       the first,
    2. merge the batch's rows (atomic manifest commit, partitioned
       by event_type, txn ledger for exactly-once under re-delivery),
    3. ``delete_where_mor`` the batch's tombstone set — users with
       user_id % 37 == batch_id request deletion of every event of
       theirs seen SO FAR (the GDPR trickle shape: commit cost ∝
       matched keys, no partition rewrite).

    Batch 2's deletes stay PENDING at the end, so the final
    ``read_table`` exercises the scan-time anti-join too. The
    surviving-row rule is closed-form — an event in feed file i
    (event_id % 3 = i) from user u (user_id % 37 ∈ {0,1,2}) is
    deleted iff i <= user_id % 37 — which is what the batch oracle
    replays."""
    import atexit
    import os
    import shutil
    import tempfile

    from stripe_data_pipeline_spark import manifest_table as MT

    cache_key = sf_dir + "#mor_stream"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is not None:
        return MT.read_table(spark, os.path.join(root, "mart"))

    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="streaming_mor_mart_")
    feed = os.path.join(root, "feed")
    mart_path = os.path.join(root, "mart")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(feed)

    ev = convert_nanos_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    for i in range(3):
        staging = os.path.join(root, f".stage{i}")
        (
            ev.filter(F.col("event_id") % 3 == i)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(staging)
        )
        part = next(
            f for f in sorted(os.listdir(staging)) if f.endswith(".parquet")
        )
        dst = os.path.join(feed, f"batch-{i}.parquet")
        os.replace(os.path.join(staging, part), dst)
        # the file source picks oldest-mtime first: distinct, widely
        # spaced mtimes make the batch order (and so the CDC result)
        # deterministic
        os.utime(dst, (1_700_000_000 + i * 600, 1_700_000_000 + i * 600))
        shutil.rmtree(staging, ignore_errors=True)

    raw = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )

    def cdc(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        s = batch.sparkSession
        m = MT.read_manifest(mart_path)
        if m is not None and m.get("deletes"):
            MT.apply_deletes(s, mart_path)
        MT.merge_upsert_atomic(
            s,
            mart_path,
            batch.dropDuplicates(["event_id"]),
            keys=["event_id"],
            partition_by="event_type",
            txn_app="streaming_mor_mart",
            txn_version=int(batch_id),
        )
        MT.delete_where_mor(
            s,
            mart_path,
            F.col("user_id") % 37 == int(batch_id) % 37,
            keys=["event_id"],
        )

    (
        raw.writeStream.foreachBatch(cdc)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    _STREAM_MART_CACHE[cache_key] = root
    return MT.read_table(spark, mart_path)


@register(
    "streaming_mor_delete_mart_check",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {sum_usd_cents_sql("value")} AS total_value
FROM events
WHERE NOT (user_id % 37 IN (0, 1, 2) AND event_id % 3 <= user_id % 37)
GROUP BY event_type
""",
    doc="Streamed CDC with merge-on-read DELETES → crash-atomic mart "
    "(VERDICT r9 #7): three deterministic micro-batches each run "
    "apply_deletes (drain pending backlog — the resurrection guard "
    "refuses the merge otherwise), an atomic keyed merge, and a "
    "delete_where_mor tombstone pass (users with user_id % 37 == "
    "batch_id delete their events seen so far; commit cost ∝ matched "
    "keys, zero partition rewrites). The last batch's deletes stay "
    "pending, so the checked read also exercises the scan-time "
    "anti-join. Must bit-match the closed-form batch oracle.",
)
def q_streaming_mor_delete_mart_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    mart = _materialized_streaming_mor_mart(spark, sf_dir)
    return mart.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        sum_usd_cents(F.col("value")).alias("total_value"),
    )


def _materialized_incremental_agg_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two incremental_agg_run folds: the first sees events up to a
    mid-range cutoff, the second sees the WHOLE source again (HWM cuts
    it to the strictly-new rows, so re-delivery cannot double-count).
    The mart stores only (event_type, n_events, total_value_cents,
    __hwm) — group-sized, never event-sized."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark import manifest_table as MT

    cache_key = sf_dir + "#aggmart"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is not None:
        return MT.read_table(spark, os.path.join(root, "mart"))
    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="incr_agg_mart_")
    mart = os.path.join(root, "mart")

    from stripe_data_pipeline_spark.io import read_table as _rt

    ev = _rt(spark, sf_dir, "events").withColumn(
        "value_cents",
        F.floor(F.col("value") * F.lit(100) + F.lit(0.5)).cast("long"),
    )
    cutoff = ev.agg(F.expr("percentile_approx(ts, 0.5)")).first()[0]
    day1 = ev.filter(F.col("ts") <= F.lit(cutoff))
    for batch in (day1, ev):  # second pass re-delivers everything
        MT.incremental_agg_run(
            spark,
            batch,
            mart,
            group_cols=["event_type"],
            sum_cols={"total_value_cents": "value_cents"},
            cursor_col="ts",
            count_col="n_events",
        )
    _STREAM_MART_CACHE[cache_key] = root
    return MT.read_table(spark, mart)


@register(
    "incremental_agg_mart_check",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100 + 5e-1) AS BIGINT)) AS BIGINT)
           AS total_value_cents
FROM events
GROUP BY event_type
""",
    doc="Incremental AGGREGATE maintenance (the dbt incremental-"
    "aggregation pattern): per-type event counts and cent-sums folded "
    "in as two HWM-cut delta batches — the second batch re-delivers "
    "the ENTIRE source and the high watermark (resolved zero-job from "
    "manifest stats) cuts it to the strictly-new rows, so the stored "
    "mergeable state (count+sum) bit-matches the one-shot batch "
    "oracle. The mart is only ever the group relation; update "
    "shuffles are batch-sized. Commits ride the crash-atomic sink.",
)
def q_incremental_agg_mart_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    mart = _materialized_incremental_agg_mart(spark, sf_dir)
    return mart.select("event_type", "n_events", "total_value_cents")


def _materialized_dml_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercise the lakehouse DML surface under the driver oracle:
    events merge into an event_type-partitioned atomic mart, then a
    METADATA-ONLY ``delete_partitions(['error'])`` drops a whole type
    and a row-level ``delete_where(value >= 300)`` rewrites only the
    partitions holding matches. The remaining table must equal plain
    SQL with the same predicates."""
    import atexit
    import os
    import tempfile

    from pyspark.sql import functions as F

    from stripe_data_pipeline_spark import manifest_table as MT
    from stripe_data_pipeline_spark.io import read_table as _rt

    cache_key = sf_dir + "#dml"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is not None:
        return MT.read_table(spark, os.path.join(root, "mart"))
    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="dml_mart_")
    mart = os.path.join(root, "mart")
    ev = _rt(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    MT.merge_upsert_atomic(
        spark, mart, ev, keys=["event_id"], partition_by="event_type"
    )
    MT.delete_partitions(spark, mart, ["error"])
    MT.delete_where(spark, mart, F.col("value") >= 300.0)
    _STREAM_MART_CACHE[cache_key] = root
    return MT.read_table(spark, mart)


@register(
    "atomic_dml_mart_check",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {sum_usd_cents_sql("value")} AS total_value
FROM events
WHERE event_type <> 'error' AND value < 3e2
GROUP BY event_type
""",
    doc="Lakehouse DML under the driver oracle: merge events into an "
    "event_type-partitioned atomic mart, METADATA-ONLY-delete the "
    "'error' partition (one manifest rename, no data IO), row-level-"
    "delete value >= 300 (rewrites only partitions holding matches), "
    "then aggregate the read-back table — it must bit-match plain SQL "
    "with the same predicates. Proves both delete shapes produce "
    "exactly the declarative result through the commit protocol.",
)
def q_atomic_dml_mart_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    mart = _materialized_dml_mart(spark, sf_dir)
    return mart.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        sum_usd_cents(F.col("value")).alias("total_value"),
    )


def _materialized_stripe_stream_mart(spark: SparkSession):
    """S1→S6 end-to-end THROUGH THE STREAMING ENGINE (VERDICT r5 #6):
    the Stripe REST source's streaming flavor (created-HWM offsets,
    max_batch_seconds pacing, time-window-sharded micro-batches —
    sources/stripe_source.py::StripeStreamReader) drains the
    deterministic offline corpus in 3 paced micro-batches, each
    foreachBatch committing a crash-atomic MERGE (manifest rename,
    currency-partitioned, exactly-once txn epochs), then every
    partition is compacted and the table vacuumed. Returns
    (mart DataFrame, n non-empty stream batches).

    This is the catalog's heavyweight integration check by design
    (~12-18 s: ~4 s stream startup + three real crash-atomic merge
    commits at ~2-4 s of Spark jobs each; measured r6 — the per-batch
    merge cost, not the Python source, dominates). It materializes
    once per process and every later call reads the cached mart.

    Drained with processingTime + processAllAvailable + stop rather
    than Trigger.AvailableNow: AvailableNow snapshots its target at
    the FIRST latestOffset call, which with bounded pacing covers only
    the first window (measured); processAllAvailable keeps triggering
    until the paced cursor reaches 'latest' — the same drain-the-
    backlog semantics, with the bounded-batch behavior actually
    exercised. The result is sf-independent (the fake API corpus is
    fixed), so one materialization serves every sf_dir."""
    import atexit
    import os
    import tempfile

    from pyspark.sql import types as T

    from stripe_data_pipeline_spark import manifest_table as MT
    from stripe_data_pipeline_spark.sources.stripe_source import (
        StripeDataSource,
    )

    cache_key = "#stripe_stream"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is not None:
        mart = MT.read_table(spark, os.path.join(root, "mart"))
        with open(os.path.join(root, "n_batches")) as f:
            return mart, int(f.read())
    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="stripe_stream_mart_")
    mart_path = os.path.join(root, "mart")
    ckpt = os.path.join(root, "ckpt")

    spark.dataSource.register(StripeDataSource)
    payload_schema = T.StructType(
        [
            T.StructField("status", T.StringType()),
            T.StructField("currency", T.StringType()),
            T.StructField("total", T.LongType()),
            T.StructField("amount_paid", T.LongType()),
        ]
    )
    staged = (
        spark.readStream.format("stripe")
        .option("endpoint", "invoices")
        .option("fake_items", "120")
        # corpus spans 120*3600 s; 150000-s pacing -> exactly 3 batches
        .option("max_batch_seconds", "150000")
        # 4 time-windows per micro-batch: plenty of parallelism for a
        # 40-invoice batch, half the fixed task overhead of the default
        .option("num_partitions", "4")
        .load()
        .withColumn("doc", F.from_json("payload", payload_schema))
        .select(
            "id",
            "created",
            F.col("doc.status").alias("status"),
            F.col("doc.currency").alias("currency"),
            F.col("doc.total").alias("total"),
            F.col("doc.amount_paid").alias("amount_paid"),
        )
    )
    n_batches = [0]

    def merge(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        n_batches[0] += 1
        MT.merge_upsert_atomic(
            batch.sparkSession,
            mart_path,
            batch.dropDuplicates(["id"]),
            keys=["id"],
            partition_by="currency",
            txn_app="stripe_stream_mart",
            txn_version=int(batch_id),
        )

    q = (
        staged.writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    m = MT.read_manifest(mart_path)
    # compact ONE partition + vacuum: composes the maintenance protocols
    # with the streaming sink without paying 3x the commit cost — the
    # all-partitions compaction loop is already driver-checked by
    # streaming_atomic_merge_mart_check
    MT.compact_partition(
        spark, mart_path, sorted(m["parts"])[0], target_rows_per_file=1_000_000
    )
    MT.vacuum(mart_path, grace_sec=0)  # single-writer demo: immediate reap
    with open(os.path.join(root, "n_batches"), "w") as f:
        f.write(str(n_batches[0]))
    _STREAM_MART_CACHE[cache_key] = root
    return MT.read_table(spark, mart_path), n_batches[0]


@register(
    "streaming_stripe_source_mart_check",
    oracle="""
WITH inv AS (
    SELECT i,
           CASE CAST(i % 3 AS INT)
                WHEN 0 THEN 'usd' WHEN 1 THEN 'eur' ELSE 'gbp'
           END AS currency,
           i % 7 <> 0 AS is_paid,
           1704067200 + i * 3600 AS created,
           (SELECT SUM(1000 + 137 * ((i + j) % 97))
              FROM UNNEST(generate_series(0, i % 3)) AS t(j)) AS total
    FROM UNNEST(generate_series(0, CAST(119 AS BIGINT))) AS s(i)
)
SELECT currency,
       COUNT(*) AS n_invoices,
       CAST(SUM(CASE WHEN is_paid THEN 1 ELSE 0 END) AS BIGINT) AS n_paid,
       CAST(SUM(total) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN is_paid THEN total ELSE 0 END) AS BIGINT)
           AS paid_cents,
       CAST(MAX(created) AS BIGINT) AS max_created,
       CAST(3 AS INT) AS n_stream_batches
FROM inv
GROUP BY currency
""",
    doc="S1→S6 STREAMING end-to-end under an independent closed-form "
    "oracle: the Stripe REST source's streaming flavor (created-high-"
    "watermark offsets, bounded max_batch_seconds pacing, time-window-"
    "sharded micro-batches) drains the deterministic offline corpus "
    "(fixtures.py::make_invoice — amounts/status/currency are pure "
    "closed-form functions of the invoice index) through foreachBatch "
    "into the crash-atomic currency-partitioned manifest mart with "
    "exactly-once txn epochs, then compaction + vacuum. The oracle "
    "RECOMPUTES the whole expected mart from the fixture formulas via "
    "generate_series — no Spark artifact consulted — and additionally "
    "pins that the paced drain took exactly 3 non-empty micro-batches "
    "(corpus spans 120*3600 s at 150000-s pacing), proving the "
    "incremental cursor actually advanced batch-by-batch rather than "
    "slurping one giant window.",
)
def q_streaming_stripe_source_mart_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    mart, n_batches = _materialized_stripe_stream_mart(spark)
    return mart.groupBy("currency").agg(
        F.count(F.lit(1)).alias("n_invoices"),
        F.sum(F.when(F.col("status") == "paid", 1).otherwise(0))
        .cast("long")
        .alias("n_paid"),
        F.sum("total").alias("total_cents"),
        F.sum(F.when(F.col("status") == "paid", F.col("total")).otherwise(0))
        .cast("long")
        .alias("paid_cents"),
        F.max("created").alias("max_created"),
        F.lit(int(n_batches)).cast("int").alias("n_stream_batches"),
    )


def _materialized_schema_evo_mart(spark: SparkSession, sf_dir: str) -> str:
    """Two-batch additive schema evolution through the crash-atomic
    sink: batch 1 merges the pre-cutoff events with a NARROW schema
    (no value_cents); batch 2 merges post-cutoff 'purchase' events
    WITH the new value_cents column, touching ONLY the purchase
    partition. The read-back therefore exercises BOTH evolution
    paths: carried-over narrow rows inside the rewritten partition
    (union-with-NULL during the merge plan) and untouched partitions
    whose parquet files physically lack the column (read as NULL via
    the manifest's explicit schema, no footer-merge pass)."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark import manifest_table as MT
    from stripe_data_pipeline_spark.io import read_table as _rt

    cache_key = sf_dir + "#schemaevo"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is not None:
        return os.path.join(root, "mart")
    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="schema_evo_mart_")
    mart = os.path.join(root, "mart")

    cutoff = "2024-01-16 00:00:00"
    ev = _rt(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "ts", "value"
    )
    narrow = ev.filter(F.col("ts") < F.lit(cutoff).cast("timestamp")).select(
        "event_id", "event_type", "user_id"
    )
    MT.merge_upsert_atomic(
        spark, mart, narrow, keys=["event_id"], partition_by="event_type"
    )
    wide = (
        ev.filter(
            (F.col("ts") >= F.lit(cutoff).cast("timestamp"))
            & (F.col("event_type") == "purchase")
        )
        .withColumn(
            "value_cents",
            F.floor(F.col("value") * F.lit(100) + F.lit(0.5)).cast("long"),
        )
        .select("event_id", "event_type", "user_id", "value_cents")
    )
    MT.merge_upsert_atomic(
        spark, mart, wide, keys=["event_id"], partition_by="event_type"
    )
    _STREAM_MART_CACHE[cache_key] = root
    return mart


@register(
    "atomic_schema_evolution_mart_check",
    oracle="""
WITH kept AS (
    SELECT event_type, value,
           ts >= TIMESTAMP '2024-01-16 00:00:00' AS wide
    FROM events
    WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
       OR (ts >= TIMESTAMP '2024-01-16 00:00:00'
           AND event_type = 'purchase')
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN wide THEN 1 ELSE 0 END) AS BIGINT)
           AS n_with_value,
       CAST(SUM(CASE WHEN wide
                     THEN CAST(FLOOR(value * 100 + 5e-1) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS total_value_cents
FROM kept
GROUP BY event_type
""",
    doc="Additive schema evolution under the driver oracle: a narrow "
    "batch (no value_cents) merges first, then a wide batch adds the "
    "column while touching ONLY the purchase partition — so the final "
    "read exercises both evolution paths at once: narrow rows carried "
    "through the rewritten partition read NULL via the merge plan's "
    "union, and untouched partitions whose files physically lack the "
    "column read NULL via the manifest's explicit schema (no parquet "
    "footer merging). The aggregate pins exact per-type counts, "
    "non-NULL counts and cent-sums against plain SQL with the same "
    "cutoff — a wrong NULL in either path breaks n_with_value, a "
    "dropped or duplicated row breaks n_events. Pytest covers the "
    "mechanism (tests/test_manifest_table.py); this makes it "
    "driver-green end-to-end.",
)
def q_atomic_schema_evolution_mart_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from stripe_data_pipeline_spark import manifest_table as MT

    mart = MT.read_table(spark, _materialized_schema_evo_mart(spark, sf_dir))
    return mart.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.col("value_cents").isNotNull(), 1).otherwise(0)
        ).cast("long").alias("n_with_value"),
        F.sum(F.coalesce(F.col("value_cents"), F.lit(0)))
        .cast("long")
        .alias("total_value_cents"),
    )


@register(
    "atomic_time_travel_check",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events
WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
GROUP BY event_type
""",
    doc="Time travel under the driver oracle: the schema-evolution "
    "mart's VERSION 1 snapshot (committed before the wide batch) is "
    "read back via read_table(version=1) and must equal plain SQL "
    "over exactly the first batch's cut — proving historical "
    "snapshots resolve to the original immutable directories and the "
    "original (narrow) schema even after later commits evolved both "
    "the data and the schema. Shares the cached two-commit mart with "
    "atomic_schema_evolution_mart_check; the version-1 manifest is "
    "pinned structurally in tests/test_manifest_table.py, this makes "
    "the read path driver-green.",
)
def q_atomic_time_travel_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark import manifest_table as MT

    path = _materialized_schema_evo_mart(spark, sf_dir)
    v1 = MT.read_table(spark, path, version=1)
    return v1.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


def _materialized_part_evo_mart(spark: SparkSession, sf_dir: str) -> str:
    """Partition-spec evolution end-to-end: merge events into an
    event_type-partitioned mart, ALTER the spec to day-partitioning
    (repartition_table: full rewrite, one commit), then land one more
    keyed merge UNDER THE NEW SPEC (an idempotent re-delivery of one
    day — proving post-evolution merges route rows into day
    partitions). Readers then prune by day values driver-side."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark import manifest_table as MT
    from stripe_data_pipeline_spark.io import read_table as _rt

    cache_key = sf_dir + "#partevo"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is not None:
        return os.path.join(root, "mart")
    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="part_evo_mart_")
    mart = os.path.join(root, "mart")

    ev = _rt(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "user_id",
        F.floor(F.col("value") * F.lit(100) + F.lit(0.5))
        .cast("long")
        .alias("value_cents"),
        F.to_date("ts").alias("day"),
    )
    MT.merge_upsert_atomic(
        spark, mart, ev, keys=["event_id"], partition_by="event_type"
    )
    MT.repartition_table(spark, mart, "day")
    delta = ev.filter(F.col("day") == F.lit("2024-01-20").cast("date"))
    MT.merge_upsert_atomic(
        spark, mart, delta, keys=["event_id"], partition_by="day"
    )
    _STREAM_MART_CACHE[cache_key] = root
    return mart


@register(
    "atomic_partition_evolution_check",
    oracle="""
-- days filtered in an outer query: DuckDB 1.0 drops every row when
-- an IN-list over CAST(ts AS DATE) is pushed into this INT64-nanos
-- parquet scan (= comparisons and the subquery form are unaffected)
SELECT day,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(value_cents) AS BIGINT) AS total_value_cents
FROM (
    SELECT CAST(ts AS DATE) AS day, user_id,
           CAST(FLOOR(value * 100 + 5e-1) AS BIGINT) AS value_cents
    FROM events
)
WHERE day IN (DATE '2024-01-05', DATE '2024-01-20', DATE '2024-01-28')
GROUP BY day
""",
    doc="Partition-spec evolution under the driver oracle: the mart is "
    "merged under event_type partitioning, ALTERed to day "
    "partitioning (repartition_table — whole-table rewrite committed "
    "by one manifest rename), then receives a post-evolution keyed "
    "merge (idempotent re-delivery of one day, routed into the NEW "
    "spec's partitions). The check reads back THREE specific days "
    "through driver-side manifest pruning (partition_values=...) and "
    "pins counts/users/cent-sums against plain SQL — a mis-routed "
    "row, a double-applied re-delivery, or pruning against the old "
    "spec all break parity. Mechanism pytest: "
    "tests/test_manifest_table.py.",
)
def q_atomic_partition_evolution_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import datetime

    from stripe_data_pipeline_spark import manifest_table as MT

    path = _materialized_part_evo_mart(spark, sf_dir)
    days = [
        datetime.date(2024, 1, 5),
        datetime.date(2024, 1, 20),
        datetime.date(2024, 1, 28),
    ]
    df = MT.read_table(spark, path, partition_values=days)
    return df.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("value_cents").cast("long").alias("total_value_cents"),
    )


@register(
    "atomic_history_audit_check",
    oracle="""
SELECT CAST(1 AS INT) AS version, 'initial' AS op_type,
       COUNT(DISTINCT event_type) AS n_touched,
       COUNT(DISTINCT event_type) AS n_parts
FROM events
UNION ALL
SELECT CAST(2 AS INT), 'repartition',
       COUNT(DISTINCT CAST(ts AS DATE)),
       COUNT(DISTINCT CAST(ts AS DATE))
FROM events
UNION ALL
SELECT CAST(3 AS INT), 'merge',
       CAST(1 AS BIGINT),
       COUNT(DISTINCT CAST(ts AS DATE))
FROM events
""",
    doc="Commit audit log under the driver oracle: manifest_table."
    "history() of the partition-evolution mart must report exactly "
    "(v1 initial load touching every event_type partition, v2 "
    "repartition "
    "rewriting one dir per distinct day, v3 merge touching only the "
    "re-delivered day) — with touched/partition COUNTS cross-checked "
    "against the DATA's distinct-value counts in plain SQL, not "
    "pinned constants. A merge that rewrote partitions it shouldn't, "
    "a repartition that dropped a day, or an audit entry with the "
    "wrong operation type all break parity. history() is pure "
    "manifest metadata: zero Spark jobs to produce the audit trail.",
)
def q_atomic_history_audit_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from stripe_data_pipeline_spark import manifest_table as MT

    path = _materialized_part_evo_mart(spark, sf_dir)
    rows = [
        (h["version"], h["type"], len(h["touched"]), h["n_parts"])
        for h in MT.history(path)
    ]
    return spark.createDataFrame(
        rows, "version int, op_type string, n_touched bigint, n_parts bigint"
    )


def _materialized_interval_join_mart(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAM-STREAM interval join (the §2.10 op none of the other
    streaming checks cover — two unbounded sides, watermark-bounded
    join state): a views stream joined to a purchases stream on
    user_id with ``p_ts in [v_ts, v_ts + 1 hour]``, drained under
    Trigger.AvailableNow into an append-mode parquet mart. Both
    sides carry 2-hour watermarks, so at scale the join state holds
    ~2 hours of each stream instead of everything ever seen; the
    single-file source keeps all rows in the first micro-batch, so
    nothing is ever late and the appended pairs are EXACTLY the
    batch join's output (the oracle proves it)."""
    import atexit
    import os
    import tempfile

    cache_key = f"{sf_dir}::interval_join"
    path = _STREAM_MART_CACHE.get(cache_key)
    if path is not None:
        return spark.read.parquet(os.path.join(path, "mart"))
    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="stream_ij_")
    mart = os.path.join(root, "mart")
    ckpt = os.path.join(root, "ckpt")

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def src() -> DataFrame:
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        return convert_nanos_ts(raw)

    views = (
        src()
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id"),
            # watermarks require TIMESTAMP (not the NTZ the nanos
            # conversion yields); session tz is UTC so values are
            # unchanged and the check casts back to NTZ for the oracle
            F.col("ts").cast("timestamp").alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", "2 hours")
    )
    purchases = (
        src()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = views.join(
        purchases,
        F.expr(
            "user_id = p_user AND p_ts >= v_ts "
            "AND p_ts <= v_ts + interval 1 hour"
        ),
    ).select("user_id", "view_id", "purchase_id", "v_ts", "p_ts", "value")
    (
        joined.writeStream.format("parquet")
        .option("path", mart)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    _STREAM_MART_CACHE[cache_key] = root
    return spark.read.parquet(mart)


@register(
    "streaming_interval_join_mart_check",
    oracle="""
WITH v AS (
    SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'
),
p AS (
    SELECT user_id, ts, event_id, value FROM events
    WHERE event_type = 'purchase'
)
SELECT v.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_attributed,
       CAST(COUNT(DISTINCT p.event_id) AS BIGINT) AS n_purchases,
       CAST(SUM(CAST(FLOOR(p.value * 100 + 5e-1) AS BIGINT)) AS BIGINT)
           AS attributed_cents,
       MIN(p.ts) AS first_purchase_ts,
       MAX(p.ts) AS last_purchase_ts
FROM v JOIN p ON p.user_id = v.user_id
             AND p.ts >= v.ts
             AND p.ts <= v.ts + INTERVAL 1 HOUR
GROUP BY v.user_id
""",
    doc="STREAM-STREAM INTERVAL JOIN round trip (completes §2.10: "
    "the two-unbounded-sides op with watermark-bounded state that "
    "none of the source/merge/dedup/window checks exercise): a "
    "views stream and a purchases stream — both real file-source "
    "streams with 2-hour watermarks — interval-joined on user_id "
    "with p_ts in [v_ts, v_ts + 1h], drained append-mode into a "
    "parquet mart under Trigger.AvailableNow with a checkpoint. "
    "The per-user attribution profile of the MART (pair counts, "
    "distinct purchases, integer-cents value, first/last purchase "
    "ts) must bit-match the batch interval join the oracle runs — "
    "the unified-engine claim for the hardest streaming join.",
)
def q_streaming_interval_join_mart_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    mart = _materialized_interval_join_mart(spark, sf_dir)
    return mart.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_attributed"),
        F.countDistinct("purchase_id").cast("bigint").alias("n_purchases"),
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        )
        .cast("bigint")
        .alias("attributed_cents"),
        F.min("p_ts").cast("timestamp_ntz").alias("first_purchase_ts"),
        F.max("p_ts").cast("timestamp_ntz").alias("last_purchase_ts"),
    )


def _materialized_session_windows_mart(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming SESSION-WINDOW aggregation -> table (r8, VERDICT r7
    #6 — the last §2.10 stateful shape not yet exercised): the events
    file stream groups by (user_id, session_window(ts, 30 min)) under
    a 2-hour watermark and drains complete-mode through foreachBatch
    into a parquet mart. Session windows are the DYNAMIC-gap state:
    windows grow and MERGE as events arrive (an exact-30-minute gap
    still merges — [start, last_ts + gap) ranges touching counts as
    overlap, pinned by tests/test_streaming.py), which none of the
    tumbling/interval checks cover."""
    import atexit
    import os
    import tempfile

    cache_key = sf_dir + "#session_windows"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is not None:
        return spark.read.parquet(os.path.join(root, "mart"))
    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="streaming_session_mart_")
    mart = os.path.join(root, "mart")
    ckpt = os.path.join(root, "ckpt")

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    staged = convert_nanos_ts(raw).withColumn(
        # watermarks require TIMESTAMP (not NTZ); session tz is UTC so
        # values are unchanged and the check casts back for the oracle
        "ts",
        F.col("ts").cast("timestamp"),
    )
    agg = (
        staged.withWatermark("ts", "2 hours")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            )
            .cast("bigint")
            .alias("session_cents"),
        )
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("overwrite").parquet(mart)

    (
        agg.writeStream.foreachBatch(sink)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    _STREAM_MART_CACHE[cache_key] = root
    return spark.read.parquet(mart)


@register(
    "streaming_session_windows_mart_check",
    oracle="""
WITH l AS (
    SELECT user_id, ts, value,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
    FROM events
),
g AS (
    SELECT user_id, ts, value,
           CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS brk
    FROM l
),
s AS (
    SELECT user_id, ts, value,
           SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS sid
    FROM g
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100 + 5e-1) AS BIGINT)) AS BIGINT)
           AS session_cents
FROM s GROUP BY user_id, sid
""",
    doc="STREAMING SESSION WINDOWS round trip (completes §2.10's "
    "stateful surface): per-user dynamic-gap sessions — "
    "session_window(ts, 30 min) under a 2-hour watermark, drained "
    "complete-mode via foreachBatch into a parquet mart — must "
    "bit-match the batch lag/cumsum sessionization the oracle runs "
    "(sessionized_events' shape): same session boundaries (a gap "
    "of exactly 30 minutes MERGES — touching ranges overlap), same "
    "window ends (last event + gap), same integer-cents values. "
    "The merging-session state store is the one stateful operator "
    "tumbling windows, dedup and the interval join don't reach.",
)
def q_streaming_session_windows_mart_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    mart = _materialized_session_windows_mart(spark, sf_dir)
    return mart.select(
        "user_id",
        F.col("session_window.start")
        .cast("timestamp_ntz")
        .alias("session_start"),
        # the engine's own session bound: end == last event + gap
        F.col("session_window.end")
        .cast("timestamp_ntz")
        .alias("session_end"),
        "n_events",
        "session_cents",
    )


def _materialized_stream_static_join_mart(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAM-STATIC join -> table (r8 — the one §2.10 join form the
    interval/source/merge checks don't exercise): the events file
    stream enriches each micro-batch against the STATIC customer
    dimension (broadcast per batch — the dim is re-resolvable every
    trigger, which is exactly how Spark defines stream-static joins)
    and appends to a parquet mart. No watermark needed: a
    stream-static inner join is stateless."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark.io import read_table

    cache_key = sf_dir + "#stream_static"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is not None:
        return spark.read.parquet(os.path.join(root, "mart"))
    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="streaming_static_join_mart_")
    mart = os.path.join(root, "mart")
    ckpt = os.path.join(root, "ckpt")

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    staged = convert_nanos_ts(raw)
    dim = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment"), F.col("c_acctbal")
    )
    enriched = staged.join(
        F.broadcast(dim), staged["user_id"] == dim["c_custkey"]
    ).select("event_id", "user_id", "event_type", "value", "c_mktsegment")
    (
        enriched.writeStream.format("parquet")
        .option("path", mart)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    _STREAM_MART_CACHE[cache_key] = root
    return spark.read.parquet(mart)


@register(
    "streaming_static_join_mart_check",
    oracle="""
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(FLOOR(e.value * 100 + 5e-1) AS BIGINT)) AS BIGINT)
           AS value_cents
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""",
    doc="STREAM-STATIC JOIN round trip (the one §2.10 join form the "
    "interval-join check doesn't cover): the events stream enriches "
    "each micro-batch against the static customer dimension via a "
    "per-batch BROADCAST hash join (stateless — no watermark, no "
    "join state store) and appends to a parquet mart; the mart's "
    "per-market-segment profile must bit-match the batch join the "
    "oracle runs. At 100 TB this is the dimension-enrichment shape "
    "of every streaming ingest: the dim re-resolves every trigger, "
    "so slowly-changing dimensions pick up updates without "
    "restarting the query.",
)
def q_streaming_static_join_mart_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    mart = _materialized_stream_static_join_mart(spark, sf_dir)
    return mart.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .cast("bigint")
        .alias("value_cents"),
    )


def _materialized_cms_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus token stream exploded to CMS cells and folded into a
    STORED 4x256 sketch in two HWM-cut batches (cursor = doc_id; the
    second batch re-delivers the whole corpus and the watermark cuts
    it to the strictly-new docs). The mart is only ever the d*w cell
    relation — sketch-sized, never corpus-sized."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark import manifest_table as MT
    from stripe_data_pipeline_spark.io import read_table as _rt
    from stripe_data_pipeline_spark.operators import sketch as SK

    cache_key = sf_dir + "#cmsmart"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is not None:
        return MT.read_table(spark, os.path.join(root, "mart"))
    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="cms_mart_")
    mart = os.path.join(root, "mart")

    docs = _rt(spark, sf_dir, "documents")
    cells = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split("text", " "), lambda t: t != "")
        ).alias("token"),
    ).select(
        "doc_id",
        F.posexplode(
            F.array(
                *[SK.cms_row_bucket(F.col("token"), d, 256) for d in range(4)]
            )
        ).alias("row", "bucket"),
    )
    cutoff = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).first()[0]
    day1 = cells.filter(F.col("doc_id") <= F.lit(cutoff))
    for batch in (day1, cells):  # second pass re-delivers everything
        MT.incremental_agg_run(
            spark,
            batch,
            mart,
            group_cols=["row", "bucket"],
            sum_cols={},
            cursor_col="doc_id",
            count_col="cnt",
        )
    _STREAM_MART_CACHE[cache_key] = root
    return MT.read_table(spark, mart)


_CMS_BUCKET_SQL = (
    "CAST(('0x' || substr(md5('cms' || d.row || ':' || {key}), 1, 8)) "
    "AS BIGINT) % 256"
)

_CMS_ORACLE_BODY = f"""
WITH toks AS (
    SELECT u.w AS token
    FROM documents,
         UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS u(w)
),
exact AS (
    SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_cnt
    FROM toks GROUP BY token
),
rows_ AS (SELECT UNNEST(range(0, 4)) AS row),
cells AS (
    SELECT d.row, {_CMS_BUCKET_SQL.format(key="t.token")} AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM toks t CROSS JOIN rows_ d
    GROUP BY 1, 2
),
top AS (
    SELECT token, exact_cnt FROM exact
    ORDER BY exact_cnt DESC, token LIMIT 20
),
est AS (
    SELECT t.token, CAST(MIN(c.cnt) AS BIGINT) AS stored_est
    FROM top t CROSS JOIN rows_ d
    JOIN cells c
      ON c.row = d.row AND c.bucket = {_CMS_BUCKET_SQL.format(key="t.token")}
    GROUP BY t.token
)
SELECT t.token, t.exact_cnt, e.stored_est
FROM top t JOIN est e ON e.token = t.token
"""


@register(
    "incremental_cms_mart_check",
    oracle=_CMS_ORACLE_BODY,
    doc="INCREMENTAL sketch maintenance: the 4x256 count-min sketch "
    "folded into a stored mart in two HWM-cut batches (cursor = "
    "doc_id; the second batch re-delivers the entire corpus and the "
    "watermark cuts it to strictly-new docs, so cells are "
    "exactly-once even under at-least-once re-delivery). Because "
    "CMS cells are mergeable counters, the STORED sketch must "
    "bit-match the one-shot full-corpus sketch — top-20 exact vs "
    "stored-sketch estimates under the same oracle as "
    "cms_token_estimates. The mart is only ever 1,024 cells: "
    "sketch-sized state under corpus-sized ingest, the monitoring "
    "shape a 100 TB pipeline actually persists.",
)
def q_incremental_cms_mart_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from stripe_data_pipeline_spark.io import read_table as _rt
    from stripe_data_pipeline_spark.operators import sketch as SK

    mart = _materialized_cms_mart(spark, sf_dir).select(
        "row", "bucket", F.col("cnt").cast("bigint").alias("cnt")
    )
    toks = _rt(spark, sf_dir, "documents").select(
        F.explode(
            F.filter(F.split("text", " "), lambda t: t != "")
        ).alias("token")
    )
    exact = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_cnt")
    )
    top = exact.orderBy(F.desc("exact_cnt"), "token").limit(20)
    est = SK.cms_estimate(mart, top.select("token"), "token").withColumnRenamed(
        "cms_est", "stored_est"
    )
    return top.join(est, "token").select("token", "exact_cnt", "stored_est")


def _materialized_hist_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-total cents bucketed into the fixed $10k histogram grid
    and folded into a STORED mart in two HWM-cut batches (cursor =
    o_orderkey; the second batch re-delivers every order and the
    watermark cuts it to strictly-new keys). The mart is only ever
    the domain/width cell relation — grid-sized, never fact-sized."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark import manifest_table as MT
    from stripe_data_pipeline_spark.catalog.relational_queries import (
        _HIST_WIDTH,
    )
    from stripe_data_pipeline_spark.io import read_table as _rt

    cache_key = sf_dir + "#histmart"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is not None:
        return MT.read_table(spark, os.path.join(root, "mart"))
    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="hist_mart_")
    mart = os.path.join(root, "mart")

    orders = _rt(spark, sf_dir, "orders")
    cells = orders.select(
        "o_orderkey",
        F.expr(
            f"CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) "
            f"div {_HIST_WIDTH}"
        ).alias("bucket"),
    )
    cutoff = orders.agg(
        F.expr("percentile_approx(o_orderkey, 0.5)")
    ).first()[0]
    day1 = cells.filter(F.col("o_orderkey") <= F.lit(cutoff))
    for batch in (day1, cells):  # second pass re-delivers everything
        MT.incremental_agg_run(
            spark,
            batch,
            mart,
            group_cols=["bucket"],
            sum_cols={},
            cursor_col="o_orderkey",
            count_col="cnt",
        )
    _STREAM_MART_CACHE[cache_key] = root
    return MT.read_table(spark, mart)


def _materialized_constrained_mart(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CHECK-constrained atomic mart round trip (r10): merge a first
    slice of events, add the constraint ``value >= 0 AND event_id >=
    0`` (validated against the stored rows), then attempt a POISONED
    second merge — the real batch plus one violating row — which must
    fail atomically (version unchanged, no rows landed), and finally
    land the clean remainder. The checked table is therefore exactly
    the full event set iff (a) add-time validation passed, (b) the
    violating batch was refused without partial effects, and (c) the
    constraint survived the intermediate commits."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark import manifest_table as MT
    from stripe_data_pipeline_spark.io import read_table as _rt

    cache_key = sf_dir + "#constrained"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is not None:
        return MT.read_table(spark, os.path.join(root, "mart"))
    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="constrained_mart_")
    mart = os.path.join(root, "mart")

    ev = _rt(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    cutoff = ev.agg(F.expr("percentile_approx(event_id, 0.5)")).first()[0]
    first = ev.filter(F.col("event_id") <= F.lit(cutoff))
    rest = ev.filter(F.col("event_id") > F.lit(cutoff))
    MT.merge_upsert_atomic(
        spark, mart, first, keys=["event_id"], partition_by="event_type"
    )
    MT.add_constraint(
        spark, mart, "valid_event", "value >= 0.0 AND event_id >= 0"
    )
    poisoned = rest.unionByName(
        spark.createDataFrame(
            [(-1, "view", 0, -123.0)],
            "event_id long, event_type string, user_id long, value double",
        )
    )
    v_before = int(MT.read_manifest(mart)["version"])
    try:
        MT.merge_upsert_atomic(
            spark, mart, poisoned, keys=["event_id"], partition_by="event_type"
        )
        raise AssertionError("violating merge was not refused")
    except ValueError:
        pass
    if int(MT.read_manifest(mart)["version"]) != v_before:
        # RuntimeError, not assert: `python -O` strips asserts and
        # the atomicity guard must survive it (ADVICE r13, low)
        raise RuntimeError(
            "streaming mart builder: refused merge still advanced the "
            "manifest version"
        )
    MT.merge_upsert_atomic(
        spark, mart, rest, keys=["event_id"], partition_by="event_type"
    )
    _STREAM_MART_CACHE[cache_key] = root
    return MT.read_table(spark, mart)


@register(
    "atomic_constraint_mart_check",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {sum_usd_cents_sql("value")} AS total_value
FROM events
GROUP BY event_type
""",
    doc="CHECK constraints under the driver oracle (the Delta ALTER "
    "TABLE ... ADD CONSTRAINT CHECK shape): merge half the events, "
    "add a validated constraint, attempt a POISONED batch (real rows "
    "+ one violating row) — refused atomically, version unchanged, "
    "zero partial effects — then land the clean remainder. The final "
    "aggregate bit-matches plain SQL over ALL events iff add-time "
    "validation, the atomic refusal, and constraint carry-through "
    "all behaved; add/drop/carry/clone unit semantics are pinned in "
    "tests/test_constraints.py.",
)
def q_atomic_constraint_mart_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    mart = _materialized_constrained_mart(spark, sf_dir)
    return mart.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        sum_usd_cents(F.col("value")).alias("total_value"),
    )


def _materialized_wm_dedup_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENGINE-NATIVE bounded-state streaming dedup
    (``dropDuplicatesWithinWatermark``, the Spark 3.5+ operator):
    the events table is staged TWICE into the feed (two files, forced
    batch order), so every row is re-delivered in a later micro-batch;
    the operator holds per-key state only until the watermark passes
    the key's event time — state is bounded by the delay window, NOT
    by stream history, which is what distinguishes it from a plain
    ``dropDuplicates`` whose state grows forever at 100 TB/day. With
    a delay longer than the data's time span nothing is late, so
    every batch-2 row is dropped by the dedup state specifically and
    the appended mart must equal the distinct event set. Complements
    streaming_dedup_mart_check, which implements dedup MANUALLY via
    per-batch content fingerprints + keyed merge."""
    import atexit
    import os
    import shutil
    import tempfile

    cache_key = sf_dir + "#wmdedup"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is not None:
        return spark.read.parquet(os.path.join(root, "mart"))
    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="wm_dedup_mart_")
    feed = os.path.join(root, "feed")
    mart = os.path.join(root, "mart")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(feed)

    ev = convert_nanos_ts(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    for i in range(2):  # second file re-delivers every row
        staging = os.path.join(root, f".stage{i}")
        ev.coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(
            f for f in sorted(os.listdir(staging)) if f.endswith(".parquet")
        )
        dst = os.path.join(feed, f"batch-{i}.parquet")
        os.replace(os.path.join(staging, part), dst)
        os.utime(dst, (1_700_000_000 + i * 600,) * 2)
        shutil.rmtree(staging, ignore_errors=True)

    deduped = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
        .withWatermark("ts", "3650 days")  # nothing late: pure state dedup
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    (
        deduped.writeStream.format("parquet")
        .option("path", mart)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    _STREAM_MART_CACHE[cache_key] = root
    return spark.read.parquet(mart)


@register(
    "streaming_wm_dedup_mart_check",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {sum_usd_cents_sql("value")} AS total_value
FROM events
GROUP BY event_type
""",
    doc="dropDuplicatesWithinWatermark round trip — the engine-native "
    "BOUNDED-STATE streaming dedup (Spark 3.5+): the events table is "
    "re-delivered in full by a second micro-batch and every replayed "
    "row must be dropped by the per-key dedup state, so the appended "
    "mart bit-matches the batch aggregate over distinct events. The "
    "operator's state is bounded by the watermark delay window, not "
    "by stream history — the property that makes streaming dedup "
    "viable at 100 TB/day where a plain dropDuplicates accumulates "
    "unbounded keys (the manual fingerprint+merge alternative is "
    "streaming_dedup_mart_check).",
)
def q_streaming_wm_dedup_mart_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    mart = _materialized_wm_dedup_mart(spark, sf_dir)
    return mart.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        sum_usd_cents(F.col("value")).alias("total_value"),
    )


def _materialized_kmv_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KMV sketches maintained in a STORED mart through two
    OVERLAPPING batches — deliberately with NO high-watermark cut:
    unlike the CMS/histogram counter marts (where re-delivered rows
    would double-count and the HWM cut supplies exactly-once), the
    k-min-hash fold is IDEMPOTENT — union with already-seen values
    cannot change the k smallest — so at-least-once re-delivery is
    exactly-once by algebra. Per batch: sketch the batch, union hash
    sets with the stored sketch, re-rank, and upsert keyed (g, rn) —
    rank rows only ever tighten (a group's row count is monotone up
    to k), so the keyed merge is a complete fold. The mart is only
    ever k rows per set."""
    import atexit
    import os
    import tempfile

    from pyspark.sql import Window

    from stripe_data_pipeline_spark import manifest_table as MT
    from stripe_data_pipeline_spark.io import read_table as _rt
    from stripe_data_pipeline_spark.operators.sketch import kmv_sketch

    k = 64
    cache_key = sf_dir + "#kmvmart"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is not None:
        return MT.read_table(spark, os.path.join(root, "mart"))
    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="kmv_mart_")
    mart = os.path.join(root, "mart")

    docs = _rt(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    ws = F.filter(F.split("text", " "), lambda t: t != "")
    bg = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.zip_with(
                F.slice(ws, 1, F.size(ws) - 1),
                F.slice(ws, 2, F.size(ws) - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("v"),
    )
    cutoff = docs.agg(F.expr("percentile_approx(doc_id, 0.6)")).first()[0]
    day1 = bg.filter(F.col("doc_id") <= F.lit(cutoff))
    w = Window.partitionBy("g").orderBy("h")
    for batch in (day1, bg):  # second batch OVERLAPS the first
        batch_sk = kmv_sketch(batch, "v", "source", k).select("g", "h")
        try:
            stored = MT.read_table(spark, mart).select("g", "h")
            merged = stored.unionByName(batch_sk).distinct()
        except FileNotFoundError:
            merged = batch_sk
        folded = (
            merged.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
        )
        MT.merge_upsert_atomic(spark, mart, folded, keys=["g", "rn"])
    _STREAM_MART_CACHE[cache_key] = root
    return MT.read_table(spark, mart)


_KMV_MART_H = "CAST(('0x' || substr(md5(v), 1, 15)) AS BIGINT)"


@register(
    "incremental_kmv_mart_check",
    oracle=f"""
WITH bg AS MATERIALIZED (
    SELECT source, ws[i] || ' ' || ws[i + 1] AS v
    FROM (SELECT source,
                 list_filter(string_split(text, ' '), x -> x <> '') AS ws
          FROM documents WHERE source IN ('src0', 'src1')),
         UNNEST(range(1, len(ws))) AS t(i)
),
dv AS MATERIALIZED (SELECT DISTINCT source, v FROM bg),
hs AS (SELECT DISTINCT source AS g, {_KMV_MART_H} AS h FROM dv),
sk AS (
    SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn
    FROM hs QUALIFY rn <= 64
),
estv AS (
    SELECT g, n_kept,
           CASE WHEN n_kept < 64 THEN n_kept
                ELSE CAST(CAST(63 AS HUGEINT) * {1 << 60} // hk AS BIGINT)
           END AS est
    FROM (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_kept, MAX(h) AS hk
          FROM sk GROUP BY g)
),
exs AS (SELECT source AS g, CAST(COUNT(*) AS BIGINT) AS exact
        FROM dv GROUP BY source)
SELECT e.g AS source, e.n_kept, e.est, x.exact
FROM estv e JOIN exs x USING (g)
""",
    doc="INCREMENTAL theta/KMV sketch maintenance — the mergeable-"
    "but-NOT-a-counter contrast to the CMS/histogram marts: the "
    "per-source k=64 min-hash sketch is folded into a stored mart "
    "through two OVERLAPPING batches with NO high-watermark cut, "
    "because the k-min fold is IDEMPOTENT (re-delivered values "
    "cannot change the k smallest) — exactly-once by algebra where "
    "counters need the HWM. Each batch unions hash sets, re-ranks, "
    "and upserts keyed (g, rn) — rank rows only tighten, so the "
    "keyed merge is a complete fold and the STORED sketch must "
    "bit-match the one-shot sketch: per-source estimates and exact "
    "distinct counts under the same estimator oracle as "
    "kmv_distinct_sketch_check. Sketch-sized state (k rows/set) "
    "under corpus-sized ingest.",
)
def q_incremental_kmv_mart_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from stripe_data_pipeline_spark.io import read_table as _rt
    from stripe_data_pipeline_spark.operators.sketch import kmv_estimate

    k = 64
    mart = _materialized_kmv_mart(spark, sf_dir).select("g", "h", "rn")
    est = kmv_estimate(mart, k)
    docs = _rt(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    ws = F.filter(F.split("text", " "), lambda t: t != "")
    exact = (
        docs.select(
            "source",
            F.explode(
                F.zip_with(
                    F.slice(ws, 1, F.size(ws) - 1),
                    F.slice(ws, 2, F.size(ws) - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("v"),
        )
        .distinct()
        .groupBy(F.col("source").alias("g"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact"))
    )
    return est.join(exact, "g").select(
        F.col("g").alias("source"), "n_kept", "est", "exact"
    )


from stripe_data_pipeline_spark.catalog.relational_queries import (
    _HIST_ORACLE as _HIST_ORACLE_SHARED,
)


@register(
    "incremental_hist_mart_check",
    oracle=_HIST_ORACLE_SHARED,  # shares hist_quantile_prices' oracle
    doc="INCREMENTAL quantile maintenance: the fixed-grid histogram "
    "sketch folded into a stored mart in two HWM-cut batches "
    "(cursor = o_orderkey; the re-delivered second batch is cut to "
    "strictly-new keys, so cells stay exactly-once under "
    "at-least-once delivery). Counters merge exactly, so quantile "
    "bounds read from the STORED grid must bit-match the one-shot "
    "build — same oracle as hist_quantile_prices. Grid-sized state "
    "under fact-sized ingest: the percentile-dashboard shape a "
    "100 TB warehouse persists instead of re-scanning history.",
)
def q_incremental_hist_mart_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from stripe_data_pipeline_spark.catalog.relational_queries import (
        _HIST_QS,
        _HIST_WIDTH,
    )
    from stripe_data_pipeline_spark.operators import sketch as SK

    mart = _materialized_hist_mart(spark, sf_dir).select(
        "bucket", F.col("cnt").cast("bigint").alias("cnt")
    )
    return SK.hist_quantile_bounds(mart, list(_HIST_QS), _HIST_WIDTH)


def _materialized_join_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL MATERIALIZED JOIN (delta-join view maintenance):
    mart = orders JOIN lineitem kept up to date batch-by-batch with
    the textbook IVM recurrence

        delta(A JOIN B) = dA JOIN dB  UNION  dA JOIN B_old
                          UNION  A_old JOIN dB

    State: the mart itself plus the two side tables of rows already
    incorporated. Batches are deliberately OUT OF ORDER on the join
    key — batch 1 delivers the low-orderkey orders but only their
    odd-linenumber line items; batch 2 re-delivers EVERYTHING — so a
    high-watermark cursor cannot express the cut and all three delta
    terms are genuinely exercised (batch 2 joins late line items of
    batch-1 orders against the stored orders state). Deltas are
    detected by anti-join against the stored side state (exactly-once
    under at-least-once re-delivery); every write is the crash-atomic
    manifest merge. At 100 TB this is how a warehouse maintains a
    denormalized join mart without re-joining history: per batch it
    shuffles only delta x state keys, never state x state."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark import manifest_table as MT
    from stripe_data_pipeline_spark.io import read_table as _rt

    cache_key = sf_dir + "#joinmart"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is not None:
        return MT.read_table(spark, os.path.join(root, "mart"))
    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="join_mart_")
    mart = os.path.join(root, "mart")
    so = os.path.join(root, "state_orders")
    sl = os.path.join(root, "state_lineitem")

    orders = _rt(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    from pyspark.sql import Window as _W

    # (l_orderkey, l_linenumber) is NOT unique in this synthetic data
    # (duplicate line rows exist); IVM state needs a real key, so a
    # surrogate occurrence number disambiguates duplicates. The
    # duplicated rows are bit-identical, so the row_number tie order
    # cannot change the maintained multiset.
    li = (
        _rt(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.floor(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
                * F.lit(100.0)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("rev_cents"),
        )
        .withColumn(
            "l_uid",
            F.row_number().over(
                _W.partitionBy("l_orderkey", "l_linenumber").orderBy(
                    "rev_cents"
                )
            ),
        )
    )
    cutoff = orders.agg(
        F.expr("percentile_approx(o_orderkey, 0.5)")
    ).first()[0]
    batches = [
        (
            orders.filter(F.col("o_orderkey") <= F.lit(cutoff)),
            li.filter(
                (F.col("l_orderkey") <= F.lit(cutoff))
                & (F.col("l_linenumber") % 2 == 1)
            ),
        ),
        (orders, li),  # re-delivers everything, out-of-order arrivals
    ]
    first = True
    for o_batch, l_batch in batches:
        if first:
            d_o, d_l = o_batch, l_batch
            o_state = None
            l_state = None
        else:
            o_state = MT.read_table(spark, so)
            l_state = MT.read_table(spark, sl)
            d_o = o_batch.join(o_state, ["o_orderkey"], "left_anti")
            d_l = l_batch.join(
                l_state, ["l_orderkey", "l_linenumber", "l_uid"], "left_anti"
            )
        new_rows = d_o.join(
            d_l, d_o["o_orderkey"] == d_l["l_orderkey"]
        ).select(
            "o_orderkey", "l_linenumber", "l_uid", "o_custkey",
            "o_orderstatus", "rev_cents",
        )
        if not first:
            new_rows = new_rows.unionByName(
                d_o.join(
                    l_state, d_o["o_orderkey"] == l_state["l_orderkey"]
                ).select(
                    "o_orderkey", "l_linenumber", "l_uid", "o_custkey",
                    "o_orderstatus", "rev_cents",
                )
            ).unionByName(
                o_state.join(
                    d_l, o_state["o_orderkey"] == d_l["l_orderkey"]
                ).select(
                    "o_orderkey", "l_linenumber", "l_uid", "o_custkey",
                    "o_orderstatus", "rev_cents",
                )
            )
        MT.merge_upsert_atomic(
            spark, mart, new_rows,
            keys=["o_orderkey", "l_linenumber", "l_uid"],
        )
        MT.merge_upsert_atomic(spark, so, d_o, keys=["o_orderkey"])
        MT.merge_upsert_atomic(
            spark, sl, d_l, keys=["l_orderkey", "l_linenumber", "l_uid"]
        )
        first = False
    _STREAM_MART_CACHE[cache_key] = root
    return MT.read_table(spark, mart)


@register(
    "incremental_join_mart_check",
    oracle="""
SELECT o.o_orderkey, CAST(l.l_linenumber AS INT) AS l_linenumber,
       o.o_custkey, o.o_orderstatus,
       CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100.0 + 0.5)
            AS BIGINT) AS rev_cents
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
""",
    doc="Incremental MATERIALIZED JOIN maintenance — the delta-join "
    "IVM recurrence d(A JOIN B) = dA JOIN dB + dA JOIN B_old + "
    "A_old JOIN dB, run over deliberately OUT-OF-ORDER batches "
    "(batch 1: low orderkeys but only their odd line numbers; "
    "batch 2 re-delivers everything) so a high-watermark cursor "
    "could NOT express the cut and every delta term fires. Deltas "
    "detected by anti-join against the stored side states "
    "(exactly-once under re-delivery), all writes crash-atomic "
    "manifest merges. The maintained mart must equal the one-shot "
    "join row-for-row — per batch only delta x state keys shuffle, "
    "never state x state: the 100 TB denormalization shape.",
)
def q_incremental_join_mart_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    mart = _materialized_join_mart(spark, sf_dir)
    return mart.select(
        "o_orderkey",
        F.col("l_linenumber").cast("int").alias("l_linenumber"),
        "o_custkey",
        "o_orderstatus",
        F.col("rev_cents").cast("bigint").alias("rev_cents"),
    )


def _materialized_outer_join_mart(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAM-STREAM LEFT OUTER interval join (r9 — the outer-emission
    semantics none of the inner-join checks exercise): views LEFT
    OUTER joined to purchases on user_id with ``p_ts in [v_ts,
    v_ts + 1h]``, both sides under 2-hour watermarks, drained
    append-mode under Trigger.AvailableNow. The outer half of the
    contract: an unmatched view's null row is emitted only once the
    GLOBAL watermark — min over both inputs of max(event time) minus
    the 2h delay (Spark's default multipleWatermarkPolicy=min) —
    passes v_ts + 1h, i.e. once no future purchase could still join
    it. Views younger than that stay in state and are dropped at
    availableNow termination, so the mart is exactly: every batch
    inner-join pair, plus a null row per unmatched view whose join
    window CLOSED under the final watermark (the oracle restates
    both terms in closed form; calibrated set-exact at sf0.001 and
    sf0.01)."""
    import atexit
    import os
    import tempfile

    cache_key = f"{sf_dir}::outer_join"
    path = _STREAM_MART_CACHE.get(cache_key)
    if path is not None:
        return spark.read.parquet(os.path.join(path, "mart"))
    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="stream_oj_")
    mart = os.path.join(root, "mart")
    ckpt = os.path.join(root, "ckpt")

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def src() -> DataFrame:
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        return convert_nanos_ts(raw)

    views = (
        src()
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id"),
            F.col("ts").cast("timestamp").alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", "2 hours")
    )
    purchases = (
        src()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = views.join(
        purchases,
        F.expr(
            "user_id = p_user AND p_ts >= v_ts "
            "AND p_ts <= v_ts + interval 1 hour"
        ),
        "left_outer",
    ).select("user_id", "view_id", "purchase_id", "v_ts", "p_ts")
    (
        joined.writeStream.format("parquet")
        .option("path", mart)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    _STREAM_MART_CACHE[cache_key] = root
    return spark.read.parquet(mart)


@register(
    "streaming_outer_join_mart_check",
    oracle="""
WITH v AS (
    SELECT user_id, ts AS v_ts, event_id AS view_id
    FROM events WHERE event_type = 'view'
),
p AS (
    SELECT user_id AS p_user, ts AS p_ts, event_id AS purchase_id
    FROM events WHERE event_type = 'purchase'
),
m AS (
    SELECT v.view_id FROM v JOIN p ON p.p_user = v.user_id
                      AND p.p_ts >= v.v_ts
                      AND p.p_ts <= v.v_ts + INTERVAL 1 HOUR
),
wm AS (
    SELECT least((SELECT MAX(v_ts) FROM v), (SELECT MAX(p_ts) FROM p))
           - INTERVAL 2 HOUR AS w
),
nulls AS (
    SELECT u.view_id, u.v_ts
    FROM v u, wm
    WHERE NOT EXISTS (SELECT 1 FROM p
                      WHERE p.p_user = u.user_id
                        AND p.p_ts >= u.v_ts
                        AND p.p_ts <= u.v_ts + INTERVAL 1 HOUR)
      AND u.v_ts + INTERVAL 1 HOUR < wm.w
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM m) AS n_matched,
       CAST(COUNT(*) AS BIGINT) AS n_null_views,
       MIN(v_ts) AS null_min_v_ts,
       MAX(v_ts) AS null_max_v_ts
FROM nulls
""",
    doc="STREAM-STREAM LEFT OUTER interval join round trip (r9): the "
    "outer-emission contract — null rows appear exactly for "
    "unmatched views whose join window closed under the final "
    "global watermark (min over both inputs, Spark's default "
    "multipleWatermarkPolicy) — stated in closed form by the "
    "oracle: batch-inner-join pairs + watermark-filtered anti-join "
    "views. Set-exact calibration at two SFs; the check aggregates "
    "the drained mart so the driver hashes both halves.",
)
def q_streaming_outer_join_mart_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    mart = _materialized_outer_join_mart(spark, sf_dir)
    nulls = mart.filter(F.col("purchase_id").isNull())
    matched = mart.filter(F.col("purchase_id").isNotNull())
    return (
        matched.agg(F.count(F.lit(1)).cast("bigint").alias("n_matched"))
        .crossJoin(
            nulls.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_null_views"),
                F.min("v_ts").cast("timestamp_ntz").alias("null_min_v_ts"),
                F.max("v_ts").cast("timestamp_ntz").alias("null_max_v_ts"),
            )
        )
    )


def _materialized_full_outer_join_mart(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAM-STREAM FULL OUTER interval join (r10 — one shape past
    r9's left outer): same views⟗purchases interval join under 2-hour
    watermarks, append-mode, Trigger.AvailableNow. BOTH outer halves
    now carry emission contracts under the global min-policy
    watermark wm = min(max v_ts, max p_ts) − 2h:

    - an unmatched VIEW's null row emits once wm passes v_ts + 1h
      (no future purchase in [v_ts, v_ts+1h] can arrive) — identical
      to the left-outer mart;
    - an unmatched PURCHASE's null row emits once wm passes p_ts:
      its joinable views live in [p_ts − 1h, p_ts], and once wm > p_ts
      any such view would be late and dropped, so the state evicts.

    Both predicates verified SET-exact against the drained mart at
    sf0.001 and sf0.01 (count + row-level parity via the oracle's
    hash over all three row classes)."""
    import atexit
    import os
    import tempfile

    cache_key = f"{sf_dir}::full_outer_join"
    path = _STREAM_MART_CACHE.get(cache_key)
    if path is not None:
        return spark.read.parquet(os.path.join(path, "mart"))
    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="stream_foj_")
    mart = os.path.join(root, "mart")
    ckpt = os.path.join(root, "ckpt")

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def src() -> DataFrame:
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        return convert_nanos_ts(raw)

    views = (
        src()
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id"),
            F.col("ts").cast("timestamp").alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", "2 hours")
    )
    purchases = (
        src()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = views.join(
        purchases,
        F.expr(
            "user_id = p_user AND p_ts >= v_ts "
            "AND p_ts <= v_ts + interval 1 hour"
        ),
        "full_outer",
    ).select("user_id", "view_id", "purchase_id", "v_ts", "p_ts")
    (
        joined.writeStream.format("parquet")
        .option("path", mart)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    _STREAM_MART_CACHE[cache_key] = root
    return spark.read.parquet(mart)


@register(
    "streaming_full_outer_join_mart_check",
    oracle="""
WITH v AS (
    SELECT user_id, ts AS v_ts, event_id AS view_id
    FROM events WHERE event_type = 'view'
),
p AS (
    SELECT user_id AS p_user, ts AS p_ts, event_id AS purchase_id
    FROM events WHERE event_type = 'purchase'
),
wm AS (
    SELECT least((SELECT MAX(v_ts) FROM v), (SELECT MAX(p_ts) FROM p))
           - INTERVAL 2 HOUR AS w
)
SELECT 'matched' AS side, v.view_id, p.purchase_id
FROM v JOIN p ON p.p_user = v.user_id
             AND p.p_ts >= v.v_ts
             AND p.p_ts <= v.v_ts + INTERVAL 1 HOUR
UNION ALL
SELECT 'null_view' AS side, u.view_id, CAST(NULL AS BIGINT) AS purchase_id
FROM v u, wm
WHERE NOT EXISTS (SELECT 1 FROM p
                  WHERE p.p_user = u.user_id
                    AND p.p_ts >= u.v_ts
                    AND p.p_ts <= u.v_ts + INTERVAL 1 HOUR)
  AND u.v_ts + INTERVAL 1 HOUR < wm.w
UNION ALL
SELECT 'null_purchase' AS side, CAST(NULL AS BIGINT) AS view_id,
       pp.purchase_id
FROM p pp, wm
WHERE NOT EXISTS (SELECT 1 FROM v
                  WHERE v.user_id = pp.p_user
                    AND pp.p_ts >= v.v_ts
                    AND pp.p_ts <= v.v_ts + INTERVAL 1 HOUR)
  AND pp.p_ts < wm.w
""",
    doc="STREAM-STREAM FULL OUTER interval join (r10 — one shape past "
    "the r9 left outer): BOTH outer halves carry closed-form "
    "emission contracts under the global min-policy watermark wm. "
    "Unmatched views null-emit once wm > v_ts + 1h (their purchase "
    "window closed); unmatched purchases null-emit once wm > p_ts "
    "(their joinable views live in [p_ts − 1h, p_ts], and anything "
    "arriving below wm would be dropped as late). The check is "
    "ROW-LEVEL — every matched pair and every null row of both "
    "sides hashes against the oracle's three-way union, stronger "
    "than the left-outer mart's aggregate check.",
)
def q_streaming_full_outer_join_mart_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    mart = _materialized_full_outer_join_mart(spark, sf_dir)
    side = (
        F.when(
            F.col("view_id").isNotNull() & F.col("purchase_id").isNotNull(),
            F.lit("matched"),
        )
        .when(F.col("purchase_id").isNull(), F.lit("null_view"))
        .otherwise(F.lit("null_purchase"))
    )
    return mart.select(side.alias("side"), "view_id", "purchase_id")


def _materialized_clone_marts(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shallow-clone round trip (r9): orders before 1998 merge into a
    SOURCE atomic table (status-partitioned); ``clone_table`` commits
    a zero-copy clone (one JSON write — the clone's v1 manifest
    points at the source's immutable dirs by absolute path); the
    1998+ orders then merge into the CLONE ONLY. Returns (source,
    clone, clone@v1): the source must still be exactly the pre-1998
    set (copy-on-write isolation), the clone the full set, and the
    clone's v1 time-travel read the original snapshot."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark import manifest_table as MT

    cache_key = f"{sf_dir}::clone"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is None:
        if not _STREAM_MART_CACHE:
            atexit.register(_cleanup_stream_cache)
        root = tempfile.mkdtemp(prefix="clone_mart_")
        src = os.path.join(root, "src")
        dst = os.path.join(root, "dst")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        cut = F.to_timestamp(F.lit("1998-01-01"))
        MT.merge_upsert_atomic(
            spark,
            src,
            orders.filter(F.col("o_orderdate") < cut),
            keys=["o_orderkey"],
            partition_by="o_orderstatus",
        )
        MT.clone_table(src, dst)
        MT.merge_upsert_atomic(
            spark,
            dst,
            orders.filter(F.col("o_orderdate") >= cut),
            keys=["o_orderkey"],
            partition_by="o_orderstatus",
        )
        _STREAM_MART_CACHE[cache_key] = root
    src = os.path.join(root, "src")
    dst = os.path.join(root, "dst")
    return (
        MT.read_table(spark, src),
        MT.read_table(spark, dst),
        MT.read_table(spark, dst, version=1),
    )


@register(
    "atomic_clone_check",
    oracle="""
WITH pre AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
),
full_t AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders
)
SELECT pre.n AS src_rows, pre.cents AS src_cents,
       full_t.n AS clone_rows, full_t.cents AS clone_cents,
       pre.n AS clone_v1_rows,
       full_t.n - pre.n AS clone_only_rows
FROM pre, full_t
""",
    doc="ZERO-COPY SHALLOW CLONE round trip (r9, the Delta "
    "CLONE-SHALLOW shape): source = pre-1998 orders through the "
    "crash-atomic merge sink; clone_table commits a v1 manifest "
    "pointing at the source's immutable dirs (one JSON write, no "
    "data IO); 1998+ orders merge into the CLONE only. The check "
    "reads all three surfaces — source (must still be the pre-1998 "
    "snapshot: copy-on-write isolation), clone (the full set), and "
    "the clone's v1 time travel (the original snapshot) — and the "
    "oracle restates each as plain SQL over orders "
    "(manifest_table.py::clone_table).",
)
def q_atomic_clone_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    src, clone, clone_v1 = _materialized_clone_marts(spark, sf_dir)
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast(
        "bigint"
    )

    def prof(df: DataFrame, n_name: str, c_name: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias(n_name),
            F.sum(cents).cast("bigint").alias(c_name),
        )

    return (
        prof(src, "src_rows", "src_cents")
        .crossJoin(prof(clone, "clone_rows", "clone_cents"))
        .crossJoin(
            clone_v1.agg(
                F.count(F.lit(1)).cast("bigint").alias("clone_v1_rows")
            )
        )
        .select(
            "src_rows",
            "src_cents",
            "clone_rows",
            "clone_cents",
            "clone_v1_rows",
            (F.col("clone_rows") - F.col("src_rows"))
            .cast("bigint")
            .alias("clone_only_rows"),
        )
    )


def _materialized_stateful_latest_mart(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CUSTOM STATEFUL operator through the streaming engine (r9 —
    applyInPandasWithState, the one §2.10 surface previously covered
    only by pytest): the events file stream folds into a per-user
    running-latest state (streaming/stateful.py::streaming_latest_state
    — newest ts wins, event_id breaks ties), each micro-batch's
    update-mode emissions merged by key into a parquet state table via
    foreachBatch. Converges to the batch ROW_NUMBER compaction no
    matter how the input is micro-batched (out-of-order and duplicate
    delivery fold to the same winner)."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark.incremental import merge_upsert
    from stripe_data_pipeline_spark.streaming.stateful import (
        streaming_latest_state,
    )

    cache_key = f"{sf_dir}::stateful_latest"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is not None:
        return spark.read.parquet(os.path.join(root, "mart"))
    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="stream_state_")
    mart = os.path.join(root, "mart")
    ckpt = os.path.join(root, "ckpt")

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    staged = convert_nanos_ts(raw).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        if not batch.isEmpty():
            merge_upsert(
                batch.sparkSession, mart, batch, keys=["user_id"]
            )

    (
        streaming_latest_state(staged)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    _STREAM_MART_CACHE[cache_key] = root
    return spark.read.parquet(mart)


@register(
    "streaming_stateful_latest_mart_check",
    oracle="""
WITH r AS (
    SELECT user_id, event_id, ts, event_type, value,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
SELECT user_id, event_id, ts AS latest_ts, event_type,
       CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_cents
FROM r WHERE rn = 1
""",
    doc="CUSTOM STATEFUL streaming operator round trip (r9): "
    "applyInPandasWithState folds each user's events into a "
    "running-latest state (newest ts, event_id tiebreak) and the "
    "update-mode emissions merge into a keyed mart — the mart must "
    "equal the batch ROW_NUMBER changelog compaction row-for-row "
    "(the oracle). The continuous form of latest_event_per_user; "
    "state is one tuple per key, so executor memory scales with "
    "|keys|, never with event volume "
    "(streaming/stateful.py::streaming_latest_state).",
)
def q_streaming_stateful_latest_mart_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    mart = _materialized_stateful_latest_mart(spark, sf_dir)
    return mart.select(
        "user_id",
        "event_id",
        F.timestamp_micros(F.col("ts_micros"))
        .cast("timestamp_ntz")
        .alias("latest_ts"),
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("value_cents"),
    )


def _materialized_mor_marts(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Two identical event marts driven through the MERGE-ON-READ
    delete path (round 9): both merge events keyed by event_id and
    delete value >= 300 via delete_where_mor — a zero-rewrite commit
    whose cost is one small equality-delete file (the Iceberg
    equality-delete / Delta deletion-vector economics); the second
    mart then runs apply_deletes, the single copy-on-write pass that
    rewrites only partitions still holding deleted keys and clears the
    delete list. Readers of BOTH states must produce the identical
    relation — the pending state through the scan-time anti-join, the
    materialized state from the rewritten files alone."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark import manifest_table as MT
    from stripe_data_pipeline_spark.io import read_table as _rt

    root = _mor_mart_root(spark, sf_dir)
    return (
        MT.read_table(spark, os.path.join(root, "pending")),
        MT.read_table(spark, os.path.join(root, "materialized")),
    )


def _mor_mart_root(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per session) the two MOR-delete marts and return
    their parent dir: ``pending`` stops after delete_where_mor (v1
    merge, v2 delete_mor), ``materialized`` additionally runs
    apply_deletes (v3)."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark import manifest_table as MT
    from stripe_data_pipeline_spark.io import read_table as _rt

    cache_key = sf_dir + "#mor"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is None:
        if not _STREAM_MART_CACHE:
            atexit.register(_cleanup_stream_cache)
        root = tempfile.mkdtemp(prefix="mor_mart_")
        ev = _rt(spark, sf_dir, "events").select(
            "event_id", "event_type", "user_id", "value"
        )
        for name in ("pending", "materialized"):
            mart = os.path.join(root, name)
            MT.merge_upsert_atomic(
                spark, mart, ev, keys=["event_id"], partition_by="event_type"
            )
            n = MT.delete_where_mor(
                spark, mart, F.col("value") >= 300.0, keys=["event_id"]
            )
            if n <= 0:  # the check must exercise a non-empty delete
                raise RuntimeError(
                    "streaming MOR mart builder: delete_where_mor "
                    "removed nothing — the check would be vacuous"
                )
        MT.apply_deletes(spark, os.path.join(root, "materialized"))
        _STREAM_MART_CACHE[cache_key] = root
    return root


@register(
    "atomic_mor_delete_check",
    oracle=f"""
WITH agg AS (
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {sum_usd_cents_sql("value")} AS total_value
    FROM events
    WHERE value < 3e2
    GROUP BY event_type
)
SELECT p.phase, a.event_type, a.n_events, a.n_users, a.total_value
FROM agg a, (SELECT UNNEST(['pending', 'materialized']) AS phase) p
""",
    doc="MERGE-ON-READ deletes under the driver oracle (the Iceberg "
    "equality-delete / Delta deletion-vector shape): merge events "
    "into an atomic mart, delete value >= 300 as ONE small equality-"
    "delete file — the data parts mapping is untouched, commit cost "
    "∝ deleted keys, not data — then read back in BOTH states: "
    "'pending' (scan-time anti-join of the delete keys) and "
    "'materialized' (after apply_deletes' single copy-on-write pass "
    "over only the partitions holding deleted keys). Both phases "
    "must bit-match plain SQL with the delete restated as a filter. "
    "Zero-rewrite commit, vacuum safety, resurrection guard and "
    "clone transfer are pytest-pinned in tests/test_mor_deletes.py.",
)
def q_atomic_mor_delete_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pending, materialized = _materialized_mor_marts(spark, sf_dir)

    def prof(df: DataFrame, phase: str) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            sum_usd_cents(F.col("value")).alias("total_value"),
        ).select(F.lit(phase).alias("phase"), "*")

    return prof(pending, "pending").unionByName(
        prof(materialized, "materialized")
    )


@register(
    "atomic_mor_cdf_check",
    oracle="""
SELECT p.span, 'delete' AS _change_type, e.event_id, e.event_type,
       e.user_id,
       CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT) AS value_cents
FROM events e,
     (SELECT UNNEST(['pending_delete', 'across_apply']) AS span) p
WHERE e.value >= 3e2
""",
    doc="Change feed ACROSS merge-on-read commits (r10, ADVICE r9 "
    "fix): read_changes must surface a delete_where_mor commit as "
    "`delete` rows even though NO data dir changed (span "
    "pending_delete: v1→v2 of the pending mart), report the same "
    "logical deletes exactly once when the range spans the later "
    "apply_deletes (across_apply: v1→v3 of the materialized mart), "
    "and report NOTHING for apply_deletes alone (apply_only: v2→v3 "
    "— a physical rewrite of rows already logically dead; any row "
    "it emitted would break the oracle hash). The unchanged-dir "
    "delta is computed with semi-joins against the broadcast-sized "
    "delete-key delta, never an all-rows exceptAll "
    "(manifest_table.read_changes).",
)
def q_atomic_mor_cdf_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from stripe_data_pipeline_spark import manifest_table as MT

    root = _mor_mart_root(spark, sf_dir)
    pending = os.path.join(root, "pending")
    materialized = os.path.join(root, "materialized")
    spans = [
        (MT.read_changes(spark, pending, 1, 2), "pending_delete"),
        (MT.read_changes(spark, materialized, 1, 3), "across_apply"),
        (MT.read_changes(spark, materialized, 2, 3), "apply_only"),
    ]
    out = None
    for feed, label in spans:
        part = feed.select(
            F.lit(label).alias("span"),
            "_change_type",
            "event_id",
            "event_type",
            "user_id",
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("value_cents"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def _materialized_renamed_mart(spark: SparkSession, sf_dir: str) -> str:
    """Column-mapping round trip (VERDICT r10 #5, the Delta
    column-mapping shape): merge the EVEN-event_id half of events,
    RENAME two columns as metadata-only commits (user_id -> actor_id,
    value -> value_usd — no data dir rewritten; physical names stay
    pinned in the manifest), then merge the ODD half under the NEW
    logical names (its files are written under the pinned PHYSICAL
    names). The deterministic even/odd split lets the oracle replay
    BOTH the final state and the pre-rename snapshot exactly.
    Returns the mart root; callers read current AND version=1."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark import manifest_table as MT
    from stripe_data_pipeline_spark.io import read_table as _rt

    cache_key = sf_dir + "#renamed"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is not None:
        return os.path.join(root, "mart")
    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="renamed_mart_")
    mart = os.path.join(root, "mart")

    ev = _rt(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    MT.merge_upsert_atomic(
        spark, mart, ev.filter(F.col("event_id") % 2 == 0),
        keys=["event_id"], partition_by="event_type",
        stats_cols=["event_id"],
    )
    MT.rename_column(spark, mart, "user_id", "actor_id")
    MT.rename_column(spark, mart, "value", "value_usd")
    odds = ev.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "event_type",
        F.col("user_id").alias("actor_id"),
        F.col("value").alias("value_usd"),
    )
    MT.merge_upsert_atomic(
        spark, mart, odds, keys=["event_id"], partition_by="event_type",
        stats_cols=["event_id"],
    )
    _STREAM_MART_CACHE[cache_key] = root
    return mart


@register(
    "atomic_column_rename_check",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_actors,
       {sum_usd_cents_sql("value")} AS total_value_usd,
       CAST(COUNT(*) FILTER (WHERE event_id % 2 = 0) AS BIGINT)
           AS v1_n_events,
       {sum_usd_cents_sql("CASE WHEN event_id % 2 = 0 THEN value END")}
           AS v1_total_value
FROM events
GROUP BY event_type
""",
    doc="Column-mapping evolution under the driver oracle (VERDICT "
    "r10 #5): merge the even half of events, rename user_id->actor_id "
    "and value->value_usd as METADATA-ONLY commits (manifest pins the "
    "physical on-disk names; zero dirs rewritten at any table size), "
    "merge the odd half under the new logical names, then aggregate "
    "the CURRENT table (new names) joined with a TIME-TRAVEL read of "
    "the pre-rename snapshot (old names, old values). Bit-matches "
    "plain SQL over events iff reads project through the mapping, "
    "post-rename merges write under pinned physical names, manifest "
    "stats survive the rename (the HWM/stats are keyed physical), and "
    "every historical snapshot stays readable under its own schema. "
    "Rename/drop unit semantics (retired physical names, constraint "
    "and MOR-delete-key follow-through, OCC rebase refusal) are "
    "pinned in tests/test_column_mapping.py.",
)
def q_atomic_column_rename_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from stripe_data_pipeline_spark import manifest_table as MT

    mart = _materialized_renamed_mart(spark, sf_dir)
    cur = MT.read_table(spark, mart).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("actor_id").alias("n_actors"),
        sum_usd_cents(F.col("value_usd")).alias("total_value_usd"),
    )
    v1 = MT.read_table(spark, mart, version=1).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("v1_n_events"),
        sum_usd_cents(F.col("value")).alias("v1_total_value"),
    )
    # left join: an event_type whose rows are all odd has no v1 group;
    # the oracle's FILTER count gives 0 there (its SUM stays NULL)
    return cur.join(v1, "event_type", "left").withColumn(
        "v1_n_events", F.coalesce(F.col("v1_n_events"), F.lit(0))
    )


def _materialized_tws_latest_mart(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The running-latest mart on Spark 4's ``transformWithState``
    (VERDICT r10 #4 — the successor state API): same per-user fold as
    _materialized_stateful_latest_mart but the state lives in a NAMED
    ValueState on a StatefulProcessorHandle (RocksDB-backed; the API
    requires the RocksDB state store provider) instead of
    applyInPandasWithState's single per-key blob. update-mode
    emissions merge into a keyed parquet mart via foreachBatch, and
    the mart must converge to the batch ROW_NUMBER compaction
    regardless of micro-batching. The Python<->JVM state protocol is
    protobuf; streaming/pbshim.py bootstraps a runtime on hosts
    without one (the reason this query exists alongside the
    applyInPandasWithState twin rather than replacing it)."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark.incremental import merge_upsert
    from stripe_data_pipeline_spark.streaming.stateful import (
        streaming_latest_state_tws,
    )

    cache_key = f"{sf_dir}::tws_latest"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is not None:
        return spark.read.parquet(os.path.join(root, "mart"))
    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="stream_tws_")
    mart = os.path.join(root, "mart")
    ckpt = os.path.join(root, "ckpt")

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    staged = convert_nanos_ts(raw).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        if not batch.isEmpty():
            merge_upsert(
                batch.sparkSession, mart, batch, keys=["user_id"]
            )

    (
        streaming_latest_state_tws(staged)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    _STREAM_MART_CACHE[cache_key] = root
    return spark.read.parquet(mart)


@register(
    "streaming_tws_latest_mart_check",
    oracle="""
WITH r AS (
    SELECT user_id, event_id, ts, event_type, value,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
SELECT user_id, event_id, ts AS latest_ts, event_type,
       CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_cents
FROM r WHERE rn = 1
""",
    doc="transformWithState round trip (VERDICT r10 #4 — Spark 4's "
    "replacement for the groupState APIs): the per-user running-"
    "latest fold as a StatefulProcessor with a named ValueState "
    "(RocksDB-backed), update-mode emissions merged into a keyed "
    "mart; must equal the batch ROW_NUMBER changelog compaction "
    "row-for-row — the exact oracle of its applyInPandasWithState "
    "twin streaming_stateful_latest_mart_check, making the two state "
    "APIs interchangeable by construction. Value-state TTL expiry "
    "(the bounded-state knob for churning key spaces) is pinned in "
    "tests/test_streaming_stateful.py; the protobuf runtime "
    "bootstrap the Python state protocol needs on wheel-less hosts "
    "lives in streaming/pbshim.py "
    "(streaming/stateful.py::streaming_latest_state_tws).",
)
def q_streaming_tws_latest_mart_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    mart = _materialized_tws_latest_mart(spark, sf_dir)
    return mart.select(
        "user_id",
        "event_id",
        F.timestamp_micros(F.col("ts_micros"))
        .cast("timestamp_ntz")
        .alias("latest_ts"),
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("value_cents"),
    )


def _materialized_group_txn_marts(spark: SparkSession, sf_dir: str) -> str:
    """TWO-MART ATOMIC TRANSACTION (VERDICT r10 #8 — the reference's
    implicit DAG-run atomicity, stripe_update_dag.py:7-42, as an
    explicit visibility unit): a by-type mart and a by-user mart
    advance through group_merge_atomic in two nightly "runs" (even
    event_ids, then the rest). Run 2 is first attempted with a KILL
    injected after the first table's commit — the group pointer must
    still serve run-1 state for BOTH marts (no torn read; asserted
    here), then the same run re-delivers with the same txn version:
    already-committed tables skip via their ledgers, the group pointer
    lands, and the final group read equals plain SQL over ALL events."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark import table_group as TG
    from stripe_data_pipeline_spark.io import read_table as _rt

    cache_key = sf_dir + "#grouptxn"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is not None:
        return os.path.join(root, "group")
    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="group_txn_")
    group = os.path.join(root, "group")
    TG.create_group(
        group,
        {
            "by_type": os.path.join(root, "by_type"),
            "by_user": os.path.join(root, "by_user"),
        },
    )

    ev = _rt(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")

    def batches(rows: DataFrame) -> dict:
        by_type = rows.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(cents).cast("bigint").alias("total_cents"),
        )
        by_user = rows.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(cents).cast("bigint").alias("total_cents"),
        )
        return {
            "by_type": {"updates": by_type, "keys": ["event_type"]},
            "by_user": {"updates": by_user, "keys": ["user_id"]},
        }

    # NOTE the marts are rebuilt per run from the FULL prefix (runs
    # are cumulative aggregates, not folds) so the replayed batch is
    # idempotent by construction — the transaction machinery is what
    # is under test here, not incremental folding (that is
    # incremental_agg_mart_check's job).
    evens = ev.filter(F.col("event_id") % 2 == 0)
    TG.group_merge_atomic(
        spark, group, batches(evens), txn_app="nightly", txn_version=1
    )
    run1 = {
        n: TG.read_group_table(spark, group, n).count()
        for n in ("by_type", "by_user")
    }

    class _Kill(Exception):
        pass

    def kill_after_first(point: str) -> None:
        if point == "table_committed:by_type":
            raise _Kill(point)

    try:
        TG.group_merge_atomic(
            spark, group, batches(ev), txn_app="nightly", txn_version=2,
            _fault=kill_after_first,
        )
        raise AssertionError("kill point did not fire")
    except _Kill:
        pass
    # no torn read: BOTH marts still serve run 1 through the group
    torn = {
        n: TG.read_group_table(spark, group, n).count()
        for n in ("by_type", "by_user")
    }
    if torn != run1:
        raise RuntimeError(f"torn group read: {torn} != {run1}")
    # re-deliver the same run: by_type skips via its txn ledger,
    # by_user commits, the pointer lands
    TG.group_merge_atomic(
        spark, group, batches(ev), txn_app="nightly", txn_version=2
    )
    _STREAM_MART_CACHE[cache_key] = root
    return group


@register(
    "atomic_two_mart_txn_check",
    oracle="""
SELECT 'by_type' AS mart, event_type AS k,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM events GROUP BY event_type
UNION ALL
SELECT 'by_user', CAST(user_id AS VARCHAR),
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
FROM events GROUP BY user_id
""",
    doc="Two-mart atomic transaction under the driver oracle (VERDICT "
    "r10 #8): a by-type and a by-user mart commit through "
    "group_merge_atomic — per-table crash-atomic merges made visible "
    "by ONE group-pointer rename (the visibility unit of the "
    "reference's nightly DAG run). The materializer kills run 2 after "
    "the first table's commit and asserts the group still serves run "
    "1 for BOTH marts (no torn read), then re-delivers with the same "
    "txn version (the committed table skips via its ledger). The "
    "final group read must equal plain SQL over all events for both "
    "groupings; every kill boundary is additionally pytest-pinned "
    "(tests/test_table_group.py; stripe_data_pipeline_spark/"
    "table_group.py).",
)
def q_atomic_two_mart_txn_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from stripe_data_pipeline_spark import table_group as TG

    group = _materialized_group_txn_marts(spark, sf_dir)
    by_type = TG.read_group_table(spark, group, "by_type").select(
        F.lit("by_type").alias("mart"),
        F.col("event_type").alias("k"),
        "n",
        "total_cents",
    )
    by_user = TG.read_group_table(spark, group, "by_user").select(
        F.lit("by_user").alias("mart"),
        F.col("user_id").cast("string").alias("k"),
        "n",
        "total_cents",
    )
    return by_type.unionByName(by_user)


_TWS_ORACLE = """
WITH r AS (
    SELECT user_id, event_id, ts, event_type, value,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
SELECT user_id, event_id, ts AS latest_ts, event_type,
       CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_cents
FROM r WHERE rn = 1
"""


@register(
    "statestore_reader_check",
    oracle=_TWS_ORACLE,
    doc="STATE-STORE READER (VERDICT r11 #4 — the operational "
    "debugging surface every production streaming deployment uses): "
    "after the transformWithState query drains, its RocksDB "
    "checkpoint is read BACK as a DataFrame with "
    "spark.read.format('statestore') (stateVarName='latest'), and "
    "the keyed state itself — not the emissions — must bit-match the "
    "batch ROW_NUMBER changelog compaction. Proves the named "
    "ValueState holds exactly the converged fold for every key, and "
    "that state introspection works against this engine's "
    "checkpoints without touching the running query's code path.",
)
def q_statestore_reader_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os

    _materialized_tws_latest_mart(spark, sf_dir)  # drains + caches ckpt
    root = _STREAM_MART_CACHE[f"{sf_dir}::tws_latest"]
    state = (
        spark.read.format("statestore")
        .option("stateVarName", "latest")
        .load(os.path.join(root, "ckpt"))
    )
    return state.select(
        F.col("key.user_id").alias("user_id"),
        F.col("value.event_id").alias("event_id"),
        F.timestamp_micros(F.col("value.ts_micros"))
        .cast("timestamp_ntz")
        .alias("latest_ts"),
        F.col("value.event_type").alias("event_type"),
        F.floor(F.col("value.value") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("value_cents"),
    )


def _materialized_tws_bootstrap_mart(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Batch->streaming MIGRATION (VERDICT r11 #8): the per-user
    latest mart is first computed in BATCH over the even-event_id
    half (the pre-migration mart), then a NEW transformWithState
    query starts with that mart as ``initialState`` and folds only
    the odd-event_id half. The serving mart is seeded from the batch
    rows (handleInitialState may only seed state, not emit) and
    update-mode emissions converge it; after one incremental pass it
    must equal the batch oracle over ALL events — which fails if the
    bootstrap state is dropped, since a key whose true latest is in
    the batch half would be overwritten by a stream-only maximum."""
    import atexit
    import os
    import tempfile

    from pyspark.sql import Window

    from stripe_data_pipeline_spark.io import read_table
    from stripe_data_pipeline_spark.streaming.stateful import (
        streaming_latest_state_tws_bootstrap,
    )

    cache_key = f"{sf_dir}::tws_bootstrap"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is not None:
        return spark.read.parquet(os.path.join(root, "mart"))
    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="stream_tws_boot_")
    mart = os.path.join(root, "mart")
    ckpt = os.path.join(root, "ckpt")

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    ev = read_table(spark, sf_dir, "events")
    batch_half = ev.filter(F.col("event_id") % 2 == 0)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    batch_latest = (
        batch_half.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias(
                "ts_micros"
            ),
            "event_type",
            "value",
        )
    )
    # the pre-migration serving mart: seeded from batch, keyed on user
    merge_upsert(spark, mart, batch_latest, keys=["user_id"])

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    staged = (
        convert_nanos_ts(raw)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .filter(F.col("event_id") % 2 == 1)
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        if not batch.isEmpty():
            merge_upsert(
                batch.sparkSession, mart, batch, keys=["user_id"]
            )

    (
        streaming_latest_state_tws_bootstrap(staged, batch_latest)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    _STREAM_MART_CACHE[cache_key] = root
    return spark.read.parquet(mart)


@register(
    "streaming_tws_bootstrap_mart_check",
    oracle=_TWS_ORACLE,
    doc="transformWithState INITIAL-STATE BOOTSTRAP (VERDICT r11 #8 "
    "— the batch->streaming migration): the batch mart over the "
    "even-event half becomes initialState of a fresh "
    "transformWithState query that folds only the odd half; the "
    "seeded serving mart must converge to the batch ROW_NUMBER "
    "oracle over ALL events after one incremental pass. Dropping "
    "the bootstrap diverges (stream-only maxima overwrite batch-half "
    "winners), so the check proves handleInitialState actually "
    "seeded every key's ValueState.",
)
def q_streaming_tws_bootstrap_mart_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    mart = _materialized_tws_bootstrap_mart(spark, sf_dir)
    return mart.select(
        "user_id",
        "event_id",
        F.timestamp_micros(F.col("ts_micros"))
        .cast("timestamp_ntz")
        .alias("latest_ts"),
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("value_cents"),
    )


def _materialized_cdf_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subscribe a downstream consumer to the mislabel-correction
    scenario THROUGH the streaming change-feed source: v1 merges the
    first batch (buckets 40-59 mislabeled lang 'zz'), v2 merges the
    correction; the stream drains both committed versions as
    micro-batch offsets and appends the row-level feed to parquet.
    The feed must equal the closed-form change set the oracle derives
    from the bucket assignment — and, by construction of the source,
    each version's slice bit-matches batch read_changes."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark import manifest_table as MT
    from stripe_data_pipeline_spark.io import read_table
    from stripe_data_pipeline_spark.operators.sampling import hash_bucket
    from stripe_data_pipeline_spark.sources.manifest_cdf_source import (
        register_manifest_cdf_source,
    )

    cache_key = f"{sf_dir}::cdf_source"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is not None:
        return spark.read.parquet(os.path.join(root, "feed"))
    if not _STREAM_MART_CACHE:
        atexit.register(_cleanup_stream_cache)
    root = tempfile.mkdtemp(prefix="stream_cdf_src_")
    table = os.path.join(root, "table")

    docs = read_table(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id",
        "lang",
        F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
        .cast("bigint")
        .alias("n_tokens"),
        hash_bucket(F.col("doc_id"), 100, salt="ingest").alias("__b"),
    )
    day1 = (
        feats.filter(F.col("__b") < 60)
        .withColumn(
            "lang",
            F.when(F.col("__b") >= 40, F.lit("zz")).otherwise(F.col("lang")),
        )
        .drop("__b")
    )
    day2 = feats.filter(F.col("__b") >= 40).drop("__b")
    for batch in (day1, day2):
        MT.merge_upsert_atomic(
            spark, table, batch, keys=["doc_id"], partition_by="lang"
        )

    register_manifest_cdf_source(spark)
    (
        spark.readStream.format("manifestcdf")
        .option("path", table)
        .load()
        .writeStream.format("parquet")
        .option("path", os.path.join(root, "feed"))
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    _STREAM_MART_CACHE[cache_key] = root
    return spark.read.parquet(os.path.join(root, "feed"))


@register(
    "streaming_cdf_source_mart_check",
    oracle="""
WITH b AS (
    SELECT doc_id, lang,
           CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                AS BIGINT) AS n_tokens,
           CAST(('0x' || substr(md5('ingest' || CAST(doc_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 100 AS bkt
    FROM documents
)
SELECT CAST(1 AS BIGINT) AS _commit_version, 'insert' AS _change_type,
       doc_id,
       CASE WHEN bkt >= 40 THEN 'zz' ELSE lang END AS lang, n_tokens
FROM b WHERE bkt < 60
UNION ALL
SELECT CAST(2 AS BIGINT), 'delete', doc_id, 'zz', n_tokens
FROM b WHERE bkt >= 40 AND bkt < 60
UNION ALL
SELECT CAST(2 AS BIGINT), 'insert', doc_id, lang, n_tokens
FROM b WHERE bkt >= 40
""",
    doc="STREAMING CHANGE-DATA-FEED SOURCE (the Delta 'stream from a "
    "table's change feed' shape): spark.readStream.format("
    "'manifestcdf') subscribes to the crash-atomic mart's row-level "
    "changes — one committed VERSION per micro-batch offset, one "
    "input partition per (version, touched partition key), the task "
    "body a pure pyarrow/pandas old-vs-new dir multiset diff "
    "(sources/manifest_cdf_source.py; executors never rescan "
    "untouched dirs, exactly read_changes' manifest pruning). The "
    "drained feed over the mislabel-correction scenario (v1 inserts "
    "with buckets 40-59 mislabeled 'zz', v2 the delete+insert "
    "correction wave) must equal the closed-form change set derived "
    "from the bucket assignment. Crashed consumers resume at their "
    "checkpointed version; MOR spans and schema changes fail loudly "
    "(Delta's stop-the-stream behavior) — pytest-pinned.",
)
def q_streaming_cdf_source_mart_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    feed = _materialized_cdf_feed(spark, sf_dir)
    return feed.select(
        "_commit_version", "_change_type", "doc_id", "lang", "n_tokens"
    )


def _pos_mart_root(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per session) the two POSITIONAL-delete marts and
    return their parent dir: ``pending`` stops after two accumulated
    delete_where_pos commits (v1 merge, v2+v3 tombstones),
    ``materialized`` additionally runs apply_pos_deletes (v4)."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark import manifest_table as MT
    from stripe_data_pipeline_spark.io import read_table as _rt

    cache_key = sf_dir + "#pos"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is None:
        if not _STREAM_MART_CACHE:
            atexit.register(_cleanup_stream_cache)
        root = tempfile.mkdtemp(prefix="pos_mart_")
        ev = _rt(spark, sf_dir, "events").select(
            "event_id", "event_type", "user_id", "value"
        )
        for name in ("pending", "materialized"):
            mart = os.path.join(root, name)
            MT.merge_upsert_atomic(
                spark, mart, ev, keys=["event_id"], partition_by="event_type"
            )
            # two accumulating positional tombstone files; NO key
            # columns involved — coordinates are (file, row_index)
            n1 = MT.delete_where_pos(spark, mart, F.col("value") >= 250.0)
            n2 = MT.delete_where_pos(spark, mart, F.col("user_id") % 97 == 0)
            if n1 <= 0 or n2 <= 0:  # both must exercise real deletes
                raise RuntimeError(
                    "positional-delete mart builder: a delete matched "
                    "nothing — the check would be vacuous"
                )
        MT.apply_pos_deletes(spark, os.path.join(root, "materialized"))
        _STREAM_MART_CACHE[cache_key] = root
    return root


@register(
    "pos_delete_check",
    oracle=f"""
WITH agg AS (
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {sum_usd_cents_sql("value")} AS total_value
    FROM events
    WHERE NOT (value >= 250 OR user_id % 97 = 0)
    GROUP BY event_type
)
SELECT p.phase, a.event_type, a.n_events, a.n_users, a.total_value
FROM agg a, (SELECT UNNEST(['pending', 'materialized']) AS phase) p
""",
    doc="POSITIONAL (row-index) merge-on-read deletes under the "
    "driver oracle (r12 — the Delta deletion-vector / Iceberg "
    "position-delete shape, complementing the equality-delete row "
    "atomic_mor_delete_check): merge events into an atomic mart, "
    "then TWO accumulating delete_where_pos commits (value >= 250, "
    "then user_id % 97 = 0) — each writes one small (file, "
    "row_index) tombstone file; NO key columns required, so this "
    "works on keyless fact tables where equality deletes cannot be "
    "expressed, and renames can never invalidate it (tombstones "
    "store no column names). Read back in BOTH states: 'pending' "
    "(scan-time anti-join on the _metadata file identity, before "
    "the logical projection) and 'materialized' (after "
    "apply_pos_deletes rewrote ONLY the partitions holding "
    "tombstoned coordinates — read straight off the tombstones, no "
    "data probe). Both phases must bit-match plain SQL with the "
    "deletes restated as a filter. Lifecycle, refusal guards on "
    "raw rewriters, CDF surfacing, clone travel, hostile partition "
    "values and vacuum retention are pytest-pinned in "
    "tests/test_pos_deletes.py.",
)
def q_pos_delete_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from stripe_data_pipeline_spark import manifest_table as MT

    root = _pos_mart_root(spark, sf_dir)

    def prof(df: DataFrame, phase: str) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            sum_usd_cents(F.col("value")).alias("total_value"),
        ).select(F.lit(phase).alias("phase"), "*")

    return prof(
        MT.read_table(spark, os.path.join(root, "pending")), "pending"
    ).unionByName(
        prof(
            MT.read_table(spark, os.path.join(root, "materialized")),
            "materialized",
        )
    )


def _generated_mart_root(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per session) the generated-column mart: merge the
    EVEN-event_id half WITH the derived month column, declare it
    GENERATED ALWAYS AS, then merge the ODD half WITHOUT the column —
    the engine computes it and partitions identically (the canonical
    derived-partition-column flow every ingestion pipeline needs)."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark import manifest_table as MT
    from stripe_data_pipeline_spark.io import read_table as _rt

    cache_key = sf_dir + "#gen"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is None:
        if not _STREAM_MART_CACHE:
            atexit.register(_cleanup_stream_cache)
        root = tempfile.mkdtemp(prefix="gen_mart_")
        mart = os.path.join(root, "t")
        ev = _rt(spark, sf_dir, "events").select(
            "event_id", "event_type", "ts", "value"
        )
        month = F.date_trunc("MONTH", F.col("ts")).cast("date")
        MT.merge_upsert_atomic(
            spark,
            mart,
            ev.filter(F.col("event_id") % 2 == 0).withColumn("month", month),
            keys=["event_id"],
            partition_by="month",
        )
        MT.set_generation_expr(
            spark, mart, "month", "CAST(date_trunc('MONTH', ts) AS DATE)"
        )
        # the odd half OMITS month entirely: computed + partitioned by
        # the declaration, not by the writer
        MT.merge_upsert_atomic(
            spark,
            mart,
            ev.filter(F.col("event_id") % 2 == 1),
            keys=["event_id"],
            partition_by="month",
        )
        _STREAM_MART_CACHE[cache_key] = root
    return os.path.join(root, "t")


@register(
    "generated_column_check",
    oracle=f"""
SELECT CAST(date_trunc('MONTH', ts) AS DATE) AS month,
       event_type,
       COUNT(*) AS n_events,
       {sum_usd_cents_sql("value")} AS total_value
FROM events
GROUP BY 1, 2
""",
    doc="GENERATED ALWAYS AS columns under the driver oracle (r12 — "
    "the Delta generated-columns shape): a mart partitioned by a "
    "month column DECLARED as CAST(date_trunc('MONTH', ts) AS DATE). "
    "Half the rows are merged with the column supplied (validated "
    "against the expression — a conflicting value refuses before "
    "staging), half WITHOUT it (computed by the engine at merge "
    "entry, then partitioned by the computed value). The read-back "
    "grouped profile must bit-match plain SQL computing the same "
    "derivation inline — proving writer-independent partition layout, "
    "the property that makes a declared derivation superior to "
    "convention at 100 TB (no writer can mis-partition). Declaration "
    "validation, update_where recomputation, rename-following "
    "(literal-safe identifier rewrite), TOCTOU refusal and "
    "derived-commit survival are pytest-pinned in "
    "tests/test_generated_columns.py.",
)
def q_generated_column_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark import manifest_table as MT

    mart = _generated_mart_root(spark, sf_dir)
    return (
        MT.read_table(spark, mart)
        .groupBy("month", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_usd_cents(F.col("value")).alias("total_value"),
        )
    )


def _expectation_mart_root(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per session) the expectations mart: merge the
    event_id%3==0 third as the ungated baseline, declare TWO
    expectations — value_cap (value < 250, policy=quarantine) and
    user_known (user_id % 53 <> 0, policy=drop) — then merge the
    remaining two thirds through the gate. The gated merge's manifest
    commit carries the admitted rows, the quarantine capture AND the
    per-expectation audit counts in ONE version."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark import manifest_table as MT
    from stripe_data_pipeline_spark.io import read_table as _rt

    cache_key = sf_dir + "#expq"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is None:
        if not _STREAM_MART_CACHE:
            atexit.register(_cleanup_stream_cache)
        root = tempfile.mkdtemp(prefix="expq_mart_")
        mart = os.path.join(root, "t")
        ev = _rt(spark, sf_dir, "events").select(
            "event_id", "event_type", "user_id", "value"
        )
        MT.merge_upsert_atomic(
            spark,
            mart,
            ev.filter(F.col("event_id") % 3 == 0),
            keys=["event_id"],
            partition_by="event_type",
        )
        MT.set_expectation(spark, mart, "value_cap", "value < 250", policy="quarantine")
        MT.set_expectation(
            spark, mart, "user_known", "user_id % 53 <> 0", policy="drop"
        )
        MT.merge_upsert_atomic(
            spark,
            mart,
            ev.filter(F.col("event_id") % 3 != 0),
            keys=["event_id"],
            partition_by="event_type",
        )
        # the gate must have actually fired on this data, and the
        # commit audit must say so — a silently-empty gate would make
        # the oracle comparison vacuous. RuntimeError, not assert:
        # `python -O` strips asserts and the guard must survive it
        # (ADVICE r13, low).
        audit = MT.read_manifest(mart)["operation"]["expectations"]
        if not (
            audit["value_cap"]["violations"] > 0
            and audit["user_known"]["violations"] > 0
        ):
            raise RuntimeError(
                f"expectation mart gate never fired: {audit} — the "
                "oracle comparison would be vacuous"
            )
        _STREAM_MART_CACHE[cache_key] = root
    return os.path.join(root, "t")


@register(
    "expectation_quarantine_check",
    oracle=f"""
WITH flags AS (
    SELECT event_type, user_id, value,
           NOT COALESCE(value < 250, TRUE) AS viol_q,
           NOT COALESCE(user_id % 53 <> 0, TRUE) AS viol_d
    FROM events
    WHERE event_id % 3 <> 0
),
kept AS (
    SELECT event_type, user_id, value FROM events WHERE event_id % 3 = 0
    UNION ALL
    SELECT event_type, user_id, value
    FROM flags WHERE NOT viol_q AND NOT viol_d
),
quar AS (SELECT event_type, user_id, value FROM flags WHERE viol_q)
SELECT 'kept' AS phase, event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {sum_usd_cents_sql("value")} AS total_value
FROM kept GROUP BY event_type
UNION ALL
SELECT 'quarantined' AS phase, event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {sum_usd_cents_sql("value")} AS total_value
FROM quar GROUP BY event_type
""",
    doc="Declarative data-quality expectations with quarantine under "
    "the driver oracle (r13, VERDICT r12 #3 — the DLT EXPECT ... ON "
    "VIOLATION / dbt-test shape; completes the reference's "
    "DECLARED-but-unenforced tests, "
    "/root/reference/dbt/stripe/models/curated/schema.yml:4-19): a "
    "mart ingests two thirds of events through a gate of value_cap "
    "(value < 250 -> QUARANTINE) and user_known (user_id % 53 <> 0 "
    "-> DROP). Violating rows route to a quarantine relation "
    "committed atomically in the SAME manifest version as the "
    "admitted rows (read_quarantine), with per-expectation violation "
    "counts in the commit audit; NULL passes, only FALSE violates "
    "(the CHECK truth table), and a row violating both policies "
    "quarantines (preserving data wins). Both relations' grouped "
    "profiles must bit-match plain SQL partitioning the same input "
    "with the same predicates. Kill-tests at the commit boundary, "
    "exactly-once replay reaping, OCC/TOCTOU refusal, derived-commit "
    "carriers, restore/clone travel and vacuum retention are "
    "pytest-pinned in tests/test_expectations.py. At 100 TB the gate "
    "is one flag projection + one map-side count aggregate over the "
    "batch — no extra shuffle; the capture write scales with "
    "VIOLATING rows only.",
)
def q_expectation_quarantine_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from stripe_data_pipeline_spark import manifest_table as MT

    mart = _expectation_mart_root(spark, sf_dir)

    def prof(df: DataFrame, phase: str) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            sum_usd_cents(F.col("value")).alias("total_value"),
        ).select(F.lit(phase).alias("phase"), "*")

    return prof(MT.read_table(spark, mart), "kept").unionByName(
        prof(
            MT.read_quarantine(spark, mart).select(
                "event_type", "user_id", "value"
            ),
            "quarantined",
        )
    )


def _streaming_expectation_mart_root(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per session) the STREAMING-gated expectations mart:
    seed the event_id%10==0 tenth as an ungated batch baseline,
    declare the same two expectations the batch check uses, then
    drain the REST of the events table through readStream →
    foreachBatch → the gated merge_upsert_atomic with the txn ledger
    (txn_app/epoch) — the production shape: every micro-batch is
    split by the declaration, its rejects quarantined ATOMICALLY with
    its admitted rows in that batch's own commit, and a crashed
    batch's redelivery reaps its duplicate capture via exactly-once."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark import manifest_table as MT
    from stripe_data_pipeline_spark.io import read_table as _rt

    cache_key = sf_dir + "#sexp"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is None:
        if not _STREAM_MART_CACHE:
            atexit.register(_cleanup_stream_cache)
        root = tempfile.mkdtemp(prefix="sexp_mart_")
        mart = os.path.join(root, "t")
        cols = ["event_id", "event_type", "user_id", "value"]
        MT.merge_upsert_atomic(
            spark,
            mart,
            _rt(spark, sf_dir, "events")
            .select(*cols)
            .filter(F.col("event_id") % 10 == 0),
            keys=["event_id"],
            partition_by="event_type",
        )
        MT.set_expectation(spark, mart, "value_cap", "value < 250", policy="quarantine")
        MT.set_expectation(
            spark, mart, "user_known", "user_id % 53 <> 0", policy="drop"
        )

        schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )

        def gated_merge(batch: DataFrame, batch_id: int) -> None:
            if batch.isEmpty():
                return
            MT.merge_upsert_atomic(
                batch.sparkSession,
                mart,
                batch.select(*cols)
                .filter(F.col("event_id") % 10 != 0)
                .dropDuplicates(["event_id"]),
                keys=["event_id"],
                partition_by="event_type",
                txn_app="sexp_stream",
                txn_version=batch_id,
            )

        (
            raw.writeStream.foreachBatch(gated_merge)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        # the gate must have fired on streamed data, and the commit
        # audit must say so (vacuous-oracle guard, as in the batch
        # mart; RuntimeError so `python -O` can't strip it — ADVICE
        # r13, low)
        audits = [
            e["expectations"]
            for e in MT.history(mart)
            if e.get("expectations")
        ]
        if not (
            audits
            and any(a["value_cap"]["violations"] > 0 for a in audits)
        ):
            raise RuntimeError(
                "streaming expectation gate never fired — the oracle "
                "comparison would be vacuous"
            )
        _STREAM_MART_CACHE[cache_key] = root
    return os.path.join(root, "t")


@register(
    "streaming_expectation_mart_check",
    oracle=f"""
WITH flags AS (
    SELECT event_type, user_id, value,
           NOT COALESCE(value < 250, TRUE) AS viol_q,
           NOT COALESCE(user_id % 53 <> 0, TRUE) AS viol_d
    FROM events
    WHERE event_id % 10 <> 0
),
kept AS (
    SELECT event_type, user_id, value FROM events WHERE event_id % 10 = 0
    UNION ALL
    SELECT event_type, user_id, value
    FROM flags WHERE NOT viol_q AND NOT viol_d
),
quar AS (SELECT event_type, user_id, value FROM flags WHERE viol_q)
SELECT 'kept' AS phase, event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {sum_usd_cents_sql("value")} AS total_value
FROM kept GROUP BY event_type
UNION ALL
SELECT 'quarantined' AS phase, event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {sum_usd_cents_sql("value")} AS total_value
FROM quar GROUP BY event_type
""",
    doc="Expectations enforced INSIDE the streaming ingest path (r13 "
    "— the composition of the §2.10 foreachBatch merge machinery "
    "with the r13 quarantine gate, i.e. the DLT production shape): "
    "a mart seeded with an ungated tenth, gated by value_cap "
    "(quarantine) + user_known (drop), then the remaining events "
    "stream through readStream → foreachBatch → the gated "
    "merge_upsert_atomic under Trigger.AvailableNow with the txn "
    "ledger, so each micro-batch's rejects commit atomically WITH "
    "that batch's admitted rows and a redelivered epoch reaps its "
    "duplicate capture (exactly-once, pinned in "
    "tests/test_expectations.py). Kept + quarantined grouped "
    "profiles must bit-match the batch SQL partitioning of the same "
    "input — proving the streaming gate admits/rejects exactly what "
    "the declaration says regardless of micro-batch boundaries.",
)
def q_streaming_expectation_mart_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from stripe_data_pipeline_spark import manifest_table as MT

    mart = _streaming_expectation_mart_root(spark, sf_dir)

    def prof(df: DataFrame, phase: str) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            sum_usd_cents(F.col("value")).alias("total_value"),
        ).select(F.lit(phase).alias("phase"), "*")

    return prof(MT.read_table(spark, mart), "kept").unionByName(
        prof(
            MT.read_quarantine(spark, mart).select(
                "event_type", "user_id", "value"
            ),
            "quarantined",
        )
    )


def _quarantine_lifecycle_mart_root(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per session) the quarantine LIFECYCLE mart (r14,
    VERDICT r13 #3): seed an ungated third of events, declare the
    quarantine gate, ingest the remaining two thirds as TWO gated
    batches (two capture generations), then expire the FIRST
    generation with clear_quarantine(before_version=...) — the
    retention step a production ingest runs after an operator
    re-processes a capture. The table ends holding: every admitted
    row, ONLY the second generation's capture, and the clear's audit
    record in history."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark import manifest_table as MT
    from stripe_data_pipeline_spark.io import read_table as _rt

    cache_key = sf_dir + "#qlife"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is None:
        if not _STREAM_MART_CACHE:
            atexit.register(_cleanup_stream_cache)
        root = tempfile.mkdtemp(prefix="qlife_mart_")
        mart = os.path.join(root, "t")
        ev = _rt(spark, sf_dir, "events").select(
            "event_id", "event_type", "user_id", "value"
        )
        slice_ = F.col("event_id") % 3
        MT.merge_upsert_atomic(  # v1: ungated seed
            spark, mart, ev.filter(slice_ == 0), keys=["event_id"],
            partition_by="event_type",
        )
        MT.set_expectation(  # v2
            spark, mart, "value_cap", "value < 250", policy="quarantine"
        )
        MT.merge_upsert_atomic(  # v3: first capture generation
            spark, mart, ev.filter(slice_ == 1), keys=["event_id"],
            partition_by="event_type",
        )
        MT.merge_upsert_atomic(  # v4: second capture generation
            spark, mart, ev.filter(slice_ == 2), keys=["event_id"],
            partition_by="event_type",
        )
        pre = MT.read_quarantine(spark, mart).count()
        cleared = MT.clear_quarantine(mart, before_version=3)  # v5
        post = MT.read_quarantine(spark, mart).count()
        # vacuous-oracle guard (RuntimeError: survives python -O):
        # both generations must have captured rows, the clear must
        # have expired exactly the first, and time travel must still
        # see the pre-clear set
        pre_tt = MT.read_quarantine(spark, mart, version=4).count()
        if not (cleared > 0 and post > 0 and pre == cleared + post
                and pre_tt == pre):
            raise RuntimeError(
                f"lifecycle mart is vacuous: pre={pre} cleared={cleared} "
                f"post={post} time_travel={pre_tt}"
            )
        _STREAM_MART_CACHE[cache_key] = root
    return os.path.join(root, "t")


@register(
    "quarantine_lifecycle_check",
    oracle=f"""
WITH flags AS (
    SELECT event_type, user_id, value,
           CAST(event_id % 3 AS BIGINT) AS slice,
           NOT COALESCE(value < 250, TRUE) AS viol
    FROM events
),
kept AS (
    SELECT event_type, user_id, value FROM flags
    WHERE slice = 0 OR NOT viol
),
quar AS (
    SELECT event_type, user_id, value FROM flags
    WHERE slice = 2 AND viol
)
SELECT 'kept' AS phase, event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {sum_usd_cents_sql("value")} AS total_value
FROM kept GROUP BY event_type
UNION ALL
SELECT 'quarantined' AS phase, event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {sum_usd_cents_sql("value")} AS total_value
FROM quar GROUP BY event_type
UNION ALL
SELECT 'cleared' AS phase, 'ALL' AS event_type,
       (SELECT COUNT(*) FROM flags WHERE slice = 1 AND viol) AS n_events,
       CAST(1 AS BIGINT) AS n_users,
       CAST(NULL AS DOUBLE) AS total_value
""",
    doc="Quarantine retention lifecycle (r14, VERDICT r13 #3): a "
    "gated mart ingests two capture GENERATIONS (v3, v4), then "
    "clear_quarantine(before_version=3) expires the first as a "
    "metadata-only commit — the step an ingest pipeline runs after "
    "an operator re-processes a capture, without which the "
    "quarantine relation becomes its own retention problem at "
    "production volume. The check compares three phases against "
    "closed-form SQL: the admitted rows (every non-violating row "
    "plus the ungated seed), the SURVIVING capture (generation two "
    "ONLY — proving the floor expired exactly the first generation), "
    "and the clear's own audit record (cleared row count + rel count "
    "read back from history()), so the lifecycle is driver-verified "
    "end to end. Time travel to the pre-clear snapshot and "
    "restore/vacuum interactions are pytest-pinned in "
    "tests/test_r14_seams.py. At 100 TB the clear is O(1) metadata — "
    "no data is touched; capture dirs age out through vacuum's "
    "ordinary retention rule once no retained snapshot references "
    "them.",
)
def q_quarantine_lifecycle_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from stripe_data_pipeline_spark import manifest_table as MT

    mart = _quarantine_lifecycle_mart_root(spark, sf_dir)

    def prof(df: DataFrame, phase: str) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            sum_usd_cents(F.col("value")).alias("total_value"),
        ).select(F.lit(phase).alias("phase"), "*")

    clear_ops = [
        e for e in MT.history(mart) if e["type"] == "clear_quarantine"
    ]
    # literal SELECT (no FROM): Catalyst folds it to a LocalRelation,
    # so the audit row rides as metadata — no Python RDD scan
    audit = spark.sql(
        "SELECT 'cleared' AS phase, 'ALL' AS event_type, "
        f"CAST({int(clear_ops[0]['cleared_rows'])} AS BIGINT) AS n_events, "
        f"CAST({int(clear_ops[0]['cleared_rels'])} AS BIGINT) AS n_users, "
        "CAST(NULL AS DOUBLE) AS total_value"
    )
    return (
        prof(MT.read_table(spark, mart), "kept")
        .unionByName(
            prof(
                MT.read_quarantine(spark, mart).select(
                    "event_type", "user_id", "value"
                ),
                "quarantined",
            )
        )
        .unionByName(audit)
    )


# ---------------------------------------------------------------------
# streaming incremental dedup against the persisted LSH index (r14)
# ---------------------------------------------------------------------


def _streaming_incdedup_root(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per session) the STREAMING incremental-dedup run:
    index the base split batch-side, then drain two planted batches
    through readStream → foreachBatch → ``ingest_batch(
    record_decisions=True, txn_app=..., txn_version=batch_id)`` — the
    production ingest shape where each micro-batch's per-doc
    decisions, its keepers' signatures and their band rows become
    visible in ONE atomic group commit, and a redelivered epoch skips
    all three through the per-table txn ledger (a redelivery would
    RECOMPUTE different decisions — its own keepers are in the index
    by then, estimating 1.0 against themselves — which is exactly why
    the stored decisions are the batch's truth and exactly-once must
    cover them).

    Two separate ``Trigger.AvailableNow`` drains over one checkpoint
    pin the batch ORDER (batch2 must probe base+batch1-keepers — the
    incremental property), independent of file-listing order. The
    same planted splits as incremental_dedup_check, so the closed-form
    oracle helpers replay identically."""
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark.io import read_table as _rt
    from stripe_data_pipeline_spark.operators import incdedup as I
    from stripe_data_pipeline_spark import table_group as TG

    cache_key = sf_dir + "#sincdedup"
    root = _STREAM_MART_CACHE.get(cache_key)
    if root is None:
        if not _STREAM_MART_CACHE:
            atexit.register(_cleanup_stream_cache)
        root = tempfile.mkdtemp(prefix="sincdedup_")
        idx = os.path.join(root, "idx")
        in_dir = os.path.join(root, "in")
        docs = _rt(spark, sf_dir, "documents").select("doc_id", "text")
        base = docs.filter(F.col("doc_id") % 4 < 2)
        batch1 = docs.filter(F.col("doc_id") % 4 == 2).unionByName(
            docs.filter(F.col("doc_id") % 40 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zz")).alias("text"),
            )
        )
        batch2 = docs.filter(F.col("doc_id") % 4 == 3).unionByName(
            docs.filter(F.col("doc_id") % 40 == 2).select(
                (F.col("doc_id") + 2000000).alias("doc_id"), "text"
            )
        )
        I.build_dedup_index(spark, idx, base, with_decisions=True)

        last_epoch = {"id": -1}

        def ingest(batch: DataFrame, batch_id: int) -> None:
            if batch.isEmpty():
                return
            last_epoch["id"] = batch_id
            I.ingest_batch(
                batch.sparkSession,
                idx,
                batch.dropDuplicates(["doc_id"]),
                record_decisions=True,
                txn_app="incdedup_stream",
                txn_version=batch_id,
            )

        def drain() -> None:
            schema = "doc_id BIGINT, text STRING"
            (
                spark.readStream.schema(schema)
                .option("pathGlobFilter", "*.parquet")
                .parquet(in_dir)
                .writeStream.foreachBatch(ingest)
                .option("checkpointLocation", os.path.join(root, "ckpt"))
                .trigger(availableNow=True)
                .start()
                .awaitTermination()
            )

        batch1.write.mode("append").parquet(in_dir)
        drain()
        batch2.write.mode("append").parquet(in_dir)
        drain()

        dec = TG.read_group_table(spark, idx, I.DECISIONS)
        n_sigs = TG.read_group_table(spark, idx, I.SIGS).count()
        n_dec = dec.count()
        # vacuous-oracle guards (RuntimeError — `python -O` strips
        # asserts): the planted dups must be caught, batch2 must catch
        # a dup OF A BATCH1 DOC (the incremental append itself), and a
        # redelivered last epoch must change nothing (exactly-once
        # through the group txn ledger).
        if dec.filter(F.col("is_dup") & (F.col("doc_id") >= 1000000)).count() == 0:
            raise RuntimeError(
                "streaming incdedup: planted near-dups caught nothing — "
                "the check would be vacuous"
            )
        if (
            dec.filter(F.col("is_dup") & (F.col("dup_of") % 4 == 2)).count()
            == 0
        ):
            raise RuntimeError(
                "streaming incdedup: no duplicate resolves to a batch1 "
                "keeper — the incremental append is not being exercised"
            )
        I.ingest_batch(
            spark,
            idx,
            batch2.dropDuplicates(["doc_id"]),
            record_decisions=True,
            txn_app="incdedup_stream",
            txn_version=last_epoch["id"],
        )
        if (
            TG.read_group_table(spark, idx, I.SIGS).count() != n_sigs
            or TG.read_group_table(spark, idx, I.DECISIONS).count() != n_dec
        ):
            raise RuntimeError(
                "streaming incdedup: a redelivered epoch mutated the "
                "index — the txn ledger failed to skip it"
            )
        _STREAM_MART_CACHE[cache_key] = root
    return os.path.join(root, "idx")


def _streaming_incdedup_oracle() -> str:
    from stripe_data_pipeline_spark.catalog.text_queries import (
        _decisions_sql,
        _sig_sql,
    )

    return (
        """
WITH base AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 4 < 2
),
batch1 AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 4 = 2
    UNION ALL
    SELECT doc_id + 1000000, text || ' zz' FROM documents
    WHERE doc_id % 40 = 0
),
batch2 AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 4 = 3
    UNION ALL
    SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 40 = 2
),"""
        + _sig_sql("base", "sig_base")
        + ","
        + _sig_sql("batch1", "sig_b1")
        + ","
        + _sig_sql("batch2", "sig_b2")
        + ","
        + _decisions_sql("sig_b1", "sig_base", "dec1")
        + """,
sig_i2 AS (
    SELECT * FROM sig_base
    UNION ALL
    SELECT s.* FROM sig_b1 s JOIN dec1 d
        ON d.doc_id = s.doc_id AND NOT d.is_dup
),"""
        + _decisions_sql("sig_b2", "sig_i2", "dec2")
        + """
SELECT doc_id, is_dup, n_dup_matches, dup_of, best_est FROM dec1
UNION ALL
SELECT doc_id, is_dup, n_dup_matches, dup_of, best_est FROM dec2
"""
    )


@register(
    "streaming_incremental_dedup_check",
    oracle=_streaming_incdedup_oracle(),
    doc="Incremental near-dup dedup running INSIDE the streaming "
    "ingest path (r14 — the composition of operators/incdedup.py "
    "with the §2.10 foreachBatch machinery, i.e. the shape a 100 TB "
    "corpus actually ingests with: index once, probe per "
    "micro-batch, append keepers): the base split is indexed as a "
    "3-member transaction group (sigs + bands + DECISIONS), then two "
    "planted batches drain through readStream → foreachBatch → "
    "ingest_batch with the epoch id as txn_version, so each "
    "micro-batch's per-doc decisions, keeper signatures and band "
    "rows land in ONE atomic group commit — consumers act on the "
    "decisions table while the next batch probes exactly the index "
    "those decisions produced. Exactly-once is proven in-line: a "
    "redelivered final epoch is skipped by the per-table txn ledger "
    "(RuntimeError guard on any index mutation; a redelivery would "
    "recompute DIFFERENT decisions — its keepers estimate 1.0 "
    "against themselves — which is why the stored decisions are the "
    "batch's truth). Two AvailableNow drains over one checkpoint pin "
    "batch ORDER; batch2's planted copies of batch1 docs are "
    "detectable ONLY through batch1's appended keepers, and a "
    "vacuous run (nothing caught, or nothing resolving to a batch1 "
    "keeper) refuses. The oracle replays signatures, banding, the "
    "hot-bucket cap, both lookups AND the keeper append closed-form "
    "in SQL — identical helper CTEs to incremental_dedup_check, so "
    "the streaming path must reproduce the batch path bit-for-bit.",
)
def q_streaming_incremental_dedup_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from stripe_data_pipeline_spark import table_group as TG
    from stripe_data_pipeline_spark.operators import incdedup as I

    idx = _streaming_incdedup_root(spark, sf_dir)
    return TG.read_group_table(spark, idx, I.DECISIONS).select(
        "doc_id", "is_dup", "n_dup_matches", "dup_of", "best_est"
    )
