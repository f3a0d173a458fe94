"""Sources and sinks (SURVEY.md §2.1).

Spark-first equivalents of the reference's storage layer:

- S4 JSON external-table scan  -> read_json
- S5 table scan via ref()      -> read_table (parquet)
- S3 NDJSON overwrite sink     -> write_ndjson
- S7 full-refresh table sink   -> write_table
- S8 partitioned write         -> write_table(partition_by=...)
- S9 clustered write           -> write_table(cluster_by=...) via
  sortWithinPartitions (the open-format analogue of BigQuery clustering;
  ref: /root/reference/dbt/stripe/models/curated/invoices.sql:5-6)

At 100 TB these writers matter more than the readers: date-partitioned
layout gives partition pruning on every incremental/as-of filter, and
sort-within-partition on the cluster keys gives parquet row-group
min/max pruning on customer/subscription point lookups.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def convert_nanos_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """``events.ts`` is parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as nanosecond
    longs, which we truncate to microseconds — the same truncation a
    micros-native engine (DuckDB) applies on read. No-op when the
    column already reads as a timestamp."""
    if dict(df.dtypes).get(col) == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S5: scan one of the driver-generated parquet tables."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = convert_nanos_ts(df)
    return df


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """S4: schema-on-read NDJSON scan (external-table equivalent).

    Prefer an explicit schema at scale: schema inference is a full
    extra pass over 100 TB of JSON.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_ndjson(df: DataFrame, path: str) -> None:
    """S3: newline-delimited JSON, full overwrite per run.

    Mirrors the reference's GCS drop (extract_stripe_data.py:105-116 —
    'Big Query expects Newline-delimited JSON!'); the overwrite
    semantics are the reference's snapshot model (README.md:102-105).
    """
    df.write.mode("overwrite").json(path)


_CSV_OPTS = {
    # RFC 4180-shaped dialect pinned on BOTH ends so the round trip is
    # lossless: quote-doubling for embedded quotes (escape='"'), UTC
    # microsecond timestamps, and an explicit null marker distinct
    # from the empty string (CSV cannot otherwise tell NULL from '').
    "header": "true",
    "quote": '"',
    "escape": '"',
    "nullValue": "\\N",
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    # NTZ timestamps take their own option; both pin MICROSECOND
    # fractions — the default 3-digit form silently truncates
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "dateFormat": "yyyy-MM-dd",
}


def write_csv(df: DataFrame, path: str) -> None:
    """CSV sink (the interchange format every partner export still
    speaks): one dialect, pinned (see _CSV_OPTS), full overwrite.
    Empty strings serialize as a QUOTED empty field (emptyValue='""')
    so the reader can tell them from NULL (written unquoted \\N) —
    the asymmetric-option pair that closes Spark CSV's classic
    empty-vs-null round-trip hole."""
    w = df.write.mode("overwrite").option("emptyValue", '""')
    for k, v in _CSV_OPTS.items():
        w = w.option(k, v)
    w.csv(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """CSV scan with an EXPLICIT schema (inference is a full extra
    pass at 100 TB and guesses types; the schema is the contract) and
    the same pinned dialect as :func:`write_csv` — round-tripping any
    supported table bit-exactly, including embedded delimiters,
    quotes, newlines and NULL-vs-empty-string distinction. multiLine
    handles quoted embedded newlines; at scale prefer exports without
    them (multiLine scans cannot split files)."""
    r = (
        spark.read.schema(schema)
        .option("multiLine", "true")
        .option("emptyValue", "")
    )
    for k, v in _CSV_OPTS.items():
        r = r.option(k, v)
    return r.csv(path)


def write_table(
    df: DataFrame,
    path: str,
    partition_by: str | list[str] | None = None,
    cluster_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """S7/S8/S9: full-refresh parquet sink with optional date
    partitioning and clustering-by-sort."""
    if cluster_by:
        cols = [cluster_by] if isinstance(cluster_by, str) else list(cluster_by)
        df = df.sortWithinPartitions(*cols)
    writer = df.write.mode(mode)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        writer = writer.partitionBy(*cols)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: str | list[str],
    num_buckets: int = 16,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (Hive-style bucketing).

    Both sides of a join bucketed on the join key with the same bucket
    count need NO shuffle at join time — the partitioning is baked
    into the files. This is the 100 TB answer for repeated fact-fact
    joins (orders ⋈ lineitem on orderkey): pay one shuffle at write,
    amortize it over every downstream join/aggregation on that key
    (tests/test_bucketing.py proves the Exchange disappears).
    """
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = df.write.mode(mode).bucketBy(num_buckets, *cols)
    if sort_by:
        s = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*s)
    writer.format("parquet").saveAsTable(table)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TESTDATA_TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def compact_table(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 1_000_000,
    cluster_by: str | list[str] | None = None,
) -> int:
    """Small-file compaction for a parquet table dir (maintenance op).

    Incremental merges and streaming micro-batches each leave their
    own files; after N batches a partition holds N small files and
    scan planning + task scheduling dominate at 100 TB (the classic
    small-file problem). Rewrites the table with files sized to
    ``target_rows_per_file`` (optionally re-sorted by ``cluster_by``
    so compaction also restores clustering), via a staging directory
    + atomic-within-a-filesystem swap — the same non-crash-atomic
    caveat as the merge sink.

    Returns the new file count. At cluster scale run per partition
    (pass the partition dir as ``path``) so one compaction never
    rewrites more than a partition.
    """
    import math
    import shutil
    import tempfile

    df = spark.read.parquet(path)
    n_rows = df.count()
    n_files = max(1, math.ceil(n_rows / max(1, target_rows_per_file)))
    out = df.repartition(n_files)
    if cluster_by:
        cols = [cluster_by] if isinstance(cluster_by, str) else list(cluster_by)
        out = out.sortWithinPartitions(*cols)
    staging = tempfile.mkdtemp(
        prefix=".compact_staging_", dir=os.path.dirname(path.rstrip("/"))
    )
    try:
        out.write.mode("overwrite").parquet(staging)
    except Exception:
        shutil.rmtree(staging, ignore_errors=True)  # don't leak staging
        raise
    # Swap with recovery (ADVICE r3): if the second move fails the table
    # is restored from .compact_old instead of being left missing; a
    # hard crash between the moves strands the data at <path>.compact_old
    # — that name is the documented recovery location. For a
    # crash-ATOMIC table use manifest_table (compaction there is just a
    # merge that rewrites a partition's dir + one manifest rename).
    old = path.rstrip("/") + ".compact_old"
    shutil.move(path, old)
    try:
        shutil.move(staging, path)
    except Exception:
        shutil.move(old, path)  # roll back: original table intact
        shutil.rmtree(staging, ignore_errors=True)
        raise
    shutil.rmtree(old)
    return n_files


def read_json_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt_record",
):
    """Schema-drift quarantine for NDJSON ingestion (SURVEY.md §7 risk
    list: 'Stripe documents are wide ... JSON schema drift'): read
    PERMISSIVE against the explicit schema, capturing every line that
    fails to parse (malformed JSON, impossible types) instead of
    silently nulling or failing the run. Returns
    ``(good_df, quarantine_df)`` — good rows carry the declared
    schema; quarantine rows carry the raw offending line plus its
    source file for triage/replay.

    The parsed relation is cached before splitting: Spark refuses a
    query that references ONLY the internal corrupt-record column of
    an unmaterialized JSON scan, and at scale you want one pass
    feeding both sinks anyway — land good + quarantine from the same
    materialization, then unpersist.
    """
    from pyspark.sql import functions as F

    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
        # input_file_name() must bind BEFORE the cache: a cached
        # relation has no file-scan context and returns ''
        .withColumn("__source_file", F.input_file_name())
        .cache()
    )
    good = df.filter(F.col(corrupt_col).isNull()).drop(
        corrupt_col, "__source_file"
    )
    quarantine = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_record"),
        F.col("__source_file").alias("source_file"),
    )
    return good, quarantine
