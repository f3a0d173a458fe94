"""Arrow IPC file source/sink pins (sources/arrow_ipc_source.py, r14)
— the type matrix and plumbing the driver-oracle query
(arrow_ipc_roundtrip_check, lineitem table) does not exercise: every
supported type incl. lists/decimals/dates/binary, NULLs, compression
codecs, footer schema inference, record-batch-granular SPLITTING of a
single file, zero-copy column prune/reorder against a wider stored
schema, dictionary decode, foreign-writer (plain pyarrow) files, the
two-phase commit's crash invisibility, and loud refusal of
unsupported types."""

from __future__ import annotations

import datetime as dt
import decimal
import os

import pyarrow as pa
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stripe_data_pipeline_spark.sources.arrow_ipc_source import (
    ArrowIpcPartition,
    ArrowIpcReader,
    register_arrow_ipc_source,
)

_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("flag", T.BooleanType(), True),
        T.StructField("small", T.IntegerType(), True),
        T.StructField("ratio", T.DoubleType(), True),
        T.StructField("ratio32", T.FloatType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("blob", T.BinaryType(), True),
        T.StructField("day", T.DateType(), True),
        T.StructField("at_ntz", T.TimestampNTZType(), True),
        T.StructField("amount", T.DecimalType(12, 2), True),
        T.StructField("vec", T.ArrayType(T.FloatType(), True), True),
    ]
)

_ROWS = [
    (
        1, True, -7, 2.5, 0.5, "héllo", bytearray(b"\x00\xff"),
        dt.date(2024, 2, 29), dt.datetime(2024, 6, 1, 12, 34, 56, 789),
        decimal.Decimal("12345.67"), [1.0, -2.0, 0.0],
    ),
    (2, None, None, None, None, None, None, None, None, None, None),
    (
        -(2**62), False, 2**31 - 1, -0.0, 3.5, "", b"",
        dt.date(1969, 12, 31), dt.datetime(1969, 12, 31, 23, 59, 59),
        decimal.Decimal("-0.01"), [],
    ),
]


def _roundtrip(spark, path, compression="none"):
    df = spark.createDataFrame([Row(*r) for r in _ROWS], schema=_SCHEMA)
    register_arrow_ipc_source(spark)
    (
        df.coalesce(1)
        .write.format("arrowipc")
        .option("compression", compression)
        .mode("overwrite")
        .save(str(path))
    )
    return spark.read.format("arrowipc").schema(_SCHEMA).load(str(path))


@pytest.mark.parametrize("compression", ["none", "lz4", "zstd"])
def test_full_type_matrix_roundtrip(spark, tmp_path, compression):
    back = _roundtrip(spark, tmp_path / "t", compression)
    assert back.schema == _SCHEMA or [
        (f.name, f.dataType) for f in back.schema.fields
    ] == [(f.name, f.dataType) for f in _SCHEMA.fields]
    got = sorted(back.collect(), key=lambda r: r.id)
    exp = sorted(
        spark.createDataFrame(
            [Row(*r) for r in _ROWS], schema=_SCHEMA
        ).collect(),
        key=lambda r: r.id,
    )
    assert got == exp


def test_schema_inference_from_footer(spark, tmp_path):
    _roundtrip(spark, tmp_path / "t")
    back = spark.read.format("arrowipc").load(str(tmp_path / "t"))
    assert {f.name: f.dataType for f in back.schema.fields} == {
        f.name: f.dataType for f in _SCHEMA.fields
    }
    assert back.count() == len(_ROWS)


def test_single_file_splits_by_record_batch(spark, tmp_path):
    """The 100-TB claim: one big shard fans out to many tasks. Write
    one file with many small record batches via plain pyarrow, then
    check partitions() splits it and the union of splits reads every
    row exactly once."""
    path = tmp_path / "big.arrow"
    sch = pa.schema([("i", pa.int64())])
    with pa.ipc.new_file(str(path), sch) as w:
        for s in range(0, 1000, 100):
            w.write_batch(
                pa.record_batch([pa.array(range(s, s + 100))], schema=sch)
            )
    reader = ArrowIpcReader(
        # ~10 batches of ~8 B/row * 100 rows; 1 MiB split would be one
        # split, so force tiny splits via the option (floor is 1 batch)
        {"path": str(path), "split_mb": 0},
        T.StructType([T.StructField("i", T.LongType())]),
    )
    parts = reader.partitions()
    assert len(parts) == 10
    assert [p.start for p in parts] == list(range(0, 10))
    seen = []
    for p in parts:
        for b in reader.read(p):
            seen.extend(b.column(0).to_pylist())
    assert sorted(seen) == list(range(1000))

    register_arrow_ipc_source(spark)
    df = spark.read.format("arrowipc").option("split_mb", 0).load(str(path))
    assert df.rdd.getNumPartitions() == 10
    assert df.agg(F.sum("i")).collect()[0][0] == sum(range(1000))


def test_column_prune_and_reorder_against_wider_file(spark, tmp_path):
    path = tmp_path / "wide.arrow"
    sch = pa.schema([("a", pa.int64()), ("b", pa.string()), ("c", pa.float64())])
    with pa.ipc.new_file(str(path), sch) as w:
        w.write_batch(
            pa.record_batch(
                [pa.array([1, 2]), pa.array(["x", "y"]), pa.array([0.5, 1.5])],
                schema=sch,
            )
        )
    register_arrow_ipc_source(spark)
    want = T.StructType(
        [T.StructField("c", T.DoubleType()), T.StructField("a", T.LongType())]
    )
    got = spark.read.format("arrowipc").schema(want).load(str(path)).collect()
    assert [tuple(r) for r in got] == [(0.5, 1), (1.5, 2)]
    with pytest.raises(Exception, match="lacks requested columns"):
        spark.read.format("arrowipc").schema(
            T.StructType([T.StructField("nope", T.LongType())])
        ).load(str(path)).collect()


def test_dictionary_columns_decode(spark, tmp_path):
    path = tmp_path / "dict.arrow"
    arr = pa.array(["a", "b", "a", "c"]).dictionary_encode()
    sch = pa.schema([("s", arr.type)])
    with pa.ipc.new_file(str(path), sch) as w:
        w.write_batch(pa.record_batch([arr], schema=sch))
    register_arrow_ipc_source(spark)
    df = spark.read.format("arrowipc").load(str(path))
    assert df.schema.fields[0].dataType == T.StringType()
    assert [r.s for r in df.collect()] == ["a", "b", "a", "c"]


def test_unsupported_types_refuse(spark, tmp_path):
    path = tmp_path / "bad.arrow"
    sch = pa.schema([("m", pa.map_(pa.string(), pa.int64()))])
    with pa.ipc.new_file(str(path), sch) as w:
        w.write_batch(
            pa.record_batch([pa.array([[("k", 1)]], type=sch[0].type)], schema=sch)
        )
    register_arrow_ipc_source(spark)
    with pytest.raises(Exception, match="unsupported column type"):
        spark.read.format("arrowipc").load(str(path)).collect()
    with pytest.raises(Exception, match="unsupported compression"):
        spark.range(1).write.format("arrowipc").option(
            "compression", "snappy"
        ).mode("append").save(str(tmp_path / "x"))


def test_crash_leaves_nothing_published(spark, tmp_path):
    """Staged-tmp two-phase commit: a *.arrow.tmp orphan (a crashed
    task) is invisible to the reader glob."""
    out = tmp_path / "t"
    _roundtrip(spark, out)
    orphan = out / "part-deadbeef.arrow.tmp"
    sch = pa.schema([("i", pa.int64())])
    with pa.ipc.new_file(str(orphan), sch) as w:
        w.write_batch(pa.record_batch([pa.array([99])], schema=sch))
    back = spark.read.format("arrowipc").schema(_SCHEMA).load(str(out))
    assert back.count() == len(_ROWS)


def test_overwrite_replaces_previous_shards(spark, tmp_path):
    out = tmp_path / "t"
    register_arrow_ipc_source(spark)
    spark.range(5).write.format("arrowipc").mode("append").save(str(out))
    spark.range(3).write.format("arrowipc").mode("overwrite").save(str(out))
    assert spark.read.format("arrowipc").load(str(out)).count() == 3


def test_foreign_writer_file_is_readable(spark, tmp_path):
    """A file written by plain pyarrow (the HF-datasets shape: one
    table, default options) reads back exactly — interop, not just
    self-roundtrip."""
    path = tmp_path / "hf.arrow"
    tbl = pa.table(
        {
            "text": ["doc one", None, "doc three"],
            "score": pa.array([0.25, 0.5, None], pa.float32()),
            "ts": pa.array(
                [dt.datetime(2024, 1, 1, 0, 0, 0), None, dt.datetime(2024, 1, 2)],
                pa.timestamp("us"),
            ),
        }
    )
    with pa.ipc.new_file(str(path), tbl.schema) as w:
        w.write_table(tbl)
    register_arrow_ipc_source(spark)
    got = spark.read.format("arrowipc").load(str(path)).collect()
    assert [r.text for r in got] == ["doc one", None, "doc three"]
    assert got[2].ts == dt.datetime(2024, 1, 2)


def test_empty_task_writes_no_shard(spark, tmp_path):
    out = tmp_path / "t"
    register_arrow_ipc_source(spark)
    spark.range(4).repartition(8).write.format("arrowipc").mode(
        "append"
    ).save(str(out))
    shards = [f for f in os.listdir(out) if f.endswith(".arrow")]
    assert 0 < len(shards) <= 4
    assert spark.read.format("arrowipc").load(str(out)).count() == 4


def test_requested_schema_with_promoted_types_casts(spark, tmp_path):
    """An explicit schema whose types WIDEN the stored ones must cast
    at the source instead of crashing Spark's Arrow ingestion (the
    r14 review finding: stored int32 read as LongType raised
    UnsupportedOperationException in ArrowColumnVector)."""
    path = tmp_path / "narrow.arrow"
    sch = pa.schema([("i", pa.int32()), ("f", pa.float32())])
    with pa.ipc.new_file(str(path), sch) as w:
        w.write_batch(
            pa.record_batch(
                [pa.array([1, 2], pa.int32()), pa.array([0.5, 1.5], pa.float32())],
                schema=sch,
            )
        )
    register_arrow_ipc_source(spark)
    want = T.StructType(
        [T.StructField("i", T.LongType()), T.StructField("f", T.DoubleType())]
    )
    got = sorted(
        spark.read.format("arrowipc").schema(want).load(str(path)).collect()
    )
    assert [tuple(r) for r in got] == [(1, 0.5), (2, 1.5)]
    # unresolvable cast still refuses loudly
    bad = T.StructType([T.StructField("f", T.BinaryType())])
    with pytest.raises(Exception):
        spark.read.format("arrowipc").schema(bad).load(str(path)).collect()


def test_overwrite_commit_renames_before_deleting(tmp_path, monkeypatch):
    """The overwrite commit must publish the new shards BEFORE
    removing the old ones, so a driver crash mid-commit can only show
    a mix of old+new, never an empty dataset (the r14 review
    finding: delete-then-rename lost everything in the window).
    Drives commit() in-process — on a real run it executes in the
    driver's Python worker, same code path."""
    import stripe_data_pipeline_spark.sources.arrow_ipc_source as S

    out = tmp_path / "t"
    os.makedirs(out)
    sch = pa.schema([("i", pa.int64())])

    def shard(name, vals):
        with pa.ipc.new_file(str(out / name), sch) as w:
            w.write_batch(pa.record_batch([pa.array(vals)], schema=sch))

    shard("part-old.arrow", [1, 2])
    shard("part-new.arrow.tmp", [3])
    writer = S.ArrowIpcWriter(
        {"path": str(out)},
        T.StructType([T.StructField("i", T.LongType())]),
        overwrite=True,
    )
    # crash injection: die on the FIRST old-shard delete — the new
    # shard must already be published by then
    real_remove = S.os.remove

    def dying_remove(p):
        if str(p).endswith(".arrow"):
            raise OSError("simulated crash during stale-shard cleanup")
        return real_remove(p)

    monkeypatch.setattr(S.os, "remove", dying_remove)
    with pytest.raises(OSError, match="simulated crash"):
        writer.commit(
            [S.ArrowIpcCommitMessage(tmp_path=str(out / "part-new.arrow.tmp"))]
        )
    monkeypatch.undo()
    published = sorted(f for f in os.listdir(out) if f.endswith(".arrow"))
    # worst case after the crash: old+new both visible — NEVER empty
    assert "part-new.arrow" in published and len(published) == 2
