"""From-spec Avro OCF source/sink pins (sources/avro_source.py, r14)
— the type matrix and failure modes the driver-oracle query
(avro_roundtrip_check, events table) does not exercise: every
supported type incl. arrays/bytes/dates/booleans, NULLs through the
union path, both codecs, schema inference from the header, the
two-phase commit's crash invisibility, and loud refusal of
unsupported shapes (maps, snappy, non-nullable exotic unions)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from stripe_data_pipeline_spark.sources.avro_source import (
    avro_json_to_spark_schema,
    parse_avro_file,
    read_avro_header,
    register_avro_source,
    spark_schema_to_avro_json,
    write_avro_file,
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
        T.StructField("at", T.TimestampNTZType(), True),
        T.StructField("vec", T.ArrayType(T.FloatType(), True), True),
    ]
)

_ROWS = [
    (
        1, True, -7, 2.5, 0.5, "héllo", bytearray(b"\x00\xff"),
        dt.date(2024, 2, 29), dt.datetime(2024, 6, 1, 12, 34, 56, 789),
        [1.0, -2.0, 0.0],
    ),
    (2, None, None, None, None, None, None, None, None, None),
    (
        -(2**62), False, 2**31 - 1, -0.0, 3.5, "", b"",
        dt.date(1969, 12, 31), dt.datetime(1969, 12, 31, 23, 59, 59),
        [],
    ),
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_full_type_matrix_roundtrip(spark, tmp_path, codec):
    df = spark.createDataFrame(
        [Row(*r) for r in _ROWS], schema=_SCHEMA
    )
    register_avro_source(spark)
    out = str(tmp_path / "t")
    df.write.format("avroocf").option("codec", codec).mode(
        "overwrite"
    ).save(out)
    back = spark.read.format("avroocf").load(out)  # schema INFERRED
    assert back.schema == _SCHEMA
    assert sorted(back.collect(), key=lambda r: r.id) == sorted(
        df.collect(), key=lambda r: r.id
    )


def test_header_and_blocks_are_spec_shaped(tmp_path):
    """White-box: magic, metadata map, sync framing — readable by the
    module's own low-level parser without Spark in the loop."""
    path = str(tmp_path / "x.avro")
    sj = spark_schema_to_avro_json(
        T.StructType([T.StructField("v", T.LongType(), True)])
    )
    n = write_avro_file(path, [(i,) for i in range(5000)], sj)
    assert n == 5000
    buf = open(path, "rb").read()
    assert buf[:4] == b"Obj\x01"
    meta, sync, pos = read_avro_header(buf)
    assert meta["avro.codec"] == b"deflate"
    assert len(sync) == 16 and pos > 20
    assert avro_json_to_spark_schema(
        meta["avro.schema"].decode()
    ) == T.StructType([T.StructField("v", T.LongType(), True)])
    # 5000 rows at 2000/block -> 3 blocks, every row survives
    assert [r[0] for r in parse_avro_file(path)] == list(range(5000))


def test_corrupt_sync_refuses(tmp_path):
    path = str(tmp_path / "x.avro")
    sj = spark_schema_to_avro_json(
        T.StructType([T.StructField("v", T.LongType(), True)])
    )
    write_avro_file(path, [(1,), (2,)], sj, codec="null")
    buf = bytearray(open(path, "rb").read())
    buf[-1] ^= 0xFF  # flip a byte of the trailing sync marker
    open(path, "wb").write(bytes(buf))
    with pytest.raises(ValueError, match="sync"):
        list(parse_avro_file(path))


def test_unsupported_shapes_refuse(spark, tmp_path):
    register_avro_source(spark)
    df = spark.createDataFrame(
        [({"a": 1},)],
        T.StructType(
            [T.StructField(
                "m", T.MapType(T.StringType(), T.LongType()), True
            )]
        ),
    )
    with pytest.raises(Exception, match="unsupported Spark type"):
        df.write.format("avroocf").mode("overwrite").save(
            str(tmp_path / "m")
        )
    df2 = spark.range(1)
    with pytest.raises(Exception, match="codec"):
        df2.write.format("avroocf").option("codec", "snappy").mode(
            "overwrite"
        ).save(str(tmp_path / "s"))


def test_crash_leaves_nothing_published(spark, tmp_path):
    """Two-phase commit: .tmp shards are invisible to the reader glob;
    an aborted write publishes no .avro file."""
    register_avro_source(spark)
    out = str(tmp_path / "t")
    spark.range(10).write.format("avroocf").mode("overwrite").save(out)
    files = os.listdir(out)
    assert files and all(f.endswith(".avro") for f in files)
    # simulate a crashed task's leftover staging: the reader skips it
    with open(os.path.join(out, "part-dead.avro.tmp"), "wb") as f:
        f.write(b"garbage")
    back = spark.read.format("avroocf").load(out)
    assert back.count() == 10


def test_overwrite_replaces_previous_shards(spark, tmp_path):
    register_avro_source(spark)
    out = str(tmp_path / "t")
    spark.range(10).write.format("avroocf").mode("overwrite").save(out)
    spark.range(3).write.format("avroocf").mode("overwrite").save(out)
    assert spark.read.format("avroocf").load(out).count() == 3


def test_foreign_writer_shapes_are_readable(tmp_path):
    """Interop pins for files OTHER writers produce: a reversed
    union order ([T, "null"] — the spec allows either) decodes
    correctly, and an UNKNOWN logical type on a supported underlying
    type reads as the underlying type (the spec's required fallback:
    'ignore and use the underlying Avro type')."""
    import json as _json

    from stripe_data_pipeline_spark.sources.avro_source import (
        _MAGIC, _w_bytes, _w_long, _w_str,
    )

    schema = _json.dumps({
        "type": "record", "name": "r",
        "fields": [
            {"name": "v", "type": ["long", "null"]},  # reversed union
            {"name": "t", "type": {"type": "long",
                                   "logicalType": "time-micros"}},
        ],
    })
    path = str(tmp_path / "foreign.avro")
    sync = b"S" * 16
    body = (
        _w_long(0) + _w_long(7)      # row 1: union idx 0 = long 7
        + _w_long(123)               # t
        + _w_long(1) +               # row 2: union idx 1 = null
        _w_long(456)                 # t
    )
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(_w_long(2))
        f.write(_w_str("avro.schema")); f.write(_w_bytes(schema.encode()))
        f.write(_w_str("avro.codec")); f.write(_w_bytes(b"null"))
        f.write(b"\x00"); f.write(sync)
        f.write(_w_long(2)); f.write(_w_long(len(body)))
        f.write(body); f.write(sync)
    assert list(parse_avro_file(path)) == [(7, 123), (None, 456)]
    # and schema inference maps the unknown logical type to long
    sch = avro_json_to_spark_schema(schema)
    assert sch["t"].dataType == T.LongType()
    assert sch["v"].nullable is True


# ---------------------------------------------------------------------
# schema resolution (Avro spec "Schema Resolution", r14): reader !=
# writer — the evolving-producer reality of a long-lived ingest
# ---------------------------------------------------------------------


def _write_two_col(spark, out):
    df = spark.createDataFrame(
        [Row(id=1, small=7, name="x"), Row(id=2, small=None, name=None)],
        T.StructType(
            [
                T.StructField("id", T.LongType(), False),
                T.StructField("small", T.IntegerType(), True),
                T.StructField("name", T.StringType(), True),
            ]
        ),
    )
    register_avro_source(spark)
    df.write.format("avroocf").mode("overwrite").save(str(out))


def test_subset_and_reordered_reader_schema(spark, tmp_path):
    """A subset/reordered requested schema must bind columns BY NAME
    (pre-resolution, writer-order values were zipped into reader-order
    columns — a silent misalignment)."""
    out = tmp_path / "t"
    _write_two_col(spark, out)
    want = T.StructType(
        [
            T.StructField("name", T.StringType(), True),
            T.StructField("id", T.LongType(), True),
        ]
    )
    got = sorted(
        spark.read.format("avroocf").schema(want).load(str(out)).collect(),
        key=lambda r: r.id,
    )
    assert [(r.name, r.id) for r in got] == [("x", 1), (None, 2)]


def test_promotion_int_to_long_and_double(spark, tmp_path):
    out = tmp_path / "t"
    _write_two_col(spark, out)
    want = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("small", T.DoubleType(), True),
        ]
    )
    got = sorted(
        spark.read.format("avroocf").schema(want).load(str(out)).collect(),
        key=lambda r: r.id,
    )
    assert got[0].small == 7.0 and isinstance(got[0].small, float)
    assert got[1].small is None


def test_reader_only_field_fills_default_null(spark, tmp_path):
    out = tmp_path / "t"
    _write_two_col(spark, out)
    want = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("added_later", T.StringType(), True),
        ]
    )
    got = spark.read.format("avroocf").schema(want).load(str(out)).collect()
    assert all(r.added_later is None for r in got)


def test_reader_only_field_without_default_refuses(spark, tmp_path):
    out = tmp_path / "t"
    _write_two_col(spark, out)
    want = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            # nullable=False -> plain avro type, no default
            T.StructField("added_later", T.StringType(), False),
        ]
    )
    with pytest.raises(Exception, match="declares no default"):
        spark.read.format("avroocf").schema(want).load(str(out)).collect()


def test_writer_null_into_non_nullable_reader_refuses(spark, tmp_path):
    out = tmp_path / "t"
    _write_two_col(spark, out)  # row 2 has name=NULL
    want = T.StructType([T.StructField("name", T.StringType(), False)])
    with pytest.raises(Exception, match="non-nullable reader field"):
        spark.read.format("avroocf").schema(want).load(str(out)).collect()


def test_mixed_producer_generations_in_one_directory(spark, tmp_path):
    """Two files written by different producer generations (gen1 lacks
    a column, gen2 widened a type) read under ONE reader schema."""
    out = tmp_path / "t"
    os.makedirs(out)
    gen1 = spark.createDataFrame(
        [Row(id=1, score=5)],
        T.StructType(
            [
                T.StructField("id", T.LongType(), False),
                T.StructField("score", T.IntegerType(), True),
            ]
        ),
    )
    gen2 = spark.createDataFrame(
        [Row(id=2, score=9, tag="new")],
        T.StructType(
            [
                T.StructField("id", T.LongType(), False),
                T.StructField("score", T.LongType(), True),
                T.StructField("tag", T.StringType(), True),
            ]
        ),
    )
    register_avro_source(spark)
    gen1.coalesce(1).write.format("avroocf").mode("append").save(str(out))
    gen2.coalesce(1).write.format("avroocf").mode("append").save(str(out))
    want = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("score", T.LongType(), True),
            T.StructField("tag", T.StringType(), True),
        ]
    )
    got = sorted(
        spark.read.format("avroocf").schema(want).load(str(out)).collect(),
        key=lambda r: r.id,
    )
    assert [(r.id, r.score, r.tag) for r in got] == [
        (1, 5, None),
        (2, 9, "new"),
    ]


def test_resolution_primitives_pure_python(tmp_path):
    """string<->bytes promotions + declared non-null defaults through
    the raw parse path (no Spark types for these shapes)."""
    import json as _json

    w = _json.dumps(
        {
            "type": "record",
            "name": "row",
            "fields": [
                {"name": "s", "type": "string"},
                {"name": "b", "type": "bytes"},
                {"name": "gone", "type": "long"},
            ],
        }
    )
    path = str(tmp_path / "x.avro")
    write_avro_file(path, iter([("héllo", b"\x01\x02", 42)]), w, codec="null")
    r = _json.dumps(
        {
            "type": "record",
            "name": "row",
            "fields": [
                {"name": "b", "type": "string"},  # bytes -> string
                {"name": "s", "type": "bytes"},  # string -> bytes
                {"name": "n", "type": "long", "default": 3},
            ],
        }
    )
    rows = list(parse_avro_file(path, r))
    assert rows == [("\x01\x02", "héllo".encode(), 3)]
    # unresolvable: writer string into reader long
    bad = _json.dumps(
        {
            "type": "record",
            "name": "row",
            "fields": [{"name": "s", "type": "long"}],
        }
    )
    with pytest.raises(ValueError, match="cannot resolve"):
        list(parse_avro_file(path, bad))


def test_failed_write_does_not_leak_tmp_shard(tmp_path):
    """A task dying mid-write removes its staged .tmp (abort() never
    sees a message for it — r14 review)."""
    import stripe_data_pipeline_spark.sources.avro_source as S

    out = tmp_path / "t"
    writer = S.AvroWriter(
        {"path": str(out)},
        T.StructType([T.StructField("i", T.LongType())]),
        overwrite=False,
    )

    def rows():
        yield (1,)
        raise RuntimeError("task died")

    with pytest.raises(RuntimeError, match="task died"):
        writer.write(rows())
    assert os.listdir(out) == []


def test_overwrite_commit_renames_before_deleting(tmp_path, monkeypatch):
    """Publish-then-clean ordering for the overwrite commit (r14
    review; same protocol as the TFRecord/Arrow sinks)."""
    import stripe_data_pipeline_spark.sources.avro_source as S

    out = tmp_path / "t"
    os.makedirs(out)
    (out / "part-old.avro").write_bytes(b"")
    (out / "part-new.avro.tmp").write_bytes(b"")
    writer = S.AvroWriter(
        {"path": str(out)},
        T.StructType([T.StructField("i", T.LongType())]),
        overwrite=True,
    )
    real_remove = S.os.remove

    def dying_remove(p):
        if str(p).endswith(".avro"):
            raise OSError("simulated crash during stale-shard cleanup")
        return real_remove(p)

    monkeypatch.setattr(S.os, "remove", dying_remove)
    with pytest.raises(OSError, match="simulated crash"):
        writer.commit(
            [S.AvroCommitMessage(tmp_path=str(out / "part-new.avro.tmp"))]
        )
    monkeypatch.undo()
    published = sorted(f for f in os.listdir(out) if f.endswith(".avro"))
    assert "part-new.avro" in published and len(published) == 2
