"""From-spec TFRecord + tf.train.Example pins
(sources/tfrecord_source.py, r14) — everything the driver-oracle
query (tfrecord_roundtrip_check, documents⋈embeddings) does not
exercise: the RFC 3720 CRC32C check value and TensorFlow's mask,
HAND-DERIVED golden wire bytes for each Feature kind (computed from
the protobuf encoding spec on paper, then pinned — they anchor the
encoder to the public spec, not to itself), packed AND unpacked
repeated decode, unknown-field skipping, the full supported type
matrix, nullability via absent keys vs empty lists, loud refusals
(double, kind mismatch, multi-value scalar, CRC corruption,
truncation), schema inference rules, deterministic output bytes, and
the two-phase commit's crash invisibility."""

from __future__ import annotations

import os
import struct

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from stripe_data_pipeline_spark.sources.tfrecord_source import (
    KIND_BYTES,
    KIND_FLOAT,
    KIND_INT64,
    crc32c,
    decode_example,
    encode_example,
    infer_schema_from_file,
    iter_records,
    masked_crc32c,
    register_tfrecord_source,
    write_record,
)

# ---------------------------------------------------------------------
# CRC32C + framing
# ---------------------------------------------------------------------


def test_crc32c_public_check_value():
    # RFC 3720 §B.4's standard check value for the Castagnoli CRC
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    # incremental == one-shot
    assert crc32c(b"456789", crc32c(b"123")) == 0xE3069283


def test_masked_crc_is_tensorflows_mask():
    # mask(c) = ((c >> 15) | (c << 17)) + 0xa282ead8 (mod 2^32)
    c = crc32c(b"abc")
    expected = (((c >> 15) | (c << 17 & 0xFFFFFFFF)) + 0xA282EAD8) & 0xFFFFFFFF
    assert masked_crc32c(b"abc") == expected


def test_golden_record_framing(tmp_path):
    """uint64le length, masked crc of those 8 bytes, data, masked crc
    of data — the documented TFRecord layout, byte for byte."""
    p = str(tmp_path / "g.tfrecord")
    with open(p, "wb") as f:
        write_record(f, b"abc")
    raw = open(p, "rb").read()
    assert raw[:8] == struct.pack("<Q", 3)
    assert struct.unpack("<I", raw[8:12])[0] == masked_crc32c(raw[:8])
    assert raw[12:15] == b"abc"
    assert struct.unpack("<I", raw[15:19])[0] == masked_crc32c(b"abc")
    assert len(raw) == 19
    assert list(iter_records(p)) == [b"abc"]


def test_crc_corruption_refused_and_verify_off(tmp_path):
    p = str(tmp_path / "c.tfrecord")
    with open(p, "wb") as f:
        write_record(f, b"payload-one")
    raw = bytearray(open(p, "rb").read())
    raw[13] ^= 0xFF  # flip a data byte; data crc no longer matches
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="corrupt data crc"):
        list(iter_records(p))
    # verify=False yields the (corrupted) payload without raising —
    # the documented escape hatch for trusted storage
    assert len(list(iter_records(p, verify=False))) == 1
    raw[9] ^= 0xFF  # corrupt the LENGTH crc too
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="corrupt length crc"):
        list(iter_records(p))


def test_truncation_refused(tmp_path):
    p = str(tmp_path / "t.tfrecord")
    with open(p, "wb") as f:
        write_record(f, b"x" * 100)
    raw = open(p, "rb").read()
    open(p, "wb").write(raw[:-10])  # drop the tail
    with pytest.raises(ValueError, match="truncated"):
        list(iter_records(p))
    open(p, "wb").write(raw[:5])  # not even a full header
    with pytest.raises(ValueError, match="truncated header"):
        list(iter_records(p))


# ---------------------------------------------------------------------
# tf.train.Example wire format
# ---------------------------------------------------------------------

# Golden bytes derived BY HAND from the protobuf encoding spec +
# feature.proto field numbers (Example.features=1; Features.feature=1
# map entries key=1/value=2; Feature oneof bytes=1/float=2/int64=3;
# each *List.value=1, floats/ints packed):
#   {"a": int64 [150]}  — 150 varint = 0x96 0x01
_GOLD_INT = bytes.fromhex("0a0d0a0b0a016112061a040a029601")
#   {"b": bytes [b"hi"]}
_GOLD_BYTES = bytes.fromhex("0a0d0a0b0a016212060a040a026869")
#   {"f": float [1.5]}  — 1.5f LE = 00 00 c0 3f
_GOLD_FLOAT = bytes.fromhex("0a0f0a0d0a0166120812060a040000c03f")


def test_golden_example_wire_bytes():
    assert encode_example({"a": (KIND_INT64, [150])}) == _GOLD_INT
    assert encode_example({"b": (KIND_BYTES, [b"hi"])}) == _GOLD_BYTES
    assert encode_example({"f": (KIND_FLOAT, [1.5])}) == _GOLD_FLOAT
    assert decode_example(_GOLD_INT) == {"a": (KIND_INT64, [150])}
    assert decode_example(_GOLD_BYTES) == {"b": (KIND_BYTES, [b"hi"])}
    assert decode_example(_GOLD_FLOAT) == {"f": (KIND_FLOAT, [1.5])}


def test_example_roundtrip_edge_values():
    feats = {
        "neg": (KIND_INT64, [-1, -(2**63), 2**63 - 1]),
        "z": (KIND_FLOAT, [0.0, -0.0, 1.5e38]),
        "raw": (KIND_BYTES, [b"", b"\x00\xff", "héllo".encode()]),
        "empty_i": (KIND_INT64, []),
        "empty_b": (KIND_BYTES, []),
    }
    back = decode_example(encode_example(feats))
    assert back["neg"] == (KIND_INT64, [-1, -(2**63), 2**63 - 1])
    assert back["raw"] == (KIND_BYTES, [b"", b"\x00\xff", "héllo".encode()])
    assert back["empty_i"] == (KIND_INT64, [])
    assert back["empty_b"] == (KIND_BYTES, [])
    kind, z = back["z"]
    # floats quantize to f32 on the wire (FloatList IS float32)
    f32 = struct.unpack("<f", struct.pack("<f", 1.5e38))[0]
    assert kind == KIND_FLOAT and z[0] == 0.0 and z[2] == f32
    assert struct.pack("<f", z[1]) == struct.pack("<f", -0.0)


def test_decoder_accepts_unpacked_repeated_and_unknown_fields():
    """proto3 parsers MUST accept both packed and unpacked encodings
    of repeated scalars, and skip unknown fields by wire type."""
    # Int64List with UNPACKED value fields: two (tag 0x08, varint)
    unpacked_list = bytes.fromhex("089601" + "0805")  # [150, 5]
    # Feature: unknown field 4 (varint 7), then int64_list = unpacked
    feature = (
        bytes.fromhex("2007")  # field 4, varint, value 7 — skip
        + bytes([0x1A, len(unpacked_list)])
        + unpacked_list
    )
    entry = bytes([0x0A, 1]) + b"a" + bytes([0x12, len(feature)]) + feature
    features = bytes([0x0A, len(entry)]) + entry
    example = (
        bytes.fromhex("280c")  # unknown Example field 5, varint — skip
        + bytes([0x0A, len(features)])
        + features
    )
    assert decode_example(example) == {"a": (KIND_INT64, [150, 5])}


def test_encoder_output_is_deterministic_sorted_keys():
    a = encode_example(
        {"z": (KIND_INT64, [1]), "a": (KIND_BYTES, [b"x"])}
    )
    b = encode_example(
        {"a": (KIND_BYTES, [b"x"]), "z": (KIND_INT64, [1])}
    )
    assert a == b
    # "a"'s entry must precede "z"'s in the bytes
    assert a.index(b"\x0a\x01a") < a.index(b"\x0a\x01z")


# ---------------------------------------------------------------------
# the Spark DataSource
# ---------------------------------------------------------------------

_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("small", T.IntegerType(), True),
        T.StructField("flag", T.BooleanType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("blob", T.BinaryType(), True),
        T.StructField("ratio32", T.FloatType(), True),
        T.StructField("vec", T.ArrayType(T.FloatType(), False), True),
        T.StructField("ids", T.ArrayType(T.LongType(), False), True),
        T.StructField("tags", T.ArrayType(T.StringType(), False), True),
    ]
)

_ROWS = [
    (
        1, -7, True, "héllo", bytearray(b"\x00\xff"), 0.5,
        [1.0, -2.0, 0.0], [3, -5, 2**62], ["x", "", "日本"],
    ),
    (2, None, None, None, None, None, None, None, None),
    (3, 2**31 - 1, False, "", b"", -0.0, [], [], []),
]


def test_full_type_matrix_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([Row(*r) for r in _ROWS], schema=_SCHEMA)
    register_tfrecord_source(spark)
    d = str(tmp_path / "matrix")
    df.write.format("tfrecord").mode("append").save(d)
    back = (
        spark.read.format("tfrecord")
        .schema(_SCHEMA)
        .load(d)
        .orderBy("id")
        .collect()
    )
    assert len(back) == 3
    r1, r2, r3 = back
    assert (r1.small, r1.flag, r1.name) == (-7, True, "héllo")
    assert bytes(r1.blob) == b"\x00\xff"
    assert r1.vec == [1.0, -2.0, 0.0]
    assert r1.ids == [3, -5, 2**62]
    assert r1.tags == ["x", "", "日本"]
    # NULL scalar/array == absent key, distinct from present-empty
    assert all(
        v is None
        for v in (r2.small, r2.flag, r2.name, r2.blob, r2.vec, r2.ids)
    )
    assert (r3.name, bytes(r3.blob)) == ("", b"")
    assert r3.vec == [] and r3.ids == [] and r3.tags == []
    assert struct.pack("<f", r3.ratio32) == struct.pack("<f", -0.0)


def test_double_refused_loudly(spark, tmp_path):
    df = spark.createDataFrame([(1, 2.5)], "id long, x double")
    register_tfrecord_source(spark)
    with pytest.raises(Exception, match="cannot carry"):
        df.write.format("tfrecord").mode("append").save(str(tmp_path / "dbl"))
    # read-side plan refusal too
    good = spark.createDataFrame([(1,)], "id long")
    good.write.format("tfrecord").mode("append").save(str(tmp_path / "ok"))
    with pytest.raises(Exception, match="cannot carry"):
        spark.read.format("tfrecord").schema("id long, x double").load(
            str(tmp_path / "ok")
        ).collect()


def test_kind_mismatch_and_multivalue_scalar_refused(spark, tmp_path):
    register_tfrecord_source(spark)
    d = str(tmp_path / "mis")
    os.makedirs(d)
    with open(os.path.join(d, "a.tfrecord"), "wb") as f:
        write_record(f, encode_example({"a": (KIND_INT64, [1, 2])}))
    with pytest.raises(Exception, match="schema says scalar"):
        spark.read.format("tfrecord").schema("a long").load(d).collect()
    with pytest.raises(Exception, match="int64 list"):
        spark.read.format("tfrecord").schema("a string").load(d).collect()


def test_schema_inference_rules(tmp_path):
    p = str(tmp_path / "inf.tfrecord")
    with open(p, "wb") as f:
        write_record(
            f,
            encode_example(
                {
                    "s": (KIND_BYTES, [b"one"]),
                    "n": (KIND_INT64, [1]),
                    "v": (KIND_FLOAT, [1.0, 2.0]),
                }
            ),
        )
        # second record makes "n" an array (2 values) and omits "s"
        write_record(
            f, encode_example({"n": (KIND_INT64, [1, 2])})
        )
    sch = infer_schema_from_file(p)
    by_name = {f.name: f.dataType for f in sch.fields}
    assert by_name["s"] == T.StringType()
    assert by_name["n"] == T.ArrayType(T.LongType(), False)
    assert by_name["v"] == T.ArrayType(T.FloatType(), False)


def test_two_phase_commit_crash_invisible(spark, tmp_path):
    register_tfrecord_source(spark)
    d = str(tmp_path / "tp")
    spark.createDataFrame([(1,), (2,)], "id long").write.format(
        "tfrecord"
    ).mode("append").save(d)
    # a crashed task's staged shard: valid bytes, .tmp suffix
    with open(os.path.join(d, "part-dead.tfrecord.tmp"), "wb") as f:
        write_record(f, encode_example({"id": (KIND_INT64, [99])}))
    got = spark.read.format("tfrecord").schema("id long").load(d).collect()
    assert sorted(r.id for r in got) == [1, 2]
    # overwrite drops published shards, never counts staged garbage
    spark.createDataFrame([(7,)], "id long").write.format(
        "tfrecord"
    ).mode("overwrite").save(d)
    got = spark.read.format("tfrecord").schema("id long").load(d).collect()
    assert [r.id for r in got] == [7]


def test_sf0001_documents_embeddings_roundtrip(spark, tmp_path):
    """End-to-end at sf0.001 with the driver query's exact mapping."""
    register_tfrecord_source(spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = docs.join(emb, docs.doc_id == emb.vec_id, "left").select(
        "doc_id", "text", "lang", "n_chars", "embedding"
    )
    d = str(tmp_path / "docs")
    df.write.format("tfrecord").mode("append").save(d)
    sch = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField(
                "embedding", T.ArrayType(T.FloatType(), False)
            ),
        ]
    )
    back = spark.read.format("tfrecord").schema(sch).load(d)
    a = df.orderBy("doc_id").collect()
    b = back.orderBy("doc_id").collect()
    assert len(a) == len(b) > 0
    for x, y in zip(a, b):
        assert (x.doc_id, x.text, x.lang, x.n_chars) == (
            y.doc_id, y.text, y.lang, y.n_chars,
        )
        xe = None if x.embedding is None else list(x.embedding)
        ye = None if y.embedding is None else list(y.embedding)
        assert xe == ye


def test_null_array_elements_refused(spark, tmp_path):
    """NULL inside a list has no wire form (the format's only null is
    an absent KEY) — the writer must refuse loudly, not crash."""
    df = spark.createDataFrame(
        [(1, ["a", None])],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField(
                    "tags", T.ArrayType(T.StringType(), containsNull=True)
                ),
            ]
        ),
    )
    register_tfrecord_source(spark)
    with pytest.raises(Exception, match="cannot carry NULL"):
        df.write.format("tfrecord").mode("append").save(
            str(tmp_path / "nulls")
        )


def test_malformed_wire_types_refused():
    from stripe_data_pipeline_spark.sources.tfrecord_source import (
        _decode_list,
    )

    # BytesList.value as a varint (tag 0x08) instead of len-delimited
    with pytest.raises(ValueError, match="BytesList.*wire type"):
        _decode_list(KIND_BYTES, bytes.fromhex("0807"))
    # FloatList.value as a varint
    with pytest.raises(ValueError, match="FloatList.*wire type"):
        _decode_list(KIND_FLOAT, bytes.fromhex("0807"))
    # Int64List.value as fixed64 (tag 0x09)
    with pytest.raises(ValueError, match="Int64List.*wire type"):
        _decode_list(KIND_INT64, bytes.fromhex("090000000000000000"))


def test_overwrite_commit_renames_before_deleting(tmp_path, monkeypatch):
    """Publish-then-clean: a driver crash mid-overwrite-commit can
    only expose old+new shards, never an empty dataset (r14 review —
    delete-then-rename had a data-loss window). Drives commit()
    in-process; the real run executes the same method driver-side."""
    import stripe_data_pipeline_spark.sources.tfrecord_source as S

    out = tmp_path / "t"
    os.makedirs(out)
    (out / "part-old.tfrecord").write_bytes(b"")
    (out / "part-new.tfrecord.tmp").write_bytes(b"")
    writer = S.TFRecordWriter(
        {"path": str(out)},
        T.StructType([T.StructField("i", T.LongType())]),
        overwrite=True,
    )
    real_remove = S.os.remove

    def dying_remove(p):
        if str(p).endswith(".tfrecord"):
            raise OSError("simulated crash during stale-shard cleanup")
        return real_remove(p)

    monkeypatch.setattr(S.os, "remove", dying_remove)
    with pytest.raises(OSError, match="simulated crash"):
        writer.commit(
            [S.TFRecordCommitMessage(tmp_path=str(out / "part-new.tfrecord.tmp"))]
        )
    monkeypatch.undo()
    published = sorted(f for f in os.listdir(out) if f.endswith(".tfrecord"))
    assert "part-new.tfrecord" in published and len(published) == 2


def test_failed_write_does_not_leak_tmp_shard(tmp_path):
    """A task dying mid-write removes its staged .tmp (abort() never
    sees a message for it — r14 review)."""
    import stripe_data_pipeline_spark.sources.tfrecord_source as S

    out = tmp_path / "t"
    writer = S.TFRecordWriter(
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
