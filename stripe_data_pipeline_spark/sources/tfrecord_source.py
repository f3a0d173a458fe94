"""From-spec TFRecord + ``tf.train.Example`` source + sink (r14) —
the canonical training-data interchange format, completing the
interchange surface next to parquet/ORC/CSV/NDJSON/XML/WARC/Avro.
This container ships no tensorflow, no protobuf-compiled Example
stubs and no crc32c library, so BOTH layers are implemented from
their PUBLIC specifications, exactly the precedent of
sources/avro_source.py (Avro 1.12 from spec) and
sources/warc_source.py (ISO 28500 from spec):

* **TFRecord framing** (TensorFlow's documented on-disk record
  layout, ``tensorflow/core/lib/io/record_writer.h``): each record is
  ``uint64le length, uint32le masked_crc32c(length_bytes), data,
  uint32le masked_crc32c(data)`` where
  ``mask(c) = ((c >> 15) | (c << 17)) + 0xa282ead8 (mod 2^32)``.
* **CRC32C** (Castagnoli, RFC 3720 §B.4): reflected polynomial
  ``0x82F63B78``, init/final-xor ``0xFFFFFFFF``; table-driven, with
  the public check value ``crc32c(b"123456789") == 0xE3069283``
  pinned in tests/test_tfrecord.py.
* **tf.train.Example** (``tensorflow/core/example/{example,
  feature}.proto`` over the protobuf wire format): ``Example.features
  = 1`` -> ``Features.feature = 1`` (a proto map, i.e. repeated
  entries with ``key = 1`` string / ``value = 2`` Feature) ->
  ``Feature`` oneof ``bytes_list = 1 / float_list = 2 / int64_list =
  3``; ``BytesList.value = 1`` repeated length-delimited,
  ``FloatList.value = 1`` packed little-endian f32,
  ``Int64List.value = 1`` packed varints (negative int64 = 10-byte
  two's-complement varint, NOT zigzag — Example uses plain int64).
  The decoder accepts both packed and unpacked repeated encodings
  (mandatory for proto3 parsers), features in any order, and skips
  unknown field numbers by wire type; the encoder emits features in
  sorted-key order so shard bytes are deterministic for a given row
  order.

Schema mapping — the honest subset ``tf.train.Example`` can carry:
``string``/``binary`` -> BytesList, ``long``/``int``/``boolean`` ->
Int64List, ``float`` -> FloatList, plus arrays of each. ``double``
is REFUSED loudly (Example has no f64 — silently narrowing would
corrupt values). NULL maps to an ABSENT feature key (the format's
only null), distinct from a present-but-empty list, which maps to an
empty array. Scalar fields with a present key must carry exactly one
value; zero values decode as NULL, two+ raise.

Read schema: pass one explicitly, or it is inferred from the first
file — kind (bytes/float/int64) from each key's first occurrence,
scalar vs array by whether ANY sampled record carries more than one
value (documented inference, refined by passing a schema).

Scale shape: TFRecord files carry no sync markers and are NOT
splittable — one input partition per ``.tfrecord`` file (TensorFlow's
own parallelization unit is likewise the shard), Arrow-batched across
the Python worker boundary; the sink writes one shard per task under
the same staged-``.tmp``-then-rename two-phase commit as the WARC and
Avro sinks (a crashed write publishes nothing).
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

# ---------------------------------------------------------------------
# CRC32C (Castagnoli) + the TFRecord mask — from spec
# ---------------------------------------------------------------------

_CRC_TABLE: list[int] = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc32c(data: bytes, crc: int = 0) -> int:
    c = crc ^ 0xFFFFFFFF
    tbl = _CRC_TABLE
    for b in data:
        c = tbl[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------
# protobuf wire-format primitives (public encoding spec)
# ---------------------------------------------------------------------

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5


def _w_varint(n: int) -> bytes:
    n &= 0xFFFFFFFFFFFFFFFF  # negative int64 -> 10-byte varint
    out = bytearray()
    while n > 0x7F:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def _w_tag(field: int, wt: int) -> bytes:
    return _w_varint((field << 3) | wt)


def _w_len(field: int, payload: bytes) -> bytes:
    return _w_tag(field, _WT_LEN) + _w_varint(len(payload)) + payload


def _r_varint(buf, pos: int) -> tuple[int, int]:
    n, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:
            raise ValueError("tfrecord: varint longer than 64 bits")
    return n & 0xFFFFFFFFFFFFFFFF, pos


def _signed64(n: int) -> int:
    return n - (1 << 64) if n >= (1 << 63) else n


def _skip_field(buf, pos: int, wt: int) -> int:
    """Skip an unknown field's payload — mandatory parser behavior."""
    if wt == _WT_VARINT:
        _, pos = _r_varint(buf, pos)
    elif wt == _WT_I64:
        pos += 8
    elif wt == _WT_LEN:
        n, pos = _r_varint(buf, pos)
        pos += n
    elif wt == _WT_I32:
        pos += 4
    else:
        raise ValueError(f"tfrecord: unsupported wire type {wt}")
    return pos


# ---------------------------------------------------------------------
# tf.train.Example encode/decode
# ---------------------------------------------------------------------

KIND_BYTES, KIND_FLOAT, KIND_INT64 = 1, 2, 3  # Feature oneof fields


def encode_feature(kind: int, values) -> bytes:
    """Encode one Feature message carrying a *List of `values`."""
    if kind == KIND_BYTES:
        payload = b"".join(_w_len(1, v) for v in values)
    elif kind == KIND_FLOAT:
        packed = struct.pack(f"<{len(values)}f", *values)
        payload = _w_len(1, packed) if values else b""
    else:  # KIND_INT64, packed varints
        packed = b"".join(_w_varint(v) for v in values)
        payload = _w_len(1, packed) if values else b""
    return _w_len(kind, payload)


def encode_example(features: dict[str, tuple[int, list]]) -> bytes:
    """features: name -> (kind, values). Emitted in sorted-key order
    so output bytes are deterministic; absent keys are simply not
    written (the wire form of NULL)."""
    body = bytearray()
    for name, (kind, values) in sorted(features.items()):
        entry = _w_len(1, name.encode("utf-8")) + _w_len(
            2, encode_feature(kind, values)
        )
        body += _w_len(1, entry)  # Features.feature map entry
    return bytes(_w_len(1, bytes(body)))  # Example.features


def _decode_list(kind: int, buf: bytes) -> list:
    """Decode a BytesList/FloatList/Int64List message body. Accepts
    packed AND unpacked repeated encodings (proto3 parsers must)."""
    out: list = []
    pos = 0
    while pos < len(buf):
        tag, pos = _r_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if field != 1:
            pos = _skip_field(buf, pos, wt)
            continue
        if kind == KIND_BYTES:
            if wt != _WT_LEN:
                raise ValueError(
                    f"tfrecord: BytesList.value has wire type {wt}, "
                    "expected length-delimited"
                )
            n, pos = _r_varint(buf, pos)
            out.append(bytes(buf[pos : pos + n]))
            pos += n
        elif kind == KIND_FLOAT:
            if wt == _WT_LEN:  # packed
                n, pos = _r_varint(buf, pos)
                out.extend(struct.unpack(f"<{n // 4}f", buf[pos : pos + n]))
                pos += n
            elif wt == _WT_I32:  # unpacked fixed32
                out.append(struct.unpack("<f", buf[pos : pos + 4])[0])
                pos += 4
            else:
                raise ValueError(
                    f"tfrecord: FloatList.value has wire type {wt}, "
                    "expected packed or fixed32"
                )
        else:  # KIND_INT64
            if wt == _WT_LEN:  # packed
                n, pos = _r_varint(buf, pos)
                end = pos + n
                while pos < end:
                    v, pos = _r_varint(buf, pos)
                    out.append(_signed64(v))
            elif wt == _WT_VARINT:  # unpacked varint
                v, pos = _r_varint(buf, pos)
                out.append(_signed64(v))
            else:
                raise ValueError(
                    f"tfrecord: Int64List.value has wire type {wt}, "
                    "expected packed or varint"
                )
    return out


def _decode_feature(buf: bytes) -> tuple[int, list] | None:
    """Returns (kind, values) or None for a kind-less Feature."""
    pos = 0
    found = None
    while pos < len(buf):
        tag, pos = _r_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if field in (KIND_BYTES, KIND_FLOAT, KIND_INT64) and wt == _WT_LEN:
            n, pos = _r_varint(buf, pos)
            found = (field, _decode_list(field, buf[pos : pos + n]))
            pos += n
        else:
            pos = _skip_field(buf, pos, wt)
    return found


def decode_example(buf: bytes) -> dict[str, tuple[int, list]]:
    """Parse one serialized Example into name -> (kind, values)."""
    feats: dict[str, tuple[int, list]] = {}
    pos = 0
    while pos < len(buf):
        tag, pos = _r_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if field != 1 or wt != _WT_LEN:  # not Example.features
            pos = _skip_field(buf, pos, wt)
            continue
        flen, pos = _r_varint(buf, pos)
        fend = pos + flen
        while pos < fend:  # Features: repeated map entries
            etag, pos = _r_varint(buf, pos)
            if etag >> 3 != 1 or etag & 7 != _WT_LEN:
                pos = _skip_field(buf, pos, etag & 7)
                continue
            elen, pos = _r_varint(buf, pos)
            eend = pos + elen
            name, parsed = None, None
            while pos < eend:  # map entry: key=1, value=2
                mtag, pos = _r_varint(buf, pos)
                mfield, mwt = mtag >> 3, mtag & 7
                if mfield == 1 and mwt == _WT_LEN:
                    n, pos = _r_varint(buf, pos)
                    name = bytes(buf[pos : pos + n]).decode("utf-8")
                    pos += n
                elif mfield == 2 and mwt == _WT_LEN:
                    n, pos = _r_varint(buf, pos)
                    parsed = _decode_feature(buf[pos : pos + n])
                    pos += n
                else:
                    pos = _skip_field(buf, pos, mwt)
            if name is not None and parsed is not None:
                feats[name] = parsed
        pos = fend
    return feats


# ---------------------------------------------------------------------
# TFRecord framing
# ---------------------------------------------------------------------


def write_record(out, data: bytes) -> None:
    hdr = struct.pack("<Q", len(data))
    out.write(hdr)
    out.write(struct.pack("<I", masked_crc32c(hdr)))
    out.write(data)
    out.write(struct.pack("<I", masked_crc32c(data)))


def iter_records(path: str, verify: bool = True):
    """Yield record payloads from one TFRecord file. mmap'd like the
    Avro reader: the OS pages records in as the cursor walks them, so
    a multi-GB shard scans in bounded memory. A short tail or a CRC
    mismatch refuses loudly — the framing has no sync marker to
    resync on, so silent tolerance would mean silent data loss."""
    import mmap

    with open(path, "rb") as f:
        try:
            buf = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        except ValueError:  # zero-length file
            return
        size = len(buf)
        pos = 0
        while pos < size:
            if pos + 12 > size:
                raise ValueError(f"tfrecord: truncated header in {path}")
            hdr = buf[pos : pos + 8]
            (length,) = struct.unpack("<Q", hdr)
            (hcrc,) = struct.unpack("<I", buf[pos + 8 : pos + 12])
            if verify and masked_crc32c(hdr) != hcrc:
                raise ValueError(
                    f"tfrecord: corrupt length crc at offset {pos} in {path}"
                )
            pos += 12
            if pos + length + 4 > size:
                raise ValueError(f"tfrecord: truncated record in {path}")
            data = bytes(buf[pos : pos + length])
            (dcrc,) = struct.unpack("<I", buf[pos + length : pos + length + 4])
            if verify and masked_crc32c(data) != dcrc:
                raise ValueError(
                    f"tfrecord: corrupt data crc at offset {pos} in {path}"
                )
            pos += length + 4
            yield data


# ---------------------------------------------------------------------
# schema mapping (Spark <-> the Example feature kinds)
# ---------------------------------------------------------------------


def _field_plan(dt: T.DataType, name: str) -> tuple[int, bool]:
    """Returns (feature kind, is_array) for a Spark field; refuses
    types tf.train.Example cannot carry."""
    array = isinstance(dt, T.ArrayType)
    inner = dt.elementType if array else dt
    if isinstance(inner, (T.StringType, T.BinaryType)):
        return KIND_BYTES, array
    if isinstance(inner, (T.LongType, T.IntegerType, T.BooleanType)):
        return KIND_INT64, array
    if isinstance(inner, T.FloatType):
        return KIND_FLOAT, array
    raise ValueError(
        f"tfrecord: column {name!r} has type {dt.simpleString()}, which "
        "tf.train.Example cannot carry (it has only bytes/float32/int64 "
        "lists — no double, no timestamps, no nesting). Cast explicitly "
        "before writing; float64 in particular must be an explicit "
        "cast-to-float decision, never a silent narrowing."
    )


def _to_feature_values(kind: int, dt: T.DataType, vals: list) -> list:
    if any(v is None for v in vals):
        raise ValueError(
            "tfrecord: a tf.train.Example list cannot carry NULL "
            "elements (the format's only null is an ABSENT feature "
            "key) — filter or fill array elements before writing"
        )
    if kind == KIND_BYTES and isinstance(
        dt.elementType if isinstance(dt, T.ArrayType) else dt, T.StringType
    ):
        return [v.encode("utf-8") for v in vals]
    if kind == KIND_BYTES:
        return [bytes(v) for v in vals]
    if kind == KIND_INT64:
        return [int(v) for v in vals]
    return [float(v) for v in vals]


def _from_feature_values(kind: int, dt: T.DataType, vals: list) -> list:
    inner = dt.elementType if isinstance(dt, T.ArrayType) else dt
    if kind == KIND_BYTES and isinstance(inner, T.StringType):
        return [v.decode("utf-8") for v in vals]
    if kind == KIND_INT64 and isinstance(inner, T.BooleanType):
        return [bool(v) for v in vals]
    if kind == KIND_INT64 and isinstance(inner, T.IntegerType):
        return [int(v) for v in vals]
    return vals


_KIND_NAME = {KIND_BYTES: "bytes", KIND_FLOAT: "float", KIND_INT64: "int64"}


def infer_schema_from_file(path: str, sample: int = 100) -> T.StructType:
    """Kind from each key's first occurrence; array-ness if ANY
    sampled record carries != 1 value for the key. Pass an explicit
    schema to override (e.g. a genuinely single-element list column)."""
    kinds: dict[str, int] = {}
    multi: dict[str, bool] = {}
    n = 0
    for rec in iter_records(path):
        for name, (kind, vals) in decode_example(rec).items():
            kinds.setdefault(name, kind)
            if len(vals) != 1:
                multi[name] = True
        n += 1
        if n >= sample:
            break
    if not kinds:
        raise ValueError(f"tfrecord: no features found in {path}")
    base = {
        KIND_BYTES: T.StringType(),
        KIND_FLOAT: T.FloatType(),
        KIND_INT64: T.LongType(),
    }
    fields = []
    for name in sorted(kinds):
        dt: T.DataType = base[kinds[name]]
        if multi.get(name):
            dt = T.ArrayType(dt, containsNull=False)
        fields.append(T.StructField(name, dt, nullable=True))
    return T.StructType(fields)


# ---------------------------------------------------------------------
# the Spark 4 Python DataSource
# ---------------------------------------------------------------------


@dataclass
class TFRecordFilePartition(InputPartition):
    path: str


def _tfrecord_paths(root: str) -> list[str]:
    if os.path.isdir(root):
        return sorted(
            os.path.join(root, f)
            for f in os.listdir(root)
            if f.endswith(".tfrecord")
        )
    return [root]


class TFRecordReader(DataSourceReader):
    def __init__(self, options: dict, schema: T.StructType):
        self._root = options.get("path")
        if not self._root:
            raise ValueError("tfrecord source needs a path")
        self._schema = schema
        self._verify = options.get("verify", "true").lower() != "false"
        # resolve plans eagerly so bad schemas refuse at plan time
        self._plans = [
            (f.name, f.dataType, *_field_plan(f.dataType, f.name))
            for f in schema.fields
        ]

    def partitions(self) -> list[TFRecordFilePartition]:
        # one task per shard — the format has no sync markers, so a
        # file is unsplittable (TensorFlow parallelizes by shard too)
        return [TFRecordFilePartition(p) for p in _tfrecord_paths(self._root)]

    _ARROW_BATCH_ROWS = 4096

    def read(self, partition: TFRecordFilePartition):
        import pyarrow as pa

        def arrow_type(dt: T.DataType):
            if isinstance(dt, T.ArrayType):
                return pa.list_(arrow_type(dt.elementType))
            return {
                "string": pa.string(), "binary": pa.binary(),
                "long": pa.int64(), "integer": pa.int32(),
                "boolean": pa.bool_(), "float": pa.float32(),
            }[dt.typeName()]

        names = [p[0] for p in self._plans]
        types = [arrow_type(p[1]) for p in self._plans]
        cols: list[list] = [[] for _ in self._plans]

        def flush():
            batch = pa.RecordBatch.from_arrays(
                [pa.array(c, t) for c, t in zip(cols, types)], names=names
            )
            for c in cols:
                c.clear()
            return batch

        n = 0
        for rec in iter_records(partition.path, verify=self._verify):
            feats = decode_example(rec)
            for col, (name, dt, kind, is_array) in zip(cols, self._plans):
                got = feats.get(name)
                if got is None:
                    col.append(None)  # absent key IS the format's null
                    continue
                gkind, vals = got
                if gkind != kind:
                    raise ValueError(
                        f"tfrecord: feature {name!r} in "
                        f"{partition.path} is a {_KIND_NAME[gkind]} list "
                        f"but the schema wants {_KIND_NAME[kind]}"
                    )
                vals = _from_feature_values(kind, dt, vals)
                if is_array:
                    col.append(vals)
                elif len(vals) == 1:
                    col.append(vals[0])
                elif not vals:
                    col.append(None)
                else:
                    raise ValueError(
                        f"tfrecord: feature {name!r} carries "
                        f"{len(vals)} values but the schema says scalar "
                        f"{dt.simpleString()}"
                    )
            n += 1
            if n >= self._ARROW_BATCH_ROWS:
                yield flush()
                n = 0
        if n:
            yield flush()


@dataclass
class TFRecordCommitMessage(WriterCommitMessage):
    tmp_path: str | None


class TFRecordWriter(DataSourceWriter):
    """One ``.tfrecord`` shard per task under the staged-tmp-then-
    rename two-phase commit (readers glob only ``.tfrecord``, so a
    crashed write publishes nothing — the WARC/Avro protocol)."""

    def __init__(self, options: dict, schema: T.StructType, overwrite: bool):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("tfrecord sink needs a path")
        self._plans = [
            (f.name, f.dataType, *_field_plan(f.dataType, f.name))
            for f in schema.fields
        ]
        self._overwrite = overwrite

    def write(self, iterator) -> TFRecordCommitMessage:
        import uuid

        os.makedirs(self._dir, exist_ok=True)
        tmp = os.path.join(
            self._dir, f"part-{uuid.uuid4().hex[:12]}.tfrecord.tmp"
        )
        n = 0
        try:
            with open(tmp, "wb") as out:
                for row in iterator:
                    feats: dict[str, tuple[int, list]] = {}
                    for v, (name, dt, kind, is_array) in zip(
                        row, self._plans
                    ):
                        if v is None:
                            continue  # null -> absent key
                        vals = list(v) if is_array else [v]
                        feats[name] = (
                            kind, _to_feature_values(kind, dt, vals)
                        )
                    write_record(out, encode_example(feats))
                    n += 1
        except BaseException:
            # a task dying mid-write must not leak its staged shard:
            # abort() only sees messages from COMPLETED tasks (r14
            # review)
            try:
                os.remove(tmp)
            except OSError:
                pass
            raise
        if not n:
            os.remove(tmp)
            return TFRecordCommitMessage(tmp_path=None)
        return TFRecordCommitMessage(tmp_path=tmp)

    def commit(self, messages) -> None:
        # publish new shards FIRST, then clear stale ones: a driver
        # crash mid-commit can then only expose old+new duplicates,
        # never an empty dataset (r14 review)
        published = set()
        for msg in messages:
            if msg and msg.tmp_path:
                final = msg.tmp_path[: -len(".tmp")]
                os.replace(msg.tmp_path, final)
                published.add(os.path.basename(final))
        if self._overwrite:
            for f in os.listdir(self._dir):
                if f.endswith(".tfrecord") and f not in published:
                    os.remove(os.path.join(self._dir, f))

    def abort(self, messages) -> None:
        for msg in messages:
            if msg and msg.tmp_path:
                try:
                    os.remove(msg.tmp_path)
                except OSError:
                    pass


class TFRecordDataSource(DataSource):
    """``spark.read.format("tfrecord").load(dir_or_file)`` — schema
    passed explicitly or inferred from the first shard's records;
    ``df.write.format("tfrecord")`` writes one shard per task of
    TFRecord-framed ``tf.train.Example`` messages, two-phase
    committed. ``option("verify", "false")`` skips CRC checks on
    read."""

    @classmethod
    def name(cls) -> str:
        return "tfrecord"

    def schema(self) -> T.StructType:
        paths = _tfrecord_paths(self.options.get("path", ""))
        if not paths:
            raise ValueError(
                "tfrecord: no .tfrecord files to infer schema from"
            )
        return infer_schema_from_file(paths[0])

    def reader(self, schema: T.StructType) -> TFRecordReader:
        return TFRecordReader(self.options, schema)

    def writer(self, schema: T.StructType, overwrite: bool) -> TFRecordWriter:
        return TFRecordWriter(self.options, schema, overwrite)


def register_tfrecord_source(spark) -> None:
    try:
        spark.dataSource.register(TFRecordDataSource)
    except Exception:  # noqa: BLE001 — already registered in this session
        pass
