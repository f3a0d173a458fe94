"""WARC archival source (ISO 28500) — Spark 4 Python Data Source API.

The raw-crawl HEAD of an LLM data pipeline: web corpora ship as WARC
container files (CommonCrawl's unit of distribution), each holding a
sequence of length-prefixed records (warcinfo, request, response, ...)
whose response payloads are HTTP messages wrapping the HTML. Before
round 12 the engine's text pipeline started at a clean ``documents``
table; with this source plus ``operators/html.py`` it starts at bytes
on disk: WARC file -> records -> HTTP payload -> HTML -> main text.

Spark-first design: ONE input partition per WARC file — the same
parallelization unit CommonCrawl processing uses (each .warc.gz is
~1 GB and self-contained, so a 1000-executor cluster maps files to
tasks with no coordination). Record parsing is a strict streaming
walk of the spec's framing (version line, headers to a blank line,
``Content-Length`` payload bytes, CRLF CRLF separator) — constant
memory per record, no whole-file buffering.

The writer half (:func:`write_warc_records`) exists for fixtures and
round-tripping: it emits spec-shaped records so the reader is
exercised against real framing, including records the consumer must
skip (warcinfo).
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("body", T.StringType()),
    ]
)

_CRLF = b"\r\n"


def write_warc_records(path: str, records: list[dict]) -> None:
    """Write spec-framed WARC/1.0 records: a leading ``warcinfo``
    record (real files carry one; consumers must skip it), then one
    ``response`` record per input {record_id, target_uri, html} with
    an HTTP/1.1 message as payload."""
    with open(path, "wb") as fh:
        info = b"software: stripe-data-pipeline-spark/warc_source\r\n"
        fh.write(
            b"WARC/1.0\r\n"
            b"WARC-Type: warcinfo\r\n"
            b"WARC-Record-ID: <urn:uuid:warcinfo-"
            + os.path.basename(path).encode()
            + b">\r\n"
            + f"Content-Length: {len(info)}\r\n".encode()
            + _CRLF
        )
        fh.write(info + _CRLF + _CRLF)
        for r in records:
            http = (
                "HTTP/1.1 200 OK\r\n"
                "Content-Type: text/html\r\n"
                "\r\n" + r["html"]
            ).encode("utf-8")
            fh.write(
                (
                    "WARC/1.0\r\n"
                    "WARC-Type: response\r\n"
                    f"WARC-Record-ID: <urn:uuid:{r['record_id']}>\r\n"
                    f"WARC-Target-URI: {r['target_uri']}\r\n"
                    f"Content-Length: {len(http)}\r\n"
                    "\r\n"
                ).encode("utf-8")
            )
            fh.write(http + _CRLF + _CRLF)


def parse_warc_file(path: str) -> Iterator[dict]:
    """Streaming spec walk: yields one dict per record with the raw
    payload bytes. Constant memory per record; malformed trailing
    bytes end the stream (truncated fetches are a fact of crawl
    life — partial files must not kill the task)."""
    with open(path, "rb") as fh:
        while True:
            version = fh.readline()
            if not version:
                return
            if version.strip() == b"":
                continue  # inter-record padding
            if not version.startswith(b"WARC/"):
                return  # malformed tail: stop cleanly
            headers: dict[str, str] = {}
            while True:
                line = fh.readline()
                if not line or line in (_CRLF, b"\n"):
                    break
                k, _, v = line.decode("utf-8", "replace").partition(":")
                headers[k.strip().lower()] = v.strip()
            try:
                n = int(headers.get("content-length", ""))
            except ValueError:
                return
            payload = fh.read(n)
            if len(payload) < n:
                return  # truncated record
            yield {"headers": headers, "payload": payload}


def _http_parts(payload: bytes) -> tuple[int | None, str | None, str]:
    """(status, content-type, body) of an HTTP message payload."""
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        return None, None, payload.decode("utf-8", "replace")
    lines = head.decode("utf-8", "replace").split("\r\n")
    status = None
    parts = lines[0].split()
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    ctype = None
    for ln in lines[1:]:
        k, _, v = ln.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
    return status, ctype, body.decode("utf-8", "replace")


@dataclass(frozen=True)
class WarcFilePartition(InputPartition):
    path: str


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self._root = options.get("path")
        if not self._root:
            raise ValueError("warcarchive source needs a path")

    def partitions(self) -> list[WarcFilePartition]:
        # one partition per file — the CommonCrawl parallelization unit
        if os.path.isdir(self._root):
            paths = sorted(
                os.path.join(self._root, f)
                for f in os.listdir(self._root)
                if f.endswith(".warc")
            )
        else:
            paths = [self._root]
        return [WarcFilePartition(p) for p in paths]

    _ARROW_BATCH_ROWS = 256

    def read(self, partition: WarcFilePartition):
        """Yields pyarrow RecordBatches (the Python DataSource fast
        path — HTML payloads are large strings, and Arrow batching
        skips per-row pickling across the worker boundary)."""
        import pyarrow as pa

        cols: dict[str, list] = {
            "record_id": [], "warc_type": [], "target_uri": [],
            "http_status": [], "content_type": [], "body": [],
        }

        def flush():
            batch = pa.RecordBatch.from_pydict(
                {
                    "record_id": pa.array(cols["record_id"], pa.string()),
                    "warc_type": pa.array(cols["warc_type"], pa.string()),
                    "target_uri": pa.array(cols["target_uri"], pa.string()),
                    "http_status": pa.array(cols["http_status"], pa.int32()),
                    "content_type": pa.array(
                        cols["content_type"], pa.string()
                    ),
                    "body": pa.array(cols["body"], pa.string()),
                }
            )
            for c in cols.values():
                c.clear()
            return batch

        for rec in parse_warc_file(partition.path):
            h = rec["headers"]
            rid = h.get("warc-record-id", "")
            if rid.startswith("<urn:uuid:") and rid.endswith(">"):
                rid = rid[len("<urn:uuid:"):-1]
            wtype = h.get("warc-type")
            if wtype == "response":
                status, ctype, body = _http_parts(rec["payload"])
            else:
                status, ctype = None, None
                body = rec["payload"].decode("utf-8", "replace")
            cols["record_id"].append(rid)
            cols["warc_type"].append(wtype)
            cols["target_uri"].append(h.get("warc-target-uri"))
            cols["http_status"].append(status)
            cols["content_type"].append(ctype)
            cols["body"].append(body)
            if len(cols["record_id"]) >= self._ARROW_BATCH_ROWS:
                yield flush()
        if cols["record_id"]:
            yield flush()


class WarcWriter(DataSourceWriter):
    """``df.write.format("warcarchive").save(dir)`` — each task frames
    its rows (record_id, target_uri, html) as one spec-shaped WARC
    shard. Two-phase commit: tasks write ``.warc.tmp`` files and
    return their paths as commit messages; the driver's commit()
    renames every tmp to its final ``.warc`` name (readers glob only
    ``.warc``, so a crashed write publishes NOTHING), and abort()
    deletes the orphans — the same staged-invisible-until-commit
    protocol the manifest table uses."""

    def __init__(self, options: dict, overwrite: bool):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("warcarchive sink needs a path")
        self._overwrite = overwrite

    def write(self, iterator) -> "WriterCommitMessage":
        import uuid as _uuid

        os.makedirs(self._dir, exist_ok=True)
        recs = [
            {
                "record_id": str(r["record_id"]),
                "target_uri": str(r["target_uri"]),
                "html": str(r["html"]),
            }
            for r in iterator
        ]
        if not recs:
            return WarcCommitMessage(tmp_path=None)
        tmp = os.path.join(
            self._dir, f"shard-{_uuid.uuid4().hex[:12]}.warc.tmp"
        )
        write_warc_records(tmp, recs)
        return WarcCommitMessage(tmp_path=tmp)

    def commit(self, messages) -> None:
        if self._overwrite:
            for f in os.listdir(self._dir):
                if f.endswith(".warc"):
                    os.remove(os.path.join(self._dir, f))
        for msg in messages:
            if msg and msg.tmp_path:
                os.replace(msg.tmp_path, msg.tmp_path[: -len(".tmp")])

    def abort(self, messages) -> None:
        for msg in messages:
            if msg and msg.tmp_path:
                try:
                    os.remove(msg.tmp_path)
                except OSError:
                    pass


@dataclass
class WarcCommitMessage(WriterCommitMessage):
    tmp_path: str | None


class WarcDataSource(DataSource):
    """``spark.read.format("warcarchive").load(dir_or_file)`` —
    yields (record_id, warc_type, target_uri, http_status,
    content_type, body) with one task per WARC file, Arrow-batched;
    ``df.write.format("warcarchive")`` frames rows back into shards
    under a two-phase tmp-then-rename commit."""

    @classmethod
    def name(cls) -> str:
        return "warcarchive"

    def schema(self) -> T.StructType:
        return WARC_SCHEMA

    def reader(self, schema: T.StructType) -> WarcReader:
        return WarcReader(self.options)

    def writer(self, schema: T.StructType, overwrite: bool) -> WarcWriter:
        return WarcWriter(self.options, overwrite)


def register_warc_source(spark) -> None:
    try:
        spark.dataSource.register(WarcDataSource)
    except Exception:  # noqa: BLE001 — already registered in this session
        pass
