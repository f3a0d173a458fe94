"""WARC container framing (sources/warc_source.py) — spec walk,
HTTP payload split, and crash-of-the-crawler robustness, all without
a SparkSession (the DataSource read path calls exactly these)."""

from __future__ import annotations

from stripe_data_pipeline_spark.sources.warc_source import (
    _http_parts,
    parse_warc_file,
    write_warc_records,
)


def _roundtrip(tmp_path, records):
    p = str(tmp_path / "f.warc")
    write_warc_records(p, records)
    return p, list(parse_warc_file(p))


def test_roundtrip_preserves_records_and_payloads(tmp_path):
    recs = [
        {"record_id": "doc-1", "target_uri": "http://x/doc/1",
         "html": "<p>hello</p>"},
        {"record_id": "doc-2", "target_uri": "http://x/doc/2",
         # payload containing the record separator must NOT split the
         # stream: framing is length-prefixed, not delimiter-based
         "html": "<p>tricky\r\n\r\nWARC/1.0 lookalike</p>"},
    ]
    _, parsed = _roundtrip(tmp_path, recs)
    assert [r["headers"]["warc-type"] for r in parsed] == [
        "warcinfo", "response", "response",
    ]
    status, ctype, body = _http_parts(parsed[2]["payload"])
    assert (status, ctype) == (200, "text/html")
    assert body == recs[1]["html"]


def test_truncated_file_yields_complete_prefix(tmp_path):
    recs = [
        {"record_id": f"doc-{i}", "target_uri": f"http://x/doc/{i}",
         "html": f"<p>body {i}</p>"}
        for i in range(3)
    ]
    p = str(tmp_path / "f.warc")
    write_warc_records(p, recs)
    data = open(p, "rb").read()
    # cut mid-payload of the LAST record: the walk must yield every
    # complete record and stop cleanly (truncated fetches are a fact
    # of crawl life), never raise
    open(p, "wb").write(data[: len(data) - 12])
    parsed = list(parse_warc_file(p))
    assert len(parsed) == 3  # warcinfo + 2 complete responses
    assert _http_parts(parsed[2]["payload"])[2] == "<p>body 1</p>"


def test_non_http_payload_is_passed_through(tmp_path):
    p, parsed = _roundtrip(tmp_path, [])
    info = parsed[0]
    status, ctype, body = _http_parts(info["payload"])
    assert status is None and ctype is None
    assert "warc_source" in body


def test_datasource_maps_one_partition_per_file(spark, tmp_path):
    """The CommonCrawl parallelization contract: N WARC files -> N
    input partitions, each yielding exactly its own records."""
    from stripe_data_pipeline_spark.sources.warc_source import (
        register_warc_source,
    )

    d = tmp_path / "crawl"
    d.mkdir()
    for shard in range(3):
        write_warc_records(
            str(d / f"s{shard}.warc"),
            [
                {"record_id": f"doc-{shard}-{i}",
                 "target_uri": f"http://x/doc/{shard * 10 + i}",
                 "html": f"<p>s{shard} r{i}</p>"}
                for i in range(2)
            ],
        )
    register_warc_source(spark)
    df = spark.read.format("warcarchive").load(str(d))
    assert df.rdd.getNumPartitions() == 3
    resp = df.filter(df.warc_type == "response")
    assert resp.count() == 6
    assert df.filter(df.warc_type == "warcinfo").count() == 3
    got = {r["record_id"] for r in resp.collect()}
    assert got == {f"doc-{s}-{i}" for s in range(3) for i in range(2)}


def test_writer_two_phase_commit_and_overwrite(spark, tmp_path):
    """df.write.format('warcarchive'): tasks stage .warc.tmp shards,
    commit publishes them as .warc (readers glob only .warc, so a
    crashed write publishes nothing); mode('overwrite') replaces the
    previous crawl atomically at commit."""
    from stripe_data_pipeline_spark.sources.warc_source import (
        register_warc_source,
    )

    register_warc_source(spark)
    d = str(tmp_path / "crawl")
    df1 = spark.createDataFrame(
        [(f"doc-{i}", f"http://x/doc/{i}", f"<p>v1 {i}</p>")
         for i in range(6)],
        "record_id string, target_uri string, html string",
    ).repartition(3)
    df1.write.format("warcarchive").mode("overwrite").save(d)
    import os

    names = sorted(os.listdir(d))
    assert names and all(n.endswith(".warc") for n in names)  # no tmps
    back = spark.read.format("warcarchive").load(d)
    resp = back.filter(back.warc_type == "response")
    assert resp.count() == 6
    assert {r["body"] for r in resp.collect()} == {
        f"<p>v1 {i}</p>" for i in range(6)
    }
    # overwrite replaces the old shards entirely
    df2 = spark.createDataFrame(
        [("doc-9", "http://x/doc/9", "<p>v2</p>")],
        "record_id string, target_uri string, html string",
    )
    df2.write.format("warcarchive").mode("overwrite").save(d)
    back2 = spark.read.format("warcarchive").load(d)
    resp2 = back2.filter(back2.warc_type == "response").collect()
    assert [r["body"] for r in resp2] == ["<p>v2</p>"]
