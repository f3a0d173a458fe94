"""Stripe connector (S1) tests: Python Data Source registration,
time-window partitioning, pagination, downstream from_json parse."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stripe_data_pipeline_spark.sources.fixtures import DAY, EPOCH_2024
from stripe_data_pipeline_spark.sources.stripe_schema import INVOICE_SCHEMA
from stripe_data_pipeline_spark.sources.stripe_source import (
    StripeDataSource,
    StripeReader,
)


@pytest.fixture(scope="module", autouse=True)
def register(spark):
    spark.dataSource.register(StripeDataSource)


def test_full_fetch_roundtrip(spark):
    df = (
        spark.read.format("stripe")
        .option("endpoint", "invoices")
        .option("fake_items", "50")
        .load()
    )
    assert df.columns == ["id", "created", "payload"]
    assert df.count() == 50
    parsed = df.select(F.from_json("payload", INVOICE_SCHEMA).alias("doc"))
    lines = parsed.select(F.explode("doc.lines.data").alias("li"))
    assert lines.count() > 50  # multi-line fan-out survived the wire


def test_time_window_partitions_cover_range():
    r = StripeReader(
        {
            "created_gte": str(EPOCH_2024),
            "created_lt": str(EPOCH_2024 + 8 * DAY),
            "num_partitions": "4",
        }
    )
    parts = r.partitions()
    assert len(parts) == 4
    assert parts[0].gte == EPOCH_2024 and parts[-1].lt == EPOCH_2024 + 8 * DAY
    for a, b in zip(parts, parts[1:]):
        assert a.lt == b.gte  # no gaps, no overlap


def test_windowed_read_equals_full_read(spark):
    full = (
        spark.read.format("stripe").option("fake_items", "60").load().collect()
    )
    windowed = (
        spark.read.format("stripe")
        .option("fake_items", "60")
        .option("created_gte", str(EPOCH_2024))
        .option("created_lt", str(EPOCH_2024 + 60 * 3600))
        .option("num_partitions", "6")
        .load()
        .collect()
    )
    assert sorted(r["id"] for r in windowed) == sorted(r["id"] for r in full)


def test_three_endpoints_through_datasource(spark):
    # extract_stripe_data.py:11-36 pulls three resources; the connector
    # serves all of them through the same DataSource surface.
    for endpoint, expect_field in [
        ("invoices", "lines"),
        ("subscriptions", "status"),
        ("subscription_updates", "type"),
    ]:
        df = (
            spark.read.format("stripe")
            .option("endpoint", endpoint)
            .option("fake_items", "30")
            .load()
        )
        rows = df.collect()
        assert len(rows) == 30, endpoint
        import json as _json

        assert expect_field in _json.loads(rows[0]["payload"]), endpoint


def test_server_side_list_filters(spark):
    # status=paid for invoices / type glob for events, mirroring the
    # reference's list params.
    paid = (
        spark.read.format("stripe")
        .option("endpoint", "invoices")
        .option("fake_items", "35")
        .option("status", "paid")
        .load()
        .collect()
    )
    assert 0 < len(paid) < 35  # i % 7 == 0 invoices are 'open'
    import json as _json

    assert all(_json.loads(r["payload"])["status"] == "paid" for r in paid)
    evs = (
        spark.read.format("stripe")
        .option("endpoint", "subscription_updates")
        .option("fake_items", "10")
        .option("event_type", "customer.subscription.*")
        .load()
        .collect()
    )
    assert len(evs) == 10  # every fake event matches the glob


def test_pagination_is_exhaustive(spark):
    # page_size smaller than the corpus forces multiple pages per window
    df = (
        spark.read.format("stripe")
        .option("fake_items", "40")
        .option("page_size", "7")
        .load()
    )
    assert df.count() == 40
    assert df.select("id").distinct().count() == 40


def test_stream_reader_pacing_and_sharding():
    """Unit-level contract of the streaming flavor: created-HWM
    offsets advance by at most max_batch_seconds per latestOffset
    call (clamped up past the empty pre-corpus span), and a batch's
    range is time-window sharded like the batch reader."""
    from stripe_data_pipeline_spark.sources.fixtures import EPOCH_2024
    from stripe_data_pipeline_spark.sources.stripe_source import (
        StripeStreamReader,
    )

    r = StripeStreamReader(
        {"endpoint": "invoices", "fake_items": "120",
         "max_batch_seconds": "150000", "num_partitions": "4"}
    )
    assert r.initialOffset() == {"created": 0}
    o1 = r.latestOffset()
    assert o1 == {"created": EPOCH_2024 + 150000}  # clamped + paced
    o2 = r.latestOffset()
    assert o2 == {"created": EPOCH_2024 + 300000}
    o3 = r.latestOffset()
    latest = EPOCH_2024 + 119 * 3600 + 1  # corpus max created + 1
    assert o3 == {"created": latest}
    assert r.latestOffset() == {"created": latest}  # idle: no advance

    parts = r.partitions(o1, o2)
    assert [p.gte for p in parts][0] == o1["created"]
    assert parts[-1].lt == o2["created"]
    assert len(parts) == 4
    # contiguous, non-overlapping
    for a, b in zip(parts, parts[1:]):
        assert a.lt == b.gte
    # empty range degrades to a single empty window
    empty = r.partitions(o3, o3)
    assert len(empty) == 1 and empty[0].gte == empty[0].lt
    rows = list(r.read(parts[0]))
    assert rows and all(o1["created"] <= c < o2["created"] for _, c, _ in rows)


def test_stream_drain_resumes_from_checkpoint(spark, tmp_path):
    """The engine's checkpoint carries the created cursor across
    restarts: drain half the corpus, stop, restart a NEW query on the
    same checkpoint — the union must be exactly the full corpus with
    no duplicate ids (the S2 incremental contract, streaming-grade)."""
    from stripe_data_pipeline_spark.sources.stripe_source import (
        StripeDataSource,
    )

    spark.dataSource.register(StripeDataSource)
    ck = str(tmp_path / "ck")
    seen: list[tuple[int, list[str]]] = []

    def reader():
        return (
            spark.readStream.format("stripe")
            .option("endpoint", "invoices")
            .option("fake_items", "60")
            .option("max_batch_seconds", "80000")
            .load()
        )

    def fb(batch, bid):
        seen.append((bid, [r["id"] for r in batch.select("id").collect()]))

    # phase 1: availableNow snapshots its target at the FIRST
    # latestOffset call (one paced window), so it deterministically
    # processes exactly micro-batch 0 and terminates cleanly
    q = (
        reader().writeStream.foreachBatch(fb)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    n_phase1 = sum(len(ids) for _, ids in seen)
    assert 0 < n_phase1 < 60  # partial drain

    # phase 2: fresh query object, same checkpoint -> resumes cursor.
    # The new reader's in-memory pacer restarts at the corpus floor, so
    # the first trigger sees latest == committed start ("no new data")
    # and processAllAvailable returns early; each subsequent trigger
    # advances the pacer one max_batch_seconds step until it passes the
    # committed offset and batches flow again. Poll until drained.
    import time as _t

    q2 = (
        reader().writeStream.foreachBatch(fb)
        .option("checkpointLocation", ck)
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = _t.time() + 120
    while _t.time() < deadline:
        q2.processAllAvailable()
        if sum(len(ids) for _, ids in seen) >= 60:
            break
        _t.sleep(0.2)
    q2.stop()
    # foreachBatch is at-least-once: an uncommitted batch replays with
    # the SAME batch id after restart. Exactly-once is per-bid (the
    # txn-ledger sink dedupes on it); assert that contract.
    by_bid = {bid: ids for bid, ids in seen}  # replay: last wins
    all_ids = [i for ids in by_bid.values() for i in ids]
    assert sorted(all_ids) == sorted(f"in_{i}" for i in range(60))
    assert len(all_ids) == len(set(all_ids)), "cross-batch duplicate"


def test_real_client_request_contract_offline():
    """The live-API request builder is pure and SDK-free: pin the
    reference's contract (extract_stripe_data.py:11-36) — per-resource
    fixed params, created[gte]/[lt] windowing (lt omitted for the
    unbounded first fetch), starting_after pagination, limit — without
    network or the stripe package."""
    from stripe_data_pipeline_spark.sources.stripe_source import (
        build_list_call,
    )

    res, call = build_list_call("invoices", 100, 200, None, 50)
    assert res == "Invoice"
    assert call == {
        "status": "paid",
        "limit": 50,
        "created": {"gte": 100, "lt": 200},
    }

    # unbounded window: no created[lt]; cursor present
    res, call = build_list_call(
        "subscriptions", 0, 2**62, "sub_99", 100
    )
    assert res == "Subscription"
    assert call == {
        "status": "all",
        "limit": 100,
        "created": {"gte": 0},
        "starting_after": "sub_99",
    }

    # caller params override resource defaults; event glob preserved
    res, call = build_list_call(
        "subscription_updates", 5, 6, None, 10, {"type": "customer.subscription.deleted"}
    )
    assert res == "Event"
    assert call["type"] == "customer.subscription.deleted"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown endpoint"):
        build_list_call("charges", 0, 1, None, 10)


# ---- fault paths (VERDICT r6 #8) ----------------------------------


def test_retry_backoff_on_rate_limit(monkeypatch):
    """Rate-limit mid-window: exponential 2^(n-1)s backoff, then the
    page is served — the reference's retry contract
    (extract_stripe_data.py:88-97) on the sharded reader."""
    from stripe_data_pipeline_spark.sources import stripe_source as SS

    class RateLimitError(Exception):
        pass

    class Flaky(SS.FakeStripeClient):
        def __init__(self, fail_n):
            super().__init__(30)
            self.fail_n = fail_n
            self.calls = 0

        def list_page(self, *a, **kw):
            self.calls += 1
            if self.calls <= self.fail_n:
                raise RateLimitError("429")
            return super().list_page(*a, **kw)

    sleeps: list[int] = []
    monkeypatch.setattr(SS.time, "sleep", sleeps.append)
    r = SS.StripeReader({"endpoint": "invoices", "fake_items": "30"})
    page = r._fetch_with_retry(Flaky(3), SS.TimeWindowPartition(0, 2**62), None)
    assert len(page) > 0
    assert sleeps == [1, 2, 4]  # 2^(n-1)


def test_non_rate_limit_error_aborts_immediately(monkeypatch):
    """'All data, or none' (extract_stripe_data.py:98-102): anything
    but a rate limit aborts the task with NO retry and NO sleep."""
    from stripe_data_pipeline_spark.sources import stripe_source as SS

    class Broken(SS.FakeStripeClient):
        def list_page(self, *a, **kw):
            raise ValueError("schema drift")

    sleeps: list[int] = []
    monkeypatch.setattr(SS.time, "sleep", sleeps.append)
    r = SS.StripeReader({"endpoint": "invoices"})
    with pytest.raises(ValueError, match="schema drift"):
        r._fetch_with_retry(Broken(), SS.TimeWindowPartition(0, 2**62), None)
    assert sleeps == []


def test_rate_limit_gives_up_after_max_retries(monkeypatch):
    from stripe_data_pipeline_spark.sources import stripe_source as SS

    class RateLimitError(Exception):
        pass

    class Always429(SS.FakeStripeClient):
        def list_page(self, *a, **kw):
            raise RateLimitError("429")

    sleeps: list[int] = []
    monkeypatch.setattr(SS.time, "sleep", sleeps.append)
    r = SS.StripeReader({"endpoint": "invoices"})
    with pytest.raises(RateLimitError):
        r._fetch_with_retry(Always429(), SS.TimeWindowPartition(0, 2**62), None)
    assert len(sleeps) == SS.MAX_RETRIES  # 50 backoffs, then abort


def test_mid_pagination_failure_rereads_full_window(monkeypatch):
    """A task that dies mid-pagination holds no partial state: the
    engine's task retry calls read() again and gets the FULL window
    (at-least-once per partition, exactly the semantics the MERGE
    sinks dedupe on)."""
    from stripe_data_pipeline_spark.sources import stripe_source as SS

    class FailSecondPage(SS.FakeStripeClient):
        def __init__(self, n):
            super().__init__(n)
            self.pages = 0
            self.armed = True

        def list_page(self, *a, **kw):
            self.pages += 1
            if self.armed and self.pages == 2:
                self.armed = False
                raise ValueError("boom mid-batch")
            return super().list_page(*a, **kw)

    inst = FailSecondPage(25)
    monkeypatch.setattr(SS, "FakeStripeClient", lambda n: inst)
    r = SS.StripeReader(
        {"endpoint": "invoices", "fake_items": "25", "page_size": "10"}
    )
    part = SS.TimeWindowPartition(0, 2**62)
    with pytest.raises(ValueError, match="boom"):
        list(r.read(part))
    rows = list(r.read(part))  # the retried attempt
    assert len(rows) == 25
    assert len({i for i, _, _ in rows}) == 25  # complete, no dupes


def test_stream_empty_source_parks_offset():
    """An empty source must not crash latestOffset: the pacer parks at
    its floor (latestOffset == initialOffset), batches are empty, and
    commit() of an empty-batch offset is accepted."""
    from stripe_data_pipeline_spark.sources.stripe_source import (
        StripeStreamReader,
    )

    r = StripeStreamReader(
        {"endpoint": "invoices", "fake_items": "0", "created_gte": "1000"}
    )
    assert r.initialOffset() == {"created": 1000}
    o = r.latestOffset()
    assert o == {"created": 1000}  # parked, not advanced, not crashed
    parts = r.partitions(r.initialOffset(), o)
    assert len(parts) == 1 and parts[0].gte == parts[0].lt
    assert list(r.read(parts[0])) == []
    r.commit(o)  # no-op by contract
    assert r.latestOffset() == {"created": 1000}


def test_stream_commit_does_not_reset_pacer():
    """commit() persists nothing source-side (offsets live in the
    engine checkpoint); it must also not rewind the in-memory pacer —
    the next latestOffset keeps advancing monotonically."""
    from stripe_data_pipeline_spark.sources.stripe_source import (
        StripeStreamReader,
    )

    r = StripeStreamReader(
        {"endpoint": "invoices", "fake_items": "120",
         "max_batch_seconds": "150000"}
    )
    o1 = r.latestOffset()
    r.commit(o1)
    o2 = r.latestOffset()
    assert o2["created"] > o1["created"]  # still draining the backlog
    r.commit(o2)
    o3 = r.latestOffset()
    assert o3["created"] >= o2["created"]
