"""Stripe REST source connector (S1) — Spark 4 Python Data Source API.

The reference extracts with a driver-side ``auto_paging_iter`` loop
(extract_stripe_data.py:62-102): serial cursor pagination, one worker,
per-item retry with exponential backoff 2^(n-1)s capped at 50 retries
(:88-97), 'all data, or none' abort semantics (:98-102).

Spark-first redesign: Stripe's cursor pagination is inherently
serial, but the ``created`` filter makes *time-window sharding*
parallel — each input partition pulls its own
``created[gte]..created[lt]`` slice with independent pagination. That
turns a 1-worker extract into N-executor parallel ingestion while
preserving the reference's retry/backoff contract per partition.

Offline behavior: with no ``stripe`` package or api key, a
deterministic :class:`FakeStripeClient` serves the same document
shapes (FIXTURES.md §A) so the connector path is fully testable in
this container; the real client is an import-try away.
"""

from __future__ import annotations

import json
import time
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql import types as T

from stripe_data_pipeline_spark.sources.fixtures import (
    make_invoice,
    make_subscription,
    make_subscription_event,
)

RAW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("created", T.LongType()),
        T.StructField("payload", T.StringType()),  # full JSON document
    ]
)

MAX_RETRIES = 50  # extract_stripe_data.py:62

# The reference's three resource configs (extract_stripe_data.py:11-36):
# endpoint -> (Stripe SDK resource name, fixed list params). The fake and
# the real client both key off this table.
RESOURCE_CONFIGS: dict[str, dict] = {
    "subscriptions": {"resource": "Subscription", "params": {"status": "all"}},
    "subscription_updates": {
        "resource": "Event",
        "params": {"type": "customer.subscription.*"},
    },
    "invoices": {"resource": "Invoice", "params": {"status": "paid"}},
}


@dataclass(frozen=True)
class TimeWindowPartition(InputPartition):
    gte: int
    lt: int


class FakeStripeClient:
    """Deterministic stand-in for the Stripe SDK: serves pages of
    documents for all three reference endpoints
    (extract_stripe_data.py:11-36) with ``created`` uniformly spread so
    time-window sharding has data in every partition."""

    def __init__(self, n_items: int = 200):
        self.n_items = n_items

    def _corpus(self, endpoint: str) -> list[dict]:
        import random

        rng = random.Random(0)
        if endpoint == "invoices":
            return [make_invoice(i, rng) for i in range(self.n_items)]
        if endpoint == "subscriptions":
            return [make_subscription(i) for i in range(self.n_items)]
        if endpoint == "subscription_updates":
            return [make_subscription_event(i) for i in range(self.n_items)]
        raise ValueError(f"unknown endpoint: {endpoint!r}")

    def latest_created(self, endpoint: str) -> int:
        """Exclusive upper bound of available data — the streaming
        reader's notion of 'now' (deterministic for the fake corpus).
        An EMPTY source reports 0, which parks the streaming pacer at
        its floor (latestOffset == initialOffset, empty batches) until
        data appears — instead of crashing latestOffset on max([])."""
        docs = self._corpus(endpoint)
        return max(d["created"] for d in docs) + 1 if docs else 0

    def earliest_created(self, endpoint: str) -> int:
        """Inclusive lower bound of available data; lets the streaming
        pacer skip the empty span below the first document instead of
        crawling from epoch 0 in max_batch_seconds steps. 0 when the
        source is empty (no span to skip)."""
        docs = self._corpus(endpoint)
        return min(d["created"] for d in docs) if docs else 0

    def list_page(
        self,
        endpoint: str,
        gte: int,
        lt: int,
        starting_after: str | None,
        limit: int,
        params: dict | None = None,
    ) -> list[dict]:
        docs = self._corpus(endpoint)
        params = params or {}
        status = params.get("status")
        if status and status != "all":
            docs = [d for d in docs if d.get("status") == status]
        type_pat = params.get("type")
        if type_pat:  # Stripe's trailing-glob event filter
            if type_pat.endswith("*"):
                prefix = type_pat[:-1]
                docs = [d for d in docs if d.get("type", "").startswith(prefix)]
            else:
                docs = [d for d in docs if d.get("type") == type_pat]
        docs = [d for d in docs if gte <= d["created"] < lt]
        docs.sort(key=lambda d: (d["created"], d["id"]))
        if starting_after is not None:
            ids = [d["id"] for d in docs]
            docs = docs[ids.index(starting_after) + 1 :]
        return docs[:limit]


def build_list_call(
    endpoint: str,
    gte: int,
    lt: int,
    starting_after: str | None,
    limit: int,
    params: dict | None = None,
) -> tuple[str, dict]:
    """Pure request builder for the live API: (SDK resource name,
    list kwargs). Factored out of the client so the reference's
    request contract (extract_stripe_data.py:11-36: fixed per-resource
    params, created[gte]/[lt] window, starting_after cursor, limit) is
    unit-testable without the SDK or network."""
    cfg = RESOURCE_CONFIGS.get(endpoint)
    if cfg is None:
        raise ValueError(f"unknown endpoint: {endpoint!r}")
    call = dict(cfg["params"], **(params or {}))
    call["limit"] = limit
    created: dict[str, int] = {"gte": gte}
    if lt < 2**62:
        created["lt"] = lt
    call["created"] = created
    if starting_after is not None:
        call["starting_after"] = starting_after
    return cfg["resource"], call


class _RealStripeClient:
    """Adapter over the stripe SDK, selected when ``api_key`` is set.

    Mirrors the reference's per-resource list params
    (extract_stripe_data.py:11-36) and exposes the same ``list_page``
    surface as the offline fake, so retry/pagination logic is shared.
    """

    def __init__(self, api_key: str):
        try:
            import stripe
        except ImportError as e:  # pragma: no cover — no SDK in container
            raise ImportError(
                "stripe SDK not installed; omit api_key to use the offline fake"
            ) from e
        stripe.api_key = api_key
        self._stripe = stripe

    def latest_created(self, endpoint: str) -> int:  # pragma: no cover
        """'Now' for a live API: events keep arriving, so the stream's
        upper bound is simply the current wall clock."""
        return int(time.time())

    def earliest_created(self, endpoint: str) -> int:  # pragma: no cover
        """The live API exposes no cheap 'first object' probe; the
        user's created_gte option (backfill start) is the floor."""
        return 0

    def list_page(
        self,
        endpoint: str,
        gte: int,
        lt: int,
        starting_after: str | None,
        limit: int,
        params: dict | None = None,
    ) -> list[dict]:  # pragma: no cover — needs network + SDK
        resource_name, call = build_list_call(
            endpoint, gte, lt, starting_after, limit, params
        )
        resource = getattr(self._stripe, resource_name)
        page = resource.list(**call)
        return [
            d.to_dict() if hasattr(d, "to_dict") else dict(d) for d in page.data
        ]


class StripeReader(DataSourceReader):
    def __init__(self, options: dict):
        self.endpoint = options.get("endpoint", "invoices")
        self.page_size = int(options.get("page_size", "100"))  # :16,24,32
        self.created_gte = int(options.get("created_gte", "0"))  # cursor floor
        self.created_lt = int(options.get("created_lt", str(2**62)))
        self.num_partitions = int(options.get("num_partitions", "8"))
        self.api_key = options.get("api_key")
        self.fake_items = int(options.get("fake_items", "200"))
        # Server-side list filters, mirroring the reference's params
        # (status=paid for invoices, type=customer.subscription.* for
        # events). Opt-in: option("status", ...) / option("event_type", ...).
        self.params: dict = {}
        if options.get("status"):
            self.params["status"] = options["status"]
        if options.get("event_type"):
            self.params["type"] = options["event_type"]

    def partitions(self) -> list[TimeWindowPartition]:
        lo, hi = self.created_gte, self.created_lt
        if hi >= 2**62:  # unbounded: single window (first-run full fetch)
            return [TimeWindowPartition(lo, hi)]
        step = max((hi - lo) // self.num_partitions, 1)
        bounds = list(range(lo, hi, step)) + [hi]
        return [
            TimeWindowPartition(bounds[i], bounds[i + 1])
            for i in range(len(bounds) - 1)
        ]

    def read(self, partition: TimeWindowPartition) -> Iterator[tuple]:
        client = (
            _RealStripeClient(self.api_key)
            if self.api_key
            else FakeStripeClient(self.fake_items)
        )
        starting_after = None
        while True:
            page = self._fetch_with_retry(client, partition, starting_after)
            if not page:
                return
            for doc in page:
                yield (doc["id"], int(doc["created"]), json.dumps(doc))
            if len(page) < self.page_size:
                return
            starting_after = page[-1]["id"]

    def _fetch_with_retry(self, client, partition, starting_after):
        """Exponential backoff 2^(n-1)s, ≤50 retries, anything else
        aborts the task — 'all data, or none'
        (extract_stripe_data.py:88-102)."""
        retry = 0
        while True:
            try:
                return client.list_page(
                    self.endpoint,
                    partition.gte,
                    partition.lt,
                    starting_after,
                    self.page_size,
                    params=self.params,
                )
            except Exception as e:  # noqa: BLE001
                is_rate_limit = type(e).__name__ == "RateLimitError"
                retry += 1
                if not is_rate_limit or retry > MAX_RETRIES:
                    raise
                time.sleep(2 ** (retry - 1))


class StripeStreamReader(DataSourceStreamReader):
    """Structured-Streaming flavor of S1 (VERDICT r5 #6): the offset is
    the ``created`` HIGH WATERMARK — exactly the incremental-cursor
    contract the batch pipeline uses (S2), lifted into the streaming
    engine. Each micro-batch covers ``[start.created, end.created)``
    and is TIME-WINDOW SHARDED across executors like the batch reader
    (same :class:`TimeWindowPartition`, same pagination/retry), so the
    parallel-ingest design carries over unchanged.

    Pacing: ``latestOffset`` advances by at most ``max_batch_seconds``
    per trigger (bounded micro-batches while draining a backlog —
    the maxFilesPerTrigger idea for an API source). The pacing state
    is in-memory best-effort, because the Python streaming API does
    not hand ``latestOffset`` the engine's current offset: after a
    driver restart the pacer re-walks from the data floor, one step
    per trigger, producing empty/no-op batches until it passes the
    checkpoint's committed offset (and possibly re-covering a
    committed window on the way). Correctness never depends on it —
    delivery is at-least-once by contract, downstream sinks key their
    MERGE on ``id`` (idempotent) and replayed epochs dedupe through
    the manifest txn ledger (exactly-once end-to-end). Trigger note:
    ``availableNow`` snapshots its target at the FIRST latestOffset
    call, so with pacing it drains exactly one window per run; to
    drain a whole backlog in one paced run use a processingTime
    trigger + ``processAllAvailable()`` (what the catalog check does).
    """

    def __init__(self, options: dict):
        self._r = StripeReader(options)
        self.max_batch_seconds = int(
            options.get("max_batch_seconds", str(7 * 86400))
        )
        self._last_end: int | None = None

    def _client(self):
        return (
            _RealStripeClient(self._r.api_key)
            if self._r.api_key
            else FakeStripeClient(self._r.fake_items)
        )

    def initialOffset(self) -> dict:
        return {"created": self._r.created_gte}

    def latestOffset(self) -> dict:
        client = self._client()
        latest = min(
            client.latest_created(self._r.endpoint), self._r.created_lt
        )
        floor = (
            self._r.created_gte if self._last_end is None else self._last_end
        )
        # skip the empty span below the first available document so the
        # pacer doesn't crawl from epoch 0 in max_batch_seconds steps
        floor = max(floor, client.earliest_created(self._r.endpoint))
        end = max(floor, min(latest, floor + self.max_batch_seconds))
        self._last_end = end
        return {"created": end}

    def partitions(self, start: dict, end: dict) -> list[TimeWindowPartition]:
        lo, hi = int(start["created"]), int(end["created"])
        if hi <= lo:
            return [TimeWindowPartition(lo, lo)]  # empty batch
        step = max((hi - lo) // self._r.num_partitions, 1)
        bounds = list(range(lo, hi, step)) + [hi]
        return [
            TimeWindowPartition(bounds[i], bounds[i + 1])
            for i in range(len(bounds) - 1)
        ]

    def read(self, partition: TimeWindowPartition) -> Iterator[tuple]:
        return self._r.read(partition)

    def commit(self, end: dict) -> None:
        # Offsets live in the engine's checkpoint; nothing to persist
        # source-side (the API is the source of truth for re-reads).
        pass


class StripeDataSource(DataSource):
    """spark.read.format("stripe").option("endpoint", "invoices")...
    — and ``spark.readStream.format("stripe")`` for the streaming
    flavor (created-HWM offsets, same sharding).

    Yields (id, created, payload-JSON); parse ``payload`` with
    ``from_json(payload, INVOICE_SCHEMA)`` downstream — the staging
    layer stays schema-on-read, as the reference's external tables do.
    """

    @classmethod
    def name(cls) -> str:
        return "stripe"

    def schema(self) -> T.StructType:
        return RAW_SCHEMA

    def reader(self, schema: T.StructType) -> StripeReader:
        return StripeReader(self.options)

    def streamReader(self, schema: T.StructType) -> StripeStreamReader:
        return StripeStreamReader(self.options)
