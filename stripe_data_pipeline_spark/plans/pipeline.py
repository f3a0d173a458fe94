"""End-to-end pipeline runner: raw NDJSON -> staging -> curated ->
marts (the Spark analogue of the reference's two DAGs, SURVEY.md §3.2).

Topology (stripe_update_dag.py:7-42 is a linear Bash-dbt chain; ours
is plain topological Python over model functions):

    raw invoices.json ──> stg_invoices ──> invoices
                                      └──> invoice_line_items ──┐
    exchange_rates (literal dim) ───────────────────────────────┤
                                                                ├──> deferred/recognized facts
    calendar (generated dim) ───────────────────────────────────┘

Every layer lands via the idempotent merge sink (incremental.py), so
re-running the pipeline over the same drop is a no-op — the
reference's core guarantee (README.md:93-129).

Determinism: ``as_of`` and ``loaded_at`` are explicit parameters
everywhere the reference calls CURRENT_DATE/CURRENT_TIMESTAMP
(SURVEY.md §7 risk list).
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stripe_data_pipeline_spark.incremental import merge_upsert
from stripe_data_pipeline_spark.models.exchange_rates import exchange_rates
from stripe_data_pipeline_spark.models.invoice_line_items import (
    curated_invoice_line_items,
)
from stripe_data_pipeline_spark.models.invoices import curated_invoices
from stripe_data_pipeline_spark.models.revenue import (
    daily_revenue_facts,
    recognized_daily_facts_halfopen,
    with_usd_amounts,
)
from stripe_data_pipeline_spark.models.staging import stage
from stripe_data_pipeline_spark.models.subscription_states import (
    curated_subscription_states,
)
from stripe_data_pipeline_spark.sources.stripe_schema import (
    EVENT_SCHEMA,
    INVOICE_SCHEMA,
    SUBSCRIPTION_SCHEMA,
)


class QualityGateError(RuntimeError):
    """A quality gate found violations (the engine-side analogue of a
    failing dbt test, e.g. missing_period_end_threshold.sql)."""


class PipelineError(RuntimeError):
    """A pipeline layer failed; ``layer`` names it, ``__cause__`` is
    the original error."""

    def __init__(self, layer: str, cause: BaseException):
        super().__init__(f"pipeline layer {layer!r} failed: {cause}")
        self.layer = layer


class PipelineMonitor:
    """Run report + failure alerting — the engine-side counterpart of
    the reference's Airflow ``on_failure_callback`` stub
    (/root/reference/airflow/dags/composer_utils/utils.py:4-8, wired at
    stripe_update_dag.py via default_args; README.md:170-171 — the
    reference's own callback is a print placeholder, so this is parity
    completion plus the structured run report it implies).

    - ``on_failure(layer_name, error, report)`` fires BEFORE the error
      re-raises, for any layer exception or failing quality gate.
    - ``quality_gates=True`` evaluates the reference's implemented
      gate (>3% missing period_end, missing_period_end_threshold.sql)
      inside the run; a violation aborts the chain like a failing dbt
      test aborts ``dbt run``'s downstream models.
    - ``collect_counts=True`` records each layer's materialized row
      count (extra metadata-cheap count jobs; off by default so the
      report never adds table-sized work at scale).
    - ``report()`` returns the structured run report: per-layer
      status/seconds(/rows), gate verdicts, overall status.
    """

    def __init__(
        self,
        on_failure=None,
        quality_gates: bool = False,
        collect_counts: bool = False,
    ):
        self.on_failure = on_failure
        self.quality_gates = quality_gates
        self.collect_counts = collect_counts
        self.layers: list[dict] = []
        self.gates: list[dict] = []
        self._failed: str | None = None

    import contextlib as _ctx

    @_ctx.contextmanager
    def layer(self, name: str, table=None):
        import time

        t0 = time.time()
        try:
            yield
        except BaseException as e:  # noqa: BLE001 — report, then re-raise
            self.layers.append(
                {
                    "layer": name,
                    "status": "failed",
                    "seconds": round(time.time() - t0, 3),
                    "error": str(e),
                }
            )
            self._failed = name
            if self.on_failure is not None:
                self.on_failure(name, e, self.report())
            raise PipelineError(name, e) from e
        entry = {
            "layer": name,
            "status": "ok",
            "seconds": round(time.time() - t0, 3),
        }
        if self.collect_counts and table is not None:
            entry["rows"] = table().count()
        self.layers.append(entry)

    def gate(self, name: str, layer: str, violations: DataFrame) -> None:
        """Evaluate a quality gate (violations relation; empty == pass)
        and abort the run on failure, reporting the OWNING LAYER."""
        n = violations.count()
        self.gates.append({"gate": name, "layer": layer, "violations": n})
        if n:
            err = QualityGateError(f"{name}: {n} violation row(s)")
            self._failed = layer
            if self.on_failure is not None:
                self.on_failure(layer, err, self.report())
            raise err

    def report(self) -> dict:
        return {
            "status": "failed" if self._failed else "ok",
            "failed_layer": self._failed,
            "layers": list(self.layers),
            "quality_gates": list(self.gates),
        }


def run_pipeline(
    spark: SparkSession,
    raw_dir: str,
    warehouse_dir: str,
    loaded_at: dt.datetime | None = None,
    monitor: PipelineMonitor | None = None,
    atomic: bool = False,
) -> dict[str, DataFrame]:
    """One scheduled run (the '30 1 * * *' tick): drain the raw drop
    through every layer; returns the materialized tables. Pass a
    ``PipelineMonitor`` for per-layer run reporting, quality gates and
    failure callbacks (see its docstring); without one the run is
    unmonitored, as before. ``atomic=True`` lands every layer on the
    crash-atomic manifest sink instead of plain parquet — the whole
    reference DAG gains per-layer snapshot isolation, time travel and
    the commit audit log, with identical table contents (pytest-
    asserted equal to the plain run)."""
    loaded_at = loaded_at or dt.datetime(2024, 6, 1)
    mon = monitor or PipelineMonitor()
    w = lambda name: os.path.join(warehouse_dir, name)  # noqa: E731

    if atomic:
        from stripe_data_pipeline_spark import manifest_table as MT

        def sink(path, df, keys, partition_by=None):
            MT.merge_upsert_atomic(
                spark, path, df, keys=keys, partition_by=partition_by
            )

        def read(path):
            return MT.read_table(spark, path)

    else:

        def sink(path, df, keys, partition_by=None):
            merge_upsert(spark, path, df, keys=keys, partition_by=partition_by)

        def read(path):
            return spark.read.parquet(path)

    # --- staging (P1 + S6 merge on id, partitioned by created_at_date)
    with mon.layer("stg_invoices", lambda: read(w("stg_invoices"))):
        raw_inv = spark.read.schema(INVOICE_SCHEMA).json(
            os.path.join(raw_dir, "invoices.json")
        )
        sink(w("stg_invoices"), stage(raw_inv).dropDuplicates(["id"]), keys=["id"], partition_by="created_at_date")
    with mon.layer(
        "stg_subscriptions", lambda: read(w("stg_subscriptions"))
    ):
        raw_sub = spark.read.schema(SUBSCRIPTION_SCHEMA).json(
            os.path.join(raw_dir, "subscriptions.json")
        )
        sink(w("stg_subscriptions"), stage(raw_sub).dropDuplicates(["id"]), keys=["id"])
    with mon.layer(
        "stg_subscription_updates",
        lambda: read(w("stg_subscription_updates")),
    ):
        raw_upd = spark.read.schema(EVENT_SCHEMA).json(
            os.path.join(raw_dir, "subscription_updates.json")
        )
        sink(w("stg_subscription_updates"), stage(raw_upd).dropDuplicates(["id"]), keys=["id"])

    # --- curated
    stg_inv = read(w("stg_invoices"))
    with mon.layer("invoices", lambda: read(w("invoices"))):
        invoices = curated_invoices(stg_inv, loaded_at)
        sink(w("invoices"), invoices, keys=["invoice_id"], partition_by="created_at_date")
    with mon.layer(
        "invoice_line_items", lambda: read(w("invoice_line_items"))
    ):
        line_items = curated_invoice_line_items(stg_inv, loaded_at)
        sink(w("invoice_line_items"), line_items, keys=["line_item_id"], partition_by="invoice_created_date")
    if mon.quality_gates:
        # the reference's implemented dbt test, run in-line so a
        # violation stops downstream marts like a failing `dbt test`
        from stripe_data_pipeline_spark.models.quality import (
            check_missing_period_end,
        )

        mon.gate(
            "missing_period_end_threshold",
            "invoice_line_items",
            check_missing_period_end(read(w("invoice_line_items"))),
        )

    # --- curated: subscription changelog compaction (the completion of
    # stg_subscription_updates — no downstream ref() in the reference)
    with mon.layer(
        "subscription_states", lambda: read(w("subscription_states"))
    ):
        sub_states = curated_subscription_states(
            read(w("stg_subscription_updates")), loaded_at
        )
        sink(w("subscription_states"), sub_states, keys=["subscription_id"])

    # --- marts: deferred/recognized daily facts
    li = read(w("invoice_line_items"))
    usd = with_usd_amounts(li, exchange_rates(spark))
    facts = daily_revenue_facts(usd, domain_start_col="invoice_created_date").withColumn(
        "_loaded_at", F.lit(loaded_at)
    )
    out_cols = [
        "line_item_id",
        "invoice_id",
        "customer_id",
        "subscription_id",
        "as_of_date",
        "currency",
        "amount_without_tax",
        "amount_without_tax_usd",
        "period_start_date",
        "period_end_date_inferred",
        "service_period_days",
        "daily_revenue_usd",
        "deferred_revenue_usd",
        "recognized_revenue_usd",
        "invoice_created_date",
        "_loaded_at",
    ]
    with mon.layer(
        "deferred_revenue", lambda: read(w("deferred_revenue"))
    ):
        sink(
            w("deferred_revenue"),
            facts.select(*out_cols),
            keys=["line_item_id", "as_of_date"],  # deferred_revenue.sql:3
            partition_by="as_of_date",
        )

    # --- marts: recognized_revenue (recognized_revenue.sql:1-105) —
    # half-open day domain [period_start, period_end), one row per
    # (line_item, recognition day), merge on [line_item_id,
    # recognition_date] (:2-4), partitioned by recognition_date (:5).
    recognized = recognized_daily_facts_halfopen(usd).withColumn(
        "_loaded_at", F.lit(loaded_at)
    )
    rec_cols = [
        "line_item_id",
        "invoice_id",
        "customer_id",
        "subscription_id",
        "recognition_date",
        "currency",
        "amount_without_tax",
        "amount_without_tax_usd",
        "period_start_date",
        "period_end_date_inferred",
        "service_period_days",
        "daily_revenue_usd",
        "recognized_revenue_usd",
        "invoice_created_date",
        "_loaded_at",
    ]
    with mon.layer(
        "recognized_revenue", lambda: read(w("recognized_revenue"))
    ):
        sink(
            w("recognized_revenue"),
            recognized.select(*rec_cols),
            keys=["line_item_id", "recognition_date"],
            partition_by="recognition_date",
        )

    return {
        name: read(w(name))
        for name in (
            "stg_invoices",
            "stg_subscriptions",
            "stg_subscription_updates",
            "invoices",
            "invoice_line_items",
            "subscription_states",
            "deferred_revenue",
            "recognized_revenue",
        )
    }
