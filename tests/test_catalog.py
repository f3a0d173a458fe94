"""Catalog integrity + a fast oracle-parity spot check.

The full oracle sweep lives in tools/check_oracle.py (run at sf0.001
and sf0.01); here we gate a representative fast subset so plain
`pytest` catches parity regressions quickly.
"""

from __future__ import annotations

import pytest

from stripe_data_pipeline_spark.catalog import QUERIES
from stripe_data_pipeline_spark.testing import check_query, duck_con

FAST_SUBSET = [
    "curated_line_items",
    "calendar_dim",
    "deferred_total_asof",
    "orders_rename_cast",
    "dim_chain_join",
    "pricing_summary",
    "latest_event_per_user",
    "doc_text_stats",
    "dedup_exact_summary",
    "cosine_topk_bruteforce",
    "asof_join_events_orders",
    "dedup_clusters",
    "price_percentiles",
    "sessionized_events",
]


def test_registry_shape():
    assert len(QUERIES) >= 40
    n_oracled = sum(1 for s in QUERIES.values() if s.oracle is not None)
    assert n_oracled >= 35
    for name, spec in QUERIES.items():
        assert callable(spec.fn), name


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_con(sf_dir)


@pytest.mark.parametrize("name", FAST_SUBSET)
def test_oracle_parity(spark, con, sf_dir, name):
    errs = check_query(spark, con, QUERIES[name], sf_dir)
    assert not errs, errs


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) == len(QUERIES)
