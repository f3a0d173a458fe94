"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``stripe_data_pipeline_spark``; this module
only adapts the catalog registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from stripe_data_pipeline_spark.catalog import QUERIES  # noqa: E402

# Runtime-settable confs the engine depends on, applied defensively in
# case the driver's session was built without them:
# - UTC: all epoch<->date math assumes it (SURVEY.md §7 determinism).
# - nanosAsLong: the testdata events table is parquet TIMESTAMP(NANOS),
#   which Spark's reader rejects natively; io.read_table converts the
#   resulting longs to microsecond timestamps.
_REQUIRED_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def _apply_conf(spark: SparkSession) -> None:
    for k, v in _REQUIRED_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # noqa: BLE001 — never fail the harness on a conf
            pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §2.9 daily revenue recognition) on sf0.001."""
    _apply_conf(spark)
    fn = QUERIES["revenue_trend_daily"].fn
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _apply_conf(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(spec.fn) for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible ops)."""
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
