"""The deterministic 10x replication behind the bench's sf1 gate:
full build, incremental completion past a stale marker (a table added
to _SHIFT_COLS after a cached build must not yield a partial dir),
and key-shift correctness."""

from __future__ import annotations

import os

from stripe_data_pipeline_spark import sf_scale


def test_build_is_complete_and_incremental(spark, sf_dir, tmp_path):
    out = str(tmp_path / "scaled")
    got = sf_scale.ensure_scaled_dir(
        spark, base_dir=sf_dir, out_dir=out, copies=2
    )
    assert got == out
    for t in sf_scale._SHIFT_COLS:
        assert os.path.isdir(os.path.join(out, f"{t}.parquet")), t
    # replication factor holds for a shifted table, 1x for dimensions
    base_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert spark.read.parquet(f"{out}/orders.parquet").count() == 2 * base_orders
    base_nation = spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    assert spark.read.parquet(f"{out}/nation.parquet").count() == base_nation
    # stale-marker recovery: drop one table, keep the marker -> only
    # the missing table rebuilds
    import shutil

    mtime = os.path.getmtime(os.path.join(out, "orders.parquet"))
    shutil.rmtree(os.path.join(out, "events.parquet"))
    sf_scale.ensure_scaled_dir(spark, base_dir=sf_dir, out_dir=out, copies=2)
    assert os.path.isdir(os.path.join(out, "events.parquet"))
    assert os.path.getmtime(os.path.join(out, "orders.parquet")) == mtime
    # fully cached: a third call touches nothing
    m2 = os.path.getmtime(os.path.join(out, "events.parquet"))
    sf_scale.ensure_scaled_dir(spark, base_dir=sf_dir, out_dir=out, copies=2)
    assert os.path.getmtime(os.path.join(out, "events.parquet")) == m2


def test_copies_keep_referential_fanin(spark, sf_dir, tmp_path):
    """Every replicated order still matches exactly one customer —
    the key shift is consistent across tables, so joins keep their
    fan-in instead of going 10x-to-1."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "scaled2")
    sf_scale.ensure_scaled_dir(spark, base_dir=sf_dir, out_dir=out, copies=2)
    o = spark.read.parquet(f"{out}/orders.parquet")
    c = spark.read.parquet(f"{out}/customer.parquet")
    matched = o.join(c, o.o_custkey == c.c_custkey).count()
    assert matched == o.count()  # every order matches (exactly) one customer
