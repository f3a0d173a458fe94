"""SCD Type 2 contract tests: version history, closing semantics,
idempotent re-delivery, null-safe change detection."""

from __future__ import annotations

from stripe_data_pipeline_spark import manifest_table as MT
from stripe_data_pipeline_spark.operators.scd import scd2_apply


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, seg string, ts long")


def _hist(spark, root):
    return sorted(
        (
            (r["k"], r["seg"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in MT.read_table(spark, root).collect()
        ),
        key=repr,
    )


def test_scd2_versions_close_and_open(spark, tmp_path):
    root = str(tmp_path / "scd")
    assert scd2_apply(spark, root, _batch(spark, [(1, "low", 10), (2, "mid", 10)]), ["k"], "ts") == 2
    # k=1 changes, k=2 unchanged, k=3 appears
    assert scd2_apply(
        spark, root, _batch(spark, [(1, "high", 20), (2, "mid", 20), (3, "low", 20)]),
        ["k"], "ts",
    ) == 2
    assert set(_hist(spark, root)) == {
        (1, "low", 10, 20, False),
        (1, "high", 20, None, True),
        (2, "mid", 10, None, True),
        (3, "low", 20, None, True),
    }
    # re-delivery of the same batch is a no-op
    assert scd2_apply(
        spark, root, _batch(spark, [(1, "high", 20), (2, "mid", 20), (3, "low", 20)]),
        ["k"], "ts",
    ) == 0
    # third change reopens k=1 again; history now has three versions
    assert scd2_apply(spark, root, _batch(spark, [(1, "mid", 30)]), ["k"], "ts") == 1
    hist = _hist(spark, root)
    k1 = {h for h in hist if h[0] == 1}
    assert k1 == {(1, "high", 20, 30, False), (1, "low", 10, 20, False), (1, "mid", 30, None, True)}
    # exactly one current row per key
    cur = [h for h in hist if h[4]]
    assert sorted(h[0] for h in cur) == [1, 2, 3]


def test_scd2_null_safe_change_detection(spark, tmp_path):
    root = str(tmp_path / "scdn")
    rows1 = spark.createDataFrame([(1, None, 10)], "k long, seg string, ts long")
    scd2_apply(spark, root, rows1, ["k"], "ts")
    # NULL -> NULL is NOT a change
    assert scd2_apply(spark, root, rows1.selectExpr("k", "seg", "ts + 5 AS ts"), ["k"], "ts") == 0
    # NULL -> value IS a change
    rows2 = spark.createDataFrame([(1, "x", 20)], "k long, seg string, ts long")
    assert scd2_apply(spark, root, rows2, ["k"], "ts") == 1
    hist = _hist(spark, root)
    assert (1, None, 10, 20, False) in hist and (1, "x", 20, None, True) in hist


def test_scd2_partitioned_rewrites_only_touched(spark, tmp_path):
    # partition_by (ADVICE r4): a key-derived bucket partitions the
    # state table so a batch touching one bucket leaves the other
    # bucket's versioned dir byte-identical (same relpath)
    root = str(tmp_path / "scdp")

    def b(rows):
        return spark.createDataFrame(rows, "k long, bucket long, seg string, ts long")

    assert (
        scd2_apply(
            spark, root, b([(1, 0, "low", 10), (2, 1, "mid", 10)]),
            ["k"], "ts", partition_by="bucket",
        )
        == 2
    )
    parts_v1 = MT.read_manifest(root)["parts"]
    assert set(parts_v1) == {"0", "1"}
    # change only k=1 (bucket 0): bucket 1's dir must be untouched
    assert (
        scd2_apply(
            spark, root, b([(1, 0, "high", 20)]),
            ["k"], "ts", partition_by="bucket",
        )
        == 1
    )
    parts_v2 = MT.read_manifest(root)["parts"]
    assert parts_v2["1"] == parts_v1["1"]  # untouched partition carried
    assert parts_v2["0"] != parts_v1["0"]  # touched partition re-pointed
    hist = {
        (r["k"], r["seg"], r["is_current"])
        for r in MT.read_table(spark, root).collect()
    }
    assert hist == {(1, "low", False), (1, "high", True), (2, "mid", True)}
