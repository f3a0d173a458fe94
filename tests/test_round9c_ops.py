"""Round-9 fifth-batch operator invariants.

- triangle_counts: hand-checkable micro-graphs (a triangle + pendant,
  K4), exactly-once enumeration, clustering-coefficient arithmetic;
- kmv_sketch/kmv_estimate: below-k exactness, k-bounded state,
  estimator formula on a planted hash set;
- maxsim_topk: hand-computed MaxSim on orthogonal unit vectors, the
  self-label dominance property.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stripe_data_pipeline_spark.operators.graph import triangle_counts
from stripe_data_pipeline_spark.operators.sketch import (
    KMV_DOMAIN,
    kmv_estimate,
    kmv_sketch,
)
from stripe_data_pipeline_spark.operators.similarity import maxsim_topk


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangle_counts_triangle_plus_pendant(spark):
    # 1-2-3 triangle, 4 pendant off 3.
    out = {
        r["node"]: r
        for r in triangle_counts(
            _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
        ).collect()
    }
    assert out[1]["triangles"] == 1 and out[1]["degree"] == 2
    assert out[2]["triangles"] == 1 and out[2]["degree"] == 2
    assert out[3]["triangles"] == 1 and out[3]["degree"] == 3
    assert out[4]["triangles"] == 0 and out[4]["degree"] == 1
    # cc(1) = 2*1/ (2*1) = 1 -> 10000bp; cc(3) = 2*1/(3*2) -> 3333bp
    assert out[1]["clustering_bp"] == 10000
    assert out[3]["clustering_bp"] == 3333
    assert out[4]["clustering_bp"] == 0


def test_triangle_counts_k4(spark):
    # K4: C(4,3)=4 triangles, each node in 3 of them, cc = 1.
    pairs = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    out = triangle_counts(_edges(spark, pairs)).collect()
    assert all(r["triangles"] == 3 for r in out)
    assert all(r["degree"] == 3 for r in out)
    assert all(r["clustering_bp"] == 10000 for r in out)


def test_kmv_below_k_is_exact(spark):
    df = spark.createDataFrame(
        [("g1", f"v{i}") for i in range(10)] * 3, "g string, v string"
    )
    est = kmv_estimate(kmv_sketch(df, "v", "g", k=64), k=64).collect()
    assert est == [("g1", 10, 10)] or (
        est[0]["n_kept"] == 10 and est[0]["est"] == 10
    )


def test_kmv_state_bounded_and_estimator_formula(spark):
    df = spark.createDataFrame(
        [("g1", f"value-{i}") for i in range(500)], "g string, v string"
    )
    sk = kmv_sketch(df, "v", "g", k=16)
    rows = sk.collect()
    assert len(rows) == 16
    hk = max(r["h"] for r in rows)
    est = kmv_estimate(sk, k=16).collect()[0]
    assert est["est"] == 15 * KMV_DOMAIN // hk
    # 500 distinct values, k=16: the estimate should land within a
    # loose multiplicative band (KMV std err ~ 1/sqrt(k-2) ~ 27%).
    assert 150 <= est["est"] <= 1500


def test_maxsim_orthogonal_hand_case(spark):
    # label 10 holds e1 and e2; label 20 holds e2 only; query = [e1, e2].
    rows = [
        (100, [1.0, 0.0, 0.0], 10),
        (101, [0.0, 1.0, 0.0], 10),
        (200, [0.0, 1.0, 0.0], 20),
        (201, [0.0, 0.0, 1.0], 20),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = maxsim_topk(
        df, [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], k=2
    ).collect()
    scores = {r["label"]: r["maxsim_fp"] for r in out}
    # label 10 matches both query vectors exactly: 2 * 1e9.
    # label 20 matches only the second: 1e9 + 0 (e3 orthogonal).
    assert scores[10] == 2_000_000_000
    assert scores[20] == 1_000_000_000
    assert out[0]["label"] == 10
