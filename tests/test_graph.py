"""Graph-operator invariants (operators/graph.py) — moved out of
tests/test_winnow.py per ADVICE r10 (the winnow module's docstring
scopes it to fingerprinting; graph coverage lives here alongside the
operator it pins)."""

from __future__ import annotations


def test_label_propagation_two_cliques(spark):
    """Two 3-cliques joined by one bridge edge: after 4 synchronous
    rounds each clique is internally uniform and the two communities
    stay SEPARATE. Hand-traced: clique A converges to label 1; clique
    B converges to label 3 — the bridge leaks node 3's id across as a
    label NAME in round 1, but the membership partition is exactly
    the two cliques, which is the invariant that matters."""
    from stripe_data_pipeline_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (10, 20), (10, 30), (20, 30), (3, 10)],
        "src long, dst long",
    )
    labels = {
        r["node"]: r["label"]
        for r in label_propagation(edges, iterations=4).collect()
    }
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[10] == labels[20] == labels[30] == 3


def test_recursive_cte_matches_iterative_components(spark):
    """VERDICT r11 #3, the third leg: the WITH RECURSIVE transitive
    closure (one SQL text, run by Spark's UnionLoop and verbatim by
    the DuckDB oracle) must bit-match the ITERATIVE min-label
    propagation in operators/cluster.py on the same doubling-forest
    edge list."""
    from stripe_data_pipeline_spark.catalog.text_queries import (
        RECURSIVE_CC_SQL,
    )
    from stripe_data_pipeline_spark.operators.cluster import (
        connected_components,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("documents")
    rec = {
        (r["doc_id"], r["cluster_id"])
        for r in spark.sql(RECURSIVE_CC_SQL).collect()
    }
    edges = docs.selectExpr(
        "doc_id AS doc_a", "CAST(doc_id / 2 AS BIGINT) AS doc_b"
    ).where("doc_id % 2 = 0 AND doc_id > 0")
    it = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(
            docs.select("doc_id"), edges
        ).collect()
    }
    assert rec == it and len(rec) == docs.count()
