"""Connected-components dedup clustering on known graphs."""

from __future__ import annotations

from stripe_data_pipeline_spark.operators.cluster import connected_components


def _run(spark, node_ids, edge_pairs):
    nodes = spark.createDataFrame([(n,) for n in node_ids], "doc_id long")
    edges = spark.createDataFrame(
        edge_pairs or [(None, None)], "doc_a long, doc_b long"
    )
    if not edge_pairs:
        edges = edges.filter("doc_a IS NOT NULL")
    out = connected_components(nodes, edges)
    return {r["doc_id"]: r["cluster_id"] for r in out.collect()}


def test_chain_transitivity(spark):
    # 1-2, 2-3, 3-4: one cluster rooted at 1, even though 1~4 never scored
    got = _run(spark, [1, 2, 3, 4, 9], [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 9: 9}


def test_two_components_and_singletons(spark):
    got = _run(spark, [1, 2, 3, 10, 11, 42], [(2, 3), (10, 11), (1, 2)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 42: 42}


def test_no_edges_all_singletons(spark):
    got = _run(spark, [5, 6], [])
    assert got == {5: 5, 6: 6}


def test_spaced_convergence_checks_same_labels(spark):
    """check_every>1 (fewer driver convergence jobs at scale) must not
    change the fixpoint: extra propagation rounds are no-ops."""
    nodes = spark.createDataFrame(
        [(n,) for n in [1, 2, 3, 4, 5, 6, 7]], "doc_id long"
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (6, 7)], "doc_a long, doc_b long"
    )
    a = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(nodes, edges).collect()
    }
    b = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(nodes, edges, check_every=3).collect()
    }
    assert a == b == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 6, 7: 6}


def test_semantic_dedup_keepers_one_keeper_per_cluster(spark, sf_dir):
    from stripe_data_pipeline_spark.catalog import QUERIES

    out = QUERIES["semantic_dedup_keepers"].fn(spark, sf_dir).cache()
    rows = out.collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        keepers = [m for m in members if m["is_keeper"]]
        assert len(keepers) == 1
        assert keepers[0]["vec_id"] == cid == min(m["vec_id"] for m in members)
    # total coverage: every vector got a decision
    from stripe_data_pipeline_spark.io import read_table

    assert len(rows) == read_table(spark, sf_dir, "embeddings").count()
    out.unpersist()
