"""r14 optimization-round parity pins.

Each optimization that changed an operator's INTERNALS (not its
results) gets a direct equivalence check against the slower reference
path it replaced, so a future edit cannot silently drift the
arithmetic:

- train_pq's fused assign+partial-sum Lloyd update vs the two-step
  _assign_codes + _update_codebooks reference;
- maxsim_topk's vectorized Arrow cosine pass vs the original
  interpreted expression folds.

(semdedup's numpy domination pass is pinned by the existing hand case
in tests/test_round9_ops.py plus the full oracle replay; the
wordpiece MaxMatch rewrite is pinned behaviorally in
tests/test_wordpiece.py; the suffix-loop rewrite is pinned by the
hypothesis parity suite in tests/test_suffix.py.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _emb_df(spark, n=40, d=16, seed=7):
    import random

    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1.0, 1.0) for _ in range(d)], i % 3)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_train_pq_partial_sums_match_two_step_reference(spark):
    from stripe_data_pipeline_spark.operators.pq import (
        _assign_codes,
        _update_codebooks,
        train_pq,
    )

    emb = _emb_df(spark)
    # reference: seeds + ONE two-step update (the pre-r14 loop body)
    ks, m, iters = 8, 4, 2
    seeds = (
        emb.filter(F.col("vec_id") < ks)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .collect()
    )
    by_id = {r["vec_id"]: [float(x) for x in r["e"]] for r in seeds}
    d = len(seeds[0]["e"])
    dsub = d // m
    ref_books = [
        [by_id[k][j * dsub : (j + 1) * dsub] for k in range(ks)]
        for j in range(m)
    ]
    for _ in range(iters - 1):
        assigned = _assign_codes(emb, ref_books)
        ref_books = _update_codebooks(assigned, ref_books)

    got_books = train_pq(emb, m=m, ks=ks, iters=iters)
    assert got_books == ref_books  # bit-exact floats, not approx


def test_fused_residual_training_and_encode_match_zipwith_reference(spark):
    """r14 optimization pin: ivfpq's residual subtraction is fused
    into the Arrow passes (numpy x - c(label)) instead of the
    interpreted zip_with projection (residual_embeddings). Books from
    train_pq(raw, cents=...) and codes from _assign_codes(raw,
    cents=...) must be BIT-identical to running both over the
    zip_with-projected residual relation."""
    from stripe_data_pipeline_spark.operators.pq import (
        _assign_codes,
        residual_embeddings,
        train_pq,
    )
    from stripe_data_pipeline_spark.operators.similarity import centroids

    emb = _emb_df(spark)
    cent_rows = centroids(emb).collect()
    by_label: dict[int, dict[int, float]] = {}
    for r in cent_rows:
        by_label.setdefault(int(r["label"]), {})[int(r["pos"])] = float(
            r["c"]
        )
    cent_map = {
        label: [comp[i] for i in range(len(comp))]
        for label, comp in by_label.items()
    }

    res = residual_embeddings(emb, cent_rows)
    ref_books = train_pq(res, m=4, ks=8, iters=2)
    got_books = train_pq(emb, m=4, ks=8, iters=2, cents=cent_map)
    assert got_books == ref_books  # bit-exact floats

    ref_codes = {
        r["vec_id"]: (list(r["codes"]), list(r["dists_fp"]))
        for r in _assign_codes(res, ref_books, keep=("label",)).collect()
    }
    got_codes = {
        r["vec_id"]: (list(r["codes"]), list(r["dists_fp"]))
        for r in _assign_codes(
            emb, got_books, keep=("label",), cents=cent_map
        ).collect()
    }
    assert got_codes == ref_codes


def test_maxsim_matches_expression_reference(spark):
    from stripe_data_pipeline_spark.operators.similarity import (
        _as_double,
        _dot,
        _lit_vec,
        _norm,
        maxsim_topk,
    )

    emb = _emb_df(spark, n=30, d=8, seed=13)
    qvecs = [
        [float(v) for v in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 3).orderBy("vec_id").collect()
    ]

    # reference: the pre-r14 interpreted fold per query vector
    e = _as_double(F.col("embedding"))
    cols = []
    for j, qv in enumerate(qvecs):
        q = _lit_vec(qv)
        cos = _dot(e, q) / (_norm(e) * _norm(q))
        cols.append(
            F.floor(cos * F.lit(1e9) + F.lit(0.5))
            .cast("bigint")
            .alias(f"c{j}")
        )
    ref_scored = emb.select(F.col("label").alias("g"), *cols)
    ref = (
        ref_scored.groupBy("g")
        .agg(*[F.max(f"c{j}").alias(f"m{j}") for j in range(len(qvecs))])
        .select(
            "g",
            sum(
                [F.col(f"m{j}") for j in range(1, len(qvecs))],
                F.col("m0"),
            ).cast("bigint").alias("maxsim_fp"),
        )
    )
    ref_rows = {
        r["g"]: r["maxsim_fp"]
        for r in ref.collect()
    }
    got = {
        r["label"]: r["maxsim_fp"]
        for r in maxsim_topk(emb, qvecs, k=10).collect()
    }
    assert got == {
        g: v
        for g, v in sorted(
            ref_rows.items(), key=lambda t: (-t[1], t[0])
        )[:10]
    }


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
