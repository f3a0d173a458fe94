"""Python UDTF (Spark 4 @udtf) — the LATERAL table-function member of
the §2.11 Python-extension story. Pins (a) exact parity with the JVM
explode(sequence) chunker and (b) the Arrow-batched plan shape."""

from __future__ import annotations


def test_udtf_chunks_match_jvm_chunker_exactly(spark, sf_dir):
    from stripe_data_pipeline_spark.catalog import QUERIES
    from stripe_data_pipeline_spark.io import read_table
    from stripe_data_pipeline_spark.operators.corpus import chunk_documents

    udtf_df = QUERIES["udtf_doc_chunks"].fn(spark, sf_dir)
    jvm_df = chunk_documents(
        read_table(spark, sf_dir, "documents"), size=32, stride=24
    ).select("doc_id", "chunk_id", "chunk_text", "chunk_tokens")
    assert udtf_df.exceptAll(jvm_df).count() == 0
    assert jvm_df.exceptAll(udtf_df).count() == 0


def test_udtf_stage_is_arrow_batched(spark, sf_dir):
    from stripe_data_pipeline_spark.catalog import QUERIES

    plan = (
        QUERIES["udtf_doc_chunks"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PythonUDTF" in plan
    # Arrow-batched exchange, not row-pickled BatchEval
    assert "ArrowEvalPythonUDTF" in plan, plan[:2000]


def test_udtf_edge_rows(spark):
    """Empty / NULL / whitespace-only texts yield no chunks; a short
    doc yields one short chunk."""
    from stripe_data_pipeline_spark.operators.udtfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, None), (4, "   "), (5, " x  y ")],
        "doc_id long, text string",
    ).createOrReplaceTempView("__udtf_edge")
    rows = spark.sql(
        "SELECT d.doc_id, u.* FROM __udtf_edge d, "
        "LATERAL chunk_spans(d.text) u"
    ).collect()
    got = {(r["doc_id"], r["chunk_id"], r["chunk_text"], r["chunk_tokens"])
           for r in rows}
    assert got == {(1, 0, "a b c", 3), (5, 0, "x y", 2)}
