"""Python user-defined TABLE functions (Spark 4 ``@udtf`` — the
Python-extension API SURVEY.md §2.11 adds to the UDF story).

A UDTF is the Python analogue of a LATERAL generator: per input row
it yields zero-or-more output rows with a declared schema, and Spark
plans it as a table function in the FROM clause (``SELECT ... FROM t,
LATERAL fn(t.col)``). With ``useArrow=True`` the exchange is
Arrow-batched (ArrowEvalPythonUDTF in the plan), the same batching
contract as pandas UDFs — rows stream through the Python worker in
columnar batches, never one-at-a-time pickling.

When to reach for one (and when not): the engine's chunker
(operators/corpus.py::chunk_documents) expresses the same expansion
as explode(sequence(...)) — a JVM Generate that fuses into the scan
and is strictly faster; that remains the production path. The UDTF
exists for expansions whose per-row logic outgrows SQL expressions
(stateful-per-row tokenizers, generators driven by Python libraries)
and is oracle-checked against the explode formulation to prove the
plumbing (schema, lateral correlation, Arrow batching) is exact.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(
    returnType="chunk_id: bigint, chunk_text: string, chunk_tokens: bigint",
    useArrow=True,
)
class ChunkSpans:
    """Context-window chunking as a table function: 32-token windows
    every 24 tokens (8-token overlap), trailing chunk short — the
    exact semantics of chunk_documents(size=32, stride=24), token
    rule included (split on single space, drop empties)."""

    SIZE = 32
    STRIDE = 24

    def eval(self, text: str):  # noqa: D102 — schema documented above
        if text is None:
            return
        toks = [t for t in text.split(" ") if t]
        if not toks:
            return
        for chunk_id, start in enumerate(range(0, len(toks), self.STRIDE)):
            window = toks[start : start + self.SIZE]
            yield chunk_id, " ".join(window), len(window)


def register_udtfs(spark) -> None:
    """Idempotently register the catalog's UDTFs in this session."""
    spark.udtf.register("chunk_spans", ChunkSpans)
