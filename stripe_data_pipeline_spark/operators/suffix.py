"""Distributed suffix-array construction by PREFIX DOUBLING — the
scale algorithm behind exact-substring deduplication (Lee et al. 2022
"Deduplicating Training Data Makes Language Models Better" builds a
suffix array over the concatenated corpus; Flick & Aluru 2015 give the
distributed prefix-doubling formulation — both public).

The n-gram span family (corpus.duplicate_span_stats / span_scrub)
catches FIXED-length repeats; a suffix array orders every suffix of
the concatenated corpus lexicographically, the index structure from
which arbitrary-length repeated substrings fall out. The classic
sequential builds (SA-IS, DC3) are pointer-chasing and don't
distribute; prefix doubling does, because each round is plain
relational algebra:

- round 0: rank every position by its single CHARACTER (alphabet-sized
  key space, broadcast join);
- round k: rank(pos) at substring length 2^(k+1) = dense rank of the
  PAIR (rank_k(pos), rank_k(pos + 2^k)) — a self-equi-join on position
  (shuffle on an integer key) plus a distributed dense-rank;
- stop when all ranks are distinct (suffixes of one string are always
  distinct, so this happens within ceil(log2 n) rounds — early-stop is
  one tiny count per round).

The distributed DENSE RANK never funnels through one partition: the
distinct keys are range-partitioned (range partition i < j implies
every key in i sorts before every key in j), ranked LOCALLY per
partition, and offset by the per-partition counts — a
numPartitions-sized driver collect (bounded by contract, like the
k-means centroids). Equal keys land in the same range partition, so
local row_number over distinct keys IS the global dense rank.

Corpus positions are built without ever materializing the string
driver-side: per-doc character explode + a document-offset cumsum
(document-count-sized window, a dim relation).

Oracle story: the final ranks equal DuckDB's
``ROW_NUMBER() OVER (ORDER BY substr(s, pos))`` on the same
concatenated string. The oracle's sort is O(n^2) characters in the
worst case, so the catalog query runs both engines over a bounded
deterministic doc slice — the SLICE bounds oracle memory; the Spark
algorithm is corpus-shaped (log n rounds of linear shuffles) at any
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SEP = "\x01"  # document separator in the concatenated corpus


def _dense_ranks(
    keys: DataFrame,
    cols: list[str],
    parts: int = 16,
    caches: list | None = None,
) -> DataFrame:
    """Global dense rank (1-based) of the DISTINCT rows ``keys`` by
    ``cols`` — range-partition, rank locally, offset by partition
    sizes. No global-window single-partition funnel; the only driver
    state is ``parts`` row counts.

    The ranked layout is LOCAL-CHECKPOINTED before the two consumers
    (size collect + downstream read) touch it: repartitionByRange
    samples its boundaries from intra-partition row order, which is
    nondeterministic across executions, so without the
    materialization the size pass and the read pass could see
    DIFFERENT partitionings and the offsets would be garbage (the
    hypothesis suite caught exactly this). localCheckpoint — not
    cache() — because a cache silently RECOMPUTES lost blocks, and a
    recomputation would re-sample boundaries and re-assign
    spark_partition_id, disagreeing with the already-collected offset
    map (ADVICE r7): a checkpoint read fails loudly on block loss
    instead of silently corrupting ranks in a bit-exactness module.
    Appends the materialized frame to ``caches`` for symmetry with
    the cache-based callers (unpersist on a checkpointed frame is a
    no-op; blocks are freed when the RDD is garbage-collected)."""
    ranged = (
        keys.repartitionByRange(parts, *[F.col(c) for c in cols])
        .withColumn("__pid", F.spark_partition_id())
    )
    w = Window.partitionBy("__pid").orderBy(*[F.col(c) for c in cols])
    local = ranged.withColumn("__lr", F.row_number().over(w)).localCheckpoint(
        eager=True  # pin ONE boundary sampling for both consumers
    )
    if caches is not None:
        caches.append(local)
    sizes = sorted(
        local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n")).collect(),
        key=lambda r: r["__pid"],
    )
    offsets: list = []
    acc = 0
    for r in sizes:
        offsets.extend([F.lit(int(r["__pid"])), F.lit(acc)])
        acc += int(r["__n"])
    om = F.create_map(*offsets) if offsets else F.create_map()
    return local.select(
        *cols,
        (F.element_at(om, F.col("__pid")) + F.col("__lr")).alias("__rank"),
    )


def corpus_positions(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    parts: int = 16,
    caches: list | None = None,
) -> DataFrame:
    """(pos, ch): every character position of the concatenated corpus
    ``doc0 + SEP + doc1 + SEP + ...`` (docs in ``id_col`` order, no
    trailing separator), built distributively: per-doc posexplode of
    the character array plus a DISTRIBUTED doc-offset prefix sum —
    the same range-partition + local-cumsum + per-partition-offset
    pattern as _dense_ranks (including the localCheckpoint that pins
    ONE boundary sampling for both consumers — see _dense_ranks for
    why a cache() would be unsafe here), so no document-count-sized
    relation ever funnels through one partition. Empty documents
    contribute only their separator (Spark's split('', '') returns
    [''], which must not become a phantom position)."""
    docs = df.select(id_col, text_col)
    last = docs.agg(F.max(id_col).alias("__last"))
    w = (
        Window.partitionBy("__pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = (
        docs.repartitionByRange(parts, F.col(id_col))
        .withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__loff",
            F.coalesce(F.sum(F.length(text_col) + 1).over(w), F.lit(0)),
        )
        .localCheckpoint(eager=True)  # pin one boundary sampling for
        # both consumers; fails loudly (instead of silently
        # re-sampling) if a block is lost — see _dense_ranks
    )
    if caches is not None:
        caches.append(local)
    sizes = sorted(
        local.groupBy("__pid")
        .agg(F.sum(F.length(text_col) + 1).alias("__n"))
        .collect(),
        key=lambda r: r["__pid"],
    )
    offsets: list = []
    acc = 0
    for r in sizes:
        offsets.extend([F.lit(int(r["__pid"])), F.lit(acc)])
        acc += int(r["__n"])
    om = F.create_map(*offsets) if offsets else F.create_map()
    offs = local.crossJoin(F.broadcast(last)).select(
        text_col,
        (F.element_at(om, F.col("__pid")) + F.col("__loff")).alias("__off"),
        (F.col(id_col) == F.col("__last")).alias("__is_last"),
    )
    chars = offs.select(
        "__off",
        F.posexplode(
            F.concat(
                F.filter(
                    F.split(F.col(text_col), ""), lambda c: c != ""
                ),
                F.when(F.col("__is_last"), F.array()).otherwise(
                    F.array(F.lit(SEP))
                ),
            )
        ).alias("__p", "ch"),
    )
    return chars.select(
        (F.col("__off") + F.col("__p")).cast("bigint").alias("pos"), "ch"
    )


def suffix_ranks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    parts: int = 16,
    max_rounds: int = 40,
) -> DataFrame:
    """(pos, suffix_rank): the 1-based lexicographic rank of the suffix
    starting at every position of the concatenated corpus — i.e. the
    inverse suffix array — by distributed prefix doubling.

    Each round: one integer-key self-join (rank at pos + 2^k), one
    distinct + distributed dense-rank over the pair space, one map-
    side join back. Rounds are ceil(log2 n) with early stop once all
    ranks are distinct. Intermediate states are cached per round and
    released; lineage is cut by the cache so round r doesn't replay
    rounds 0..r-1."""
    out, _levels = _suffix_ranks_with_levels(
        df, text_col, id_col, parts, max_rounds, keep_levels=False
    )
    return out


def _suffix_ranks_with_levels(
    df: DataFrame,
    text_col: str,
    id_col: str,
    parts: int,
    max_rounds: int,
    keep_levels: bool,
) -> tuple[DataFrame, list[tuple[int, DataFrame]]]:
    """Shared doubling loop. With ``keep_levels`` the per-level rank
    tables [(gap, ranks_at_gap), ...] are retained (each a
    localCheckpoint leaf) for the LCP walk; otherwise they are
    discarded as the loop advances."""
    caches: list = []
    positions = corpus_positions(df, text_col, id_col, caches=caches)
    n = positions.count()
    alphabet = _dense_ranks(
        positions.select("ch").distinct(),
        ["ch"],
        parts=min(parts, 4),
        caches=caches,
    )
    # localCheckpoint (not cache) per round: a cache prevents
    # re-EXECUTION but Catalyst still re-analyzes the full logical
    # tree, which roughly triples per round (paired references ranks
    # twice, new_ranks references paired twice) — measured 2s -> 3s ->
    # 21s -> 167s per round before the lineage cut. Checkpointing
    # truncates the plan to a leaf, the same fix cluster.py's
    # min-label-propagation loop uses.
    ranks = (
        positions.join(F.broadcast(alphabet), "ch")
        .select("pos", F.col("__rank").cast("bigint").alias("rank"))
        .localCheckpoint(eager=True)
    )
    for c in caches:  # ranks is materialized; release the builders
        c.unpersist()
    levels: list[tuple[int, DataFrame]] = [(1, ranks)]
    gap = 1
    rounds = 0
    while gap < n and rounds < max_rounds:
        rounds += 1
        round_caches: list = []
        a = ranks.alias("a")
        b = ranks.select(
            (F.col("pos") - gap).alias("pos"), F.col("rank").alias("r2")
        ).alias("b")
        paired = (
            a.join(b, "pos", "left")
            .select(
                "pos",
                F.col("rank").alias("r1"),
                F.coalesce(F.col("r2"), F.lit(0)).alias("r2"),
            )
        )
        keys = _dense_ranks(
            paired.select("r1", "r2").distinct(),
            ["r1", "r2"],
            parts=parts,
            caches=round_caches,
        )
        new_ranks = (
            paired.join(keys, ["r1", "r2"])
            .select("pos", F.col("__rank").cast("bigint").alias("rank"))
            .localCheckpoint(eager=True)
        )
        n_distinct = new_ranks.agg(
            F.countDistinct("rank").alias("d")
        ).collect()[0]["d"]
        for c in round_caches:  # new_ranks is materialized; release
            c.unpersist()
        ranks = new_ranks
        gap *= 2
        if keep_levels:
            levels.append((gap, ranks))
        if n_distinct == n:
            break
    out = ranks.select("pos", F.col("rank").alias("suffix_rank"))
    return out, (levels if keep_levels else [])


def longest_repeat_spans(
    df: DataFrame,
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    parts: int = 16,
    max_rounds: int = 40,
    max_lcp: int = 256,
) -> DataFrame:
    """The repeated-substring SIGNAL the suffix array exists for
    (Lee et al. threshold exactly this to cut duplicated spans): for
    every rank-ADJACENT pair of suffixes, the length of their longest
    common prefix — the classic fact that any repeated substring's
    two occurrences appear as an adjacent pair in suffix order, so
    max-over-adjacent-LCP IS the longest repeated substring. Returns
    the ``top_k`` pairs as (pos_a, pos_b, lcp), ordered (lcp DESC,
    pos_a, pos_b) — deterministic.

    Distributed LCP walk: keep the per-level rank tables from the
    doubling loop; descending levels, extend a pair's lcp by ``gap``
    whenever rank_gap[pos_a + lcp] == rank_gap[pos_b + lcp] — two
    integer-key joins per level, pairs relation is corpus-sized, no
    character data is ever compared. Top-k via TakeOrderedAndProject
    (k per partition, no global sort). Reported lcp is clamped to
    ``max_lcp`` (the walk itself is exact) — the clamp is what lets
    the DuckDB oracle probe prefixes with a bounded generator instead
    of an O(n)-deep scan per pair; ties under the clamp break
    deterministically on (pos_a, pos_b)."""
    _out, levels = _suffix_ranks_with_levels(
        df, text_col, id_col, parts, max_rounds, keep_levels=True
    )
    _gap, final = levels[-1]
    # adjacent pairs in suffix order: rank r's position vs rank r+1's
    nxt = final.select(
        (F.col("rank") - 1).alias("rank"), F.col("pos").alias("pos_b")
    )
    pairs = (
        final.select(F.col("pos").alias("pos_a"), "rank")
        .join(nxt, "rank")
        .select("pos_a", "pos_b", F.lit(0).cast("bigint").alias("lcp"))
        .localCheckpoint(eager=True)
    )
    for gap, table in reversed(levels):
        ra = table.select(
            F.col("pos").alias("__pa"), F.col("rank").alias("__ra")
        )
        rb = table.select(
            F.col("pos").alias("__pb"), F.col("rank").alias("__rb")
        )
        stepped = (
            pairs.join(
                ra, pairs["pos_a"] + pairs["lcp"] == ra["__pa"], "left"
            )
            .join(rb, pairs["pos_b"] + pairs["lcp"] == rb["__pb"], "left")
            .select(
                "pos_a",
                "pos_b",
                F.when(
                    F.col("__ra").isNotNull()
                    & (F.col("__ra") == F.col("__rb")),
                    F.col("lcp") + gap,
                )
                .otherwise(F.col("lcp"))
                .alias("lcp"),
            )
        )
        pairs = stepped.localCheckpoint(eager=True)
    return (
        pairs.filter(F.col("lcp") > 0)
        .select(
            "pos_a",
            "pos_b",
            F.least(F.col("lcp"), F.lit(max_lcp)).alias("lcp"),
        )
        .orderBy(F.desc("lcp"), F.asc("pos_a"), F.asc("pos_b"))
        .limit(top_k)
    )
