"""Winnowing document fingerprints — Schleimer, Wilkerson & Aiken
2003, "Winnowing: Local Algorithms for Document Fingerprinting" (the
MOSS algorithm; public).

Fingerprint selection with a GUARANTEE: hash every character k-gram,
slide a window of w consecutive k-gram hashes over each document,
and keep the RIGHTMOST MINIMAL hash of every window. Any shared
substring of length >= k + w - 1 between two documents is then
guaranteed to surface as at least one shared fingerprint — the
locality property ad-hoc "0 mod p" sampling lacks — while storing
only ~2/(w+1) of the k-gram stream. Corpus pipelines use exactly
this for plagiarism/overlap detection and contamination triage when
suffix-array indexing is too heavy.

Engine-portable determinism: the k-gram hash is the md5-prefix
integer already used for split buckets / CMS rows (DuckDB replays
it verbatim), and the rightmost-min tie-break is encoded as
min(struct(hash, -pos)) — a total order, so the per-window argmin
is unique and the whole selection is a pure function of the text.
md5 is the portability tax and dominates the runtime constant; a
production deployment that doesn't need a cross-engine oracle swaps
F.xxhash64 in for the k-gram hash — same plan, same locality
guarantee, ~2x cheaper hashing (the duplicate_span_stats_hashed
pattern, except here the hash VALUES shape the selection so the
md5 oracle cannot double-check the swapped variant).

Plan shape (all corpus-linear, no windows-over-corpus sort):

- k-gram stage: one explode of per-doc positions (len - k + 1 rows
  per doc) with a substring + md5 projection;
- window stage: ONE hash exchange of the N k-gram rows on the doc
  key, then min(struct(h, -pos)) over the running row frame
  [CURRENT, w-1 FOLLOWING] ordered by pos — k-gram positions are
  dense, so the row frame IS the sliding window and every window's
  argmin falls out of a single pass (no per-window lists, no w-way
  row expansion);
- the selected set is the distinct (doc, pos, hash) of those
  argmins.

At 100 TB this is one corpus-linear shuffle + a per-doc sorted
pass. No driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _kgram_hash(sub, fast: bool = False) -> F.Column:
    if fast:
        # the production hash (r10, VERDICT r9 #5): one JVM xxhash64
        # per k-gram instead of a full md5 + hex-prefix parse — same
        # plan, same locality guarantee (any total order over k-gram
        # hashes satisfies the winnowing proof), ~2x cheaper on the
        # dominant stage. No cross-engine oracle: DuckDB cannot replay
        # Spark's xxhash64, and here the hash VALUES shape the
        # selection — the invariants are pytest-pinned instead
        # (tests/test_winnow.py: locality on planted overlaps,
        # every-window coverage, density parity with the md5 variant).
        return F.xxhash64(sub)
    return F.conv(F.substring(F.md5(sub), 1, 8), 16, 10).cast("bigint")


def winnow_select(
    df: DataFrame,
    k: int = 8,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    fast: bool = False,
) -> DataFrame:
    """The selected fingerprint set: (id_col, pos, h) — pos is the
    1-based k-gram start, h the md5-prefix hash. Documents with
    fewer than ``w`` k-grams (len < k + w - 1) have no full window
    and are skipped — the paper's L >= w precondition.

    Each window's rightmost-min is a RUNNING FRAME aggregate: the
    k-gram stream sorts once per doc (one hash exchange of N rows on
    the doc key) and min(struct(h, -pos)) over ROWS [CURRENT, w-1
    FOLLOWING] evaluates every window in a single pass — k-gram
    positions are dense, so the row frame IS the window. This
    replaces the r9-initial w-way explode + (doc, window) groupBy,
    whose w*N-row shuffle measured ~13x at 10x data under load;
    the frame plan shuffles N rows once and scales with the corpus.
    """
    from pyspark.sql import Window

    from stripe_data_pipeline_spark.operators.partitioning import spread_scan

    # r14 optimization round (guide §2.5 input skew — the same fix the
    # media codec family got): the k-gram explode + hash projection
    # runs BEFORE the window's exchange, so on a single-file local
    # scan the whole hash pass pinned to ONE core (measured 2.6 s
    # single-core for the md5 stage alone; parallel ~0.2 s). A real
    # many-file corpus scan passes through untouched.
    df = spread_scan(df)
    n_kg = F.length(F.col(text_col)) - F.lit(k) + F.lit(1)
    kg = (
        df.select(
            F.col(id_col),
            n_kg.alias("_L"),
            F.explode(F.sequence(F.lit(1), n_kg)).alias("pos"),
            F.col(text_col).alias("_t"),
        )
        .filter(F.col("_L") >= F.lit(w))
        .select(
            id_col,
            "_L",
            "pos",
            _kgram_hash(
                F.col("_t").substr(F.col("pos"), F.lit(k)), fast=fast
            ).alias("h"),
        )
    )
    frame = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    # Dedup of per-window argmins WITHOUT the distinct's second
    # exchange (r14 optimization round): the windows selecting one
    # fingerprint (pos, h) are CONTIGUOUS in window-start order — if
    # windows p1 < p3 select q but p2 between them selects s != q,
    # then struct_s < struct_q and s lies either in p1's window
    # (s < q => s >= p2 > p1, s < q <= p1+w-1) or in p3's
    # (s > q => s > q >= p3, s <= p2+w-1 <= p3+w-1), contradicting
    # that p1/p3 picked q. So duplicates are ADJACENT and a lag
    # filter over the SAME (doc, pos) partitioning/ordering the frame
    # window already established removes them with zero additional
    # Exchange or Sort (the old .distinct() re-shuffled the selected
    # set on (doc, pos, h)).
    wlag = Window.partitionBy(id_col).orderBy("pos")
    sel = (
        kg.withColumn(
            "m",
            F.min(
                F.struct(F.col("h"), (-F.col("pos")).alias("negpos"))
            ).over(frame),
        )
        .filter(F.col("pos") <= F.col("_L") - F.lit(w - 1))
        .withColumn("_prev", F.lag("m").over(wlag))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("m")))
        .select(
            id_col,
            (-F.col("m.negpos")).alias("pos"),
            F.col("m.h").alias("h"),
        )
    )
    return sel


def winnow_profile(
    df: DataFrame,
    k: int = 8,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    fast: bool = False,
) -> DataFrame:
    """Per-document fingerprint profile: (id_col, n_kgrams,
    n_selected, fingerprint) with fingerprint = md5 of the
    pos-ordered "h:pos" list — an order-sensitive digest both
    engines reproduce bit-for-bit (``fast=True`` swaps the k-gram
    hash for xxhash64; the digest is then deterministic but only
    Spark-replayable)."""
    sel = winnow_select(
        df, k=k, w=w, text_col=text_col, id_col=id_col, fast=fast
    )
    n_kg = (
        df.select(
            F.col(id_col),
            (F.length(F.col(text_col)) - F.lit(k) + F.lit(1))
            .cast("bigint")
            .alias("n_kgrams"),
        )
    )
    per = sel.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_selected"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "h"))
                    ),
                    lambda s: F.concat(
                        s["h"].cast("string"),
                        F.lit(":"),
                        s["pos"].cast("string"),
                    ),
                ),
            )
        ).alias("fingerprint"),
    )
    return n_kg.join(per, id_col).select(
        id_col, "n_kgrams", "n_selected", "fingerprint"
    )


def winnow_invariants(
    df: DataFrame,
    k: int = 8,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    fast: bool = True,
    density_band_bp: tuple[int, int] = (3600, 4400),
) -> DataFrame:
    """Per-document PROOF OBLIGATIONS of the winnowing selection,
    emitted as engine-portable columns (VERDICT r10 #1 — the
    flag-pin pattern of hll_mergeable_user_counts): the xxhash64
    fast path's hash VALUES shape the selection, so no other engine
    can replay the selected set itself — but the selection RULE
    implies exact bounds any correct implementation must satisfy,
    and those bounds are hash-independent:

    - ``n_kgrams``  = len(text) - k + 1 (exact, replayable);
    - ``n_windows`` = n_kgrams - w + 1 (exact, replayable);
    - ``density_in_bounds``: each selected fingerprint at position
      pos can be the argmin of at most the w windows starting in
      (pos-w, pos], and every window has exactly one argmin, so
      n_selected * w >= n_windows; at most one NEW fingerprint per
      window gives n_selected <= n_windows (Schleimer et al. 2003
      §3: density in [1/w, 1] of windows);
    - ``coverage_ok``: EVERY window [p, p+w-1] contains a selected
      position — equivalently min(pos) <= w, max(pos) >= L-w+1 and
      no gap between consecutive selected positions exceeds w
      (this is the locality property the k+w-1 guarantee rests on);
    - ``corpus_density_in_band``: the corpus-wide selected/k-gram
      ratio sits in ``density_band_bp`` (expected 2/(w+1) = 4000 bp
      for a well-mixed hash — a biased hash, e.g. one correlated
      with position, drifts out of band while still passing the
      structural bounds).

    An oracle pins the booleans TRUE and computes the counts from
    the text lengths exactly — a full rows+schema+hash check of the
    production xxhash64 path.

    Cost: the winnow_select pass plus one per-doc lag window over
    the SELECTED rows (~2/(w+1) of the k-gram stream) and a scalar
    corpus aggregate broadcast back — nothing beyond the selection
    itself scales with corpus size. The corpus flag folds the
    per-doc frame (|docs| rows) through an ungrouped agg, not a
    global sort.
    """
    from pyspark.sql import Window

    sel = winnow_select(
        df, k=k, w=w, text_col=text_col, id_col=id_col, fast=fast
    )
    lagw = Window.partitionBy(id_col).orderBy("pos")
    per = (
        sel.withColumn("_gap", F.col("pos") - F.lag("pos").over(lagw))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_n_sel"),
            F.min("pos").alias("_min_pos"),
            F.max("pos").alias("_max_pos"),
            F.max("_gap").alias("_max_gap"),
        )
    )
    lens = df.select(
        F.col(id_col),
        (F.length(F.col(text_col)) - F.lit(k) + F.lit(1))
        .cast("bigint")
        .alias("n_kgrams"),
    ).filter(F.col("n_kgrams") >= F.lit(w))
    # r14: ``j`` feeds both the corpus-density scalar aggregate and
    # the final per-doc projection — one materialization instead of
    # re-running the selection + lag-window pipeline per consumer
    # (the branches differ in pushed filters, so exchange reuse
    # cannot dedupe them; see winnow_shared_pairs).
    j = lens.join(per, id_col).localCheckpoint(eager=True)
    n_windows = F.col("n_kgrams") - F.lit(w - 1)
    # scalar corpus density (1 row) broadcast back onto every doc row
    corpus = j.agg(
        (
            (F.sum("_n_sel") * F.lit(10000)).cast("bigint")
            / F.sum("n_kgrams")
        )
        .cast("bigint")
        .alias("_density_bp")
    )
    lo, hi = density_band_bp
    return (
        j.crossJoin(F.broadcast(corpus))
        .select(
            id_col,
            "n_kgrams",
            n_windows.cast("bigint").alias("n_windows"),
            (
                (F.col("_n_sel") * F.lit(w) >= n_windows)
                & (F.col("_n_sel") <= n_windows)
            ).alias("density_in_bounds"),
            (
                (F.col("_min_pos") <= F.lit(w))
                & (F.col("_max_pos") >= n_windows)
                & (F.coalesce(F.col("_max_gap"), F.lit(0)) <= F.lit(w))
            ).alias("coverage_ok"),
            (
                (F.col("_density_bp") >= F.lit(lo))
                & (F.col("_density_bp") <= F.lit(hi))
            ).alias("corpus_density_in_band"),
        )
    )


def winnow_shared_pairs(
    df: DataFrame,
    k: int = 8,
    w: int = 4,
    min_shared: int = 3,
    max_df: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MOSS-style overlap pairs: documents sharing >= ``min_shared``
    DISTINCT selected fingerprint hashes.

    Hashes selected by more than ``max_df`` documents are dropped
    before the pair join — the rare-shingle hot-key guard (a
    boilerplate 8-gram shared by half the corpus would otherwise
    drive an O(df^2) blowup on one key); the guarantee then applies
    to content rarer than the cap, which is the overlap that
    matters. Pair work is bounded by max_df^2 per hash.
    """
    sel = (
        winnow_select(df, k=k, w=w, text_col=text_col, id_col=id_col)
        .select(id_col, "h")
        .distinct()
        # r14 (guide §1.2): three consumers below (the df-frequency
        # aggregate and BOTH self-join sides) each embedded their own
        # copy of the whole selection pipeline — and the copies are
        # NOT exchange-reusable because filter pushdown differs per
        # branch (the join sides carry IsNotNull(doc_id), the
        # frequency side doesn't), so the k-gram hash pass ran ~3x.
        # One materialization of the selected set (the "land
        # signatures in a table" shape minhash_lsh_candidates already
        # uses) runs it once.
        .localCheckpoint(eager=True)
    )
    # dfreq is corpus-scaled (one row per distinct selected hash) —
    # a plain key join, NOT a broadcast; AQE may still pick one when
    # the filtered side is genuinely small.
    dfreq = sel.groupBy("h").agg(F.count(F.lit(1)).alias("_df"))
    rare = sel.join(dfreq.filter(F.col("_df") <= max_df).select("h"), "h")
    a = rare.alias("a")
    b = rare.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
