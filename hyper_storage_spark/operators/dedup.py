"""Deduplication operators over a ``documents``-shaped table.

Four strategies, each designed for the 100 TB shape of the problem:

- :func:`exact_duplicates` — hash-groupBy. One shuffle on a 32-byte
  digest; no full-text shuffle (the text never leaves the scan stage).
- :func:`ngram_jaccard_pairs` — exact all-pairs Jaccard *restricted to
  pairs that share a shingle* (the inverted-index trick): explode
  shingles → self-join on shingle → count intersections. Shuffle is
  proportional to the posting lists, not n².
- :func:`minhash_lsh_pairs` — MinHash signatures + banded LSH: candidate
  pairs only need equal band hashes, so the join key is (band, hash) and
  skew is bounded by band width; candidates are verified with exact
  Jaccard. This is the scale path: cost O(n·bands), not O(n²).
- :func:`simhash_pairs` — 64-bit SimHash + chunk-banding (pigeonhole:
  hamming ≤ 3 ⇒ at least one of 4 16-bit chunks equal), verified by
  exact hamming distance.

On top of the pairwise strategies: :func:`duplicate_clusters` turns
pair output into keep-one-per-component decisions (distributed
connected components), and :func:`benchmark_contamination` flags
training documents sharing n-grams with an eval benchmark.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._caches import tracked_persist
from .text import tokens_col


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (text_hash, canonical_doc_id,
    dup_count) for groups with >1 member; canonical = min doc_id."""
    # NULL text has no content identity (md5(NULL)=NULL and groupBy
    # treats NULLs as equal — 500 unrelated NULL-text docs would read
    # as one duplicate group); same policy as incremental_exact_dedup
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col("doc_id"), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count("*").alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def shingle_df(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct n-word shingles per document: (doc_id, shingle).

    The token array is materialized as a column first: inlining the
    split() into every element_at() would re-tokenize the document once
    per shingle position (O(len²) per row)."""
    toks = F.col("__toks")
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    shingles = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)])
    )
    return (
        docs.withColumn("__toks", tokens_col(F.col(text_col)))
        .filter(F.size(toks) >= n)
        .select("doc_id", F.explode(F.array_distinct(shingles)).alias("shingle"))
    )


def _hashed_shingles(docs: DataFrame, text_col: str, n: int) -> DataFrame:
    """(doc_id, h) distinct shingles as 64-bit hashes: the join/shuffle
    runs on longs instead of strings (same equality modulo a ~2^-64
    collision, which only matters inside one document pair)."""
    return shingle_df(docs, text_col, n).select("doc_id", F.xxhash64("shingle").alias("h"))


def _jaccard_from_shingles(
    sh: DataFrame,
    threshold: float,
    candidates: DataFrame | None,
    max_df: int | None = None,
    posting: DataFrame | None = None,
) -> DataFrame:
    """(a_id, b_id, jaccard≥threshold) from a (doc_id, h) shingle set.

    Without candidates: inverted-index self-join (pairs sharing ≥1
    shingle). With candidates (from LSH): the intersection counts are
    computed only for the candidate pairs — the posting-list blowup
    never happens, which is the whole point of LSH at scale.

    ``max_df`` drops shingles whose document frequency exceeds the cap
    (and from the set sizes, so the metric stays a true Jaccard over
    the surviving shingles). A stop-shingle shared by L documents
    otherwise produces L² pair rows — the classic skewed-key quadratic
    blowup; the cap bounds every posting list, so pair generation emits
    ≤ max_df²/2 rows per shingle."""
    if candidates is None:
        # posting-list form: group once on the shingle hash, apply the
        # df cap as a free size filter, and emit each list's ordered
        # pairs directly (array HOFs, no self-join shuffle). One
        # groupBy(h) + one groupBy(pair) replaces df-count + cap-join +
        # the a×b join — two fewer shuffles of the full shingle set.
        # A caller that already built (and persisted) the capped
        # posting frame — the budget probe — passes it in so the
        # heaviest shuffle runs once.
        if posting is None:
            posting = sh.groupBy("h").agg(F.collect_list("doc_id").alias("docs"))
            if max_df is not None:
                posting = posting.filter(F.size("docs") <= max_df)
            posting = tracked_persist(posting)
        # sort ONCE per posting row in a projection: referencing
        # array_sort(docs) three times inside the pair expression
        # re-sorted the list at every reference (no common-subexpression
        # elimination inside one Generate input) — r13, guide §1.2
        docs_sorted = F.col("__ds")
        pair_arrays = F.flatten(
            F.transform(
                docs_sorted,
                lambda x, i: F.transform(
                    F.slice(docs_sorted, i + 2, F.size(docs_sorted)),
                    lambda y: F.struct(x.alias("a_id"), y.alias("b_id")),
                ),
            )
        )
        inter = (
            posting.select(F.array_sort(F.col("docs")).alias("__ds"))
            .select(F.explode(pair_arrays).alias("p"))
            .select("p.a_id", "p.b_id")
            .groupBy("a_id", "b_id")
            .agg(F.count("*").alias("c"))
        )
        # the per-doc surviving-shingle counts feed BOTH broadcast join
        # sides below; unpersisted, each side re-ran the full posting
        # explode + aggregation (visible as two identical Generate
        # subtrees in the r12 plan) — persist the tiny (doc, n_sh)
        # frame so the explode pass runs once (r13, guide §2.4)
        sizes = tracked_persist(
            posting.select(F.explode("docs").alias("doc_id"))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_sh"))
        )
    else:
        if max_df is not None:
            # same cap semantics as the posting-list branch: drop hot
            # shingles from intersections AND set sizes
            keep = sh.groupBy("h").agg(F.count("*").alias("df")).filter(F.col("df") <= max_df)
            sh = sh.join(keep.select("h"), "h")
        # sh stays unpersisted here (see minhash_lsh_pairs: JVM-cheap
        # wide intermediates recompute faster than they cache)
        sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
        a = sh.alias("a")
        b = sh.alias("b")
        # NO broadcast hint on candidates: the candidate-pair set grows
        # with corpus size and near-dup density, so forcing it through
        # the driver is an OOM at 100 TB. The join keys are plain
        # doc_id equi-keys — AQE broadcasts when it is actually small
        # and shuffles otherwise, which is exactly the right policy.
        inter = (
            candidates
            .join(a, F.col("a_id") == F.col("a.doc_id"))
            .join(b, (F.col("b_id") == F.col("b.doc_id")) & (F.col("a.h") == F.col("b.h")))
            .groupBy("a_id", "b_id")
            .agg(F.count("*").alias("c"))
        )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    j = (
        inter.join(sa, F.col("a_id") == F.col("sa.doc_id"))
        .join(sb, F.col("b_id") == F.col("sb.doc_id"))
        .select(
            "a_id",
            "b_id",
            F.round(F.col("c") / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("c")), 6)
            .cast("double")
            .alias("jaccard"),
        )
    )
    return j.filter(F.col("jaccard") >= threshold)


class HotCorpusError(ValueError):
    """Raised by :func:`ngram_jaccard_pairs` (``hot_action="raise"``)
    when the measured posting mass exceeds ``candidate_budget`` — the
    corpus is too pair-dense for exact inverted-index Jaccard; route
    it to :func:`minhash_lsh_pairs`."""


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    max_df: Optional[int] = None,
    candidate_budget: Optional[int] = None,
    hot_action: str = "route",
) -> DataFrame:
    """Exact n-gram-shingle Jaccard for every pair sharing ≥1 surviving
    shingle: (a_id, b_id, jaccard ≥ threshold), rounded to 6.

    The default (``max_df=None``) is the exact contract: every shingle
    participates. Passing ``max_df`` drops shingles present in more
    than that many documents (from both the posting lists and the set
    sizes): stop-shingles carry no discriminative signal and their
    posting lists are the quadratic skew term of the self-join —
    standard practice for inverted-index Jaccard at corpus scale, and
    what the catalog entry does (max_df=100). Note the cap keys on
    xxhash64 shingle hashes, so an oracle capping raw shingle strings
    can diverge on a hash collision (~2^-64 per shingle pair —
    negligible, but the asymmetry is real).

    ``candidate_budget`` (r12) bounds the BELOW-cap quadratic region
    the df cap cannot see: the cap fixes the asymptote (lists past it
    drop), but a corpus whose lists sit just under the cap still emits
    ~Σ C(df,2) candidate pairs — measured 79× pair growth on 10× data
    at sf1. With a budget set, that posting mass is measured FIRST
    (one count-distinct-free aggregation over the capped posting
    sizes; it equals the exact number of pair rows the explosion
    would emit), and when it exceeds the budget the call either
    reroutes to :func:`minhash_lsh_pairs` (``hot_action="route"``,
    auto-sized via :func:`minhash_params_for`, with a warning — the
    result is then LSH-recall, not exact) or raises
    :class:`HotCorpusError` naming that path (``hot_action="raise"``).
    ``candidate_budget=None`` (default) keeps the exact contract
    unconditionally — the oracle-gated catalog entry runs that way."""
    if hot_action not in ("route", "raise"):
        raise ValueError(f"hot_action must be 'route' or 'raise', got {hot_action!r}")
    sh = _hashed_shingles(docs, text_col, n)
    posting = None
    if candidate_budget is not None:
        # build the capped posting lists ONCE and persist before the
        # probe: the mass aggregation materializes the same cached
        # frame the below-budget pair generation then consumes, so the
        # guard costs one cache fill instead of running the corpus's
        # heaviest shuffle twice
        posting = sh.groupBy("h").agg(F.collect_list("doc_id").alias("docs"))
        if max_df is not None:
            posting = posting.filter(F.size("docs") <= max_df)
        posting = tracked_persist(posting)
        sz = F.size("docs")
        mass = posting.agg(
            F.coalesce(F.sum(sz * (sz - 1) / 2), F.lit(0.0)).alias("m")
        ).collect()[0]["m"]
        if mass > candidate_budget:
            posting.unpersist()  # neither the raise nor the reroute reads it
            if hot_action == "raise":
                raise HotCorpusError(
                    f"posting mass {int(mass)} candidate pairs exceeds "
                    f"candidate_budget={candidate_budget} — exact inverted-"
                    "index Jaccard is quadratic on this corpus; use "
                    "minhash_lsh_pairs (or hot_action='route')"
                )
            import warnings

            n_docs = docs.count()
            # params_for validates background_j < threshold <= j_detect
            # < 1; a caller routing at a low threshold (<= the 0.2
            # default) or at threshold 1.0 (exact-duplicate setting,
            # where j_detect = (t+1)/2 = 1.0 fails the open bound) must
            # not hit that as an opaque ValueError — clamp the sizing
            # threshold into the valid open interval. Sizing at a
            # slightly lower threshold is conservative (more selective
            # params, recall certified below the verify threshold); the
            # verify itself still filters at the caller's threshold.
            t_size = min(threshold, 0.98)
            num_hashes, bands = minhash_params_for(
                n_docs, t_size, background_j=min(0.2, t_size / 2)
            )
            warnings.warn(
                f"ngram_jaccard_pairs: posting mass {int(mass)} exceeds "
                f"candidate_budget={candidate_budget}; rerouting to "
                f"minhash_lsh_pairs(num_hashes={num_hashes}, bands={bands}, "
                f"max_df={max_df}) — the capped-Jaccard metric is "
                "preserved; result recall follows the LSH S-curve, not "
                "the exact contract",
                stacklevel=2,
            )
            return minhash_lsh_pairs(
                docs, threshold, num_hashes, bands, n=n, text_col=text_col,
                max_df=max_df,
            )
    return _jaccard_from_shingles(sh, threshold, None, max_df, posting=posting)


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 32
) -> DataFrame:
    """(doc_id, sig: array<bigint>) MinHash signatures over a
    (doc_id, h) shingle set. Hash family: murmur3(h, seed=i) — one
    aggregation over the shingle list, all JVM-side."""
    # ONE expression string, not num_hashes Column trees: each
    # F.min(F.hash(...)).alias(...) costs ~6 py4j roundtrips and the
    # 32-column spelling dominated the operator's driver-side
    # construction (cProfile at sf0.1: ~0.37 s of socket chatter for
    # this helper alone). Identical plan and values — array() of the
    # same min(hash(h, i)) aggregates.
    arr = ", ".join(f"min(hash(h, {i}))" for i in range(num_hashes))
    return sh.groupBy("doc_id").agg(F.expr(f"array({arr})").alias("sig"))


def _band_table(sig: DataFrame, bands: int, rows: int) -> DataFrame:
    """(doc_id, band_id, band_hash) from a (doc_id, sig) signature
    frame — the melted banded form both the self-join and the
    persistable incremental index use."""
    # one expression string for the same reason as minhash_signatures:
    # the per-band Column spelling (bands × rows element_at + struct +
    # explode trees) was pure py4j chatter; sig[i] is the same 0-based
    # getItem, hash(...) the same multi-arg murmur3, values identical
    structs = ", ".join(
        "named_struct('band_id', {b}, 'band_hash', hash({args}))".format(
            b=b, args=", ".join(f"sig[{b * rows + r}]" for r in range(rows))
        )
        for b in range(bands)
    )
    return sig.select(
        "doc_id", F.expr(f"explode(array({structs}))").alias("bh")
    ).select("doc_id", F.col("bh.band_id"), F.col("bh.band_hash"))


def minhash_band_index(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """The persistable LSH state of a corpus: (doc_id, band_id,
    band_hash) — ``bands`` rows per document, O(corpus) once. An
    incremental pipeline stores this table (it IS the index — an
    equi-join key set) and hands it to
    :func:`incremental_minhash_pairs` per batch, so near-dup checking
    a daily increment never recomputes corpus signatures."""
    sh = _hashed_shingles(docs, text_col, n)
    return _band_table(minhash_signatures(sh, num_hashes), bands, num_hashes // bands)


def minhash_params_for(
    corpus_rows: int,
    threshold: float = 0.5,
    recall: float = 0.9,
    j_detect: Optional[float] = None,
    background_j: float = 0.2,
    candidate_budget: int = 64,
    max_hashes: int = 128,
) -> tuple[int, int]:
    """(num_hashes, bands) sized from the corpus — the
    ``similarity.planes_for`` occupancy rule translated to banded
    MinHash, where the scale knob is ROWS PER BAND, not bucket count
    (band-hash buckets are content-addressed; unrelated-pair
    collisions per band fall as ``background_j^rows``).

    Picks the smallest rows-per-band ``r`` whose expected FALSE
    candidates per document — ``corpus_rows · bands · background_j^r``
    with ``background_j`` the background Jaccard of unrelated docs —
    stays within ``candidate_budget``; then the band count is the
    smallest ``b`` with ``1-(1-j_detect^r)^b ≥ recall``, the standard
    S-curve guarantee. ``j_detect`` (default the threshold/1.0
    midpoint) is WHERE the recall is certified — the LSH convention:
    pairs far above the verify threshold are caught with the stated
    probability, pairs hugging it ride the S-curve's shoulder (the
    fixed default (32, 8) certifies ≈0.86 at j=0.75 but only ≈0.40 at
    exactly 0.5 — this function keeps that convention while scaling
    selectivity). A fixed (32, 8) keeps r=4 forever: at 10⁹ docs the
    per-document false-candidate expectation is a thousandfold 10⁶'s —
    exactly the creep this removes. ``max_hashes`` caps the signature
    cost (past it, the most selective affordable params return and
    candidates grow again — raise the cap or pre-block)."""
    import math

    j_detect = (threshold + 1.0) / 2.0 if j_detect is None else j_detect
    if not 0 < threshold <= j_detect < 1 or not 0 < recall < 1 or not 0 < background_j < threshold:
        raise ValueError(
            "need 0 < background_j < threshold <= j_detect < 1 and 0 < recall < 1, got "
            f"threshold={threshold}, j_detect={j_detect}, recall={recall}, "
            f"background_j={background_j}"
        )
    n_rows = max(corpus_rows, 1)
    best = None
    for r in range(1, 65):
        b = max(1, math.ceil(math.log(1 - recall) / math.log(1 - j_detect**r)))
        if b * r > max_hashes:
            break
        best = (b * r, b)
        if n_rows * b * (background_j**r) <= candidate_budget:
            return best
    if best is None:  # even r=1 exceeds max_hashes — impossible in practice
        raise ValueError(f"max_hashes={max_hashes} cannot satisfy recall={recall}")
    return best  # budget not met within the cap: the most selective affordable


def simhash_hamming_budget(corpus_rows: int, target_occupancy: int = 128) -> int:
    """The largest ``max_hamming`` the 64-bit SimHash banding can
    afford at this corpus size — planes_for's occupancy rule applied
    to pigeonhole chunks. Correctness pins chunks = max_hamming + 1
    (simhash_pairs), so chunk width w = 64 // chunks, random-bucket
    occupancy ≈ corpus_rows / 2^w, and the per-chunk self-join cost is
    occupancy². Returns the largest h whose width keeps expected
    occupancy ≤ target (floor 0: exact-64-bit match always affords);
    a corpus past h=0's budget (2^64-ish) needs pre-blocking, not a
    wider threshold."""
    import math

    n = max(corpus_rows, 1)
    need_w = max(0, math.ceil(math.log2(n / max(target_occupancy, 1)))) if n > target_occupancy else 0
    for h in range(31, -1, -1):  # width = 64 // (h+1) ≥ 2 from h ≤ 31
        if 64 // (h + 1) >= need_w:
            return h
    return 0


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    text_col: str = "text",
    max_df: Optional[int] = None,
) -> DataFrame:
    """MinHash + banded LSH candidate generation, exact-Jaccard verify.

    bands × rows = num_hashes; P(candidate) = 1-(1-j^rows)^bands — with
    32 hashes / 8 bands (rows=4), j=0.5 → ~86% per-band ∪, well above
    the verify threshold, while keeping the candidate join selective.
    Returns (a_id, b_id, jaccard ≥ threshold).

    ``max_df`` applies :func:`ngram_jaccard_pairs`'s df cap BEFORE the
    signatures, so banding and the exact verify both measure the SAME
    capped-Jaccard metric the exact operator computes — without it, a
    budget reroute from the capped exact path would silently change
    the metric (boilerplate-heavy unrelated pairs can exceed the
    threshold on uncapped Jaccard), not just trade exactness for the
    LSH recall curve.
    """
    if bands < 1 or bands > num_hashes or num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes}) — a "
            "silent remainder would band only a prefix of the signature "
            "and change the documented recall curve"
        )
    rows = num_hashes // bands
    # deliberately UNPERSISTED: the shingle set and band table are
    # JVM-cheap codegen over the base scan, and the plan re-derives
    # them per consumer faster than a cache materialization barrier
    # (A/B at sf0.1 local[32]: persisting both = 3.0 s warm, none =
    # 1.8 s). The persist policy in this module: cache Python-UDF
    # outputs (expensive per row — simhash signatures) and small
    # grouped reductions (posting lists); recompute wide JVM-side
    # intermediates — at 100 TB a cache larger than the corpus spills
    # and loses to a parallel re-scan for the same reason.
    sh = _hashed_shingles(docs, text_col, n)
    if max_df is not None:
        # cap before signatures: the df is the FULL corpus's, exactly
        # like the exact path, and a doc whose shingles are all capped
        # away drops out of both paths identically
        keep = sh.groupBy("h").agg(F.count("*").alias("df")).filter(F.col("df") <= max_df)
        sh = sh.join(keep.select("h"), "h")
    melted = _band_table(minhash_signatures(sh, num_hashes), bands, rows)
    a = melted.alias("a")
    b = melted.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    # exact-Jaccard verify restricted to the candidate pairs — no
    # inverted-index blowup, the LSH scale win stays intact
    return _jaccard_from_shingles(sh, threshold, candidates).select("a_id", "b_id", "jaccard")


def incremental_minhash_pairs(
    batch: DataFrame,
    corpus: DataFrame,
    threshold: float = 0.5,
    corpus_index: DataFrame | None = None,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs INVOLVING a new batch — batch×corpus and
    batch×batch — without re-running LSH over the whole corpus: the
    near-dup counterpart of :func:`incremental_exact_dedup`'s digest
    index.

    ``corpus_index`` is the persisted :func:`minhash_band_index` table
    (computed here when omitted — the one-off bootstrap). Per batch
    the cost is: batch signatures/bands (O(batch)), a band equi-join
    against the index (candidates only), and an exact-Jaccard verify
    whose shingles are computed ONLY for documents appearing in some
    candidate pair (semi-join pushdown) — corpus text is touched for
    candidates alone, never wholesale. Same hash family and banding as
    :func:`minhash_lsh_pairs`, so the recall curve carries over.
    Assumes batch and corpus ids are distinct sets (re-ingested ids
    should go through :func:`incremental_exact_dedup` first)."""
    batch_bands = _band_table(
        minhash_signatures(_hashed_shingles(batch, text_col, n), num_hashes),
        bands,
        num_hashes // bands,
    )
    idx = (
        corpus_index
        if corpus_index is not None
        else minhash_band_index(corpus, num_hashes, bands, n, text_col)
    )
    cb = batch_bands.alias("b")
    cross = (
        idx.alias("a")
        .join(
            cb,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("a_id"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("b_id"),
        )
    )
    b2 = batch_bands.alias("b2")
    within = (
        cb.join(
            b2,
            (F.col("b.band_id") == F.col("b2.band_id"))
            & (F.col("b.band_hash") == F.col("b2.band_hash"))
            & (F.col("b.doc_id") < F.col("b2.doc_id")),
        )
        .select(F.col("b.doc_id").alias("a_id"), F.col("b2.doc_id").alias("b_id"))
    )
    candidates = cross.union(within).distinct()
    involved = (
        candidates.select(F.col("a_id").alias("doc_id"))
        .union(candidates.select(F.col("b_id").alias("doc_id")))
        .distinct()
    )
    docs_needed = (
        corpus.select("doc_id", text_col)
        .join(involved, "doc_id", "left_semi")
        .unionByName(batch.select("doc_id", text_col).join(involved, "doc_id", "left_semi"))
    )
    sh = _hashed_shingles(docs_needed, text_col, n)
    return _jaccard_from_shingles(sh, threshold, candidates).select("a_id", "b_id", "jaccard")


def embedding_cosine_pairs(
    emb: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: Optional[int] = 50_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a_id, b_id, cosine ≥
    threshold). Brute-force all-pairs here (exact, oracle-pinned) —
    this is the small-n ORACLE TWIN of :func:`embedding_lsh_pairs`,
    deliberately quadratic. The ``max_rows`` guard (default 50k, pass
    None to override knowingly) makes the 100×-scale misuse impossible:
    above it, use :func:`embedding_lsh_pairs`, whose bucketed candidate
    generation restricts the pair join the way banded MinHash does for
    text."""
    if max_rows is not None:
        n_vec = emb.count()
        if n_vec > max_rows:
            raise ValueError(
                f"embedding_cosine_pairs is all-pairs O(n^2) and got n={n_vec} "
                f"> max_rows={max_rows}; use embedding_lsh_pairs for corpora "
                "at this scale (or pass max_rows=None if you really mean it)"
            )
    from .similarity import _dot, _norm

    # norms are computed once per vector, not once per pair
    a = emb.select(
        F.col(id_col).alias("a_id"), F.col(vec_col).alias("av"), _norm(F.col(vec_col)).alias("an")
    )
    b = emb.select(
        F.col(id_col).alias("b_id"), F.col(vec_col).alias("bv"), _norm(F.col(vec_col)).alias("bn")
    )
    pairs = a.join(b, F.col("a_id") < F.col("b_id"))
    cos = _dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn"))
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("a_id", "b_id", F.round("cosine", 6).alias("cosine"))
    )


def embedding_lsh_pairs(
    emb: DataFrame,
    threshold: float = 0.45,
    n_tables: int = 16,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed embedding near-duplicate pairs — the scale path for
    :func:`embedding_cosine_pairs` (which is all-pairs and exists as the
    small-n oracle twin only).

    Candidate generation: ``n_tables`` independent random-hyperplane
    signatures of ``n_planes`` bits each (OR-amplification), with
    Hamming-1 probing — side a of the self-join is exploded to its
    signature plus the ``n_planes`` one-bit-flipped neighbors, so a pair
    is a candidate when some table's signatures differ by ≤1 bit. The
    join key is (table_id, signature): bucketed, shuffle-proportional to
    bucket occupancy, never a BroadcastNestedLoopJoin over the corpus.
    Verification: exact cosine on the candidate pairs only.

    Recall is tunable: P(candidate) per table is p^b + b·p^(b-1)(1-p)
    with p = 1 - θ/π; amplified across tables. The defaults hold
    recall ≥ 0.9 down to cosine ≈ 0.45 (θ ≈ 63°) ACROSS hash seeds
    (measured ≥ 13/14 at seeds {7,13,42,99} on the sf0.01 corpus,
    whose planted pairs sit barely above the random baseline — the
    adversarial case; 12 tables dipped to 11/14 on one seed, which is
    why the default is 16). Real near-duplicate corpora (cosine ≥
    0.8) get there with far fewer tables, and denser corpora should
    raise ``n_planes`` to keep buckets small.
    """
    from .similarity import _dot, _hyperplanes, _norm, melted_signatures

    tables = [_hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    exact = tracked_persist(melted_signatures(emb, id_col, vec_col, tables, "doc_id"))
    probes = exact.select(
        "doc_id",
        "table_id",
        F.explode(
            F.array(*[
                F.col("sig").bitwiseXOR(F.lit(flip))
                for flip in [0] + [1 << i for i in range(n_planes)]
            ])
        ).alias("sig"),
    )
    a = probes.alias("a")
    b = exact.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    av = emb.select(
        F.col(id_col).alias("a_id"), F.col(vec_col).alias("av"), _norm(F.col(vec_col)).alias("an")
    )
    bv = emb.select(
        F.col(id_col).alias("b_id"), F.col(vec_col).alias("bv"), _norm(F.col(vec_col)).alias("bn")
    )
    cos = _dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn"))
    return (
        candidates.join(av, "a_id")
        .join(bv, "b_id")
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("a_id", "b_id", F.round("cosine", 6).alias("cosine"))
    )


def golden_records(
    df: DataFrame,
    cluster_col: str,
    policies: dict,
) -> DataFrame:
    """Field-level survivorship merge — the MDM "golden record" step
    AFTER duplicate clustering: where :func:`keep_best_per_cluster`
    keeps one whole ROW per cluster, this builds a synthetic record
    whose every field follows its own survivorship policy across the
    cluster's members:

    - ``"mode"``    — most frequent non-null value (the consensus
      field: a typo'd city loses to the three correct copies),
    - ``"max"`` / ``"min"`` — extremal value (latest timestamp,
      lowest price),
    - ``"longest"`` — longest non-null string (the most complete
      address/description wins); string/binary columns only —
      ``length()`` is NULL for other types, which makes every row
      lose and the field come back NULL.

    Every policy is deterministic: ties break to the GREATEST value
    (max_by over a (count|length, value) struct; SQL-replayable as
    ORDER BY cnt DESC, value DESC LIMIT 1). NULLs never win a field
    unless the cluster has no non-null value for it.

    Scale shape: one grouped aggregate on the cluster key for all
    max/min/longest fields together, plus one (cluster, value)
    count + argmax pair of aggregates PER mode field — every shuffle
    is keyed on the cluster id, nothing is quadratic in cluster
    size. Returns one row per cluster: (cluster_col, *policies)."""
    valid = {"mode", "max", "min", "longest"}
    bad = {c: p for c, p in policies.items() if p not in valid}
    if bad:
        raise ValueError(f"unknown survivorship policies: {bad}; valid: {sorted(valid)}")
    missing = [c for c in policies if c not in df.columns]
    if missing:
        raise ValueError(f"policy columns not in frame: {missing}")

    out = df.select(cluster_col).distinct()
    direct = []
    for col, pol in policies.items():
        if pol == "max":
            direct.append(F.max(col).alias(col))
        elif pol == "min":
            direct.append(F.min(col).alias(col))
        elif pol == "longest":
            direct.append(
                F.max_by(
                    col,
                    F.when(
                        F.col(col).isNotNull(),
                        F.struct(F.length(col).alias("l"), F.col(col).alias("v")),
                    ),
                ).alias(col)
            )
    if direct:
        out = out.join(df.groupBy(cluster_col).agg(*direct), cluster_col, "left")
    for col, pol in policies.items():
        if pol != "mode":
            continue
        counts = (
            df.filter(F.col(col).isNotNull())
            .groupBy(cluster_col, col)
            .agg(F.count("*").alias("__cnt"))
        )
        pick = counts.groupBy(cluster_col).agg(
            F.max_by(
                col, F.struct(F.col("__cnt").alias("c"), F.col(col).alias("v"))
            ).alias(col)
        )
        out = out.join(pick, cluster_col, "left")
    return out.select(cluster_col, *policies)


def semantic_dedup(
    emb: DataFrame,
    k: int = 10,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient
    learning at web-scale through semantic deduplication"): cluster
    the embeddings with k-means, then within each cluster drop every
    vector whose cosine to ANY earlier (lower-id) vector of the same
    cluster reaches ``tau``. The id order replaces the paper's
    arbitrary index order, making the decision deterministic; like
    the paper, earlier vectors suppress later ones whether or not
    they were themselves kept — a one-pass rule, not greedy MIS, so
    each vector's fate depends only on its prior set.

    Returns (id_col, cluster, kept, max_prior_cos) for every input
    vector; ``max_prior_cos`` is the max cosine to earlier same-
    cluster vectors (−1.0 for the cluster's first vector), emitted so
    a verifier can audit the decision without re-running the pruning.

    Scale shape: k-means is the distributed part (linear passes,
    k×d driver state); pruning runs per cluster in one
    ``applyInPandas`` — a BLAS gram matrix in row blocks, O(c²·d)
    flops but only O(block·c) memory per task. Cluster size c is a
    SIZING parameter: the paper runs k ≈ n/⟨c⟩ so c stays bounded
    (tens of thousands) at any corpus size — pass k accordingly; the
    quadratic is per-cluster, never corpus-wide.
    """
    if not 0.0 < tau <= 1.0:
        raise ValueError(f"tau must be in (0, 1], got {tau}")
    from .similarity import kmeans_clusters

    assigned = kmeans_clusters(emb, k=k, seed=seed, id_col=id_col, vec_col=vec_col)
    joined = assigned.join(emb.select(id_col, vec_col), id_col)
    # id type mirrors the INPUT schema (string doc ids are as valid as
    # bigints — a hardcoded 'long' here miscast or crashed them)
    id_type = emb.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, cluster int, kept boolean, max_prior_cos double"

    def _prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        n = len(pdf)
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0.0] = 1.0  # zero vectors: cosine treated as 0
        Xn = X / norms[:, None]
        max_prior = np.full(n, -1.0)
        block = 1024
        for s in range(0, n, block):
            e = min(s + block, n)
            gb = Xn[s:e] @ Xn[:e].T  # rows s..e vs ALL prior columns
            for r in range(max(s, 1), e):
                max_prior[r] = gb[r - s, :r].max()
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                "cluster": pdf["cluster"].values,
                "kept": max_prior < tau,
                "max_prior_cos": max_prior,
            }
        )

    return joined.groupBy("cluster").applyInPandas(_prune, schema)


def embedding_signature_index(
    emb: DataFrame,
    n_tables: int = 16,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The persistable LSH state of an embedding corpus:
    (doc_id, table_id, sig) — hyperplanes derive deterministically from
    (seed, table), so signatures computed later for a new batch land in
    the same buckets. The embedding counterpart of
    :func:`minhash_band_index`."""
    from .similarity import _hyperplanes, melted_signatures

    tables = [_hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    return melted_signatures(emb, id_col, vec_col, tables, "doc_id")


def incremental_embedding_pairs(
    batch: DataFrame,
    corpus: DataFrame,
    threshold: float = 0.45,
    corpus_index: DataFrame | None = None,
    n_tables: int = 16,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs INVOLVING a new batch, against the
    persisted signature index: batch signatures (O(batch)), Hamming-1
    probes on the batch side only, a (table, sig) equi-join for
    candidates, exact-cosine verify with vectors fetched via semi-join
    for candidate ids only. Same hyperplane family as
    :func:`embedding_lsh_pairs`, so its recall curve carries over.
    Assumes batch and corpus ids are disjoint."""
    from .similarity import _dot, _norm

    batch_exact = tracked_persist(
        embedding_signature_index(batch, n_tables, n_planes, dim, seed, id_col, vec_col)
    )
    idx = (
        corpus_index
        if corpus_index is not None
        else embedding_signature_index(corpus, n_tables, n_planes, dim, seed, id_col, vec_col)
    )
    probes = batch_exact.select(
        "doc_id",
        "table_id",
        F.explode(
            F.array(*[
                F.col("sig").bitwiseXOR(F.lit(flip))
                for flip in [0] + [1 << i for i in range(n_planes)]
            ])
        ).alias("sig"),
    )
    p = probes.alias("p")
    cross = (
        idx.alias("a")
        .join(
            p,
            (F.col("a.table_id") == F.col("p.table_id"))
            & (F.col("a.sig") == F.col("p.sig"))
            & (F.col("a.doc_id") != F.col("p.doc_id")),
        )
        .select(
            F.least(F.col("a.doc_id"), F.col("p.doc_id")).alias("a_id"),
            F.greatest(F.col("a.doc_id"), F.col("p.doc_id")).alias("b_id"),
        )
    )
    b2 = batch_exact.alias("b2")
    within = (
        p.join(
            b2,
            (F.col("p.table_id") == F.col("b2.table_id"))
            & (F.col("p.sig") == F.col("b2.sig"))
            & (F.col("p.doc_id") < F.col("b2.doc_id")),
        )
        .select(F.col("p.doc_id").alias("a_id"), F.col("b2.doc_id").alias("b_id"))
    )
    candidates = cross.union(within).distinct()
    involved = (
        candidates.select(F.col("a_id").alias("__vid"))
        .union(candidates.select(F.col("b_id").alias("__vid")))
        .distinct()
    )
    vecs = (
        corpus.select(F.col(id_col).alias("__vid"), F.col(vec_col).alias("__v"))
        .unionByName(batch.select(F.col(id_col).alias("__vid"), F.col(vec_col).alias("__v")))
        .join(involved, "__vid", "left_semi")
        .select("__vid", "__v", _norm(F.col("__v")).alias("__n"))
    )
    av = vecs.select(F.col("__vid").alias("a_id"), F.col("__v").alias("av"), F.col("__n").alias("an"))
    bv = vecs.select(F.col("__vid").alias("b_id"), F.col("__v").alias("bv"), F.col("__n").alias("bn"))
    cos = _dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn"))
    return (
        candidates.join(av, "a_id")
        .join(bv, "b_id")
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("a_id", "b_id", F.round("cosine", 6).alias("cosine"))
    )


def duplicate_clusters(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_rounds: int = 30,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph:
    (doc_id, cluster_id) for every document that appears in ``pairs``,
    where cluster_id is the component's minimum doc_id — the canonical
    representative downstream "keep one per cluster" filters key on.

    Pairwise dedup output is NOT a dedup decision yet: if A~B and B~C
    but A≁C (similarity is not transitive), keeping "one per pair"
    either drops too much or too little; the industry-standard move
    (MinHash dedup in C4/RefinedWeb/Dolma pipelines) is to take
    connected components of the pair graph and keep one doc per
    component. This is that operator.

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — each
    round is two groupBy/join passes over the edge set, and the edge
    set contracts toward a forest of stars rooted at each component's
    minimum in O(log² n) rounds (2 rounds for the clique-shaped
    components real dup graphs produce). No driver-side graph state:
    the driver loop only compares a (count, checksum) pair per round,
    so a 100 TB pair set never leaves the executors. Each round ends
    in ``localCheckpoint`` to truncate the growing lineage (iterative
    plans otherwise re-derive every prior round per action; swap for
    ``checkpoint`` with a reliable dir on a real cluster).

    Works for any orderable id type (longs here; strings cluster to
    their lexicographic min)."""
    e = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev: tuple | None = None
    for _ in range(max_rounds):
        # large-star: every neighbor LARGER than u re-points at the
        # minimum of u's closed neighborhood (keeps connectivity,
        # never grows the edge count beyond n+m)
        nbrs = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = (
            nbrs.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("u", "mv").alias("m"))
        )
        large = (
            nbrs.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: orient each edge (larger, smaller); the larger
        # endpoint and all its smaller neighbors point at the minimum
        d = large.select(
            F.greatest(F.col("u"), F.col("v")).alias("u"),
            F.least(F.col("u"), F.col("v")).alias("v"),
        )
        mn = d.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            d.join(mn, "u")
            .select(F.col("v").alias("node"), F.col("m"))
            .union(mn.select(F.col("u").alias("node"), F.col("m")))
            .filter(F.col("node") != F.col("m"))
            .select(F.col("node").alias("u"), F.col("m").alias("v"))
            .distinct()
            # lazy: the checksum action right below materializes the
            # checkpoint, so each round costs ONE job, not two
            .localCheckpoint(eager=False)
        )
        # order-independent edge-set checksum (XOR never overflows,
        # unlike SUM under ANSI arithmetic)
        chk_row = small.agg(
            F.count("*").alias("n"), F.bit_xor(F.xxhash64("u", "v")).alias("s")
        ).first()
        chk = (chk_row["n"], chk_row["s"])
        e = small
        if prev == chk:
            break
        prev = chk
    else:
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_rounds} rounds "
            "(pathological graph?); raise max_rounds"
        )
    # fixed point = stars (member -> component minimum); the root
    # itself gets a row so every clustered document is labeled
    members = e.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
    roots = e.select(F.col("v").alias("doc_id"), F.col("v").alias("cluster_id")).distinct()
    return members.union(roots).distinct()


def fuzzy_key_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    max_df: int = 64,
) -> DataFrame:
    """Entity resolution by fuzzy key: all id pairs whose keys are
    within edit distance 1 — (a_id, b_id, dist) — via FastSS deletion
    neighborhoods (Bocek et al., "Fast Similarity Search in Large
    Dictionaries", 2007): each key expands to itself plus its
    length-many single-character deletions; two keys at edit
    distance ≤ 1 ALWAYS share a neighborhood string (a substitution
    at position i collides on delete-i of both; an insertion collides
    the shorter key with the longer's deletion), so an equi-join on
    the variant is a complete candidate generator and the exact
    ``levenshtein`` verify runs only on candidates — never an
    all-pairs cross join.

    ``max_df`` caps a variant's block size (the posting-list
    discipline every blocking join here uses): a variant shared by
    more than ``max_df`` keys is dropped from candidate generation —
    at web scale a degenerate hot key (empty, "unknown", …) would
    otherwise explode one block quadratically. Dropped blocks lose
    only pairs of near-identical DEGENERATE keys, the standard
    trade.

    Scale shape: neighborhood size is O(key length) per row, the join
    is variant-hash-partitioned, pair output is bounded by
    Σ block·(block−1)/2 ≤ max_df²/2 per variant, and the verify is
    candidate-only. All-integer output (ids + the exact distance)."""
    s = df.select(F.col(id_col).alias("id"), F.col(key_col).alias("k")).filter(
        F.col("k").isNotNull()
    )
    v = s.select(
        "id",
        "k",
        F.explode(
            F.array_append(
                F.expr(
                    "transform(sequence(1, length(k)),"
                    " i -> concat(substr(k, 1, i-1), substr(k, i+1, length(k))))"
                ),
                F.col("k"),
            )
        ).alias("var"),
    )
    hot = v.groupBy("var").agg(F.count("*").alias("__df")).filter(F.col("__df") > max_df)
    v = v.join(F.broadcast(hot.select("var")), "var", "left_anti")
    a, b = v.alias("a"), v.alias("b")
    cand = (
        a.join(b, (F.col("a.var") == F.col("b.var")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.col("a.k").alias("ak"),
            F.col("b.k").alias("bk"),
        )
        .distinct()
    )
    return cand.filter(F.levenshtein("ak", "bk") <= 1).select(
        "a_id", "b_id", F.levenshtein("ak", "bk").cast("long").alias("dist")
    )


def fuzzy_key_index(
    df: DataFrame,
    key_col: str,
    id_col: str,
) -> DataFrame:
    """The persistable FastSS state of a key corpus: (id, k, var) —
    one row per deletion-neighborhood variant (the key itself plus
    each single-character deletion). Write it once, append new
    batches' variants, and run :func:`fuzzy_key_pairs_incremental`
    against it — the same persisted-index discipline as the MinHash /
    embedding / PQ incremental faces."""
    s = df.select(F.col(id_col).alias("id"), F.col(key_col).alias("k")).filter(
        F.col("k").isNotNull()
    )
    return s.select(
        "id",
        "k",
        F.explode(
            F.array_append(
                F.expr(
                    "transform(sequence(1, length(k)),"
                    " i -> concat(substr(k, 1, i-1), substr(k, i+1, length(k))))"
                ),
                F.col("k"),
            )
        ).alias("var"),
    )


def fuzzy_key_pairs_incremental(
    index: DataFrame,
    batch: DataFrame,
    key_col: str,
    id_col: str,
    max_df: int = 64,
) -> DataFrame:
    """Edit-distance-≤1 pairs INVOLVING a new batch, against a
    persisted :func:`fuzzy_key_index` — O(batch × block) instead of
    re-blocking the whole corpus: candidates are batch-variants ⋈
    (index ∪ batch-variants) restricted to pairs touching the batch,
    then the exact levenshtein verify. By the FastSS completeness
    property, ``pairs(corpus) ∪ incremental(batch, index(corpus)) ==
    pairs(corpus ∪ batch)`` WHENEVER no block's document frequency
    crosses ``max_df`` at the corpus/union boundary — the
    decomposition contract the catalog entry value-gates against a
    one-shot oracle over the union.

    Cap semantics, precisely: THIS function caps blocks over the
    UNION universe (index + batch), so the incremental half drops
    exactly the blocks the one-shot run would drop. The BASE half of
    the decomposition (``fuzzy_key_pairs(corpus)``) caps over the
    corpus alone, so a block that is ≤ max_df in the corpus but
    > max_df in the union keeps its corpus-corpus pairs in the base
    run while the one-shot union run drops them — the decomposition
    is exact only when no block straddles the cap across the
    boundary (true at every catalog gate scope: customer-name blocks
    top out at 10, far under 64; the cap is a scale valve, not
    semantics). For an exact decomposition under a binding cap,
    rebuild the base pairs against the union block list, or raise
    ``max_df`` past the hottest expected block."""
    bvar = fuzzy_key_index(batch, key_col, id_col)
    allvar = index.unionByName(bvar)
    hot = (
        allvar.groupBy("var").agg(F.count("*").alias("__df")).filter(F.col("__df") > max_df)
    )
    allvar = allvar.join(F.broadcast(hot.select("var")), "var", "left_anti")
    bv = bvar.join(F.broadcast(hot.select("var")), "var", "left_anti")
    a, b = bv.alias("a"), allvar.alias("b")
    cand = (
        a.join(b, (F.col("a.var") == F.col("b.var")) & (F.col("a.id") != F.col("b.id")))
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("a_id"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("b_id"),
            F.when(F.col("a.id") < F.col("b.id"), F.col("a.k"))
            .otherwise(F.col("b.k"))
            .alias("ak"),
            F.when(F.col("a.id") < F.col("b.id"), F.col("b.k"))
            .otherwise(F.col("a.k"))
            .alias("bk"),
        )
        .distinct()
    )
    return cand.filter(F.levenshtein("ak", "bk") <= 1).select(
        "a_id", "b_id", F.levenshtein("ak", "bk").cast("long").alias("dist")
    )


def cluster_stats(
    clusters: DataFrame,
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Dedup savings report from a cluster labeling — the sizing
    answer every dedup run ends with ("how much does removal buy?"):
    one row per observed CLUSTER SIZE with (cluster_size, n_clusters,
    n_docs, removable), where removable = (size-1)·count is the rows a
    keep-one-per-cluster pass deletes at that size. All-integer
    output, exact in any engine.

    Scale: two shuffles over the cluster table (component-sized, far
    smaller than the corpus) — sizes then the histogram; the heavy
    work already happened in the pair generator + CC."""
    sizes = clusters.groupBy(cluster_col).agg(F.count("*").alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters"),
        (F.col("cluster_size") * F.count("*")).alias("n_docs"),
        ((F.col("cluster_size") - F.lit(1)) * F.count("*")).alias("removable"),
    )


def keep_best_per_cluster(
    docs: DataFrame,
    clusters: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """The dedup DECISION: reduce the corpus to one document per
    near-dup cluster, chosen by the highest ``score_col`` (quality
    score, length, recency — ties break to the smallest id for
    determinism), with every unclustered document kept as-is. This is
    the keep-best policy C4/RefinedWeb-style pipelines apply after
    clustering — keep-first loses the best copy whenever crawl order
    and quality disagree.

    ``clusters`` is :func:`duplicate_clusters` output ((doc_id,
    cluster_id) for CLUSTERED docs only). Unclustered docs get a left
    join miss and bypass the window entirely — routing them through a
    NULL cluster_id partition would funnel the whole non-duplicate
    corpus (the vast majority) into ONE reducer; splitting keeps the
    window strictly cluster-sized. One broadcast-or-shuffle join + a
    per-cluster window over cluster-sized groups: O(corpus) with no
    skyline task at 100 TB."""
    from pyspark.sql import Window

    if "cluster_id" in docs.columns:
        raise ValueError(
            "docs already has a cluster_id column — rename it before "
            "keep_best_per_cluster (the join would be ambiguous)"
        )
    if id_col != "doc_id":
        # duplicate_clusters emits (doc_id, cluster_id); align its id
        # column to the caller's so a custom id_col actually works
        clusters = clusters.select(F.col("doc_id").alias(id_col), "cluster_id")
    labeled = docs.join(clusters, id_col, "left")
    keep_single = labeled.filter(F.col("cluster_id").isNull()).select(*docs.columns)
    w = Window.partitionBy("cluster_id").orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    keep_best = (
        labeled.filter(F.col("cluster_id").isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*docs.columns)
    )
    return keep_single.unionByName(keep_best)


def contamination_radius(
    pairs: DataFrame,
    seeds: DataFrame,
    max_hops: int = 2,
    a_col: str = "a_id",
    b_col: str = "b_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Transitive contamination: (doc_id, hops) for every document
    within ``max_hops`` of a seed in the near-dup pair graph — hops is
    the BFS distance (0 = the seed itself).

    Direct decontamination (:func:`decontaminate_against`) removes
    documents that MATCH a benchmark; but a near-duplicate of a
    matching document carries most of the same text and leaks the
    benchmark just as well — the standard eval-hygiene move is to drop
    the seed's whole near-dup neighborhood, usually 1-2 hops. This is
    the bounded-radius companion of :func:`duplicate_clusters`
    (unbounded components over-delete: a long similarity chain drags
    in documents that share nothing with the benchmark).

    Scale shape: ``max_hops`` rounds of (frontier ⋈ edges) — each
    round one equi-join shuffled on the id plus an anti-join against
    the visited set (first-reach ≡ min-hops, so no per-node min
    aggregation is needed); a ``localCheckpoint`` per round truncates
    the iterative lineage, the duplicate_clusters discipline. The
    frontier is candidate-sized, never corpus-sized."""
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .unionByName(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    visited = (
        seeds.select(F.col(id_col).alias("doc_id"))
        .distinct()
        .withColumn("hops", F.lit(0))
        .localCheckpoint()
    )
    frontier = visited
    for h in range(1, max_hops + 1):
        nxt = (
            edges.join(frontier.select(F.col("doc_id").alias("u")), "u", "left_semi")
            .select(F.col("v").alias("doc_id"))
            .distinct()
            .join(visited.select("doc_id"), "doc_id", "left_anti")
            .withColumn("hops", F.lit(h))
            .localCheckpoint()
        )
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return visited


def incremental_exact_dedup(
    batch: DataFrame,
    seen_hashes: DataFrame,
    text_col: str = "text",
    hash_col: str = "text_hash",
    id_col: str = "doc_id",
) -> DataFrame:
    """Admit only NEW documents: batch rows whose content hash appears
    neither in the historical corpus index (``seen_hashes``, one
    ``text_hash`` column — the 32-byte/doc digest table a pipeline
    maintains) nor earlier in the batch itself (first = min doc_id).
    Returns the admitted batch rows plus their ``text_hash`` (append
    it to the index after ingest).

    The daily-crawl pattern: full-corpus re-dedup per increment is
    O(corpus) every day; against a digest index the increment costs
    one left_anti equi-join on the digest (batch-side shuffle only —
    the index side is pre-reduced and can be bucketed by hash so the
    join co-locates) plus a within-batch first-row window. The text
    column never shuffles."""
    # NULL text has no content identity: drop it up front. (This also
    # keeps SQL parity well-defined — a NULL hash never matches in a
    # left_anti but poisons a NOT IN, the classic three-valued-logic
    # divergence.)
    hashed = batch.filter(F.col(text_col).isNotNull()).withColumn(
        hash_col, F.md5(F.col(text_col))
    )
    # no .distinct() on the index side: duplicates in an anti-join
    # build side are harmless, and re-aggregating the ENTIRE
    # historical index per daily batch would defeat the point
    fresh = hashed.join(seen_hashes.select(hash_col), hash_col, "left_anti")
    from pyspark.sql import Window

    w = Window.partitionBy(hash_col).orderBy(id_col)
    return (
        fresh.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def benchmark_contamination(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: per training document, how many of
    its distinct ``n``-gram shingles appear anywhere in the benchmark
    corpus — (doc_id, n_ngrams, n_hit_ngrams, contaminated).

    The GPT-3/Llama eval-leakage check: a training document sharing
    even one long n-gram (13 words is the published convention) with
    an eval benchmark inflates downstream scores and must be dropped
    or flagged before training. Expressed as one equi-join: train
    shingles (doc_id, hash) against the DISTINCT benchmark shingle-
    hash set, then a per-document count. The benchmark side is a
    fixed eval suite — usually broadcast-sized — but the join stays
    UNHINTED: AQE broadcasts it when it is actually small, and a
    pathologically large benchmark degrades to a shuffle join instead
    of a driver OOM (the same policy as the LSH verify join).

    Documents shorter than ``n`` tokens have no shingles; they appear
    with n_ngrams = 0 and contaminated = false rather than vanishing,
    so the output is a total function of the training corpus."""
    train_sh = _hashed_shingles(train, text_col, n)
    bench_sh = _hashed_shingles(benchmark, text_col, n).select("h").distinct()
    totals = train_sh.groupBy("doc_id").agg(F.count("*").alias("n_ngrams"))
    hits = (
        train_sh.join(bench_sh, "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit_ngrams"))
    )
    return (
        train.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce("n_hit_ngrams", F.lit(0)).alias("n_hit_ngrams"),
            (F.coalesce("n_hit_ngrams", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


def dup_span_stats(
    docs: DataFrame,
    text_col: str = "text",
    span: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document duplicated-span profile: per document, how many
    of its distinct ``span``-token windows also occur in at least
    ``min_docs`` documents (itself included) —
    (doc_id, n_spans, n_dup_spans, dup_fraction).

    The corpus-level complement of the intra-document repetition
    stats (text.with_repetition_stats): sliding windows of ``span``
    tokens catch a duplicated run at ANY alignment (every duplicated
    substring of ≥ span tokens contains a duplicated span-window), so
    this is the fixed-granularity form of exact substring dedup
    (Lee et al., "Deduplicating Training Data", use suffix arrays for
    variable-length spans; fixed windows trade maximality for a pure
    equi-join plan). High dup_fraction marks boilerplate and
    near-copies for removal before training.

    Plan shape at 100 TB: explode distinct windows (rows ∝ corpus
    tokens), aggregate window→distinct-doc-count on an 8-byte
    xxhash64 key (one digest shuffle, never the text), left-join the
    flagged-window set back (unhinted — AQE broadcasts the usually
    tiny duplicated set, degrades to a digest shuffle join otherwise),
    then one per-document count. Linear throughout; no pairwise
    compare. Hash collisions (~2⁻⁶⁴ per window pair) can overcount a
    span's doc frequency — the standard xxhash64 caveat shared with
    _hashed_shingles. Documents shorter than ``span`` tokens appear
    with n_spans = 0 rather than vanishing (total function of the
    corpus, same policy as benchmark_contamination)."""
    sh = tracked_persist(
        shingle_df(docs, text_col, n=span).select(
            "doc_id", F.xxhash64("shingle").alias("h")
        )
    )
    dup_spans = (
        sh.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("h", F.lit(True).alias("__dup"))
    )
    per_doc = (
        sh.join(dup_spans, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.count("__dup").alias("n_dup_spans"),  # count() skips the null non-dups
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.round(
                # 38,12: an 18,12 decimal holds only 6 integer digits —
                # a ≥1M-window document would overflow the cast (NULL
                # fraction, or a hard error under ANSI mode)
                F.coalesce("n_dup_spans", F.lit(0)).cast("decimal(38,12)")
                / F.greatest(F.coalesce("n_spans", F.lit(0)), F.lit(1)),
                6,
            )
            .cast("double")
            .alias("dup_fraction"),
        )
    )


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_distance: int = 1,
) -> DataFrame:
    """Record-linkage pairs by edit distance: (a_id, b_id, distance ≤
    max_distance) over a name/key column — the entity-resolution
    sibling of the text near-dup family.

    Blocking by the pigeonhole principle: each name splits into
    ``max_distance + 1`` positional segments; two equal-length names
    within distance d must agree on at least one segment (d edits
    cannot touch d+1 segments), so the candidate join runs on
    (segment_index, segment_text) equality — never an all-pairs
    product — and candidates are verified with exact ``levenshtein``.
    Recall is COMPLETE for equal-length (substitution-only) pairs;
    pairs of different lengths are found only when an aligned segment
    survives the shift (use q-gram blocking where insertions
    dominate). The quadratic all-pairs form exists only as the
    small-n oracle in the catalog entry."""
    n_seg = max_distance + 1
    name = F.col(name_col)
    ln = F.length(name)
    # positional segments over each name's own length: segment i spans
    # [floor(i*len/n), floor((i+1)*len/n)) — equal-length names agree
    # on boundaries, which is what the pigeonhole argument needs
    exploded = df.select(
        F.col(id_col).alias("rid"),
        name.alias("nm"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("si"),
                        name.substr(
                            (F.floor(ln * i / n_seg) + 1).cast("int"),
                            (F.floor(ln * (i + 1) / n_seg) - F.floor(ln * i / n_seg)).cast(
                                "int"
                            ),
                        ).alias("seg"),
                    )
                    for i in range(n_seg)
                ]
            )
        ).alias("s"),
    ).select("rid", "nm", F.col("s.si"), F.col("s.seg"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.si") == F.col("b.si"))
            & (F.col("a.seg") == F.col("b.seg"))
            & (F.col("a.rid") < F.col("b.rid")),
        )
        .select(
            F.col("a.rid").alias("a_id"),
            F.col("b.rid").alias("b_id"),
            F.col("a.nm").alias("an"),
            F.col("b.nm").alias("bn"),
        )
        .distinct()
    )
    return (
        candidates.withColumn("distance", F.levenshtein("an", "bn"))
        .filter(F.col("distance") <= max_distance)
        .select("a_id", "b_id", "distance")
    )


def cdc_chunk_hashes(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 16,
    mask_bits: int = 6,
    min_chunk: int = 32,
    max_chunk: int = 256,
) -> DataFrame:
    """Content-defined chunking (Rabin-style rolling hash) →
    (doc_id, chunk_idx, chunk_len, chunk_hash) — the shift-resistant
    document fingerprint.

    A boundary falls where the ``window``-byte rolling hash has its
    low ``mask_bits`` bits zero (expected chunk ≈ 2^mask_bits bytes),
    clamped to [min_chunk, max_chunk]. Because boundaries depend on
    CONTENT, inserting or deleting bytes early in a document only
    perturbs the chunks that contain the edit — downstream chunk-hash
    dedup still matches the untouched remainder, which fixed-size
    chunking and whole-document hashing both lose. This is the
    storage/dedup trick (rsync, LBFS, backup dedupe) applied to
    training-corpus near-dup detection for LONG documents.

    Execution: mapInPandas; the rolling hash is one vectorized uint64
    sliding-window dot product per document (wraparound multiply-add
    IS mod-2^64 arithmetic), no per-byte Python. One output row per
    chunk — downstream grouping on chunk_hash finds shared content
    across documents with a plain shuffle, never a pairwise compare."""
    import hashlib
    from typing import Iterator

    P = np.uint64(1099511628211)  # FNV-64 prime
    kernel = P ** np.arange(window - 1, -1, -1, dtype=np.uint64)
    mask = np.uint64((1 << mask_bits) - 1)

    def chunk_one(data: bytes) -> list[tuple[int, int, str]]:
        n = len(data)
        if n == 0:
            return []
        if n <= window:
            return [(0, n, hashlib.md5(data).hexdigest())]
        b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        win = np.lib.stride_tricks.sliding_window_view(b, window)
        h = (win * kernel).sum(axis=1, dtype=np.uint64)  # wraparound == mod 2^64
        cut_positions = np.nonzero((h & mask) == 0)[0] + window  # cut AFTER the window
        bounds = []
        start = 0
        for c in cut_positions:
            if c - start < min_chunk:
                continue
            while c - start > max_chunk:  # force-split oversized runs
                bounds.append(start + max_chunk)
                start += max_chunk
            bounds.append(int(c))
            start = int(c)
        while n - start > max_chunk:
            bounds.append(start + max_chunk)
            start += max_chunk
        if start < n:
            bounds.append(n)
        out = []
        prev = 0
        for i, end in enumerate(bounds):
            piece = data[prev:end]
            out.append((i, len(piece), hashlib.md5(piece).hexdigest()))
            prev = end
        return out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, txt in zip(pdf["doc_id"], pdf[text_col]):
                if txt is None:
                    continue
                for idx, ln, hx in chunk_one(str(txt).encode("utf-8")):
                    rows.append((doc_id, idx, ln, hx))
            yield pd.DataFrame(
                rows, columns=["doc_id", "chunk_idx", "chunk_len", "chunk_hash"]
            )

    return docs.select("doc_id", text_col).mapInPandas(
        run, "doc_id long, chunk_idx int, chunk_len int, chunk_hash string"
    )


def cdc_shared_chunk_pairs(
    docs: DataFrame,
    min_shared: int = 2,
    text_col: str = "text",
    max_df: int = 100,
    **chunk_kw,
) -> DataFrame:
    """Near-dup candidates for LONG documents: pairs sharing at least
    ``min_shared`` content-defined chunks — (a_id, b_id, shared_chunks).
    Posting-list form over chunk_hash (one groupBy, pair emission per
    list): the same no-self-join shape as the shingle path, with the
    same document-frequency cap — a boilerplate chunk (license header,
    shared template) in L documents would otherwise emit L²/2 pairs
    from one posting list. Chunks in more than ``max_df`` documents
    are dropped as non-discriminative, bounding pair output at
    max_df²/2 per chunk."""
    ch = cdc_chunk_hashes(docs, text_col, **chunk_kw).select(
        "doc_id", "chunk_hash"
    ).distinct()
    posting = (
        ch.groupBy("chunk_hash")
        .agg(F.collect_list("doc_id").alias("docs"))
        .filter(F.size("docs") <= max_df)
    )
    docs_sorted = F.array_sort(F.col("docs"))
    pair_arrays = F.flatten(
        F.transform(
            docs_sorted,
            lambda x, i: F.transform(
                F.slice(docs_sorted, i + 2, F.size(docs_sorted)),
                lambda y: F.struct(x.alias("a_id"), y.alias("b_id")),
            ),
        )
    )
    return (
        posting.select(F.explode(pair_arrays).alias("p"))
        .select("p.a_id", "p.b_id")
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("shared_chunks"))
        .filter(F.col("shared_chunks") >= min_shared)
    )


def simhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash: bigint) — 64-bit SimHash over token xxhash64s:
    per bit, sum +1/-1 across tokens; bit set where the sum is positive.

    Token hashing stays JVM-side (transform + xxhash64, no explode or
    shuffle — the token array never leaves its row); the 64 bit-votes
    are packed by one Arrow-vectorized numpy kernel per batch. The
    pure-Column form (64 conditional sums over exploded tokens) spends
    ~2× the time in a shuffle plus a 64-aggregate codegen; this is the
    same Catalyst-pathology escape hatch as the hyperplane signature
    matmul in operators/similarity.py. Docs with no tokens produce no
    signature row (matching the grouped-aggregation semantics)."""

    @F.pandas_udf("bigint")
    def sim_udf(hs: pd.Series) -> pd.Series:
        shifts = np.arange(64, dtype=np.uint64)
        out = []
        for h in hs:
            a = np.asarray(h, dtype=np.int64).view(np.uint64)
            bits = ((a[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            sums = (2 * bits - 1).sum(axis=0)
            packed = np.bitwise_or.reduce(((sums > 0).astype(np.uint64) << shifts))
            out.append(int(packed.astype(np.int64)))
        return pd.Series(out, dtype="int64")

    hashed = docs.select(
        "doc_id",
        F.transform(tokens_col(F.col(text_col)), lambda t: F.xxhash64(t)).alias("hs"),
    ).filter(F.size("hs") > 0)
    return hashed.select("doc_id", sim_udf("hs").alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3, text_col: str = "text") -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance ≤ max_hamming.

    Banding by ``max_hamming + 1`` bit-chunks: the pigeonhole principle
    needs ONE chunk untouched by the differing bits, so the chunk count
    follows the threshold (a fixed 4-chunk split is only
    recall-complete for hamming ≤ 3 — a larger threshold would
    silently miss pairs). Exact hamming verify via bit_count(xor).

    Signatures persist across the banding self-join: without it both
    join sides (and their exploded chunk branches) re-run the Arrow
    signature kernel — one Python evaluation of the corpus per branch
    in the physical plan. The cache is released by the harness between
    catalog entries (operators/_caches.py)."""
    if not 0 <= max_hamming <= 31:
        raise ValueError(f"max_hamming must be in [0, 31], got {max_hamming}")
    n_chunks = max_hamming + 1
    width = 64 // n_chunks  # the last chunk absorbs the remainder bits
    sig = tracked_persist(simhash_signatures(docs, text_col))

    def chunk_bits(c: int):
        w = 64 - c * width if c == n_chunks - 1 else width
        if w >= 64:
            # single-chunk split (max_hamming=0): the full signature IS
            # the chunk — a 64-bit mask literal (2^64-1) does not fit
            # LongType, so skip the mask entirely
            return F.col("simhash")
        mask = (1 << w) - 1
        return F.shiftright(F.col("simhash"), c * width).bitwiseAND(F.lit(mask))

    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk_id"),
                    chunk_bits(c).alias("chunk"),
                )
                for c in range(n_chunks)
            ])
        ).alias("ch"),
    ).select("doc_id", "simhash", F.col("ch.chunk_id"), F.col("ch.chunk"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 5,
    text_col: str = "text",
    max_df: Optional[int] = None,
    candidate_budget: Optional[int] = None,
) -> DataFrame:
    """Asymmetric shingle containment: pairs where the SMALLER
    document's shingle set is mostly inside the larger one's —
    (a_id, b_id, n_a, n_b, n_common, containment ≥ threshold), with
    containment = |S(a) ∩ S(b)| / min(|S(a)|, |S(b)|), rounded to 6.

    Jaccard misses quote-inclusion: a short document fully embedded
    in a long one has Jaccard ≈ |short|/|long| (arbitrarily low) but
    containment 1.0. This is the Broder containment metric — the
    right lens for "doc B is doc A plus boilerplate" and for
    benchmark-in-training-page leaks, both of which matter for
    training-corpus prep in ways symmetric near-dup does not.

    Plan shape is the same scale-safe posting-list form as
    :func:`ngram_jaccard_pairs` (one groupBy on the 8-byte shingle
    hash, df-capped lists, ordered pairs emitted from each list with
    array HOFs — no self-join on the shingle set, pair output bounded
    by max_df²/2 per shingle). The threshold filter runs in integer
    arithmetic (c·1000 ≥ ⌊th·1000⌋·min) so an oracle engine with
    different float rounding cannot diverge at the boundary.

    ``candidate_budget`` (r12): containment shares ngram_jaccard's
    below-cap quadratic region, so it gets the same guard — posting
    mass Σ C(df,2) over the retained lists is measured first (one
    aggregation) and the call raises :class:`HotCorpusError` above
    the budget. No auto-route here: containment is ASYMMETRIC, and
    the MinHash S-curve certifies symmetric Jaccard, not the
    min-normalized metric — the error names per-doc blocking and
    :func:`minhash_lsh_pairs`-prefiltering as the manual paths.

    Reference parity note: the reference (InnovaCo/hyper-storage) is a
    document store with no corpus analytics; this extends the dedup
    tier mandated by the build brief, not a reference operator."""
    sh = _hashed_shingles(docs, text_col, n)
    posting = sh.groupBy("h").agg(F.collect_list("doc_id").alias("docs"))
    if max_df is not None:
        posting = posting.filter(F.size("docs") <= max_df)
    # persist BEFORE the budget probe: the probe's aggregation then
    # materializes the same cached frame the pair generation consumes,
    # so the guard costs one cache fill, not a second full shingle
    # shuffle
    posting = tracked_persist(posting)
    if candidate_budget is not None:
        mass = posting.agg(
            F.coalesce(
                F.sum(F.size("docs") * (F.size("docs") - 1) / 2), F.lit(0.0)
            ).alias("m")
        ).collect()[0]["m"]
        if mass > candidate_budget:
            raise HotCorpusError(
                f"posting mass {int(mass)} candidate pairs exceeds "
                f"candidate_budget={candidate_budget} — containment's pair "
                "explosion is quadratic below the df cap on this corpus; "
                "pre-block the documents (or prefilter candidates with "
                "minhash_lsh_pairs and verify containment on the survivors)"
            )
    docs_sorted = F.array_sort(F.col("docs"))
    pair_arrays = F.flatten(
        F.transform(
            docs_sorted,
            lambda x, i: F.transform(
                F.slice(docs_sorted, i + 2, F.size(docs_sorted)),
                lambda y: F.struct(x.alias("a_id"), y.alias("b_id")),
            ),
        )
    )
    inter = (
        posting.select(F.explode(pair_arrays).alias("p"))
        .select("p.a_id", "p.b_id")
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_common"))
    )
    sizes = (
        posting.select(F.explode("docs").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_sh"))
    )
    th_milli = int(round(threshold * 1000))
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("a_id") == F.col("sa.doc_id"))
        .join(sb, F.col("b_id") == F.col("sb.doc_id"))
        .select(
            "a_id",
            "b_id",
            F.col("sa.n_sh").alias("n_a"),
            F.col("sb.n_sh").alias("n_b"),
            "n_common",
            F.round(
                F.col("n_common").cast("decimal(38,12)")
                / F.least(F.col("sa.n_sh"), F.col("sb.n_sh")),
                6,
            )
            .cast("double")
            .alias("containment"),
        )
        .filter(
            F.col("n_common") * 1000
            >= F.lit(th_milli) * F.least(F.col("n_a"), F.col("n_b"))
        )
    )


def remove_dup_spans(
    docs: DataFrame,
    text_col: str = "text",
    span: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document duplicated-span REMOVAL — the rewrite op that
    :func:`dup_span_stats` only profiles: per document, drop every
    token position covered by a ``span``-token window that occurs in
    ≥ ``min_docs`` documents, and return
    (doc_id, n_tokens, n_removed, keep_fraction, clean_hash) where
    clean_hash = md5 of the surviving tokens joined by single spaces
    (the value an exact-SQL oracle can recompute).

    This is the fixed-granularity form of exact substring dedup (Lee
    et al., "Deduplicating Training Data Makes Language Models
    Better"): any duplicated run of ≥ span tokens contains a
    duplicated window, so removing covered positions removes every
    such run (plus ≤ span−1 boundary tokens per run — the price of
    equi-join-only planning vs suffix arrays). Documents shorter than
    ``span`` tokens pass through untouched (n_removed = 0).

    Plan shape at 100 TB: one explode of per-doc window hashes (rows ∝
    corpus tokens, 8-byte keys), one groupBy window-hash →
    distinct-doc count, join the flagged set back (unhinted — AQE
    broadcasts the usually small duplicated set), collect each doc's
    flagged START positions (≤ tokens/1 per doc, usually tiny), and
    rebuild the text with array HOFs inside codegen — the token
    arrays never shuffle; only (doc_id, start) pairs do. Same
    xxhash64 collision caveat as dup_span_stats."""
    toks = docs.select("doc_id", tokens_col(F.col(text_col)).alias("toks"))
    toks = tracked_persist(toks)
    # (doc_id, start, h) for every span-window; 1-based starts
    wins = toks.select(
        "doc_id",
        F.posexplode(
            F.when(
                F.size("toks") >= span,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - span + 1),
                    lambda i: F.xxhash64(
                        F.concat_ws("\x1f", F.slice(F.col("toks"), i, span))
                    ),
                ),
            ).otherwise(F.array())
        ).alias("pos0", "h"),
    ).select("doc_id", (F.col("pos0") + 1).alias("start"), "h")
    dup = (
        wins.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("h")
    )
    flagged = (
        wins.join(dup, "h")
        .groupBy("doc_id")
        .agg(F.collect_set("start").alias("starts"))
    )
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.col("starts"), lambda s: F.sequence(s, s + span - 1)
            )
        )
    )
    return (
        toks.join(flagged, "doc_id", "left")
        .select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            F.coalesce(F.col("starts"), F.array()).alias("starts"),
            "toks",
        )
        .select(
            "doc_id",
            "n_tokens",
            F.size(covered).alias("n_removed"),
            F.filter(
                F.col("toks"),
                lambda t, i: ~F.array_contains(covered, i + 1),
            ).alias("kept"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_removed",
            F.round(
                (F.col("n_tokens") - F.col("n_removed")).cast("decimal(38,12)")
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            )
            .cast("double")
            .alias("keep_fraction"),
            F.md5(F.concat_ws(" ", F.col("kept"))).alias("clean_hash"),
        )
    )


def jaccard_threshold_profile(
    docs: DataFrame,
    thresholds: Sequence[float] = (0.3, 0.5, 0.7, 0.9),
    n: int = 3,
    text_col: str = "text",
    max_df: Optional[int] = None,
) -> DataFrame:
    """How many near-dup pairs each threshold would keep — one row per
    threshold: (threshold, n_pairs, n_docs_affected). The tuning view
    for "where do I set the dedup cutoff": pair volume and blast
    radius (distinct docs in ≥1 pair) as the knob moves, from ONE
    posting-list pass (the pair similarities are computed once at the
    loosest threshold; each stricter row is a filtered count, not a
    re-join).

    Jaccard here is an exact ratio of integer shingle-set sizes, so
    thresholding is engine-exact; the profile inherits
    :func:`ngram_jaccard_pairs`'s df-cap semantics."""
    if not thresholds:
        raise ValueError("at least one threshold required")
    lo = min(thresholds)
    pairs = ngram_jaccard_pairs(docs, threshold=lo, n=n, text_col=text_col, max_df=max_df)
    pairs = tracked_persist(pairs)
    out = None
    for t in sorted(thresholds):
        at = pairs.filter(F.col("jaccard") >= t)
        docs_at = at.select(F.explode(F.array("a_id", "b_id")).alias("d"))
        row = at.agg(F.count("*").alias("n_pairs")).crossJoin(
            docs_at.agg(F.count_distinct("d").alias("n_docs_affected"))
        ).select(
            F.lit(float(t)).alias("threshold"), "n_pairs", "n_docs_affected"
        )
        out = row if out is None else out.unionAll(row)
    return out


def streaming_corpus_stats(
    state_root: str,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    run_id: "str | None" = None,
    n_index_buckets: int = 64,
):
    """``foreachBatch`` sink for the STREAMING corpus-prep capstone:
    exact-dedup every micro-batch against the persisted digest index
    (:func:`incremental_exact_dedup` — the daily-crawl face, driven
    continuously) and maintain per-language (n_docs, n_chars)
    statistics over the UNIQUE documents only. After any prefix of
    the stream, the state equals the batch pipeline (dedup keep-first
    + grouped stats) over all rows so far — the invariant the pytest
    pins across cross-batch duplicates and replays.

    State per version: the digest index (one 32-byte hash per unique
    document — the data-proportional piece, exactly what the batch
    incremental pipeline persists anyway), a group-cardinality stats
    parquet, and the shared pointer/replay-guard discipline
    (operators/rollup_mv.py) so at-least-once delivery cannot
    double-count.

    The digest index is LSM-sharded into ``n_index_buckets`` hash
    buckets of the digest (round-11 scale fix): each batch APPENDS one
    delta file per touched bucket holding only its NEWLY admitted
    digests — O(batch) bytes written per batch, never O(corpus) (the
    unsharded sink rewrote the whole index every batch). A bucket
    whose delta chain exceeds ``_COMPACT_AT`` files is compacted —
    rewritten as one file — in the same commit; compaction cost is
    O(that bucket) and amortizes over the ≥``_COMPACT_AT`` batches
    that grew the chain, so per-batch amortized index IO stays
    O(batch + corpus/``n_index_buckets``·touched-overfull). Reads
    (the dedup anti-join) union only the touched buckets' chains;
    dedup completeness is unaffected because a duplicate of a batch
    digest can only live in that digest's own bucket. The
    bucket→chain map rides in the pointer; a pre-sharding state dir
    is migrated in one partitioned rewrite on its first batch. Per
    batch: one anti-join on the touched buckets (batch-side shuffle
    only), one within-batch first-row window, one stats merge by
    union+sum on the language key, one partitioned delta write. Read
    back with :func:`read_corpus_stats`."""
    import os

    from .rollup_mv import (
        _flip_pointer,
        _is_replayed_batch,
        _read_pointer,
        _warn_if_anonymous,
    )

    if n_index_buckets < 1:
        raise ValueError(f"n_index_buckets must be >= 1, got {n_index_buckets}")
    label = f"streaming_corpus_stats({state_root!r})"
    _warn_if_anonymous(run_id, label)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(state_root, exist_ok=True)
        cur = _read_pointer(state_root)
        if _is_replayed_batch(cur, batch_id, run_id, label):
            return
        spark = batch_df.sparkSession
        version = (cur["version"] + 1) if cur else 1
        # the STATE owns its bucketing: chains were keyed by the count
        # the dir was built with, so a restart passing a different
        # n_index_buckets must use the persisted value — hashing into
        # a different modulus would miss the existing chains, re-admit
        # duplicates, and silently corrupt dedup AND stats
        eff_buckets = int(cur.get("n_index_buckets", n_index_buckets)) if cur else n_index_buckets
        if cur is not None and eff_buckets != n_index_buckets:
            import warnings

            warnings.warn(
                f"{label}: state dir was built with n_index_buckets="
                f"{eff_buckets}; ignoring the configured {n_index_buckets}",
                RuntimeWarning,
                stacklevel=2,
            )

        def _bucket_of(col):
            return F.pmod(F.xxhash64(col), F.lit(eff_buckets)).cast("int")
        # bucket -> delta-file chain (oldest first)
        buckets_map: dict = {
            k: list(v) for k, v in (cur.get("buckets", {}) if cur else {}).items()
        }
        if cur is not None and "buckets" not in cur:
            # one-time migration of a pre-sharding state dir: bucket
            # the monolithic index in ONE partitioned write
            legacy = spark.read.parquet(os.path.join(state_root, cur["index"]))
            rel_mig = f"v{version:06d}_migrated"
            legacy.withColumn("__b", _bucket_of(F.col("text_hash"))).write.partitionBy(
                "__b"
            ).mode("overwrite").parquet(os.path.join(state_root, rel_mig))
            buckets_map = {
                str(k): [f"{rel_mig}/__b={k}"]
                for k in range(eff_buckets)
                if os.path.isdir(os.path.join(state_root, rel_mig, f"__b={k}"))
            }
        if cur is not None:
            prev_stats = spark.read.parquet(os.path.join(state_root, cur["stats"]))
        else:
            prev_stats = spark.createDataFrame(
                [], f"{lang_col} string, n_docs long, n_chars long"
            )

        # the batch's digests decide which index buckets this batch
        # touches — only their delta chains are read
        batch_digests = (
            batch_df.filter(F.col(text_col).isNotNull())
            .select(F.md5(F.col(text_col)).alias("text_hash"))
            .withColumn("__b", _bucket_of(F.col("text_hash")))
        )
        touched = sorted(
            r["__b"] for r in batch_digests.select("__b").distinct().collect()
        )
        paths = [
            os.path.join(state_root, rel)
            for k in touched
            for rel in buckets_map.get(str(k), ())
        ]
        seen = (
            spark.read.parquet(*paths).select("text_hash")
            if paths
            else spark.createDataFrame([], "text_hash string")
        )
        # admitted feeds TWO actions (the stats write and the digest-
        # delta write); unpersisted, the whole admit pipeline — md5,
        # touched-chain read, left_anti join, first-row window — ran
        # twice per micro-batch, doubling the per-batch latency floor
        # (review r12). Persist for the batch, release before return:
        # in a long-running stream a tracked-but-unreleased per-batch
        # cache would accumulate until the harness hook runs.
        admitted = incremental_exact_dedup(
            batch_df, seen, text_col=text_col, id_col=id_col
        ).persist()
        try:
            delta = admitted.groupBy(lang_col).agg(
                F.count("*").alias("n_docs"),
                F.sum(F.length(text_col)).alias("n_chars"),
            )
            stats = (
                prev_stats.unionByName(delta)
                .groupBy(lang_col)
                .agg(F.sum("n_docs").alias("n_docs"), F.sum("n_chars").alias("n_chars"))
            )
            rel_st = f"v{version:06d}_stats"
            stats.write.mode("overwrite").parquet(os.path.join(state_root, rel_st))

            # APPEND one delta per touched bucket: O(batch) bytes, one
            # job. repartition("__b") first — ONE file per bucket dir:
            # writing straight from the cached frame fans every storage
            # partition into every dir (measured 5× the bytes in pure
            # parquet footer overhead), and chain length is read
            # amplification
            rel_delta = f"v{version:06d}_delta"
            admitted.select("text_hash").withColumn(
                "__b", _bucket_of(F.col("text_hash"))
            ).repartition(F.col("__b")).write.partitionBy("__b").mode(
                "overwrite"
            ).parquet(os.path.join(state_root, rel_delta))
        finally:
            admitted.unpersist()
        for k in touched:
            if os.path.isdir(os.path.join(state_root, rel_delta, f"__b={k}")):
                buckets_map.setdefault(str(k), []).append(f"{rel_delta}/__b={k}")

        # compact overfull chains (one partitioned job for all of
        # them): read-amplification stays ≤ _COMPACT_AT files/bucket,
        # cost amortizes over the batches that grew each chain
        overfull = [k for k, chain in buckets_map.items() if len(chain) > _COMPACT_AT]
        if overfull:
            rel_cmp = f"v{version:06d}_compact"
            src = spark.read.parquet(
                *[
                    os.path.join(state_root, rel)
                    for k in overfull
                    for rel in buckets_map[k]
                ]
            ).select("text_hash")
            src.withColumn("__b", _bucket_of(F.col("text_hash"))).write.partitionBy(
                "__b"
            ).mode("overwrite").parquet(os.path.join(state_root, rel_cmp))
            for k in overfull:
                buckets_map[k] = [f"{rel_cmp}/__b={k}"]

        _flip_pointer(
            state_root,
            {
                "version": version,
                "batch_id": batch_id,
                "buckets": buckets_map,
                "n_index_buckets": eff_buckets,
                "stats": rel_st,
                "run_id": run_id,
            },
        )

    return apply_batch


# delta files a bucket chain may hold before it is compacted into one
_COMPACT_AT = 8


def read_corpus_stats(spark, state_root: str) -> DataFrame:
    """Current per-language stats of a :func:`streaming_corpus_stats`
    state dir. Raises if no batch has committed yet."""
    import os

    from .rollup_mv import _read_pointer

    cur = _read_pointer(state_root)
    if cur is None:
        raise FileNotFoundError(f"no committed corpus-stats state under {state_root}")
    return spark.read.parquet(os.path.join(state_root, cur["stats"]))
