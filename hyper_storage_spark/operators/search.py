"""Full-text keyword search (BM25) over a ``documents``-shaped table.

The retrieval side of a training-data pipeline: given a small query
set, rank the corpus by BM25 — the lexical baseline every retrieval
stack keeps next to its embedding ANN (operators/similarity.py serves
the dense side; this is the sparse side).

Scale shape: the corpus is reduced ONCE to a posting-list table
(term, doc_id, tf) plus per-term document frequencies — at 100 TB
both are write-once artifacts you persist and reuse across query
batches. Scoring a query batch is then one equi-join of the (tiny)
query-term set against the postings (AQE broadcasts the query side),
a per-(query, doc) partial sum, and a per-query top-k window — no
scan of the raw text at query time, no driver-side scoring.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens_col


def term_postings(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, doc_id, tf) term frequencies — the inverted index rows.

    One explode + one groupBy of (doc_id, term); the text never leaves
    the scan stage. Persist/bucket this by term for reuse at scale."""
    return (
        docs.select("doc_id", F.explode(tokens_col(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    postings: Optional[DataFrame] = None,
) -> DataFrame:
    """Top-``k`` BM25 hits per query: (query_id, doc_id, score, rank).

    ``queries`` is (query_id, query) — a query BATCH, small relative to
    the corpus. Okapi BM25 with the standard Robertson idf
    ``ln(1 + (N - df + 0.5) / (df + 0.5))``; ties broken by doc_id so
    the result is a deterministic set. Scores are rounded to 6 places
    AFTER ranking (ranking runs on full doubles).

    Plan: postings ⨝ query-terms (unhinted — AQE broadcasts the query
    side), partial scores summed per (query_id, doc_id), top-k by a
    rank window partitioned by query_id. The N/avgdl corpus scalars
    ride in on a 1-row cross join, not a driver round-trip."""
    from ._caches import tracked_persist

    # postings feed the score join AND dfreq AND the doc lengths: one
    # persisted reduction instead of three corpus scans+tokenizes;
    # callers composing rankers (hybrid_rrf) pass the shared reduction
    post = postings if postings is not None else tracked_persist(term_postings(docs, text_col))
    dl = (
        docs.select("doc_id")  # column-pruned scan: tokenless docs keep dl=0
        .join(post.groupBy("doc_id").agg(F.sum("tf").alias("dl")), "doc_id", "left")
        .select("doc_id", F.coalesce("dl", F.lit(0)).alias("dl"))
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    dfreq = post.groupBy("term").agg(F.count("*").alias("df"))
    qterms = (
        queries.select("query_id", F.explode(tokens_col(F.col("query"))).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        qterms.join(post, "term")
        .join(dfreq, "term")
        .join(dl, "doc_id")
        .crossJoin(stats)
        .groupBy("query_id", "doc_id")
        .agg(F.sum(idf * tf_part).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", F.round("score", 6).alias("score"), "rank")
    )


def tfidf_cosine_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    postings: Optional[DataFrame] = None,
) -> DataFrame:
    """Top-``k`` sparse TF-IDF cosine hits per query:
    (query_id, doc_id, score, rank) — the vector-space-model ranking
    that complements BM25's probabilistic one (same postings, different
    weighting), and the second leg of :func:`hybrid_rrf`.

    Weights use the smooth idf ``ln((N+1)/(df+1)) + 1`` (the
    text.tfidf_topk convention); cosine = dot over SHARED terms divided
    by both full norms. Query terms absent from the corpus keep
    ``df = 0`` — they match nothing but still count in the query norm,
    exactly as a real query vector would. Ties rank by doc_id.

    Scale shape: doc weights and norms are write-once corpus
    reductions (persist/bucket by term at 100 TB); scoring is one
    equi-join of the tiny query-term weight table against the postings
    (AQE broadcasts the query side) + a per-(query, doc) partial sum —
    identical skeleton to :func:`bm25_topk`, never a corpus×query
    cross product."""
    from ._caches import tracked_persist

    tf = postings if postings is not None else tracked_persist(term_postings(docs, text_col))
    dft = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    dw = tracked_persist(
        tf.join(dft, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * (F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0))
            ).alias("w"),
        )
    )
    dnorm = dw.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("dnorm"))
    qtf = (
        queries.select("query_id", F.explode(tokens_col(F.col("query"))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("query_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    qw = (
        qtf.join(dft, "term", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "query_id",
            "term",
            (
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1.0))
                        / (F.coalesce(F.col("df"), F.lit(0)) + F.lit(1.0))
                    )
                    + F.lit(1.0)
                )
            ).alias("qw"),
        )
    )
    qnorm = qw.groupBy("query_id").agg(F.sqrt(F.sum(F.col("qw") * F.col("qw"))).alias("qnorm"))
    dots = (
        qw.join(dw, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("qw") * F.col("w")).alias("dot"))
    )
    scored = (
        dots.join(qnorm, "query_id")
        .join(dnorm, "doc_id")
        .select(
            "query_id",
            "doc_id",
            (F.col("dot") / (F.col("qnorm") * F.col("dnorm"))).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", F.round("score", 6).alias("score"), "rank")
    )


def hybrid_rrf(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    leg_k: int = 20,
    k_rrf: int = 60,
    text_col: str = "text",
) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion: fuse the BM25 and
    TF-IDF-cosine rankings of the same query batch into one top-``k``
    per query — (query_id, doc_id, bm25_rank, cos_rank, rrf, rank).

    RRF (Cormack et al., SIGIR 2009): score(d) = Σ_legs 1/(k_rrf +
    rank_leg(d)) over the legs that retrieved d (rank-only, so the two
    legs' incomparable score scales never touch). Docs retrieved by one
    leg keep that single term — the standard union semantics. k_rrf=60
    is the published default. The fused rank breaks ties by doc_id.

    Scale shape: each leg is the already-scale-shaped posting-list
    ranker capped at leg_k rows per query, so the fusion itself is a
    full-outer join of two (queries × leg_k)-row tables + one window —
    negligible next to the legs regardless of corpus size. Ranks are
    exact integers, so the fused scores are bit-identical across
    engines by construction."""
    from ._caches import tracked_persist

    post = tracked_persist(term_postings(docs, text_col))
    bm = bm25_topk(docs, queries, k=leg_k, text_col=text_col, postings=post).select(
        "query_id", "doc_id", F.col("rank").alias("bm25_rank")
    )
    cos = tfidf_cosine_topk(
        docs, queries, k=leg_k, text_col=text_col, postings=post
    ).select("query_id", "doc_id", F.col("rank").alias("cos_rank"))
    fused = bm.join(cos, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        "bm25_rank",
        "cos_rank",
        (
            F.coalesce(F.lit(1.0) / (F.lit(k_rrf) + F.col("bm25_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(k_rrf) + F.col("cos_rank")), F.lit(0.0))
        ).alias("__rrf"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__rrf").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "bm25_rank",
            "cos_rank",
            F.round("__rrf", 6).alias("rrf"),
            "rank",
        )
    )


def ranking_metrics(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Retrieval-evaluation metrics per query — the eval face of the
    search stack (trec_eval's core set over any ranker this module or
    similarity.py produces): (query_id, ndcg, mrr, precision, recall,
    hits, positives) at cutoff ``k``.

    ``run``: (query_id, doc_id, rank) with rank 1-based (rows past
    ``k`` are ignored, so a leg_k>k run evaluates at k).
    ``qrels``: (query_id, doc_id, rel) graded relevance, rel >= 0;
    missing (query, doc) pairs are grade 0.

    - nDCG@k (trec_eval graded form): DCG = Σ rel_r · 1/log2(r+1)
      over the run's ranks, IDCG the same sum over the rel-descending
      ideal ordering, nDCG = DCG/IDCG (0 when the query has no
      positives).
    - MRR@k: 1/rank of the first positive in the run (0 if none).
    - precision@k = positives-retrieved / k; recall@k =
      positives-retrieved / positives (0 when the query has none).

    Cross-engine bit-exactness (the catalog's hash-compare contract):
    the 1/log2(r+1) discount table is PRECOMPUTED in Python and
    embedded as shortest-repr double literals — no runtime
    transcendental, whose last-ulp may differ between libm and
    java.lang.Math — and both DCG and IDCG fold their term lists in
    pinned rank order (array_sort + left fold), never a re-associating
    SUM over doubles. Every remaining op (int products, divisions of
    exact values) has one IEEE result.

    Scale shape: one equi-join of the k-bounded run against qrels,
    then two grouped folds over ≤ k-element arrays per query — the
    work is O(queries · k) after the join, no corpus scan."""
    import math

    w = [1.0 / math.log2(r + 1) for r in range(1, k + 1)]
    warr = F.expr("array(" + ", ".join(f"{x!r}D" for x in w) + ")")

    j = (
        run.filter(F.col(rank_col) <= k)
        .join(qrels, [query_col, doc_col], "left")
        .withColumn("_rel", F.coalesce(F.col(rel_col), F.lit(0)).cast("long"))
    )
    run_m = j.groupBy(query_col).agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col(rank_col).alias("r"), F.col("_rel").alias("g")))),
                lambda x: x["g"].cast("double") * F.element_at(warr, x["r"].cast("int")),
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ).alias("dcg"),
        F.min(F.when(F.col("_rel") > 0, F.col(rank_col))).alias("first_hit"),
        F.sum((F.col("_rel") > 0).cast("long")).alias("hits"),
    )
    ideal = qrels.groupBy(query_col).agg(
        F.aggregate(
            F.transform(
                F.slice(
                    F.reverse(F.array_sort(F.collect_list(F.col(rel_col).cast("long")))),
                    1,
                    k,
                ),
                lambda g, i: g.cast("double") * F.element_at(warr, i + F.lit(1)),
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ).alias("idcg"),
        F.sum((F.col(rel_col) > 0).cast("long")).alias("positives"),
    )
    return (
        run_m.join(ideal, query_col, "left")
        .select(
            query_col,
            F.coalesce(F.try_divide(F.col("dcg"), F.col("idcg")), F.lit(0.0)).alias("ndcg"),
            F.coalesce(F.lit(1.0) / F.col("first_hit"), F.lit(0.0)).alias("mrr"),
            (F.col("hits").cast("double") / F.lit(float(k))).alias("precision"),
            F.coalesce(
                F.try_divide(F.col("hits").cast("double"), F.col("positives").cast("double")),
                F.lit(0.0),
            ).alias("recall"),
            "hits",
            F.coalesce(F.col("positives"), F.lit(0)).alias("positives"),
        )
    )
