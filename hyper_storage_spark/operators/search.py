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
    # persisted reduction instead of three corpus scans+tokenizes
    post = tracked_persist(term_postings(docs, text_col))
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
