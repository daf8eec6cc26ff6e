"""Similarity search over an embedding column (array<float>).

- :func:`cosine_topk` — brute-force exact top-k: broadcast the (small)
  query set against the corpus; the dot product runs as built-in
  higher-order functions (zip_with + aggregate) inside codegen, the
  top-k per query is a window rank (TakeOrdered-style). At 100 TB the
  corpus side stays partition-parallel and nothing shuffles except the
  final per-query top-k (tiny).
- :func:`lsh_bucket_topk` — the approximate scale path: random
  hyperplane signatures (sign of dot with h fixed vectors) bucket the
  corpus; queries search only their bucket (plus optional multi-probe).
  Accuracy/recall trades against bucket count; the bucketing is a
  deterministic column expression, so it co-partitions with a simple
  repartition on the signature — no per-query scans.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


# Ceiling on the fixed-query-batch ANN faces (pq_search/ivfpq_search —
# and pq_topk/ivfpq_topk through them). Their per-query LUT tensor is
# queries × m × n_codes float64 held on the driver AND shipped in every
# task's UDF closure (plus, for IVF-PQ, a queries × n_cells probe
# matrix): at the default m=16/n_codes=32 the ceiling below caps the
# closure at ~32 MB — a caller passing 10⁶ query ids must fail LOUDLY
# here instead of OOMing the driver mid-collect. For unbounded query
# sets use ann_join: both sides stay data-proportional DataFrames and
# nothing query-shaped ever collects to the driver.
MAX_QUERY_BATCH = 65_536


def _check_query_batch(query_ids, fn_name: str) -> None:
    if len(query_ids) > MAX_QUERY_BATCH:
        raise ValueError(
            f"{fn_name} got {len(query_ids)} query ids — the fixed-batch "
            f"ANN faces hold a queries×m×n_codes LUT tensor on the driver "
            f"and in every task closure, capped at MAX_QUERY_BATCH="
            f"{MAX_QUERY_BATCH}. For unbounded query sets use ann_join "
            f"(similarity.ann_join): both sides stay distributed."
        )


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank, cosine)."""

    # norms project ONCE per vector before the join — inlining them in
    # the joined projection would re-run the O(dim) aggregate per
    # (query, candidate) pair (same rationale as embedding_cosine_pairs).
    # SQL-string expressions: same trees as _dot/_norm, one roundtrip
    # each (see _norm_sql)
    queries = (
        emb.filter(F.col(id_col).isin(query_ids))
        .selectExpr(
            f"`{id_col}` AS query_id", f"`{vec_col}` AS qv", f"{_norm_sql(vec_col)} AS qn"
        )
        .filter("qn > 0")  # zero-norm ⇒ undefined (NULL) cosine; exclude
    )
    corpus = emb.selectExpr(
        f"`{id_col}` AS neighbor_id", f"`{vec_col}` AS cv", f"{_norm_sql(vec_col)} AS cn"
    ).filter("cn > 0")  # NULL-cosine rows would still take row_number ranks
    scored = (
        corpus.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine", F.expr(_DOT_SQL.format(a="qv", b="cv") + " / (qn * cn)")
        )
    )
    return (
        scored.withColumn("rank", F.expr(_RANK_OVER_COSINE))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def hard_negatives(
    emb: DataFrame,
    query_ids: list,
    k: int = 5,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor,
    the ``k`` nearest vectors whose ``label_col`` DIFFERS — the
    near-but-wrong examples a triplet/InfoNCE loss learns most from
    (random negatives are trivially far; hard ones define the
    decision boundary). Returns (query_id, query_label, neighbor_id,
    neighbor_label, rank, cosine) with the exact cosine_topk
    shape/tie-break discipline.

    NULL labels never match each other (SQL inequality semantics:
    NULL != NULL is unknown ⇒ excluded) — an unlabeled vector mines
    no negatives and serves as none. Scale shape: identical to
    cosine_topk (anchors broadcast, one corpus scan) — this is the
    exact baseline face; at corpus scale mine through the ANN index
    (ivfpq_search on the anchor batch, then filter labels and
    re-rank) exactly as ann_join does for the unlabeled case."""
    from pyspark.sql import Window

    queries = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("query_label"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    ).filter(F.col("qn") > 0)
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    ).filter(F.col("cn") > 0)
    scored = corpus.join(
        F.broadcast(queries),
        F.col("neighbor_label") != F.col("query_label"),
    ).withColumn("cosine", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            "rank",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rnd = random.Random(seed)
    return [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


def melted_signatures(
    df: DataFrame, id_col: str, vec_col: str, tables: list[list[list[float]]], out_id: str
) -> DataFrame:
    """(out_id, table_id, sig): one multi-table hyperplane signature row
    per (vector, table).

    The ``n_tables × n_planes`` plane dots are one constant-matrix
    multiply per row — exactly the shape where an Arrow-vectorized
    Pandas UDF beats Catalyst expressions: the pure-Column forms either
    unroll into an O(tables × planes × dim)-node expression tree (whose
    analysis/codegen time dwarfs the math, and which downstream
    projections re-inline per reference — a 96-plane set once planned
    for minutes) or run as interpreted higher-order lambdas. Here the
    whole batch is a single ``(batch × dim) @ (dim × planes)`` numpy
    matmul. The signatures leave through ``posexplode`` so consumers see
    a real column, never the expression."""
    n_planes = len(tables[0])
    n_tables = len(tables)
    planes = np.asarray([p for t in tables for p in t], dtype=np.float64)  # (T*P, dim)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @F.pandas_udf("array<bigint>")
    def sigs_udf(vecs: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])  # (n, dim)
        bits = (mat @ planes.T) > 0  # (n, T*P)
        sigs = bits.reshape(len(mat), n_tables, n_planes).astype(np.int64) @ weights  # (n, T)
        return pd.Series(list(sigs))

    return df.select(
        F.col(id_col).alias(out_id), F.posexplode(sigs_udf(F.col(vec_col))).alias("table_id", "sig")
    )


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    train_fraction: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means cells + multi-cell probing.

    Build: fit KMeans (``pyspark.ml``, optionally on a
    ``train_fraction`` sample — at corpus scale you train on a sample
    and assign everything) and assign each vector to its nearest
    centroid (its CELL). Search: each query scores only the vectors in
    its ``n_probe`` nearest cells — the centroid table is tiny
    (n_cells × dim) and broadcast, the corpus joins by cell id
    (equi/hash), exact cosine + window top-k inside the probed cells.

    Unlike hyperplane LSH the cells adapt to the data distribution,
    which is what you want when the corpus is clustered (the common
    case for embeddings). Returns (query_id, neighbor_id, rank,
    cosine); recall trades against n_probe/n_cells.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    vecs = emb.select(
        F.col(id_col), F.col(vec_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("__fv")
    )
    train = vecs if train_fraction >= 1.0 else vecs.sample(train_fraction, seed=seed)
    model = KMeans(k=n_cells, seed=seed, featuresCol="__fv", predictionCol="__cell").fit(train)
    assigned = model.transform(vecs).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),  # once per vector, not per pair
        F.col("__cell").alias("cell"),
    ).filter(F.col("cn") > 0)  # zero-norm ⇒ undefined (NULL) cosine; exclude

    # tiny centroid table: query → n_probe nearest cells via broadcast
    centroids = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    cent_df = emb.sparkSession.createDataFrame(centroids, "cell int, centroid array<double>")
    queries = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    ).filter(F.col("qn") > 0)  # zero-norm ⇒ undefined (NULL) cosine; exclude
    probe_w = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(), F.col("cell").asc())
    probes = (
        queries.crossJoin(F.broadcast(cent_df))
        .withColumn(
            "dist2",
            F.aggregate(
                F.zip_with(
                    F.col("qv"), F.col("centroid"), lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        .withColumn("cr", F.row_number().over(probe_w))
        .filter(F.col("cr") <= n_probe)
        .select("query_id", "qv", "qn", "cell")
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def lsh_bucket_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 4,
    multi_probe: bool = True,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k searching the query's LSH bucket(s).

    ``n_tables`` independent hyperplane signatures (OR-amplification);
    with ``multi_probe`` each query also probes the ``n_planes``
    Hamming-1 neighbor buckets per table — the standard recall lift at
    the same plan shape (the probe expansion happens on the tiny query
    side; the corpus keeps exactly one row per table).

    Rank/cosine are exact within the probed buckets. Returns
    (query_id, neighbor_id, rank, cosine). Recall trades against probe
    volume: defaults are tuned for weakly-similar corpora (recall ≥ 0.9
    at cosine ≈ 0.3); dense corpora should raise ``n_planes`` so bucket
    occupancy — and therefore per-query work — stays bounded.
    """
    from pyspark.sql import Window

    tables = [_hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    melted = melted_signatures(emb, id_col, vec_col, tables, "vid")
    corpus = melted.select(
        F.col("vid").alias("neighbor_id"), "table_id", F.col("sig").alias("bucket")
    )
    flips = [0] + ([1 << i for i in range(n_planes)] if multi_probe else [])
    probes = melted.filter(F.col("vid").isin(query_ids)).select(
        F.col("vid").alias("query_id"),
        "table_id",
        F.explode(
            F.array(*[F.col("sig").bitwiseXOR(F.lit(flip)) for flip in flips])
        ).alias("bucket"),
    )
    candidates = (
        corpus.join(F.broadcast(probes), ["table_id", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    queries = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    ).filter(F.col("qn") > 0)  # zero-norm ⇒ undefined (NULL) cosine; exclude
    corpus_vecs = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    ).filter(F.col("cn") > 0)  # NULL-cosine rows would still take row_number ranks
    scored = (
        candidates.join(F.broadcast(queries), "query_id")
        .join(corpus_vecs, "neighbor_id")
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def pca_project(
    emb: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_model: bool = False,
):
    """Project an embedding column onto its top-``k`` principal
    components (``pyspark.ml`` PCA): (id, components array<double>).

    The scale shape: the covariance/eigen step reduces the corpus to a
    d×d Gramian on executors (one pass, tree-aggregated partials) and
    eigendecomposes the tiny d×d matrix on the driver; the projection
    itself is a per-row matmul — no shuffle at all. The d×k loading
    matrix is broadcast implicitly with the transform. Dimensionality
    reduction ahead of ANN/clustering cuts every downstream distance
    computation by d/k at the cost of the captured-variance loss the
    model reports (``explainedVariance``).

    Note Spark ML's PCA projects the UNCENTERED input (the components
    themselves are computed from the centered covariance — the known
    asymmetry of its transform); differential tests against numpy must
    replicate that.
    """
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    fv = emb.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("__fv")
    )
    model = PCA(k=k, inputCol="__fv", outputCol="__pc").fit(fv)
    out = model.transform(fv).select(
        F.col(id_col), vector_to_array(F.col("__pc")).alias("components")
    )
    return (out, model) if with_model else out


def kmeans_clusters(
    emb: DataFrame,
    k: int = 10,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_model: bool = False,
):
    """Cluster embeddings with ``pyspark.ml`` KMeans:
    (id, cluster int). The fit is the distributed part (Lloyd
    iterations over broadcast centroids — per-pass cost linear in the
    corpus, centroid state k×d driver-tiny); assignment is a per-row
    map. The corpus-organization primitive behind IVF ANN cells
    (:func:`ivf_topk` fits its own), diversity-aware sampling, and
    near-dup triage."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    fv = emb.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("__fv")
    )
    model = KMeans(k=k, seed=seed, featuresCol="__fv", predictionCol="__cluster").fit(fv)
    out = model.transform(fv).select(F.col(id_col), F.col("__cluster").alias("cluster"))
    return (out, model) if with_model else out


def cosine_join_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    query_vec_col: str | None = None,
) -> DataFrame:
    """EXACT cross-corpus top-k retrieval: for every row of
    ``queries``, the ``k`` highest-cosine rows of ``corpus`` —
    (query_id, neighbor_id, rank, cosine). Brute force: norms are
    projected once per side, then a cross join scores every pair and
    a per-query window keeps k.

    This is the small-n oracle twin for :func:`ann_join` (the same
    role dedup_embedding_cosine plays for the LSH dedup path): the
    cross join is deliberately quadratic and belongs at gate SF or on
    a bounded query batch ONLY — with a bounded batch the cross join
    broadcasts the queries and the corpus stays one partition-parallel
    scan (the shape cosine_topk uses); a data-proportional query set
    must route through :func:`ann_join`."""
    qid = query_id_col or id_col
    qvec = query_vec_col or vec_col
    q = queries.select(
        F.col(qid).alias("query_id"),
        F.col(qvec).alias("qv"),
        _norm(F.col(qvec)).alias("qn"),
    ).filter(F.col("qn") > 0)  # zero-norm ⇒ undefined (NULL) cosine; exclude
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    ).filter(F.col("cn") > 0)  # NULL-cosine rows would still take row_number ranks
    scored = c.crossJoin(q).withColumn(
        "cosine", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def ann_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 8,
    multi_probe: bool = True,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    query_vec_col: str | None = None,
) -> DataFrame:
    """Cross-corpus ANN JOIN — top-k corpus neighbors for EVERY query
    row, where BOTH sides are data-proportional tables (retrieval-
    based decontamination: "nearest training doc for each eval doc";
    eval-set attribution; cross-snapshot linkage). The existing ANN
    entry points assume a bounded, broadcastable query set
    (lsh_bucket_topk probes per-id; cosine_topk broadcasts vectors);
    this is the shape where neither side fits the driver.

    Same signature family as lsh_bucket_topk (``n_tables``
    OR-amplified hyperplane tables, Hamming-1 multi-probe on the
    query side only), but every join runs UNHINTED: candidates come
    from a (table_id, bucket) equi-join of two melted signature
    frames — AQE broadcasts a side when it is actually small and
    shuffles otherwise — and candidate scoring joins vectors back by
    id. Per-query ranking is a query-partitioned window (parallel,
    never a global sort). Exchange volume: signatures are
    O(rows × tables) 8-byte buckets, probes O(queries × tables ×
    (1 + planes)); the quadratic term exists only inside a bucket,
    which ``n_planes`` sizes (raise it to keep occupancy bounded as
    the corpus grows). Rank/cosine are exact within probed buckets.
    Returns (query_id, neighbor_id, rank, cosine)."""
    from pyspark.sql import Window as W

    qid = query_id_col or id_col
    qvec = query_vec_col or vec_col
    tables = [_hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    corpus_sig = melted_signatures(corpus, id_col, vec_col, tables, "neighbor_id").select(
        "neighbor_id", "table_id", F.col("sig").alias("bucket")
    )
    q_sig = melted_signatures(queries, qid, qvec, tables, "query_id")
    flips = [0] + ([1 << i for i in range(n_planes)] if multi_probe else [])
    probes = q_sig.select(
        "query_id",
        "table_id",
        F.explode(
            F.array(*[F.col("sig").bitwiseXOR(F.lit(flip)) for flip in flips])
        ).alias("bucket"),
    )
    candidates = (
        corpus_sig.join(probes, ["table_id", "bucket"])
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(
        F.col(qid).alias("query_id"),
        F.col(qvec).alias("qv"),
        _norm(F.col(qvec)).alias("qn"),
    ).filter(F.col("qn") > 0)  # zero-norm ⇒ undefined (NULL) cosine; exclude
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    ).filter(F.col("cn") > 0)  # NULL-cosine rows would still take row_number ranks
    scored = (
        candidates.join(q, "query_id")
        .join(c, "neighbor_id")
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def planes_for(corpus_rows: int, target_occupancy: int = 128, lo: int = 4, hi: int = 12) -> int:
    """The n_planes that keeps expected LSH bucket occupancy near
    ``target_occupancy`` for a corpus of ``corpus_rows`` — the sizing
    rule the ann_join/lsh_bucket docstrings prescribe in prose: with
    2^p buckets per table, occupancy ≈ rows / 2^p, so p =
    ⌈log2(rows / target)⌉ (clamped to [lo, hi]). Candidate volume per
    query is occupancy × tables × probes — holding occupancy constant
    as the corpus grows is what keeps the ANN join linear instead of
    quadratic-over-2^p. Recall per table falls as p rises; compensate
    with n_tables/probes (the OR-amplification knob), which scales
    cost linearly rather than quadratically."""
    if corpus_rows <= 0:
        return lo
    p = math.ceil(math.log2(max(corpus_rows / max(target_occupancy, 1), 1.0)))
    return max(lo, min(hi, p))


def ivfpq_params_for(
    corpus_rows: int,
    target_occupancy: int = 4096,
    min_cells: int = 16,
    max_cells: int = 65_536,
    min_probe: int = 8,
    sample_per_cell: int = 32,
    max_sample: int = 262_144,
) -> tuple[int, int, int]:
    """(n_cells, n_probe, sample_rows) sized from the corpus — the
    ``minhash_params_for`` / ``planes_for`` occupancy discipline for
    the IVF-PQ family. Fixed defaults (16 cells, 8 probes) keep cell
    occupancy growing LINEARLY with the corpus, so the probed-cell ADC
    scan silently degrades back to flat PQ's full-scan cost — exactly
    the creep the sizing functions exist to remove.

    Rules, each documented and pytest-pinned:
    - ``n_cells`` doubles until occupancy (corpus/cells) ≤
      ``target_occupancy`` (FAISS's IVF guidance is cells ∝ corpus
      size for bounded cell scans), floored at ``min_cells`` (the
      training sample must keep ≥ tens of points per centroid) and
      capped at ``max_cells`` (the centroid table + per-query bias
      row stay driver/closure-sized: 65536 × dim doubles ≈ 32 MB at
      dim=64).
    - ``n_probe`` grows as ⌈√n_cells⌉ (floored at ``min_probe``): the
      scanned volume per query is n_probe × occupancy ≈ √cells ×
      occupancy — sublinear in the corpus — while the PROBED FRACTION
      n_probe/n_cells falls as cells grow, which is what preserves the
      advantage over flat PQ at scale. Recall loss from probing a
      smaller fraction is offset by each cell covering a finer
      partition of the space (and recall is monotone in n_probe — the
      knob a caller raises if a recall gate demands it; the round-9
      incremental-index entries did exactly that).
    - ``sample_rows`` scales with cells (``sample_per_cell`` training
      points per centroid, floor 4096) and caps at ``max_sample`` —
      the driver-side k-means stays bounded no matter the corpus.
    At gate sizes (≤ ~65k vectors) this returns the family defaults
    (16, 8, 4096), so contract entries are unchanged by sizing."""
    n_cells = min_cells
    while corpus_rows / n_cells > target_occupancy and n_cells < max_cells:
        n_cells *= 2
    n_probe = max(min_probe, math.ceil(math.sqrt(n_cells)))
    sample_rows = min(max_sample, max(4096, sample_per_cell * n_cells))
    return n_cells, n_probe, sample_rows


# ---------------------------------------------------------------- PQ ANN


def _pq_kmeans(pts: np.ndarray, k: int, iters: int = 12, seed: int = 42) -> np.ndarray:
    """Seeded Lloyd over one subspace's sample — (k, sub_d) centroids.
    Runs on the DRIVER over a bounded sample (the FAISS training
    convention: codebooks train on a sample, the corpus only gets
    ENCODED — the distributed part). Deterministic: seeded init,
    fixed iteration count, empty clusters re-seeded from the sample."""
    rnd = np.random.RandomState(seed)
    k = min(k, len(pts))
    centers = pts[rnd.choice(len(pts), size=k, replace=False)].copy()
    for _ in range(iters):
        d2 = ((pts[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            members = pts[assign == c]
            if len(members):
                centers[c] = members.mean(axis=0)
            else:
                centers[c] = pts[rnd.randint(len(pts))]
    return centers


def _hash_ordered_sample(
    emb, sample_rows: int, id_col: str, vec_col: str
) -> "np.ndarray":
    """Bounded training sample as a unit-normalized (rows, dim) matrix,
    ordered by a content hash — NOT a bare limit(): limit-without-order
    takes whichever partitions answer first, so on a sorted/clustered
    corpus the trained state would see one biased slice, and the rows
    taken would change with partition layout. Hashing ``id_col`` (or
    the vector itself when the frame carries no such column) makes the
    draw content-deterministic — same bits on any cluster config.
    Shared by pq_train and ivfpq_topk so the sampling discipline can
    never diverge between the PQ family members."""
    order = F.xxhash64(F.col(id_col)) if id_col in emb.columns else F.xxhash64(F.col(vec_col))
    sample = [
        np.asarray(r[0], dtype=np.float64)
        for r in emb.select(vec_col, order.alias("__h"))
        .orderBy("__h")
        .limit(sample_rows)
        .select(vec_col)
        .collect()
    ]
    mat = np.stack(sample)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.where(norms == 0, 1.0, norms)


def _norm_sql(col: str) -> str:
    """:func:`_norm` as one SQL string — the same
    sqrt(aggregate(transform(x → x²))) expression tree, built in ONE
    py4j roundtrip instead of the ~15 the nested-lambda Column
    spelling costs (the MinHash construction-chatter fix, applied to
    the ANN family's shared tail). The identifier is backtick-quoted
    so reserved-word / special-character column names resolve exactly
    the way the F.col Column spelling did (review r12)."""
    return (
        f"sqrt(aggregate(transform(`{col}`, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
    )


_DOT_SQL = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)

# the family's deterministic rank, as ONE expression string (the
# Window/WindowSpec Column spelling costs ~20 py4j roundtrips per use;
# the parsed tree — row_number over the same partition/order — is
# identical, including the WindowGroupLimit top-k pushdown the
# rank<=k filter triggers)
_RANK_OVER_COSINE = "row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)"


def _exact_rerank(
    emb, cand, query_ids: list[int], k: int, id_col: str, vec_col: str
):
    """Exact-cosine re-rank of a bounded candidate set — the shared
    tail of the compressed-scan ANN family (pq_search, ivfpq_topk):
    vectors are fetched ONLY for the candidates, queries broadcast,
    deterministic (cosine desc, neighbor_id) rank, rounded projection.
    Expressions ride as SQL strings (same Catalyst trees as the
    _dot/_norm Column builders — bit-identical results, a fraction of
    the plan-construction roundtrips)."""

    queries = (
        emb.filter(F.col(id_col).isin(query_ids))
        .selectExpr(
            f"`{id_col}` AS query_id", f"`{vec_col}` AS qv", f"{_norm_sql(vec_col)} AS qn"
        )
        .filter("qn > 0")
    )
    corpus = emb.selectExpr(
        f"`{id_col}` AS neighbor_id", f"`{vec_col}` AS cv", f"{_norm_sql(vec_col)} AS cn"
    ).filter("cn > 0")
    rescored = (
        cand.join(F.broadcast(queries), "query_id")
        .join(corpus, "neighbor_id")
        .withColumn(
            "cosine", F.expr(_DOT_SQL.format(a="qv", b="cv") + " / (qn * cn)")
        )
    )
    return (
        rescored.withColumn("rank", F.expr(_RANK_OVER_COSINE))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def pq_train(
    emb: DataFrame,
    m: int = 16,
    n_codes: int = 32,
    sample_rows: int = 4096,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Product-quantization codebooks: split the (unit-normalized)
    vector into ``m`` subvectors and k-means each subspace to
    ``n_codes`` centroids — (m, n_codes, dim/m). Training collects a
    bounded ``sample_rows`` sample to the driver (same bounded-collect
    budget as ivf_topk's centroid table); at 100 TB the sample is
    still driver-sized while encode/search stay distributed.

    The sample is hash-ordered (xxhash64 of ``id_col``), NOT a bare
    ``limit``: limit-without-order takes whichever partitions answer
    first, so on a sorted/clustered corpus (the common layout after
    ingest) the codebooks would train on one biased slice of the
    distribution, and the rows taken would change with partition
    layout. Hash order makes the sample a content-deterministic
    pseudo-random draw — same codebook bits on any cluster config —
    the md5/xxhash64-uniform discipline used by the sampling module.
    The draw goes through the shared ``_hash_ordered_sample`` (same
    helper as ivfpq_topk), which also falls back to hashing the vector
    itself when the frame carries no ``id_col`` — so the sampling
    discipline cannot diverge between the PQ family members."""
    mat = _hash_ordered_sample(emb, sample_rows, id_col, vec_col)
    dim = mat.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return np.stack(
        [_pq_kmeans(mat[:, i * sub : (i + 1) * sub], n_codes, seed=seed + i) for i in range(m)]
    )


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): each vector unit-normalized, each
    subvector replaced by its nearest codebook index — m small ints
    instead of dim doubles (8 codes for a 64-dim double vector is a
    64× shrink; this compressed table is what the ADC scan reads, the
    point of PQ at corpus scale). One Arrow-vectorized batch matmul
    per subspace, zero shuffles; zero-norm vectors get no codes row
    (undefined direction, same exclusion as the cosine paths)."""
    m, _, sub = codebooks.shape
    cb = codebooks  # captured in the UDF closure, ships once per task

    @F.pandas_udf("array<int>")
    def enc(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.where(norms == 0, 1.0, norms)
        out = np.empty((len(mat), m), dtype=np.int32)
        for i in range(m):
            seg = mat[:, i * sub : (i + 1) * sub]
            d2 = ((seg[:, None, :] - cb[i][None, :, :]) ** 2).sum(axis=2)
            out[:, i] = d2.argmin(axis=1)
        return pd.Series([list(row) for row in out])

    return emb.filter(_norm(F.col(vec_col)) > 0).select(
        F.col(id_col), enc(F.col(vec_col)).alias("codes")
    )


class PQIndex:
    """The persistable state of a PQ corpus — the ANN counterpart of
    :func:`..dedup.minhash_band_index`'s band table:

    - ``codebooks``: (m, n_codes, dim/m) ndarray — driver-sized model
      state (a few KB), round-trippable through a DataFrame via
      :func:`pq_codebook_table` / :func:`pq_codebooks_from_table` so
      it can live next to the codes as plain parquet;
    - ``codes``: (id, codes array<int>) DataFrame — the distributed
      compressed corpus, O(corpus · m) small ints.

    An incremental pipeline persists both once, then per batch runs
    :func:`pq_append` (encode ONLY the new rows with the FROZEN
    codebooks — no retrain, the FAISS add() convention) and serves
    searches through :func:`pq_search`."""

    def __init__(self, codebooks: np.ndarray, codes: DataFrame):
        self.codebooks = codebooks
        self.codes = codes


def pq_codebook_table(spark, codebooks: np.ndarray) -> DataFrame:
    """Codebooks as a (subspace, code, centroid) DataFrame — the
    parquet-persistable face of the driver-side ndarray."""
    rows = [
        (i, c, [float(x) for x in codebooks[i, c]])
        for i in range(codebooks.shape[0])
        for c in range(codebooks.shape[1])
    ]
    return spark.createDataFrame(rows, "subspace int, code int, centroid array<double>")


def pq_codebooks_from_table(df: DataFrame) -> np.ndarray:
    """Inverse of :func:`pq_codebook_table` (codebooks are KB-sized —
    a driver collect by design)."""
    rows = df.collect()
    m = max(r.subspace for r in rows) + 1
    n_codes = max(r.code for r in rows) + 1
    sub = len(rows[0].centroid)
    out = np.zeros((m, n_codes, sub))
    for r in rows:
        out[r.subspace, r.code] = r.centroid
    return out


def pq_index(
    emb: DataFrame,
    m: int = 16,
    n_codes: int = 32,
    sample_rows: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> PQIndex:
    """Train codebooks (bounded hash-ordered driver sample) and encode
    the corpus — the one-off index bootstrap. Everything after is
    :func:`pq_append` / :func:`pq_search` against this state."""
    cb = pq_train(
        emb, m=m, n_codes=n_codes, sample_rows=sample_rows, seed=seed,
        vec_col=vec_col, id_col=id_col,
    )
    return PQIndex(cb, pq_encode(emb, cb, id_col=id_col, vec_col=vec_col))


def pq_append(index: PQIndex, batch: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> PQIndex:
    """Add a batch to a persisted PQ index: encode ONLY the new rows
    with the existing (frozen) codebooks and union the codes — O(batch)
    Arrow-vectorized work, no retrain, no touch of the stored corpus
    codes. Same id discipline as incremental_minhash_pairs: batch ids
    are assumed distinct from indexed ids (route re-ingests through
    exact dedup first). Codebooks trained on the bootstrap corpus keep
    serving appended batches exactly the way a FAISS index does —
    re-train (a new pq_index) only when the embedding distribution
    itself drifts."""
    return PQIndex(
        index.codebooks,
        index.codes.unionByName(pq_encode(batch, index.codebooks, id_col=id_col, vec_col=vec_col)),
    )


def pq_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    m: int = 16,
    n_codes: int = 32,
    refine: int = 16,
    sample_rows: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-ADC ANN with exact re-ranking: (query_id, neighbor_id, rank,
    cosine) — the FAISS IVFADC recipe's flat form, Spark-first. The
    from-scratch convenience face: builds a throwaway :func:`pq_index`
    and searches it; a production pipeline persists the index once and
    calls :func:`pq_search` directly (no per-call retrain)."""
    idx = pq_index(
        emb, m=m, n_codes=n_codes, sample_rows=sample_rows, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    return pq_search(idx, emb, query_ids, k=k, refine=refine, id_col=id_col, vec_col=vec_col)


def pq_search(
    index: PQIndex,
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    refine: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a (persisted) PQ index: (query_id, neighbor_id, rank,
    cosine). ``emb`` supplies the query vectors and the exact re-rank
    fetch; the scan itself reads ONLY the compressed codes.

    Search is asymmetric distance computation: per query, ONE (m ×
    n_codes) lookup table of subvector dot products; the corpus scan
    then scores each row by m table gathers over its codes — a single
    pass over the compressed table, no shuffle, no per-pair O(dim)
    math. The top ``k·refine`` ADC candidates per query (TakeOrdered-
    sized) are re-ranked by EXACT cosine via a semi-joined vector
    fetch, so quantization error costs recall only past the refine
    horizon. Scale: codes table is dim·8/m× smaller than the vectors,
    LUTs are queries-sized broadcast state, candidates bound the
    exact work at queries × k·refine."""

    _check_query_batch(query_ids, "pq_search")
    cb = index.codebooks
    sub = cb.shape[2]
    codes = index.codes

    qrows = emb.filter(F.col(id_col).isin(query_ids)).select(id_col, vec_col).collect()
    qids = [r[0] for r in qrows]
    if qrows:
        qmat = np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows])
        norms = np.linalg.norm(qmat, axis=1, keepdims=True)
        keep = norms[:, 0] > 0
        qids, qmat = [q for q, kq in zip(qids, keep) if kq], qmat[keep] / norms[keep]
    if not qids:
        # family contract (cosine_topk et al.): unknown or zero-norm
        # queries yield an EMPTY result, never a numpy stack crash
        return emb.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, rank int, cosine double"
        )
    # LUT[q, i, c] = <q_sub_i, codebook[i][c]>: ADC score = Σ_i LUT[q, i, code_i]
    luts = np.stack(
        [
            np.stack([qv[i * sub : (i + 1) * sub] @ cb[i].T for i in range(cb.shape[0])])
            for qv in qmat
        ]
    )

    @F.pandas_udf("array<double>")
    def adc(code_col: pd.Series) -> pd.Series:
        cmat = np.stack([np.asarray(c, dtype=np.int64) for c in code_col])  # (n, m)
        n = len(cmat)
        scores = np.zeros((len(luts), n))
        for i in range(luts.shape[1]):
            scores += luts[:, i, :][:, cmat[:, i]]  # gather (q, n)
        return pd.Series([list(col) for col in scores.T])

    scored = codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode(adc(F.col("codes"))).alias("qidx", "adc"),
    )
    # qidx → query_id as an array-literal gather (r13): the old
    # qidx-keyed broadcast join shipped a createDataFrame + broadcast
    # exchange for a ≤MAX_QUERY_BATCH-row static map — the literal is
    # one expression, one less exchange in the plan, same rows (the
    # rank filter runs before the gather exactly as it ran before the
    # join; self-matches are dropped after, as before)
    qarr = "array(" + ",".join(f"{int(q)}L" for q in qids) + ")"
    cand = (
        scored.withColumn(
            "r",
            F.expr("row_number() OVER (PARTITION BY qidx ORDER BY adc DESC, neighbor_id)"),
        )
        .filter(F.col("r") <= k * refine)
        .selectExpr(f"{qarr}[qidx] AS query_id", "neighbor_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )
    # exact re-rank: vectors fetched ONLY for the bounded candidate set
    return _exact_rerank(emb, cand, query_ids, k, id_col, vec_col)


class IVFPQIndex:
    """The persistable state of an IVF-PQ corpus — the combined-index
    twin of :class:`PQIndex`:

    - ``centroids``: (n_cells, dim) coarse cells (KB-sized);
    - ``codebooks``: (m, n_codes, dim/m) RESIDUAL codebooks (KB-sized;
      both round-trip through :func:`pq_codebook_table`-style tables);
    - ``codes``: (id, cell, codes) DataFrame — the distributed
      compressed corpus, the only data-proportional piece.

    Persist once, :func:`ivfpq_append` new batches (frozen cells +
    codebooks, no retrain), serve via :func:`ivfpq_search`."""

    def __init__(self, centroids: np.ndarray, codebooks: np.ndarray, codes: DataFrame):
        self.centroids = centroids
        self.codebooks = codebooks
        self.codes = codes


def _ivfpq_encode(
    emb: DataFrame, cents: np.ndarray, cb: np.ndarray, id_col: str, vec_col: str
) -> DataFrame:
    """(id → neighbor_id, cell, codes): assign each unit-normalized
    vector to its nearest cell and PQ-encode the residual — one
    Arrow-batched pass, zero shuffles; zero-norm vectors are excluded
    (undefined direction, the cosine-family contract)."""
    m, _, sub = cb.shape

    @F.pandas_udf("struct<cell:int,codes:array<int>>")
    def enc(vecs: pd.Series) -> pd.DataFrame:
        v = np.stack([np.asarray(x, dtype=np.float64) for x in vecs])
        n = np.linalg.norm(v, axis=1, keepdims=True)
        v = v / np.where(n == 0, 1.0, n)
        cell = ((v[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        r = v - cents[cell]
        out = np.empty((len(v), m), dtype=np.int32)
        for i in range(m):
            seg = r[:, i * sub : (i + 1) * sub]
            out[:, i] = ((seg[:, None, :] - cb[i][None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        return pd.DataFrame({"cell": cell.astype("int32"), "codes": [list(x) for x in out]})

    return (
        emb.filter(_norm(F.col(vec_col)) > 0)
        .select(F.col(id_col).alias("neighbor_id"), enc(F.col(vec_col)).alias("e"))
        .select("neighbor_id", F.col("e.cell").alias("cell"), F.col("e.codes").alias("codes"))
    )


def ivfpq_index(
    emb: DataFrame,
    n_cells: int = 16,
    m: int = 16,
    n_codes: int = 32,
    sample_rows: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IVFPQIndex:
    """Train cells + residual codebooks on one hash-ordered driver
    sample (bounded, content-deterministic — the pq_train discipline)
    and encode the corpus — the one-off IVF-PQ bootstrap."""
    mat = _hash_ordered_sample(emb, sample_rows, id_col, vec_col)
    dim = mat.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    cents = _pq_kmeans(mat, n_cells, seed=seed)  # (n_cells, dim)
    d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    resid = mat - cents[d2.argmin(axis=1)]
    cb = np.stack(
        [_pq_kmeans(resid[:, i * sub : (i + 1) * sub], n_codes, seed=seed + i) for i in range(m)]
    )
    return IVFPQIndex(cents, cb, _ivfpq_encode(emb, cents, cb, id_col, vec_col))


def ivfpq_append(
    index: IVFPQIndex, batch: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> IVFPQIndex:
    """Add a batch to a persisted IVF-PQ index: assign + encode ONLY
    the new rows with the frozen cells/codebooks and union the codes —
    O(batch), no retrain (the FAISS add() convention; same distinct-id
    assumption as pq_append)."""
    return IVFPQIndex(
        index.centroids,
        index.codebooks,
        index.codes.unionByName(
            _ivfpq_encode(batch, index.centroids, index.codebooks, id_col, vec_col)
        ),
    )


def ivfpq_occupancy(index: IVFPQIndex) -> dict:
    """Occupancy census of a persisted IVF-PQ index in ONE aggregation
    over the codes table: total rows, cells in use vs trained, and the
    max/mean per-cell occupancy. The monitoring face of the
    ``ivfpq_params_for`` sizing rule — at 100 TB this is the only scan
    the health check pays (a single groupBy on a compact codes
    table), and it returns scalars, never per-cell rows, to the
    driver."""
    n_cells = int(index.centroids.shape[0])
    row = (
        index.codes.groupBy("cell")
        .agg(F.count("*").alias("occ"))
        .agg(
            F.coalesce(F.sum("occ"), F.lit(0)).alias("n_rows"),
            F.count("*").alias("cells_used"),
            F.coalesce(F.max("occ"), F.lit(0)).alias("max_occupancy"),
        )
        .collect()[0]
    )
    n_rows = int(row["n_rows"])
    return {
        "n_rows": n_rows,
        "n_cells": n_cells,
        "cells_used": int(row["cells_used"]),
        "max_occupancy": int(row["max_occupancy"]),
        "mean_occupancy": (n_rows / n_cells) if n_cells else 0.0,
    }


def ivfpq_health(
    index: IVFPQIndex,
    target_occupancy: int = 4096,
    skew_factor: float = 4.0,
) -> dict:
    """Occupancy census + the REBUILD VERDICT for a persisted index.

    :func:`ivfpq_append` freezes cells and codebooks forever (the
    FAISS add() convention), so sustained appends degrade the index
    two ways, each with its own trigger here:

    - **undersized**: the corpus outgrew the cell count — re-running
      :func:`ivfpq_params_for` at the current row count wants more
      cells than the index has. Probed-cell scans then degrade toward
      flat-PQ full-scan cost (the linear-occupancy creep the sizing
      rule exists to remove).
    - **skewed**: drift concentrated mass in few cells —
      ``max_occupancy > skew_factor × (n_rows / n_cells)``. Queries
      probing a hot cell scan far more than the sizing budget, and
      recall drifts for vectors crowded out of their true cell's
      top-k ADC.

    Returns the :func:`ivfpq_occupancy` dict plus ``undersized``,
    ``skewed``, ``needs_rebuild``, and ``want_cells`` (the cell count
    a rebuild would use). Pure decision logic over one aggregation —
    callers schedule :func:`ivfpq_rebuild_if_needed` on it."""
    stats = ivfpq_occupancy(index)
    want_cells, _, _ = ivfpq_params_for(stats["n_rows"], target_occupancy=target_occupancy)
    undersized = want_cells > stats["n_cells"]
    skewed = (
        stats["n_rows"] > 0
        and stats["max_occupancy"] > skew_factor * max(stats["mean_occupancy"], 1.0)
    )
    return {
        **stats,
        "want_cells": want_cells,
        "undersized": undersized,
        "skewed": skewed,
        "needs_rebuild": undersized or skewed,
    }


def ivfpq_rebuild_if_needed(
    index: IVFPQIndex,
    emb: DataFrame,
    target_occupancy: int = 4096,
    skew_factor: float = 4.0,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[IVFPQIndex, bool, dict]:
    """The append-lifecycle maintenance step: check :func:`ivfpq_health`
    and, when it votes rebuild, retrain cells + residual codebooks at
    the CURRENT corpus size (``ivfpq_params_for`` sizing, same m /
    n_codes as the existing index) and re-encode from the source
    vectors. Returns ``(index, rebuilt, health)`` — unchanged index
    when healthy, so callers can run this unconditionally after every
    append burst.

    ``emb`` is the source vector table (ids ⊇ the index's codes): PQ
    codes are lossy, so a rebuild must re-encode from vectors — the
    same table appends came from. Scale shape: the health check is one
    aggregation; the rebuild itself is one bounded driver-side k-means
    train plus one Arrow encode pass over the corpus (the
    :func:`ivfpq_index` bootstrap, now at the right cell count)."""
    health = ivfpq_health(index, target_occupancy=target_occupancy, skew_factor=skew_factor)
    if not health["needs_rebuild"]:
        return index, False, health
    m, n_codes, _ = index.codebooks.shape
    n_cells, _, sample_rows = ivfpq_params_for(
        health["n_rows"], target_occupancy=target_occupancy
    )
    rebuilt = ivfpq_index(
        emb, n_cells=n_cells, m=int(m), n_codes=int(n_codes),
        sample_rows=sample_rows, seed=seed, id_col=id_col, vec_col=vec_col,
    )
    return rebuilt, True, health


def ivfpq_split_cells(
    index: IVFPQIndex,
    emb: DataFrame,
    skew_factor: float = 4.0,
    max_splits: int = 8,
    sample_rows: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[IVFPQIndex, dict]:
    """INCREMENTAL IVF-PQ maintenance (r12, VERDICT item 7): split the
    overfull cells in place instead of retraining the whole index.

    :func:`ivfpq_rebuild_if_needed` answers occupancy drift with a FULL
    rebuild — new cells, new codebooks, a re-encode of every vector. At
    100 TB that is the expensive path, and it is almost always
    overkill: drift concentrates mass in a few hot cells while the
    rest of the index is fine. This splits ONLY those cells:

    - overfull = occupancy > ``skew_factor`` × mean (the
      :func:`ivfpq_health` skew rule), hottest ``max_splits`` per call
      (callers loop until healthy — each call is one bounded pass);
    - per overfull cell, k-means children are trained on a bounded
      hash-ordered sample of THAT CELL's vectors (semi-join pushdown —
      only the hot cells' vectors are ever re-read), child count sized
      so expected child occupancy ≈ the index mean;
    - the cell's centroid row is REPLACED by its first child and the
      rest append, so every untouched cell keeps its id and its codes
      are byte-identical — no re-encode outside the split cells;
    - codebooks stay FROZEN (they are global residual quantizers; the
      FAISS IVFADC convention), so re-encoding a split cell is one
      Arrow pass over its own vectors.

    Returns ``(index, report)`` — unchanged index and
    ``report["split"] == 0`` when nothing is overfull. Known
    approximation (documented, recall-gated by the catalog entry): a
    vector in an UNTOUCHED cell whose true nearest centroid becomes a
    new child keeps its stale assignment until its own cell is next
    refined — queries still find it through their n_probe neighborhood,
    and the ann_ivfpq_refine entry pins recall parity with the full
    rebuild."""
    occ_rows = index.codes.groupBy("cell").agg(F.count("*").alias("occ")).collect()
    n_cells = int(index.centroids.shape[0])
    n_rows = sum(int(r["occ"]) for r in occ_rows)
    mean = n_rows / max(n_cells, 1)
    overfull = sorted(
        (r for r in occ_rows if r["occ"] > skew_factor * max(mean, 1.0)),
        key=lambda r: -r["occ"],
    )[:max_splits]
    report = {
        "n_rows": n_rows,
        "cells_before": n_cells,
        "split": len(overfull),
        "split_cell_ids": [int(r["cell"]) for r in overfull],
        "reencoded_rows": 0,
    }
    if not overfull:
        report["cells_after"] = n_cells
        return index, report

    cents = index.centroids.copy()
    new_rows: list[np.ndarray] = []
    hot_ids = [int(r["cell"]) for r in overfull]
    from ._caches import tracked_persist

    # persisted: consumed once per split cell (the per-cell training
    # sample collects) plus once by the final re-encode — unpersisted,
    # each of those up to max_splits+1 actions re-runs the emb⨝codes
    # join from scratch and the claimed O(hot-mass) pass multiplies
    hot_vec = tracked_persist(
        emb.join(
            index.codes.filter(F.col("cell").isin(hot_ids)).select(
                F.col("neighbor_id").alias(id_col), "cell"
            ),
            id_col,
        )
    )
    for r in overfull:
        cell_id, occ = int(r["cell"]), int(r["occ"])
        n_children = max(2, int(round(occ / max(mean, 1.0))))
        mat = _hash_ordered_sample(
            hot_vec.filter(F.col("cell") == cell_id).drop("cell"),
            min(sample_rows, occ),
            id_col,
            vec_col,
        )
        children = _pq_kmeans(mat, min(n_children, len(mat)), seed=seed + cell_id)
        cents[cell_id] = children[0]
        new_rows.extend(children[1:])
    new_cents = np.vstack([cents] + new_rows) if new_rows else cents

    # re-assign + re-encode ONLY the split cells' vectors against the
    # full new centroid set (they may legitimately move to an untouched
    # neighbor cell) with the frozen codebooks
    touched = _ivfpq_encode(hot_vec.drop("cell"), new_cents, index.codebooks, id_col, vec_col)
    codes = index.codes.filter(~F.col("cell").isin(hot_ids)).unionByName(touched)
    report["cells_after"] = int(new_cents.shape[0])
    report["reencoded_rows"] = sum(int(r["occ"]) for r in overfull)
    return IVFPQIndex(new_cents, index.codebooks, codes), report


def ivfpq_maintain(
    index: IVFPQIndex,
    emb: DataFrame,
    target_occupancy: int = 4096,
    skew_factor: float = 4.0,
    max_splits: int = 8,
    sample_rows: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[IVFPQIndex, str, dict]:
    """The append-lifecycle POLICY (r12): one health check, then the
    cheapest sufficient action — the function a maintenance scheduler
    calls after every append burst.

    - healthy → ``(index, "none", health)``, untouched;
    - **skewed only** → :func:`ivfpq_split_cells` (O(hot-mass):
      drift concentrated mass in a few cells, the rest of the index
      is fine — splitting is recall-parity with a rebuild at far
      lower cost, gated by ann_ivfpq_refine);
    - **undersized** (with or without skew) → full
      :func:`ivfpq_rebuild_if_needed` path: the corpus outgrew the
      trained state itself, so the codebooks are stale everywhere and
      cell-local surgery cannot restore the sizing rule — re-train at
      the current row count.

    Returns ``(index, action, health)`` with action ∈
    {"none", "split", "rebuild"}."""
    health = ivfpq_health(
        index, target_occupancy=target_occupancy, skew_factor=skew_factor
    )
    if not health["needs_rebuild"]:
        return index, "none", health
    if health["undersized"]:
        rebuilt, _, _ = ivfpq_rebuild_if_needed(
            index, emb, target_occupancy=target_occupancy,
            skew_factor=skew_factor, seed=seed, id_col=id_col, vec_col=vec_col,
        )
        return rebuilt, "rebuild", health
    refined, report = ivfpq_split_cells(
        index, emb, skew_factor=skew_factor, max_splits=max_splits,
        sample_rows=sample_rows, seed=seed, id_col=id_col, vec_col=vec_col,
    )
    return refined, ("split" if report["split"] else "none"), health


def ivfpq_encode(
    index: IVFPQIndex, emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(neighbor_id, cell, codes) for ``emb`` under the index's frozen
    cells + residual codebooks — the public bulk-encode face
    (pq_encode's twin for the combined index); ivfpq_append is this
    plus the union with the stored codes."""
    return _ivfpq_encode(emb, index.centroids, index.codebooks, id_col, vec_col)


def ivfpq_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 8,
    m: int = 16,
    n_codes: int = 32,
    refine: int = 16,
    sample_rows: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ ANN — the full FAISS IVFADC recipe: k-means cells for
    coarse routing (ivf_topk's adaptation to clustered corpora) PLUS
    product-quantized RESIDUALS for the in-cell scan (pq_topk's
    compressed-scan economics). (query_id, neighbor_id, rank, cosine).
    The from-scratch convenience face: builds a throwaway
    :func:`ivfpq_index` and searches it; a production pipeline
    persists the index once and calls :func:`ivfpq_search`."""
    idx = ivfpq_index(
        emb, n_cells=n_cells, m=m, n_codes=n_codes, sample_rows=sample_rows,
        seed=seed, id_col=id_col, vec_col=vec_col,
    )
    return ivfpq_search(
        idx, emb, query_ids, k=k, n_probe=n_probe, refine=refine,
        id_col=id_col, vec_col=vec_col,
    )


def ivfpq_search(
    index: IVFPQIndex,
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_probe: int = 8,
    refine: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a (persisted) IVF-PQ index: each query probes its
    ``n_probe`` nearest cells; the ADC score decomposes as
    q·centroid(cell) + Σᵢ LUT_q[i][codeᵢ] because v ≈ centroid +
    residual and the residual codebooks are global — the
    per-(query,cell) work is ONE bias add over the same queries-sized
    LUTs flat PQ uses, and rows outside probed cells are never touched
    (the candidate volume drops by ~n_probe/n_cells vs flat PQ). Top
    ``k·refine`` ADC candidates re-rank by exact cosine; same
    empty-result contract as the cosine family."""

    _check_query_batch(query_ids, "ivfpq_search")
    cents, cb, codes = index.centroids, index.codebooks, index.codes
    m, _, sub = cb.shape

    # ---- per-query probes, biases, and LUTs ---------------------------
    qrows = emb.filter(F.col(id_col).isin(query_ids)).select(id_col, vec_col).collect()
    qids = [r[0] for r in qrows]
    if qrows:
        qmat = np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows])
        qn = np.linalg.norm(qmat, axis=1, keepdims=True)
        keep = qn[:, 0] > 0
        qids, qmat = [q for q, kq in zip(qids, keep) if kq], qmat[keep] / qn[keep]
    if not qids:
        return emb.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, rank int, cosine double"
        )
    qc = qmat @ cents.T  # (queries, cells): the bias term AND the probe order
    luts = np.stack(
        [np.stack([qv[i * sub : (i + 1) * sub] @ cb[i].T for i in range(m)]) for qv in qmat]
    )  # (queries, m, n_codes)
    probe_rows = []
    for qi, q in enumerate(qids):
        for cell in np.argsort(-qc[qi])[:n_probe]:
            probe_rows.append((qi, int(q), int(cell), float(qc[qi, cell])))
    probes = emb.sparkSession.createDataFrame(
        probe_rows, "qidx int, query_id long, cell int, bias double"
    )

    @F.pandas_udf("double")
    def adc(qidx: pd.Series, code_col: pd.Series) -> pd.Series:
        cmat = np.stack([np.asarray(c, dtype=np.int64) for c in code_col])
        qi = qidx.to_numpy()
        s = np.zeros(len(cmat))
        for i in range(m):
            s += luts[qi, i, cmat[:, i]]
        return pd.Series(s)

    scored = (
        codes.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("adc", F.col("bias") + adc(F.col("qidx"), F.col("codes")))
    )
    cand = (
        scored.withColumn(
            "r",
            F.expr(
                "row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id)"
            ),
        )
        .filter(F.col("r") <= k * refine)
        .select("query_id", "neighbor_id")
    )
    # exact re-rank, bounded at queries × k·refine (the shared tail)
    return _exact_rerank(emb, cand, query_ids, k, id_col, vec_col)


def kcenter_select(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-CENTER coreset selection (Gonzalez 1985, the farthest-
    point traversal): pick the corpus's ``k`` most mutually distant
    vectors — the classic diversity-sampling step for training-data
    curation (a 2-approximation of the optimal covering radius: cover
    the embedding space with few exemplars instead of sampling the
    dense blobs redundantly). Returns (sel_rank, id, radius): the
    selection order and, for each pick after the first, its distance
    to the already-selected set at selection time — a non-increasing
    sequence whose tail estimates the corpus covering radius. The
    first center is the MINIMUM id (deterministic anchor; Gonzalez
    starts anywhere); squared L2 is the metric (monotone in L2 — no
    sqrt, so every arithmetic op is correctly-rounded mul/add/sub and
    any engine replays the run bit-identically, ties broken by id).

    Duplicate vectors: once selected, a point's own dmin is 0, so
    re-selection can only happen when EVERY remaining dmin is 0
    (k > distinct vectors) — documented degenerate case.

    Scale shape: k−1 rounds; each is one broadcast-literal distance
    map over the corpus (the 64-double center rides the plan) + one
    TakeOrdered(1) argmax; per-point state is ONE double (dmin),
    lineage truncated per round. The driver holds k vectors. The
    classic trade: exact greedy needs k passes — for k beyond a few
    hundred, switch to kmeans_clusters (one Lloyd pass per iteration,
    approximate diversity) or sample-then-select."""
    if k < 1:
        raise ValueError(f"kcenter_select: k must be >= 1, got {k}")
    first = (
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy("id")
        .limit(1)
        .collect()
    )
    if not first:
        raise ValueError("kcenter_select: empty corpus")
    spark = emb.sparkSession
    c0_id, c0_vec = first[0].id, list(first[0].v)

    def dist_to(center_vec):
        lit = F.array(*[F.lit(float(x)) for x in center_vec])
        return F.aggregate(
            F.zip_with(F.col("v"), lit, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    state = (
        emb.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .withColumn("dmin", dist_to(c0_vec))
        .localCheckpoint()
    )
    picks = [(1, c0_id, None)]
    for rank in range(2, k + 1):
        best = state.orderBy(F.col("dmin").desc(), "id").limit(1).collect()[0]
        picks.append((rank, best.id, float(best.dmin)))
        state = state.withColumn(
            "dmin", F.least(F.col("dmin"), dist_to(list(best.v)))
        ).localCheckpoint()
    id_type = dict(emb.dtypes)[id_col]
    return spark.createDataFrame(
        picks, f"sel_rank int, {id_col} {id_type}, radius double"
    )
