"""Graph analytics over edge tables — the link-signal family next to
dedup.py's connected components.

PageRank is the classic pretraining-data quality signal (crawl-graph
importance feeds page-level quality filters), and the operator here is
the standard Spark Pregel-ish shape: the graph never leaves the
executors, every iteration is one edge⋈rank join plus one grouped
reduction, and the driver holds only scalars (node count, iteration
index).

Cross-engine exactness (the catalog's hash-compare contract): per-node
contribution sums fold in PINNED source-id order (array_sort + left
fold — a plain SUM over doubles re-associates per partition), every
constant enters both engines through the same shortest-repr literal,
and each remaining op (one multiply, one divide per edge; one
multiply-add per node) has a single IEEE result — so ranks are
bit-identical and even the ORDER of the final ranking cannot diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge table:
    (node, val) after ``iters`` synchronous updates of
    val(v) = (1−d)/N + d · Σ_{u→v} val(u)/outdeg(u).

    Variant notes (documented, deterministic): self-loops are dropped;
    dangling nodes (no out-edges) contribute nothing beyond the
    teleport term (no dangling-mass redistribution — the common
    simplification for quality-signal use); fixed iteration count, no
    convergence test (replayable by construction).

    Mechanics: every node carries a zero-weight self-edge so it
    appears in every iteration's reduction even with no in-edges (and
    so both engines fold the IDENTICAL term list per node — the zero
    term included). Each iteration ends in a lazy localCheckpoint to
    truncate lineage (duplicate_clusters' discipline; swap for
    ``checkpoint`` with a reliable dir on a real cluster).

    Scale shape: iterations are edge-partitioned joins + grouped
    folds — the textbook distributed PageRank; driver state is two
    scalars. The collect-list fold per node is bounded by in-degree;
    for power-law graphs with mega-degree hubs, pre-aggregate per
    (dst, src-bucket) first — at the catalog's gate scope in-degrees
    are dimension-bounded."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("val", F.lit(0.0))
    deg = e.groupBy("src").agg(F.count("*").alias("d"))
    # zero-weight self-edges: the per-node carrier (see docstring)
    e2 = (
        e.withColumn("w", F.lit(1.0))
        .unionByName(
            nodes.select(
                F.col("node").alias("src"), F.col("node").alias("dst"),
                F.lit(0.0).alias("w"),
            )
        )
        .join(deg, "src", "left")
        .withColumn("d", F.coalesce(F.col("d"), F.lit(1)))
        .localCheckpoint()
    )
    teleport = (1.0 - damping) / n  # two IEEE ops, mirrored in oracles
    pr = nodes.withColumn("val", F.lit(1.0 / n))
    for _ in range(iters):
        contribs = e2.join(pr, e2["src"] == pr["node"]).select(
            "dst",
            F.col("src").alias("u"),
            (F.col("w") * F.col("val") / F.col("d")).alias("c"),
        )
        folded = contribs.groupBy("dst").agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("u", "c"))),
                    lambda t: t["c"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("s")
        )
        pr = folded.select(
            F.col("dst").alias("node"),
            (F.lit(teleport) + F.lit(damping) * F.col("s")).alias("val"),
        ).localCheckpoint(eager=False)
    return pr
