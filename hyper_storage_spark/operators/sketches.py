"""Frequency sketches: Count-Min heavy hitters with certificates.

Count-Min is the streaming/batch frequency sketch: a tiny
(depth × width) counter grid whose point query NEVER underestimates and
overestimates by at most ``(e/width) × N`` per row with probability
``1 - e^-depth`` overall. At 100 TB the sketch is the only viable "how
often does X occur" answer for AD-HOC values — a fixed few-KB state
built in one pass, vs a full shuffle of every distinct value per
question.

Implemented as PURE DataFrame ops (PySpark 4 dropped the
``df.stat.countMinSketch`` helper): cell index = pmod(xxhash64(value,
row_seed), width). Building the grid is one explode(depth) +
groupBy((row, cell)) — the map-side partial aggregation collapses each
partition's contribution to ≤ depth × width cells before the shuffle,
so the exchange is sketch-sized, not corpus-sized, exactly the
mergeable-partials property the sketch is chosen for. Point queries
join probe cells against the sparse grid and take the per-value min.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cell(col, row_seed: int, width: int):
    return F.pmod(F.xxhash64(col, F.lit(row_seed)), F.lit(width))


def cms_build(df: DataFrame, col: str, depth: int = 5, width: int = 2719) -> DataFrame:
    """The sparse Count-Min grid: (row, cell, cnt). depth rows of width
    cells; default width 2719 ≈ e/0.001 (ε = 0.001·N additive error),
    depth 5 (≈99.3% confidence). NULL values are excluded — they have
    no hash cell, and counting them would silently merge every NULL
    into one phantom heavy hitter (the estimate join is null-rejecting
    too, so inclusion here would just undercount them instead)."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    df = df.filter(F.col(col).isNotNull())
    probes = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _cell(F.col(col), i, width).alias("cell")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rc")
    )
    return probes.groupBy(F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell")).agg(
        F.count("*").alias("cnt")
    )


def cms_estimate(grid: DataFrame, values: DataFrame, col: str, depth: int = 5, width: int = 2719) -> DataFrame:
    """Point-query a grid for each value in ``values[col]``: adds
    ``cms_estimate`` = min over the depth probed cells. Probe cells are
    a per-value literal expression; the join against the ≤ depth×width
    grid is broadcast-sized by construction."""
    probes = values.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _cell(F.col(col), i, width).alias("cell")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rc"),
    ).select(col, F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
    joined = probes.join(grid, ["row", "cell"], "left").select(
        col, F.coalesce(F.col("cnt"), F.lit(0)).alias("cell_cnt")
    )
    return values.join(
        joined.groupBy(col).agg(F.min("cell_cnt").alias("cms_estimate")), col
    )


def heavy_hitters_cms(
    df: DataFrame,
    col: str,
    k: int = 20,
    depth: int = 5,
    width: int = 2719,
) -> DataFrame:
    """Exact top-``k`` values of ``col`` (count desc, value asc
    tie-break) with a Count-Min certificate per row:

    (value, n_exact, cms_estimate, overestimates, within_eps_n)

    ``overestimates`` asserts the sketch's one-sided error
    (estimate ≥ exact — structural: colliding values only ADD);
    ``within_eps_n`` asserts estimate ≤ exact + ceil(e/width × N)
    (holds with ≈1-e^-depth confidence). The exact twin is itself
    scale-sane (partial-agg shuffle + TakeOrdered, never an
    unpartitioned row_number window), and exists to pick and certify
    the k values at gate SF."""
    import math

    df = df.filter(F.col(col).isNotNull())  # match the grid's domain
    grid = cms_build(df, col, depth, width)
    counts = df.groupBy(F.col(col).alias("value")).agg(F.count("*").alias("n_exact"))
    top = counts.orderBy(F.col("n_exact").desc(), F.col("value")).limit(k)
    est = cms_estimate(grid, top, "value", depth, width)
    total = df.count()
    bound = int(math.ceil(math.e / width * total))
    return est.select(
        "value",
        "n_exact",
        "cms_estimate",
        (F.col("cms_estimate") >= F.col("n_exact")).alias("overestimates"),
        (F.col("cms_estimate") <= F.col("n_exact") + F.lit(bound)).alias("within_eps_n"),
    ).orderBy(F.col("n_exact").desc(), F.col("value"))
