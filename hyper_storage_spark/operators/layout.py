"""Physical layout operators: multi-dimensional clustering for
data-skipping at scale.

Parquet scans prune row groups and files from min/max statistics, but
statistics only help when the layout CLUSTERS the filtered columns. A
sort clusters one column perfectly and leaves every other column's
min/max spanning the whole table; Z-ordering (bit-interleaved Morton
codes over rank-bucketed columns) trades a little per-column locality
for bounded ranges on ALL the interleaved columns — the standard
multi-dimensional data-skipping layout (Delta/Iceberg `OPTIMIZE
ZORDER BY` does the same thing).

At 100 TB this is a write-once layout pass: compute the Z-code, range
partition on it, write. Every later scan with predicates on any
interleaved column prunes most files from footer stats alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 8  # rank resolution per dimension (256 buckets — file-level
# pruning needs far fewer buckets than files; raise for huge tables)


def _interleave(ranks: list[Column], bits: int) -> Column:
    """Morton code: bit-interleave the rank columns into one long.
    Pure Column expression — ``bits * len(ranks)`` shift/or terms, all
    inside whole-stage codegen."""
    if bits * len(ranks) > 63:
        # bit 63 is the sign: overflowing into it makes high-rank rows
        # NEGATIVE, so range partitioning silently inverts their order
        # and every file spans the full min/max — data skipping dies
        raise ValueError(
            f"bits ({bits}) x columns ({len(ranks)}) = {bits * len(ranks)} "
            "exceeds the 63 value bits of a long; lower bits or columns"
        )
    z = F.lit(0).cast("long")
    n = len(ranks)
    for b in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, b).bitwiseAND(F.lit(1)).cast("long")
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def zorder_code(
    df: DataFrame, cols: list[str], bits: int = _BITS, rel_err: float = 0.001
) -> DataFrame:
    """Attach a ``__zcode`` Morton-code column over ``cols``.

    Each column is rank-bucketed into ≤2^bits quantile buckets first
    (quantiles, not raw values: interleaving only works on uniformly
    distributed fixed-width ranks — raw skewed values would starve
    some dimensions of bits). Quantile boundaries come from one
    ``approxQuantile`` pass (Greenwald–Khanna sketch; the driver holds
    only the boundary array) and are applied by ``Bucketizer`` — a
    JVM-side binary search per row, no global sort, no window."""
    from pyspark.ml.feature import Bucketizer

    if not cols:
        raise ValueError("need at least one column")
    if bits * len(cols) > 63:
        # validate the bit budget BEFORE the quantile pass: _interleave
        # raises the same error, but only after an approxQuantile scan
        # with 2^bits-1 probability points has already run (measured
        # 33 s at bits=16 on a 1-row frame — all driver/sketch setup)
        raise ValueError(
            f"bits ({bits}) x columns ({len(cols)}) = {bits * len(cols)} "
            "exceeds the 63 value bits of a long; lower bits or columns"
        )
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    tmp = df
    for c in cols:
        tmp = tmp.withColumn(f"__d_{c}", F.col(c).cast("double"))
    all_bounds = tmp.stat.approxQuantile([f"__d_{c}" for c in cols], probs, rel_err)
    for c, bounds in zip(cols, all_bounds):
        # strictly increasing splits (low-cardinality columns repeat
        # quantiles); +-inf endpoints catch the extremes
        splits = [float("-inf")] + sorted(set(bounds)) + [float("inf")]
        bucketizer = Bucketizer(
            splits=splits, inputCol=f"__d_{c}", outputCol=f"__r_{c}", handleInvalid="keep"
        )
        tmp = bucketizer.transform(tmp)
    # handleInvalid="keep" maps NaN/null to one-past-the-last bucket,
    # which would overflow the bit budget and ALIAS to rank 0 (the
    # min-value files) in the interleave; clamp invalids to the top
    # rank instead so they cluster together at the high end
    max_rank = F.lit((1 << bits) - 1)
    code = _interleave(
        [F.least(F.col(f"__r_{c}").cast("int"), max_rank) for c in cols], bits
    )
    drop = [f"__d_{c}" for c in cols] + [f"__r_{c}" for c in cols]
    return tmp.withColumn("__zcode", code).drop(*drop)


def zorder_layout(
    df: DataFrame, cols: list[str], n_partitions: int, bits: int = _BITS
) -> DataFrame:
    """Range-partition the table by its Z-code (and sort within
    partitions) so every output file covers a compact hyper-rectangle
    of the interleaved columns — the write-side half of data skipping.
    Returns the re-laid-out DataFrame ready for ``write.parquet``;
    the ``__zcode`` column is dropped after partitioning."""
    return (
        zorder_code(df, cols, bits)
        .repartitionByRange(n_partitions, "__zcode")
        .sortWithinPartitions("__zcode")
        .drop("__zcode")
    )


def partition_pruning_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-partition min/max of ``cols`` — the footer statistics a
    reader would prune on, surfaced for measuring layout quality
    (tests assert Z-order beats a single-column sort on
    multi-dimensional predicates)."""
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(*aggs)
    )
