"""Skew mitigation utilities.

At 100 TB a handful of hot keys (one returnflag value, one power user)
can pin a single reducer. AQE's skew-join handling covers joins; for
aggregations over pathologically hot grouping keys this provides the
classic salting pattern: explode each key into ``salt_buckets``
sub-keys, partially aggregate, then re-aggregate the partials — two
small shuffles instead of one skewed one.

Only algebraic aggregates (sum/count/min/max) re-aggregate losslessly;
that's what's offered. (avg = salted sum / salted count.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def auto_salt(df: DataFrame, keys: list[str]) -> int:
    """The salt factor :func:`skew_report` suggests for this frame's
    heaviest key — ``salt_buckets="auto"`` resolves through here (one
    extra partial-agg shuffle on the same key; pay it when you don't
    already know the skew, skip it by passing the number when you do).
    1 means "don't salt" (no key exceeds 2× the mean)."""
    rows = skew_report(df, keys, k=1).collect()
    return int(rows[0]["suggested_salt"]) if rows else 1


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str] = (),
    min_cols: list[str] = (),
    max_cols: list[str] = (),
    count: bool = True,
    salt_buckets: int | str = 16,
) -> DataFrame:
    """groupBy(keys).agg(sum/min/max/count) with salted two-phase
    execution. Output columns: ``sum_<c>``, ``min_<c>``, ``max_<c>``,
    ``n`` — identical values to the direct aggregation.

    The salt is DETERMINISTIC (row-content hash): attempt-dependent
    salts (spark_partition_id / monotonically_increasing_id) change
    when a map stage is partially re-executed after a shuffle fetch
    failure, so reducers consuming a mix of old and new map output
    can double-count or drop rows (the SPARK-23207 class of bug) —
    precisely at the scale where task retries are routine. Caveat:
    byte-identical duplicate rows of a hot key all hash to ONE salt
    bucket, so a corpus that is mostly literal copies of one row
    stays skewed; dedup such inputs first (or add a distinguishing
    column) — correctness under retry wins over spread here.

    ``salt_buckets="auto"`` closes the skew_report loop: the factor
    comes from :func:`auto_salt` (the report's suggestion for the
    heaviest key) instead of a guessed constant."""
    if salt_buckets == "auto":
        salt_buckets = auto_salt(df, keys)
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )
    partial_aggs = (
        [F.sum(c).alias(f"__ps_{c}") for c in sum_cols]
        + [F.min(c).alias(f"__pmin_{c}") for c in min_cols]
        + [F.max(c).alias(f"__pmax_{c}") for c in max_cols]
        + ([F.count("*").alias("__pn")] if count else [])
    )
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    final_aggs = (
        [F.sum(f"__ps_{c}").alias(f"sum_{c}") for c in sum_cols]
        + [F.min(f"__pmin_{c}").alias(f"min_{c}") for c in min_cols]
        + [F.max(f"__pmax_{c}").alias(f"max_{c}") for c in max_cols]
        + ([F.sum("__pn").alias("n")] if count else [])
    )
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int | str = 16,
) -> DataFrame:
    """Equi join resilient to hot keys on the BIG side: the big side
    gets a deterministic salt (hash of its whole row, so any hot join
    key spreads over ``salt_buckets`` reducers) and the small side is
    replicated once per salt value — shuffle skew bounded at the cost
    of small × salt_buckets duplication. AQE's skew-join handles most
    cases at runtime; this is the explicit form for when the skew is
    known and extreme (or AQE is unavailable). Result == ``big.join(
    small, on)`` with columns in big-then-small order."""
    if "__salt" in big.columns or "__salt" in small.columns:
        raise ValueError("inputs already carry a __salt column")
    if salt_buckets == "auto":
        # the BIG side's join-key skew decides the factor — small-side
        # replication cost scales with it, so "don't salt" (1) is the
        # suggestion for an unskewed big side
        salt_buckets = auto_salt(big, on)
    # deterministic row-content salt, same rationale as
    # salted_aggregate: an attempt-dependent salt (e.g.
    # monotonically_increasing_id) re-buckets rows when a map stage is
    # partially retried, and reducers holding a mix of attempts then
    # join a row twice or never. Caveat: byte-identical duplicate rows
    # collapse to one salt bucket and stay skewed — correctness under
    # retry wins; dedup literal-copy inputs first if that bites.
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_big.join(salted_small, on + ["__salt"]).drop("__salt")


def skew_report(df: DataFrame, keys: list[str], k: int = 10) -> DataFrame:
    """The decide-before-you-salt diagnostic: the ``k`` heaviest
    grouping keys with their row counts, share of the corpus, and the
    hot-key skew factor (key rows ÷ mean rows per key — the reducer
    imbalance a plain shuffle on this key would suffer).

    One partial-agg shuffle on the key + a TakeOrdered cut; the two
    corpus scalars (total rows, distinct keys) attach as 1-row
    broadcast bounds. Rule of thumb: skew_factor ≳ the executor count
    means the hot key pins a reducer for the whole stage — route the
    aggregation through :func:`salted_aggregate` (or the join through
    :func:`salted_join`).

    ``suggested_salt`` (r7) closes the loop: the salt factor that
    flattens this key to roughly mean-sized buckets — ``⌈skew_factor⌉``
    for keys whose skew exceeds 2× the mean, 1 (don't salt) otherwise,
    capped at 1024 (past that, per-salt partial-agg rows outweigh the
    spread; shuffle-partition count is the practical ceiling anyway).
    Feed the max over the report's rows straight into
    ``salted_aggregate(..., n_salts=...)``."""
    counts = df.groupBy(*keys).agg(F.count("*").alias("n"))
    totals = counts.agg(
        F.sum("n").alias("__total"), F.count("*").alias("__nkeys")
    )
    top = counts.orderBy(F.col("n").desc(), *keys).limit(k)
    skew_factor = F.col("n") * F.col("__nkeys") / F.col("__total")
    # the two reported ratios are rounded by EXACT integer half-up
    # (floor((2·x·scale + t) / 2t)), not ROUND on a double: a ratio
    # landing on a half boundary (1.005 at sf0.001) rounds through the
    # shortest-decimal repr in Spark but through the binary value in
    # DuckDB, and the two disagree. Integer arithmetic caps n at
    # ~4.6e12 rows per key before bigint overflow — far beyond any
    # per-key count this diagnostic would ever report.
    share4 = F.expr("(n * CAST(2000000 AS BIGINT) + __total) div (2 * __total)")
    skew2 = F.expr("(n * __nkeys * CAST(200 AS BIGINT) + __total) div (2 * __total)")
    return top.crossJoin(F.broadcast(totals)).select(
        *keys,
        "n",
        (share4.cast("double") / F.lit(10_000.0)).alias("share_pct"),
        (skew2.cast("double") / F.lit(100.0)).alias("skew_factor"),
        F.when(skew_factor <= 2.0, F.lit(1))
        .otherwise(F.least(F.ceil(skew_factor), F.lit(1024)))
        .cast("int")
        .alias("suggested_salt"),
    )
