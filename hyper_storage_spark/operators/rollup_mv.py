"""Incremental rollup maintenance: continuous-aggregate semantics
(Timescale-style) expressed as mergeable partial aggregates.

The reference is a document store with no aggregation layer at all
(SURVEY.md §2.4); this module supplies the piece a 100 TB metrics/
training-telemetry pipeline actually needs: a persisted per-(key,
bucket) rollup that is refreshed by a DELTA-sized job instead of a
full rescan. The invariant that makes it work is the classic
algebraic-aggregate decomposition: (count, sum, min, max) are
mergeable — partials from disjoint row sets combine with
(+, +, least, greatest) into exactly the partials of the union —
and derived values (avg) are finalized from the merged partials.

Refresh cost model at scale:
 - ``rollup_partials(delta)`` scans ONLY the new rows (one map-side
   partial agg; exchange is bucket-count-sized, not row-sized);
 - ``rollup_merge`` splits the existing MV into touched / untouched
   buckets with a broadcast semi/anti join against the delta's tiny
   bucket list, re-aggregates ONLY the touched slice, and passes the
   untouched slice through UNCHANGED (no shuffle on a bucket the
   delta didn't hit — at 100 TB the MV is large and the delta's
   bucket footprint is a few recent time buckets);
 - with the MV stored partitioned by bucket date, the passthrough is
   not even rewritten — dynamic partition overwrite rewrites only
   touched partitions.

Exactness: merge(partials(base), partials(delta)) ≡ partials(base ∪
delta) row-for-row, which the catalog entry's oracle checks by
aggregating the union directly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PARTIAL_COLS = ("n", "total", "vmin", "vmax")


def rollup_partials(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    resolution: str = "day",
) -> DataFrame:
    """One-pass partial aggregates: (keys…, bucket_start, n, total,
    vmin, vmax) at ``resolution`` (any date_trunc unit)."""
    keys = [F.col(c) for c in key_cols]
    return df.groupBy(
        *keys, F.date_trunc(resolution, F.col(ts_col)).alias("bucket_start")
    ).agg(
        F.count(value_col).alias("n"),
        F.sum(value_col).alias("total"),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
    )


def rollup_merge(existing: DataFrame, delta: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Merge delta partials into an existing rollup, delta-bounded.

    Buckets absent from the delta are passed through without
    re-aggregation (anti join against the delta's distinct bucket
    list — broadcast-sized: a refresh window's worth of timestamps);
    touched buckets are re-aggregated from (existing slice ∪ delta).
    Column sets must match ``rollup_partials`` output."""
    grain = [*key_cols, "bucket_start"]
    for c in (*grain, *_PARTIAL_COLS):
        if c not in existing.columns or c not in delta.columns:
            raise ValueError(f"partial column {c!r} missing from existing/delta rollup")
    touched_buckets = delta.select("bucket_start").distinct()
    untouched = existing.join(F.broadcast(touched_buckets), on="bucket_start", how="left_anti")
    touched = existing.join(F.broadcast(touched_buckets), on="bucket_start", how="left_semi")
    merged = (
        touched.unionByName(delta.select(*touched.columns))
        .groupBy(*grain)
        .agg(
            F.sum("n").alias("n"),
            F.sum("total").alias("total"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
    )
    return untouched.select(*grain, *_PARTIAL_COLS).unionByName(
        merged.select(*grain, *_PARTIAL_COLS)
    )


def rollup_finalize(partials: DataFrame) -> DataFrame:
    """Derive the non-mergeable serving view from merged partials:
    adds ``avg = double(total) / n``. The partials stay the exact
    (decimal-sum) source of truth; the derived average is a double on
    purpose — IEEE division of the exact sum is the one portable
    semantics every serving engine agrees on, where decimal-division
    scale rules differ per engine. Keep serving reads on this view,
    never on raw partials."""
    return partials.withColumn("avg", F.col("total").cast("double") / F.col("n"))
