"""Co-located joins via Spark bucketing — the shuffle-free join path.

At 100 TB the dominant cost of a repeated fact⋈fact join is the
shuffle: every execution re-exchanges both sides on the join key. Spark
bucketing amortizes that exchange into the WRITE: a table stored with
``bucketBy(n, key) + sortBy(key)`` records its hash-partitioning in the
catalog, and a join between two tables bucketed the same way (same key,
compatible bucket counts) runs as a SortMergeJoin with NO Exchange on
either side — each task zips bucket i with bucket i. This is the Spark
analog of the reference's fixed CRC32(uri) % 1024 shard layout
(TransactionLogic.scala:26-30): co-partitioning chosen once at layout
time so every subsequent operation is local.

Guidance encoded here:
- bucket count is a layout-time contract — pick it for the TARGET
  corpus (buckets ≈ corpus_bytes / 256 MB, round to a power of two) so
  one bucket fits an executor core's working set at full scale;
- ``sortBy`` the same key: buckets come out pre-sorted, so the
  SortMergeJoin's per-task Sort (which Spark ≥3.0 always inserts — it
  no longer trusts file ordering) degenerates to a cheap linear pass,
  and the files compress/min-max-prune better;
- joining a bucketed table against an UNBUCKETED frame still helps:
  only the unbucketed side exchanges (Spark shuffles it INTO the
  table's bucketing), halving shuffle volume.

Tested by plan-shape assertions in tests/test_operators.py (zero
Exchange two-sided, one Exchange one-sided, values == plain join).
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key_cols: Iterable[str],
    n_buckets: int = 16,
    path: Optional[str] = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (+ optionally sorted) parquet table
    registered in the session catalog — the co-location contract other
    writers join against. ``path`` makes it an external table (tests
    point this at a tmp dir; production at the lake location)."""
    from pyspark.sql import functions as F

    keys = list(key_cols)
    if not keys:
        raise ValueError("write_bucketed needs at least one key column")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    # repartition onto the bucket hash first: each bucket then lands in
    # ONE file. Without this every input task writes its own file per
    # bucket — a small-file explosion (tasks × buckets), AND Spark only
    # elides the SortMergeJoin's per-task sort when a bucket is a
    # single file (multi-file buckets void the per-file sort guarantee)
    df = df.repartition(n_buckets, *[F.col(k) for k in keys])
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Iterable[str],
    how: str = "inner",
) -> DataFrame:
    """Join two catalog tables on their bucketing key. When both sides
    are bucketed on ``on`` (same or multiple-of bucket counts) Catalyst
    plans the exchange-free SortMergeJoin; nothing here forces it — the
    function exists so call sites state the intent and the plan guard
    in tests keeps the property from regressing silently."""
    return spark.table(left_table).join(spark.table(right_table), on=list(on), how=how)
