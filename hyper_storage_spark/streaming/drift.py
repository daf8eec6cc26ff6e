"""Streaming drift monitor: per-micro-batch PSI against a static
reference distribution.

The serving face of the batch drift metrics (profiling.psi /
ks_two_sample): a stream of values is scored batch-by-batch against a
FIXED reference — "is today's traffic still shaped like the traffic I
calibrated on" — and each batch appends one (batch_id, n, psi) row to
a parquet log a dashboard/alerter tails.

Design:
- The reference reduces ONCE, at sink construction, to ``bins`` edge
  literals (exact interpolated percentiles) and per-bin counts — tiny
  driver-held state; the stream never touches the reference data
  again.
- Each micro-batch is binned against the edge literals (a codegen
  comparison chain, no join) and counted — one batch-sized
  aggregation.
- Exactly-once under foreachBatch's at-least-once contract by
  IDEMPOTENCE: batch ``b`` writes ``b{b:012d}.parquet`` via
  tmp+rename, so a replayed batch atomically rewrites the same file
  with the same content instead of double-appending (simpler than the
  rollup's pointer because rows here are per-batch independent — no
  merge to protect).
"""

from __future__ import annotations

import math
import os
import uuid
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def psi_from_counts(ref_counts: list[int], batch_counts: list[int]) -> float:
    """Smoothed PSI over aligned per-bin counts (the
    profiling.psi formula: +0.5 per bin, +bins/2 per total)."""
    bins = len(ref_counts)
    n1 = sum(ref_counts) + bins / 2.0
    n2 = sum(batch_counts) + bins / 2.0
    out = 0.0
    for c1, c2 in zip(ref_counts, batch_counts):
        p = (c1 + 0.5) / n1
        q = (c2 + 0.5) / n2
        out += (p - q) * math.log(p / q)
    return out


def streaming_psi_monitor(
    out_root: str,
    reference: DataFrame,
    value_col: str,
    bins: int = 10,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` sink scoring each micro-batch's
    ``value_col`` distribution against ``reference``'s. Appends rows
    (batch_id, n, psi) under ``out_root`` — read them back with
    ``spark.read.parquet(out_root)``."""
    if bins < 2:
        raise ValueError("bins must be >= 2")
    qs = [i / bins for i in range(1, bins)]
    edge_row = reference.agg(
        *[F.percentile(F.col(value_col), F.lit(p)).alias(f"e{i}") for i, p in enumerate(qs)]
    ).collect()[0]
    edges = [edge_row[f"e{i}"] for i in range(len(qs))]

    def bin_expr(col):
        return sum((F.col(col) > F.lit(e)).cast("int") for e in edges).alias("bin")

    def counts_of(df: DataFrame) -> list[int]:
        got = {
            r["bin"]: r["c"]
            for r in df.select(bin_expr(value_col)).groupBy("bin").agg(
                F.count("*").alias("c")
            ).collect()
        }
        return [int(got.get(b, 0)) for b in range(bins)]

    ref_counts = counts_of(reference)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(out_root, exist_ok=True)
        bc = counts_of(batch_df)
        n = sum(bc)
        score = psi_from_counts(ref_counts, bc)
        spark = batch_df.sparkSession
        row = spark.createDataFrame(
            [(int(batch_id), int(n), float(score))], "batch_id long, n long, psi double"
        )
        final = os.path.join(out_root, f"b{batch_id:012d}.parquet")
        tmp = final + f".tmp-{uuid.uuid4().hex}"
        row.coalesce(1).write.mode("overwrite").parquet(tmp)
        # tmp+rename: a replayed batch rewrites the SAME file (idempotent),
        # a crash mid-write leaves only a tmp dir the next run overwrites
        if os.path.exists(final):
            import shutil

            shutil.rmtree(final)
        os.rename(tmp, final)

    return apply_batch


def read_psi_log(spark, out_root: str) -> DataFrame:
    """The monitor's output log as a DataFrame (batch_id, n, psi)."""
    return spark.read.parquet(os.path.join(out_root, "b*.parquet"))
