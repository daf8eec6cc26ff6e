"""Dataset splitting & sampling for training-data pipelines.

- :func:`hash_split` — deterministic train/val/test assignment from a
  stable id hash. The property that matters at corpus scale: the
  assignment is a PURE FUNCTION of the row's id (and salt), so it is
  reproducible across runs, clusters, and partitionings, rows never
  migrate between splits when the corpus grows (new ids land in
  splits at the configured rates; old ids stay put), and no shuffle,
  sample(), or RNG state is involved — one codegen'd expression.
- :func:`stratified_sample` — per-stratum Bernoulli sampling
  (``df.sampleBy``) with a fixed seed: keeps a target mix across a
  quality/language/source column without materializing per-stratum
  counts first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000  # split resolution: 1e-6 of probability mass


def split_bucket(id_col: Column, salt: int = 0) -> Column:
    """The stable per-row bucket in [0, 1e6) driving hash_split —
    exposed so callers can inspect or stratify on it."""
    return F.pmod(F.xxhash64(id_col, F.lit(salt)), F.lit(_BUCKETS))


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hashing its id.

    ``fractions`` maps split name → probability mass; they must sum to
    1 (within 1e-9) so the assignment is exhaustive — every row gets
    exactly one split, disjoint by construction (contiguous bucket
    ranges over one hash value). Deterministic under retries for the
    same reason the skew salts are (pure content hash, no
    monotonically_increasing_id / partition id)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if not fractions:
        raise ValueError("need at least one split")
    if split_col in df.columns:
        raise ValueError(f"column {split_col!r} already exists")
    bucket = split_bucket(F.col(id_col), salt)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = bucket < int(round(acc * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # the last split takes the remainder — exhaustive even under
    # floating-point rounding of the cumulative thresholds
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 7
) -> DataFrame:
    """Per-stratum Bernoulli sample at the given rates (strata missing
    from ``fractions`` are dropped — the data-mixing convention)."""
    return df.sampleBy(strata_col, fractions, seed=seed)
