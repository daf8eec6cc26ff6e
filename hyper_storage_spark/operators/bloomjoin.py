"""Bloom-filter runtime join pruning: pre-filter a huge probe side
with a tiny membership sketch of the build side's keys.

This is the runtime-filter pattern Spark's own planner applies when it
can (``spark.sql.optimizer.runtime.bloomFilter.enabled``) — made
explicit and composable, because the SQL surface for it
(``bloom_filter_agg`` / ``might_contain``) is not registered as a
public function and the planner only injects it for shapes it
recognizes. The 100 TB scenario: a fact-side shuffle join against a
dim that is too large to broadcast but whose KEY SET fits a bloom
filter. Pre-filtering the fact with the bloom drops non-matching rows
BEFORE the exchange, so the shuffle moves only (matches + false
positives) instead of the whole fact.

Mechanics, all JVM-side:
 - build: each key hashes to ``k`` bit positions
   (``pmod(xxhash64(key, seed), m)``); explode the k positions,
   ``groupBy(word) → bit_or(mask)`` — map-side partials collapse each
   partition to ≤ m/64 rows before the shuffle, so the exchange is
   sketch-sized, like sketches.py's Count-Min grid. The dense word
   array (m/64 longs — 8 KiB at the default m = 2^16, INDEPENDENT of
   build-side row count) is collected once on the driver, the same
   bounded-collect pattern as similarity.py's IVF centroids.
 - probe: the word array ships as an array literal; membership is an
   AND over k ``element_at(words, pos/64) & (1 << pos%64) != 0``
   checks — pure column expressions inside whole-stage codegen, no
   Python in the hot path.

A bloom has false positives but never false negatives, so
``bloom_prejoin`` keeps the real join after the pre-filter: results
are EXACTLY the plain join's (the oracle for the catalog entry), the
bloom only thins what reaches it.

Sizing: for n keys, false-positive rate ≈ (1 - e^(-k·n/m))^k;
the defaults (m = 65 536 bits, k = 5) give < 1% up to n ≈ 6 000 and
degrade gracefully — worst case the pre-filter passes everything and
the join result is still exact.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(col: Column, num_bits: int, k: int) -> List[Column]:
    # Seeded xxhash64 per probe: k independent positions in [0, m).
    return [F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(num_bits)) for seed in range(k)]


def bloom_build(df: DataFrame, col: str, num_bits: int = 1 << 16, k: int = 5) -> List[int]:
    """Aggregate ``df[col]`` into a dense bloom bit array of
    ``num_bits / 64`` longs. NULL keys are skipped (NULL never equi-
    joins, so the probe side's NULLs are droppable anyway)."""
    if num_bits % 64 != 0 or num_bits <= 0:
        raise ValueError(f"num_bits must be a positive multiple of 64, got {num_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pos = F.explode(F.array(*_positions(F.col(col), num_bits, k))).alias("pos")
    # pyspark's F.shiftleft only takes a Python-int shift amount; the
    # SQL expression form accepts a column shift.
    mask = F.expr("shiftleft(1L, cast(pos % 64 as int))")
    sparse = (
        df.filter(F.col(col).isNotNull())
        .select(pos)
        .groupBy((F.col("pos") / 64).cast("int").alias("word"))
        .agg(F.bit_or(mask).alias("bits"))
        .collect()
    )
    words = [0] * (num_bits // 64)
    for row in sparse:
        words[row.word] = row.bits
    return words


def bloom_might_contain(col: Column, words: List[int], k: int = 5) -> Column:
    """Membership test column: true iff all k probed bits are set.
    NULL keys test false (they cannot match an equi-join)."""
    num_bits = len(words) * 64
    # one parsed SQL expression, not F.lit(list): py4j converts list
    # literals element-by-element (~6 s at 16k words); the parser
    # takes the same array as one string in ~10 ms
    lit_words = F.expr("array(" + ",".join(f"{w}L" for w in words) + ")")
    checks = [
        F.element_at(lit_words, ((p / 64).cast("int") + 1))
        # F.shiftleft wants a Python-int shift; call the SQL function
        # directly so the shift can be a column.
        .bitwiseAND(F.call_function("shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")))
        != 0
        for p in _positions(col, num_bits, k)
    ]
    # explicit: xxhash64 SKIPS null arguments (the seed path remains),
    # so without this a NULL key would probe k fixed positions and
    # could pass once the filter fills — violating the contract
    out = col.isNotNull()
    for c in checks:
        out = out & c
    return out


def bloom_prejoin(
    fact: DataFrame,
    fact_col: str,
    dim: DataFrame,
    dim_col: str,
    num_bits: int = 1 << 16,
    k: int = 5,
    how: str = "inner",
    broadcast_dim: Optional[bool] = None,
) -> DataFrame:
    """Exact ``fact ⋈ dim`` with a bloom pre-filter on the fact side.

    The bloom is built from ``dim[dim_col]`` (one sketch-sized
    aggregation + an 8 KiB driver collect at default sizing), applied
    to ``fact[fact_col]`` before the join, then the real join removes
    the bloom's false positives — the result is bit-identical to the
    plain join. ``broadcast_dim=None`` leaves the join strategy to
    Catalyst/AQE (the interesting 100 TB case is precisely when the
    dim does NOT broadcast); pass True to hint it for small dims."""
    if how not in ("inner", "left_semi"):
        raise ValueError(f"bloom pre-filtering only helps inner/semi joins, got {how!r}")
    # xxhash64 is TYPE-sensitive: int 5, bigint 5 and string '5' hash to
    # different positions, so a type mismatch between build and probe
    # keys would make the bloom yield FALSE NEGATIVES — silently
    # dropping genuinely matching rows and breaking the bit-identical
    # contract. Canonicalize: identical types hash as-is; mixed
    # integral types hash both sides widened to BIGINT (lossless, and
    # exactly the coercion the equi-join itself applies); anything else
    # (e.g. string vs int, decimal vs double — where the join's
    # coercion rules and a hash-side cast can disagree on edge values
    # like '5.0') is refused rather than risked.
    ftype, dtype = fact.schema[fact_col].dataType, dim.schema[dim_col].dataType
    _integral = {"byte", "short", "integer", "long"}
    if ftype == dtype:
        build_side, probe_col = dim, F.col(fact_col)
    elif ftype.typeName() in _integral and dtype.typeName() in _integral:
        build_side = dim.select(F.col(dim_col).cast("long").alias(dim_col))
        probe_col = F.col(fact_col).cast("long")
    else:
        raise ValueError(
            f"bloom_prejoin key dtypes differ and are not both integral: "
            f"fact[{fact_col}]={ftype.simpleString()}, dim[{dim_col}]={dtype.simpleString()}; "
            "cast one side to the other's type before calling"
        )
    words = bloom_build(build_side, dim_col, num_bits=num_bits, k=k)
    pre = fact.filter(bloom_might_contain(probe_col, words, k=k))
    right = F.broadcast(dim) if broadcast_dim else dim
    return pre.join(right, on=pre[fact_col] == right[dim_col], how=how)
