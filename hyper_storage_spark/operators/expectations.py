"""Declarative data-quality expectations — the pipeline-gate engine
(the Great-Expectations/dbt-test idea, Spark-first): a rule list is
compiled into ONE aggregate pass over the table (every rule becomes a
conditional-count column, so N rules cost one scan, not N), plus one
left-anti join per referential rule. The output is a per-rule summary
(rows checked, violations, pass) a CI gate can assert on.

Rule shapes:
- ``not_null(col)``
- ``unique(col)`` — duplicate-occurrence count (rows beyond the first
  per value; NULLs ignored, SQL-DISTINCT semantics)
- ``in_range(col, lo, hi)`` — NULLs do not violate (compose with
  not_null for that)
- ``in_set(col, values)``
- ``matches(col, regex)`` — full-match semantics (anchored rlike)
- ``foreign_key(col, dim_df, dim_col)`` — values (NULLs ignored)
  that do not resolve in the dimension table

Scale shape: the scalar rules share one partial-aggregated scan;
``unique`` adds one groupBy on its column; each ``foreign_key`` is a
broadcast-friendly left-anti join. Violations are COUNTED in the
summary; use the per-rule predicate columns from
:func:`violation_flags` when the offending rows themselves are needed
(the flags compose into the same single scan).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    kind: str
    col: str
    name: str
    lo: Any = None
    hi: Any = None
    values: tuple = ()
    regex: Optional[str] = None
    dim: Optional[DataFrame] = field(default=None, compare=False)
    dim_col: Optional[str] = None


def not_null(col: str) -> Rule:
    return Rule("not_null", col, f"not_null({col})")


def unique(col: str) -> Rule:
    return Rule("unique", col, f"unique({col})")


def in_range(col: str, lo, hi) -> Rule:
    return Rule("in_range", col, f"in_range({col},{lo},{hi})", lo=lo, hi=hi)


def in_set(col: str, values: Sequence) -> Rule:
    vals = tuple(values)
    return Rule("in_set", col, f"in_set({col})", values=vals)


def matches(col: str, regex: str) -> Rule:
    return Rule("matches", col, f"matches({col})", regex=regex)


def foreign_key(col: str, dim: DataFrame, dim_col: str) -> Rule:
    return Rule("foreign_key", col, f"fk({col}->{dim_col})", dim=dim, dim_col=dim_col)


def _violation_expr(r: Rule):
    c = F.col(r.col)
    if r.kind == "not_null":
        return c.isNull()
    if r.kind == "in_range":
        return c.isNotNull() & ((c < F.lit(r.lo)) | (c > F.lit(r.hi)))
    if r.kind == "in_set":
        return c.isNotNull() & ~c.isin(list(r.values))
    if r.kind == "matches":
        return c.isNotNull() & ~c.rlike(f"^(?:{r.regex})$")
    raise ValueError(f"no row-level predicate for rule kind {r.kind!r}")


def violation_flags(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """The input plus one boolean ``__viol_<i>`` column per SCALAR
    rule (unique/foreign_key are set-level, not row-level) — for
    pulling the offending rows after a failed gate."""
    out = df
    for i, r in enumerate(rules):
        if r.kind in ("unique", "foreign_key"):
            continue
        out = out.withColumn(f"__viol_{i}", _violation_expr(r))
    return out


def check(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Run every rule and return the summary: one row per rule,
    (rule, n_rows, n_violations, pass) in the given rule order. All
    scalar rules share a single aggregate pass."""
    if not rules:
        raise ValueError("expectations.check: at least one rule required")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("expectations.check: duplicate rule names")
    spark = df.sparkSession
    scalar = [(i, r) for i, r in enumerate(rules)
              if r.kind not in ("unique", "foreign_key")]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, r in scalar:
        aggs.append(
            F.sum(F.when(_violation_expr(r), 1).otherwise(0)).alias(f"v{i}")
        )
    base = df.agg(*aggs).collect()[0]
    n_rows = int(base["__n"])

    counts: dict[int, int] = {i: int(base[f"v{i}"]) for i, _ in scalar}
    for i, r in enumerate(rules):
        if r.kind == "unique":
            dup = (
                df.filter(F.col(r.col).isNotNull())
                .groupBy(r.col)
                .agg(F.count(F.lit(1)).alias("c"))
                .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("d"))
                .collect()[0]["d"]
            )
            counts[i] = int(dup)
        elif r.kind == "foreign_key":
            dim = r.dim.select(F.col(r.dim_col).alias(r.col)).distinct()
            miss = (
                df.filter(F.col(r.col).isNotNull())
                .join(dim, r.col, "left_anti")
                .count()
            )
            counts[i] = int(miss)

    rows = [
        (r.name, n_rows, counts[i], counts[i] == 0)
        for i, r in enumerate(rules)
    ]
    return spark.createDataFrame(
        rows, "rule string, n_rows long, n_violations long, passed boolean"
    )


def streaming_expectations(
    state_root: str,
    rules: Sequence[Rule],
    run_id: Optional[str] = None,
):
    """``foreachBatch`` sink running the expectations engine
    CONTINUOUSLY: every micro-batch is checked against the rule list,
    per-rule violation counts accumulate in persisted state, and rows
    violating any SCALAR rule land in a per-batch quarantine file —
    the streaming ingest gate (dead-letter discipline) the batch
    :func:`check` gives CI pipelines.

    State: a rule-cardinality counts parquet (merged by union+sum
    each batch) plus one quarantine parquet PER BATCH (written even
    when empty, so the quarantine schema is always readable; a
    replayed batch overwrites its own file — no duplicates) behind
    the shared pointer/replay-guard discipline
    (operators/rollup_mv.py). Set-level rules (unique/foreign_key)
    are checked per batch and counted, but their violations are not
    row-attributable, so they never quarantine rows — exactly the
    batch engine's violation_flags contract. Note the semantics:
    per-batch `unique` cannot see cross-batch duplicates (that is
    :func:`~hyper_storage_spark.operators.dedup.streaming_corpus_stats`'s
    digest index job); it gates within-delivery duplication only.

    Read back with :func:`read_expectation_counts` /
    :func:`read_quarantine`."""
    import os

    from .rollup_mv import (
        _flip_pointer,
        _is_replayed_batch,
        _read_pointer,
        _warn_if_anonymous,
    )

    if not rules:
        raise ValueError("streaming_expectations: at least one rule required")
    label = f"streaming_expectations({state_root!r})"
    _warn_if_anonymous(run_id, label)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(state_root, exist_ok=True)
        cur = _read_pointer(state_root)
        if _is_replayed_batch(cur, batch_id, run_id, label):
            return
        spark = batch_df.sparkSession
        summary = check(batch_df, rules).select("rule", "n_rows", "n_violations")
        if cur is not None:
            prev = spark.read.parquet(os.path.join(state_root, cur["counts"]))
            summary = (
                prev.unionByName(summary)
                .groupBy("rule")
                .agg(
                    F.sum("n_rows").alias("n_rows"),
                    F.sum("n_violations").alias("n_violations"),
                )
            )
        flagged = violation_flags(batch_df, rules)
        viol_cols = [c for c in flagged.columns if c.startswith("__viol_")]
        bad = flagged
        if viol_cols:
            pred = None
            for c in viol_cols:
                e = F.coalesce(F.col(c), F.lit(False))
                pred = e if pred is None else (pred | e)
            bad = flagged.filter(pred)
        bad = bad.drop(*viol_cols).withColumn("__batch_id", F.lit(batch_id))
        version = (cur["version"] + 1) if cur else 1
        rel_counts = f"v{version:06d}_counts"
        summary.write.mode("overwrite").parquet(os.path.join(state_root, rel_counts))
        # one quarantine file per batch, overwrite-idempotent on replay;
        # the pointer tracks the committed chain (r11: a year of
        # 5-minute batches is ~100k dirs — the chain compacts into one
        # file past _Q_COMPACT_AT, the corpus-stats LSM discipline)
        chain = list(cur.get("quarantine", [])) if cur else []
        if cur is not None and "quarantine" not in cur:
            # legacy glob state: adopt the already-committed q_* dirs
            chain = sorted(
                n
                for n in os.listdir(state_root)
                if n.startswith("q_") and int(n[2:]) <= cur["batch_id"]
            )
        rel_q = f"q_{batch_id:06d}"
        bad.write.mode("overwrite").parquet(os.path.join(state_root, rel_q))
        if rel_q not in chain:
            chain.append(rel_q)
        if len(chain) > _Q_COMPACT_AT:
            rel_qc = f"qc_{version:06d}"
            spark.read.parquet(
                *[os.path.join(state_root, r) for r in chain]
            ).write.mode("overwrite").parquet(os.path.join(state_root, rel_qc))
            chain = [rel_qc]
        _flip_pointer(
            state_root,
            {
                "version": version,
                "batch_id": batch_id,
                "counts": rel_counts,
                "quarantine": chain,
                # full quarantine schema rides in the pointer so an
                # empty chain reads back with the SAME columns as a
                # populated one (review r12) — callers selecting data
                # columns must not break only in the empty case
                "quarantine_schema": bad.schema.json(),
                "run_id": run_id,
            },
        )

    return apply_batch


# quarantine chain files before the per-batch dirs compact into one
_Q_COMPACT_AT = 16


def read_expectation_counts(spark, state_root: str) -> DataFrame:
    """Cumulative per-rule (rule, n_rows, n_violations, passed) from a
    :func:`streaming_expectations` state dir."""
    import os

    from .rollup_mv import _read_pointer

    cur = _read_pointer(state_root)
    if cur is None:
        raise FileNotFoundError(f"no committed expectations state under {state_root}")
    return spark.read.parquet(os.path.join(state_root, cur["counts"])).select(
        "rule", "n_rows", "n_violations", (F.col("n_violations") == 0).alias("passed")
    )


def read_quarantine(spark, state_root: str) -> DataFrame:
    """Every quarantined row so far (original columns + __batch_id).

    Committed-pointer read discipline, same as the other state-sink
    readers: only the pointer's committed quarantine chain is read —
    a q_* file written by a batch that crashed BEFORE its pointer
    flip is uncommitted state (the retried batch will overwrite it)
    and must not leak to readers. Pre-chain state dirs fall back to
    the glob filtered by the batch high-water mark."""
    import os

    from .rollup_mv import _read_pointer

    cur = _read_pointer(state_root)
    if cur is None:
        raise FileNotFoundError(f"no committed expectations state under {state_root}")
    chain = cur.get("quarantine")
    if chain is not None:
        if not chain:
            # empty chain returns the sink's FULL quarantine schema
            # (persisted in the pointer at every flip) so callers
            # selecting/unioning on data columns see identical shape
            # whether or not anything was ever quarantined. Pointers
            # from before the schema rode along fall back to the
            # marker-only frame (documented legacy shape).
            sj = cur.get("quarantine_schema")
            if sj is not None:
                import json as _json

                from pyspark.sql.types import StructType

                return spark.createDataFrame([], StructType.fromJson(_json.loads(sj)))
            return spark.createDataFrame([], "__batch_id long")
        return spark.read.parquet(*[os.path.join(state_root, r) for r in chain])
    return spark.read.parquet(os.path.join(state_root, "q_*")).filter(
        F.col("__batch_id") <= int(cur["batch_id"])
    )
