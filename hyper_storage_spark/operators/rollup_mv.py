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

import json
import os
import tempfile
import warnings
from typing import Callable, Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_PARTIAL_COLS = ("n", "total", "vmin", "vmax")


def rollup_partials(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    resolution: str = "day",
    distinct_col: Optional[str] = None,
    ohlc: bool = False,
    sample_col: Optional[str] = None,
    sample_id_col: Optional[str] = None,
    sample_k: int = 256,
    sumsq: bool = False,
) -> DataFrame:
    """One-pass partial aggregates: (keys…, bucket_start, n, total,
    vmin, vmax[, dsk][, ofirst, olast][, smp]) at ``resolution`` (any
    date_trunc unit).

    ``distinct_col`` adds ``dsk``, an HLL sketch of that column's
    distinct values — COUNT(DISTINCT) is the aggregate that does NOT
    decompose into additive partials (distinct sets overlap across
    refreshes), and the register-max-merge HLL sketch is its standard
    mergeable substitute: union(sketch(A), sketch(B)) ≡ sketch(A ∪ B),
    a few KiB per bucket instead of a per-refresh re-shuffle of every
    member.

    ``ohlc`` adds ``ofirst``/``olast`` struct(t, v) partials — with
    vmin/vmax these finalize to the open-high-low-close candle, the
    standard finance/telemetry rollup.

    ``sample_col`` (with ``sample_id_col`` naming a row-unique column
    to hash) adds ``smp``, a BOTTOM-K-BY-HASH sample of that column —
    the mergeable substitute for quantiles, the other aggregate that
    does not decompose into additive partials. Keeping the k rows
    with the smallest content hash is a uniform without-replacement
    sample whose merge is EXACT (bottom-k(A ∪ B) ≡
    bottom-k(bottom-k(A) ∪ bottom-k(B))) and deterministic (pure
    content hash, no sampler state); ``rollup_quantile`` estimates
    any percentile from it with O(1/√k) error. The per-bucket rank
    runs over a window PARTITIONED by the grain (bounded state,
    same partitioning the groupBy reuses), never a global sort."""
    # ``sumsq`` adds ``ssq``, the exact DECIMAL sum of squares — the
    # additive partial that finalizes to variance/stddev
    # (rollup_finalize: var = (ssq - total^2/n)/n on doubles). Like
    # ``total`` it merges by plain addition, so refreshes compose; the
    # decimal sum keeps the partial exact and order-independent, and
    # only the final division drops to IEEE doubles.
    if sample_col is not None and sample_id_col is None:
        raise ValueError("sample_col requires sample_id_col (a row-unique column to hash)")
    if sample_k < 1:
        raise ValueError(f"sample_k must be >= 1, got {sample_k}")
    keys = [F.col(c) for c in key_cols]
    base = df.withColumn("bucket_start", F.date_trunc(resolution, F.col(ts_col)))
    aggs = [
        F.count(value_col).alias("n"),
        F.sum(value_col).alias("total"),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
    ]
    if distinct_col is not None:
        aggs.append(F.hll_sketch_agg(distinct_col).alias("dsk"))
    if sumsq:
        aggs.append(
            F.sum(
                (F.col(value_col) * F.col(value_col)).cast("decimal(38,12)")
            ).alias("ssq")
        )
    if ohlc:
        # open/close as min/max over struct(ts, v): lexicographic
        # struct order gives the earliest/latest row's value with a
        # deterministic value tiebreak on equal timestamps — and a
        # struct min/max is itself mergeable, so refreshes compose
        # exactly like the other partials
        pair = F.struct(F.col(ts_col).alias("t"), F.col(value_col).alias("v"))
        aggs.append(F.min(pair).alias("ofirst"))
        aggs.append(F.max(pair).alias("olast"))
    if sample_col is not None:
        w = Window.partitionBy(*key_cols, "bucket_start").orderBy(F.col("__h"))
        base = base.withColumn("__h", F.xxhash64(F.col(sample_id_col))).withColumn(
            "__r", F.row_number().over(w)
        )
        kept = F.when(
            F.col("__r") <= sample_k,
            F.struct(F.col("__h").alias("h"), F.col(sample_col).alias("v")),
        )
        # collect_list skips NULLs, so the list is bounded by k; the
        # sort makes it deterministic regardless of task order
        aggs.append(F.array_sort(F.collect_list(kept)).alias("smp"))
    return base.groupBy(*keys, F.col("bucket_start")).agg(*aggs)


def rollup_merge(
    existing: DataFrame,
    delta: DataFrame,
    key_cols: Sequence[str],
    sample_k: int = 256,
) -> DataFrame:
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
    has_dsk = "dsk" in existing.columns
    if has_dsk != ("dsk" in delta.columns):
        raise ValueError("distinct sketch column 'dsk' present on only one side")
    has_ohlc = "ofirst" in existing.columns
    if has_ohlc != ("ofirst" in delta.columns):
        raise ValueError("OHLC columns present on only one side")
    has_smp = "smp" in existing.columns
    if has_smp != ("smp" in delta.columns):
        raise ValueError("sample sketch column 'smp' present on only one side")
    has_ssq = "ssq" in existing.columns
    if has_ssq != ("ssq" in delta.columns):
        raise ValueError("sum-of-squares column 'ssq' present on only one side")
    out_cols = [
        *_PARTIAL_COLS,
        *(["dsk"] if has_dsk else []),
        *(["ofirst", "olast"] if has_ohlc else []),
        *(["smp"] if has_smp else []),
        *(["ssq"] if has_ssq else []),
    ]
    merge_aggs = [
        F.sum("n").alias("n"),
        F.sum("total").alias("total"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    ]
    if has_dsk:
        merge_aggs.append(F.hll_union_agg("dsk").alias("dsk"))
    if has_ssq:
        merge_aggs.append(F.sum("ssq").alias("ssq"))
    if has_ohlc:
        merge_aggs.append(F.min("ofirst").alias("ofirst"))
        merge_aggs.append(F.max("olast").alias("olast"))
    if has_smp:
        # bottom-k of the union of bottom-ks ≡ bottom-k of the union:
        # the grain group holds at most (existing row + delta row), so
        # the flatten is 2k-bounded before re-slicing
        merge_aggs.append(
            _bottom_k(F.flatten(F.collect_list("smp")), sample_k).alias("smp")
        )
    # null-safe bucket match: a NULL event time yields a NULL bucket
    # (date_trunc(NULL)), and a plain equality split would route the
    # existing NULL-bucket row to `untouched` while the delta's NULL
    # bucket re-aggregates separately — two rows for one grain
    touched_buckets = delta.select(F.col("bucket_start").alias("__tb")).distinct()
    match = F.col("bucket_start").eqNullSafe(F.col("__tb"))
    untouched = existing.join(F.broadcast(touched_buckets), on=match, how="left_anti")
    touched = existing.join(F.broadcast(touched_buckets), on=match, how="left_semi")
    merged = (
        touched.unionByName(delta.select(*touched.columns))
        .groupBy(*grain)
        .agg(*merge_aggs)
    )
    return untouched.select(*grain, *out_cols).unionByName(
        merged.select(*grain, *out_cols)
    )


def _pointer_path(mv_root: str) -> str:
    return os.path.join(mv_root, "_CURRENT")


def _warn_if_anonymous(run_id: Optional[str], label: str) -> None:
    """Construction-time warning shared by every foreachBatch state
    sink here and in operators/sampling.py: with run_id=None the
    replay guard cannot distinguish a replayed micro-batch from a NEW
    query restarted on a fresh checkpoint (whose batch ids restart at
    0), and will skip the new query's batches below the old
    high-water mark."""
    if run_id is None:
        warnings.warn(
            f"{label} has run_id=None: the replay guard cannot distinguish "
            "a replayed micro-batch from a NEW query restarted on a fresh "
            "checkpoint (whose batch ids restart at 0), and will skip the "
            "new query's batches below the old high-water mark. Pass the "
            "checkpoint location (or any stable per-pipeline token) as "
            "run_id.",
            stacklevel=3,
        )


def _is_replayed_batch(
    cur: Optional[dict], batch_id: int, run_id: Optional[str], label: str
) -> bool:
    """The foreachBatch exactly-once guard: True iff this batch_id was
    already applied under the same lineage (run_id) — the caller must
    skip it, because re-applying a state merge would double-count.
    Batches of an unrecognized run_id always apply (the guard can
    only dedup within one checkpoint's id sequence — exactly Spark's
    own foreachBatch contract)."""
    if cur is not None and cur.get("run_id") == run_id and batch_id <= cur["batch_id"]:
        if run_id is None:
            warnings.warn(
                f"{label}: skipping batch_id={batch_id} <= applied "
                f"high-water {cur['batch_id']} with run_id=None — if this "
                "query was restarted from a fresh checkpoint this skip is "
                "DATA LOSS; pass run_id to disambiguate lineage.",
                stacklevel=3,
            )
        return True
    return False


def _read_pointer(mv_root: str) -> Optional[dict]:
    try:
        with open(_pointer_path(mv_root), "r", encoding="utf-8") as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def _flip_pointer(mv_root: str, meta: dict) -> None:
    # tmp + os.replace: readers see either the old or the new pointer,
    # never a torn one (same flip discipline as store/storage.py)
    fd, tmp = tempfile.mkstemp(dir=mv_root, prefix="_CURRENT.tmp")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as fh:
            json.dump(meta, fh)
        os.replace(tmp, _pointer_path(mv_root))
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    # pointer HISTORY (review r12): a version-named copy of every
    # flipped pointer, so vacuum_state_dir can protect EXACTLY what the
    # last keep_versions pointers reference. The version cutoff alone
    # cannot: after a chain compaction the newest pointer drops delta
    # dirs that an in-window reader pinned to a superseded pointer
    # still needs, and those dirs can be arbitrarily old (a rarely-
    # touched LSM bucket's chain entries). One tiny json per batch;
    # vacuum prunes history past its keep window. Best-effort and
    # atomic per file — a torn/missing history entry degrades to the
    # pre-history cutoff guard, never to a torn read.
    v = meta.get("version")
    if isinstance(v, int):
        try:
            fd, tmp = tempfile.mkstemp(dir=mv_root, prefix="_CURRENT.tmp")
            with os.fdopen(fd, "w", encoding="utf-8") as fh:
                json.dump(meta, fh)
            os.replace(tmp, _pointer_path(mv_root) + f".v{v:09d}")
        except OSError:
            pass


def vacuum_state_dir(
    state_root: str, keep_versions: int = 3, grace_seconds: float = 300.0
) -> int:
    """Reclaim superseded files from ANY foreachBatch state dir (the
    five sinks share the pointer discipline, so one vacuum serves all):
    every batch writes new version-named files and flips the pointer,
    leaving the previous versions behind forever — disk grows linearly
    with batch count until this runs.

    Keeps: everything the CURRENT pointer references (rel paths are
    collected from every string / list-of-strings / dict-of-chains
    value in it — counts, grid, cand, stats, bucket chains, quarantine
    chains), everything the last ``keep_versions`` superseded POINTERS
    reference (pointer history, r12 — covers chain entries a
    compaction dropped from the newest pointer), the last
    ``keep_versions`` versions' files (in-flight
    readers pinned to a just-superseded pointer), anything younger
    than ``grace_seconds`` (a concurrent batch's staged-but-unflipped
    files), and — for pre-chain expectations state — all q_* files
    (the legacy reader globs them). Deletes the rest; returns the
    number of entries removed. Run it from maintenance, like the
    store's vacuum — it is safe beside a live stream because of the
    grace window, but quiesced is simplest."""
    import re
    import shutil
    import time as _time

    cur = _read_pointer(state_root)
    if cur is None:
        return 0

    referenced: set[str] = set()

    def collect(v) -> None:
        if isinstance(v, str) and ("/" in v or re.match(r"^(v\d{6}|qc?_\d{6})", v)):
            referenced.add(v.split("/", 1)[0])
        elif isinstance(v, list):
            for x in v:
                collect(x)
        elif isinstance(v, dict):
            for x in v.values():
                collect(x)

    collect(cur)
    # pointer history (review r12): also protect everything the last
    # keep_versions SUPERSEDED pointers reference. The version/batch
    # cutoffs below cannot cover a reader pinned to an in-window
    # pointer whose chain references dirs the newest pointer DROPPED
    # at a compaction — those entries can be arbitrarily old (a
    # rarely-touched LSM bucket's deltas), so only the pinned
    # pointers' own reference lists bound them. History files past
    # the keep window are pruned here (same maintenance contract as
    # the version dirs). State dirs from before history existed
    # degrade to the cutoff guards.
    hist_re = re.compile(r"^_CURRENT\.v(\d{9,})$")  # %09d pads, never truncates
    hists = sorted(
        (int(m.group(1)), n)
        for n in os.listdir(state_root)
        for m in [hist_re.match(n)]
        if m is not None
    )
    protected_hist = hists[-(keep_versions + 1):] if keep_versions >= 0 else hists
    for _, hname in protected_hist:
        try:
            with open(os.path.join(state_root, hname), "r", encoding="utf-8") as fh:
                collect(json.load(fh))
        except (OSError, ValueError):
            continue  # torn/raced history entry — cutoff guards still apply
    for _, hname in hists[: len(hists) - len(protected_hist)]:
        try:
            os.unlink(os.path.join(state_root, hname))
        except OSError:
            continue
    legacy_quarantine = "quarantine" not in cur and "counts" in cur
    cutoff = int(cur.get("version", 0)) - keep_versions
    # quarantine entries carry a BATCH id (q_N) or a version (qc_N);
    # both get the same retention window as version files
    batch_cutoff = int(cur.get("batch_id", 0)) - keep_versions
    now = _time.time()
    removed = 0
    for name in os.listdir(state_root):
        if name in referenced or name.startswith("_CURRENT"):
            # exception: a SIGKILL between the flip's mkstemp and its
            # os.replace orphans a _CURRENT.tmp* file that nothing
            # will ever read or rename — reclaim those past the grace
            # window (the pointer itself and .v* history never match)
            if re.match(r"^_CURRENT\.tmp", name):
                path = os.path.join(state_root, name)
                try:
                    if now - os.path.getmtime(path) >= grace_seconds:
                        os.unlink(path)
                        removed += 1
                except OSError:
                    pass
            continue
        # version entries are either bare v000007 (uniform sample,
        # rollup streams) or v000007_suffix (counts/grid/idx/...);
        # \d{6,} because %06d PADS — past version 999999 the names
        # widen and a fixed-width match would skip them forever (the
        # same overflow the .v history regex guards against)
        m = re.match(r"^v(\d{6,})(_|$)", name)
        is_qc = re.match(r"^qc_(\d{6,})$", name)
        is_q = re.match(r"^q_(\d{6,})$", name)
        if m is None and not is_q and not is_qc:
            continue  # never touch entries this module didn't write
        if m is not None and int(m.group(1)) >= cutoff:
            continue
        if is_qc is not None and int(is_qc.group(1)) >= cutoff:
            continue
        if is_q is not None and int(is_q.group(1)) >= batch_cutoff:
            continue
        if (is_q or is_qc) and legacy_quarantine:
            continue  # the legacy reader still globs q_*
        path = os.path.join(state_root, name)
        try:
            if now - os.path.getmtime(path) < grace_seconds:
                continue
            if os.path.isdir(path):
                shutil.rmtree(path)
            else:
                os.unlink(path)
            removed += 1
        except OSError:
            continue  # raced another maintainer — its delete counts
    return removed


def read_rollup(
    spark: SparkSession, mv_root: str, version: Optional[int] = None
) -> Optional[DataFrame]:
    """The current rollup partials, or None before the first batch.

    ``version`` reads a historical MV state instead (the version
    directories are immutable once published, so this is the same
    zero-copy time travel as the store's ``at_version``) — available
    until :func:`vacuum_rollup` reclaims superseded versions; a
    vacuumed version raises."""
    cur = _read_pointer(mv_root)
    if cur is None:
        return None
    if version is None:
        rel = cur["path"]
    else:
        if not 1 <= version <= cur["version"]:
            raise ValueError(f"version {version} out of range 1..{cur['version']}")
        rel = f"v{version:06d}"
        if not os.path.isdir(os.path.join(mv_root, rel)):
            raise ValueError(f"version {version} was vacuumed")
    return spark.read.parquet(os.path.join(mv_root, rel))


def streaming_rollup(
    mv_root: str,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    resolution: str = "day",
    distinct_col: Optional[str] = None,
    ohlc: bool = False,
    run_id: Optional[str] = None,
    sample_col: Optional[str] = None,
    sample_id_col: Optional[str] = None,
    sample_k: int = 256,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink maintaining a parquet-backed rollup MV —
    the continuous-aggregate face of ``rollup_merge``.

    Each micro-batch computes delta partials (batch-sized scan) and
    merges them into the current MV version; the merged result lands
    in a NEW version directory ``v{N}`` and a tmp+rename pointer flip
    publishes it, so a reader never observes a half-written MV and a
    crash before the flip leaves the old version intact (the orphan
    directory is re-written by the replayed batch).

    Exactly-once under Structured Streaming's at-least-once
    ``foreachBatch`` contract: the pointer records the last applied
    ``batch_id``; a replayed batch (same or lower id after a restart)
    is SKIPPED, not re-merged — replaying a merge of additive
    partials would double-count, the same hazard the store's ingest
    watermark closes. Batch ids are scoped to a CHECKPOINT, and a new
    checkpoint restarts them at 0 — pass the checkpoint location (or
    any stable per-pipeline token) as ``run_id`` so a query started
    from a fresh checkpoint is recognized as new lineage instead of
    silently skipping every batch below the old high-water mark.
    Batches of an unrecognized run_id always apply (the skip guard
    can only dedup within one checkpoint's id sequence, exactly
    Spark's own foreachBatch contract). State per flip is one small
    JSON + one parquet dir; superseded versions are droppable
    (``vacuum_rollup``).

    With ``run_id=None`` the guard cannot tell a replay from a fresh
    checkpoint restarting at batch 0 — two anonymous lineages match
    each other, so a restarted query would silently skip every batch
    below the old high-water mark. That is data loss, so a None
    run_id warns at construction, and each anonymous skip warns
    again naming the colliding batch_id."""
    _warn_if_anonymous(run_id, f"streaming_rollup(mv_root={mv_root!r})")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(mv_root, exist_ok=True)
        cur = _read_pointer(mv_root)
        if _is_replayed_batch(cur, batch_id, run_id, f"streaming_rollup({mv_root!r})"):
            return  # replay of an already-applied micro-batch
        delta = rollup_partials(
            batch_df,
            ts_col,
            key_cols,
            value_col,
            resolution,
            distinct_col=distinct_col,
            ohlc=ohlc,
            sample_col=sample_col,
            sample_id_col=sample_id_col,
            sample_k=sample_k,
        )
        if cur is not None:
            existing = batch_df.sparkSession.read.parquet(os.path.join(mv_root, cur["path"]))
            merged = rollup_merge(existing, delta, key_cols, sample_k=sample_k)
            version = cur["version"] + 1
        else:
            extra = [
                *(["dsk"] if distinct_col is not None else []),
                *(["ofirst", "olast"] if ohlc else []),
                *(["smp"] if sample_col is not None else []),
            ]
            merged = delta.select(*key_cols, "bucket_start", *_PARTIAL_COLS, *extra)
            version = 1
        rel = f"v{version:06d}"
        # write BEFORE the flip; the write reads the old version, so the
        # old dir must stay live until the new one is fully on disk
        merged.write.mode("overwrite").parquet(os.path.join(mv_root, rel))
        _flip_pointer(
            mv_root,
            {"version": version, "batch_id": batch_id, "path": rel, "run_id": run_id},
        )

    return apply_batch


def vacuum_rollup(mv_root: str) -> int:
    """Drop superseded MV version directories (all but the pointer's
    current one). Returns the number of directories removed. Run it
    from the maintenance cadence, not inside the hot batch path —
    a concurrent reader may still be scanning the previous version."""
    import shutil

    cur = _read_pointer(mv_root)
    if cur is None:
        return 0
    removed = 0
    for name in os.listdir(mv_root):
        if name.startswith("v") and name != cur["path"]:
            shutil.rmtree(os.path.join(mv_root, name), ignore_errors=True)
            removed += 1
    return removed


def _bottom_k(col: Column, k: int) -> Column:
    return F.slice(F.array_sort(col), 1, k)


def rollup_quantile(partials: DataFrame, q: float, out_col: Optional[str] = None) -> DataFrame:
    """Estimate the q-quantile per bucket from the ``smp`` bottom-k
    sample (see ``rollup_partials(sample_col=...)``): the sample is
    uniform-without-replacement, so the sample quantile is the
    standard estimator with error O(1/√k) — and, unlike a quantile
    over raw rows, it survives incremental refreshes."""
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1], got {q}")
    if "smp" not in partials.columns:
        raise ValueError("partials carry no sample sketch; build with sample_col=")
    vals = F.array_sort(F.expr("transform(smp, x -> x.v)"))
    idx = F.greatest(F.lit(1), F.ceil(F.lit(q) * F.size(vals)).cast("int"))
    return partials.withColumn(out_col or f"p{int(q * 100)}", F.element_at(vals, idx))


def rollup_coarsen(
    partials: DataFrame,
    key_cols: Sequence[str],
    resolution: str,
    sample_k: int = 256,
) -> DataFrame:
    """Re-aggregate fine partials to a coarser ``resolution`` (e.g.
    the day-grained MV answering month queries) — partials compose,
    so this is exact, scans ONLY the MV (bucket-count-sized, never
    the fact table), and inherits the same nesting rule as
    timeseries.hypertable_rollup: the coarser buckets must be unions
    of the finer ones (a week straddling a month boundary would land
    its whole partial in one month — truncate from day-or-finer
    instead). All partial kinds carry over: additive (n/total),
    min/max (vmin/vmax and the OHLC struct pair), and HLL union."""
    grain = [*key_cols]
    aggs = [
        F.sum("n").alias("n"),
        F.sum("total").alias("total"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    ]
    if "dsk" in partials.columns:
        aggs.append(F.hll_union_agg("dsk").alias("dsk"))
    if "ssq" in partials.columns:
        # additive like total — a coarsen that dropped it would silently
        # strip the variance face from the coarser view
        aggs.append(F.sum("ssq").alias("ssq"))
    if "ofirst" in partials.columns:
        aggs.append(F.min("ofirst").alias("ofirst"))
        aggs.append(F.max("olast").alias("olast"))
    if "smp" in partials.columns:
        aggs.append(_bottom_k(F.flatten(F.collect_list("smp")), sample_k).alias("smp"))
    return partials.groupBy(
        *grain, F.date_trunc(resolution, F.col("bucket_start")).alias("bucket_start")
    ).agg(*aggs)


def rollup_finalize(partials: DataFrame) -> DataFrame:
    """Derive the non-mergeable serving view from merged partials:
    adds ``avg = double(total) / n``. The partials stay the exact
    (decimal-sum) source of truth; the derived average is a double on
    purpose — IEEE division of the exact sum is the one portable
    semantics every serving engine agrees on, where decimal-division
    scale rules differ per engine. Keep serving reads on this view,
    never on raw partials."""
    out = partials.withColumn("avg", F.col("total").cast("double") / F.col("n"))
    if "dsk" in partials.columns:
        out = out.withColumn("n_distinct", F.hll_sketch_estimate("dsk"))
    if "ssq" in partials.columns:
        # (ssq - total^2/n)/n on DOUBLES cast from the exact decimal
        # partials: both engines see identical inputs and the identical
        # IEEE expression, so the result is bit-reproducible. The CASE
        # clamps the tiny negative that catastrophic cancellation can
        # produce on near-constant buckets (NULL n=0 propagates as
        # NULL through the comparison and the clamp alike).
        var_raw = (
            F.col("ssq").cast("double")
            - F.col("total").cast("double")
            * F.col("total").cast("double")
            / F.col("n")
        ) / F.col("n")
        var_clamped = F.when(var_raw < 0, F.lit(0.0)).otherwise(var_raw)
        out = out.withColumn("var_pop", F.round(var_clamped, 6)).withColumn(
            "stddev_pop", F.round(F.sqrt(var_clamped), 6)
        )
    if "ofirst" in partials.columns:
        out = out.withColumn("open", F.col("ofirst.v")).withColumn(
            "close", F.col("olast.v")
        )
    return out


def rollup_anomalies(
    df: DataFrame,
    partials: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    z: float = 3.0,
    resolution: str = "day",
) -> DataFrame:
    """Serve the MV for anomaly detection: flag rows whose value sits
    more than ``z`` population standard deviations from their
    bucket's mean — (row cols…, bucket_start, bucket_avg,
    bucket_stddev, zscore), anomalous rows only.

    ``partials`` must carry the ``ssq`` column
    (rollup_partials(sumsq=True)); avg/stddev come from
    :func:`rollup_finalize`, i.e. from the exact decimal sums, so the
    flag is reproducible across engines and refreshes. The join is
    grain-to-grain: the finalized MV is bucket-cardinality (unhinted —
    AQE broadcasts a small MV, shuffles a huge one) and the fact side
    streams through one scan. Buckets with zero variance (constant or
    single-row) flag nothing: a z-score needs spread, and NULL/0
    stddev rows are excluded rather than divided by. Z-scores round
    to 4 for cross-engine hashing; the comparison itself runs on the
    unrounded doubles both engines derive identically."""
    if "ssq" not in partials.columns:
        raise ValueError("partials must include 'ssq' (rollup_partials(sumsq=True))")
    fin = rollup_finalize(partials).select(
        *key_cols,
        "bucket_start",
        F.col("avg").alias("bucket_avg"),
        (
            F.col("ssq").cast("double") / F.col("n")
            - (F.col("total").cast("double") / F.col("n"))
            * (F.col("total").cast("double") / F.col("n"))
        ).alias("__var_raw"),
        F.col("stddev_pop").alias("bucket_stddev"),
    )
    base = df.withColumn("bucket_start", F.date_trunc(resolution, F.col(ts_col)))
    grain = [*key_cols, "bucket_start"]
    joined = base.join(fin, on=grain)
    sd = F.sqrt(F.when(F.col("__var_raw") < 0, F.lit(0.0)).otherwise(F.col("__var_raw")))
    dev = F.col(value_col).cast("double") - F.col("bucket_avg")
    return (
        joined.filter(sd > 0)
        .filter(F.abs(dev) > F.lit(z) * sd)
        .select(
            *[c for c in df.columns],
            F.col("bucket_start"),
            F.round("bucket_avg", 4).cast("double").alias("bucket_avg"),
            F.col("bucket_stddev"),
            F.round(dev / sd, 4).cast("double").alias("zscore"),
        )
    )
