"""Stream-to-stream interval joins with watermark-bounded state.

The reference has no stream-join surface at all (its "streaming" is
CDC publication, SURVEY.md §2.4); this is extension surface covering
the remaining first-class Structured Streaming capability: joining
two live streams on a key within an event-time interval ("match each
click to the same user's events within 10 minutes of it" — the
defaults reach FORWARD from the left timestamp; pass
``lower="10 minutes", upper="0 seconds"`` for the preceding-window
form, as the catalog entry does). The mechanics that make it
runnable forever:

 - BOTH sides carry a watermark and the join condition carries an
   explicit event-time bound, so Spark can prove when a buffered row
   can never match again and evict it — state is bounded by
   (key cardinality × interval + watermark horizon), not by stream
   history. Without the time bound the state store grows without
   limit; this helper refuses to build such a join.
 - Inner matches emit as soon as both rows have arrived (no watermark
   wait), so a replayed-to-completion stream equals the batch join
   over the same rows — pinned by pytest and by the catalog entry's
   batch/DuckDB oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import _as_event_time


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str = "1 hour",
    suffix: str = "_r",
    how: str = "inner",
) -> DataFrame:
    """Equi-join two (streaming or batch) frames on ``keys`` where
    ``right_ts ∈ [left_ts − lower … left_ts + upper]`` (both offsets
    are INTERVAL strings; ``lower`` reaches back, ``upper`` forward).

    Right-side column names colliding with left ones (including the
    timestamp) come back suffixed with ``suffix``. Key columns are
    emitted once. The same call works on batch DataFrames — that
    equivalence is exactly what the tests pin.

    ``how='left_outer'`` additionally emits unmatched left rows with
    NULL right columns — but, unlike inner matches (which emit as
    soon as both rows arrive), a null-extended row can only emit once
    the WATERMARK proves no future right row can match it. Rows
    younger than the watermark horizon when the stream pauses or ends
    stay buffered (Structured Streaming semantics, not a bug here);
    batch-equivalence therefore holds for the horizon-aged prefix,
    which is exactly what the tests compare."""
    if not keys:
        raise ValueError("stream-stream joins need at least one equality key")
    if how not in ("inner", "left_outer"):
        raise ValueError(
            f"unsupported join type {how!r}: stream-stream interval joins "
            "support inner and left_outer"
        )
    lf = _as_event_time(left, left_ts)
    rf = _as_event_time(right, right_ts)
    if lf.isStreaming or rf.isStreaming:
        lf = lf.withWatermark(left_ts, watermark)
        rf = rf.withWatermark(right_ts, watermark)
    lf = lf.alias("l")
    rf = rf.alias("r")
    cond = None
    for k in keys:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & F.expr(f"r.{right_ts} >= l.{left_ts} - INTERVAL {lower}")
        & F.expr(f"r.{right_ts} <= l.{left_ts} + INTERVAL {upper}")
    )
    joined = lf.join(rf, on=cond, how=how)
    left_cols = list(left.columns)
    out = [F.col(f"l.{c}").alias(c) for c in left_cols]
    taken = set(left_cols)
    for c in right.columns:
        if c in keys:
            continue  # identical by the equi-condition (NULL on an
            # unmatched outer row, but the left copy is authoritative)
        name = c + suffix if c in taken else c
        out.append(F.col(f"r.{c}").alias(name))
        taken.add(name)
    return joined.select(*out)


def stream_static_enrich(
    stream: DataFrame,
    static: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
    hint_broadcast: bool = True,
) -> DataFrame:
    """Enrich a stream against a STATIC (batch) dimension — the
    stream-static join pattern: each micro-batch equi-joins the
    dimension on ``keys``; no state store is involved, so there is
    nothing to watermark and nothing to evict. The static plan is
    re-evaluated per micro-batch, which is what makes this the
    slowly-changing-dimension idiom: a dimension re-read from a
    table path picks up between-batch updates automatically.

    ``hint_broadcast`` (default) hints the dimension broadcast-side —
    the right call for bounded dims (the only kind that belongs in a
    per-batch join at 100 TB: an unbounded static side would shuffle
    the stream every micro-batch; route that shape through the store
    or a pre-bucketed layout instead). Pass False to let AQE decide.

    ``how`` supports 'inner' and 'left_outer' (unmatched stream rows
    pass through with NULL dimension columns — unlike the
    stream-stream case, no watermark wait applies: the dimension is
    fully known within the batch). Stream-side rows never buffer, so
    a replayed-to-completion stream equals the batch join over the
    same rows — the equivalence the catalog entry's oracle pins."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be 'inner' or 'left_outer', got {how!r}")
    dim = F.broadcast(static) if hint_broadcast else static
    return stream.join(dim, on=list(keys), how=how)
