"""Tracked ``persist()`` for operators that cache mid-plan.

Several dedup/ANN operators persist an intermediate (shingle postings,
LSH signatures) that is consumed more than once inside one returned
plan. A bare ``df.persist()`` there leaks storage memory for the
lifetime of the session: the caller only ever sees the final
DataFrame, so nobody holds a handle to unpersist. In a long-lived
session running many catalog entries (the bench loop, a notebook, a
job server) that pins gigabytes of storage per entry — at 100 TB scale
it evicts useful caches and eventually spills everything.

Operators therefore route persists through :func:`tracked_persist`,
and harnesses call :func:`release_tracked_caches` between entries.
Unpersisting is always safe: persist is a hint, and an unpersisted
intermediate simply recomputes if its plan is re-executed later.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_LIVE: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() the frame and register it for later bulk release.
    A frame that is already persisted passes through untouched (its
    original registration handles release) — lets operators compose
    without double-caching the same plan."""
    lvl = df.storageLevel
    if lvl.useMemory or lvl.useDisk:
        return df
    df = df.persist()
    with _LOCK:
        _LIVE.append(df)
    return df


def release_tracked_caches() -> int:
    """Unpersist every tracked frame; returns how many were released.

    Call between catalog entries / bench queries. Never raises: a
    frame whose SparkContext is already gone is skipped.
    """
    with _LOCK:
        live = list(_LIVE)
        _LIVE.clear()
    n = 0
    for df in live:
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — releasing is best-effort
            pass
    return n
