"""Per-key streaming EWMA — a numeric custom stateful operator on
``applyInPandasWithState``.

The smoothing/alerting primitive windowed aggregates can't express:
EWMA_t = α·x_t + (1−α)·EWMA_{t−1} depends on EVERY prior observation
of the key, so its state is one number per key carried across
micro-batches — exactly the group-state model (same machinery as
revisions.py's gapless counter, with a float accumulator instead).

Scale shape: the stream hash-partitions by key once; each key's state
(two scalars) lives on one task; a micro-batch costs one sorted fold
per key over the batch's own rows. At 100 TB/day the state size is
|keys|, not |events|.

Ordering: within a batch rows fold in (ts, id) order; ACROSS batches
correctness needs the source replay to be event-time ordered (the
staged-file rule documented in streaming/windows.py) — a production
Kafka source keyed by the same key gives per-key order natively.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "key long, event_id long, value double, ewma double"
STATE_SCHEMA = "ewma double, n long"


def _make_fold(alpha: float):
    def _fold(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (k,) = key
        if state.exists:
            ewma, n = state.get
        else:
            ewma, n = 0.0, 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((ewma, n))
            return
        # concat BEFORE sorting (the revisions.py Arrow-chunk lesson)
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        out = []
        for v in pdf["value"]:
            v = float(v)
            # the first observation seeds the average (the standard
            # EWMA init — a 0-seed would bias every key's head)
            ewma = v if n == 0 else alpha * v + (1.0 - alpha) * ewma
            n += 1
            out.append(ewma)
        state.update((float(ewma), int(n)))
        yield pd.DataFrame(
            {
                "key": pdf["key"].astype("int64"),
                "event_id": pdf["event_id"].astype("int64"),
                "value": pdf["value"].astype("float64"),
                "ewma": out,
            }
        )

    return _fold


def streaming_ewma(
    events: DataFrame,
    alpha: float = 0.3,
) -> DataFrame:
    """events(key, event_id, ts, value) → + per-key ``ewma`` carried
    across micro-batches via group state. ``alpha`` is the smoothing
    weight of the newest observation."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    return events.groupBy("key").applyInPandasWithState(
        _make_fold(alpha),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
