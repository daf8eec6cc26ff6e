"""Gapless per-document revision assignment on a stream.

The reference achieves monotonic, gapless revisions without Paxos/LWT
by making one cluster node the single writer for each document URI
(consistent-hash sharding, ShardProcessor.scala:50-82; revision+1 at
PrimaryWorker.scala:217-221). In Spark the same guarantee falls out of
``applyInPandasWithState``: the stream is hash-partitioned by
``document_uri``, each group's state (the current revision) lives on
exactly one task, and batches for a key are processed serially.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "document_uri string, seq long, method string, body string, revision long"
)
STATE_SCHEMA = "revision long"


def _assign(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (document_uri,) = key
    revision = state.get[0] if state.exists else 0
    # concatenate BEFORE sorting: the group's micro-batch arrives as an
    # iterator of Arrow chunks (10k rows each by default), and sorting
    # each chunk independently assigns revisions out of seq order
    # across chunk boundaries — nondeterministically, since chunk
    # composition follows shuffle arrival order (observed live)
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        state.update((revision,))
        return
    pdf = pd.concat(chunks, ignore_index=True).sort_values("seq")
    revs = []
    for _ in range(len(pdf)):
        revision += 1
        revs.append(revision)
    pdf = pdf.assign(revision=revs)
    state.update((revision,))
    yield pdf[["document_uri", "seq", "method", "body", "revision"]]


def assign_revisions_stream(commands: DataFrame) -> DataFrame:
    """commands(document_uri, seq, method, body) → + gapless ``revision``
    per document_uri, stable across micro-batches via group state."""
    return commands.groupBy("document_uri").applyInPandasWithState(
        _assign,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
