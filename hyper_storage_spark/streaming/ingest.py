"""The write path as a streaming job.

SURVEY.md §3.2's Spark shape for the reference's primary/secondary
worker machinery: commands arrive on a topic (here: an append-only
parquet directory; on a cluster: Kafka), a Structured Streaming job
groups each micro-batch by ``document_uri`` and applies the writes
serially per document through the DocumentStore — which yields the
same single-writer/gapless-revision/feed-publication semantics as the
reference's ShardProcessor + PrimaryWorker + BackgroundContentTaskCompleter
pipeline, with the streaming checkpoint replacing hot/stale recovery.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import SparkSession

from ..store.documents import DocumentStore

COMMANDS_SPARK = "seq long, method string, path string, body string"
COMMANDS_ARROW = pa.schema(
    [("seq", pa.int64()), ("method", pa.string()), ("path", pa.string()), ("body", pa.string())]
)


def write_commands(commands_dir: str, commands: list[dict]) -> str:
    """Producer side: append a batch of write commands
    (method put|patch|delete, path, body JSON) to the command log."""
    os.makedirs(commands_dir, exist_ok=True)
    path = os.path.join(commands_dir, f"cmd-{int(time.time()*1000)}-{uuid.uuid4().hex[:8]}.parquet")
    rows = [
        {
            "seq": c["seq"],
            "method": c["method"],
            "path": c["path"],
            "body": json.dumps(c["body"]) if c.get("body") is not None else None,
        }
        for c in commands
    ]
    pq.write_table(pa.Table.from_pylist(rows, schema=COMMANDS_ARROW), path)
    return path


def run_command_stream(
    spark: SparkSession,
    store: DocumentStore,
    commands_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Consume the command log and apply it to the store.

    foreachBatch applies each micro-batch's commands grouped by
    document_uri in seq order — per-key serialization ⇒ gapless
    revisions; the checkpoint makes restarts resume exactly after the
    last fully-applied batch (recovery parity without RecoveryWorker)."""
    import hashlib

    from ..paths import split_path

    # foreachBatch is at-least-once: a crash between apply and the
    # checkpoint commit re-delivers the batch, and re-applying writes
    # would mint NEW revisions (not revision-idempotent). The standard
    # remedy is a batch-id watermark committed WITH the store's state:
    # batch ids are monotonic per checkpoint, so "already at or past
    # this id" ⇒ skip the replay.
    marker = os.path.join(
        store.storage.root,
        f"stream_watermark_{hashlib.sha256(checkpoint_dir.encode()).hexdigest()[:12]}.json",
    )

    def last_applied() -> int:
        try:
            with open(marker) as f:
                return json.load(f)["batch_id"]
        except (OSError, ValueError, KeyError):
            return -1

    def apply_batch(batch_df, batch_id: int):
        if batch_id <= last_applied():
            return
        rows = sorted(batch_df.collect(), key=lambda r: (split_path(r.path).document_uri, r.seq))
        for r in rows:
            body = json.loads(r.body) if r.body is not None else None
            try:
                if r.method == "put":
                    store.put(r.path, body)
                elif r.method == "patch":
                    store.patch(r.path, body)
                elif r.method == "delete":
                    store.delete(r.path)
            except KeyError:
                # replay of an already-applied delete/patch within a batch
                pass
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id}, f)
        os.replace(tmp, marker)

    stream = (
        spark.readStream.schema(COMMANDS_SPARK)
        .option("maxFilesPerTrigger", 4)
        .parquet(commands_dir)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = stream.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return stream.start()
