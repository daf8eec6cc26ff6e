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


# applyInPandas result rows: staged bucket files, feed events to
# append, and table drops — everything the driver needs for one commit
_RESULT_SCHEMA = "kind string, table string, bucket int, path string, payload string"


def _apply_bucket_commands(root: str, n_buckets: int, auto_complete: bool, batch_id: int):
    """Returns the executor-side applyInPandas function for one bucket
    group: apply the bucket's commands (per-document, seq order) through
    the REAL DocumentStore write path against a copy-on-write overlay,
    stage the resulting bucket datasets as parquet files, and emit their
    paths (plus feed events) for the driver's atomic commit.

    The single-writer guarantee holds because commands are
    hash-partitioned by bucket = crc32(document_uri) % n_buckets (the
    reference's ShardProcessor consistent-hash ownership,
    TransactionLogic.scala:26-30): every document's commands land in
    exactly one task, applied serially in seq order — gapless revisions
    with no driver-side row loop. Index-table maintenance is also
    conflict-free: an index table is touched only by its collection's
    own bucket group."""

    def apply_group(pdf):
        import pandas as pd

        from ..store.documents import DocumentStore as _DS
        from ..store.storage import OverlayStorage, Storage, _sanitize, write_bucket_file

        out = []
        if len(pdf):
            base = Storage(root, n_buckets)
            overlay = OverlayStorage(base)
            ds = _DS(root, auto_complete=auto_complete, storage=overlay)
            pdf = pdf.sort_values(["document_uri", "seq"])
            for r in pdf.itertuples():
                body = json.loads(r.body) if r.body is not None else None
                try:
                    if r.method == "put":
                        ds.put(r.path, body)
                    elif r.method == "patch":
                        ds.patch(r.path, body)
                    elif r.method == "delete":
                        ds.delete(r.path)
                except KeyError:
                    pass  # same skip semantics as the serial path
            for (table, bucket), rows in overlay.overlay.items():
                rel = os.path.join(
                    "data",
                    _sanitize(table),
                    f"b{bucket:04d}-stream-{batch_id}-{uuid.uuid4().hex[:8]}.parquet",
                )
                # the shared writer keeps staged buckets key-sorted with
                # bounded row groups — point-read pruning must hold for
                # buckets last written by the streaming path too
                write_bucket_file(rows, overlay.schemas[table], os.path.join(root, rel))
                out.append(("file", table, int(bucket), rel, None))
            for table, rows in overlay.appended.items():
                for row in rows:
                    out.append(("append", table, 0, None, json.dumps(row)))
            for table in overlay.dropped:
                out.append(("drop", table, 0, None, None))
        return pd.DataFrame(out, columns=["kind", "table", "bucket", "path", "payload"])

    return apply_group


def apply_commands_distributed(store: DocumentStore, batch_df, batch_id: int) -> None:
    """Apply one micro-batch executor-side: group by storage bucket,
    run each group through the overlayed DocumentStore on its executor,
    then publish feed events and flip the manifest ONCE on the driver.

    Batches containing a collection-document delete fall back to the
    serial path: dropping a collection's index tables rewrites the
    global INDEX_DEFS bucket, which two groups could otherwise both
    stage (rare, metadata-only — correctness over parallelism there)."""
    from pyspark.sql import functions as F

    from ..paths import split_path as _sp
    from ..store.documents import FEED, FEED_SCHEMA

    n_buckets = store.storage.n_buckets

    @F.pandas_udf("document_uri string, bucket int")
    def route(paths):
        import pandas as pd
        import zlib

        uris = [_sp(p).document_uri for p in paths]
        return pd.DataFrame(
            {
                "document_uri": uris,
                "bucket": [zlib.crc32(u.encode("utf-8")) % n_buckets for u in uris],
            }
        )

    # collection-document delete = delete of a path that IS a
    # collection uri (ends with '~', no item segment) — a pure Column
    # predicate on the raw batch, so the fallback check costs no
    # route-UDF pass over the data
    if (
        batch_df.filter((F.col("method") == "delete") & F.col("path").endswith("~"))
        .limit(1)
        .count()
        > 0
    ):
        _apply_serial(store, batch_df.collect())
        return

    ann = batch_df.withColumn("r", route("path")).select("*", "r.document_uri", "r.bucket").drop("r")
    func = _apply_bucket_commands(
        store.storage.root, n_buckets, store.auto_complete, batch_id
    )
    results = ann.groupBy("bucket").applyInPandas(func, _RESULT_SCHEMA).collect()

    feed_rows = sorted(
        (json.loads(r.payload) for r in results if r.kind == "append" and r.table == FEED),
        key=lambda d: (d["document_uri"], d["revision"]),
    )
    files: dict[str, dict[int, list[str]]] = {}
    drops: list[str] = []
    for r in results:
        if r.kind == "file":
            files.setdefault(r.table, {})[r.bucket] = [os.path.join(store.storage.root, r.path)]
        elif r.kind == "drop":
            drops.append(r.table)
    # feed first, manifest flip second: a crash in between re-applies
    # the whole batch (watermark not yet advanced) and consumers dedup
    # feed events by (uri, revision) — the reference's delivery model
    if feed_rows:
        store.storage.append(FEED, feed_rows, FEED_SCHEMA)
    if files or drops:
        store.storage.commit_external_many(files, drop_tables=drops)


def _apply_serial(store: DocumentStore, rows) -> None:
    from ..paths import split_path

    for r in sorted(rows, key=lambda r: (split_path(r.path).document_uri, r.seq)):
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


def run_command_stream(
    spark: SparkSession,
    store: DocumentStore,
    commands_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    distributed: bool = True,
):
    """Consume the command log and apply it to the store.

    Each micro-batch is hash-partitioned by document bucket and applied
    ON EXECUTORS (per-key serialization ⇒ gapless revisions, exactly
    the reference's ShardProcessor ownership model); the driver's only
    work per batch is publishing feed events and one atomic manifest
    flip. The checkpoint makes restarts resume after the last
    fully-applied batch (recovery parity without RecoveryWorker)."""
    import hashlib

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
        if distributed:
            apply_commands_distributed(store, batch_df, batch_id)
        else:
            _apply_serial(store, batch_df.collect())
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
