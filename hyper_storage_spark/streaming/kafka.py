"""Kafka transport for the command stream and the change feed.

The reference's production faces are Kafka topics on both sides:
commands in, ``feed:put/patch/delete`` events out
(application.conf:87-98; BackgroundContentTaskCompleter.scala:75-113
publishes the feed with the revision header). This module provides the
same faces for the Spark engine:

- :func:`kafka_command_stream` — ``readStream.format("kafka")`` →
  decoded (seq, method, path, body) commands, drop-in for the file
  source in :func:`..ingest.run_command_stream`;
- :func:`feed_kafka_sink` — feed events → ``writeStream
  .format("kafka")``, keyed by ``document_uri`` so one document's
  events stay in one partition in revision order (the consumer-side
  revision-dedup contract relies on per-key ordering, not global).

The sandbox has neither a broker nor the spark-sql-kafka connector
JAR, so the ``format("kafka")`` call itself cannot execute here; the
option plumbing and the payload codecs (the parts with logic) are pure
functions, unit-tested against batch DataFrames. On a cluster, submit
with ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..store.documents import FEED_SPARK  # noqa: F401 - the sink's record schema
from .ingest import COMMANDS_SPARK


def kafka_source_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
    extra: Optional[dict] = None,
) -> dict:
    """The exact option map a command-stream Kafka source runs with."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        # at-least-once + batch-id watermark makes re-delivery safe, so
        # a compacted/expired offset should not kill the stream
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    opts.update(extra or {})
    return opts


def kafka_sink_options(
    bootstrap_servers: str, topic: str, extra: Optional[dict] = None
) -> dict:
    opts = {"kafka.bootstrap.servers": bootstrap_servers, "topic": topic}
    opts.update(extra or {})
    return opts


def decode_command_payload(raw: DataFrame) -> DataFrame:
    """Kafka record → command rows: ``value`` is a JSON object with the
    same fields as the file-source schema (seq, method, path, body).
    Works on any DataFrame with a binary/string ``value`` column, which
    is what makes the codec testable without a broker.

    Undecodable payloads (from_json ⇒ null struct) come out as rows
    with method='__undecodable__' and the raw text in ``body`` — the
    ingest dispatcher dead-letters unknown methods, so one bad
    producer message is recorded instead of poison-pilling the
    retried batch (an all-null row would crash the path router)."""
    txt = F.col("value").cast("string")
    # PERMISSIVE from_json yields all-null FIELDS (not a null struct)
    # for bad input; a missing/null method is the undecodable marker —
    # a real command always carries one, and a JSON object without it
    # is equally malformed
    bad = F.col("c.method").isNull()
    return raw.select(txt.alias("__raw"), F.from_json(txt, COMMANDS_SPARK).alias("c")).select(
        F.col("c.seq").alias("seq"),
        F.when(bad, F.lit("__undecodable__")).otherwise(F.col("c.method")).alias("method"),
        F.coalesce(F.col("c.path"), F.lit("")).alias("path"),
        F.when(bad, F.col("__raw")).otherwise(F.col("c.body")).alias("body"),
    )


def encode_feed_payload(feed: DataFrame) -> DataFrame:
    """Feed event rows → Kafka records. Key = document_uri: Kafka
    guarantees per-partition order, so keying by document keeps each
    document's events in revision order for consumers (the reference's
    delivery model; global order is not promised there either)."""
    return feed.select(
        F.col("document_uri").cast("string").alias("key"),
        F.to_json(
            F.struct("uuid", "document_uri", "item_id", "revision", "method", "body", "ts")
        ).alias("value"),
    )


def kafka_command_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    extra_options: Optional[dict] = None,
) -> DataFrame:
    """The command topic as a streaming DataFrame of decoded commands —
    the Kafka face of ``run_command_stream``'s file source. Requires
    the spark-sql-kafka connector on the classpath."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(
        bootstrap_servers, topic, starting_offsets, extra=extra_options
    ).items():
        reader = reader.option(k, v)
    return decode_command_payload(reader.load())


def feed_kafka_sink(
    feed_stream: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    extra_options: Optional[dict] = None,
):
    """feed events (e.g. :func:`..feed.feed_readstream`) → Kafka topic.
    Returns the configured ``DataStreamWriter`` (caller ``.start()``s)."""
    writer = encode_feed_payload(feed_stream).writeStream.format("kafka").option(
        "checkpointLocation", checkpoint_dir
    )
    for k, v in kafka_sink_options(bootstrap_servers, topic, extra=extra_options).items():
        writer = writer.option(k, v)
    return writer
