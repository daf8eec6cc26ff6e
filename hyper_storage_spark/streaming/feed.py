"""Change-feed consumption as a stream.

The reference publishes ``feed:put|patch|delete`` events (with the
revision header) to a Kafka topic after each completed write
(BackgroundContentTaskCompleter.scala:83-95, application.conf:87-98);
consumers subscribe via the bus (IntegratedSpec.scala:104-109).

Here the feed is an append-only parquet log (one new file per
completion commit), which is exactly a Structured Streaming file
source. On a cluster the same pipeline reads ``format("kafka")`` and
everything downstream is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..store.documents import FEED_SPARK, DocumentStore


def feed_readstream(spark: SparkSession, store: DocumentStore) -> DataFrame:
    """Streaming DataFrame of feed events; at-least-once, idempotent by
    (document_uri, item_id, revision)."""
    return (
        spark.readStream.schema(FEED_SPARK)
        .option("maxFilesPerTrigger", 16)
        .parquet(store.feed_dir())
    )
