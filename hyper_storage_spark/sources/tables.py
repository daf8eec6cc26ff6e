"""Loaders for the synthetic test tables (TESTDATA.md).

The ``events`` table's ``ts`` column has shipped in two parquet shapes
across testdata regenerations:

* TIMESTAMP(NANOS) — Spark's vectorized reader rejects it; we read it
  via the ``nanosAsLong`` legacy switch and convert to a microsecond
  timestamp.
* ``timestamp[us]`` with no timezone — Spark 4 reads it as
  TIMESTAMP_NTZ, which breaks ``unix_micros`` and ``withWatermark``
  downstream.

Either way we normalize to a plain TimestampType column.  The session
timezone is pinned to UTC (session.py), so the NTZ→TZ cast is
value-preserving: the same wall-clock micros land in the same instant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The legacy switch must stay set for the SESSION, not just through
    # df.schema: Spark re-reads it from the session conf when the
    # physical parquet reader is built at ACTION time, so a
    # set-analyze-restore dance leaves analysis seeing bigint while
    # execution runs with the flag off — TIMESTAMP(NANOS) inputs (the
    # exact case the bigint branch below handles) would fail or misread
    # at collect. Safe session-wide here: none of the engine's own
    # parquet (store buckets, staging, exports) carries nanos columns,
    # so the only reads the flag can affect are these fixture loads.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division: float division loses precision at 1.7e18 ns
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # normalize EVERY ntz timestamp column, not just events.ts: the
    # testdata's timestamp physical type has already shifted once
    # (round 3: ns-as-bigint → µs-no-tz) and any table could follow
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
