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


# Per-session memo of the ANALYZED fixture frames, keyed on the Spark
# application id + path. This is metadata caching only — the plan, the
# resolved schema, the file listing (the same class of caching the
# Spark guide's §6 endorses via filesourcePartitionFileCacheSize and
# every catalog does for table metadata). No DATA is cached: every
# action over the returned frame scans the parquet files afresh, so
# bench/oracle runs still compute from the inputs. What it removes is
# the repeated parquet footer/schema resolution that cost ~0.1 s per
# load_table call in every entry's construction (cProfile: the time is
# py4j + driver file access, multiplied under host noise).
_ANALYZED: dict = {}


def clear_table_cache() -> int:
    """Drop every memoized fixture frame; returns how many were held.

    The memo assumes IMMUTABLE fixture directories (load_table pins the
    parquet file listing and resolved schema for the session): any
    in-session path that regenerates, appends to, or deletes fixture
    files must call this first, or later load_table calls silently read
    the stale file set (review r12). Keying on applicationId already
    bounds growth to one session's (sf_dir, table) grid — ~30 entries
    across the three SFs — but an explicit clear also caps multi-sf_dir
    sweeps that touch many generated directories."""
    n = len(_ANALYZED)
    _ANALYZED.clear()
    return n


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Memoized fixture loader — metadata-only caching (see _ANALYZED).
    Assumes ``sf_dir`` is immutable for the life of the Spark
    application; call :func:`clear_table_cache` after any in-session
    fixture regeneration."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    got = _ANALYZED.get(key)
    if got is not None:
        return got
    df = _load_table_uncached(spark, sf_dir, name)
    _ANALYZED[key] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
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
