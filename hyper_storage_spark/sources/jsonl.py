"""JSONL (newline-delimited JSON) source/sink for document corpora.

The interchange format LLM training corpora actually arrive in: one
JSON object per line, gzip-friendly, schema-on-read. The engine's
internal format stays parquet (columnar, predicate-pushdown-able);
this module is the boundary — land JSONL once, convert to parquet,
run everything else on the parquet.

Scale shape: ``spark.read.json`` with an EXPLICIT schema — schema
inference scans the whole input twice at 100 TB, so the schema is a
required argument here, not an option. Malformed lines are never
silently dropped or allowed to poison a column: PERMISSIVE mode with a
``_corrupt_record`` column splits the input into (clean, quarantine)
in one pass, and the quarantine frame is returned alongside the data
so ingest jobs can count/route it (the dead-letter discipline the
store's streaming ingest already follows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL at ``path`` under the REQUIRED ``schema``; returns
    (clean, quarantine). Clean rows carry exactly the schema's
    columns; quarantine rows carry one string column ``raw`` with the
    offending line verbatim.

    A line is quarantined when it isn't valid JSON at all — Spark
    PERMISSIVE parsing captures it in ``_corrupt_record`` and nulls
    the data columns. (Type mismatches on individual fields null just
    that field, standard schema-on-read.) The corrupt column must be
    part of the read schema for capture to work; it is added and
    stripped here so callers never see it."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"{CORRUPT_COL!r} is reserved")
    # fresh StructType, NOT schema.add(...): add() mutates the caller's
    # schema in place (review r12) — a reused schema object would carry
    # a phantom corrupt column and fail the reserved-name check above
    # on its second read
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    # Spark requires the corrupt-capture frame to be materialized from
    # the raw source (referencing only _corrupt_record from a bare
    # read is unsupported); cache once, split, both halves reuse it
    from ..operators._caches import tracked_persist

    df = tracked_persist(
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return clean, quarantine


def write_jsonl(df: DataFrame, path: str, shards: int | None = None) -> None:
    """Write ``df`` as JSONL shards (one directory, ``part-*`` files).
    ``shards`` repartitions for a target shard count (exports want
    few-hundred-MB shards, not one file per input split); None keeps
    the upstream partitioning."""
    out = df.repartition(shards) if shards else df
    out.write.mode("overwrite").json(path)
