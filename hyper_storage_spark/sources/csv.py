"""CSV source with the same dead-letter discipline as the JSONL
boundary (sources/jsonl.py): explicit schema required (inference
double-scans 100 TB and guesses types), PERMISSIVE parse, malformed
lines split into a verbatim quarantine frame instead of silently
nulling or dropping.

CSV adds one failure mode JSONL doesn't have: a row can parse but
carry the WRONG COLUMN COUNT; PERMISSIVE mode nulls the missing /
drops the extra fields AND captures the raw line in the corrupt
column, so such rows land in quarantine too (Spark only captures when
the row is actually malformed — a clean narrow row with all types
matching stays clean)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Read CSV at ``path`` under the REQUIRED ``schema``; returns
    (clean, quarantine) exactly like
    :func:`~hyper_storage_spark.sources.jsonl.read_jsonl`."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"{CORRUPT_COL!r} is reserved")
    # fresh StructType, NOT schema.add(...) — add() mutates the
    # caller's schema in place (review r12, same as read_jsonl)
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    from ..operators._caches import tracked_persist

    df = tracked_persist(
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return clean, quarantine


def write_csv(
    df: DataFrame, path: str, shards: int | None = None, header: bool = True, sep: str = ","
) -> None:
    """Write ``df`` as CSV shards (mirrors jsonl.write_jsonl)."""
    out = df.repartition(shards) if shards else df
    out.write.mode("overwrite").option("header", str(header).lower()).option(
        "sep", sep
    ).csv(path)
