"""Training-data export: sharded, order-preserving corpus writes with
a verifiable manifest.

The output side of the pipeline: after filtering/dedup/mixing, a
training run consumes the corpus as N equal-ish shards in a
REPRODUCIBLE global order (data loaders stride over shard files; an
ablation must see bit-identical order; an auditor must be able to
prove the delivered shards are complete and untampered).

- :func:`write_training_shards` — seeded content-hash shuffle
  (sampling.seeded_shuffle: cluster/partitioning/retry-invariant),
  range-partitioned into exactly ``n_shards`` sorted parquet files
  (shard k = the k-th contiguous slice of the global order; the hash
  ord key is uniform, so the range partitioner balances the slices),
  plus ``manifest.json`` with per-shard row counts, order bounds, and
  an order-insensitive integer checksum over EVERY column of every
  row (id, ord key, and payload alike).
- :func:`verify_training_shards` — recompute every per-shard stat
  from the files and compare to the manifest; any missing, extra,
  cross-shard-reordered, or altered row content fails. What the
  manifest does NOT pin is byte order INSIDE one shard file: rows are
  written sorted by the embedded ``__ord`` column, and a consumer
  needing provable order re-sorts each shard on ``__ord`` (shard-
  local, cheap) — so a within-file permutation is detectable and
  recoverable from verified content, just not a verification failure.

At 100 TB this is one range exchange + local sorts (no single-node
merge) and the verification is one grouped aggregate over the shard
files — both linear, both partition-parallel.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sampling import seeded_shuffle

MANIFEST = "manifest.json"


def _ddl_of(df: DataFrame) -> str:
    return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)


def _read_shards(spark: SparkSession, data_dir: str, fmt: str, schema: Optional[str]):
    if fmt == "parquet":
        return spark.read.parquet(data_dir)
    if fmt == "json":
        # JSONL MUST read back under the exporter's recorded schema:
        # inference would widen/narrow types (ints vs doubles,
        # timestamps vs strings) and silently change every checksum
        if not schema:
            raise ValueError("json shards require the manifest schema")
        return spark.read.schema(schema).json(f"{data_dir}/*.json")
    if fmt == "orc":
        return spark.read.orc(data_dir)
    raise ValueError(f"unsupported shard format {fmt!r}")


def _shard_stats(spark: SparkSession, data_dir: str, fmt: str = "parquet", schema: Optional[str] = None):
    """Per-file (n_rows, checksum, ord bounds), keyed by file name —
    computed with one grouped aggregate over the shard files."""
    df = _read_shards(spark, data_dir, fmt, schema).withColumn(
        "__file", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )
    row_cols = [c for c in df.columns if c != "__file"]
    rows = (
        df.groupBy("__file")
        .agg(
            F.count("*").alias("n_rows"),
            # hash EVERY column (payload included — an id-only digest
            # would bless altered payloads); DECIMAL(38,0) sum: a long
            # sum of 64-bit hashes overflows ANSI arithmetic after a
            # few thousand rows
            F.sum(F.xxhash64(*row_cols).cast("decimal(38,0)")).alias("checksum"),
            F.min("__ord").alias("ord_min"),
            F.max("__ord").alias("ord_max"),
        )
        .collect()
    )
    return {
        r["__file"]: {
            "n_rows": r["n_rows"],
            "checksum": int(r["checksum"]),
            "ord_min": r["ord_min"],
            "ord_max": r["ord_max"],
        }
        for r in rows
    }


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    id_col: str,
    seed: int = 0,
    fmt: str = "parquet",
) -> dict:
    """Export ``df`` as ``n_shards`` order-preserving shards under
    ``out_dir`` — parquet by default, ``fmt="json"`` for JSONL (the
    interchange shape trainers ingest directly; the row schema is
    recorded in the manifest so verification reads back under the
    exporter's types, never inference's) or ``fmt="orc"`` (columnar
    like parquet, self-describing, for ORC-standardized downstreams)
    — and return (and write) the manifest.

    The manifest's checksums are deliberately order-insensitive SUMS
    of per-row full-content hashes: cross-shard placement is pinned by
    the (ord_min, ord_max) bounds, intra-shard order is re-derivable
    from the embedded __ord column, and a sum verifies content
    identity in one partial-aggregatable pass."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if "__ord" in df.columns or "__id" in df.columns:
        raise ValueError("columns __ord/__id are reserved for the exporter")
    data_dir = os.path.join(out_dir, "data")
    shuffled = seeded_shuffle(
        df.withColumn("__id", F.col(id_col)), id_col, seed=seed, ord_col="__ord"
    )
    writer = (
        shuffled.repartitionByRange(n_shards, F.col("__ord"), F.col("__id"))
        .sortWithinPartitions("__ord", "__id")
        .write.mode("overwrite")
    )
    if fmt == "parquet":
        writer.parquet(data_dir)
    elif fmt == "json":
        writer.json(data_dir)
    elif fmt == "orc":
        writer.orc(data_dir)
    else:
        raise ValueError(f"unsupported shard format {fmt!r}")
    spark = df.sparkSession
    schema_ddl = None if fmt == "parquet" else _ddl_of(shuffled)
    stats = _shard_stats(spark, data_dir, fmt, schema_ddl)
    shards = [
        {"file": name, **st}
        for name, st in sorted(stats.items(), key=lambda kv: kv[1]["ord_min"])
    ]
    manifest = {
        "format": "hyper-storage-spark/training-shards/v1",
        "data_format": fmt,
        "schema": schema_ddl,
        "seed": seed,
        "id_col": id_col,
        "n_shards": len(shards),
        "total_rows": sum(s["n_rows"] for s in shards),
        "shards": shards,
    }
    # atomic publish (same idiom as store/storage.py's manifest): a
    # crash mid-dump must not leave a truncated manifest, nor destroy
    # a previous valid one on re-export
    path = os.path.join(out_dir, MANIFEST)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    return manifest


def verify_training_shards(
    spark: SparkSession, out_dir: str
) -> tuple[bool, Optional[str]]:
    """Recompute per-shard stats from the files and compare to the
    manifest. Returns (ok, reason) — reason names the first mismatch
    (missing/extra file, row count, checksum, or overlapping order
    ranges across shards)."""
    with open(os.path.join(out_dir, MANIFEST)) as f:
        manifest = json.load(f)
    actual = _shard_stats(
        spark,
        os.path.join(out_dir, "data"),
        manifest.get("data_format", "parquet"),
        manifest.get("schema"),
    )
    expected = {s["file"]: s for s in manifest["shards"]}
    if set(actual) != set(expected):
        missing = set(expected) - set(actual)
        extra = set(actual) - set(expected)
        return False, f"shard files differ (missing={sorted(missing)}, extra={sorted(extra)})"
    for name, exp in expected.items():
        act = actual[name]
        for k in ("n_rows", "checksum", "ord_min", "ord_max"):
            if act[k] != exp[k]:
                return False, f"{name}: {k} {act[k]!r} != manifest {exp[k]!r}"
    ordered = sorted(expected.values(), key=lambda s: s["ord_min"])
    for a, b in zip(ordered, ordered[1:]):
        if b["ord_min"] < a["ord_max"]:
            return False, f"order ranges overlap: {a['ord_max']} > {b['ord_min']}"
    if manifest["total_rows"] != sum(s["n_rows"] for s in ordered):
        return False, "total_rows does not match shard sum"
    return True, None
