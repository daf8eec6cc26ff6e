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

from .sampling import seeded_ord, seeded_shuffle

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


# --------------------------------------------------------------------------
# WebDataset tar shards — the multimodal training-data delivery format
# --------------------------------------------------------------------------

_WDS_MANIFEST = "wds_manifest.json"


def _wds_digest_update(h, name: str, payload: bytes) -> None:
    # length-prefixed so (name, payload) framing is unambiguous
    h.update(len(name).to_bytes(4, "big"))
    h.update(name.encode("utf-8"))
    h.update(len(payload).to_bytes(8, "big"))
    h.update(payload)


def write_webdataset_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    key_col: str,
    columns: dict,
    seed: int = 0,
) -> dict:
    """Export samples as WebDataset tar shards: ``n_shards`` tar files
    whose members are named ``{key}.{ext}`` with consecutive members
    of one key forming a sample — the layout multimodal data loaders
    (webdataset/tarp) stream sequentially, which is the whole point:
    a trainer reads big contiguous tars, never 10⁹ small files.

    ``columns`` maps column → member extension (e.g. ``{"text":
    "txt", "meta": "json", "image": "png"}``): binary columns are
    written raw, strings as UTF-8, anything else as its JSON literal.
    Samples are hash-sharded by xxhash64(key) (deterministic,
    balanced, retry-invariant) and ordered INSIDE each shard by the
    seeded content-hash shuffle order — so the byte stream of every
    shard is a pure function of (content, seed), and re-running the
    export bit-reproduces it. That determinism is what the manifest
    pins: per shard, sample count, payload bytes, and an
    ORDER-SENSITIVE sha256 over the length-prefixed (member name,
    payload) stream; :func:`verify_webdataset_shards` recomputes all
    three from the tars alone.

    Scale shape: one narrow projection + hash partition; each shard
    is written by exactly ONE task (groupBy shard → applyInPandas),
    streaming members through the stdlib tar writer — executor-local
    sequential IO, no driver data path, no shuffle of anything wider
    than the sample payloads themselves. On an object store, point
    ``out_dir`` at the mounted bucket or swap the open() for a
    multipart upload; the layout and manifest are unchanged. Shard
    tasks are independent, so stragglers/retries re-write their own
    tar atomically (tmp + rename) without touching the rest.
    """
    import hashlib
    import io
    import json as _json
    import tarfile

    import pandas as pd

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if not columns:
        raise ValueError("columns must map at least one column to an extension")
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    # keys MUST be unique: duplicate keys would get identical
    # (__ord, __key) sort positions (intra-shard order — and thus the
    # "bit-reproducible" digest — would depend on pandas' incidental
    # order) and produce duplicate {key}.{ext} tar member names, which
    # WebDataset loaders merge into one corrupt sample. One aggregation
    # up front; the contract is documented, not silently repaired.
    dup = (
        df.groupBy(F.col(key_col).cast("string").alias("__k"))
        .count()
        .filter(F.col("count") > 1)
        .limit(3)
        .collect()
    )
    if dup:
        examples = ", ".join(repr(r["__k"]) for r in dup)
        raise ValueError(
            f"write_webdataset_shards: key_col {key_col!r} has duplicate "
            f"keys (e.g. {examples}) — sample keys must be unique"
        )
    os.makedirs(out_dir, exist_ok=True)

    binary_cols = {f.name for f in df.schema.fields if f.dataType.simpleString() == "binary"}
    string_cols = {f.name for f in df.schema.fields if f.dataType.simpleString() == "string"}
    col_list = list(columns)

    # the ORDER COLUMN only, not seeded_shuffle's global orderBy: the
    # groupBy(__shard) hash exchange below destroys any input order
    # (and applyInPandas is not a sort-eliminating consumer, so the
    # range exchange + full corpus sort would really run — pure waste
    # at 100 TB); each shard re-establishes its order locally from the
    # same md5 key, so the published tar bytes are identical
    shuffled = df.withColumn("__ord", seeded_ord(F.col(key_col), seed))
    with_shard = shuffled.select(
        F.pmod(F.xxhash64(F.col(key_col).cast("string"), F.lit(seed)), F.lit(n_shards))
        .cast("int")
        .alias("__shard"),
        F.col(key_col).cast("string").alias("__key"),
        F.col("__ord"),
        *[F.col(c) for c in col_list],
    )

    def _payload(col: str, v) -> bytes:
        if v is None:
            return b""
        if col in binary_cols:
            return bytes(v)
        if col in string_cols:
            return str(v).encode("utf-8")
        return _json.dumps(v, sort_keys=True, default=str).encode("utf-8")

    def _write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__ord", "__key"]).reset_index(drop=True)
        shard = int(pdf["__shard"].iloc[0])
        name = f"shard-{shard:05d}.tar"
        # per-ATTEMPT unique tmp (the storage.py staging discipline): a
        # speculative duplicate or zombie retry of this shard task on a
        # shared out_dir must not interleave writes into one tmp file —
        # each attempt streams its own and the os.replace publish is
        # last-writer-wins with identical bytes
        import uuid as _uuid

        tmp = os.path.join(out_dir, f".{name}.{_uuid.uuid4().hex[:8]}.tmp")
        h = hashlib.sha256()
        n_bytes = 0
        with tarfile.open(tmp, "w") as tf:
            for _, row in pdf.iterrows():
                for c in col_list:
                    member = f"{row['__key']}.{columns[c]}"
                    payload = _payload(c, row[c])
                    info = tarfile.TarInfo(member)
                    info.size = len(payload)
                    info.mtime = 0  # fixed: tar bytes must be reproducible
                    tf.addfile(info, io.BytesIO(payload))
                    _wds_digest_update(h, member, payload)
                    n_bytes += len(payload)
        os.replace(tmp, os.path.join(out_dir, name))
        return pd.DataFrame(
            {
                "shard": [shard],
                "file": [name],
                "n_samples": [len(pdf)],
                "n_bytes": [n_bytes],
                "digest": [h.hexdigest()],
            }
        )

    manifest_rows = (
        with_shard.groupBy("__shard")
        .applyInPandas(
            _write_shard,
            "shard int, file string, n_samples long, n_bytes long, digest string",
        )
        .collect()
    )
    manifest = {
        "format": "webdataset",
        # the POPULATED shard count (the parquet path's convention):
        # hash buckets left empty by small corpora write no tar, and a
        # loader enumerating n_shards names must not 404 on the gap
        "n_shards": len(manifest_rows),
        "n_shards_requested": n_shards,
        "key_col": key_col,
        "columns": {c: columns[c] for c in col_list},
        "seed": seed,
        "shards": sorted(
            (
                {
                    "shard": r.shard,
                    "file": r.file,
                    "n_samples": r.n_samples,
                    "n_bytes": r.n_bytes,
                    "digest": r.digest,
                }
                for r in manifest_rows
            ),
            key=lambda d: d["shard"],
        ),
    }
    # atomic publish (the parquet path's idiom): a crash mid-dump must
    # not leave a truncated manifest, nor destroy a previous valid one
    # on re-export
    path = os.path.join(out_dir, _WDS_MANIFEST)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        _json.dump(manifest, fh, indent=1)
    os.replace(tmp, path)
    return manifest


def verify_webdataset_shards(spark: SparkSession, out_dir: str) -> dict:
    """Re-derive every shard's (n_samples, n_bytes, order-sensitive
    digest) from the tar bytes alone and compare to the manifest.
    Any missing/extra/reordered/altered member fails — tar member
    ORDER is part of the contract (loaders stream sequentially), so
    unlike the parquet shards' order-insensitive sums, this digest is
    a running hash. Returns {"ok": bool, "mismatches": [...]} —
    verification is one task per shard, embarrassingly parallel."""
    import hashlib
    import json as _json
    import tarfile

    import pandas as pd

    with open(os.path.join(out_dir, _WDS_MANIFEST), "r", encoding="utf-8") as fh:
        manifest = _json.load(fh)
    ext_per_sample = len(manifest["columns"])
    files = [(s["file"],) for s in manifest["shards"]]

    def _check(pdfs):
        for pdf in pdfs:
            out = []
            for fname in pdf["file"]:
                h = hashlib.sha256()
                n_bytes = 0
                n_members = 0
                try:
                    with tarfile.open(os.path.join(out_dir, fname), "r") as tf:
                        for m in tf:
                            payload = tf.extractfile(m).read() if m.size else b""
                            _wds_digest_update(h, m.name, payload)
                            n_bytes += len(payload)
                            n_members += 1
                    out.append((fname, n_members, n_bytes, h.hexdigest(), None))
                except (OSError, tarfile.TarError) as ex:
                    out.append((fname, 0, 0, "", f"{type(ex).__name__}: {ex}"))
            yield pd.DataFrame(
                out, columns=["file", "n_members", "n_bytes", "digest", "err"]
            )

    got = {
        r.file: r
        for r in spark.createDataFrame(files, "file string")
        .repartition(max(1, len(files)))
        .mapInPandas(
            _check,
            "file string, n_members long, n_bytes long, digest string, err string",
        )
        .collect()
    }
    mismatches = []
    # the delivered set must be EXACTLY the manifest's (the parquet
    # verifier's set-difference check): a stale tar from a previous
    # larger export, or an injected one, is a verification failure —
    # trainers glob *.tar and would consume the unverified extra
    import glob as _glob

    on_disk = {
        os.path.basename(p)
        for p in _glob.glob(os.path.join(out_dir, "shard-*.tar"))
    }
    for extra in sorted(on_disk - {s["file"] for s in manifest["shards"]}):
        mismatches.append({"file": extra, "why": "extra shard not in manifest"})
    for s in manifest["shards"]:
        r = got.get(s["file"])
        if r is None:
            mismatches.append({"file": s["file"], "why": "shard not read back"})
            continue
        if r.err:
            mismatches.append({"file": s["file"], "why": r.err})
            continue
        if r.n_members != s["n_samples"] * ext_per_sample:
            mismatches.append(
                {"file": s["file"], "why": f"member count {r.n_members} != "
                 f"{s['n_samples']} samples x {ext_per_sample} exts"}
            )
        if r.n_bytes != s["n_bytes"]:
            mismatches.append({"file": s["file"], "why": "payload byte total differs"})
        if r.digest != s["digest"]:
            mismatches.append({"file": s["file"], "why": "order-sensitive digest differs"})
    return {"ok": not mismatches, "mismatches": mismatches}


def read_webdataset_shards(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read WebDataset shards back as (shard, key, ext, content:
    binary) rows — one task per shard, each streaming its tar
    sequentially (the same access pattern a trainer uses). The
    inverse is lossy only in type: every member comes back as bytes;
    the manifest records which extension was which column."""
    import json as _json
    import tarfile

    import pandas as pd

    with open(os.path.join(out_dir, _WDS_MANIFEST), "r", encoding="utf-8") as fh:
        manifest = _json.load(fh)
    files = [(s["shard"], s["file"]) for s in manifest["shards"]]

    def _read(pdfs):
        for pdf in pdfs:
            for shard, fname in zip(pdf["shard"], pdf["file"]):
                rows = []
                with tarfile.open(os.path.join(out_dir, fname), "r") as tf:
                    for m in tf:
                        payload = tf.extractfile(m).read() if m.size else b""
                        key, _, ext = m.name.rpartition(".")
                        rows.append((int(shard), key, ext, payload))
                yield pd.DataFrame(
                    rows, columns=["shard", "key", "ext", "content"]
                )

    return (
        spark.createDataFrame(files, "shard int, file string")
        .repartition(max(1, len(files)))
        .mapInPandas(_read, "shard int, key string, ext string, content binary")
    )
