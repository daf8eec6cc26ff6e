"""Sharded training-data export (operators/export.py): balanced
order-preserving shards, reproducible manifests, tamper detection."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from hyper_storage_spark.operators import export


@pytest.fixture()
def corpus(spark):
    return spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("text-"), F.col("id")).alias("text")
    )


def test_shards_are_balanced_and_ordered(spark, corpus, tmp_path):
    out = str(tmp_path / "export")
    m = export.write_training_shards(corpus, out, n_shards=8, id_col="doc_id", seed=1)
    assert m["n_shards"] == 8 and m["total_rows"] == 1000
    sizes = [s["n_rows"] for s in m["shards"]]
    # uniform hash ord → range partitioner balances the slices
    assert min(sizes) > 0 and max(sizes) <= 2 * (1000 // 8)
    # shards tile the global order without overlap
    for a, b in zip(m["shards"], m["shards"][1:]):
        assert a["ord_max"] <= b["ord_min"]
    # reading shards in manifest order reconstructs the seeded order
    got = []
    for s in m["shards"]:
        rows = spark.read.parquet(os.path.join(out, "data", s["file"])).collect()
        got.extend(sorted((r["__ord"], r["doc_id"]) for r in rows))
    assert got == sorted(got)
    assert sorted(doc for _, doc in got) == list(range(1000))


def test_manifest_is_reproducible_across_exports(spark, corpus, tmp_path):
    m1 = export.write_training_shards(corpus, str(tmp_path / "a"), 4, "doc_id", seed=9)
    m2 = export.write_training_shards(
        corpus.repartition(13), str(tmp_path / "b"), 4, "doc_id", seed=9
    )
    strip = lambda m: [
        {k: v for k, v in s.items() if k != "file"} for s in m["shards"]
    ]
    assert strip(m1) == strip(m2)
    m3 = export.write_training_shards(corpus, str(tmp_path / "c"), 4, "doc_id", seed=10)
    assert strip(m3) != strip(m1)  # a new seed is a new permutation


def test_verify_accepts_intact_and_rejects_tampered(spark, corpus, tmp_path):
    out = str(tmp_path / "export")
    m = export.write_training_shards(corpus, out, n_shards=4, id_col="doc_id", seed=2)
    ok, reason = export.verify_training_shards(spark, out)
    assert ok, reason

    # drop a shard file → missing
    victim = os.path.join(out, "data", m["shards"][0]["file"])
    saved = victim + ".bak"
    shutil.move(victim, saved)
    ok, reason = export.verify_training_shards(spark, out)
    assert not ok and "missing" in reason
    shutil.move(saved, victim)

    # corrupt the manifest's checksum → content mismatch
    mp = os.path.join(out, export.MANIFEST)
    doc = json.load(open(mp))
    doc["shards"][1]["checksum"] += 1
    json.dump(doc, open(mp, "w"))
    ok, reason = export.verify_training_shards(spark, out)
    assert not ok and "checksum" in reason


def test_verify_detects_altered_payload(spark, corpus, tmp_path):
    # same ids, same order, different payload column — the full-row
    # checksum must catch it (an id-only digest would not)
    out = str(tmp_path / "export")
    m = export.write_training_shards(corpus, out, n_shards=4, id_col="doc_id", seed=3)
    victim = os.path.join(out, "data", m["shards"][2]["file"])
    rows = spark.read.parquet(victim)
    tampered = rows.withColumn("text", F.concat(F.col("text"), F.lit("!")))
    tmp_out = str(tmp_path / "tampered")
    tampered.coalesce(1).write.mode("overwrite").parquet(tmp_out)
    import glob

    part = glob.glob(os.path.join(tmp_out, "part-*.parquet"))[0]
    shutil.copyfile(part, victim)
    # drop Hadoop's .crc sidecar (it would flag the byte change before
    # OUR checksum gets a chance — this test targets the manifest)
    crc = os.path.join(os.path.dirname(victim), f".{os.path.basename(victim)}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    spark.catalog.refreshByPath(os.path.join(out, "data"))  # drop cached file metadata
    ok, reason = export.verify_training_shards(spark, out)
    assert not ok and "checksum" in reason


def test_reserved_columns_and_bad_shard_count_rejected(spark, corpus):
    with pytest.raises(ValueError):
        export.write_training_shards(corpus, "/tmp/x", 0, "doc_id")
    with pytest.raises(ValueError):
        export.write_training_shards(
            corpus.withColumn("__ord", F.lit(1)), "/tmp/x", 2, "doc_id"
        )


def test_jsonl_round_trip_and_quarantine(spark, tmp_path):
    from hyper_storage_spark.sources import read_jsonl, write_jsonl

    src = spark.createDataFrame(
        [(1, "alpha", 3.5), (2, "beta", None), (3, "gamma", -1.0)],
        "doc_id long, text string, score double",
    )
    out = str(tmp_path / "corpus_jsonl")
    write_jsonl(src, out, shards=2)
    clean, quarantine = read_jsonl(spark, out, "doc_id long, text string, score double")
    assert quarantine.count() == 0
    got = sorted(map(tuple, clean.collect()))
    assert got == sorted(map(tuple, src.collect()))
    # hand-write a file with malformed lines: they quarantine verbatim,
    # clean lines still parse, nothing is silently dropped
    bad_dir = tmp_path / "bad_jsonl"
    bad_dir.mkdir()
    (bad_dir / "part-0.json").write_text(
        '{"doc_id": 10, "text": "ok", "score": 1.0}\n'
        "this is not json\n"
        '{"doc_id": 11, "text": "also ok", "score": 2.0}\n'
        '{"broken": \n'
    )
    clean, quarantine = read_jsonl(
        spark, str(bad_dir), "doc_id long, text string, score double"
    )
    assert sorted(r.doc_id for r in clean.collect()) == [10, 11]
    raws = sorted(r.raw for r in quarantine.collect())
    assert raws == ["this is not json", '{"broken": ']
    # reserved-column misuse is a loud error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="_corrupt_record"):
        read_jsonl(spark, str(bad_dir), "_corrupt_record string")


def test_jsonl_shards_round_trip_verify_and_tamper(spark, corpus, tmp_path):
    out = str(tmp_path / "export_jsonl")
    m = export.write_training_shards(
        corpus, out, n_shards=4, id_col="doc_id", seed=5, fmt="json"
    )
    assert m["data_format"] == "json" and m["total_rows"] == 1000
    assert "doc_id bigint" in m["schema"]
    ok, reason = export.verify_training_shards(spark, out)
    assert ok, reason
    # JSONL shards hold one JSON object per line, readable without Spark
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(out, "data", "*.json")))
    assert len(files) == 4
    first = open(files[0]).readline()
    rec = json.loads(first)
    assert set(rec) == {"doc_id", "text", "__id", "__ord"}
    # identical content to a parquet export of the same seed
    mp = export.write_training_shards(
        corpus, str(tmp_path / "export_pq"), n_shards=4, id_col="doc_id", seed=5
    )
    assert [s["checksum"] for s in m["shards"]] == [
        s["checksum"] for s in mp["shards"]
    ]
    # tampering one line must fail verification via OUR checksum (drop
    # Hadoop's .crc sidecar so it can't flag the byte change first —
    # same idiom as the parquet tamper test)
    lines = open(files[1]).read().splitlines()
    rec = json.loads(lines[0]); rec["text"] = "tampered"
    lines[0] = json.dumps(rec)
    open(files[1], "w").write("\n".join(lines) + "\n")
    crc = os.path.join(os.path.dirname(files[1]), f".{os.path.basename(files[1])}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    spark.catalog.refreshByPath(os.path.join(out, "data"))
    ok, reason = export.verify_training_shards(spark, out)
    assert not ok and "checksum" in reason


def test_csv_round_trip_and_quarantine(spark, tmp_path):
    from hyper_storage_spark.sources import read_csv, write_csv

    src = spark.createDataFrame(
        [(1, "alpha", 3.5), (2, "beta", None), (3, "gamma", -1.0)],
        "doc_id long, text string, score double",
    )
    out = str(tmp_path / "corpus_csv")
    write_csv(src, out, shards=2)
    clean, quarantine = read_csv(spark, out, "doc_id long, text string, score double")
    assert quarantine.count() == 0
    assert sorted(map(tuple, clean.collect())) == sorted(map(tuple, src.collect()))
    # malformed rows quarantine: a type mismatch and a too-long row
    bad_dir = tmp_path / "bad_csv"
    bad_dir.mkdir()
    (bad_dir / "part-0.csv").write_text(
        "doc_id,text,score\n"
        "10,ok,1.0\n"
        "not_a_number,broken,xyz\n"
        "11,also ok,2.0\n"
    )
    clean, quarantine = read_csv(
        spark, str(bad_dir), "doc_id long, text string, score double"
    )
    assert sorted(r.doc_id for r in clean.collect()) == [10, 11]
    assert [r.raw for r in quarantine.collect()] == ["not_a_number,broken,xyz"]


def test_orc_shards_round_trip_and_checksum_parity(spark, corpus, tmp_path):
    out = str(tmp_path / "export_orc")
    m = export.write_training_shards(
        corpus, out, n_shards=4, id_col="doc_id", seed=5, fmt="orc"
    )
    assert m["data_format"] == "orc" and m["total_rows"] == 1000
    ok, reason = export.verify_training_shards(spark, out)
    assert ok, reason
    # identical content (and therefore checksums) to the parquet and
    # JSONL exports of the same seed — format changes bytes, not rows
    mp = export.write_training_shards(
        corpus, str(tmp_path / "export_pq2"), n_shards=4, id_col="doc_id", seed=5
    )
    assert [s["checksum"] for s in m["shards"]] == [
        s["checksum"] for s in mp["shards"]
    ]
    with pytest.raises(ValueError, match="unsupported shard format"):
        export.write_training_shards(
            corpus, str(tmp_path / "x"), 2, "doc_id", fmt="xml"
        )


def test_webdataset_shards_roundtrip_verify_tamper(spark, tmp_path):
    """WebDataset export: tar members named {key}.{ext} in the seeded
    deterministic order, manifest digests verify from the bytes
    alone, read-back reproduces every payload, re-export is
    bit-reproducible, and a tampered member fails verification."""
    import hashlib
    import json
    import os

    from pyspark.sql import functions as F

    from hyper_storage_spark.operators import export

    df = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text of doc "), F.col("id").cast("string")).alias("text"),
        F.struct(
            (F.col("id") % 3).alias("lbl"), F.lit("src").alias("source")
        ).alias("meta"),
        F.col("id").cast("string").cast("binary").alias("img"),
    )
    out = str(tmp_path / "wds")
    cols = {"text": "txt", "meta": "json", "img": "png"}
    manifest = export.write_webdataset_shards(df, out, 4, "doc_id", cols, seed=7)
    assert len(manifest["shards"]) == 4
    assert sum(s["n_samples"] for s in manifest["shards"]) == 40

    assert export.verify_webdataset_shards(spark, out)["ok"]
    assert manifest["n_shards"] == 4 and manifest["n_shards_requested"] == 4

    # an extra tar on disk (stale larger export / injected file) must
    # fail verification — trainers glob *.tar (r12 review)
    stray = os.path.join(out, "shard-00099.tar")
    open(stray, "wb").write(b"not a tar")
    res = export.verify_webdataset_shards(spark, out)
    assert not res["ok"]
    assert any(m["file"] == "shard-00099.tar" for m in res["mismatches"])
    os.unlink(stray)
    assert export.verify_webdataset_shards(spark, out)["ok"]

    back = export.read_webdataset_shards(spark, out)
    txt = {r.key: bytes(r.content).decode() for r in back.filter("ext = 'txt'").collect()}
    assert txt["7"] == "text of doc 7" and len(txt) == 40
    js = {r.key: json.loads(bytes(r.content)) for r in back.filter("ext = 'json'").collect()}
    assert js["3"]["lbl"] == 0 and js["3"]["source"] == "src"
    img = {r.key: bytes(r.content) for r in back.filter("ext = 'png'").collect()}
    assert img["11"] == b"11"

    # bit-reproducibility: same content + seed => identical tar bytes
    def tar_md5s(d):
        return {
            f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
            for f in sorted(os.listdir(d))
            if f.endswith(".tar")
        }

    out2 = str(tmp_path / "wds2")
    export.write_webdataset_shards(df, out2, 4, "doc_id", cols, seed=7)
    assert tar_md5s(out) == tar_md5s(out2)

    # tamper one byte inside a member payload -> digest mismatch
    victim = os.path.join(out, manifest["shards"][0]["file"])
    blob = bytearray(open(victim, "rb").read())
    # flip a byte INSIDE a member payload (flipping tar padding would
    # not change any extracted payload and must not fail verification)
    at = bytes(blob).index(b"text of doc")
    blob[at] ^= 0xFF
    open(victim, "wb").write(bytes(blob))
    res = export.verify_webdataset_shards(spark, out)
    assert not res["ok"] and res["mismatches"]

    import pytest

    with pytest.raises(ValueError):
        export.write_webdataset_shards(df, str(tmp_path / "x"), 0, "doc_id", cols)
    with pytest.raises(ValueError):
        export.write_webdataset_shards(df, str(tmp_path / "x"), 2, "doc_id", {})
    with pytest.raises(ValueError):
        export.write_webdataset_shards(
            df, str(tmp_path / "x"), 2, "doc_id", {"nope": "txt"}
        )


def test_webdataset_empty_bucket_consistency(spark, tmp_path):
    """r12 review: hash buckets a small corpus leaves empty write no
    tar — the manifest's n_shards must record the POPULATED count (the
    parquet path's convention) so a loader enumerating shard names
    never 404s, and verification stays green over the gap."""
    from pyspark.sql import functions as F

    from hyper_storage_spark.operators import export

    df = spark.range(5).select(
        F.col("id").alias("doc_id"),
        F.col("id").cast("string").alias("text"),
    )
    out = str(tmp_path / "gaps")
    manifest = export.write_webdataset_shards(df, out, 16, "doc_id", {"text": "txt"}, seed=1)
    assert manifest["n_shards"] == len(manifest["shards"]) <= 5
    assert manifest["n_shards_requested"] == 16
    assert sum(s["n_samples"] for s in manifest["shards"]) == 5
    assert export.verify_webdataset_shards(spark, out)["ok"]


def test_webdataset_ships_real_png_payloads(spark, tmp_path):
    """End-to-end multimodal delivery: REAL PNG bytes (media_codecs
    encoder) ride a WebDataset shard and decode back pixel-for-pixel
    after the tar round-trip — the exporter must be byte-transparent
    for binary members, and verification must hold over them."""
    from pyspark.sql import functions as F

    from hyper_storage_spark.operators import export
    from hyper_storage_spark.operators.media_codecs import png_decode, png_encode

    def px(seed):  # 4x3 grayscale ramp, distinct per doc
        return bytes((seed * 7 + i * 13) % 251 for i in range(12))

    rows = [(i, f"caption {i}", png_encode(px(i), 4, 3)) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string, img binary")
    out = str(tmp_path / "wdspng")
    export.write_webdataset_shards(
        df, out, 3, "doc_id", {"text": "txt", "img": "png"}, seed=1
    )
    assert export.verify_webdataset_shards(spark, out)["ok"]

    back = export.read_webdataset_shards(spark, out)
    pngs = {r.key: bytes(r.content) for r in back.filter("ext = 'png'").collect()}
    assert len(pngs) == 12
    for i in range(12):
        w, h, ch, pixels = png_decode(pngs[str(i)])
        assert (w, h, ch) == (4, 3, 1)
        assert bytes(pixels) == px(i)


def test_webdataset_rejects_duplicate_keys(spark, tmp_path):
    """ADVICE r10: duplicate sample keys would produce duplicate
    {key}.{ext} tar members (loaders merge them into corrupt samples)
    and make the 'bit-reproducible' digest depend on pandas' incidental
    order — the export must refuse up front, naming offenders."""
    import pytest

    from hyper_storage_spark.operators import export as ex

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (1, "c")], "k long, text string"
    )
    with pytest.raises(ValueError, match="duplicate") as ei:
        ex.write_webdataset_shards(
            df, str(tmp_path / "wds_dup"), n_shards=1, key_col="k",
            columns={"text": "txt"},
        )
    assert "'1'" in str(ei.value)
    # unique keys still export fine
    ok = ex.write_webdataset_shards(
        df.filter("text != 'c'"), str(tmp_path / "wds_ok"), n_shards=1,
        key_col="k", columns={"text": "txt"},
    )
    assert sum(sh["n_samples"] for sh in ok["shards"]) == 2


def test_jsonl_read_does_not_mutate_caller_schema(spark, tmp_path):
    """review r12: StructType.add mutates in place — a reused schema
    object must not grow a phantom _corrupt_record field (the second
    read then died on the reserved-name check)."""
    from pyspark.sql import types as T

    from hyper_storage_spark.sources.jsonl import read_jsonl

    p = str(tmp_path / "a.jsonl")
    open(p, "w").write('{"x": 1}\n{"x": 2}\n')
    schema = T.StructType([T.StructField("x", T.LongType())])
    clean, quarantine = read_jsonl(spark, p, schema)
    assert clean.count() == 2 and quarantine.count() == 0
    assert [f.name for f in schema.fields] == ["x"]
    clean2, _ = read_jsonl(spark, p, schema)  # same object, second read
    assert clean2.count() == 2
