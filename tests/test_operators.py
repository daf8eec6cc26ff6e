"""Pipeline operators: dedup/similarity/text/multimodal/skew invariants
beyond the oracle comparisons (recall, determinism, plumbing shapes)."""

from pyspark.sql import functions as F

from hyper_storage_spark.operators import dedup, multimodal, similarity, skew, text
from hyper_storage_spark.sources import load_table


def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_minhash_lsh_recall_vs_exact(spark, sf_dir):
    d = docs(spark, sf_dir)
    exact = {
        (r.a_id, r.b_id)
        for r in dedup.ngram_jaccard_pairs(d, threshold=0.5).collect()
    }
    lsh = {(r.a_id, r.b_id) for r in dedup.minhash_lsh_pairs(d, threshold=0.5).collect()}
    assert lsh <= exact  # verify step guarantees precision 1.0
    if exact:
        assert len(lsh) / len(exact) >= 0.9  # banded-LSH recall


def test_simhash_deterministic(spark, sf_dir):
    d = docs(spark, sf_dir)
    a = sorted((r.a_id, r.b_id, r.hamming) for r in dedup.simhash_pairs(d).collect())
    b = sorted((r.a_id, r.b_id, r.hamming) for r in dedup.simhash_pairs(d).collect())
    assert a == b and len(a) > 0


def test_exact_duplicates_on_crafted_dups(spark):
    rows = [(1, "same text here"), (2, "same text here"), (3, "unique text")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.exact_duplicates(d).collect()
    assert len(out) == 1 and out[0].canonical_doc_id == 1 and out[0].dup_count == 2


def test_lsh_bucket_finds_clustered_neighbors(spark):
    # random 64-dim vectors are near-orthogonal (LSH recall is
    # meaningless there); craft tight clusters — close vectors agree on
    # hyperplane signs with overwhelming probability
    import random

    rnd = random.Random(7)
    rows = []
    for cluster in range(5):
        base = [rnd.gauss(0, 1) for _ in range(64)]
        for j in range(10):
            vec = [b + rnd.gauss(0, 0.01) for b in base]
            rows.append((cluster * 10 + j, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.lsh_bucket_topk(emb, [0, 10, 20], k=5, n_planes=6)
    rows_out = out.collect()
    got = {(r.query_id, r.neighbor_id) for r in rows_out}
    # every query's neighbors are exactly cluster-mates (k of the 9)
    for q in (0, 10, 20):
        neighbors = {b for a, b in got if a == q}
        assert len(neighbors) == 5
        assert all(q <= b < q + 10 for b in neighbors), (q, sorted(neighbors))
    # and cosine within a cluster is ≈1
    assert min(r.cosine for r in rows_out) > 0.99


def test_embedding_lsh_recall_vs_exact(spark):
    """The bucketed near-dup path must recover ≥90% of the exact
    all-pairs result at the near-dup threshold (sf0.01's planted pairs
    sit at cosine ≈ 0.45-0.51 — near the random-pair baseline, which is
    the adversarial case for hyperplane LSH)."""
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    exact = {(r.a_id, r.b_id) for r in dedup.embedding_cosine_pairs(emb, 0.45).collect()}
    lsh = {(r.a_id, r.b_id) for r in dedup.embedding_lsh_pairs(emb, 0.45).collect()}
    assert lsh <= exact  # exact-cosine verify ⇒ precision 1.0
    assert exact and len(lsh) / len(exact) >= 0.9


def test_embedding_lsh_plan_has_no_all_pairs_join(spark, sf_dir):
    """The scale guarantee: candidate generation joins on
    (table_id, signature) buckets — never a BroadcastNestedLoopJoin /
    CartesianProduct over the corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    plan = dedup.embedding_lsh_pairs(emb, 0.45)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ann_multiprobe_recall_vs_exact(spark):
    """Multi-table + Hamming-1 probing must hold recall ≥ 0.9 against
    the exact top-k on the real test vectors (top-10 cosines ≈ 0.3)."""
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = {(r.query_id, r.neighbor_id) for r in similarity.cosine_topk(emb, qids, k=10).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity.lsh_bucket_topk(emb, qids, k=10).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.9


def test_approx_recall_holds_across_seeds(spark):
    """The recall pins must not be luck of the default seed: the LSH
    bucket ANN, IVF ANN, and embedding-LSH dedup hold their floors
    under three different hash/centroid seeds (the gate's contract
    rows run the default seed; this is the evidence the bound is a
    property of the design, not one draw)."""
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact_knn = {
        (r.query_id, r.neighbor_id) for r in similarity.cosine_topk(emb, qids, k=10).collect()
    }
    exact_pairs = {(r.a_id, r.b_id) for r in dedup.embedding_cosine_pairs(emb, 0.45).collect()}
    for seed in (13, 42, 99):
        lsh = {
            (r.query_id, r.neighbor_id)
            for r in similarity.lsh_bucket_topk(emb, qids, k=10, seed=seed).collect()
        }
        assert len(exact_knn & lsh) / len(exact_knn) >= 0.9, ("lsh_bucket", seed)
        ivf = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ivf_topk(
                emb, qids, k=10, n_cells=16, n_probe=8, seed=seed
            ).collect()
        }
        assert len(exact_knn & ivf) / len(exact_knn) >= 0.7, ("ivf", seed)
        pairs = {
            (r.a_id, r.b_id) for r in dedup.embedding_lsh_pairs(emb, 0.45, seed=seed).collect()
        }
        assert pairs <= exact_pairs, ("embedding_lsh precision", seed)
        assert len(pairs) / len(exact_pairs) >= 0.9, ("embedding_lsh recall", seed)


def test_cdc_chunking_is_shift_resistant(spark):
    """The defining property of content-defined chunking: prepending
    text to a document must leave most downstream chunk hashes intact
    (fixed-size chunking would shift every boundary and share ~0)."""
    import random

    rnd = random.Random(11)
    words = ["alpha", "beta", "gamma", "delta", "run", "fast", "slow", "deep"]
    base = " ".join(rnd.choice(words) for _ in range(400))
    shifted = "NEW PREFIX INSERTED HERE " + base
    d = spark.createDataFrame([(0, base), (1, shifted)], "doc_id long, text string")
    ch = dedup.cdc_chunk_hashes(d).collect()
    h0 = {r.chunk_hash for r in ch if r.doc_id == 0}
    h1 = {r.chunk_hash for r in ch if r.doc_id == 1}
    assert len(h0) > 5  # the doc actually chunked
    overlap = len(h0 & h1) / len(h0)
    assert overlap >= 0.5, f"shift resistance lost: {overlap:.2f}"
    # determinism: re-running produces identical chunking
    again = {(r.doc_id, r.chunk_idx, r.chunk_hash) for r in dedup.cdc_chunk_hashes(d).collect()}
    assert again == {(r.doc_id, r.chunk_idx, r.chunk_hash) for r in ch}
    # chunk lengths cover the document exactly and respect the max
    n0 = sum(r.chunk_len for r in ch if r.doc_id == 0)
    assert n0 == len(base.encode())
    assert all(r.chunk_len <= 256 for r in ch)


def test_cdc_shared_chunk_pairs_finds_partial_overlap(spark):
    """Two long documents sharing a large middle section must pair up
    via shared chunks even though their prefixes/suffixes differ —
    the long-document near-dup case n-gram Jaccard underweights."""
    import random

    rnd = random.Random(5)
    words = ["one", "two", "three", "four", "five", "six"]
    shared = " ".join(rnd.choice(words) for _ in range(300))
    a = "intro text only in a " + shared
    b = "completely different opening " + shared + " and a different tail"
    c = " ".join(rnd.choice(words) for _ in range(100))  # unrelated
    d = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "doc_id long, text string"
    )
    pairs = {(r.a_id, r.b_id): r.shared_chunks for r in dedup.cdc_shared_chunk_pairs(d).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 2
    assert all(k == (0, 1) for k in pairs), pairs


def test_ngram_jaccard_df_cap_drops_stop_shingles(spark):
    """A shingle shared by every document must not create the L² join
    blowup: with the df cap it is dropped from posting lists AND set
    sizes, and documents that share ONLY the stop-shingle pair up at
    jaccard computed over their distinctive shingles only."""
    stop = "the quick brown"  # one shared 3-shingle across all docs
    rows = [(i, f"the quick brown unique{i} word{i} tail{i} extra{i}") for i in range(50)]
    # two real near-dups sharing all their distinctive shingles
    rows += [(100, "alpha beta gamma delta epsilon zeta"), (101, "alpha beta gamma delta epsilon zeta")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.ngram_jaccard_pairs(d, threshold=0.5, max_df=10).collect()
    pairs = {(r.a_id, r.b_id) for r in out}
    assert (100, 101) in pairs  # true dups survive
    # the 50 stop-shingle-only docs produce zero of their 1225 possible pairs
    assert all(a == 100 for a, _ in pairs), pairs


def test_repetition_stats_values(spark):
    rows = [
        (0, "a b a b a b"),          # 2-grams: ab,ba,ab,ba,ab → 5 total, 2 distinct
        (1, "one two three four"),   # all distinct
        (2, "solo"),                 # shorter than n → NULL stats
        (3, "x x x x"),              # one repeated 2-gram: 3 total, 1 distinct
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text.with_repetition_stats(d, n=2).collect()}
    assert out[0].n_ngrams == 5 and out[0].dup_ngram_frac == 0.6
    assert out[0].top_ngram_frac == 0.6  # 'a b' appears 3/5
    assert out[1].dup_ngram_frac == 0.0 and out[1].top_ngram_frac == round(1 / 3, 6)
    assert out[2].n_ngrams is None and out[2].dup_ngram_frac is None
    assert out[3].dup_ngram_frac == round(2 / 3, 6) and out[3].top_ngram_frac == 1.0


def test_pii_redaction_counts_and_rewrites(spark):
    rows = [
        (0, "mail me at a.b+c@test.org or x@y.io today"),
        (1, "no pii here"),
        (2, "dup dup@d.com dup@d.com"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text.with_pii_redacted(d).collect()}
    assert out[0].n_emails == 2
    assert out[0].text_redacted == "mail me at [EMAIL] or [EMAIL] today"
    assert out[1].n_emails == 0 and out[1].text_redacted == "no pii here"
    assert out[2].n_emails == 2 and out[2].text_redacted == "dup [EMAIL] [EMAIL]"
    # multi-class (round 9): IPs and strict international phones
    rows2 = [
        (0, "server 192.168.0.1 then call +1-555-0100 or +44-020-7946"),
        (1, "version 1.2 costs 3.50 and 12345678 stays"),  # no false positives
        (2, "a@b.co at 10.0.0.1"),
    ]
    d2 = spark.createDataFrame(rows2, "doc_id long, text string")
    out2 = {r.doc_id: r for r in text.with_pii_redacted(d2).collect()}
    assert (out2[0].n_ipv4, out2[0].n_phones) == (1, 2)
    assert out2[0].text_redacted == "server [IPV4] then call [PHONE] or [PHONE]"
    assert (out2[1].n_emails, out2[1].n_ipv4, out2[1].n_phones) == (0, 0, 0)
    assert out2[1].text_redacted == rows2[1][1]
    assert out2[2].text_redacted == "[EMAIL] at [IPV4]"
    # overlap: counts must agree with the placeholders actually emitted
    # (the IP inside the email's local part is consumed by [EMAIL], so
    # it must NOT be counted as an IP)
    d3 = spark.createDataFrame([(0, "mail 1.2.3.4@example.com ok")], "doc_id long, text string")
    out3 = text.with_pii_redacted(d3).collect()[0]
    assert (out3.n_emails, out3.n_ipv4) == (1, 0)
    assert out3.text_redacted == "mail [EMAIL] ok"


def test_langid_accuracy_on_labeled_docs(spark, sf_dir):
    d = text.with_lang_id(docs(spark, sf_dir))
    scored = d.filter(F.col("lang") != "zh")  # no zh markers in the heuristic
    total = scored.count()
    # weak-but-real floor: the marker heuristic must beat random choice
    correct = scored.filter(F.col("lang_pred") == F.col("lang")).count()
    assert correct / total > 0.3


def test_multimodal_feature_shapes(spark, sf_dir):
    media = multimodal.attach_binary(docs(spark, sf_dir))
    feats = multimodal.extract_features(media, mode="fake")
    row = feats.first()
    assert len(row.features) == multimodal.FEATURE_DIM
    assert row.byte_len > 0
    assert abs(sum(row.features) - 1.0) < 0.01  # normalized histogram


def test_multimodal_video_real_path_rejects_non_bmff():
    import pytest

    # real mode on video bytes that aren't an ISO BMFF container fails
    # loudly (no silent fake fallback in real mode)...
    with pytest.raises(ValueError):
        multimodal._decode_real(b"bytes", "video/mp4")
    # ...and media types with no codec at all stay NotImplementedError
    with pytest.raises(NotImplementedError):
        multimodal._decode_real(b"bytes", "model/gltf")


def test_audio_features_on_alternating_signal(spark):
    """A square wave alternating ±64 around the 8-bit midpoint has
    rms exactly 0.5 and zcr exactly 1 (every adjacent pair crosses);
    a constant signal has zcr 0 — decoded through the real WAV
    codec, not computed from metadata."""
    from hyper_storage_spark.operators import media_codecs as mc
    from hyper_storage_spark.operators import multimodal

    square = mc.wav_encode([192, 64] * 50)  # (x-128)/128 = ±0.5
    flat = mc.wav_encode([200] * 40)
    media = spark.createDataFrame(
        [(0, "audio/wav", bytearray(square)), (1, "audio/wav", bytearray(flat)),
         (2, "image/png", bytearray(b"notaudio"))],
        "doc_id long, media_type string, payload binary",
    )
    out = {r.doc_id: r for r in multimodal.audio_features(media).collect()}
    assert out[0].n_samples == 100 and out[0].rms == 0.5 and out[0].zcr == 1.0
    assert out[1].zcr == 0.0 and abs(out[1].rms - 72 / 128) < 1e-12
    assert out[2].n_samples == -1 and out[2].rms == -1.0  # non-audio sentinel


def test_mp4_codec_round_trip():
    from hyper_storage_spark.operators import media_codecs as mc

    frames = [bytes((i * 31 + j) % 256 for j in range(48)) for i in range(5)]
    data = mc.mp4_encode(frames, 8, 6)
    w, h, out = mc.mp4_decode(data)
    assert (w, h) == (8, 6)
    assert out == frames
    # variable-size samples exercise the per-sample stsz table
    var = [b"abc", b"defgh", b"x" * 100]
    assert mc.mp4_decode(mc.mp4_encode(var, 4, 3))[2] == var
    import pytest

    with pytest.raises(ValueError):
        mc.mp4_decode(b"notanmp4" * 8)


def _rebuild_boxes(data, s, e, leaf_fn):
    """Re-emit the box sequence in [s, e): containers are rebuilt
    recursively (so their declared sizes stay correct after a child
    changes length); a leaf is replaced by leaf_fn(tag, start, end)
    when it returns bytes, else copied verbatim."""
    from hyper_storage_spark.operators import media_codecs as mc

    out = b""
    for t, body_s, box_e in mc._bmff_boxes(data, s, e):
        if t in mc._BMFF_CONTAINERS:
            out += mc._box(t, _rebuild_boxes(data, body_s, box_e, leaf_fn))
        else:
            rep = leaf_fn(t, body_s, box_e)
            out += data[body_s - 8 : box_e] if rep is None else rep
    return out


def _remux(data, audio_first=False, co64=False):
    """Rewrite an mp4_encode file: optionally prepend a minimal audio
    ('soun') trak to moov and/or convert stco → co64 — conforming
    layouts mp4_encode never emits but mp4_decode must handle. mdat
    offsets are absolute and moov sits after mdat in mp4_encode's
    layout, so a bigger moov never shifts them."""
    import struct

    from hyper_storage_spark.operators import media_codecs as mc

    def conv(tag, body_s, box_e):
        if tag == b"stco" and co64:
            (n,) = struct.unpack(">I", data[body_s + 4 : body_s + 8])
            offs = [
                struct.unpack(">I", data[body_s + 8 + i * 4 : body_s + 12 + i * 4])[0]
                for i in range(n)
            ]
            return mc._full_box(
                b"co64",
                0,
                0,
                struct.pack(">I", n) + b"".join(struct.pack(">Q", o) for o in offs),
            )
        return None

    moov_s, moov_e = mc._bmff_find(data, [b"moov"], 0, len(data))
    parts = b""
    for t, body_s, box_e in mc._bmff_boxes(data, moov_s, moov_e):
        if t == b"trak":
            if audio_first:
                hdlr = mc._full_box(
                    b"hdlr", 0, 0, struct.pack(">I4s", 0, b"soun") + b"\x00" * 12 + b"Sound\x00"
                )
                parts += mc._box(b"trak", mc._box(b"mdia", hdlr))
                audio_first = False
            parts += mc._box(b"trak", _rebuild_boxes(data, body_s, box_e, conv))
        else:
            parts += data[body_s - 8 : box_e]
    return data[: moov_s - 8] + mc._box(b"moov", parts)


def test_mp4_decode_selects_vide_trak_and_co64():
    """A conforming file with an audio-first trak must yield the VIDEO
    samples (not silently return audio), and 64-bit co64 chunk offsets
    must demux identically to stco."""
    from hyper_storage_spark.operators import media_codecs as mc

    frames = [bytes((i * 7 + j) % 256 for j in range(48)) for i in range(4)]
    data = mc.mp4_encode(frames, 8, 6)
    for audio_first in (False, True):
        for co64 in (False, True):
            w, h, out = mc.mp4_decode(_remux(data, audio_first=audio_first, co64=co64))
            assert (w, h) == (8, 6)
            assert out == frames
    # a file with no video trak at all fails loudly
    import pytest

    no_video = _remux(data, audio_first=True)
    moov_s, _ = mc._bmff_find(no_video, [b"moov"], 0, len(no_video))
    with pytest.raises(ValueError, match="vide"):
        # strip the video trak (the one carrying a tkhd in this
        # construction), leaving an audio-only moov
        for t, s, e in mc._bmff_boxes(no_video, moov_s, len(no_video)):
            if t == b"trak":
                try:
                    mc._bmff_find(no_video, [b"tkhd"], s, e)
                except ValueError:
                    continue
                stripped = no_video[: s - 8] + no_video[e:]
                # fix moov size header
                import struct as _st

                new_sz = len(stripped) - (moov_s - 8)
                stripped = (
                    stripped[: moov_s - 8]
                    + _st.pack(">I", new_sz)
                    + stripped[moov_s - 4 :]
                )
                mc.mp4_decode(stripped)
                break


def test_sample_frames_real_demux(spark, sf_dir):
    """Real mode returns the ACTUAL stored samples out of the BMFF
    container, not byte slices of the file."""
    media = multimodal.attach_media(docs(spark, sf_dir).limit(30))
    frames = multimodal.sample_frames(media, n_frames=3, mode="real").collect()
    assert frames
    for r in frames:
        assert r.doc_id % 3 == 2
        g = r.doc_id % 256
        assert bytes(r.frame) == bytes([g]) * 48  # one full stored 8x6 frame


def test_png_codec_round_trip():
    from hyper_storage_spark.operators import media_codecs as mc

    # grayscale and RGB, non-trivial pixel patterns
    px = bytes((x * 7 + 3) % 256 for x in range(12 * 9))
    data = mc.png_encode(px, 12, 9, 1)
    w, h, c, out = mc.png_decode(data)
    assert (w, h, c) == (12, 9, 1) and bytes(out) == px
    rgb = bytes((x * 31 + 5) % 256 for x in range(6 * 4 * 3))
    w, h, c, out = mc.png_decode(mc.png_encode(rgb, 6, 4, 3))
    assert (w, h, c) == (6, 4, 3) and bytes(out) == rgb


def test_png_decoder_unfilters_all_filter_types():
    # craft an image whose rows are written with filters 1-4 by hand
    import struct
    import zlib

    from hyper_storage_spark.operators import media_codecs as mc

    px = bytes((x * 13 + 1) % 256 for x in range(4 * 5))
    stride = 4
    rows = [px[y * stride : (y + 1) * stride] for y in range(5)]
    raw = bytearray()
    prev = bytes(stride)
    for ftype, row in zip([0, 1, 2, 3, 4], rows):
        raw.append(ftype)
        for i, b in enumerate(row):
            left = row[i - 1] if i >= 1 else 0
            up = prev[i]
            ul = prev[i - 1] if i >= 1 else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) >> 1, 4: mc._paeth(left, up, ul)}[ftype]
            raw.append((b - pred) & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 0, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + mc._chunk(b"IHDR", ihdr)
        + mc._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + mc._chunk(b"IEND", b"")
    )
    w, h, c, out = mc.png_decode(data)
    assert (w, h, c) == (4, 5, 1) and bytes(out) == px


def test_wav_codec_round_trip():
    from hyper_storage_spark.operators import media_codecs as mc

    samples8 = [(i * 11) % 256 for i in range(100)]
    rate, width, out = mc.wav_decode(mc.wav_encode(samples8, sample_width=1))
    assert (rate, width, out) == (8000, 1, samples8)
    samples16 = [(i * 331 - 16000) % 32767 - 100 for i in range(50)]
    _, width, out = mc.wav_decode(mc.wav_encode(samples16, sample_rate=16000, sample_width=2))
    assert width == 2 and out == samples16


def test_attach_media_real_decode_round_trip(spark, sf_dir):
    media = multimodal.attach_media(docs(spark, sf_dir).limit(30))
    stats = {r.doc_id: r for r in multimodal.image_stats(media).collect()}
    for doc_id, r in stats.items():
        if doc_id % 3 == 0:
            assert (r.img_w, r.img_h, r.n_px) == (12, 9, 108)
            assert r.mean_px == float(doc_id % 256)  # uniform image
        else:
            assert r.img_w == -1 and r.mean_px == -1.0


def test_real_resize_preserves_uniform_pixels(spark, sf_dir):
    media = multimodal.attach_media(docs(spark, sf_dir).limit(30))
    resized = multimodal.resize_images(media, width=8, height=8, mode="real")
    stats = {r.doc_id: r for r in multimodal.image_stats(resized).collect()}
    for doc_id, r in stats.items():
        if doc_id % 3 == 0:
            assert (r.img_w, r.img_h, r.n_px) == (8, 8, 64)
            assert r.mean_px == float(doc_id % 256)


def test_real_resize_nearest_neighbor_exact():
    from hyper_storage_spark.operators import media_codecs as mc

    px = bytes(range(16))  # 4x4 gradient
    out = mc.resize_nearest(px, 4, 4, 1, 2, 2)
    # NN picks pixel ((y*4)//2, (x*4)//2) = rows/cols 0 and 2
    assert bytes(out) == bytes([0, 2, 8, 10])


def test_real_features_on_real_media(spark, sf_dir):
    media = multimodal.attach_media(docs(spark, sf_dir).limit(30))
    feats = {r.doc_id: r for r in multimodal.extract_features(media, mode="auto").collect()}
    for doc_id, r in feats.items():
        g = doc_id % 256
        # image: 12*9 px; audio: 120 samples; video: 6 frames * 48 bytes
        expected = {0: 108, 1: 120, 2: 288}[doc_id % 3]
        assert r.n_samples == expected
        assert r.features[g // 16] == 1.0  # uniform intensity → one hot bin


def test_salted_aggregate_matches_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "qty", F.col("l_quantity").cast("decimal(12,4)")
    )
    direct = {
        r.l_returnflag: (r.s, r.n)
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("qty").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    salted = {
        r.l_returnflag: (r.sum_qty, r.n)
        for r in skew.salted_aggregate(
            li, ["l_returnflag"], sum_cols=["qty"], salt_buckets=8
        ).collect()
    }
    assert salted == direct


def test_salt_is_deterministic_across_reevaluation(spark, sf_dir):
    """The salt must be a pure function of row content: an
    attempt-dependent salt (partition id / monotonic id) re-buckets
    rows when a map stage is partially retried after a shuffle fetch
    failure, and reducers holding a mix of attempts double-count or
    drop rows (SPARK-23207 class). Re-evaluating the same input —
    including through a repartition that scrambles partition ids and
    row order — must produce the identical doc_id→salt mapping."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in li.columns]), F.lit(16))
    base = sorted(tuple(r) for r in li.withColumn("s", salt).collect())
    scrambled = li.repartition(7, "l_returnflag").sortWithinPartitions("l_quantity")
    again = sorted(tuple(r) for r in scrambled.withColumn("s", salt).collect())
    assert base == again
    # and the operator's own output column set carries no salt residue
    out = skew.salted_aggregate(li, ["l_returnflag"], sum_cols=["l_quantity"], salt_buckets=8)
    assert "__salt" not in out.columns


def test_asof_join_semantics(spark):
    from hyper_storage_spark.operators import timeseries

    left = spark.createDataFrame(
        [("u1", 100, "c1"), ("u1", 200, "c2"), ("u2", 50, "c3")],
        "k string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [("u1", 100, 1.0), ("u1", 150, 2.0), ("u2", 60, 9.0)],
        "k string, ts long, v double",
    )
    out = {
        (r.k, r.ts): r.v
        for r in timeseries.asof_join(left, right, on=["k"], right_cols=["v"], how="left").collect()
    }
    assert out[("u1", 100)] == 1.0  # inclusive: same-ts right row matches
    assert out[("u1", 200)] == 2.0  # latest preceding
    assert out[("u2", 50)] is None  # no preceding right row
    inner = timeseries.asof_join(left, right, on=["k"], right_cols=["v"]).collect()
    assert len(inner) == 2  # inner drops the unmatched left row


def test_asof_join_directions(spark):
    from hyper_storage_spark.operators import timeseries

    left = spark.createDataFrame(
        [("u1", 100), ("u1", 119), ("u1", 121), ("u1", 300), ("u2", 10)],
        "k string, ts long",
    )
    right = spark.createDataFrame(
        [("u1", 90, 1.0), ("u1", 140, 2.0), ("u1", 100, 3.0), ("u2", 5, 9.0)],
        "k string, ts long, v double",
    )

    def run(direction):
        return {
            (r.k, r.ts): r.v
            for r in timeseries.asof_join(
                left, right, on=["k"], right_cols=["v"], how="left", direction=direction
            ).collect()
        }

    back = run("backward")
    assert back[("u1", 100)] == 3.0  # inclusive same-ts
    assert back[("u1", 119)] == 3.0 and back[("u1", 121)] == 3.0
    assert back[("u1", 300)] == 2.0

    fwd = run("forward")
    assert fwd[("u1", 100)] == 3.0  # inclusive same-ts
    assert fwd[("u1", 119)] == 2.0 and fwd[("u1", 121)] == 2.0
    assert fwd[("u1", 300)] is None  # nothing at or after
    assert fwd[("u2", 10)] is None

    near = run("nearest")
    assert near[("u1", 119)] == 3.0  # 19 back vs 21 forward
    assert near[("u1", 121)] == 2.0  # 19 forward vs 21 back
    assert near[("u1", 300)] == 2.0  # only backward exists
    assert near[("u2", 10)] == 9.0
    # exact tie resolves backward (pandas merge_asof convention)
    tie_left = spark.createDataFrame([("u1", 120)], "k string, ts long")
    tie = timeseries.asof_join(
        tie_left, right, on=["k"], right_cols=["v"], direction="nearest"
    ).collect()
    assert tie[0].v == 3.0  # |120-100| == |140-120| → backward wins

    import pytest

    with pytest.raises(ValueError, match="direction"):
        timeseries.asof_join(left, right, on=["k"], right_cols=["v"], direction="both")

    # a NULL-timestamp right row matches NOTHING in any direction
    # (merge_asof semantics, review r12): before the fix it sorted
    # nulls-first in the backward scan and phantom-matched every left
    # row until a real right row superseded it
    right_null = spark.createDataFrame(
        [("u2", None, 7.0), ("u2", 5, 9.0)], "k string, ts long, v double"
    )
    for direction, want in (("backward", 9.0), ("forward", None), ("nearest", 9.0)):
        got = {
            (r.k, r.ts): r.v
            for r in timeseries.asof_join(
                left, right_null, on=["k"], right_cols=["v"], how="left",
                direction=direction,
            ).collect()
        }
        assert got[("u2", 10)] == want, direction  # the real row or nothing
        assert all(v != 7.0 for v in got.values()), direction  # never the phantom


def test_hash_split_properties(spark):
    """The properties a corpus split lives and dies by: exhaustive and
    disjoint by construction, deterministic across re-evaluation AND
    across partitioning, and STABLE under corpus growth — rows keep
    their split when new rows arrive (no re-shuffling of old data
    between train and test, which would leak)."""
    from hyper_storage_spark.operators import sampling

    docs = spark.range(5000).select(F.col("id").alias("doc_id"))
    frac = {"train": 0.8, "val": 0.1, "test": 0.1}
    s1 = {r.doc_id: r.split for r in sampling.hash_split(docs, "doc_id", frac).collect()}
    assert len(s1) == 5000  # exhaustive, one split per row
    counts = {}
    for v in s1.values():
        counts[v] = counts.get(v, 0) + 1
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.03
    # deterministic across re-evaluation and partition scrambling
    scrambled = docs.repartition(13)
    s2 = {
        r.doc_id: r.split
        for r in sampling.hash_split(scrambled, "doc_id", frac).collect()
    }
    assert s1 == s2
    # stable under growth: the first 1000 ids keep their assignments
    small = spark.range(1000).select(F.col("id").alias("doc_id"))
    s3 = {r.doc_id: r.split for r in sampling.hash_split(small, "doc_id", frac).collect()}
    assert all(s1[k] == v for k, v in s3.items())
    # a different salt reshuffles
    s4 = {
        r.doc_id: r.split
        for r in sampling.hash_split(docs, "doc_id", frac, salt=1).collect()
    }
    assert s4 != s1
    import pytest

    with pytest.raises(ValueError, match="sum to 1"):
        sampling.hash_split(docs, "doc_id", {"a": 0.5, "b": 0.4})


def test_seeded_shuffle_is_deterministic_permutation(spark):
    from hyper_storage_spark.operators import sampling

    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    a = [r.doc_id for r in sampling.seeded_shuffle(df, "doc_id", seed=1).collect()]
    b = [
        r.doc_id
        for r in sampling.seeded_shuffle(df.repartition(7), "doc_id", seed=1).collect()
    ]
    c = [r.doc_id for r in sampling.seeded_shuffle(df, "doc_id", seed=2).collect()]
    # permutation of the corpus, identical under re-partitioning,
    # different (but still a permutation) under a different seed
    assert sorted(a) == list(range(300))
    assert a == b
    assert sorted(c) == list(range(300)) and c != a
    # hash order is not insertion order
    assert a != list(range(300))


def test_seeded_shuffle_head_is_take_ordered(spark, sf_dir):
    from hyper_storage_spark.operators import sampling
    from hyper_storage_spark.sources import load_table

    df = sampling.seeded_shuffle(
        load_table(spark, sf_dir, "documents").select("doc_id"), "doc_id", seed=42
    ).limit(100)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no global sort for a head sample


def test_stratified_sample_rates(spark):
    from hyper_storage_spark.operators import sampling

    df = spark.range(10000).select(
        F.col("id"), (F.col("id") % 2 == 0).cast("string").alias("s")
    )
    out = sampling.stratified_sample(df, "s", {"true": 0.5, "false": 0.1}, seed=3)
    counts = {r.s: r.n for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["true"] / 5000 - 0.5) < 0.05
    assert abs(counts["false"] / 5000 - 0.1) < 0.05
    # dropped stratum convention: missing keys sample at 0
    none_sampled = sampling.stratified_sample(df, "s", {"true": 0.5}, seed=3)
    assert none_sampled.filter(F.col("s") == "false").count() == 0


def test_interval_overlap_join_exact_and_counted_once(spark):
    """Hand-built intervals: overlap pairs must match the brute-force
    inequality join EXACTLY (half-open bounds, touching endpoints
    excluded) and each pair must appear once even when the pair shares
    many buckets (the first-shared-bucket dedup)."""
    from hyper_storage_spark.operators import timeseries

    a = spark.createDataFrame(
        [(0, 0.0, 100.0), (1, 5.0, 6.0), (2, 10.0, 20.0), (3, 30.0, 31.0)],
        "aid long, a_lo double, a_hi double",
    )
    b = spark.createDataFrame(
        [(10, 50.0, 60.0), (11, 19.9, 30.0), (12, 31.0, 40.0), (13, 5.5, 5.7)],
        "bid long, b_lo double, b_hi double",
    )
    out = timeseries.interval_overlap_join(
        a, b, "a_lo", "a_hi", "b_lo", "b_hi", bucket_width=7.0
    ).collect()
    pairs = sorted((r.aid, r.bid) for r in out)
    assert len(pairs) == len(set(pairs)), "pair emitted more than once"
    brute = sorted(
        (ra.aid, rb.bid)
        for ra in a.collect()
        for rb in b.collect()
        if ra.a_lo < rb.b_hi and rb.b_lo < ra.a_hi
    )
    # aid=0 spans 15 buckets and overlaps all four b intervals once
    # each; (3,12) touch at 31.0 and must NOT pair (half-open)
    assert pairs == brute
    assert (3, 12) not in pairs and (0, 13) in pairs
    plan = timeseries.interval_overlap_join(
        a, b, "a_lo", "a_hi", "b_lo", "b_hi", bucket_width=7.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_gapfill_locf_semantics(spark):
    from hyper_storage_spark.operators import timeseries

    agg = spark.createDataFrame(
        [("a", 1, 10), ("a", 4, 40), ("b", 7, 70)],
        "k string, bucket long, n long",
    )
    out = timeseries.gapfill(
        agg, keys=["k"], bucket_col="bucket", step="1", value_cols=["n"]
    ).collect()
    rows = {(r.k, r.bucket): (r.n, r.filled) for r in out}
    # a's grid densifies 1..4; gaps carry 10 forward and flag filled
    assert rows[("a", 1)] == (10, False)
    assert rows[("a", 2)] == (10, True)
    assert rows[("a", 3)] == (10, True)
    assert rows[("a", 4)] == (40, False)
    # b has a single bucket: no gaps, nothing invented outside its span
    assert rows[("b", 7)] == (70, False)
    assert len(rows) == 5
    # null mode leaves gaps NULL
    nulls = {
        (r.k, r.bucket): r.n
        for r in timeseries.gapfill(
            agg, keys=["k"], bucket_col="bucket", step="1", value_cols=["n"], how="null"
        ).collect()
    }
    assert nulls[("a", 2)] is None and nulls[("a", 4)] == 40
    # linear interpolation: gap values lie on the line between the
    # surrounding observations
    lin = {
        (r.k, r.bucket): r.n
        for r in timeseries.gapfill(
            agg, keys=["k"], bucket_col="bucket", step="1", value_cols=["n"], how="linear"
        ).collect()
    }
    assert lin[("a", 1)] == 10.0 and lin[("a", 4)] == 40.0  # observations keep values
    assert lin[("a", 2)] == 20.0 and lin[("a", 3)] == 30.0  # on the line
    assert lin[("b", 7)] == 70.0
    import pytest

    with pytest.raises(ValueError, match="locf"):
        timeseries.gapfill(agg, ["k"], "bucket", "1", ["n"], how="spline")


def test_asof_join_validates_how_and_collisions(spark):
    import pytest

    from hyper_storage_spark.operators import timeseries

    left = spark.createDataFrame([("u1", 100, "c1")], "k string, ts long, tag string")
    right = spark.createDataFrame([("u1", 90, 1.0)], "k string, ts long, v double")
    with pytest.raises(ValueError, match="how"):
        timeseries.asof_join(left, right, on=["k"], right_cols=["v"], how="outer")
    # right payload colliding with a left payload column
    right2 = spark.createDataFrame([("u1", 90, "x")], "k string, ts long, tag string")
    with pytest.raises(ValueError, match="collide"):
        timeseries.asof_join(left, right2, on=["k"], right_cols=["tag"])
    # reserved internal names
    left3 = spark.createDataFrame([("u1", 100, 1)], "k string, ts long, __r long")
    with pytest.raises(ValueError, match="reserved"):
        timeseries.asof_join(left3, right, on=["k"], right_cols=["v"])


def test_embedding_cosine_all_pairs_guard(spark):
    import pytest

    emb = spark.range(10).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(seed=1), F.rand(seed=2)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="all-pairs"):
        dedup.embedding_cosine_pairs(emb, max_rows=5)
    # under the cap it runs
    dedup.embedding_cosine_pairs(emb, max_rows=10).collect()


def test_asof_join_plan_has_no_join(spark, sf_dir):
    # all_specs: the entry rotated to the EXTRA tier (r10 rotation #6)
    # and plan guarantees are tier-independent
    from hyper_storage_spark.queries import all_specs

    plan = all_specs()["ts_asof_join"].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union + window, never a join
    assert "Window" in plan


def test_range_join_plan_is_equi_hash_join(spark, sf_dir):
    # all_specs: the entry rotated to the EXTRA tier (r7 third pass)
    # and plan guarantees are tier-independent
    from hyper_storage_spark.queries import all_specs

    plan = all_specs()["ts_range_join"].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan  # bucketed equi join


def test_hypertable_rollup_composes_exactly(spark, sf_dir):
    """Coarser levels re-aggregated from finer partials must equal a
    direct aggregation at that grain."""
    from pyspark.sql import functions as F

    from hyper_storage_spark.operators import timeseries
    from hyper_storage_spark.sources import load_table

    e = load_table(spark, sf_dir, "events").select(
        "ts", F.col("value").cast("decimal(18,6)").alias("v")
    )
    rolled = {
        (r.resolution, r.bucket_start): (r.n, r.total)
        for r in timeseries.hypertable_rollup(e, "ts", "v").collect()
    }
    direct_week = {
        ("week", r.b): (r.n, r.total)
        for r in e.groupBy(F.date_trunc("week", "ts").alias("b"))
        .agg(F.count("*").alias("n"), F.sum("v").alias("total"))
        .collect()
    }
    for k, v in direct_week.items():
        assert rolled[k] == v


def test_ivf_recall_vs_exact(spark):
    """IVF with 8-of-16-cell probing holds recall ≥ 0.9 against exact
    top-10 on the real test vectors (fixed KMeans seed)."""
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = {(r.query_id, r.neighbor_id) for r in similarity.cosine_topk(emb, qids, k=10).collect()}
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(emb, qids, k=10, n_cells=16, n_probe=8).collect()
    }
    assert len(exact & ivf) / len(exact) >= 0.9


def test_ivf_finds_clustered_neighbors_with_single_probe(spark):
    """On genuinely clustered data (the embedding common case) IVF
    cells align with clusters: one probe recovers the full cluster."""
    import random

    rnd = random.Random(11)
    rows = []
    for cluster in range(5):
        base = [rnd.gauss(0, 1) for _ in range(64)]
        for j in range(10):
            rows.append((cluster * 10 + j, [b + rnd.gauss(0, 0.01) for b in base]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.ivf_topk(emb, [0, 10, 20], k=5, n_cells=5, n_probe=1)
    got = {(r.query_id, r.neighbor_id) for r in out.collect()}
    for q in (0, 10, 20):
        neighbors = {b for a, b in got if a == q}
        assert len(neighbors) == 5 and all(q <= b < q + 10 for b in neighbors)


def test_multimodal_resize_contract(spark, sf_dir):
    media = multimodal.attach_binary(docs(spark, sf_dir))
    out = multimodal.resize_images(media, width=8, height=8).collect()
    for r in out:
        if r.media_type == "image/png":
            assert r.width == 8 and r.height == 8 and len(r.payload) == 64
        else:
            assert r.width == -1 and r.height == -1  # pass-through


def test_multimodal_frame_sampling_shape(spark, sf_dir):
    media = multimodal.attach_binary(docs(spark, sf_dir))
    frames = multimodal.sample_frames(media, n_frames=4, frame_bytes=64)
    rows = frames.collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, fr in per_doc.items():
        assert doc_id % 3 == 2  # only videos
        assert sorted(f.frame_idx for f in fr) == [0, 1, 2, 3]
        assert all(0 < len(f.frame) <= 64 for f in fr)


def test_salted_join_matches_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    direct = sorted(
        (r.l_orderkey, r.l_partkey, r.p_brand)
        for r in li.join(p, li.l_partkey == p.p_partkey).collect()
    )
    salted = sorted(
        (r.l_orderkey, r.l_partkey, r.p_brand)
        for r in skew.salted_join(
            li.withColumnRenamed("l_partkey", "k"),
            p.withColumnRenamed("p_partkey", "k"),
            on=["k"],
            salt_buckets=8,
        )
        .withColumnRenamed("k", "l_partkey")
        .collect()
    )
    assert salted == direct and len(direct) > 0


def test_asof_join_does_not_stitch_null_payload_columns(spark):
    """The match is a whole right ROW: a NULL payload column in the
    matched row must come through as NULL, never inherit an older
    row's value — and an all-NULL-payload match still counts as a
    match for how='inner'."""
    from hyper_storage_spark.operators import timeseries

    left = spark.createDataFrame([("k", 30)], "k string, ts long")
    right = spark.createDataFrame(
        [("k", 10, 1.0, None), ("k", 20, None, 5.0)],
        "k string, ts long, v double, w double",
    )
    r = timeseries.asof_join(left, right, on=["k"], right_cols=["v", "w"]).collect()
    assert len(r) == 1 and r[0].v is None and r[0].w == 5.0  # the ts=20 ROW
    # all-null payload row still matches
    left2 = spark.createDataFrame([("z", 30)], "k string, ts long")
    right2 = spark.createDataFrame([("z", 10, None)], "k string, ts long, v double")
    r2 = timeseries.asof_join(left2, right2, on=["k"], right_cols=["v"]).collect()
    assert len(r2) == 1 and r2[0].v is None


def test_hypertable_rollup_rejects_non_nesting_resolutions(spark, sf_dir):
    import pytest as _pytest

    from hyper_storage_spark.operators import timeseries
    from hyper_storage_spark.sources import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "events").select(
        "ts", F.col("value").cast("decimal(18,6)").alias("v")
    )
    with _pytest.raises(ValueError, match="not unions"):
        timeseries.hypertable_rollup(e, "ts", "v", resolutions=("day", "week", "month"))
    with _pytest.raises(ValueError, match="not unions"):
        timeseries.hypertable_rollup(e, "ts", "v", resolutions=("week", "month"))
    # nesting chains still fine
    timeseries.hypertable_rollup(e, "ts", "v", resolutions=("hour", "day", "month", "year"))
    # review r12: a SINGLE unknown unit must raise too — the pairwise
    # check is empty for one element and date_trunc on a bad unit
    # silently collapses everything into one NULL bucket
    with _pytest.raises(ValueError, match="unsupported resolution"):
        timeseries.hypertable_rollup(e, "ts", "v", resolutions=("fortnight",))
    with _pytest.raises(ValueError, match="non-empty"):
        timeseries.hypertable_rollup(e, "ts", "v", resolutions=())


def test_resize_empty_payload_keeps_fixed_shape(spark):
    media = spark.createDataFrame(
        [(0, "image/png", b""), (3, "image/png", b"abc")],
        "doc_id long, media_type string, payload binary",
    )
    out = {r.doc_id: r for r in multimodal.resize_images(media, 4, 4).collect()}
    assert len(out[0].payload) == 16  # zero-filled, fixed shape
    assert len(out[3].payload) == 16


def _uf_components(pairs):
    """Ground-truth union-find (driver-side, test-only)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_duplicate_clusters_matches_union_find(spark):
    # two cliques, a bridge chain, an isolated pair — nontrivial shapes
    pairs = [
        (1, 2), (2, 3), (1, 3),          # clique {1,2,3}
        (10, 11), (11, 12),              # path {10,11,12}
        (3, 10),                         # bridge: one big component
        (100, 101),                      # isolated pair
        (7, 5), (5, 9),                  # out-of-order ids
    ]
    df = spark.createDataFrame(pairs, "a_id long, b_id long")
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.duplicate_clusters(df).collect()
    }
    assert got == _uf_components(pairs)


def test_duplicate_clusters_long_path_converges(spark):
    # a 64-node path is the worst diameter case for naive propagation;
    # large-star/small-star must converge well inside max_rounds
    pairs = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(pairs, "a_id long, b_id long")
    got = {r.doc_id: r.cluster_id for r in dedup.duplicate_clusters(df).collect()}
    assert got == {i: 0 for i in range(65)}


def test_duplicate_clusters_empty_and_self_pairs(spark):
    df = spark.createDataFrame([(5, 5)], "a_id long, b_id long")
    assert dedup.duplicate_clusters(df).count() == 0


def test_benchmark_contamination_flags_ngram_overlap(spark):
    # train doc 1 contains benchmark doc 100's 5-gram verbatim;
    # train doc 2 shares no 5-gram; doc 3 is too short to shingle
    train = spark.createDataFrame(
        [
            (1, "x y the quick brown fox jumps z w"),
            (2, "entirely different words with no overlap here at all"),
            (3, "too short"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a b the quick brown fox jumps c")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup.benchmark_contamination(train, bench, n=5).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1].contaminated and out[1].n_hit_ngrams == 1
    assert not out[2].contaminated and out[2].n_hit_ngrams == 0
    assert out[3].n_ngrams == 0 and not out[3].contaminated


def test_dup_span_stats_alignment_and_totality(spark):
    # docs 1 and 2 share one 4-token run at DIFFERENT offsets (sliding
    # windows must catch any alignment); doc 3 is all-unique; doc 4 is
    # too short to window but must still appear (total function)
    df = spark.createDataFrame(
        [
            (1, "p q r the quick brown fox s"),
            (2, "the quick brown fox a b c d"),
            (3, "u v w x y z zz yy"),
            (4, "tiny"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.dup_span_stats(df, span=4, min_docs=2).collect()}
    assert set(out) == {1, 2, 3, 4}
    # 8 tokens → 5 sliding 4-windows each; exactly one window is shared
    assert out[1].n_spans == 5 and out[1].n_dup_spans == 1
    assert out[2].n_spans == 5 and out[2].n_dup_spans == 1
    assert out[1].dup_fraction == 0.2
    assert out[3].n_dup_spans == 0 and out[3].dup_fraction == 0.0
    assert out[4].n_spans == 0 and out[4].dup_fraction == 0.0


def test_token_rarity_counts_corpus_frequencies(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.token_rarity(df).collect()}
    # corpus freqs: a=3, b=1, c=1
    assert out[1].n_tokens == 3 and out[1].sum_freq == 3 + 3 + 1
    assert out[2].n_tokens == 2 and out[2].sum_freq == 3 + 1
    assert out[2].mean_freq == 2.0


def test_dup_span_stats_counts_distinct_windows_once(spark):
    # a window repeated INSIDE one doc counts once per doc (distinct),
    # and needs a second doc to become a duplicate
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "c d e f g h")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.dup_span_stats(df, span=2, min_docs=2).collect()}
    # doc 1 windows: {a b, b a} — repeated internally, still not cross-doc dups
    assert out[1].n_spans == 2 and out[1].n_dup_spans == 0


def test_pack_sequences_ffd_properties(spark):
    from hyper_storage_spark.operators import sampling

    rows = [(i, 10 + (i * 37) % 190) for i in range(200)] + [(900, 512)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = sampling.pack_sequences(df, max_tokens=256, n_groups=4).collect()
    by_doc = {r.doc_id: r for r in packed}
    # every doc assigned exactly once, counts preserved
    assert len(packed) == len(rows) and len(by_doc) == len(rows)
    assert all(by_doc[d].n_tokens == n for d, n in rows)
    # oversize flagged, alone in its bin
    assert by_doc[900].oversize
    fills = {}
    for r in packed:
        fills.setdefault(r.seq_id, []).append(r)
    for seq, members in fills.items():
        if any(m.oversize for m in members):
            assert len(members) == 1
        else:
            assert sum(m.n_tokens for m in members) <= 256
    # FFD: at most one bin <= half-full per group
    under = {}
    for seq, members in fills.items():
        if any(m.oversize for m in members):
            continue
        if sum(m.n_tokens for m in members) * 2 < 256:
            under[members[0].group_id] = under.get(members[0].group_id, 0) + 1
    assert all(v <= 1 for v in under.values())


def test_pack_sequences_deterministic(spark):
    from hyper_storage_spark.operators import sampling

    rows = [(i, 10 + (i * 13) % 100) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    a = sorted(map(tuple, sampling.pack_sequences(df, 128, n_groups=4).collect()))
    b = sorted(
        map(tuple, sampling.pack_sequences(df.repartition(13), 128, n_groups=4).collect())
    )
    assert a == b

    # review r12: a STRING id (the corpus-wide convention elsewhere)
    # must work — the output schema derives the id type from the input
    # instead of hardcoding long
    sdf = spark.createDataFrame(
        [(f"d{i}", 10 + i) for i in range(20)], "item string, n_tokens long"
    )
    out = sampling.pack_sequences(sdf, 64, id_col="item", n_groups=2).collect()
    assert len(out) == 20 and all(isinstance(r.item, str) for r in out)


def test_bm25_scores_match_hand_formula(spark):
    import math

    from hyper_storage_spark.operators import search

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "apple cherry"), (3, "durian elderberry fig")],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame([("q", "apple")], "query_id string, query string")
    got = {r.doc_id: r for r in search.bm25_topk(docs, queries, k=10).collect()}
    # hand BM25: N=3, df(apple)=2, idf=ln(1+(3-2+0.5)/(2+0.5)); avgdl=8/3
    idf = math.log(1 + 1.5 / 2.5)
    avgdl = 8 / 3

    def s(tf, dl):
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    assert set(got) == {1, 2}  # doc 3 shares no term
    assert abs(got[1].score - round(s(2, 3), 6)) < 1e-9
    assert abs(got[2].score - round(s(1, 2), 6)) < 1e-9
    assert got[1].rank == 1 and got[2].rank == 2  # tf wins


def test_domain_mixture_shares_and_determinism(spark):
    from hyper_storage_spark.operators import sampling

    rows = [(i, "a" if i % 4 else "b") for i in range(400)]  # a:300 b:100
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = sampling.domain_mixture(df, "lang", {"a": 0.5, "b": 0.5})
    counts = {r[0]: r[1] for r in kept.groupBy("lang").count().collect()}
    # b binds (100/0.5=200 < 300/0.5=600): b keeps everything
    assert counts["b"] == 100
    # a downsamples toward 100; content-hash Bernoulli is approximate
    assert 70 <= counts["a"] <= 130
    # deterministic: same rows kept on re-evaluation and repartition
    k1 = sorted(r.doc_id for r in kept.collect())
    k2 = sorted(
        r.doc_id
        for r in sampling.domain_mixture(df.repartition(7), "lang", {"a": 0.5, "b": 0.5}).collect()
    )
    assert k1 == k2
    # unknown domain dropped, zero weight dropped
    df2 = spark.createDataFrame(
        [(1, "a"), (2, "zzz")], "doc_id long, lang string"
    )
    out = sampling.domain_mixture(df2, "lang", {"a": 1.0, "zzz": 0.0})
    assert [r.lang for r in out.collect()] == ["a"]


def test_zorder_layout_prunes_both_dimensions(spark):
    from hyper_storage_spark.operators import layout

    # 64x64 grid of (x, y) points
    grid = spark.range(4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    n_parts = 16

    def prunable(stats_rows, col_mn, col_mx, mn, mx):
        # partitions a reader skips for predicate col BETWEEN mn AND mx
        return sum(1 for r in stats_rows if r[col_mx] < mn or r[col_mn] > mx)

    z = layout.zorder_layout(grid, ["x", "y"], n_parts)
    zstats = [r.asDict() for r in layout.partition_pruning_stats(z, ["x", "y"]).collect()]
    lin = grid.repartitionByRange(n_parts, "x").sortWithinPartitions("x")
    lstats = [r.asDict() for r in layout.partition_pruning_stats(lin, ["x", "y"]).collect()]

    # rows preserved
    assert z.count() == 4096
    # x-sorted layout prunes nothing on a y predicate; z-order must
    # prune on BOTH dimensions (range-partition boundaries are sampled,
    # so tiles are ragged — a quarter of partitions is the safe floor;
    # measured 6-10 of 16 per dimension)
    assert prunable(lstats, "min_y", "max_y", 10, 17) == 0
    assert prunable(zstats, "min_y", "max_y", 10, 17) >= n_parts // 4
    assert prunable(zstats, "min_x", "max_x", 10, 17) >= n_parts // 4


def test_zorder_handles_skew_and_low_cardinality(spark):
    from hyper_storage_spark.operators import layout

    # heavily skewed x (90% one value), 3-value y — quantile ranks must
    # not crash on duplicate boundaries, rows must be preserved
    rows = [(0 if i % 10 else i, i % 3) for i in range(1000)]
    df = spark.createDataFrame(rows, "x long, y long")
    z = layout.zorder_layout(df, ["x", "y"], 4)
    assert z.count() == 1000
    assert sorted(map(tuple, z.collect())) == sorted(rows)


def test_duplicate_clusters_random_graphs_match_union_find(spark):
    import random

    # r13: 3 seeds → 2 and 120 nodes/150 draws → 70/90 — each graph is
    # a full alternating-star component run (log² rounds × several jobs
    # each); the union-find differential property is unchanged
    for seed in (7, 42):
        rng = random.Random(seed)
        n = 70
        pairs = list(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.randrange(n), rng.randrange(n)) for _ in range(90)
                )
                if a != b
            }
        )
        df = spark.createDataFrame(pairs, "a_id long, b_id long")
        got = {r.doc_id: r.cluster_id for r in dedup.duplicate_clusters(df).collect()}
        assert got == _uf_components(pairs), f"seed {seed}"


def test_pack_sequences_random_invariants(spark):
    import random

    from hyper_storage_spark.operators import sampling

    rng = random.Random(99)
    cap = 777
    rows = [(i, rng.randrange(1, 1200)) for i in range(300)]
    packed = sampling.pack_sequences(
        spark.createDataFrame(rows, "doc_id long, n_tokens long"), cap, n_groups=5
    ).collect()
    assert sorted((r.doc_id, r.n_tokens) for r in packed) == sorted(rows)
    fills: dict = {}
    for r in packed:
        fills.setdefault(r.seq_id, []).append(r)
    for members in fills.values():
        if any(m.oversize for m in members):
            assert len(members) == 1 and members[0].n_tokens > cap
        else:
            assert sum(m.n_tokens for m in members) <= cap
    # oversize iff > cap
    assert all((r.n_tokens > cap) == r.oversize for r in packed)


def test_incremental_exact_dedup_semantics(spark):
    batch = spark.createDataFrame(
        [
            (10, "already ingested"),
            (11, "brand new"),
            (12, "brand new"),   # within-batch dup of 11
            (13, "also new"),
        ],
        "doc_id long, text string",
    )
    seen = spark.createDataFrame(
        [("already ingested",)], "t string"
    ).select(F.md5("t").alias("text_hash"))
    got = sorted(r.doc_id for r in dedup.incremental_exact_dedup(batch, seen).collect())
    assert got == [11, 13]  # 10 in history, 12 loses within-batch tie


def test_duplicate_clusters_string_ids(spark):
    pairs = [("urlB", "urlA"), ("urlB", "urlC"), ("x", "y")]
    df = spark.createDataFrame(pairs, "a_id string, b_id string")
    got = {r.doc_id: r.cluster_id for r in dedup.duplicate_clusters(df).collect()}
    assert got == {
        "urlA": "urlA", "urlB": "urlA", "urlC": "urlA", "x": "x", "y": "x",
    }


def test_pack_sequences_zero_token_docs_never_join_oversize_bins(spark):
    from hyper_storage_spark.operators import sampling

    rows = [(1, 500), (2, 0), (3, 0), (4, 10)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = sampling.pack_sequences(df, 100, n_groups=1).collect()
    fills: dict = {}
    for r in packed:
        fills.setdefault(r.seq_id, []).append(r)
    for members in fills.values():
        if any(m.oversize for m in members):
            assert len(members) == 1  # oversize stays a singleton
    assert sorted(r.doc_id for r in packed) == [1, 2, 3, 4]


def test_incremental_exact_dedup_null_text_dropped(spark):
    batch = spark.createDataFrame(
        [(1, None), (2, "real")], "doc_id long, text string"
    )
    seen = spark.createDataFrame([("zzz",)], "text_hash string")
    got = [r.doc_id for r in dedup.incremental_exact_dedup(batch, seen).collect()]
    assert got == [2]


def test_funnel_ordering_and_gap_semantics(spark):
    from hyper_storage_spark.operators import funnel as fn

    rows = [
        # u1 completes in order
        (1, "2020-01-01 00:00:00", "view"),
        (1, "2020-01-01 01:00:00", "click"),
        (1, "2020-01-01 02:00:00", "buy"),
        # u2 clicks BEFORE viewing -> stuck at view
        (2, "2020-01-01 01:00:00", "click"),
        (2, "2020-01-01 02:00:00", "view"),
        # u3 views then clicks outside the 1h gap -> stuck at view
        (3, "2020-01-01 00:00:00", "view"),
        (3, "2020-01-01 03:00:00", "click"),
        # u4 never views
        (4, "2020-01-01 00:00:00", "buy"),
        # u5: first view's click misses the window; NO backtracking to
        # the second view (min-chaining pins t1 to the earliest view)
        (5, "2020-01-01 00:00:00", "view"),
        (5, "2020-01-01 05:00:00", "view"),
        (5, "2020-01-01 05:30:00", "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, event_type string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    got = {
        r.step_name: r.n_users
        for r in fn.funnel(df, ["view", "click", "buy"], max_gap_seconds=3600).collect()
    }
    assert got == {"view": 4, "click": 1, "buy": 1}
    # without the gap, u3 and u5 convert their click
    got2 = {
        r.step_name: r.n_users
        for r in fn.funnel(df, ["view", "click", "buy"]).collect()
    }
    assert got2 == {"view": 4, "click": 3, "buy": 1}


def test_cohort_retention_offsets_and_sizes(spark):
    from hyper_storage_spark.operators import funnel as fn

    rows = [
        (1, "2020-01-06"), (1, "2020-01-14"),  # cohort w1, back in w2
        (2, "2020-01-07"),                       # cohort w1, never back
        (3, "2020-01-13"), (3, "2020-01-27"),   # cohort w2, back at +2
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    got = {
        (str(r.cohort_week), r.week_offset): (r.n_active, r.cohort_size)
        for r in fn.cohort_retention(df).collect()
    }
    assert got == {
        ("2020-01-06", 0): (2, 2),
        ("2020-01-06", 1): (1, 2),
        ("2020-01-13", 0): (1, 1),
        ("2020-01-13", 2): (1, 1),
    }


def test_fuzzy_pairs_substitution_recall_complete(spark):
    rows = [
        (1, "jonathan"), (2, "jonathon"),   # distance 1 (substitution)
        (3, "jonixhan"),                     # distance 2 from 1
        (4, "entirely"),                     # unrelated, same length
        (5, "jon"),                          # different length
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r.a_id, r.b_id): r.distance for r in dedup.fuzzy_pairs(df, "id", "name").collect()}
    assert got == {(1, 2): 1}
    # distance 2 found when the budget allows it
    got2 = {
        (r.a_id, r.b_id): r.distance
        for r in dedup.fuzzy_pairs(df, "id", "name", max_distance=2).collect()
    }
    assert got2[(1, 3)] == 2 and (1, 2) in got2
    assert (2, 3) not in got2  # jonathon↔jonixhan is distance 3
    # brute-force cross-check at max_distance=1 over all equal-length pairs
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    expect = {
        (x[0], y[0]): lev(x[1], y[1])
        for x, y in itertools.combinations(rows, 2)
        if len(x[1]) == len(y[1]) and lev(x[1], y[1]) <= 1
    }
    assert got == expect


def test_series_similarity_pruning_certifies_on_smooth_series(spark):
    import math

    from hyper_storage_spark.operators import timeseries

    # 40 users, 32 days; user u's series is a smooth level-u ramp with
    # a tiny wiggle — neighbors in u-space are neighbors in distance,
    # and PAA segment means capture nearly all the energy
    rows = []
    for u in range(40):
        for d in range(32):
            v = 100.0 * u + 5.0 * math.sin(d / 5.0)
            rows.append((u, d, v))
    df = spark.createDataFrame(rows, "user_id long, d int, value double").select(
        "user_id",
        F.date_add(F.lit("2020-01-01").cast("date"), F.col("d"))
        .cast("timestamp")
        .alias("ts"),
        "value",
    )
    out = timeseries.series_similarity_topk(df, 20, k=4, candidate_factor=2).collect()
    assert all(r.certified for r in out)  # pruning provably lost nothing
    # true neighbors of u=20 by construction: 19, 21, then 18, 22
    assert {r.neighbor_id for r in out} == {19, 21, 18, 22}


def test_series_similarity_exact_matches_bruteforce(spark):
    from hyper_storage_spark.operators import timeseries

    import random

    rnd = random.Random(3)
    rows = []
    series = {}
    for u in range(12):
        vals = [rnd.uniform(0, 100) for _ in range(10)]
        series[u] = vals
        for d, v in enumerate(vals):
            if d == 3 and u == 5:
                continue  # a missing day -> densified as 0
            rows.append((u, f"2020-02-{d+1:02d} 00:00:00", v))
    series[5][3] = 0.0
    df = spark.createDataFrame(rows, "user_id long, ts string, value double").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    out = timeseries.series_similarity_topk(df, 0, k=3, candidate_factor=20).collect()
    import math

    def dist(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    expect = sorted(
        ((dist(series[0], series[u]), u) for u in series if u != 0)
    )[:3]
    got = [(r.distance, r.neighbor_id) for r in sorted(out, key=lambda r: r.rank)]
    for (ed, eu), (gd, gu) in zip(expect, got):
        assert eu == gu and abs(ed - gd) < 1e-5


def test_funnel_empty_corpus_counts_zero(spark):
    from hyper_storage_spark.operators import funnel as fn

    df = spark.createDataFrame(
        [(1, "2020-01-01 00:00:00", "other")],
        "user_id long, ts string, event_type string",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    got = {r.step_name: r.n_users for r in fn.funnel(df, ["view", "click"]).collect()}
    assert got == {"view": 0, "click": 0}


def test_series_similarity_input_validation(spark):
    import pytest as _pytest

    from hyper_storage_spark.operators import timeseries

    empty = spark.createDataFrame([], "user_id long, ts timestamp, value double")
    with _pytest.raises(ValueError, match="no events"):
        timeseries.series_similarity_topk(empty, 0)
    df = spark.createDataFrame(
        [(1, "2020-01-01 00:00:00", 1.0)], "user_id long, ts string, value double"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    with _pytest.raises(ValueError, match="has no events"):
        timeseries.series_similarity_topk(df, 999)


def test_normalized_text_catches_trivial_variants(spark):
    df = spark.createDataFrame(
        [(1, "Hello,  World!"), (2, "hello world"), (3, "other text")],
        "doc_id long, text string",
    )
    out = df.select("doc_id", text.normalized_text(F.col("text")).alias("n")).collect()
    by = {r.doc_id: r.n for r in out}
    assert by[1] == by[2] == "hello world"
    assert by[3] == "other text"


def test_cap_per_group_deterministic_and_bounded(spark):
    from hyper_storage_spark.operators import sampling

    rows = [(i, "big" if i < 80 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = sampling.cap_per_group(df, "lang", 30)
    counts = {r[0]: r[1] for r in kept.groupBy("lang").count().collect()}
    assert counts == {"big": 30, "small": 20}  # under-cap keeps all
    a = sorted(r.doc_id for r in kept.collect())
    b = sorted(
        r.doc_id for r in sampling.cap_per_group(df.repartition(7), "lang", 30).collect()
    )
    assert a == b  # pure function of the data


def test_exact_duplicates_ignores_null_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "same"), (4, "same")],
        "doc_id long, text string",
    )
    groups = dedup.exact_duplicates(df).collect()
    # the two NULL-text docs must NOT read as a duplicate group
    assert len(groups) == 1 and groups[0].dup_count == 2


def test_minhash_bands_must_divide_hashes(spark, sf_dir):
    import pytest as _pytest

    d = docs(spark, sf_dir).limit(10)
    with _pytest.raises(ValueError, match="divide"):
        dedup.minhash_lsh_pairs(d, num_hashes=32, bands=5)
    with _pytest.raises(ValueError, match="divide"):
        dedup.minhash_lsh_pairs(d, num_hashes=32, bands=48)


def test_simhash_banding_tracks_max_hamming(spark):
    """Pigeonhole banding must use max_hamming+1 chunks: a pair at
    hamming 4 with one differing bit per 16-bit quarter defeats a fixed
    4-chunk split but must be found when max_hamming=4 is requested."""
    from unittest import mock

    base = 0x0123456789ABCDEF
    other = base ^ (1 << 3) ^ (1 << 19) ^ (1 << 35) ^ (1 << 51)
    sigs = mock.patch.object(
        dedup,
        "simhash_signatures",
        lambda d, tc="text": spark.createDataFrame(
            [(1, base), (2, other)], "doc_id long, simhash long"
        ),
    )
    with sigs:
        got = dedup.simhash_pairs(spark.range(0), max_hamming=4).collect()
    assert [(r.a_id, r.b_id, r.hamming) for r in got] == [(1, 2, 4)]


def test_simhash_max_hamming_zero_exact_match(spark):
    """max_hamming=0 (exact-signature dedup) is the guard's own lower
    bound: the single 64-bit chunk cannot be masked with a LongType
    literal (2^64-1 overflows), so the chunk IS the signature. Must
    plan and find identical-signature pairs only."""
    from unittest import mock

    base = 0x0123456789ABCDEF
    sigs = mock.patch.object(
        dedup,
        "simhash_signatures",
        lambda d, tc="text": spark.createDataFrame(
            [(1, base), (2, base), (3, base ^ 1), (4, -1)],
            "doc_id long, simhash long",
        ),
    )
    with sigs:
        got = dedup.simhash_pairs(spark.range(0), max_hamming=0).collect()
    assert [(r.a_id, r.b_id, r.hamming) for r in got] == [(1, 2, 0)]


def test_cdc_pairs_df_cap_bounds_hot_chunks(spark):
    # 30 docs sharing one boilerplate prefix chunk: with the cap below
    # the fan-out, the hot chunk emits no pairs
    boiler = "LICENSE HEADER " * 20
    rows = [(i, boiler + f"unique tail {i} " * 10) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = dedup.cdc_shared_chunk_pairs(df, min_shared=1, max_df=10)
    uncapped = dedup.cdc_shared_chunk_pairs(df, min_shared=1, max_df=1000)
    assert capped.count() < uncapped.count()


def test_gapfill_linear_bridges_null_values_and_offgrid_rows(spark):
    import pytest

    from hyper_storage_spark.operators import timeseries as ts

    rows = [
        (1, 0, 5.0),
        (1, 2, None),  # real row, NULL value: interpolate ACROSS and fill it
        (1, 6, 10.0),
        (1, 3, 8.0),  # off the min+2k grid: must survive, not vanish
    ]
    df = spark.createDataFrame(rows, "k long, bucket long, v double")
    out = {
        r.bucket: (r.v, r.filled)
        for r in ts.gapfill(df, ["k"], "bucket", "2", ["v"], how="linear").collect()
    }
    assert set(out) == {0, 2, 3, 4, 6}
    assert out[3] == (8.0, False)  # off-grid observation kept
    # NULL-value real row interpolates between 0→5 and 3→8
    assert out[2][0] == pytest.approx(5 + (8 - 5) * 2 / 3) and not out[2][1]
    # the filled 4 bucket interpolates between 3→8 and 6→10
    assert out[4][0] == pytest.approx(8 + (10 - 8) * 1 / 3) and out[4][1]


def test_asof_null_left_ts_never_matches(spark):
    from hyper_storage_spark.operators import timeseries as ts

    left = spark.createDataFrame(
        [(1, 10.0, "a"), (1, None, "b")], "k long, ts double, lp string"
    )
    right = spark.createDataFrame(
        [(1, 1.0, "r1"), (1, 5.0, "r5")], "k long, ts double, pay string"
    )
    # 'a' (ts=10): backward/nearest match r5, forward has nothing ≥ 10;
    # 'b' (ts=NULL) must match NOTHING in any direction
    for direction, a_match in (("backward", ["a"]), ("forward", []), ("nearest", ["a"])):
        got = {
            r.lp: r.pay
            for r in ts.asof_join(
                left, right, ["k"], how="left", direction=direction
            ).collect()
        }
        assert got["b"] is None, direction
        inner = ts.asof_join(left, right, ["k"], how="inner", direction=direction)
        assert sorted(r.lp for r in inner.collect()) == a_match, direction


def test_extract_features_auto_never_raises_on_corrupt_or_null(spark):
    """auto mode's documented contract: a NULL payload and a
    corrupt-but-correctly-signatured payload (valid PNG head, garbage
    body — a truncated download) must fall back fake, never crash."""
    rows = [
        (1, "image/png", bytearray(b"\x89PNG\r\n\x1a\n" + b"garbage!")),
        (2, "audio/wav", bytearray(b"RIFF\x00\x00\x00\x00WAVEjunk")),
        (3, "image/png", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    got = {r.doc_id: r for r in multimodal.extract_features(df, mode="auto").collect()}
    assert got[1].n_samples == got[1].byte_len  # fake fallback: raw bytes
    assert got[3].byte_len == 0 and got[3].n_samples == 0
    # real mode stays strict: the corrupt PNG must raise
    import pytest as _pytest

    with _pytest.raises(Exception):
        multimodal.extract_features(df.filter("doc_id = 1"), mode="real").collect()


def test_resize_auto_handles_corrupt_and_null(spark):
    rows = [
        (1, "image/png", bytearray(b"\x89PNG\r\n\x1a\n" + b"nope")),
        (2, "image/png", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    out = {r.doc_id: r for r in multimodal.resize_images(df, 4, 3, mode="auto").collect()}
    assert len(out[1].payload) == 12 and len(out[2].payload) == 12


def test_pack_sequences_rejects_negative_counts(spark):
    import pytest as _pytest

    from hyper_storage_spark.operators import sampling

    df = spark.createDataFrame([(1, 10), (2, -1)], "doc_id long, n_tokens long")
    with _pytest.raises(Exception, match="invalid token count"):
        sampling.pack_sequences(df, max_tokens=256).collect()


def test_zorder_rejects_sign_bit_overflow(spark):
    import pytest as _pytest

    from hyper_storage_spark.operators import layout

    df = spark.createDataFrame([(1.0, 2.0, 3.0, 4.0)], "a double, b double, c double, d double")
    with _pytest.raises(ValueError, match="63"):
        layout.zorder_code(df, ["a", "b", "c", "d"], bits=16)


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    """Two tables bucketed+sorted on the join key must SortMergeJoin
    with ZERO Exchange and ZERO per-task Sort (the write amortized
    both); the result must equal the plain join. One bucketed side
    alone must exchange only the unbucketed side."""
    from pyspark.sql import functions as F

    from hyper_storage_spark.operators import bucketing

    left = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("lv")
    )
    right = spark.range(0, 5000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 31).alias("rv")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketing.write_bucketed(left, "bj_left", ["k"], 8, path=str(tmp_path / "l"))
        bucketing.write_bucketed(right, "bj_right", ["k"], 8, path=str(tmp_path / "r"))
        joined = bucketing.colocated_join(spark, "bj_left", "bj_right", ["k"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle either side"
        # (Spark 4 still inserts per-task Sorts — it no longer trusts
        # bucket-file ordering — but those are cheap linear passes over
        # single sorted files; the guarded property is the exchange.)
        assert "Bucketed: true" in plan and "SelectedBucketsCount: 8 out of 8" in plan
        expected = sorted(
            (r.k, r.lv, r.rv) for r in left.join(right, "k").collect()
        )
        assert sorted((r.k, r.lv, r.rv) for r in joined.collect()) == expected

        # one-sided: only the unbucketed frame exchanges
        half = spark.table("bj_left").join(right, "k")
        hplan = half._jdf.queryExecution().executedPlan().toString()
        assert hplan.count("Exchange") == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bj_left")
        spark.sql("DROP TABLE IF EXISTS bj_right")


def test_pca_project_matches_numpy(spark, sf_dir):
    """Spark ML PCA ≡ numpy eigendecomposition of the sample covariance
    on the same data: projections must agree per component up to the
    eigenvector sign ambiguity (Spark projects the UNCENTERED input —
    the differential replicates that quirk)."""
    import numpy as np

    from hyper_storage_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    k = 8
    proj, model = similarity.pca_project(emb, k=k, with_model=True)
    got = {r.vec_id: np.array(r.components) for r in proj.collect()}

    rows = emb.select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in rows]
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    cov = np.cov(X, rowvar=False, ddof=1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    axes = v[:, order]           # d×k
    expected = X @ axes          # uncentered projection, Spark-style

    spark_mat = np.array([got[i] for i in ids])
    for j in range(k):
        col, ref = spark_mat[:, j], expected[:, j]
        assert (
            np.allclose(col, ref, atol=1e-4) or np.allclose(col, -ref, atol=1e-4)
        ), f"component {j} diverges beyond sign"
    # explained variance mirrors the eigenvalue shares
    ev = np.asarray(model.explainedVariance)
    assert np.allclose(ev, w[order] / w.sum(), atol=1e-6)


def test_tfidf_topk_hand_computed(spark):
    """TF-IDF against hand-computed values on a 3-doc corpus (smooth
    idf ln((N+1)/(df+1))+1), including the deterministic term
    tie-break."""
    import math

    from hyper_storage_spark.operators import text as T

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "c c c d")], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.rank): (r.term, r.tfidf)
        for r in T.tfidf_topk(docs, k=2).collect()
    }

    def s(tf, df, n=3):
        return round(tf * (math.log((n + 1) / (df + 1)) + 1), 6)

    # doc1: a tf=2 df=2 → 2*(ln(4/3)+1); b tf=1 df=1 → ln(2)+1 — a wins
    assert got[(1, 1)] == ("a", s(2, 2))
    assert got[(1, 2)] == ("b", s(1, 1))
    # doc2: a and c both tf=1 df=2 → identical score, tie-break a < c
    assert got[(2, 1)] == ("a", s(1, 2))
    assert got[(2, 2)] == ("c", s(1, 2))
    # doc3: c tf=3 dominates d
    assert got[(3, 1)] == ("c", s(3, 2))
    assert got[(3, 2)] == ("d", s(1, 1))


def test_kmeans_clusters_deterministic_and_reduces_inertia(spark, sf_dir):
    """Same seed ⇒ identical assignment; and the k=10 fit must beat the
    single-centroid baseline (total variance) on within-cluster squared
    distance — the minimal geometric claim of a working Lloyd loop.
    (The fixture's `label` column is NOT geometrically clustered —
    cell/label purity measures ~random — so no purity claim.)"""
    import numpy as np

    from hyper_storage_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    got_a, model = similarity.kmeans_clusters(emb, k=10, seed=7, with_model=True)
    a = {r.vec_id: r.cluster for r in got_a.collect()}
    b = {r.vec_id: r.cluster for r in similarity.kmeans_clusters(emb, k=10, seed=7).collect()}
    assert a == b
    X = np.array([r.embedding for r in emb.select("embedding").collect()], dtype=float)
    total_inertia = float(((X - X.mean(axis=0)) ** 2).sum())
    assert model.summary.trainingCost < 0.95 * total_inertia, (
        f"k=10 inertia {model.summary.trainingCost:.1f} vs baseline {total_inertia:.1f}"
    )


def test_count_min_sketch_properties(spark):
    """Structural CMS guarantees on a skewed corpus: estimates never
    undercount, tiny grids still only overcount (width=1 degenerates to
    estimate == N for every value), and a roomy grid recovers exact
    counts for well-separated values."""
    from hyper_storage_spark.operators import sketches

    rows = [(v,) for v in [1] * 50 + [2] * 30 + [3] * 20 + list(range(100, 200))]
    df = spark.createDataFrame(rows, "user_id long")
    hh = sketches.heavy_hitters_cms(df, "user_id", k=3, depth=5, width=4096).collect()
    assert [(r.value, r.n_exact) for r in hh] == [(1, 50), (2, 30), (3, 20)]
    assert all(r.overestimates and r.within_eps_n for r in hh)
    # roomy grid + few distincts: estimates are exact
    assert [r.cms_estimate for r in hh] == [50, 30, 20]

    # degenerate width=1: every value maps to the same cell per row —
    # the estimate is the TOTAL count, still a pure overestimate
    grid1 = sketches.cms_build(df, "user_id", depth=3, width=1)
    vals = spark.createDataFrame([(1,), (999,)], "user_id long")
    est = {r.user_id: r.cms_estimate
           for r in sketches.cms_estimate(grid1, vals, "user_id", depth=3, width=1).collect()}
    assert est[1] == est[999] == df.count()


def test_distributed_cumsum_matches_naive_global_window(spark):
    """Two-level prefix sum ≡ the naive single-task global window on a
    seeded random frame, and its plan must contain NO unpartitioned
    Window (every Window partitions by the range-partition id)."""
    import random

    from pyspark.sql import Window

    from hyper_storage_spark.operators import sampling

    rng = random.Random(7)
    rows = [(i, rng.randint(1, 500)) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, w long").repartition(16)
    order = [F.col("w").desc(), F.col("id")]
    got = {
        r.id: r.cum_weight
        for r in sampling.distributed_cumsum(df, "w", order, partitions=8).collect()
    }
    naive = {
        r.id: r.c
        for r in df.withColumn(
            "c", F.sum("w").over(Window.orderBy(F.col("w").desc(), F.col("id")))
        ).collect()
    }
    assert got == naive

    plan = (
        sampling.distributed_cumsum(df, "w", order, partitions=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for line in plan.splitlines():
        if "Window" in line and "windowExpression" not in line.lower():
            assert "__pid" in line, f"unpartitioned Window in plan: {line.strip()}"

    # budget_select: greedy cut is exact at the boundary
    sel = sampling.budget_select(df, "w", 10_000, order).collect()
    total = sum(r.w for r in sel)
    cut = sorted(naive.items(), key=lambda kv: kv[1])
    expected_ids = {i for i, c in naive.items() if c <= 10_000}
    assert {r.id for r in sel} == expected_ids and total <= 10_000


def test_incremental_minhash_matches_full_recompute(spark, sf_dir):
    """The incremental path (batch vs persisted band index) must emit
    exactly the full-recompute pairs that involve the batch — with or
    without the precomputed index."""
    d = docs(spark, sf_dir)
    batch = d.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 7)
    corpus = d.filter(F.pmod(F.col("doc_id"), F.lit(10)) != 7)

    full = {
        (r.a_id, r.b_id, r.jaccard)
        for r in dedup.minhash_lsh_pairs(d, threshold=0.5).collect()
        if r.a_id % 10 == 7 or r.b_id % 10 == 7
    }
    inc = {
        (r.a_id, r.b_id, r.jaccard)
        for r in dedup.incremental_minhash_pairs(batch, corpus, threshold=0.5).collect()
    }
    idx = dedup.minhash_band_index(corpus)
    inc_idx = {
        (r.a_id, r.b_id, r.jaccard)
        for r in dedup.incremental_minhash_pairs(
            batch, corpus, threshold=0.5, corpus_index=idx
        ).collect()
    }
    assert inc == full and inc_idx == full
    assert full, "split produced no near-dup pairs — test is vacuous"


def test_incremental_embedding_matches_full_subset(spark, sf_dir):
    """Incremental embedding near-dup ≡ the exact batch-involving pair
    set on precision (identical cosines); recall bounded below, with
    and without the prebuilt signature index."""
    emb = load_table(spark, sf_dir, "embeddings")
    batch = emb.filter(F.pmod(F.col("vec_id"), F.lit(10)) == 7)
    corpus = emb.filter(F.pmod(F.col("vec_id"), F.lit(10)) != 7)
    exact = {
        (r.a_id, r.b_id, r.cosine)
        for r in dedup.embedding_cosine_pairs(emb, threshold=0.45).collect()
        if r.a_id % 10 == 7 or r.b_id % 10 == 7
    }
    idx = dedup.embedding_signature_index(corpus)
    for index in (None, idx):
        found = {
            (r.a_id, r.b_id, r.cosine)
            for r in dedup.incremental_embedding_pairs(
                batch, corpus, threshold=0.45, corpus_index=index
            ).collect()
        }
        assert found <= exact, "precision violated: emitted a non-exact pair"
        assert len(found) * 10 >= len(exact) * 9, (len(found), len(exact))
    assert exact, "split produced no near-dup pairs — test is vacuous"


def test_chunk_documents_hand_computed(spark):
    """Chunking edges: single short chunk, exact-boundary fit, trailing
    window dropped when wholly contained in the previous chunk, overlap
    preserved."""
    from hyper_storage_spark.operators import text as T

    docs = spark.createDataFrame(
        [
            (1, "a b c"),                          # 3 toks < window → one chunk
            (2, " ".join(f"t{i}" for i in range(8))),   # exactly window → one chunk
            (3, " ".join(f"t{i}" for i in range(10))),  # 10 toks: chunk2 = t6..t9 (4 > overlap) kept
            (4, " ".join(f"t{i}" for i in range(8 + 2))),  # trailing window == overlap→ kept? 8+2: chunk2 len 4
            (5, ""),                                # empty: no chunks
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.chunk_id): (r.n_chunk_tokens, r.chunk_text)
        for r in T.chunk_documents(docs, chunk_tokens=8, overlap=2).collect()
    }
    # stride = 6
    assert got[(1, 0)] == (3, "a b c")
    assert got[(2, 0)] == (8, " ".join(f"t{i}" for i in range(8)))
    assert (2, 1) not in got  # window at 7..8 has len 2 == overlap → dropped
    assert got[(3, 0)][0] == 8 and got[(3, 1)] == (4, "t6 t7 t8 t9")
    # overlap: chunk1 starts at token index 6 (0-based), repeating t6,t7
    assert got[(3, 0)][1].split()[-2:] == ["t6", "t7"]
    assert got[(4, 1)][0] == 4
    assert not any(d == 5 for d, _ in got)
    # invalid config rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        T.chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_chunk_documents_coverage_and_reconstruction(spark):
    """Structural properties across every doc length 0..40 and two
    configs: every token is covered by some chunk, consecutive chunks
    overlap by exactly `overlap` tokens (or the trailing remainder),
    and stitching chunk 0 plus each later chunk's post-overlap tail
    reconstructs the document."""
    from hyper_storage_spark.operators import text as T

    docs = spark.createDataFrame(
        [(n, " ".join(f"w{i}" for i in range(n))) for n in range(0, 41)],
        "doc_id long, text string",
    )
    for chunk_tokens, overlap in ((8, 2), (5, 0)):
        stride = chunk_tokens - overlap
        out = {}
        for r in T.chunk_documents(docs, chunk_tokens, overlap).collect():
            out.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk_text.split(" ")
        assert 0 not in out  # empty doc yields nothing
        for n in range(1, 41):
            chunks = [out[n][c] for c in sorted(out[n])]
            covered = set()
            for c in chunks:
                covered.update(c)
            assert covered == {f"w{i}" for i in range(n)}, (n, chunk_tokens, overlap)
            rebuilt = list(chunks[0])
            for prev, cur in zip(chunks, chunks[1:]):
                exp_overlap = min(overlap, len(cur))
                assert prev[-exp_overlap:] == cur[:exp_overlap] or overlap == 0, (n, prev, cur)
                rebuilt.extend(cur[overlap:])
            assert rebuilt == [f"w{i}" for i in range(n)], (n, chunk_tokens, overlap)


def test_skew_report_hand_computed(spark):
    from hyper_storage_spark.operators import skew

    rows = [("hot",)] * 80 + [("warm",)] * 15 + [(f"k{i}",) for i in range(5)]
    df = spark.createDataFrame(rows, "key string")
    rep = {r.key: (r.n, r.share_pct, r.skew_factor, r.suggested_salt)
           for r in skew.skew_report(df, ["key"], k=2).collect()}
    assert set(rep) == {"hot", "warm"}
    # 100 rows over 7 distinct keys → mean ≈ 14.29; hot = 80/14.29 = 5.6
    assert rep["hot"] == (80, 80.0, 5.6, 6)  # salt suggestion = ceil(5.6)
    assert rep["warm"][0] == 15 and rep["warm"][2] == 1.05
    assert rep["warm"][3] == 1  # below the 2x threshold: don't salt


def test_ann_contract_zero_hit_query_not_dropped(spark):
    """A query whose ANN result collapsed to ZERO rows must surface as
    n_results=0 / recall_ok=false and still weigh its exact top-k in
    the corpus recall — the inner-join form silently dropped exactly
    that query and reported corpus_recall_ok=true in the worst case."""
    from hyper_storage_spark.queries import _ann_contract

    exact = spark.createDataFrame(
        [(q, n) for q in (0, 1) for n in range(10)],
        "query_id long, neighbor_id long",
    )
    ann = spark.createDataFrame(
        [(0, n) for n in range(10)],  # query 1: total collapse
        "query_id long, neighbor_id long",
    )
    rows = {r.query_id: r for r in _ann_contract(ann, exact, 80).collect()}
    assert set(rows) == {0, 1}  # the collapsed query is present
    assert rows[0].n_results == 10 and rows[0].recall_ok
    assert rows[1].n_results == 0 and not rows[1].recall_ok
    # corpus recall = 10/20 = 0.5 < 0.9 on EVERY row
    assert not rows[0].corpus_recall_ok and not rows[1].corpus_recall_ok


def test_keep_best_per_cluster_hand_computed(spark):
    """keep_best_per_cluster: singletons all survive (no NULL-partition
    funnel), each cluster keeps its max-score doc, score ties break to
    the smallest id, and the output schema is the input's."""
    from hyper_storage_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 5), (10, 7), (11, 99)],
        "doc_id long, score long",
    )
    clusters = spark.createDataFrame(
        # cluster 1 = {1,2,3}: 2 and 3 tie on score -> 2 wins (min id)
        # cluster 4 = {4,10}: 10 wins on score
        [(1, 1), (2, 1), (3, 1), (4, 4), (10, 4)],
        "doc_id long, cluster_id long",
    )
    kept = dd.keep_best_per_cluster(docs, clusters, "score")
    assert kept.columns == docs.columns
    assert sorted(r.doc_id for r in kept.collect()) == [2, 10, 11]


def test_weighted_sample_properties(spark):
    from hyper_storage_spark.operators import sampling

    # 200 light rows (w=1) + 200 heavy rows (w=50): the heavy half
    # must dominate a k=100 sample by construction of the race
    rows = [(i, 1) for i in range(200)] + [(i, 50) for i in range(200, 400)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = sampling.weighted_sample(df, "w", 100).collect()
    assert len(got) == 100
    heavy = sum(1 for r in got if r.doc_id >= 200)
    assert heavy > 80  # E[heavy] ≈ 98 under the 50:1 odds

    # deterministic: same data (any partitioning) → same sample
    again = sampling.weighted_sample(df.repartition(13), "w", 100).collect()
    assert sorted(r.doc_id for r in got) == sorted(r.doc_id for r in again)

    # non-positive weights carry zero mass and never appear
    with_zero = df.union(spark.createDataFrame([(999, 0), (998, -5)], "doc_id long, w long"))
    ids = {r.doc_id for r in sampling.weighted_sample(with_zero, "w", 500).collect()}
    assert 999 not in ids and 998 not in ids and len(ids) == 400

    import pytest as _pytest

    with _pytest.raises(ValueError):
        sampling.weighted_sample(df, "w", 0)

    # scale shape: top-k must plan as TakeOrdered, not a global Sort
    plan = (
        sampling.weighted_sample(df, "w", 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrdered" in plan


def test_weighted_sample_per_group(spark):
    from hyper_storage_spark.operators import sampling

    rows = [(i, "g1", 1) for i in range(100)] + [(i, "g2", 1) for i in range(100, 130)]
    df = spark.createDataFrame(rows, "doc_id long, g string, w long")
    got = sampling.weighted_sample_per_group(df, "g", "w", 40, id_col="doc_id").collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r.g, set()).add(r.doc_id)
    assert len(by_g["g1"]) == 40  # over-k group capped
    assert len(by_g["g2"]) == 30  # under-k group keeps everything

    # per-group draw is the same race as the global sampler: the g1
    # selection must equal a global k=40 sample over g1 alone
    only_g1 = sampling.weighted_sample(
        df.filter(F.col("g") == "g1"), "w", 40, id_col="doc_id"
    ).collect()
    assert by_g["g1"] == {r.doc_id for r in only_g1}


def test_char_lm_score_hand_computed(spark):
    import math

    import pytest

    from hyper_storage_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(1, "aaab"), (2, "zzzz"), (3, "ab")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in text_ops.char_lm_score(docs, n=3).collect()}
    # grams: doc1 -> aaa, aab; doc2 -> zzz, zzz; doc3 too short -> absent
    assert set(out) == {1, 2}
    assert out[1].n_grams == 2 and out[2].n_grams == 2
    assert out[1].lm_score == pytest.approx(math.log(0.25), rel=1e-9)
    assert out[2].lm_score == pytest.approx(math.log(0.5), rel=1e-9)
    # fluent (common-pattern) text scores higher than rare-pattern text
    assert out[2].lm_score > out[1].lm_score

    # top_k cap: keep zzz (cnt 2) and aaa (tie on cnt 1, gram asc);
    # aab falls out of the model and backs off to the 0.5/total floor
    capped = {r.doc_id: r for r in text_ops.char_lm_score(docs, n=3, top_k=2).collect()}
    want = (math.log(0.25) + math.log(0.5 / 4)) / 2
    assert capped[1].lm_score == pytest.approx(want, rel=1e-9)

    with pytest.raises(ValueError):
        text_ops.char_lm_score(docs, n=0)
    with pytest.raises(ValueError):
        text_ops.char_lm_score(docs, top_k=0)


def test_containment_catches_quote_inclusion(spark):
    # doc 1 (8 tokens) is fully embedded in doc 2 (24 tokens):
    # Jaccard = |A|/|B| is low, but containment = 1.0 — the asymmetric
    # metric this operator exists for; doc 3 shares nothing
    quote = "the quick brown fox jumps over the dog"
    filler = " ".join(f"w{i}" for i in range(16))
    df = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote), (3, "x y z " + " ".join(f"u{i}" for i in range(8)))],
        "doc_id long, text string",
    )
    pairs = dedup.containment_pairs(df, threshold=0.8, n=5).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p.a_id, p.b_id) == (1, 2)
    # doc 1: 8 tokens → 4 distinct 5-gram shingles, all inside doc 2
    assert p.n_a == 4 and p.n_common == 4 and p.containment == 1.0
    # the symmetric metric would have missed it
    jac = dedup.ngram_jaccard_pairs(df, threshold=0.5, n=5).collect()
    assert all((r.a_id, r.b_id) != (1, 2) for r in jac)


def test_containment_df_cap_drops_hot_shingles(spark):
    # one boilerplate shingle shared by ALL docs; with max_df=2 it is
    # dropped from intersections AND set sizes, so the pure-boilerplate
    # pair disappears instead of reading as containment 1.0
    boiler = "all rights reserved by the site"
    rows = [(i, boiler + " " + " ".join(f"t{i}_{j}" for j in range(6))) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = dedup.containment_pairs(df, threshold=0.1, n=6, max_df=2).collect()
    assert capped == []
    # uncapped, each doc has 7 distinct shingles sharing exactly the
    # one pure-boilerplate shingle → containment 1/7 for every pair
    uncapped = dedup.containment_pairs(df, threshold=0.1, n=6, max_df=None).collect()
    assert len(uncapped) == 6 and all(r.n_common == 1 and r.n_a == 7 for r in uncapped)


def test_remove_dup_spans_rewrite_values(spark):
    import hashlib

    # docs 1/2 share one 4-token run at different offsets; doc 3 is
    # untouched; doc 4 is too short to window (passes through whole)
    df = spark.createDataFrame(
        [
            (1, "p q r the quick brown fox s"),
            (2, "the quick brown fox a b c d"),
            (3, "u v w x y z zz yy"),
            (4, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.remove_dup_spans(df, span=4, min_docs=2).collect()}
    assert set(out) == {1, 2, 3, 4}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    # the shared window covers positions 4-7 in doc 1, 1-4 in doc 2
    assert out[1].n_removed == 4
    assert out[1].clean_hash == md5("p q r s")
    assert out[2].n_removed == 4
    assert out[2].clean_hash == md5("a b c d")
    assert out[3].n_removed == 0 and out[3].clean_hash == md5("u v w x y z zz yy")
    assert out[3].keep_fraction == 1.0
    assert out[4].n_removed == 0 and out[4].clean_hash == md5("tiny doc")


def test_remove_dup_spans_full_removal_and_intra_doc(spark):
    import hashlib

    # identical span-length docs → everything removed (md5 of empty);
    # a window repeated only INSIDE one doc is NOT removed
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "e f e f e f")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.remove_dup_spans(df, span=4, min_docs=2).collect()}
    empty = hashlib.md5(b"").hexdigest()
    assert out[1].n_removed == 4 and out[1].clean_hash == empty
    assert out[1].keep_fraction == 0.0
    assert out[2].clean_hash == empty
    assert out[3].n_removed == 0


def test_assign_contiguous_ids_dense_and_deterministic(spark):
    from hyper_storage_spark.operators import sampling
    from pyspark.sql import functions as F

    rows = [(i, (i * 37) % 100) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long")
    order = [F.col("v").desc(), F.col("k")]
    out = sampling.assign_contiguous_ids(df, order, partitions=7).collect()
    assert sorted(r.row_id for r in out) == list(range(500))
    want = [k for k, v in sorted(rows, key=lambda r: (-r[1], r[0]))]
    got = [r.k for r in sorted(out, key=lambda r: r.row_id)]
    assert got == want
    # start offset + rerun determinism
    out2 = sampling.assign_contiguous_ids(df, order, start=1000, partitions=3).collect()
    assert {r.k: r.row_id - 1000 for r in out2} == {r.k: r.row_id for r in out}


def test_cosine_join_topk_exact_values(spark):
    from hyper_storage_spark.operators import similarity

    # orthonormal-ish toy vectors with known cosine ordering
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.8, 0.6]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = sorted(
        similarity.cosine_join_topk(corpus, queries, k=2).collect(),
        key=lambda r: r.rank,
    )
    assert [(r.neighbor_id, r.rank) for r in out] == [(1, 1), (2, 2)]
    assert out[0].cosine == 1.0 and out[1].cosine == 0.8


def test_ann_join_recall_and_completeness(spark, sf_dir):
    from hyper_storage_spark.operators import similarity
    from hyper_storage_spark.sources import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.pmod(F.col("vec_id"), F.lit(5)) == 0)
    corpus = emb.filter(F.pmod(F.col("vec_id"), F.lit(5)) != 0)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_join_topk(corpus, queries, k=10).collect()
    }
    ann_rows = similarity.ann_join(corpus, queries, k=10).collect()
    ann = {(r.query_id, r.neighbor_id) for r in ann_rows}
    # every query answered with a full k list, corpus recall ≥ 0.9
    per_q = {}
    for r in ann_rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, 11)) for v in per_q.values())
    assert len(per_q) == queries.count()
    assert len(ann & exact) * 10 >= 9 * len(exact)
    # cosines are exact within probed buckets: every overlapping pair
    # carries the same rounded cosine as the exact twin
    exact_cos = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in similarity.cosine_join_topk(corpus, queries, k=10).collect()
    }
    for r in ann_rows:
        key = (r.query_id, r.neighbor_id)
        if key in exact_cos:
            assert r.cosine == exact_cos[key]


def test_profile_table_exact_counts(spark):
    from hyper_storage_spark.operators.profiling import profile_table

    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 1.5), (3, None, 1.5), (4, "b", None)],
        "id long, s string, v double",
    )
    out = {r.column: r for r in profile_table(df).collect()}
    assert set(out) == {"id", "s", "v"}
    assert all(r.n_rows == 4 for r in out.values())
    assert out["id"].n_nulls == 0 and out["id"].n_distinct == 4
    assert out["s"].n_nulls == 1 and out["s"].n_distinct == 2
    assert out["v"].n_nulls == 2 and out["v"].n_distinct == 1
    assert out["v"].null_frac == 0.5
    # column subset preserves order; unknown columns are loud
    cols = [r.column for r in profile_table(df, ["v", "id"]).collect()]
    assert cols == ["v", "id"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        profile_table(df, ["nope"])
    with _pytest.raises(ValueError):
        profile_table(df.select([]))
    # approx mode still returns a sane profile shape
    ap = {r.column: r for r in profile_table(df, approx=True).collect()}
    assert ap["id"].n_nulls == 0 and ap["id"].n_distinct > 0


def test_temperature_mixture_flattens_without_upsampling(spark):
    from hyper_storage_spark.operators import sampling

    # 400 'big' vs 100 'small': T=2 targets shares 2/3 vs 1/3
    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = sampling.temperature_mixture(df, "lang", temperature=2.0)
    counts = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # small is binding (keeps ~everything); big downsamples toward 2x small
    assert counts["small"] >= 95
    assert counts["big"] <= 400
    ratio = counts["big"] / counts["small"]
    assert 1.7 <= ratio <= 2.3  # sqrt(400)/sqrt(100) = 2
    # T=1 keeps the natural distribution (nothing downsamples)
    nat = sampling.temperature_mixture(df, "lang", temperature=1.0)
    assert nat.count() >= 495  # rounding of bucket thresholds only
    # determinism: identical call → identical kept ids
    a = {r.doc_id for r in kept.collect()}
    b = {r.doc_id for r in sampling.temperature_mixture(df, "lang", temperature=2.0).collect()}
    assert a == b
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sampling.temperature_mixture(df, "lang", temperature=0)


def test_hybrid_rrf_union_and_fusion_math(spark):
    from hyper_storage_spark.operators import search

    # doc 1: strong on the query term both ways; doc 4 appears only in
    # the cosine leg via a second term; verify union semantics + exact
    # 1/(60+rank) arithmetic rather than re-deriving the legs.
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "apple cherry"),
            (3, "durian elderberry fig"),
            (4, "banana banana banana"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [("q", "apple banana")], "query_id string, query string"
    )
    fused = {r.doc_id: r for r in search.hybrid_rrf(docs, queries, k=10, leg_k=10).collect()}
    legs_bm = {
        r.doc_id: r.rank for r in search.bm25_topk(docs, queries, k=10).collect()
    }
    legs_cos = {
        r.doc_id: r.rank
        for r in search.tfidf_cosine_topk(docs, queries, k=10).collect()
    }
    assert set(fused) == set(legs_bm) | set(legs_cos)
    for doc_id, row in fused.items():
        expect = 0.0
        if doc_id in legs_bm:
            assert row.bm25_rank == legs_bm[doc_id]
            expect += 1.0 / (60 + legs_bm[doc_id])
        else:
            assert row.bm25_rank is None
        if doc_id in legs_cos:
            assert row.cos_rank == legs_cos[doc_id]
            expect += 1.0 / (60 + legs_cos[doc_id])
        else:
            assert row.cos_rank is None
        assert abs(row.rrf - round(expect, 6)) < 1e-12
    # fused rank is a dense permutation ordered by rrf desc, doc_id asc
    ordered = sorted(fused.values(), key=lambda r: r.rank)
    assert [r.rank for r in ordered] == list(range(1, len(ordered) + 1))
    assert all(
        (a.rrf, -a.doc_id) >= (b.rrf, -b.doc_id)
        for a, b in zip(ordered, ordered[1:])
    )


def test_auc_binary_hand_computed_with_ties(spark):
    from hyper_storage_spark.operators import profiling

    # pos scores {3,2}, neg {1,2}: pairs 3>1, 3>2, 2>1 win, (2,2) ties
    # -> (3 + 0.5) / 4 = 0.875
    df = spark.createDataFrame(
        [(3.0, 1), (2.0, 1), (1.0, 0), (2.0, 0)], "s double, y int"
    )
    row = profiling.auc_binary(df, "s", "y").collect()[0]
    assert (row.n_pos, row.n_neg) == (2, 2)
    assert abs(row.auc - 0.875) < 1e-12
    # perfect separation and its inverse
    perfect = spark.createDataFrame(
        [(float(i), 1 if i >= 5 else 0) for i in range(10)], "s double, y int"
    )
    assert profiling.auc_binary(perfect, "s", "y").collect()[0].auc == 1.0
    inv = perfect.select((-F.col("s")).alias("s"), "y")
    assert profiling.auc_binary(inv, "s", "y").collect()[0].auc == 0.0


def test_chi2_independence_hand_computed(spark):
    from hyper_storage_spark.operators import profiling

    # 2x2 table: (x,u)=10 (x,v)=20 (y,u)=30 (y,v)=40; n=100
    # e = 12/18/28/42 -> chi2 = 4/12+4/18+4/28+4/42 = 125/157.5 ≈ 0.793651
    rows = (
        [("x", "u")] * 10 + [("x", "v")] * 20 + [("y", "u")] * 30 + [("y", "v")] * 40
    )
    df = spark.createDataFrame(rows, "a string, b string")
    got = profiling.chi2_independence(df, "a", "b").collect()[0]
    expect = 4 / 12 + 4 / 18 + 4 / 28 + 4 / 42
    assert got.n == 100 and got.dof == 1
    assert abs(got.chi2 - round(expect, 6)) < 1e-9
    assert abs(got.cramers_v - round((expect / 100) ** 0.5, 6)) < 1e-9
    # independent columns -> chi2 exactly 0 (o == e in every cell)
    indep = spark.createDataFrame(
        [(a, b) for a in ("x", "y") for b in ("u", "v") for _ in range(5)],
        "a string, b string",
    )
    got0 = profiling.chi2_independence(indep, "a", "b").collect()[0]
    assert got0.chi2 == 0.0 and got0.cramers_v == 0.0

    # NULL categories are complete-case excluded (review r12): adding
    # NULL-keyed rows must not change the statistic — before the fix
    # they inflated n while the null-rejecting marginal joins dropped
    # their cells from the sum
    with_nulls = spark.createDataFrame(
        rows + [(None, "u")] * 25 + [("x", None)] * 25 + [(None, None)] * 25,
        "a string, b string",
    )
    gotn = profiling.chi2_independence(with_nulls, "a", "b").collect()[0]
    assert gotn.n == 100 and gotn.dof == 1
    assert gotn.chi2 == got.chi2 and gotn.cramers_v == got.cramers_v


def test_spearman_hand_computed_and_ties(spark):
    from hyper_storage_spark.operators import profiling

    # x=[1,2,3,4], y=[2,1,4,3] -> rho = 12/20 = 0.6 exactly
    df = spark.createDataFrame(
        [("g", 1.0, 2.0), ("g", 2.0, 1.0), ("g", 3.0, 4.0), ("g", 4.0, 3.0)],
        "g string, x double, y double",
    )
    row = profiling.spearman_by_group(df, "g", "x", "y").collect()[0]
    assert row.n == 4 and row.rho == 0.6
    # monotone nonlinear -> exactly 1; inverse -> exactly -1; ties
    # shared between x and y keep rho = 1 via identical midranks
    mono = spark.createDataFrame(
        [("g", float(i), float(i * i)) for i in range(1, 8)],
        "g string, x double, y double",
    )
    assert profiling.spearman_by_group(mono, "g", "x", "y").collect()[0].rho == 1.0
    inv = mono.select("g", "x", (-F.col("y")).alias("y"))
    assert profiling.spearman_by_group(inv, "g", "x", "y").collect()[0].rho == -1.0
    tied = spark.createDataFrame(
        [("g", 1.0, 10.0), ("g", 2.0, 20.0), ("g", 2.0, 20.0), ("g", 3.0, 30.0)],
        "g string, x double, y double",
    )
    assert profiling.spearman_by_group(tied, "g", "x", "y").collect()[0].rho == 1.0


def test_ks_two_sample_hand_computed(spark):
    from hyper_storage_spark.operators import profiling

    # side1 = {1,2}, side2 = {2,3}: ECDF gaps 0.5/0.5/0.0 -> d = 0.5
    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (2.0, 0), (3.0, 0)], "v double, s int"
    )
    row = profiling.ks_two_sample(df, "v", "s").collect()[0]
    assert (row.n1, row.n2) == (2, 2) and row.d == 0.5
    # identical samples -> exactly 0
    same = spark.createDataFrame(
        [(float(i % 5), i % 2) for i in range(20)], "v double, s int"
    )
    assert profiling.ks_two_sample(same, "v", "s").collect()[0].d == 0.0
    # disjoint supports -> exactly 1
    dis = spark.createDataFrame(
        [(float(i), 1) for i in range(5)] + [(float(i + 10), 0) for i in range(5)],
        "v double, s int",
    )
    assert profiling.ks_two_sample(dis, "v", "s").collect()[0].d == 1.0


def test_gini_hand_computed(spark):
    from hyper_storage_spark.operators import profiling

    # x = [1,2,3,4]: sorted Σ i·x = 1+4+9+16 = 30, T = 10, n = 4
    # G = (60 − 5·10)/(4·10) = 0.25
    df = spark.createDataFrame([(1,), (2,), (3,), (4,)], "x long")
    row = profiling.gini(df, "x").collect()[0]
    assert (row.n, row.total) == (4, 10) and row.gini == 0.25
    # perfectly even -> 0; ties must not perturb the identity
    even = spark.createDataFrame([(7,)] * 10, "x long")
    r = profiling.gini(even, "x").collect()[0]
    assert r.gini == 0.0 and r.total == 70
    # one row holds everything -> (n−1)/n
    conc = spark.createDataFrame([(0,)] * 9 + [(100,)], "x long")
    assert profiling.gini(conc, "x").collect()[0].gini == 0.9


def test_mutual_information_hand_computed(spark):
    import math

    from hyper_storage_spark.operators import profiling

    # perfectly dependent 2x2: a==b always -> MI = H = ln 2, NMI = 1
    dep = spark.createDataFrame(
        [("x", "u")] * 5 + [("y", "v")] * 5, "a string, b string"
    )
    row = profiling.mutual_information(dep, "a", "b").collect()[0]
    assert row.n == 10
    assert abs(row.mi - round(math.log(2), 6)) < 1e-9
    assert row.nmi == 1.0
    # independent columns -> MI exactly 0 (every cell o·n == ra·cb)
    indep = spark.createDataFrame(
        [(a, b) for a in ("x", "y") for b in ("u", "v") for _ in range(3)],
        "a string, b string",
    )
    row0 = profiling.mutual_information(indep, "a", "b").collect()[0]
    assert row0.mi == 0.0 and row0.nmi == 0.0
    # NULL categories are complete-case excluded (review r12): same
    # statistic with NULL-keyed rows present
    depn = spark.createDataFrame(
        [("x", "u")] * 5 + [("y", "v")] * 5 + [(None, "u")] * 4 + [("x", None)] * 4,
        "a string, b string",
    )
    rown = profiling.mutual_information(depn, "a", "b").collect()[0]
    assert rown.n == 10 and rown.mi == row.mi and rown.nmi == 1.0


def test_weighted_quantiles_exclude_null_values(spark):
    """review r12: a NULL value's weight must not enter the total or
    the cumulation head — quantiles are over the non-null values."""
    from hyper_storage_spark.operators import profiling

    df = spark.createDataFrame(
        [(None, 100.0), (10.0, 1.0), (20.0, 1.0)], "v double, w double"
    )
    got = profiling.weighted_quantiles(df, "v", "w", qs=(0.75,)).collect()[0]
    assert got.p75 == 20.0  # with the null's weight counted it was 10.0


def test_ols_trend_hand_computed(spark):
    from hyper_storage_spark.operators import profiling

    # perfect line: value = 2·seconds + 5 -> slope_per_day = 2·86400,
    # r2 = 1 (exact: integer inputs survive the milli-floor unchanged)
    rows = [
        ("g", i * 1_000_000, float(2 * i + 5)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, us long, value double").select(
        "g", F.timestamp_micros(F.col("us")).alias("ts"), "value"
    )
    got = profiling.ols_trend(df, "g", "ts", "value").collect()[0]
    assert got.n == 10
    assert got.slope_per_day == round(2.0 * 86400, 6)
    assert got.r2 == 1.0
    # flat series -> slope 0, r2 0/0-free? den_y = 0 -> NaN guard is
    # the caller's concern; use a noisy-but-flat-x-free case instead:
    # anti-correlated perfect line -> slope negative, r2 = 1
    rows = [("g", i * 1_000_000, float(100 - 3 * i)) for i in range(8)]
    df2 = spark.createDataFrame(rows, "g string, us long, value double").select(
        "g", F.timestamp_micros(F.col("us")).alias("ts"), "value"
    )
    got2 = profiling.ols_trend(df2, "g", "ts", "value").collect()[0]
    assert got2.slope_per_day == round(-3.0 * 86400, 6) and got2.r2 == 1.0


def test_spearman_global_matches_grouped_variant(spark):
    from hyper_storage_spark.operators import profiling

    rows = [(float(i % 7), float((i * 3) % 11)) for i in range(60)]
    df = spark.createDataFrame(rows, "x double, y double")
    g = profiling.spearman_by_group(
        df.select(F.lit("g").alias("g"), "x", "y"), "g", "x", "y"
    ).collect()[0]
    glob = profiling.spearman_global(df, "x", "y").collect()[0]
    assert glob.n == g.n == 60
    assert abs(glob.rho - g.rho) < 1e-12
    # hand case: perfect monotone -> 1
    mono = spark.createDataFrame(
        [(float(i), float(i * i)) for i in range(9)], "x double, y double"
    )
    assert profiling.spearman_global(mono, "x", "y").collect()[0].rho == 1.0


def test_collocations_pmi_hand_computed(spark):
    import math

    # "a b" always adjacent (6x), tokens a,b dominate; one doc of
    # noise so PMI is nondegenerate. min_count=5 keeps only (a, b).
    docs = spark.createDataFrame(
        [(i, "a b a b a b") for i in range(2)] + [(9, "x y z")],
        "doc_id long, text string",
    )
    rows = text.collocations_topk(docs, k=5, min_count=5).collect()
    assert [(r.w1, r.w2) for r in rows] == [("a", "b")]
    r = rows[0]
    # pairs: per doc [ab, ba, ab, ba, ab] -> ab=6, ba=4 across 2 docs,
    # plus xy, yz -> nb = 12; unigrams: a=6, b=6, x=y=z=1 -> nu = 15
    assert r.n_pair == 6
    pmi = math.log((6 / 12) / ((6 / 15) * (6 / 15)))
    assert abs(r.pmi - round(pmi, 6)) < 1e-9


def test_lexical_diversity_hand_computed(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "x y z w"), (3, "  ")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in text.lexical_diversity(docs).collect()}
    # doc 1: counts {a:2, b:1}; H = -(2/3 ln 2/3 + 1/3 ln 1/3)
    h1 = -(2 / 3 * math.log(2 / 3) + 1 / 3 * math.log(1 / 3))
    assert got[1].n_tokens == 3 and got[1].n_types == 2
    assert abs(got[1].ttr - round(2 / 3, 6)) < 1e-9
    assert abs(got[1].entropy - round(h1, 6)) < 1e-9
    # doc 2: all distinct -> H = ln 4, TTR = 1
    assert got[2].ttr == 1.0 and abs(got[2].entropy - round(math.log(4), 6)) < 1e-9
    # doc 3: tokenless -> zero counts, NULL stats (never dropped)
    assert got[3].n_tokens == 0 and got[3].ttr is None and got[3].entropy is None


def test_zipf_alpha_hand_computed(spark):
    import math

    # token counts: a=8, b=5, c=2 -> tail (>=5) = {a, b}
    # alpha = 1 + 2 / (ln(8/5) + ln(5/5))
    docs = spark.createDataFrame(
        [(1, " ".join(["a"] * 8 + ["b"] * 5 + ["c"] * 2))],
        "doc_id long, text string",
    )
    r = text.zipf_alpha(docs, xmin=5).collect()[0]
    assert (r.n_tail, r.xmin) == (2, 5)
    assert abs(r.alpha - round(1 + 2 / math.log(8 / 5), 6)) < 1e-9


def test_transition_matrix_hand_computed(spark):
    from hyper_storage_spark.operators import funnel as funnel_ops

    # user 1: A->B->A ; user 2: B->B
    rows = [
        (1, 1, 0, "A"), (1, 2, 1, "B"), (1, 3, 2, "A"),
        (2, 4, 0, "B"), (2, 5, 1, "B"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts long, event_type string")
    got = {
        (r.from_type, r.to_type): (r.n, r.p)
        for r in funnel_ops.transition_matrix(df).collect()
    }
    assert got[("A", "B")] == (1, 1.0)          # A row: only A->B
    assert got[("B", "A")] == (1, 0.5)          # B row: B->A and B->B
    assert got[("B", "B")] == (1, 0.5)
    assert ("A", "A") not in got


def test_welch_ttest_hand_computed(spark):
    # side1 = [10, 12], side2 = [8, 8]: m1=11 v1=2, m2=8 v2=0
    # t = 3/sqrt(2/2 + 0) = 3; pooled sd = sqrt(2/2) = 1 -> d = 3
    from hyper_storage_spark.operators import profiling

    df = spark.createDataFrame(
        [(10.0, 1), (12.0, 1), (8.0, 0), (8.0, 0)], "v double, s int"
    )
    r = profiling.welch_ttest(df, "v", "s").collect()[0]
    assert (r.n1, r.n2) == (2, 2)
    assert r.mean_diff == 3.0 and r.t_stat == 3.0 and r.cohens_d == 3.0


def test_psi_hand_computed_and_identical_distributions(spark):
    import math

    from hyper_storage_spark.operators import profiling

    # identical ref/target -> every bin's p == q -> psi exactly 0
    same = spark.createDataFrame(
        [(float(i % 20), s) for i in range(200) for s in (0, 1)], "v double, s int"
    )
    r = profiling.psi(same, "v", "s", bins=10).collect()[0]
    assert (r.n_ref, r.n_tgt) == (200, 200) and r.psi == 0.0
    # 2-bin hand case: ref uniform on [0,1), target all-left
    rows = [(0.1, 1), (0.9, 1), (0.1, 0), (0.2, 0)]
    df = spark.createDataFrame(rows, "v double, s int")
    got = profiling.psi(df, "v", "s", bins=2).collect()[0]
    # ref median .5 -> ref bins (1,1); target bins (2,0); +0.5 smoothing,
    # denominators n+1
    p = [(1 + 0.5) / 3, (1 + 0.5) / 3]
    q = [(2 + 0.5) / 3, (0 + 0.5) / 3]
    want = sum((a - b) * math.log(a / b) for a, b in zip(p, q))
    assert abs(got.psi - round(want, 6)) < 1e-9


def test_calibration_bins_hand_computed(spark):
    from hyper_storage_spark.operators import profiling

    # scores 0..9, label = score >= 5; bins=2 -> median 4.5 edge
    rows = [(float(i), 1 if i >= 5 else 0) for i in range(10)]
    df = spark.createDataFrame(rows, "s double, y int")
    got = {r.bin: r for r in profiling.calibration_bins(df, "s", "y", bins=2).collect()}
    assert got[0].n == 5 and got[0].frac_pos == 0.0 and got[0].mean_score == 2.0
    assert got[1].n == 5 and got[1].frac_pos == 1.0 and got[1].mean_score == 7.0


def test_ngram_novelty_boundaries(spark):
    from hyper_storage_spark.queries import all_specs
    import tempfile

    # identical docs -> novelty 0; a unique doc -> novelty 1; short doc
    # -> zero shingles with NULL novelty. Drive the operator via its
    # catalog fn against a scratch parquet dir shaped like documents.
    rows = [
        (1, "one two three four", "en", "s", 18),
        (2, "one two three four", "en", "s", 18),
        (3, "five six seven eight", "en", "s", 20),
        (4, "hi", "en", "s", 2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    d = tempfile.mkdtemp(prefix="novelty_")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r.doc_id: r for r in all_specs()["text_ngram_novelty"].fn(spark, d).collect()}
    assert got[1].novelty == 0.0 and got[2].novelty == 0.0
    assert got[3].novelty == 1.0
    assert got[4].n_shingles == 0 and got[4].novelty is None


def test_cosine_topk_excludes_zero_norm_vectors(spark):
    # a zero vector has undefined cosine: it must not appear as a
    # NULL-scored neighbor, and a zero-vector query returns no rows
    import random as _random

    rnd = _random.Random(3)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(8)]) for i in range(6)]
    rows.append((6, [0.0] * 8))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.cosine_topk(emb, [0, 6], k=10).collect()
    assert all(r.neighbor_id != 6 for r in out)
    assert all(r.query_id != 6 for r in out)
    assert all(r.cosine is not None for r in out)
    assert {r.query_id for r in out} == {0}


def test_ann_join_excludes_zero_norm_vectors(spark):
    import random as _random

    rnd = _random.Random(4)
    corpus = [(i, [rnd.gauss(0, 1) for _ in range(8)]) for i in range(20)]
    corpus.append((99, [0.0] * 8))
    queries = [(0, corpus[0][1]), (1, [0.0] * 8)]
    cdf = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame(queries, "vec_id long, embedding array<double>")
    out = similarity.cosine_join_topk(cdf, qdf, k=5).collect()
    assert all(r.neighbor_id != 99 and r.cosine is not None for r in out)
    assert {r.query_id for r in out} == {0}


def test_profiling_integer_sums_survive_int64_overflow(spark):
    # magnitudes crafted so the OLD bigint accumulation wraps: the
    # decimal(38,0) path must return the exact value instead
    from hyper_storage_spark.operators import profiling

    # gini: v ~ 2^40 over 20k distinct rows → Σ v·(a+b)·c ≈ 4.4e20 > int64
    n, v0 = 20_000, 1 << 40
    g = spark.range(n).select((F.lit(v0) + F.col("id")).alias("v"))
    row = profiling.gini(g, "v").collect()[0]
    xs = [v0 + i for i in range(n)]
    tot = sum(xs)
    s2 = sum((i + 1) * x for i, x in enumerate(xs)) * 2
    want = (s2 - (n + 1) * tot) / (n * tot)
    assert row.n == n and row.total == tot
    assert abs(row.gini - want) < 1e-9

    # ols_trend: y ≈ 3e12·1000 = 3e15 → a SINGLE y² ≈ 9e30 >> int64
    rows = [("g", f"2024-01-0{d+1} 00:00:00", 3.0e12 + d * 1.0e9) for d in range(5)]
    df = spark.createDataFrame(rows, "g string, ts string, v double").select(
        "g", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    t = profiling.ols_trend(df, "g", "ts", "v").collect()[0]
    assert t.n == 5 and abs(t.slope_per_day - 1.0e9) / 1.0e9 < 1e-6
    assert abs(t.r2 - 1.0) < 1e-9

    # welch: y² per row > int64 AND the FIRST-order Σy wraps too —
    # 4000 rows × 3e15 milli-units ≈ 1.2e19 > 2^63 (the second-pass
    # review finding: the squares were decimal, s1/s2 still bigint)
    wrows = [(3.0e12 + i, 1) for i in range(4000)] + [
        (3.0e12 - 7.0e8 + i, 0) for i in range(4000)
    ]
    wdf = spark.createDataFrame(wrows, "v double, side int")
    w = profiling.welch_ttest(wdf, "v", "side").collect()[0]
    assert w.n1 == 4000 and w.n2 == 4000
    assert abs(w.mean_diff - 7.0e8) / 7.0e8 < 1e-6


def test_minhash_params_for_sizing_curve():
    # selectivity (rows per band) must grow with the corpus, recall at
    # j_detect must hold by the S-curve for every returned pair, and
    # the signature cap must bound the growth
    sizes = [100, 1_000, 50_000, 5_000_000]
    rows_seq = []
    for n in sizes:
        nh, b = dedup.minhash_params_for(n)
        assert nh % b == 0 and nh <= 128
        r = nh // b
        rows_seq.append(r)
        jd = 0.75  # default j_detect for threshold 0.5
        assert 1 - (1 - jd**r) ** b >= 0.9 - 1e-9  # certified recall
    assert rows_seq == sorted(rows_seq)  # monotone selectivity
    assert rows_seq[-1] > rows_seq[0]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup.minhash_params_for(1000, threshold=0.5, background_j=0.6)
    with _pytest.raises(ValueError):
        dedup.minhash_params_for(1000, threshold=0.9, j_detect=0.5)


def test_simhash_hamming_budget_curve():
    # bigger corpus -> narrower affordable threshold; tiny corpus
    # affords wide ones; never negative; occupancy bound honored
    assert dedup.simhash_hamming_budget(100) >= dedup.simhash_hamming_budget(50_000)
    assert dedup.simhash_hamming_budget(50_000) >= dedup.simhash_hamming_budget(10**9)
    assert dedup.simhash_hamming_budget(10**12) >= 0
    h = dedup.simhash_hamming_budget(1_000_000, target_occupancy=128)
    w = 64 // (h + 1)
    assert 1_000_000 / (2**w) <= 128


def test_minhash_auto_params_match_fixed_output(spark, sf_dir):
    # the auto-sized banding must keep the verify contract: identical
    # verified pair set as the fixed default on the same corpus (the
    # exact-Jaccard verify makes precision 1.0; recall certified by
    # the S-curve at j_detect, and on this corpus the sets coincide)
    d = docs(spark, sf_dir)
    nh, b = dedup.minhash_params_for(d.count())
    auto = {(r.a_id, r.b_id) for r in dedup.minhash_lsh_pairs(d, threshold=0.5, num_hashes=nh, bands=b).collect()}
    exact = {(r.a_id, r.b_id) for r in dedup.ngram_jaccard_pairs(d, threshold=0.5).collect()}
    assert auto <= exact
    if exact:
        assert len(auto) / len(exact) >= 0.9


def test_salted_aggregate_auto_salt(spark):
    # salt="auto" resolves through skew_report's suggestion and the
    # values stay identical to the direct aggregation
    rows = [("hot", i * 1.0) for i in range(300)] + [(f"k{i}", 1.0) for i in range(30)]
    df = spark.createDataFrame(rows, "k string, v double")
    assert skew.auto_salt(df, ["k"]) > 1  # the hot key demands salting
    even = spark.createDataFrame([(f"k{i%10}", 1.0) for i in range(100)], "k string, v double")
    assert skew.auto_salt(even, ["k"]) == 1  # no skew -> don't salt
    got = {
        r.k: (r.sum_v, r.n)
        for r in skew.salted_aggregate(df, ["k"], sum_cols=["v"], salt_buckets="auto").collect()
    }
    want = {
        r.k: (r.s, r.n)
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("n")).collect()
    }
    assert got == want
    j = skew.salted_join(df, spark.createDataFrame([("hot", "H")], "k string, lab string"),
                         ["k"], salt_buckets="auto")
    assert j.count() == 300


def test_pq_topk_recall_and_determinism(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 10, 20]
    exact = {(r.query_id, r.neighbor_id) for r in similarity.cosine_topk(emb, qids, k=10).collect()}
    a = [(r.query_id, r.neighbor_id, r.rank, r.cosine) for r in similarity.pq_topk(emb, qids, k=10).collect()]
    b = [(r.query_id, r.neighbor_id, r.rank, r.cosine) for r in similarity.pq_topk(emb, qids, k=10).collect()]
    assert sorted(a) == sorted(b)  # seeded codebooks + hash-free ADC
    got = {(q, n) for q, n, _, _ in a}
    assert len(got & exact) / len(exact) >= 0.9
    # re-ranked scores are the EXACT cosines for the pairs both found
    exact_sc = {(r.query_id, r.neighbor_id): r.cosine
                for r in similarity.cosine_topk(emb, qids, k=10).collect()}
    for q, n, _, c in a:
        if (q, n) in exact_sc:
            assert abs(c - exact_sc[(q, n)]) < 1e-9


def test_pq_encode_shapes_and_zero_norm(spark):
    import random as _random

    rnd = _random.Random(11)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(16)]) for i in range(40)]
    rows.append((99, [0.0] * 16))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = similarity.pq_train(emb, m=4, n_codes=8, sample_rows=40)
    assert cb.shape == (4, 8, 4)
    enc = similarity.pq_encode(emb, cb).collect()
    assert all(len(r.codes) == 4 and all(0 <= c < 8 for c in r.codes) for r in enc)
    assert all(r.vec_id != 99 for r in enc)  # zero-norm gets no codes row
    with __import__("pytest").raises(ValueError, match="divisible"):
        similarity.pq_train(emb, m=5, n_codes=8, sample_rows=40)


def test_leakage_safe_split_colocates_near_duplicates(spark, sf_dir):
    from hyper_storage_spark.operators import sampling

    d = docs(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(d, threshold=0.5, max_df=100)
    out = sampling.leakage_safe_split(d, pairs, {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = {r.doc_id: (r.canonical_id, r.split) for r in out.collect()}
    assert len(rows) == d.count()  # exhaustive, one row per doc
    # THE invariant: every near-dup pair lands on the same side
    for p in pairs.collect():
        assert rows[p.a_id][1] == rows[p.b_id][1], (p.a_id, p.b_id)
        assert rows[p.a_id][0] == rows[p.b_id][0]
    # deterministic across runs
    again = {r.doc_id: r.split for r in
             sampling.leakage_safe_split(d, pairs, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert again == {k: v[1] for k, v in rows.items()}
    # fractions roughly honored (families quantize the draw, so wide band)
    n = len(rows)
    train = sum(1 for _, s in rows.values() if s == "train")
    assert 0.7 * n <= train <= 0.9 * n
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sum to 1"):
        sampling.leakage_safe_split(d, pairs, {"train": 0.5})


def test_leakage_split_routed_twin_matches_uncapped_exact(spark, sf_dir):
    """q_leakage_split_routed's premise, pinned engine-side: feeding
    leakage_safe_split from minhash_lsh_pairs yields the IDENTICAL
    assignment as the uncapped exact pair graph (recall-1.0 banding +
    exact verify ⇒ equal pair sets ⇒ equal components ⇒ equal md5
    draws). Also pins that the routed oracle actually swapped the
    pair CTE — a silent no-op replace would gate the wrong SQL."""
    from hyper_storage_spark import queries as Q
    from hyper_storage_spark.operators import sampling

    assert Q._LEAKAGE_SPLIT_ROUTED_SQL != Q._LEAKAGE_SPLIT_SQL
    assert "HAVING COUNT(*) <= 100" not in Q._LEAKAGE_SPLIT_ROUTED_SQL
    d = docs(spark, sf_dir)
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    routed = {
        r.doc_id: (r.canonical_id, r.split)
        for r in sampling.leakage_safe_split(
            d, dedup.minhash_lsh_pairs(d, threshold=0.5), fr
        ).collect()
    }
    exact = {
        r.doc_id: (r.canonical_id, r.split)
        for r in sampling.leakage_safe_split(
            d, dedup.ngram_jaccard_pairs(d, threshold=0.5), fr
        ).collect()
    }
    assert routed == exact


def test_seasonality_and_autocorrelation_hand_pinned(spark):
    # hand-computable fixture: 3 events Mon 01:00, 1 event Tue 02:00
    # over two weeks -> cells (Mon,1)=6, (Tue,2)=2; mean cell = 4
    from hyper_storage_spark.operators import timeseries as ts_ops

    rows = []
    for week in (0, 1):
        for _ in range(3):
            rows.append((f"2024-01-{8 + 7 * week:02d} 01:30:00",))
        rows.append((f"2024-01-{9 + 7 * week:02d} 02:30:00",))
    ev = spark.createDataFrame(rows, "ts string").select(F.col("ts").cast("timestamp").alias("ts"))
    prof = {(r.dow, r.hod): (r.n, r.seasonal_index) for r in ts_ops.seasonality_profile(ev).collect()}
    assert prof[(2, 1)] == (6, 1.5)  # Monday=2 in Spark's convention
    assert prof[(3, 2)] == (2, 0.5)

    # perfectly alternating daily counts 1,3,1,3,... -> lag-1 acf = -1
    alt = []
    for day in range(1, 11):
        n = 1 if day % 2 else 3
        alt += [(f"2024-02-{day:02d} 00:00:00",)] * n
    ev2 = spark.createDataFrame(alt, "ts string").select(F.col("ts").cast("timestamp").alias("ts"))
    row = ts_ops.lag_autocorrelation(ev2).collect()[0]
    assert row.n_pairs == 9 and abs(row.acf - (-1.0)) < 1e-9
    # constant series: zero variance -> NULL acf (0/0), never a crash
    const = spark.createDataFrame([(f"2024-03-{d:02d} 00:00:00",) for d in range(1, 6)], "ts string").select(
        F.col("ts").cast("timestamp").alias("ts")
    )
    assert ts_ops.lag_autocorrelation(const).collect()[0].acf is None
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ts_ops.lag_autocorrelation(ev2, lag_days=0)


def test_pq_train_sample_unbiased_on_clustered_corpus(spark):
    # A corpus SORTED by cluster (the common post-ingest layout): a bare
    # limit() would train codebooks on whichever partitions answer
    # first — one cluster only — and recall on the other cluster would
    # collapse. The hash-ordered sample must stay corpus-representative
    # AND byte-identical across partition layouts.
    import random as _random

    import numpy as np

    rnd = _random.Random(5)
    rows = []
    for i in range(400):
        center = 10.0 if i < 200 else -10.0  # two far-apart clusters, id-sorted
        rows.append((i, [center + rnd.gauss(0, 0.5) for _ in range(8)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartitionByRange(8, "vec_id")
    cb1 = similarity.pq_train(emb, m=2, n_codes=8, sample_rows=64)
    cb2 = similarity.pq_train(emb.repartition(3, "embedding"), m=2, n_codes=8, sample_rows=64)
    assert np.array_equal(cb1, cb2)  # content-deterministic, layout-free
    # representative: both clusters appear in the codebooks (a biased
    # sample would put every centroid near one cluster's sign)
    signs = {1 if c[0] > 0 else -1 for c in cb1[0]}
    assert signs == {1, -1}
    # and search recall holds for queries in BOTH clusters
    exact = {(r.query_id, r.neighbor_id) for r in similarity.cosine_topk(emb, [0, 399], k=10).collect()}
    got = {(r.query_id, r.neighbor_id)
           for r in similarity.pq_topk(emb, [0, 399], k=10, m=2, n_codes=16,
                                       refine=32, sample_rows=64).collect()}
    assert len(got & exact) / len(exact) >= 0.9


def test_pq_index_reuse_append_and_roundtrip(spark, sf_dir):
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 10, 20]
    # index reuse ≡ the from-scratch convenience face (pq_topk builds
    # the identical index internally — search must not depend on WHEN
    # the index was built)
    idx = similarity.pq_index(emb)
    via_index = sorted(
        (r.query_id, r.neighbor_id, r.rank, r.cosine)
        for r in similarity.pq_search(idx, emb, qids, k=10).collect()
    )
    from_scratch = sorted(
        (r.query_id, r.neighbor_id, r.rank, r.cosine)
        for r in similarity.pq_topk(emb, qids, k=10).collect()
    )
    assert via_index == from_scratch
    # searching the same index twice retrains nothing and returns the
    # same rows (codebooks are frozen state, encode is deterministic)
    again = sorted(
        (r.query_id, r.neighbor_id, r.rank, r.cosine)
        for r in similarity.pq_search(idx, emb, qids, k=10).collect()
    )
    assert again == via_index
    # append ≡ one-shot encode under the same codebooks
    boot = emb.filter(F.pmod(F.col("vec_id"), F.lit(10)) != 7)
    batch = emb.filter(F.pmod(F.col("vec_id"), F.lit(10)) == 7)
    bidx = similarity.pq_index(boot)
    appended = similarity.pq_append(bidx, batch)
    oneshot = similarity.PQIndex(bidx.codebooks, similarity.pq_encode(emb, bidx.codebooks))
    a = sorted((r.query_id, r.neighbor_id, r.rank, r.cosine)
               for r in similarity.pq_search(appended, emb, qids, k=10).collect())
    b = sorted((r.query_id, r.neighbor_id, r.rank, r.cosine)
               for r in similarity.pq_search(oneshot, emb, qids, k=10).collect())
    assert a == b
    # codebooks round-trip through their parquet-persistable table form
    back = similarity.pq_codebooks_from_table(similarity.pq_codebook_table(spark, bidx.codebooks))
    assert np.array_equal(back, bidx.codebooks)


def test_contamination_radius_bfs_semantics(spark):
    # chain 1-2-3-4-5 plus a shortcut 1-4: BFS distances from seed {1}
    # must be min-hop (4 reached at hop 1 via the shortcut, not 3),
    # the radius bound must hold (5 at hop 2; nothing past max_hops),
    # and an isolated seed stays at hop 0
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4)], "a_id long, b_id long"
    )
    seeds = spark.createDataFrame([(1,), (99,)], "doc_id long")
    got = {r.doc_id: r.hops for r in dedup.contamination_radius(pairs, seeds, max_hops=2).collect()}
    assert got == {1: 0, 99: 0, 2: 1, 4: 1, 3: 2, 5: 2}
    # max_hops=0 returns exactly the seed set
    got0 = {r.doc_id: r.hops for r in dedup.contamination_radius(pairs, seeds, max_hops=0).collect()}
    assert got0 == {1: 0, 99: 0}
    with __import__("pytest").raises(ValueError, match="max_hops"):
        dedup.contamination_radius(pairs, seeds, max_hops=-1)


def test_ivfpq_topk_recall_and_contract(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 10, 20]
    exact = {(r.query_id, r.neighbor_id) for r in similarity.cosine_topk(emb, qids, k=10).collect()}
    a = [(r.query_id, r.neighbor_id, r.rank, r.cosine)
         for r in similarity.ivfpq_topk(emb, qids, k=10, n_cells=16, n_probe=10).collect()]
    b = [(r.query_id, r.neighbor_id, r.rank, r.cosine)
         for r in similarity.ivfpq_topk(emb, qids, k=10, n_cells=16, n_probe=10).collect()]
    assert sorted(a) == sorted(b)  # seeded cells + codebooks, hash-ordered sample
    got = {(q, n) for q, n, _, _ in a}
    assert len(got & exact) / len(exact) >= 0.9
    # re-ranked scores are exact cosines for pairs both found
    exact_sc = {(r.query_id, r.neighbor_id): r.cosine
                for r in similarity.cosine_topk(emb, qids, k=10).collect()}
    for q, n, _, c in a:
        if (q, n) in exact_sc:
            assert abs(c - exact_sc[(q, n)]) < 1e-9
    # family contracts: unknown query -> empty frame; bad m -> error
    assert similarity.ivfpq_topk(emb, [99999], k=5).count() == 0
    with __import__("pytest").raises(ValueError, match="divisible"):
        similarity.ivfpq_topk(emb, qids, k=5, m=5)


def test_holt_linear_hand_computed(spark):
    from hyper_storage_spark.operators import timeseries

    # y = [10, 12, 14], alpha=0.5, beta=0.25, l0=10, b0=0:
    #  t1: l=0.5*12+0.5*(10+0)=11;   b=0.25*(11-10)+0.75*0=0.25
    #  t2: l=0.5*14+0.5*(11.25)=12.625; b=0.25*(12.625-11)+0.75*0.25=0.59375
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 12.0), ("a", 3, 14.0), ("b", 1, 5.0)],
        "k string, t int, y double",
    )
    out = {r.k: r for r in timeseries.holt_linear(df, ["k"], "t", "y").collect()}
    assert out["a"].n == 3
    assert out["a"].level == 12.625 and out["a"].trend == 0.59375
    assert out["a"].forecast == 12.625 + 0.59375
    # single-point series: level = y0, no trend, forecast = y0
    assert (out["b"].n, out["b"].level, out["b"].trend) == (1, 5.0, 0.0)
    # order independence of input row order (the fold sorts per key)
    df2 = spark.createDataFrame(
        [("a", 3, 14.0), ("a", 1, 10.0), ("a", 2, 12.0)], "k string, t int, y double"
    )
    out2 = timeseries.holt_linear(df2, ["k"], "t", "y").collect()[0]
    assert (out2.level, out2.trend) == (12.625, 0.59375)


def test_ivfpq_index_reuse_and_append(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 10, 20]
    idx = similarity.ivfpq_index(emb)
    via_index = sorted(
        (r.query_id, r.neighbor_id, r.rank, r.cosine)
        for r in similarity.ivfpq_search(idx, emb, qids, k=10, n_probe=10).collect()
    )
    # index reuse == the from-scratch convenience face
    from_scratch = sorted(
        (r.query_id, r.neighbor_id, r.rank, r.cosine)
        for r in similarity.ivfpq_topk(emb, qids, k=10, n_probe=10).collect()
    )
    assert via_index == from_scratch
    # append with frozen cells+codebooks == one-shot bulk encode
    boot = emb.filter(F.pmod(F.col("vec_id"), F.lit(10)) != 7)
    batch = emb.filter(F.pmod(F.col("vec_id"), F.lit(10)) == 7)
    bidx = similarity.ivfpq_index(boot)
    appended = similarity.ivfpq_append(bidx, batch)
    oneshot = similarity.IVFPQIndex(
        bidx.centroids, bidx.codebooks, similarity.ivfpq_encode(bidx, emb)
    )
    a = sorted((r.query_id, r.neighbor_id, r.rank, r.cosine)
               for r in similarity.ivfpq_search(appended, emb, qids, k=10, n_probe=12).collect())
    b = sorted((r.query_id, r.neighbor_id, r.rank, r.cosine)
               for r in similarity.ivfpq_search(oneshot, emb, qids, k=10, n_probe=12).collect())
    assert a == b


def test_pq_train_falls_back_to_vector_hash_without_id_col(spark):
    """Round-10 ADVICE closure: pq_train now draws its sample through
    the shared _hash_ordered_sample, which hashes the VECTOR when the
    frame carries no id column — a frame lacking vec_id must train
    (previous rounds raised AnalysisException), deterministically
    across partition layouts, and agree with the ivfpq family's
    discipline by construction (same helper)."""
    import random as _random

    import numpy as np

    rnd = _random.Random(7)
    rows = [([rnd.gauss(0, 1.0) for _ in range(8)],) for _ in range(200)]
    emb = spark.createDataFrame(rows, "embedding array<double>")
    cb1 = similarity.pq_train(emb, m=2, n_codes=4, sample_rows=64)
    cb2 = similarity.pq_train(emb.repartition(5), m=2, n_codes=4, sample_rows=64)
    assert cb1.shape == (2, 4, 4)
    assert np.array_equal(cb1, cb2)


def test_pq_family_query_batch_ceiling(spark):
    """The fixed-query-batch ANN faces hold a queries×m×n_codes LUT
    tensor on the driver and in every task closure — a caller passing
    an unbounded id list must fail LOUDLY (naming ann_join as the
    distributed alternative) instead of OOMing the driver. The guard
    fires BEFORE any collect: no Spark job may run for a rejected
    batch."""
    import pytest as _pytest

    idx_stub = object.__new__(similarity.PQIndex)
    ividx_stub = object.__new__(similarity.IVFPQIndex)
    too_many = list(range(similarity.MAX_QUERY_BATCH + 1))
    emb = spark.createDataFrame([(0, [1.0, 0.0])], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError, match="ann_join"):
        similarity.pq_search(idx_stub, emb, too_many)
    with _pytest.raises(ValueError, match="ann_join"):
        similarity.ivfpq_search(ividx_stub, emb, too_many)


def test_ivfpq_params_sizing_curve():
    """ivfpq_params_for pins the sizing discipline: occupancy bounded
    (or cells capped), cells/probes monotone in the corpus, probed
    FRACTION non-increasing (the flat-PQ-advantage invariant), sample
    covering the centroid count, and gate-size corpora keeping the
    family defaults so contract entries are unchanged by sizing."""
    prev_cells, prev_frac = 0, 1.0
    for rows in (1_000, 65_536, 500_000, 5_000_000, 50_000_000, 1_000_000_000):
        n_cells, n_probe, sample = similarity.ivfpq_params_for(rows)
        assert rows / n_cells <= 4096 or n_cells == 65_536, (rows, n_cells)
        assert n_cells >= prev_cells
        frac = n_probe / n_cells
        assert frac <= prev_frac + 1e-12, (rows, frac, prev_frac)
        assert sample >= min(32 * n_cells, 262_144) and sample >= 4096
        assert sample <= 262_144
        prev_cells, prev_frac = n_cells, frac
    # gate sizes return the family defaults — sizing never perturbs
    # the oracle-gated contract entries
    assert similarity.ivfpq_params_for(5_000) == (16, 8, 4096)
    assert similarity.ivfpq_params_for(65_536) == (16, 8, 4096)


def test_ranking_metrics_hand_computed(spark):
    """A symmetric formula bug can hide behind the oracle (both sides
    computing the same wrong thing 'match'), so the metric definitions
    are pinned by hand: run q1 = [d1(rel 3, rank 1), d2(rel 0, rank 2),
    d3(rel 1, rank 3)], qrels also hold an unretrieved d9(rel 2).
    DCG@3 = 3/log2(2) + 0 + 1/log2(4) = 3.5; ideal grades [3,2,1] give
    IDCG = 3 + 2/log2(3) + 0.5 = 4.761859507142915; q2 retrieves no
    positives -> all zeros with positives=1."""
    import math

    from hyper_storage_spark.operators import search

    run = spark.createDataFrame(
        [("q1", "d1", 1), ("q1", "d2", 2), ("q1", "d3", 3), ("q2", "d1", 1), ("q2", "d2", 2)],
        "query_id string, doc_id string, rank int",
    )
    qrels = spark.createDataFrame(
        [("q1", "d1", 3), ("q1", "d3", 1), ("q1", "d9", 2), ("q2", "d5", 1)],
        "query_id string, doc_id string, rel int",
    )
    rows = {r.query_id: r for r in search.ranking_metrics(run, qrels, k=3).collect()}
    q1 = rows["q1"]
    idcg = 3.0 + 2.0 / math.log2(3) + 1.0 * 0.5
    assert abs(q1.ndcg - 3.5 / idcg) < 1e-12
    assert q1.mrr == 1.0 and q1.hits == 2 and q1.positives == 3
    assert abs(q1.precision - 2 / 3) < 1e-12 and abs(q1.recall - 2 / 3) < 1e-12
    q2 = rows["q2"]
    assert q2.ndcg == 0.0 and q2.mrr == 0.0 and q2.hits == 0 and q2.positives == 1
    # rows past the cutoff are ignored: at k=1 only d1 counts
    r1 = {r.query_id: r for r in search.ranking_metrics(run, qrels, k=1).collect()}["q1"]
    assert r1.hits == 1 and r1.precision == 1.0 and abs(r1.ndcg - 1.0) < 1e-12


def test_cluster_stats_hand_computed(spark):
    """cluster_stats histogram pinned by hand: components {1,2,3},
    {10,11}, {20,21} -> one size-3 cluster (2 removable) and two
    size-2 clusters (1 removable each)."""
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20), (21, 20)],
        "doc_id long, cluster_id long",
    )
    rows = {r.cluster_size: r for r in dedup.cluster_stats(clusters).collect()}
    assert rows[3].n_clusters == 1 and rows[3].n_docs == 3 and rows[3].removable == 2
    assert rows[2].n_clusters == 2 and rows[2].n_docs == 4 and rows[2].removable == 2
    assert set(rows) == {2, 3}


def test_cusum_changepoint_hand_computed(spark):
    """CUSUM pinned by hand: daily counts [2,2,2,8,8] (n=5, total=22).
    S_i·n = 5·P_i − i·22: i=1: −12, i=2: −24, i=3: −36, i=4: −18,
    i=5: 0 → max |S| at i=3 (the last low day), the level shift
    boundary. mean_before = 6/3 = 2, mean_after = 16/2 = 8."""
    from hyper_storage_spark.operators import timeseries as ts_ops

    rows = []
    for d, cnt in [(1, 2), (2, 2), (3, 2), (4, 8), (5, 8)]:
        rows += [(f"2024-03-0{d} 0{h}:00:00",) for h in range(cnt)]
    ev = spark.createDataFrame(rows, "ts string").select(
        F.col("ts").cast("timestamp").alias("ts")
    )
    r = ts_ops.cusum_changepoint(ev).collect()[0]
    assert str(r.change_day).startswith("2024-03-03")
    assert r.n_days == 5 and r.total == 22 and r.scaled_score == 36
    assert r.mean_before == 2.0 and r.mean_after == 8.0
    # degenerate single-day series: changepoint at the only day,
    # no "after" segment -> NULL, never DIVIDE_BY_ZERO
    one = spark.createDataFrame([("2024-03-01 01:00:00",)], "ts string").select(
        F.col("ts").cast("timestamp").alias("ts")
    )
    r1 = ts_ops.cusum_changepoint(one).collect()[0]
    assert r1.scaled_score == 0 and r1.mean_after is None


def test_pagerank_hand_computed(spark):
    """PageRank pinned by hand on the classic 3-node graph
    (1->2, 1->3, 2->3, 3->1), one iteration from the uniform start:
    v(1) = t + d*(p/1)        [all of 3's mass]
    v(2) = t + d*(p/2)        [half of 1's]
    v(3) = t + d*(p/2 + p/1)  [half of 1's + all of 2's]
    with p = 1/3, d = 0.85, t = (1-d)/3. Plus the dangling variant
    (edges 1->2 only): node 2 has no out-edges, so after one round
    node 1 holds ONLY the teleport term — dangling mass is dropped,
    the documented no-redistribution variant."""
    from hyper_storage_spark.operators import graph as graph_ops

    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 1)], "src long, dst long"
    )
    got = {r.node: r.val for r in graph_ops.pagerank(e, iters=1).collect()}
    p, d = 1.0 / 3, 0.85
    t = (1.0 - d) / 3
    assert abs(got[1] - (t + d * p)) < 1e-15
    assert abs(got[2] - (t + d * (p / 2))) < 1e-15
    assert abs(got[3] - (t + d * (p / 2 + p))) < 1e-15
    # mass conservation on a dangling-free graph: sums to 1 each round
    got8 = {r.node: r.val for r in graph_ops.pagerank(e, iters=8).collect()}
    assert abs(sum(got8.values()) - 1.0) < 1e-9
    dang = spark.createDataFrame([(1, 2)], "src long, dst long")
    gd = {r.node: r.val for r in graph_ops.pagerank(dang, iters=1).collect()}
    td = (1.0 - d) / 2
    assert gd[1] == td  # teleport only: 2's mass is dropped, not recycled
    assert abs(gd[2] - (td + d * 0.5)) < 1e-15


def test_personalized_pagerank_hand_computed(spark):
    """Personalized PageRank pinned by hand on 1->2, 2->1, 2->3 with
    seed {1}: start val(1)=1, others 0. One iteration:
    v(1) = 0.15 + 0.85*(val2/2) = 0.15 (val2 starts 0)
    v(2) = 0.85*(val1/1) = 0.85 (non-seed: no teleport term)
    v(3) = 0.85*(val2/2) = 0.0
    Seeds outside the graph are ignored; an all-foreign seed set
    raises."""
    import pytest as _pytest

    from hyper_storage_spark.operators import graph as graph_ops

    e = spark.createDataFrame([(1, 2), (2, 1), (2, 3)], "src long, dst long")
    seeds = spark.createDataFrame([(1,), (99,)], "node long")  # 99 not in graph
    got = {r.node: r.val for r in graph_ops.pagerank(e, iters=1, seeds=seeds).collect()}
    assert got[1] == 0.15000000000000002  # (1.0-0.85)/1, the IEEE value
    assert got[2] == 0.85
    assert got[3] == 0.0
    with _pytest.raises(ValueError, match="no seed"):
        graph_ops.pagerank(e, iters=1, seeds=spark.createDataFrame([(99,)], "node long"))


def test_fuzzy_key_pairs_hand_computed(spark):
    """FastSS completeness and the df cap pinned by hand:
    'cat'~'cut' (substitution), 'cat'~'cart' (insertion), 'cat'~'at'
    (deletion) all pair at dist 1; 'cat'~'dog' never pairs; exact
    duplicates pair at dist 0; a degenerate hot key ('x' shared by
    many rows) is dropped by the cap instead of exploding the block."""
    rows = [(1, "cat"), (2, "cut"), (3, "cart"), (4, "at"), (5, "dog"), (6, "cat")]
    df = spark.createDataFrame(rows, "id long, k string")
    got = {
        (r.a_id, r.b_id): r.dist
        for r in dedup.fuzzy_key_pairs(df, "k", "id").collect()
    }
    assert got[(1, 2)] == 1 and got[(1, 3)] == 1 and got[(1, 4)] == 1
    assert got[(1, 6)] == 0  # exact duplicate keys
    assert not any(5 in p for p in got)  # 'dog' pairs with nothing
    # hot-key cap: 70 rows sharing key 'x' -> block dropped, no pairs
    hot = spark.createDataFrame([(i, "x") for i in range(70)], "id long, k string")
    assert dedup.fuzzy_key_pairs(hot, "k", "id").count() == 0
    # under the cap the same block pairs fully: 5 rows -> C(5,2)
    cold = spark.createDataFrame([(i, "x") for i in range(5)], "id long, k string")
    assert dedup.fuzzy_key_pairs(cold, "k", "id").count() == 10


def test_weighted_pagerank_hand_computed(spark):
    """Weighted PageRank pinned by hand: 1->2 (w=3), 1->3 (w=1),
    2->1 (w=1). Out-weight of 1 is 4, so one iteration from uniform
    p=1/3 splits 1's mass 3:1:
    v(2) = t + d*(p*3/4); v(3) = t + d*(p*1/4); v(1) = t + d*(p*1/1).
    Duplicate edges sum weights; zero-weight edges are dropped."""
    from hyper_storage_spark.operators import graph as graph_ops

    e = spark.createDataFrame(
        [(1, 2, 2.0), (1, 2, 1.0), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 0.0)],
        "src long, dst long, w double",
    )
    got = {r.node: r.val for r in graph_ops.pagerank(e, iters=1, weight_col="w").collect()}
    p, d = 1.0 / 3, 0.85
    t = (1.0 - d) / 3
    assert abs(got[2] - (t + d * (p * 3.0 / 4.0))) < 1e-15
    assert abs(got[3] - (t + d * (p * 1.0 / 4.0))) < 1e-15
    assert abs(got[1] - (t + d * p)) < 1e-15


def test_label_propagation_hand_computed(spark):
    """Label propagation pinned by hand on the path 1-2-3-4 with
    seeds {1:'a', 4:'b'}: after one vote the seeds' neighbors take
    their labels (2->'a', 3->'b', seeds persist via self-edges); at
    convergence the midpoint tie at node 3 (neighbors 'a' and 'b',
    count 1 each) breaks to the lexicographically smaller 'a'. Seeds
    stay clamped forever."""
    from hyper_storage_spark.operators import graph as graph_ops

    e = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1, "a"), (4, "b")], "node long, label string")
    it1 = {r.node: r.label for r in graph_ops.label_propagation(e, seeds, iters=1).collect()}
    assert it1 == {1: "a", 2: "a", 3: "b", 4: "b"}
    it4 = {r.node: r.label for r in graph_ops.label_propagation(e, seeds, iters=4).collect()}
    assert it4 == {1: "a", 2: "a", 3: "a", 4: "b"}  # tie at 3 -> min label
    # an isolated seed survives on its self-edge alone
    lone = spark.createDataFrame([(9, "z")], "node long, label string")
    out = {r.node: r.label for r in graph_ops.label_propagation(e, lone, iters=2).collect()}
    assert out[9] == "z"


def test_triangle_stats_hand_computed(spark):
    """Triangle census pinned by hand: triangle {1,2,3} plus pendant
    3-4 -> degrees (2,2,3,1), wedges 1+1+3+0 = 5, one triangle,
    transitivity 3/5 = 0.6. Direction/duplicate/self-loop inputs
    canonicalize away; a triangle-free star has transitivity 0; the
    empty graph yields NULL (0/0 undefined, never DIVIDE_BY_ZERO)."""
    from hyper_storage_spark.operators import graph as graph_ops

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (2, 1), (4, 4)], "src long, dst long"
    )
    r = graph_ops.triangle_stats(e).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles, r.n_wedges) == (4, 4, 1, 5)
    assert r.transitivity == 0.6
    star = spark.createDataFrame([(0, i) for i in range(1, 5)], "src long, dst long")
    rs = graph_ops.triangle_stats(star).collect()[0]
    assert rs.n_triangles == 0 and rs.n_wedges == 6 and rs.transitivity == 0.0


def test_fuzzy_incremental_decomposition(spark):
    """The FastSS decomposition contract on a hand-built corpus: with
    index(corpus) and a new batch, pairs(corpus) ∪ incremental(batch)
    must equal the one-shot pairs(corpus ∪ batch) — including
    batch-internal pairs, batch↔corpus pairs at every edit class, and
    NO duplicated or direction-flipped rows."""
    corpus = spark.createDataFrame(
        [(1, "cat"), (2, "cut"), (5, "dog")], "id long, k string"
    )
    batch = spark.createDataFrame(
        [(3, "cart"), (4, "at"), (6, "dig"), (7, "dig")], "id long, k string"
    )
    idx = dedup.fuzzy_key_index(corpus, "k", "id")
    inc = dedup.fuzzy_key_pairs_incremental(idx, batch, "k", "id")
    base = dedup.fuzzy_key_pairs(corpus, "k", "id")
    got = sorted(
        (r.a_id, r.b_id, r.dist) for r in base.unionByName(inc).distinct().collect()
    )
    full = spark.createDataFrame(
        [(1, "cat"), (2, "cut"), (5, "dog"), (3, "cart"), (4, "at"), (6, "dig"), (7, "dig")],
        "id long, k string",
    )
    want = sorted(
        (r.a_id, r.b_id, r.dist) for r in dedup.fuzzy_key_pairs(full, "k", "id").collect()
    )
    assert got == want
    # incremental half contains only batch-touching pairs
    inc_pairs = [(r.a_id, r.b_id) for r in inc.collect()]
    assert all(a in (3, 4, 6, 7) or b in (3, 4, 6, 7) for a, b in inc_pairs)
    assert (6, 7) in inc_pairs  # batch-internal exact-dup pair


def test_fuzzy_key_pairs_completeness_property(spark):
    """FastSS completeness property-checked against brute force: 80
    random keys over a 3-letter alphabet (lengths 1-5, duplicates
    likely) — the operator's pair set must EQUAL the all-pairs
    levenshtein<=1 set computed in Python. Small alphabet forces
    heavy block sharing, the regime where a blocking bug (missed
    deletion variant, broken canonicalization) actually shows."""
    import random as _random

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    rnd = _random.Random(42)
    keys = [
        (i, "".join(rnd.choice("abc") for _ in range(rnd.randint(1, 5))))
        for i in range(80)
    ]
    want = sorted(
        (i, j, lev(a, b))
        for (i, a) in keys
        for (j, b) in keys
        if i < j and lev(a, b) <= 1
    )
    df = spark.createDataFrame(keys, "id long, k string")
    got = sorted(
        (r.a_id, r.b_id, r.dist)
        for r in dedup.fuzzy_key_pairs(df, "k", "id", max_df=10_000).collect()
    )
    assert got == want and len(want) > 50  # the regime is non-trivial


def test_link_scores_hand_computed(spark):
    """Link prediction pinned by hand on the 4-cycle 1-2-3-4-1 with a
    pendant 5-1: deg = (1:3, 2:2, 3:2, 4:2, 5:1). Predicted pairs
    (existing edges excluded): (1,3) via {2,4}; (2,4) via {1,3};
    (2,5)/(4,5) via {1}. (3,5) shares nothing. RA and jaccard are
    exact rationals here; adamic_adar checked to 6 decimals against
    math.log (pytest-pinned because ln is engine-specific at the
    ulp — the catalog entry gates cn/jaccard/ra only)."""
    import math

    from hyper_storage_spark.operators import graph as graph_ops

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (5, 1)], "src long, dst long"
    )
    rows = {(r.a, r.b): r for r in graph_ops.link_scores(e, top_k=10).collect()}
    assert set(rows) == {(1, 3), (2, 4), (2, 5), (4, 5)}
    r13 = rows[(1, 3)]
    assert (r13.cn, r13.deg_a, r13.deg_b) == (2, 3, 2)
    assert r13.jaccard == round(2 / 3, 6) and r13.ra == round(1 / 2 + 1 / 2, 6)
    assert r13.adamic_adar == round(1 / math.log(2) + 1 / math.log(2), 6)
    r24 = rows[(2, 4)]
    assert (r24.cn, r24.jaccard) == (2, 1.0)
    assert r24.ra == round(1 / 3 + 1 / 2, 6)
    assert r24.adamic_adar == round(1 / math.log(3) + 1 / math.log(2), 6)
    assert rows[(2, 5)].cn == 1 and rows[(2, 5)].ra == round(1 / 3, 6)
    # ordering is (cn desc, a, b) and top_k truncates deterministically
    top2 = [(r.a, r.b) for r in graph_ops.link_scores(e, top_k=2).collect()]
    assert top2 == [(1, 3), (2, 4)]


def test_holt_winters_hand_computed(spark):
    """Holt-Winters additive (m=2, α=β=γ=0.5) pinned by hand on
    y = [1, 3, 5]: init level=(1+3)/2=2, trend=0, seas=[-1, 1];
    step y=5: level' = .5·(5−(−1)) + .5·(2+0) = 4,
    trend' = .5·(4−2) + .5·0 = 1, s_new = .5·(5−4) + .5·(−1) = 0,
    ring → [1, 0]; forecast = 4 + 1 + 1 = 6. A key with fewer than m
    rows is dropped; n counts the full series."""
    from hyper_storage_spark.operators import timeseries as ts_ops

    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 3.0), ("a", 3, 5.0), ("b", 1, 9.0)],
        "k string, t int, y double",
    )
    out = {r.k: r for r in ts_ops.holt_winters(
        df, ["k"], "t", "y", alpha=0.5, beta=0.5, gamma=0.5, period=2
    ).collect()}
    assert set(out) == {"a"}
    r = out["a"]
    assert (r.n, r.level, r.trend, r.s_next, r.forecast) == (3, 4.0, 1.0, 1.0, 6.0)
    # a key with exactly m rows: pure init state, forecast = mean + s_1
    just_m = ts_ops.holt_winters(
        df.filter("k = 'a' and t <= 2"), ["k"], "t", "y",
        alpha=0.5, beta=0.5, gamma=0.5, period=2,
    ).collect()[0]
    assert (just_m.level, just_m.trend, just_m.s_next) == (2.0, 0.0, -1.0)
    assert just_m.forecast == 1.0


def test_dsir_scores_orders_by_target_likeness(spark):
    """DSIR/Moore-Lewis hashed importance scores: a document made of
    target-domain tokens must outscore one made of tokens the target
    never uses; a mixed document lands between. Zero-token documents
    are dropped, n_tokens is the real count, and the validation gate
    rejects a degenerate bucket space."""
    import pytest

    from hyper_storage_spark.operators import text as T

    raw = spark.createDataFrame(
        [
            (1, "alpha alpha beta"),
            (2, "gamma delta gamma"),
            (3, "alpha gamma"),
            (4, "   "),
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(10, "alpha beta alpha beta")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in T.dsir_scores(raw, target, n_buckets=64).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_tokens == 3 and out[2].n_tokens == 3 and out[3].n_tokens == 2
    assert out[1].score > out[3].score > out[2].score
    with pytest.raises(ValueError):
        T.dsir_scores(raw, target, n_buckets=1)


def _bpe_reference(word_counts, n_merges, min_count=2):
    """Pure-Python Sennrich BPE over a word-frequency dict — the
    differential reference for the distributed trainer."""
    from collections import Counter

    vocab = {w: (c, list(w)) for w, c in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pc = Counter()
        for w, (cnt, syms) in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += cnt
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if c < min_count:
            break
        merges.append((rank, a, b, a + b, c))
        for w, (cnt, syms) in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = (cnt, out)
    return merges, {w: syms for w, (c, syms) in vocab.items()}


def test_bpe_train_matches_python_reference(spark):
    """Distributed BPE training == the pure-Python Sennrich reference
    on the same word counts: merge-for-merge including ranks, pair
    counts, the (count desc, lex) tie-break, and the min_count stop;
    overlapping runs merge greedily left-to-right ("aaaa" -> aa+aa)."""
    from hyper_storage_spark.operators import bpe

    docs = spark.createDataFrame(
        [
            (1, "low low low lower lower newest newest newest"),
            (2, "newest widest widest aaaa aaaa aaaa"),
            (3, "low newest   "),
        ],
        "doc_id long, text string",
    )
    counts = {}
    for _, txt in docs.collect():
        for w in txt.split():
            counts[w] = counts.get(w, 0) + 1
    ref_merges, ref_state = _bpe_reference(counts, 12)
    merges_df, state = bpe.bpe_train(docs, n_merges=12, with_state=True)
    got = [
        (r.rank, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in merges_df.orderBy("rank").collect()
    ]
    assert got == ref_merges
    assert {r.w: list(r.syms) for r in state.collect()} == ref_state


def test_bpe_encode_reproduces_training_state(spark):
    """Encoding the training corpus with the learned table reproduces
    the final training state word-for-word (the Sennrich invariant:
    train and encode apply the identical greedy merge), the encoded
    stream is lossless (concat == original words), and validation
    rejects degenerate parameters."""
    import pytest

    from hyper_storage_spark.operators import bpe

    docs = spark.createDataFrame(
        [(1, "banana bandana ban"), (2, "banana banana cabana"), (3, "")],
        "doc_id long, text string",
    )
    merges_df, state = bpe.bpe_train(docs, n_merges=8, with_state=True)
    state_map = {r.w: list(r.syms) for r in state.collect()}
    words = sorted(state_map)
    wdf = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    enc = {r.doc_id: r for r in bpe.bpe_encode(wdf, merges_df).collect()}
    for i, w in enumerate(words):
        assert list(enc[i].tokens) == state_map[w]
        assert "".join(enc[i].tokens) == w
        assert enc[i].n_words == 1
    empty = {r.doc_id: r for r in bpe.bpe_encode(docs, merges_df).collect()}[3]
    assert empty.n_words == 0 and empty.n_bpe_tokens == 0 and list(empty.tokens) == []
    with pytest.raises(ValueError):
        bpe.bpe_train(docs, n_merges=0)
    with pytest.raises(ValueError):
        bpe.bpe_train(docs, min_count=0)


def test_attribution_hand_computed(spark):
    """Attribution pinned by hand. User 1: click(t1), view(t2),
    purchase(t3) all within the lookback -> first=click, last=view,
    linear click 0.5 / view 0.5. User 2: a click OUTSIDE the lookback
    then purchase -> all three models credit (direct). User 3: two
    clicks then purchase -> first=last=click, linear click 1.0.
    Every model column sums to the 3 conversions; validation rejects
    a conversion type that is also a touch type."""
    import datetime as dt

    import pytest

    from hyper_storage_spark.operators import funnel as fn

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)  # noqa: E731
    rows = [
        (1, 1, "click", s(0)),
        (2, 1, "view", s(50)),
        (3, 1, "purchase", s(100)),
        (4, 2, "click", s(0)),
        (5, 2, "purchase", s(5000)),
        (6, 3, "click", s(0)),
        (7, 3, "click", s(10)),
        (8, 3, "purchase", s(20)),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {r.channel: r for r in fn.attribution(
        ev, "purchase", ["click", "view"], lookback_seconds=1000
    ).collect()}
    assert set(out) == {"click", "view", "(direct)"}
    assert (out["click"].first_touch, out["click"].last_touch) == (2, 1)
    assert (out["view"].first_touch, out["view"].last_touch) == (0, 1)
    assert (out["(direct)"].first_touch, out["(direct)"].last_touch) == (1, 1)
    assert out["click"].linear == 1.5 and out["view"].linear == 0.5
    assert out["(direct)"].linear == 1.0
    for col in ("first_touch", "last_touch", "linear"):
        assert sum(getattr(r, col) for r in out.values()) == 3
    with pytest.raises(ValueError):
        fn.attribution(ev, "purchase", ["purchase", "view"], 1000)
    with pytest.raises(ValueError):
        fn.attribution(ev, "purchase", ["view"], 0)


def test_kcore_hand_computed(spark):
    """k-core pinned by hand: triangle {1,2,3} with pendant 3-4 — the
    2-core is exactly the triangle with degrees 2; the path 5-6-7
    has an EMPTY 2-core (the fixpoint guard: the peel's last
    non-empty state is not a core); k=1 keeps every non-isolated
    node; validation rejects k < 1."""
    import pytest

    from hyper_storage_spark.operators import graph as graph_ops

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    core = {r.node: r.degree for r in graph_ops.kcore(e, k=2).collect()}
    assert core == {1: 2, 2: 2, 3: 2}
    path = spark.createDataFrame([(5, 6), (6, 7)], "src long, dst long")
    assert graph_ops.kcore(path, k=2).count() == 0
    assert {r.node for r in graph_ops.kcore(path, k=1).collect()} == {5, 6, 7}
    with pytest.raises(ValueError):
        graph_ops.kcore(e, k=0)


def test_quality_classifier_separates_constructed_corpus(spark):
    """The hashed-LR quality model must perfectly rank a corpus built
    from two disjoint token distributions (train on half, AUC == 1.0
    on the unseen half), scores must live strictly inside (0,1), and
    validation rejects degenerate hyperparameters."""
    import pytest

    from hyper_storage_spark.operators import profiling
    from hyper_storage_spark.operators import text as T

    rows = []
    for i in range(60):
        good = i % 2 == 0
        words = ("useful insight clear " if good else "spam junk noise ") * 5
        rows.append((i, words.strip(), float(good)))
    docs = spark.createDataFrame(rows, "doc_id long, text string, label double")
    train = docs.filter(F.col("doc_id") % 4 < 2)
    test = docs.filter(F.col("doc_id") % 4 >= 2)
    model = T.quality_train(train, "label", n_features=256, max_iter=20)
    scored = T.quality_score(test, model)
    r = profiling.auc_binary(scored, "quality_p", "label").collect()[0]
    assert r.auc == 1.0 and r.n_pos > 0 and r.n_neg > 0
    b = scored.agg(F.min("quality_p"), F.max("quality_p")).collect()[0]
    assert 0.0 < b[0] and b[1] < 1.0
    with pytest.raises(ValueError):
        T.quality_train(train, "label", n_features=1)
    with pytest.raises(ValueError):
        T.quality_train(train, "label", max_iter=0)


def test_kcenter_select_hand_computed(spark):
    """Farthest-point traversal pinned by hand on 1-D points
    {0, 1, 9, 10} (ids 1..4): anchor = min id (point 0); pick 2 is
    point 10 (d² = 100); then dmin(point 1) = dmin(point 9) = 1 — the
    tie breaks to the smaller id, so pick 3 is id 2 (point 1) and
    pick 4 is id 3 (point 9), both radius 1. Radii are
    non-increasing; k=1 returns just the anchor; the empty corpus and
    k<1 raise."""
    import pytest

    from hyper_storage_spark.operators import similarity

    emb = spark.createDataFrame(
        [(1, [0.0]), (2, [1.0]), (3, [9.0]), (4, [10.0])],
        "vec_id long, embedding array<float>",
    )
    out = [(r.sel_rank, r.vec_id, r.radius) for r in
           similarity.kcenter_select(emb, k=4).orderBy("sel_rank").collect()]
    assert out[0] == (1, 1, None)
    assert out[1] == (2, 4, 100.0)
    assert out[2] == (3, 2, 1.0)
    assert out[3] == (4, 3, 1.0)
    radii = [r for _, _, r in out[1:]]
    assert radii == sorted(radii, reverse=True)
    one = similarity.kcenter_select(emb, k=1).collect()
    assert len(one) == 1 and one[0].vec_id == 1
    with pytest.raises(ValueError):
        similarity.kcenter_select(emb, k=0)
    with pytest.raises(ValueError):
        similarity.kcenter_select(emb.limit(0), k=2)


def test_graph_family_seeded_random_vs_bruteforce(spark):
    """Seeded randomized differential for the round-10 graph family:
    on random graphs, link_scores equals a quadratic brute force
    (every non-edge pair's cn/jaccard/ra over explicit neighbor
    sets) and kcore equals the sequential peel, for random k. Random
    structure is where wedge enumeration and batch peeling hide
    bugs hand-picked fixtures miss.

    r13: trimmed 30→10 trials (the same seed stream's deterministic
    prefix — each trial is several full Spark jobs on a <15-node graph,
    and one driver pytest run must fit the verify cap)."""
    import math
    import random

    from hyper_storage_spark.operators import graph as graph_ops

    rng = random.Random(421)
    for trial in range(10):
        n = rng.randint(4, 14)
        p = rng.uniform(0.15, 0.6)
        edges = [(u, v) for u in range(n) for v in range(u + 1, n)
                 if rng.random() < p]
        if not edges:
            continue
        e = spark.createDataFrame(edges, "src long, dst long")
        adj = {i: set() for i in range(n)}
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        nodes = [i for i in range(n) if adj[i]]

        # --- link_scores vs brute force ---
        exp = {}
        eset = set(edges)
        for i, a in enumerate(nodes):
            for b in nodes[i + 1:]:
                if (a, b) in eset:
                    continue
                cn = adj[a] & adj[b]
                if not cn:
                    continue
                da, db = len(adj[a]), len(adj[b])
                ra = 0.0
                for z in sorted(cn):
                    ra = ra + 1.0 / len(adj[z])
                aa = 0.0
                for z in sorted(cn):
                    aa = aa + 1.0 / math.log(len(adj[z]))
                exp[(a, b)] = (len(cn), da, db,
                               round(len(cn) / (da + db - len(cn)), 6),
                               round(ra, 6), round(aa, 6))
        got = {(r.a, r.b): (r.cn, r.deg_a, r.deg_b, r.jaccard, r.ra,
                            r.adamic_adar)
               for r in graph_ops.link_scores(e, top_k=10_000).collect()}
        assert got == exp, f"link_scores trial {trial}"

        # --- kcore vs sequential peel ---
        k = rng.randint(1, 4)
        peel = {u: set(vs) for u, vs in adj.items() if vs}
        changed = True
        while changed:
            changed = False
            for u in list(peel):
                if len(peel[u]) < k:
                    for v in peel[u]:
                        peel[v].discard(u)
                    del peel[u]
                    changed = True
        expected_core = {u: len(vs) for u, vs in peel.items()}
        got_core = {r.node: r.degree
                    for r in graph_ops.kcore(e, k=k).collect()}
        assert got_core == expected_core, f"kcore trial {trial} k={k}"


def test_attribution_seeded_random_vs_bruteforce(spark):
    """Seeded randomized differential for attribution: on 20 random
    event streams (random users, types, second-offset timestamps with
    deliberate collisions), the operator's three models equal a
    brute-force replay that scans each conversion's lookback window
    explicitly. Exercises same-timestamp tie-breaks, overlapping
    windows, and multi-conversion users."""
    import datetime as dt
    import random

    from hyper_storage_spark.operators import funnel as fn

    rng = random.Random(911)
    t0 = dt.datetime(2024, 3, 1)
    for trial in range(20):
        n = rng.randint(6, 40)
        look = rng.choice([5, 20, 60])
        rows = []
        for eid in range(n):
            rows.append(
                (eid, rng.randint(1, 4),
                 rng.choice(["click", "view", "buy", "other"]),
                 t0 + dt.timedelta(seconds=rng.randint(0, 80)))
            )
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts timestamp"
        )
        got = {r.channel: (r.first_touch, r.last_touch, r.linear)
               for r in fn.attribution(ev, "buy", ["click", "view"], look).collect()}

        first: dict = {}
        last: dict = {}
        linear_terms: dict = {}
        n_convs = 0
        for eid, u, ty, ts in rows:
            if ty != "buy":
                continue
            n_convs += 1
            win = [(e2, ts2, ty2) for e2, u2, ty2, ts2 in rows
                   if u2 == u and ty2 in ("click", "view")
                   and ts - dt.timedelta(seconds=look) <= ts2 <= ts]
            if not win:
                for d in (first, last):
                    d["(direct)"] = d.get("(direct)", 0) + 1
                linear_terms.setdefault("(direct)", []).append((eid, 1, 1))
                continue
            fch = min(win, key=lambda t: (t[1], t[0]))[2]
            lch = max(win, key=lambda t: (t[1], t[0]))[2]
            first[fch] = first.get(fch, 0) + 1
            last[lch] = last.get(lch, 0) + 1
            chs = [t[2] for t in win]
            for c in set(chs):
                linear_terms.setdefault(c, []).append(
                    (eid, chs.count(c), len(chs))
                )
        if n_convs == 0:
            assert got == {}, f"trial {trial}"
            continue
        exp = {}
        for ch in set(first) | set(last) | set(linear_terms):
            lin = 0.0
            for eid, cnt, nn in sorted(linear_terms.get(ch, [])):
                lin = lin + cnt / nn
            exp[ch] = (first.get(ch, 0), last.get(ch, 0), round(lin, 6))
        assert got == exp, f"attribution trial {trial} lookback={look}"


def test_dsir_persisted_model_matches_in_memory(spark, tmp_path):
    """Frozen-model DSIR scoring: dsir_model persists the ratio table
    once; dsir_score_with_model over the training corpus reproduces
    dsir_scores row for row (ids, n_tokens, bit-identical scores),
    and scoring a NEW batch against the frozen model works without
    the training data. Save/load of the hashed-LR quality classifier
    round-trips to identical scores too (the pyspark.ml persistence
    face)."""
    from hyper_storage_spark.operators import text as T

    raw = spark.createDataFrame(
        [(i, ("alpha beta " * (i % 3 + 1)) + ("gamma " * (i % 2)))
         for i in range(1, 21)],
        "doc_id long, text string",
    )
    target = raw.filter(F.col("doc_id") % 4 == 0)
    p = str(tmp_path / "dsir_model")
    T.dsir_model(raw, target, p, n_buckets=64)
    in_mem = {r.doc_id: (r.n_tokens, r.score)
              for r in T.dsir_scores(raw, target, n_buckets=64).collect()}
    frozen = {r.doc_id: (r.n_tokens, r.score)
              for r in T.dsir_score_with_model(raw, p).collect()}
    assert frozen == in_mem
    batch = spark.createDataFrame(
        [(100, "alpha alpha beta"), (101, "delta epsilon")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in T.dsir_score_with_model(batch, p).collect()}
    assert set(out) == {100, 101} and out[100].n_tokens == 3

    # classifier persistence: identical held-out scores after load
    labeled = raw.withColumn(
        "label", (F.col("doc_id") % 2 == 0).cast("double")
    )
    model = T.quality_train(labeled, "label", n_features=128, max_iter=10)
    mp = str(tmp_path / "qmodel")
    model.write().overwrite().save(mp)
    from pyspark.ml.classification import LogisticRegressionModel

    loaded = LogisticRegressionModel.load(mp)
    a = {r.doc_id: r.quality_p for r in T.quality_score(labeled, model).collect()}
    b = {r.doc_id: r.quality_p for r in T.quality_score(labeled, loaded).collect()}
    assert a == b


def test_bpe_oracle_sql_prefix_adversarial(spark):
    """The DuckDB BPE oracle itself, run on an adversarial corpus
    where a later merge's RIGHT symbol is a strict prefix of an
    earlier merged symbol ('bc'×10, 'ab'×8, 'abc'×5): after merge 1
    (b,c) the word 'abc' is [a, bc], and merge 2 (a,b) must NOT touch
    it. A prefix-anchored-only string encoding corrupted exactly this
    state (replace '\\x1fa\\x1fb' matched '\\x1fa\\x1fbc'); the
    double-wrapped encoding is fully anchored. Oracle == pure-Python
    reference == the Spark trainer, merge for merge."""
    import duckdb
    import pandas as pd

    from hyper_storage_spark.operators import bpe
    from hyper_storage_spark.queries import _BPE_SQL

    texts = ["bc"] * 10 + ["ab"] * 8 + ["abc"] * 5
    counts = {}
    for t in texts:
        counts[t] = counts.get(t, 0) + 1
    ref_merges, _ = _bpe_reference(counts, 20)
    assert [m[:3] for m in ref_merges] == [
        (1, "b", "c"), (2, "a", "b"), (3, "a", "bc")
    ]  # the third merge only exists if 'abc' survived merge 2 intact

    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got_sql = [tuple(r) for r in con.execute(_BPE_SQL + " ORDER BY rank").fetchall()]
    assert got_sql == ref_merges

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got_spark = [
        (r.rank, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in bpe.bpe_train(docs, n_merges=20).orderBy("rank").collect()
    ]
    assert got_spark == ref_merges


def test_label_noise_candidates_recovers_planted_flips(spark):
    """On a cleanly-separable constructed corpus with 6 planted label
    flips, cross-fitted disagreement ranking surfaces ALL flips at
    the very top (recall@n = 1.0) — the separable case where
    confident learning is exact. Validation rejects degenerate
    n_folds/top_k."""
    import pytest

    from hyper_storage_spark.operators import text as T

    rows = []
    for i in range(80):
        # class alternates INDEPENDENTLY of the %2 fold split (i%4<2
        # puts both classes in both folds — a class⊥fold confound
        # would leave each fold's model trained on one class only)
        good = i % 4 < 2
        words = ("useful insight clear " if good else "spam junk noise ") * 4
        label = float(good)
        if i % 13 == 0:  # planted flips: ids 0,13,26,39,52,65,78
            label = 1.0 - label
        rows.append((i, words.strip(), label, float(good)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, label double, clean double"
    )
    n_flips = sum(1 for _, _, lab, cl in rows if lab != cl)
    sus = T.label_noise_candidates(
        docs, "label", top_k=n_flips, n_features=256, max_iter=20
    ).collect()
    assert len(sus) == n_flips
    assert all(r.label != r.clean for r in sus)  # every candidate IS a flip
    assert all(0.0 <= r.disagreement <= 1.0 for r in sus)
    with pytest.raises(ValueError):
        T.label_noise_candidates(docs, "label", top_k=5, n_folds=1)
    with pytest.raises(ValueError):
        T.label_noise_candidates(docs, "label", top_k=0)


def test_temporal_embargo_split_hand_computed(spark):
    """Purged time split pinned by hand: cutoff t=100, embargo 10 —
    rows at ts≥100 are test, ts<90 train, [90,100) embargo. User 7's
    first test event is at t=100 with entity embargo 25, so their
    train rows in [75, 90) become purged while user 8 (no test rows)
    keeps theirs. Validation: negative embargo and a dangling
    entity_col both raise."""
    import datetime as dt

    import pytest

    from hyper_storage_spark.operators import sampling

    t0 = dt.datetime(2024, 6, 1)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)  # noqa: E731
    rows = [
        (1, 7, s(50)),   # train (outside entity embargo: 50 < 75)
        (2, 7, s(80)),   # purged (within 25s-embargo of 7's first test@100... 80 >= 75)
        (3, 7, s(95)),   # embargo
        (4, 7, s(100)),  # test (first test for user 7)
        (5, 8, s(80)),   # train (user 8 never in test)
        (6, 8, s(110)),  # wait — this IS a test row for user 8
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    cutoff = (t0 + dt.timedelta(seconds=100)).strftime("%Y-%m-%d %H:%M:%S")
    out = {r.event_id: r.split for r in sampling.temporal_embargo_split(
        ev, "ts", cutoff, embargo_seconds=10,
        entity_col="user_id", entity_embargo_seconds=25,
    ).collect()}
    # user 8's first test is at t=110, entity embargo reaches [85, 90)
    # in train space — their t=80 row survives as train
    assert out == {1: "train", 2: "purged", 3: "embargo",
                   4: "test", 5: "train", 6: "test"}
    with pytest.raises(ValueError):
        sampling.temporal_embargo_split(ev, "ts", cutoff, embargo_seconds=-1)
    with pytest.raises(ValueError):
        sampling.temporal_embargo_split(ev, "ts", cutoff, entity_col="user_id")


def test_scene_changes_detects_constructed_cuts(spark):
    """Scene-change detection on constructed mp4s: a video whose
    frames jump 0→200 at index 2 and back at index 4 flags exactly
    those boundaries (l1 = 200), identical consecutive frames score
    0, a sub-threshold wobble (|diff| = 3) stays unflagged, and
    non-video rows contribute nothing. Threshold validation raises."""
    import pytest

    from hyper_storage_spark.operators import media_codecs, multimodal

    w, h = 4, 3
    mk = lambda v: bytes([v]) * (w * h)  # noqa: E731
    vid = media_codecs.mp4_encode([mk(0), mk(0), mk(200), mk(200), mk(0), mk(3)], w, h)
    rows = [
        (1, "video/mp4", bytearray(vid)),
        (2, "image/png", bytearray(b"not video")),
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )
    out = {r.frame_idx: r for r in multimodal.scene_changes(media, threshold=16.0).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert all(r.doc_id == 1 for r in out.values())
    assert out[1].l1_change == 0.0 and not out[1].is_scene_change
    assert out[2].l1_change == 200.0 and out[2].is_scene_change
    assert out[3].l1_change == 0.0 and not out[3].is_scene_change
    assert out[4].l1_change == 200.0 and out[4].is_scene_change
    assert out[5].l1_change == 3.0 and not out[5].is_scene_change
    with pytest.raises(ValueError):
        multimodal.scene_changes(media, threshold=-1)


def test_expectations_counts_planted_violations(spark):
    """The expectations engine on a deliberately dirty frame: exact
    violation counts for every rule class — a NULL id, an
    out-of-range value (NULL doesn't double-count), a value outside
    the domain set, a regex miss (anchored: a PREFIX match is still a
    violation), duplicate ids beyond the first, and an unresolvable
    foreign key. Flags from violation_flags pick exactly the
    offending rows; empty/duplicate rule lists raise."""
    import pytest

    from hyper_storage_spark.operators import expectations as X

    rows = [
        (1, 10.0, "A", "OK"),
        (1, 99.0, "A", "OK"),      # dup id; 99 out of range
        (None, 5.0, "B", "OKX"),   # null id; B outside set; regex prefix-miss
        (3, None, "A", "OK"),      # NULL value: not a range violation
        (4, 20.0, None, None),     # NULLs: not set/regex violations
    ]
    df = spark.createDataFrame(rows, "id long, v double, flag string, code string")
    dim = spark.createDataFrame([(1,), (3,)], "k long")
    rules = [
        X.not_null("id"),
        X.in_range("v", 1, 50),
        X.in_set("flag", ["A"]),
        X.matches("code", "OK"),
        X.unique("id"),
        X.foreign_key("id", dim, "k"),
    ]
    out = {r.rule: r for r in X.check(df, rules).collect()}
    assert out["not_null(id)"].n_violations == 1
    assert out["in_range(v,1,50)"].n_violations == 1
    assert out["in_set(flag)"].n_violations == 1
    assert out["matches(code)"].n_violations == 1   # "OKX" is anchored-out
    assert out["unique(id)"].n_violations == 1      # second id=1 row
    assert out["fk(id->k)"].n_violations == 1       # id=4 unresolvable
    assert all(r.n_rows == 5 for r in out.values())
    assert not any(r.passed for r in out.values())

    flagged = X.violation_flags(df, rules)
    viol_nn = [r.v for r in flagged.filter(F.col("__viol_0")).collect()]
    assert viol_nn == [5.0]
    clean = X.check(dim, [X.not_null("k"), X.unique("k")])
    assert all(r.passed for r in clean.collect())
    with pytest.raises(ValueError):
        X.check(df, [])
    with pytest.raises(ValueError):
        X.check(df, [X.not_null("id"), X.not_null("id")])


def test_seasonal_outliers_hand_computed(spark):
    """Deseasonalized MAD outliers pinned by hand: FOUR weeks of daily
    events where every Sunday has 2 events and every other day 10,
    plus ONE Wednesday spiking to 100 (four samples per weekday keep
    the weekday median robust to the single spike — with only two
    weeks the Wednesday median splits the difference and flags BOTH
    Wednesdays, the degenerate case this test originally tripped).
    Raw MAD would flag the Sundays; the day-of-week profile absorbs
    them (residual 0), and only the spiked Wednesday survives at
    3×MAD. k validation raises."""
    import datetime as dt

    import pytest

    from hyper_storage_spark.operators import timeseries as ts_ops

    rows = []
    eid = 0
    start = dt.date(2024, 1, 7)  # a Sunday
    for d in range(28):
        day = start + dt.timedelta(days=d)
        n = 2 if day.weekday() == 6 else 10
        if d == 3:  # one Wednesday spikes
            n = 100
        for _ in range(n):
            rows.append((eid, dt.datetime(day.year, day.month, day.day, 12)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {r.day.date(): r for r in ts_ops.seasonal_outliers(ev, "ts").collect()}
    spiked = start + dt.timedelta(days=3)
    assert out[spiked].is_outlier and out[spiked].n == 100
    flagged = [d for d, r in out.items() if r.is_outlier]
    assert flagged == [spiked]
    sundays = [d for d, r in out.items() if d.weekday() == 6]
    assert all(out[d].residual == 0.0 and not out[d].is_outlier for d in sundays)
    with pytest.raises(ValueError):
        ts_ops.seasonal_outliers(ev, "ts", k=0)


def test_corpus_diff_classification(spark):
    """corpus_diff classifies added/removed/changed/unchanged, carries
    group columns from the right side (falling back left for removed
    rows), and the NULL sentinel keeps rows differing only in WHICH
    column is NULL from colliding (concat_ws alone would drop nulls
    and digest ('x', NULL) == (NULL, 'x'))."""
    from hyper_storage_spark.operators import versioning

    old = spark.createDataFrame(
        [
            (1, "alpha", "en"),
            (2, "beta", "en"),
            (3, "gamma", "de"),
            (4, "x", None),
        ],
        "doc_id long, text string, lang string",
    )
    new = spark.createDataFrame(
        [
            (1, "alpha", "en"),          # unchanged
            (2, "beta EDITED", "en"),    # changed text
            (4, None, "x"),              # null moved columns -> changed
            (5, "delta", "fr"),          # added
        ],                                # 3 removed
        "doc_id long, text string, lang string",
    )
    d = versioning.corpus_diff(
        old, new, "doc_id", ("text", "lang"), carry_cols=("lang",)
    )
    got = {r.doc_id: (r.status, r.lang) for r in d.collect()}
    assert got == {
        1: ("unchanged", "en"),
        2: ("changed", "en"),
        3: ("removed", "de"),   # lang carried from the old side
        4: ("changed", "x"),
        5: ("added", "fr"),
    }

    s = versioning.corpus_diff_summary(old, new, "doc_id", ("text",))
    counts = {r.status: r.n for r in s.collect()}
    # by text alone, doc 4 flips: old 'x' vs new NULL is still changed
    assert counts == {"unchanged": 1, "changed": 2, "removed": 1, "added": 1}


def test_ppl_buckets_equal_depth_and_order(spark):
    """ppl_buckets: equal-depth per-group thirds on the (score desc,
    id) total order — recomputed independently from the returned
    scores — garbled text lands in the tail, and n_buckets validates."""
    import pytest

    from hyper_storage_spark.operators import text as text_ops

    fluent = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "the lazy dog sleeps near the quick river while the fox jumps",
        "a brown fox and a lazy dog share the quiet river bank today",
        "the dog and the fox rest near the brown river bank at dusk",
        "quick foxes jump over lazy dogs near quiet river banks daily",
    ]
    garbled = "zq9#x@!kv%7jw^\x60pf&4um*"
    rows = [(i, t, "en") for i, t in enumerate(fluent)] + [(99, garbled, "en")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = text_ops.ppl_buckets(docs, by_col="lang", n_buckets=3).collect()
    assert len(out) == 6
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert {b: len(v) for b, v in by_bucket.items()} == {1: 2, 2: 2, 3: 2}
    # independent replay of the cut: sort by (score desc, id), chunk
    order = sorted(out, key=lambda r: (-r.lm_score, r.doc_id))
    for i, r in enumerate(order):
        assert r.bucket == i // 2 + 1, (r.doc_id, r.bucket)
    labels = {r.bucket: r.bucket_label for r in out}
    assert labels == {1: "head", 2: "middle", 3: "tail"}
    assert any(r.doc_id == 99 and r.bucket_label == "tail" for r in out)
    with pytest.raises(ValueError):
        text_ops.ppl_buckets(docs, n_buckets=1)


def test_semantic_dedup_one_pass_rule(spark):
    """semantic_dedup pins the SemDeDup one-pass decision: earlier
    vectors suppress later ones whether or not they were themselves
    removed (NOT greedy MIS), the cluster's first vector is always
    kept, zero vectors never divide by zero, and tau validates."""
    import math

    import pytest

    from hyper_storage_spark.operators import dedup as dd

    def rot(theta):  # unit vector at angle theta in the xy-plane
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    t1 = math.acos(0.98)
    rows = [
        (0, rot(0.0)),        # A: first -> kept
        (1, rot(t1)),         # B: cos(A,B)=0.98 >= tau -> removed
        (2, rot(2 * t1)),     # C: cos(B,C)=0.98, cos(A,C)=0.92 < tau
                              #    -> removed BECAUSE OF removed B
        (3, [0.0, 0.0, 0.0, 0.0]),  # zero vector: cosine 0 -> kept
        (4, [0.0, 0.0, 1.0, 0.0]),  # orthogonal -> kept
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in dd.semantic_dedup(emb, k=2, tau=0.97).collect()}
    assert out[0].kept and out[0].max_prior_cos == -1.0
    assert not out[1].kept and abs(out[1].max_prior_cos - 0.98) < 1e-9
    assert not out[2].kept and abs(out[2].max_prior_cos - 0.98) < 1e-9
    # {3, 4} form the second cluster: the zero vector is its first
    # member; vec 4's only prior is the ZERO vector, so the zero-norm
    # guard must yield cosine 0.0, not NaN
    assert out[3].kept and out[3].max_prior_cos == -1.0
    assert out[4].kept and abs(out[4].max_prior_cos) < 1e-12
    with pytest.raises(ValueError):
        dd.semantic_dedup(emb, k=2, tau=0.0)


def test_time_weighted_avg_hand_computed(spark):
    """TWAP vs hand arithmetic: LOCF segment weighting, single-obs
    NULL, duplicate-timestamp ties contribute zero duration, and the
    burst case where plain AVG and TWAP disagree."""
    import datetime as dt

    from hyper_storage_spark.operators import timeseries as ts_ops

    t0 = dt.datetime(2024, 1, 1)

    def at(sec):
        return t0 + dt.timedelta(seconds=sec)

    rows = [
        # g1: 10 for 10s, 20 for 20s -> (100+400)/30 = 16.666667
        ("g1", at(0), 10.0), ("g1", at(10), 20.0), ("g1", at(30), 40.0),
        # g2: burst — 100 ten times in the first second, then 0 for 99s
        *[("g2", at(i / 10), 100.0) for i in range(10)],
        ("g2", at(1), 0.0), ("g2", at(100), 0.0),
        # g3: single observation -> NULL
        ("g3", at(0), 7.0),
        # g4: duplicate timestamps (tie) -> zero-duration segment
        ("g4", at(0), 1.0), ("g4", at(0), 9.0), ("g4", at(10), 5.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = {
        r.g: r
        for r in ts_ops.time_weighted_avg(df, "ts", "v", group_cols=("g",)).collect()
    }
    assert out["g1"].twa == 16.666667 and out["g1"].span_us == 30_000_000
    # g2: 100 held 0.1s x9 + 0.1s (to t=1) => 100*1s, then 0 for 99s
    assert out["g2"].twa == 1.0
    assert out["g3"].twa is None and out["g3"].n_obs == 1
    # g4: tie at t=0 -> (1.0 x 0s) + (9.0 x 10s) / 10s = 9.0
    assert out["g4"].twa == 9.0


def test_golden_records_survivorship(spark):
    """golden_records: per-field survivorship with hand-checked mode /
    max / min / longest winners, greatest-value tie-breaks, NULLs
    never beating a non-null, all-null fields staying NULL, and
    validation of unknown policies/columns."""
    import pytest

    from hyper_storage_spark.operators import dedup as dd

    rows = [
        # c1: mode city=paris (2 vs 1); max n=9; longest name wins
        (1, "paris", 3, "jean-pierre"),
        (1, "paris", 9, "jp"),
        (1, "lyon", 5, None),
        # c2: mode tie london/berlin 1-1 -> greatest value 'london';
        #     longest tie 'bb' vs 'aa' (len 2) -> greatest 'bb'
        (2, "london", 1, "aa"),
        (2, "berlin", 2, "bb"),
        # c3: city all NULL -> stays NULL; name single non-null wins
        (3, None, 7, "only"),
        (3, None, 4, None),
    ]
    df = spark.createDataFrame(rows, "cluster long, city string, n long, name string")
    got = {
        r.cluster: (r.city, r.n, r.name)
        for r in dd.golden_records(
            df, "cluster", {"city": "mode", "n": "max", "name": "longest"}
        ).collect()
    }
    assert got == {
        1: ("paris", 9, "jean-pierre"),
        2: ("london", 2, "bb"),
        3: (None, 7, "only"),
    }
    mins = {r.cluster: r.n for r in dd.golden_records(df, "cluster", {"n": "min"}).collect()}
    assert mins == {1: 3, 2: 1, 3: 4}
    with pytest.raises(ValueError):
        dd.golden_records(df, "cluster", {"city": "median"})
    with pytest.raises(ValueError):
        dd.golden_records(df, "cluster", {"nope": "max"})


def test_rolling_trend_hand_computed(spark):
    """rolling_trend vs hand OLS: known slopes on a constructed daily
    series, missing-day handling through the calendar RANGE frame,
    single-day NULL, negative slope sign handling, and validation."""
    import datetime as dt

    import pytest

    from hyper_storage_spark.operators import timeseries as ts_ops

    rows = []
    # key 'up': counts 1,2,3,4 on days 0-3 -> slope 1.0 everywhere
    for d, n in enumerate([1, 2, 3, 4]):
        for _ in range(n):
            rows.append(("up", dt.datetime(2024, 1, 1 + d, 12)))
    # key 'gap': 5 events day 0, 1 event day 4 (days 1-3 missing):
    # x = {0, 4}, y = {5, 1} -> slope (over the 2 present days) = -1.0
    for _ in range(5):
        rows.append(("gap", dt.datetime(2024, 1, 1, 12)))
    rows.append(("gap", dt.datetime(2024, 1, 5, 12)))
    # key 'one': a single day -> NULL slope
    rows.append(("one", dt.datetime(2024, 1, 1, 12)))
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    out = {
        (r.k, r.day.day): r
        for r in ts_ops.rolling_trend(df, "ts", ("k",), window_days=7).collect()
    }
    assert out[("up", 1)].slope is None          # first day: one point
    assert out[("up", 2)].slope == 1.0           # two points, slope 1
    assert out[("up", 4)].slope == 1.0 and out[("up", 4)].n_days == 4
    assert out[("gap", 1)].slope is None
    assert out[("gap", 5)].slope == -1.0 and out[("gap", 5)].n_days == 2
    assert out[("one", 1)].slope is None
    with pytest.raises(ValueError):
        ts_ops.rolling_trend(df, "ts", ("k",), window_days=1)


def test_hard_negatives_label_semantics(spark):
    """hard_negatives: only other-label vectors qualify, nearest-first
    ranking, NULL labels mine nothing and serve as nothing, zero-norm
    vectors excluded."""
    from hyper_storage_spark.operators import similarity as sim

    rows = [
        (0, [1.0, 0.0], "a"),
        (1, [0.99, 0.14], "a"),   # same label: never a negative for 0
        (2, [0.9, 0.44], "b"),    # nearest other-label
        (3, [0.0, 1.0], "b"),     # far other-label
        (4, [0.5, 0.87], None),   # NULL label: excluded both ways
        (5, [0.0, 0.0], "b"),     # zero norm: excluded
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    out = sim.hard_negatives(emb, [0, 4], k=3, label_col="label")
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.neighbor_label))
    assert 4 not in got                       # NULL-label anchor mines nothing
    assert [n for _, n, _ in sorted(got[0])] == [2, 3]
    assert all(lbl == "b" for _, _, lbl in got[0])


def test_waterfill_quota_hand_computed(spark):
    """waterfill_quota: exact-sum allocation across the regimes —
    zero budget, sub-level remainder (+1 to first groups in (count,
    name) order), mixed whole/capped, and budget >= corpus."""
    import pytest

    from hyper_storage_spark.operators import sampling

    rows = [("a",)] * 5 + [("b",)] * 10 + [("c",)] * 100 + [("d",)] * 3
    df = spark.createDataFrame(rows, "g string")

    def alloc(budget):
        out = {r.g: r.quota for r in sampling.waterfill_quota(df, "g", budget).collect()}
        return out, sum(out.values())

    assert alloc(0) == ({"a": 0, "b": 0, "c": 0, "d": 0}, 0)
    # level 0, leftover 3 -> +1 to d(3), a(5), b(10); c waits
    assert alloc(3) == ({"d": 1, "a": 1, "b": 1, "c": 0}, 3)
    # d, a whole; level 6 for b and c
    assert alloc(20) == ({"d": 3, "a": 5, "b": 6, "c": 6}, 20)
    # only c capped
    assert alloc(50) == ({"d": 3, "a": 5, "b": 10, "c": 32}, 50)
    # budget >= corpus: everyone whole, sum = corpus not budget
    assert alloc(500) == ({"d": 3, "a": 5, "b": 10, "c": 100}, 118)
    with pytest.raises(ValueError):
        sampling.waterfill_quota(df, "g", -1)


def test_collapse_repeats_hand_computed(spark):
    """collapse_repeats: adjacency-only collapse (distance-2 repeats
    survive), runs of any length collapse to one, empty text yields
    zero counts and md5('')."""
    import hashlib

    from hyper_storage_spark.operators import text as text_ops

    rows = [
        (1, "a a a b a"),       # run of 3 -> 'a b a' (distant 'a' kept)
        (2, "x y x y"),          # nothing adjacent -> unchanged
        (3, "  "),               # whitespace only -> empty
        (4, "z"),                # single token
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text_ops.collapse_repeats(df).collect()}
    assert (out[1].n_tokens, out[1].n_collapsed) == (5, 2)
    assert out[1].clean_text == "a b a"
    assert out[1].clean_hash == hashlib.md5(b"a b a").hexdigest()
    assert (out[2].n_collapsed, out[2].clean_text) == (0, "x y x y")
    assert (out[3].n_tokens, out[3].clean_hash) == (
        0,
        hashlib.md5(b"").hexdigest(),
    )
    assert out[4].clean_text == "z"


def test_compression_ratio_signal(spark):
    """with_compression_ratio: boilerplate compresses far below
    prose, random-ish text barely compresses, NULL/empty yield NULL,
    other columns pass through, and the score is deterministic."""
    import random

    from hyper_storage_spark.operators import text as text_ops

    rng = random.Random(3)
    noise = " ".join(
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789") for _ in range(8))
        for _ in range(120)
    )
    rows = [
        (1, "terms of service apply " * 100, "en"),
        (2, noise, "en"),
        (3, None, "de"),
        (4, "", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.doc_id: r for r in text_ops.with_compression_ratio(df).collect()}
    assert out[1].compression_ratio < 0.05          # boilerplate collapses
    assert out[2].compression_ratio > 0.5           # noise barely compresses
    assert out[3].compression_ratio is None
    assert out[4].compression_ratio is None
    assert out[1].lang == "en" and out[3].lang == "de"  # passthrough
    again = {r.doc_id: r.compression_ratio for r in text_ops.with_compression_ratio(df).collect()}
    assert again[1] == out[1].compression_ratio and again[2] == out[2].compression_ratio


def test_leakage_safe_kfold_families_move_together(spark):
    """leakage_safe_kfold: every near-dup family lands in ONE fold,
    folds are within [0, k), the assignment matches the split
    function's family definition, and k validates."""
    import pytest

    from hyper_storage_spark.operators import sampling

    docs = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    # two families: {0,1,2} and {10,11}; rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "a_id long, b_id long"
    )
    out = sampling.leakage_safe_kfold(docs, pairs, k=4).collect()
    folds = {r.doc_id: r.fold for r in out}
    canon = {r.doc_id: r.canonical_id for r in out}
    assert len(folds) == 40
    assert all(0 <= f < 4 for f in folds.values())
    assert folds[0] == folds[1] == folds[2] and canon[2] == 0
    assert folds[10] == folds[11] and canon[11] == 10
    assert len(set(folds.values())) > 1  # spread across folds
    with pytest.raises(ValueError):
        sampling.leakage_safe_kfold(docs, pairs, k=1)


def test_char_lm_and_pagerank_fast_paths_agree(spark):
    """exact=False production paths (IEEE sums, map-side combine) agree
    with the deterministic gate modes to float re-association noise:
    char_lm_score per-doc means and pagerank values within 1e-9
    relative, identical row sets either way."""
    from hyper_storage_spark.operators import graph as graph_ops
    from hyper_storage_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(i, ("the quick brown fox %d " % i) * 8) for i in range(40)],
        "doc_id long, text string",
    )
    ex = {r.doc_id: r for r in text_ops.char_lm_score(docs, n=3).collect()}
    fa = {r.doc_id: r for r in text_ops.char_lm_score(docs, n=3, exact=False).collect()}
    assert ex.keys() == fa.keys()
    for k in ex:
        assert ex[k].n_grams == fa[k].n_grams
        assert abs(ex[k].lm_score - fa[k].lm_score) <= 1e-9 * abs(ex[k].lm_score)

    e = spark.createDataFrame(
        [(i, (i * 7 + 1) % 50) for i in range(50)] + [(i, 0) for i in range(50)],
        "src long, dst long",
    )
    pe = {r.node: r.val for r in graph_ops.pagerank(e, iters=4).collect()}
    pf = {r.node: r.val for r in graph_ops.pagerank(e, iters=4, exact=False).collect()}
    assert pe.keys() == pf.keys()
    for k in pe:
        assert abs(pe[k] - pf[k]) <= 1e-9 * max(1.0, abs(pe[k]))
    # hub_buckets=1 degenerates to the flat pinned fold and must raise on 0
    p1 = {r.node: r.val for r in graph_ops.pagerank(e, iters=4, hub_buckets=1).collect()}
    for k in pe:
        assert abs(pe[k] - p1[k]) <= 1e-12 * max(1.0, abs(pe[k]))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="hub_buckets"):
        graph_ops.pagerank(e, hub_buckets=0)


def test_ivfpq_lifecycle_monitor_and_rebuild(spark, sf_dir):
    """The persisted-index append lifecycle (round-11): ivfpq_append
    freezes cells/codebooks, so after the corpus quadruples the health
    check must flag the index undersized and ivfpq_rebuild_if_needed
    must retrain at the ivfpq_params_for cell count — and the rebuilt
    index must still clear the family's 0.85 recall floor vs exact
    cosine. A right-sized index passes through untouched, and a
    hot-pile append (every new vector near one boot vector) trips the
    skew trigger even when the size rule alone would not."""
    emb = load_table(spark, sf_dir, "embeddings")
    boot = emb.filter(F.col("vec_id") < 250)
    idx = similarity.ivfpq_index(boot, n_cells=16)

    # healthy at boot size: no rebuild, same object back
    same, rebuilt, h0 = similarity.ivfpq_rebuild_if_needed(
        idx, boot, target_occupancy=32
    )
    assert rebuilt is False and same is idx
    assert h0["n_rows"] == 250 and h0["n_cells"] == 16 and not h0["needs_rebuild"]

    # quadruple the corpus via appends (jittered copies: new ids, ~same
    # directions — realistic drift-free growth)
    grown = boot
    full = boot.select("vec_id", "embedding")
    for r in (1, 2, 3):
        batch = emb.filter(F.col("vec_id") < 250).select(
            (F.col("vec_id") + F.lit(100_000 * r)).alias("vec_id"),
            F.transform(
                F.col("embedding"), lambda x: x * F.lit(1.0 + 0.003 * r)
            ).alias("embedding"),
        )
        grown = similarity.ivfpq_append(grown if r > 1 else idx, batch)
        full = full.unionByName(batch)
    full = full.localCheckpoint()

    h1 = similarity.ivfpq_health(grown, target_occupancy=32)
    assert h1["n_rows"] == 1000 and h1["undersized"] and h1["needs_rebuild"]
    assert h1["want_cells"] == 32 and h1["n_cells"] == 16

    new_idx, rebuilt, _ = similarity.ivfpq_rebuild_if_needed(
        grown, full, target_occupancy=32
    )
    assert rebuilt is True
    assert new_idx.centroids.shape[0] == 32
    # same compression geometry carried over
    assert new_idx.codebooks.shape[:2] == grown.codebooks.shape[:2]
    h2 = similarity.ivfpq_health(new_idx, target_occupancy=32)
    assert not h2["undersized"] and h2["n_rows"] == 1000

    # contract floor after rebuild: recall >= 0.85 vs exact cosine
    qids = [0, 10, 20]
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(full, qids, k=10).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivfpq_search(new_idx, full, qids, k=10, n_probe=12).collect()
    }
    assert len(got & exact) / len(exact) >= 0.85

    # skew trigger: pile 300 near-copies of ONE boot vector onto the
    # fresh right-sized index — size rule alone stays quiet, skew fires
    base_idx = similarity.ivfpq_index(boot, n_cells=16)
    one = emb.filter(F.col("vec_id") == 0)
    pile = (
        spark.range(1, 301)
        .crossJoin(one.select("embedding"))
        .select(
            (F.col("id") + F.lit(500_000)).alias("vec_id"),
            F.col("embedding"),
        )
    )
    hot = similarity.ivfpq_append(base_idx, pile)
    h3 = similarity.ivfpq_health(hot, target_occupancy=64, skew_factor=4.0)
    assert h3["skewed"] and h3["needs_rebuild"] and not h3["undersized"]
    assert h3["max_occupancy"] > 300


def test_semantic_dedup_string_ids(spark):
    """ADVICE r10: the applyInPandas output schema must derive the id
    type from the input — string doc ids are as valid as bigints."""
    import math

    from hyper_storage_spark.operators import dedup as dd

    def rot(theta):
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    t1 = math.acos(0.98)
    rows = [("docA", rot(0.0)), ("docB", rot(t1)), ("docC", rot(math.pi / 2))]
    emb = spark.createDataFrame(rows, "doc_id string, embedding array<double>")
    out = {
        r.doc_id: r.kept
        for r in dd.semantic_dedup(
            emb, k=2, tau=0.95, id_col="doc_id", vec_col="embedding"
        ).collect()
    }
    # lexicographic id order: docA first (kept), docB within tau of A
    # (removed), docC orthogonal (kept)
    assert out == {"docA": True, "docB": False, "docC": True}


def test_collapse_repeats_null_text_is_zero_tokens(spark):
    """ADVICE r10: NULL text must report n_tokens = 0 (the oracle's
    COALESCE semantics), not Spark's size(NULL) = -1."""
    from hyper_storage_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(1, "go go stop"), (2, None), (3, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in text_ops.collapse_repeats(docs).collect()}
    assert (out[1].n_tokens, out[1].n_collapsed) == (3, 1)
    assert (out[2].n_tokens, out[2].n_collapsed) == (0, 0)
    assert (out[3].n_tokens, out[3].n_collapsed) == (0, 0)
    # NULL and empty text canonicalize to the same empty clean stream
    assert out[2].clean_hash == out[3].clean_hash


def test_bpe_train_batched_is_bit_identical(spark):
    """bpe_train_batched == bpe_train merge-for-merge (ranks, pairs,
    counts) on corpora that exercise every round boundary: the
    reference corpus, an overlap-adversarial corpus, and a corpus run
    with round_size 1 / tiny caps (forcing the fallback and early-stop
    paths). The batched trainer is Sennrich's recompute-every-N
    practical variant made exact — equivalence IS the contract."""
    from hyper_storage_spark.operators import bpe

    docs = spark.createDataFrame(
        [
            (1, "low low low lower lower newest newest newest"),
            (2, "newest widest widest aaaa aaaa aaaa"),
            (3, "low newest   "),
            (4, "banana bandana ananas an na nan"),
        ],
        "doc_id long, text string",
    )

    def table(df):
        return [
            (r.rank, r.left_sym, r.right_sym, r.merged, r.pair_count)
            for r in df.orderBy("rank").collect()
        ]

    seq = table(bpe.bpe_train(docs, n_merges=15))
    assert seq  # non-trivial corpus
    for kwargs in (
        {"round_size": 64},
        {"round_size": 4},
        {"round_size": 1},
        # θ-horizon + affected-row cap bite constantly: every
        # conservative stop and the single-merge fallback get exercised
        {"round_size": 8, "pair_table_cap": 3, "max_affected_rows": 2},
    ):
        got = table(bpe.bpe_train_batched(docs, n_merges=15, **kwargs))
        assert got == seq, f"diverged under {kwargs}"

    # with_state: final vocabulary state matches the sequential trainer
    _, st_seq = bpe.bpe_train(docs, n_merges=10, with_state=True)
    _, st_bat = bpe.bpe_train_batched(docs, n_merges=10, round_size=5, with_state=True)
    assert {r.w: list(r.syms) for r in st_seq.collect()} == {
        r.w: list(r.syms) for r in st_bat.collect()
    }

    # validation contract parity
    import pytest

    for bad in ({"n_merges": 0}, {"min_count": 0}, {"round_size": 0}):
        with pytest.raises(ValueError):
            bpe.bpe_train_batched(docs, **{"n_merges": 5, **bad})


def test_gopher_rules_hand_computed(spark):
    """Gopher rule battery pinned by hand: a clean prose doc passes all
    seven rules; a bullet wall, a symbol-heavy doc, a non-alphabetic
    doc, and NULL text each fail exactly the expected rule."""
    from hyper_storage_spark.operators import text as text_ops

    prose = ("the quick brown fox jumps over and over with plenty of " * 6).strip()
    bullets = "\n".join(f"- item {i}" for i in range(10))
    symbols = "the " + "# " * 30 + "of and that have with be to"
    digits = " ".join(str(i) for i in range(60))
    rows = [(1, prose), (2, bullets), (3, symbols), (4, digits), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text_ops.gopher_rules(df).collect()}

    assert out[1].gopher_pass and out[1].n_words == 66
    assert out[1].stop_hits >= 2 and out[1].r_alpha_words

    assert not out[2].gopher_pass
    assert out[2].bullet_frac == 1.0 and not out[2].r_bullet_lines

    assert not out[3].gopher_pass
    assert out[3].symbol_ratio > 0.1 and not out[3].r_symbol_ratio

    assert not out[4].gopher_pass
    assert out[4].alpha_frac == 0.0 and not out[4].r_alpha_words

    assert out[5].n_words == 0 and not out[5].gopher_pass


def test_c4_line_filters_hand_computed(spark):
    """C4 line filter pinned by hand: terminal-punctuation + 3-word
    minimum decide line survival; lorem-ipsum and curly-brace flags
    veto the document; the clean hash certifies the byte stream."""
    import hashlib

    from hyper_storage_spark.operators import text as text_ops

    doc = "\n".join([
        "This line survives the filter.",   # kept
        "Too short.",                        # < 3 words
        "no terminal punctuation here",      # no terminal punct
        "Another good line stays here!",     # kept
        "Is this a question line?",          # kept
        "",                                   # blank: not even counted
    ])
    rows = [(1, doc), (2, "Lorem ipsum dolor sit amet. More text follows here."),
            (3, "A code doc { return 1; } with braces."), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text_ops.c4_line_filters(df).collect()}

    kept = ["This line survives the filter.", "Another good line stays here!",
            "Is this a question line?"]
    assert out[1].n_lines == 5 and out[1].n_lines_kept == 3
    assert out[1].c4_keep
    assert out[1].clean_hash == hashlib.md5("\n".join(kept).encode()).hexdigest()
    assert out[1].clean_text == "\n".join(kept)

    assert out[2].has_lorem_ipsum and not out[2].c4_keep
    assert out[3].has_curly_brace and not out[3].c4_keep
    assert out[4].n_lines == 0 and not out[4].c4_keep


def test_bpe_batched_cap_truncation_does_not_end_training(spark):
    """r12 review: with the pair table cap-truncated at or above
    min_count (theta >= min_count), an exhausted/decayed TRACKED pair
    view proves nothing about untracked pairs with true counts in
    [min_count, theta] — the round must break to the distributed
    recompute, not end training. This corpus (found by differential
    search against the sequential trainer) made the pre-fix code stop
    at 5 merges where bpe_train learns 7."""
    from hyper_storage_spark.operators import bpe

    docs = spark.createDataFrame(
        [
            (0, "cbb caac cca bb ac cacb"),
            (1, "ccc acac aa ac bb cac"),
            (2, "cb aca cbb acbb cb ac"),
            (3, "ba baa aaaa bcb acc cb"),
        ],
        "doc_id long, text string",
    )

    def table(df):
        return [
            (r.rank, r.left_sym, r.right_sym, r.merged, r.pair_count)
            for r in df.orderBy("rank").collect()
        ]

    seq = table(bpe.bpe_train(docs, n_merges=8, min_count=2))
    assert len(seq) == 7  # the corpus supports exactly 7 merges
    got = table(
        bpe.bpe_train_batched(
            docs, n_merges=8, min_count=2, round_size=8,
            pair_table_cap=2, max_affected_rows=1000,
        )
    )
    assert got == seq


def test_ngram_jaccard_candidate_budget_routing(spark):
    """r12: the posting-mass budget routes hot corpora out of exact
    inverted-index Jaccard. The mass is Σ C(df,2) over retained
    shingle lists — exactly the pair rows the explosion would emit —
    so the threshold is pinned by construction: 'aaaa bbbb cccc'
    shared by 3 docs gives every shingle df=3, C(3,2)=3 pairs each."""
    import warnings

    import pytest

    from hyper_storage_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, "aaaa bbbb cccc") for i in range(3)] + [(9, "zz yy xx ww")],
        "doc_id long, text string",
    )
    # shingles of the triple doc: 'aaaa bbbb cccc' → one 3-gram, df=3,
    # mass = 3; the singleton doc adds df=1 lists (mass 0)
    exact = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    expect = {(r.a_id, r.b_id, r.jaccard) for r in exact.collect()}
    assert expect == {(0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0)}

    # at the budget: stays exact (strictly-greater routes)
    at = dedup.ngram_jaccard_pairs(docs, threshold=0.5, candidate_budget=3)
    assert {(r.a_id, r.b_id, r.jaccard) for r in at.collect()} == expect

    # above the budget with raise: names the scale path
    with pytest.raises(dedup.HotCorpusError, match="minhash_lsh_pairs"):
        dedup.ngram_jaccard_pairs(
            docs, threshold=0.5, candidate_budget=2, hot_action="raise"
        )

    # above the budget with route: warns and returns the auto-sized
    # minhash_lsh_pairs result
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        routed = dedup.ngram_jaccard_pairs(docs, threshold=0.5, candidate_budget=2)
        got = {(r.a_id, r.b_id, r.jaccard) for r in routed.collect()}
    assert any("rerouting to minhash_lsh_pairs" in str(x.message) for x in w)
    nh, nb = dedup.minhash_params_for(4, 0.5)
    want = {
        (r.a_id, r.b_id, r.jaccard)
        for r in dedup.minhash_lsh_pairs(docs, 0.5, nh, nb).collect()
    }
    assert got == want
    # identical docs have jaccard 1.0 — LSH catches them at any sizing
    assert got == expect

    # the df cap feeds the estimate: capped-out lists carry no mass
    capped = dedup.ngram_jaccard_pairs(
        docs, threshold=0.5, max_df=2, candidate_budget=0, hot_action="raise"
    )
    assert capped.count() == 0  # every shared shingle had df=3 > cap

    with pytest.raises(ValueError, match="hot_action"):
        dedup.ngram_jaccard_pairs(docs, candidate_budget=1, hot_action="explode")

    # a LOW threshold must still route (params_for's background_j
    # precondition is clamped under the threshold, not surfaced as an
    # opaque ValueError)
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        low = dedup.ngram_jaccard_pairs(docs, threshold=0.1, candidate_budget=2)
        assert {(r.a_id, r.b_id) for r in low.collect()} >= {(0, 1), (0, 2), (1, 2)}

    # threshold 1.0 (the exact-duplicate setting) must route too: the
    # SIZING threshold is clamped into params_for's open interval
    # (j_detect=(1+1)/2=1.0 fails its j_detect<1 bound otherwise); the
    # verify still filters at the caller's 1.0
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        t1 = dedup.ngram_jaccard_pairs(docs, threshold=1.0, candidate_budget=2)
        assert {(r.a_id, r.b_id) for r in t1.collect()} == {(0, 1), (0, 2), (1, 2)}


def test_budget_reroute_preserves_capped_metric(spark):
    """r12 review fix: max_df survives the budget reroute — the routed
    path caps shingles BEFORE signatures, so it measures the same
    capped Jaccard as the exact operator (boilerplate dropped from
    numerator AND set sizes). Without the pass-through, unrelated
    boilerplate-heavy docs exceed the threshold on uncapped Jaccard
    and the reroute would change the METRIC, not just the recall."""
    import warnings

    from hyper_storage_spark.operators import dedup

    rows = [(i, "x1 x2 x3 x4 x5") for i in range(8)]  # boiler df=10 > cap
    rows += [(100, "x1 x2 x3 x4 x5 a1"), (101, "x1 x2 x3 x4 x5 b1")]
    rows += [(i, "m1 m2 m3") for i in range(200, 204)]  # df=4 ≤ cap: the mass
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    want = {(a, b) for a in range(200, 204) for b in range(a + 1, 204)}
    exact = {
        (r.a_id, r.b_id)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_df=4).collect()
    }
    assert exact == want

    # m1m2m3 has df=4: mass C(4,2)=6 > budget 2 → reroute, cap kept
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        routed = {
            (r.a_id, r.b_id)
            for r in dedup.ngram_jaccard_pairs(
                docs, threshold=0.5, max_df=4, candidate_budget=2
            ).collect()
        }
    assert any("capped-Jaccard metric is preserved" in str(x.message) for x in w)
    assert routed == exact

    # sanity: without the cap the boilerplate family DOES clear the
    # threshold (identical uncapped sets) — the pass-through is what
    # keeps the metric, not an accident of the corpus
    uncapped = {
        (r.a_id, r.b_id)
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert (0, 1) in uncapped


def test_ppl_buckets_approx_agreement(spark):
    """r12: exact_depth=False (percentile_approx cuts, no per-group
    window) agrees with the exact ntile path on gate-sized data: same
    output coverage, score-monotone buckets, near-equal depths, and
    high per-doc bucket agreement. A skewed corpus (one language
    holding ~all docs) exercises exactly the shape that breaks the
    window at scale."""
    import random

    from hyper_storage_spark.operators import text as text_ops

    random.seed(3)
    words = ["the", "quick", "brown", "fox", "dog", "river", "bank",
             "jumps", "lazy", "near", "quiet", "dusk", "today", "daily"]
    rows = []
    for i in range(300):  # dominant language
        rows.append((i, " ".join(random.choice(words) for _ in range(12)), "en"))
    for i in range(300, 312):  # minority language
        rows.append((i, " ".join(random.choice(words[::-1]) for _ in range(8)), "fr"))
    for i in range(312, 318):  # unidentified language: by_col NULL
        rows.append((i, " ".join(random.choice(words) for _ in range(10)), None))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    exact = {r.doc_id: r for r in text_ops.ppl_buckets(docs, n_buckets=3).collect()}
    approx = {
        r.doc_id: r
        for r in text_ops.ppl_buckets(docs, n_buckets=3, exact_depth=False).collect()
    }
    # identical coverage and identical scores (the scoring path is
    # shared); the NULL-lang group must survive BOTH paths — the cuts
    # join is null-safe, not a null-dropping equi-join
    assert set(exact) == set(approx)
    assert {i for i in range(312, 318)} <= set(approx)
    for i in exact:
        assert exact[i].lm_score == approx[i].lm_score

    # score-monotone buckets (exact by construction of the cut predicate)
    from collections import defaultdict

    spans = defaultdict(lambda: defaultdict(list))
    for r in approx.values():
        spans[r.lang][r.bucket].append(r.lm_score)
    for lang, bs in spans.items():
        assert set(bs) <= {1, 2, 3}
        for b in sorted(bs)[:-1]:
            if b + 1 in bs:
                assert min(bs[b]) >= max(bs[b + 1]), (lang, b)

    # near-equal depths for the dominant group
    en_depths = [len(spans["en"][b]) for b in (1, 2, 3)]
    assert sum(en_depths) == 300
    assert all(abs(d - 100) <= 20 for d in en_depths), en_depths

    # per-doc agreement: only boundary-tie docs may differ
    agree = sum(1 for i in exact if exact[i].bucket == approx[i].bucket)
    assert agree / len(exact) >= 0.9, agree / len(exact)

    # labels follow buckets in the approx path too
    for r in approx.values():
        want = {1: "head", 3: "tail"}.get(r.bucket, "middle")
        assert r.bucket_label == want


def test_q1_q5_fast_agreement(spark, sf_dir):
    """r12: the money-aggregate IEEE fast paths (q1_pricing_fast,
    q5_volume_fast — double accumulators where the exact entries use
    DECIMAL(12,4)) agree with the exact entries to float
    re-association noise on gate data: identical group sets, every
    numeric cell within 1e-9 relative after the shared ROUND."""
    from hyper_storage_spark import queries as Q

    def keyed(df, keys):
        rows = df.collect()
        out = {}
        for r in rows:
            d = r.asDict()
            out[tuple(d.pop(k) for k in keys)] = d
        return out

    ex = keyed(Q._q1_impl(spark, sf_dir, exact=True), ["l_returnflag", "l_linestatus"])
    fa = keyed(Q._q1_impl(spark, sf_dir, exact=False), ["l_returnflag", "l_linestatus"])
    assert ex.keys() == fa.keys() and ex
    for k in ex:
        assert ex[k]["count_order"] == fa[k]["count_order"]
        for c in ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge", "avg_qty"):
            assert abs(ex[k][c] - fa[k][c]) <= 1e-9 * max(1.0, abs(ex[k][c])), (k, c)

    ex5 = keyed(Q._q5_impl(spark, sf_dir, exact=True), ["n_name"])
    fa5 = keyed(Q._q5_impl(spark, sf_dir, exact=False), ["n_name"])
    assert ex5.keys() == fa5.keys() and ex5
    for k in ex5:
        assert abs(ex5[k]["revenue"] - fa5[k]["revenue"]) <= 1e-9 * max(
            1.0, abs(ex5[k]["revenue"])
        ), k


def test_ivfpq_split_cells_incremental_maintenance(spark):
    """r12 (VERDICT item 7): ivfpq_split_cells splits only the overfull
    cells — untouched cells' codes are byte-identical, only the hot
    mass re-encodes (with frozen codebooks), the cell count grows, and
    recall matches a full rebuild at the same cell count."""
    import math
    import random

    from hyper_storage_spark.operators import similarity as sim

    random.seed(5)
    dim, m, n_codes = 8, 4, 4

    def vec(center, spread):
        return [center[i] + random.uniform(-spread, spread) for i in range(dim)]

    c_a = [1.0, 0, 0, 0, 0, 0, 0, 0]
    c_b = [0, 1.0, 0, 0, 0, 0, 0, 0]
    c_hot = [0, 0, 1.0, 0, 0, 0, 0, 0]
    rows = [(i, vec(c_a, 0.05)) for i in range(30)]
    rows += [(100 + i, vec(c_b, 0.05)) for i in range(30)]
    boot = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # hot batch: 300 near-identical vectors -> one cell swallows them
    batch = spark.createDataFrame(
        [(1000 + i, vec(c_hot, 0.01)) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    corpus = boot.unionByName(batch)

    idx = sim.ivfpq_index(boot, n_cells=4, m=m, n_codes=n_codes)
    grown = sim.ivfpq_append(idx, batch)
    health = sim.ivfpq_health(grown, target_occupancy=4096, skew_factor=2.0)
    assert health["skewed"]

    before = {
        (r.neighbor_id, r.cell, tuple(r.codes)) for r in grown.codes.collect()
    }
    refined, report = sim.ivfpq_split_cells(
        grown, corpus, skew_factor=2.0, seed=7
    )
    assert report["split"] >= 1
    assert report["cells_after"] > report["cells_before"] == 4
    hot = set(report["split_cell_ids"])
    # untouched cells: codes byte-identical
    after = {
        (r.neighbor_id, r.cell, tuple(r.codes)) for r in refined.codes.collect()
    }
    assert {t for t in before if t[1] not in hot} <= after
    # only the hot mass re-encoded
    assert report["reencoded_rows"] == sum(
        1 for t in before if t[1] in hot
    )
    # total coverage preserved
    assert len(after) == len(before)

    # recall parity with a full rebuild at the same cell count
    qids = [0, 100, 1000]
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.cosine_topk(corpus, qids, k=10).collect()
    }
    def recall(index):
        got = {
            (r.query_id, r.neighbor_id)
            for r in sim.ivfpq_search(index, corpus, qids, k=10, n_probe=4).collect()
        }
        return len(got & exact) / len(exact)

    rebuilt = sim.ivfpq_index(
        corpus, n_cells=report["cells_after"], m=m, n_codes=n_codes
    )
    r_ref, r_reb = recall(refined), recall(rebuilt)
    assert r_ref >= 0.8, r_ref
    assert r_ref >= r_reb - 0.1, (r_ref, r_reb)

    # a healthy index passes through untouched
    same, rep2 = sim.ivfpq_split_cells(refined, corpus, skew_factor=1000.0)
    assert rep2["split"] == 0 and same is refined or rep2["cells_after"] == report["cells_after"]


def test_containment_budget_and_ivfpq_maintain_policy(spark):
    """r12 follow-ups: (a) containment_pairs shares ngram's posting-
    mass budget (raise-only — the metric is asymmetric, MinHash can't
    certify it); (b) ivfpq_maintain picks the cheapest sufficient
    action: none when healthy, split when skewed-only, rebuild when
    undersized."""
    import pytest

    from hyper_storage_spark.operators import dedup, similarity as sim

    docs = spark.createDataFrame(
        [(i, "aaaa bbbb cccc dddd eeee ffff") for i in range(3)],
        "doc_id long, text string",
    )
    # 2 distinct 5-gram shingles, each df=3 -> mass = 2 * C(3,2) = 6
    ok = dedup.containment_pairs(docs, n=5, candidate_budget=6)
    assert ok.count() == 3
    with pytest.raises(dedup.HotCorpusError, match="pre-block"):
        dedup.containment_pairs(docs, n=5, candidate_budget=5)

    import random

    random.seed(9)
    dim, m, n_codes = 8, 4, 4

    def vec(c, s):
        return [c[i] + random.uniform(-s, s) for i in range(dim)]

    a = [1.0, 0, 0, 0, 0, 0, 0, 0]
    b = [0, 1.0, 0, 0, 0, 0, 0, 0]
    h = [0, 0, 1.0, 0, 0, 0, 0, 0]
    boot = spark.createDataFrame(
        [(i, vec(a, 0.05)) for i in range(25)]
        + [(100 + i, vec(b, 0.05)) for i in range(25)],
        "vec_id long, embedding array<double>",
    )
    # 16 cells = the ivfpq_params_for floor, so the healthy case is
    # not spuriously "undersized"
    idx = sim.ivfpq_index(boot, n_cells=16, m=m, n_codes=n_codes)

    # healthy: generous occupancy target, no skew
    same, action, health = sim.ivfpq_maintain(idx, boot, target_occupancy=4096,
                                              skew_factor=1000.0)
    assert action == "none" and same is idx

    # skewed only: hot batch, occupancy target still generous
    hot = spark.createDataFrame(
        [(1000 + i, vec(h, 0.01)) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    grown = sim.ivfpq_append(idx, hot)
    corpus = boot.unionByName(hot)
    refined, action, health = sim.ivfpq_maintain(
        grown, corpus, target_occupancy=4096, skew_factor=2.0
    )
    assert action == "split" and health["skewed"] and not health["undersized"]
    assert refined.centroids.shape[0] > 16

    # undersized: tiny occupancy target forces the full-retrain path
    rebuilt, action, health = sim.ivfpq_maintain(
        grown, corpus, target_occupancy=4, skew_factor=2.0
    )
    assert action == "rebuild" and health["undersized"]
    assert rebuilt.codebooks.shape == (m, n_codes, dim // m)
