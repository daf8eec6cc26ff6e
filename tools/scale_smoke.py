"""Scale smoke: run the bucketed dedup/ANN operators at 10× the bench
corpus and check both wall-time growth and plan safety.

Builds a 50k-document corpus (10 offset replicas of sf0.1's documents
table — preserves the near-dup structure while multiplying cardinality)
and a 50k-vector embedding corpus in a temp dir, then:

- times exact/minhash/simhash/ngram dedup and the bucketed ANN at 1×
  and 10×, printing the growth factor (a quadratic operator shows
  ~100×; the bucketed designs should stay near-linear modulo fixed
  overheads);
- asserts no CartesianProduct appears in any 10× plan, and no
  BroadcastNestedLoopJoin beyond BM25's single-row corpus-scalar
  attach (the scale-killer shapes).

Usage: python tools/scale_smoke.py [replicas]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def span_realistic(replicas: int = 10, dup_pct: int = 3) -> None:
    """Span-removal/containment at a REALISTIC duplication rate.

    The main smoke's replica corpus is the worst case — identical text
    on every replica, so every window is duplicated and every document
    pays the HOF array rebuild. Real corpora duplicate a few percent.
    Here only ``dup_pct``% of documents keep identical text across
    replicas (the rest get a per-replica salt token prepended, which
    shifts every shingle), so the flagged-start set — and therefore
    the rebuild work — is proportional to the duplication rate, not
    the corpus: the common case should grow near-flat vs the
    worst-case rows recorded in SCALE.md. Prints 1×→N× growth rows for
    both operators at the given rate."""
    from hyper_storage_spark.operators import dedup
    from hyper_storage_spark.operators._caches import release_tracked_caches
    from hyper_storage_spark.session import get_spark
    from hyper_storage_spark.sources.tables import load_table

    spark = get_spark("scale_smoke_span")
    tmp = tempfile.mkdtemp(prefix="scale_smoke_span_")
    docs1 = load_table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
    mod = max(1, round(100 / dup_pct))

    union = None
    for r in range(replicas):
        # the salt must be WOVEN THROUGH the text (every 4th word):
        # shingles and span windows are content-addressed, so a prefix
        # salt leaves every interior window identical across replicas —
        # tested, it kept ~100% of pairs flagged
        salted = F.regexp_replace(F.col("text"), r"(\S+ \S+ \S+ \S+) ", f"$1 u{r}q ")
        part = docs1.select(
            (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
            F.when(F.pmod(F.col("doc_id"), F.lit(mod)) == 0, F.col("text"))
            .otherwise(salted)
            .alias("text"),
        )
        union = part if union is None else union.unionAll(part)
    big_path = f"{tmp}/docs_realistic"
    union.write.mode("overwrite").parquet(big_path)
    big = spark.read.parquet(big_path)
    print(f"# realistic corpus: {docs1.count()} -> {big.count()} docs, "
          f"~{dup_pct}% cross-replica duplicated text")

    cases = {
        "span_removal": lambda d: d and dedup.remove_dup_spans(d, span=8)
        .agg(F.sum("n_removed"), F.count("clean_hash"))
        .collect()[0][1],
        "containment": lambda d: dedup.containment_pairs(
            d, threshold=0.8, n=5, max_df=100
        ).count(),
    }
    for name, fn in cases.items():
        fn(docs1)
        release_tracked_caches()
        t0 = time.time()
        n1 = fn(docs1)
        t1 = time.time() - t0
        release_tracked_caches()
        t0 = time.time()
        nN = fn(big)
        tN = time.time() - t0
        release_tracked_caches()
        print(
            f"# {name}@{dup_pct}%dup: 1x {t1:.2f}s ({n1} rows) -> {replicas}x "
            f"{tN:.2f}s ({nN} rows), growth {tN / max(t1, 1e-9):.1f}x"
        )


def lsh_sizing(replicas: int = 10) -> None:
    """Bucket-occupancy smoke for the auto-sized LSH families
    (dedup.minhash_params_for / simhash_hamming_budget — the
    planes_for occupancy rule generalized, round 8). Builds the same
    worst-case replica corpus as the main smoke and reports, at 1× and
    N×: the (num_hashes, bands) / hamming budget the sizing functions
    pick, the resulting CANDIDATE pair volume, and the hottest
    band-bucket — fixed params beside auto params, so the table shows
    what the sizing buys as the corpus grows."""
    from hyper_storage_spark.operators import dedup
    from hyper_storage_spark.operators._caches import release_tracked_caches
    from hyper_storage_spark.session import get_spark
    from hyper_storage_spark.sources.tables import load_table

    spark = get_spark("scale_smoke_lsh")
    tmp = tempfile.mkdtemp(prefix="scale_smoke_lsh_")
    docs1 = load_table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
    union = None
    for r in range(replicas):
        salted = F.regexp_replace(F.col("text"), r"(\S+ \S+ \S+ \S+) ", f"$1 u{r}q ")
        part = docs1.select(
            (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
            F.when(F.pmod(F.col("doc_id"), F.lit(33)) == 0, F.col("text"))
            .otherwise(salted)
            .alias("text"),
        )
        union = part if union is None else union.unionAll(part)
    big_path = f"{tmp}/docs"
    union.write.mode("overwrite").parquet(big_path)
    big = spark.read.parquet(big_path)
    sets = [("1x", docs1, docs1.count()), (f"{replicas}x", big, big.count())]

    for label, d, n in sets:
        for mode, (nh, b) in (
            ("fixed", (32, 8)),
            ("auto", dedup.minhash_params_for(n)),
        ):
            rows = nh // b
            sh = dedup._hashed_shingles(d, "text", 3)
            melted = dedup._band_table(dedup.minhash_signatures(sh, nh), b, rows)
            occ = (
                melted.groupBy("band_id", "band_hash")
                .count()
                .agg(F.max("count").alias("mx"), F.avg("count").alias("avg"))
                .collect()[0]
            )
            t0 = time.time()
            cand = dedup.minhash_lsh_pairs(d, threshold=0.5, num_hashes=nh, bands=b).count()
            wall = time.time() - t0
            release_tracked_caches()
            print(
                f"# minhash {label} {mode} (h={nh},b={b},r={rows}): "
                f"max_bucket={occ.mx} avg_bucket={occ.avg:.1f} "
                f"verified_pairs={cand} wall={wall:.2f}s"
            )
        print(f"# simhash {label}: hamming budget at n={n} -> "
              f"{dedup.simhash_hamming_budget(n)} (target occupancy 128)")


def ivfpq_century(scales=(1, 10, 100)) -> None:
    """IVF-PQ over two decades of corpus growth (round-10 judge item:
    the 10× smoke showed 1.6× wall growth; the probed-cell-scan
    advantage needs one more decade). At each scale the index is sized
    by ``ivfpq_params_for`` (cells double to bound occupancy, probes
    grow as √cells), and the report separates INDEX BUILD (train +
    encode, one-off) from SEARCH (the per-query serving path — the
    number that must stay sublinear). Searches run against a
    MATERIALIZED codes table (parquet round-trip) the way a persisted
    index serves, so the timing isn't re-encoding the corpus per call;
    flat PQ at the same scale prints beside it as the baseline the
    cell routing must beat. Plans are asserted CartesianProduct-free."""
    from hyper_storage_spark.operators import similarity
    from hyper_storage_spark.operators._caches import release_tracked_caches
    from hyper_storage_spark.session import get_spark
    from hyper_storage_spark.sources.tables import load_table

    spark = get_spark("scale_smoke_ivfpq")
    tmp = tempfile.mkdtemp(prefix="scale_smoke_ivfpq_")
    emb1 = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    qids = [0, 1, 2, 3, 4]
    base_search = None

    for s in scales:
        union = None
        for r in range(s):
            part = emb1.select(
                (F.col("vec_id") + F.lit(r * 10_000_000)).alias("vec_id"), "embedding"
            )
            union = part if union is None else union.unionAll(part)
        path = f"{tmp}/emb{s}x"
        union.write.mode("overwrite").parquet(path)
        emb = spark.read.parquet(path)
        n = emb.count()
        n_cells, n_probe, sample = similarity.ivfpq_params_for(n)

        t0 = time.time()
        idx = similarity.ivfpq_index(
            emb, n_cells=n_cells, sample_rows=sample
        )
        codes_path = f"{tmp}/codes{s}x"
        idx.codes.write.mode("overwrite").parquet(codes_path)
        build = time.time() - t0
        idx.codes = spark.read.parquet(codes_path)  # serve from the persisted table

        # min-of-2 search walls (first call pays codegen for the plan)
        best = None
        for _ in range(2):
            t0 = time.time()
            res = similarity.ivfpq_search(idx, emb, qids, k=10, n_probe=n_probe)
            nrows = res.count()
            best = min(best or 9e9, time.time() - t0)
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, f"cartesian at {s}x"
        growth = "" if base_search is None else f" growth={best / base_search:.2f}x"
        base_search = base_search or best
        print(
            f"# ivfpq {s}x: n={n} cells={n_cells} probe={n_probe} "
            f"sample={sample} build={build:.2f}s search={best:.2f}s "
            f"rows={nrows}{growth}"
        )
        release_tracked_caches()
    print("# ivfpq century smoke done")


def graph_fuzzy(scopes=(500, 2000, 8000)) -> None:
    """Round-10 families under scope growth: PageRank on the trade
    graph as the customer scope widens (edges grow with scope; wall
    must grow ~linearly — 8 fixed iterations of edge-partitioned
    joins), and FastSS fuzzy-key pairs as the key universe widens
    (candidates are block-bounded; an all-pairs regression would read
    quadratic). Plans asserted CartesianProduct-free."""
    from pyspark.sql import functions as F

    from hyper_storage_spark.operators import dedup, graph
    from hyper_storage_spark.operators._caches import release_tracked_caches
    from hyper_storage_spark.session import get_spark
    from hyper_storage_spark.sources.tables import load_table

    spark = get_spark("scale_smoke_graph")
    sf_dir = "/root/testdata/sf0.1"
    o_all = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")

    base_pr = base_fz = None
    for scope in scopes:
        ce = (
            o_all.filter(F.col("o_custkey") < scope)
            .join(li, o_all["o_orderkey"] == li["l_orderkey"])
            .select(
                F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
                F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
            )
            .distinct()
        )
        edges = ce.unionByName(
            ce.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        n_edges = edges.count()
        t0 = time.time()
        pr = graph.pagerank(edges, iters=8)
        nrows = pr.count()
        w_pr = time.time() - t0
        plan = pr._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        g = "" if base_pr is None else f" growth={w_pr / base_pr:.2f}x"
        base_pr = base_pr or w_pr
        print(f"# pagerank scope<{scope}: edges={n_edges} nodes={nrows} wall={w_pr:.2f}s{g}")
        release_tracked_caches()

        keys = cust.filter(F.col("c_custkey") < scope * 10)
        n_keys = keys.count()
        t0 = time.time()
        fz = dedup.fuzzy_key_pairs(keys, "c_name", "c_custkey")
        pairs = fz.count()
        w_fz = time.time() - t0
        plan = fz._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        g = "" if base_fz is None else f" growth={w_fz / base_fz:.2f}x"
        base_fz = base_fz or w_fz
        print(f"# fuzzy_keys n={n_keys}: pairs={pairs} wall={w_fz:.2f}s{g}")
        release_tracked_caches()
    print("# graph/fuzzy smoke done")


def pagerank_hub(scales=(1, 4, 16), base_spokes: int = 20_000) -> None:
    """Power-law hub hardening: PageRank on a graph dominated by ONE
    mega-in-degree hub (``base_spokes``·scale spokes all pointing at
    node 0, plus a uniform background ring so the rank flow is
    non-trivial). The flat collect-list fold materialized the hub's
    whole in-edge term list in one task — wall (and memory) grew with
    the hub. The two-level fold splits it across 32 md5 buckets, so
    exact-mode wall should track EDGE COUNT (~linear), not hub degree
    alone; the exact=False IEEE path (map-side combine) is the
    production floor, printed alongside. Plans asserted
    CartesianProduct-free at every scale."""
    from pyspark.sql import functions as F

    from hyper_storage_spark.operators import graph
    from hyper_storage_spark.operators._caches import release_tracked_caches
    from hyper_storage_spark.session import get_spark

    spark = get_spark("scale_smoke_pagerank_hub")
    base_ex = base_fast = None
    for s in scales:
        n = base_spokes * s
        spokes = spark.range(1, n + 1).select(
            F.col("id").cast("string").alias("src"), F.lit("0").alias("dst")
        )
        # background ring i -> i+1 keeps out-degrees > 0 beyond the hub
        ring = spark.range(1, n + 1).select(
            F.col("id").cast("string").alias("src"),
            ((F.col("id") % n) + 1).cast("string").alias("dst"),
        )
        hub_out = spark.range(1, 101).select(
            F.lit("0").alias("src"), F.col("id").cast("string").alias("dst")
        )
        edges = spokes.unionByName(ring).unionByName(hub_out)
        n_edges = edges.count()

        t0 = time.time()
        pr = graph.pagerank(edges, iters=4)
        top = pr.orderBy(F.col("val").desc()).limit(3).collect()
        w_ex = time.time() - t0
        plan = pr._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert top[0].node == "0"  # the hub must rank first
        g = "" if base_ex is None else f" growth={w_ex / base_ex:.2f}x"
        base_ex = base_ex or w_ex
        print(f"# pagerank_hub exact scale={s} edges={n_edges} "
              f"hub_indeg={n} wall={w_ex:.2f}s{g}")
        release_tracked_caches()

        t0 = time.time()
        prf = graph.pagerank(edges, iters=4, exact=False)
        topf = prf.orderBy(F.col("val").desc()).limit(3).collect()
        w_fast = time.time() - t0
        assert topf[0].node == "0"
        # fast and exact agree to float re-association noise
        assert abs(topf[0].val - top[0].val) < 1e-9 * max(1.0, abs(top[0].val))
        g = "" if base_fast is None else f" growth={w_fast / base_fast:.2f}x"
        base_fast = base_fast or w_fast
        print(f"# pagerank_hub fast  scale={s} edges={n_edges} "
              f"wall={w_fast:.2f}s{g}")
        release_tracked_caches()
    print("# pagerank hub smoke done")


def state_bound(keyspaces=(20_000, 200_000), batch_rows: int = 2_000) -> None:
    """Streaming state-sink bounding (round-11): the corpus-stats
    digest index is bucket-sharded, so a batch's index IO must track
    the BATCH, not the corpus. Grow the index to each keyspace size,
    then time one fixed-size batch and count the bytes it rewrote —
    at 10× the keyspace both should stay ~flat (the unsharded sink
    rewrote the whole index: 10× bytes per batch)."""
    import os
    import tempfile as _tf

    from hyper_storage_spark.operators import dedup as dd
    from hyper_storage_spark.operators.rollup_mv import _read_pointer
    from hyper_storage_spark.session import get_spark

    spark = get_spark("scale_smoke_statebound")

    def mkbatch(lo, n):
        return spark.range(lo, lo + n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("document body "), F.col("id")).alias("text"),
            F.lit("en").alias("lang"),
        )

    def tree_bytes(root, rels):
        total = 0
        for rel in rels:
            d = os.path.join(root, rel)
            for dirpath, _, files in os.walk(d):
                total += sum(os.path.getsize(os.path.join(dirpath, f)) for f in files)
        return total

    for ks in keyspaces:
        state = _tf.mkdtemp(prefix=f"statebound_{ks}_")
        sink = dd.streaming_corpus_stats(state, run_id="smoke", n_index_buckets=256)
        bid = 0
        lo = 0
        while lo < ks:
            sink(mkbatch(lo, min(batch_rows * 10, ks - lo)), bid)
            lo += batch_rows * 10
            bid += 1
        ver_before = _read_pointer(state)["version"]
        t0 = time.time()
        sink(mkbatch(ks, batch_rows), bid)
        wall = time.time() - t0
        p_after = _read_pointer(state)
        # bytes THIS batch wrote = its delta (+ compaction, when fired)
        written_rels = [
            f"v{p_after['version']:06d}_delta",
            f"v{p_after['version']:06d}_compact",
        ]
        written_rels = [r for r in written_rels if os.path.isdir(os.path.join(state, r))]
        written = tree_bytes(state, written_rels)
        total = tree_bytes(
            state,
            {rel for chain in p_after["buckets"].values() for rel in chain},
        )
        compacted = any(r.endswith("_compact") for r in written_rels)
        assert p_after["version"] == ver_before + 1
        print(
            f"# statebound keyspace={ks}: batch={batch_rows} rows wrote "
            f"{written/1024:.0f} KiB (index total {total/1024:.0f} KiB, "
            f"compaction={'yes' if compacted else 'no'}), wall={wall:.2f}s"
        )
    print("# statebound smoke done")


def store_rollup_modes(n_items: int = 5000) -> None:
    """Wall-clock for the three store-rollup refresh tiers at a given
    collection size (build via write_batch so the feed holds full
    per-item history and ALL routes are reachable): insert-only merge,
    bucket-scoped invalidation (1% of items patched), and the forced
    full rebuild (feed truncated). Run at two sizes to see which
    costs scale with the DELTA and which with the CORPUS."""
    import tempfile as _tf
    import time as _t

    from hyper_storage_spark.session import get_spark
    from hyper_storage_spark.store import DocumentStore

    spark = get_spark("scale_smoke_rollup")
    st = DocumentStore(_tf.mkdtemp(prefix="smoke_rollup_") + "/s", spark=spark)
    ops = [
        ("put", f"ev~/{i:07d}",
         {"ts": f"2024-01-{(i % 28) + 1:02d} 00:00:00", "k": f"k{i % 7}", "v": float(i % 100)})
        for i in range(n_items)
    ]
    t0 = _t.time()
    for lo in range(0, n_items, 2000):
        st.write_batch(ops[lo:lo + 2000])
    print(f"# build: {n_items} items in {_t.time() - t0:.2f}s (write_batch)")
    t0 = _t.time()
    st.create_rollup("ev~", "ts", ["k"], "v", resolution="day",
                     schema="ts string, k string, v double")
    print(f"# create_rollup: {_t.time() - t0:.2f}s")
    pct = max(n_items // 100, 1)
    st.write_batch([
        ("put", f"ev~/n{i:07d}",
         {"ts": "2024-02-01 00:00:00", "k": "k0", "v": 1.0}) for i in range(pct)
    ])
    t0 = _t.time()
    mode = st.refresh_rollup("ev~", st.rollup_defs("ev~")[0].rollup_id)
    print(f"# refresh after +1% inserts: mode={mode} wall={_t.time() - t0:.2f}s")
    st.write_batch([
        ("patch", f"ev~/{i:07d}", {"v": 999.0}) for i in range(0, n_items, 100)
    ])
    t0 = _t.time()
    mode = st.refresh_rollup("ev~", st.rollup_defs("ev~")[0].rollup_id)
    print(f"# refresh after 1% patches: mode={mode} wall={_t.time() - t0:.2f}s")
    st.patch("ev~/0000000", {"v": 5.0})
    st.truncate_feed(2**62)
    t0 = _t.time()
    mode = st.refresh_rollup("ev~", st.rollup_defs("ev~")[0].rollup_id)
    print(f"# refresh after feed truncation: mode={mode} wall={_t.time() - t0:.2f}s")


def bpe_vocab_bound(replicas=(1, 4, 16)) -> None:
    """BPE training's scale claim is that rounds are VOCABULARY-sized,
    not corpus-sized: replicating the corpus N× multiplies token
    counts but barely moves the distinct-word table, so 20-merge
    training wall should grow far sublinearly in corpus size (the
    pair-count exchange and the argmax are unchanged; only the first
    word-count scan sees more rows). An implementation that counted
    pairs over the raw token stream would read ~linear instead."""
    from pyspark.sql import functions as F

    from hyper_storage_spark.operators import bpe
    from hyper_storage_spark.operators._caches import release_tracked_caches
    from hyper_storage_spark.session import get_spark
    from hyper_storage_spark.sources.tables import load_table

    spark = get_spark("scale_smoke_bpe")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    base = None
    for r in replicas:
        big = docs
        for i in range(1, r):
            big = big.unionByName(
                docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
            )
        n = big.count()
        vocab = (
            big.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
            .filter(F.col("w") != "")
            .select("w")
            .distinct()
            .count()
        )
        t0 = time.time()
        merges = bpe.bpe_train(big, n_merges=20)
        k = merges.count()
        wall = time.time() - t0
        g = "" if base is None else f" growth={wall / base:.2f}x"
        base = base or wall
        print(f"# bpe docs={n} vocab={vocab}: merges={k} wall={wall:.2f}s{g}")
        release_tracked_caches()
    print("# bpe smoke done")


def bpe_merge_depth(n_merges: int = 500, seq_merges: int = 100) -> None:
    """Realistic merge counts: a real tokenizer learns 30k+ merges, and
    the sequential trainer's per-merge localCheckpoint becomes the
    floor. The batched trainer (bpe_train_batched, exact — pytest pins
    bit-identity) pays one distributed round per ~round_size merges.
    Prints the sequential wall at ``seq_merges`` (its per-merge rate
    extrapolates linearly) and the batched wall at ``n_merges``."""
    from hyper_storage_spark.operators import bpe
    from hyper_storage_spark.operators._caches import release_tracked_caches
    from hyper_storage_spark.session import get_spark
    from hyper_storage_spark.sources.tables import load_table

    spark = get_spark("scale_smoke_bpe_depth")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")

    # min_count=1 so the synthetic corpus doesn't saturate before
    # n_merges — the point is merge DEPTH, not the stop rule
    t0 = time.time()
    k_seq = bpe.bpe_train(docs, n_merges=seq_merges, min_count=1).count()
    w_seq = time.time() - t0
    print(f"# bpe sequential merges={k_seq} wall={w_seq:.2f}s "
          f"({w_seq / max(k_seq, 1):.3f}s/merge -> ~{w_seq / max(k_seq, 1) * n_merges:.0f}s at {n_merges})")
    release_tracked_caches()

    for rs in (64, 128):
        t0 = time.time()
        k_bat = bpe.bpe_train_batched(docs, n_merges=n_merges, round_size=rs, min_count=1).count()
        w_bat = time.time() - t0
        print(f"# bpe batched round_size={rs} merges={k_bat} wall={w_bat:.2f}s "
              f"({w_bat / max(k_bat, 1):.3f}s/merge)")
        release_tracked_caches()
    print("# bpe merge-depth smoke done")


def ppl_bucket_skew(scales=(1, 8)) -> None:
    """r12 (VERDICT item 2): ppl_buckets' default ntile window needs
    ONE partition to hold a whole language's (id, score) pairs — a
    corpus dominated by one language single-tasks the cut at 100 TB.
    exact_depth=False cuts on percentile_approx sketches instead (no
    window at all). This smoke builds a single-language corpus, shows
    the exact path concentrating every row into one non-empty output
    partition while the approx path stays spread, and times both
    under scale growth."""
    from pyspark.sql import functions as F

    from hyper_storage_spark.operators import text as text_ops
    from hyper_storage_spark.operators._caches import release_tracked_caches
    from hyper_storage_spark.session import get_spark

    spark = get_spark("scale_smoke_pplskew")
    base = 20_000

    def mkdocs(n):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(10)),
                    lambda i: F.substring(
                        F.md5(F.concat(F.col("id").cast("string"), i.cast("string"))),
                        1,
                        4,
                    ),
                ),
            ).alias("text"),
            F.lit("en").alias("lang"),  # ONE language = worst window skew
        )

    def nonempty_parts(df):
        # keep `bucket` in the projection (selecting pid alone lets
        # column pruning delete the Window and its SinglePartition
        # exchange from the probed plan) and dedupe DRIVER-side: a
        # groupBy(pid) probe re-plans the nondeterministic pid below
        # the exchange and reads 32 where execution uses 1
        rows = df.select(F.spark_partition_id().alias("pid"), "bucket").collect()
        return len({r.pid for r in rows})

    for s in scales:
        docs = mkdocs(base * s).localCheckpoint()
        for label, kw in (("exact ntile", {}), ("approx cuts", {"exact_depth": False})):
            t0 = time.time()
            out = text_ops.ppl_buckets(docs, n_buckets=3, **kw)
            n = out.count()
            w = time.time() - t0
            p = nonempty_parts(out)
            print(
                f"# pplskew x{s} ({base * s} docs, 1 lang) {label}: "
                f"{n} rows wall={w:.2f}s non-empty output partitions={p}"
            )
            release_tracked_caches()
    plan = (
        text_ops.ppl_buckets(mkdocs(100), n_buckets=3, exact_depth=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, "approx path must not plan a Window"
    print("# pplskew: approx plan contains no Window node")
    print("# ppl bucket skew smoke done")


def bpe_deep_depth(depths=(1000, 5000), round_size: int = 256) -> None:
    """r12 (VERDICT item 4): the sf0.1 corpus saturates at ~89 merges,
    so the 30k-merge claim was extrapolated from shallow runs. This
    builds a synthetic high-entropy corpus that genuinely sustains ≥5k
    merges — 600 distinct 32-hex-char words (merge capacity ≈ 600×31 ≈
    18.6k, with heavy cross-word 2-4-gram sharing so merged symbols
    recur across the vocabulary, the expensive case for the affected-
    sub-vocab replay) — and records s/merge at increasing depth. Flat
    s/merge = the batched trainer's per-round cost is bounded by the
    vocabulary, not by how deep training already is."""
    from pyspark.sql import functions as F

    from hyper_storage_spark.operators import bpe
    from hyper_storage_spark.operators._caches import release_tracked_caches
    from hyper_storage_spark.session import get_spark

    spark = get_spark("scale_smoke_bpe_deep")
    docs = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.md5((F.col("id") % 600).cast("string")),
            F.md5(((F.col("id") * 7 + 1) % 600).cast("string")),
            F.md5(((F.col("id") * 13 + 2) % 600).cast("string")),
        ).alias("text"),
    ).localCheckpoint()

    rates = []
    for n_merges in depths:
        t0 = time.time()
        k = bpe.bpe_train_batched(
            docs, n_merges=n_merges, round_size=round_size, min_count=1
        ).count()
        w = time.time() - t0
        rates.append(w / max(k, 1))
        print(
            f"# bpedeep merges={k} (asked {n_merges}) wall={w:.1f}s "
            f"({w / max(k, 1) * 1000:.1f} ms/merge)"
        )
        release_tracked_caches()
    if len(rates) >= 2:
        growth = rates[-1] / rates[0]
        verdict = "flat" if growth <= 1.5 else "GROWING — investigate"
        print(
            f"# bpedeep s/merge at {depths[-1]} vs {depths[0]}: "
            f"{growth:.2f}x -> {verdict}"
        )
    print("# bpe deep-depth smoke done")


def ivfpq_split_vs_rebuild(corpus_sizes=(50_000, 200_000), hot_rows: int = 5_000) -> None:
    """r12: ivfpq_split_cells' claim is O(hot-mass), not O(corpus) —
    a FIXED-SIZE hot append should cost the same to repair whether the
    surrounding corpus is 50k or 200k vectors, while the full rebuild
    re-encodes everything and grows with the corpus. Deterministic
    synthetic vectors (md5-derived, no RNG), one tight hot cluster
    appended to trip the skew rule."""
    from pyspark.sql import functions as F

    from hyper_storage_spark.operators import similarity as sim
    from hyper_storage_spark.session import get_spark

    spark = get_spark("scale_smoke_ivfpqsplit")

    def mkvecs(n, offset=0, hot=False):
        if hot:
            # near-duplicates of one fixed direction: unit e0 + tiny
            # per-id jitter in the last coordinate
            arr = F.array(
                *([F.lit(1.0)] + [F.lit(0.0)] * 62
                  + [(F.pmod(F.col("id"), F.lit(97)).cast("double") * 1e-4)])
            )
        else:
            arr = F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda i: (
                    F.pmod(
                        F.xxhash64(F.concat(F.col("id").cast("string"), i.cast("string"))),
                        F.lit(1000),
                    ).cast("double")
                    / 1000.0
                    - 0.5
                ),
            )
        return spark.range(offset, offset + n).select(
            F.col("id").alias("vec_id"), arr.alias("embedding")
        )

    for n in corpus_sizes:
        boot = mkvecs(n).localCheckpoint()
        hot = mkvecs(hot_rows, offset=10_000_000, hot=True).localCheckpoint()
        n_cells, _, sample_rows = sim.ivfpq_params_for(n, target_occupancy=1024)
        idx = sim.ivfpq_index(boot, n_cells=n_cells, sample_rows=sample_rows)
        grown = sim.ivfpq_append(idx, hot)
        grown = sim.IVFPQIndex(
            grown.centroids, grown.codebooks, grown.codes.localCheckpoint()
        )
        corpus = boot.unionByName(hot).localCheckpoint()

        t0 = time.time()
        refined, report = sim.ivfpq_split_cells(grown, corpus, skew_factor=4.0)
        refined.codes.write.format("noop").mode("overwrite").save()
        w_split = time.time() - t0

        t0 = time.time()
        rebuilt = sim.ivfpq_index(
            corpus, n_cells=report["cells_after"], sample_rows=sample_rows
        )
        rebuilt.codes.write.format("noop").mode("overwrite").save()
        w_rebuild = time.time() - t0
        print(
            f"# ivfpqsplit corpus={n} cells={n_cells} split={report['split']} "
            f"reencoded={report['reencoded_rows']} split_wall={w_split:.2f}s "
            f"rebuild_wall={w_rebuild:.2f}s ratio={w_rebuild / max(w_split, 1e-9):.2f}x"
        )
    print("# ivfpq split-vs-rebuild smoke done")


def link_core_growth(scopes=(300, 1200, 4800)) -> None:
    """Round-10 second-half graph family under scope growth: link
    prediction and the 8-core on the co-purchase graph as the part
    universe widens. Link prediction's budget is the wedge count
    (Σ deg²/2) — wall must track wedges, not the node-pair square;
    k-core's wall tracks edges × peel rounds. Plans asserted
    CartesianProduct-free."""
    from pyspark.sql import functions as F

    from hyper_storage_spark.operators import graph
    from hyper_storage_spark.operators._caches import release_tracked_caches
    from hyper_storage_spark.session import get_spark
    from hyper_storage_spark.sources.tables import load_table

    spark = get_spark("scale_smoke_linkcore")
    li_all = load_table(spark, "/root/testdata/sf0.1", "lineitem")
    base_lp = base_kc = None
    for scope in scopes:
        li = li_all.filter(F.col("l_partkey") < scope)
        a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
        b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
        edges = (
            a.join(b, "ok")
            .filter(F.col("u") < F.col("v"))
            .select(F.col("u").alias("src"), F.col("v").alias("dst"))
            .distinct()
        )
        n_edges = edges.count()
        t0 = time.time()
        lp = graph.link_scores(edges, top_k=20)
        nrows = lp.count()
        w_lp = time.time() - t0
        plan = lp._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        g = "" if base_lp is None else f" growth={w_lp / base_lp:.2f}x"
        base_lp = base_lp or w_lp
        print(f"# link_scores scope<{scope}: edges={n_edges} rows={nrows} wall={w_lp:.2f}s{g}")
        release_tracked_caches()

        t0 = time.time()
        kc = graph.kcore(edges, k=8)
        ncore = kc.count()
        w_kc = time.time() - t0
        g = "" if base_kc is None else f" growth={w_kc / base_kc:.2f}x"
        base_kc = base_kc or w_kc
        print(f"# kcore scope<{scope}: core_nodes={ncore} wall={w_kc:.2f}s{g}")
        release_tracked_caches()
    print("# link/core smoke done")


def semdedup_growth(scales=(1, 10)) -> None:
    """SemDeDup at corpus-replica growth: each scale replicates the
    sf0.1 embeddings with fresh ids (replicas are EXACT duplicates of
    their source vector, cosine 1.0), and k scales with the corpus to
    hold the mean cluster size near 500 — the paper's sizing rule
    that keeps the per-cluster O(c²·d) gram work flat. Checks:
    (a) wall growth stays near-linear (a corpus-wide quadratic would
    show ~scale²); (b) the duplicate structure is actually found —
    every replica beyond a vector's first surviving copy has
    max_prior_cos ≈ 1.0, so kept plateaus near the 1× count."""
    from hyper_storage_spark.operators import dedup
    from hyper_storage_spark.operators._caches import release_tracked_caches
    from hyper_storage_spark.session import get_spark
    from hyper_storage_spark.sources.tables import load_table

    spark = get_spark("scale_smoke_semdedup")
    tmp = tempfile.mkdtemp(prefix="scale_smoke_semdedup_")
    emb1 = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    base_wall = base_kept = None

    for s in scales:
        union = None
        for r in range(s):
            part = emb1.select(
                (F.col("vec_id") + F.lit(r * 10_000_000)).alias("vec_id"), "embedding"
            )
            union = part if union is None else union.unionAll(part)
        path = f"{tmp}/emb{s}x"
        union.write.mode("overwrite").parquet(path)
        emb = spark.read.parquet(path)
        n = emb.count()
        k = max(2, n // 500)

        t0 = time.time()
        res = dedup.semantic_dedup(emb, k=k, tau=0.95)
        kept = res.filter("kept").count()
        wall = time.time() - t0
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        g = ""
        if base_wall is not None:
            g = f" growth={wall / base_wall:.2f}x kept_vs_1x={kept / base_kept:.2f}x"
        else:
            base_wall, base_kept = wall, kept
        print(f"# semdedup n={n} k={k} kept={kept} wall={wall:.2f}s{g}")
        release_tracked_caches()
    print("# semdedup smoke done")


def corpusdiff_growth(scales=(1, 10)) -> None:
    """Corpus diff under replica growth: v1 is the sf0.1 documents
    replicated with fresh ids; v2 mutates ~12% of rows and appends
    ~6% new ids (the q_corpus_diff band recipe). The claim under
    test: the full-outer join shuffles digests, not payloads, so
    wall growth tracks row count (near-linear), and the classified
    counts scale exactly with the replicas (the bands are per-id
    deterministic)."""
    from pyspark.sql import functions as F

    from hyper_storage_spark.operators import versioning
    from hyper_storage_spark.operators._caches import release_tracked_caches
    from hyper_storage_spark.session import get_spark
    from hyper_storage_spark.sources.tables import load_table

    spark = get_spark("scale_smoke_corpusdiff")
    tmp = tempfile.mkdtemp(prefix="scale_smoke_cdiff_")
    docs1 = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text", "lang"
    )
    base_wall = base_counts = None
    for sc in scales:
        union = None
        for r in range(sc):
            part = docs1.select(
                (F.col("doc_id") + F.lit(r * 1_000_000)).alias("doc_id"),
                "text",
                "lang",
            )
            union = part if union is None else union.unionAll(part)
        path = f"{tmp}/docs{sc}x"
        union.write.mode("overwrite").parquet(path)
        v1 = spark.read.parquet(path)
        u = F.conv(
            F.substring(F.md5(F.concat(F.lit("v2:"), F.col("doc_id").cast("string"))), 1, 13),
            16,
            10,
        ).cast("double") / F.lit(float(1 << 52))
        base = v1.withColumn("u", u)
        surv = base.filter(F.col("u") >= 0.06).select(
            "doc_id",
            F.when(F.col("u") < 0.12, F.concat(F.col("text"), F.lit(" [rev2]")))
            .otherwise(F.col("text"))
            .alias("text"),
            "lang",
        )
        added = base.filter(F.col("u") >= 0.94).select(
            (F.col("doc_id") + 100_000_000).alias("doc_id"),
            F.concat(F.lit("added:"), F.col("doc_id").cast("string")).alias("text"),
            "lang",
        )
        v2 = surv.unionByName(added)
        t0 = time.time()
        d = versioning.corpus_diff(v1, v2, "doc_id", ("text", "lang"))
        counts = {r["status"]: r["n"] for r in d.groupBy("status").agg(F.count("*").alias("n")).collect()}
        wall = time.time() - t0
        plan = d._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        g = ""
        if base_wall is not None:
            ratios = {k: counts[k] / base_counts[k] for k in counts}
            g = f" growth={wall / base_wall:.2f}x class_ratios={ratios}"
        else:
            base_wall, base_counts = wall, counts
        print(f"# corpusdiff rows={v1.count()} counts={counts} wall={wall:.2f}s{g}")
        release_tracked_caches()
    print("# corpusdiff smoke done")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "storerollup":
        store_rollup_modes(int(sys.argv[2]) if len(sys.argv) > 2 else 5000)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "lsh":
        lsh_sizing(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "statebound":
        state_bound(
            tuple(int(x) for x in sys.argv[2:]) if len(sys.argv) > 2 else (20_000, 200_000)
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "pagerankhub":
        pagerank_hub(
            tuple(int(x) for x in sys.argv[2:]) if len(sys.argv) > 2 else (1, 4, 16)
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "graphfuzzy":
        graph_fuzzy(
            tuple(int(x) for x in sys.argv[2:]) if len(sys.argv) > 2 else (500, 2000, 8000)
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "corpusdiff":
        corpusdiff_growth(
            tuple(int(x) for x in sys.argv[2:]) if len(sys.argv) > 2 else (1, 10)
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "semdedup":
        semdedup_growth(
            tuple(int(x) for x in sys.argv[2:]) if len(sys.argv) > 2 else (1, 10)
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "ivfpq":
        ivfpq_century(
            tuple(int(x) for x in sys.argv[2:]) if len(sys.argv) > 2 else (1, 10, 100)
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "linkcore":
        link_core_growth(
            tuple(int(x) for x in sys.argv[2:]) if len(sys.argv) > 2 else (300, 1200, 4800)
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "ivfpqsplit":
        ivfpq_split_vs_rebuild(
            tuple(int(x) for x in sys.argv[2:])
            if len(sys.argv) > 2
            else (50_000, 200_000)
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "pplskew":
        ppl_bucket_skew(
            tuple(int(x) for x in sys.argv[2:]) if len(sys.argv) > 2 else (1, 8)
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "bpedeep":
        bpe_deep_depth(
            tuple(int(x) for x in sys.argv[2:]) if len(sys.argv) > 2 else (1000, 5000)
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "bpedepth":
        bpe_merge_depth(
            int(sys.argv[2]) if len(sys.argv) > 2 else 500,
            int(sys.argv[3]) if len(sys.argv) > 3 else 100,
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "bpe":
        bpe_vocab_bound(
            tuple(int(x) for x in sys.argv[2:]) if len(sys.argv) > 2 else (1, 4, 16)
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "span":
        span_realistic(
            int(sys.argv[2]) if len(sys.argv) > 2 else 10,
            int(sys.argv[3]) if len(sys.argv) > 3 else 3,
        )
        return
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from hyper_storage_spark.operators import (
        bloomjoin,
        dedup,
        profiling,
        rollup_mv,
        sampling,
        search,
        similarity,
    )
    from hyper_storage_spark.operators import text as text_ops
    from hyper_storage_spark.operators._caches import release_tracked_caches
    from hyper_storage_spark.session import get_spark
    from hyper_storage_spark.sources.tables import load_table

    spark = get_spark("scale_smoke")

    def _count_written(df, path):
        # materialize a sort/shuffle the optimizer would prune under
        # count(): write the result, report the written row count
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path).count()

    def _bm25(d):
        queries = spark.createDataFrame(
            [("q1", "table scan"), ("q2", "hash merge batch")],
            "query_id string, query string",
        )
        return search.bm25_topk(d, queries, k=10)

    def _hybrid(d):
        queries = spark.createDataFrame(
            [("q1", "table scan"), ("q2", "hash merge batch")],
            "query_id string, query string",
        )
        return search.hybrid_rrf(d, queries, k=10, leg_k=20)
    def _rollup_refresh(d):
        # synthesize (ts, key, value) from the doc corpus: 30 daily
        # buckets × 7 keys, value = text length (decimal partials)
        ev = (
            d.withColumn(
                "ts",
                F.timestamp_seconds(
                    F.lit(1_700_000_000) + F.pmod(F.col("doc_id"), F.lit(30)) * F.lit(86_400)
                ),
            )
            .withColumn("k", F.pmod(F.col("doc_id"), F.lit(7)))
            .withColumn("v", F.length("text").cast("decimal(18,6)"))
        )
        base = rollup_mv.rollup_partials(
            ev.filter(F.pmod(F.col("doc_id"), F.lit(10)) != 3), "ts", ["k"], "v"
        )
        delta = rollup_mv.rollup_partials(
            ev.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 3), "ts", ["k"], "v"
        )
        return rollup_mv.rollup_merge(base, delta, ["k"])

    sf_dir = "/root/testdata/sf0.1"
    tmp = tempfile.mkdtemp(prefix="scale_smoke_")

    docs1 = load_table(spark, sf_dir, "documents")
    emb1 = load_table(spark, sf_dir, "embeddings")
    n_docs = docs1.count()

    # id-offset replicas: same text (near-dup structure survives — and
    # multiplies ACROSS replicas, the stress case), distinct doc_ids
    big_docs_path = f"{tmp}/docs10x"
    docs1.select(
        F.col("doc_id") + F.lit(0).alias("r"), "text"
    )  # schema probe only
    union = None
    for r in range(replicas):
        part = docs1.select(
            (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"), "text"
        )
        union = part if union is None else union.unionAll(part)
    union.write.mode("overwrite").parquet(big_docs_path)
    big_emb_path = f"{tmp}/emb10x"
    union_e = None
    for r in range(replicas):
        part = emb1.select(
            (F.col("vec_id") + F.lit(r * 10_000_000)).alias("vec_id"), "embedding"
        )
        union_e = part if union_e is None else union_e.unionAll(part)
    union_e.write.mode("overwrite").parquet(big_emb_path)

    docs10 = spark.read.parquet(big_docs_path)
    emb10 = spark.read.parquet(big_emb_path)
    print(f"# corpus: {n_docs} docs -> {docs10.count()} docs ({replicas}x)")

    qids = [0, 1, 2, 3, 4]
    cases = {
        # max_df mirrors the catalog entry; at 10x the cross-replica
        # duplicate text makes every shingle hot, so the cap is the
        # difference between bounded pair output and a replica^2 blowup
        "dedup_exact": lambda d, e: dedup.exact_duplicates(d).count(),
        "ngram_jaccard": lambda d, e: dedup.ngram_jaccard_pairs(
            d, threshold=0.5, max_df=100
        ).count(),
        "minhash_lsh": lambda d, e: dedup.minhash_lsh_pairs(d, threshold=0.5).count(),
        "simhash": lambda d, e: dedup.simhash_pairs(d, max_hamming=3).count(),
        "ann_lsh_bucket": lambda d, e: similarity.lsh_bucket_topk(e, qids, k=10).count(),
        # round-9 additions: the compressed-scan ANN family end-to-end
        # (train + encode + scan + exact re-rank per call) — PQ reads
        # every code once, IVF-PQ only the probed cells' codes; both
        # must grow ~linearly (codes tables are m-int-sized, the ADC
        # LUTs queries-sized, candidates bounded at k·refine)
        "ann_pq": lambda d, e: similarity.pq_topk(e, qids, k=10).count(),
        "ann_ivfpq": lambda d, e: similarity.ivfpq_topk(e, qids, k=10, n_probe=10).count(),
        # round-5 additions: clustering over the pair graph (edge-set
        # bounded, O(log) rounds), BM25 (posting-list reductions), and
        # packing (applyInPandas over (id, count) pairs only)
        "dedup_clusters": lambda d, e: dedup.duplicate_clusters(
            dedup.ngram_jaccard_pairs(d, threshold=0.5, max_df=100)
        ).count(),
        "bm25_topk": lambda d, e: _bm25(d).count(),
        "pack_sequences": lambda d, e: sampling.pack_sequences(
            d.select("doc_id", F.length("text").alias("n_tokens")), 2048
        ).count(),
        # round-5 second half: sliding-window span dedup (rows ∝ corpus
        # tokens; cross-replica duplicate text makes EVERY window a
        # duplicated span — the flagged-set join's worst case) and the
        # content-hash training-order shuffle (range exchange + sort).
        # Both are forced through non-prunable actions: a bare count()
        # lets Catalyst eliminate the aggregate-keyed left join (and a
        # sort), timing an empty plan.
        "dup_span_stats": lambda d, e: dedup.dup_span_stats(d, span=8)
        .agg(F.sum("n_dup_spans"), F.count("*"))
        .collect()[0][1],
        "seeded_shuffle": lambda d, e: _count_written(
            sampling.seeded_shuffle(d.select("doc_id"), "doc_id", seed=7),
            f"{tmp}/shuffled",
        ),
        # round-6: incremental near-dup (a 10% batch vs the persisted
        # band index — the batch×corpus candidate join must track
        # bucket occupancy, not corpus², even when replicas make every
        # band hot) and the two-level prefix-sum budget selection
        # (range exchange + pinned materialization + LOCAL windows).
        "minhash_incremental": lambda d, e: dedup.incremental_minhash_pairs(
            d.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 7),
            d.filter(F.pmod(F.col("doc_id"), F.lit(10)) != 7),
            threshold=0.5,
        ).count(),
        "budget_select": lambda d, e: _count_written(
            sampling.budget_select(
                d.select("doc_id", F.length("text").alias("w")),
                "w",
                10_000_000,
                [F.col("w").desc(), F.col("doc_id")],
            ),
            f"{tmp}/budget",
        ),
        # late round-7: bloom pre-join (build cost ∝ dim keys, probe is
        # a fixed-size-literal scan filter — the 1M-bit array keeps the
        # fp rate low even at replicas× the key count) and incremental
        # rollup refresh (delta partials + touched-bucket merge; the
        # grouping collapses to (7 keys × 30 days) so every exchange
        # past the first partial agg is bucket-sized, not corpus-sized)
        "bloom_prejoin": lambda d, e: bloomjoin.bloom_prejoin(
            d.select("doc_id"),
            "doc_id",
            d.filter(F.pmod(F.col("doc_id"), F.lit(20)) == 0)
            .select(F.col("doc_id").alias("k")),
            "k",
            num_bits=1 << 20,
        ).count(),
        "rollup_refresh": lambda d, e: _rollup_refresh(d).count(),
        # late round-7 dedup additions: containment shares the df-capped
        # posting-list shape with ngram_jaccard (cap = bounded pair
        # output under replica-saturated shingles); span REMOVAL is the
        # rewrite worst case — every window duplicated cross-replica, so
        # every doc's full token array is rebuilt. Forced through a sum
        # over the rewrite output so the kept-array HOFs can't be pruned.
        "containment": lambda d, e: dedup.containment_pairs(
            d, threshold=0.8, n=5, max_df=100
        ).count(),
        "span_removal": lambda d, e: dedup.remove_dup_spans(d, span=8)
        .agg(F.sum("n_removed"), F.count("clean_hash"))
        .collect()[0][1],
        # late round-7: cross-corpus ANN join — 10% of the vectors
        # query the other 90%. BOTH sides scale with the corpus, so
        # with FIXED planes the per-bucket candidate term is
        # queries × occupancy — quadratic-over-2^planes (measured
        # 7.3x wall at 10x). The documented sizing rule
        # (similarity.planes_for) holds occupancy constant as the
        # corpus grows, which is what the case exercises: n_planes
        # derives from the corpus size, so candidate volume — and
        # wall — track the data near-linearly.
        "ann_join": lambda d, e: similarity.ann_join(
            e.filter(F.pmod(F.col("vec_id"), F.lit(10)) != 0),
            e.filter(F.pmod(F.col("vec_id"), F.lit(10)) == 0),
            k=10,
            n_planes=similarity.planes_for(e.count()),
        ).count(),
        # final round-7 tier: hybrid retrieval (both posting-list legs
        # + the leg_k-bounded fusion join — fusion cost is
        # queries × leg_k regardless of corpus), exact AUC (corpus
        # reduces to distinct scores, prefix sum is the two-level
        # cumsum), and KL divergence (vocabulary-sized joins; replicas
        # multiply counts, not vocabulary)
        "hybrid_rrf": lambda d, e: _hybrid(d).count(),
        "auc_binary": lambda d, e: profiling.auc_binary(
            d.select(
                F.length("text").cast("double").alias("s"),
                F.pmod(F.col("doc_id"), F.lit(2)).cast("int").alias("y"),
            ),
            "s",
            "y",
        ).count(),
        "kl_divergence": lambda d, e: text_ops.kl_unigram_divergence(
            d.withColumn("lang", F.pmod(F.col("doc_id"), F.lit(4)).cast("string")),
            "lang",
        ).count(),
        # stats-testing tier: each reduces the corpus to distinct
        # values / a contingency / six scalars — walls must stay flat
        "ks_two_sample": lambda d, e: profiling.ks_two_sample(
            d.select(
                F.length("text").cast("double").alias("v"),
                F.pmod(F.col("doc_id"), F.lit(2)).cast("int").alias("s"),
            ),
            "v",
            "s",
        ).count(),
        "welch_ttest": lambda d, e: profiling.welch_ttest(
            d.select(
                F.length("text").cast("double").alias("v"),
                F.pmod(F.col("doc_id"), F.lit(2)).cast("int").alias("s"),
            ),
            "v",
            "s",
        ).count(),
        "gini": lambda d, e: profiling.gini(
            d.select(F.length("text").alias("v")), "v"
        ).count(),
    }

    failures = []
    for name, fn in cases.items():
        # warm 1x, then time 1x and replicas-x
        fn(docs1, emb1)
        release_tracked_caches()
        t0 = time.time()
        n1 = fn(docs1, emb1)
        t1 = time.time() - t0
        release_tracked_caches()
        t0 = time.time()
        n10 = fn(docs10, emb10)
        t10 = time.time() - t0
        release_tracked_caches()
        growth = t10 / max(t1, 1e-9)
        print(
            f"# {name}: 1x {t1:.2f}s ({n1} rows) -> {replicas}x {t10:.2f}s "
            f"({n10} rows), growth {growth:.1f}x"
        )
        if growth > replicas * 3:  # generous: linear + overheads, never ~replicas^2
            failures.append(f"{name}: wall grew {growth:.1f}x for {replicas}x data")

    # round-7: store-tier growth — bulk ingest, bulk merge into the
    # LIVE collection, and time-travel reads at 1x vs replicas-x. The
    # scale shape: ingest/merge are executor-side sorted bucket writes
    # + one manifest flip (cost ∝ data), a time-travel read is the
    # same pruned parquet scan against a pinned manifest (cost ∝ data,
    # zero history copies) — growth must stay near-linear.
    from hyper_storage_spark.store import DocumentStore

    def store_case(docs, label):
        root = tempfile.mkdtemp(prefix=f"smoke_store_{label}_")
        store = DocumentStore(root, spark=spark)
        base = docs.select(
            "doc_id",
            F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("item"),
            "text",
        )
        t0 = time.time()
        store.ingest_collection(base, "c~", "item")
        t_ingest = time.time() - t0
        refresh = base.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0).withColumn(
            "text", F.concat(F.col("text"), F.lit(" v2"))
        )
        t0 = time.time()
        store.merge_collection(refresh, "c~", "item")
        t_merge = time.time() - t0
        pinned = store.storage._read_manifest()["version"]
        store.put("history-mover", {"x": 1})
        snap = store.at_version(pinned)
        t0 = time.time()
        n = snap.collection_df("c~").count()
        t_tt = time.time() - t0
        return t_ingest, t_merge, t_tt, n

    i1, m1, tt1, n1 = store_case(docs1, "1x")
    i10, m10, tt10, n10 = store_case(docs10, f"{replicas}x")
    for name, a, b in (
        ("store_bulk_ingest", i1, i10),
        ("store_bulk_merge", m1, m10),
        ("store_time_travel_read", tt1, tt10),
    ):
        growth = b / max(a, 1e-9)
        print(f"# {name}: 1x {a:.2f}s -> {replicas}x {b:.2f}s, growth {growth:.1f}x")
        if growth > replicas * 3:
            failures.append(f"{name}: wall grew {growth:.1f}x for {replicas}x data")
    print(f"# store corpus: {n1} -> {n10} items read at pinned version")

    # plan-shape audit at 10x
    plans = {
        "ngram_jaccard": dedup.ngram_jaccard_pairs(docs10, 0.5, max_df=100),
        "minhash_lsh": dedup.minhash_lsh_pairs(docs10, 0.5),
        "simhash": dedup.simhash_pairs(docs10, 3),
        "ann_lsh_bucket": similarity.lsh_bucket_topk(emb10, qids, k=10),
        "embedding_lsh": dedup.embedding_lsh_pairs(emb10, 0.45),
        "bm25_topk": _bm25(docs10),
        "dup_span_stats": dedup.dup_span_stats(docs10, span=8),
        "minhash_incremental": dedup.incremental_minhash_pairs(
            docs10.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 7),
            docs10.filter(F.pmod(F.col("doc_id"), F.lit(10)) != 7),
            threshold=0.5,
        ),
        "bloom_prejoin": bloomjoin.bloom_prejoin(
            docs10.select("doc_id"),
            "doc_id",
            docs10.filter(F.pmod(F.col("doc_id"), F.lit(20)) == 0)
            .select(F.col("doc_id").alias("k")),
            "k",
            num_bits=1 << 20,
        ),
        "rollup_refresh": _rollup_refresh(docs10),
    }
    # bm25 attaches its two 1-row corpus scalars (n_docs, avgdl) via a
    # single-row nested-loop broadcast — O(1) rows by construction, not
    # a corpus product; everything else must be product-free
    allowed_bnlj = {"bm25_topk": 1}
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        if plan.count("BroadcastNestedLoopJoin") > allowed_bnlj.get(name, 0):
            failures.append(f"{name}: BroadcastNestedLoopJoin in 10x plan")
        if "CartesianProduct" in plan:
            failures.append(f"{name}: CartesianProduct in 10x plan")

    print()
    if failures:
        print("SCALE SMOKE FAILURES:")
        for f_ in failures:
            print(" -", f_)
        sys.exit(1)
    print(f"scale smoke OK: near-linear growth at {replicas}x, no quadratic plan shapes")


if __name__ == "__main__":
    main()
