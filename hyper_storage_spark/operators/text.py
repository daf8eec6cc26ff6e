"""Text-analysis operators over a ``documents``-shaped table
(doc_id, text, lang, source, n_chars).

All of these stay JVM-side (built-in functions only — no Python UDFs),
so they whole-stage-codegen and scale linearly with input splits: no
shuffle at all except where a groupBy is the semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\s+"

# tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic; deterministic and shared with the DuckDB oracle
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "a", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "la", "de", "los", "es"),
}


def tokens_col(text: Column) -> Column:
    # the empty-string filter matters only for empty/whitespace-only
    # text (split('') yields ['']): the phantom token otherwise leaks
    # into token counts, BM25 document lengths, and the token-rarity
    # vocabulary; '\s+' on trimmed non-empty text never produces
    # interior empties
    return F.filter(F.split(F.trim(text), TOKEN_SPLIT), lambda t: t != "")


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword estimate
    (≈ chars/4 is the classic byte-pair heuristic)."""
    toks = tokens_col(F.col(text_col))
    return df.withColumn("n_tokens", F.size(toks)).withColumn(
        "n_subwords_est", F.ceil(F.length(F.col(text_col)) / F.lit(4)).cast("bigint")
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punctuation/stopword-ratio quality features + a composite
    score in [0,1]. Formula is deliberately simple and portable (the
    DuckDB oracle computes the identical expression)."""
    df = df.withColumn("__toks", tokens_col(F.col(text_col)))
    text = F.col(text_col)
    toks = F.col("__toks")
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    # lowercase first (with_lang_id does the same): sentence-initial
    # 'The'/'A'/'Is' must count — capitalized prose otherwise gets a
    # systematically deflated stopword_ratio
    stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*LANG_MARKERS["en"])))
    punct_ratio = F.round(punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(stop / F.greatest(n_tokens, F.lit(1)), 6)
    mean_tok_len = F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 6)
    score = F.round(
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * F.lit(0.5)
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * F.lit(4), F.lit(1.0)))
        + F.lit(0.2) * F.least(stop_ratio * F.lit(5), F.lit(1.0)),
        6,
    )
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("punct_ratio", punct_ratio.cast("double"))
        .withColumn("stopword_ratio", stop_ratio.cast("double"))
        .withColumn("mean_token_len", mean_tok_len.cast("double"))
        .withColumn("quality_score", score.cast("double"))
        .drop("__toks")
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: count marker hits per language,
    argmax with deterministic tie-break on language code; no markers
    hit ⇒ 'und' (undetermined).

    All marker counters accumulate in ONE traversal of the token array
    (an ``aggregate`` with a struct-of-counters accumulator) instead of
    a ``filter``+``size`` pass per language — the per-language passes
    each allocated an intermediate filtered array, and dropping them
    measured 2.1× faster at sf0.1 with byte-identical output."""
    df = df.withColumn("__ltoks", tokens_col(F.lower(F.col(text_col))))
    langs = sorted(LANG_MARKERS)
    zero = F.struct(*[F.lit(0).alias(lang) for lang in langs])

    def step(acc, tkn):
        return F.struct(
            *[
                (acc[lang] + F.when(tkn.isin(list(LANG_MARKERS[lang])), 1).otherwise(0)).alias(
                    lang
                )
                for lang in langs
            ]
        )

    scores = F.aggregate(F.col("__ltoks"), zero, step)
    best = None
    for lang in langs:  # deterministic tie-break: alphabetical wins (strict >)
        pair = F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
        best = pair if best is None else F.when(
            (pair["score"] > best["score"]), pair
        ).otherwise(best)
    pred = F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    return df.withColumn("lang_pred", pred).drop("__ltoks")


def with_repetition_stats(df: DataFrame, text_col: str = "text", n: int = 2) -> DataFrame:
    """Gopher-style repetition filters: the fraction of n-gram
    occurrences that are repeats (``dup_ngram_frac``) and the share of
    the single most frequent n-gram (``top_ngram_frac``) — the classic
    corpus-quality signals for boilerplate / looping-generator text.

    Everything is per-row array HOFs (transform/filter/array_distinct)
    inside codegen: NO explode, NO shuffle — the n-gram multiset never
    leaves its row, so this scales as a pure map over splits. The
    top-frequency pass is O(distinct × total) per document, bounded
    and local. Documents shorter than n tokens get NULL stats."""
    toks = F.col("__toks")
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ngrams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )
    df = df.withColumn("__toks", tokens_col(F.col(text_col)))
    df = df.withColumn("__ng", F.when(F.size(toks) >= n, ngrams))
    ng = F.col("__ng")
    total = F.size(ng)
    distinct = F.size(F.array_distinct(ng))
    top = F.array_max(
        F.transform(F.array_distinct(ng), lambda x: F.size(F.filter(ng, lambda y: y == x)))
    )
    return (
        df.withColumn("n_ngrams", F.when(ng.isNotNull(), total))
        .withColumn(
            "dup_ngram_frac",
            F.round(F.lit(1.0) - distinct / total, 6).cast("double"),
        )
        .withColumn("top_ngram_frac", F.round(top / total, 6).cast("double"))
        .drop("__toks", "__ng")
    )


PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
# strict international shape (+CC-NNN-NNNN): a permissive digit-run
# pattern would eat ordinary numbers in prose
PII_PHONE_RE = r"\+\d{1,3}-\d{3}-\d{4}"

# (class, pattern, placeholder) — redaction order matters only in that
# earlier placeholders must not match later patterns (none do)
PII_CLASSES = (
    ("n_emails", PII_EMAIL_RE, "[EMAIL]"),
    ("n_ipv4", PII_IPV4_RE, "[IPV4]"),
    ("n_phones", PII_PHONE_RE, "[PHONE]"),
)


def with_pii_redacted(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Multi-class PII scrubbing for training corpora: per-class match
    counts (``n_emails``/``n_ipv4``/``n_phones``) and a
    ``text_redacted`` column with every match replaced by its class
    placeholder. Each class is counted on the text AS ALREADY REDACTED
    by the earlier classes — the counts therefore agree exactly with
    the placeholders in ``text_redacted`` (counting every class on the
    original text would report a phantom IP inside an email's local
    part that the sequential rewrite never redacts). Patterns are
    deliberately restricted to syntax both Java regex and RE2
    interpret identically (no backrefs/lookaround), so an ANSI-SQL
    oracle can replicate the redaction byte-for-byte. Built-in regexp
    functions only — codegen, no shuffle."""
    out = df
    redacted = F.col(text_col)
    for count_col, pattern, placeholder in PII_CLASSES:
        out = out.withColumn(
            count_col, F.size(F.regexp_extract_all(redacted, F.lit(pattern), F.lit(0)))
        )
        redacted = F.regexp_replace(redacted, pattern, placeholder)
    return out.withColumn("text_redacted", redacted)


def collapse_repeats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Collapse CONSECUTIVE duplicate tokens ("the the the" → "the")
    — the stutter-cleanup rewrite for OCR/scrape/ASR corpora, the
    within-document complement of the cross-document span removal.
    Returns (doc_id, n_tokens, n_collapsed, clean_hash, clean_text)
    where clean_hash = md5 of the surviving tokens joined by single
    spaces (the SQL-replayable certificate, the remove_dup_spans
    convention).

    Pure per-row HOF work — the token array never leaves its row, no
    shuffle, whole-stage codegen: an index-aware ``filter`` keeps
    each token whose predecessor differs. Only EXACT adjacent
    duplicates collapse; legitimate repetition at distance ("buffalo
    buffalo" split by punctuation tokens) survives."""
    # NULL text coalesces to an EMPTY token array: size(NULL) is -1 in
    # Spark, which would report n_tokens = -1 while the SQL oracle's
    # COALESCE(..., 0) says 0 — a latent cross-engine divergence
    toks = F.coalesce(
        tokens_col(F.col(text_col)), F.array().cast("array<string>")
    )
    kept = F.expr(
        "filter(__toks, (x, i) -> i = 0 OR x != element_at(__toks, i))"
    )
    base = df.select(
        "doc_id", toks.alias("__toks")
    ).select(
        "doc_id",
        F.size("__toks").alias("n_tokens"),
        kept.alias("__kept"),
    )
    return base.select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.size("__kept")).alias("n_collapsed"),
        F.md5(F.concat_ws(" ", F.col("__kept"))).alias("clean_hash"),
        F.concat_ws(" ", F.col("__kept")).alias("clean_text"),
    )


def normalized_text(text: Column) -> Column:
    """Canonical text form for robust dedup hashing: lowercase, strip
    punctuation, collapse runs of whitespace, trim. Exact dedup on the
    RAW bytes misses trivial variants ("Hello,  World" vs "hello
    world"); hashing the normalized form is the standard first rung of
    the near-dup ladder (cheaper than shingles, catches the bulk).
    Pure codegen expressions. The whitespace class is spelled out
    instead of ``\\s`` because Java's ``\\s`` includes vertical tab
    while RE2's does not — the explicit class keeps Spark and
    SQL-oracle normalization byte-identical on any input."""
    ws = " \\t\\n\\f\\r"
    stripped = F.regexp_replace(F.lower(text), f"[^\\w{ws}]", "")
    return F.trim(F.regexp_replace(stripped, f"[{ws}]+", " "))


def token_rarity(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-frequency rarity profile per document:
    (doc_id, n_tokens, sum_freq, mean_freq) where ``freq`` is each
    token occurrence's total count across the corpus.

    The unigram-count skeleton of CCNet-style LM quality filtering
    without the external LM: documents dominated by corpus-rare
    tokens (low mean_freq) are gibberish/noise candidates, documents
    dominated by ultra-common tokens are boilerplate candidates —
    both tails get reviewed or dropped before training. Unlike
    with_quality_score (per-row, corpus-free) this is a TWO-pass
    corpus statistic: explode occurrences, count per token, join the
    frequency table back (unhinted — vocabulary-sized, so AQE
    broadcasts it when small and degrades to a token-key shuffle
    join otherwise), one per-document aggregate. All integers until
    the final DECIMAL mean, so the result is engine-exact."""
    from ._caches import tracked_persist

    # persisted: the exploded occurrence set feeds BOTH the vocabulary
    # count and the join probe — unpersisted it would scan+tokenize the
    # corpus twice (same reasoning as dup_span_stats's shingle cache)
    toks = tracked_persist(
        docs.select("doc_id", F.explode(tokens_col(F.col(text_col))).alias("tok"))
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("freq"))
    return (
        toks.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("freq").alias("sum_freq"),
        )
        .withColumn(
            "mean_freq",
            F.round(F.col("sum_freq").cast("decimal(28,12)") / F.col("n_tokens"), 6).cast(
                "double"
            ),
        )
    )


def with_fingerprint(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Document fingerprint: the minimum md5 over the document's n-word
    shingles — a 1-permutation MinHash, stable across engines. Documents
    shorter than n tokens get a NULL fingerprint."""
    from .dedup import shingle_df

    fp = (
        shingle_df(df.select("doc_id", text_col), text_col, n)
        .groupBy("doc_id")
        .agg(F.min(F.md5("shingle")).alias("fingerprint"))
    )
    return df.join(fp, "doc_id", "left")


def tfidf_topk(docs: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """Top-``k`` TF-IDF terms per document:
    (doc_id, term, rank, tfidf) with the smooth idf
    ``tf * (ln((N+1)/(df+1)) + 1)`` (N = documents with ≥1 token,
    df = documents containing the term).

    Corpus shape: one tokenize+explode pass feeds tf (group by
    (doc, term)), df (group by term over the tf table — already
    reduced), and N (a 1-row broadcast) — the same two-pass skeleton
    as :func:`token_rarity`. The per-document top-k is a window over
    each document's own terms (shuffle keyed by doc_id, bounded by
    document size). Ties rank deterministically by term. Double math
    follows the catalog's cross-engine rules (identical op order,
    ROUND(.,6) only in the projection; the BM25 entry established the
    ln() precedent)."""
    from pyspark.sql import Window

    from ._caches import tracked_persist

    toks = tracked_persist(
        docs.select("doc_id", F.explode(tokens_col(F.col(text_col))).alias("term"))
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dft = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = toks.agg(F.count_distinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(dft, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "s",
            F.col("tf")
            * (F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("s").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "rank", F.round("s", 6).alias("tfidf"))
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 32,
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token-window chunks:
    (doc_id, chunk_id, n_chunk_tokens, chunk_text) — the context-window
    preparation step for RAG indexing and fixed-length training
    samples.

    Chunk starts step by ``chunk_tokens - overlap``; a trailing window
    shorter than ``overlap`` is dropped (it is wholly contained in the
    previous chunk) unless it is the document's only chunk. Everything
    is per-row array HOFs (sequence/slice/concat_ws) inside codegen —
    no explode until the final per-chunk fan-out, no shuffle at all, so
    it scales as a pure map over splits."""
    if overlap < 0 or overlap >= chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    stride = chunk_tokens - overlap
    df = docs.withColumn("__toks", tokens_col(F.col(text_col)))
    toks = F.col("__toks")
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    chunks = F.filter(
        F.transform(
            starts,
            lambda s: F.struct(
                ((s - 1) / stride).cast("int").alias("chunk_id"),
                F.slice(toks, s, chunk_tokens).alias("toks"),
            ),
        ),
        lambda c: (c["chunk_id"] == 0) | (F.size(c["toks"]) > overlap),
    )
    return (
        df.filter(n > 0)
        .select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").alias("chunk_id"),
            F.size("c.toks").alias("n_chunk_tokens"),
            F.concat_ws(" ", F.col("c.toks")).alias("chunk_text"),
        )
    )


def char_lm_score(
    docs: DataFrame,
    n: int = 3,
    top_k: int = 50_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    exact: bool = True,
) -> DataFrame:
    """Character n-gram language-model quality score (the CCNet /
    KenLM-style perplexity proxy): train a unigram-over-n-grams model
    on the corpus itself, then score each document by its mean n-gram
    log-probability — fluent text reuses the corpus's common
    character patterns, while garbled/boilerplate/binary-ish text
    lands in the rare tail and scores low. Higher = more fluent.

    Returns (id_col, n_grams, lm_score) for documents with at least
    one full n-gram.

    Spark-first mechanics: n-gram extraction is a per-row
    sequence/transform HOF (no shuffle), the model is ONE ``top_k``-
    row count table (Zipf makes the head carry nearly all mass, so
    the cap bounds model size regardless of corpus size; ties broken
    deterministically by count desc, gram asc), and scoring is an
    equi-join of exploded grams against that bounded table — Catalyst
    broadcasts it — with unseen grams backed off to a floor of
    0.5/total. Per-gram log-probs are cast to DECIMAL(20,10) BEFORE
    the per-document sum (``exact=True``, default), so the mean is
    order-independent and cross-engine exact (an IEEE double sum
    would depend on partition order) — the catalog's gate mode.
    ``exact=False`` is the production fast path: plain IEEE double
    sums (map-side combine, no decimal arithmetic in the hot
    aggregation) — scores differ from exact mode only by float
    re-association (~1 ulp/gram) and are not bit-reproducible across
    runs. At 100 TB, train the counts on a sample (pass a sampled
    ``docs`` to a first call and reuse the join table); scoring
    stays one scan + one broadcast join either way."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    # CASE guard, not greatest(..., 0): Spark's sequence(1, 0) infers
    # step -1 and yields [1, 0] — a short doc would emit two bogus
    # partial grams instead of none
    from ._caches import tracked_persist

    grams = docs.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"CASE WHEN length({text_col}) >= {n} THEN"
                f" transform(sequence(1, length({text_col}) - {n - 1}),"
                f" i -> substring({text_col}, i, {n}))"
                f" ELSE CAST(array() AS array<string>) END"
            )
        ).alias("g"),
    )
    # persist the exploded gram frame: it feeds THREE consumers (model
    # counts, the total, the scoring join) and the explode is the
    # operator's expensive stage, so caching the counts table instead
    # (smaller cache, explode runs twice) measures ~30% SLOWER at
    # sf0.1 (interleaved min 3.50 s vs 4.93 s) — the second explode
    # pass costs more than the bigger cache fill. At corpus scale the
    # persisted set is bounded by the train-on-a-sample pattern in the
    # docstring, not by this cache choice.
    grams = tracked_persist(grams)
    counts = grams.groupBy("g").agg(F.count("*").alias("cnt"))
    # orderBy+limit plans as TakeOrdered (per-partition heaps) — the
    # sanctioned top-k shape; a global row_number Window here would be
    # the single-task sort the plan linter exists to catch
    model = counts.orderBy(F.col("cnt").desc(), F.col("g")).limit(top_k)
    total = grams.count()  # a cache read, not a second corpus pass
    floor = 0.5
    # log-prob ONCE per DISTINCT gram (in the top_k model projection)
    # plus ONE constant for the unseen-gram backoff — the per-
    # occurrence spelling paid an ln() + decimal cast on every gram of
    # every document for the identical per-gram value (same inputs,
    # same IEEE ln, same cast: bit-identical scores)
    lp_model = F.log(F.col("cnt") / F.lit(float(total)))
    lp_floor = F.log(F.lit(floor) / F.lit(float(total)))
    if exact:
        lp_model = lp_model.cast("decimal(20,10)")
        lp_floor = lp_floor.cast("decimal(20,10)")
    model_lp = model.select("g", lp_model.alias("__lp"))
    scored = (
        grams.join(model_lp, on="g", how="left")
        .select(F.col(id_col), F.coalesce(F.col("__lp"), lp_floor).alias("lp"))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_grams"), F.sum("lp").alias("sum_lp"))
    )
    # double division of the EXACT decimal sum: decimal-division scale
    # rules differ per engine, IEEE division of identical inputs
    # doesn't (same determinism argument as rollup_mv.rollup_finalize)
    return scored.select(
        id_col,
        "n_grams",
        (F.col("sum_lp").cast("double") / F.col("n_grams")).alias("lm_score"),
    )


def ppl_buckets(
    docs: DataFrame,
    by_col: str = "lang",
    n_buckets: int = 3,
    n: int = 3,
    top_k: int = 50_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    exact: bool = True,
    exact_depth: bool = True,
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): score every document with the corpus-trained char-LM
    (:func:`char_lm_score`), then split each ``by_col`` group (CCNet:
    language) into equal-depth buckets by score — bucket 1 = 'head'
    (most fluent, lowest perplexity), last = 'tail'. Downstream
    mixing policies keep head+middle or re-weight by bucket.

    Returns (id_col, by_col, n_grams, lm_score, bucket, bucket_label)
    for every document with at least one full n-gram. Determinism:
    the ntile order is (lm_score DESC, id_col) — lm_score is
    bit-identical cross-engine (decimal gram sums, IEEE division), so
    the equal-depth cut is exactly replayable. ``exact=False`` passes
    the IEEE fast path through to char_lm_score: scores (and near-tie
    bucket boundaries) may then drift ~1 ulp between runs.

    Scale shape: scoring is one scan + one broadcast join
    (char_lm_score); the ntile window shuffles (id, score) pairs on
    ``by_col`` — group-sized partitions, slim rows, so the default
    needs ONE partition to hold a whole group's pairs. That breaks at
    100 TB when one language dominates: ``exact_depth=False`` (r12)
    cuts each group on APPROX percentiles of lm_score instead —
    ``percentile_approx`` is a partial-aggregable sketch (no per-group
    total order, no single-task window), the cuts frame is
    |groups|·(n_buckets-1) scalars broadcast back, and bucket b is
    'score above the (n_buckets-b)-th ascending cut'. Buckets stay
    exactly score-monotone (bucket 1 strictly above bucket 2, etc.);
    depths are equal only to sketch accuracy (``approx_accuracy``,
    Greenwald-Khanna error ≤ 1/accuracy) and boundary ties all land
    in the lower bucket rather than splitting by id — the agreement
    pytest pins both paths on gate-sized data."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    scored = char_lm_score(
        docs.select(id_col, text_col), n=n, top_k=top_k, text_col=text_col,
        id_col=id_col, exact=exact,
    )
    lab = scored.join(docs.select(id_col, by_col), id_col)
    if exact_depth:
        w = Window.partitionBy(by_col).orderBy(F.col("lm_score").desc(), F.col(id_col))
        bucket = F.ntile(n_buckets).over(w)
    else:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        cuts = lab.groupBy(by_col).agg(
            F.percentile_approx("lm_score", probs, approx_accuracy).alias("__cuts")
        )
        # NO broadcast hint: cuts is |groups|·(n_buckets-1) scalars —
        # tiny for languages, but by_col could be a high-cardinality
        # key (domain, source shard) at 100 TB, and a forced broadcast
        # of that is a driver OOM. AQE broadcasts when it is actually
        # small (the ann_join policy). Null-SAFE join: groupBy makes a
        # group for a NULL by_col (unidentified language) but an
        # equi-join would silently drop its rows — the exact ntile
        # path windows them into a null partition and keeps them.
        lab = lab.join(cuts, lab[by_col].eqNullSafe(cuts[by_col])).drop(
            cuts[by_col]
        )
        # ascending cuts q_1..q_{k-1}; desc-bucket = n_buckets - #{q_j < s}
        bucket = (
            F.lit(n_buckets)
            - F.size(F.filter(F.col("__cuts"), lambda c: c < F.col("lm_score")))
        )
    label = (
        F.when(bucket == 1, F.lit("head"))
        .when(bucket == n_buckets, F.lit("tail"))
        .otherwise(F.lit("middle"))
    )
    return lab.select(
        id_col,
        by_col,
        "n_grams",
        "lm_score",
        bucket.cast("int").alias("bucket"),
        label.alias("bucket_label"),
    )


def collocations_topk(
    docs: DataFrame,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Top-k collocations by pointwise mutual information:
    (w1, w2, n_pair, pmi) for adjacent token bigrams occurring at
    least ``min_count`` times — PMI = ln(p(w1w2) / (p(w1)·p(w2))),
    the standard association score separating true collocations
    ("New York") from chance adjacency; corpus analytics for
    tokenizer design and boilerplate discovery.

    Counts are exact integers (occurrences, not per-doc distinct):
    one explode of adjacent pairs + one of tokens, two grouped counts,
    then the pair table joins the vocabulary-sized unigram counts
    twice (unhinted — AQE broadcasts a real vocabulary, shuffles a
    pathological one; same policy as token_rarity). Only the final
    PMI drops to doubles, with the expression written identically in
    the SQL oracle so both engines evaluate the same libm calls over
    the same exact counts. Ranking is TakeOrdered (pmi desc, then
    (w1, w2) asc — a total order, so the top-k boundary is
    deterministic), never a global sort."""
    toks = docs.select(tokens_col(F.col(text_col)).alias("t"))
    pairs = toks.select(
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("t"), i.cast("int")).alias("w1"),
                        F.element_at(F.col("t"), (i + 1).cast("int")).alias("w2"),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("p")
    ).select("p.w1", "p.w2")
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cw"))
    )
    pair_counts = pairs.groupBy("w1", "w2").agg(F.count("*").alias("n_pair"))
    totals = pair_counts.agg(F.sum("n_pair").alias("nb")).crossJoin(
        uni.agg(F.sum("cw").alias("nu"))
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("cw").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("cw").alias("c2"))
    scored = (
        pair_counts.filter(F.col("n_pair") >= min_count)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "n_pair",
            (
                F.log(F.col("n_pair").cast("double") / F.col("nb"))
                - F.log(F.col("c1").cast("double") / F.col("nu"))
                - F.log(F.col("c2").cast("double") / F.col("nu"))
            ).alias("__pmi"),
        )
    )
    return (
        scored.orderBy(F.col("__pmi").desc(), "w1", "w2")
        .limit(k)
        .select("w1", "w2", "n_pair", F.round("__pmi", 6).cast("double").alias("pmi"))
    )


def lexical_diversity(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document lexical-diversity quality signals:
    (doc_id, n_tokens, n_types, ttr, entropy) — type-token ratio and
    Shannon entropy (nats) of the document's own token distribution.
    Low entropy and low TTR flag the boilerplate / keyword-stuffed /
    template pages a training-data quality filter drops; the
    complement of the cross-document repetition score
    (:func:`repetition_stats` catches copies ACROSS docs, this catches
    degeneracy WITHIN one).

    entropy = −Σ_t (c_t/n) ln(c_t/n) over the doc's token counts —
    exact counts, one explode + two aggregations both keyed by doc_id
    (the second groupBy reuses the first's hash partitioning, so the
    corpus shuffles once and each doc's state is bounded by its own
    vocabulary — linear at 100 TB, unlike the per-row quadratic
    count-in-array alternative). Tokenless docs keep n_tokens=0 with
    NULL ttr/entropy rather than silently dropping."""
    counts = (
        docs.select("doc_id", F.explode(tokens_col(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("doc_id")
    p = F.col("c").cast("double") / F.col("n")
    per_doc = (
        counts.withColumn("n", F.sum("c").over(w))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_types"),
            (-F.sum(p * F.log(p))).alias("h"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_types", F.lit(0)).alias("n_types"),
            F.round(F.col("n_types").cast("double") / F.col("n_tokens"), 6).alias("ttr"),
            F.round("h", 6).alias("entropy"),
        )
    )


def kl_unigram_divergence(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-group KL divergence of the group's unigram distribution
    from the whole corpus's: (group, n_tokens, kl) with
    KL(P_g ‖ P_corpus) = Σ_t p_{t,g} · ln(p_{t,g} / q_t) in nats —
    the drift measure for "how far does this domain/language/source
    slice sit from the mixture I'm training on" (0 = identical
    distribution; grows as the slice specializes). q_t > 0 wherever
    p_{t,g} > 0 by construction (the corpus contains the group), so
    no smoothing is needed and the sum is exact.

    Scale shape: one tokenize+explode feeds (group, term) counts;
    group totals and the global term distribution are reductions OF
    that table, not re-scans; the scoring join is (group, term) ⨝
    (term) — vocabulary-sized, unhinted so AQE broadcasts a real
    vocabulary. Probabilities are exact-integer ratios; only the final
    Σ p·ln(p/q) is float, rounded to 6 after summing."""
    gt = (
        docs.select(F.col(group_col).alias("g"), F.explode(tokens_col(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("g", "term")
        .agg(F.count("*").alias("c"))
    )
    from ._caches import tracked_persist

    gt = tracked_persist(gt)
    gtot = gt.groupBy("g").agg(F.sum("c").alias("ng"))
    ttot = gt.groupBy("term").agg(F.sum("c").alias("ct"))
    n = gt.agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("ng")
    q = F.col("ct").cast("double") / F.col("n")
    # null-SAFE joins on the group key (the ppl_buckets fix, review
    # r12): a NULL group (unidentified language) survives the groupBys
    # but a null-rejecting equi-join would silently drop its KL row.
    # The totals side is renamed to dodge same-lineage ambiguity.
    gtot2 = gtot.withColumnRenamed("g", "__g")
    scored = (
        gt.join(ttot, "term")
        .join(F.broadcast(gtot2), F.col("g").eqNullSafe(F.col("__g")))
        .drop("__g")
        .crossJoin(F.broadcast(n))
        .groupBy("g")
        .agg(F.round(F.sum(p * F.log(p / q)), 6).alias("kl"))
    )
    return (
        scored.join(gtot2, F.col("g").eqNullSafe(F.col("__g")))
        .drop("__g")
        .select(F.col("g").alias(group_col), F.col("ng").alias("n_tokens"), "kl")
    )


def zipf_alpha(
    docs: DataFrame,
    xmin: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Hill estimator of the Zipf/power-law tail exponent of the token
    frequency distribution, one row: (n_tail, xmin, alpha) with
    α = 1 + n / Σ ln(c_t / xmin) over terms with count ≥ xmin — the
    standard MLE for a discrete power-law tail. Natural corpora sit
    near α ≈ 2 (Zipf's law); a corpus that drifts far from its
    baseline α has changed character (template spam flattens the
    tail, aggressive dedup steepens it) — a one-number corpus
    fingerprint to track across pipeline versions.

    Exact integer term counts; one log per tail term over a ratio of
    exact ints; one Σ and one closing division (rounded to 6 after).
    One tokenize+explode + one groupBy — the same vocabulary-sized
    reduction every other corpus statistic here rides."""
    counts = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= xmin)
    )
    return counts.agg(
        F.count("*").alias("n_tail"),
        F.lit(xmin).cast("int").alias("xmin"),
        F.round(
            F.lit(1.0)
            + F.count("*") / F.sum(F.log(F.col("c").cast("double") / F.lit(float(xmin)))),
            6,
        ).alias("alpha"),
    )


def dsir_scores(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashed-feature importance scores for data selection — the
    Moore-Lewis (2010) cross-entropy-difference selector in its
    DSIR hashed-unigram form (Xie et al. 2023): every document in
    ``raw`` is scored by the mean per-token log-likelihood RATIO
    between a unigram model of the ``target`` domain and one of the
    raw corpus,

        score(x) = (1/|x|) Σ_t  ln p̂_target(h(t)) − ln p̂_raw(h(t))

    with tokens hashed into ``n_buckets`` buckets (the fixed-size
    feature space that makes the model corpus-size-independent) and
    Laplace (+1) smoothing on both sides. High scores read "looks
    like the target, unlike the average of the corpus" — rank by it
    and take the head (Moore-Lewis), or resample ∝ exp(score)
    (DSIR). Returns (id_col, n_tokens, score) for documents with at
    least one token.

    Cross-engine exactness: the bucket id is the md5-prefix integer
    mod ``n_buckets`` (the repo's md5-order convention — any engine
    parsing the same 8 hex digits agrees); per-token log-ratios are
    cast to DECIMAL(20,10) BEFORE the per-document sum (char_lm's
    order-independence discipline) and the mean is one IEEE division
    of the exact decimal sum.

    Scale shape: two bucket-count aggregations whose exchanges are
    ``n_buckets``-sized (NOT corpus-sized), one broadcast join of the
    2·n_buckets-row ratio table against the exploded token stream,
    one per-document sum. The target table is typically a curated
    sliver — pass a sample; scoring stays one scan either way."""
    ratios = _dsir_ratio_table(raw, target, n_buckets, text_col, id_col)
    return _dsir_apply(raw, ratios, n_buckets, text_col, id_col)


def _dsir_bucketed(df: DataFrame, b: int, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.explode(tokens_col(F.col(text_col))).alias("term"),
    ).select(
        F.col(id_col),
        F.pmod(
            F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10).cast("bigint"),
            F.lit(b),
        ).alias("bucket"),
    )


def _dsir_ratio_table(
    raw: DataFrame, target: DataFrame, n_buckets: int, text_col: str, id_col: str
) -> DataFrame:
    if n_buckets < 2:
        raise ValueError(f"dsir_scores: n_buckets must be >= 2, got {n_buckets}")
    b = int(n_buckets)
    raw_toks = _dsir_bucketed(raw, b, text_col, id_col)
    tgt_counts = (
        _dsir_bucketed(target, b, text_col, id_col)
        .groupBy("bucket")
        .agg(F.count("*").alias("ct"))
    )
    raw_counts = raw_toks.groupBy("bucket").agg(F.count("*").alias("cr"))
    tgt_total = tgt_counts.agg(F.sum("ct").alias("tt"))
    raw_total = raw_counts.agg(F.sum("cr").alias("rt"))
    # full bucket table (buckets absent from a side smooth to +1 mass)
    return (
        raw_counts.join(tgt_counts, "bucket", "full")
        .crossJoin(F.broadcast(tgt_total))
        .crossJoin(F.broadcast(raw_total))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1)).cast("double")
                    / (F.col("tt") + F.lit(b)).cast("double")
                )
                - F.log(
                    (F.coalesce(F.col("cr"), F.lit(0)) + F.lit(1)).cast("double")
                    / (F.col("rt") + F.lit(b)).cast("double")
                )
            )
            .cast("decimal(20,10)")
            .alias("lr"),
            # the never-seen-bucket default (both sides smooth to +1):
            # frozen-model scoring of NEW corpora needs it — a token
            # hashing outside the training bucket set must score the
            # neutral smoothed ratio, not silently vanish from n_tokens
            (
                F.log(F.lit(1.0) / (F.col("tt") + F.lit(b)).cast("double"))
                - F.log(F.lit(1.0) / (F.col("rt") + F.lit(b)).cast("double"))
            )
            .cast("decimal(20,10)")
            .alias("lr0"),
        )
    )


def _dsir_apply(
    docs: DataFrame, ratios: DataFrame, n_buckets: int, text_col: str, id_col: str
) -> DataFrame:
    toks = _dsir_bucketed(docs, int(n_buckets), text_col, id_col)
    defaults = ratios.agg(F.max("lr0").alias("lr0_all"))
    scored = (
        toks.join(F.broadcast(ratios), "bucket", "left")
        .crossJoin(F.broadcast(defaults))
        .withColumn("lr", F.coalesce(F.col("lr"), F.col("lr0_all")))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_tokens"), F.sum("lr").alias("sum_lr"))
    )
    return scored.select(
        id_col,
        "n_tokens",
        (F.col("sum_lr").cast("double") / F.col("n_tokens")).alias("score"),
    )


def dsir_model(
    raw: DataFrame,
    target: DataFrame,
    path: str,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Persist a DSIR importance model: the per-bucket log-likelihood
    ratio table written as ONE tiny parquet (at most n_buckets rows
    regardless of corpus size) — the persisted-index pattern of the
    PQ/LSH families. Train once on the big corpus, then score any
    number of later corpora/batches with
    :func:`dsir_score_with_model` without touching the training data
    again (the frozen-model discipline: cross-batch scores stay
    comparable because the model never drifts — the exact analog of
    pq_append's frozen codebooks)."""
    ratios = _dsir_ratio_table(raw, target, n_buckets, text_col, id_col)
    ratios.withColumn("n_buckets", F.lit(int(n_buckets))).write.mode(
        "overwrite"
    ).parquet(path)


def dsir_score_with_model(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score a corpus against a persisted :func:`dsir_model`:
    (id_col, n_tokens, score) — identical arithmetic to
    :func:`dsir_scores` (the pytest pins frozen-model scoring of the
    training corpus to the in-memory run, row for row). One scan +
    one broadcast join; the model parquet is KB-sized."""
    spark = docs.sparkSession
    ratios = spark.read.parquet(path)
    b = int(ratios.select("n_buckets").first().n_buckets)
    return _dsir_apply(docs, ratios.select("bucket", "lr", "lr0"), b, text_col, id_col)


def quality_train(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    n_features: int = 4096,
    max_iter: int = 50,
    reg_param: float = 0.01,
):
    """Train a fastText-style quality classifier — the model-based
    corpus-filtering step (CCNet's fastText filter, FineWeb-Edu's
    classifier distilled from LLM labels, done Spark-first): tokens →
    hashed bag-of-words (``n_features`` murmur buckets, the fixed-size
    feature space that makes the model corpus-size-independent) →
    L2-regularized logistic regression (pyspark.ml LBFGS — gradient
    partials are executor-side treeAggregate; the driver holds one
    d-dimensional coefficient vector). ``label_col`` is a 0/1 double —
    typically WEAK labels (a heuristic, a teacher model's verdicts on
    a sample). Returns the fitted pyspark.ml model; score held-out
    corpora with :func:`quality_score` and gate on
    profiling.auc_binary.

    Scale: training cost is one tokenize+hash scan per LBFGS pass
    over the TRAINING slice (typically a sample, not the corpus);
    scoring any corpus is one scan + a broadcast coefficient dot."""
    if n_features < 2:
        raise ValueError(f"quality_train: n_features must be >= 2, got {n_features}")
    if max_iter < 1:
        raise ValueError(f"quality_train: max_iter must be >= 1, got {max_iter}")
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    tf = HashingTF(
        inputCol="__toks", outputCol="__features", numFeatures=int(n_features)
    )
    feats = tf.transform(docs.withColumn("__toks", tokens_col(F.col(text_col))))
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol=label_col,
        maxIter=int(max_iter),
        regParam=float(reg_param),
        standardization=False,
    )
    return lr.fit(feats)


def quality_score(
    docs: DataFrame,
    model,
    text_col: str = "text",
) -> DataFrame:
    """Score a corpus with a :func:`quality_train` model: the input
    rows plus ``quality_p`` = P(label=1). One tokenize+hash scan and
    a broadcast coefficient dot per row — no shuffle."""
    from pyspark.ml.feature import HashingTF
    from pyspark.ml.functions import vector_to_array

    tf = HashingTF(
        inputCol="__toks",
        outputCol="__features",
        numFeatures=model.numFeatures,
    )
    feats = tf.transform(docs.withColumn("__toks", tokens_col(F.col(text_col))))
    return (
        model.transform(feats)
        .withColumn("quality_p", F.element_at(vector_to_array("probability"), 2))
        .drop("__toks", "__features", "rawPrediction", "probability", "prediction")
    )



def label_noise_candidates(
    docs: DataFrame,
    label_col: str,
    top_k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_folds: int = 2,
    n_features: int = 4096,
    max_iter: int = 50,
    reg_param: float = 0.1,
) -> DataFrame:
    """Label-noise detection for weakly-labeled corpora — the
    confident-learning recipe (Northcutt et al. 2021) in its
    cross-fitted ranking form: split the corpus into ``n_folds`` by
    id hash, score each fold with a :func:`quality_train` model
    trained on the OTHER folds (cross-fitting is what separates
    "the label disagrees with the data" from "the model memorized
    its own noise"), and return the ``top_k`` rows by
    ``disagreement`` = |P(label=1|text) − label| — the examples most
    likely mislabeled, i.e. the ones a curation pass should re-check
    or drop. Stronger regularization helps here (default 0.1): a
    model free to fit the noise reports no disagreement with it.
    The fold split hashes the id — it must be INDEPENDENT of the
    label (a class⊥fold confound trains each fold's model on one
    class and inverts every score; the pytest pins exactly that
    failure shape).

    Returns the input columns plus (quality_p, disagreement), ordered
    by (disagreement desc, id) and truncated to ``top_k``.

    Scale: n_folds model fits over (n_folds−1)/n_folds of the corpus
    each (LBFGS gradient passes, executor-side), one broadcast-
    coefficient scoring scan per fold, one TakeOrdered."""
    if n_folds < 2:
        raise ValueError(f"label_noise_candidates: n_folds must be >= 2, got {n_folds}")
    if top_k < 1:
        raise ValueError(f"label_noise_candidates: top_k must be >= 1, got {top_k}")
    parts = None
    for fold in range(int(n_folds)):
        train = docs.filter(F.pmod(F.col(id_col), F.lit(int(n_folds))) != fold)
        test = docs.filter(F.pmod(F.col(id_col), F.lit(int(n_folds))) == fold)
        model = quality_train(
            train, label_col, text_col=text_col,
            n_features=n_features, max_iter=max_iter, reg_param=reg_param,
        )
        scored = quality_score(test, model, text_col=text_col)
        parts = scored if parts is None else parts.unionByName(scored)
    return (
        parts.withColumn(
            "disagreement", F.abs(F.col("quality_p") - F.col(label_col))
        )
        .orderBy(F.col("disagreement").desc(), id_col)
        .limit(int(top_k))
    )


def with_compression_ratio(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document zlib compression ratio (compressed bytes ÷ UTF-8
    bytes) — the corpus-free quality signal the regex features miss:
    heavily REPETITIVE boilerplate compresses far below normal prose
    (low ratio), while binary-ish/garbled text barely compresses at
    all (ratio near or above 1). Downstream filters cut both tails.

    The one text operator here that is NOT pure Column work: zlib
    has no JVM/SQL expression equivalent, so this is an Arrow-batched
    ``mapInPandas`` (the multimodal codec path, not a row-at-a-time
    UDF) — per-batch Python cost amortized over thousands of rows,
    no shuffle, columns pass through. Ratio is deterministic for a
    fixed zlib level (6): the same corpus always scores identically.
    NULL text → NULL ratio; empty text → NULL (no bytes to measure,
    and the header-only compressed size would read as a huge ratio).
    """
    import zlib

    from pyspark.sql.types import DoubleType, StructField, StructType

    # build a NEW StructType: StructType.add mutates in place, and
    # df.schema hands back the DataFrame's cached schema object —
    # mutating it poisons df.columns with the phantom output column
    schema_out = StructType(
        list(df.schema.fields) + [StructField("compression_ratio", DoubleType())]
    )

    def _batches(pdfs):
        for pdf in pdfs:
            ratios = []
            for t in pdf[text_col]:
                if t is None:
                    ratios.append(None)
                    continue
                raw = t.encode("utf-8")
                if not raw:
                    ratios.append(None)
                    continue
                ratios.append(len(zlib.compress(raw, 6)) / len(raw))
            pdf = pdf.copy()
            pdf["compression_ratio"] = ratios
            yield pdf

    return df.mapInPandas(_batches, schema_out)


# the Gopher required-stopword set (Rae et al. 2021, §A1.1: a document
# must contain at least two of these); shared verbatim with the oracle
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The Gopher document-quality rules (Rae et al. 2021, "Scaling
    Language Models: ...Gopher", §A1.1) — the canonical doc-level
    filter battery a pretraining pipeline runs before anything
    heavier. Emits the raw signals, one boolean per rule, and the
    conjunction:

    - ``r_word_count``: 50 ≤ words ≤ 100,000;
    - ``r_mean_word_len``: mean word length in [3, 10];
    - ``r_symbol_ratio``: (# of '#' chars + '...' occurrences) / words
      ≤ 0.1;
    - ``r_bullet_lines``: ≤ 90% of lines start with a bullet
      (-, *, •);
    - ``r_ellipsis_lines``: ≤ 30% of lines end with '...';
    - ``r_alpha_words``: ≥ 80% of words contain ≥ 1 alphabetic char;
    - ``r_stopwords``: ≥ 2 distinct hits from the 8-word required
      set (GOPHER_STOPWORDS).

    Pure per-row HOF/regexp columns — zero shuffle, whole-stage
    codegen; ratios are single rounded divisions of integer counts, so
    the SQL oracle replays bit-identically. NULL text fails every rule
    (0 words). At 100 TB this is one scan-stage projection fused with
    whatever runs next."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokens_col(text)  # the module's one tokenization (review r12)
    lines = F.filter(
        F.split(text, r"\n"), lambda ln: F.trim(ln) != F.lit("")
    )
    n_words = F.size(toks)
    n_lines = F.size(lines)
    words1 = F.greatest(n_words, F.lit(1))
    lines1 = F.greatest(n_lines, F.lit(1))
    n_chars_in_words = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    mean_word_len = F.round(n_chars_in_words / words1, 6)
    n_hash = F.length(text) - F.length(F.regexp_replace(text, r"#", ""))
    n_ellipsis = F.size(F.split(text, r"\.\.\.")) - F.lit(1)
    symbol_ratio = F.round((n_hash + n_ellipsis) / words1, 6)
    bullet_frac = F.round(
        F.size(F.filter(lines, lambda ln: F.trim(ln).rlike(r"^[-*•]")))
        / lines1,
        6,
    )
    ellipsis_frac = F.round(
        F.size(F.filter(lines, lambda ln: F.trim(ln).rlike(r"\.\.\.$"))) / lines1, 6
    )
    alpha_frac = F.round(
        F.size(F.filter(toks, lambda t: t.rlike(r"[A-Za-z]"))) / words1, 6
    )
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(F.transform(toks, F.lower), s),
        )
    )
    out = (
        df.withColumn("n_words", n_words)
        .withColumn("mean_word_len", mean_word_len.cast("double"))
        .withColumn("symbol_ratio", symbol_ratio.cast("double"))
        .withColumn("bullet_frac", bullet_frac.cast("double"))
        .withColumn("ellipsis_frac", ellipsis_frac.cast("double"))
        .withColumn("alpha_frac", alpha_frac.cast("double"))
        .withColumn("stop_hits", stop_hits)
    )
    rules = {
        "r_word_count": (F.col("n_words") >= 50) & (F.col("n_words") <= 100_000),
        "r_mean_word_len": (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0),
        "r_symbol_ratio": F.col("symbol_ratio") <= 0.1,
        "r_bullet_lines": F.col("bullet_frac") <= 0.9,
        "r_ellipsis_lines": F.col("ellipsis_frac") <= 0.3,
        "r_alpha_words": F.col("alpha_frac") >= 0.8,
        "r_stopwords": F.col("stop_hits") >= 2,
    }
    passed = None
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
        passed = cond if passed is None else (passed & cond)
    return out.withColumn("gopher_pass", passed)


def c4_line_filters(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The C4 line-level cleaning recipe (Raffel et al. 2020, "Exploring
    the Limits of Transfer Learning...", §2.2): keep only lines that
    end in terminal punctuation AND hold ≥ 3 words; flag documents
    containing 'lorem ipsum' or a curly brace (code). Emits
    (n_lines, n_lines_kept, has_lorem_ipsum, has_curly_brace,
    clean_text, clean_hash, c4_keep) — ``c4_keep`` is the document
    policy: ≥ 3 surviving lines and neither flag.

    Per-row HOFs only (line split → two-predicate filter → join), no
    shuffle; the md5 over the surviving line stream is the byte-exact
    cross-engine certificate (the collapse_repeats convention). NULL
    text yields zero lines and c4_keep = false."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(F.split(text, r"\n"), lambda ln: F.trim(ln) != F.lit(""))
    kept = F.filter(
        lines,
        lambda ln: F.trim(ln).rlike(r"[.!?\"]$")
        & (F.size(tokens_col(ln)) >= 3),  # the module's one tokenization
    )
    clean = F.concat_ws("\n", kept)
    lower = F.lower(text)
    return (
        df.withColumn("n_lines", F.size(lines))
        .withColumn("__kept", kept)
        .withColumn("n_lines_kept", F.size(F.col("__kept")))
        .withColumn("has_lorem_ipsum", lower.contains("lorem ipsum"))
        .withColumn(
            "has_curly_brace", text.contains("{") | text.contains("}")
        )
        .withColumn("clean_text", clean)
        .withColumn("clean_hash", F.md5(clean))
        .withColumn(
            "c4_keep",
            (F.col("n_lines_kept") >= 3)
            & ~F.col("has_lorem_ipsum")
            & ~F.col("has_curly_brace"),
        )
        .drop("__kept")
    )
