"""Distributed byte-pair-encoding tokenizer TRAINING and encoding —
the learn-the-tokenizer-from-the-corpus step of an LLM data pipeline
(Sennrich/Haddow/Birch 2016), expressed Spark-first:

- :func:`bpe_train` — learn a merge table from the corpus's word
  frequencies. The classic trick that makes BPE tractable at corpus
  scale is that training only ever touches the WORD-FREQUENCY table
  (distinct words + counts), never the raw token stream: a 100 TB
  corpus has a bounded distinct-word vocabulary, so every round is a
  vocabulary-sized job regardless of corpus size. Each round is one
  pair-count aggregation (explode adjacent symbol pairs weighted by
  word count → grouped sum), one TakeOrdered argmax (count desc, pair
  lex asc — the deterministic tie-break), and one JVM-side array fold
  applying the merge greedily LEFT-TO-RIGHT NON-OVERLAPPING to every
  word's symbol sequence. Driver state per round is ONE pair; lineage
  truncates via localCheckpoint (pagerank's discipline).

- :func:`bpe_encode` — apply a learned merge table to a corpus. The
  merge list is closure-broadcast (K rows); encoding is mapInPandas
  with a per-batch word cache, so each DISTINCT word in a batch is
  encoded once regardless of its frequency.

Determinism: integer pair counts, lexicographic tie-breaks, no
floating point anywhere — any engine replays training bit-identically.
The catalog oracle (queries.py:text_bpe_merges) replays the FULL
training loop as a DuckDB recursive CTE, carrying each word's symbol
sequence as a string with every symbol delimiter-wrapped on both
sides, where the fully-anchored `replace()` is exactly the greedy
left-to-right non-overlapping merge (a prefix-anchored-only encoding
has a latent corruption bug — pinned by the adversarial oracle test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens_col

MERGES_SCHEMA = (
    "rank int, left_sym string, right_sym string, merged string, pair_count long"
)


def bpe_train(
    docs: DataFrame,
    n_merges: int = 20,
    min_count: int = 2,
    text_col: str = "text",
    with_state: bool = False,
):
    """Learn a BPE merge table: (rank, left_sym, right_sym, merged,
    pair_count) — one row per learned merge, in learned order. Words
    are whitespace tokens (the repo's tokens_col), symbols start as
    single characters (no end-of-word marker — documented divergence
    from Sennrich's ``</w>``; deterministic either way), and training
    stops after ``n_merges`` rounds or when the best pair's count
    drops below ``min_count``. Pair counts are per OCCURRENCE within
    a word, weighted by the word's corpus frequency ("aaa"×5 gives
    (a,a) count 10), exactly the textbook recipe.

    ``with_state=True`` additionally returns the final
    (w, cnt, syms) vocabulary state — bpe_encode over the training
    corpus must reproduce it (pytest-pinned invariant).

    Scale: every round's exchange is pair-vocabulary-sized; the word
    table is distinct-words-sized; only the K-row merge table ever
    reaches the driver."""
    if n_merges < 1:
        raise ValueError(f"bpe_train: n_merges must be >= 1, got {n_merges}")
    if min_count < 1:
        raise ValueError(f"bpe_train: min_count must be >= 1, got {min_count}")
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    state = words.select(
        "w",
        "cnt",
        F.transform(
            F.sequence(F.lit(1), F.length(F.col("w"))),
            lambda i: F.col("w").substr(i, F.lit(1)),
        ).alias("syms"),
    ).localCheckpoint()

    merges: list = []
    for rank in range(1, n_merges + 1):
        syms = F.col("syms")
        pairs = state.select(
            "cnt",
            F.explode(
                F.filter(
                    F.zip_with(
                        syms,
                        F.slice(syms, F.lit(2), F.size(syms) - 1),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                    lambda t: t["b"].isNotNull(),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best or best[0].c < min_count:
            break
        a, b, c = best[0].a, best[0].b, int(best[0].c)
        merges.append((rank, a, b, a + b, c))
        la, lb = F.lit(a), F.lit(b)
        state = state.withColumn(
            "syms",
            F.aggregate(
                "syms",
                F.expr("CAST(array() AS array<string>)"),
                lambda out, x: F.when(
                    (F.size(out) > 0)
                    & (F.element_at(out, -1) == la)
                    & (x == lb),
                    F.concat(
                        F.slice(out, F.lit(1), F.size(out) - 1),
                        F.array(F.concat(la, lb)),
                    ),
                ).otherwise(F.concat(out, F.array(x))),
            ),
        ).localCheckpoint()

    merges_df = spark.createDataFrame(merges, MERGES_SCHEMA)
    if with_state:
        return merges_df, state
    return merges_df


def _greedy_merge(syms: list, a: str, b: str) -> list:
    """One greedy left-to-right non-overlapping merge pass — the single
    semantics every trainer/encoder path in this module shares."""
    out: list = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def bpe_train_batched(
    docs: DataFrame,
    n_merges: int = 500,
    min_count: int = 2,
    round_size: int = 64,
    text_col: str = "text",
    pair_table_cap: int = 200_000,
    max_affected_rows: int = 500_000,
    with_state: bool = False,
):
    """:func:`bpe_train` at realistic merge counts — BIT-IDENTICAL
    output, ~``round_size`` merges per distributed round instead of
    one (Sennrich's practical recompute-every-N variant, made exact).

    Why the sequential trainer is the wrong shape at 30k merges: each
    merge costs one distributed pair aggregation + one fold pass, so
    the per-round localCheckpoint floor dominates. This trainer pays
    ONE distributed round per ``round_size`` merges:

    1. aggregate pair counts (as before) and collect the top
       ``pair_table_cap`` rows (count desc, pair lex asc). θ = the
       smallest collected count when the cap truncated, else 0 —
       counts ≤ θ are unknown territory.
    2. collect the AFFECTED word sub-vocabulary: words whose symbol
       sequence contains any of the top ``4·round_size`` candidate
       pairs (halving the candidate set while the subset exceeds
       ``max_affected_rows``).
    3. replay merges EXACTLY on the driver: pick the argmax of the
       tracked pair table, apply it greedily to the affected words,
       and update counts by exact per-word deltas. Soundness
       invariants (each pytest-pinned via equivalence to bpe_train):
       - an old pair's count NEVER increases under a merge (new
         adjacencies always involve the just-created symbol), so
         uncollected pairs stay ≤ θ forever within the round;
       - pairs created in-round exist ONLY in affected words (the
         merged symbol exists nowhere else), so their counts are
         exactly the driver-computed ones;
       - the round therefore stops early the moment the argmax is ≤ θ
         or is an original pair outside the candidate set (its
         affected words weren't collected) — the next distributed
         round recomputes from truth. A round that can accept nothing
         falls back to one sequential-style merge (the collected top
         row IS the global argmax), so progress is guaranteed.
    4. apply the round's accepted merges, in learned order, to the
       distributed state in ONE Arrow ``mapInPandas`` pass with a
       per-batch distinct-sequence cache.

    Scale shape: per ~round_size merges, one vocabulary-sized
    aggregation + one map pass; driver state is the bounded pair
    table + the bounded affected sub-vocabulary (both capped, with
    the documented fallback when a cap bites). Same output contract
    as bpe_train; the text_bpe_merges oracle gates this path."""
    if n_merges < 1:
        raise ValueError(f"bpe_train_batched: n_merges must be >= 1, got {n_merges}")
    if min_count < 1:
        raise ValueError(f"bpe_train_batched: min_count must be >= 1, got {min_count}")
    if round_size < 1:
        raise ValueError(f"bpe_train_batched: round_size must be >= 1, got {round_size}")
    from collections import Counter, defaultdict

    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    state = words.selectExpr(
        "w",
        "cnt",
        # the Column spelling (transform + Column.substr) is identical;
        # the string is one roundtrip (r13 — see _ADJ_SQL below)
        "transform(sequence(1, length(w)), i -> substr(w, i, 1)) AS syms",
    ).localCheckpoint()

    # pairs ride as STRUCTS end to end — a string encoding with a
    # separator char would mis-parse any symbol containing that char
    # (r11 review: \x1f survives whitespace tokenization in
    # binary-contaminated text) and its concatenated tie-break order
    # could diverge from bpe_train's (a, b) column order.
    # r13: the adjacency expression rides as ONE SQL string — the
    # Column spelling (zip_with/slice/filter lambdas) cost ~70 py4j
    # roundtrips and was rebuilt TWICE PER ROUND (pair counts + the
    # affected-vocab filter; 5,919 roundtrips measured for the
    # 20-merge entry construction). Identical Catalyst tree: same
    # zip_with(slice) adjacency, same struct field names, same
    # null-tail filter.
    _ADJ_SQL = (
        "filter(zip_with(syms, slice(syms, 2, size(syms) - 1), "
        "(x, y) -> struct(x AS a, y AS b)), t -> t.b IS NOT NULL)"
    )

    def _sql_str(s: str) -> str:
        # exact round-trip under Spark's default backslash-escaping
        # string parser (symbols can be ANY bytes that survive
        # whitespace tokenization, incl. quotes and backslashes)
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    merges: list = []
    done = False
    while not done and len(merges) < n_merges:
        # ---- 1. distributed pair counts, top table to the driver ----
        pair_rows = (
            state.selectExpr("cnt", f"explode({_ADJ_SQL}) AS p")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), "a", "b")
            .limit(pair_table_cap)
            .collect()
        )
        if not pair_rows or pair_rows[0].c < min_count:
            break
        theta = pair_rows[-1].c if len(pair_rows) == pair_table_cap else 0
        P = {(r.a, r.b): int(r.c) for r in pair_rows}

        # ---- 2. affected sub-vocabulary for the candidate set -------
        room = n_merges - len(merges)
        cand = [(r.a, r.b) for r in pair_rows[: 4 * min(round_size, room)]]
        aff = None
        while cand:
            cand_lits = "array(" + ", ".join(
                f"named_struct('a', {_sql_str(a)}, 'b', {_sql_str(b)})"
                for a, b in cand
            ) + ")"
            flt = state.filter(F.expr(f"arrays_overlap({_ADJ_SQL}, {cand_lits})"))
            # ONE job for budget check + fetch: limit(max+1) returns
            # every affected row when the budget holds — the previous
            # separate count-then-collect paid the vocab filter scan
            # twice per round. Over-budget probes now transfer up to
            # max+1 rows before halving (bounded: same order as the
            # accepted collect itself) instead of paying a second scan
            rows = flt.select("cnt", "syms").limit(max_affected_rows + 1).collect()
            if len(rows) <= max_affected_rows:
                aff = rows
                break
            cand = cand[: max(len(cand) // 2, 1) if len(cand) > 1 else 0]
        if aff is None:
            # even the single top pair exceeds the driver budget: apply
            # the global argmax (= the collected top row) distributedly
            a, b = pair_rows[0].a, pair_rows[0].b
            merges.append((len(merges) + 1, a, b, a + b, int(pair_rows[0].c)))
            state = _apply_merges_distributed(state, [(a, b)]).localCheckpoint(eager=False)
            continue

        # ---- 3. exact driver replay over the affected words ---------
        cand_set = set(cand)
        created_syms: set = set()
        wlist = [(list(r.syms), int(r.cnt)) for r in aff]
        pair_words: dict = defaultdict(set)
        for i, (s, _) in enumerate(wlist):
            for q in zip(s, s[1:]):
                pair_words[q].add(i)
        accepted: list = []
        while len(merges) + len(accepted) < n_merges and len(accepted) < round_size:
            # when the cap truncated the table AT OR ABOVE min_count
            # (theta >= min_count), an exhausted/decayed tracked view
            # proves nothing about UNTRACKED pairs with true counts in
            # [min_count, theta] — break to the outer recompute-from-
            # truth instead of ending training (review r12). done=True
            # is only sound when theta < min_count: untracked counts
            # are <= theta, hence below min_count globally.
            if not P:
                if theta >= min_count:
                    break
                done = True
                break
            best = min(P.items(), key=lambda kv: (-kv[1], kv[0]))
            (a, b), c = best
            if c <= theta and theta > 0:
                break  # below the trusted horizon: recompute from truth
            if c < min_count:
                done = True
                break
            if (a, b) not in cand_set and a not in created_syms and b not in created_syms:
                break  # original pair outside the collected sub-vocab
            accepted.append((len(merges) + len(accepted) + 1, a, b, a + b, c))
            created_syms.add(a + b)
            for i in sorted(pair_words.get((a, b), ())):
                syms, cnt = wlist[i]
                old = Counter(zip(syms, syms[1:]))
                new_syms = _greedy_merge(syms, a, b)
                new = Counter(zip(new_syms, new_syms[1:]))
                for q in set(old) | set(new):
                    d = (new.get(q, 0) - old.get(q, 0)) * cnt
                    if d == 0:
                        continue
                    if q in P:
                        P[q] += d
                        if P[q] <= 0:
                            del P[q]
                    elif q[0] in created_syms or q[1] in created_syms:
                        if d > 0:
                            P[q] = d
                    # else: old pair below θ — it can never be selected
                    if q in new and i not in pair_words[q]:
                        pair_words[q].add(i)
                for q in set(old) - set(new):
                    pair_words[q].discard(i)
                wlist[i] = (new_syms, cnt)
            if not pair_words.get((a, b)):
                pair_words.pop((a, b), None)

        if not accepted and not done:
            # conservative stops fired before accepting anything (all
            # counts at θ): the collected top row is still the global
            # argmax — take it sequentially so the loop always advances
            a, b = pair_rows[0].a, pair_rows[0].b
            merges.append((len(merges) + 1, a, b, a + b, int(pair_rows[0].c)))
            state = _apply_merges_distributed(state, [(a, b)]).localCheckpoint(eager=False)
            continue
        if accepted:
            merges.extend(accepted)
            state = _apply_merges_distributed(
                state, [(a, b) for _, a, b, _, _ in accepted]
            ).localCheckpoint(eager=False)

    merges_df = spark.createDataFrame(merges, MERGES_SCHEMA)
    if with_state:
        return merges_df, state
    return merges_df


def _apply_merges_distributed(state: DataFrame, mlist: list) -> DataFrame:
    """Apply a round's merges, in learned order, to the (w, cnt, syms)
    vocabulary state in one Arrow pass (per-batch distinct-sequence
    cache — a word's fold runs once per batch however often it recurs)."""

    def fn(batches):
        import pandas as pd

        cache: dict = {}
        for pdf in batches:
            out = []
            for syms in pdf["syms"]:
                key = tuple(syms)
                got = cache.get(key)
                if got is None:
                    s = list(syms)
                    for a, b in mlist:
                        s = _greedy_merge(s, a, b)
                    got = cache[key] = s
                out.append(got)
            pdf = pdf.copy()
            pdf["syms"] = out
            yield pdf

    return state.mapInPandas(fn, "w string, cnt long, syms array<string>")


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode a corpus with a learned merge table: (id_col, n_words,
    n_bpe_tokens, tokens) where ``tokens`` is the concatenated BPE
    symbol sequence of the document's whitespace words, each word
    folded through the merges IN LEARNED ORDER (the Sennrich encode
    rule — training and encoding apply the identical greedy
    left-to-right merge, so re-encoding the training corpus
    reproduces the final training state exactly).

    The K-row merge table rides the task closure; encoding is
    mapInPandas (Arrow batches) with a per-batch distinct-word cache.
    Zero-word documents encode to an empty token list."""
    mlist = [
        (r.left_sym, r.right_sym)
        for r in merges.orderBy("rank").select("rank", "left_sym", "right_sym").collect()
    ]
    id_type = dict(docs.dtypes)[id_col]
    out_schema = (
        f"{id_col} {id_type}, n_words long, n_bpe_tokens long, tokens array<string>"
    )

    def encode_batches(batches):
        import pandas as pd

        cache: dict = {}

        def enc_word(w: str):
            got = cache.get(w)
            if got is not None:
                return got
            syms = list(w)
            for a, b in mlist:
                out = []
                for x in syms:
                    if out and out[-1] == a and x == b:
                        out[-1] = a + b
                    else:
                        out.append(x)
                syms = out
            cache[w] = syms
            return syms

        for pdf in batches:
            ids, nw, nb, toks = [], [], [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                ws = (txt or "").split()
                enc: list = []
                for w in ws:
                    enc.extend(enc_word(w))
                ids.append(i)
                nw.append(len(ws))
                nb.append(len(enc))
                toks.append(enc)
            yield pd.DataFrame(
                {id_col: ids, "n_words": nw, "n_bpe_tokens": nb, "tokens": toks}
            )

    return docs.select(id_col, text_col).mapInPandas(encode_batches, out_schema)
