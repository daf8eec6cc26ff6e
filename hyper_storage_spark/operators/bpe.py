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
