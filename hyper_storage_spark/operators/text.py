"""Text-analysis operators over a ``documents``-shaped table
(doc_id, text, lang, source, n_chars).

All of these stay JVM-side (built-in functions only — no Python UDFs),
so they whole-stage-codegen and scale linearly with input splits: no
shuffle at all except where a groupBy is the semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
    return F.split(F.trim(text), TOKEN_SPLIT)


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
    stop = F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS["en"])))
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
    hit ⇒ 'und' (undetermined)."""
    df = df.withColumn("__ltoks", tokens_col(F.lower(F.col(text_col))))
    toks = F.col("__ltoks")

    def marker_score(markers: tuple[str, ...]):
        ms = list(markers)
        return F.size(F.filter(toks, lambda t: t.isin(ms)))

    scores = {lang: marker_score(markers) for lang, markers in LANG_MARKERS.items()}
    best = None
    for lang in sorted(scores):  # deterministic tie-break: alphabetical wins
        hit = scores[lang]
        pair = F.struct(hit.alias("score"), F.lit(lang).alias("lang"))
        best = pair if best is None else F.when(
            (pair["score"] > best["score"]), pair
        ).otherwise(best)
    pred = F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    return df.withColumn("lang_pred", pred).drop("__ltoks")


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
