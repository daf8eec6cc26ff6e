"""Corpus snapshot diffing: classify every document across two corpus
versions as added / removed / changed / unchanged.

The dataset-management primitive behind "what changed between corpus
v1 and v2?" — retraining triggers, incremental re-processing scopes
(only `added`+`changed` need re-tokenizing), and audit trails all
start from this classification. The store tier answers the same
question for ONE collection via time-travel manifests
(store/storage.py at_version); this operator answers it for two
arbitrary corpus frames regardless of where they came from.

Scale shape (100 TB, 1000 executors): each side is reduced to
``(id, digest)`` AT THE SCAN — the full-outer join shuffles two
slim 2-column frames, never the payload (a corpus diff that shuffles
document text would move 2×100 TB to compare ~32-byte digests). If
both versions are stored bucketed by the id column, the join is
exchange-free. The digest is computed by codegen'd ``md5`` over a
unit-separator concatenation — no UDFs, whole-stage codegen all the
way into the join.

Digest caveat (documented, not hidden): columns are joined with the
ASCII unit separator (0x1F) and NULLs replaced by a 0x1E-marked
sentinel, so a payload that itself contains 0x1F could collide two
different rows into one digest. Training-data text columns do not
contain C0 separator bytes in practice; a caller who cannot rule it
out should pass length-prefixed derived columns.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"
_NULL = "\x1eNULL"


def content_digest(content_cols: Sequence[str]) -> Column:
    """md5 over the unit-separator concatenation of the content
    columns (each cast to string; NULL → a 0x1E-marked sentinel that
    no cast-to-string can produce). ``concat_ws`` would silently DROP
    null elements — two rows differing only in which column is NULL
    would collide — so every element is coalesced first."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in content_cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def content_digest_sql(content_cols: Sequence[str]) -> str:
    """The identical digest in DuckDB SQL (oracle side): same
    separator, same NULL sentinel, same md5-hex. Kept next to the
    Column version so the two encodings cannot drift apart."""
    parts = ", ".join(
        f"COALESCE(CAST({c} AS VARCHAR), chr(30) || 'NULL')" for c in content_cols
    )
    return f"md5(concat_ws(chr(31), {parts}))"


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_cols: Sequence[str] = ("text",),
    carry_cols: Iterable[str] = (),
) -> DataFrame:
    """Row-level diff of two corpus versions.

    Returns one row per id present in EITHER version:
    ``(id_col, status, *carry_cols)`` with status ∈
    {'added', 'removed', 'changed', 'unchanged'} — added = only in
    ``new``, removed = only in ``old``, changed = present in both
    with differing content digests. ``carry_cols`` are taken from the
    new side, falling back to the old side for removed rows (so a
    per-language diff summary can group directly on the output).

    Both sides are projected to id + digest (+ carries) before the
    full-outer join; the payload never crosses the exchange.
    """
    carry = list(carry_cols)
    o = old.select(
        F.col(id_col).alias("__o_id"),
        content_digest(content_cols).alias("__o_dg"),
        *[F.col(c).alias(f"__o_{c}") for c in carry],
    )
    n = new.select(
        F.col(id_col).alias("__n_id"),
        content_digest(content_cols).alias("__n_dg"),
        *[F.col(c).alias(f"__n_{c}") for c in carry],
    )
    j = o.join(n, o["__o_id"] == n["__n_id"], "full_outer")
    status = (
        F.when(F.col("__o_id").isNull(), F.lit("added"))
        .when(F.col("__n_id").isNull(), F.lit("removed"))
        .when(F.col("__o_dg") != F.col("__n_dg"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        F.coalesce(F.col("__n_id"), F.col("__o_id")).alias(id_col),
        status.alias("status"),
        *[
            F.coalesce(F.col(f"__n_{c}"), F.col(f"__o_{c}")).alias(c)
            for c in carry
        ],
    )


def corpus_diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_cols: Sequence[str] = ("text",),
    group_cols: Iterable[str] = (),
) -> DataFrame:
    """Aggregated diff: row counts per status (× optional group
    columns, e.g. language). One slim join + one grouped count — the
    shape a nightly corpus-delta report runs at any scale."""
    groups = list(group_cols)
    d = corpus_diff(old, new, id_col, content_cols, carry_cols=groups)
    return d.groupBy("status", *groups).agg(F.count("*").alias("n"))
