"""A tiny SQL-text expression algebra for the filter compiler.

The compiler used to build its dynamic-typing CASE trees as PySpark
Column objects — ~1,000 py4j roundtrips PER EXPRESSION measured on the
r13 corpus (each F.when / operator / cast is a JVM call), which is the
single largest driver-construction cost in the store's query path and
multiplies under host noise. This module gives the compiler the same
algebra over plain SQL STRINGS: the whole compiled filter crosses py4j
ONCE, as one ``F.expr(text)`` call (the MinHash/ANN expression-string
recipe from r12, applied to the expression compiler).

``E`` mirrors the Column operator surface the compiler uses (&, |, ~,
==, !=, >, unary -, isNull/isNotNull, isin, rlike, startswith,
contains, cast/try_cast) and ``when()``/function helpers mirror the
``pyspark.sql.functions`` entry points, each emitting the SQL spelling
of the SAME Catalyst expression (CASE WHEN for when-chains, AND/OR/NOT,
``<>`` for !=, function syntax for startswith/contains). Everything is
parenthesized defensively, so operator precedence can never diverge
from the explicit tree the Column API built.

Escaping: SQL string literals are emitted with backslashes and quotes
doubled (Spark's default escapedStringLiterals=false treats backslash
as an escape), so regexes and arbitrary user constants round-trip
exactly. Lambda variables get globally unique names so nested
higher-order functions can never capture each other's binders.
"""

from __future__ import annotations

import itertools
from decimal import Decimal


def sql_str(value: str) -> str:
    """SQL string literal with exact round-trip under Spark's default
    backslash-escaping parser."""
    return "'" + value.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _plain_decimal(value: Decimal) -> str:
    """Non-scientific digits of a Decimal ('1E+2' → '100')."""
    return format(value, "f")


class E:
    """One SQL expression fragment. Immutable; every operation returns
    a new fragment wrapped in parentheses."""

    __slots__ = ("sql",)

    def __init__(self, sql: str):
        self.sql = sql

    # -- guards ---------------------------------------------------------
    def __bool__(self):  # pragma: no cover — a bug, not a code path
        raise TypeError("SQL expression fragments have no truth value")

    __hash__ = None  # type: ignore[assignment]

    def __repr__(self):  # pragma: no cover
        return f"E({self.sql!r})"

    # -- boolean algebra --------------------------------------------------
    def __and__(self, other: "E") -> "E":
        return E(f"({self.sql} AND {other.sql})")

    def __or__(self, other: "E") -> "E":
        return E(f"({self.sql} OR {other.sql})")

    def __invert__(self) -> "E":
        return E(f"(NOT {self.sql})")

    # -- comparisons ------------------------------------------------------
    def __eq__(self, other) -> "E":  # type: ignore[override]
        return E(f"({self.sql} = {_operand(other)})")

    def __ne__(self, other) -> "E":  # type: ignore[override]
        return E(f"({self.sql} <> {_operand(other)})")

    def __gt__(self, other) -> "E":
        return E(f"({self.sql} > {_operand(other)})")

    def __lt__(self, other) -> "E":
        return E(f"({self.sql} < {_operand(other)})")

    def __ge__(self, other) -> "E":
        return E(f"({self.sql} >= {_operand(other)})")

    def __le__(self, other) -> "E":
        return E(f"({self.sql} <= {_operand(other)})")

    def __neg__(self) -> "E":
        return E(f"(- {self.sql})")

    # -- Column-method mirrors ---------------------------------------------
    def isNull(self) -> "E":
        return E(f"({self.sql} IS NULL)")

    def isNotNull(self) -> "E":
        return E(f"({self.sql} IS NOT NULL)")

    def isin(self, *values: str) -> "E":
        lits = ", ".join(sql_str(v) for v in values)
        return E(f"({self.sql} IN ({lits}))")

    def rlike(self, pattern: str) -> "E":
        return E(f"({self.sql} RLIKE {sql_str(pattern)})")

    def startswith(self, prefix: str) -> "E":
        return E(f"startswith({self.sql}, {sql_str(prefix)})")

    def contains(self, needle: str) -> "E":
        return E(f"contains({self.sql}, {sql_str(needle)})")

    def cast(self, dtype: str) -> "E":
        return E(f"CAST({self.sql} AS {dtype})")

    def try_cast(self, dtype: str) -> "E":
        return E(f"TRY_CAST({self.sql} AS {dtype})")


def _operand(v) -> str:
    if isinstance(v, E):
        return v.sql
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return sql_str(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, Decimal):
        return lit(v).sql
    raise TypeError(f"unsupported SQL operand {v!r}")  # pragma: no cover


def lit(value) -> E:
    """Literal fragment. Mirrors F.lit for the types the compiler uses:
    bool → TRUE/FALSE, str → escaped literal, int → bare integral,
    Decimal → TRY_CAST('digits' AS DECIMAL(38,18)) — classic PySpark
    infers every Python Decimal as DecimalType(38,18), so the string
    cast reproduces F.lit's value exactly for everything inside that
    type's range (beyond it, F.lit raised at construction where this
    yields NULL — strictly more graceful, same rejected row)."""
    if isinstance(value, bool):
        return E("TRUE" if value else "FALSE")
    if isinstance(value, str):
        return E(sql_str(value))
    if isinstance(value, int):
        return E(str(value))
    if isinstance(value, Decimal):
        return E(f"TRY_CAST({sql_str(_plain_decimal(value))} AS DECIMAL(38,18))")
    if value is None:
        return E("NULL")
    raise TypeError(f"unsupported literal {value!r}")  # pragma: no cover


def null(dtype: str) -> E:
    return E(f"CAST(NULL AS {dtype})")


class When(E):
    """F.when(...).when(...).otherwise(...) as CASE WHEN text. The
    fragment is always usable as a value (ELSE omitted ⇒ NULL, same as
    an un-otherwise'd Column when-chain)."""

    __slots__ = ("_pairs", "_else")

    def __init__(self, pairs, els: "E | None" = None):
        self._pairs = pairs
        self._else = els
        body = " ".join(f"WHEN {c.sql} THEN {v.sql}" for c, v in pairs)
        tail = f" ELSE {els.sql}" if els is not None else ""
        super().__init__(f"(CASE {body}{tail} END)")

    def when(self, cond: E, value) -> "When":
        if self._else is not None:  # pragma: no cover — mirrors Column
            raise ValueError("when() after otherwise()")
        return When(self._pairs + [(cond, _as_e(value))], None)

    def otherwise(self, value) -> "When":
        if self._else is not None:  # pragma: no cover
            raise ValueError("otherwise() twice")
        return When(self._pairs, _as_e(value))


def _as_e(v) -> E:
    return v if isinstance(v, E) else E(_operand(v))


def when(cond: E, value) -> When:
    return When([(cond, _as_e(value))], None)


def col(name: str) -> E:
    """Backtick-quoted column reference (F.col semantics for the plain
    top-level names the compiler resolves)."""
    return E("`" + name.replace("`", "``") + "`")


def fn(name: str, *args) -> E:
    return E(f"{name}({', '.join(_as_e(a).sql for a in args)})")


_LAMBDA_IDS = itertools.count()


def _lambda(pyfn, n_args: int) -> str:
    names = [f"_l{next(_LAMBDA_IDS)}_{i}" for i in range(n_args)]
    body = pyfn(*[E(nm) for nm in names])
    head = names[0] if n_args == 1 else "(" + ", ".join(names) + ")"
    return f"{head} -> {body.sql}"


def transform(arr: E, pyfn) -> E:
    return E(f"transform({arr.sql}, {_lambda(pyfn, 1)})")


def exists(arr: E, pyfn) -> E:
    return E(f"exists({arr.sql}, {_lambda(pyfn, 1)})")


def zip_with(a: E, b: E, pyfn) -> E:
    return E(f"zip_with({a.sql}, {b.sql}, {_lambda(pyfn, 2)})")


def aggregate(arr: E, init: E, pyfn) -> E:
    return E(f"aggregate({arr.sql}, {init.sql}, {_lambda(pyfn, 2)})")


def coalesce(*args: E) -> E:
    return fn("coalesce", *args)


def array(*args: E) -> E:
    return fn("array", *args)


def try_variant_get(v: E, path: str, dtype: str) -> E:
    return E(f"try_variant_get({v.sql}, {sql_str(path)}, {sql_str(dtype)})")


def regexp_replace(s: E, pattern: str, replacement: str) -> E:
    return E(f"regexp_replace({s.sql}, {sql_str(pattern)}, {sql_str(replacement)})")
