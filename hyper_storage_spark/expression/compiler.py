"""Compile expression ASTs to PySpark Columns.

The reference evaluates filter expressions row-at-a-time in the JVM
with an interpreted evaluator (HyperbusAdapter.scala:236-243). Here the
same expression becomes a Catalyst Column tree — whole-stage-codegen'd,
pushdown-eligible — with the reference's dynamic-typing semantics
preserved per row:

- every sub-expression is a :class:`DynCol`: a bundle of typed columns
  (string form, decimal form, boolean form) plus type-tag columns
  (``isnum``/``isbool``), because a schemaless body field's runtime
  type varies per row;
- ordering compares numerically only when BOTH sides are numbers,
  string-vs-string lexicographically, otherwise NULL (⇒ row rejected,
  matching eval-error⇒false);
- equality is typed: Number(10) ≠ Text("10");
- the top-level filter wraps in ``coalesce(..., false)`` so NULLs from
  missing fields / type mismatches reject the row.

Identifier resolution is pluggable: a resolver maps a dotted identifier
path to a DynCol. :func:`variant_resolver` resolves into a schemaless
JSON body column via Spark 4 VARIANT (``try_parse_json`` +
``try_variant_get``); :func:`typed_resolver` resolves against a typed
DataFrame's native columns (used for the oracle-checked queries over
parquet tables), optionally falling through to a JSON column for
unknown names.

r13 construction-cost rewrite (guide §1.2 "per-task work" applied to
the DRIVER, the r12 MinHash/ANN expression-string recipe): the bundle
members are now SQL-text fragments (:mod:`.sqlexpr`) instead of py4j
Column objects, and the finished filter crosses the Python↔JVM boundary
ONCE as ``F.expr(text)``. Building the same trees as Columns cost a
measured ~1,040 py4j roundtrips per compiled expression (~0.2 s quiet,
multiples under host noise) in the store's query/prepared-filter/index
paths; the text form is a handful. The EMITTED expressions are the
same Catalyst operators (CASE WHEN for when-chains, AND/OR/NOT, typed
casts), so analyzed plans and results are unchanged — pinned by the
differential corpus (tests/test_expression_differential.py), the
compiler tests, and the store oracle entries.
"""

from __future__ import annotations

from dataclasses import dataclass
from decimal import Decimal
from typing import Callable, Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import sqlexpr as S
from .ast_nodes import BinaryOp, Constant, Expression, FunctionCall, Identifier, UnaryOp
from .evaluator import EvalError, canonical_str
from .sqlexpr import E

DEC = "decimal(38,12)"


class CompileError(ValueError):
    """Expression uses a construct the Column compiler can't express;
    callers fall back to the Arrow-batched Python evaluator."""


@dataclass(eq=False)
class DynCol:
    """A dynamically-typed value as a bundle of typed expression
    fragments (SQL text — see the module docstring's r13 note).

    ``kind`` statically tags values whose runtime type is known
    ('num'/'str'/'bool'/'arr'; 'dyn' = per-row) so comparisons compile
    to direct column ops instead of the generic type-dispatch CASE —
    the difference between a 40-node and a 2000-node Catalyst tree."""

    s: E  # string form (NULL when value has none)
    n: E  # decimal(38,12) form (NULL unless isnum)
    isnum: E  # bool: value is a number
    isbool: E  # bool: value is a boolean
    bval: E  # boolean form (NULL unless isbool)
    arr: Optional[E] = None  # array<string> form when value is an array
    arrv: Optional[E] = None  # array<variant> form (typed element compare)
    obj: Optional[E] = None  # raw JSON text when value is an object
    isnull: Optional[E] = None  # value exists and is JSON null
    defined: Optional[E] = None  # value exists at all (vs missing field)
    kind: str = "dyn"  # 'num' | 'str' | 'bool' | 'arr' | 'null' | 'dyn'

    @property
    def isstr(self) -> E:
        return self.s.isNotNull() & ~self.isnum & ~self.isbool

    @property
    def isnull_c(self) -> E:
        return self.isnull if self.isnull is not None else S.lit(False)

    @property
    def defined_c(self) -> E:
        if self.defined is not None:
            return self.defined
        base = self.isnum | self.isbool | self.s.isNotNull()
        if self.arr is not None:
            base = base | self.arr.isNotNull()
        return base


Resolver = Callable[[str], DynCol]

def _false() -> E:
    return S.lit(False)


def _null_s() -> E:
    return S.null("string")


def _null_n() -> E:
    return S.null(DEC)


def _null_b() -> E:
    return S.null("boolean")


def _col_sql(c: Union[Column, E, str]) -> E:
    """SQL text of a caller-supplied column reference. Accepts a plain
    name (backtick-quoted), a ready fragment, or a real Column (whose
    Catalyst expression prints its own SQL — the one py4j roundtrip the
    text compiler still pays, once per resolver)."""
    if isinstance(c, E):
        return c
    if isinstance(c, str):
        return S.col(c)
    return E("(" + c._jc.node().sql() + ")")


def _bool_dyn(c: E) -> DynCol:
    # s must be NULL-preserving: .otherwise("false") would turn an
    # ERRORED comparison (NULL c) into the defined string "false",
    # which lower()/concat/equality then treat as a real value while
    # the evaluator rejects the row (EvalError)
    return DynCol(
        s=S.when(c, S.lit("true")).when(~c, S.lit("false")),
        n=_null_n(),
        isnum=_false(),
        isbool=c.isNotNull(),
        bval=c,
        kind="bool",
    )


def _num_dyn(n: E) -> DynCol:
    # the string form must be canonical ('2', not '2.000000000000') —
    # lower/upper/concat and string comparisons read it
    return DynCol(
        s=_canon_num_str(n), n=n, isnum=n.isNotNull(), isbool=_false(), bval=_null_b(), kind="num"
    )


def from_literal(value) -> DynCol:
    if value is None:
        return DynCol(
            s=_null_s(),
            n=_null_n(),
            isnum=_false(),
            isbool=_false(),
            bval=_null_b(),
            isnull=S.lit(True),
            defined=S.lit(True),
            kind="null",
        )
    if isinstance(value, bool):
        return DynCol(
            s=S.lit("true" if value else "false"),
            n=_null_n(),
            isnum=_false(),
            isbool=S.lit(True),
            bval=S.lit(value),
            kind="bool",
        )
    if isinstance(value, Decimal):
        return DynCol(
            s=S.lit(canonical_str(value)),
            n=S.lit(value).try_cast(DEC),
            isnum=S.lit(True),
            isbool=_false(),
            bval=_null_b(),
            kind="num",
        )
    if isinstance(value, str):
        return DynCol(
            s=S.lit(value), n=_null_n(), isnum=_false(), isbool=_false(), bval=_null_b(), kind="str"
        )
    if isinstance(value, tuple):
        return DynCol(
            s=_null_s(),
            n=_null_n(),
            isnum=_false(),
            isbool=_false(),
            bval=_null_b(),
            arr=S.array(*[S.lit(canonical_str(v)) for v in value]),
            kind="arr",
        )
    raise CompileError(f"unsupported literal {value!r}")


def _variant_raw_sql(v: E, path: str) -> E:
    """Raw JSON text of a variant field (the per-row type tag: first
    character distinguishes number/string/bool/null/array/object)."""
    return S.fn("to_json", S.try_variant_get(v, path, "variant"))


def variant_raw(v: Column, path: str) -> Column:
    return F.expr(_variant_raw_sql(_col_sql(v), path).sql)


def _variant_parts_sql(v: E, path: str, raw: Optional[E] = None) -> dict[str, E]:
    """The dynamic-typing bundle for one schemaless field — THE single
    definition of the engine's variant typing rules, shared by the
    resolver, the prepared-filter frame, index backfill, and dynamic
    sort keys (the Column face is :func:`variant_parts`). The string
    form is scalar-only (containers must not order/compare like
    strings)."""
    if raw is None:
        raw = _variant_raw_sql(v, path)
    isnum = raw.rlike(r"^-?[0-9]")
    isbool = raw.isin("true", "false")
    is_container = raw.startswith("[") | raw.startswith("{")
    num_form = S.when(isnum, S.try_variant_get(v, path, DEC)).otherwise(_null_n())
    return {
        "raw": raw,
        # numbers canonicalize ('2.0' → '2') so the string form agrees
        # with the evaluator's canonical_str wherever it's read
        "s": S.when(isnum, _canon_num_str(num_form)).when(
            ~is_container, S.try_variant_get(v, path, "string")
        ),
        "n": num_form,
        "isnum": S.coalesce(isnum, S.lit(False)),
        "isbool": S.coalesce(isbool, S.lit(False)),
        "bval": S.when(isbool, raw == "true").otherwise(_null_b()),
        "arr": S.when(raw.startswith("["), S.try_variant_get(v, path, "array<string>")),
        "arrv": S.when(raw.startswith("["), S.try_variant_get(v, path, "array<variant>")),
        "obj": S.when(raw.startswith("{"), raw),
        "isnull": S.coalesce(raw == "null", S.lit(False)),
        "defined": raw.isNotNull(),
    }


def variant_parts(v: Column, path: str, raw: Optional[Column] = None) -> dict[str, Column]:
    """Column face of the variant typing rules (consumed by index
    backfill / dynamic sort keys, which need real Columns to alias):
    the SQL-text bundle from :func:`_variant_parts_sql`, each field
    crossing py4j once as F.expr."""
    vs = _col_sql(v)
    raw_e = _col_sql(raw) if raw is not None else None
    return {k: F.expr(e.sql) for k, e in _variant_parts_sql(vs, path, raw_e).items()}


def dyncol_from_parts(p: dict[str, E]) -> DynCol:
    return DynCol(
        s=p["s"],
        n=p["n"],
        isnum=p["isnum"],
        isbool=p["isbool"],
        bval=p["bval"],
        arr=p["arr"],
        arrv=p["arrv"],
        obj=p["obj"],
        isnull=p["isnull"],
        defined=p["defined"],
    )


def variant_resolver(body_col: Union[Column, str]) -> Resolver:
    """Resolve identifiers as paths into a schemaless JSON body column.

    Uses VARIANT so the field's runtime JSON type is observable per row
    (the raw JSON text's first character tags numbers/strings/bools),
    mirroring the reference's binders Value dynamic typing. Resolved
    bundles are memoized per identifier: one filter referencing a field
    five times builds its typing bundle once.
    """
    v = E(f"try_parse_json({_col_sql(body_col).sql})")
    memo: dict[str, DynCol] = {}

    def resolve(name: str) -> DynCol:
        got = memo.get(name)
        if got is None:
            got = memo[name] = dyncol_from_parts(_variant_parts_sql(v, "$." + name))
        return got

    return resolve


_NUMERIC_PREFIXES = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal", "long")


def _canon_num_str(c: E) -> E:
    """Canonical string form of a numeric column, matching the
    evaluator's canonical_str: integral values print with no decimal
    point, others with trailing zeros stripped ('2.0' → '2',
    '3.50' → '3.5'). A plain cast-to-string would print '2.0' for
    doubles and '2.000000000000' for scaled decimals — neither equals
    what `has [2]` or string comparisons canonicalize to.

    Known divergence at extreme magnitudes: values finer than the
    decimal(38,12) scale (|x| < 1e-12) keep full precision
    evaluator-side but round here (the r12 canonical_str fix removed
    the older 1e-7 scientific-notation divergence), and |x| ≥ 1e26
    overflows the decimal(38,12) working type to NULL
    (try_cast, review r12 — a plain cast under Spark 4's default ANSI
    mode would ABORT the whole query on one out-of-range value
    instead of rejecting the row).
    The engine's numeric domain (money/quantities/counts) sits far
    inside both bounds; numeric COMPARISONS are unaffected (they use
    the decimal form, not the string form)."""
    s = c.try_cast(DEC).cast("string")
    s = S.regexp_replace(s, r"(\.\d*?)0+$", "$1")
    return S.regexp_replace(s, r"\.$", "")


def from_typed_column(col: Union[Column, E, str], dtype: str) -> DynCol:
    col = _col_sql(col)
    dtype = dtype.lower()
    isnull = col.isNull()
    defined = S.lit(True)
    if dtype.startswith(_NUMERIC_PREFIXES):
        return DynCol(
            s=_canon_num_str(col),
            n=col.try_cast(DEC),
            isnum=col.isNotNull(),
            isbool=_false(),
            bval=_null_b(),
            isnull=isnull,
            defined=defined,
            kind="num",
        )
    if dtype == "boolean":
        return DynCol(
            s=col.cast("string"),
            n=_null_n(),
            isnum=_false(),
            isbool=col.isNotNull(),
            bval=col,
            isnull=isnull,
            defined=defined,
            kind="bool",
        )
    if dtype.startswith("array"):
        elem = dtype[len("array<") : -1]
        if elem.startswith(_NUMERIC_PREFIXES):
            # element-wise canonical form: [2.0] must contain "2" (the
            # evaluator's canonical_str), not "2.0"
            arr = S.transform(col, _canon_num_str)
        elif elem == "boolean":
            # NULL elements stay NULL — otherwise('false') would make a
            # null element match `has [false]`, unlike the evaluator
            arr = S.transform(
                col,
                lambda x: S.when(x.isNull(), _null_s())
                .when(x, S.lit("true"))
                .otherwise(S.lit("false")),
            )
        else:
            arr = col.cast("array<string>")
        return DynCol(
            s=_null_s(),
            n=_null_n(),
            isnum=_false(),
            isbool=_false(),
            bval=_null_b(),
            arr=arr,
            isnull=isnull,
            defined=defined,
            kind="arr",
        )
    # string / timestamp / date / binary → string semantics
    return DynCol(
        s=col.cast("string"),
        n=_null_n(),
        isnum=_false(),
        isbool=_false(),
        bval=_null_b(),
        isnull=isnull,
        defined=defined,
        kind="str",
    )


def typed_resolver(df: DataFrame, json_col: Optional[str] = None) -> Resolver:
    """Resolve against a typed DataFrame's columns; unknown identifiers
    fall through to paths inside ``json_col`` (a JSON-string column).
    Memoized per identifier, like variant_resolver."""
    dtypes = dict(df.dtypes)
    json_resolver = variant_resolver(json_col) if json_col else None
    memo: dict[str, DynCol] = {}

    def resolve(name: str) -> DynCol:
        got = memo.get(name)
        if got is not None:
            return got
        root = name.split(".", 1)[0]
        if root in dtypes and "." not in name:
            got = from_typed_column(S.col(name), dtypes[name])
        elif json_resolver is not None:
            got = json_resolver(name)
        else:
            raise CompileError(f"unknown identifier {name!r}")
        memo[name] = got
        return got

    return resolve


def _truthy(d: DynCol) -> E:
    # every kind fast path must honor isnull first: the evaluator's
    # truthy(None) is False, so a present-but-null typed value is falsy
    # — NOT SQL-NULL (which would poison enclosing and/or into rejecting
    # rows the evaluator accepts, e.g. 'not nullcol').
    if d.kind == "bool":
        return S.when(d.isnull_c, S.lit(False)).otherwise(d.bval)
    if d.kind == "num":
        return S.when(d.isnull_c, S.lit(False)).otherwise(d.n != S.lit(0))
    if d.kind == "null":
        return S.lit(False)
    if d.kind == "arr":
        return S.when(d.isnull_c, S.lit(False)).otherwise(S.fn("size", d.arr) > S.lit(0))
    s_low = S.fn("lower", d.s)
    str_truth = (
        S.when(s_low.isin("true", "1", "y", "yes", "on"), S.lit(True))
        .when(s_low.isin("false", "0", "n", "no", "off"), S.lit(False))
        .otherwise(_null_b())
    )
    if d.kind == "str":
        return S.when(d.isnull_c, S.lit(False)).otherwise(str_truth)
    c = (
        S.when(d.isnull_c, S.lit(False))
        .when(d.isbool, d.bval)
        .when(d.isnum, d.n != S.lit(0))
        .otherwise(str_truth)
    )
    if d.arr is not None:
        c = S.when(~d.isnull_c & d.arr.isNotNull(), S.fn("size", d.arr) > S.lit(0)).otherwise(c)
    if d.obj is not None:
        # binders Value.asBoolean on Obj: non-empty is truthy (the
        # evaluator's len(dict) > 0); '{}' is the canonical empty form
        c = S.when(~d.isnull_c & d.obj.isNotNull(), d.obj != S.lit("{}")).otherwise(c)
    return c


_VALUED = {"num", "str", "bool"}


def _variant_elem_eq(x: E, y: E) -> E:
    """Typed equality of two VARIANT array elements (value_eq analog):
    numeric pairs compare as decimals, any other pair by raw JSON text
    (first character tags the type, so cross-type never matches; null
    elements compare equal as 'null' == 'null')."""
    xr, yr = S.fn("to_json", x), S.fn("to_json", y)
    xnum = xr.rlike(r"^-?[0-9]")
    ynum = yr.rlike(r"^-?[0-9]")
    return S.when(
        xnum & ynum,
        S.try_variant_get(x, "$", DEC) == S.try_variant_get(y, "$", DEC),
    ).otherwise(xr == yr)


def _eq(l: DynCol, r: DynCol) -> E:
    # fast paths: both runtime types known statically (typed values are
    # always defined; a NULL value compares equal only to null)
    if l.kind in _VALUED and r.kind in _VALUED:
        if l.kind != r.kind:
            # cross-kind is statically unequal EXCEPT both-null: two
            # present nulls are equal regardless of their columns'
            # declared types (evaluator value_eq(None, None) is True —
            # the dynamic path below gets this right; the static path
            # missed it until the round-5 differential corpus hit
            # `flag != a` with both cells NULL)
            return (
                S.when(l.isnull_c | r.isnull_c, l.isnull_c & r.isnull_c)
                # an ERRORED subexpression keeps its static kind but is
                # undefined — it must compare as NULL (row rejected),
                # not as defined-unequal (which != would flip to True)
                .when(l.defined_c & r.defined_c, S.lit(False))
                .otherwise(_null_b())
            )
        direct = {"num": l.n == r.n, "bool": l.bval == r.bval, "str": l.s == r.s}[l.kind]
        return S.when(l.isnull_c | r.isnull_c, l.isnull_c & r.isnull_c).otherwise(direct)
    # typed equality; present-but-null equals only null; cross-type is
    # unequal; a missing field yields NULL (row rejected at the top)
    c = (
        S.when(l.isnum & r.isnum, l.n == r.n)
        .when(l.isbool & r.isbool, l.bval == r.bval)
        .when(l.isstr & r.isstr, l.s == r.s)
    )
    if l.arrv is not None and r.arrv is not None:
        # variant arrays: TYPED per-element equality (evaluator
        # value_eq recursion) — the canonical-string array form would
        # call [1] equal to ["1"]. Numbers compare numerically (so
        # [2.0] == [2]); everything else compares by raw JSON, which
        # preserves the type tag in its first character.
        c = c.when(
            l.arrv.isNotNull() & r.arrv.isNotNull(),
            (S.fn("size", l.arrv) == S.fn("size", r.arrv))
            & S.aggregate(
                S.zip_with(l.arrv, r.arrv, _variant_elem_eq),
                S.lit(True),
                lambda acc, z: acc & z,
            ),
        )
    elif l.arr is not None and r.arr is not None:
        # typed array columns are homogeneous, so the canonical string
        # form compares exactly
        c = c.when(l.arr.isNotNull() & r.arr.isNotNull(), l.arr == r.arr)
    return (
        c.when(l.isnull_c & r.isnull_c, S.lit(True))
        .when(l.defined_c & r.defined_c, S.lit(False))
        .otherwise(_null_b())
    )


def _gt(l: DynCol, r: DynCol) -> E:
    if l.kind in _VALUED and r.kind in _VALUED:
        if l.kind == "num" and r.kind == "num":
            return l.n > r.n
        if l.kind == "str" and r.kind == "str":
            return l.s > r.s
        return _null_b()  # unorderable types ⇒ eval error ⇒ rejected
    return (
        S.when(l.isnum & r.isnum, l.n > r.n)
        .when(l.isstr & r.isstr, l.s > r.s)
        .otherwise(_null_b())
    )


def _arith(op: str, l: DynCol, r: DynCol) -> DynCol:
    # try_* variants: overflow / division-by-zero yields NULL (⇒ the
    # eval-error⇒rejected semantics) instead of an ANSI runtime error
    both_num = l.isnum & r.isnum
    if op == "+":
        # evaluator.py '+' domain, exactly: null operand propagates as a
        # *defined* null ONLY when the other operand is itself defined —
        # the evaluator evaluates both operands BEFORE '+', so a missing
        # identifier on either side is an eval error no matter what the
        # other side holds (round-5 differential find: null + missing
        # wrongly produced a defined null, which a comparison then
        # turned into a defined False that an enclosing `or` rescued —
        # the evaluator rejects the row). String + (string|number|bool)
        # concatenates the canonical forms; number + number adds;
        # anything else (bool arithmetic, containers) is an eval error
        # (undefined ⇒ reject).
        def concat_ok(d: DynCol) -> E:
            return d.isstr | d.isnum | d.isbool

        both_defined = l.defined_c & r.defined_c
        isnull_res = S.coalesce(both_defined & (l.isnull_c | r.isnull_c), _false())
        concat_case = ~isnull_res & (l.isstr | r.isstr) & concat_ok(l) & concat_ok(r)
        n = S.when(both_num, S.fn("try_add", l.n, r.n))
        # canonical, not cast("string"): '2', never '2.000000000000'
        s = S.when(both_num, _canon_num_str(n)).when(concat_case, S.fn("concat", l.s, r.s))
        return DynCol(
            s=s,
            n=n,
            isnum=S.coalesce(both_num, _false()),
            isbool=_false(),
            bval=_null_b(),
            isnull=isnull_res,
            defined=S.coalesce(isnull_res | both_num | concat_case, _false()),
        )
    if op == "-":
        n = S.when(both_num, S.fn("try_subtract", l.n, r.n))
    elif op == "*":
        n = S.when(both_num, S.fn("try_multiply", l.n, r.n))
    elif op == "/":
        n = S.when(both_num, S.fn("try_divide", l.n, r.n))
    elif op == "%":
        n = S.when(both_num, S.fn("try_mod", l.n, r.n))
    else:  # pragma: no cover
        raise CompileError(f"unknown arithmetic op {op!r}")
    return _num_dyn(n)


def _typed_contains(arrv: E, value) -> E:
    """value ∈ variant array, with the evaluator's TYPED value_eq per
    element — canonical-string array_contains would call Number(1) a
    member of ["1"]."""
    import json as _json

    if isinstance(value, bool):
        return S.exists(
            arrv, lambda x: S.fn("to_json", x) == S.lit("true" if value else "false")
        )
    if value is None:
        return S.exists(arrv, lambda x: S.fn("to_json", x) == S.lit("null"))
    if isinstance(value, str):
        # ensure_ascii=False: Spark/Jackson to_json emits raw UTF-8,
        # Python's default \uXXXX escaping would never match non-ASCII
        return S.exists(
            arrv,
            lambda x: S.fn("to_json", x) == S.lit(_json.dumps(value, ensure_ascii=False)),
        )
    dv = value if isinstance(value, Decimal) else Decimal(str(value))
    return S.exists(
        arrv,
        lambda x: S.fn("to_json", x).rlike(r"^-?[0-9]")
        & (S.try_variant_get(x, "$", DEC) == S.lit(dv)),
    )


def _has(l: DynCol, r_expr: Expression) -> E:
    if not isinstance(r_expr, Constant):
        raise CompileError("'has' requires a constant right-hand side to compile")
    rv = r_expr.value
    elems = list(rv) if isinstance(rv, tuple) else [rv]
    if l.arr is None:
        # no array form: only string-contains is possible
        if isinstance(rv, str):
            return S.when(l.isstr, l.s.contains(rv)).otherwise(_null_b())
        raise CompileError("'has' on a non-array value")
    arr_check = S.lit(True)
    if l.arrv is not None:
        for e in elems:
            arr_check = arr_check & _typed_contains(l.arrv, e)
    else:
        # typed array columns are homogeneous: canonical-string
        # membership is exact
        for e in elems:
            arr_check = arr_check & S.fn("array_contains", l.arr, S.lit(canonical_str(e)))
    if isinstance(rv, str):
        str_check = S.when(l.isstr, l.s.contains(rv)).otherwise(_null_b())
    else:
        str_check = _null_b()
    return S.when(l.arr.isNotNull(), arr_check).otherwise(str_check)


def compile_dyn(node: Expression, resolve: Resolver) -> DynCol:
    if isinstance(node, Constant):
        return from_literal(node.value)
    if isinstance(node, Identifier):
        return resolve(node.name)
    if isinstance(node, UnaryOp):
        arg = compile_dyn(node.arg, resolve)
        if node.op == "not":
            return _bool_dyn(~_truthy(arg))
        if node.op == "-":
            return _num_dyn(S.when(arg.isnum, -arg.n))
        raise CompileError(f"unknown unary op {node.op!r}")
    if isinstance(node, BinaryOp):
        op = node.op
        # strict logical ops, NOT SQL three-valued logic: an eval error
        # (NULL) in the left operand poisons the result, matching the
        # evaluator's left-to-right short-circuit + error propagation
        if op == "and":
            lb = _truthy(compile_dyn(node.left, resolve))
            rb = _truthy(compile_dyn(node.right, resolve))
            return _bool_dyn(
                S.when(lb.isNull(), _null_b()).when(~lb, S.lit(False)).otherwise(rb)
            )
        if op == "or":
            lb = _truthy(compile_dyn(node.left, resolve))
            rb = _truthy(compile_dyn(node.right, resolve))
            return _bool_dyn(S.when(lb, S.lit(True)).when(lb.isNull(), _null_b()).otherwise(rb))
        l = compile_dyn(node.left, resolve)
        if op == "has":
            return _bool_dyn(_has(l, node.right))
        if op == "has not":
            return _bool_dyn(~_has(l, node.right))
        r = compile_dyn(node.right, resolve)
        if op == "=":
            return _bool_dyn(_eq(l, r))
        if op == "!=":
            return _bool_dyn(~_eq(l, r))
        if op == ">":
            return _bool_dyn(_gt(l, r))
        if op == "<":
            return _bool_dyn(_gt(r, l))
        if op == ">=":
            return _bool_dyn(_eq(l, r) | _gt(l, r))
        if op == "<=":
            return _bool_dyn(_eq(l, r) | _gt(r, l))
        if op in ("+", "-", "*", "/", "%"):
            return _arith(op, l, r)
        raise CompileError(f"unknown binary op {op!r}")
    if isinstance(node, FunctionCall):
        args = [compile_dyn(a, resolve) for a in node.args]
        if node.name == "length" and len(args) == 1:
            # evaluator: len() of a string or array; numbers/bools are
            # an eval error (⇒ NULL here ⇒ row rejected) — counting the
            # canonical string form of a number would diverge
            a = args[0]
            n = S.when(a.isstr, S.fn("length", a.s).cast(DEC))
            if a.arr is not None:
                n = S.when(a.arr.isNotNull(), S.fn("size", a.arr).cast(DEC)).otherwise(n)
            return _num_dyn(n)
        if node.name in ("lower", "upper") and len(args) == 1:
            # present-but-null canonicalizes to '' (evaluator
            # canonical_str(None)); a MISSING identifier keeps NULL ⇒
            # the enclosing comparison rejects, like the evaluator's
            # identifier-not-found error
            a = args[0]
            s_in = S.when(a.isnull_c, S.lit("")).otherwise(a.s)
            out = S.fn("lower", s_in) if node.name == "lower" else S.fn("upper", s_in)
            return DynCol(s=out, n=_null_n(), isnum=_false(), isbool=_false(), bval=_null_b())
        if node.name == "abs" and len(args) == 1:
            return _num_dyn(S.when(args[0].isnum, S.fn("abs", args[0].n)))
        if node.name == "round" and len(args) == 1:
            # evaluator: Decimal.to_integral_value() = banker's rounding
            # (HALF_EVEN) — Spark's bround, NOT round (HALF_UP)
            return _num_dyn(S.when(args[0].isnum, S.fn("bround", args[0].n).cast(DEC)))
        raise CompileError(f"unknown function {node.name!r}")
    raise CompileError(f"unknown node {node!r}")


def compile_filter_sql(node: Expression, resolve: Resolver) -> str:
    """The compiled filter as SQL text (eval-error⇒false semantics) —
    the zero-roundtrip face, for callers that assemble bigger texts."""
    return S.coalesce(_truthy(compile_dyn(node, resolve)), S.lit(False)).sql


def compile_filter(node: Expression, resolve: Resolver) -> Column:
    """Compile to a boolean Column with eval-error⇒false semantics."""
    return F.expr(compile_filter_sql(node, resolve))


def compile_filter_str(text: str, resolve: Resolver) -> Column:
    from .parser import parse

    return compile_filter(parse(text), resolve)


def split_conjuncts(node: Expression) -> list:
    """Top-level AND chain → list of conjuncts. Filter-equivalent to
    the whole expression: the DSL's ``and`` passes a row iff BOTH
    sides are independently truthy-true (error/null on either side
    rejects, same as each side's own error⇒false coalesce), so
    ``filter(a and b)`` ≡ ``filter(a).filter(b)``. Splitting lets
    Catalyst push cheap typed-column conjuncts into the scan instead
    of hiding them inside one opaque CASE tree."""
    if isinstance(node, BinaryOp) and node.op == "and":
        return split_conjuncts(node.left) + split_conjuncts(node.right)
    return [node]


def collect_identifiers(node: Expression) -> set[str]:
    if isinstance(node, Identifier):
        return {node.name}
    if isinstance(node, UnaryOp):
        return collect_identifiers(node.arg)
    if isinstance(node, BinaryOp):
        return collect_identifiers(node.left) | collect_identifiers(node.right)
    if isinstance(node, FunctionCall):
        out: set[str] = set()
        for a in node.args:
            out |= collect_identifiers(a)
        return out
    return set()


def apply_filter(
    df: DataFrame, expression, json_col: Optional[str] = None, json_only: bool = False
) -> DataFrame:
    """Apply an expression-language filter to a DataFrame efficiently.

    Identifiers matching typed columns resolve directly; the rest
    resolve into ``json_col`` (a schemaless JSON string column). The
    JSON identifiers' base values are **pre-projected once per row**
    (variant parse + field extraction materialized as helper columns)
    instead of being re-evaluated at every reference inside the filter
    tree — Catalyst's CollapseProject keeps expensive multi-referenced
    aliases materialized, so this turns O(references) JSON parses per
    row into one.
    """
    from .parser import parse as _parse

    ast = _parse(expression) if isinstance(expression, str) else expression
    names = sorted(collect_identifiers(ast))
    dtypes = dict(df.dtypes)
    if json_only:
        json_names = list(names)  # schemaless body: never resolve to table columns
    else:
        json_names = [n for n in names if n.split(".", 1)[0] not in dtypes or "." in n]
    if json_names and json_col is None:
        raise CompileError(f"identifiers {json_names} need a json_col")

    dyncols: dict[str, DynCol] = {}
    if json_names:
        # three projection layers so the expensive pieces materialize
        # once each: (1) variant parse, (2) per-identifier raw JSON
        # text, (3) typed forms referencing the materialized columns
        vcol = "__hs_v"
        df = df.withColumns({vcol: F.expr(f"try_parse_json({S.col(json_col).sql})")})
        raws: dict[str, Column] = {}
        for i, name in enumerate(json_names):
            raws[f"__hs_raw_{i}"] = F.expr(
                _variant_raw_sql(S.col(vcol), "$." + name).sql
            )
        df = df.withColumns(raws)
        base: dict[str, Column] = {}
        parts = []  # one bundle per identifier, shared by both loops
        for i, name in enumerate(json_names):
            p = _variant_parts_sql(S.col(vcol), "$." + name, raw=S.col(f"__hs_raw_{i}"))
            parts.append(p)
            base[f"__hs_s_{i}"] = F.expr(p["s"].sql)
            base[f"__hs_n_{i}"] = F.expr(p["n"].sql)
            base[f"__hs_arr_{i}"] = F.expr(p["arr"].sql)
        df = df.withColumns(base)
        for i, name in enumerate(json_names):
            p = parts[i]
            dyncols[name] = DynCol(
                s=S.col(f"__hs_s_{i}"),
                n=S.col(f"__hs_n_{i}"),
                isnum=p["isnum"],
                isbool=p["isbool"],
                bval=p["bval"],
                arr=S.col(f"__hs_arr_{i}"),
                arrv=p["arrv"],
                obj=p["obj"],
                isnull=p["isnull"],
                defined=p["defined"],
            )
        drop = [vcol] + list(raws) + list(base)
    else:
        drop = []

    def resolve(name: str) -> DynCol:
        if name in dyncols:
            return dyncols[name]
        return from_typed_column(S.col(name), dtypes[name])

    # top-level AND conjuncts apply as separate filters, typed-column
    # conjuncts first: Catalyst pushes those into the parquet scan
    # (predicate pushdown + row-group pruning) and the JSON machinery
    # then runs only on surviving rows — at 100 TB the difference
    # between parsing every row's JSON and only the matching slice
    out = df
    conjuncts = split_conjuncts(ast)
    conjuncts.sort(key=lambda c: bool(collect_identifiers(c) & set(dyncols)))
    for c in conjuncts:
        native = _pushable_form(c, dyncols, dtypes)
        out = out.filter(native if native is not None else compile_filter(c, resolve))
    return out.drop(*drop) if drop else out


_PUSH_FLIP = {"=": "=", "!=": "!=", ">": "<", "<": ">", ">=": "<=", "<=": ">="}
_INT_TYPES = ("tinyint", "smallint", "int", "bigint")


def _pushable_form(c, dyncols: dict, dtypes: dict) -> Optional[Column]:
    """Native-Catalyst form of a ``typed-column op constant`` conjunct,
    or None. The DSL's CASE tree is opaque to the parquet source's
    predicate translator; a plain ``col op lit`` pushes into the scan.
    Only emitted where semantics provably coincide with the DSL:
    same-typed comparisons (string col ↔ string const, integral col ↔
    integral const), where both orders are the same (UTF-8 binary for
    strings == the evaluator's codepoint order; integer compare is
    exact on both). NULL cells: the DSL rejects them for = and every
    ordering (same as a SQL null-rejecting filter), but its TYPED
    inequality calls a present null UNEQUAL to any non-null constant
    — the row PASSES — so != compiles to ``isNull() | (col != lit)``
    (still one pushable Or of source filters), not bare ``!=``."""
    if not isinstance(c, BinaryOp) or c.op not in _PUSH_FLIP:
        return None
    l, r, op = c.left, c.right, c.op
    if isinstance(l, Constant) and isinstance(r, Identifier):
        l, r, op = r, l, _PUSH_FLIP[op]
    if not (isinstance(l, Identifier) and isinstance(r, Constant)):
        return None
    if l.name in dyncols or l.name not in dtypes:
        return None  # JSON-resolved identifier: the Dyn machinery owns it
    dt, v = dtypes[l.name], r.value
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, str):
        if dt != "string":
            return None
    elif isinstance(v, Decimal):
        # integral constants vs integral columns compare exactly; a
        # fractional constant or a float/decimal column would hit the
        # DSL's decimal(38,12) rounding, which native compare lacks
        if dt not in _INT_TYPES or v != v.to_integral_value():
            return None
        v = int(v)
    else:
        return None
    col, lit = F.col(l.name), F.lit(v)
    return {
        "=": col == lit,
        "!=": col.isNull() | (col != lit),
        ">": col > lit,
        "<": col < lit,
        ">=": col >= lit,
        "<=": col <= lit,
    }[op]
