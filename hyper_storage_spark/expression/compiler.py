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
"""

from __future__ import annotations

from dataclasses import dataclass
from decimal import Decimal
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ast_nodes import BinaryOp, Constant, Expression, FunctionCall, Identifier, UnaryOp
from .evaluator import EvalError, canonical_str

DEC = "decimal(38,12)"


class CompileError(ValueError):
    """Expression uses a construct the Column compiler can't express;
    callers fall back to the Arrow-batched Python evaluator."""


@dataclass
class DynCol:
    """A dynamically-typed value as a bundle of typed columns.

    ``kind`` statically tags values whose runtime type is known
    ('num'/'str'/'bool'/'arr'; 'dyn' = per-row) so comparisons compile
    to direct column ops instead of the generic type-dispatch CASE —
    the difference between a 40-node and a 2000-node Catalyst tree."""

    s: Column  # string form (NULL when value has none)
    n: Column  # decimal(38,12) form (NULL unless isnum)
    isnum: Column  # bool: value is a number
    isbool: Column  # bool: value is a boolean
    bval: Column  # boolean form (NULL unless isbool)
    arr: Optional[Column] = None  # array<string> form when value is an array
    arrv: Optional[Column] = None  # array<variant> form (typed element compare)
    obj: Optional[Column] = None  # raw JSON text when value is an object
    isnull: Optional[Column] = None  # value exists and is JSON null
    defined: Optional[Column] = None  # value exists at all (vs missing field)
    kind: str = "dyn"  # 'num' | 'str' | 'bool' | 'arr' | 'null' | 'dyn'

    @property
    def isstr(self) -> Column:
        return self.s.isNotNull() & ~self.isnum & ~self.isbool

    @property
    def isnull_c(self) -> Column:
        return self.isnull if self.isnull is not None else F.lit(False)

    @property
    def defined_c(self) -> Column:
        if self.defined is not None:
            return self.defined
        base = self.isnum | self.isbool | self.s.isNotNull()
        if self.arr is not None:
            base = base | self.arr.isNotNull()
        return base


Resolver = Callable[[str], DynCol]

def _false() -> Column:
    return F.lit(False)


def _null_s() -> Column:
    return F.lit(None).cast("string")


def _null_n() -> Column:
    return F.lit(None).cast(DEC)


def _null_b() -> Column:
    return F.lit(None).cast("boolean")


def _bool_dyn(c: Column) -> DynCol:
    # s must be NULL-preserving: .otherwise("false") would turn an
    # ERRORED comparison (NULL c) into the defined string "false",
    # which lower()/concat/equality then treat as a real value while
    # the evaluator rejects the row (EvalError)
    return DynCol(
        s=F.when(c, F.lit("true")).when(~c, F.lit("false")),
        n=_null_n(),
        isnum=_false(),
        isbool=c.isNotNull(),
        bval=c,
        kind="bool",
    )


def _num_dyn(n: Column) -> DynCol:
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
            isnull=F.lit(True),
            defined=F.lit(True),
            kind="null",
        )
    if isinstance(value, bool):
        return DynCol(
            s=F.lit("true" if value else "false"),
            n=_null_n(),
            isnum=_false(),
            isbool=F.lit(True),
            bval=F.lit(value),
            kind="bool",
        )
    if isinstance(value, Decimal):
        return DynCol(
            s=F.lit(canonical_str(value)),
            n=F.lit(value).try_cast(DEC),
            isnum=F.lit(True),
            isbool=_false(),
            bval=_null_b(),
            kind="num",
        )
    if isinstance(value, str):
        return DynCol(
            s=F.lit(value), n=_null_n(), isnum=_false(), isbool=_false(), bval=_null_b(), kind="str"
        )
    if isinstance(value, tuple):
        return DynCol(
            s=_null_s(),
            n=_null_n(),
            isnum=_false(),
            isbool=_false(),
            bval=_null_b(),
            arr=F.array(*[F.lit(canonical_str(v)) for v in value]),
            kind="arr",
        )
    raise CompileError(f"unsupported literal {value!r}")


def variant_raw(v: Column, path: str) -> Column:
    """Raw JSON text of a variant field (the per-row type tag: first
    character distinguishes number/string/bool/null/array/object)."""
    return F.to_json(F.try_variant_get(v, path, "variant"))


def variant_parts(v: Column, path: str, raw: Optional[Column] = None) -> dict[str, Column]:
    """The dynamic-typing column bundle for one schemaless field —
    THE single definition of the engine's variant typing rules, shared
    by the resolver, the prepared-filter frame, index backfill, and
    dynamic sort keys. The string form is scalar-only (containers must
    not order/compare like strings)."""
    if raw is None:
        raw = variant_raw(v, path)
    isnum = raw.rlike(r"^-?[0-9]")
    isbool = raw.isin("true", "false")
    is_container = raw.startswith("[") | raw.startswith("{")
    num_form = F.when(isnum, F.try_variant_get(v, path, DEC)).otherwise(_null_n())
    return {
        "raw": raw,
        # numbers canonicalize ('2.0' → '2') so the string form agrees
        # with the evaluator's canonical_str wherever it's read
        "s": F.when(isnum, _canon_num_str(num_form)).otherwise(
            F.when(~is_container, F.try_variant_get(v, path, "string"))
        ),
        "n": num_form,
        "isnum": F.coalesce(isnum, F.lit(False)),
        "isbool": F.coalesce(isbool, F.lit(False)),
        "bval": F.when(isbool, raw == "true").otherwise(_null_b()),
        "arr": F.when(raw.startswith("["), F.try_variant_get(v, path, "array<string>")),
        "arrv": F.when(raw.startswith("["), F.try_variant_get(v, path, "array<variant>")),
        "obj": F.when(raw.startswith("{"), raw),
        "isnull": F.coalesce(raw == "null", F.lit(False)),
        "defined": raw.isNotNull(),
    }


def dyncol_from_parts(p: dict[str, Column]) -> DynCol:
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


def variant_resolver(body_col: Column) -> Resolver:
    """Resolve identifiers as paths into a schemaless JSON body column.

    Uses VARIANT so the field's runtime JSON type is observable per row
    (the raw JSON text's first character tags numbers/strings/bools),
    mirroring the reference's binders Value dynamic typing.
    """
    v = F.try_parse_json(body_col)

    def resolve(name: str) -> DynCol:
        return dyncol_from_parts(variant_parts(v, "$." + name))

    return resolve


_NUMERIC_PREFIXES = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal", "long")


def _canon_num_str(c: Column) -> Column:
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
    s = F.regexp_replace(s, r"(\.\d*?)0+$", "$1")
    return F.regexp_replace(s, r"\.$", "")


def from_typed_column(col: Column, dtype: str) -> DynCol:
    dtype = dtype.lower()
    isnull = col.isNull()
    defined = F.lit(True)
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
            arr = F.transform(col, _canon_num_str)
        elif elem == "boolean":
            # NULL elements stay NULL — otherwise('false') would make a
            # null element match `has [false]`, unlike the evaluator
            arr = F.transform(
                col, lambda x: F.when(x.isNull(), _null_s()).when(x, "true").otherwise("false")
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
    fall through to paths inside ``json_col`` (a JSON-string column)."""
    dtypes = dict(df.dtypes)
    json_resolver = variant_resolver(F.col(json_col)) if json_col else None

    def resolve(name: str) -> DynCol:
        root = name.split(".", 1)[0]
        if root in dtypes and "." not in name:
            return from_typed_column(F.col(name), dtypes[name])
        if json_resolver is not None:
            return json_resolver(name)
        raise CompileError(f"unknown identifier {name!r}")

    return resolve


def _truthy(d: DynCol) -> Column:
    # every kind fast path must honor isnull first: the evaluator's
    # truthy(None) is False, so a present-but-null typed value is falsy
    # — NOT SQL-NULL (which would poison enclosing and/or into rejecting
    # rows the evaluator accepts, e.g. 'not nullcol').
    if d.kind == "bool":
        return F.when(d.isnull_c, F.lit(False)).otherwise(d.bval)
    if d.kind == "num":
        return F.when(d.isnull_c, F.lit(False)).otherwise(d.n != F.lit(0))
    if d.kind == "null":
        return F.lit(False)
    if d.kind == "arr":
        return F.when(d.isnull_c, F.lit(False)).otherwise(F.size(d.arr) > 0)
    s_low = F.lower(d.s)
    str_truth = (
        F.when(s_low.isin("true", "1", "y", "yes", "on"), F.lit(True))
        .when(s_low.isin("false", "0", "n", "no", "off"), F.lit(False))
        .otherwise(_null_b())
    )
    if d.kind == "str":
        return F.when(d.isnull_c, F.lit(False)).otherwise(str_truth)
    c = (
        F.when(d.isnull_c, F.lit(False))
        .when(d.isbool, d.bval)
        .when(d.isnum, d.n != F.lit(0))
        .otherwise(str_truth)
    )
    if d.arr is not None:
        c = F.when(~d.isnull_c & d.arr.isNotNull(), F.size(d.arr) > 0).otherwise(c)
    if d.obj is not None:
        # binders Value.asBoolean on Obj: non-empty is truthy (the
        # evaluator's len(dict) > 0); '{}' is the canonical empty form
        c = F.when(~d.isnull_c & d.obj.isNotNull(), d.obj != F.lit("{}")).otherwise(c)
    return c


_VALUED = {"num", "str", "bool"}


def _variant_elem_eq(x: Column, y: Column) -> Column:
    """Typed equality of two VARIANT array elements (value_eq analog):
    numeric pairs compare as decimals, any other pair by raw JSON text
    (first character tags the type, so cross-type never matches; null
    elements compare equal as 'null' == 'null')."""
    xr, yr = F.to_json(x), F.to_json(y)
    xnum = xr.rlike(r"^-?[0-9]")
    ynum = yr.rlike(r"^-?[0-9]")
    return F.when(
        xnum & ynum,
        F.try_variant_get(x, "$", DEC) == F.try_variant_get(y, "$", DEC),
    ).otherwise(xr == yr)


def _eq(l: DynCol, r: DynCol) -> Column:
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
                F.when(l.isnull_c | r.isnull_c, l.isnull_c & r.isnull_c)
                # an ERRORED subexpression keeps its static kind but is
                # undefined — it must compare as NULL (row rejected),
                # not as defined-unequal (which != would flip to True)
                .when(l.defined_c & r.defined_c, F.lit(False))
                .otherwise(_null_b())
            )
        direct = {"num": l.n == r.n, "bool": l.bval == r.bval, "str": l.s == r.s}[l.kind]
        return F.when(l.isnull_c | r.isnull_c, l.isnull_c & r.isnull_c).otherwise(direct)
    # typed equality; present-but-null equals only null; cross-type is
    # unequal; a missing field yields NULL (row rejected at the top)
    c = (
        F.when(l.isnum & r.isnum, l.n == r.n)
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
            (F.size(l.arrv) == F.size(r.arrv))
            & F.aggregate(
                F.zip_with(l.arrv, r.arrv, _variant_elem_eq),
                F.lit(True),
                lambda acc, z: acc & z,
            ),
        )
    elif l.arr is not None and r.arr is not None:
        # typed array columns are homogeneous, so the canonical string
        # form compares exactly
        c = c.when(l.arr.isNotNull() & r.arr.isNotNull(), l.arr == r.arr)
    return (
        c.when(l.isnull_c & r.isnull_c, F.lit(True))
        .when(l.defined_c & r.defined_c, F.lit(False))
        .otherwise(_null_b())
    )


def _gt(l: DynCol, r: DynCol) -> Column:
    if l.kind in _VALUED and r.kind in _VALUED:
        if l.kind == "num" and r.kind == "num":
            return l.n > r.n
        if l.kind == "str" and r.kind == "str":
            return l.s > r.s
        return _null_b()  # unorderable types ⇒ eval error ⇒ rejected
    return (
        F.when(l.isnum & r.isnum, l.n > r.n)
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
        def concat_ok(d: DynCol) -> Column:
            return d.isstr | d.isnum | d.isbool

        both_defined = l.defined_c & r.defined_c
        isnull_res = F.coalesce(both_defined & (l.isnull_c | r.isnull_c), _false())
        concat_case = ~isnull_res & (l.isstr | r.isstr) & concat_ok(l) & concat_ok(r)
        n = F.when(both_num, F.try_add(l.n, r.n))
        # canonical, not cast("string"): '2', never '2.000000000000'
        s = F.when(both_num, _canon_num_str(n)).when(concat_case, F.concat(l.s, r.s))
        return DynCol(
            s=s,
            n=n,
            isnum=F.coalesce(both_num, _false()),
            isbool=_false(),
            bval=_null_b(),
            isnull=isnull_res,
            defined=F.coalesce(isnull_res | both_num | concat_case, _false()),
        )
    if op == "-":
        n = F.when(both_num, F.try_subtract(l.n, r.n))
    elif op == "*":
        n = F.when(both_num, F.try_multiply(l.n, r.n))
    elif op == "/":
        n = F.when(both_num, F.try_divide(l.n, r.n))
    elif op == "%":
        n = F.when(both_num, F.try_mod(l.n, r.n))
    else:  # pragma: no cover
        raise CompileError(f"unknown arithmetic op {op!r}")
    return _num_dyn(n)


def _typed_contains(arrv: Column, value) -> Column:
    """value ∈ variant array, with the evaluator's TYPED value_eq per
    element — canonical-string array_contains would call Number(1) a
    member of ["1"]."""
    import json as _json

    if isinstance(value, bool):
        return F.exists(arrv, lambda x: F.to_json(x) == F.lit("true" if value else "false"))
    if value is None:
        return F.exists(arrv, lambda x: F.to_json(x) == F.lit("null"))
    if isinstance(value, str):
        # ensure_ascii=False: Spark/Jackson to_json emits raw UTF-8,
        # Python's default \uXXXX escaping would never match non-ASCII
        return F.exists(
            arrv, lambda x: F.to_json(x) == F.lit(_json.dumps(value, ensure_ascii=False))
        )
    dv = value if isinstance(value, Decimal) else Decimal(str(value))
    return F.exists(
        arrv,
        lambda x: F.to_json(x).rlike(r"^-?[0-9]")
        & (F.try_variant_get(x, "$", DEC) == F.lit(dv)),
    )


def _has(l: DynCol, r_expr: Expression) -> Column:
    if not isinstance(r_expr, Constant):
        raise CompileError("'has' requires a constant right-hand side to compile")
    rv = r_expr.value
    elems = list(rv) if isinstance(rv, tuple) else [rv]
    if l.arr is None:
        # no array form: only string-contains is possible
        if isinstance(rv, str):
            return F.when(l.isstr, l.s.contains(rv)).otherwise(_null_b())
        raise CompileError("'has' on a non-array value")
    arr_check = F.lit(True)
    if l.arrv is not None:
        for e in elems:
            arr_check = arr_check & _typed_contains(l.arrv, e)
    else:
        # typed array columns are homogeneous: canonical-string
        # membership is exact
        for e in elems:
            arr_check = arr_check & F.array_contains(l.arr, canonical_str(e))
    if isinstance(rv, str):
        str_check = F.when(l.isstr, l.s.contains(rv)).otherwise(_null_b())
    else:
        str_check = _null_b()
    return F.when(l.arr.isNotNull(), arr_check).otherwise(str_check)


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
            return _num_dyn(F.when(arg.isnum, -arg.n))
        raise CompileError(f"unknown unary op {node.op!r}")
    if isinstance(node, BinaryOp):
        op = node.op
        # strict logical ops, NOT SQL three-valued logic: an eval error
        # (NULL) in the left operand poisons the result, matching the
        # evaluator's left-to-right short-circuit + error propagation
        if op == "and":
            lb = _truthy(compile_dyn(node.left, resolve))
            rb = _truthy(compile_dyn(node.right, resolve))
            return _bool_dyn(F.when(lb.isNull(), _null_b()).when(~lb, F.lit(False)).otherwise(rb))
        if op == "or":
            lb = _truthy(compile_dyn(node.left, resolve))
            rb = _truthy(compile_dyn(node.right, resolve))
            return _bool_dyn(F.when(lb, F.lit(True)).when(lb.isNull(), _null_b()).otherwise(rb))
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
            n = F.when(a.isstr, F.length(a.s).cast(DEC))
            if a.arr is not None:
                n = F.when(a.arr.isNotNull(), F.size(a.arr).cast(DEC)).otherwise(n)
            return _num_dyn(n)
        if node.name in ("lower", "upper") and len(args) == 1:
            # present-but-null canonicalizes to '' (evaluator
            # canonical_str(None)); a MISSING identifier keeps NULL ⇒
            # the enclosing comparison rejects, like the evaluator's
            # identifier-not-found error
            a = args[0]
            s_in = F.when(a.isnull_c, F.lit("")).otherwise(a.s)
            out = F.lower(s_in) if node.name == "lower" else F.upper(s_in)
            return DynCol(s=out, n=_null_n(), isnum=_false(), isbool=_false(), bval=_null_b())
        if node.name == "abs" and len(args) == 1:
            return _num_dyn(F.when(args[0].isnum, F.abs(args[0].n)))
        if node.name == "round" and len(args) == 1:
            # evaluator: Decimal.to_integral_value() = banker's rounding
            # (HALF_EVEN) — Spark's bround, NOT round (HALF_UP)
            return _num_dyn(F.when(args[0].isnum, F.bround(args[0].n).cast(DEC)))
        raise CompileError(f"unknown function {node.name!r}")
    raise CompileError(f"unknown node {node!r}")


def compile_filter(node: Expression, resolve: Resolver) -> Column:
    """Compile to a boolean Column with eval-error⇒false semantics."""
    return F.coalesce(_truthy(compile_dyn(node, resolve)), _false())


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
        df = df.withColumns({vcol: F.try_parse_json(F.col(json_col))})
        raws: dict[str, Column] = {}
        for i, name in enumerate(json_names):
            raws[f"__hs_raw_{i}"] = F.to_json(
                F.try_variant_get(F.col(vcol), "$." + name, "variant")
            )
        df = df.withColumns(raws)
        base: dict[str, Column] = {}
        parts = []  # one bundle per identifier, shared by both loops
        for i, name in enumerate(json_names):
            p = variant_parts(F.col(vcol), "$." + name, raw=F.col(f"__hs_raw_{i}"))
            parts.append(p)
            base[f"__hs_s_{i}"] = p["s"]
            base[f"__hs_n_{i}"] = p["n"]
            base[f"__hs_arr_{i}"] = p["arr"]
        df = df.withColumns(base)
        for i, name in enumerate(json_names):
            p = parts[i]
            dyncols[name] = DynCol(
                s=F.col(f"__hs_s_{i}"),
                n=F.col(f"__hs_n_{i}"),
                isnum=p["isnum"],
                isbool=p["isbool"],
                bval=p["bval"],
                arr=F.col(f"__hs_arr_{i}"),
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
        return from_typed_column(F.col(name), dtypes[name])

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
