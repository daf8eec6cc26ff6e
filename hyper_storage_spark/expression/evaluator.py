"""Python row evaluator for the expression language.

Semantics mirror the reference's HEval over ``binders`` dynamic values
(SURVEY.md §1.2, §2.3):

- values are Null / Bool / Number (decimal) / Text / Lst / Obj;
- ordering comparisons are numeric when BOTH sides are numbers, string
  vs string lexicographic, otherwise an evaluation error;
- equality is typed (Number(10) != Text("10"));
- a missing identifier raises :class:`EvalIdentifierNotFound`;
- any evaluation error on the read path means "row rejected"
  (HyperbusAdapter.scala:236-243) and on index membership means
  "excluded" (IndexLogic.scala:81-87) — callers use
  :func:`evaluate_bool` with ``on_error=False`` for that.
"""

from __future__ import annotations

from decimal import Decimal, InvalidOperation
from typing import Any, Callable, Mapping

from .ast_nodes import BinaryOp, Constant, Expression, FunctionCall, Identifier, UnaryOp


class EvalError(Exception):
    pass


class EvalIdentifierNotFound(EvalError):
    pass


def is_number(v: Any) -> bool:
    return isinstance(v, (int, float, Decimal)) and not isinstance(v, bool)


def to_decimal(v: Any) -> Decimal:
    if isinstance(v, Decimal):
        return v
    if is_number(v):
        return Decimal(str(v))
    raise EvalError(f"not a number: {v!r}")


def canonical_str(v: Any) -> str:
    """String form of a dynamic value (binders Value.asString analog)."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if is_number(v):
        d = to_decimal(v)
        if d == d.to_integral_value():
            # f-format, not quantize: quantize raises InvalidOperation
            # past the default 28-digit context (e.g. 1e30), escaping
            # the EvalError contract entirely; ':f' renders any size
            # in plain digits and an integral has nothing to strip
            return f"{d.to_integral_value():f}"
        # f-format for fractions too (review r12): str(normalize())
        # emitted scientific notation below 1e-6 ('1E-7') and silently
        # ROUNDED past 28 significant digits — both leak into text
        # index sort cells, string concat, and lexicographic compares
        # ('1E-7' sorts above '0.5'). ':f' is exact at any scale; strip
        # the trailing zeros normalize() used to remove.
        s = f"{d:f}".rstrip("0")
        return s.rstrip(".") if s.endswith(".") else s
    if isinstance(v, str):
        return v
    raise EvalError(f"no string form for {v!r}")


def truthy(v: Any) -> bool:
    """binders Value.asBoolean analog."""
    if v is None:
        return False
    if isinstance(v, bool):
        return v
    if is_number(v):
        return to_decimal(v) != 0
    if isinstance(v, str):
        low = v.lower()
        if low in ("true", "1", "y", "yes", "on"):
            return True
        if low in ("false", "0", "n", "no", "off"):
            return False
        raise EvalError(f"can't interpret {v!r} as boolean")
    if isinstance(v, (list, tuple, dict)):
        return len(v) > 0
    raise EvalError(f"can't interpret {v!r} as boolean")


def value_eq(l: Any, r: Any) -> bool:
    """Typed equality: numbers compare numerically, same-type values
    compare directly, cross-type is unequal."""
    if is_number(l) and is_number(r):
        return to_decimal(l) == to_decimal(r)
    if isinstance(l, bool) and isinstance(r, bool):
        return l == r
    if isinstance(l, str) and isinstance(r, str):
        return l == r
    if isinstance(l, (list, tuple)) and isinstance(r, (list, tuple)):
        return len(l) == len(r) and all(value_eq(a, b) for a, b in zip(l, r))
    if l is None and r is None:
        return True
    return False


def value_greater(l: Any, r: Any) -> bool:
    """Dynamic ``>``: numeric when both numbers, else string comparison
    of the canonical forms (HyperbusAdapter.scala:370-375 analog)."""
    if is_number(l) and is_number(r):
        return to_decimal(l) > to_decimal(r)
    return canonical_str(l) > canonical_str(r)


def has_bop(l: Any, r: Any) -> bool:
    """``l has r``: when l is a list — r ⊆ l (r list) or r ∈ l (scalar);
    when l is a string and r a string — substring containment."""
    if isinstance(l, (list, tuple)):
        if isinstance(r, (list, tuple)):
            return all(any(value_eq(x, y) for y in l) for x in r)
        return any(value_eq(r, y) for y in l)
    if isinstance(l, str) and isinstance(r, str):
        return r in l
    raise EvalError(f"'has' not supported between {l!r} and {r!r}")


def _fn_length(v: Any) -> Decimal:
    # length() is defined for strings and arrays ONLY (the documented
    # contract, matching the Column compiler); an object slipping
    # through Python's len(dict) would silently diverge from the
    # compiled path, which has no object-length form
    if isinstance(v, (str, list, tuple)):
        return Decimal(len(v))
    raise EvalError(f"length() of {type(v).__name__}")


_FUNCTIONS: dict[str, Callable[..., Any]] = {
    "length": _fn_length,
    # string form via canonical_str, NOT str(): str(None) would leak
    # Python's 'None' repr (null canonicalizes to ''), and containers
    # raise (⇒ eval error ⇒ row rejected) instead of leaking reprs
    "lower": lambda v: canonical_str(v).lower(),
    "upper": lambda v: canonical_str(v).upper(),
    "abs": lambda v: abs(to_decimal(v)),
    "round": lambda v: to_decimal(v).to_integral_value(),
}


def _lookup(context: Mapping[str, Any], segments: tuple[str, ...], name: str) -> Any:
    cur: Any = context
    for seg in segments:
        if isinstance(cur, Mapping) and seg in cur:
            cur = cur[seg]
        else:
            raise EvalIdentifierNotFound(name)
    return cur


def evaluate(node: Expression, context: Mapping[str, Any] | None = None) -> Any:
    ctx = context or {}
    if isinstance(node, Constant):
        v = node.value
        return list(v) if isinstance(v, tuple) else v
    if isinstance(node, Identifier):
        return _lookup(ctx, node.segments, node.name)
    if isinstance(node, UnaryOp):
        if node.op == "not":
            return not truthy(evaluate(node.arg, ctx))
        if node.op == "-":
            return -to_decimal(evaluate(node.arg, ctx))
        raise EvalError(f"unknown unary op {node.op!r}")
    if isinstance(node, BinaryOp):
        op = node.op
        if op == "and":
            return truthy(evaluate(node.left, ctx)) and truthy(evaluate(node.right, ctx))
        if op == "or":
            return truthy(evaluate(node.left, ctx)) or truthy(evaluate(node.right, ctx))
        l = evaluate(node.left, ctx)
        r = evaluate(node.right, ctx)
        if op == "=":
            return value_eq(l, r)
        if op == "!=":
            return not value_eq(l, r)
        if op == ">":
            return _ordered_greater(l, r)
        if op == "<":
            return _ordered_greater(r, l)
        if op == ">=":
            return value_eq(l, r) or _ordered_greater(l, r)
        if op == "<=":
            return value_eq(l, r) or _ordered_greater(r, l)
        if op == "has":
            return has_bop(l, r)
        if op == "has not":
            return not has_bop(l, r)
        if op == "+":
            if l is None or r is None:
                return None  # binders-style null propagation
            if isinstance(l, str) or isinstance(r, str):
                return canonical_str(l) + canonical_str(r)
            return to_decimal(l) + to_decimal(r)
        if op == "-":
            return to_decimal(l) - to_decimal(r)
        if op == "*":
            return to_decimal(l) * to_decimal(r)
        if op == "/":
            try:
                return to_decimal(l) / to_decimal(r)
            except (ZeroDivisionError, InvalidOperation) as e:
                raise EvalError(str(e)) from e
        if op == "%":
            try:
                return to_decimal(l) % to_decimal(r)
            except (ZeroDivisionError, InvalidOperation) as e:
                raise EvalError(str(e)) from e
        raise EvalError(f"unknown binary op {op!r}")
    if isinstance(node, FunctionCall):
        fn = _FUNCTIONS.get(node.name)
        if fn is None:
            raise EvalError(f"unknown function {node.name!r}")
        args = [evaluate(a, ctx) for a in node.args]
        try:
            return fn(*args)
        except EvalError:
            raise
        except Exception as e:  # noqa: BLE001 - any failure is an eval error
            raise EvalError(str(e)) from e
    raise EvalError(f"unknown node {node!r}")


def _ordered_greater(l: Any, r: Any) -> bool:
    """Strict ordering for comparison operators: numbers numerically,
    strings lexicographically; mixed/unsupported types are errors."""
    if is_number(l) and is_number(r):
        return to_decimal(l) > to_decimal(r)
    if isinstance(l, str) and isinstance(r, str):
        return l > r
    raise EvalError(f"can't order {l!r} vs {r!r}")


def evaluate_bool(node: Expression, context: Mapping[str, Any] | None = None, on_error: bool = False) -> bool:
    """Evaluate to boolean; any EvalError yields ``on_error`` (the read
    path and index membership both use False — eval error ⇒ row rejected,
    HyperbusAdapter.scala:236-243 / IndexLogic.scala:81-87)."""
    try:
        return truthy(evaluate(node, context))
    except EvalError:
        return on_error


def validate_filter_expression(text: str) -> bool:
    """Dry-run with an empty context; only 'identifier not found' is
    acceptable (IndexLogic.validateFilterExpression, IndexLogic.scala:71-79)."""
    from .parser import parse

    node = parse(text)
    try:
        evaluate(node, {})
        return True
    except EvalIdentifierNotFound:
        return True
    except EvalError:
        return False
