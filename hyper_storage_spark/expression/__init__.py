"""The filter/sort expression language.

The reference uses the external library ``eu.inn expression-parser``
(HParser/HEval) for its ``filter`` query parameter and index filter
expressions; its observable surface (SURVEY.md §2.3) is comparisons
``= != > >= < <=``, logical ``and/or/not``, membership ``has``/``has not``,
arithmetic ``+ - * / %``, unary ``- !``, function calls, identifiers
(dotted paths into the item body), and constants (decimal numbers,
double-quoted strings, ``[...]`` arrays, true/false/null).

This package provides:
- :mod:`ast_nodes` — structural AST (equality-comparable, hashable).
- :mod:`parser` — a Pratt parser for the grammar.
- :mod:`evaluator` — a Python row evaluator with the reference's
  dynamic-typing semantics (numeric compare only when both sides are
  numbers; missing identifier / type error ⇒ EvalError, which readers
  treat as row-rejected).
- :mod:`compiler` — AST → PySpark Column (JVM-side, codegen-friendly)
  with the same semantics, used on the hot query path.
"""

from .ast_nodes import BinaryOp, Constant, FunctionCall, Identifier, UnaryOp
from .evaluator import EvalError, EvalIdentifierNotFound, evaluate, evaluate_bool, truthy
from .parser import ParseError, parse

__all__ = [
    "BinaryOp",
    "Constant",
    "FunctionCall",
    "Identifier",
    "UnaryOp",
    "parse",
    "ParseError",
    "evaluate",
    "evaluate_bool",
    "truthy",
    "EvalError",
    "EvalIdentifierNotFound",
]
