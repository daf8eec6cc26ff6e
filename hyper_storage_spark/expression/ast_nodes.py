"""Structural AST for the expression language.

Nodes are frozen dataclasses so structural equality (used by the
filter-implication comparator, reference Comparation.scala:19-172) and
hashing come for free. Mirrors the node shapes of the reference's
``eu.inn.parser.ast``: Constant, Identifier, UnaryOperation,
BinaryOperation, Function.
"""

from __future__ import annotations

from dataclasses import dataclass
from decimal import Decimal
from typing import Union

# Constant payloads: None, bool, Decimal, str, or tuple of payloads (array).
ConstValue = Union[None, bool, Decimal, str, tuple]


@dataclass(frozen=True)
class Expression:
    pass


@dataclass(frozen=True)
class Constant(Expression):
    value: ConstValue


@dataclass(frozen=True)
class Identifier(Expression):
    name: str  # dotted path, e.g. "a" or "a.b"

    @property
    def segments(self) -> tuple[str, ...]:
        return tuple(self.name.split("."))


@dataclass(frozen=True)
class UnaryOp(Expression):
    op: str  # "not", "-", "!"
    arg: Expression


@dataclass(frozen=True)
class BinaryOp(Expression):
    op: str  # "=", "!=", ">", ">=", "<", "<=", "and", "or", "+", "-", "*", "/", "%", "has", "has not"
    left: Expression
    right: Expression


@dataclass(frozen=True)
class FunctionCall(Expression):
    name: str
    args: tuple[Expression, ...]


def is_constant_expression(e: Expression) -> bool:
    """True if the expression contains no identifiers.

    Reference: AstComparator.isConstantExpression (Comparation.scala:110-118).
    """
    if isinstance(e, Constant):
        return True
    if isinstance(e, Identifier):
        return False
    if isinstance(e, UnaryOp):
        return is_constant_expression(e.arg)
    if isinstance(e, BinaryOp):
        return is_constant_expression(e.left) and is_constant_expression(e.right)
    if isinstance(e, FunctionCall):
        return all(is_constant_expression(a) for a in e.args)
    raise TypeError(f"unknown expression node: {e!r}")
