"""Pratt parser for the expression language (SURVEY.md §2.3 grammar).

Grammar surface observed in the reference repo's usage of
``eu.inn expression-parser`` (FieldFiltersExtractor.scala:15-16,
Comparation.scala:89-90, AstComparationTest.scala, QueryCollectionsSpec):

    expr    := or_expr
    or      := and ("or" and)*
    and     := cmp ("and" cmp)*
    cmp     := add (("=", "!=", ">", ">=", "<", "<=", "has", "has not") add)?
    add     := mul (("+"|"-") mul)*
    mul     := unary (("*"|"/"|"%") unary)*
    unary   := ("-"|"!"|"not") unary | primary
    primary := NUMBER | STRING | "true" | "false" | "null" | array
             | IDENT ("(" args ")")? | "(" expr ")"
    array   := "[" (expr ("," expr)*)? "]"

Numbers are decimals; strings are double-quoted with backslash escapes;
identifiers may be dotted paths (``a.b``) reaching into the body object.
"""

from __future__ import annotations

import re
from decimal import Decimal

from .ast_nodes import BinaryOp, Constant, Expression, FunctionCall, Identifier, UnaryOp


class ParseError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<number>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<string>"(?:\\.|[^"\\])*")
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)
  | (?P<op>>=|<=|!=|=|>|<|\+|\-|\*|/|%|\(|\)|\[|\]|,|!)
    """,
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "has", "true", "false", "null"}

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\", "/": "/", "b": "\b", "f": "\f"}


def _unescape(s: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            if s[i + 1] == "u" and i + 5 < len(s):
                # JSON-style \uXXXX — silently dropping the backslash
                # would compare against the mangled literal text
                try:
                    out.append(chr(int(s[i + 2 : i + 6], 16)))
                    i += 6
                    continue
                except ValueError:
                    pass
            out.append(_ESCAPES.get(s[i + 1], s[i + 1]))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _tokenize(text: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ParseError(f"unexpected character {text[pos]!r} at {pos} in {text!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        val = m.group()
        if kind == "ident" and val in _KEYWORDS:
            tokens.append(("kw", val))
        else:
            tokens.append((kind, val))
    tokens.append(("eof", ""))
    return tokens


_CMP_OPS = {"=", "!=", ">", ">=", "<", "<="}


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.tokens = _tokenize(text)
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.tokens[self.i]

    def next(self) -> tuple[str, str]:
        t = self.tokens[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, val: str | None = None) -> tuple[str, str]:
        t = self.next()
        if t[0] != kind or (val is not None and t[1] != val):
            raise ParseError(f"expected {val or kind}, got {t[1]!r} in {self.text!r}")
        return t

    def parse(self) -> Expression:
        e = self.or_expr()
        if self.peek()[0] != "eof":
            raise ParseError(f"trailing input at {self.peek()[1]!r} in {self.text!r}")
        return e

    def or_expr(self) -> Expression:
        left = self.and_expr()
        while self.peek() == ("kw", "or"):
            self.next()
            left = BinaryOp("or", left, self.and_expr())
        return left

    def and_expr(self) -> Expression:
        left = self.cmp_expr()
        while self.peek() == ("kw", "and"):
            self.next()
            left = BinaryOp("and", left, self.cmp_expr())
        return left

    def cmp_expr(self) -> Expression:
        left = self.add_expr()
        kind, val = self.peek()
        if kind == "op" and val in _CMP_OPS:
            self.next()
            return BinaryOp(val, left, self.add_expr())
        if (kind, val) == ("kw", "has"):
            self.next()
            op = "has"
            if self.peek() == ("kw", "not"):
                self.next()
                op = "has not"
            return BinaryOp(op, left, self.add_expr())
        return left

    def add_expr(self) -> Expression:
        left = self.mul_expr()
        while self.peek()[0] == "op" and self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            left = BinaryOp(op, left, self.mul_expr())
        return left

    def mul_expr(self) -> Expression:
        left = self.unary_expr()
        while self.peek()[0] == "op" and self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            left = BinaryOp(op, left, self.unary_expr())
        return left

    def unary_expr(self) -> Expression:
        kind, val = self.peek()
        if (kind, val) == ("kw", "not") or (kind == "op" and val in ("-", "!")):
            self.next()
            op = "not" if val in ("not", "!") else "-"
            return UnaryOp(op, self.unary_expr())
        return self.primary()

    def primary(self) -> Expression:
        kind, val = self.next()
        if kind == "number":
            return Constant(Decimal(val))
        if kind == "string":
            return Constant(_unescape(val[1:-1]))
        if kind == "kw":
            if val == "true":
                return Constant(True)
            if val == "false":
                return Constant(False)
            if val == "null":
                return Constant(None)
            raise ParseError(f"unexpected keyword {val!r} in {self.text!r}")
        if kind == "ident":
            if self.peek() == ("op", "("):
                self.next()
                args: list[Expression] = []
                if self.peek() != ("op", ")"):
                    args.append(self.or_expr())
                    while self.peek() == ("op", ","):
                        self.next()
                        args.append(self.or_expr())
                self.expect("op", ")")
                return FunctionCall(val, tuple(args))
            return Identifier(val)
        if (kind, val) == ("op", "("):
            e = self.or_expr()
            self.expect("op", ")")
            return e
        if (kind, val) == ("op", "["):
            items: list[Expression] = []
            if self.peek() != ("op", "]"):
                items.append(self.or_expr())
                while self.peek() == ("op", ","):
                    self.next()
                    items.append(self.or_expr())
            self.expect("op", "]")
            vals = []
            for it in items:
                # fold a leading unary minus: '-1' tokenizes as
                # UnaryOp('-', Constant(1)) and negative numbers are
                # ordinary array members
                if (
                    isinstance(it, UnaryOp)
                    and it.op == "-"
                    and isinstance(it.arg, Constant)
                    and isinstance(it.arg.value, Decimal)
                ):
                    vals.append(-it.arg.value)
                    continue
                if not isinstance(it, Constant):
                    raise ParseError(f"array literals must be constant in {self.text!r}")
                vals.append(it.value)
            return Constant(tuple(vals))
        raise ParseError(f"unexpected token {val!r} in {self.text!r}")


def parse(text: str) -> Expression:
    return _Parser(text).parse()
