"""Expression language: parser + evaluator semantics."""

from decimal import Decimal

import pytest

from hyper_storage_spark.expression import (
    BinaryOp,
    Constant,
    EvalError,
    EvalIdentifierNotFound,
    Identifier,
    UnaryOp,
    evaluate,
    evaluate_bool,
    parse,
)
from hyper_storage_spark.expression.evaluator import validate_filter_expression


def test_parse_comparison():
    assert parse("b > 10") == BinaryOp(">", Identifier("b"), Constant(Decimal(10)))
    assert parse('id = "10"') == BinaryOp("=", Identifier("id"), Constant("10"))


def test_parse_precedence():
    e = parse('b > 10 and a = "hello" or c < 5')
    assert isinstance(e, BinaryOp) and e.op == "or"
    assert isinstance(e.left, BinaryOp) and e.left.op == "and"


def test_parse_arithmetic_precedence():
    e = parse("x + 2 * 3 > 10")
    assert e == BinaryOp(
        ">",
        BinaryOp("+", Identifier("x"), BinaryOp("*", Constant(Decimal(2)), Constant(Decimal(3)))),
        Constant(Decimal(10)),
    )


def test_parse_has_and_arrays():
    e = parse("x has [1,2,3]")
    assert e == BinaryOp("has", Identifier("x"), Constant((Decimal(1), Decimal(2), Decimal(3))))
    e2 = parse("x has not [1,2]")
    assert e2.op == "has not"


def test_parse_unary_and_functions():
    assert parse("not x") == UnaryOp("not", Identifier("x"))
    assert parse("-5") == UnaryOp("-", Constant(Decimal(5)))
    f = parse("length(a) > 3")
    assert f.left.name == "length"


def test_parse_dotted_identifier():
    assert parse("a.b > 1").left == Identifier("a.b")


def test_eval_basic():
    assert evaluate(parse("b > 10"), {"b": 100500}) is True
    assert evaluate(parse("b > 10"), {"b": 1}) is False
    assert evaluate(parse('a = "hello"'), {"a": "hello"}) is True
    assert evaluate(parse("x + 5"), {"x": 2}) == Decimal(7)
    assert evaluate(parse("x*4 <= 4"), {"x": 1}) is True


def test_eval_typed_equality():
    # numbers and strings never compare equal (binders typed Values)
    assert evaluate(parse('b = "1"'), {"b": 1}) is False
    assert evaluate(parse("b = 1"), {"b": 1}) is True


def test_eval_missing_identifier():
    with pytest.raises(EvalIdentifierNotFound):
        evaluate(parse("zzz > 1"), {"b": 1})
    # read-path semantics: error => rejected
    assert evaluate_bool(parse("zzz > 1"), {"b": 1}) is False


def test_eval_mixed_type_comparison_is_error():
    with pytest.raises(EvalError):
        evaluate(parse("b > 10"), {"b": "hello"})
    assert evaluate_bool(parse("b > 10"), {"b": "hello"}) is False


def test_eval_has():
    assert evaluate(parse("x has [1,2]"), {"x": [1, 2, 3]}) is True
    assert evaluate(parse("x has [1,5]"), {"x": [1, 2, 3]}) is False
    assert evaluate(parse("x has 2"), {"x": [1, 2, 3]}) is True
    assert evaluate(parse("x has not 5"), {"x": [1, 2, 3]}) is True


def test_eval_logical_and_truthiness():
    assert evaluate(parse("x or y"), {"x": False, "y": True}) is True
    assert evaluate(parse("x and y"), {"x": 1, "y": 0}) is False
    assert evaluate(parse("not x"), {"x": 0}) is True


def test_eval_dotted_path():
    assert evaluate(parse("a.b = 2"), {"a": {"b": 2}}) is True


def test_validate_filter_expression():
    # unknown identifiers are fine at creation time (IndexLogic.scala:71-79)
    assert validate_filter_expression("b > 10") is True
    assert validate_filter_expression('a = "x" and b < 5') is True
    # genuinely broken evaluation is not
    assert validate_filter_expression('1 / 0 > "a"') is False


def test_unicode_escape_in_string_literal():
    from hyper_storage_spark.expression import evaluate_bool, parse

    assert parse('"\\u0041"').value == "A"
    # malformed \u falls back to the dropped-backslash legacy behavior
    assert parse('"\\uzz"').value == "uzz"
    assert evaluate_bool(parse('name = "\\u00e9"'), {"name": "é"})


def test_negative_numbers_in_array_literals():
    from decimal import Decimal

    from hyper_storage_spark.expression import evaluate_bool, parse

    assert parse("[-1, 2]").value == (Decimal(-1), Decimal(2))
    assert evaluate_bool(parse("x has [-1]"), {"x": [-1, 5]})


def test_huge_integral_canonical_str_is_eval_not_crash():
    from hyper_storage_spark.expression import evaluate_bool, parse
    from hyper_storage_spark.expression.evaluator import canonical_str

    # quantize() raised decimal.InvalidOperation past 28 digits,
    # escaping the EvalError contract entirely
    assert canonical_str(10**30) == "1" + "0" * 30
    assert evaluate_bool(parse('"a" + 1e30 = "a1" '), {}) is False
