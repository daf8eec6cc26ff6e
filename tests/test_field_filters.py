"""Sargable extraction vectors, ported from FilterFieldsExtractorTest.scala:12-84."""

from decimal import Decimal

from hyper_storage_spark.expression import parse
from hyper_storage_spark.plans import FieldFilter, FieldFiltersExtractor, FilterOp, SortItem

ID_ASC = [SortItem("id", None, "asc")]


def extract(expr: str, sort_by=None):
    return FieldFiltersExtractor(sort_by or ID_ASC).extract(parse(expr))


def test_single_gt():
    assert extract('id > "10"') == [FieldFilter("item_id", "10", FilterOp.GT)]


def test_single_lt():
    assert extract('id < "10"') == [FieldFilter("item_id", "10", FilterOp.LT)]


def test_single_gteq():
    assert extract('id >= "10"') == [FieldFilter("item_id", "10", FilterOp.GTEQ)]


def test_single_lteq():
    assert extract('id <= "10"') == [FieldFilter("item_id", "10", FilterOp.LTEQ)]


def test_single_eq():
    assert extract('id = "10"') == [FieldFilter("item_id", "10", FilterOp.EQ)]


def test_reversed_operands_swap_op():
    assert extract('"10" < id') == [FieldFilter("item_id", "10", FilterOp.GT)]


def test_gt_with_other_field():
    assert extract('id > "10" and x < 5') == [FieldFilter("item_id", "10", FilterOp.GT)]


def test_eq_with_other_fields():
    assert extract('id = "10" and x < 5 and z*3 > 24') == [
        FieldFilter("item_id", "10", FilterOp.EQ)
    ]


def test_multi_field_sort_key():
    sort_by = [
        SortItem("id", None, "asc"),
        SortItem("x", "decimal", "asc"),
    ]
    assert extract('id = "10" and x < 5 and z*3 > 24 and y = 12', sort_by) == [
        FieldFilter("t0", "10", FilterOp.EQ),
        FieldFilter("d1", Decimal(5), FilterOp.LT),
    ]


def test_or_bails_out():
    assert extract('id > "10" or x < 5') == []


def test_extracted_filters_are_implied_by_the_expression():
    """Soundness fuzz for sargable extraction: every FieldFilter pulled
    out of an expression is applied to the MV scan BEFORE the residual
    filter, so an extracted conjunct the expression does not imply
    would drop matching rows (wrong results, not just a bad plan).
    For random expressions and contexts: whenever the full expression
    evaluates true, every extracted filter must hold for that context
    under the evaluator's own comparison semantics."""
    import os
    import random
    import sys

    from hyper_storage_spark.expression import evaluate_bool, parse
    from hyper_storage_spark.expression.evaluator import EvalError, value_eq, value_greater
    from hyper_storage_spark.plans import FieldFiltersExtractor, FilterOp, SortItem

    sys.path.insert(0, os.path.dirname(__file__))
    from test_expression_differential import gen_context, gen_expr

    sort_items = [SortItem("a", "decimal", "asc"), SortItem("s", "text", "desc")]
    extractor = FieldFiltersExtractor(sort_items)
    # reverse-map the physical MV column names back to identifiers
    from hyper_storage_spark.plans.index_logic import table_field_name

    rev = {
        table_field_name(s, len(sort_items), i): s.field_name
        for i, s in enumerate(sort_items)
    }

    def holds(v, ff):
        try:
            if ff.op is FilterOp.EQ:
                return value_eq(v, ff.value)
            if ff.op is FilterOp.GT:
                return value_greater(v, ff.value)
            if ff.op is FilterOp.GTEQ:
                return value_eq(v, ff.value) or value_greater(v, ff.value)
            if ff.op is FilterOp.LT:
                return value_greater(ff.value, v)
            return value_eq(v, ff.value) or value_greater(ff.value, v)
        except EvalError:
            return False

    rnd = random.Random(99)
    contexts = [gen_context(rnd) for _ in range(30)]
    n_extracted = 0
    violations = []
    for i in range(2000):
        text = gen_expr(rnd)
        if i % 2:  # bias half the corpus toward sargable and-shapes
            ident = rnd.choice(["a", "s"])
            cmp_op = rnd.choice(["=", ">", ">=", "<", "<="])
            const = rnd.choice(["5", "0", '"way way"', '"hello"', "10"])
            lhs, rhs = (ident, const) if rnd.random() < 0.5 else (const, ident)
            text = f"({lhs} {cmp_op} {rhs}) and ({text})"
        try:
            ast = parse(text)
        except Exception:
            continue
        filters = extractor.extract(ast)
        if not filters:
            continue
        n_extracted += 1
        for ctx in contexts:
            if not evaluate_bool(ast, ctx):
                continue
            for ff in filters:
                ident = rev[ff.name]
                if ident not in ctx or not holds(ctx[ident], ff):
                    violations.append((text, ctx, ff))
    assert not violations, violations[:5]
    assert n_extracted >= 100, n_extracted  # the fuzz must actually extract
