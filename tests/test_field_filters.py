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
