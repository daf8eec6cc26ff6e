"""Sort weigher, CK extraction, and keyset least-rows filters — ported
from OrderFieldsLogicTest.scala:12-288."""

from decimal import Decimal

from hyper_storage_spark.plans import (
    CkField,
    FieldFilter,
    FilterOp,
    SortBy,
    SortItem,
    least_rows_filter_fields,
    merge_least_query_filter_fields,
    weigh_ordering,
    extract_index_sort_fields,
)

A = SortItem("a", None, None)
A_ASC = SortItem("a", None, "asc")
A_DESC = SortItem("a", None, "desc")
B_ASC = SortItem("b", None, "asc")
B_DESC = SortItem("b", None, "desc")


class TestWeighOrdering:
    def test_equal_orders_10(self):
        assert weigh_ordering([SortBy("a")], [A]) == 10
        assert weigh_ordering([SortBy("a")], [A_ASC]) == 10
        assert weigh_ordering([SortBy("a"), SortBy("b", True)], [A, B_DESC]) == 10

    def test_empty_query_0(self):
        assert weigh_ordering([], [A]) == 0

    def test_reverse_order_5(self):
        assert weigh_ordering([SortBy("a", True)], [A]) == 5
        assert weigh_ordering([SortBy("a", True)], [A_ASC]) == 5
        assert weigh_ordering([SortBy("a", True), SortBy("b")], [A, B_DESC]) == 5
        assert weigh_ordering([SortBy("a")], [A_DESC]) == 5
        assert weigh_ordering([SortBy("a"), SortBy("b", True)], [A_DESC, B_ASC]) == 5

    def test_partial_3(self):
        assert weigh_ordering([SortBy("a", True), SortBy("b")], [A, B_ASC]) == 3
        assert weigh_ordering([SortBy("a"), SortBy("b", True)], [A_DESC, B_DESC]) == 3
        assert weigh_ordering([SortBy("a"), SortBy("b", True)], [A_DESC]) == 3

    def test_mismatch_minus_10(self):
        assert weigh_ordering([SortBy("z")], [A]) == -10
        assert weigh_ordering([SortBy("x", True), SortBy("b")], [A, B_ASC]) == -10
        assert weigh_ordering([SortBy("y"), SortBy("b", True)], [A_DESC, B_DESC]) == -10


class TestExtractIndexSortFields:
    def test_equal_extracted_totally(self):
        assert extract_index_sort_fields([SortBy("a")], [A]) == ([CkField("t0", True)], False)
        assert extract_index_sort_fields([SortBy("a")], [A_ASC]) == ([CkField("t0", True)], False)
        assert extract_index_sort_fields(
            [SortBy("a"), SortBy("b", True)],
            [A, SortItem("b", "decimal", "desc")],
        ) == ([CkField("t0", True), CkField("d1", False)], False)

    def test_empty_query(self):
        assert extract_index_sort_fields([], [A]) == ([], False)

    def test_reverse_extracted_totally(self):
        assert extract_index_sort_fields([SortBy("a", True)], [A]) == ([CkField("t0", False)], True)
        assert extract_index_sort_fields([SortBy("a", True)], [A_ASC]) == ([CkField("t0", False)], True)
        assert extract_index_sort_fields([SortBy("a", True), SortBy("b")], [A, B_DESC]) == (
            [CkField("t0", False), CkField("t1", True)],
            True,
        )
        assert extract_index_sort_fields([SortBy("a")], [A_DESC]) == ([CkField("t0", True)], True)
        assert extract_index_sort_fields([SortBy("a"), SortBy("b", True)], [A_DESC, B_ASC]) == (
            [CkField("t0", True), CkField("t1", False)],
            True,
        )

    def test_partial_extracted_partially(self):
        assert extract_index_sort_fields([SortBy("a", True), SortBy("b")], [A, B_ASC]) == (
            [CkField("t0", False)],
            True,
        )
        assert extract_index_sort_fields([SortBy("a"), SortBy("b", True)], [A_DESC, B_DESC]) == (
            [CkField("t0", True)],
            True,
        )
        assert extract_index_sort_fields([SortBy("a"), SortBy("b", True)], [A_DESC]) == (
            [CkField("t0", True)],
            True,
        )

    def test_mismatch_empty(self):
        assert extract_index_sort_fields([SortBy("z")], [A]) == ([], False)
        assert extract_index_sort_fields([SortBy("x", True), SortBy("b")], [A, B_ASC]) == ([], False)
        assert extract_index_sort_fields([SortBy("y"), SortBy("b", True)], [A_DESC, B_DESC]) == ([], False)


ABCD = [SortItem("a", None, None), SortItem("b", None, None), SortItem("c", None, None), SortItem("d", None, None)]


def n(x):
    return Decimal(x)


class TestLeastRowsFilterFields:
    def test_simple(self):
        cur = {"a": n(5), "b": n(1), "c": n(2), "d": n(2)}
        res = least_rows_filter_fields(ABCD, [], 0, False, cur, False)
        assert res == [
            FieldFilter("t0", n(5), FilterOp.EQ),
            FieldFilter("t1", n(1), FilterOp.EQ),
            FieldFilter("t2", n(2), FilterOp.EQ),
            FieldFilter("t3", n(2), FilterOp.GT),
        ]

    def test_simple_reversed(self):
        cur = {"a": n(5), "b": n(1), "c": n(2), "d": n(2)}
        res = least_rows_filter_fields(ABCD, [], 0, False, cur, True)
        assert res[-1] == FieldFilter("t3", n(2), FilterOp.LT)

    def test_with_existing_filter(self):
        ff = [FieldFilter("t0", n(18), FilterOp.EQ)]
        cur = {"a": n(5), "b": n(1), "c": n(2), "d": n(2)}
        res = least_rows_filter_fields(ABCD, ff, 0, False, cur, False)
        assert res == [
            FieldFilter("t1", n(1), FilterOp.EQ),
            FieldFilter("t2", n(2), FilterOp.EQ),
            FieldFilter("t3", n(2), FilterOp.GT),
        ]

    def test_with_existing_and_previous(self):
        ff = [FieldFilter("t0", n(18), FilterOp.EQ)]
        cur = {"a": n(18), "b": n(1), "c": n(2), "d": n(2)}
        res = least_rows_filter_fields(ABCD, ff, 4, True, cur, False)
        assert res == [
            FieldFilter("t1", n(1), FilterOp.EQ),
            FieldFilter("t2", n(2), FilterOp.GT),
        ]

    def test_with_existing_and_previous_not_reached_end(self):
        ff = [FieldFilter("t0", n(18), FilterOp.EQ)]
        cur = {"a": n(18), "b": n(1), "c": n(2), "d": n(2)}
        res = least_rows_filter_fields(ABCD, ff, 4, False, cur, False)
        assert res == [
            FieldFilter("t1", n(1), FilterOp.EQ),
            FieldFilter("t2", n(2), FilterOp.EQ),
            FieldFilter("t3", n(2), FilterOp.GT),
        ]

    def test_with_existing_gt_filter(self):
        ff = [FieldFilter("t0", n(5), FilterOp.EQ), FieldFilter("t1", n(0), FilterOp.GT)]
        cur = {"a": n(5), "b": n(1), "c": n(2), "d": n(2)}
        res = least_rows_filter_fields(ABCD, ff, 0, False, cur, False)
        assert res == [
            FieldFilter("t1", n(1), FilterOp.EQ),
            FieldFilter("t2", n(2), FilterOp.EQ),
            FieldFilter("t3", n(2), FilterOp.GT),
        ]
        assert merge_least_query_filter_fields(ff, res) == [
            FieldFilter("t0", n(5), FilterOp.EQ),
            FieldFilter("t1", n(1), FilterOp.EQ),
            FieldFilter("t2", n(2), FilterOp.EQ),
            FieldFilter("t3", n(2), FilterOp.GT),
        ]

    def test_with_existing_gt_filter_plus_previous(self):
        ff = [FieldFilter("t0", n(5), FilterOp.EQ), FieldFilter("t1", n(0), FilterOp.GT)]
        cur = {"a": n(5), "b": n(1), "c": n(2), "d": n(2)}
        res = least_rows_filter_fields(ABCD, ff, 4, True, cur, False)
        assert res == [
            FieldFilter("t1", n(1), FilterOp.EQ),
            FieldFilter("t2", n(2), FilterOp.GT),
        ]
        assert merge_least_query_filter_fields(ff, res) == [
            FieldFilter("t0", n(5), FilterOp.EQ),
            FieldFilter("t1", n(1), FilterOp.EQ),
            FieldFilter("t2", n(2), FilterOp.GT),
        ]

    def test_with_existing_filter_reversed(self):
        ff = [FieldFilter("t0", n(5), FilterOp.EQ), FieldFilter("t1", n(3), FilterOp.LT)]
        cur = {"a": n(5), "b": n(2), "c": n(2), "d": n(2)}
        res = least_rows_filter_fields(ABCD, ff, 4, True, cur, True)
        assert res == [
            FieldFilter("t1", n(2), FilterOp.EQ),
            FieldFilter("t2", n(2), FilterOp.LT),
        ]
        assert merge_least_query_filter_fields(ff, res) == [
            FieldFilter("t0", n(5), FilterOp.EQ),
            FieldFilter("t1", n(2), FilterOp.EQ),
            FieldFilter("t2", n(2), FilterOp.LT),
        ]

    def test_reached_end_empty(self):
        ff = [FieldFilter("t0", n(5), FilterOp.EQ), FieldFilter("t1", n(1), FilterOp.LT)]
        cur = {"a": n(5), "b": n(2), "c": n(1), "d": n(1)}
        assert least_rows_filter_fields(ABCD, ff, 0, False, cur, False) == []
        assert least_rows_filter_fields(ABCD, ff, 0, False, cur, True) == []
