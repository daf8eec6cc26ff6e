"""Index naming, selection weight, and keyset-pagination filters.

Re-implements the reference's IndexLogic (IndexLogic.scala), pinned by
OrderFieldsLogicTest.scala:77-288 and QueryCollectionsSpec plan asserts:

- :func:`table_name` / :func:`table_field_name` — physical index-table
  naming: ``index_content`` (unsorted) or ``index_content_{t|d}{a|d}{pos}...``
  where t/d = text/decimal sort-column type, a/d = asc/desc
  (IndexLogic.scala:14-40); the last sort field named ``id`` maps to the
  ``item_id`` physical column (IndexLogic.scala:66-71).
- :func:`weigh_index` — access-path score = order weight + filter weight
  (Equal +20 / Wider +10 / query-filter-but-no-index-filter -30 /
  both-none 0 / index-filter-only -1000000 / NotEqual -1000001)
  (IndexLogic.scala:89-106).
- :func:`least_rows_filter_fields` — keyset resume filter from the last
  row seen: ``k1=v1 & … & kn>vn`` with suffix shrinking as ranges
  exhaust (IndexLogic.scala:108-165).
- :func:`extract_sort_field_values` — per-item values of the index sort
  columns, for materialization and obsolete-row detection
  (IndexLogic.scala:47-63).
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

from ..expression.ast_nodes import Expression
from ..expression.evaluator import (
    EvalError,
    to_decimal,
    canonical_str,
    value_eq,
)
from . import comparation
from .model import (
    DECIMAL,
    FieldFilter,
    FilterOp,
    SortBy,
    SortItem,
)


def table_field_type(item: SortItem) -> str:
    return "d" if item.field_type == DECIMAL else "t"


def table_name(sort_by: list[SortItem]) -> str:
    if not sort_by:
        return "index_content"
    parts = ["index_content_"]
    for index, item in enumerate(sort_by):
        if not item.field_name.replace(".", "").replace("_", "").isalnum():
            raise ValueError(f"Index field name is invalid: {item.field_name}")
        parts.append(table_field_type(item))
        parts.append("d" if item.order == "desc" else "a")
        parts.append(str(index))
    return "".join(parts)


def table_field_name(item: SortItem, sort_item_size: int, index: int) -> str:
    if index == sort_item_size - 1 and item.field_name == "id":
        return "item_id"
    return table_field_type(item) + str(index)


def weigh_index(
    query_expression: Optional[Expression],
    query_sort_order: list[SortBy],
    index_filter_expression: Optional[Expression],
    index_sort_order: list[SortItem],
) -> int:
    from .order_fields import weigh_ordering

    if query_expression is None and index_filter_expression is not None:
        filter_weight = -1000000
    elif query_expression is not None and index_filter_expression is None:
        filter_weight = -30
    elif query_expression is None and index_filter_expression is None:
        filter_weight = 0
    else:
        r = comparation.compare(index_filter_expression, query_expression)
        filter_weight = {
            comparation.Equal: 20,
            comparation.Wider: 10,
            comparation.NotEqual: -1000001,
        }[r]
    return weigh_ordering(query_sort_order, index_sort_order) + filter_weight


def extract_sort_field_values(
    sort_by: list[SortItem], value: Mapping[str, Any] | Any
) -> list[tuple[str, Any]]:
    """(physical field name, value) per index sort column for one item body."""
    obj = value if isinstance(value, Mapping) else {}
    size = len(sort_by)
    out: list[tuple[str, Any]] = []
    for index, item in enumerate(sort_by):
        name = table_field_name(item, size, index)
        cur: Any = obj
        found = True
        for seg in item.field_name.split("."):
            if isinstance(cur, Mapping) and seg in cur:
                cur = cur[seg]
            else:
                found = False
                break
        out.append((name, cur if found else None))
    return out


def greater(a: Any, b: Any, sort_field_type: str) -> bool:
    if sort_field_type == DECIMAL:
        return to_decimal(a) > to_decimal(b)
    return canonical_str(a) > canonical_str(b)


def value_range_matches(a: Any, b: Any, op: FilterOp, sort_field_type: str) -> bool:
    try:
        if op == FilterOp.GT:
            return greater(a, b, sort_field_type)
        if op == FilterOp.GTEQ:
            return value_eq(a, b) or greater(a, b, sort_field_type)
        if op == FilterOp.LT:
            return greater(b, a, sort_field_type)
        if op == FilterOp.LTEQ:
            return value_eq(a, b) or greater(b, a, sort_field_type)
        return value_eq(a, b)
    except EvalError:
        return False


def _physical_cell_value(value: Any, effective_type: str) -> Any:
    """Map a body value to what the PHYSICAL sort cell stores.

    documents._sort_value writes NULL for values with no typed scalar
    form (containers; non-numeric values in a decimal column), so a
    keyset resume filter must carry None for them too — the raw body
    value would reach the planner's EvalError fallback, which pushes
    FALSE for range ops and ends pagination early, dropping every row
    that sorts after the NULL run. Convertible scalars pass through
    unchanged (the planner's _lit_for re-applies the same conversion)."""
    if value is None:
        return None
    try:
        to_decimal(value) if effective_type == DECIMAL else canonical_str(value)
    except EvalError:
        return None
    return value


def least_rows_filter_fields(
    index_sorted_by: list[SortItem],
    query_filter_fields: list[FieldFilter],
    prev_filter_fields_size: int,
    prev_filter_reached_end: bool,
    value: Mapping[str, Any],
    reversed_: bool,
) -> list[FieldFilter]:
    """Resume filter for the next keyset page given the last row's body."""
    size = len(index_sorted_by)
    isb_idx = []
    for index, item in enumerate(index_sorted_by):
        name = table_field_name(item, size, index)
        cur: Any = value
        found = True
        for seg in item.field_name.split("."):
            if isinstance(cur, Mapping) and seg in cur:
                cur = cur[seg]
            else:
                found = False
                break
        isb_idx.append(
            (
                name,
                _physical_cell_value(cur, item.effective_type) if found else None,
                item.ascending,
                index,
                item.effective_type,
            )
        )

    reached_end = False
    for q in query_filter_fields:
        if q.op == FilterOp.EQ:
            continue
        match = next((i for i in isb_idx if i[0] == q.name), None)
        if match is not None and not value_range_matches(match[1], q.value, q.op, match[4]):
            reached_end = True
            break

    if reached_end:
        return []

    start_index = -1
    for i, isb in enumerate(isb_idx):
        if any(qf.name == isb[0] and qf.op == FilterOp.EQ for qf in query_filter_fields):
            start_index = i
    start_index += 1

    if prev_filter_fields_size == 0 or not prev_filter_reached_end:
        last_index = size - 1
    else:
        # prev_filter_fields_size counts the MERGED filter the caller
        # just issued (EQ query prefix + resume fields — the reference
        # test vectors pin this convention: ff=[t0 EQ], prev=4 on a
        # 4-field sort shrinks to [t1 EQ, t2 GT]), so the -2 lands on
        # an absolute sort-field index. A caller passing the
        # resume-only count would shrink below start_index and end
        # pagination early (review r12 — query_paged did exactly that).
        last_index = prev_filter_fields_size - 2

    out: list[FieldFilter] = []
    for name, field_value, field_ascending, index, _ftype in isb_idx:
        if index < start_index:
            continue
        if index == last_index:
            op = FilterOp.GT if (reversed_ ^ field_ascending) else FilterOp.LT
            out.append(FieldFilter(name, field_value, op))
        elif index < last_index:
            out.append(FieldFilter(name, field_value, FilterOp.EQ))
    return out


def merge_least_query_filter_fields(
    query_filter_fields: list[FieldFilter], least_filter_fields: list[FieldFilter]
) -> list[FieldFilter]:
    if not least_filter_fields:
        return list(query_filter_fields)
    return [f for f in query_filter_fields if f.op == FilterOp.EQ] + list(least_filter_fields)
