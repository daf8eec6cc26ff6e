"""Sort-order weighing and clustering-key extraction.

Re-implements the reference's OrderFieldsLogic (OrderFieldsLogic.scala:8-80),
pinned by OrderFieldsLogicTest.scala:12-75:

- :func:`weigh_ordering` scores a query sort against an index sort key:
  10 exact match, 5 whole-order reversed, 3 partial prefix match,
  0 when the query has no sort, -10 mismatch.
- :func:`extract_index_sort_fields` derives the usable ORDER BY prefix of
  physical clustering-key fields plus whether the scan direction is
  reversed relative to the index order.
"""

from __future__ import annotations

from .index_logic import table_field_name
from .model import CkField, SortBy, SortItem


def _weigh_one(query_el: SortBy, index_el: SortItem) -> int:
    if query_el.field_name != index_el.field_name:
        return -10
    index_desc = not index_el.ascending
    return 10 if index_desc == query_el.descending else 5


def weigh_ordering(query: list[SortBy], index_sorted_by: list[SortItem]) -> int:
    if not index_sorted_by:
        # no clustering key at all: a query sort can never match it
        return -10 if query else 0
    weight, index = 0, 0
    for sort_by in query:
        if (weight, index) == (0, 0):
            weight, index = _weigh_one(sort_by, index_sorted_by[0]), 1
        elif weight == 5:
            if len(index_sorted_by) > index:
                w = _weigh_one(sort_by, index_sorted_by[index])
                weight = 3 if w == 10 else w
            else:
                weight = 3
            index += 1
        elif weight == 10:
            if len(index_sorted_by) > index:
                w = _weigh_one(sort_by, index_sorted_by[index])
                weight = 3 if w == 5 else w
            else:
                weight = 3
            index += 1
        else:
            index += 1
    return weight


def extract_index_sort_fields(
    query_sort_by: list[SortBy], index_sorted_by: list[SortItem]
) -> tuple[list[CkField], bool]:
    """Usable clustering-key ORDER BY prefix + reversed flag.

    A query sort field is usable while it names the index field at the
    same position and its direction is consistent with a single scan
    direction (forward, or — flipped at position 0 — reversed)."""
    reversed_ = False
    # FAITHFUL reference quirk (OrderFieldsLogic.scala:49): the
    # physical-name geometry uses the QUERY sort length, not the index
    # field-list length — tableFieldName's id→item_id mapping therefore
    # fires only when 'id' is the query's last sort field. Kept as-is
    # for vector parity; indexes that declare 'id' mid-list inherit
    # the same reference behavior.
    size = len(query_sort_by)
    fields: list[CkField] = []
    for index, q in enumerate(query_sort_by):
        if index >= len(index_sorted_by):
            break
        it = index_sorted_by[index]
        if it.field_name != q.field_name:
            break
        name = table_field_name(it, size, index)
        if it.ascending != q.descending and not reversed_:
            fields.append(CkField(name, ascending=not q.descending))
        elif it.ascending == q.descending and reversed_:
            fields.append(CkField(name, ascending=not q.descending))
        elif index == 0:
            reversed_ = True
            fields.append(CkField(name, ascending=not q.descending))
        else:
            break
    return fields, reversed_
