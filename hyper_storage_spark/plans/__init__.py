"""Query-planner logic: the reference's "choose an index, push sargable
conjuncts, keyset-paginate" machinery, re-expressed as pure Python that
drives DataFrame construction. Catalyst handles predicate pushdown /
constant folding / top-K natively; the pieces here are the ones Catalyst
has no equivalent for (materialized-view routing via filter implication,
sort-order weighing, REST keyset pagination).
"""

from .model import CkField, FieldFilter, FilterOp, SortBy, SortItem
from .comparation import AstComparation, compare
from .field_filters import FieldFiltersExtractor
from .index_logic import (
    least_rows_filter_fields,
    merge_least_query_filter_fields,
    table_field_name,
    table_name,
    weigh_index,
)
from .order_fields import extract_index_sort_fields, weigh_ordering

__all__ = [
    "CkField",
    "FieldFilter",
    "FilterOp",
    "SortBy",
    "SortItem",
    "AstComparation",
    "compare",
    "FieldFiltersExtractor",
    "weigh_index",
    "table_name",
    "table_field_name",
    "least_rows_filter_fields",
    "merge_least_query_filter_fields",
    "weigh_ordering",
    "extract_index_sort_fields",
]
