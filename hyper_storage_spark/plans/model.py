"""Planner data types (reference: db package case classes + api RAML types).

- :class:`SortBy` — a query sort directive (hyperbus SortBy).
- :class:`SortItem` — an index sort-key definition
  (HyperStorageIndexSortItem: field name, optional type text|decimal,
  optional order asc|desc; hyperstorage.raml:19-20).
- :class:`FieldFilter` — a sargable conjunct pushed to storage
  (db/Db.scala FieldFilter; ops FilterEq/Gt/GtEq/Lt/LtEq).
- :class:`CkField` — a clustering-key ORDER BY element (db/Db.scala CkField).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import Any, Optional


class FilterOp(Enum):
    EQ = "="
    GT = ">"
    GTEQ = ">="
    LT = "<"
    LTEQ = "<="


TEXT = "text"
DECIMAL = "decimal"
ASC = "asc"
DESC = "desc"

STATUS_INDEXING = 0
STATUS_DELETING = 1
STATUS_NORMAL = 2


@dataclass(frozen=True)
class SortBy:
    field_name: str
    descending: bool = False


@dataclass(frozen=True)
class SortItem:
    field_name: str
    field_type: Optional[str] = None  # "text" | "decimal" | None (defaults text)
    order: Optional[str] = None  # "asc" | "desc" | None (defaults asc)

    @property
    def effective_type(self) -> str:
        return self.field_type if self.field_type == DECIMAL else TEXT

    @property
    def ascending(self) -> bool:
        return self.order != DESC


@dataclass(frozen=True)
class FieldFilter:
    name: str
    value: Any
    op: FilterOp


@dataclass(frozen=True)
class CkField:
    name: str
    ascending: bool


def swap_op(op: FilterOp) -> FilterOp:
    return {
        FilterOp.GT: FilterOp.LT,
        FilterOp.GTEQ: FilterOp.LTEQ,
        FilterOp.LT: FilterOp.GT,
        FilterOp.LTEQ: FilterOp.GTEQ,
        FilterOp.EQ: FilterOp.EQ,
    }[op]
