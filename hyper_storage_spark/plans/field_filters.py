"""Sargable-predicate extraction: walk an AND-tree and pull out
``{=,>,>=,<,<=}`` conjuncts where one side is an index sort-key
identifier and the other a constant expression (constant-folded).

Catalyst does this natively for base-table scans (PushDownPredicates +
ConstantFolding); this explicit version exists for materialized-view
routing where the pushed conjuncts address the MV's physical sort
columns (t0/d0/... or item_id).

Reference: FieldFiltersExtractor.scala:18-61, pinned by
FilterFieldsExtractorTest.scala:12-84 (including reversed operand order
via operator swap and the bail-out on ``or``).
"""

from __future__ import annotations

from ..expression.ast_nodes import BinaryOp, Expression, Identifier, is_constant_expression
from ..expression.evaluator import EvalError, evaluate
from .index_logic import table_field_name
from .model import FieldFilter, FilterOp, SortItem, swap_op

_OPS = {
    "=": FilterOp.EQ,
    ">": FilterOp.GT,
    ">=": FilterOp.GTEQ,
    "<": FilterOp.LT,
    "<=": FilterOp.LTEQ,
}


class FieldFiltersExtractor:
    def __init__(self, sort_by_fields: list[SortItem]):
        size = len(sort_by_fields)
        self._field_map = {
            s.field_name: table_field_name(s, size, index)
            for index, s in enumerate(sort_by_fields)
        }

    def extract(self, expression: Expression) -> list[FieldFilter]:
        if isinstance(expression, BinaryOp):
            if expression.op in _OPS:
                left, right = expression.left, expression.right
                if isinstance(left, Identifier) and is_constant_expression(right):
                    return self._field_filter(left, _OPS[expression.op], right)
                if isinstance(right, Identifier) and is_constant_expression(left):
                    return self._field_filter(right, swap_op(_OPS[expression.op]), left)
                return []
            if expression.op == "and":
                return self.extract(expression.left) + self.extract(expression.right)
        return []

    def _field_filter(self, ident: Identifier, op: FilterOp, const_expr: Expression) -> list[FieldFilter]:
        name = self._field_map.get(ident.name)
        if name is None:
            return []
        try:
            value = evaluate(const_expr, {})
        except EvalError:
            return []
        return [FieldFilter(name, value, op)]
