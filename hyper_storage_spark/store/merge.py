"""Body semantics: merge-patch + null stripping.

Reference (PrimaryWorker.scala:45-60, 297-308):
- ``filter_nulls`` removes null-valued fields, recursing into nested
  objects only (lists are kept as-is — filterNullsVisitor recurses only
  into Obj);
- PATCH = shallow merge of the patch object over the existing body
  (binders ``existing + patch``), then null-strip — so a null field in
  a patch *deletes* that field;
- PUT/POST bodies are null-stripped on write.
"""

from __future__ import annotations

from typing import Any


def filter_nulls(value: Any) -> Any:
    if isinstance(value, dict):
        return {k: filter_nulls(v) for k, v in value.items() if v is not None}
    return value


def merge_patch(existing: Any, patch: Any) -> Any:
    """Shallow merge + null-delete; non-object operands: patch wins."""
    if isinstance(existing, dict) and isinstance(patch, dict):
        merged = {**existing, **patch}
        return filter_nulls(merged)
    return filter_nulls(patch)
