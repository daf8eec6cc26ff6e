"""Property-based tests (hypothesis) for the pure-Python kernels whose
correctness everything else leans on: merge-patch and the expression
evaluator/parser pair."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from hyper_storage_spark.store.merge import filter_nulls, merge_patch

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(-1000, 1000),
    st.text(max_size=8),
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=4), children, max_size=4),
    ),
    max_leaves=12,
)


def no_nulls_in_object_tree(v) -> bool:
    """Null-free through OBJECT fields only: the reference's
    filterNulls visitor returns lists verbatim (visitLst(d) = d,
    PrimaryWorker.scala:59), so nulls inside list subtrees survive —
    by design, and our filter_nulls matches."""
    if isinstance(v, dict):
        return all(x is not None and no_nulls_in_object_tree(x) for x in v.values())
    return True


@settings(max_examples=200, deadline=None)
@given(existing=json_values, patch=json_values)
def test_merge_patch_strips_nulls_in_object_tree(existing, patch):
    assert no_nulls_in_object_tree(merge_patch(existing, patch))


def test_nulls_inside_lists_survive_like_reference():
    # pinned example: visitLst returns the list unchanged
    assert filter_nulls({"a": [{"b": None}], "c": None}) == {"a": [{"b": None}]}


@settings(max_examples=200, deadline=None)
@given(existing=json_values, patch=json_values)
def test_merge_patch_is_idempotent(existing, patch):
    once = merge_patch(existing, patch)
    assert merge_patch(once, patch) == once


@settings(max_examples=200, deadline=None)
@given(
    existing=st.dictionaries(st.text(max_size=4), json_scalars, max_size=5),
    patch=st.dictionaries(st.text(max_size=4), json_scalars, max_size=5),
)
def test_merge_patch_shallow_semantics(existing, patch):
    """The reference's merge is SHALLOW: patch keys win wholesale,
    null patch values delete, untouched keys survive (minus their own
    nulls)."""
    out = merge_patch(existing, patch)
    for k, v in patch.items():
        if v is None:
            assert k not in out
        else:
            assert out[k] == filter_nulls(v)
    for k, v in existing.items():
        if k not in patch and v is not None:
            assert out[k] == filter_nulls(v)


@settings(max_examples=100, deadline=None)
@given(value=json_values)
def test_filter_nulls_is_idempotent_and_json_stable(value):
    once = filter_nulls(value)
    assert filter_nulls(once) == once
    json.dumps(once)  # always serializable
