"""Template indexes (store/documents.py create_index_template): one
definition applied to every collection matching a URI pattern — the
reference's «template indexes» future-work item, composed from the
existing index lifecycle."""

import pytest

from hyper_storage_spark.plans.model import STATUS_NORMAL, SortBy, SortItem
from hyper_storage_spark.store import DocumentStore, NotFoundError


@pytest.fixture()
def store(spark, tmp_path):
    return DocumentStore(str(tmp_path / "store"), spark=spark)


def _rating_sort():
    return [SortItem("rating", "decimal", "asc")]


def test_template_applies_to_matching_collections(store):
    store.create_index_template("users/*/posts~", "by_rating", _rating_sort())
    store.put("users/alice/posts~/p1", {"rating": 5})
    store.put("users/bob/posts~/p1", {"rating": 3})
    store.put("groups/g1~/x", {"rating": 1})  # different shape: no match
    for uri in ("users/alice/posts~", "users/bob/posts~"):
        defs = store.index_defs(uri)
        assert [d.index_id for d in defs] == ["by_rating"]
        assert defs[0].status == STATUS_NORMAL
    assert store.index_defs("groups/g1~") == []


def test_template_index_is_maintained_and_queried(store):
    store.create_index_template("users/*/posts~", "by_rating", _rating_sort())
    for i, r in enumerate([7, 3, 9, 1]):
        store.put(f"users/alice/posts~/p{i}", {"rating": r})
    res = store.query("users/alice/posts~", sort=[SortBy("rating")])
    assert res.plan.index_id == "by_rating"
    assert [b["rating"] for b in res.items] == [1, 3, 7, 9]


def test_template_backfills_preexisting_collection_on_query(store):
    # the collection exists BEFORE the template: the first query
    # instantiates the index and backfills the existing items
    for i, r in enumerate([4, 2, 8]):
        store.put(f"users/carol/posts~/p{i}", {"rating": r})
    store.create_index_template("users/*/posts~", "by_rating", _rating_sort())
    res = store.query("users/carol/posts~", sort=[SortBy("rating")])
    assert res.plan.index_id == "by_rating"
    assert [b["rating"] for b in res.items] == [2, 4, 8]


def test_template_with_filter_by(store):
    store.create_index_template(
        "feeds/*~", "hot_only", _rating_sort(), filter_by="rating > 5"
    )
    for i, r in enumerate([2, 6, 9]):
        store.put(f"feeds/tech~/e{i}", {"rating": r})
    res = store.query("feeds/tech~", filter="rating > 5", sort=[SortBy("rating")])
    assert res.plan.index_id == "hot_only"
    assert [b["rating"] for b in res.items] == [6, 9]


def test_delete_template_stops_future_instantiation_only(store):
    store.create_index_template("users/*/posts~", "by_rating", _rating_sort())
    store.put("users/dave/posts~/p0", {"rating": 1})
    store.delete_index_template("users/*/posts~", "by_rating")
    store.put("users/erin/posts~/p0", {"rating": 2})
    # dave keeps the concrete index; erin never gets one
    assert [d.index_id for d in store.index_defs("users/dave/posts~")] == ["by_rating"]
    assert store.index_defs("users/erin/posts~") == []
    with pytest.raises(NotFoundError):
        store.delete_index_template("users/*/posts~", "by_rating")


def test_template_validation(store):
    with pytest.raises(ValueError):
        store.create_index_template("users/*/doc", "t", _rating_sort())  # not a collection
    with pytest.raises(ValueError):
        store.create_index_template("a~", "", _rating_sort())  # id required
    with pytest.raises(ValueError):
        store.create_index_template("a~", "t", [], filter_by="((broken")
    store.create_index_template("a~", "t", _rating_sort())
    with pytest.raises(ValueError):
        store.create_index_template("a~", "t", _rating_sort())  # duplicate


def test_two_templates_sharing_an_index_id_first_match_wins(store):
    # both patterns match the collection and share an index_id: the
    # first instantiates, the second must be skipped (not crash the
    # write with "index already exists")
    store.create_index_template("users/*/posts~", "by_rating", _rating_sort())
    store.create_index_template(
        "*/alice/posts~", "by_rating", [SortItem("rating", "decimal", "desc")]
    )
    store.put("users/alice/posts~/p0", {"rating": 4})
    defs = store.index_defs("users/alice/posts~")
    assert [d.index_id for d in defs] == ["by_rating"]
    assert defs[0].sort_by[0].order == "asc"  # the first template's definition
    # and the collection stays writable afterwards
    store.put("users/alice/posts~/p1", {"rating": 5})


def test_wildcard_matches_exactly_one_segment(store):
    store.create_index_template("users/*/posts~", "by_rating", _rating_sort())
    store.put("users/a/b/posts~/p0", {"rating": 1})  # extra segment: no match
    store.put("users/posts~/p0", {"rating": 1})  # missing segment: no match
    assert store.index_defs("users/a/b/posts~") == []
    assert store.index_defs("users/posts~") == []


def test_recreated_collection_gets_template_index_again(store):
    """Deleting a collection drops its indexes; a RE-created collection
    must get template-mandated indexes back (the memo is forgotten on
    collection delete)."""
    store.create_index_template("users/*/posts~", "by_rating", _rating_sort())
    store.put("users/f/posts~/p0", {"rating": 1})
    assert [d.index_id for d in store.index_defs("users/f/posts~")] == ["by_rating"]
    store.delete("users/f/posts~")
    assert store.index_defs("users/f/posts~") == []  # completion dropped it
    store.put("users/f/posts~/p1", {"rating": 2})
    assert [d.index_id for d in store.index_defs("users/f/posts~")] == ["by_rating"]
