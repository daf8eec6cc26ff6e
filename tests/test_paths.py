"""Path routing vectors from ContentLogicSpec.scala:7-41."""

import pytest

from hyper_storage_spark.paths import ResourcePath, split_path


def test_document_path():
    assert split_path("abc/123") == ResourcePath("abc/123", "")


def test_collection_item_path():
    assert split_path("some/other/document~/item") == ResourcePath("some/other/document~", "item")


def test_collection_itself():
    assert split_path("collection-1~") == ResourcePath("collection-1~", "")


@pytest.mark.parametrize(
    "bad",
    ["/abc", "abc/", "ab//cd", "", "a b", "a\tb"],
)
def test_invalid_paths(bad):
    with pytest.raises(ValueError):
        split_path(bad)
