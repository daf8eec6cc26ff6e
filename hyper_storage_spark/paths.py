"""URI path routing (reference: ContentLogic.scala:13-42).

A path like ``abc/123`` addresses a document; a path whose second-to-last
segment ends with ``~`` addresses an item inside a collection document,
e.g. ``some/other/document~/item`` → (``some/other/document~``, ``item``).
"""

from __future__ import annotations

from dataclasses import dataclass

ALLOWED_CHARS = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    "-._~:/[]@!$&'()*+,;="
)


@dataclass(frozen=True)
class ResourcePath:
    document_uri: str
    item_id: str


def is_collection_uri(path: str) -> bool:
    return path.endswith("~")


def split_path(path: str) -> ResourcePath:
    """Split a request path into (document_uri, item_id).

    Mirrors ContentLogic.splitPath (ContentLogic.scala:13-40) including its
    validation rules: no leading/trailing '/', no empty segments, restricted
    character set.
    """
    if not isinstance(path, str):
        # a nullable command schema makes None representable; every
        # caller treats ValueError as "malformed path", so raise that
        # rather than an AttributeError from None.startswith
        raise ValueError(f"{path!r} is not a valid path")
    if path.startswith("/") or path.endswith("/"):
        raise ValueError(f"{path!r} is invalid (ends or starts with '/')")
    if any(c not in ALLOWED_CHARS for c in path):
        raise ValueError(f"{path!r} contains invalid characters")
    segments = path.split("/")
    if not segments or any(s == "" for s in segments):
        raise ValueError(f"{path!r} is invalid (empty segments)")
    if len(segments) > 1 and is_collection_uri(segments[-2]):
        return ResourcePath("/".join(segments[:-1]), segments[-1])
    return ResourcePath(path, "")
