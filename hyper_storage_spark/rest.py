"""REST façade over the document store — the reference's front door
re-expressed as a library surface.

The reference exposes the store through hyperbus HTTP routes
(HyperbusAdapter.scala: get/put/patch/delete/post + collection query);
this module maps the same verb/path/params surface onto
:class:`~hyper_storage_spark.store.DocumentStore` calls and returns
(status, body, headers) triples with the reference's semantics:

- ``GET doc`` → 200 + body + ``revision`` header; missing → 404
- ``GET collection~`` → 200 + HAL (``_embedded.els``) + collection
  revision; query params ``filter`` (expression DSL), ``sort``
  (``a,-b`` = a asc, b desc), ``size``, ``paged`` (keyset fetch loop)
- ``PUT`` → 201 on create / 200 on replace, new revision header
- ``POST collection~`` → 201 + generated item id + ``location``
- ``PATCH`` → 200 merge-patch (null deletes fields); missing → 404
- ``DELETE`` → 200 tombstone; missing → 404
- invalid path / non-collection query → 400; skipped-row budget
  exhausted → 416 (the fetch-loop guardrail, QueryBudgetExceeded)

This is a thin adapter by design: every semantic lives in the store /
planner; the façade only translates verbs, params, and errors.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from .plans import SortBy
from .store import DocumentStore, NotFoundError, QueryBudgetExceeded


@dataclass
class RestResponse:
    status: int
    body: Any = None
    headers: dict[str, str] = field(default_factory=dict)


def parse_sort(sort: Optional[str]) -> list[SortBy]:
    """``"a,-b"`` → [SortBy(a), SortBy(b, descending=True)]."""
    if not sort:
        return []
    out = []
    for part in sort.split(","):
        part = part.strip()
        if not part:
            continue
        if part.startswith("-"):
            out.append(SortBy(part[1:], descending=True))
        else:
            out.append(SortBy(part))
    return out


class RestFacade:
    def __init__(self, store: DocumentStore):
        self.store = store

    # -- verb handlers -------------------------------------------------------

    def get(
        self,
        path: str,
        filter: Optional[str] = None,
        sort: Optional[str] = None,
        size: Optional[int] = None,
        paged: bool = False,
    ) -> RestResponse:
        try:
            if path.endswith("~"):
                kwargs: dict[str, Any] = {
                    "filter": filter,
                    "sort": parse_sort(sort),
                }
                if size is not None:
                    kwargs["size"] = size
                res = (
                    self.store.query_paged(path, **kwargs)
                    if paged
                    else self.store.query(path, **kwargs)
                )
                return RestResponse(200, res.hal(), {"revision": str(res.revision)})
            if filter is not None or sort is not None or size is not None or paged:
                # query params on a non-collection path: answering with
                # the full document would silently pretend the filter
                # was applied — 400, the documented reference semantics
                return RestResponse(
                    400, {"error": f"{path!r} is not a collection URI"}
                )
            body, revision = self.store.get(path)
            return RestResponse(200, body, {"revision": str(revision)})
        except NotFoundError:
            return RestResponse(404)
        except QueryBudgetExceeded as e:
            return RestResponse(416, {"error": str(e)})
        except ValueError as e:
            return RestResponse(400, {"error": str(e)})

    def put(self, path: str, body: Any) -> RestResponse:
        try:
            created, revision = self.store.put(path, body)
            return RestResponse(201 if created else 200, None, {"revision": str(revision)})
        except ValueError as e:
            return RestResponse(400, {"error": str(e)})

    def post(self, path: str, body: Any) -> RestResponse:
        """POST to a collection: server-generated item id (the
        reference's POST→PUT id-generation, L14)."""
        try:
            item_path, revision = self.store.post(path, body)
            return RestResponse(
                201,
                {"id": item_path.rsplit("/", 1)[-1]},
                {"revision": str(revision), "location": item_path},
            )
        except ValueError as e:
            return RestResponse(400, {"error": str(e)})

    def patch(self, path: str, body: Any) -> RestResponse:
        try:
            _, revision = self.store.patch(path, body)
            return RestResponse(200, None, {"revision": str(revision)})
        except NotFoundError:
            return RestResponse(404)
        except ValueError as e:
            return RestResponse(400, {"error": str(e)})

    def delete(self, path: str) -> RestResponse:
        try:
            revision = self.store.delete(path)
            return RestResponse(200, None, {"revision": str(revision)})
        except NotFoundError:
            return RestResponse(404)
        except ValueError as e:
            return RestResponse(400, {"error": str(e)})

    # -- generic dispatch ----------------------------------------------------

    def handle(self, method: str, path: str, body: Any = None, **params) -> RestResponse:
        m = method.upper()
        if m == "GET":
            return self.get(path, **params)
        if m == "PUT":
            return self.put(path, body)
        if m == "POST":
            return self.post(path, body)
        if m == "PATCH":
            return self.patch(path, body)
        if m == "DELETE":
            return self.delete(path)
        return RestResponse(405, {"error": f"method {method!r} not allowed"})
