"""Collection query planner + executor: the Spark re-expression of
HyperbusAdapter.selectCollection (HyperbusAdapter.scala:139-309).

Planning is the ported pure-Python logic (weigh every NORMAL index plus
the implicit id-ordered base table, pick the max; extract sargable
conjuncts for the chosen sort key; derive the usable ORDER BY prefix).
Execution is a DataFrame pipeline:

    chosen_source.filter(pushed conjuncts)      # parquet pushdown
                 .filter(compiled residual)     # expression language → Column
                 .orderBy(...).limit(...)       # TakeOrderedAndProject

For an exact sort match the ORDER BY runs on the physical sort columns
(typed: text lexicographic / decimal numeric — the index tables'
clustering-key semantics, db/scheme.cql:62-108). For an inexact match
the reference over-fetches pageSize+skipMax rows and sorts in memory
with dynamic type semantics (HyperbusAdapter.scala:181-197,341-376);
we do the same with the budget enforced, erroring beyond it.

:func:`DocumentStore.query_paged` (attached here) is the REST keyset
pagination loop (queryUntilFetched, HyperbusAdapter.scala:268-309):
bounded number of storage selects, adaptive fetch growth, least-rows
resume filters from the ported IndexLogic.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..expression.compiler import CompileError, apply_filter
from ..expression.evaluator import EvalError, evaluate, is_number, to_decimal, truthy
from ..expression.parser import parse
from ..paths import is_collection_uri
from ..plans.field_filters import FieldFiltersExtractor
from ..plans.index_logic import (
    least_rows_filter_fields,
    merge_least_query_filter_fields,
    table_field_name,
    weigh_index,
)
from ..plans.model import (
    DECIMAL,
    STATUS_NORMAL,
    CkField,
    FieldFilter,
    FilterOp,
    SortBy,
    SortItem,
)
from ..plans.order_fields import extract_index_sort_fields
from .documents import (
    CONTENT,
    CONTENT_SPARK,
    DocumentStore,
    IndexDef,
    NotFoundError,
    index_spark_schema,
)

DEFAULT_PAGE_SIZE = 100  # HyperbusAdapter.scala:35
DEFAULT_MAX_SKIPPED_ROWS = 10000  # HyperbusAdapter.scala:33
MAX_COLLECTION_SELECTS = 20  # HyperbusAdapter.scala:34


class QueryBudgetExceeded(RuntimeError):
    """query-skipped-rows-limited / query-count-limited parity."""


@dataclass
class PlanInfo:
    """What the planner chose — the analog of QueryCollectionsSpec's
    ``verify(db).select...`` plan assertions."""

    table_name: str  # "content" (base) or the index's physical table name
    index_id: Optional[str]
    filter_fields: list[FieldFilter] = field(default_factory=list)
    ck_fields: list[CkField] = field(default_factory=list)
    reversed: bool = False
    exact_sort: bool = True
    residual_compiled: bool = True
    # the chosen index's own clustering order [(physical col, asc)] —
    # the result order when the query asks for no explicit sort
    default_order: list[tuple[str, bool]] = field(default_factory=list)
    # histogram/NDV row estimate for the sargable conjuncts (None until
    # the collection is ANALYZEd — store/stats.py; a reference
    # future-work item, README «Что на будущее»)
    estimated_rows: Optional[int] = None


@dataclass
class QueryResult:
    items: list[Any]
    revision: Optional[int]
    plan: PlanInfo

    def hal(self) -> dict:
        """HAL assembly (HyperbusAdapter.scala:117-135)."""
        return {"_embedded": {"els": self.items}}


def _lit_for(ff: FieldFilter, decimal_col: bool):
    from ..expression.evaluator import canonical_str

    if decimal_col:
        return F.lit(to_decimal(ff.value)).cast("decimal(38,12)")
    return F.lit(ff.value if isinstance(ff.value, str) else canonical_str(ff.value))


def _null_value_cond(c, op: FilterOp):
    """Pushed-filter condition for a NULL comparand. Sort columns store
    NULL for missing/containerized fields, and Spark orders them
    NULLS-FIRST ascending / NULLS-LAST descending — a '' literal (the
    old canonical_str(None) translation) matched neither, so keyset
    pages resuming from a NULL-valued row silently dropped the rest of
    the NULL group."""
    return {
        FilterOp.EQ: c.isNull(),
        FilterOp.GT: c.isNotNull(),  # asc resume: everything past the leading NULL run
        FilterOp.GTEQ: F.lit(True),
        FilterOp.LT: F.lit(False),  # desc resume: nothing sorts below the trailing NULLs
        FilterOp.LTEQ: c.isNull(),
    }[op]


def _apply_field_filters(df: DataFrame, filters: list[FieldFilter], decimal_cols: set[str]) -> DataFrame:
    from ..expression.evaluator import EvalError

    for ff in filters:
        c = F.col(ff.name)
        if ff.value is None:
            df = df.filter(_null_value_cond(c, ff.op))
            continue
        try:
            v = _lit_for(ff, ff.name in decimal_cols)
        except EvalError:
            # no typed scalar form (array/object literal, or a
            # non-numeric constant against a decimal column). Only
            # NULL-celled rows could still satisfy the TRUE predicate
            # (containers have no sort value, so their rows store
            # NULL) — keep those for the residual filter on equality;
            # ordering against an unconvertible constant eval-errors
            # per row, which rejects, so ranges push FALSE.
            df = df.filter(c.isNull() if ff.op == FilterOp.EQ else F.lit(False))
            continue
        cond = {
            FilterOp.EQ: c == v,
            FilterOp.GT: c > v,
            FilterOp.GTEQ: c >= v,
            FilterOp.LT: c < v,
            FilterOp.LTEQ: c <= v,
        }[ff.op]
        df = df.filter(cond)
    return df


def _apply_residual(df: DataFrame, filter_ast) -> tuple[DataFrame, bool]:
    """Apply the full filter as the residual predicate (prepared frame —
    one JSON parse per row); fall back to an Arrow-batched Python
    evaluator only for non-compilable constructs."""
    try:
        return apply_filter(df, filter_ast, json_col="body", json_only=True), True
    except CompileError:
        from pyspark.sql.types import BooleanType

        @F.pandas_udf(BooleanType())
        def residual(bodies):
            import pandas as pd

            def ok(b):
                if b is None:
                    return False
                try:
                    v = json.loads(b)
                    ctx = v if isinstance(v, dict) else {}
                    return bool(truthy(evaluate(filter_ast, ctx)))
                except (EvalError, ValueError):
                    return False

            return pd.Series([ok(b) for b in bodies])

        return df.filter(residual(F.col("body"))), False


def query(
    store: DocumentStore,
    uri: str,
    filter: Optional[str] = None,
    sort: Optional[list[SortBy]] = None,
    size: int = DEFAULT_PAGE_SIZE,
    skip_max: int = DEFAULT_MAX_SKIPPED_ROWS,
) -> QueryResult:
    """Query a collection: filter/sort/size/skipMax
    (HyperbusAdapter.scala:93-136 queryCollection)."""
    if not (is_collection_uri(uri)):
        raise ValueError(f"{uri!r} is not a collection URI")
    static = store._get_static(uri)
    if static is None or static["is_deleted"]:
        raise NotFoundError(uri)

    sort = list(sort or [])
    plan, df, filter_ast = _plan(store, uri, filter, sort)

    if plan.exact_sort:
        order = _physical_order(plan)
        fetched = (df.orderBy(*order) if order else df).limit(size).collect()
        # body can be NULL on a live row (reference parity: a PATCH whose
        # merge result is Null stores body=None with isDeleted=false,
        # PrimaryWorker.mergeBody) — surface as None, never crash
        items = [json.loads(r.body) if r.body is not None else None for r in fetched]
    else:
        budget = size + skip_max
        fetched = df.limit(budget + 1).collect()
        if len(fetched) > budget:
            raise QueryBudgetExceeded(f"Maximum skipped row limit is reached: {skip_max}")
        rows = _collection_ordering_sort(
            [json.loads(r.body) if r.body is not None else None for r in fetched], sort
        )
        items = rows[:size]

    return QueryResult(items, static["revision"], plan)


def _plan(store: DocumentStore, uri: str, filter: Optional[str], sort: list[SortBy]):
    # a collection created before its template registers still gets the
    # template's index on first query (lazy instantiation + backfill)
    store.instantiate_templates(uri)
    filter_ast = parse(filter) if filter else None
    def_id_sort = SortItem("id", "text", "asc")

    # candidate sources: NORMAL indexes (+ implicit trailing id sort) and
    # the id-ordered base table (HyperbusAdapter.scala:144-161)
    candidates: list[tuple[int, list[SortItem], Optional[IndexDef]]] = []
    if filter or sort:
        for idef in store.index_defs(uri):
            if idef.status != STATUS_NORMAL:
                continue
            index_sort = idef.sort_by_with_id
            f_ast = parse(idef.filter_by) if idef.filter_by else None
            candidates.append((weigh_index(filter_ast, sort, f_ast, index_sort), index_sort, idef))
    candidates.append((weigh_index(filter_ast, sort, None, [def_id_sort]), [def_id_sort], None))

    # reduceLeft((l,r) => if (l._1 > r._1) l else r): ties go to the LATER
    # candidate, and the base table is appended last
    # (HyperbusAdapter.scala:161-163)
    best = candidates[0]
    for c in candidates[1:]:
        if c[0] >= best[0]:
            best = c
    _, index_sort_fields, idef = best

    ffe = FieldFiltersExtractor(index_sort_fields)
    filter_fields = ffe.extract(filter_ast) if filter_ast is not None else []
    ck_fields, reversed_ = extract_index_sort_fields(sort, index_sort_fields)
    exact = len(ck_fields) == len(sort) or not sort

    if idef is None:
        df = store.storage.spark_df_or_empty(store.spark, CONTENT, CONTENT_SPARK)
        df = df.filter(
            (F.col("document_uri") == uri) & (F.col("item_id") != "") & (~F.col("is_deleted"))
        )
        # base scan pushes only the item_id bound (db/Db.scala:146-177)
        item_filters = [f for f in filter_fields if f.name == "item_id"]
        df = _apply_field_filters(df, item_filters, set())
        plan = PlanInfo(CONTENT, None, item_filters, ck_fields, reversed_, exact)
    else:
        df = store.storage.spark_df_or_empty(
            store.spark, idef.storage_table, index_spark_schema(idef.sort_by)
        )
        decimal_cols = {
            name
            for i, s in enumerate(idef.sort_by)
            if (name := _field_name(idef, i)) != "item_id" and s.effective_type == DECIMAL
        }
        df = _apply_field_filters(df, filter_fields, decimal_cols)
        plan = PlanInfo(idef.table_name, idef.index_id, filter_fields, ck_fields, reversed_, exact)
        # the reference returns MV rows in the index table's clustering
        # order (sort columns per DDL asc/desc, then item_id) even when
        # the query asks for no sort — record it for _physical_order
        plan.default_order = [
            (_field_name(idef, i), (s.order or "asc") != "desc")
            for i, s in enumerate(idef.sort_by)
        ] + [("item_id", True)]

    if filter_ast is not None:
        df, compiled = _apply_residual(df, filter_ast)
        plan.residual_compiled = compiled

    from .stats import estimate_rows

    plan.estimated_rows = estimate_rows(store, uri, filter_ast)
    return plan, df, filter_ast


def _field_name(idef: IndexDef, i: int) -> str:
    from ..plans.index_logic import table_field_name

    return table_field_name(idef.sort_by[i], len(idef.sort_by), i)


def _physical_order(plan: PlanInfo):
    """ORDER BY on the chosen source's physical sort columns. For the
    base table the implicit order is item_id asc unless reversed
    (queryAndFilterRows, HyperbusAdapter.scala:203-209)."""
    if plan.index_id is None:
        asc = next((ck.ascending for ck in plan.ck_fields if ck.name == "item_id"), True)
        return [F.col("item_id").asc() if asc else F.col("item_id").desc()]
    if not plan.ck_fields and plan.default_order:
        # no explicit sort: the index's own clustering order (flipped
        # when the scan direction is reversed)
        return [
            F.col(name).asc() if asc != plan.reversed else F.col(name).desc()
            for name, asc in plan.default_order
        ]
    order = [F.col(ck.name).asc() if ck.ascending else F.col(ck.name).desc() for ck in plan.ck_fields]
    # stabilize with item_id: the implicit trailing clustering key is
    # ALWAYS asc in the index DDL (sort_by_with_id's defIdSort), so its
    # scan direction follows plan.reversed — NOT the previous field's
    # own direction (a desc-DDL column scanned forward still pages ties
    # by item_id asc; least_rows_filter_fields computes the resume op
    # from reversed ^ asc(id)=True, and the two must agree or keyset
    # paging re-fetches/skips rows inside tie groups)
    if not any(ck.name == "item_id" for ck in plan.ck_fields):
        order.append(F.col("item_id").desc() if plan.reversed else F.col("item_id").asc())
    return order


def _collection_ordering_sort(items: list[Any], sort: list[SortBy]) -> list[Any]:
    """CollectionOrdering port: multi-field, numeric iff both numbers,
    else canonical-string comparison (HyperbusAdapter.scala:341-376)."""
    import functools

    from ..expression.evaluator import canonical_str

    def extract(item, name):
        cur = item if isinstance(item, dict) else {}
        for seg in name.split("."):
            if isinstance(cur, dict) and seg in cur:
                cur = cur[seg]
            else:
                return None
        return cur

    def cmp_values(x, y):
        if is_number(x) and is_number(y):
            a, b = to_decimal(x), to_decimal(y)
        else:
            try:
                a, b = canonical_str(x), canonical_str(y)
            except EvalError:
                a, b = str(x), str(y)
        return (a > b) - (a < b)

    def cmp(xi, yi):
        for sb in sort:
            xv, yv = extract(xi, sb.field_name), extract(yi, sb.field_name)
            c = cmp_values(yv, xv) if sb.descending else cmp_values(xv, yv)
            if c != 0:
                return c
        return 0

    return sorted(items, key=functools.cmp_to_key(cmp))


def _resume_value_from_row(index_sort_fields: list, row) -> dict:
    """Synthetic resume mapping for :func:`least_rows_filter_fields`
    built from a fetched row's PHYSICAL sort columns — used when the
    row's body is None (a legal live state: PATCH merging to Null) and
    the body-path walk has nothing to extract. The physical cell is the
    committed sort position, so the keyset filters it yields are exact."""
    out: dict = {}
    size = len(index_sort_fields)
    for i, item in enumerate(index_sort_fields):
        try:
            v = row[table_field_name(item, size, i)]
        except (KeyError, ValueError, TypeError):
            continue
        if v is None:
            continue
        cur = out
        segs = item.field_name.split(".")
        for seg in segs[:-1]:
            cur = cur.setdefault(seg, {})
        cur[segs[-1]] = v
    return out


def query_paged(
    store: DocumentStore,
    uri: str,
    filter: Optional[str] = None,
    sort: Optional[list[SortBy]] = None,
    size: int = DEFAULT_PAGE_SIZE,
    skip_max: int = DEFAULT_MAX_SKIPPED_ROWS,
) -> QueryResult:
    """The REST fetch loop: keyset pagination with guardrails
    (queryUntilFetched, HyperbusAdapter.scala:268-309). Functionally
    equivalent to :func:`query` for exact-sort queries, but scans in
    bounded pages with least-rows resume filters — ≤20 storage selects,
    adaptive fetch growth, skipped-row budget."""
    sort = list(sort or [])
    static = store._get_static(uri)
    if static is None or static["is_deleted"]:
        raise NotFoundError(uri)

    plan, _, filter_ast = _plan(store, uri, filter, sort)
    if not plan.exact_sort:
        return query(store, uri, filter, sort, size, skip_max)

    index_sort_fields = (
        next(d for d in store.index_defs(uri) if d.index_id == plan.index_id).sort_by_with_id
        if plan.index_id is not None
        else [SortItem("id", "text", "asc")]
    )

    def residual_ok(body) -> bool:
        # queryAndFilterRows: per-row residual eval, error ⇒ rejected
        # (HyperbusAdapter.scala:236-243)
        if filter_ast is None:
            return True
        try:
            return bool(truthy(evaluate(filter_ast, body if isinstance(body, dict) else {})))
        except EvalError:
            return False

    items: list[Any] = []
    selects: list[dict] = []  # plan trace: one entry per storage select
    least: list[FieldFilter] = []
    skipped = 0
    recursion = 0
    last_value: Optional[dict] = None
    last_row = None  # persists across pages: an EMPTY page must shrink
    # the resume (reached_end) from the previous page's position, not
    # lose it
    while True:
        if recursion >= MAX_COLLECTION_SELECTS:
            raise QueryBudgetExceeded(f"Maximum query count is reached: {recursion}")
        if skipped >= skip_max:
            raise QueryBudgetExceeded(f"Maximum skipped row limit is reached: {skipped}")
        fetch_limit = size + max(
            int(recursion * (skip_max - size) / (MAX_COLLECTION_SELECTS * 1.0)), 0
        )

        merged = merge_least_query_filter_fields(plan.filter_fields, least)
        _, df, _ = _plan_raw(store, uri, plan, merged)
        order = _physical_order(plan)
        fetched = df.orderBy(*order).limit(fetch_limit).collect()
        selects.append({"table": plan.table_name, "filters": merged, "limit": fetch_limit})

        accepted = []
        for r in fetched:
            body = json.loads(r.body) if r.body is not None else None
            last_value = body
            last_row = r
            if residual_ok(body):
                accepted.append(body)
        items.extend(accepted)
        total_fetched = len(fetched)

        # deliberately the reference's per-CALL accepted count, not the
        # accumulated total (queryUntilFetched, HyperbusAdapter.scala:
        # 316-318 `totalAccepted >= ops.limit`) — it may issue extra
        # selects after enough rows accumulate, but reproduces the
        # reference's select traces exactly
        if len(accepted) >= size or (
            (not least or (len(least) == 1 and least[0].op != FilterOp.EQ))
            and total_fetched < fetch_limit
        ):
            break
        if last_row is None:
            break  # nothing EVER fetched — no resume position exists.
            # (An empty page after non-empty ones proceeds: reached_end
            # is True and the shrink widens the previous resume.)
        if last_value is None:
            # a LIVE row may legally carry body=None (a PATCH merging to
            # Null stores body=None, is_deleted=false) — review r12:
            # breaking here silently truncated pagination while query()
            # over the same data kept going. Resume from the fetched
            # row's PHYSICAL sort cells instead; the committed cell is
            # the authoritative keyset position regardless of the body.
            last_value = _resume_value_from_row(index_sort_fields, last_row)
        # prev size = the MERGED filter just issued (EQ prefix + resume
        # — the convention the reference's shrink vectors pin), not the
        # resume-only count: with an EQ query filter on a sort prefix,
        # passing len(least) made the shrink land below start_index —
        # an empty resume that ended pagination with rows unread
        # (review r12)
        next_least = least_rows_filter_fields(
            index_sort_fields,
            plan.filter_fields,
            len(merged) if least else 0,
            total_fetched < fetch_limit,
            last_value,
            plan.reversed,
        )
        if not next_least:
            break
        least = next_least
        recursion += 1
        skipped += total_fetched - len(accepted)

    result = QueryResult(items[:size], static["revision"], plan)
    result.selects = selects
    return result


def _plan_raw(store: DocumentStore, uri: str, plan: PlanInfo, filters: list[FieldFilter]):
    """Rebuild the chosen source DataFrame with an explicit pushed-filter
    set (used by the paging loop to apply merged least-rows filters)."""
    if plan.index_id is None:
        df = store.storage.spark_df_or_empty(store.spark, CONTENT, CONTENT_SPARK)
        df = df.filter(
            (F.col("document_uri") == uri) & (F.col("item_id") != "") & (~F.col("is_deleted"))
        )
        df = _apply_field_filters(df, [f for f in filters if f.name == "item_id"], set())
    else:
        idef = next(d for d in store.index_defs(uri) if d.index_id == plan.index_id)
        df = store.storage.spark_df_or_empty(
            store.spark, idef.storage_table, index_spark_schema(idef.sort_by)
        )
        decimal_cols = {
            name
            for i, s in enumerate(idef.sort_by)
            if (name := _field_name(idef, i)) != "item_id" and s.effective_type == DECIMAL
        }
        df = _apply_field_filters(df, filters, decimal_cols)
    return plan, df, None


def explain(
    store: DocumentStore,
    uri: str,
    filter: Optional[str] = None,
    sort: Optional[list[SortBy]] = None,
) -> PlanInfo:
    """Plan a collection query without executing it — the `explain`
    surface the reference lists as future work (README «Что на
    будущее»): which access path (base/MV), pushed conjuncts, ORDER BY
    prefix, scan direction, exact-vs-residual sort."""
    plan, _, _ = _plan(store, uri, filter, list(sort or []))
    return plan


# attach as DocumentStore methods
DocumentStore.query = lambda self, uri, filter=None, sort=None, size=DEFAULT_PAGE_SIZE, skip_max=DEFAULT_MAX_SKIPPED_ROWS: query(  # noqa: E731
    self, uri, filter, sort, size, skip_max
)
DocumentStore.query_paged = lambda self, uri, filter=None, sort=None, size=DEFAULT_PAGE_SIZE, skip_max=DEFAULT_MAX_SKIPPED_ROWS: query_paged(  # noqa: E731
    self, uri, filter, sort, size, skip_max
)
DocumentStore.explain = lambda self, uri, filter=None, sort=None: explain(  # noqa: E731
    self, uri, filter, sort
)
