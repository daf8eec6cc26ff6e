"""Collection statistics: ANALYZE + planner row estimates.

The reference's future-work list (README «Что на будущее») names
"histograms/statistics" as an unbuilt feature; this module builds it
the Spark way:

- :func:`analyze_collection` scans a collection ONCE with Spark
  (JVM-side ``get_json_object`` field extraction + one aggregate pass,
  plus one bucketing pass for numeric histograms — never a driver-side
  row loop) and commits per-field statistics (row/non-null counts,
  exact NDV, min/max, an equi-width histogram) to a
  ``collection_stats`` table through the same atomic manifest flip as
  every other store table.
- :func:`estimate_rows` turns a query's sargable conjuncts
  (``FieldFilter`` list, the planner's own extraction) into a row
  estimate: equality → non-null fraction / NDV; ranges → histogram
  mass with linear interpolation inside the boundary bucket. The
  estimate rides on ``PlanInfo.estimated_rows`` and surfaces through
  ``DocumentStore.explain`` — the stats exist to explain and bound
  queries, not to change plan choice (index selection stays the
  reference's weigher, plans/index_logic.py).

At 100 TB the ANALYZE scan is the same shape as a backfill: one pass
over the collection's buckets, all aggregation map-side-combined; the
stats themselves are O(fields × histogram buckets) — driver-trivial.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from typing import Optional

import pyarrow as pa
from pyspark.sql import functions as F

from ..plans.model import DECIMAL, FieldFilter, FilterOp

STATS = "collection_stats"
STATS_SCHEMA = pa.schema(
    [
        ("document_uri", pa.string()),
        ("field_name", pa.string()),
        ("field_type", pa.string()),  # "decimal" | "text"
        ("n_rows", pa.int64()),
        ("n_nonnull", pa.int64()),
        ("ndv", pa.int64()),
        ("min_num", pa.float64()),
        ("max_num", pa.float64()),
        ("min_text", pa.string()),
        ("max_text", pa.string()),
        ("histogram", pa.string()),  # JSON [counts] per bucket
        ("bounds", pa.string()),  # JSON [edges], len(histogram)+1
        ("analyzed_at", pa.int64()),
    ]
)

DEFAULT_HISTOGRAM_BUCKETS = 16


@dataclass(frozen=True)
class FieldStats:
    field_name: str
    field_type: str
    n_rows: int
    n_nonnull: int
    ndv: int
    min_num: Optional[float]
    max_num: Optional[float]
    min_text: Optional[str]
    max_text: Optional[str]
    histogram: Optional[list[int]]  # per-bucket counts (numeric fields)
    bounds: Optional[list[float]]  # bucket edges, len(histogram)+1


def _collection_df(store, uri: str):
    from .documents import CONTENT, CONTENT_SPARK

    df = store.storage.spark_df_or_empty(store.spark, CONTENT, CONTENT_SPARK)
    return df.filter(
        (F.col("document_uri") == uri) & (F.col("item_id") != "") & (~F.col("is_deleted"))
    )


def analyze_collection(
    store,
    uri: str,
    fields: list[tuple[str, str]],
    n_hist: int = DEFAULT_HISTOGRAM_BUCKETS,
    method: str = "width",
) -> list[FieldStats]:
    """ANALYZE: compute and persist stats for the given
    ``(field_name, field_type)`` list ("decimal" or "text", the
    expression language's two declared types). Replaces any previous
    stats for the collection in one commit.

    ``method`` picks the numeric histogram family: ``"width"`` —
    equi-width buckets over [min, max] (one codegen'd floor per value;
    fine for roughly uniform fields); ``"height"`` — equi-height
    buckets with edges at approxQuantile boundaries (each bucket holds
    ~1/n of the mass, so heavy skew cannot hide inside one bucket —
    the estimator's resolution follows the data). Both store explicit
    bucket edges; the estimator never assumes a width."""
    if method not in ("width", "height"):
        raise ValueError(f"unknown histogram method: {method!r}")
    df = _collection_df(store, uri)
    cols = {}
    for name, ftype in fields:
        raw = F.get_json_object("body", f"$.{name}")
        # try_cast, not cast: bodies are schemaless JSON, and under
        # Spark 4's default ANSI mode one non-numeric value in a
        # decimal-ANALYZEd field would abort the whole scan instead of
        # NULLing the cell (review r12; the rollups/documents typing
        # paths follow the same convention)
        cols[name] = raw.try_cast("double") if ftype == DECIMAL else raw
    proj = df.select([c.alias(n) for n, c in cols.items()] or [F.lit(1).alias("__one")])

    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for name, ftype in fields:
        aggs += [
            F.count(name).alias(f"__nn_{name}"),
            F.count_distinct(name).alias(f"__ndv_{name}"),
            F.min(name).alias(f"__min_{name}"),
            F.max(name).alias(f"__max_{name}"),
        ]
    base = proj.agg(*aggs).collect()[0]
    n_rows = base["__n_rows"]

    # one extra pass for all numeric histograms together
    hist: dict[str, list[int]] = {}
    bounds: dict[str, list[float]] = {}
    numeric = [
        (name, base[f"__min_{name}"], base[f"__max_{name}"])
        for name, ftype in fields
        if ftype == DECIMAL and base[f"__min_{name}"] is not None
    ]
    if numeric:
        if method == "height":
            probs = [i / n_hist for i in range(n_hist + 1)]
            qs = proj.approxQuantile([n for n, _, _ in numeric], probs, 0.001)
            for (name, mn, mx), edges in zip(numeric, qs):
                # pin the outer edges to the exact extrema
                bounds[name] = [mn] + [float(e) for e in edges[1:-1]] + [mx]
        else:
            for name, mn, mx in numeric:
                if mx > mn:
                    width = (mx - mn) / n_hist
                    bounds[name] = [mn + i * width for i in range(n_hist)] + [mx]
                else:
                    # constant field: all edges collapse to the value
                    # (monotonic degenerate spec; all mass lands in the
                    # last, inclusive bucket) — a synthetic positive
                    # width would commit DECREASING edges
                    bounds[name] = [mn] * (n_hist + 1)
        counted = (
            proj.agg(
                *[
                    F.count(
                        F.when(
                            (F.col(name) >= bounds[name][i])
                            & (
                                (F.col(name) < bounds[name][i + 1])
                                if i < n_hist - 1
                                else (F.col(name) <= bounds[name][i + 1])
                            ),
                            1,
                        )
                    ).alias(f"__h_{name}_{i}")
                    for name, _, _ in numeric
                    for i in range(n_hist)
                ]
            )
            .collect()[0]
        )
        for name, _, _ in numeric:
            hist[name] = [counted[f"__h_{name}_{i}"] for i in range(n_hist)]

    now = int(time.time() * 1000)
    out = []
    for name, ftype in fields:
        is_num = ftype == DECIMAL
        out.append(
            FieldStats(
                field_name=name,
                field_type=ftype,
                n_rows=n_rows,
                n_nonnull=base[f"__nn_{name}"],
                ndv=base[f"__ndv_{name}"],
                min_num=base[f"__min_{name}"] if is_num else None,
                max_num=base[f"__max_{name}"] if is_num else None,
                min_text=None if is_num else base[f"__min_{name}"],
                max_text=None if is_num else base[f"__max_{name}"],
                histogram=hist.get(name),
                bounds=bounds.get(name),
            )
        )

    with store._lock:
        # _admin_commit: fresh STATS re-read per attempt, write-window
        # lock + CAS retries (the r11 admin-race discipline) — an
        # ANALYZE racing a writer fleet must not lose its flip
        def commit_stats():
            rows = [
                r for r in store.storage.bucket_rows(STATS, 0) if r["document_uri"] != uri
            ]
            for s in out:
                rows.append(
                    {
                        "document_uri": uri,
                        "field_name": s.field_name,
                        "field_type": s.field_type,
                        "n_rows": s.n_rows,
                        "n_nonnull": s.n_nonnull,
                        "ndv": s.ndv,
                        "min_num": s.min_num,
                        "max_num": s.max_num,
                        "min_text": s.min_text,
                        "max_text": s.max_text,
                        "histogram": json.dumps(s.histogram) if s.histogram is not None else None,
                        "bounds": json.dumps(s.bounds) if s.bounds is not None else None,
                        "analyzed_at": now,
                    }
                )
            store.storage.commit({(STATS, 0): rows}, {STATS: STATS_SCHEMA})

        store._admin_commit(commit_stats)
    return out


def collection_stats(store, uri: str) -> dict[str, FieldStats]:
    """Stats previously committed by :func:`analyze_collection`
    (empty dict when the collection was never analyzed)."""
    out = {}
    for r in store.storage.bucket_rows(
        STATS, 0, filters=[("document_uri", "==", uri)]
    ):
        if r["document_uri"] != uri:
            continue
        out[r["field_name"]] = FieldStats(
            field_name=r["field_name"],
            field_type=r["field_type"],
            n_rows=r["n_rows"],
            n_nonnull=r["n_nonnull"],
            ndv=r["ndv"],
            min_num=r["min_num"],
            max_num=r["max_num"],
            min_text=r["min_text"],
            max_text=r["max_text"],
            histogram=json.loads(r["histogram"]) if r["histogram"] else None,
            bounds=json.loads(r["bounds"]) if r.get("bounds") else None,
        )
    return out


def _range_fraction(s: FieldStats, op: FilterOp, value: float) -> float:
    """Mass fraction of non-null values satisfying ``op value``, from
    the histogram's explicit bucket edges (equi-width OR equi-height)
    with linear interpolation inside the boundary bucket. <= / <
    (and >= / >) share an estimate — a continuous histogram cannot
    separate them."""
    if s.min_num is None or s.max_num is None or not s.histogram or s.n_nonnull == 0:
        return 1 / 3  # the no-stats default
    if s.max_num == s.min_num:
        # the degenerate point mass IS separable exactly (review r12):
        # lumping < with <= here made frac_in(lo..hi) collapse to 0
        # for an overlapping constant-field side in estimate_join_rows
        eq_mass = 1.0 if value == s.min_num else 0.0
        below = 1.0 if value > s.min_num else 0.0
        if op == FilterOp.LT:
            return below
        if op == FilterOp.LTEQ:
            return below + eq_mass
        if op == FilterOp.GT:
            return 1.0 - below - eq_mass
        if op == FilterOp.GTEQ:
            return 1.0 - below
        return eq_mass
    k = len(s.histogram)
    edges = s.bounds
    if not edges or len(edges) != k + 1:  # stats row predating explicit edges
        width = (s.max_num - s.min_num) / k
        edges = [s.min_num + i * width for i in range(k)] + [s.max_num]
    total = sum(s.histogram) or 1
    # mass strictly-left of `value` (linear within the bucket; a
    # zero-width bucket is a point mass, fully left once value > edge)
    below = 0.0
    for i, c in enumerate(s.histogram):
        lo, hi = edges[i], edges[i + 1]
        if value >= hi:
            below += c
        elif value > lo:
            below += c * ((value - lo) / (hi - lo)) if hi > lo else c
    frac_below = min(max(below / total, 0.0), 1.0)
    if op in (FilterOp.LT, FilterOp.LTEQ):
        return frac_below
    return 1.0 - frac_below


def estimate_rows(store, uri: str, filter_ast) -> Optional[int]:
    """Row estimate for a filter over an ANALYZEd collection, or None
    when the collection has no committed stats. The filter's sargable
    conjuncts are re-extracted against the ANALYZEd field set (not the
    chosen index's sort fields — a base-table scan with a residual
    filter still gets an estimate); selectivities multiply (the
    textbook independence assumption); conjuncts the extractor cannot
    express (ors, function calls) contribute no selectivity."""
    from ..plans.field_filters import FieldFiltersExtractor
    from ..plans.model import SortItem

    stats = collection_stats(store, uri)
    if not stats:
        return None
    n_rows = next(iter(stats.values())).n_rows
    if filter_ast is None or n_rows == 0:
        return n_rows
    sel = 1.0
    for s in stats.values():
        # one single-field extractor per ANALYZEd field: the extractor
        # emits PHYSICAL index-column names, so a single-field map is
        # the clean way to attribute each conjunct to its field
        ffe = FieldFiltersExtractor([SortItem(s.field_name, s.field_type, "asc")])
        for ff in ffe.extract(filter_ast):
            nonnull_frac = s.n_nonnull / s.n_rows if s.n_rows else 0.0
            if ff.op == FilterOp.EQ:
                sel *= nonnull_frac / s.ndv if s.ndv else 0.0
                continue
            try:
                v = float(ff.value)
            except (TypeError, ValueError):
                sel *= 1 / 3  # range over a text field: no histogram
                continue
            sel *= nonnull_frac * _range_fraction(s, ff.op, v)
    return int(round(n_rows * min(max(sel, 0.0), 1.0)))


def estimate_join_rows(store, uri_a: str, uri_b: str, field: str) -> Optional[int]:
    """Equi-join cardinality estimate between two ANALYZEd collections
    on ``field``: |A|·|B| / max(ndv_A, ndv_B) — the classic
    System-R containment-of-value-sets formula, refined by the
    overlap of the two [min, max] ranges when both sides carry
    numeric bounds (disjoint ranges estimate 0; partial overlap
    scales each side's rows by its overlapping fraction via the
    committed histogram). None when either side lacks stats for the
    field.

    Extends the reference-future-work statistics surface
    (README «Что на будущее»: per-field stats → scan estimates,
    store/stats.py:estimate_rows) from scans to joins — the number a
    planner needs to pick broadcast vs shuffle BEFORE running.
    Driver-side arithmetic over two committed stats rows; no data is
    scanned."""
    sa = collection_stats(store, uri_a).get(field)
    sb = collection_stats(store, uri_b).get(field)
    if sa is None or sb is None:
        return None
    if not sa.ndv or not sb.ndv:
        return 0
    rows_a, rows_b = sa.n_nonnull, sb.n_nonnull
    ndv_a, ndv_b = sa.ndv, sb.ndv
    if (
        sa.min_num is not None and sa.max_num is not None
        and sb.min_num is not None and sb.max_num is not None
    ):
        lo = max(sa.min_num, sb.min_num)
        hi = min(sa.max_num, sb.max_num)
        if lo > hi:
            return 0
        # fraction of each side inside the shared range, histogram-aware
        def frac_in(s, lo, hi):
            f = _range_fraction(s, FilterOp.LTEQ, hi) - _range_fraction(s, FilterOp.LT, lo)
            return min(max(f, 0.0), 1.0)

        fa, fb = frac_in(sa, lo, hi), frac_in(sb, lo, hi)
        rows_a *= fa
        rows_b *= fb
        # the value-set shrinks with the range too (uniform-NDV
        # assumption): without this the restriction double-counts —
        # rows scaled down AND divided by the full-domain ndv
        ndv_a = max(1.0, ndv_a * fa)
        ndv_b = max(1.0, ndv_b * fb)
    return int(round(rows_a * rows_b / max(ndv_a, ndv_b)))


# attach as DocumentStore methods (mirrors query.py's attachment style)
from .documents import DocumentStore  # noqa: E402

DocumentStore.analyze = lambda self, uri, fields, n_hist=DEFAULT_HISTOGRAM_BUCKETS, method="width": analyze_collection(  # noqa: E731
    self, uri, fields, n_hist, method
)
DocumentStore.estimate_join_rows = lambda self, uri_a, uri_b, field: estimate_join_rows(  # noqa: E731
    self, uri_a, uri_b, field
)
DocumentStore.collection_stats = lambda self, uri: collection_stats(self, uri)  # noqa: E731
