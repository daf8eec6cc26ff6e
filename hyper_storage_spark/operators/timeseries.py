"""Timeseries operators Spark lacks natively, composed from DataFrame
primitives (no Python in the row path):

- :func:`asof_join` — "last right row at or before each left row" per
  key. NOT a join at all in the physical plan: both sides union into
  one stream, one shuffle on the key, and a running ``last(...,
  ignorenulls)`` window carries the right side's payload forward. At
  100 TB this is strictly better than any join-based encoding — no
  join explosion, no range condition for the optimizer to mishandle,
  skew bounded by the window (same hazard profile as sessionization).
- :func:`range_join` — points⨝ranges by containment. The naive
  non-equi join is a BroadcastNestedLoopJoin (quadratic); here ranges
  explode into fixed-width buckets and the join runs on the bucket id
  (equi, shuffle-hash), with an exact containment filter after — the
  standard interval-bucketing trick. Shuffle volume is
  O(points + ranges × avg_span/width), tunable via ``bucket_width``.
- :func:`hypertable_rollup` — multi-resolution time_bucket rollups in
  one pass: aggregate ONCE at the finest grain, then re-aggregate each
  coarser level from the previous level's partials (counts/sums
  compose). The fact table is scanned exactly once regardless of how
  many resolutions are materialized — the continuous-aggregate shape.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Optional[Sequence[str]] = None,
    tiebreak: Optional[str] = None,
    how: str = "inner",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the matching right row in the same
    ``on`` group (inclusive — DuckDB/pandas ``merge_asof`` semantics):

    - ``backward`` (default): LAST right row with ``right_ts <= left_ts``
    - ``forward``: FIRST right row with ``right_ts >= left_ts``
    - ``nearest``: whichever of the two is closer in time; exact ties
      resolve backward (the pandas convention)

    All three run as the SAME physical shape: union both sides into
    one stream, one shuffle on the key, running ``last(..., ignore
    nulls)`` windows (forward = the mirrored descending order; nearest
    = both windows over the one sorted exchange, then a closer-of-two
    pick). Still zero joins at any scale.

    Returns all left columns plus ``right_cols``. ``how="inner"``
    drops left rows with no match; ``"left"`` keeps them with NULLs.
    ``tiebreak`` orders right rows sharing one timestamp (backward:
    last wins; forward: first wins — the mirrored convention).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join how must be 'inner' or 'left', got {how!r}")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"asof_join direction must be backward|forward|nearest, got {direction!r}"
        )
    on = list(on)
    right_cols = list(
        right_cols
        if right_cols is not None
        else [c for c in right.columns if c not in set(on) | {right_ts}]
    )
    left_payload = [c for c in left.columns if c not in set(on) | {left_ts}]
    rtypes = dict(right.dtypes)

    if not right_cols:
        raise ValueError("asof_join needs at least one right payload column")
    # name collisions would silently produce duplicate/ambiguous output
    # columns (the output is on + left payload + right_cols)
    reserved = {"__ts", "__r", "__is_left", "__tb", "__rts"}
    for group in (on, left_payload, right_cols):
        bad = reserved & set(group)
        if bad:
            raise ValueError(f"asof_join: column names {sorted(bad)} are reserved")
    dup = set(right_cols) & (set(on) | set(left_payload) | {left_ts})
    if dup:
        raise ValueError(
            f"asof_join: right_cols {sorted(dup)} collide with left columns; "
            "rename the right side before joining"
        )

    # the right payload travels as ONE struct: the running last() must
    # pick whole right ROWS, never stitch per-column (a NULL payload
    # column would otherwise inherit the value of an OLDER right row),
    # and the struct is non-null for every right row even when all its
    # fields are null — so the inner-match test is exact. The typed
    # NULL struct comes from when(false, struct(...)) so arbitrary
    # column names never pass through a DDL string. The struct also
    # carries the right row's own timestamp (``__rts``) so ``nearest``
    # can compare distances; it never reaches the output projection.
    null_struct = F.when(
        F.lit(False),
        F.struct(
            *[F.lit(None).cast(rtypes[c]).alias(c) for c in right_cols],
            F.lit(None).cast(rtypes[right_ts]).alias("__rts"),
        ),
    )
    l2 = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_payload],
        null_struct.alias("__r"),
        *(
            [F.lit(None).cast(rtypes[tiebreak]).alias("__tb")]
            if tiebreak
            else []
        ),
    )
    # a NULL-timestamp RIGHT row matches nothing (merge_asof
    # semantics, review r12): unfiltered it sorts NULLS-FIRST in the
    # backward scan and its struct carries forward as a phantom match
    # for every left row until a real right row supersedes it, while
    # forward (desc = nulls last) never sees it — direction-
    # inconsistent phantoms. The left-side NULL guard below is the
    # mirrored half of the same rule.
    r2 = right.filter(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_payload],
        F.struct(
            *[F.col(c) for c in right_cols], F.col(right_ts).alias("__rts")
        ).alias("__r"),
        *([F.col(tiebreak).alias("__tb")] if tiebreak else []),
    )
    # right rows sort BEFORE left rows at equal ts (__is_left asc), so a
    # left row sees a same-timestamp right row — the inclusive bound.
    # backward scans time ascending (last seen = max eligible ts);
    # forward scans descending (last seen = min eligible ts), with the
    # tiebreak mirrored so "first right row" wins among equal ts.
    order_back = [F.col("__ts").asc(), F.col("__is_left").asc()] + (
        [F.col("__tb").asc_nulls_first()] if tiebreak else []
    )
    order_fwd = [F.col("__ts").desc(), F.col("__is_left").asc()] + (
        [F.col("__tb").desc_nulls_first()] if tiebreak else []
    )

    def running(order):
        w = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("__r", ignorenulls=True).over(w)

    stream = l2.unionByName(r2)
    if direction == "backward":
        carried = stream.withColumn("__r", running(order_back))
    elif direction == "forward":
        carried = stream.withColumn("__r", running(order_fwd))
    else:  # nearest: both windows share the one key-partitioned exchange
        back, fwd = running(order_back), running(order_fwd)
        dist_back = F.abs(F.col("__ts").cast("double") - back["__rts"].cast("double"))
        dist_fwd = F.abs(fwd["__rts"].cast("double") - F.col("__ts").cast("double"))
        carried = stream.withColumn(
            "__r",
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(dist_back <= dist_fwd, back)  # tie → backward (pandas)
            .otherwise(fwd),
        )
    out = carried.filter(F.col("__is_left") == 1)
    # a NULL left timestamp matches NOTHING in any direction (backward
    # gets this free from asc-NULLS-FIRST ordering; forward/nearest
    # sort NULLs last where the running last() has seen every right
    # row — without this guard they "match" the extreme right row)
    out = out.withColumn("__r", F.when(F.col("__ts").isNotNull(), F.col("__r")))
    if how == "inner":
        out = out.filter(F.col("__r").isNotNull())
    return out.select(
        *on,
        F.col("__ts").alias(left_ts),
        *left_payload,
        *[F.col(f"__r.{c}").alias(c) for c in right_cols],
    )


def gapfill(
    agg: DataFrame,
    keys: Sequence[str],
    bucket_col: str,
    step: str,
    value_cols: Sequence[str],
    how: str = "locf",
) -> DataFrame:
    """Fill missing time buckets per key in an already-aggregated frame
    (the TimescaleDB ``time_bucket_gapfill`` shape): every key gets a
    dense bucket grid spanning its own [min, max] bucket, missing rows
    materialize with ``filled = true``, and value columns fill by

    - ``locf``: last observation carried forward (one running
      last(ignorenulls) window per value column — same single-shuffle
      hazard profile as sessionization),
    - ``linear``: interpolate between the surrounding observations
      (two mirrored struct-carry windows over the SAME sorted
      exchange; interior gaps only — leading/trailing gaps stay NULL,
      the TimescaleDB ``interpolate`` convention; value columns come
      back as DOUBLE), or
    - ``null``: left as NULL (the caller interpolates).

    ``step`` is a SQL interval literal body, e.g. ``"interval 1 day"``.
    The grid generates per key from its own span, so a sparse key
    contributes only its own range — grid size is Σ per-key spans, not
    global-span × keys. Scale shape: one groupBy for spans, one
    explode, one left join on (keys, bucket), one window."""
    if how not in ("locf", "linear", "null"):
        raise ValueError(f"gapfill how must be locf|linear|null, got {how!r}")
    keys = list(keys)
    value_cols = list(value_cols)
    if "filled" in agg.columns:
        raise ValueError("gapfill: input already carries a 'filled' column")
    span = agg.groupBy(*keys).agg(
        F.min(bucket_col).alias("__mn"), F.max(bucket_col).alias("__mx")
    )
    grid = span.select(
        *keys,
        F.explode(
            F.expr(f"sequence(__mn, __mx, {step})")
        ).alias(bucket_col),
    )
    # union the ACTUAL buckets: an input row off the min+k*step grid
    # would otherwise match no grid row and silently vanish from the
    # output (distinct() collapses the aligned-common case for free)
    grid = grid.unionByName(agg.select(*keys, bucket_col)).distinct()
    # presence marker, not value_cols[0].isNull(): an aggregate row
    # whose value is legitimately NULL must not read as a filled gap
    filled = (
        grid.join(agg.withColumn("__present", F.lit(1)), keys + [bucket_col], "left")
        .withColumn("filled", F.col("__present").isNull())
        .drop("__present")
    )
    if how == "locf":
        w = (
            Window.partitionBy(*keys)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in value_cols:
            filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    elif how == "linear":
        wb = (
            Window.partitionBy(*keys)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy(*keys)
            .orderBy(bucket_col)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        t = F.col(bucket_col).cast("double")
        for c in value_cols:
            # carry (bucket, value) as a struct so each neighbor's
            # value pairs with ITS OWN bucket, never a stitched mix.
            # A real row with a NULL value is NOT an observation: the
            # TimescaleDB interpolate convention bridges ACROSS it
            # (and fills it), same as the locf branch's ignorenulls
            obs = F.when(
                (~F.col("filled")) & F.col(c).isNotNull(),
                F.struct(t.alias("t"), F.col(c).cast("double").alias("v")),
            )
            prev = F.last(obs, ignorenulls=True).over(wb)
            nxt = F.first(obs, ignorenulls=True).over(wf)
            interp = prev["v"] + (nxt["v"] - prev["v"]) * (t - prev["t"]) / (
                nxt["t"] - prev["t"]
            )
            filled = filled.withColumn(
                c,
                # observed values pass through; gap rows AND real rows
                # with NULL values interpolate (interior only: both
                # neighbors must exist — leading/trailing stay NULL)
                F.coalesce(
                    F.when(~F.col("filled"), F.col(c).cast("double")),
                    F.when(prev.isNotNull() & nxt.isNotNull(), interp),
                ),
            )
    return filled


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    on: Sequence[str] = (),
) -> DataFrame:
    """points ⨝ ranges where ``lo <= point < hi`` (plus optional equi
    keys ``on``), as an EQUI join on interval buckets — never a
    BroadcastNestedLoopJoin. A range spanning k buckets appears k
    times before the exact filter; pick ``bucket_width`` near the
    typical range span so k stays small."""
    on = list(on)
    pb = points.withColumn("__b", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long"))
    rb = ranges.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    joined = pb.join(rb, on + ["__b"]).filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop("__b")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_lo: str,
    a_hi: str,
    b_lo: str,
    b_hi: str,
    bucket_width: float,
    on: Sequence[str] = (),
) -> DataFrame:
    """Interval × interval overlap join (half-open: ``[lo, hi)``
    overlap iff ``a_lo < b_hi AND b_lo < a_hi``), plus optional equi
    keys — the ranges×ranges sibling of :func:`range_join`, and like
    it never a BroadcastNestedLoopJoin: both sides explode into
    fixed-width buckets and join on the bucket id.

    A pair overlapping k shared buckets would emit k copies; instead
    of a distinct (a shuffle over the full output, and impossible
    without row identities) each pair is counted ONCE by keeping only
    the join at the FIRST shared bucket, ``max(floor(a_lo/w),
    floor(b_lo/w))`` — always within both bucket sequences when the
    intervals overlap. Output = all columns of both sides."""
    on = list(on)

    def bucketed(df, lo, hi):
        return df.withColumn(
            "__b",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / F.lit(bucket_width)).cast("long"),
                    F.floor(F.col(hi) / F.lit(bucket_width)).cast("long"),
                )
            ),
        )

    joined = (
        bucketed(a, a_lo, a_hi)
        .join(bucketed(b, b_lo, b_hi), on + ["__b"])
        .filter((F.col(a_lo) < F.col(b_hi)) & (F.col(b_lo) < F.col(a_hi)))
        .filter(
            F.col("__b")
            == F.greatest(
                F.floor(F.col(a_lo) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(b_lo) / F.lit(bucket_width)).cast("long"),
            )
        )
    )
    return joined.drop("__b")


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    resolutions: Sequence[str] = ("hour", "day", "week"),
) -> DataFrame:
    """Multi-resolution rollup: (resolution, bucket_start, n, total).

    The fact table is aggregated once at the finest resolution; every
    coarser level re-aggregates the previous level's partial sums —
    counts and (decimal) sums compose exactly, so the result equals a
    direct per-resolution aggregation while scanning the data once.

    ``resolutions`` must be ordered finest → coarsest AND each coarser
    bucket must be a union of finer buckets — composition is otherwise
    silently wrong (a week straddling a month boundary would land its
    whole partial in one month). Validated: weeks don't nest in
    months/quarters/years and vice versa."""
    _RANK = {"second": 0, "minute": 1, "hour": 2, "day": 3,
             "week": 4, "month": 4, "quarter": 5, "year": 6}
    if not resolutions:
        raise ValueError("resolutions must be non-empty")
    # each unit validated INDIVIDUALLY (review r12): the pairwise zip
    # is empty for a single-element list, and an unknown unit would
    # sail through to date_trunc, which returns NULL — the whole table
    # silently collapsed into one NULL bucket
    for res in resolutions:
        if res not in _RANK:
            raise ValueError(f"unsupported resolution {res!r}")
    for fine, coarse in zip(resolutions, resolutions[1:]):
        nests = _RANK[coarse] > _RANK[fine] and not (
            # week and month/quarter/year don't tile each other
            ("week" in (fine, coarse) and _RANK[fine] >= 4)
            or (coarse in ("month", "quarter", "year") and fine == "week")
        )
        if not nests:
            raise ValueError(
                f"{coarse!r} buckets are not unions of {fine!r} buckets; "
                "composition would be wrong — aggregate it directly from "
                "a day-or-finer level instead"
            )
    finest = resolutions[0]
    level = (
        df.groupBy(F.date_trunc(finest, F.col(ts_col)).alias("bucket_start"))
        .agg(F.count("*").alias("n"), F.sum(value_col).alias("total"))
    )
    out = level.select(F.lit(finest).alias("resolution"), "bucket_start", "n", "total")
    for res in resolutions[1:]:
        level = (
            level.groupBy(F.date_trunc(res, F.col("bucket_start")).alias("bucket_start"))
            .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
        )
        out = out.unionByName(
            level.select(F.lit(res).alias("resolution"), "bucket_start", "n", "total")
        )
    return out


def series_similarity_topk(
    events: DataFrame,
    query_id,
    k: int = 10,
    n_segments: int = 8,
    candidate_factor: int | None = 3,
    id_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Whole-series similarity search: the ``k`` entities whose daily
    value series is closest (euclidean) to ``query_id``'s — with
    PAA lower-bound pruning and an in-plan exactness CERTIFICATE.

    Each entity's series is densified over the global day span
    (missing days = 0; the span is a bounded calendar range, so its
    length may sit on the driver) and reduced to ``n_segments``
    piecewise-aggregate means. By Cauchy-Schwarz,
    ``sqrt(w * Σ(x̄_s − ȳ_s)²) ≤ ||x − y||₂`` over the full segments
    of width w — a true lower bound, so ranking by it and verifying
    only the best ``candidate_factor * k`` candidates with the exact
    distance is safe WHEN the k-th exact distance is ≤ every pruned
    candidate's lower bound. That condition is checked in-plan and
    returned as ``certified`` on every row: true means the top-k is
    provably exact (the iSAX-style contract); false means raise
    ``candidate_factor`` — or pass ``candidate_factor=None`` for the
    exact mode (every entity verified, no pruning; certified is then
    trivially true at any corpus size). At 100 TB only the
    n_segments-float sketch participates in the ranking shuffle; full
    vectors are touched for ~candidate_factor*k rows."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    from ._caches import tracked_persist

    # persisted (review r12): the daily reduction feeds the span probe
    # AND the series build; the series frame then feeds the query-
    # existence probe, the broadcast query row, and both branches of
    # the candidate split — unpersisted, each of those five actions
    # re-ran the full events scan + aggregation
    daily = tracked_persist(
        events.groupBy(F.col(id_col).alias("sid"), day.alias("d"))
        .agg(F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double").alias("v"))
    )
    span = daily.agg(F.min("d"), F.max("d")).first()
    if span[0] is None:
        raise ValueError("series_similarity_topk: no events to search")
    d0, n_days = span[0], (span[1] - span[0]).days + 1
    w = max(n_days // n_segments, 1)
    m = n_days // w  # full segments only (LB stays valid)
    # element_at on a MAP is a key lookup (missing key => null), so the
    # day-index map is used directly — no 1-based shift needed
    vec_expr = F.transform(
        F.sequence(F.lit(0), F.lit(n_days - 1)),
        lambda i: F.coalesce(F.element_at(F.col("mp"), i.cast("int")), F.lit(0.0)),
    )
    series = tracked_persist(
        daily.withColumn("di", F.datediff(F.col("d"), F.lit(d0)))
        .groupBy("sid")
        .agg(F.map_from_arrays(F.collect_list("di"), F.collect_list("v")).alias("mp"))
        .select("sid", vec_expr.alias("vec"))
        .withColumn(
            "paa",
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.aggregate(
                    F.slice("vec", s.cast("int") * w + 1, w), F.lit(0.0), lambda a, x: a + x
                )
                / F.lit(float(w)),
            ),
        )
    )
    qrows = series.filter(F.col("sid") == query_id)
    if qrows.limit(1).count() == 0:
        raise ValueError(f"series_similarity_topk: query id {query_id!r} has no events")
    q = qrows.select(F.col("vec").alias("qvec"), F.col("paa").alias("qpaa"))
    dist2 = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda s, x: s + x
    )
    scored = (
        series.filter(F.col("sid") != query_id)
        .crossJoin(F.broadcast(q))
        .withColumn("lb", F.sqrt(F.lit(float(w)) * dist2(F.col("paa"), F.col("qpaa"))))
    )
    # candidate selection without a global row_number window (an
    # unpartitioned window funnels EVERY sketch row into one task): a
    # parallel TakeOrdered picks the n_cand best lower bounds, and the
    # bounded id set (candidate_factor × k — a config constant, not
    # data-proportional) broadcasts back for the split. Exact mode
    # (candidate_factor=None) verifies everyone and prunes nothing.
    if candidate_factor is None:
        cand_base = scored
        min_pruned_lb = scored.limit(0).agg(F.min("lb").alias("min_lb"))  # empty ⇒ NULL
    else:
        n_cand = candidate_factor * k
        cand_ids = (
            scored.orderBy(F.col("lb").asc(), F.col("sid").asc())
            .limit(n_cand)
            .select("sid")
        )
        cand_base = scored.join(F.broadcast(cand_ids), "sid")
        min_pruned_lb = scored.join(F.broadcast(cand_ids), "sid", "left_anti").agg(
            F.min("lb").alias("min_lb")
        )
    cand = cand_base.withColumn("distance", F.sqrt(dist2(F.col("vec"), F.col("qvec"))))
    # top-k: TakeOrdered down to k rows, THEN a row_number over only
    # those k (never a corpus-wide window)
    topk = (
        cand.orderBy(F.col("distance").asc(), F.col("sid").asc())
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("distance").asc(), F.col("sid").asc())
            ),
        )
    )
    kth = topk.agg(F.max("distance").alias("kth"))
    cert = kth.crossJoin(min_pruned_lb).select(
        (F.col("min_lb").isNull() | (F.col("kth") <= F.col("min_lb"))).alias("certified")
    )
    return topk.crossJoin(cert).select(
        F.col("sid").alias("neighbor_id"),
        F.round("distance", 6).alias("distance"),
        "rank",
        "certified",
    )


def interarrival_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key inter-arrival-time statistics:
    (key, n_gaps, mean_gap_us, p50_gap_us, max_gap_us) over the gaps
    between consecutive events in each key's timeline — the rate /
    burstiness profile behind ingestion sizing, bot detection, and
    session-timeout calibration (pick the session gap where p50 and
    max diverge).

    Gaps are EXACT integer microseconds (epoch-micros difference under
    the total order (ts, id)), so mean is one exact-int division and
    the median is the sort-based interpolating percentile — all
    engine-parity-safe. Keys with a single event carry no gap and drop
    out (they have no arrival process to describe).

    Scale shape: one hash shuffle on the key; the lag window and the
    sort-based percentile both work per-key, so state is bounded by
    the busiest key, never the table."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(id_col))
    gaps = (
        events.select(
            F.col(key_col),
            (
                F.unix_micros(F.col(ts_col)) - F.lag(F.unix_micros(F.col(ts_col))).over(w)
            ).alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    # mean stays UNROUNDED: it is one IEEE division of exact integers
    # (bit-identical on any engine), while ROUND(x, 6) at 1e10-µs
    # magnitudes asks for digits beyond double precision and the two
    # engines' rounding implementations pick different neighbors
    return gaps.groupBy(key_col).agg(
        F.count("*").alias("n_gaps"),
        (F.sum("gap").cast("double") / F.count("*")).alias("mean_gap_us"),
        F.percentile(F.col("gap"), F.lit(0.5)).alias("p50_gap_us"),
        F.max("gap").alias("max_gap_us"),
    )


def scd2_intervals(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from an event log:
    every observation becomes a validity interval —
    (key, value, valid_from, valid_to, is_current) with half-open
    [valid_from, valid_to) semantics, valid_to = the key's NEXT
    observation (NULL while current). The warehouse-dimension
    construction that makes :func:`asof_join` unnecessary for
    repeated lookups: build the intervals once, then point-in-time
    reads are a plain range predicate.

    The interval order is the total order (ts, id) — equal-timestamp
    observations chain deterministically instead of fabricating
    zero-length ties in arbitrary order.

    Scale shape: one hash shuffle on the key, one lead window per
    key — per-key sort state, row-preserving output."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(id_col))
    nxt = F.lead(F.col(ts_col)).over(w)
    return events.select(
        F.col(key_col),
        F.col(value_col),
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def seasonality_profile(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Weekly seasonality of event volume: one row per observed
    (day-of-week, hour-of-day) cell — (dow, hod, n, seasonal_index),
    index = cell count over the mean observed cell (n·cells/total as
    ONE double expression over exact integers). The capacity-planning
    face next to q_peak_to_average: WHERE in the week the load lives,
    not just how peaky it is. dow follows Spark's convention
    (1 = Sunday … 7 = Saturday).

    Scale shape: the corpus reduces to ≤168 cells in one partial-agg
    shuffle; the two grand totals attach as a 1-row broadcast bound."""
    cells = events.groupBy(
        F.dayofweek(F.col(ts_col)).alias("dow"),
        F.hour(F.col(ts_col)).alias("hod"),
    ).agg(F.count("*").alias("n"))
    totals = cells.agg(F.sum("n").alias("__t"), F.count("*").alias("__c"))
    return cells.crossJoin(F.broadcast(totals)).select(
        "dow",
        "hod",
        "n",
        F.round(
            (F.col("n") * F.col("__c")).cast("double") / F.col("__t"), 6
        ).alias("seasonal_index"),
    )


def cusum_changepoint(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Single most-likely level-shift changepoint of the daily event
    count series, by the classic CUSUM statistic: with daily counts
    x_1..x_n and prefix sums P_i, the centered cusum is
    S_i = P_i − i·mean; the changepoint is the day maximizing |S_i|
    (the standard at-most-one-change estimator). One row:
    (change_day, n_days, total, scaled_score, mean_before, mean_after).

    Exactness: S_i·n = n·P_i − i·total is EXACT integer arithmetic
    (the catalog's exactification pattern) — the argmax is taken over
    scaled_score = |n·P_i − i·total| with an earliest-day tie-break,
    so engines can never disagree on the chosen day; the two means
    are each ONE double division over exact integers, rounded to 6.
    Products accumulate in decimal(38,0) on the Spark side (int64
    would wrap silently at n·P ~ corpus² magnitudes).

    Scale shape: the corpus reduces to one daily-count row per day in
    a single partial-agg shuffle; the cusum window runs over that
    calendar-bounded series (≤ a few thousand rows for years of
    data), the same single-series discipline as lag_autocorrelation."""
    from pyspark.sql import Window

    daily = (
        events.groupBy(F.date_trunc("day", F.col(ts_col)).alias("day"))
        .agg(F.count("*").alias("x"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    pre = (
        daily.withColumn("p", F.sum("x").over(w))
        .withColumn("i", F.row_number().over(Window.orderBy("day")))
    )
    tot = daily.agg(
        F.sum("x").cast("decimal(38,0)").alias("total"),
        F.count("*").alias("n_days"),
    )
    scored = pre.crossJoin(F.broadcast(tot)).withColumn(
        "s",
        F.col("n_days").cast("decimal(38,0)") * F.col("p").cast("decimal(38,0)")
        - F.col("i").cast("decimal(38,0)") * F.col("total"),
    ).withColumn("score", F.abs(F.col("s")))
    best = scored.orderBy(F.col("score").desc(), F.col("day").asc()).limit(1)
    return best.select(
        F.col("day").alias("change_day"),
        F.col("n_days").cast("long").alias("n_days"),
        F.col("total").cast("long").alias("total"),
        F.col("score").cast("long").alias("scaled_score"),
        F.round(F.col("p").cast("double") / F.col("i"), 6).alias("mean_before"),
        # try_divide: a changepoint at the last day (constant 1-day
        # series) has no "after" segment — NULL, not DIVIDE_BY_ZERO
        # (ANSI doubles throw on /0 too)
        F.round(
            F.try_divide(
                (F.col("total") - F.col("p")).cast("double"),
                (F.col("n_days") - F.col("i")).cast("double"),
            ),
            6,
        ).alias("mean_after"),
    )


def lag_autocorrelation(events: DataFrame, ts_col: str = "ts", lag_days: int = 1) -> DataFrame:
    """Lag-k autocorrelation of the DAILY event-count series, one row
    (n_pairs, acf) — "does yesterday predict today": the stationarity
    check before trusting any trend/anomaly threshold on the series
    (an acf near 1 means daily counts are momentum-dominated and a
    global σ-band will whipsaw; near 0 means i.i.d.-ish days).

    Parity discipline: daily counts are exact integers; Pearson's
    sums accumulate in decimal(38,0) (counts² per day would pass
    int64 at corpus scale) and the closing expression is ONE fixed
    IEEE form over identical bits on any engine, rounded to 6.

    Scale shape: corpus → calendar-bounded daily table (one shuffle);
    the lag pairing is a self-equi-join on day+k (calendar-sized);
    one scalar aggregation."""
    if lag_days < 1:
        raise ValueError(f"lag_days must be >= 1, got {lag_days}")
    d = events.groupBy(F.date_trunc("day", F.col(ts_col)).alias("day")).agg(
        F.count("*").alias("n")
    )
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(
        b, F.col("b.day") == F.col("a.day") + F.expr(f"INTERVAL {int(lag_days)} DAY")
    ).select(F.col("a.n").alias("x"), F.col("b.n").alias("y"))
    dec = "decimal(38,0)"
    s = pairs.agg(
        F.count("*").alias("np"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
    )
    num = (F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt((F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")) * F.sqrt(
        (F.col("np") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    # try_divide: a constant series has zero variance and ANSI's `/`
    # throws DIVIDE_BY_ZERO — undefined correlation surfaces as NULL
    return s.select(
        F.col("np").alias("n_pairs"), F.round(F.try_divide(num, den), 6).alias("acf")
    )


def holt_linear(
    series: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
) -> DataFrame:
    """Holt's linear-trend exponential smoothing per key: (keys…, n,
    level, trend, forecast) where forecast = level + trend (one step
    ahead) after folding the ordered series through

        l_t = α·y_t + (1-α)·(l_{t-1} + b_{t-1})
        b_t = β·(l_t - l_{t-1}) + (1-β)·b_{t-1}      (l_0 = y_0, b_0 = 0)

    The recurrence is SEQUENTIAL per key — not associative, so no
    window/aggregate form exists; this is exactly the documented
    custom-operator path (applyInPandas: one Arrow batch per key,
    keys partition the work, state never leaves the executor). The
    arithmetic is written as the literal textbook expressions so a
    recursive-CTE oracle replays the identical IEEE operation order —
    outputs ship UNROUNDED (bit-for-bit comparable; rounding near a
    representability boundary is the known cross-engine hazard). For
    cross-engine replay pick α/β with EXACT binary representations
    (0.5, 0.25, …): (1-β) for a non-representable β rounds differently
    as a Python expression vs a SQL literal.
    Scale: one shuffle on the keys; per-key state is O(1)."""
    import pandas as pd

    keys = list(key_cols)
    out_schema = ", ".join(
        [f"{k} {dict(series.dtypes)[k]}" for k in keys]
        + ["n bigint", "level double", "trend double", "forecast double"]
    )

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order_col)
        ys = [float(y) for y in pdf[value_col]]
        level, trend = ys[0], 0.0
        for y in ys[1:]:
            prev = level
            level = alpha * y + (1 - alpha) * (level + trend)
            trend = beta * (level - prev) + (1 - beta) * trend
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row.update(
            {"n": [len(ys)], "level": [level], "trend": [trend],
             "forecast": [level + trend]}
        )
        return pd.DataFrame(row)

    return series.groupBy(*keys).applyInPandas(fold, out_schema)


def holt_winters(
    series: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.25,
    period: int = 7,
) -> DataFrame:
    """Holt-Winters ADDITIVE-seasonal smoothing per key: (keys…, n,
    level, trend, s_next, forecast) after folding the ordered series
    through the textbook triple recurrence with season length m =
    ``period``:

        l_t = α·(y_t − s_{t−m}) + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
        s_t = γ·(y_t − l_t) + (1−γ)·s_{t−m}

    Initialization is the simple deterministic textbook scheme,
    chosen for exact replayability: the first m observations seed
    level = their mean (folded LEFT-TO-RIGHT — a plain mean
    re-associates), trend = 0, and s_i = y_i − level; smoothing then
    consumes observations m+1…n. The one-step-ahead forecast is
    level + trend + s_next where s_next is the oldest live seasonal.
    Keys with fewer than m observations are DROPPED (no seasonal
    estimate exists); n is the full per-key count.

    Like :func:`holt_linear` this is the documented custom-operator
    path (applyInPandas; the recurrence is sequential per key, the
    seasonal RING is O(m) executor state). Outputs ship UNROUNDED —
    pick α/β/γ with exact binary representations (0.5, 0.25, …) and a
    recursive-CTE oracle carrying the seasonal ring as a list replays
    the identical IEEE operation order bit-for-bit.
    Scale: one shuffle on the keys; per-key state is O(period)."""
    import pandas as pd

    keys = list(key_cols)
    m = int(period)
    if m < 2:
        raise ValueError(f"holt_winters: period must be >= 2, got {period}")
    out_schema = ", ".join(
        [f"{k} {dict(series.dtypes)[k]}" for k in keys]
        + ["n bigint", "level double", "trend double", "s_next double",
           "forecast double"]
    )

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order_col)
        ys = [float(y) for y in pdf[value_col]]
        if len(ys) < m:
            return pd.DataFrame(
                {c.split(" ")[0]: [] for c in out_schema.split(", ")}
            ).astype("object")
        acc = 0.0
        for y in ys[:m]:
            acc = acc + y
        level = acc / m
        trend = 0.0
        seas = [y - level for y in ys[:m]]
        for y in ys[m:]:
            s_used = seas[0]
            prev = level
            level = alpha * (y - s_used) + (1 - alpha) * (level + trend)
            trend = beta * (level - prev) + (1 - beta) * trend
            s_new = gamma * (y - level) + (1 - gamma) * s_used
            seas = seas[1:] + [s_new]
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row.update(
            {"n": [len(ys)], "level": [level], "trend": [trend],
             "s_next": [seas[0]], "forecast": [level + trend + seas[0]]}
        )
        return pd.DataFrame(row)

    return series.groupBy(*keys).applyInPandas(fold, out_schema)


def seasonal_outliers(
    events: DataFrame,
    ts_col: str = "ts",
    k: float = 3.0,
) -> DataFrame:
    """Seasonally-adjusted anomaly detection on the daily event-count
    series: remove the DAY-OF-WEEK profile (per-weekday median of the
    daily counts — a weekend dip is seasonality, not an anomaly),
    then flag days whose residual exceeds ``k`` × MAD of all
    residuals (the robust z-score rule of q_robust_outliers, applied
    AFTER deseasonalization — raw MAD flags every weekend; adjusted
    MAD flags genuine level breaks). Returns one row per day:
    (day, n, dow, dow_median, residual, is_outlier).

    Exactness: counts are integers; medians of integers are exact
    halves (both engines interpolate the even-n middle pair
    identically); residuals and the k·MAD compare are a handful of
    exactly-representable arithmetic ops — bit-exact cross-engine
    with no rounding needed.

    Scale shape: one day-grain aggregation, one 7-row weekday median
    table broadcast back, one global MAD reduction — nothing wider
    than the daily series ever shuffles."""
    if k <= 0:
        raise ValueError(f"seasonal_outliers: k must be > 0, got {k}")
    daily = (
        events.groupBy(F.date_trunc("day", F.col(ts_col)).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("dow", F.dayofweek("day"))
    )
    prof = daily.groupBy("dow").agg(
        F.expr("percentile(n, 0.5)").alias("dow_median")
    )
    resid = (
        daily.join(F.broadcast(prof), "dow")
        .withColumn("residual", F.col("n") - F.col("dow_median"))
    )
    mad = resid.agg(
        F.expr("percentile(abs(residual), 0.5)").alias("mad")
    )
    return (
        resid.crossJoin(F.broadcast(mad))
        .select(
            "day",
            "n",
            "dow",
            "dow_median",
            "residual",
            (F.abs(F.col("residual")) > F.lit(float(k)) * F.col("mad")).alias(
                "is_outlier"
            ),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    group_cols: Sequence[str] = (),
    value_dec: str = "decimal(18,6)",
) -> DataFrame:
    """Time-weighted average of an IRREGULARLY-sampled series — the
    TWAP/sensor-mean primitive: each observation holds its value
    until the next one (LOCF weighting), so
    twa = Σ vᵢ·(tᵢ₊₁−tᵢ) / (tₙ−t₁) per group. A plain AVG
    over-weights bursts (ten ticks in one second count ten times); a
    time-weighted mean weights by how long each value was in force.
    The last observation carries no duration; groups with fewer than
    two observations return NULL (no time span to weight over).

    Exactness: durations are integer MICROSECONDS (epoch-µs longs),
    values are cast to DECIMAL, so Σ v·dur is exact decimal
    arithmetic and the final 6-decimal rounding is the exact-integer
    half-up of the true rational — no IEEE accumulation anywhere
    (the skew_report / rollup-avg discipline). Positive-domain note:
    the integer half-up uses truncating division, identical to floor
    only for non-negative sums — hold values ≥ 0 (or shift first).

    Returns one row per group: (*group_cols, n_obs, span_us, twa).
    Scale shape: one window over each group's time order (slim
    (ts, value) rows) + one grouped sum — per-key series are the
    partition unit, the same shape every other per-key series op
    here uses."""
    groups = list(group_cols)
    us = (F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("__us")
    obs = df.select(*groups, us, F.col(value_col).cast(value_dec).alias("__v"))
    # duplicate-timestamp observations: order ties by value so the
    # segment chain is deterministic (zero-duration segments between
    # ties contribute nothing to the sum either way; the tie-break
    # only pins which row is 'last' at a shared final timestamp)
    nxt = F.lead(F.col("__us")).over(
        Window.partitionBy(*groups).orderBy(F.col("__us"), F.col("__v"))
    )
    seg = obs.withColumn("__dur", nxt - F.col("__us"))
    agg = seg.groupBy(*groups).agg(
        F.count("*").alias("n_obs"),
        F.sum("__dur").alias("span_us"),
        F.sum(F.col("__v") * F.col("__dur")).alias("__wsum"),
    )
    # exact 6-decimal half-up: floor((2·wsum·10⁶·10⁶ + span)/(2·span))
    # on integer micro-value-micro-seconds; see docstring
    r6 = F.expr(
        "(CAST(__wsum * 1000000 AS DECIMAL(38,0)) * 2"
        " + CAST(span_us AS DECIMAL(38,0)))"
        " div (CAST(span_us AS DECIMAL(38,0)) * 2)"
    )
    return agg.select(
        *groups,
        "n_obs",
        "span_us",
        F.when(F.col("span_us") > 0, r6.cast("double") / F.lit(1_000_000.0))
        .otherwise(F.lit(None).cast("double"))
        .alias("twa"),
    )


def rolling_trend(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: Sequence[str] = (),
    window_days: int = 7,
) -> DataFrame:
    """Per-key rolling OLS trend: for every (group, day), the
    least-squares slope of the DAILY EVENT COUNT over the trailing
    ``window_days`` calendar days — the "is this key heating up or
    cooling down" monitor (crawl sources, error classes, user
    cohorts), robust to the window's missing days because x is the
    real calendar day index, not a row number.

    Exactness: the slope n·Σxy−Σx·Σy / n·Σx²−(Σx)² is computed on
    INTEGER day indexes and integer counts — both moment sums are
    exact — and the final 6-decimal value is the exact-integer
    half-away-from-zero of the true rational (sign · floor on the
    absolute value; Spark `div` truncates and DuckDB `//` floors, so
    the division always runs on non-negative operands). Days with
    fewer than two distinct x in the window (a single day) have an
    undefined slope and return NULL.

    Scale shape: the corpus collapses to (group, day) counts in one
    partial-agg shuffle; the RANGE window then runs over
    calendar-bounded daily rows per group — thousands of rows per
    key regardless of corpus size, the hypertable_rollup argument.
    Returns (*group_cols, day, n_days, slope)."""
    if window_days < 2:
        raise ValueError(f"window_days must be >= 2, got {window_days}")
    groups = list(group_cols)
    daily = df.groupBy(
        *groups, F.date_trunc("day", F.col(ts_col)).alias("day")
    ).agg(F.count("*").alias("y"))
    d0 = "1970-01-01"
    daily = daily.withColumn(
        "di", F.datediff(F.col("day"), F.lit(d0).cast("date")).cast("long")
    )
    w = (
        Window.partitionBy(*groups)
        .orderBy("di")
        .rangeBetween(-(window_days - 1), 0)
    )
    stats = daily.select(
        *groups,
        "day",
        F.count("*").over(w).alias("n"),
        F.sum("di").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("di") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("di") * F.col("di")).over(w).alias("sxx"),
    )
    num = F.expr(
        "CAST(n AS DECIMAL(38,0)) * CAST(sxy AS DECIMAL(38,0))"
        " - CAST(sx AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0))"
    )
    den = F.expr(
        "CAST(n AS DECIMAL(38,0)) * CAST(sxx AS DECIMAL(38,0))"
        " - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0))"
    )
    st = stats.withColumn("__num", num).withColumn("__den", den)
    r6 = F.expr(
        "CASE WHEN __num < 0 THEN -1 ELSE 1 END"
        " * ((2 * abs(__num) * 1000000 + __den) div (2 * __den))"
    )
    return st.select(
        *groups,
        "day",
        F.col("n").alias("n_days"),
        F.when(F.col("__den") > 0, r6.cast("double") / F.lit(1_000_000.0))
        .otherwise(F.lit(None).cast("double"))
        .alias("slope"),
    )
