"""Event analytics: ordered funnels and cohort retention.

The product-analytics staple: of the users who did step 1, how many
went on to do step 2 AFTER it, then step 3 after that — strict
temporal ordering, earliest-eligible match per step.

Scale shape: ONE shuffle (groupBy user) and an all-JVM array
aggregation. Each user's relevant events are collected sorted and
folded left-to-right with ``F.aggregate``: the accumulator is the
per-step completion-timestamp array, and an event fills the first
unfilled step when its type matches and its timestamp is strictly
after the previous step's fill. A greedy earliest-first fold over the
sorted stream is exactly the classical min-chaining definition
(t1 = min ts of step1; t2 = min ts of step2 with ts > t1; ...), which
is what the SQL oracle computes. No per-event Python, no join chain —
k steps cost one pass over each user's events, not k scans of the
fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """Per-step completion counts: (step, step_name, n_users) where a
    user counts for step i when they performed steps[0..i] in strict
    timestamp order (earliest-eligible matching). With
    ``max_gap_seconds`` each step must also land within that horizon
    of the previous step's completion — the "converted within N
    hours" form. (No backtracking in either form: step i's completion
    is pinned to the earliest eligible event, matching the SQL
    min-chaining definition; later step-1 events are never retried.)"""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    k = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    relevant = events.filter(F.col(type_col).isin(steps)).select(
        F.col(user_col).alias("u"),
        F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("tp")).alias("ev"),
    )
    init = F.array_repeat(F.lit(None).cast(events.schema[ts_col].dataType), k)

    def fold(acc, ev):
        # number of steps already filled == index of the next to fill
        filled = F.size(F.filter(acc, lambda a: a.isNotNull()))
        after_prev = (filled == 0) | (ev["ts"] > F.element_at(acc, filled))
        if max_gap_seconds is not None:
            after_prev = after_prev & (
                (filled == 0)
                | (
                    ev["ts"]
                    <= F.element_at(acc, filled)
                    + F.make_interval(secs=F.lit(max_gap_seconds))
                )
            )
        eligible = (
            (filled < k)
            & (ev["tp"] == F.element_at(steps_arr, filled + 1))
            & after_prev
        )
        return F.when(
            eligible,
            F.transform(
                acc, lambda a, i: F.when(i == filled, ev["ts"]).otherwise(a)
            ),
        ).otherwise(acc)

    per_user = (
        relevant.groupBy("u")
        .agg(F.array_sort(F.collect_list("ev")).alias("evs"))
        .select(F.aggregate("evs", init, fold).alias("acc"))
    )
    # coalesce: SUM over zero groups is null, but an empty funnel has
    # 0 completions, not unknown (matches the oracle's COUNT(*) = 0)
    counts = per_user.agg(
        *[
            F.coalesce(
                F.sum(F.element_at("acc", i + 1).isNotNull().cast("long")), F.lit(0)
            ).alias(f"n{i}")
            for i in range(k)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(steps[i]).alias("step_name"),
                F.col(f"n{i}").alias("n_users"),
            )
            for i in range(k)
        ]
    )
    return counts.select(F.explode(rows).alias("r")).select("r.step", "r.step_name", "r.n_users")


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_weeks: int = 8,
) -> DataFrame:
    """Weekly cohort retention: (cohort_week, week_offset, n_active,
    cohort_size) — of the users first seen in cohort_week, how many
    were active again `week_offset` weeks later.

    Two grouped reductions over one scan: per-user first week (the
    cohort), then distinct (user, week) activity joined back on the
    user — shuffles on user_id only, counts as plain aggregates.
    Offsets beyond ``max_weeks`` are dropped (bounded output). Counts,
    not ratios, cross the engine boundary: ratio = n_active /
    cohort_size is a presentation concern and a float hazard."""
    week = F.date_trunc("week", F.col(ts_col))
    activity = events.select(
        F.col(user_col).alias("u"), week.cast("date").alias("w")
    ).distinct()
    cohorts = activity.groupBy("u").agg(F.min("w").alias("cohort_week"))
    sizes = cohorts.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    joined = activity.join(cohorts, "u").select(
        "cohort_week",
        (F.datediff(F.col("w"), F.col("cohort_week")) / 7).cast("long").alias("week_offset"),
        "u",
    )
    return (
        joined.filter(F.col("week_offset") <= max_weeks)
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("u").alias("n_active"))
        .join(sizes, "cohort_week")
    )


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: (from_type, to_type, n, p) where n counts adjacent
    (from → to) pairs in each user's timeline and p is the row-
    normalized transition probability. The "what do users do NEXT"
    view that complements :func:`funnel`'s fixed-path completion —
    path discovery instead of path verification.

    The pair order within a user is the total order (ts, id) so ties
    on equal timestamps are deterministic on both engines. p is one
    exact-integer division per cell (n / row_total), so no float-sum
    parity concerns anywhere.

    Scale shape: one hash shuffle on user_id (the lead window's
    partition key — per-user state, never global), one pair count,
    and a row-total join over the |types|² matrix — the matrix is
    type-cardinality-sized, so everything after the window is
    broadcast-trivial at any corpus size."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return pairs.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("tot"), 6).alias("p"),
    )


def attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    lookback_seconds: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Multi-model marketing attribution: for every CONVERSION event,
    find the user's TOUCH events inside the ``lookback_seconds``
    window ending at the conversion and credit each touch channel
    (the touch's event type) under three standard models at once —

    - ``first_touch``  conversions whose EARLIEST in-window touch was
      this channel,
    - ``last_touch``   conversions whose LATEST in-window touch was
      this channel,
    - ``linear``       fractional credit 1/n per in-window touch.

    Conversions with NO in-window touch are credited to the
    ``(direct)`` channel in every model, so each model's column sums
    to the total conversion count (the conservation invariant the
    pytest pins). Returns one row per channel:
    (channel, first_touch, last_touch, linear).

    Spark-first shape: NO self-join — one RANGE window per user
    ordered by epoch MICROseconds (full timestamp precision, the
    q_sessionization convention) carries the whole lookback (touches
    enter min/max-struct and collect_list aggregates; non-touch rows
    contribute NULLs, which every engine's min/max/collect skip), so
    the cost is one shuffle on the user key regardless of window
    width. first/last inside the frame are struct-min/max with the
    unique event id as tie-break — deterministic even for same-second
    touches. The linear credits are folded per channel in PINNED
    (conversion id) order, each term one correctly-rounded IEEE
    division — pagerank's bit-exact fold discipline.

    Scale: one user-key shuffle + one channel-sized aggregation; the
    per-conversion frame list is bounded by the lookback window."""
    if conversion_type in touch_types:
        raise ValueError("attribution: conversion_type cannot be a touch type")
    if lookback_seconds <= 0:
        raise ValueError(
            f"attribution: lookback_seconds must be > 0, got {lookback_seconds}"
        )
    from pyspark.sql import Window

    # NTZ → TIMESTAMP under the engine's pinned UTC session zone
    epoch = F.unix_micros(F.col(ts_col).cast("timestamp"))
    touch_ch = F.when(F.col(type_col).isin(list(touch_types)), F.col(type_col))
    base = events.select(
        F.col(user_col).alias("u"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("etype"),
        epoch.alias("ep"),
        touch_ch.alias("tch"),
    )
    w = (
        Window.partitionBy("u")
        .orderBy("ep")
        .rangeBetween(-int(lookback_seconds) * 1_000_000, 0)
    )
    tstruct = F.when(
        F.col("tch").isNotNull(), F.struct("ep", "eid", F.col("tch").alias("ch"))
    )
    convs = (
        base.withColumn("ft", F.min(tstruct).over(w))
        .withColumn("lt", F.max(tstruct).over(w))
        .withColumn("chs", F.filter(F.collect_list("tch").over(w), lambda x: x.isNotNull()))
        .filter(F.col("etype") == conversion_type)
        .select(
            "eid",
            F.coalesce(F.col("ft")["ch"], F.lit("(direct)")).alias("first_ch"),
            F.coalesce(F.col("lt")["ch"], F.lit("(direct)")).alias("last_ch"),
            F.col("chs"),
        )
    )
    # per-conversion channel multiplicities: (channel, cnt, n) triples;
    # an untouched conversion credits ("(direct)", 1, 1)
    credit = convs.select(
        "eid",
        F.explode(
            F.when(
                F.size("chs") == 0,
                F.array(
                    F.struct(
                        F.lit("(direct)").alias("ch"),
                        F.lit(1).cast("int").alias("cnt"),
                        F.lit(1).cast("int").alias("n"),
                    )
                ),
            ).otherwise(
                F.transform(
                    F.array_distinct("chs"),
                    lambda c: F.struct(
                        c.alias("ch"),
                        F.size(F.filter(F.col("chs"), lambda y: y == c)).alias("cnt"),
                        F.size("chs").alias("n"),
                    ),
                )
            )
        ).alias("t"),
    )
    linear = (
        credit.groupBy(F.col("t.ch").alias("channel"))
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("eid", "t.cnt", "t.n"))),
                    lambda s: s["cnt"].cast("double") / s["n"].cast("double"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("linear")
        )
    )
    firsts = convs.groupBy(F.col("first_ch").alias("channel")).agg(
        F.count("*").alias("first_touch")
    )
    lasts = convs.groupBy(F.col("last_ch").alias("channel")).agg(
        F.count("*").alias("last_touch")
    )
    return (
        firsts.join(lasts, "channel", "full")
        .join(linear, "channel", "full")
        .select(
            "channel",
            F.coalesce(F.col("first_touch"), F.lit(0)).alias("first_touch"),
            F.coalesce(F.col("last_touch"), F.lit(0)).alias("last_touch"),
            F.round(F.coalesce(F.col("linear"), F.lit(0.0)), 6).alias("linear"),
        )
    )
