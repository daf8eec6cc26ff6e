"""Generic data-quality profiling for any DataFrame.

The pipeline-operability complement of store/stats.py's
``analyze_collection`` (which profiles a STORE collection into a
committed stats table): :func:`profile_table` answers "what landed in
this table?" for arbitrary inputs — per-column null rates and exact
distinct counts in ONE pass — the pre-flight check every ingest/
transform stage wants before trusting a join key or a partition
column.

Scale shape: a single aggregation over one scan. Multiple exact
COUNT(DISTINCT col) aggregates compile to Spark's Expand operator —
the input is replicated once per distinct aggregate (k columns ⇒
k+1× rows into the partial aggregate, each row pruned to one
column), which is the documented cost of exactness in one pass; the
partial aggregates collapse each replica to its distinct set before
the single shuffle. For quick looks at 10^9+-row tables pass
``approx=True`` (HLL, one replica total, ±2%); the exact mode is
what the cross-engine oracle pins.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    approx: bool = False,
) -> DataFrame:
    """(column, n_rows, n_nulls, null_frac, n_distinct) — one row per
    profiled column, computed in one aggregation pass.

    ``n_distinct`` excludes NULL (COUNT DISTINCT semantics on both
    engines); ``null_frac`` divides as DECIMAL before rounding to 6
    so the oracle rounds the same digits. Column order of the output
    follows the requested order. ``approx`` swaps the exact distinct
    for approx_count_distinct (not oracle-exact; profiling only)."""
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("no columns to profile")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    ndv = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(ndv(F.col(c)).alias(f"__nd_{c}"))
    row = df.agg(*aggs)
    per_col = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col("__n").alias("n_rows"),
                    (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                    F.col(f"__nd_{c}").alias("n_distinct"),
                )
                for c in cols
            ]
        )
    )
    return (
        row.select(per_col.alias("p"))
        .select("p.column", "p.n_rows", "p.n_nulls", "p.n_distinct")
        .select(
            "column",
            "n_rows",
            "n_nulls",
            F.round(
                F.col("n_nulls").cast("decimal(38,12)")
                / F.greatest(F.col("n_rows"), F.lit(1)),
                6,
            )
            .cast("double")
            .alias("null_frac"),
            "n_distinct",
        )
    )


def grouped_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percentiles: list[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
) -> DataFrame:
    """EXACT per-group percentiles with linear interpolation — one row
    per group, one column per requested percentile (p25, p50, ...).
    The exact counterpart of the approx_percentile contract entry:
    Spark's `percentile` aggregate sorts each group's values and
    interpolates between order statistics, matching DuckDB/Postgres
    `quantile_cont`/`percentile_cont` bit-for-bit on doubles.

    Scale shape: one hash shuffle on the group key; each group's
    values are buffered and sorted WITHIN its aggregation state, so
    memory is bounded by the largest group, not the table — right for
    the low-cardinality-group / big-table profile (event types over a
    100 TB log). For percentile-of-everything over a high-cardinality
    key, or single groups too big for one executor, use the sketch
    path (q_approx_percentile_contract) instead; exact global order
    statistics at corpus scale want the two-level prefix-sum selector
    (sampling.select_token_budget's skeleton), not this aggregate."""
    def _name(p: float) -> str:
        s = f"{p * 100:g}".replace(".", "_")
        return f"p{s}"

    aggs = [
        F.percentile(F.col(value_col), F.lit(p)).alias(_name(p))
        for p in percentiles
    ]
    return df.groupBy(group_col).agg(*aggs)


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_cols: Sequence[str] = (),
    qs: Sequence[float] = (0.5,),
    weight_dec: str = "decimal(20,6)",
) -> DataFrame:
    """EXACT weighted quantiles: per group, the smallest value v such
    that the cumulative weight of all values ≤ v reaches q·W (the
    lower weighted quantile — a real data point, not an
    interpolation). The mixing-policy primitive: "the token-weighted
    median quality score", "the byte-weighted p90 document length" —
    places where every row counts proportionally to its tokens/bytes,
    not once.

    Exactness: weights are cast to DECIMAL before summing and q·W is
    a decimal·decimal product, so the threshold comparison is exact
    in any engine — no IEEE cumsum drift can flip the selected value.
    Ties on the value are collapsed FIRST (groupBy value, sum weight),
    so the cumulative order is a total order and the result does not
    depend on intra-tie row order. q must have ≤ 6 decimal digits
    (asserted) so its decimal literal is exact. Weights must be
    NON-NEGATIVE — a negative weight makes the cumulative sum
    non-monotone and the "first value reaching q·W" selection
    meaningless (not checked at runtime: the check would cost a full
    extra pass; the caller owns the invariant).

    Scale shape: one shuffle to collapse (group, value) duplicates,
    then a per-group cumulative window over DISTINCT values — bounded
    by value cardinality, not row count (a 100 TB log with a
    12-bit-quantized score column cumulates ≤ 4096 rows per group).
    For unbounded-cardinality values in one giant group, quantize
    first or use the approx-percentile sketch path; returns one row
    per group with a p<q> column per requested quantile."""
    from decimal import Decimal

    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantile must be in (0, 1], got {q}")
        if Decimal(str(q)).as_tuple().exponent < -6:
            raise ValueError(f"quantile needs <= 6 decimal digits, got {q}")

    def _name(q: float) -> str:
        return "p" + f"{q * 100:g}".replace(".", "_")

    groups = list(group_cols)
    # complete-case on the value (review r12): a NULL value's weight
    # would otherwise enter BOTH the total and the head of the
    # ascending cumulation (Spark sorts NULLS FIRST), shifting every
    # selected quantile of the real data — the standard convention is
    # quantiles over the non-null values only
    g = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*groups, value_col)
        .agg(F.sum(F.col(weight_col).cast(weight_dec)).alias("__w"))
    )
    cum_w = Window.partitionBy(*groups).orderBy(value_col)
    tot_w = Window.partitionBy(*groups)
    c = g.select(
        *groups,
        F.col(value_col),
        F.sum("__w").over(cum_w).alias("__cw"),
        F.sum("__w").over(tot_w).alias("__tw"),
    )
    aggs = [
        F.min(
            F.when(
                F.col("__cw")
                >= F.expr(f"CAST({Decimal(str(q))} AS DECIMAL(8,6))") * F.col("__tw"),
                F.col(value_col),
            )
        ).alias(_name(q))
        for q in qs
    ]
    return c.groupBy(*groups).agg(*aggs)


def auc_binary(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Exact ROC AUC of ``score_col`` against binary ``label_col``
    (0/1) — one row (n_pos, n_neg, auc). The eval primitive for
    quality-filter scores: "does this score actually separate the
    keep-class from the drop-class" (AUC = P(score_pos > score_neg)
    + ½·P(tie), the Mann-Whitney U form, ties counted exactly).

    Arithmetic is ALL-INTEGER until one final double division:
    auc = Σ_s [2·neg_s·pos_above(s) + neg_s·pos_s] / (2·n_pos·n_neg)
    (pos_above = positives STRICTLY above the negatives' score — the
    pairs the score ranks correctly), so there is no float-sum order
    sensitivity to round away — bit-identical across engines by
    construction.

    Scale shape: the corpus reduces to one row per DISTINCT score
    (pos/neg counts); pos_below comes from the two-level
    :func:`~hyper_storage_spark.operators.sampling.distributed_cumsum`
    (range partition + local windows), so no single task ever sees the
    whole score domain — the unpartitioned-Window trap the plan linter
    flags is structurally avoided."""
    from .sampling import distributed_cumsum

    lab = F.col(label_col).cast("long")
    g = df.groupBy(score_col).agg(
        F.sum(lab).alias("pos_s"),
        F.sum(F.lit(1) - lab).alias("neg_s"),
    )
    c = distributed_cumsum(
        g, "pos_s", [F.col(score_col).desc()], cum_col="cum_pos"
    ).withColumn("pos_above", F.col("cum_pos") - F.col("pos_s"))
    return c.agg(
        F.sum("pos_s").alias("n_pos"),
        F.sum("neg_s").alias("n_neg"),
        # 2·neg_s·pos_above is quadratic in corpus size (≈ n²/2 for a
        # balanced corpus) — past int64 at 100 TB; decimal(38,0) keeps
        # the sum exact (or NULLs on true overflow, never wraps)
        F.sum(
            F.lit(2) * F.col("neg_s").cast("decimal(38,0)") * F.col("pos_above")
            + F.col("neg_s").cast("decimal(38,0)") * F.col("pos_s")
        ).alias("num2"),
    ).select(
        "n_pos",
        "n_neg",
        F.round(
            F.col("num2").cast("double")
            / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )


def robust_outlier_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Per-group robust outlier profile via median absolute deviation:
    (group, n, med, mad, n_outliers) where mad = median(|x − med|) and
    an outlier is |x − med| > k · 1.4826 · mad (1.4826 scales MAD to
    σ for normal data — the standard robust z-score). The
    mean/stddev-based z-score (mv_rollup_anomaly) breaks when the
    outliers themselves inflate σ; MAD has a 50% breakdown point, so
    it is the right gate for heavy-tailed quality scores and latency
    columns.

    Everything is the exact sort-based percentile (q_exact_percentiles
    parity — interpolated order statistics match other engines
    bit-for-bit), so med/mad/n_outliers are all engine-exact with no
    rounding. Three aggregations and two joins, every one keyed by the
    group column: per-group sort state, no global ordering anywhere."""
    med = df.groupBy(group_col).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("med")
    )
    dev = df.join(med, group_col).select(
        group_col, "med", F.abs(F.col(value_col) - F.col("med")).alias("dev")
    )
    mad = dev.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.first("med").alias("med"),
        F.percentile(F.col("dev"), F.lit(0.5)).alias("mad"),
    )
    return (
        dev.join(mad.select(group_col, "mad"), group_col)
        .groupBy(group_col)
        .agg(
            F.sum(
                F.when(F.col("dev") > F.lit(k) * F.lit(1.4826) * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers")
        )
        .join(mad, group_col)
        .select(group_col, "n", "med", "mad", "n_outliers")
    )


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
    out_col: str = "value_w",
) -> DataFrame:
    """Winsorized copy of ``value_col``: every row back, plus
    ``out_col`` = value clipped into the group's [p_lo, p_hi] exact
    percentile band — the standard tail-taming transform before
    mean-based aggregation or model fitting (unlike dropping outliers
    it keeps the row, so counts and joins downstream are unchanged).

    The clip emits either the original value or a group percentile —
    both already-exact doubles (q_exact_percentiles parity), no
    arithmetic, no rounding. One percentile aggregation + one
    broadcast-sized join back on the group key; rows never shuffle
    (the small bounds table does), so this is scan-shaped at 100 TB."""
    bounds = df.groupBy(group_col).agg(
        F.percentile(F.col(value_col), F.lit(lo)).alias("__lo"),
        F.percentile(F.col(value_col), F.lit(hi)).alias("__hi"),
    )
    return (
        df.join(F.broadcast(bounds), group_col)
        .withColumn(
            out_col,
            F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")),
        )
        .drop("__lo", "__hi")
    )


def chi2_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Pearson chi-squared test of independence between two
    categorical columns, one row: (n, dof, chi2, cramers_v). The
    drift/association primitive — "did the label mix shift across
    sources", "is event type independent of weekday" — with Cramér's
    V as the [0,1] effect size (chi2 alone grows with n).

    chi2 = Σ_cells (o − e)²/e with e = row_total · col_total / n —
    observed and marginal counts are exact integers; each cell's
    expectation and contribution is a fixed IEEE expression over them,
    written identically in the SQL oracle (the r·c-cell sum is tiny,
    so float-order noise has no room to accumulate before ROUND 6).

    Scale shape: ONE groupBy over the corpus produces the r·c
    contingency table; marginals and the statistic are aggregations of
    that tiny table (two broadcast joins). Never a corpus self-join.

    NULL categories are excluded up front (complete-case, review r12):
    without the filter, NULL-keyed cells survive the groupBy and
    inflate n, but the null-rejecting marginal joins silently drop
    them from the chi2 sum — every expectation e = ra·cb/n is then
    computed against a total the summed table doesn't have."""
    cells = (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .agg(F.count("*").alias("o"))
    )
    from ._caches import tracked_persist

    cells = tracked_persist(cells)
    ra = cells.groupBy("a").agg(F.sum("o").alias("ra"))
    cb = cells.groupBy("b").agg(F.sum("o").alias("cb"))
    n = cells.agg(F.sum("o").alias("n"))
    e = F.col("ra").cast("double") * F.col("cb") / F.col("n")
    per_cell = (
        cells.join(F.broadcast(ra), "a")
        .join(F.broadcast(cb), "b")
        .crossJoin(F.broadcast(n))
        .select(
            "a",
            "b",
            "n",
            ((F.col("o") - e) * (F.col("o") - e) / e).alias("x"),
        )
    )
    return (
        per_cell.groupBy("n")
        .agg(
            F.count_distinct("a").alias("r"),
            F.count_distinct("b").alias("c"),
            F.sum("x").alias("chi2"),
        )
        .select(
            F.col("n").alias("n"),
            ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
            F.round("chi2", 6).alias("chi2"),
            F.round(
                F.sqrt(
                    F.col("chi2")
                    / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
                ),
                6,
            ).alias("cramers_v"),
        )
    )


def spearman_by_group(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Spearman rank correlation with tie correction:
    (group, n, rho) — the monotonic-association measure that survives
    outliers and nonlinear scales (Pearson on MIDRANKS, the standard
    tied-rank treatment). The robust complement of the covariance-
    based correlation ops: right for "does quality score track doc
    length at all" questions where the relationship is monotone but
    not linear.

    Exactness: midranks are quarter-integer-valued and bounded by the
    group size, so every sum below (Σx, Σy, Σxy, Σx², Σy²) is exactly
    representable in doubles REGARDLESS of partition summation order;
    the closing (n·Σxy − ΣxΣy)/√(…) is a fixed IEEE expression over
    those exact values — bit-identical across engines with no rounding
    step anywhere.

    Scale shape: two rank windows and one aggregation, all partitioned
    by the group column — per-group sort state, nothing global."""
    from pyspark.sql import Window

    def midrank(col: str, out: str):
        wr = Window.partitionBy(group_col).orderBy(F.col(col))
        wt = Window.partitionBy(group_col, col)
        return (
            F.rank().over(wr).cast("double")
            + (F.count("*").over(wt) - F.lit(1)) / F.lit(2.0)
        ).alias(out)

    r = df.select(group_col, midrank(x_col, "rx"), midrank(y_col, "ry"))
    agg = r.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return agg.select(group_col, "n", (num / den).alias("rho"))


def ks_two_sample(df: DataFrame, value_col: str, side_col: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov distance, one row:
    (n1, n2, d) with d = max_v |ECDF_1(v) − ECDF_2(v)| — the standard
    "did this distribution shift" test between two slices (old vs new
    snapshot of a quality score, source A vs source B latency).
    ``side_col`` must be 0/1.

    All-integer arithmetic (the q_auc_score discipline): at each
    distinct value the ECDF gap is |cum1·n2 − cum2·n1| / (n1·n2); the
    numerator and the max are exact integers, ONE final double
    division closes — bit parity by construction, no rounding.

    Scale shape: the input reduces to one row per distinct value with
    per-side counts; both running totals ride ONE two-level
    :func:`~hyper_storage_spark.operators.sampling.distributed_cumsum`
    pass (the per-partition offsets trick works per weight column on
    the same range partitioning), so nothing global ever sits in one
    task."""
    from .sampling import distributed_cumsum

    side = F.col(side_col).cast("long")
    g = df.groupBy(value_col).agg(
        F.sum(side).alias("c1"),
        F.sum(F.lit(1) - side).alias("c2"),
    )
    c = distributed_cumsum(g, "c1", [F.col(value_col).asc()], cum_col="cum1")
    # second running total on the SAME ordering: reuse the generic
    # helper (its repartitionByRange re-samples boundaries, which is
    # fine — each call is internally consistent and cum values are
    # order-determined, not partition-determined)
    c = distributed_cumsum(c, "c2", [F.col(value_col).asc()], cum_col="cum2")
    return (
        c.crossJoin(
            F.broadcast(
                g.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
            )
        )
        .select(
            "n1",
            "n2",
            F.abs(
                F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")
            ).alias("gap"),
        )
        .groupBy("n1", "n2")
        .agg(F.max("gap").alias("gap"))
        .select(
            "n1",
            "n2",
            (F.col("gap").cast("double") / (F.col("n1") * F.col("n2"))).alias("d"),
        )
    )


def psi(
    df: DataFrame,
    value_col: str,
    side_col: str,
    bins: int = 10,
) -> DataFrame:
    """Population stability index between the reference (side=1) and
    target (side=0) distributions of ``value_col``, one row:
    (n_ref, n_tgt, psi). The model-monitoring drift metric scored
    over REFERENCE-quantile bins (the industry convention: <0.1
    stable, 0.1–0.25 shifting, >0.25 drifted) — the binned,
    magnitude-weighted complement of :func:`ks_two_sample`'s
    worst-point distance.

    Bin edges are the reference's exact interpolated quantiles
    (q_exact_percentiles parity), attached as a broadcast 1-row
    cross join — never collected to the driver. Counts are exact
    ints; empty bins are kept (explicit bin spine) and every count is
    smoothed by +0.5 (denominator +bins/2) so the log never sees
    zero — the smoothing is part of the published formula here and in
    the oracle. One final Σ over ``bins`` fixed IEEE terms, rounded
    to 6."""
    ref = df.filter(F.col(side_col) == 1)
    edges = ref.agg(
        *[
            F.percentile(F.col(value_col), F.lit(i / bins)).alias(f"e{i}")
            for i in range(1, bins)
        ]
    )
    binned = df.crossJoin(F.broadcast(edges)).select(
        F.col(side_col).alias("s"),
        sum(
            (F.col(value_col) > F.col(f"e{i}")).cast("int") for i in range(1, bins)
        ).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum("s").alias("c1"),
        F.sum(F.lit(1) - F.col("s")).alias("c2"),
    )
    spine = df.sparkSession.range(bins).select(F.col("id").cast("int").alias("bin"))
    full = spine.join(counts, "bin", "left").select(
        "bin",
        F.coalesce("c1", F.lit(0)).alias("c1"),
        F.coalesce("c2", F.lit(0)).alias("c2"),
    )
    totals = full.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    p = (F.col("c1") + F.lit(0.5)) / (F.col("n1") + F.lit(bins / 2.0))
    q = (F.col("c2") + F.lit(0.5)) / (F.col("n2") + F.lit(bins / 2.0))
    return (
        full.crossJoin(F.broadcast(totals))
        .select("n1", "n2", ((p - q) * F.log(p / q)).alias("term"))
        .groupBy("n1", "n2")
        .agg(F.round(F.sum("term"), 6).alias("psi"))
        .select(
            F.col("n1").alias("n_ref"), F.col("n2").alias("n_tgt"), "psi"
        )
    )


def gini(df: DataFrame, value_col: str) -> DataFrame:
    """Gini coefficient of a non-negative INTEGER column, one row:
    (n, total, gini) — the concentration measure for "how unequal is
    the corpus": token mass across documents, traffic across keys,
    documents across domains (0 = perfectly even, →1 = one row holds
    everything). The summary number behind cap_per_group /
    domain_mixture decisions.

    Uses the sorted-rank identity G = (2·Σ i·x_(i) − (n+1)·Σx)/(n·Σx)
    evaluated per tie-run of DISTINCT values: a run at value v
    spanning ranks a..b contributes v·(a+b)·c to 2·Σ i·x (exact
    integers; tie order provably cannot matter since the tied x are
    equal). Everything is integer until ONE closing double division —
    bit parity by construction, the q_auc_score discipline.

    Scale shape: corpus → distinct-value counts, ranks from the
    two-level distributed_cumsum, one scalar aggregation. Nothing
    global in one task; the value domain (not the corpus) bounds the
    reduced table."""
    from .sampling import distributed_cumsum

    g = df.groupBy(value_col).agg(F.count("*").alias("c"))
    c = distributed_cumsum(g, "c", [F.col(value_col).asc()], cum_col="cum")
    # tie-run at v spans ranks a..b: b = cum, a = cum − c + 1.
    # v·(a+b)·c is CUBIC in corpus magnitude — at 100 TB it exceeds
    # int64, which wraps SILENTLY under non-ANSI arithmetic.
    # Accumulate in decimal(38,0) (the export._shard_stats checksum
    # pattern): 10³⁸ headroom, and a true overflow surfaces as NULL
    # instead of a wrong number. Still exact integers — the one
    # closing division is unchanged.
    two_six = F.col(value_col).cast("decimal(38,0)") * (
        F.lit(2) * F.col("cum") - F.col("c") + F.lit(1)
    ) * F.col("c")  # v·(a+b)·c
    agg = c.agg(
        F.sum("c").alias("n"),
        F.sum(F.col(value_col).cast("decimal(38,0)") * F.col("c")).alias("t"),
        F.sum(two_six).alias("s2"),
    )
    return agg.select(
        "n",
        # schema-stable long output; a total past int64 nulls (visible)
        # rather than wrapping (invisible)
        F.col("t").cast("long").alias("total"),
        (
            (F.col("s2") - (F.col("n") + F.lit(1)) * F.col("t")).cast("double")
            / (F.col("n") * F.col("t"))
        ).alias("gini"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """Reliability diagram data for a probabilistic score vs a 0/1
    label: one row per score-decile bin — (bin, n, mean_score,
    frac_pos). A well-calibrated score has frac_pos ≈ mean_score per
    bin; AUC (q_auc_score) measures RANKING, this measures whether the
    score's VALUE means what it says — both gates before thresholding
    a quality filter on "p > 0.8".

    Bin edges are the score's own exact interpolated quantiles
    (equal-population bins — the reliability-diagram convention that
    keeps every bin's estimate equally tight). frac_pos is one exact
    integer division; mean_score is Σscore/n with the sum left to one
    final division (no rounding — scores here are parity-exact
    doubles). Empty bins (possible under heavy score ties, since
    ties all land one side of an edge) are kept via the explicit
    spine with NULL stats.

    Scale shape: one percentile aggregation, one broadcast edge
    attach, one groupBy over ``bins`` keys."""
    edges = df.agg(
        *[
            F.percentile(F.col(score_col), F.lit(i / bins)).alias(f"e{i}")
            for i in range(1, bins)
        ]
    )
    binned = df.crossJoin(F.broadcast(edges)).select(
        F.col(label_col).cast("long").alias("y"),
        F.col(score_col).alias("s"),
        sum(
            (F.col(score_col) > F.col(f"e{i}")).cast("int") for i in range(1, bins)
        ).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.sum("s").alias("sum_s"),
        F.sum("y").alias("pos"),
    )
    spine = df.sparkSession.range(bins).select(F.col("id").cast("int").alias("bin"))
    # mean_score rounds to 6 (a float SUM is partition-order-sensitive
    # in its last ulp); frac_pos is an exact integer division and ships
    # unrounded
    return spine.join(counts, "bin", "left").select(
        "bin",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.round(F.col("sum_s") / F.col("n"), 6).alias("mean_score"),
        (F.col("pos").cast("double") / F.col("n")).alias("frac_pos"),
    )


def mutual_information(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Mutual information between two categorical columns, one row:
    (n, mi, nmi) — MI in nats plus the sqrt-normalized NMI
    = MI/√(H(a)·H(b)) in [0,1], the scale-free association measure
    that (unlike chi2's p-value framing) is comparable ACROSS column
    pairs — "which metadata field tells me most about the label".

    MI = Σ_cells (o/n)·ln(o·n / (ra·cb)) and the entropies are
    −Σ (m/n)·ln(m/n) — every ratio is exact integers before one IEEE
    log per cell/margin, summed over the r·c contingency (tiny) and
    rounded to 6 after summing. Same one-groupBy contingency shape as
    :func:`chi2_independence`; H terms come from the margins of that
    same reduction — and the same complete-case NULL exclusion
    (review r12): without it, NULL-keyed cells enter n and the
    entropies but are dropped from mi_raw by the null-rejecting
    joins, so mi sums a sub-distribution whose probabilities don't
    reach 1 while nmi normalizes by entropies of a different one."""
    cells = (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .agg(F.count("*").alias("o"))
    )
    from ._caches import tracked_persist

    cells = tracked_persist(cells)
    ra = cells.groupBy("a").agg(F.sum("o").alias("ra"))
    cb = cells.groupBy("b").agg(F.sum("o").alias("cb"))
    n = cells.agg(F.sum("o").alias("n"))

    def entropy(margins: DataFrame, cnt: str):
        p = F.col(cnt).cast("double") / F.col("n")
        return (
            margins.crossJoin(F.broadcast(n)).agg((-F.sum(p * F.log(p))).alias("h"))
        )
    ha = entropy(ra, "ra").select(F.col("h").alias("ha"))
    hb = entropy(cb, "cb").select(F.col("h").alias("hb"))
    po = F.col("o").cast("double") / F.col("n")
    mi = (
        cells.join(F.broadcast(ra), "a")
        .join(F.broadcast(cb), "b")
        .crossJoin(F.broadcast(n))
        .agg(
            F.first("n").alias("n"),
            F.sum(
                po
                * F.log(
                    (F.col("o").cast("double") * F.col("n"))
                    / (F.col("ra").cast("double") * F.col("cb"))
                )
            ).alias("mi_raw"),
        )
    )
    return (
        mi.crossJoin(F.broadcast(ha))
        .crossJoin(F.broadcast(hb))
        .select(
            "n",
            F.round("mi_raw", 6).alias("mi"),
            F.round(
                F.col("mi_raw") / F.sqrt(F.col("ha") * F.col("hb")), 6
            ).alias("nmi"),
        )
    )


def ols_trend(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group least-squares time trend: (group, n, slope_per_day,
    r2) — "is this metric drifting, and how hard" for every event
    type/source/domain in one pass; the regression complement of the
    rollup's anomaly flags (those find points, this finds direction).

    Parity discipline: the regression inputs are made EXACT INTEGERS
    first — x = whole seconds since the group's own first event
    (per-group offset keeps magnitudes small), y = floor(value·1000)
    milli-units — so every sum (Σx, Σy, Σxy, Σx², Σy²) is an exact
    BIGINT regardless of partition order; the closing normal-equation
    arithmetic then runs in doubles over identical bits on any engine
    (the q_auc_score discipline extended to regression). slope is
    reported per DAY in original value units: (num/den)·86.4.

    Scale shape: one min-per-group reduction joined back broadcast,
    one grouped sum pass. Nothing global, nothing quadratic."""
    xus = F.unix_micros(F.col(ts_col))
    mins = df.groupBy(group_col).agg(F.min(xus).alias("__t0"))
    # `div` (integer division), NOT `/`+cast: float division rounds to
    # the nearest double and the truncating cast can then land one
    # second off across an integer boundary — and engines disagree on
    # cast rounding (Spark truncates, others round)
    prep = (
        df.join(F.broadcast(mins), group_col)
        .withColumn("__us", xus)
        .select(
            group_col,
            F.expr("(__us - __t0) div 1000000").alias("x"),
            F.floor(F.col(value_col) * F.lit(1000)).cast("long").alias("y"),
        )
    )
    # x·y / x² / y² products of milli-unit longs overflow int64 well
    # before 100 TB group sizes; decimal(38,0) accumulation keeps the
    # sums exact (NULL on true overflow, never a silent wrap) and the
    # closing normal equations cast to double regardless
    s = prep.groupBy(group_col).agg(
        F.count("*").alias("n"),
        # sx/sy too — sx·sy in the closing numerator needs exact
        # first-order sums, and Σy wraps int64 at large-magnitude y
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy")
    den_x = n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx")
    den_y = n * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy")
    return s.select(
        group_col,
        "n",
        F.round((num / den_x) * F.lit(86.4), 6).alias("slope_per_day"),
        F.round((num / den_x) * (num / den_y), 6).alias("r2"),
    )


def welch_ttest(df: DataFrame, value_col: str, side_col: str) -> DataFrame:
    """Welch's two-sample t statistic + Cohen's d effect size, one
    row: (n1, n2, mean_diff, t_stat, cohens_d). The parametric
    mean-shift test next to the distribution-shape tests
    (:func:`ks_two_sample`, :func:`psi`) — "did the AVERAGE move, and
    by how many pooled standard deviations". No p-value: neither
    engine ships Student's CDF, and the statistic is what a monitor
    thresholds anyway. ``side_col`` must be 0/1.

    Parity discipline (the ols_trend pattern): values are exactified
    to milli-unit integers first, so Σy and Σy² per side are exact
    decimal(38,0) accumulations in any partition order (int64 wraps
    silently at corpus scale — a true >10³⁸ overflow NULLs instead);
    means, Bessel-corrected variances, t and d are then one fixed IEEE
    expression over identical bits, with /1000 de-scaling applied at
    the end. mean_diff is reported in original units."""
    side = F.col(side_col).cast("long")
    y = F.floor(F.col(value_col) * F.lit(1000)).cast("long")
    s = df.select(side.alias("s"), y.alias("y")).agg(
        F.sum("s").alias("n1"),
        F.sum(F.lit(1) - F.col("s")).alias("n2"),
        # the FIRST-order sums overflow too (Σ of 3e15 milli-units wraps
        # past ~3100 rows), not just the squares: decimal(38,0) for all
        # four (exact; NULL on true overflow, never a silent wrap)
        F.sum(F.col("s") * F.col("y").cast("decimal(38,0)")).alias("s1"),
        F.sum((F.lit(1) - F.col("s")) * F.col("y").cast("decimal(38,0)")).alias("s2"),
        F.sum(F.col("s") * F.col("y").cast("decimal(38,0)") * F.col("y")).alias("q1"),
        F.sum((F.lit(1) - F.col("s")) * F.col("y").cast("decimal(38,0)") * F.col("y")).alias("q2"),
    )
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    m1 = F.col("s1").cast("double") / n1
    m2 = F.col("s2").cast("double") / n2
    v1 = (n1 * F.col("q1").cast("double") - F.col("s1").cast("double") * F.col("s1")) / (
        n1 * (n1 - F.lit(1.0))
    )
    v2 = (n2 * F.col("q2").cast("double") - F.col("s2").cast("double") * F.col("s2")) / (
        n2 * (n2 - F.lit(1.0))
    )
    diff = m1 - m2
    t = diff / F.sqrt(v1 / n1 + v2 / n2)
    pooled = F.sqrt(((n1 - F.lit(1.0)) * v1 + (n2 - F.lit(1.0)) * v2) / (n1 + n2 - F.lit(2.0)))
    return s.select(
        "n1",
        "n2",
        F.round(diff / F.lit(1000.0), 6).alias("mean_diff"),
        F.round(t, 6).alias("t_stat"),
        F.round(diff / pooled, 6).alias("cohens_d"),
    )


def spearman_global(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Whole-table Spearman rho, one row (n, rho) — the GLOBAL variant
    of :func:`spearman_by_group`, restructured for scale: a grouped
    window with a constant key optimizes into an unpartitioned Window
    (single-task corpus sort — the exact hazard tools/plan_audit.py
    flags, and how this function came to exist). Instead, midranks
    come from the distinct-value reduction: rank(v) = cum(≤v) − c_v +
    (c_v + 1)/2 via the two-level distributed_cumsum, joined back to
    the rows by value (vocabulary-sized tables, unhinted — AQE
    broadcasts real ones).

    Midranks are half-integers; the sums are order-independent-exact
    while n³ stays under 2⁵¹ (n ≲ 10⁵ — every gate SF; beyond that
    rho is a float estimate like any other big-data correlation)."""
    from .sampling import distributed_cumsum

    def midranks(col: str, out: str) -> DataFrame:
        g = df.groupBy(col).agg(F.count("*").alias("c"))
        c = distributed_cumsum(g, "c", [F.col(col).asc()], cum_col="cum")
        return c.select(
            F.col(col),
            (
                (F.col("cum") - F.col("c")).cast("double")
                + (F.col("c") + F.lit(1)) / F.lit(2.0)
            ).alias(out),
        )

    r = (
        df.select(x_col, y_col)
        .join(midranks(x_col, "rx"), x_col)
        .join(midranks(y_col, "ry"), y_col)
    )
    agg = r.agg(
        F.count("*").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return agg.select("n", (num / den).alias("rho"))
