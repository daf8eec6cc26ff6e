"""Dataset splitting & sampling for training-data pipelines.

- :func:`hash_split` — deterministic train/val/test assignment from a
  stable id hash. The property that matters at corpus scale: the
  assignment is a PURE FUNCTION of the row's id (and salt), so it is
  reproducible across runs, clusters, and partitionings, rows never
  migrate between splits when the corpus grows (new ids land in
  splits at the configured rates; old ids stay put), and no shuffle,
  sample(), or RNG state is involved — one codegen'd expression.
- :func:`stratified_sample` — per-stratum Bernoulli sampling
  (``df.sampleBy``) with a fixed seed: keeps a target mix across a
  quality/language/source column without materializing per-stratum
  counts first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 1_000_000  # split resolution: 1e-6 of probability mass


def split_bucket(id_col: Column, salt: int = 0) -> Column:
    """The stable per-row bucket in [0, 1e6) driving hash_split —
    exposed so callers can inspect or stratify on it."""
    return F.pmod(F.xxhash64(id_col, F.lit(salt)), F.lit(_BUCKETS))


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hashing its id.

    ``fractions`` maps split name → probability mass; they must sum to
    1 (within 1e-9) so the assignment is exhaustive — every row gets
    exactly one split, disjoint by construction (contiguous bucket
    ranges over one hash value). Deterministic under retries for the
    same reason the skew salts are (pure content hash, no
    monotonically_increasing_id / partition id)."""
    if not fractions:
        raise ValueError("need at least one split")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if split_col in df.columns:
        raise ValueError(f"column {split_col!r} already exists")
    bucket = split_bucket(F.col(id_col), salt)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = bucket < int(round(acc * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # the last split takes the remainder — exhaustive even under
    # floating-point rounding of the cumulative thresholds
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def seeded_shuffle(
    df: DataFrame, id_col: str, seed: int = 0, ord_col: str = "ord_key"
) -> DataFrame:
    """Deterministic global shuffle for training order: sort by
    ``md5(id ':' seed)``.

    Training runs need the corpus in a shuffled-but-REPRODUCIBLE order
    (restartable jobs, bit-identical ablations, auditable curricula).
    ``df.orderBy(rand(seed))`` fails all three at scale: rand() is
    seeded per-partition, so the order changes with partitioning and
    under task retry. A content hash of the row id is a pure function —
    the same corpus always yields the same order on any cluster, new
    documents interleave uniformly without moving existing neighbors,
    and a different ``seed`` gives an independent permutation.

    Spark executes the sort as a range exchange (sampled hash-value
    boundaries) + per-partition sort — no single-node merge — and a
    downstream ``.limit(k)`` collapses it to TakeOrdered. md5 (not
    xxhash64) so external systems and SQL engines can reproduce the
    exact order from the published recipe. ``id_col`` ties any hash
    collisions deterministically."""
    return df.withColumn(ord_col, seeded_ord(F.col(id_col), seed)).orderBy(
        ord_col, id_col
    )


def seeded_ord(id_col: Column, seed: int = 0) -> Column:
    """:func:`seeded_shuffle`'s order key as a bare Column — for
    consumers that need the deterministic position WITHOUT paying the
    global sort: when the next operator is a hash exchange (a groupBy,
    a hash-shard assignment) the order would be destroyed anyway and
    re-established per group locally, so the range-exchange + full
    corpus sort is pure waste at scale. Same md5 recipe, so positions
    agree bit-for-bit with seeded_shuffle's."""
    return F.md5(F.concat_ws(":", id_col.cast("string"), F.lit(str(seed))))


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 7
) -> DataFrame:
    """Per-stratum Bernoulli sample at the given rates (strata missing
    from ``fractions`` are dropped — the data-mixing convention)."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def domain_mixture(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Downsample the corpus to a target domain mixture (the
    data-mixing step of corpus prep: "40% web, 15% code, ..."),
    keeping as much data as the mixture allows.

    The total is set by the BINDING domain — the one that runs out
    first at its target share (T = min_d n_d / w_d) — so that domain
    keeps everything and every other domain downsamples to its share;
    no domain ever upsamples (epochs/repetition is a training-loop
    decision, not a corpus transform). Row selection reuses
    :func:`split_bucket`'s content-hash Bernoulli, so the sample is a
    pure function of (id, salt): reproducible across runs/partitioning
    and stable under corpus growth, unlike seeded ``sample()``.

    Per-domain counts are collected to the driver — domains are a
    bounded vocabulary (sources/languages), not data-proportional.
    Domains absent from ``weights`` (or weighted 0) are dropped.
    Weights need not sum to 1; they are normalized."""
    pos = {d: w for d, w in weights.items() if w > 0}
    if not pos:
        raise ValueError("need at least one positive weight")
    total_w = sum(pos.values())
    pos = {d: w / total_w for d, w in pos.items()}
    counts = {
        r[0]: r[1]
        for r in df.groupBy(domain_col).agg(F.count("*").alias("n")).collect()
    }
    absent = [d for d in pos if counts.get(d, 0) == 0]
    if absent:
        raise ValueError(f"target domains have no rows: {absent}")
    cap = min(counts[d] / w for d, w in pos.items())
    thresholds = {
        d: int(round(min(1.0, w * cap / counts[d]) * _BUCKETS)) for d, w in pos.items()
    }
    thr = F.create_map(
        *[x for d, t in thresholds.items() for x in (F.lit(d), F.lit(t))]
    )
    bucket = split_bucket(F.col(id_col), salt)
    return df.filter(bucket < F.coalesce(thr[F.col(domain_col)], F.lit(0)))


def cap_per_group(
    df: DataFrame,
    group_col: str,
    max_rows: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cap each group at ``max_rows`` rows, chosen by a deterministic
    content-hash order — the "at most N documents per domain/source"
    rule corpus preps apply against mega-domains.

    The selection key is md5 of the id (not a seeded random() — the
    kept set is a pure function of the data, reproducible across
    runs, partitionings, and engines), so over-cap groups keep a
    stable pseudo-random subset and under-cap groups keep everything.
    One hash-partitioned sort per group (the row_number window);
    no sampling state, no driver involvement."""
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_rows)
        .drop("__rn")
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    count_col: str = "n_tokens",
    n_groups: int = 64,
    salt: int = 0,
) -> DataFrame:
    """Pack documents into fixed-token-budget training sequences:
    (``id_col``, n_tokens, group_id, seq_id, oversize) — the id column
    keeps its input name and type.

    Training batches want sequences filled to ``max_tokens`` — padding
    waste is compute waste — so corpus prep bin-packs document token
    counts. Exact bin packing is NP-hard and needs global state; the
    at-scale shape is hash-partition the corpus into ``n_groups``
    independent groups (deterministic content hash, same reproducibility
    contract as :func:`hash_split`) and run first-fit-decreasing WITHIN
    each group via ``applyInPandas``. FFD's guarantee survives the
    partitioning: within a group at most one open bin is ≤ half full
    (two such bins would have been merged), so fill efficiency is
    bounded below ~0.5 globally with n_groups slack bins, and in
    practice lands ≥ 0.8. No global sort, no driver state: one shuffle
    on the group key, Python touches only (id, count) pairs — the
    token counts, never the text.

    ``seq_id`` is globally unique and reproducible:
    group_id * 2^32 + local bin index, with groups and local order both
    derived deterministically (sort by count desc, id asc). Documents
    longer than ``max_tokens`` get a singleton sequence flagged
    ``oversize`` (chunk upstream if truncation is not acceptable);
    scale ``n_groups`` with the cluster — each group's (id, count)
    pairs must fit one task comfortably (16 bytes/doc)."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    import pandas as pd

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values([count_col, id_col], ascending=[False, True])
        gid = int(pdf["__g"].iloc[0])
        base = gid << 32
        bins: list[int] = []  # remaining capacity per open bin
        out_seq, out_over = [], []
        for n in pdf[count_col]:
            if pd.isna(n) or n < 0:
                # e.g. size(NULL) = -1 from a null text upstream: a
                # negative count would slip into a CLOSED bin
                # (rem = -1 >= -1) or inflate a fresh bin past
                # max_tokens — fail loudly instead of silently
                # breaking the capacity/singleton guarantees
                raise ValueError(f"pack_sequences: invalid token count {n!r}")
            n = int(n)
            if n > max_tokens:
                out_seq.append(base + len(bins))
                # -1 closes the bin: a 0 would still admit zero-token
                # docs (rem >= 0 holds), breaking the oversize-
                # singleton guarantee
                bins.append(-1)
                out_over.append(True)
                continue
            for i, rem in enumerate(bins):
                if rem >= n:
                    bins[i] = rem - n
                    out_seq.append(base + i)
                    break
            else:
                out_seq.append(base + len(bins))
                bins.append(max_tokens - n)
            out_over.append(False)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                "n_tokens": pdf[count_col].astype("int64").values,
                "group_id": gid,
                "seq_id": out_seq,
                "oversize": out_over,
            }
        )

    grouped = df.select(id_col, count_col).withColumn(
        "__g", F.pmod(F.xxhash64(F.col(id_col), F.lit(salt)), F.lit(n_groups))
    )
    # the id field's type follows the INPUT (review r12): the schema
    # previously hardcoded 'doc_id long', so a string id — accepted
    # happily by the hash grouping — crashed every task at Arrow
    # conversion
    id_type = dict(df.dtypes)[id_col]
    return grouped.groupBy("__g").applyInPandas(
        pack,
        f"{id_col} {id_type}, n_tokens long, group_id int, seq_id long, oversize boolean",
    )


def distributed_cumsum(
    df: DataFrame,
    weight_col: str,
    order_by: list,
    cum_col: str = "cum_weight",
    partitions: int | None = None,
) -> DataFrame:
    """Exact GLOBAL running total of ``weight_col`` in ``order_by``
    order (list of Columns with direction, e.g. ``[F.col("q").desc(),
    F.col("id")]`` — must be a TOTAL order for determinism), computed
    scalably: the naive ``Window.orderBy`` global cumsum funnels the
    whole corpus through ONE task; this is the classic two-level
    prefix sum instead —

    1. ``repartitionByRange`` on the order (range partition i holds
       rank-contiguous rows, partition index follows the order);
    2. per-partition weight totals → driver (one tiny row per
       partition) → prefix offsets;
    3. per-partition LOCAL window cumsum (parallel) + broadcast
       offset.

    Every step is bounded: the only global exchange is the range
    partitioning itself, and the driver sees #partitions numbers.

    The ranged frame is PERSISTED before the totals pass:
    ``repartitionByRange`` samples its boundaries with a per-execution
    seed, so without pinning one materialization the offsets job and
    the cumsum job can see DIFFERENT partitionings and the offsets
    land on the wrong rows (observed live as a silent wrong answer).
    The cache is the price of an exact global order — any exact
    ranked computation materializes that order somewhere — and it
    spills to disk and is released by the harness between runs
    (operators/_caches.py)."""
    from ._caches import tracked_persist

    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *order_by)
    with_pid = tracked_persist(ranged.withColumn("__pid", F.spark_partition_id()))
    totals = {
        r["__pid"]: r["s"]
        for r in with_pid.groupBy("__pid").agg(F.sum(weight_col).alias("s")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    off = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(p) for p in sorted(offsets)]),
            F.array(*[F.lit(offsets[p]) for p in sorted(offsets)]),
        ),
        F.col("__pid"),
    )
    w = Window.partitionBy("__pid").orderBy(*order_by)
    return (
        with_pid.withColumn(cum_col, F.sum(weight_col).over(w) + off)
        .drop("__pid")
    )


def budget_select(
    df: DataFrame,
    weight_col: str,
    budget,
    order_by: list,
    cum_col: str = "cum_weight",
) -> DataFrame:
    """Greedy selection under a global budget: take rows in
    ``order_by`` order while the running ``weight_col`` total stays
    ≤ ``budget`` — the token-budget corpus-curation primitive ("best
    documents first until the training budget is full"), exact and
    deterministic given a total order, built on
    :func:`distributed_cumsum` so no single task ever sees the whole
    corpus."""
    cum = distributed_cumsum(df, weight_col, order_by, cum_col)
    return cum.filter(F.col(cum_col) <= budget)


def _canonical_ids(docs: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    """(id, canonical_id): the near-dup family representative — the
    component minimum for clustered docs, the doc's own id for
    singletons. Shared by leakage_safe_split and leakage_safe_kfold
    so the family definition cannot drift between protocols."""
    from .dedup import duplicate_clusters

    clusters = duplicate_clusters(pairs)  # (doc_id, cluster_id)
    return docs.select(F.col(id_col)).join(
        clusters.withColumnRenamed("doc_id", id_col), id_col, "left"
    ).select(
        F.col(id_col),
        F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("canonical_id"),
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Train/val/test split in which near-duplicates NEVER straddle a
    boundary — the leakage control :func:`hash_split` cannot give: a
    test document whose near-copy sits in train inflates every
    evaluation it touches (the dedup-then-split ordering problem).

    Connected components over ``pairs`` (the near-dup graph from any
    dedup pair generator) give each document a canonical id — the
    component minimum for clustered docs, the document's own id for
    singletons — and the split decision hashes the CANONICAL id, so a
    whole duplicate family moves as one unit. The draw is the
    cross-engine :func:`md5_uniform` (not xxhash64), so an exact-set
    SQL oracle can replay the assignment bit-for-bit. Returns
    (id, canonical_id, split).

    Scale shape: components are the O(log² n) alternating-star rounds
    over the EDGE set (pairs, not corpus²); the canonical attach is
    one left join against the vocabulary-of-clustered-docs (AQE
    broadcasts real ones); the split itself is pure codegen."""
    if not fractions:
        raise ValueError("need at least one split")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    canon = _canonical_ids(docs, pairs, id_col)
    u = md5_uniform(F.concat(F.col("canonical_id").cast("string"), F.lit(salt)))
    expr, acc = None, 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return canon.select(id_col, "canonical_id", expr.alias(split_col))


def md5_uniform(id_col: Column) -> Column:
    """A deterministic uniform in the OPEN interval (0, 1): the first
    13 hex digits of md5(id) as an integer, +0.5, over 2^52. 13 hex
    digits = 52 bits and the half-step both stay exactly
    representable in a double, so engines that parse the same hex
    prefix (DuckDB: (('0x'||substr)::UBIGINT::DOUBLE + 0.5)) get the
    bit-identical uniform — the md5-order convention of
    :func:`cap_per_group`, extended from ordering to numeric draws.
    The open interval matters: an all-zero prefix would give u = 0,
    where Spark's log(0) is NULL (sorts FIRST — unconditionally
    sampled) while other engines give -inf (sorts last); the
    half-step excludes both endpoints so ``-ln(u)`` is always finite
    and positive."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 13), 16, 10).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 52))


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement of ``k`` rows, inclusion
    probability ∝ ``weight_col`` — the Efraimidis–Spirakis one-pass
    scheme in its exponential-race form: each row draws
    ``key = -ln(u) / w`` (an Exp(w) arrival time with u the
    deterministic md5 uniform) and the k EARLIEST arrivals win.

    Deterministic by construction: the draw is a pure content hash,
    so the sample is a function of the data — reproducible across
    runs, partitionings, and engines (the catalog oracle replays the
    identical formula in SQL). The key is rounded to 12 decimals
    with an id tiebreak so cross-engine libm ulp noise cannot flip a
    rank. Selection is orderBy+limit → TakeOrdered: per-partition
    top-k heaps, k rows to the driver, NO global sort — the same
    plan shape at 100 TB. Rows with non-positive weight are excluded
    (zero mass; the race is undefined for them)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    key = F.round(-F.log(md5_uniform(F.col(id_col))) / F.col(weight_col), 12)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__wskey", key)
        .orderBy("__wskey", id_col)
        .limit(k)
        .drop("__wskey")
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Stratified :func:`weighted_sample`: the Efraimidis–Spirakis
    race run independently inside every group — "k documents per
    domain, weighted by quality" in one pass. Same deterministic
    md5-draw key (the sample is a pure function of the data), ranked
    by a per-group row_number window: one hash-partitioned sort per
    group, state bounded by k, no global ordering anywhere. Groups
    with fewer than k positive-weight rows keep everything."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    key = F.round(-F.log(md5_uniform(F.col(id_col))) / F.col(weight_col), 12)
    w = Window.partitionBy(group_col).orderBy(key, F.col(id_col))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__wsrn", F.row_number().over(w))
        .filter(F.col("__wsrn") <= k)
        .drop("__wsrn")
    )


def assign_contiguous_ids(
    df: DataFrame,
    order_by: list,
    id_col: str = "row_id",
    start: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """Dense 0-based (``start``-based) row ids in exact ``order_by``
    order — global ``row_number`` WITHOUT the single-task global
    Window: a unit-weight :func:`distributed_cumsum` (range exchange
    + per-partition counts to the driver + parallel LOCAL windows).
    The id a row gets is a pure function of the data and the total
    order, so retries and re-runs reproduce it — unlike
    ``monotonically_increasing_id`` (partition-layout-dependent) or
    ``zipWithIndex`` (RDD materialization). ``order_by`` must be a
    TOTAL order (include a tiebreaker key) or ids within a tie are
    nondeterministic. This is the shard/packing indexing primitive:
    training-example numbering, stable offsets for resumable
    exports, contiguous cluster relabeling."""
    out = distributed_cumsum(
        df.withColumn("__one", F.lit(1)),
        "__one",
        order_by,
        cum_col="__rk",
        partitions=partitions,
    )
    return out.withColumn(
        id_col, (F.col("__rk") - 1 + start).cast("bigint")
    ).drop("__one", "__rk")


def temperature_mixture(
    df: DataFrame,
    domain_col: str,
    temperature: float = 2.0,
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Temperature-flattened domain rebalancing — the standard
    multilingual/multi-source mixing rule (the XLM-R p^(1/T)
    schedule): target share ∝ (n_d / N)^(1/T), so T = 1 keeps the
    natural distribution, T → ∞ approaches uniform, and anything
    between upweights rare domains WITHOUT upsampling (the binding
    domain caps the total; epochs are a training-loop decision, same
    policy as :func:`domain_mixture`, which this derives weights for).

    The per-domain counts collect to the driver (bounded vocabulary)
    and the kept set is the same content-hash Bernoulli — a pure
    function of (id, salt), reproducible across runs and corpus
    repartitioning. T = 2 (sqrt flattening) has the property that
    both engines of a differential harness compute it bit-identically
    (IEEE sqrt is correctly rounded; arbitrary pow is not), which is
    why the catalog contract pins that setting."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    counts = {
        r[0]: r[1]
        for r in df.filter(F.col(domain_col).isNotNull())
        .groupBy(domain_col)
        .agg(F.count("*").alias("n"))
        .collect()
    }
    if not counts:
        raise ValueError(f"no non-null domains in {domain_col!r}")
    total = sum(counts.values())
    weights = {d: (n / total) ** (1.0 / temperature) for d, n in counts.items()}
    return domain_mixture(df, domain_col, weights, id_col=id_col, salt=salt)


def temporal_embargo_split(
    events: DataFrame,
    ts_col: str,
    cutoff: str,
    embargo_seconds: int = 0,
    entity_col: str | None = None,
    entity_embargo_seconds: int | None = None,
) -> DataFrame:
    """Leakage-safe TIME split (the purged/embargoed split of
    financial ML, de Prado 2018, applied to training-data curation):
    rows strictly before ``cutoff − embargo_seconds`` are ``train``,
    rows at/after ``cutoff`` are ``test``, and the gap between them is
    labeled ``embargo`` (dropped from both sides — adjacent-in-time
    rows share information, so a gapless split leaks the test
    horizon's immediate past into training). With ``entity_col`` +
    ``entity_embargo_seconds``, train rows of an entity that ALSO
    appears in test are additionally labeled ``purged`` when they fall
    within the entity embargo of that entity's FIRST test timestamp —
    the per-entity proximity-leakage rule (an entity's own recent
    history is the strongest leak).

    Returns the input plus a ``split`` column
    (train/test/embargo/purged); timestamps compare in the engine's
    pinned UTC zone, and every label is a deterministic pure function
    of (ts, entity first-test ts) — any engine replays it identically.

    Scale: one scan for the base labeling; the entity rule adds one
    per-entity min-aggregation over the test slice and a broadcast-
    friendly equi-join — no window over the corpus."""
    if embargo_seconds < 0:
        raise ValueError("temporal_embargo_split: embargo_seconds must be >= 0")
    if (entity_col is None) != (entity_embargo_seconds is None):
        raise ValueError(
            "temporal_embargo_split: entity_col and entity_embargo_seconds "
            "come together"
        )
    cut = F.to_timestamp(F.lit(cutoff))
    ts = F.col(ts_col).cast("timestamp")
    train_hi = cut - F.expr(f"INTERVAL {int(embargo_seconds)} SECOND")
    base = events.withColumn(
        "split",
        F.when(ts >= cut, F.lit("test"))
        .when(ts < train_hi, F.lit("train"))
        .otherwise(F.lit("embargo")),
    )
    if entity_col is None:
        return base
    first_test = (
        base.filter(F.col("split") == "test")
        .groupBy(entity_col)
        .agg(F.min(ts).alias("__first_test_ts"))
    )
    return (
        base.join(F.broadcast(first_test), entity_col, "left")
        .withColumn(
            "split",
            F.when(
                (F.col("split") == "train")
                & F.col("__first_test_ts").isNotNull()
                & (
                    ts
                    >= F.col("__first_test_ts")
                    - F.expr(f"INTERVAL {int(entity_embargo_seconds)} SECOND")
                ),
                F.lit("purged"),
            ).otherwise(F.col("split")),
        )
        .drop("__first_test_ts")
    )


def streaming_uniform_sample(
    state_root: str,
    id_col: str = "event_id",
    payload_cols: "Sequence[str]" = (),
    k: int = 256,
    salt: str = "smp",
    run_id: "Optional[str]" = None,
):
    """``foreachBatch`` sink maintaining a DETERMINISTIC uniform
    sample of everything the stream has ever delivered — the
    monitoring face of sampling: eyeball k documents of an infinite
    ingest, feed a drift detector, or seed a quality audit, without
    retaining the stream.

    Rather than a random reservoir (whose contents depend on arrival
    order and RNG state, so no two runs agree), the sample is
    BOTTOM-K BY HASH: every row draws the md5 order key
    ``md5(salt:id)`` and the k smallest keys win. bottom-k(A ∪ B) ≡
    bottom-k(bottom-k(A) ∪ B), so folding each micro-batch's local
    bottom-k into the persisted state is EXACT — after any prefix of
    the stream, the state equals the batch bottom-k over all rows so
    far, which is what makes the catalog entry's SQL oracle possible
    (rollup_mv's sample_col discipline, promoted to a standalone
    corpus-wide sample).

    State is one ≤ k-row parquet behind a tmp+rename pointer flip
    with the shared replayed-batch guard (operators/rollup_mv.py):
    re-delivered micro-batches are skipped by recorded batch_id, so
    at-least-once foreachBatch cannot re-merge. Ids must be unique
    across the stream (exact duplicate rows are dropped by a
    distinct() on the k-bounded union; two rows sharing an id with
    DIFFERENT payloads would both qualify and are the caller's
    upstream dedup problem — documented, not hidden).

    Scale shape: per batch, one TakeOrdered(k) over the batch (no
    full sort — Spark plans orderBy+limit as a partial top-k) plus a
    union with ≤ k state rows; state size is k rows forever, and the
    driver never sees row data. Read back with
    :func:`read_uniform_sample`.
    """
    import os

    from .rollup_mv import (
        _flip_pointer,
        _is_replayed_batch,
        _read_pointer,
        _warn_if_anonymous,
    )

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    label = f"streaming_uniform_sample({state_root!r})"
    _warn_if_anonymous(run_id, label)
    payload = list(payload_cols)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(state_root, exist_ok=True)
        cur = _read_pointer(state_root)
        if _is_replayed_batch(cur, batch_id, run_id, label):
            return
        ordk = F.md5(
            F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))
        ).alias("__ord")
        bk = (
            batch_df.select(F.col(id_col), *[F.col(c) for c in payload], ordk)
            .orderBy("__ord", id_col)
            .limit(k)
        )
        if cur is not None:
            prev = batch_df.sparkSession.read.parquet(
                os.path.join(state_root, cur["path"])
            )
            merged = (
                prev.unionByName(bk).distinct().orderBy("__ord", id_col).limit(k)
            )
            version = cur["version"] + 1
        else:
            merged = bk
            version = 1
        rel = f"v{version:06d}"
        merged.write.mode("overwrite").parquet(os.path.join(state_root, rel))
        _flip_pointer(
            state_root,
            {"version": version, "batch_id": batch_id, "path": rel, "run_id": run_id},
        )

    return apply_batch


def read_uniform_sample(spark, state_root: str) -> DataFrame:
    """Current contents of a :func:`streaming_uniform_sample` state
    dir (≤ k rows, including the ``__ord`` hash key). Raises if no
    batch has committed yet."""
    import os

    from .rollup_mv import _read_pointer

    cur = _read_pointer(state_root)
    if cur is None:
        raise FileNotFoundError(f"no committed sample state under {state_root}")
    return spark.read.parquet(os.path.join(state_root, cur["path"]))


def waterfill_quota(
    df: DataFrame,
    group_col: str,
    budget: int,
) -> DataFrame:
    """Water-filling budget allocation across groups — the fair
    mixing policy "cap the big domains, keep the small ones whole":
    every group receives quota = min(its row count, a common level t),
    with t the largest level the ``budget`` affords; the sub-level
    remainder (budget − Σ quotas < #capped groups) goes +1 each to
    the first capped groups in (count, name) order, so the quotas sum
    to EXACTLY min(budget, total rows) and the whole allocation is a
    deterministic pure function of the counts.

    Closed form, all integer arithmetic: with groups sorted by count
    ascending (prefix sums P_j, m_j groups remaining at row j), the
    candidate level at row j is t_j = (B − P_{j−1}) div m_j, and the
    water line sits at the FIRST row where t_j < c_j — every earlier
    group is below the line and keeps all its rows. No iteration, no
    floats; replayable as three SQL window functions.

    Returns (group_col, n, quota). Scale shape: one grouped count
    collapses the corpus; everything after runs on the GROUP-
    CARDINALITY frame (domains/languages — thousands at most), where
    an unpartitioned window is a deliberate scalar-bounds computation,
    not a corpus sort. Row selection INSIDE each group (which rows
    fill the quota) is the caller's policy — md5-rank via
    cap_per_group(quota) keeps it deterministic."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    counts = df.groupBy(group_col).agg(F.count("*").alias("n"))
    w_ord = Window.orderBy("n", group_col)
    w_all = Window.partitionBy()
    base = counts.select(
        group_col,
        "n",
        F.row_number().over(w_ord).alias("j"),
        (F.sum("n").over(w_ord) - F.col("n")).alias("p_prev"),
        F.count("*").over(w_all).alias("ng"),
    )
    b = F.lit(int(budget))
    m = F.col("ng") - F.col("j") + 1
    tj = F.expr(f"({int(budget)} - p_prev) div (ng - j + 1)")
    flagged = base.select(
        group_col,
        "n",
        "j",
        "p_prev",
        "ng",
        m.alias("m"),
        tj.alias("tj"),
        (tj < F.col("n")).alias("capped_here"),
    )
    cut = flagged.select(
        F.min(F.when(F.col("capped_here"), F.col("j"))).alias("cut_j")
    )
    joined = flagged.crossJoin(F.broadcast(cut))
    # level + remainder at the cut row ride along via a second window
    # pass: every row can recompute them from its own (p_prev, m)
    # only AT the cut, so broadcast the cut row's scalars
    cut_row = joined.filter(F.col("j") == F.col("cut_j")).select(
        F.col("tj").alias("t_level"),
        (b - F.col("p_prev") - F.col("tj") * F.col("m")).alias("leftover"),
        F.col("cut_j").alias("cj"),
    )
    out = joined.join(F.broadcast(cut_row), F.col("cut_j") == F.col("cj"), "left")
    quota = (
        F.when(F.col("cut_j").isNull(), F.col("n"))  # budget covers everything
        .when(F.col("j") < F.col("cut_j"), F.col("n"))
        .otherwise(
            F.col("t_level")
            + F.when(
                F.col("j") - F.col("cut_j") < F.col("leftover"), F.lit(1)
            ).otherwise(F.lit(0))
        )
    )
    return out.select(group_col, "n", quota.cast("long").alias("quota"))


def leakage_safe_kfold(
    docs: DataFrame,
    pairs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    salt: str = "",
    fold_col: str = "fold",
) -> DataFrame:
    """K-fold assignment with the same leakage control as
    :func:`leakage_safe_split`: near-duplicate FAMILIES are assigned
    to folds as units (fold = ⌊u·k⌋ on the canonical id's md5
    uniform), so cross-validation never evaluates on a near-copy of
    its own training data — per-fold hashing of raw ids breaks
    exactly the way a fractions split does. Returns
    (id, canonical_id, fold ∈ [0, k)).

    The LEAST(⌊u·k⌋, k−1) clamp guards the one-ulp edge where the
    float product of a u within an ulp of 1 rounds to exactly k;
    both engines clamp identically, so the oracle replays the exact
    assignment. Scale shape identical to the fractions split:
    components over the EDGE set, one canonical attach join, pure
    codegen for the draw."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    canon = _canonical_ids(docs, pairs, id_col)
    u = md5_uniform(F.concat(F.col("canonical_id").cast("string"), F.lit(salt)))
    fold = F.least(F.floor(u * F.lit(float(k))), F.lit(k - 1)).cast("int")
    return canon.withColumn(fold_col, fold)
