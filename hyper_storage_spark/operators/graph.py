"""Graph analytics over edge tables — the link-signal family next to
dedup.py's connected components:

- :func:`pagerank` (uniform / personalized / weighted) — the classic
  crawl-graph quality signal (page importance feeds pretraining-data
  quality filters; the personalized variant propagates trust from a
  known-good seed set, the weighted one splits mass by interaction
  volume);
- :func:`label_propagation` — transfer KNOWN labels (quality tier,
  domain, language) across a similarity/link graph by clamped
  synchronous majority vote;
- :func:`triangle_stats` — triangle census / global transitivity, the
  clique-ness diagnostic for connected-components dedup.

All three are the standard Spark Pregel-ish shape: the graph never
leaves the executors, every iteration is one edge⋈state join plus one
grouped reduction, and the driver holds only scalars.

Cross-engine exactness (the catalog's hash-compare contract): PageRank
folds per-node contribution sums in a PINNED two-level order —
md5-bucketed by source id, source-id-sorted within buckets,
bucket-sorted across them (a plain SUM over doubles re-associates per
partition) — with every constant entering both engines through the
same shortest-repr literal; label propagation and the triangle census
are pure integer/string arithmetic with lexicographic tie-breaks — so
outputs are bit-identical and even final orderings cannot diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._caches import tracked_persist

from typing import Optional


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
    seeds: Optional[DataFrame] = None,
    weight_col: Optional[str] = None,
    exact: bool = True,
    hub_buckets: int = 32,
    broadcast_state_rows: int = 2_000_000,
    partition_edges: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge table:
    (node, val) after ``iters`` synchronous updates of
    val(v) = (1−d)/N + d · Σ_{u→v} val(u)/outdeg(u).

    Variant notes (documented, deterministic): self-loops are dropped;
    dangling nodes (no out-edges) contribute nothing beyond the
    teleport term (no dangling-mass redistribution — the common
    simplification for quality-signal use); fixed iteration count, no
    convergence test (replayable by construction).

    ``seeds`` (optional, a one-column ``node`` frame) switches to
    PERSONALIZED PageRank: the walk restarts only at seed nodes —
    initial mass and the (1−d) teleport term concentrate uniformly on
    the seeds (seeds outside the graph are ignored), everything else
    starts at 0 and earns rank purely by proximity to the seed set.
    The data-curation use: seed the trusted/known-good nodes and rank
    the rest by how strongly the link structure ties them to quality.

    ``weight_col`` switches to WEIGHTED PageRank: a node's mass splits
    across out-edges proportionally to edge weight
    (val·w_e / Σ_out w). Duplicate (src, dst) rows sum their weights;
    zero/negative-weight edges are dropped (a zero total out-weight
    would divide by zero, and negative flow is undefined). For
    bit-exact oracle replay keep weights INTEGER-VALUED (counts,
    cents): integer-valued doubles sum exactly in any order, so the
    one division per edge stays IEEE-single-result.

    Mechanics: every node carries a zero-weight self-edge so it
    appears in every iteration's reduction even with no in-edges (and
    so both engines fold the IDENTICAL term list per node — the zero
    term included). Each iteration ends in a lazy localCheckpoint to
    truncate lineage (duplicate_clusters' discipline; swap for
    ``checkpoint`` with a reliable dir on a real cluster).

    ``exact=True`` (default): deterministic TWO-LEVEL fold. Each
    node's contribution terms are bucketed by a cross-engine-stable
    hash of the source id (13 hex digits of md5, mod ``hub_buckets``
    — the catalog's md5-uniform discipline), folded in pinned
    source-id order within each bucket, and the bucket partials
    folded in pinned bucket order. Deterministic regardless of
    physical partitioning AND hub-safe: a mega-in-degree node's term
    list splits across ``hub_buckets`` groups, so no single task ever
    materializes the whole list (the flat collect-list fold held a
    hub's entire in-edge array in one task — the power-law
    scale-killer this replaces). Oracles replay the identical
    two-level fold.

    ``exact=False``: production IEEE fast path — a plain SUM with
    map-side partial aggregation (no collect_list, no md5, hot keys
    combine before the shuffle). Results differ from exact mode only
    by float re-association (~1 ulp/term) and are NOT bit-reproducible
    across runs; use for throughput, keep exact mode for gates.

    Scale shape: iterations are edge-partitioned joins + grouped
    folds — the textbook distributed PageRank; driver state is two
    scalars.

    r12 loop layout (guide §2.4 "remove shuffles outright", §3.1),
    chosen by the MEASURED node count ``n``, never an estimate:

    - ``n <= broadcast_state_rows`` (default 2M ≈ ~100 MB built
      relation — inside the guide's "few hundred MB is fine" band,
      far under the 8 GB/512M-row broadcast cap): the per-iteration
      rank state — |nodes| slim rows — is BROADCAST into the edge
      join, so the edges never cross the join exchange (the
      checkpointed state scan has no stats, so the planner never
      found this join on its own — it sort-merged both sides every
      iteration). ``partition_edges=True`` additionally caches the
      edges hash-partitioned by the level-1 fold key ``(dst, b)``
      (fast mode: ``dst``) so the contribs exchange disappears too —
      a persisted cache ADVERTISES its partitioning where a
      checkpoint reports Unknown, and hub-safety becomes the
      partitioning itself (the hub's buckets live in different
      partitions). That trades a per-iteration columnar cache read
      for the fold exchange: a win only when the contribs are
      edge-dense (measured at sf0.1 gate scale the cache read LOSES,
      6.9 s vs 4.4 s, so the default keeps the localCheckpoint and
      pays the slim fold shuffles).
    - larger graphs: edges persisted hash-partitioned by ``src`` —
      the per-iteration join reuses that layout and shuffles ONLY the
      rank state (|nodes| rows, hinted SHUFFLE_HASH so neither side
      sorts); the fold exchanges are unchanged.

    Every layout folds in the same pinned order — results are
    bit-identical to the r11 loop (oracle-gated at three SFs)."""
    if hub_buckets < 1:
        raise ValueError(f"pagerank: hub_buckets must be >= 1, got {hub_buckets}")
    if weight_col is None:
        e = (
            edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .withColumn("w", F.lit(1.0))
        )
    else:
        e = (
            edges.select(
                F.col(src_col).alias("src"),
                F.col(dst_col).alias("dst"),
                F.col(weight_col).cast("double").alias("w"),
            )
            .filter((F.col("src") != F.col("dst")) & (F.col("w") > 0))
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
        )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    # node count AND mean id width in the ONE aggregation job the count
    # already paid: the broadcast-regime gate below is byte-aware (an
    # 8-iteration loop retains up to 8 driver-held broadcasts of the
    # rank state, and long string node ids can blow past what the row
    # count alone estimates — review r12)
    _stat = nodes.agg(
        F.count("*").alias("n"),
        F.avg(F.length(F.col("node").cast("string"))).alias("w"),
    ).collect()[0]
    n = int(_stat["n"])
    if n == 0:
        return nodes.withColumn("val", F.lit(0.0))
    deg = e.groupBy("src").agg(F.sum("w").alias("d"))
    # zero-weight self-edges: the per-node carrier (see docstring)
    e2 = (
        e.unionByName(
            nodes.select(
                F.col("node").alias("src"), F.col("node").alias("dst"),
                F.lit(0.0).alias("w"),
            )
        )
        .join(deg, "src", "left")
        .withColumn("d", F.coalesce(F.col("d"), F.lit(1.0)))
    )
    if exact:
        # cross-engine-stable source bucket, computed ONCE (it rides
        # the checkpointed edge table through every iteration): 13 hex
        # digits of md5 of the string id, mod hub_buckets — replayable
        # verbatim in SQL (('0x' || substr(md5(src),1,13))::UBIGINT % B)
        e2 = e2.withColumn(
            "b",
            (
                F.conv(F.substring(F.md5(F.col("src").cast("string")), 1, 13), 16, 10)
                .cast("bigint") % hub_buckets
            ).cast("int"),
        )
    # persist pre-partitioned instead of localCheckpoint (docstring
    # "r12 loop layout"): the cache ADVERTISES this partitioning to
    # every iteration's plan, a checkpoint scan reports Unknown and
    # re-shuffles the edges 8× over
    # rows gate + byte estimate: (node, val) rows ≈ UTF16 id + double +
    # ~48 B object/row overhead in the built relation; cap the regime at
    # ~256 MB of estimated broadcast (inside the guide's "few hundred
    # MB" band, far under the 8 GB hard cap) so id-heavy graphs fall to
    # the partitioned-edges regime instead of pressuring the driver
    _est_bytes = n * (2.0 * float(_stat["w"] or 0.0) + 8 + 48)
    use_bcast = n <= broadcast_state_rows and _est_bytes <= 256 * 1024 * 1024
    if not use_bcast:
        # big-graph regime: persist the edges hash-partitioned by src
        # (a cache ADVERTISES its partitioning; a checkpoint scan
        # reports Unknown) so the per-iteration join moves only the
        # slim rank state into the edges' layout, never the edges
        e2 = tracked_persist(e2.repartition("src"))
    elif partition_edges:
        # broadcast-sized node set but edge-dense (the 2M-host web
        # graph with 10^10 links): cache the edges clustered by the
        # level-1 fold key so the contribs NEVER cross an exchange —
        # the per-iteration columnar cache read costs more than the
        # tiny shuffles at gate scale (measured: 6.9 s vs 4.4 s at
        # sf0.1), which is why this is opt-in, not the default
        e2 = tracked_persist(
            e2.repartition("dst", "b") if exact else e2.repartition("dst")
        )
    else:
        e2 = e2.localCheckpoint()
    if seeds is not None:
        # seed flag joined once; mass and teleport concentrate on the
        # seed ∩ graph intersection (a seed with no edges can receive
        # no rank flow anyway)
        sset = (
            seeds.select(F.col(seeds.columns[0]).alias("node"))
            .distinct()
            .join(nodes, "node", "left_semi")
            .withColumn("__seed", F.lit(True))
            .localCheckpoint()
        )
        n_seed = sset.count()
        if n_seed == 0:
            raise ValueError("personalized pagerank: no seed appears in the graph")
        flagged = nodes.join(sset, "node", "left")
        pr = flagged.withColumn(
            "val",
            F.when(F.col("__seed").isNotNull(), F.lit(1.0 / n_seed)).otherwise(F.lit(0.0)),
        ).select("node", "val")
    else:
        flagged = None
        teleport = (1.0 - damping) / n  # two IEEE ops, mirrored in oracles
        pr = nodes.withColumn("val", F.lit(1.0 / n))
    # The per-iteration expressions ride as SQL strings (r13, the
    # catalog's expression-string discipline): the Column spelling of
    # the two-level pinned fold cost ~680 py4j roundtrips PER ITERATION
    # (measured 5,431 for the 8-iteration entry construction — pure
    # driver latency, multiplied under host noise). The strings parse
    # to the IDENTICAL Catalyst trees: same array_sort/transform/
    # aggregate fold (CAST(0 AS DOUBLE) is F.lit(0.0)'s double zero),
    # same left-assoc w*val/d, and the damping/teleport constants enter
    # through repr round-trip string→double casts — bit-identical
    # results (oracle-gated at three SFs, plus the direct old-vs-new
    # output equality probe run for this change).
    def _fold_sql(pair_a: str, pair_b: str, out: str) -> str:
        return (
            f"aggregate(transform(array_sort(collect_list(struct({pair_a}, {pair_b}))), "
            f"t -> t.{pair_b}), CAST(0 AS DOUBLE), (acc, x) -> acc + x) AS {out}"
        )

    _dlit = f"CAST('{damping!r}' AS DOUBLE)"
    for _ in range(iters):
        # rank state into the join WITHOUT moving the edges: broadcast
        # it outright when the graph is broadcast-sized (the n-gated
        # regime above), else shuffle only the slim state rows into
        # the edges' cached src-partitioning — SHUFFLE_HASH because a
        # sort-merge would sort the edge side every iteration
        state = F.broadcast(pr) if use_bcast else pr.hint("SHUFFLE_HASH")
        if exact:
            contribs = e2.join(state, e2["src"] == state["node"]).selectExpr(
                "dst", "b", "src AS u", "w * val / d AS c"
            )
            # level 1: pinned fold within (dst, src-bucket) — a hub's
            # terms split across hub_buckets groups (zero exchange in
            # the broadcast regime: the cache partitioning already
            # clusters (dst, b)); level 2: pinned fold of the bucket
            # partials (bounded at hub_buckets rows per node)
            folded = (
                contribs.groupBy("dst", "b")
                .agg(F.expr(_fold_sql("u", "c", "sb")))
                .groupBy("dst")
                .agg(F.expr(_fold_sql("b", "sb", "s")))
            )
        else:
            contribs = e2.join(state, e2["src"] == state["node"]).selectExpr(
                "dst", "w * val / d AS c"
            )
            folded = contribs.groupBy("dst").agg(F.sum("c").alias("s"))
        if seeds is not None:
            # the static flag frame reads from a checkpoint scan whose
            # stats the planner can't see — broadcast it explicitly in
            # the broadcast regime instead of letting it sort-merge
            flag_side = flagged.select("node", "__seed")
            pr = (
                folded.selectExpr("dst AS node", "s")
                .join(F.broadcast(flag_side) if use_bcast else flag_side, "node", "left")
                .selectExpr(
                    "node",
                    f"(CASE WHEN __seed IS NOT NULL THEN CAST('{(1.0 - damping) / n_seed!r}' "
                    f"AS DOUBLE) ELSE CAST(0 AS DOUBLE) END) + {_dlit} * s AS val",
                )
            )
        else:
            pr = folded.selectExpr(
                "dst AS node", f"CAST('{teleport!r}' AS DOUBLE) + {_dlit} * s AS val"
            )
        # lazy checkpoint per iteration: bounds the analyzed plan at
        # one iteration deep (an unbounded chain re-analyzes a growing
        # tree per op — measured SLOWER than the checkpoint at 8
        # iterations: 5.5 s vs 4.4 s at sf0.1) without eagerly running
        # a job per iteration the way an eager checkpoint would
        pr = pr.localCheckpoint(eager=False)
    return pr


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
) -> DataFrame:
    """Semi-supervised label propagation: (node, label) after
    ``iters`` synchronous majority votes — each node takes the most
    common label among its in-neighbors' current labels, ties broken
    by the lexicographically smallest label, and SEED nodes stay
    clamped to their given label forever. The data-curation use:
    transfer known labels (quality tier, domain, language) from a
    labeled subset across a similarity/link graph to the unlabeled
    rest.

    Determinism is structural, not numeric: votes are integer counts
    and the (count desc, label asc) argmax is a lexicographic struct
    MIN — no floating point anywhere, so any engine replays it
    bit-identically. Unlabeled nodes with no labeled in-neighbor stay
    absent until the frontier reaches them (the output may therefore
    have fewer rows than the graph has nodes). Every seed carries a
    self-edge so its row survives rounds where no neighbor is labeled
    yet (and feeds only its OWN vote, which the clamp overrides
    anyway).

    Scale shape: per iteration one edge⋈label join (hash-partitioned
    on the join key) and two grouped reductions; label state is one
    row per labeled node; lineage truncates per round via lazy
    localCheckpoint (duplicate_clusters' discipline)."""
    s = seeds.select(
        F.col(node_col).alias("node"), F.col(label_col).alias("slabel")
    ).distinct()
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .unionByName(s.select(F.col("node").alias("src"), F.col("node").alias("dst")))
        .localCheckpoint()
    )
    lab = s.select("node", F.col("slabel").alias("label"))
    for _ in range(iters):
        votes = (
            e.join(lab, e["src"] == lab["node"])
            .groupBy("dst", "label")
            .agg(F.count("*").alias("cnt"))
            .groupBy("dst")
            .agg(
                F.min(
                    F.struct((-F.col("cnt")).alias("nc"), F.col("label").alias("lab"))
                )["lab"].alias("vote")
            )
        )
        lab = (
            votes.select(F.col("dst").alias("node"), "vote")
            .join(s, "node", "left")
            .select("node", F.coalesce(F.col("slabel"), F.col("vote")).alias("label"))
            .localCheckpoint(eager=False)
        )
    return lab


def triangle_stats(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Triangle census of an undirected graph, one summary row:
    (n_nodes, n_edges, n_triangles, n_wedges, transitivity).
    Transitivity = 3·triangles / wedges (wedges = Σ deg·(deg−1)/2) —
    the global clustering coefficient. The dedup-graph diagnostic:
    near-dup components that are CLIQUES (transitivity → 1) are safe
    to collapse to one representative; long CHAINS (→ 0) warn that
    connected-components clustering is bridging dissimilar documents
    through intermediates.

    Exactness: counts are integers accumulated in decimal(38,0)
    (wedges are quadratic in degree — int64 would wrap silently on a
    power-law hub), and transitivity is ONE double division at the
    end. Triangle enumeration uses the canonical-ordering trick:
    every triangle {a<b<c} is counted exactly once as the edge pair
    (a,b),(b,c) closed by (a,c) — two equi-joins over the
    canonicalized edge table, no direction double-counting.

    Scale shape: two hash joins on node keys plus one degree
    reduction. For power-law graphs the standard refinement (join
    low-degree endpoints first) applies; at catalog scope the near-dup
    graph's components are dimension-bounded."""
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    nbrs = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = nbrs.groupBy("u").agg(F.count("*").alias("d"))
    base = deg.agg(
        F.count("*").alias("n_nodes"),
        (
            F.sum(
                F.col("d").cast("decimal(38,0)")
                * (F.col("d") - F.lit(1)).cast("decimal(38,0)")
            )
            / F.lit(2)
        ).cast("decimal(38,0)").alias("n_wedges"),
    )
    ab = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    bc = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    ac = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"]).agg(
        F.count("*").cast("decimal(38,0)").alias("n_triangles")
    )
    n_edges = e.agg(F.count("*").alias("n_edges"))
    return (
        base.crossJoin(F.broadcast(tri))
        .crossJoin(F.broadcast(n_edges))
        .select(
            "n_nodes",
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_triangles").cast("long").alias("n_triangles"),
            F.col("n_wedges").cast("long").alias("n_wedges"),
            F.round(
                F.try_divide(
                    (F.lit(3).cast("decimal(38,0)") * F.col("n_triangles")).cast("double"),
                    F.col("n_wedges").cast("double"),
                ),
                6,
            ).alias("transitivity"),
        )
    )


def link_scores(
    edges: DataFrame,
    top_k: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Link prediction over an undirected graph: score the node pairs
    that are NOT yet connected but share neighbors, by the three
    classic neighborhood indices —

    - ``cn``  common neighbors |Γ(a) ∩ Γ(b)| (integer),
    - ``jaccard``  |Γ(a) ∩ Γ(b)| / |Γ(a) ∪ Γ(b)| (one division),
    - ``ra``  the resource-allocation index
      Σ_{z ∈ Γ(a)∩Γ(b)} 1/deg(z) (Zhou/Lü/Zhang 2009 — rare shared
      neighbors weigh more than promiscuous hubs),
    - ``adamic_adar``  Σ_{z ∈ Γ(a)∩Γ(b)} 1/ln(deg z) (the same idea
      with a log-damped hub penalty).

    The curation use on the near-dup / citation / trade graphs:
    predicted links are the pairs a human would CHECK — documents that
    share many near-dup neighbors without being flagged as dups
    themselves (a transitivity gap), or entities the link structure
    says belong together. Returns the ``top_k`` rows as
    (a, b, cn, deg_a, deg_b, jaccard, ra, adamic_adar) ordered by
    (cn desc, a, b) — an integer-first ordering both engines replay
    identically, doubles only in the projection.

    Cross-engine exactness: cn/deg are integers; jaccard is ONE
    double division rounded to 6; ra folds 1/deg(z) — each term one
    correctly-rounded IEEE division — in PINNED common-neighbor order
    (array_sort + left fold — pagerank's discipline; a plain SUM
    re-associates per partition), so it is BIT-exact cross-engine.
    adamic_adar is NOT: ln is a transcendental and Java's Math.log
    disagrees with DuckDB's glibc ln by 1 ulp on ~1% of integer
    inputs (measured over 2..100000), so the catalog entry gates
    cn/jaccard/ra and pins adamic_adar in pytest instead. Every
    common neighbor has deg ≥ 2 by construction — no division by
    zero in either index.

    Scale shape: one self-join of the adjacency list on the shared
    neighbor z (the wedge enumeration — output bounded by Σ deg²/2,
    the same budget triangle_stats pays), one anti-join to drop
    existing edges, one grouped fold per candidate pair, TakeOrdered
    for the top-k (no global sort). For power-law graphs cap or
    pre-bucket mega-hubs first; at catalog scope degrees are
    dimension-bounded."""
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    nbrs = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = nbrs.groupBy("u").agg(F.count("*").alias("d"))
    # wedge enumeration: z adjacent to both a and b, emitted once per
    # unordered pair via a < b
    za = nbrs.select(F.col("u").alias("z"), F.col("v").alias("a"))
    zb = nbrs.select(F.col("u").alias("z"), F.col("v").alias("b"))
    wedges = (
        za.join(zb, "z")
        .filter(F.col("a") < F.col("b"))
        .join(deg.select(F.col("u").alias("z"), F.col("d").alias("dz")), "z")
    )
    cand = (
        wedges.join(
            e.select(F.col("u").alias("a"), F.col("v").alias("b")),
            ["a", "b"],
            "left_anti",
        )
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("cn"),
            # ONE sorted common-neighbor list; both index folds derive
            # from it in the projection below (a second collect_list +
            # array_sort here would double the dominant per-group cost)
            F.array_sort(F.collect_list(F.struct("z", "dz"))).alias("zs"),
        )
        .select(
            "a",
            "b",
            "cn",
            F.aggregate(
                F.transform(F.col("zs"), lambda t: F.lit(1.0) / t["dz"].cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("ra_raw"),
            F.aggregate(
                F.transform(
                    F.col("zs"), lambda t: F.lit(1.0) / F.log(t["dz"].cast("double"))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("aa"),
        )
    )
    scored = (
        cand.join(deg.select(F.col("u").alias("a"), F.col("d").alias("deg_a")), "a")
        .join(deg.select(F.col("u").alias("b"), F.col("d").alias("deg_b")), "b")
        .select(
            "a",
            "b",
            "cn",
            "deg_a",
            "deg_b",
            F.round(
                F.col("cn").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("cn")).cast("double"),
                6,
            ).alias("jaccard"),
            F.round(F.col("ra_raw"), 6).alias("ra"),
            F.round(F.col("aa"), 6).alias("adamic_adar"),
        )
    )
    return scored.orderBy(F.col("cn").desc(), "a", "b").limit(top_k)


def kcore(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """The k-CORE of an undirected graph: the maximal subgraph where
    every node keeps degree ≥ k, found by the classic peel — delete
    all nodes of degree < k, recompute, repeat to fixpoint. Returns
    (node, degree) with degree measured INSIDE the core. The dedup /
    link-graph use: the k-core is the noise-robust "dense heart" of a
    near-dup or interaction graph (cores survive spurious-edge
    deletion that cuts chains apart), the standard precursor to
    community mining and influence seeding.

    Determinism is structural: the k-core is UNIQUE (the peel order
    never changes the fixpoint), and everything is integer counting.
    An empty core returns an empty frame (the peel's last non-empty
    intermediate state is NOT the core — the fixpoint guard matters,
    and the pytest pins it).

    Scale shape: each round is one degree aggregation + two left-anti
    joins on the node key, lineage truncated per round
    (localCheckpoint, pagerank's discipline); rounds are bounded by
    the peel depth (tiny for power-law graphs — most mass peels in
    the first rounds). The driver holds one boolean per round. For
    adversarial long-chain graphs prefer batching all degrees < k per
    round (this does) over one-node-at-a-time peeling."""
    if k < 1:
        raise ValueError(f"kcore: k must be >= 1, got {k}")
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).localCheckpoint()
    while True:
        deg = sym.groupBy("u").agg(F.count("*").alias("degree"))
        low = deg.filter(F.col("degree") < k).select("u").localCheckpoint()
        if low.isEmpty():
            return deg.select(F.col("u").alias("node"), "degree")
        sym = (
            sym.join(low, "u", "left_anti")
            .join(low.select(F.col("u").alias("v")), "v", "left_anti")
            .localCheckpoint()
        )
        if sym.isEmpty():
            return deg.select(F.col("u").alias("node"), "degree").limit(0)
