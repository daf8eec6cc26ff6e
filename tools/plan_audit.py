"""Physical-plan linter over the FULL catalog (driver + extra tiers).

The plan-shape tests (tests/test_plan_shapes.py) pin the shapes we
designed deliberately; this tool is the complementary dragnet: it
builds every catalog entry's DataFrame and scans the executed plan for
node types that are scale-killers at 100 TB when they touch
data-proportional inputs:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — an O(n·m)
  pairwise compare that slipped past the equi-join design.
- ``BatchEvalPython`` — a row-at-a-time Python UDF (the Arrow paths
  show up as ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
  and are allowed).

A nested-loop join is NOT hazardous when its broadcast side is
provably bounded, so two shapes pass automatically:

- **Scalar-aggregate build side**: a grouping-key-less
  HashAggregate/SortAggregate emits exactly one row — the standard
  physical form of a scalar-subquery bound (corpus totals, thresholds,
  contract certificates). One row × n is a projection, not a blow-up.

Anything else needs a WAIVER below saying why the build side stays
O(1) in the data (fixed query set, gate-SF-only exact twin, ...), or
the tool exits non-zero. Usage::

    python tools/plan_audit.py [sf_dir] [entry ...]
"""

from __future__ import annotations

import re
import sys
import time

sys.path.insert(0, ".")

HARD_FLAGS = ("CartesianProduct", "BatchEvalPython")

# name -> [(pattern-that-must-appear-in-the-BNLJ-line-or-build-subtree,
#           reason the build side is bounded)]
WAIVERS: dict[str, list[tuple[str, str]]] = {
    "dedup_embedding_cosine": [
        (
            "embeddings.parquet",
            "the deliberately-quadratic exact oracle twin of the LSH scale "
            "path; hard max_rows=50k guard raises before it can run at scale",
        )
    ],
    "dedup_embedding_lsh": [
        (
            "embeddings.parquet",
            "in-plan recall contract computes the exact cosine pair set as "
            "its reference — a gate-SF verification harness (guarded "
            "quadratic twin); the scale output is dedup_embedding_lsh_raw",
        )
    ],
    "dedup_embedding_incremental": [
        (
            "embeddings.parquet",
            "same contract shape as dedup_embedding_lsh: the exact "
            "batch-involving pair set is the gate row's in-plan verifier "
            "(quadratic only at gate SF); the incremental operator itself "
            "is index-bucketed and never all-pairs",
        )
    ],
    "dedup_simhash": [
        (
            "simhash",
            "banding-completeness contract brute-forces hamming pairs over "
            "the cached signature set as its reference — gate-SF harness; "
            "the scale output is dedup_simhash_raw",
        )
    ],
    "emb_hard_negatives": [
        (
            "query_label",
            "build side is the fixed anchor set (5 rows by construction); "
            "the label-inequality residual makes the join non-equi, but the "
            "shape is exactly ann_cosine_topk's broadcast-queries x "
            "one-corpus-scan baseline — the documented ANN route covers "
            "corpus-scale mining",
        )
    ],
    "ann_cosine_topk": [
        (
            "query_id",
            "build side is the fixed query set (O(k) rows by construction, "
            "not data-proportional) — the designed broadcast-queries × "
            "one-corpus-scan shape",
        )
    ],
    "ann_lsh_bucket": [
        ("query_id", "fixed query set / exact-reference contract at gate SF"),
        ("recall", "in-plan recall certificate vs the exact top-k reference"),
    ],
    "ann_pq_contract": [
        ("query_id", "fixed query set / exact-reference contract at gate SF"),
        ("recall", "in-plan recall certificate vs the exact top-k reference"),
    ],
    "ann_pq_incremental": [
        ("query_id", "fixed query set / exact-reference contract at gate SF"),
        ("recall", "in-plan recall certificate vs the exact top-k reference"),
    ],
    "ann_ivfpq_contract": [
        ("query_id", "fixed query set / exact-reference contract at gate SF"),
        ("recall", "in-plan recall certificate vs the exact top-k reference"),
    ],
    "ann_ivfpq_incremental": [
        ("query_id", "fixed query set / exact-reference contract at gate SF"),
        ("recall", "in-plan recall certificate vs the exact top-k reference"),
    ],
    "ann_ivfpq_raw": [
        (
            "query_id",
            "build side is the fixed query set (O(k) rows by construction); "
            "the corpus side joins probes by cell equi-key — never all-pairs",
        ),
    ],
    "ann_ivf": [
        ("query_id", "fixed query set / exact-reference contract at gate SF"),
        ("recall", "in-plan recall certificate vs the exact top-k reference"),
        ("centroid", "broadcast centroid table — O(n_cells) config constant"),
    ],
    "ann_ivf_raw": [
        (
            "query_id",
            "build side is the fixed query set joined to broadcast "
            "centroids — O(k · n_cells), not data-proportional",
        ),
        ("centroid", "broadcast centroid table — O(n_cells) config constant"),
    ],
    "ann_join_contract": [
        (
            "embeddings.parquet",
            "the exact cross-corpus top-k reference (cosine_join_topk) is "
            "the contract's gate-SF quadratic twin; the ann_join path under "
            "test is bucketed and unhinted — never all-pairs",
        )
    ],
    "search_bm25_topk": [
        (
            "term",
            "build side is the fixed keyword-query term set — O(queries × "
            "terms), not data-proportional",
        )
    ],
    "ts_series_similarity": [
        (
            "qvec",
            "build side is the single densified query-series vector "
            "(bounded by the series span, not the corpus)",
        )
    ],
}

# Unpartitioned Window nodes (single-task global sort) are flagged
# unless waived here with the reason the INPUT frame is reduced —
# bounded by groups/days/queries, not by corpus rows. Anything
# corpus-proportional must restructure (partitioned window, TakeOrdered,
# or the two-level prefix sum in operators/sampling.distributed_cumsum).
WINDOW_WAIVERS: dict[str, list[tuple[str, str]]] = {
    "q_waterfill_budget": [
        (
            "lang#",
            "window input is the per-GROUP count frame (the corpus "
            "collapses through the groupBy first): rows bounded by group "
            "cardinality (languages/domains), the deliberate scalar-bounds "
            "computation waterfill_quota's docstring documents",
        ),
        (
            "count(1) windowspecdefinition",
            "the ng group-count scalar over the same group-cardinality "
            "frame (COUNT(*) OVER ()) — same bounded input as above",
        ),
    ],
    "q_moving_average": [
        (
            "day#",
            "window input is the pre-aggregated DAILY revenue series — "
            "rows bounded by the calendar span (thousands at any corpus "
            "size), not by corpus rows; documented at the query",
        )
    ],
    "q_user_growth": [
        (
            "day#",
            "running total over the per-day NEW-USER series — the "
            "corpus already collapsed through the first-seen groupBy, "
            "so the window input is calendar-bounded",
        )
    ],
    "text_langid_confusion": [
        (
            "n#",
            "accuracy scalar over the ≤|langs|² confusion CELLS — the "
            "corpus collapsed through the (lang, lang_pred) groupBy "
            "before the window",
        )
    ],
    "q_hash_split_contract": [
        (
            "sum(n#",
            "global frame over the 3-row split summary (one row per "
            "split name) — a contract certificate, not data",
        )
    ],
    "ts_series_similarity": [
        (
            "distance#",
            "final ranking over per-SERIES distances — one row per "
            "candidate series (distinct event types), already reduced "
            "by the PAA pruning stage, not corpus-proportional",
        )
    ],
    "ts_cusum_changepoint": [
        (
            "day#",
            "prefix-sum window over the pre-aggregated DAILY count "
            "series — calendar-bounded rows (thousands for years of "
            "data) after the corpus collapsed through the per-day "
            "groupBy; same class as q_moving_average",
        )
    ],
}

_WRAPPERS = ("Project", "Filter", "BroadcastExchange", "Exchange", "AQEShuffleRead",
             "InputAdapter", "WholeStageCodegen", "ColumnarToRow", "ReusedExchange")
_SCALAR = ("HashAggregate(keys=[]", "SortAggregate(keys=[]", "ObjectHashAggregate(keys=[]")


_PLAN_SECTION = re.compile(r"^== (Final|Initial) Plan ==$")


def _parse_tree(plan: str) -> list[tuple[int, str]]:
    """treeString → [(depth, node text)]. Child markers are ':- ' / '+- '
    at 3-char indent steps; depth = indent // 3.

    Cached-plan reprints break that invariant: an ``AdaptiveSparkPlan``
    nested inside an ``InMemoryRelation`` prints its ``== Final Plan ==``
    / ``== Initial Plan ==`` sections with indentation RESET to the
    cached plan's own coordinate system (observed: section content at
    depth 10-13 inside a depth-14 subtree), which makes a depth-bounded
    child/subtree walk terminate early — the r12 parse failure on
    ts_series_similarity. Those sections are ANNOTATIONS (a reprint of
    the cached relation's plan), not outer-tree structure, so they are
    excised here: from a nested section header until the next line
    whose raw prefix carries a ``:`` tree guide (guides come from the
    outer tree's ':-' spines and are never printed inside a reset
    section). Top-level sections (header at depth ≤ 1) keep the old
    behavior — their indentation is consistent. Limitation, documented:
    nodes inside an excised reprint are not tree-analyzed (the
    substring HARD_FLAGS still see them); on a pure last-child spine
    (no ':' guide anywhere after the reprint) the excision runs to the
    next ':' line or EOF — conservative for a linter whose tree
    analysis only AUTO-ALLOWS, never auto-flags."""
    out = []
    anno_min = None  # not None ⇔ inside a reprint; min section-header depth
    for line in plan.splitlines():
        m = re.match(r"^((?::  |\s{3}|:- |\+- )*)(.*)$", line)
        prefix, node = m.group(1), m.group(2)
        depth = len(prefix) // 3
        if anno_min is not None:
            if _PLAN_SECTION.match(node):
                # next section of the same (or a nested) reprint; each
                # section's body indents at or below its own header, so
                # the running header minimum is the annotation's floor
                anno_min = min(anno_min, depth)
                continue
            if ":" not in prefix and depth >= anno_min:
                continue  # still inside the reprint
            anno_min = None  # outer ':-' spine guide, or popped above
            # every section header floor — genuine tree line, fall through
        if _PLAN_SECTION.match(node) and depth >= 2:
            anno_min = depth
            continue
        out.append((depth, node))
    return out


def _subtree(nodes: list[tuple[int, str]], i: int) -> list[str]:
    d = nodes[i][0]
    out = [nodes[i][1]]
    for j in range(i + 1, len(nodes)):
        if nodes[j][0] <= d:
            break
        out.append(nodes[j][1])
    return out


def _children(nodes: list[tuple[int, str]], i: int) -> list[int]:
    d = nodes[i][0]
    kids = []
    for j in range(i + 1, len(nodes)):
        if nodes[j][0] <= d:
            break
        if nodes[j][0] == d + 1:
            kids.append(j)
    return kids


def _is_scalar_bound(nodes: list[tuple[int, str]], root: int) -> bool:
    """True if the subtree at ``root`` provably emits ≤1 row: wrapper
    chains over a grouping-key-less aggregate, or a join of two such
    scalars (a cross of 1-row sides is still 1 row)."""
    node = nodes[root][1]
    if any(node.startswith(s) for s in _SCALAR):
        return True
    kids = _children(nodes, root)
    if any(node.startswith(w) for w in _WRAPPERS) and len(kids) == 1:
        return _is_scalar_bound(nodes, kids[0])
    if "Join" in node.split("(")[0] and len(kids) == 2:
        return all(_is_scalar_bound(nodes, k) for k in kids)
    return False


def _window_is_partitioned(node: str) -> bool:
    """A ``Window`` plan node prints ``[exprs], [partition], [order]``.
    Partition-only windows drop the order group and order-only windows
    drop the partition group — BOTH print two groups, so group count
    alone is ambiguous; the order group is recognizable by its
    ``ASC/DESC NULLS`` sort markers. Unpartitioned (the single-task
    global sort that stops scaling first) ⇔ the trailing group is an
    ORDER spec and no partition group precedes it."""
    depth, groups, cur = 0, [], []
    for ch in node:
        if ch == "[":
            if depth == 0:
                cur = []
            depth += 1
            if depth > 1:
                cur.append(ch)
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
            else:
                cur.append(ch)
        elif depth >= 1:
            cur.append(ch)
    if len(groups) >= 3:
        return True
    if len(groups) == 2:
        last = groups[-1]
        return not ("ASC NULLS" in last or "DESC NULLS" in last)
    return False  # bare [exprs]: global frame, single task


def audit_plan(name: str, plan: str) -> list[str]:
    """Return unexpected-hazard descriptions for one entry's plan."""
    problems = [f for f in HARD_FLAGS if f in plan]
    nodes = _parse_tree(plan)
    for _, node in nodes:
        if node.startswith("Window ") and not _window_is_partitioned(node):
            if any(pat in node for pat, _ in WINDOW_WAIVERS.get(name, [])):
                continue
            problems.append(f"unpartitioned Window (single-task sort): {node[:120]}")
    for i, (_, node) in enumerate(nodes):
        if not node.startswith("BroadcastNestedLoopJoin"):
            continue
        kids = _children(nodes, i)
        if len(kids) != 2:
            # should not happen now that _parse_tree excises cached-plan
            # indent-reset reprints; if a new plan shape defeats the
            # parser anyway, REPORT it (distinct message) instead of
            # waiving against the whole plan text — a waiver written
            # for one benign join must never mask a different join
            # whose build side we could not even locate (review r12)
            problems.append(
                f"BroadcastNestedLoopJoin with unparseable children "
                f"(build side unverified): {node[:120]}"
            )
            continue
        build = kids[1] if "BuildRight" in node else kids[0]
        if _is_scalar_bound(nodes, build):
            continue  # 1-row scalar bound — a projection, not a join blow-up
        hay = node + "\n" + "\n".join(_subtree(nodes, build))
        if any(pat in hay for pat, _ in WAIVERS.get(name, [])):
            continue
        problems.append(f"BroadcastNestedLoopJoin (unbounded build side): {node[:120]}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from hyper_storage_spark.operators._caches import release_tracked_caches
    from hyper_storage_spark.queries import all_specs
    from hyper_storage_spark.session import get_spark

    spark = get_spark("plan_audit", cpus=8)

    bad: list[tuple[str, str]] = []
    for name, spec in all_specs().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            bad.append((name, f"plan build failed: {type(e).__name__}: {e}"))
            print(f"FAIL {name} [{time.time() - t0:.1f}s]")
            continue
        finally:
            release_tracked_caches()
        problems = audit_plan(name, plan)
        bad.extend((name, p) for p in problems)
        print(f"{'FLAG' if problems else 'ok':4} {name} [{time.time() - t0:.1f}s]")

    print()
    if bad:
        print(f"{len(bad)} unexpected plan hazard(s):")
        for name, p in bad:
            print(f"  {name}: {p}")
        return 1
    print("no unexpected plan hazards (scalar bounds auto-allowed; waivers documented in-file)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
