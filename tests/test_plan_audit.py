"""Unit tests for the plan-audit linter's tree analysis (tools/
plan_audit.py) on synthetic executed-plan strings — the heuristics
must keep flagging unbounded nested-loop joins while auto-allowing
provable 1-row scalar bounds."""

import sys

sys.path.insert(0, "tools")

from plan_audit import audit_plan  # noqa: E402

SCALAR_CROSS = """Project [a#1, ok#2]
+- BroadcastNestedLoopJoin BuildRight, Cross
   :- FileScan parquet [a#1]
   +- BroadcastExchange IdentityBroadcastMode, [plan_id=1]
      +- HashAggregate(keys=[], functions=[count(1)], output=[n#3L])
         +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=2]
            +- HashAggregate(keys=[], functions=[partial_count(1)], output=[c#4L])
               +- FileScan parquet []"""

CROSS_OF_SCALARS = """Project [ok#1]
+- BroadcastNestedLoopJoin BuildRight, Cross
   :- FileScan parquet [a#1]
   +- BroadcastExchange IdentityBroadcastMode, [plan_id=1]
      +- Project [flag#5]
         +- BroadcastNestedLoopJoin BuildRight, Cross
            :- HashAggregate(keys=[], functions=[max(d#6)], output=[kth#7])
            :  +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=2]
            :     +- FileScan parquet [d#6]
            +- BroadcastExchange IdentityBroadcastMode, [plan_id=3]
               +- HashAggregate(keys=[], functions=[min(lb#8)], output=[mlb#9])
                  +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=4]
                     +- FileScan parquet [lb#8]"""

UNBOUNDED_BNLJ = """Project [a#1, b#2]
+- BroadcastNestedLoopJoin BuildRight, Inner, (a#1 < b#2)
   :- FileScan parquet [a#1]
   +- BroadcastExchange IdentityBroadcastMode, [plan_id=1]
      +- FileScan parquet [b#2] ReadSchema: struct<b:bigint>, Location: [corpus.parquet]"""

KEYED_AGG_BUILD = """Project [a#1]
+- BroadcastNestedLoopJoin BuildRight, Cross
   :- FileScan parquet [a#1]
   +- BroadcastExchange IdentityBroadcastMode, [plan_id=1]
      +- HashAggregate(keys=[k#2], functions=[count(1)], output=[k#2, n#3L])
         +- FileScan parquet [k#2]"""


def test_scalar_cross_is_auto_allowed():
    assert audit_plan("some_entry", SCALAR_CROSS) == []


def test_cross_of_two_scalars_is_auto_allowed():
    assert audit_plan("some_entry", CROSS_OF_SCALARS) == []


def test_unbounded_build_side_is_flagged():
    problems = audit_plan("some_entry", UNBOUNDED_BNLJ)
    assert len(problems) == 1 and "BroadcastNestedLoopJoin" in problems[0]


def test_keyed_aggregate_build_side_is_not_scalar():
    # keys=[k] can emit many rows — must NOT pass as a scalar bound
    assert audit_plan("some_entry", KEYED_AGG_BUILD) != []


def test_cartesian_and_python_udf_always_flag():
    assert audit_plan("e", "CartesianProduct\n+- FileScan parquet []") != []
    assert audit_plan("e", "BatchEvalPython [f(x#1)]\n+- FileScan parquet []") != []


def test_waiver_is_entry_scoped():
    # the waiver text matches dedup_embedding_cosine but not other entries
    plan = UNBOUNDED_BNLJ.replace("corpus.parquet", "embeddings.parquet")
    assert audit_plan("dedup_embedding_cosine", plan) == []
    assert audit_plan("dedup_exact", plan) != []


# r13: an AdaptiveSparkPlan nested inside an InMemoryRelation reprints
# its == Final/Initial Plan == sections with indentation RESET to the
# cached plan's own coordinate system — lines SHALLOWER than the
# enclosing subtree, which used to truncate the child walk so the join
# below parsed with one visible child (and the old fallback then
# matched waivers against the whole plan text). The condensed shape is
# taken from the real ts_series_similarity executed plan.
AQE_RESET_BNLJ = """AdaptiveSparkPlan isFinalPlan=false
+- Project [sid#8L]
   +- BroadcastNestedLoopJoin BuildRight, Cross
      :- Filter (isnotnull(sid#8L) AND NOT (sid#8L = 0))
      :  +- InMemoryTableScan [sid#8L, vec#142]
      :        +- InMemoryRelation [sid#8L, vec#142], StorageLevel(disk, memory)
      :              +- AdaptiveSparkPlan isFinalPlan=true
                        +- == Final Plan ==
                           ResultQueryStage 1
                           +- HashAggregate(keys=[sid#8L], functions=[collect_list(v#10)])
                              +- ShuffleQueryStage 0
                                 +- Exchange hashpartitioning(sid#8L, 8), [plan_id=52]
                                    +- FileScan parquet [sid#8L,v#10]
                        +- == Initial Plan ==
                           HashAggregate(keys=[sid#8L], functions=[collect_list(v#10)])
                           +- Exchange hashpartitioning(sid#8L, 8), [plan_id=13]
                              +- FileScan parquet [sid#8L,v#10]
      +- BroadcastExchange IdentityBroadcastMode, [plan_id=350]
         +- Project [vec#568 AS qvec#570]
            +- Filter (isnotnull(sid#563L) AND (sid#563L = 0))
               +- FileScan parquet [sid#563L, vec#568]"""


def test_aqe_indent_reset_parses_both_join_children():
    # the waiver pattern ("qvec") lives in the REAL build subtree, which
    # the excision must reach; pre-fix this either flagged spuriously or
    # passed only through the whole-plan fallback
    assert audit_plan("ts_series_similarity", AQE_RESET_BNLJ) == []


def test_aqe_indent_reset_does_not_waive_other_entries():
    # for an entry with no waiver, the SAME shape must flag the join on
    # its actual build side — never pass because the reprint confused
    # the parser (and the unverified path must name the join distinctly
    # if structure is ever unreadable again)
    problems = audit_plan("dedup_exact", AQE_RESET_BNLJ)
    assert len(problems) == 1
    assert "unbounded build side" in problems[0]


def test_unparseable_children_reported_not_waived():
    # one-visible-child join (structure unreadable): must be REPORTED
    # with the distinct unverified message even for an entry whose
    # waivers would match the plan text — the r12 fallback is gone
    plan = """Project [a#1]
+- BroadcastNestedLoopJoin BuildRight, Cross
   :- FileScan parquet [a#1] qvec marker text
"""
    problems = audit_plan("ts_series_similarity", plan)
    assert len(problems) == 1
    assert "unverified" in problems[0]
