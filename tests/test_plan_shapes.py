"""Physical-plan regression guards: the optimizations we rely on at
100 TB must be visible in explain() output — a correct-but-shuffling
plan is a regression even when results match."""

import pytest

from hyper_storage_spark.queries import all_specs


def plan_of(spark, sf_dir, name) -> str:
    df = all_specs()[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q3_broadcasts_dimensions(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # nothing should sort-merge at this scale


def test_q5_star_join_all_broadcast(spark, sf_dir):
    """No forced broadcast of data-proportional sides: at this SF the
    size-based planner still broadcasts everything (tables are tiny),
    while at 100 TB the hint-free orders/customer joins degrade
    gracefully to shuffle joins instead of OOMing."""
    plan = plan_of(spark, sf_dir, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_q10_broadcasts_only_nation_by_hint(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q10_returned_items")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_above_avg_orders_is_window_not_join(spark, sf_dir):
    """The per-customer average must come from a window pass (one
    shuffle on o_custkey), not an aggregate broadcast back into a join
    — the aggregate's cardinality grows with the data."""
    plan = plan_of(spark, sf_dir, "q_above_avg_orders")
    assert "Window" in plan
    assert "Join" not in plan


def test_q6_pushes_every_predicate(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q6_revenue_change")
    assert "PushedFilters: [" in plan
    # all three predicate families reach the parquet scan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]
    assert "l_discount" in plan.split("PushedFilters")[1][:400]
    assert "l_quantity" in plan.split("PushedFilters")[1][:400]


def test_point_get_prunes_columns_and_pushes_key(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "parity_static_get")
    pushed = plan.split("PushedFilters")[1][:200]
    assert "doc_id" in pushed
    read = plan.split("ReadSchema")[1][:200]
    assert "text" not in read  # header-only projection prunes the body


def test_topn_is_take_ordered_not_global_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "parity_topn_sort")
    assert "TakeOrderedAndProject" in plan


def test_ann_broadcasts_queries(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "ann_cosine_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_skew_salted_agg_is_two_phase(spark, sf_dir):
    """The salted aggregate must actually execute as two phases: a
    partial aggregation keyed by (key, __salt) and a final one keyed by
    the bare key — visible as the salt column plus two exchanges. A
    regression to a single skewed shuffle would still return correct
    values, so only the plan can catch it."""
    plan = plan_of(spark, sf_dir, "q_skew_salted_agg")
    assert "__salt" in plan
    assert plan.count("Exchange") >= 2


def test_residual_filter_parses_json_once(spark, sf_dir):
    """The prepared-identifier projection must keep a single parse_json
    per row — a regression reintroduces O(references) parses."""
    plan = plan_of(spark, sf_dir, "parity_residual_filter")
    # CollapseProject re-inlines some helper columns (≈1 parse per typed
    # form); the regression this guards against is one parse per AST
    # *reference* (~20+ for a two-identifier filter)
    assert plan.count("parseJson") + plan.count("parse_json") <= 8


def test_residual_filter_pushes_typed_conjunct_to_scan(spark, sf_dir):
    """Round 5: top-level AND conjuncts split and the typed-column
    conjunct (event_type = 'click') compiles to a native predicate, so
    it must reach the parquet scan as a pushed filter (row-group
    pruning) instead of hiding inside the expression DSL's CASE tree —
    the JSON variant machinery then runs only on matching rows."""
    plan = plan_of(spark, sf_dir, "parity_residual_filter")
    pushed = plan.split("PushedFilters")[1][:200]
    assert "event_type" in pushed


def test_aggregation_is_partial_then_final(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    assert "partial" in plan.lower()  # map-side combine before the shuffle


def test_lsh_verify_never_hints_broadcast_of_candidates(spark, sf_dir):
    """The candidate-pair set in the MinHash-LSH verify join grows with
    corpus size and near-dup density — a forced broadcast of it is a
    driver OOM at 100 TB (the round-4 finding). The logical plan must
    carry NO user broadcast hint anywhere in the dedup path; the
    size-based planner (AQE) may still choose broadcast at test SF,
    which is fine — the hint is the hazard, not the strategy."""
    from hyper_storage_spark.operators import dedup
    from hyper_storage_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    df = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    logical = df._jdf.queryExecution().analyzed().toString()
    assert "UnresolvedHint" not in logical
    assert "ResolvedHint" not in logical


def test_bm25_no_cartesian_over_corpus(spark, sf_dir):
    """The query-batch join must be an equi join on term; the only
    cross joins in the plan are the two 1-row scalar attachments
    (corpus stats), never a product over postings."""
    plan = plan_of(spark, sf_dir, "search_bm25_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row stats attach
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_q17_correlated_avg_is_window_not_self_join(spark, sf_dir):
    """The per-part average must decorrelate into a window over the
    already-joined fact — a second lineitem scan (self-join) would
    double the 100 TB read."""
    plan = plan_of(spark, sf_dir, "q17_small_quantity_revenue")
    assert "Window" in plan
    # exactly one lineitem scan feeds the plan
    assert plan.count("lineitem.parquet") == 1


def test_q18_aggregates_fact_before_dimension_joins(spark, sf_dir):
    """HAVING on the per-order quantity must run BEFORE the
    customer/orders joins: the join input is ~900 orders, not 60k
    line items. In the plan tree the aggregate appears deeper than
    (below) the first join."""
    plan = plan_of(spark, sf_dir, "q18_large_volume_customers")
    lines = plan.splitlines()
    first_join = next(i for i, l in enumerate(lines) if "Join" in l)
    agg_lines = [i for i, l in enumerate(lines) if "HashAggregate" in l]
    assert any(i > first_join for i in agg_lines)
    assert "CartesianProduct" not in plan


def test_q22_uses_anti_join_on_filtered_orders(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q22_dormant_balances")
    assert "LeftAnti" in plan
    # the date filter reaches one of the parquet scans (the orders
    # side feeding the anti join) as a pushed filter
    pushed_sections = plan.split("PushedFilters")[1:]
    assert any("o_orderdate" in s[:300] for s in pushed_sections)


def test_decontaminate_is_single_equi_join_per_doc_count(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "text_decontaminate")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_explain_entry_cli_lists_and_explains(spark, sf_dir):
    import subprocess
    import sys

    listing = subprocess.run(
        [sys.executable, "tools/explain_entry.py", "--list"],
        capture_output=True, text=True, check=True,
    )
    names = listing.stdout.split()
    assert "q1_pricing_summary" in names and "search_hybrid_rrf" in names
    out = subprocess.run(
        [sys.executable, "tools/explain_entry.py", "q6_revenue_change", sf_dir],
        capture_output=True, text=True, check=True,
    )
    assert "Physical Plan" in out.stdout and "PushedFilters" in out.stdout
    bad = subprocess.run(
        [sys.executable, "tools/explain_entry.py", "no_such_entry"],
        capture_output=True, text=True,
    )
    assert bad.returncode == 2 and "unknown entry" in bad.stderr


def test_streaming_sample_batch_bottomk_is_take_ordered(spark):
    """streaming_uniform_sample's per-batch bottom-k must plan as
    TakeOrdered (partial top-k per partition), never a global Sort —
    the operator's docstring claims it, and at scale a global sort
    per micro-batch would dominate the sink."""
    from pyspark.sql import functions as F

    batch = spark.range(10_000).select(
        F.col("id").alias("event_id"),
        F.lit("t").alias("event_type"),
    )
    ordk = F.md5(
        F.concat_ws(":", F.lit("smp"), F.col("event_id").cast("string"))
    ).alias("__ord")
    bk = (
        batch.select(F.col("event_id"), F.col("event_type"), ordk)
        .orderBy("__ord", "event_id")
        .limit(256)
    )
    plan = bk._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_corpus_diff_join_carries_digests_not_payload(spark):
    """corpus_diff's full-outer join must shuffle (id, digest, carry)
    projections — the text payload must be dropped BEFORE the
    exchange (the operator's whole scale claim)."""
    from pyspark.sql import functions as F

    from hyper_storage_spark.operators import versioning

    big = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("payload "), F.col("id").cast("string")).alias("text"),
        F.lit("en").alias("lang"),
    )
    d = versioning.corpus_diff(big, big, "doc_id", ("text", "lang"), carry_cols=("lang",))
    plan = d._jdf.queryExecution().executedPlan().toString()
    # the join inputs project md5 digests; the raw text column must
    # not appear in any exchange's output schema
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text#" not in line, line
