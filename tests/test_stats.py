"""Collection statistics (store/stats.py): ANALYZE correctness and the
histogram/NDV row estimates surfaced through explain() — the
reference's «histograms/statistics» future-work item."""

import pytest

from hyper_storage_spark.store import DocumentStore


@pytest.fixture()
def store(spark, tmp_path):
    return DocumentStore(str(tmp_path / "store"), spark=spark)


@pytest.fixture()
def analyzed(store):
    # 100 items: a = 0..99 uniform, cat cycles over 4 values, one null-a row
    for i in range(100):
        store.put(f"coll~/i{i:03d}", {"a": i, "cat": f"c{i % 4}"})
    store.put("coll~/i999", {"cat": "c0"})  # a missing → null for stats
    store.analyze("coll~", [("a", "decimal"), ("cat", "text")])
    return store


def test_analyze_basic_stats(analyzed):
    st = analyzed.collection_stats("coll~")
    a, cat = st["a"], st["cat"]
    assert a.n_rows == 101 and a.n_nonnull == 100 and a.ndv == 100
    assert a.min_num == 0.0 and a.max_num == 99.0
    assert sum(a.histogram) == 100 and len(a.histogram) == 16
    # uniform data → every equi-width bucket populated
    assert all(c > 0 for c in a.histogram)
    assert cat.ndv == 4 and cat.min_text == "c0" and cat.max_text == "c3"
    assert cat.histogram is None


def test_estimate_equality_uses_ndv(analyzed):
    plan = analyzed.explain("coll~", filter='cat = "c1"')
    # 101 rows × (101/101 nonnull) / 4 ndv ≈ 25
    assert plan.estimated_rows == pytest.approx(25, abs=2)
    plan = analyzed.explain("coll~", filter="a = 5")
    assert plan.estimated_rows == pytest.approx(1, abs=1)


def test_estimate_range_uses_histogram(analyzed):
    plan = analyzed.explain("coll~", filter="a > 49")
    assert plan.estimated_rows == pytest.approx(50, abs=8)
    plan = analyzed.explain("coll~", filter="a < 10")
    assert plan.estimated_rows == pytest.approx(10, abs=5)
    # conjunct selectivities multiply
    plan = analyzed.explain("coll~", filter='a > 49 and cat = "c1"')
    assert plan.estimated_rows == pytest.approx(12, abs=5)


def test_estimate_no_filter_is_row_count(analyzed):
    assert analyzed.explain("coll~").estimated_rows == 101


def test_unanalyzed_collection_estimates_none(store):
    store.put("other~/x", {"a": 1})
    assert store.explain("other~", filter="a = 1").estimated_rows is None


def test_reanalyze_replaces_stats(analyzed):
    for i in range(100, 150):
        analyzed.put(f"coll~/i{i:03d}", {"a": i, "cat": "c9"})
    analyzed.analyze("coll~", [("a", "decimal"), ("cat", "text")])
    st = analyzed.collection_stats("coll~")
    assert st["a"].n_rows == 151 and st["a"].max_num == 149.0
    assert st["cat"].ndv == 5
    # only one stats row set survives per field
    assert set(st) == {"a", "cat"}


def test_equi_height_histogram_survives_skew(store):
    # 90 values in [0, 89] plus 10 outliers at 100000: equi-width puts
    # ~all mass in bucket 0 (resolution lost), equi-height keeps ~1/16
    # of the mass per bucket so a selective range stays estimable
    for i in range(90):
        store.put(f"skew~/i{i:03d}", {"a": i})
    for i in range(10):
        store.put(f"skew~/o{i:03d}", {"a": 100000})
    store.analyze("skew~", [("a", "decimal")], method="height")
    st = store.collection_stats("skew~")["a"]
    assert len(st.bounds) == len(st.histogram) + 1
    assert sum(st.histogram) == 100
    # no bucket hoards the in-range mass the way width-bucket 0 would
    assert max(st.histogram[:-1]) <= 25
    plan = store.explain("skew~", filter="a < 45")
    assert plan.estimated_rows == pytest.approx(45, abs=10)
    # the same data under equi-width: bucket 0 holds all 90 in-range
    # values, so the interpolated estimate collapses toward ~0
    store.analyze("skew~", [("a", "decimal")], method="width")
    wplan = store.explain("skew~", filter="a < 45")
    assert wplan.estimated_rows < 10


def test_analyze_rejects_unknown_method(store):
    with pytest.raises(ValueError):
        store.analyze("x~", [("a", "decimal")], method="depth")


def test_estimates_do_not_change_plan_choice(analyzed):
    # stats inform explain only; index selection stays the weigher's
    # (a sort on the index's field routes to the MV, reference rules)
    from hyper_storage_spark.plans.model import SortBy, SortItem

    analyzed.create_index("coll~", "idx_a", [SortItem("a", "decimal", "asc")])
    plan = analyzed.explain("coll~", filter="a > 90", sort=[SortBy("a")])
    assert plan.index_id == "idx_a"
    assert plan.estimated_rows == pytest.approx(9, abs=5)


def test_estimate_join_rows_system_r_and_range_overlap(analyzed):
    store = analyzed
    # second collection: b joins coll~ on a, but only over a = 50..79
    # (30 distinct values, one row each)
    for i in range(50, 80):
        store.put(f"other~/j{i:03d}", {"a": i})
    store.analyze("other~", [("a", "decimal")])
    est = store.estimate_join_rows("coll~", "other~", "a")
    # true join size is 30 (keys 50..79 match one row each side);
    # containment-of-value-sets with range-overlap refinement must
    # land within a small factor, never the unrefined 100·30/100 = 30
    # blown up or zeroed out
    true = 30
    assert est is not None and true / 3 <= est <= true * 3
    # disjoint ranges estimate zero
    for i in range(1000, 1010):
        store.put(f"far~/k{i}", {"a": i})
    store.analyze("far~", [("a", "decimal")])
    assert store.estimate_join_rows("coll~", "far~", "a") == 0
    # un-analyzed side → None; un-analyzed field → None
    assert store.estimate_join_rows("coll~", "nosuch~", "a") is None
    assert store.estimate_join_rows("coll~", "other~", "zzz") is None


def test_weighted_quantiles_hand_computed(spark):
    """weighted_quantiles: lower weighted quantile against hand
    arithmetic — tie collapse, exact q*W boundary (cum == threshold
    selects that value), ungrouped mode, and validation."""
    import pytest

    from hyper_storage_spark.operators import profiling

    # values 10,20,30 with collapsed weights 2,3,5 (W=10):
    #  p50: threshold 5.0 -> cum(10)=2 <5, cum(20)=5 >=5 -> 20 (boundary)
    #  p90: threshold 9.0 -> cum(30)=10 >=9 -> 30
    #  p20: threshold 2.0 -> cum(10)=2 >=2 -> 10 (boundary again)
    rows = [
        ("a", 10, 1), ("a", 10, 1),           # tie rows collapse to w=2
        ("a", 20, 3), ("a", 30, 5),
        ("b", 1, 1), ("b", 2, 1), ("b", 3, 98),  # heavy tail wins
    ]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    out = {
        r.g: r
        for r in profiling.weighted_quantiles(
            df, "v", "w", group_cols=("g",), qs=(0.2, 0.5, 0.9)
        ).collect()
    }
    assert (out["a"].p20, out["a"].p50, out["a"].p90) == (10, 20, 30)
    # unweighted median would be 2; byte-weighting pulls it to 3
    assert (out["b"].p50, out["b"].p90) == (3, 3)

    glob = profiling.weighted_quantiles(df.filter("g = 'a'"), "v", "w", qs=(1.0,))
    assert glob.collect()[0].p100 == 30

    with pytest.raises(ValueError):
        profiling.weighted_quantiles(df, "v", "w", qs=())
    with pytest.raises(ValueError):
        profiling.weighted_quantiles(df, "v", "w", qs=(0.1234567,))
    with pytest.raises(ValueError):
        profiling.weighted_quantiles(df, "v", "w", qs=(0.0,))
