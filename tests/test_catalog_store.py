"""Plan-routing assertions for the store_* catalog entries.

The catalog bodies in queries.py are driver-facing and must stay
assertion-free (a tripped assert would erase the entry's CORRECTNESS
row); the planner guarantees they relied on live here instead.
"""

from hyper_storage_spark.plans import SortBy
from hyper_storage_spark.queries import QUERIES, _docs_store


def test_store_query_mv_sorted_routes_to_lang_index(spark, sf_dir):
    store = _docs_store(spark, sf_dir)
    res = store.query("docs~", sort=[SortBy("lang")], size=40)
    assert res.plan.index_id == "by_lang", res.plan
    assert len(res.items) == 40


def test_store_query_filter_implication_routes_to_filtered_mv(spark, sf_dir):
    store = _docs_store(spark, sf_dir)
    res = store.query("docs~", filter="n_chars > 400", sort=[SortBy("id")], size=40)
    assert res.plan.index_id == "long_docs", res.plan
    assert all(i["n_chars"] > 400 for i in res.items)


def test_store_query_paged_keyset_runs_fetch_loop(spark, sf_dir):
    store = _docs_store(spark, sf_dir)
    res = store.query_paged("docs~", filter='lang = "zh"', size=15)
    assert len(res.selects) >= 1
    assert all(i["lang"] == "zh" for i in res.items)


def test_store_catalog_entries_run_end_to_end(spark, sf_dir):
    """Each store_* entry must produce a DataFrame without raising —
    this is exactly what the driver gate executes."""
    for name in (
        "store_query_mv_sorted",
        "store_query_filter_implication",
        "store_query_paged_keyset",
    ):
        df = QUERIES[name].fn(spark, sf_dir)
        assert df.count() > 0, name


def test_query_paged_prefix_consistent_across_page_sizes(spark, sf_dir):
    """Keyset paging consistency: a smaller page must be an exact
    prefix of a larger one (no skips, no duplicates, stable order
    across different internal select/resume boundaries)."""
    store = _docs_store(spark, sf_dir)
    pages = {}
    for size in (3, 7, 15, 50):
        res = store.query_paged("docs~", filter='lang = "zh"', size=size)
        ids = [i["id"] for i in res.items]
        assert len(ids) == len(set(ids)), f"duplicates at size={size}"
        assert len(ids) <= size
        pages[size] = ids
    full = pages[50]
    assert len(full) >= 15  # enough zh docs to make the check real
    for size in (3, 7, 15):
        assert pages[size] == full[: len(pages[size])], size


def test_driver_entry_contract(spark):
    """The exact surface the driver smoke-checks: entry() returns a
    non-empty DataFrame with a stable schema; queries()/oracle_sql()
    agree on keys."""
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert df.columns[:2] == ["l_returnflag", "l_linestatus"]
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    # the driver's correctness gate records exactly 50 rows: the
    # driver-tier catalog must fill the window exactly — fewer wastes
    # correctness signal, more silently drops entries past the window
    assert len(qs) == 50
    from hyper_storage_spark.queries import EXTRA_QUERIES

    assert not (set(qs) & set(EXTRA_QUERIES))
    assert len(EXTRA_QUERIES) >= 13  # demoted variants stay locally verified


def test_query_vs_query_paged_equivalence_grid(spark, sf_dir):
    """The keyset fetch loop (query_paged: bounded selects, least-rows
    resume filters, adaptive growth) must return EXACTLY what the
    one-shot query() returns, across a grid of filter shapes (none /
    sargable-on-index / residual), sort orders (item order, indexed
    lang, descending, multi-field), and page sizes straddling the
    internal select boundaries."""
    store = _docs_store(spark, sf_dir)
    grid = [
        dict(filter=None, sort=None),
        dict(filter='lang = "zh"', sort=None),
        dict(filter="n_chars > 300", sort=None),
        dict(filter=None, sort=[SortBy("lang")]),
        dict(filter='n_chars > 400', sort=[SortBy("lang")]),
        dict(filter=None, sort=[SortBy("lang"), SortBy("id", descending=True)]),
        dict(filter='lang != "zh"', sort=[SortBy("id")]),
    ]
    for params in grid:
        for size in (5, 23, 60):
            one = store.query("docs~", size=size, **params)
            paged = store.query_paged("docs~", size=size, **params)
            ids_one = [i["id"] for i in one.items]
            ids_paged = [i["id"] for i in paged.items]
            assert ids_one == ids_paged, (params, size, ids_one[:5], ids_paged[:5])


def test_decimal_output_guard_rejects_driver_tier_decimals(spark):
    """The mechanical no-DECIMAL-output rule (round 10): the driver's
    hasher canonicalizes DECIMAL cells engine-specifically, so
    check_oracles must REJECT any driver-tier entry whose Spark output
    schema contains DecimalType — including nested inside struct/
    array/map. Round 9 proved the comment-only rule does not survive
    window rotations (three rotated-in entries went hash-red on raw
    DECIMAL totals with values verified equal)."""
    import sys

    sys.path.insert(0, "tools")
    from check_oracles import spark_decimal_violations

    # a deliberately DECIMAL-outputting entry, as rotation #5 shipped it
    bad = spark.sql(
        "SELECT 'a' AS metric, CAST(1.5 AS DECIMAL(18,2)) AS total"
    )
    assert spark_decimal_violations(bad.schema) == ["total"]

    # nested decimals can't slip through
    nested = spark.sql(
        """SELECT named_struct('v', CAST(1 AS DECIMAL(10,2))) AS s,
                  array(CAST(2 AS DECIMAL(10,2))) AS a,
                  map('k', CAST(3 AS DECIMAL(10,2))) AS m,
                  1.5D AS ok"""
    )
    assert spark_decimal_violations(nested.schema) == ["s", "a", "m"]

    # the canonicalized projection passes
    good = spark.sql(
        "SELECT 'a' AS metric, CAST(ROUND(CAST(1.5 AS DECIMAL(18,2)), 2) AS DOUBLE) AS total"
    )
    assert spark_decimal_violations(good.schema) == []
