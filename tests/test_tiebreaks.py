"""Tie-break audit for ORDER BY ... LIMIT catalog entries.

Every LIMIT query's hash-match against its DuckDB oracle silently
depends on the sort key being a TOTAL order: with duplicate sort-key
tuples at the cut line, the two engines may keep different rows and the
driver's value-hash diverges even though both results are "correct".
The round-3 testdata regeneration proved the environment shifts under
us — this pins the determinism assumption per query so a future data
change fails HERE, with a named query, instead of as an opaque driver
hash mismatch.

Each entry below mirrors the sort key of one catalog LIMIT query
(hyper_storage_spark/queries.py) over the same filtered input.
"""

import pytest
from pyspark.sql import functions as F

from hyper_storage_spark.sources import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# (catalog entry, table, SQL filter or None, sort-key columns)
LIMIT_SORT_KEYS = [
    ("parity_range_scan asc", "events", "user_id = 7", ["event_id"]),
    ("parity_range_scan desc", "events", "user_id = 7", ["event_id"]),
    ("parity_index_scan", "events",
     "event_type = 'click' AND value > 5", ["value", "event_id"]),
    ("parity_topn_sort", "documents", None, ["lang", "n_chars", "doc_id"]),
    ("parity_keyset_page", "documents", None, ["lang", "doc_id"]),
    ("q_window_ntile", "orders", "o_totalprice > 450000",
     ["o_orderstatus", "o_totalprice", "o_orderkey"]),
]


@pytest.mark.parametrize("name,table,flt,keys", LIMIT_SORT_KEYS,
                         ids=[e[0] for e in LIMIT_SORT_KEYS])
def test_limit_sort_key_is_total_order(spark, sf_dir, name, table, flt, keys):
    df = _t(spark, sf_dir, table)
    if flt is not None:
        df = df.filter(flt)
    total = df.count()
    distinct = df.select(*keys).distinct().count()
    assert total == distinct, (
        f"{name}: sort key {keys} has {total - distinct} duplicate tuples — "
        "the LIMIT cut is nondeterministic and the oracle hash can diverge"
    )


def test_groupby_limit_keys_are_total_orders(spark, sf_dir):
    """Post-aggregation LIMIT queries: the grouping key appears in the
    sort key, so the sort is total by construction — assert the
    construction (grouping keys non-null) rather than re-running the
    aggregate."""
    docs = _t(spark, sf_dir, "documents")
    assert docs.filter(F.col("doc_id").isNull() | F.col("lang").isNull()).count() == 0
    orders = _t(spark, sf_dir, "orders")
    assert orders.filter(F.col("o_orderkey").isNull()).count() == 0
