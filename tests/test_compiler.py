"""Column compiler vs the Python evaluator: same semantics, JVM-side.

The corpus covers dynamic typing (per-row type tags), typed equality,
missing fields, mixed-type rejection, has/arrays, arithmetic, truthiness.
"""

import json

import pytest

from hyper_storage_spark.expression import parse, evaluate_bool
from hyper_storage_spark.expression.compiler import (
    compile_filter,
    typed_resolver,
    variant_resolver,
)

from pyspark.sql import functions as F

ROWS = [
    {"id": "item1", "a": "hello", "b": 100500},
    {"id": "item2", "a": "goodbye", "b": 1},
    {"id": "item3", "a": "way way", "b": 12},
    {"id": "item4", "a": "10", "b": "10"},
    {"id": "item5", "tags": [1, 2, 3], "flag": True},
    {"id": "item6", "a": None, "nested": {"x": 5}},
    {"id": "item7", "tags": ["1"], "u": "héllo", "neg": [-1, 2]},
]

EXPRS = [
    "b > 10",
    "b >= 12",
    "b < 10",
    "b <= 1",
    'a = "hello"',
    'a != "hello"',
    'id > "item1"',
    'b = "10"',  # typed equality: number 10 != text "10"; item4's b IS text
    "b = 10",
    "missing > 1",
    'a > 5',  # mixed type => rejected
    "tags has [1,2]",
    "tags has [1,5]",
    "tags has 2",
    "tags has not 5",
    "flag",
    "not flag",
    "b + 5 > 15",
    "b * 2 <= 24",
    "b / 2 >= 6",
    "b % 2 = 0",
    "-b < 0",
    'a = "hello" and b > 10',
    'a = "hello" or b < 5',
    "nested.x = 5",
    'length(a) > 6',
    'lower(a) = "hello"',
    # round-5 second-half review regressions (each diverged compiled
    # vs interpreted before the fix):
    '(a * 2) != "foo"',  # errored subexpr with static kind: reject, not defined-unequal
    'lower(a > 0) = "false"',  # errored bool must not stringify to "false"
    '"x" + (1 + 1) = "x2"',  # '+' numeric string form must be canonical
    'tags has "héllo"',  # hits item7.u? no — non-ASCII membership on variant arrays
    'u = "héllo"',
    'tags = ["1"]',  # typed arrv vs literal: [1] must NOT equal ["1"], ["1"] must
    'tags has [-1]',  # negative numbers are valid array-literal members
    'neg = [-1, 2]',
    '"a" + 1e30 = "x"',  # >28-digit integral canonical form (InvalidOperation leak)
]


@pytest.fixture(scope="module")
def body_df(spark):
    data = [(r["id"], json.dumps(r)) for r in ROWS]
    return spark.createDataFrame(data, "item_id string, body string").cache()


@pytest.mark.parametrize("expr", EXPRS)
def test_compiled_matches_evaluator(spark, body_df, expr):
    ast = parse(expr)
    expected = sorted(r["id"] for r in ROWS if evaluate_bool(ast, r))
    col = compile_filter(ast, variant_resolver(F.col("body")))
    got = sorted(r.item_id for r in body_df.filter(col).collect())
    assert got == expected, f"{expr}: spark={got} python={expected}"


def test_typed_resolver_on_real_table(spark, sf_dir):
    from hyper_storage_spark.sources import load_table

    df = load_table(spark, sf_dir, "events")
    ast = parse('event_type = "click" and value > 5')
    col = compile_filter(ast, typed_resolver(df))
    got = df.filter(col).count()
    expected = df.filter((F.col("event_type") == "click") & (F.col("value") > 5)).count()
    assert got == expected and got > 0


def test_typed_overflow_rejects_instead_of_crashing(spark):
    """review r12: a typed double beyond decimal(38,12)'s range must
    reject its row (try_cast → NULL → condition falsy), not abort the
    whole query with ANSI NUMERIC_VALUE_OUT_OF_RANGE — the documented
    overflow-to-NULL divergence."""
    df = spark.createDataFrame([(1, 1e30), (2, 5.0)], "id long, x double")
    col = compile_filter(parse("x > 1"), typed_resolver(df))
    assert [r.id for r in df.filter(col).collect()] == [2]


def test_typed_resolver_json_fallthrough(spark, sf_dir):
    from hyper_storage_spark.sources import load_table

    df = load_table(spark, sf_dir, "events")
    # `k` lives inside the props JSON column
    col = compile_filter(parse("k > 50"), typed_resolver(df, json_col="props"))
    got = df.filter(col).count()
    expected = df.filter(F.get_json_object("props", "$.k").cast("long") > 50).count()
    assert got == expected and got > 0
