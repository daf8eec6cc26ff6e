"""Filter-implication table, ported 1:1 from the reference's
AstComparationTest.scala:11-47."""

from hyper_storage_spark.expression import parse
from hyper_storage_spark.plans.comparation import Equal, NotEqual, Wider, compare


def test_equal():
    assert compare(parse("x + 5"), parse("x + 5")) is Equal
    assert compare(parse("x > 4"), parse("x > 4")) is Equal


def test_not_equal():
    assert compare(parse("x + y"), parse("x + 5")) is NotEqual
    assert compare(parse("x > 4"), parse("x > 3")) is NotEqual


def test_wider_for_gt_lt():
    assert compare(parse("x > 4"), parse("x > 5")) is Wider
    assert compare(parse("x >= 4"), parse("x >= 5")) is Wider
    assert compare(parse("x < 3"), parse("x < 2")) is Wider
    assert compare(parse("x <= 4"), parse("x <= 1")) is Wider
    assert compare(parse("x*4 <= 4"), parse("x*4 <= 1")) is Wider


def test_wider_for_has():
    assert compare(parse("x has [1,2,3]"), parse("x has [1,2]")) is Wider
    assert compare(parse("x has not [1,2,3]"), parse("x has not [1,2,3,4]")) is Wider


def test_wider_for_or():
    assert compare(parse("x > 5 or y < 2"), parse("x > 5")) is Wider
    assert compare(parse("x has [5,1,3,4] or y < 2"), parse("x has [5,1,3]")) is Wider
    assert compare(parse("x or y < 2"), parse("y < 2")) is Wider
    assert compare(parse("x or y"), parse("y")) is Wider


def test_wider_for_and():
    assert compare(parse("x"), parse("x and y = 20")) is Wider
    assert compare(parse("x > 5"), parse("x > 5 and y = 20")) is Wider
    assert compare(parse("x"), parse("x and y")) is Wider
    assert compare(parse("x"), parse("x+1 and y")) is NotEqual


def test_narrower_is_not_equal():
    # the inverse direction must not be Wider
    assert compare(parse("x > 5"), parse("x > 4")) is NotEqual
    assert compare(parse("x has [1,2]"), parse("x has [1,2,3]")) is NotEqual
