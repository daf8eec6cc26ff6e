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
    # DELIBERATELY FLIPPED from AstComparationTest.scala:29-32: the
    # reference widens `x has [1,2,3]` over `x has [1,2]`, but with
    # contains-ALL `has` semantics that direction is unsound (an MV
    # filtered by `x has [1,2,3]` lacks rows matching `x has [1,2]`).
    # The sound rule: the SUBSET filter is the wider one.
    assert compare(parse("x has [1,2]"), parse("x has [1,2,3]")) is Wider
    assert compare(parse("x has not [1,2,3,4]"), parse("x has not [1,2,3]")) is Wider


def test_wider_for_or():
    assert compare(parse("x > 5 or y < 2"), parse("x > 5")) is Wider
    assert compare(parse("x has [5,1] or y < 2"), parse("x has [5,1,3]")) is Wider
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
    assert compare(parse("x has [1,2,3]"), parse("x has [1,2]")) is NotEqual


def test_const_on_left_normalized_and_mixed_types_rejected():
    """review r12: '5 < x' is x > 5 — the widening table must see the
    canonical constant-on-right form, and mixed-type constant pairs
    must never claim Wider (the evaluator rejects mixed-type ordered
    comparisons per row, so such an MV is missing every row of the
    query's type)."""
    from hyper_storage_spark.expression import parse
    from hyper_storage_spark.plans.comparation import Equal, NotEqual, Wider, compare

    assert compare(parse("5 < x"), parse("3 < x")) is NotEqual  # x>5 ⊉ x>3
    assert compare(parse("3 < x"), parse("5 < x")) is Wider  # x>3 ⊇ x>5
    assert compare(parse("5 < x"), parse("x > 5")) is Equal  # mirrored forms
    assert compare(parse("5 > x"), parse("3 > x")) is Wider  # x<5 ⊇ x<3
    assert compare(parse("3 > x"), parse("5 > x")) is NotEqual
    assert compare(parse("5 <= x"), parse("3 <= x")) is NotEqual
    assert compare(parse('x > "100"'), parse("x > 20")) is NotEqual
    assert compare(parse('x > "a"'), parse('x > "b"')) is Wider  # same-kind ok


def test_implication_claims_are_semantically_sound():
    """Soundness fuzz for the MV router's implication engine: whenever
    compare(a, b) claims Equal, a and b must evaluate identically on
    every sampled context; whenever it claims Wider (b ⊆ a — an index
    with filter a may serve a query with filter b), no context may
    match b but not a. An unsound claim here is a wrong-results bug
    (the router would serve a query from an index missing rows), so
    this is the highest-stakes pure function in the planner. 2000
    random pairs x 30 random contexts against the evaluator."""
    import random

    from hyper_storage_spark.expression import evaluate_bool, parse
    from hyper_storage_spark.plans.comparation import Equal, Wider, compare

    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.dirname(__file__))
    from test_expression_differential import gen_context, gen_expr

    rnd = random.Random(4242)
    contexts = [gen_context(rnd) for _ in range(30)]

    def pair(ta, tb=None):
        # derived pairs bias the fuzz toward Equal/Wider-claiming
        # shapes; unrelated pairs keep testing the NotEqual side
        if tb is None:
            mode = rnd.random()
            if mode < 0.25:
                tb = ta  # Equal by construction
            elif mode < 0.5:
                tb = f"({ta} and {gen_expr(rnd)})"  # a should widen b
            elif mode < 0.7:
                tb, ta = ta, f"({ta} or {gen_expr(rnd)})"  # or-widening
            elif mode < 0.80:
                ident = rnd.choice(["a", "b", "c"])
                lo, hi = sorted(rnd.sample(range(0, 12), 2))
                op = rnd.choice([">", ">=", "<", "<="])
                wide, narrow = (lo, hi) if op in (">", ">=") else (hi, lo)
                mirror = {">": "<", ">=": "<=", "<": ">", "<=": ">="}
                sa, sb = f"{ident} {op} {wide}", f"{ident} {op} {narrow}"
                # r12 review: constant-on-LEFT forms inverted the
                # widening direction — mirror random sides so the fuzz
                # keeps covering the normalization
                if rnd.random() < 0.4:
                    sa = f"{wide} {mirror[op]} {ident}"
                if rnd.random() < 0.4:
                    sb = f"{narrow} {mirror[op]} {ident}"
                # mixed-type constants must never be claimed Wider
                if rnd.random() < 0.15:
                    sb = f'{ident} {op} "{narrow}"'
                return sa, sb
            elif mode < 0.85:
                # has-shapes: the round-5 review found the ported
                # direction unsound and the fuzz never generated these
                ident = rnd.choice(["a", "b", "c"])
                base = sorted(rnd.sample(range(0, 6), rnd.randint(1, 3)))
                extra = sorted(set(base) | {rnd.randint(0, 8)})
                neg = "has not " if rnd.random() < 0.5 else "has "
                sup, sub = extra, base
                if neg == "has not ":
                    sub, sup = sup, sub
                return (
                    f"{ident} {neg}[{','.join(map(str, sub))}]",
                    f"{ident} {neg}[{','.join(map(str, sup))}]",
                )
            else:
                tb = gen_expr(rnd)
        return ta, tb

    n_equal = n_wider = 0
    violations = []
    for _ in range(2000):
        ta, tb = pair(gen_expr(rnd))
        try:
            a, b = parse(ta), parse(tb)
        except Exception:
            continue
        res = compare(a, b)
        if res is Equal:
            n_equal += 1
            for ctx in contexts:
                if evaluate_bool(a, ctx) != evaluate_bool(b, ctx):
                    violations.append(("Equal", ta, tb, ctx))
                    break
        elif res is Wider:
            n_wider += 1
            for ctx in contexts:
                if evaluate_bool(b, ctx) and not evaluate_bool(a, ctx):
                    violations.append(("Wider", ta, tb, ctx))
                    break
    assert not violations, violations[:5]
    # the fuzz must actually exercise the interesting verdicts
    assert n_equal >= 20 and n_wider >= 5, (n_equal, n_wider)
