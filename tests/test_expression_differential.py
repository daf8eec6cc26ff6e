"""Differential testing: randomly generated expressions must evaluate
identically under the Python evaluator (the semantics reference) and
the Catalyst Column compiler (the production path).

All compiled expressions run in a single select() so the Spark overhead
is one job regardless of corpus size.
"""

import json
import random
from decimal import Decimal

from pyspark.sql import functions as F

from hyper_storage_spark.expression import evaluate_bool, parse
from hyper_storage_spark.expression.compiler import (
    CompileError,
    compile_filter,
    variant_resolver,
)

FIELDS = ["a", "b", "c", "s", "t", "flag", "tags", "missing"]
NUM_LITS = ["0", "1", "5", "10", "100500", "3.5"]
STR_LITS = ['"hello"', '"way way"', '"10"', '""']


def gen_value(rnd):
    kind = rnd.choice(["num", "str", "bool", "null", "arr", "absent"])
    if kind == "num":
        return rnd.choice([0, 1, 5, 10, 100500, 3.5, -7])
    if kind == "str":
        return rnd.choice(["hello", "way way", "10", "", "true"])
    if kind == "bool":
        return rnd.choice([True, False])
    if kind == "arr":
        return rnd.sample([1, 2, 3, 5, 10], k=rnd.randint(0, 4))
    if kind == "null":
        return None
    return "__ABSENT__"


def gen_context(rnd):
    ctx = {}
    for f in FIELDS:
        v = gen_value(rnd)
        if v != "__ABSENT__":
            ctx[f] = v
    return ctx


def gen_expr(rnd, depth=0):
    ident = lambda: rnd.choice(FIELDS)  # noqa: E731
    num = lambda: rnd.choice(NUM_LITS)  # noqa: E731
    s = lambda: rnd.choice(STR_LITS)  # noqa: E731
    if depth >= 2:
        return rnd.choice([ident(), num(), s()])
    r = rnd.random()
    if r < 0.35:
        op = rnd.choice(["=", "!=", ">", ">=", "<", "<="])
        left = rnd.choice([ident(), num(), s()])
        right = rnd.choice([ident(), num(), s()])
        return f"({left} {op} {right})"
    if r < 0.55:
        op = rnd.choice(["and", "or"])
        return f"({gen_expr(rnd, depth + 1)} {op} {gen_expr(rnd, depth + 1)})"
    if r < 0.65:
        return f"(not {gen_expr(rnd, depth + 1)})"
    if r < 0.75:
        arr = "[" + ",".join(rnd.sample(["1", "2", "3", "5"], k=rnd.randint(1, 3))) + "]"
        neg = rnd.choice(["has", "has not"])
        return f"({ident()} {neg} {arr})"
    if r < 0.85:
        op = rnd.choice(["+", "-", "*", "/", "%"])
        cmp_op = rnd.choice([">", "<", "=", ">=", "<="])
        return f"(({ident()} {op} {num()}) {cmp_op} {num()})"
    if r < 0.90:
        # string concatenation compared to a string (mixed-operand '+')
        other = rnd.choice([num(), s(), ident()])
        return f'(({ident()} + {other}) = {s()})'
    if r < 0.97:
        # function call surface: length/abs/round compare numerically,
        # lower/upper compare as strings
        fn = rnd.choice(["length", "abs", "round", "lower", "upper"])
        cmp_op = rnd.choice(["=", "!=", ">", "<"])
        rhs = s() if fn in ("lower", "upper") else num()
        return f"({fn}({ident()}) {cmp_op} {rhs})"
    return ident()


def test_typed_null_truthiness_parity(spark):
    """typed_resolver's kind fast paths must treat a present-but-NULL
    typed column as falsy (evaluator: truthy(None) is False), not as
    SQL NULL — 'not nullcol' must accept the row, and a NULL operand
    must not poison enclosing and/or chains."""
    from hyper_storage_spark.expression.compiler import typed_resolver

    rows = [
        (0, None, None, None, None),
        (1, 5, "true", True, [1, 2]),
        (2, 0, "", False, []),
        (3, None, "yes", None, None),
        (4, 7, None, False, [3]),
    ]
    df = spark.createDataFrame(rows, "id long, n bigint, s string, b boolean, arr array<bigint>")
    exprs = [
        "not n", "not s", "not b", "not arr", "n", "b", "s", "arr",
        "(n and b) or s", "(b or n) and (not s)", "not (n and s)",
        "(arr and b) or n",
    ]
    asts = [parse(e) for e in exprs]
    resolver = typed_resolver(df)
    cols = []
    for i, ast in enumerate(asts):
        cols.append(compile_filter(ast, resolver).alias(f"e{i}"))
    out = {r.id: r for r in df.select("id", *cols).collect()}
    mismatches = []
    for row in rows:
        ctx = dict(zip(["id", "n", "s", "b", "arr"], row))
        for i, (text, ast) in enumerate(zip(exprs, asts)):
            expected = evaluate_bool(ast, ctx)
            got = bool(out[row[0]][f"e{i}"])
            if got != expected:
                mismatches.append((text, ctx, expected, got))
    assert not mismatches, mismatches


def test_differential_random_corpus_typed_resolver(spark):
    """Same random corpus, but identifiers resolve against NATIVE typed
    columns (with a JSON fallback for unknown names) — exercises the
    kind fast paths (num/str/bool/arr + NULLs) instead of the variant
    path, against the same evaluator reference."""
    from hyper_storage_spark.expression.compiler import typed_resolver

    # r13: corpus trimmed (25→15 contexts, 140→90 exprs — the same
    # seed stream's deterministic prefix) so one driver pytest run fits
    # the verify cap; the long-haul sweep tool covers the full regions
    rnd = random.Random(777)
    contexts = [gen_context(rnd) for _ in range(15)]

    def cell(ctx, f, caster):
        v = ctx.get(f, "__ABSENT__")
        return caster(v) if v != "__ABSENT__" else None

    # typed columns: a/b/c numeric, s/t string, flag bool, tags array;
    # 'missing' rides in the JSON fallback column (absent ⇒ not in JSON)
    rows = []
    for i, ctx in enumerate(contexts):
        js = {}
        if ctx.get("missing", "__ABSENT__") != "__ABSENT__":
            js["missing"] = ctx["missing"]
        rows.append(
            (
                i,
                cell(ctx, "a", lambda v: float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else None),
                cell(ctx, "b", lambda v: float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else None),
                cell(ctx, "c", lambda v: float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else None),
                cell(ctx, "s", lambda v: v if isinstance(v, str) else None),
                cell(ctx, "t", lambda v: v if isinstance(v, str) else None),
                cell(ctx, "flag", lambda v: v if isinstance(v, bool) else None),
                cell(ctx, "tags", lambda v: [float(x) for x in v] if isinstance(v, list) else None),
                json.dumps(js),
            )
        )
    # the evaluator sees what the typed row actually stores: a typed
    # NULL cell is PRESENT-BUT-NULL (ctx value None) — from_typed_column
    # cannot distinguish SQL NULL from absent, and maps it to
    # isnull=True/defined=True, i.e. the evaluator's None
    eval_ctxs = []
    for r in rows:
        ctx = dict(zip(["a", "b", "c", "s", "t", "flag", "tags"], r[1:8]))
        ctx.update(json.loads(r[8]))
        eval_ctxs.append(ctx)

    df = spark.createDataFrame(
        rows,
        "ctx_id int, a double, b double, c double, s string, t string, "
        "flag boolean, tags array<double>, props string",
    )
    resolver = typed_resolver(df, json_col="props")
    exprs = []
    while len(exprs) < 90:
        text = gen_expr(rnd)
        try:
            exprs.append((text, parse(text)))
        except Exception:  # pragma: no cover
            continue
    cols, compiled_idx = [], []
    for i, (text, ast) in enumerate(exprs):
        try:
            cols.append(compile_filter(ast, resolver).alias(f"e{i}"))
            compiled_idx.append(i)
        except CompileError:
            continue
    assert len(compiled_idx) >= 38
    out = {r.ctx_id: r for r in df.select("ctx_id", *cols).collect()}
    mismatches = []
    for ctx_id, ctx in enumerate(eval_ctxs):
        for i in compiled_idx:
            text, ast = exprs[i]
            expected = evaluate_bool(ast, ctx)
            got = out[ctx_id][f"e{i}"]
            if bool(got) != bool(expected):
                mismatches.append((text, ctx, expected, got))
    assert not mismatches, mismatches[:5]


def test_differential_random_corpus(spark):
    # r13: trimmed 25→15 contexts, 200→120 exprs (same seed stream
    # prefix) for the verify-cap budget; long-haul tool covers the rest
    rnd = random.Random(20260813)
    contexts = [gen_context(rnd) for _ in range(15)]
    exprs = []
    while len(exprs) < 120:
        text = gen_expr(rnd)
        try:
            ast = parse(text)
        except Exception:  # pragma: no cover
            continue
        exprs.append((text, ast))

    df = spark.createDataFrame(
        [(i, json.dumps(ctx)) for i, ctx in enumerate(contexts)], "ctx_id int, body string"
    )
    resolver = variant_resolver(F.col("body"))
    cols, compiled_idx = [], []
    for i, (text, ast) in enumerate(exprs):
        try:
            cols.append(compile_filter(ast, resolver).alias(f"e{i}"))
            compiled_idx.append(i)
        except CompileError:
            continue  # non-constant `has` rhs etc. — evaluator-only path
    assert len(compiled_idx) >= 60  # the corpus must mostly compile

    rows = {r.ctx_id: r for r in df.select("ctx_id", *cols).collect()}
    mismatches = []
    for ctx_id, ctx in enumerate(contexts):
        for i in compiled_idx:
            text, ast = exprs[i]
            expected = evaluate_bool(ast, ctx)
            got = rows[ctx_id][f"e{i}"]
            if bool(got) != bool(expected):
                mismatches.append((text, ctx, expected, got))
    assert not mismatches, mismatches[:5]


def test_apply_filter_conjunct_split_and_pushdown_parity(spark):
    """apply_filter (round 5) splits top-level AND conjuncts into
    chained filters and compiles typed-column-vs-constant conjuncts to
    native Catalyst predicates so they push into the scan. Both
    rewrites must be invisible to semantics: every filter here returns
    exactly the evaluator's row set, across the fast path (same-typed
    string/int comparisons, both operand orders), the deliberate
    non-fast-paths (fractional constants, bool constants, cross-typed
    comparisons, NULL cells), and mixed typed+JSON conjunctions."""
    from hyper_storage_spark.expression.compiler import apply_filter

    rows = [
        (0, "click", 10, json.dumps({"k": 60, "tag": "x"})),
        (1, "click", None, json.dumps({"k": 40})),
        (2, "view", 5, json.dumps({"k": "60"})),      # string k: typed ≠ number
        (3, None, 7, json.dumps({})),                  # null event_type
        (4, "click", -3, json.dumps({"k": 60.5})),
        (5, "Click", 0, json.dumps({"k": 60})),        # case-sensitive compare
        (6, "click", 100500, None),                    # null JSON body
    ]
    df = spark.createDataFrame(rows, "id long, event_type string, value bigint, props string")

    filters = [
        'event_type = "click"',
        '"click" = event_type',                 # reversed operands
        'event_type != "click"',
        'event_type > "c"',
        "value > 5",
        "value <= 0",
        "5 < value",                            # reversed operands
        "value > 5.5",                          # fractional: no fast path
        "value = 10 and event_type = \"click\"",
        'k > 50 and event_type = "click"',      # JSON + typed mix
        'k > 50 and event_type = "click" and value >= 0',
        'event_type = "click" and k = 60',
        "value > 1000000000000",                # out-of-data-range constant
    ]
    for text in filters:
        ast = parse(text)
        got = sorted(r.id for r in apply_filter(df, ast, json_col="props").select("id").collect())
        expected = []
        for row in rows:
            # typed NULL cells are PRESENT nulls (the engine's typed
            # semantics, pinned by test_typed_null_truthiness_parity):
            # the DSL's typed != calls them unequal, so they stay in
            # the evaluator context as None rather than going missing
            ctx = {"event_type": row[1], "value": row[2]}
            body = json.loads(row[3]) if row[3] else {}
            ctx.update(body)
            if evaluate_bool(ast, ctx):
                expected.append(row[0])
        assert got == expected, (text, got, expected)


def test_apply_filter_exhaustive_comparison_grid(spark):
    """Exhaustive grid over the pushdown fast path's decision space:
    every comparison op x {string, integral, double} column x
    {matching, mismatched, fractional, boolean, empty} constant x both
    operand orders, over cells including NULLs, negatives, and ties.
    Every combination must return exactly the evaluator's row set —
    whether it took the native fast path or the DSL CASE tree."""
    from hyper_storage_spark.expression.compiler import apply_filter

    rows = [
        (0, "a", 0, 5.0),
        (1, "b", 5, 5.5),
        (2, "", -3, -1.0),
        (3, None, None, None),
        (4, "a", 5, 0.0),
    ]
    df = spark.createDataFrame(rows, "id long, s string, i bigint, d double")
    cells = {r[0]: {"s": r[1], "i": r[2], "d": r[3]} for r in rows}

    consts = {
        "s": ['"a"', '""', '"zz"', "5", "true"],
        "i": ["5", "0", "-3", "5.5", '"5"', "true"],
        "d": ["5", "5.5", "0", '"x"'],
    }
    ops = ["=", "!=", ">", "<", ">=", "<="]
    texts = [
        text
        for col, col_consts in consts.items()
        for const in col_consts
        for op in ops
        for text in (f"{col} {op} {const}", f"{const} {op} {col}")
    ]

    # r13: the SAME 180 cases, collected from a small thread pool —
    # each case is one tiny driver-bound action, so running them
    # sequentially pays 180 × fixed job latency of wall (guide §2.6
    # overlap-independent-jobs); results are per-case independent
    def check(text):
        ast = parse(text)
        got = sorted(r.id for r in apply_filter(df, ast).select("id").collect())
        # typed NULL cells = present nulls (see conjunct test)
        expected = sorted(rid for rid, ctx in cells.items() if evaluate_bool(ast, ctx))
        assert got == expected, (text, got, expected)
        return 1

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=6) as pool:
        n_checked = sum(pool.map(check, texts))
    assert n_checked == 180


def test_plus_with_missing_operand_poisons_enclosing_or(spark):
    """The evaluator evaluates both '+' operands BEFORE applying it, so
    a missing identifier on either side is an eval error even when the
    other side is a present null — and that error must poison an
    enclosing `or` (no Kleene rescue by a truthy right branch). The
    round-5 corpus found null + missing compiling to a defined null,
    whose comparison became a defined False that `or` then rescued."""
    ctx = {"a": True, "t": None}  # t present-null, b missing
    df = spark.createDataFrame([(0, json.dumps(ctx))], "i int, body string")
    resolver = variant_resolver(F.col("body"))
    cases = [
        '((t + b) = "way way") or (10 and a)',  # error-or-true → rejected
        '(t + b) = "way way"',
        'not ((t + b) = "x")',  # not(error) is still an error
        '(t + t) = ""',  # null + null IS a defined null; '' != null
        '(b + b) = ""',
    ]
    # r13: same five cases, ONE action — each compiled predicate rides
    # as a column of a single 1-row select instead of five filter+count
    # jobs (identical compiled trees; a predicate column's truth on the
    # one row is exactly "did the filter keep it")
    asts = [(text, parse(text)) for text in cases]
    row = df.select(
        *[compile_filter(ast, resolver).alias(f"c{i}") for i, (_, ast) in enumerate(asts)]
    ).collect()[0]
    for i, (text, ast) in enumerate(asts):
        got = bool(row[f"c{i}"])
        expected = evaluate_bool(ast, ctx)
        assert got == expected, (text, got, expected)


def test_differential_nested_objects_and_dotted_paths(spark):
    """Nested-object corpus: object-valued fields (truthy per binders
    Value.asBoolean — non-empty object is true, '{}' false), dotted
    identifiers into them (o.x), paths through missing roots, and
    length() on objects (an eval error on BOTH sides — the compiler
    has no object-length form, so the evaluator must not silently
    len(dict)). This corpus found two round-5 divergences (object
    truthiness, length-of-object); it stays as the net."""

    def gen_value_n(rnd, depth=0):
        kinds = ["num", "str", "bool", "null", "arr", "absent"] + (
            ["obj"] if depth < 1 else []
        )
        kind = rnd.choice(kinds)
        if kind == "obj":
            return {
                k: gen_value_n(rnd, depth + 1)
                for k in rnd.sample(["x", "y", "z"], k=rnd.randint(1, 2))
            }
        return gen_value(rnd)

    def gen_context_n(rnd):
        ctx = {}
        for f in ["a", "b", "o", "p", "s", "tags"]:
            v = gen_value_n(rnd)
            if v != "__ABSENT__":
                ctx[f] = (
                    {k: w for k, w in v.items() if w != "__ABSENT__"}
                    if isinstance(v, dict)
                    else v
                )
        return ctx

    fields = ["a", "b", "s", "tags", "o.x", "o.y", "p.z", "o", "missing.q"]

    def gen_expr_n(rnd, depth=0):
        ident = lambda: rnd.choice(fields)  # noqa: E731
        num = lambda: rnd.choice(["0", "1", "5", "3.5"])  # noqa: E731
        st = lambda: rnd.choice(['"hello"', '"10"', '""'])  # noqa: E731
        if depth >= 2:
            return rnd.choice([ident(), num(), st()])
        r = rnd.random()
        if r < 0.45:
            op = rnd.choice(["=", "!=", ">", ">=", "<", "<="])
            return f"({rnd.choice([ident(), num(), st()])} {op} {rnd.choice([ident(), num(), st()])})"
        if r < 0.65:
            return f"({gen_expr_n(rnd, depth + 1)} {rnd.choice(['and', 'or'])} {gen_expr_n(rnd, depth + 1)})"
        if r < 0.75:
            return f"(not {gen_expr_n(rnd, depth + 1)})"
        if r < 0.9:
            arr = "[" + ",".join(rnd.sample(["1", "2", "3"], k=rnd.randint(1, 2))) + "]"
            return f"({ident()} {rnd.choice(['has', 'has not'])} {arr})"
        return f"(length({ident()}) {rnd.choice(['>', '='])} {num()})"

    rnd = random.Random(2)  # the seed that hit both round-5 divergences
    # r13: trimmed 20→12 contexts, 200→120 exprs (same seed prefix —
    # both round-5 divergence shapes reproduce in the first third)
    contexts = [gen_context_n(rnd) for _ in range(12)]
    df = spark.createDataFrame(
        [(i, json.dumps(c)) for i, c in enumerate(contexts)], "ctx_id int, body string"
    )
    resolver = variant_resolver(F.col("body"))
    exprs = []
    while len(exprs) < 120:
        text = gen_expr_n(rnd)
        try:
            exprs.append((text, parse(text)))
        except Exception:  # pragma: no cover
            continue
    cols, idx = [], []
    for i, (text, ast) in enumerate(exprs):
        try:
            cols.append(compile_filter(ast, resolver).alias(f"e{i}"))
            idx.append(i)
        except CompileError:
            continue
    out = {r.ctx_id: r for r in df.select("ctx_id", *cols).collect()}
    mismatches = []
    for cid, ctx in enumerate(contexts):
        for i in idx:
            text, ast = exprs[i]
            if bool(out[cid][f"e{i}"]) != bool(evaluate_bool(ast, ctx)):
                mismatches.append((text, ctx))
    assert not mismatches, mismatches[:5]


def test_variant_array_equality_and_has_are_typed(spark):
    """Array equality and `has` membership over variant fields must
    use the evaluator's TYPED per-element value_eq: Number(1) is not
    Text("1") even though both canonicalize to the string '1', while
    [2.0] equals [2] numerically and null elements equal each other.
    The canonical-string array form (which the typed-column path
    correctly keeps — homogeneous element types) called [1] equal to
    ["1"] on variant fields until round 5."""
    ctxs = [
        {"a": [1, 2], "b": [1, 2]},
        {"a": [1], "b": ["1"]},
        {"a": [2.0], "b": [2]},
        {"a": ["x", 1], "b": ["x", 1]},
        {"a": [1, None], "b": [1, None]},
        {"a": [1, 2], "b": [2, 1]},
        {"a": ["1"]},
        {"a": [1]},
    ]
    df = spark.createDataFrame(
        [(i, json.dumps(c)) for i, c in enumerate(ctxs)], "i int, body string"
    )
    resolver = variant_resolver(F.col("body"))
    for text in ["a = b", "a != b", "a has [1]", "a has [1,2]", 'a has "1"']:
        ast = parse(text)
        got = sorted(r.i for r in df.filter(compile_filter(ast, resolver)).collect())
        expected = sorted(i for i, c in enumerate(ctxs) if evaluate_bool(ast, c))
        assert got == expected, (text, got, expected)


def test_differential_random_corpus_round10_fresh_seeds(spark):
    """Cumulative fuzz extension (round 10): a FRESH seed batch — 400
    expressions × 30 contexts, deeper nesting allowed — over the
    variant resolver. Every round adds a never-before-run region of
    the expression space; earlier batches stay pinned under their own
    seeds, so a regression in either engine path trips SOME seed."""
    # r13: trimmed 30->12 contexts, 400->150 exprs (the same seed
    # stream's deterministic prefix) so one driver pytest run fits the
    # verify cap; the long-haul sweep tool covers the full regions
    rnd = random.Random(20260815)
    contexts = [gen_context(rnd) for _ in range(12)]
    exprs = []
    while len(exprs) < 150:
        text = gen_expr(rnd, depth=rnd.choice([0, 0, 1]))
        try:
            ast = parse(text)
        except Exception:  # pragma: no cover
            continue
        exprs.append((text, ast))

    df = spark.createDataFrame(
        [(i, json.dumps(ctx)) for i, ctx in enumerate(contexts)], "ctx_id int, body string"
    )
    resolver = variant_resolver(F.col("body"))
    cols, compiled_idx = [], []
    for i, (text, ast) in enumerate(exprs):
        try:
            cols.append(compile_filter(ast, resolver).alias(f"e{i}"))
            compiled_idx.append(i)
        except CompileError:
            continue
    assert len(compiled_idx) >= 90  # the corpus must mostly compile

    rows = {r.ctx_id: r for r in df.select("ctx_id", *cols).collect()}
    mismatches = []
    for ctx_id, ctx in enumerate(contexts):
        for i in compiled_idx:
            text, ast = exprs[i]
            expected = evaluate_bool(ast, ctx)
            got = rows[ctx_id][f"e{i}"]
            if bool(got) != bool(expected):
                mismatches.append((text, ctx, expected, got))
    assert not mismatches, mismatches[:5]


def test_differential_random_corpus_round10b_fresh_seeds(spark):
    """Second round-10 fuzz pin (fresh seed 20260816), through the
    VARIANT resolver like its siblings — the long-haul tool swept
    27,100 (expr, ctx) pairs over six more seeds this round with zero
    divergence; this pins one of those regions permanently. Earlier
    batches stay pinned under their own seeds."""
    # r13: trimmed 30->12 contexts, 400->150 exprs (the same seed
    # stream's deterministic prefix) so one driver pytest run fits the
    # verify cap; the long-haul sweep tool covers the full regions
    rnd = random.Random(20260816)
    contexts = [gen_context(rnd) for _ in range(12)]
    exprs = []
    while len(exprs) < 150:
        text = gen_expr(rnd, depth=rnd.choice([0, 0, 1]))
        try:
            ast = parse(text)
        except Exception:  # pragma: no cover
            continue
        exprs.append((text, ast))

    df = spark.createDataFrame(
        [(i, json.dumps(ctx)) for i, ctx in enumerate(contexts)], "ctx_id int, body string"
    )
    resolver = variant_resolver(F.col("body"))
    cols, compiled_idx = [], []
    for i, (text, ast) in enumerate(exprs):
        try:
            cols.append(compile_filter(ast, resolver).alias(f"e{i}"))
            compiled_idx.append(i)
        except CompileError:
            continue
    assert len(compiled_idx) >= 90  # the corpus must mostly compile

    rows = {r.ctx_id: r for r in df.select("ctx_id", *cols).collect()}
    mismatches = []
    for ctx_id, ctx in enumerate(contexts):
        for i in compiled_idx:
            text, ast = exprs[i]
            expected = evaluate_bool(ast, ctx)
            got = rows[ctx_id][f"e{i}"]
            if bool(got) != bool(expected):
                mismatches.append((text, ctx, expected, got))
    assert not mismatches, mismatches[:5]
