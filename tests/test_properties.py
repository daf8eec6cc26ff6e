"""Property-based tests (hypothesis) for the pure-Python kernels whose
correctness everything else leans on: merge-patch and the expression
evaluator/parser pair."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from hyper_storage_spark.store.merge import filter_nulls, merge_patch

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(-1000, 1000),
    st.text(max_size=8),
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=4), children, max_size=4),
    ),
    max_leaves=12,
)


def no_nulls_in_object_tree(v) -> bool:
    """Null-free through OBJECT fields only: the reference's
    filterNulls visitor returns lists verbatim (visitLst(d) = d,
    PrimaryWorker.scala:59), so nulls inside list subtrees survive —
    by design, and our filter_nulls matches."""
    if isinstance(v, dict):
        return all(x is not None and no_nulls_in_object_tree(x) for x in v.values())
    return True


@settings(max_examples=200, deadline=None)
@given(existing=json_values, patch=json_values)
def test_merge_patch_strips_nulls_in_object_tree(existing, patch):
    assert no_nulls_in_object_tree(merge_patch(existing, patch))


def test_nulls_inside_lists_survive_like_reference():
    # pinned example: visitLst returns the list unchanged
    assert filter_nulls({"a": [{"b": None}], "c": None}) == {"a": [{"b": None}]}


@settings(max_examples=200, deadline=None)
@given(existing=json_values, patch=json_values)
def test_merge_patch_is_idempotent(existing, patch):
    once = merge_patch(existing, patch)
    assert merge_patch(once, patch) == once


@settings(max_examples=200, deadline=None)
@given(
    existing=st.dictionaries(st.text(max_size=4), json_scalars, max_size=5),
    patch=st.dictionaries(st.text(max_size=4), json_scalars, max_size=5),
)
def test_merge_patch_shallow_semantics(existing, patch):
    """The reference's merge is SHALLOW: patch keys win wholesale,
    null patch values delete, untouched keys survive (minus their own
    nulls)."""
    out = merge_patch(existing, patch)
    for k, v in patch.items():
        if v is None:
            assert k not in out
        else:
            assert out[k] == filter_nulls(v)
    for k, v in existing.items():
        if k not in patch and v is not None:
            assert out[k] == filter_nulls(v)


@settings(max_examples=100, deadline=None)
@given(value=json_values)
def test_filter_nulls_is_idempotent_and_json_stable(value):
    once = filter_nulls(value)
    assert filter_nulls(once) == once
    json.dumps(once)  # always serializable


# ---- distributed statistics vs pure-Python references -------------
#
# The eval/drift operators claim EXACT cross-engine arithmetic; these
# properties pin the Spark implementations to naive O(n²)/sort-based
# Python folds on adversarial small inputs (ties, duplicates, constant
# columns) where formula bugs hide. Few examples — each roundtrips a
# Spark job — but hypothesis shrinks mercilessly when one fails.

samples = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 1)), min_size=4, max_size=24
).filter(lambda xs: {y for _, y in xs} == {0, 1})


@settings(max_examples=10, deadline=None)
@given(xs=samples)
def test_auc_matches_naive_pairwise(spark, xs):
    from hyper_storage_spark.operators import profiling

    df = spark.createDataFrame([(float(s), y) for s, y in xs], "s double, y int")
    got = profiling.auc_binary(df, "s", "y").collect()[0]
    pos = [s for s, y in xs if y == 1]
    neg = [s for s, y in xs if y == 0]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    assert (got.n_pos, got.n_neg) == (len(pos), len(neg))
    # compare against the UNROUNDED naive value with the ROUND(.,6)
    # half-width: Python's round() is half-even while Spark's is
    # half-up, so exact .5-boundary draws (hypothesis finds them)
    # legitimately differ in the last kept digit
    assert abs(got.auc - wins / (len(pos) * len(neg))) <= 5.001e-7


@settings(max_examples=10, deadline=None)
@given(xs=samples)
def test_ks_matches_naive_ecdf(spark, xs):
    from hyper_storage_spark.operators import profiling

    df = spark.createDataFrame([(float(s), y) for s, y in xs], "v double, y int")
    got = profiling.ks_two_sample(df, "v", "y").collect()[0]
    a = sorted(s for s, y in xs if y == 1)
    b = sorted(s for s, y in xs if y == 0)
    vals = sorted({s for s, _ in xs})
    d = max(
        abs(
            sum(1 for x in a if x <= v) / len(a)
            - sum(1 for x in b if x <= v) / len(b)
        )
        for v in vals
    )
    assert abs(got.d - d) < 1e-12


@settings(max_examples=10, deadline=None)
@given(
    xs=st.lists(st.integers(0, 50), min_size=2, max_size=24).filter(
        lambda v: sum(v) > 0
    )
)
def test_gini_matches_naive_sorted_rank(spark, xs):
    from hyper_storage_spark.operators import profiling

    df = spark.createDataFrame([(v,) for v in xs], "x long")
    got = profiling.gini(df, "x").collect()[0]
    s = sorted(xs)
    n, t = len(s), sum(s)
    naive = (2 * sum((i + 1) * x for i, x in enumerate(s)) - (n + 1) * t) / (n * t)
    assert got.n == n and got.total == t
    assert abs(got.gini - naive) < 1e-12


@settings(max_examples=8, deadline=None)
@given(
    xs=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=3, max_size=20
    )
)
def test_spearman_matches_naive_midranks(spark, xs):
    from hypothesis import assume

    from hyper_storage_spark.operators import profiling

    # rho undefined for constant columns — skip those draws
    assume(len({a for a, _ in xs}) > 1 and len({b for _, b in xs}) > 1)
    df = spark.createDataFrame(
        [("g", float(a), float(b)) for a, b in xs], "g string, x double, y double"
    )
    got = profiling.spearman_by_group(df, "g", "x", "y").collect()[0]

    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        r = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            mid = (i + j) / 2 + 1
            for k in range(i, j + 1):
                r[order[k]] = mid
            i = j + 1
        return r

    rx = midranks([a for a, _ in xs])
    ry = midranks([b for _, b in xs])
    n = len(xs)
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    den = ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
    naive = (n * sxy - sx * sy) / den
    assert abs(got.rho - naive) < 1e-12


@settings(max_examples=8, deadline=None)
@given(
    xs=st.lists(
        st.tuples(st.sampled_from("ab"), st.sampled_from("uvw")),
        min_size=4,
        max_size=30,
    ).filter(
        lambda v: len({a for a, _ in v}) > 1 and len({b for _, b in v}) > 1
    )
)
def test_chi2_and_mi_match_naive_contingency(spark, xs):
    import math
    from collections import Counter

    from hyper_storage_spark.operators import profiling

    df = spark.createDataFrame(xs, "a string, b string")
    chi = profiling.chi2_independence(df, "a", "b").collect()[0]
    mi = profiling.mutual_information(df, "a", "b").collect()[0]

    n = len(xs)
    cells = Counter(xs)
    ra = Counter(a for a, _ in xs)
    cb = Counter(b for _, b in xs)
    chi2 = sum(
        (o - ra[a] * cb[b] / n) ** 2 / (ra[a] * cb[b] / n)
        for (a, b), o in cells.items()
    )
    mi_naive = sum(
        (o / n) * math.log(o * n / (ra[a] * cb[b])) for (a, b), o in cells.items()
    )
    ha = -sum((c / n) * math.log(c / n) for c in ra.values())
    hb = -sum((c / n) * math.log(c / n) for c in cb.values())
    # unrounded naive vs the ROUND(.,6) output: tolerance is the
    # rounding half-width (Python round is half-even, Spark half-up)
    assert chi.n == n and abs(chi.chi2 - chi2) <= 5.01e-7
    assert abs(mi.mi - mi_naive) <= 5.01e-7
    if ha > 0 and hb > 0:
        assert abs(mi.nmi - mi_naive / (ha * hb) ** 0.5) <= 5.01e-7


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=1, max_size=10),
        min_size=2,
        max_size=10,
    ).filter(lambda ds: len({i % 2 for i in range(len(ds))}) > 1)
)
def test_kl_divergence_matches_naive(spark, docs):
    import math
    from collections import Counter

    from hyper_storage_spark.operators import text as text_ops

    rows = [(str(i % 2), " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "lang string, text string")
    got = {
        r.lang: (r.n_tokens, r.kl)
        for r in text_ops.kl_unigram_divergence(df, "lang").collect()
    }
    all_toks = [t for toks in docs for t in toks]
    q = Counter(all_toks)
    nq = len(all_toks)
    for g in {str(i % 2) for i in range(len(docs))}:
        toks_g = [t for i, toks in enumerate(docs) if str(i % 2) == g for t in toks]
        pg = Counter(toks_g)
        ng = len(toks_g)
        kl = sum((c / ng) * math.log((c / ng) / (q[t] / nq)) for t, c in pg.items())
        assert got[g][0] == ng
        assert abs(got[g][1] - kl) <= 5.01e-7


def test_waterfill_quota_randomized_differential(spark):
    """waterfill_quota vs a brute-force Python water-filler across
    seeded random count vectors and budgets: exact quota agreement,
    exact-sum property, and the remainder discipline."""
    import random

    from hyper_storage_spark.operators import sampling

    def py_waterfill(counts: dict, budget: int) -> dict:
        items = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
        n = len(items)
        quotas = {}
        remaining, m = budget, n
        # fully take groups below the rising water line
        i = 0
        while i < n:
            name, c = items[i]
            level = remaining // m
            if level >= c:
                quotas[name] = c
                remaining -= c
                m -= 1
                i += 1
            else:
                break
        if i < n:
            level = remaining // m
            leftover = remaining - level * m
            for j, (name, c) in enumerate(items[i:]):
                quotas[name] = level + (1 if j < leftover else 0)
        return quotas

    rng = random.Random(20260816)
    for case in range(25):
        n_groups = rng.randint(1, 9)
        counts = {f"g{i}": rng.randint(1, 40) for i in range(n_groups)}
        total = sum(counts.values())
        budget = rng.choice([0, rng.randint(1, total), total, total + 7])
        rows = [(g,) for g, c in counts.items() for _ in range(c)]
        df = spark.createDataFrame(rows, "g string")
        got = {
            r.g: r.quota
            for r in sampling.waterfill_quota(df, "g", budget).collect()
        }
        want = py_waterfill(counts, budget)
        assert got == want, (case, counts, budget, got, want)
        assert sum(got.values()) == min(budget, total)


def test_corpus_diff_randomized_differential(spark):
    """corpus_diff vs a Python dict diff across seeded random version
    pairs with nullable content columns."""
    import random

    from hyper_storage_spark.operators import versioning

    rng = random.Random(7777)
    for case in range(10):
        ids = list(range(rng.randint(1, 30)))
        def mk(seed):
            r = random.Random(seed)
            out = {}
            for i in ids:
                if r.random() < 0.8:
                    out[i] = (
                        None if r.random() < 0.1 else f"t{r.randint(0, 5)}",
                        None if r.random() < 0.1 else f"l{r.randint(0, 2)}",
                    )
            return out
        old, new = mk(case * 2), mk(case * 2 + 1)
        want = {}
        for i in set(old) | set(new):
            if i not in old:
                want[i] = "added"
            elif i not in new:
                want[i] = "removed"
            elif old[i] != new[i]:
                want[i] = "changed"
            else:
                want[i] = "unchanged"
        schema = "doc_id long, text string, lang string"
        odf = spark.createDataFrame([(i, *v) for i, v in old.items()], schema)
        ndf = spark.createDataFrame([(i, *v) for i, v in new.items()], schema)
        got = {
            r.doc_id: r.status
            for r in versioning.corpus_diff(odf, ndf, "doc_id", ("text", "lang")).collect()
        }
        assert got == want, (case, got, want)
