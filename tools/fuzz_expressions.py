"""Long-haul differential fuzz of the expression compiler.

The pytest differential corpus pins fixed seeds (fast, reproducible);
this tool hunts with MANY seeds — thousands of random expressions ×
contexts through BOTH identifier resolvers (the variant/JSON path and
the native typed-column path with its JSON fallback), compared
against the Python evaluator, in a handful of Spark jobs (one select
per resolver per seed batch). Any divergence prints the
expression + context so it can be pinned as a regression test.

Usage: python tools/fuzz_expressions.py [n_seeds] [exprs_per_seed]
"""

from __future__ import annotations

import json
import random
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_exprs = int(sys.argv[2]) if len(sys.argv) > 2 else 150

    from test_expression_differential import gen_context, gen_expr

    from hyper_storage_spark.expression import evaluate_bool, parse
    from hyper_storage_spark.expression.compiler import (
        CompileError,
        compile_filter,
        typed_resolver,
        variant_resolver,
    )
    from hyper_storage_spark.session import get_spark

    spark = get_spark("fuzz_expressions", cpus=8)
    total_checked = 0
    failures = []

    def check(df, resolver, contexts, exprs, seed, tag):
        nonlocal total_checked
        cols, idx = [], []
        for i, (text, ast) in enumerate(exprs):
            try:
                cols.append(compile_filter(ast, resolver).alias(f"e{i}"))
                idx.append(i)
            except CompileError:
                continue
        rows = {r.ctx_id: r for r in df.select("ctx_id", *cols).collect()}
        for ctx_id, ctx in enumerate(contexts):
            for i in idx:
                text, ast = exprs[i]
                expected = evaluate_bool(ast, ctx)
                got = rows[ctx_id][f"e{i}"]
                total_checked += 1
                if bool(got) != bool(expected):
                    failures.append((seed, tag, text, ctx, expected, got))
        return len(idx)

    def cell(ctx, f, caster):
        v = ctx.get(f, "__ABSENT__")
        return caster(v) if v != "__ABSENT__" else None

    def as_num(v):
        return float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else None

    for seed in range(n_seeds):
        rnd = random.Random(8800 + seed)
        contexts = [gen_context(rnd) for _ in range(20)]
        exprs = []
        while len(exprs) < n_exprs:
            text = gen_expr(rnd)
            try:
                exprs.append((text, parse(text)))
            except Exception:
                continue
        # --- variant (JSON) resolver path
        vdf = spark.createDataFrame(
            [(i, json.dumps(ctx)) for i, ctx in enumerate(contexts)],
            "ctx_id int, body string",
        )
        nv = check(vdf, variant_resolver(F.col("body")), contexts, exprs, seed, "variant")
        # --- native typed-column resolver path (a/b/c num, s/t str,
        # flag bool, tags array; 'missing' via the JSON fallback).
        # The evaluator sees what the typed row stores: a typed NULL
        # cell is present-but-null (evaluator None).
        rows, eval_ctxs = [], []
        for i, ctx in enumerate(contexts):
            js = {}
            if ctx.get("missing", "__ABSENT__") != "__ABSENT__":
                js["missing"] = ctx["missing"]
            row = (
                i,
                cell(ctx, "a", as_num),
                cell(ctx, "b", as_num),
                cell(ctx, "c", as_num),
                cell(ctx, "s", lambda v: v if isinstance(v, str) else None),
                cell(ctx, "t", lambda v: v if isinstance(v, str) else None),
                cell(ctx, "flag", lambda v: v if isinstance(v, bool) else None),
                cell(ctx, "tags", lambda v: [float(x) for x in v] if isinstance(v, list) else None),
                json.dumps(js),
            )
            rows.append(row)
            ectx = dict(zip(["a", "b", "c", "s", "t", "flag", "tags"], row[1:8]))
            ectx.update(js)
            eval_ctxs.append(ectx)
        tdf = spark.createDataFrame(
            rows,
            "ctx_id int, a double, b double, c double, s string, t string, "
            "flag boolean, tags array<double>, props string",
        )
        nt = check(tdf, typed_resolver(tdf, json_col="props"), eval_ctxs, exprs, seed, "typed")
        print(f"# seed {seed}: variant {nv} + typed {nt} exprs x {len(contexts)} ctx, "
              f"{len(failures)} divergences so far")
    print(f"\nchecked {total_checked} (expr, ctx) pairs across {n_seeds} seeds")
    if failures:
        print("DIVERGENCES:")
        for f_ in failures[:20]:
            print(" -", f_)
        sys.exit(1)
    print("no compiler/evaluator divergence found")


if __name__ == "__main__":
    main()
