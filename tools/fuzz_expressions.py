"""Long-haul differential fuzz of the expression compiler.

The pytest differential corpus pins fixed seeds (fast, reproducible);
this tool hunts with MANY seeds — thousands of random expressions ×
contexts through the VARIANT (JSON) identifier resolver, compared
against the Python evaluator, in a handful of Spark jobs (one select
per seed batch). (The typed-column resolver keeps its own pinned
corpus in tests/test_expression_differential.py.) Any divergence prints the
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
        variant_resolver,
    )
    from hyper_storage_spark.session import get_spark

    spark = get_spark("fuzz_expressions", cpus=8)
    total_checked = 0
    failures = []
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
        df = spark.createDataFrame(
            [(i, json.dumps(ctx)) for i, ctx in enumerate(contexts)],
            "ctx_id int, body string",
        )
        resolver = variant_resolver(F.col("body"))
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
                    failures.append((seed, text, ctx, expected, got))
        print(f"# seed {seed}: {len(idx)} exprs x {len(contexts)} ctx, "
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
