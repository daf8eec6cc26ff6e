"""sf1 heavy-entry smoke (round-11, VERDICT item 6): run the most
expensive headline entries at ~sf1 to catch superlinear creep the
sf0.1 bands can't see.

The driver ships no sf1 fixture, so this builds one: every table is
replicated ``replicas``× from sf0.1 with key offsets applied
CONSISTENTLY (o_orderkey/l_orderkey shift together, doc_id/vec_id
shift, customer/supplier/part keys shift with their FK columns), so
joins behave like a genuinely larger instance rather than a broken
one. Dimension tables (region, nation) are copied as-is — they are
fixed-cardinality in TPC-H too.

Usage: python tools/sf1_smoke.py [replicas] [entry ...]
Prints one line per entry: sf0.1 wall, sf1 wall, growth factor, and
the data growth it should be compared against (10×).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
DEFAULT_ENTRIES = [
    "text_ppl_buckets",
    "text_bpe_merges",
    "graph_pagerank",
    "ann_ivfpq_raw",
    "dedup_ngram_jaccard",
    # r12: the budget-armed twin — identical (exact) below the 10M
    # posting-mass budget, auto-routed to minhash_lsh_pairs above it,
    # so its sf1 row should read near-linear where dedup_ngram_jaccard
    # reads the documented below-cap quadratic region
    "dedup_ngram_autoroute",
]

# per-table integer columns to offset per replica (keys + the FKs that
# reference them); everything else is copied verbatim
OFFSETS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "region": [],
    "nation": [],
}
# nation keys must NOT shift (region/nation are fixed dims), so FK
# columns pointing at them keep their values
KEEP = {"c_nationkey", "s_nationkey"}
STEP = 100_000_000


def build_sf1(spark, replicas: int) -> str:
    out = os.path.join(tempfile.gettempdir(), f"sf1_smoke_v2_x{replicas}")
    marker = os.path.join(out, "_BUILT")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    from hyper_storage_spark.sources.tables import TABLE_NAMES, load_table

    for name in TABLE_NAMES:
        df = load_table(spark, SRC, name)
        cols = [c for c in OFFSETS.get(name, []) if c not in KEEP]
        if not cols:
            df.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
            continue
        parts = [df]
        for r in range(1, replicas):
            rep = df
            for c in cols:
                rep = rep.withColumn(c, F.col(c) + F.lit(r * STEP))
            if name == "documents":
                # weave a per-replica salt through the text (the
                # span_realistic discipline): replicas keep the
                # ORIGINAL corpus's internal dup structure instead of
                # becoming 10 identical twins of every document —
                # exact copies would multiply near-dup PAIRS ~replicas²
                # and any pair-producing entry would read superlinear
                # for reasons that are about the fixture, not the plan
                rep = rep.withColumn(
                    "text",
                    F.regexp_replace(
                        F.col("text"), r"(\S+ \S+ \S+ \S+) ", f"$1 u{r}q "
                    ),
                )
            parts.append(rep)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"# built {name}: x{replicas}")
    open(marker, "w").close()
    return out


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    entries = sys.argv[2:] or DEFAULT_ENTRIES
    from hyper_storage_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("sf1_smoke")
    qs = entry_mod.queries()
    # "all" = the WHOLE driver window (r12, VERDICT item 6): rows-only,
    # no oracle — superlinear creep anywhere in the gate, not just the
    # known-expensive tail, shows up as a growth factor > replicas
    if entries == ["all"]:
        entries = sorted(qs)
    extra = getattr(entry_mod, "extra_queries", None)
    all_qs = dict(qs)
    if callable(extra):
        all_qs.update(extra())
    else:
        from hyper_storage_spark.queries import all_specs

        all_qs.update({k: v.fn for k, v in all_specs().items()})

    from hyper_storage_spark.operators._caches import release_tracked_caches

    sf1 = build_sf1(spark, replicas)
    results: list[tuple[str, float, float, float]] = []
    failed: list[str] = []
    for name in entries:
        fn = all_qs.get(name)
        if fn is None:
            print(f"# {name}: NOT FOUND, skipped")
            continue
        try:
            fn(spark, SRC).count()  # untimed warmup: JIT + codegen + IO cache
            release_tracked_caches()
            walls = {}
            for label, d in (("sf0.1", SRC), (f"sf1(x{replicas})", sf1)):
                t0 = time.time()
                n = fn(spark, d).count()
                walls[label] = time.time() - t0
                release_tracked_caches()
                print(f"#   {name} @{label}: {n} rows, {walls[label]:.2f}s")
        except Exception as e:  # noqa: BLE001 — one entry, one row
            failed.append(name)
            print(f"# {name}: ERROR {type(e).__name__}: {e}"[:300])
            continue
        g = walls[f"sf1(x{replicas})"] / max(walls["sf0.1"], 1e-9)
        results.append((name, walls["sf0.1"], walls[f"sf1(x{replicas})"], g))
        verdict = "OK (≤ data growth)" if g <= replicas else "SUPERLINEAR — investigate"
        print(f"# {name}: growth {g:.2f}x vs data {replicas}x -> {verdict}")
        if g > replicas:
            print(
                f"# {name}: NOTE — before blaming the plan, compare wall "
                f"growth to WORK growth (candidate/pair volume, output rows): "
                f"df-capped pair generators are quadratic in df BELOW the cap, "
                f"so a fixture that pushes dfs toward the cap multiplies work "
                f"faster than data (measured r11: ngram pair volume 79x on "
                f"10x data, wall 21x = sublinear in work)"
            )
    if len(results) > 1:
        print("# ---- summary (growth desc) ----")
        for name, w01, w1, g in sorted(results, key=lambda r: -r[3]):
            flag = " <-- SUPERLINEAR" if g > replicas else ""
            print(f"# {name}: {w01:.2f}s -> {w1:.2f}s = {g:.2f}x{flag}")
        over = [r for r in results if r[3] > replicas]
        print(
            f"# sf1 smoke summary: {len(results)} entries, "
            f"{len(over)} above data growth, {len(failed)} failed"
        )
    print("# sf1 smoke done")


if __name__ == "__main__":
    main()
