"""Ad-hoc per-entry timing: the same discipline as bench.py (warm-up,
min-of-N, noop sink, tracked-cache release between runs, sentinel
probe) over an arbitrary subset of catalog entries — the measurement
loop for optimization work, where re-running the whole headline list
per edit would burn the round's wall-clock.

    python tools/bench_entries.py graph_pagerank text_lm_perplexity
    SPARK_GRAFT_BENCH_RUNS=5 python tools/bench_entries.py q1_pricing_summary

Prints one line per entry plus a final JSON summary (entries, per-entry
construct/execute phase split from the best run, sentinel seconds,
noise factor vs bench.py's canonical sentinel).

r13: every entry gets its OWN untimed warm-up pass (the r12 version
warmed only names[0], so every other entry's first timed run carried
first-touch codegen/scan-setup cost into min-of-N), a warm-up failure
is recorded per entry in the JSON instead of a stderr note with timings
proceeding against a cold session, and the best run's construct
(DataFrame build, incl. any in-construction collects) vs execute (noop
write) seconds ship per entry — the r12 measurement dispute
(driver-side vs executor-side time) as data, not prose.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not names:
        print("usage: bench_entries.py ENTRY [ENTRY...]", file=sys.stderr)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    from bench import SENTINEL_CANONICAL_SEC, _sentinel
    from hyper_storage_spark.operators._caches import release_tracked_caches
    from hyper_storage_spark.queries import all_specs
    from hyper_storage_spark.session import get_spark

    specs = all_specs()
    unknown = [n for n in names if n not in specs]
    if unknown:
        print(f"unknown entries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark("bench_entries")

    sentinel_start = _sentinel(spark)
    timings: dict[str, float] = {}
    phases: dict[str, dict[str, float]] = {}
    errors: dict[str, str] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_entries: {name}")
        # one untimed pass PER ENTRY: JVM/codegen/scan first-touch must
        # not land on any entry's first timed run (min-of-N at small N
        # otherwise reports the warm-up of every entry but the first)
        try:
            specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001 — a broken entry is a result, not a note
            errors[name] = f"warmup failed: {type(e).__name__}: {e}"[:300]
            print(f"# {name}: {errors[name]}", file=sys.stderr)
            spark.sparkContext.setJobDescription(None)
            release_tracked_caches()
            continue
        release_tracked_caches()
        best, best_phases = None, None
        for _ in range(runs):
            t0 = time.time()
            df = specs[name].fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            dt = t2 - t0
            if best is None or dt < best:
                best = dt
                best_phases = {"construct_sec": round(t1 - t0, 3),
                               "execute_sec": round(t2 - t1, 3)}
            release_tracked_caches()
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        phases[name] = best_phases
        print(
            f"# {name}: {timings[name]:.3f}s "
            f"(construct {best_phases['construct_sec']:.3f} + "
            f"execute {best_phases['execute_sec']:.3f})",
            file=sys.stderr,
        )
    sentinel_end = _sentinel(spark)
    out = {
        "entries": timings,
        "phases": phases,
        "sentinel_sec": {
            "start": round(sentinel_start, 4),
            "end": round(sentinel_end, 4),
            "canonical": SENTINEL_CANONICAL_SEC,
        },
        "noise_factor": round(sentinel_end / SENTINEL_CANONICAL_SEC, 2),
        "sf_dir": sf_dir,
        "runs": runs,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
