"""Ad-hoc per-entry timing: the same discipline as bench.py (warm-up,
min-of-N, noop sink, tracked-cache release between runs, sentinel
probe) over an arbitrary subset of catalog entries — the measurement
loop for optimization work, where re-running the whole headline list
per edit would burn the round's wall-clock.

    python tools/bench_entries.py graph_pagerank text_lm_perplexity
    SPARK_GRAFT_BENCH_RUNS=5 python tools/bench_entries.py q1_pricing_summary

Prints one line per entry plus a final JSON summary (entries, sentinel
seconds, noise factor vs bench.py's canonical sentinel).
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
    # warm-up: JVM/codegen/session init must not land on the first entry
    try:
        specs[names[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception as e:  # noqa: BLE001
        print(f"# warmup failed: {type(e).__name__}: {e}", file=sys.stderr)
    release_tracked_caches()

    sentinel_start = _sentinel(spark)
    timings: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_entries: {name}")
        best = None
        for _ in range(runs):
            t0 = time.time()
            specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            release_tracked_caches()
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)
    sentinel_end = _sentinel(spark)
    print(
        json.dumps(
            {
                "entries": timings,
                "sentinel_sec": {
                    "start": round(sentinel_start, 4),
                    "end": round(sentinel_end, 4),
                    "canonical": SENTINEL_CANONICAL_SEC,
                },
                "noise_factor": round(sentinel_end / SENTINEL_CANONICAL_SEC, 2),
                "sf_dir": sf_dir,
                "runs": runs,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
