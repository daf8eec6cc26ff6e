"""Measure per-entry noise bands for the bench headline set: N timed
runs per entry (each run's individual wall, NOT min-of-N) at the given
SF, printed as min/median/max — the source for SCALE.md's per-entry
band table and bench.py's WIDE_BAND membership.

Usage: python tools/noise_bands.py [sf_dir] [n_runs] [entry ...]
(with entries given, only those are swept — the targeted clean-run
record for closing a flagged regression without a full sweep)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    only = set(sys.argv[3:])

    import bench
    from hyper_storage_spark.operators._caches import release_tracked_caches
    from hyper_storage_spark.queries import all_specs
    from hyper_storage_spark.session import get_spark

    specs = all_specs()
    spark = get_spark("noise_bands")
    specs["q1_pricing_summary"].fn(spark, sf_dir).collect()  # session warm-up

    sent_start = bench._sentinel(spark)
    out: dict[str, dict] = {}
    for name in bench.HEADLINE:
        if only and name not in only:
            continue
        fn = specs[name].fn
        # one UNTIMED warm-up per entry (round 10): the first execution
        # pays Catalyst compile + codegen, which inflated `max` ~1.5-4x
        # for cheap entries in the r8/r9 sweeps — the band then measured
        # compile, not host noise, widening adjudication ceilings (a
        # real 1.4x regression could hide under a compile-inflated max)
        # and putting 14/22 entries in derived WIDE_BAND. Bands from
        # r10 on measure steady-state runs only.
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        finally:
            release_tracked_caches()
        samples = []
        for _ in range(n_runs):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            release_tracked_caches()
        out[name] = {
            "min": round(min(samples), 3),
            "median": round(statistics.median(samples), 3),
            "max": round(max(samples), 3),
            "band": round(max(samples) - min(samples), 3),
            "runs": [round(s, 3) for s in samples],
        }
        print(f"# {name}: min={out[name]['min']} med={out[name]['median']} "
              f"max={out[name]['max']} band={out[name]['band']}", file=sys.stderr)
    sent_end = bench._sentinel(spark)
    print(json.dumps({
        "sf_dir": sf_dir,
        "n_runs": n_runs,
        # the END probe is the verdict (bench.py rationale: the start
        # probe reads ~1.2-1.3x from JIT tiering even on a quiet box)
        "noise_factor": round(sent_end / bench.SENTINEL_CANONICAL_SEC, 2),
        "sentinel_start": round(sent_start, 4),
        "entries": out,
    }))


if __name__ == "__main__":
    main()
