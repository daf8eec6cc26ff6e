"""Print the formatted physical plan of any catalog entry — the
human face of tools/plan_audit.py's automated sweep.

    python tools/explain_entry.py q1_pricing_summary [sf_dir]
    python tools/explain_entry.py --list

Shows `EXPLAIN FORMATTED` (scan → exchange → aggregate tree, with
PushedFilters/ReadSchema on the scans and the codegen stage spans),
which is exactly what to eyeball when asking "would this plan survive
100×": where the exchanges are, what reaches the parquet scan, and
whether the joins broadcast.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main(argv: list[str] | None = None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    from hyper_storage_spark.queries import all_specs

    specs = all_specs()
    if not args or args[0] == "--list":
        for name in specs:
            print(name)
        return 0
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    if name not in specs:
        print(f"unknown entry {name!r} (use --list)", file=sys.stderr)
        return 2
    from hyper_storage_spark.session import get_spark

    spark = get_spark("explain_entry")
    df = specs[name].fn(spark, sf_dir)
    df.explain("formatted")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
