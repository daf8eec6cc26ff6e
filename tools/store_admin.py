"""Operational CLI for a document-store root.

The reference runs as a service with its operations driven over the
bus; this engine is a library, so day-2 operations get a command-line
face instead:

    python tools/store_admin.py ROOT info
    python tools/store_admin.py ROOT versions
    python tools/store_admin.py ROOT vacuum [--grace SECONDS] [--keep N]
    python tools/store_admin.py ROOT compact
    python tools/store_admin.py ROOT rollback VERSION
    python tools/store_admin.py ROOT recover
    python tools/store_admin.py ROOT truncate-feed --older-than-ms MS
    python tools/store_admin.py ROOT retention [--feed-keep-ms MS] [--grace S] [--keep N]

Every command prints ONE JSON line. No Spark session is started —
these are manifest/file operations (recover uses the driver-side
completion path).
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("root", help="store root directory")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("info")
    sub.add_parser("versions")
    vac = sub.add_parser("vacuum")
    vac.add_argument("--grace", type=float, default=3600.0)
    vac.add_argument(
        "--keep",
        type=int,
        default=None,
        help="override snapshot retention for this pass (0 = current-only, "
        "forfeits time travel over the reclaimed history)",
    )
    sub.add_parser("compact")
    rb = sub.add_parser("rollback")
    rb.add_argument("version", type=int)
    sub.add_parser("recover")
    tf = sub.add_parser("truncate-feed")
    tf.add_argument("--older-than-ms", type=int, required=True,
                    help="drop published feed events with ts before this epoch-ms")
    ret = sub.add_parser(
        "retention",
        help="one-shot maintenance pass (cron this): truncate the feed "
        "by age, compact append tables, vacuum unreferenced files",
    )
    ret.add_argument("--feed-keep-ms", type=int, default=7 * 24 * 3600 * 1000,
                     help="feed event retention window (default 7 days)")
    ret.add_argument("--grace", type=float, default=3600.0)
    ret.add_argument("--keep", type=int, default=None,
                     help="snapshot retention override passed to vacuum")
    dv = sub.add_parser(
        "diff", help="item-level changes between two retained versions"
    )
    dv.add_argument("v_from", type=int)
    dv.add_argument("v_to", type=int, nargs="?", default=None,
                    help="omit to diff against the current state")
    dv.add_argument("--uri", default=None, help="restrict to one collection")
    args = ap.parse_args(argv)

    from hyper_storage_spark.store import DocumentStore

    store = DocumentStore(args.root)
    if args.cmd == "info":
        out = store.info()
    elif args.cmd == "versions":
        out = {"versions": store.storage.versions()}
    elif args.cmd == "vacuum":
        out = {
            "removed": store.vacuum(grace_seconds=args.grace, keep_versions=args.keep)
        }
    elif args.cmd == "compact":
        out = {"compacted": store.compact_appends()}
    elif args.cmd == "rollback":
        out = {"restored_to": args.version, "new_version": store.restore_version(args.version)}
    elif args.cmd == "recover":
        out = {"completed_transactions": store.recover()}
    elif args.cmd == "diff":
        changes = store.diff_versions(args.v_from, args.v_to, uri=args.uri)
        out = {"n_changes": len(changes), "changes": changes}
    elif args.cmd == "truncate-feed":
        out = {"events_removed": store.truncate_feed(args.older_than_ms)}
    elif args.cmd == "retention":
        import time as _time

        cutoff = int(_time.time() * 1000) - args.feed_keep_ms
        # order matters: truncate makes feed files superseded, compact
        # merges what remains, vacuum reclaims everything unreferenced
        out = {
            "feed_events_removed": store.truncate_feed(cutoff),
            "compacted": store.compact_appends(),
            "vacuum_removed": store.vacuum(
                grace_seconds=args.grace, keep_versions=args.keep
            ),
        }
    else:  # pragma: no cover — argparse enforces
        raise SystemExit(2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
