"""Multi-writer chaos soak for the document store: N OS processes ×
M threads of mixed put / patch / delete / write_batch / vacuum /
compact / recover against ONE store root, with a SIGKILL loop that
murders and respawns random workers mid-write — then a full invariant
sweep over the survivor state.

Invariants asserted (not eyeballed), after a closing recover():

  1. GAPLESS REVISIONS — per collection, the distinct feed revisions
     form exactly 1..R where R is the static's revision counter: no
     write ever lost a number, no number was double-assigned to
     different flips (the flock-serialized CAS contract).
  2. FEED/REVISION PARITY — every live content row's (item, revision)
     has a published feed event; max feed revision == static revision
     == max content revision.
  3. LOG LOWER BOUND — every op a worker fsync-logged as successful is
     present in the feed at its returned revision (kills may leave
     EXTRA committed-but-unlogged ops — at-least-once — never missing
     ones).
  4. ZERO ORPHANS — every manifest-referenced file exists on disk; no
     incomplete WAL transactions survive recovery; a closing vacuum
     removes only unreferenced files and the state re-reads intact.

Usage: python tools/soak.py [--procs 4] [--threads 3] [--seconds 45]
       [--kill-every 4] [--root DIR]
Prints one JSON line with op counts and invariant results; exit 0 iff
all invariants hold. Used by tests/test_store.py's marked-slow soak.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKER = r"""
import json, os, random, sys, threading, time
sys.path.insert(0, sys.argv[5])
from hyper_storage_spark.store import DocumentStore

root, wid, seconds, threads = sys.argv[1], int(sys.argv[2]), float(sys.argv[3]), int(sys.argv[4])
store = DocumentStore(root)
log = open(os.path.join(root, f"_soak_log_{wid}_{os.getpid()}.jsonl"), "a")
loglock = threading.Lock()
COLLS = ["soak_a~", "soak_b~", "soak_c~"]
ITEMS = [f"i{n:02d}" for n in range(24)]
stop = time.time() + seconds

def record(op, path, rev):
    with loglock:
        log.write(json.dumps({"op": op, "path": path, "rev": rev}) + "\n")
        log.flush()
        os.fsync(log.fileno())

def body(rng):
    return {"a": rng.randint(0, 99), "b": f"w{rng.randint(0, 9)}", "n": rng.random()}

def writer(tid):
    rng = random.Random(hash((wid, tid, os.getpid())) & 0xFFFF)
    while time.time() < stop:
        coll, item = rng.choice(COLLS), rng.choice(ITEMS)
        path = f"{coll}/{item}"
        roll = rng.random()
        try:
            if roll < 0.5:
                _, rev = store.put(path, body(rng))
                record("put", path, rev)
            elif roll < 0.7:
                _, rev = store.patch(path, {"a": rng.randint(100, 199)})
                record("patch", path, rev)
            elif roll < 0.8:
                rev = store.delete(path)
                record("delete", path, rev)
            else:
                ops = [("put", f"{coll}/{i}", body(rng)) for i in rng.sample(ITEMS, 3)]
                for (m, p, _), out in zip(ops, store.write_batch(ops)):
                    if isinstance(out, tuple):
                        record("put", p, out[1])
        except KeyError:
            pass  # patch/delete of a not-yet-created item
        except Exception as e:
            # UNEXPECTED: the write path retries conflicts internally,
            # so anything surfacing here is a real failure — record it
            # (a swallowed exception would let a store that fails most
            # writes pass the soak trivially)
            record("exception", path, f"{type(e).__name__}: {e}"[:200])

def maintenance():
    rng = random.Random(wid * 7919)
    while time.time() < stop:
        time.sleep(rng.uniform(0.5, 1.5))
        try:
            op = rng.choice(["vacuum", "compact", "recover"])
            if op == "vacuum":
                store.vacuum(grace_seconds=0.5)
            elif op == "compact":
                store.compact_appends()
            else:
                store.recover()
        except Exception:
            pass  # maintenance may race a concurrent flip; writers own correctness

ts = [threading.Thread(target=writer, args=(t,)) for t in range(threads)]
ts.append(threading.Thread(target=maintenance))
for t in ts:
    t.start()
for t in ts:
    t.join()
print("worker done", wid)
"""


def run_soak(root: str, procs: int, threads: int, seconds: int, kill_every: float) -> dict:
    from hyper_storage_spark.store import DocumentStore
    from hyper_storage_spark.store.documents import CONTENT, FEED, STATICS

    DocumentStore(root)  # init manifest
    rng = random.Random(4242)

    def spawn(wid: int):
        return subprocess.Popen(
            [sys.executable, "-c", WORKER, root, str(wid), str(seconds), str(threads),
             os.path.dirname(os.path.dirname(os.path.abspath(__file__)))],
            stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
        )

    workers = {w: spawn(w) for w in range(procs)}
    deadline = time.time() + seconds
    kills = 0
    while time.time() < deadline - 2:
        time.sleep(kill_every)
        w = rng.choice(list(workers))
        p = workers[w]
        if p.poll() is None:
            p.send_signal(signal.SIGKILL)  # mid-write, no cleanup
            p.wait()
            kills += 1
            workers[w] = spawn(w)  # respawn: fresh process, same root
    errs = []
    for w, p in workers.items():
        try:
            _, err = p.communicate(timeout=seconds + 60)
            if p.returncode not in (0, -9) and err:
                errs.append(err.decode()[:300])
        except subprocess.TimeoutExpired:
            p.kill()
            errs.append(f"worker {w} hung")

    # ---- invariant sweep on a FRESH handle ------------------------------
    store = DocumentStore(root)
    redriven = store.recover(scan_all=True)
    failures: list[str] = []

    statics = {r["document_uri"]: r for r in store.storage.all_rows(STATICS)
               if r["document_uri"].startswith("soak_")}
    feed = [r for r in store.storage.all_rows(FEED) if r["document_uri"].startswith("soak_")]
    content = [r for r in store.storage.all_rows(CONTENT)
               if r["document_uri"].startswith("soak_") and r["item_id"]]

    ops_logged = 0
    op_exceptions: list[dict] = []
    logged: dict[str, list[dict]] = {}
    for fname in os.listdir(root):
        if fname.startswith("_soak_log_"):
            for line in open(os.path.join(root, fname)):
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue  # torn final line from a SIGKILL — expected
                if e["op"] == "exception":
                    op_exceptions.append(e)
                    continue
                coll = e["path"].rsplit("/", 1)[0]
                logged.setdefault(coll, []).append(e)
                ops_logged += 1

    for uri, s in statics.items():
        r_max = s["revision"]
        feed_revs = sorted({f["revision"] for f in feed if f["document_uri"] == uri})
        # 1. gapless: distinct feed revisions are exactly 1..R
        if feed_revs != list(range(1, r_max + 1)):
            missing = sorted(set(range(1, r_max + 1)) - set(feed_revs))[:10]
            extra = sorted(set(feed_revs) - set(range(1, r_max + 1)))[:10]
            failures.append(f"{uri}: feed revisions not gapless 1..{r_max} "
                            f"(missing {missing}, extra {extra})")
        # 2. parity: every live content row's write is published
        feed_pairs = {(f["item_id"], f["revision"]) for f in feed if f["document_uri"] == uri}
        for c in content:
            if c["document_uri"] != uri or c["is_deleted"]:
                continue
            if (c["item_id"], c["revision"]) not in feed_pairs:
                failures.append(f"{uri}/{c['item_id']}: content rev {c['revision']} unpublished")
        c_max = max((c["revision"] for c in content if c["document_uri"] == uri), default=0)
        if c_max > r_max:
            failures.append(f"{uri}: content rev {c_max} beyond static {r_max}")
        # 3. log lower bound
        for e in logged.get(uri, []):
            item = e["path"].rsplit("/", 1)[1]
            if (item, e["rev"]) not in feed_pairs:
                failures.append(f"logged {e['op']} {e['path']} rev {e['rev']} missing from feed")

    # 4a. no dangling manifest references
    manifest = store.storage._read_manifest()
    for table, buckets in manifest["tables"].items():
        for rel in buckets.values():
            if not os.path.exists(os.path.join(root, rel)):
                failures.append(f"manifest references missing file {rel}")
    # 4b. WAL drained
    from hyper_storage_spark.store.documents import TRANSACTIONS

    incomplete = [t for t in store.storage.all_rows(TRANSACTIONS) if not t["completed_at"]]
    if incomplete:
        failures.append(f"{len(incomplete)} incomplete transactions survive recovery")
    # 4c. closing vacuum keeps state readable
    before = {(c["document_uri"], c["item_id"], c["revision"]) for c in content}
    removed = store.vacuum(grace_seconds=0.0, keep_versions=0)
    after = {
        (c["document_uri"], c["item_id"], c["revision"])
        for c in store.storage.all_rows(CONTENT)
        if c["document_uri"].startswith("soak_") and c["item_id"]
    }
    if before != after:
        failures.append("vacuum changed live state")

    return {
        "procs": procs, "threads": threads, "seconds": seconds, "kills": kills,
        "ops_logged": ops_logged,
        "revisions": {u: s["revision"] for u, s in statics.items()},
        "recovered_on_close": redriven,
        "vacuum_removed": removed,
        "worker_errors": errs,
        "op_exceptions": op_exceptions[:20],
        "n_op_exceptions": len(op_exceptions),
        "failures": failures,
        "ok": not failures and not errs and not op_exceptions,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=4)
    ap.add_argument("--threads", type=int, default=3)
    ap.add_argument("--seconds", type=int, default=45)
    ap.add_argument("--kill-every", type=float, default=4.0)
    ap.add_argument("--root", default=None)
    args = ap.parse_args()
    root = args.root or tempfile.mkdtemp(prefix="soak_")
    out = run_soak(root, args.procs, args.threads, args.seconds, args.kill_every)
    print(json.dumps(out))
    sys.exit(0 if out["ok"] else 1)


if __name__ == "__main__":
    main()
