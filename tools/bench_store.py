"""Store-operation benchmark — the measurement the reference's
perftest sketches but never runs (BenchmarkTest.scala:43 exits before
its insert/measure section; see BASELINE.md).

Times the library-mode write path (sequential puts — the deliberately
serialized single-writer path), merge-patches, point GETs, indexed and
residual collection queries, and the paged fetch loop, then prints ONE
JSON line. The bulk path (ingest_collection) is timed separately: it
is the scale path and should dominate sequential puts by orders of
magnitude.

Usage: python tools/bench_store.py [n_items]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200

    from pyspark.sql import functions as F

    from hyper_storage_spark.plans import SortBy, SortItem
    from hyper_storage_spark.session import get_spark
    from hyper_storage_spark.store import DocumentStore

    spark = get_spark("bench_store")
    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # -- sequential per-item writes (the serialized operational path) --
    store = DocumentStore(tempfile.mkdtemp(prefix="bench_store_"), spark=spark)

    def puts():
        for i in range(n):
            store.put(f"bench~/{i:06d}", {"a": i % 50, "s": f"v{i % 7}", "b": i})

    timed(f"put_{n}_items", puts)

    # -- concurrent per-item writes (group commit coalesces queued ops
    # into one staged flip per leader pass; r7) --
    import threading

    gstore = DocumentStore(tempfile.mkdtemp(prefix="bench_gc_"), spark=spark)
    n_threads = 16
    per_thread = max(n // 8, 25)

    def gc_worker(t):
        for i in range(per_thread):
            if i % 5 == 4:
                gstore.patch(f"gc~/{t:02d}-{i - 1:05d}", {"p": i})
            else:
                gstore.put(f"gc~/{t:02d}-{i:05d}", {"a": i, "t": t})

    def concurrent_mixed():
        ts = [threading.Thread(target=gc_worker, args=(t,)) for t in range(n_threads)]
        for x in ts:
            x.start()
        for x in ts:
            x.join()

    n_conc = n_threads * per_thread
    timed(f"concurrent_mixed_{n_conc}_ops", concurrent_mixed)

    # -- explicit batch API: one staged flip for the whole list --
    bstore = DocumentStore(tempfile.mkdtemp(prefix="bench_wb_"), spark=spark)

    def batched_puts():
        bstore.write_batch(
            [("put", f"wb~/{i:06d}", {"a": i % 50, "b": i}) for i in range(n)]
        )

    timed(f"write_batch_{n}_items", batched_puts)

    def patches():
        for i in range(0, n, 4):
            store.patch(f"bench~/{i:06d}", {"a": (i + 1) % 50})

    timed(f"patch_{n // 4}_items", patches)

    def gets():
        for i in range(0, n, 2):
            store.get(f"bench~/{i:06d}")

    timed(f"get_{n // 2}_points", gets)

    timed(
        "index_build_sorted",
        lambda: store.create_index("bench~", "by_a", [SortItem("a", "decimal", "asc")], None),
    )
    timed(
        "index_build_filtered",
        lambda: store.create_index("bench~", "big_a", [], "a > 25"),
    )

    def queries():
        for _ in range(10):
            store.query("bench~", filter="a > 25", sort=[SortBy("a")], size=50)

    timed("query_indexed_x10", queries)

    def residual():
        for _ in range(10):
            store.query("bench~", filter='s = "v3"', size=50)

    timed("query_residual_x10", residual)

    timed("query_paged", lambda: store.query_paged("bench~", filter="a > 10", size=25))

    # -- template-index lazy instantiation --
    # register a template matching a FRESH collection, then time the
    # first write (pays template match + create_index + backfill of the
    # one existing... nothing yet — instantiation happens before the
    # first item lands) vs the memoized steady state
    store.create_index_template("tmpl/*~", "by_b", [SortItem("b", "decimal", "desc")], None)

    def template_first_write():
        store.put("tmpl/one~/000001", {"b": 1})

    timed("template_instantiate_first_write", template_first_write)

    def template_steady_writes():
        for i in range(2, 2 + max(n // 4, 1)):
            store.put(f"tmpl/one~/{i:06d}", {"b": i})

    timed(f"template_steady_{max(n // 4, 1)}_writes", template_steady_writes)
    # instantiation on an ALREADY-POPULATED collection (query-triggered
    # lazy path: template registered after the data → backfill runs)
    store.create_index_template("bench*~", "by_b_late", [SortItem("b", "decimal", "asc")], None)
    timed(
        "template_backfill_on_query",
        lambda: store.query("bench~", filter="b > 10", sort=[SortBy("b")], size=10),
    )

    # -- time-travel reads (round 6): snapshot-pinned point GETs --
    pinned = store.storage._read_manifest()["version"]
    store.put("bench~/000000", {"a": -1})  # move history past the pin
    snap = store.at_version(pinned)

    def tt_gets():
        for i in range(0, n, 4):
            snap.get(f"bench~/{i:06d}")

    timed(f"time_travel_get_{n // 4}_points", tt_gets)

    # -- bulk ingest (the scale path) --
    bulk = DocumentStore(tempfile.mkdtemp(prefix="bench_bulk_"), spark=spark)
    rows = spark.range(n * 50).select(
        F.col("id").alias("doc_id"),
        F.lpad(F.col("id").cast("string"), 10, "0").alias("item"),
        (F.col("id") % 50).alias("a"),
        F.concat(F.lit("v"), (F.col("id") % 7).cast("string")).alias("s"),
    )
    timed(
        f"bulk_ingest_{n * 50}_items",
        lambda: bulk.ingest_collection(rows, "bulk~", "item"),
    )

    # bulk merge (round 6): refresh half the ingested items in place
    refresh = rows.filter((F.col("doc_id") % 2) == 0).withColumn("a", F.col("a") + 1)
    timed(
        f"bulk_merge_{n * 25}_items",
        lambda: bulk.merge_collection(refresh, "bulk~", "item"),
    )

    puts_per_sec = round(n / max(timings[f"put_{n}_items"], 1e-9), 1)
    conc_per_sec = round(n_conc / max(timings[f"concurrent_mixed_{n_conc}_ops"], 1e-9), 1)
    batch_per_sec = round(n / max(timings[f"write_batch_{n}_items"], 1e-9), 1)
    bulk_per_sec = round((n * 50) / max(timings[f"bulk_ingest_{n * 50}_items"], 1e-9), 1)
    print(
        json.dumps(
            {
                "metric": "store_ops",
                "n_items": n,
                "puts_per_sec": puts_per_sec,
                "concurrent_ops_per_sec": conc_per_sec,
                "write_batch_items_per_sec": batch_per_sec,
                "bulk_items_per_sec": bulk_per_sec,
                "timings": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
