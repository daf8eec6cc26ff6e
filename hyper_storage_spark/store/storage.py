"""Physical storage: hash-bucketed parquet datasets + an atomic manifest.

The reference keeps every collection in one Cassandra partition keyed by
``document_uri`` and spreads work over ``CRC32(uri) % 1024`` shard
partitions (db/scheme.cql:10, TransactionLogic.scala:26-30). Here the
same idea becomes: each logical table is N hash buckets of parquet; a
write rewrites only the touched buckets and flips ``manifest.json``
atomically (``os.replace``), so readers always see a consistent
snapshot — the same ACID role Delta's transaction log would play, with
zero dependencies.

Scale note: bucket count is configurable (default 16 for local tests,
1024 at cluster scale to mirror the reference's shard constant); Spark
reads address the bucket *files* directly, so a single-document lookup
touches exactly one bucket and collection scans parallelize across
buckets.
"""

from __future__ import annotations

# fcntl at import time, deliberately: the manifest flip lock is kernel
# flock (auto-released on holder death — no staleness heuristic to
# race on), which makes this storage layer POSIX-only. Failing here is
# clearer than a ModuleNotFoundError deep inside the first commit.
import fcntl
import json
import os
import re
import threading as _threading
import time
import uuid
import zlib
from typing import Any, Iterable, Optional

import pyarrow as pa
import pyarrow.parquet as pq


class ManifestConflict(RuntimeError):
    """The manifest version moved between a writer's read and its flip
    — another process committed concurrently. The losing writer's flip
    is REFUSED (its staged data is untouched on disk); the caller must
    re-read and re-apply, or give up. This is the cross-process fence:
    within one process the DocumentStore lock already serializes."""


def bucket_of(key: str, n_buckets: int) -> int:
    """CRC32(key) % n — the reference's partitionFromUri
    (TransactionLogic.scala:26-30) with configurable modulus."""
    return zlib.crc32(key.encode("utf-8")) % n_buckets


def _sanitize(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.\-]", "_", name)


def write_bucket_file(rows: list[dict], schema: pa.Schema, abspath: str) -> None:
    """THE bucket-file writer — every path that materializes a bucket
    (driver commits AND executor-staged streaming files) goes through
    it, so the key-sort + bounded row groups that make point-read
    row-group pruning selective hold for every bucket on disk."""
    key = [k for k in ("document_uri", "item_id") if k in schema.names]
    if key:
        rows = sorted(rows, key=lambda r: tuple(r.get(k) or "" for k in key))
    os.makedirs(os.path.dirname(abspath), exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), abspath, row_group_size=ROW_GROUP_SIZE)


# At cluster scale, size the bucket modulus like the reference's shard
# constant (1024, TransactionLogic.scala:26-30): with ≥256 buckets a
# point operation's bucket is a small fraction of the table, and the
# row-group pruning below narrows it to one row group.
CLUSTER_N_BUCKETS = 1024

# bounded row groups + key-sorted bucket files ⇒ selective min/max
# stats ⇒ point reads decode one row group
ROW_GROUP_SIZE = 8192


class Storage:
    """Versioned, bucketed parquet tables under one root directory."""

    def __init__(self, root: str, n_buckets: Optional[int] = None):
        self.root = root
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        self._manifest_path = os.path.join(root, "manifest.json")
        # the manifest's recorded modulus is AUTHORITATIVE on reopen
        # (review r12): bucket_of(uri, wrong_n) silently routes every
        # read and write to the wrong bucket — point GETs miss
        # committed items, new writes fork divergent state. None
        # (the default) adopts the recorded value; an explicit
        # mismatching value is a hard error, never a silent rebucket.
        if os.path.exists(self._manifest_path):
            recorded = int(self._read_manifest().get("n_buckets", 16))
            if n_buckets is not None and n_buckets != recorded:
                raise ValueError(
                    f"store at {root!r} was created with n_buckets="
                    f"{recorded}, reopened with {n_buckets} — the bucket "
                    "modulus is immutable for the life of a store"
                )
            self.n_buckets = recorded
        else:
            self.n_buckets = 16 if n_buckets is None else n_buckets
        # reentrant flock state for write_lock()/_cas_write_manifest —
        # per-(instance, THREAD) ownership: only the holding thread
        # re-enters via the depth counter; any other thread (e.g. a
        # Structured Streaming micro-batch thread appending the feed
        # while a user thread holds a write window on the same
        # instance) opens its OWN fd and serializes through the kernel
        # exactly like a foreign process would
        self._flock_fd: Optional[int] = None
        self._flock_depth = 0
        self._flock_owner: Optional[int] = None
        self._flock_mutex = _threading.Lock()
        if not os.path.exists(self._manifest_path):
            self._write_manifest(
                {"version": 0, "n_buckets": self.n_buckets, "tables": {}}
            )

    # -- manifest -----------------------------------------------------------

    def _read_manifest(self) -> dict:
        with open(self._manifest_path) as f:
            return json.load(f)

    # snapshot retention: every flip also writes manifests/v{N}.json,
    # enabling time-travel reads (snapshot()/DocumentStore.at_version)
    # back this many versions. Older snapshot manifests are pruned at
    # flip time; their bucket files become vacuum-reclaimable once no
    # retained manifest references them.
    SNAPSHOT_KEEP = 32

    def _snapshot_dir(self) -> str:
        return os.path.join(self.root, "manifests")

    def _write_manifest(self, manifest: dict) -> None:
        tmp = self._manifest_path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path)
        # snapshot the flipped version for time travel (same content,
        # immutable name), then prune beyond the retention window
        snapdir = self._snapshot_dir()
        os.makedirs(snapdir, exist_ok=True)
        snap = os.path.join(snapdir, f"v{manifest['version']:08d}.json")
        stmp = snap + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(stmp, "w") as f:
            json.dump(manifest, f)
        os.replace(stmp, snap)
        # NUMERIC sort (review r12): %08d pads, never truncates — past
        # version 99,999,999 a lexical sort would rank the newest
        # snapshot FIRST and prune the fresh window instead of the old
        kept = sorted(
            (n for n in os.listdir(snapdir) if n.startswith("v") and n.endswith(".json")),
            key=lambda n: int(n[1:-5]),
        )
        for name in kept[: -self.SNAPSHOT_KEEP]:
            try:
                os.remove(os.path.join(snapdir, name))
            except OSError:  # pragma: no cover — pruned by a peer
                pass

    def versions(self) -> list[int]:
        """Snapshot versions still available for time-travel reads."""
        try:
            names = os.listdir(self._snapshot_dir())
        except OSError:
            return []
        return sorted(
            int(n[1:-5]) for n in names if n.startswith("v") and n.endswith(".json")
        )

    def snapshot(self, version: int) -> "SnapshotStorage":
        """A read-only Storage view pinned to a historical manifest
        version (raises if the version was never written or aged out
        of the retention window)."""
        return SnapshotStorage(self, version)

    # how long a writer waits for the flip lock. Since r7 the lock can
    # be held across a WHOLE per-item write window (staging reads +
    # flip + completion — typically a few ms of local parquet I/O, tens
    # of ms for large batches), not just the ms-scale CAS, so the
    # timeout budgets many queued windows, and write-path callers that
    # hit it retry with backoff rather than failing outright
    LOCK_TIMEOUT_S = 10.0

    def _cas_write_manifest(self, manifest: dict, expected_version: int) -> None:
        """Compare-and-swap flip: atomically replace the manifest ONLY
        if its on-disk version still equals ``expected_version``.

        Every read-modify-write commit path routes through this, so two
        processes on one store root can no longer lose a flip: the
        second writer's commit raises :class:`ManifestConflict` instead
        of silently overwriting the first's. The check-and-rename pair
        is serialized by ``flock`` on a persistent lock file — the
        kernel releases the lock when the holder dies, so there is no
        staleness heuristic to race on (the previous mtime-based
        break had a TOCTOU: a breaker that stat'ed an old lock could
        rename away a FRESH lock a faster breaker had just re-created,
        letting two writers into the critical section)."""
        self._acquire_flock()
        try:
            current = self._read_manifest()["version"]
            if current != expected_version:
                raise ManifestConflict(
                    f"manifest version moved: expected {expected_version}, found {current}"
                )
            self._write_manifest(manifest)
        finally:
            self._release_flock()

    def _acquire_flock(self) -> None:
        """Take (or re-enter) the exclusive manifest flock.

        Reentrancy is per-(instance, thread): only the thread that
        holds the lock may re-enter via the depth counter (write_lock
        windows nest their inner CAS flips). ANY other thread — even
        on the same instance, e.g. a streaming micro-batch thread
        flipping the feed while a user thread holds a write window —
        opens its own fd and blocks in the kernel like a foreign
        process; a naive per-instance depth counter here would let it
        straight into the critical section (lost flips between
        threads of one process)."""
        me = _threading.get_ident()
        with self._flock_mutex:
            if self._flock_owner == me:
                self._flock_depth += 1
                return
        lockp = self._manifest_path + ".lock"
        deadline = time.time() + self.LOCK_TIMEOUT_S
        fd = os.open(lockp, os.O_CREAT | os.O_WRONLY)
        try:
            while True:
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    break
                except (BlockingIOError, InterruptedError):
                    # contention (EWOULDBLOCK) or a signal (EINTR):
                    # retry until the deadline. Any OTHER OSError
                    # (ENOLCK on NFS without a lock manager,
                    # EOPNOTSUPP on exotic mounts) is a real fault and
                    # must surface as itself — spinning on it and
                    # reporting "lock contention" would bury the cause
                    if time.time() > deadline:
                        raise ManifestConflict(
                            f"timed out waiting for manifest lock {lockp}"
                        )
                    time.sleep(0.002)
        except BaseException:
            os.close(fd)
            raise
        with self._flock_mutex:
            self._flock_fd = fd
            self._flock_depth = 1
            self._flock_owner = me

    def _release_flock(self) -> None:
        with self._flock_mutex:
            self._flock_depth -= 1
            if self._flock_depth == 0 and self._flock_fd is not None:
                # closing the fd releases the flock; the lock FILE
                # persists (it is the lock's identity, not its state)
                os.close(self._flock_fd)
                self._flock_fd = None
                self._flock_owner = None

    def write_lock(self):
        """Context manager holding the manifest flock across a WHOLE
        read-stage-flip window (not just the CAS) — the pessimistic
        path for writers whose staging work is cheap relative to the
        cost of losing the optimistic race. Per-item writes use this:
        under sustained multi-process contention the optimistic loser
        restarts a wide staging window against winners who only need
        the ms-scale CAS, which starves it (observed: 24 jittered
        retries exhausted with three tight-loop writers); holding the
        lock serializes the writers fairly, which is what single-
        writer-per-document semantics require anyway. Reentrant with
        _cas_write_manifest, so commits inside the block don't
        self-deadlock. Storages without a manifest (overlays) return a
        no-op."""
        import contextlib

        @contextlib.contextmanager
        def _held():
            self._acquire_flock()
            try:
                yield
            finally:
                self._release_flock()

        return _held()

    # -- reads --------------------------------------------------------------

    def bucket_rows(self, table: str, bucket: int, filters: Optional[list] = None) -> list[dict]:
        """Rows of one bucket; ``filters`` (pyarrow DNF tuples, e.g.
        ``[("document_uri", "==", uri)]``) push the predicate into the
        parquet read — row groups whose min/max stats exclude the key
        are never decoded, so a point GET reads one row group instead of
        materializing the whole bucket (commit() writes buckets sorted
        by key with bounded row groups to make the stats selective)."""
        manifest = self._read_manifest()
        rel = manifest["tables"].get(table, {}).get(str(bucket))
        if rel is None:
            return []
        rels = rel if isinstance(rel, list) else [rel]
        out: list[dict] = []
        for r in rels:
            out.extend(
                pq.read_table(os.path.join(self.root, r), filters=filters).to_pylist()
            )
        return out

    def bucket_files(self, table: str, bucket: int) -> list[str]:
        manifest = self._read_manifest()
        rel = manifest["tables"].get(table, {}).get(str(bucket))
        if rel is None:
            return []
        return [os.path.join(self.root, r) for r in (rel if isinstance(rel, list) else [rel])]

    def files(self, table: str) -> list[str]:
        manifest = self._read_manifest()
        out: list[str] = []
        for rel in manifest["tables"].get(table, {}).values():
            for r in rel if isinstance(rel, list) else [rel]:
                out.append(os.path.join(self.root, r))
        return out

    def commit_external(self, table: str, bucket_files: dict[int, list[str]]) -> int:
        """Register externally-written parquet files (e.g. a Spark bulk
        ingest) as the new content of the given buckets — one atomic
        manifest flip, same as :meth:`commit`."""
        return self.commit_external_many({table: bucket_files})

    def commit_external_many(
        self,
        table_bucket_files: dict[str, dict[int, list[str]]],
        drop_tables: Iterable[str] = (),
        meta: Optional[dict] = None,
        expected_version: Optional[int] = None,
    ) -> int:
        """Register externally-written files across MANY tables (and/or
        drop tables) in ONE atomic manifest flip — the commit point of
        the distributed write path, where executors stage bucket files
        and the driver publishes them all-or-nothing. ``meta`` entries
        ride in the same flip (e.g. the streaming batch watermark — a
        marker that must be atomic with the data it marks). Drops apply
        BEFORE registrations, so a drop-and-recreate in one commit
        keeps the recreated content.

        ``expected_version`` pins the caller's whole read-stage-flip
        window, exactly like :meth:`commit`: callers whose registered
        files embed state READ at that version (e.g. a rewritten
        full-bucket row file) pass it, and the flip refuses if ANY
        foreign flip landed since — without it this method's own
        manifest re-read would silently publish the stale rewrite over
        the foreign commit (lost update)."""
        manifest = self._read_manifest()
        if expected_version is not None and manifest["version"] != expected_version:
            raise ManifestConflict(
                f"manifest version moved since staging reads: expected "
                f"{expected_version}, found {manifest['version']}"
            )
        version = manifest["version"] + 1
        for table in drop_tables:
            manifest["tables"].pop(table, None)
        for table, bucket_files in table_bucket_files.items():
            for bucket, paths in bucket_files.items():
                rels = [os.path.relpath(p, self.root) for p in paths]
                manifest["tables"].setdefault(table, {})[str(bucket)] = rels
        if meta:
            manifest.setdefault("meta", {}).update(meta)
        manifest["version"] = version
        self._cas_write_manifest(manifest, version - 1)
        return version

    def set_meta(self, key: str, value) -> int:
        """Commit one manifest-metadata entry (its own flip)."""
        return self.commit_external_many({}, meta={key: value})

    def get_meta(self, key: str, default=None):
        return self._read_manifest().get("meta", {}).get(key, default)

    def tables(self) -> list[str]:
        return list(self._read_manifest()["tables"].keys())

    # -- writes -------------------------------------------------------------

    def current_version(self) -> Optional[int]:
        """Manifest version for optimistic-concurrency pinning; None
        for storages without one (overlays)."""
        return self._read_manifest()["version"]

    def commit(
        self,
        updates: dict[tuple[str, int], list[dict]],
        schemas: dict[str, pa.Schema],
        drop_tables: Iterable[str] = (),
        expected_version: Optional[int] = None,
        appends: Optional[dict[str, tuple[list[dict], pa.Schema]]] = None,
    ) -> int:
        """Atomically replace the given (table, bucket) datasets (and/or
        drop whole tables). One manifest flip = one commit.

        ``expected_version`` pins the WHOLE read-stage-flip window:
        callers that computed ``updates`` from reads taken at that
        version pass it, and the commit refuses if ANY flip (ours or a
        foreign process's) landed since — without it the CAS only
        guards commit's own read-to-flip gap, and a foreign flip
        between the caller's reads and this call would be silently
        overwritten by the stale full-bucket rewrite.

        ``appends`` (r7) registers append-only rows (e.g. feed events)
        in the SAME flip as the updates — atomic with them, where a
        separate :meth:`append` call would cost a second CAS round trip
        AND leave a crash window between publication and the state it
        marks. The file is written before the flip, so directory-based
        readers (the streaming file-source face) may glimpse it even if
        the flip then loses — the documented at-least-once floor for
        that face; manifest-based readers get exact atomicity."""
        manifest = self._read_manifest()
        if expected_version is not None and manifest["version"] != expected_version:
            raise ManifestConflict(
                f"manifest version moved since staging reads: expected "
                f"{expected_version}, found {manifest['version']}"
            )
        version = manifest["version"] + 1
        for table in drop_tables:  # drops first: drop-and-recreate keeps the recreate
            manifest["tables"].pop(table, None)
        for (table, bucket), rows in updates.items():
            # uuid suffix: two PROCESSES racing at the same version must
            # not write the same path — the CAS flip rejects the loser,
            # but only if the winner's file wasn't overwritten first
            rel = os.path.join(
                "data",
                _sanitize(table),
                f"b{bucket:04d}-v{version:08d}-{uuid.uuid4().hex[:6]}.parquet",
            )
            write_bucket_file(rows, schemas[table], os.path.join(self.root, rel))
            manifest["tables"].setdefault(table, {})[str(bucket)] = rel
        for table, (rows, schema) in (appends or {}).items():
            rel = os.path.join(
                "data", _sanitize(table), f"append-{uuid.uuid4().hex[:12]}.parquet"
            )
            abspath = os.path.join(self.root, rel)
            os.makedirs(os.path.dirname(abspath), exist_ok=True)
            # tmp + rename: the directory doubles as a streaming file
            # source — no reader may see a footerless parquet
            tmp = abspath + f".tmp.{uuid.uuid4().hex[:8]}"
            pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp)
            os.replace(tmp, abspath)
            manifest["tables"].setdefault(table, {})[f"a{version}"] = rel
        manifest["version"] = version
        self._cas_write_manifest(manifest, version - 1)
        return version

    # bounded CAS retry for append-only commit paths: losing the flip
    # race there never invalidates the staged content (re-reading the
    # fresh manifest and re-registering is always safe), so a legitimate
    # concurrent appender shouldn't fail. Read-modify-write commits
    # (commit / commit_external_many / replace_append_table) keep
    # fail-fast — their content was computed against the PRE-flip state
    # and replaying it could drop the winner's changes.
    APPEND_CAS_RETRIES = 8

    def append(self, table: str, rows: list[dict], schema: pa.Schema) -> int:
        """Append-only tables (e.g. the change feed): each commit adds a
        new file and never rewrites old ones — exactly the shape a
        Structured Streaming file source expects (new files = new data).

        A lost CAS race re-reads the fresh manifest and re-registers the
        already-staged file under the next version key (bounded retries)
        — two concurrent appenders both land, neither fails."""
        rel = os.path.join(
            "data", _sanitize(table), f"append-{uuid.uuid4().hex[:12]}.parquet"
        )
        abspath = os.path.join(self.root, rel)
        os.makedirs(os.path.dirname(abspath), exist_ok=True)
        # tmp + rename: append-only tables double as Structured
        # Streaming file-source dirs (the feed) — a reader listing the
        # directory mid-write would see a footerless parquet and die
        tmp = abspath + f".tmp.{uuid.uuid4().hex[:8]}"
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp)
        os.replace(tmp, abspath)
        for attempt in range(self.APPEND_CAS_RETRIES):
            manifest = self._read_manifest()
            version = manifest["version"] + 1
            manifest["tables"].setdefault(table, {})[f"a{version}"] = rel
            manifest["version"] = version
            try:
                self._cas_write_manifest(manifest, version - 1)
                return version
            except ManifestConflict:
                if attempt == self.APPEND_CAS_RETRIES - 1:
                    raise
        raise AssertionError("unreachable")  # pragma: no cover

    def compact_append_table(self, table: str) -> int:
        """Merge an append-only table's accumulated files into ONE file
        (row order preserved — append key order is publication order)
        and flip the manifest once. Returns the number of files merged
        away (0 = nothing to do).

        At streaming scale the feed/dead-letter tables grow one parquet
        per micro-batch append; listings and readers degrade with file
        count long before data size matters. Compaction bounds that.
        Superseded files stay on disk until :meth:`DocumentStore.vacuum`
        reclaims them (readers of the OLD manifest snapshot stay
        consistent meanwhile). Caveat for the streaming FACE of the
        feed (a file-source over the table directory, not the
        manifest): the compacted file is new-by-name, so a tailing
        readStream re-delivers its events — harmless under the feed's
        at-least-once contract (consumers dedup by (uri, revision)),
        but schedule compaction accordingly.

        A lost CAS race recomputes from the FRESH manifest (re-reading
        whatever append files exist then) and retries — safe because
        nothing here depends on pre-flip state; a concurrent appender's
        new file simply joins the merge or stays a later key."""
        for attempt in range(self.APPEND_CAS_RETRIES):
            manifest = self._read_manifest()
            entry = manifest["tables"].get(table, {})
            append_keys = [k for k in entry if k.startswith("a")]
            if len(append_keys) <= 1:
                return 0
            ordered = sorted(append_keys, key=lambda k: int(k[1:]))
            tables: list[pa.Table] = []
            for k in ordered:
                rel = entry[k]
                for r in rel if isinstance(rel, list) else [rel]:
                    # every append file of a table shares the schema its
                    # Storage.append writes — plain concat is exact
                    tables.append(pq.read_table(os.path.join(self.root, r)))
            merged = pa.concat_tables(tables)
            version = manifest["version"] + 1
            rel = os.path.join(
                "data", _sanitize(table), f"compact-v{version:08d}-{uuid.uuid4().hex[:6]}.parquet"
            )
            abspath = os.path.join(self.root, rel)
            os.makedirs(os.path.dirname(abspath), exist_ok=True)
            tmp = abspath + f".tmp.{uuid.uuid4().hex[:8]}"
            pq.write_table(merged, tmp, row_group_size=ROW_GROUP_SIZE)
            os.replace(tmp, abspath)
            # the merged file takes the FIRST key's slot so later appends
            # (higher a{version} keys) keep sorting after it
            new_entry = {k: v for k, v in entry.items() if k not in append_keys}
            new_entry[ordered[0]] = rel
            manifest["tables"][table] = new_entry
            manifest["version"] = version
            try:
                self._cas_write_manifest(manifest, version - 1)
                return len(append_keys)
            except ManifestConflict:
                # loser's merged file becomes an orphan; vacuum reclaims
                if attempt == self.APPEND_CAS_RETRIES - 1:
                    raise
        raise AssertionError("unreachable")  # pragma: no cover

    def replace_append_table(
        self,
        table: str,
        rows: list[dict],
        schema: pa.Schema,
        expected_version: Optional[int] = None,
    ) -> int:
        """Swap an append-only table's ENTIRE content for ``rows`` in
        one CAS flip (retention truncation; compaction's backstop).
        The new file takes an ``a{version}`` key, so later appends
        (higher versions) keep sorting after it.

        ``expected_version`` pins the flip on the manifest version the
        caller's read began at (review r12): without it, an append
        landing between the caller's table read and this flip has its
        a-key stripped here while its rows are absent from ``rows`` —
        the winner's events silently erased, exactly the lost update
        the class comment forbids for read-modify-write commits.
        Callers own the retry: re-read, recompute, re-call."""
        manifest = self._read_manifest()
        if expected_version is not None and manifest["version"] != expected_version:
            raise ManifestConflict(
                f"{table}: manifest moved to v{manifest['version']} since the "
                f"replacement was computed at v{expected_version}"
            )
        version = manifest["version"] + 1
        rel = os.path.join(
            "data", _sanitize(table), f"retain-v{version:08d}-{uuid.uuid4().hex[:6]}.parquet"
        )
        abspath = os.path.join(self.root, rel)
        os.makedirs(os.path.dirname(abspath), exist_ok=True)
        tmp = abspath + f".tmp.{uuid.uuid4().hex[:8]}"
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp, row_group_size=ROW_GROUP_SIZE)
        os.replace(tmp, abspath)
        entry = manifest["tables"].get(table, {})
        manifest["tables"][table] = {
            **{k: v for k, v in entry.items() if not k.startswith("a")},
            f"a{version}": rel,
        }
        manifest["version"] = version
        self._cas_write_manifest(manifest, version - 1)
        return version

    def all_rows(self, table: str) -> list[dict]:
        out: list[dict] = []
        for f in self.files(table):
            out.extend(pq.read_table(f).to_pylist())
        return out

    def table_dir(self, table: str) -> str:
        return os.path.join(self.root, "data", _sanitize(table))

    def spark_df(self, spark, table: str, spark_schema: str):
        """Alias of :meth:`spark_df_or_empty` (the zero-files case must
        return an empty frame, never a zero-path reader call)."""
        return self.spark_df_or_empty(spark, table, spark_schema)

    def spark_df_or_empty(self, spark, table: str, spark_schema: str):
        files = self.files(table)
        if not files:
            return spark.createDataFrame([], spark_schema)
        return spark.read.schema(spark_schema).parquet(*files)


class SnapshotStorage(Storage):
    """Read-only :class:`Storage` pinned to one historical manifest
    version — every read (bucket_rows/files/spark_df/meta) resolves
    against the frozen snapshot, so queries see the store exactly as it
    was at that flip. Writes raise. Files a snapshot references are
    protected from vacuum for as long as the snapshot is retained
    (``Storage.SNAPSHOT_KEEP`` flips)."""

    def __init__(self, base: Storage, version: int):
        # deliberately NOT calling super().__init__ — no manifest I/O
        self.root = base.root
        self.n_buckets = base.n_buckets
        self.version = version
        path = os.path.join(base._snapshot_dir(), f"v{version:08d}.json")
        try:
            with open(path) as f:
                self._pinned = json.load(f)
        except OSError:
            raise ValueError(
                f"no snapshot for version {version}: never written, or aged out "
                f"of the {Storage.SNAPSHOT_KEEP}-version retention window "
                f"(available: {base.versions()!r})"
            ) from None

    def _read_manifest(self) -> dict:
        return self._pinned

    def _write_manifest(self, manifest):
        raise RuntimeError("SnapshotStorage is read-only (time-travel view)")

    def _cas_write_manifest(self, manifest, expected_version):
        raise RuntimeError("SnapshotStorage is read-only (time-travel view)")

    # fail BEFORE staging any bucket file, not at the final flip — a
    # write attempt must not leave orphans behind the read-only facade
    def write_lock(self):
        raise RuntimeError("SnapshotStorage is read-only (time-travel view)")

    def commit(self, updates, schemas, drop_tables=(), expected_version=None, appends=None):
        raise RuntimeError("SnapshotStorage is read-only (time-travel view)")

    def commit_external_many(self, table_bucket_files, drop_tables=(), meta=None):
        raise RuntimeError("SnapshotStorage is read-only (time-travel view)")

    def append(self, table, rows, schema):
        raise RuntimeError("SnapshotStorage is read-only (time-travel view)")

    def compact_append_table(self, table):
        raise RuntimeError("SnapshotStorage is read-only (time-travel view)")

    def replace_append_table(self, table, rows, schema, expected_version=None):
        # inherited, this would stage a retain-*.parquet into the LIVE
        # data dir before failing at the CAS — an orphan written
        # through the read-only facade (review r12)
        raise RuntimeError("SnapshotStorage is read-only (time-travel view)")


class OverlayStorage(Storage):
    """Copy-on-write view over a base :class:`Storage`.

    Reads fall through to the base snapshot; commits and appends buffer
    in memory and NEVER touch the manifest. This is how an executor task
    applies a bucket's write commands through the unmodified
    DocumentStore code path (same semantics by construction): the task
    drains the overlay into staged parquet files, and the driver
    publishes every staged file with one atomic
    :meth:`Storage.commit_external_many` flip."""

    def __init__(self, base: Storage):
        # deliberately NOT calling super().__init__ — no manifest I/O
        self.base = base
        self.root = base.root
        self.n_buckets = base.n_buckets
        self.overlay: dict[tuple[str, int], list[dict]] = {}
        self.schemas: dict[str, pa.Schema] = {}
        self.appended: dict[str, list[dict]] = {}
        self.append_schemas: dict[str, pa.Schema] = {}
        self.dropped: set[str] = set()
        # every table EVER dropped in this overlay (drop-then-recreate
        # removes it from ``dropped`` but the final atomic flip must
        # still drop the base entries before registering the recreated
        # buckets, or stale base buckets outside the staged set survive)
        self.ever_dropped: set[str] = set()

    def bucket_rows(self, table: str, bucket: int, filters: Optional[list] = None) -> list[dict]:
        if table in self.dropped:
            return []
        if (table, bucket) in self.overlay:
            rows = [dict(r) for r in self.overlay[(table, bucket)]]
            if filters:
                ops = {
                    "==": lambda a, b: a == b,
                    "!=": lambda a, b: a != b,
                    "in": lambda a, b: a in b,
                    "not in": lambda a, b: a not in b,
                    ">=": lambda a, b: a is not None and a >= b,
                    "<=": lambda a, b: a is not None and a <= b,
                    ">": lambda a, b: a is not None and a > b,
                    "<": lambda a, b: a is not None and a < b,
                }
                for col, op, val in filters:
                    rows = [r for r in rows if ops[op](r.get(col), val)]
            return rows
        return self.base.bucket_rows(table, bucket, filters)

    def bucket_files(self, table: str, bucket: int) -> list[str]:
        """Overlaid/dropped buckets live as in-memory rows, not files —
        report none so callers sizing a Spark-vs-driver decision (e.g.
        create_index's footer row count) take the driver path, which
        reads through the overlay-aware :meth:`bucket_rows`."""
        if table in self.dropped or (table, bucket) in self.overlay:
            return []
        return self.base.bucket_files(table, bucket)

    def current_version(self):
        # overlays buffer in memory with no manifest — version pinning
        # is meaningless here (the driver's final flip carries the CAS)
        return None

    def write_lock(self):
        # no manifest, no cross-process writers: nothing to lock
        import contextlib

        return contextlib.nullcontext()

    def commit(self, updates, schemas, drop_tables=(), expected_version=None, appends=None):
        for t in drop_tables:
            self.dropped.add(t)
            self.ever_dropped.add(t)
            self.overlay = {k: v for k, v in self.overlay.items() if k[0] != t}
        for key, rows in updates.items():
            self.overlay[key] = [dict(r) for r in rows]
            self.dropped.discard(key[0])  # a re-created table is live again
        self.schemas.update(schemas)
        for table, (rows, schema) in (appends or {}).items():
            self.appended.setdefault(table, []).extend(dict(r) for r in rows)
            self.append_schemas[table] = schema
        return 0

    def append(self, table: str, rows: list[dict], schema: pa.Schema):
        self.appended.setdefault(table, []).extend(dict(r) for r in rows)
        self.append_schemas[table] = schema
        return 0

    def _write_manifest(self, manifest):  # pragma: no cover - guard
        raise RuntimeError("OverlayStorage never writes the manifest")
