"""Manifest (snapshot) files for LakeTable.

Layout on disk::

    <table_dir>/
      _manifests/v00000001.json     # one JSON (root) per snapshot
      _manifests/segments/seg-<sha1>.json   # format-2 file-list shards
      data/<commit-token>/_bucket=<i>/part-*.parquet

A manifest is immutable once committed. Commit protocol: write the JSON
to a temp name, then publish it to its final ``v{N}.json`` name via the
active CommitStore (lake/commitstore.py) — create-if-absent, raising
FileExistsError if another writer won the race, giving
optimistic-concurrency semantics. The default store is POSIX link(2)
(no external lock service); ``DEXSPARK_COMMIT_STORE=catalog`` selects
the object-store protocol (staged PUT + external-CAS pointer swap) for
deployments without atomic create-if-absent.

Format 2 — segmented file lists (≙ Iceberg's manifest-list → manifest
indirection): a snapshot of a 100 TB table references ~10^6 data
files, and a streaming ingest commits every few seconds — inlining the
full file list (format 1) makes every commit serialize and fsync
O(table) JSON for an O(batch) change. Once a snapshot crosses
``SEGMENT_THRESHOLD`` files, the commit instead writes one
CONTENT-ADDRESSED shard per bucket (``seg-<sha1-of-content>.json``)
and the root stores only ``{bucket: shard}`` pointers: a merge that
touched 5 of 1024 buckets writes 5 small shards + a ~50 KB root, and
every untouched bucket's shard is REUSED by pointer — the link(2)
create-if-absent makes identical content from any writer converge on
one file, so reuse needs no coordination and no knowledge of the
parent. Readers materialize ``files`` transparently; everything above
this module sees the same ``Manifest``. Shards unreferenced by any
retained root (expired history, losers of commit races) are swept by
``gc_segments`` with an mtime grace for in-flight commits (shards land
before their root link). Format 1 stays the small-table fast path and
remains fully readable.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid
from dataclasses import dataclass, field
from typing import Any

from dexspark.lake import commitstore

MANIFEST_DIR = "_manifests"
SEGMENT_DIR = "segments"  # under MANIFEST_DIR
DATA_DIR = "data"

# inline the file list below this many files (format 1: one readable
# JSON, no indirection); segment per bucket at or above it. Module
# level so tests/benches can tune it; the env var lets a deployment
# (or a bench) force either format without code changes.
SEGMENT_THRESHOLD = int(os.environ.get("DEXSPARK_SEGMENT_THRESHOLD", "512"))


@dataclass
class DataFile:
    path: str  # relative to table root
    bucket: int
    schema_id: int
    # "base" = fully-merged rows (COW output, appends, compaction);
    # "delta" = merge-on-read change file — one pre-deduped row per key
    # per batch, resolved against base at read time by max applied-LSN.
    # Absent in pre-MOR manifests → parsed as "base" (format-compatible).
    kind: str = "base"
    # per-column [min, max] from the parquet footer (see lake/stats.py);
    # {} in pre-stats manifests → file is never pruned (format-compatible)
    stats: dict[str, list] = field(default_factory=dict)
    # True when a <path>.bloom sidecar holds a key bloom filter over the
    # file's bucket-key values (see lake/bloom.py); False / absent in
    # pre-bloom manifests → file is never key-pruned (format-compatible)
    bloom: bool = False
    # deletion vector: relative path of a parquet DIRECTORY holding
    # (path, pos) rows — row positions of THIS file physically deleted
    # without rewriting it (lake/dv.py; ≙ Delta deletion vectors /
    # Iceberg positional deletes). None / absent → no deleted
    # positions (format-compatible). ``dv_count`` = number of deleted
    # positions recorded for this file (read planning + metrics).
    dv: str | None = None
    dv_count: int = 0
    # columns with SECONDARY bloom sidecars (<path>.<col>.bloom, see
    # build_blooms) — named by the table-current column name at build
    # time; [] / absent in older manifests (format-compatible)
    bloom_cols: list[str] = field(default_factory=list)
    # physical row count from the parquet footer (includes tombstones
    # and DV-hidden rows); -1 in pre-upgrade manifests = unknown.
    # Powers metadata-only count_rows() and maintenance policy.
    rows: int = -1
    # the bucket count this file was WRITTEN under — ``bucket`` is
    # pmod(xxhash64(key), layout). Equal to the manifest's
    # ``num_buckets`` for every file until an ``evolve_layout()``
    # (metadata-only layout evolution, ≙ Iceberg partition-spec
    # evolution) leaves old files behind under their old layout; from
    # then on readers interpret each file's bucket id under the
    # file's OWN layout (lake/layout.py). -1 / absent in pre-upgrade
    # manifests → normalized to the manifest's num_buckets at load
    # (format-compatible: a table that never evolved has one layout).
    layout: int = -1

    def to_json(self) -> dict[str, Any]:
        d = {"path": self.path, "bucket": self.bucket, "schema_id": self.schema_id}
        if self.kind != "base":
            d["kind"] = self.kind
        if self.stats:
            d["stats"] = self.stats
        if self.bloom:
            d["bloom"] = True
        if self.dv is not None:
            d["dv"] = self.dv
            d["dv_count"] = self.dv_count
        if self.rows >= 0:
            d["rows"] = self.rows
        if self.bloom_cols:
            d["bloom_cols"] = self.bloom_cols
        if self.layout >= 0:
            d["layout"] = self.layout
        return d

    @staticmethod
    def from_json(d: dict[str, Any]) -> "DataFile":
        return DataFile(
            path=d["path"],
            bucket=int(d["bucket"]),
            schema_id=int(d["schema_id"]),
            kind=d.get("kind", "base"),
            stats=d.get("stats", {}),
            bloom=bool(d.get("bloom", False)),
            dv=d.get("dv"),
            dv_count=int(d.get("dv_count", 0)),
            rows=int(d.get("rows", -1)),
            bloom_cols=list(d.get("bloom_cols", [])),
            layout=int(d.get("layout", -1)),
        )


@dataclass
class Manifest:
    version: int
    current_schema_id: int
    schemas: dict[int, str]  # schema_id -> Spark StructType json string
    bucket_key: str
    num_buckets: int
    files: list[DataFile] = field(default_factory=list)
    summary: dict[str, Any] = field(default_factory=dict)
    parent: int | None = None
    properties: dict[str, str] = field(default_factory=dict)
    # commit wall time, epoch seconds UTC; monotone non-decreasing
    # along the version chain (the committer clamps to the parent's
    # time, so driver clock steps backwards cannot reorder history).
    # None in pre-upgrade manifests → invisible to as-of-timestamp
    # resolution (read(as_of=...)), never mis-resolved.
    committed_at: float | None = None
    # schema_id -> {column name -> stable field id} (≙ Iceberg field
    # ids): reads align old files to the current schema BY ID, so
    # RENAME is metadata-only (same id, new name) and DROP cannot be
    # resurrected by a later same-name ADD (fresh id). {} in
    # pre-upgrade manifests → by-name alignment, exactly the previous
    # behavior (format-compatible).
    field_ids: dict[int, dict[str, int]] = field(default_factory=dict)
    # runtime-only (never serialized): bucket -> shard name this
    # manifest's file list was read from (format 2). commit_manifest
    # uses it to reuse an untouched bucket's shard WITHOUT
    # re-serializing or re-hashing it — the carried-over DataFile
    # objects are identity-equal to the base manifest's, so an `is`
    # sweep proves the bucket unchanged in O(files) pointer compares.
    segment_names: dict[int, str] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "format_version": 1,
                "version": self.version,
                "current_schema_id": self.current_schema_id,
                "schemas": {str(k): v for k, v in self.schemas.items()},
                "bucket_key": self.bucket_key,
                "num_buckets": self.num_buckets,
                "files": [f.to_json() for f in self.files],
                "summary": self.summary,
                "parent": self.parent,
                "properties": self.properties,
                **(
                    {"committed_at": self.committed_at}
                    if self.committed_at is not None
                    else {}
                ),
                **(
                    {
                        "field_ids": {
                            str(k): v for k, v in self.field_ids.items()
                        }
                    }
                    if self.field_ids
                    else {}
                ),
            },
            indent=1,
        )

    def _normalize_layouts(self) -> "Manifest":
        """Fill pre-upgrade entries' implicit layout: a file written
        before per-file layouts existed was bucketed under its
        manifest's (single) num_buckets. Runs at parse time on fresh
        objects, before the read cache shares them."""
        for f in self.files:
            if f.layout < 0:
                f.layout = self.num_buckets
        return self

    @staticmethod
    def from_json(s: str) -> "Manifest":
        d = json.loads(s)
        return Manifest(
            version=int(d["version"]),
            current_schema_id=int(d["current_schema_id"]),
            schemas={int(k): v for k, v in d["schemas"].items()},
            bucket_key=d["bucket_key"],
            num_buckets=int(d["num_buckets"]),
            files=[DataFile.from_json(f) for f in d["files"]],
            summary=d.get("summary", {}),
            parent=d.get("parent"),
            properties=d.get("properties", {}),
            committed_at=d.get("committed_at"),
            field_ids={
                int(k): {n: int(i) for n, i in v.items()}
                for k, v in d.get("field_ids", {}).items()
            },
        )._normalize_layouts()


def manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, MANIFEST_DIR, f"v{version:08d}.json")


def segment_dir(table_dir: str) -> str:
    return os.path.join(table_dir, MANIFEST_DIR, SEGMENT_DIR)


def _segment_content(files: list[DataFile]) -> bytes:
    """Canonical shard bytes: entries sorted by path, compact JSON —
    byte-identical content from any writer hashes to the same name."""
    return json.dumps(
        [f.to_json() for f in sorted(files, key=lambda f: f.path)],
        separators=(",", ":"),
        sort_keys=True,
    ).encode()


def _write_segment(table_dir: str, content: bytes) -> str:
    """Publish one content-addressed shard; returns its file name.
    Idempotent: an existing shard with this content is reused as-is
    (same bytes by construction — sha1 names the content). Publish
    protocol delegated to the active CommitStore (lake/commitstore.py)."""
    name = f"seg-{hashlib.sha1(content).hexdigest()}.json"
    final = os.path.join(segment_dir(table_dir), name)
    commitstore.get_store().publish_content(content, final)
    return name


def _root_dict(m: Manifest) -> dict[str, Any]:
    """Manifest fields minus the file list (shared by both formats)."""
    return {
        "version": m.version,
        "current_schema_id": m.current_schema_id,
        "schemas": {str(k): v for k, v in m.schemas.items()},
        "bucket_key": m.bucket_key,
        "num_buckets": m.num_buckets,
        "summary": m.summary,
        "parent": m.parent,
        "properties": m.properties,
        **(
            {"committed_at": m.committed_at}
            if m.committed_at is not None
            else {}
        ),
        **(
            {"field_ids": {str(k): v for k, v in m.field_ids.items()}}
            if m.field_ids
            else {}
        ),
    }


def root_segment_names(table_dir: str, version: int) -> list[str]:
    """Shard names a committed root references ([] for format 1) —
    the unit create_branch hard-links and gc_segments retains."""
    with open(manifest_path(table_dir, version)) as fh:
        d = json.load(fh)
    return sorted(set(d.get("segments", {}).values()))


def gc_segments(
    table_dir: str, grace_seconds: float = 3600.0
) -> list[str]:
    """Remove shards referenced by NO root in this manifest dir.

    ``grace_seconds`` protects in-flight commits (shards are published
    BEFORE their root link lands) — only shards whose mtime is older
    than the grace are removed. Branch dirs are independent: their
    shard entries are hard links, so removing main's directory entry
    never breaks a branch reader. Returns removed names."""
    import time as _time

    sdir = segment_dir(table_dir)
    if not os.path.isdir(sdir):
        return []
    referenced: set[str] = set()
    for v in available_versions(table_dir):
        try:
            referenced.update(root_segment_names(table_dir, v))
        except FileNotFoundError:
            continue  # expired between listing and read
    cutoff = _time.time() - grace_seconds
    removed = []
    for name in os.listdir(sdir):
        if not name.startswith("seg-") or name in referenced:
            continue
        p = os.path.join(sdir, name)
        try:
            if os.path.getmtime(p) < cutoff:
                os.remove(p)
                removed.append(name)
        except FileNotFoundError:
            continue
    return removed


def latest_version(table_dir: str) -> int | None:
    mdir = os.path.join(table_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return None
    versions = [
        int(f[1:-5])
        for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json") and f[1:-5].isdigit()
    ]
    return max(versions) if versions else None


def available_versions(table_dir: str) -> list[int]:
    """Sorted committed versions still on disk (gaps appear after
    expire_snapshots)."""
    mdir = os.path.join(table_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    return sorted(
        int(f[1:-5])
        for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json") and f[1:-5].isdigit()
    )


# (dir, version) -> (root stat signature, parsed Manifest). Committed
# manifests are IMMUTABLE (write-once via link(2)), so a parsed object
# can be served forever; the stat signature is a belt-and-braces guard
# and the stat doubles as the existence check (an expired version must
# keep raising FileNotFoundError). Callers treat Manifest objects as
# immutable — every mutation site in the engine copies first (verified;
# keep it that way: the cache shares one object among all readers).
# Bounded FIFO: at 10^6 files a Manifest is ~hundreds of MB of Python
# objects, so only a handful are kept.
_READ_CACHE: dict[tuple[str, int], tuple[tuple[int, int], Manifest]] = {}
_READ_CACHE_MAX = 8


# root-only reads for metadata walks (ledger, lineage, watermarks):
# a format-2 root is a few KB however many files the snapshot holds,
# so walking the whole retained history stays O(versions), never
# O(versions × files). Roots are immutable → cached like manifests.
_ROOT_CACHE: dict[tuple[str, int], tuple[tuple[int, int], dict]] = {}
_ROOT_CACHE_MAX = 512


def read_root(table_dir: str, version: int) -> dict:
    """The manifest's root JSON as a dict — summary/parent/version/
    properties WITHOUT materializing the file list (format-2 shards
    are not read; a format-1 root inlines its files, which is fine:
    format 1 exists only below SEGMENT_THRESHOLD)."""
    key = (os.path.abspath(table_dir), version)
    st = os.stat(manifest_path(table_dir, version))  # FileNotFoundError
    sig = (st.st_mtime_ns, st.st_size)
    hit = _ROOT_CACHE.get(key)
    if hit is not None and hit[0] == sig:
        return hit[1]
    with open(manifest_path(table_dir, version)) as fh:
        d = json.load(fh)
    while len(_ROOT_CACHE) >= _ROOT_CACHE_MAX:
        try:
            _ROOT_CACHE.pop(next(iter(_ROOT_CACHE)), None)
        except (StopIteration, RuntimeError):
            break
    _ROOT_CACHE[key] = (sig, d)
    return d


def read_manifest(table_dir: str, version: int) -> Manifest:
    key = (os.path.abspath(table_dir), version)
    st = os.stat(manifest_path(table_dir, version))  # FileNotFoundError
    sig = (st.st_mtime_ns, st.st_size)
    hit = _READ_CACHE.get(key)
    if hit is not None and hit[0] == sig:
        return hit[1]
    with open(manifest_path(table_dir, version)) as fh:
        s = fh.read()
    d = json.loads(s)
    if "segments" not in d:
        m = Manifest.from_json(s)
    else:
        # format 2: materialize the file list from the per-bucket
        # shards (deterministic order: bucket, then path)
        files: list[DataFile] = []
        sdir = segment_dir(table_dir)
        for bucket in sorted(d["segments"], key=int):
            with open(os.path.join(sdir, d["segments"][bucket])) as fh:
                files.extend(DataFile.from_json(e) for e in json.load(fh))
        d["files"] = []
        m = Manifest.from_json(json.dumps(d))
        m.files = files
        m._normalize_layouts()  # shard entries may predate per-file layouts
        m.segment_names = {int(b): n for b, n in d["segments"].items()}
    while len(_READ_CACHE) >= _READ_CACHE_MAX:
        try:  # concurrent writers may race the eviction — best effort
            _READ_CACHE.pop(next(iter(_READ_CACHE)), None)
        except (StopIteration, RuntimeError):
            break
    _READ_CACHE[key] = (sig, m)
    return m


def commit_manifest(
    table_dir: str, m: Manifest, base: Manifest | None = None
) -> None:
    """Atomically publish manifest version ``m.version``.

    ``base``: the manifest the commit was computed FROM (same dir).
    When both are format 2, buckets whose file lists carry over the
    base's DataFile objects unchanged reuse the base's shard names
    outright — the steady-state commit then serializes and hashes only
    the touched buckets, making commit CPU as well as commit I/O
    O(changed buckets), not O(table files).

    Stamps ``committed_at`` (epoch UTC) here — the one chokepoint
    every commit path funnels through — clamped to the parent's stamp
    so the chain stays monotone even if the driver clock steps
    backwards (as-of-timestamp resolution depends on monotonicity; the
    VERSION remains the authority on order, the timestamp is an
    index into it).

    Raises FileExistsError on a lost optimistic-concurrency race.
    """
    if m.committed_at is None:
        import time as _time

        now = _time.time()
        if m.parent is not None:
            try:
                # root-only read: the clamp needs one scalar, not the
                # parent's (possibly 10^6-entry) file list
                with open(manifest_path(table_dir, m.parent)) as fh:
                    now = max(now, json.load(fh).get("committed_at") or 0.0)
            except FileNotFoundError:
                pass  # parent expired mid-flight; wall clock stands
        m.committed_at = now
    mdir = os.path.join(table_dir, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    if len(m.files) >= SEGMENT_THRESHOLD:
        # format 2: per-bucket content-addressed shards; an unchanged
        # bucket's shard already exists and costs one stat(2)
        by_bucket: dict[int, list[DataFile]] = {}
        for f in m.files:
            by_bucket.setdefault(f.bucket, []).append(f)
        base_by_bucket: dict[int, list[DataFile]] = {}
        if base is not None and base.segment_names:
            for f in base.files:
                base_by_bucket.setdefault(f.bucket, []).append(f)
        sdir = segment_dir(table_dir)

        def shard(b: int, fs: list[DataFile]) -> str:
            memo = base.segment_names.get(b) if base is not None else None
            if memo is not None:
                bfs = base_by_bucket.get(b, [])
                if (
                    len(bfs) == len(fs)
                    and all(a is c for a, c in zip(bfs, fs))
                    and os.path.exists(os.path.join(sdir, memo))
                ):
                    return memo
            return _write_segment(table_dir, _segment_content(fs))

        segs = {str(b): shard(b, fs) for b, fs in by_bucket.items()}
        m.segment_names = {b: segs[str(b)] for b in by_bucket}
        body = json.dumps(
            {
                "format_version": 2,
                **_root_dict(m),
                "segments": segs,
                "file_count": len(m.files),
            },
            indent=1,
        )
    else:
        body = m.to_json()
    tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        fh.write(body)
        fh.flush()
        os.fsync(fh.fileno())
    final = manifest_path(table_dir, m.version)
    try:
        # atomic create-if-absent via the active CommitStore — POSIX
        # link(2) by default, catalog-swap CAS for object stores
        commitstore.get_store().publish(tmp, final)
    finally:
        os.unlink(tmp)
    # seed the read cache: the committer (a streaming loop) is about to
    # re-read its own head — serve the object it already holds
    st = os.stat(final)
    while len(_READ_CACHE) >= _READ_CACHE_MAX:
        try:  # concurrent writers may race the eviction — best effort
            _READ_CACHE.pop(next(iter(_READ_CACHE)), None)
        except (StopIteration, RuntimeError):
            break
    _READ_CACHE[(os.path.abspath(table_dir), m.version)] = (
        (st.st_mtime_ns, st.st_size),
        m,
    )


def new_commit_token() -> str:
    return uuid.uuid4().hex[:16]
