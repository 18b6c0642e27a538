"""Manifest (snapshot) files for LakeTable.

Layout on disk::

    <table_dir>/
      _manifests/v00000001.json     # one JSON per committed snapshot
      data/<commit-token>/_bucket=<i>/part-*.parquet

A manifest is immutable once committed. Commit protocol: write the JSON
to a temp name, then ``os.link`` it to its final ``v{N}.json`` name —
link(2) fails with EEXIST if another writer won the race, giving
optimistic-concurrency semantics with no external lock service.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field
from typing import Any

MANIFEST_DIR = "_manifests"
DATA_DIR = "data"


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
        )


def manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, MANIFEST_DIR, f"v{version:08d}.json")


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


def read_manifest(table_dir: str, version: int) -> Manifest:
    with open(manifest_path(table_dir, version)) as fh:
        return Manifest.from_json(fh.read())


def commit_manifest(table_dir: str, m: Manifest) -> None:
    """Atomically publish manifest version ``m.version``.

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
                now = max(
                    now,
                    read_manifest(table_dir, m.parent).committed_at or 0.0,
                )
            except FileNotFoundError:
                pass  # parent expired mid-flight; wall clock stands
        m.committed_at = now
    mdir = os.path.join(table_dir, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        fh.write(m.to_json())
        fh.flush()
        os.fsync(fh.fileno())
    final = manifest_path(table_dir, m.version)
    try:
        os.link(tmp, final)  # atomic create-if-absent
    finally:
        os.unlink(tmp)


def new_commit_token() -> str:
    return uuid.uuid4().hex[:16]
