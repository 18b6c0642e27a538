"""Multi-table atomic catalog: one named, versioned PIN SET over many
lake tables, so readers get a CONSISTENT cross-table snapshot even
while writers advance the member tables independently.

Why it exists: a transcript table and its derived tables (aggregate
view, signature index, vector index, mirror) each have their own
snapshot history and their own exactly-once ledger — but a consumer
joining two of them (a training job reading transcripts + the vector
index; a dashboard joining the table and its rollup) must not see
table@new with index@old. Single-table engines punt here (Delta and
Iceberg have no multi-table transactions; Nessie/arctic catalogs exist
exactly for this). The catalog solves it the same way the tables
solve single-table atomicity: an immutable versioned manifest
published by atomic create-if-absent, so a catalog commit is all-or-
nothing and concurrent catalog commits lose cleanly with
``FileExistsError`` (retry by re-pinning current heads).

A pin is (table path, version) — metadata only, O(#tables) bytes.
Reading through the catalog is ``table.read(version=pin)``, which is
time travel: zero extra I/O versus a direct read. Pinned versions are
also protected from ``expire_snapshots`` when callers pass
``protected_versions()`` (the same contract tags use).

≙ the reference's single routing config steering many destinations at
once (OrchestratorConfigs.kt:14-33): one versioned control-plane
document, many data-plane surfaces, swapped atomically.
"""

from __future__ import annotations

import json
import os
import re
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from dexspark.lake import manifest as mf
from dexspark.lake.table import LakeTable

CATALOG_RE = re.compile(r"^cat_v(\d{9})\.json$")


def _cat_path(cat_dir: str, version: int) -> str:
    return os.path.join(cat_dir, f"cat_v{version:09d}.json")


class Catalog:
    """A directory of immutable ``cat_v*.json`` pin sets."""

    def __init__(self, spark: SparkSession, cat_dir: str):
        self.spark = spark
        self.cat_dir = cat_dir

    # -- versions ----------------------------------------------------
    def versions(self) -> list[int]:
        if not os.path.isdir(self.cat_dir):
            return []
        out = []
        for n in os.listdir(self.cat_dir):
            m = CATALOG_RE.match(n)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def current_version(self) -> int:
        v = self.versions()
        if not v:
            raise ValueError(f"empty catalog at {self.cat_dir}")
        return v[-1]

    def pins(self, version: int | None = None) -> dict[str, dict[str, Any]]:
        """{name: {"path": ..., "version": ...}} at a catalog version."""
        v = self.current_version() if version is None else version
        with open(_cat_path(self.cat_dir, v)) as fh:
            return json.load(fh)["tables"]

    # -- commits -----------------------------------------------------
    @classmethod
    def create(
        cls, spark: SparkSession, cat_dir: str, tables: dict[str, LakeTable]
    ) -> "Catalog":
        """Pin every table at its CURRENT version as catalog v0."""
        cat = cls(spark, cat_dir)
        if cat.versions():
            raise ValueError(f"catalog already exists at {cat_dir}")
        cat._publish(
            0,
            {
                name: {"path": t.table_dir, "version": t.current_version()}
                for name, t in tables.items()
            },
        )
        return cat

    def _publish(self, version: int, tables: dict[str, dict[str, Any]]) -> None:
        os.makedirs(self.cat_dir, exist_ok=True)
        tmp = os.path.join(self.cat_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump({"version": version, "tables": tables}, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            # create-if-absent via the active CommitStore
            from dexspark.lake.commitstore import get_store

            get_store().publish(tmp, _cat_path(self.cat_dir, version))
        finally:
            os.unlink(tmp)

    def commit(self, updates: dict[str, int | None]) -> int:
        """Atomically publish a new pin set: ``updates`` maps member
        name -> new table version (None = that table's current head).
        Unmentioned members carry their existing pin. All-or-nothing:
        a reader sees either every update or none. Raises
        FileExistsError if another catalog commit won the version —
        re-read and retry (the writers' table commits are unaffected;
        only the pin-set publish is being raced)."""
        base = self.current_version()
        pins = self.pins(base)
        unknown = set(updates) - set(pins)
        if unknown:
            raise ValueError(f"not catalog members: {sorted(unknown)}")
        for name, v in updates.items():
            t = LakeTable(self.spark, pins[name]["path"])
            v = t.current_version() if v is None else v
            if v not in mf.available_versions(t.meta_dir):
                raise ValueError(f"{name}: version {v} not available")
            pins[name] = {"path": pins[name]["path"], "version": v}
        self._publish(base + 1, pins)
        return base + 1

    # -- reads -------------------------------------------------------
    def table(self, name: str, version: int | None = None) -> LakeTable:
        pins = self.pins(version)
        if name not in pins:
            raise ValueError(f"no table {name!r} in catalog")
        return LakeTable(self.spark, pins[name]["path"])

    def read(self, name: str, version: int | None = None, **kw) -> DataFrame:
        """Read a member AT ITS PIN — the consistent-snapshot read.
        ``version`` selects a catalog version (time travel over the
        pin-set history); kwargs pass through to ``LakeTable.read``
        (columns=, filters=, ...)."""
        pins = self.pins(version)
        if name not in pins:
            raise ValueError(f"no table {name!r} in catalog")
        t = LakeTable(self.spark, pins[name]["path"])
        return t.read(version=pins[name]["version"], **kw)

    def commit_with_retry(
        self, updates: dict[str, int | None], attempts: int = 5
    ) -> int:
        """``commit`` with optimistic retry: on a lost publish race,
        re-read the head pin set and re-pin (None updates re-resolve to
        the members' CURRENT heads, so the retried commit is still
        internally consistent). Raises after ``attempts`` losses."""
        last: FileExistsError | None = None
        for _ in range(attempts):
            try:
                return self.commit(updates)
            except FileExistsError as e:
                last = e
        raise last  # type: ignore[misc]

    def expire(self, keep_last: int = 100) -> list[int]:
        """Drop old pin-set files (streaming pins accumulate one per
        trigger). Keeps the newest ``keep_last``; member-table
        snapshots those dropped pins protected become expirable on the
        next ``expire_snapshots(keep_versions=protected_versions(...))``
        — retention order is catalog first, tables second."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        vs = self.versions()
        dropped = vs[:-keep_last]
        for v in dropped:
            os.remove(_cat_path(self.cat_dir, v))
        return dropped

    def protected_versions(self, table_name: str) -> set[int]:
        """Every version of a member any retained catalog version still
        pins — pass to ``expire_snapshots(keep_versions=...)`` so a
        consumer reading through an old catalog pin never loses its
        snapshot."""
        out = set()
        for v in self.versions():
            pins = self.pins(v)
            if table_name in pins:
                out.add(pins[table_name]["version"])
        return out


class CatalogPinSpec:
    """Rides ``CdcStreamReplay(views=[...])`` so every applied
    micro-batch ends with ONE atomic pin-set commit covering the
    ingest table and the derived tables the same trigger just
    refreshed. Place it LAST in the views list — subscribers run in
    order, so by the time the pin publishes, the view/index/export
    refreshes for this trigger are durable and the pin set names a
    mutually consistent family. A reader resolving through the catalog
    then gets trigger-aligned state even while the stream keeps
    committing. No-ops (nothing moved since the last pin) publish
    nothing."""

    def __init__(self, catalog: Catalog, members: list[str]):
        self.catalog = catalog
        self.members = list(members)

    def refresh(self, src: LakeTable) -> dict[str, Any] | None:
        base = self.catalog.current_version()
        pins = self.catalog.pins(base)
        moved = any(
            LakeTable(self.catalog.spark, pins[m]["path"]).current_version()
            != pins[m]["version"]
            for m in self.members
        )
        if not moved:
            return None
        v = self.catalog.commit_with_retry({m: None for m in self.members})
        return {"operation": "catalog_pin", "catalog_version": v}
