"""Outbound CDC export: publish a table's change feed to a directory
of file segments an EXTERNAL system can consume (parquet or JSON
lines), with exactly-once segment semantics.

This closes the last edge of the CDC hub: log → table (ingest),
table → table (mirror), and now table → log (export) — the engine's
analogue of the reference's outbound routing: every staged write is
published to per-destination topics for systems that are not this
engine (≙ eventgridsystemtopic/dex-rs-file-ingested/
template.json:48-106; the routed copy in FnRouter.kt:97-118 delivers
to destination containers exactly once per upload id).

Design:

- One SEGMENT per catch-up, named by the head version it reaches
  (``seg_<version>``), containing the composed diff
  last-exported→head: payload columns + ``op`` (I/U/D; D carries the
  deleted row's last image) + ``lsn`` (the head version — monotone, so
  consumers replaying segments in lsn order get the same commutative
  exactly-once guarantees the engine's own merges do).
- The commit point is ``_export_ledger.json``, replaced atomically
  (write-tmp + rename) AFTER the segment data is fully written. A
  consumer reads only ledger-listed segments, so a producer crash
  mid-write leaves at worst an orphan directory the next run
  overwrites (same head) or ignores — never a torn segment in the
  feed. Re-running the exporter with nothing new is a no-op.
- If the last exported version has been expired off the source
  (retention passed the exporter), the exporter does NOT silently skip
  the gap: it emits a ``snapshot`` segment (full state as I rows) and
  marks it in the ledger; ``read_export`` starts at the latest
  snapshot segment so consumers see a well-defined reset instead of
  divergence — the same self-healing contract as ``mirror_table``.

Scale shape: incremental segments are built by ``table_changes``
(bucket-pruned snapshot diff — I/O is O(changed data), not O(table));
the write is one narrow pass over the diff. Nothing here collects to
the driver.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

from dexspark.lake import manifest as mf
from dexspark.lake.changes import (
    _default_keys,
    _ensure_covers,
    snapshot_diff,
    table_changes,
)
from dexspark.lake.table import LakeTable

LEDGER_NAME = "_export_ledger.json"
FORMATS = ("parquet", "json")


def _ledger_path(out_dir: str) -> str:
    return os.path.join(out_dir, LEDGER_NAME)


def read_ledger(out_dir: str) -> list[dict]:
    """Committed segments, in export (= lsn) order."""
    p = _ledger_path(out_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f)["segments"]


def _commit_ledger(out_dir: str, segments: list[dict]) -> None:
    tmp = _ledger_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"segments": segments}, f, indent=1)
    os.replace(tmp, _ledger_path(out_dir))


def export_changes(
    table: LakeTable,
    out_dir: str,
    fmt: str = "parquet",
    key_cols: list[str] | None = None,
) -> dict[str, Any] | None:
    """Export everything that changed since the last export as one new
    segment. Returns the ledger entry, or None if already at head.
    Call repeatedly — it resumes from the ledger.

    Concurrency contract: ONE producer per export directory (the same
    single-writer contract a streaming sink's checkpoint has — run it
    from the ingest job via ``ExportSpec`` or one scheduled CLI job).
    Two producers racing the same directory can interleave writes into
    the same segment path; the TABLE's own commits are never at risk,
    but the feed directory is the producer's artifact."""
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}, got {fmt!r}")
    os.makedirs(out_dir, exist_ok=True)
    key_cols = _default_keys(table, key_cols)
    versions = mf.available_versions(table.meta_dir)
    if not versions:
        return None
    head = versions[-1]
    segments = read_ledger(out_dir)
    last = max((s["to_version"] for s in segments), default=None)
    if last is not None and last >= head:
        return None

    is_create = table.manifest(versions[0]).summary.get("operation") == "create"
    if last is not None and last in versions:
        feed, mode, frm = (
            table_changes(table, last, head, key_cols=key_cols),
            "incremental",
            last,
        )
    elif last is None and is_create:
        feed, mode, frm = (
            table_changes(table, versions[0], head, key_cols=key_cols),
            "incremental",
            versions[0],
        )
    else:
        # retention gap (or a fresh export dir against expired
        # history): well-defined reset, never silent divergence.
        feed, mode, frm = (
            table.read(version=head).withColumn("op", F.lit("I")),
            "snapshot",
            None,
        )

    out = feed.withColumn("lsn", F.lit(head).cast("long"))
    seg_name = f"seg_{head:09d}"
    path = os.path.join(out_dir, seg_name)
    writer = out.write.mode("overwrite")
    if fmt == "parquet":
        writer.parquet(path)
    else:
        writer.json(path)
    entry = {
        "segment": seg_name,
        "from_version": frm,
        "to_version": head,
        "mode": mode,
        "format": fmt,
        "key_cols": key_cols,
        # JSON loses types on read; the recorded Spark schema restores
        # them exactly (timestamps included) for any Spark consumer.
        "spark_schema": json.loads(out.schema.json()),
    }
    _commit_ledger(out_dir, segments + [entry])
    return entry


def _read_segment(spark: SparkSession, out_dir: str, s: dict) -> DataFrame:
    schema = StructType.fromJson(s["spark_schema"])
    path = os.path.join(out_dir, s["segment"])
    if s["format"] == "parquet":
        return spark.read.schema(schema).parquet(path)
    return spark.read.schema(schema).json(path)


def read_export(
    spark: SparkSession, out_dir: str, since_version: int | None = None
) -> DataFrame | None:
    """Read the exported feed back as one DataFrame (ledger-listed
    segments only — orphans from producer crashes are invisible).
    Starts at the most recent ``snapshot`` segment (a reset discards
    everything before it); ``since_version`` further restricts to
    segments with to_version > since_version (a consumer's own
    watermark). Schemas are aligned across segments
    (unionByName(allowMissingColumns) — additive evolution mid-feed
    reads back with nulls for pre-evolution segments). None if
    nothing to read."""
    segments = read_ledger(out_dir)
    snaps = [i for i, s in enumerate(segments) if s["mode"] == "snapshot"]
    if snaps:
        segments = segments[snaps[-1] :]
    if since_version is not None:
        segments = [s for s in segments if s["to_version"] > since_version]
    if not segments:
        return None
    parts = [_read_segment(spark, out_dir, s) for s in segments]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p, allowMissingColumns=True)
    return df


class ExportSpec:
    """Subscription wrapper: rides ``CdcStreamReplay(views=[...])`` (the
    duck-typed ``refresh(src) -> info | None`` protocol views and
    derived indexes use) so the export directory catches up after every
    applied micro-batch — downstream consumers see new segments within
    one trigger of the table. Resumable and exactly-once off the export
    ledger like every other subscriber; a mid-stream no-op (maintenance
    -only source version) returns None and is not recorded."""

    def __init__(
        self, out_dir: str, fmt: str = "parquet", key_cols: list[str] | None = None
    ):
        self.out_dir = out_dir
        self.fmt = fmt
        self.key_cols = key_cols

    def refresh(self, src: LakeTable) -> dict[str, Any] | None:
        info = export_changes(
            src, self.out_dir, fmt=self.fmt, key_cols=self.key_cols
        )
        if info is not None:
            info = {"operation": "export_changes", **info}
        return info


def replay_export(
    spark: SparkSession,
    out_dir: str,
    dst: LakeTable,
    key_cols: list[str] | None = None,
) -> list[dict]:
    """Apply an exported feed to a destination LakeTable — what an
    external Spark consumer does with the segments; also the loopback
    that proves the export is a complete change stream. One merge per
    unconsumed segment in ledger order, segment lsn as the merge LSN,
    ``export-v<to_version>`` as the batch id in dst's ledger
    (exactly-once across consumer crashes; re-runs no-op)."""
    segments = read_ledger(out_dir)
    snaps = [i for i, s in enumerate(segments) if s["mode"] == "snapshot"]
    if snaps:
        segments = segments[snaps[-1] :]
    done = {str(i) for i in dst.committed_batch_ids()}
    results = []
    for s in segments:
        batch_id = f"export-v{s['to_version']}"
        if batch_id in done:
            continue
        seg = _read_segment(spark, out_dir, s)
        keys = key_cols or s.get("key_cols") or None
        if keys is None:
            raise ValueError("no key columns recorded or provided")
        payload = [c for c in seg.columns if c not in ("op", "lsn")]
        _ensure_covers(dst, seg.drop("op", "lsn").schema)
        if s["mode"] == "snapshot":
            # a reset segment only carries the live state; rows the
            # consumer has that the snapshot lacks must be DELETED,
            # so sync via a dst-vs-snapshot diff instead of a blind
            # upsert merge.
            feed = snapshot_diff(
                dst.read().select(*payload),
                seg.select(*payload),
                keys,
                payload,
            ).withColumn("lsn", F.lit(s["to_version"]).cast("long"))
        else:
            feed = seg
        info = dst.merge(
            feed,
            key_cols=keys,
            summary={"batch_id": batch_id, "export_version": s["to_version"]},
        )
        results.append(info)
    return results
