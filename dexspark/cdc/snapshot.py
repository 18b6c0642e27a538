"""Snapshot-derived CDC: ingest periodic FULL snapshots from a source
that cannot emit a change log, by diffing each snapshot against the
table's current state into I/U/D events and replaying those through
the normal validate → dedup → merge pipeline (DLT's ``APPLY CHANGES
FROM SNAPSHOT``).

≙ the reference's actual wire format: DEX ingests whole FILE DROPS
(blob-created events routed per RouteIngestedFile.kt:44-66), not
deltas — every upstream delivery is a complete artifact and deriving
"what changed" is the consumer's problem. Here that derivation is a
first-class operator: the delta between two keyed states is computed
once, declaratively, and everything downstream (validation, quarantine,
constraints, lineage, exactly-once ledger, COW/MOR merge, schema
evolution) is the SAME code path the binlog tail uses.

Semantics:

- Each snapshot carries a caller-assigned ``snapshot_lsn`` — its
  position in the feed's total order (export watermark, vendor file
  sequence, epoch). Every derived event gets that LSN, so the merge's
  strict-LSN gate gives the convergence rules for free:
  * snapshots applied in order: each key lands on its latest image;
  * a key ABSENT from a newer snapshot becomes a D tombstone;
  * a later binlog tail (lsn > snapshot_lsn) composes normally —
    snapshot bootstrap and incremental tail are the same table state.
- Snapshots must be presented in FEED ORDER (the DLT contract): each
  ``apply_snapshot`` records its watermark in the commit summary and a
  snapshot at-or-below the last applied watermark is REFUSED. The LSN
  gate alone cannot make stale snapshots safe — a derived INSERT for a
  key the table has never seen (created later, or deleted later with
  the tombstone since compacted away) has nothing to lose the gate
  against and would resurrect state the feed already superseded
  (pinned by test).
- Unchanged rows are dropped by a null-safe struct compare BEFORE
  anything wide happens (lake/changes.py::snapshot_diff), so the merge
  is O(changed rows) even though the diff read is O(table) — the
  irreducible cost of snapshot-shaped sources.
- Validation applies to the derived events like any batch: an invalid
  NEW image is quarantined and the key keeps its previous image
  (deletes are exempt per the standard contract).
- Exactly-once on ``batch_id`` (default ``snapshot-<lsn>``): a
  redelivered snapshot file skips before the diff is even planned.
- ONE consumer per feed: deliveries are applied sequentially (the
  drop-zone loop is serial by construction). The guards make
  REDELIVERY safe, not concurrent ingestion of two different
  deliveries — a diff computed before a sibling delivery lands would
  miss deriving deletes for the keys that sibling added. Run one
  catch-up loop per table, like any CDC tail.

Scale shape: one full-outer join of two bucket-read states per
snapshot (both sides hash-partition on the key; the table side is
already bucketed), one optional map-combined uniqueness count on the
snapshot, then the standard merge over changed keys only. No UDF, no
driver-side rows.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import DataFrame, functions as F

from dexspark.cdc.apply import apply_changes
from dexspark.cdc.validate import ValidationConfig
from dexspark.lake.changes import snapshot_diff
from dexspark.lake.table import LakeTable

SUMMARY_KEY = "snapshot_lsn"


def delivered_columns(spark, path: str, fmt: str = "parquet") -> list[str]:
    """Columns ACTUALLY present in a delivery, independent of any read
    schema the consumer imposes: parquet is self-describing (footer
    schema, no data read); JSON lines are schema-inferred (one extra
    pass over the delivery — snapshot-sized, the same order as the
    diff's O(table) read, and the price of a wire format that carries
    no schema).

    Exists because a schema-imposed read NULL-fills absent columns, so
    ``snapshot_changes``'s partial-snapshot refusal — which compares
    the *DataFrame's* columns — would never fire, and the derived U
    events would silently wipe that column table-wide: exactly the
    corruption the guard promises to refuse loudly."""
    if fmt == "parquet":
        return [f.name for f in spark.read.parquet(path).schema.fields]
    return [f.name for f in spark.read.json(path).schema.fields]


def refuse_partial_delivery(
    present: Iterable[str], required: Iterable[str], path: str
) -> None:
    """Refuse a delivery whose on-wire columns do not cover the table
    payload (see ``delivered_columns``). ``required`` is the TABLE's
    payload — not the read schema — so a delivery that predates a
    table column is caught even when the consumer's configured schema
    matches the delivery."""
    present = set(present)
    missing = [c for c in required if c not in present]
    if missing:
        raise ValueError(
            f"snapshot delivery {path!r} lacks table columns {missing}: "
            "a schema-imposed read would NULL-fill them and the derived "
            "U events would wipe the column on every changed row — fix "
            "the producer, or drop the columns from the table first"
        )


def last_snapshot_lsn(table: LakeTable) -> int | None:
    """Watermark of the latest applied snapshot on the live lineage
    (rollbacks rewind it with everything else) — a root-only metadata
    walk, O(retained versions) small reads."""
    best = None
    for _v, summary in table.live_summaries():
        v = summary.get(SUMMARY_KEY)
        if v is not None and (best is None or int(v) > best):
            best = int(v)
    return best


def snapshot_changes(
    table: LakeTable,
    snapshot: DataFrame,
    snapshot_lsn: int,
    key_cols: Iterable[str],
    op_col: str = "op",
    lsn_col: str = "lsn",
    current: DataFrame | None = None,
) -> DataFrame:
    """Diff ``snapshot`` (the source's complete state at
    ``snapshot_lsn``) against the table's CURRENT live state into
    I/U/D change events, every event stamped ``lsn = snapshot_lsn``.

    The snapshot's columns define the payload. It must cover the
    table's current payload schema (a snapshot silently missing a
    column would rewrite that column to NULL on every changed row —
    refused loudly instead); EXTRA snapshot columns are additive
    schema evolution and flow through ``apply_changes`` as usual, with
    the diff treating the table's missing column as NULL (so rows that
    only gained the new column re-emit as U — correct: their image
    changed).

    ``current`` overrides the state diffed against (default
    ``table.read()``) — the SCD2 wrapper passes the history's open
    versions."""
    key_cols = list(key_cols)
    payload = list(snapshot.columns)
    for c in (op_col, lsn_col):
        if c in payload:
            raise ValueError(
                f"snapshot must not carry the reserved CDC column {c!r} "
                "— it is a state, not a change log"
            )
    missing_keys = [k for k in key_cols if k not in payload]
    if missing_keys:
        raise ValueError(f"snapshot lacks key columns {missing_keys}")

    old = table.read() if current is None else current
    not_covered = [c for c in old.columns if c not in payload]
    if not_covered:
        raise ValueError(
            f"snapshot does not cover table columns {not_covered}: a "
            "partial snapshot would overwrite them with NULL on every "
            "changed row — project the table's full payload into the "
            "snapshot (or drop the columns first)"
        )
    # align the table side UP to the snapshot's shape: columns the
    # table does not have yet read NULL; narrower types widen (the
    # same by-name+cast rule _align applies on the write side)
    snap_fields = {f.name: f for f in snapshot.schema.fields}
    old_aligned = old.select(
        *[
            (
                F.col(c).cast(snap_fields[c].dataType)
                if c in old.columns
                else F.lit(None).cast(snap_fields[c].dataType)
            ).alias(c)
            for c in payload
        ]
    )
    ev = snapshot_diff(old_aligned, snapshot, key_cols, payload, op_col=op_col)
    return ev.withColumn(lsn_col, F.lit(int(snapshot_lsn)).cast("long"))


def apply_snapshot(
    table: LakeTable,
    snapshot: DataFrame,
    snapshot_lsn: int,
    batch_id: str | None = None,
    key_cols: Iterable[str] | None = None,
    cfg: ValidationConfig | None = None,
    quarantine: LakeTable | None = None,
    strategy: str = "cow",
    check_unique: bool = True,
) -> dict[str, Any]:
    """Ingest one full snapshot: derive its change events against the
    table's current state and apply them as one exactly-once batch.

    ``check_unique`` (default on) spends one map-combined count shuffle
    proving the snapshot has one row per key — a duplicated key would
    row-multiply the diff join and corrupt the derived events; disable
    only for producers that guarantee keyed uniqueness upstream.
    Returns the ``apply_changes`` result dict (``skipped`` on
    redelivery, before any diff work is planned)."""
    cfg = cfg or ValidationConfig()
    key_cols = list(key_cols or cfg.key_cols)
    if batch_id is None:
        batch_id = f"snapshot-{int(snapshot_lsn)}"
    if batch_id in table.committed_batch_ids():
        return {
            "batch_id": batch_id,
            "skipped": True,
            "reason": "already_committed",
        }
    prev = last_snapshot_lsn(table)
    if prev is not None and int(snapshot_lsn) <= prev:
        raise ValueError(
            f"out-of-order snapshot: lsn {snapshot_lsn} <= last applied "
            f"snapshot watermark {prev} — snapshots must be presented "
            "in feed order (a stale snapshot's derived inserts would "
            "resurrect superseded keys)"
        )
    if check_unique:
        dup = (
            snapshot.groupBy(*key_cols)
            .count()
            .filter(F.col("count") > 1)
            .select(*key_cols)
            .first()
        )
        if dup is not None:
            raise ValueError(
                f"snapshot has multiple rows for key {tuple(dup)} — a "
                "snapshot is a state with one row per key (pass "
                "check_unique=False only if uniqueness is guaranteed "
                "upstream)"
            )
    events = snapshot_changes(
        table,
        snapshot,
        snapshot_lsn,
        key_cols,
        op_col=cfg.op_col,
        lsn_col=cfg.lsn_col,
    )
    res = apply_changes(
        table,
        events,
        batch_id=batch_id,
        cfg=cfg,
        quarantine=quarantine,
        strategy=strategy,
        extra_summary={SUMMARY_KEY: int(snapshot_lsn)},
    )
    res["snapshot_lsn"] = int(snapshot_lsn)
    return res


def _read_delivery(
    table: LakeTable, path: str, fmt: str, scd2: bool
) -> DataFrame:
    """Read one drop-zone delivery. Parquet is self-describing: a
    delivery carrying NEW columns keeps them (schema evolution flows
    through apply_snapshot) and one MISSING a column trips
    snapshot_changes's guard. JSON is read under the table's payload
    schema, which NULL-fills absent columns and would sail past the
    partial-snapshot refusal — so the wire schema is checked first
    (inference pass; see delivered_columns)."""
    if fmt == "parquet":
        return table.spark.read.parquet(path)
    json_schema = table.schema()
    if scd2:
        from pyspark.sql.types import StructType as _St

        from dexspark.cdc.scd2 import SCD2_COLS

        json_schema = _St(
            [f for f in json_schema.fields if f.name not in SCD2_COLS]
        )
    refuse_partial_delivery(
        delivered_columns(table.spark, path, fmt="json"),
        [f.name for f in json_schema.fields],
        path,
    )
    return table.spark.read.schema(json_schema).json(path)


def ingest_snapshot_feed(
    table: LakeTable,
    feed_dir: str,
    fmt: str = "parquet",
    cfg: ValidationConfig | None = None,
    quarantine: LakeTable | None = None,
    strategy: str = "cow",
    scd2: bool = False,
) -> list[dict[str, Any]]:
    """Catch up on a DIRECTORY of delivered snapshots — the poll loop a
    snapshot-shaped source actually needs (≙ the reference's
    blob-container drop zone, RouteIngestedFile.kt:44-52: producers
    land whole artifacts in a bucket; the consumer discovers and
    processes them in order).

    Layout: ``<feed_dir>/snapshot-<lsn>/`` — one parquet (or JSON
    lines) dataset per delivery, the directory name carrying the feed
    position. Deliveries at-or-below the table's last applied snapshot
    watermark are skipped (already superseded); the rest apply in lsn
    order via ``apply_snapshot``, each exactly-once, so the loop is
    crash-safe: re-running after a failure resumes at the first
    unapplied delivery. Returns one result dict per applied snapshot.

    Listing is driver-side O(deliveries) directory names — never data;
    a malformed entry name is an error (a typo'd delivery silently
    skipped would diverge the mirror forever).

    ``scd2=True`` materializes the feed as a FULL SCD2 history via
    ``apply_snapshot_scd2`` (``table`` must have been created with
    ``scd2_schema``; JSON deliveries are read under the PAYLOAD schema
    — the history columns are engine-owned)."""
    import os as _os
    import re as _re

    cfg = cfg or ValidationConfig()
    entries = []
    for name in _os.listdir(feed_dir):
        if name.startswith((".", "_")):
            continue  # in-flight producer temp / metadata
        g = _re.fullmatch(r"snapshot-(\d+)", name)
        if not g:
            raise ValueError(
                f"unrecognized feed entry {name!r} in {feed_dir} "
                "(expected snapshot-<lsn>)"
            )
        entries.append((int(g.group(1)), _os.path.join(feed_dir, name)))
    entries.sort()
    done = last_snapshot_lsn(table)
    results = []
    for lsn, path in entries:
        if done is not None and lsn <= done:
            continue
        snap = _read_delivery(table, path, fmt, scd2)
        if scd2:
            results.append(
                apply_snapshot_scd2(
                    table, snap, lsn, cfg=cfg, quarantine=quarantine
                )
            )
        else:
            results.append(
                apply_snapshot(
                    table, snap, lsn,
                    cfg=cfg, quarantine=quarantine, strategy=strategy,
                )
            )
    return results


def apply_snapshot_scd2(
    history: LakeTable,
    snapshot: DataFrame,
    snapshot_lsn: int,
    batch_id: str | None = None,
    key_cols: Iterable[str] | None = None,
    cfg: ValidationConfig | None = None,
    quarantine: LakeTable | None = None,
    check_unique: bool = True,
) -> dict[str, Any]:
    """SCD Type-2 history from a snapshot feed (DLT's ``APPLY CHANGES
    FROM SNAPSHOT ... STORED AS SCD TYPE 2``): diff the delivered
    snapshot against the history's OPEN versions and replay the
    derived I/U/D events through ``apply_changes_scd2`` — each
    snapshot becomes one exactly-once batch whose watermark LSN opens
    and closes validity intervals, so the history records EVERY image
    the feed ever delivered with ``[delivered_at, replaced_at)``
    interval semantics at snapshot cadence (the finest granularity a
    snapshot-shaped source can support).

    Same contracts as ``apply_snapshot``: feed order enforced via the
    watermark in the commit summary, keyed uniqueness checked, partial
    snapshots refused, unchanged rows never touch the merge. A key
    absent from a delivery closes its open version with
    ``closed_by_delete``; reappearing later opens a fresh version."""
    from dexspark.cdc.scd2 import SCD2_COLS, apply_changes_scd2, scd2_view

    cfg = cfg or ValidationConfig()
    key_cols = list(key_cols or cfg.key_cols)
    if batch_id is None:
        batch_id = f"snapshot-{int(snapshot_lsn)}"
    if batch_id in history.committed_batch_ids():
        return {
            "batch_id": batch_id,
            "skipped": True,
            "reason": "already_committed",
        }
    prev = last_snapshot_lsn(history)
    if prev is not None and int(snapshot_lsn) <= prev:
        raise ValueError(
            f"out-of-order snapshot: lsn {snapshot_lsn} <= last applied "
            f"snapshot watermark {prev} — snapshots must be presented "
            "in feed order"
        )
    if check_unique:
        dup = (
            snapshot.groupBy(*key_cols)
            .count()
            .filter(F.col("count") > 1)
            .select(*key_cols)
            .first()
        )
        if dup is not None:
            raise ValueError(
                f"snapshot has multiple rows for key {tuple(dup)}"
            )
    payload = [
        f.name for f in history.schema().fields if f.name not in SCD2_COLS
    ]
    current = (
        scd2_view(history.read())
        .filter(F.col("is_current"))
        .select(*payload)
    )
    events = snapshot_changes(
        history,
        snapshot,
        snapshot_lsn,
        key_cols,
        op_col=cfg.op_col,
        lsn_col=cfg.lsn_col,
        current=current,
    )
    res = apply_changes_scd2(
        history,
        events,
        batch_id=batch_id,
        cfg=cfg,
        quarantine=quarantine,
        extra_summary={SUMMARY_KEY: int(snapshot_lsn)},
    )
    res["snapshot_lsn"] = int(snapshot_lsn)
    return res


READY_DIR = "_ready"


def publish_delivery(feed_dir: str, snapshot_lsn: int) -> str:
    """Producer-side publish marker: after the ``snapshot-<lsn>/``
    dataset fully lands, drop an atomic one-line JSON marker in
    ``<feed_dir>/_ready/`` — the streaming consumer discovers
    DELIVERIES (not data files), so a half-written dataset is never
    picked up. ≙ the reference's blob-created EVENT following the blob
    itself (RouteIngestedFile.kt:15-20: the trigger fires on the
    completed artifact, not on bytes in flight) — and Spark's own
    ``_SUCCESS`` convention, made content-bearing so the file stream
    has a row to deliver. Idempotent: re-publishing a marker is a
    no-op (content-addressed by lsn)."""
    import json as _json
    import os as _os
    import uuid as _uuid

    rdir = _os.path.join(feed_dir, READY_DIR)
    _os.makedirs(rdir, exist_ok=True)
    final = _os.path.join(rdir, f"snapshot-{int(snapshot_lsn)}.json")
    if _os.path.exists(final):
        return final
    tmp = _os.path.join(rdir, f".tmp-{_uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        fh.write(_json.dumps({"lsn": int(snapshot_lsn)}) + "\n")
        fh.flush()
        _os.fsync(fh.fileno())
    _os.replace(tmp, final)
    return final


class SnapshotStreamIngest:
    """The snapshot drop zone on the CdcStreamReplay chassis (VERDICT
    r4 #5): a Structured Streaming file source tails the feed's
    ``_ready/`` markers, and ``foreachBatch`` applies each newly-
    delivered snapshot through ``apply_snapshot`` (or the SCD2
    variant) — so snapshot-shaped feeds get the SAME checkpoint/
    restart story as the binlog tail instead of a polling batch loop.

    Exactly-once is the same two-mechanism composition as
    streaming/replay.py: Spark's checkpoint hands each marker to
    foreachBatch at least once; ``apply_snapshot``'s per-delivery
    ledger (batch id ``snapshot-<lsn>``) makes a redelivered marker a
    no-op. A crash between a delivery's merge commit and the
    checkpoint commit therefore replays the marker batch on restart,
    hits the ledger, and skips — mid-feed restart is safe at ANY
    point, including between the deliveries of one marker batch
    (deliveries apply in lsn order; the crashed prefix skips, the
    suffix applies).

    The stream carries O(deliveries) marker rows, never data: each
    delivery's dataset is read per-apply with the same wire-schema
    guard as the batch loop. Markers below the table's watermark
    (superseded deliveries — e.g. the feed was partially consumed by
    the batch loop before switching to streaming) skip without a read.
    """

    def __init__(
        self,
        spark,
        table: LakeTable,
        feed_dir: str,
        checkpoint_dir: str,
        fmt: str = "parquet",
        cfg: ValidationConfig | None = None,
        quarantine: LakeTable | None = None,
        strategy: str = "cow",
        scd2: bool = False,
        max_files_per_trigger: int | None = None,
    ):
        self.spark = spark
        self.table = table
        self.feed_dir = feed_dir
        self.checkpoint_dir = checkpoint_dir
        self.fmt = fmt
        self.cfg = cfg or ValidationConfig()
        self.quarantine = quarantine
        self.strategy = strategy
        self.scd2 = scd2
        self.max_files_per_trigger = max_files_per_trigger
        self.results: list[dict[str, Any]] = []

    def _foreach_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        import os as _os

        # O(deliveries-in-trigger) marker rows — driver-side by design
        lsns = sorted(int(r["lsn"]) for r in batch_df.collect())
        for lsn in lsns:
            done = last_snapshot_lsn(self.table)
            if done is not None and lsn <= done:
                self.results.append(
                    {
                        "batch_id": f"snapshot-{lsn}",
                        "skipped": True,
                        "reason": "superseded_watermark",
                    }
                )
                continue
            path = _os.path.join(self.feed_dir, f"snapshot-{lsn}")
            snap = _read_delivery(self.table, path, self.fmt, self.scd2)
            if self.scd2:
                res = apply_snapshot_scd2(
                    self.table, snap, lsn,
                    cfg=self.cfg, quarantine=self.quarantine,
                )
            else:
                res = apply_snapshot(
                    self.table, snap, lsn,
                    cfg=self.cfg, quarantine=self.quarantine,
                    strategy=self.strategy,
                )
            res["epoch_id"] = int(epoch_id)
            self.results.append(res)

    def run_available(self) -> list[dict[str, Any]]:
        """Process every marker currently in the drop zone, then stop
        (Trigger.AvailableNow). Re-invoke after new deliveries land —
        the checkpoint resumes at the first unprocessed marker."""
        import os as _os

        from pyspark.sql.types import LongType, StructField, StructType

        rdir = _os.path.join(self.feed_dir, READY_DIR)
        _os.makedirs(rdir, exist_ok=True)
        reader = self.spark.readStream.schema(
            StructType([StructField("lsn", LongType())])
        )
        if self.max_files_per_trigger:
            reader = reader.option(
                "maxFilesPerTrigger", self.max_files_per_trigger
            )
        stream = reader.json(rdir)
        q = (
            stream.writeStream.foreachBatch(self._foreach_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return self.results
