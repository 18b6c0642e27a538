"""Bootstrap-then-tail: seed a table from a full snapshot, then
replay only the change events past the snapshot's watermark.

Every production CDC rollout starts this way (Debezium's initial
snapshot, DMS full-load-and-CDC): the binlog does not reach back to
the beginning of time, so the consumer loads a consistent snapshot
taken at LSN ``W`` and tails the log from ``W+1``. ≙ the reference's
existence gate (FnRouter.kt:82-89): events are only meaningful
relative to a store that already exists; here the store's starting
state is itself an ingested, validated, exactly-once batch.

Semantics: snapshot rows enter the normal validate → dedup → merge
pipeline as I events at the watermark LSN (or at a per-row LSN column
when the snapshot carries one, e.g. another LakeTable's
``_applied_lsn``), so the LSN gate gives clean convergence rules:

- a tail event with lsn > W wins over the seeded row — normal flow;
- a REDELIVERED pre-watermark event (an overlapping tail that re-reads
  the segment containing W) loses the gate against the seeded row —
  harmless, exactly like any redelivery;
- the one hole in overlap-tolerance is keys DELETED before W: a plain
  snapshot has no row for them, so nothing blocks a redelivered
  pre-watermark insert. Pass ``deletes`` (key cols + the delete's LSN)
  to seed those as D tombstones and the bootstrapped table is
  bit-equivalent to a mid-replay state — an overlapping tail then
  converges for every key. Without ``deletes`` the contract is the
  standard one: start the tail strictly after W.

Idempotent on ``batch_id`` like any batch; refuses a table that
already holds other committed batches (bootstrap precedes the tail by
definition — re-seeding a live table would silently lose the gate
history). Scale shape: the snapshot is just a (large) first batch —
bucketed COW/MOR merge, no driver materialization, same plan as any
replay batch.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F

from dexspark.cdc.apply import apply_changes
from dexspark.cdc.validate import ValidationConfig
from dexspark.lake.table import LakeTable


def bootstrap_table(
    table: LakeTable,
    snapshot: DataFrame,
    watermark_lsn: int | None = None,
    lsn_col: str | None = None,
    deletes: DataFrame | None = None,
    delete_lsn_col: str = "lsn",
    batch_id: str = "bootstrap",
    cfg: ValidationConfig | None = None,
    quarantine: LakeTable | None = None,
    strategy: str = "cow",
) -> dict[str, Any]:
    """Seed ``table`` from ``snapshot`` (state as of the watermark).

    Exactly one of ``watermark_lsn`` (uniform external snapshot) /
    ``lsn_col`` (snapshot carries per-row LSNs) must be given.
    ``deletes``: optional (key cols + ``delete_lsn_col``) frame of
    keys deleted at-or-before the watermark, seeded as tombstones so
    an overlapping tail cannot resurrect them. Returns the
    ``apply_changes`` result dict."""
    if (watermark_lsn is None) == (lsn_col is None):
        raise ValueError("pass exactly one of watermark_lsn / lsn_col")
    cfg = cfg or ValidationConfig()

    others = {str(i) for i in table.committed_batch_ids()} - {str(batch_id)}
    if others:
        raise ValueError(
            "bootstrap requires a fresh table: found committed batches "
            f"{sorted(others)[:5]} — bootstrap must precede the tail"
        )

    if lsn_col is not None:
        lsn = F.col(lsn_col).cast("long")
        payload_cols = [c for c in snapshot.columns if c != lsn_col]
    else:
        lsn = F.lit(int(watermark_lsn)).cast("long")
        payload_cols = list(snapshot.columns)
    clash = {"lsn", "op"} & set(payload_cols)
    if clash:
        raise ValueError(
            f"snapshot payload carries reserved CDC columns {sorted(clash)} "
            "— drop them (or pass lsn_col='lsn' to use per-row LSNs)"
        )
    events = snapshot.select(
        lsn.alias("lsn"), F.lit("I").alias("op"), *payload_cols
    )

    if deletes is not None:
        keys = list(cfg.key_cols)
        missing = [c for c in keys + [delete_lsn_col] if c not in deletes.columns]
        if missing:
            raise ValueError(f"deletes frame lacks columns {missing}")
        d = deletes.select(
            F.col(delete_lsn_col).cast("long").alias("lsn"),
            F.lit("D").alias("op"),
            *keys,
        )
        # D events carry the key alone; remaining payload columns ride
        # as typed NULLs (the validator skips payload checks on D)
        types = {f.name: f.dataType for f in snapshot.schema.fields}
        for c in payload_cols:
            if c not in keys:
                d = d.withColumn(c, F.lit(None).cast(types[c]))
        events = events.unionByName(d)

    return apply_changes(
        table,
        events,
        batch_id=batch_id,
        cfg=cfg,
        quarantine=quarantine,
        strategy=strategy,
    )
