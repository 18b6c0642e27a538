"""Max-LSN-per-key deduplication — the reference's last-writer-wins
upsert (FnCacheUpdater.kt:44 `jedis.set(fileName, content)`) expressed
as a distributed aggregate.

Why ``max(struct(lsn, ...))`` and not a window or ``max_by``:

- ``row_number() OVER (PARTITION BY key ORDER BY lsn DESC)`` needs a
  full shuffle + per-partition sort and has **no partial aggregation**
  — every duplicate row crosses the network.
- ``max_by(struct, lsn)`` is an imperative-buffer aggregate; its
  per-row update cost measured consistently slower than the
  declarative ``max`` over the same data (8M rows @ 32 cores: ~4.8s
  vs ~2.7s for ``max(struct)``).
- ``max(struct(lsn, payload...))`` is a DeclarativeAggregate
  (codegen'd ``greatest``) with map-side partial combine: duplicates
  collapse before the shuffle. LSN is placed first in the struct and
  is unique per event, so struct ordering == LSN ordering; payload
  fields are only compared on exact LSN ties, i.e. verbatim
  at-least-once redeliveries, where either copy is correct.

Skew: map-side partial aggregation already defuses hot keys — a key
with a million updates in a partition leaves that partition as ONE
row, so the reducer for a hot key receives at most one row per map
partition. ``salt_buckets`` is exposed for the pathological case
(one key so hot that even per-partition partials overwhelm a single
reducer's *final* merge — only plausible when duplicates per key per
partition are low AND one key dominates the batch); it switches to a
two-phase aggregate over (key, salt) then (key). It costs a second
shuffle phase, so it is off unless the batch is known-pathological.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_ROW = "_row"
_SALT = "_salt"


def dedupe_latest(
    events: DataFrame,
    key_cols: list[str],
    lsn_col: str = "lsn",
    salt_buckets: int | None = None,
    strategy: str = "agg",
) -> DataFrame:
    """Return exactly one row per key: the one with the highest LSN.

    Input may contain arbitrary duplicates and out-of-order LSNs;
    output column set == input column set (order preserved).

    strategy="agg" (default): one declarative ``max(struct(lsn,...))``
    aggregate — no extra phases, no broadcast build; map-side partial
    combine collapses duplicates before the shuffle.
    strategy="narrow": the wide payload never shuffles (narrow max-lsn
    agg + broadcast winners + left-semi filter); wins when duplicates
    per key are high and the per-batch key set fits the broadcast
    budget — the build of the winners relation is driver/executor
    serial, so it is an option, not the default.
    """
    if strategy == "narrow":
        return _dedupe_narrow(events, key_cols, lsn_col)
    return _dedupe_agg(events, key_cols, lsn_col, salt_buckets)


def _dedupe_narrow(
    events: DataFrame, key_cols: list[str], lsn_col: str
) -> DataFrame:
    """Three cheap steps instead of one expensive one:

    1. HashAggregate ``max(lsn)`` per key — only (key, lsn) columns
       cross the network, with map-side partial combine (a hot key
       leaves each map partition as one narrow row).
    2. Broadcast the winners and LEFT SEMI join on (key, lsn) — the
       event stream is filtered map-side, never shuffled.
    3. ``dropDuplicates(key)`` over the winner rows only (collapses
       verbatim at-least-once redeliveries that share the max LSN) —
       a shuffle of ~|keys| rows, not |batch| rows.

    At 10^10-event scale the micro-batch key set is bounded by trigger
    sizing; if it outgrows the broadcast budget, use strategy="agg".

    The semi join matches null-safely: groupBy keeps a NULL key (or a
    NULL-lsn winner) as a group, and a plain equality join would then
    silently drop those rows — making the two strategies disagree on
    the same input (strategy flags must never change results).
    """
    winners = events.groupBy(*key_cols).agg(F.max(lsn_col).alias(lsn_col))
    w = F.broadcast(winners).alias("w")
    e = events.alias("e")
    cond = None
    for c in [*key_cols, lsn_col]:
        term = F.col(f"e.{c}").eqNullSafe(F.col(f"w.{c}"))
        cond = term if cond is None else cond & term
    kept = e.join(w, cond, how="leftsemi")
    return kept.dropDuplicates(key_cols).select(*events.columns)


def _dedupe_agg(
    events: DataFrame,
    key_cols: list[str],
    lsn_col: str,
    salt_buckets: int | None,
) -> DataFrame:
    cols = events.columns
    rest = [c for c in cols if c != lsn_col and c not in key_cols]
    packed = events.select(
        *key_cols,
        F.struct(F.col(lsn_col), *[F.col(c) for c in rest]).alias(_ROW),
    )
    agg = F.max(_ROW).alias(_ROW)

    if salt_buckets and salt_buckets > 1:
        salted = packed.withColumn(
            _SALT, F.pmod(F.xxhash64(F.col(_ROW)[lsn_col]), F.lit(salt_buckets))
        )
        partial = salted.groupBy(*key_cols, _SALT).agg(agg)
        latest = partial.groupBy(*key_cols).agg(agg)
    else:
        latest = packed.groupBy(*key_cols).agg(agg)

    return latest.select(
        [
            F.col(c) if c in key_cols else F.col(f"{_ROW}.{c}").alias(c)
            for c in cols
        ]
    )
