"""Max-LSN-per-key deduplication — the reference's last-writer-wins
upsert (FnCacheUpdater.kt:44 `jedis.set(fileName, content)`) expressed
as a distributed aggregate.

Why an aggregate and not a window: ``row_number() OVER (PARTITION BY
key ORDER BY lsn DESC)`` requires a full shuffle + per-partition sort
and has **no partial aggregation** — every duplicate row crosses the
network. ``max_by(struct, lsn)`` plans as SortAggregate with
``partial_max_by``: duplicates collapse map-side before the shuffle,
which is exactly what you want when at-least-once replay means the
same (key, lsn) appears many times. (Spark falls back to SortAggregate
because the buffer is a struct — the local sort is on the two group
keys only; the win over the window is that only one reduced row per
key crosses the network.)

Skew: a hot conv_id (north rule: one conversation can be 30% of a
batch) would put one reducer on the whole hot key. ``salt_buckets=S``
switches to a two-phase aggregate — phase 1 groups by (key, salt) so
the hot key spreads over S reducers, phase 2 reduces the S partials.
Note the key here is (conv_id, turn_idx) so skew only bites when a
single *turn* is rewritten millions of times; salting is still exposed
because at 10^10 events that happens (e.g. a streaming turn appended
token-by-token).
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
) -> DataFrame:
    """Return exactly one row per key: the one with the highest LSN.

    Input may contain arbitrary duplicates and out-of-order LSNs;
    output column set == input column set.
    """
    cols = events.columns
    packed = events.select(
        *key_cols, F.struct(*[F.col(c) for c in cols]).alias(_ROW)
    )
    agg = F.max_by(_ROW, F.col(_ROW)[lsn_col]).alias(_ROW)

    if salt_buckets and salt_buckets > 1:
        salted = packed.withColumn(
            _SALT, F.pmod(F.xxhash64(F.col(_ROW)[lsn_col]), F.lit(salt_buckets))
        )
        partial = salted.groupBy(*key_cols, _SALT).agg(agg)
        latest = partial.groupBy(*key_cols).agg(agg)
    else:
        latest = packed.groupBy(*key_cols).agg(agg)

    return latest.select([F.col(f"{_ROW}.{c}").alias(c) for c in cols])
