"""As-of join: for each left row, the most recent right row at or
before it (per key).

Spark has no ASOF JOIN operator (DuckDB/Pandas do). The naive
formulations both fail at scale:

- inequality join ``l.ts >= r.ts`` → BroadcastNestedLoop / cartesian
  per key, O(|L| x |R|) pairs before the per-row max;
- per-key ``collect_list`` + UDF binary search → Python in the hot
  path and unbounded per-key state.

The scalable shape is **union + ordered window**: tag both sides, union
them (narrow), then one window per key ordered by (ts, side) carries
the last-seen right row forward onto each left row as one struct via
``last(struct, ignorenulls=True)``. Exactly one shuffle (by key), state is
one row per partition frame, and whole-stage codegen applies — the
same plan a time-series engine would pick for 10^10 rows. Ties
(equal ts) resolve right-before-left so an exactly-simultaneous right
row IS visible to the left row ("at or before").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_SIDE = "_side"  # 0 = right (build), 1 = left (probe)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str,
    value_cols: list[str] | None = None,
    suffix: str = "_r",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, enriched with the latest
    ``right`` row whose ``on`` <= left's ``on`` within the same ``by``
    key (NULLs when none). ``value_cols`` limits which right columns
    are carried (default: all non-key, non-ts). ``tolerance_seconds``
    drops matches older than the window (like pandas merge_asof
    tolerance)."""
    by = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in by and c != on]

    # carry the matched right row as ONE struct, not per-column: with
    # independent last(col, ignorenulls) a legitimately-NULL value
    # inside a right row would be skipped for that column and the
    # output would stitch fields from different right rows. One
    # non-null struct per right row keeps the matched row intact
    # (NULL fields included), like pandas merge_asof / DuckDB ASOF.
    _PAY = "_asof_payload"
    payload = F.struct(
        F.col(on).alias(on), *[F.col(c).alias(c) for c in value_cols]
    )
    rhs = right.select(*by, F.col(on), F.lit(0).alias(_SIDE), payload.alias(_PAY))
    # align columns: right rows carry NULL left payload (they are
    # dropped after the window pass)
    for c in left.columns:
        if c not in by and c != on:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    lhs = left.withColumn(_SIDE, F.lit(1)).withColumn(
        _PAY, F.lit(None).cast(rhs.schema[_PAY].dataType)
    )

    unioned = lhs.unionByName(rhs)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        _PAY, F.last(F.col(_PAY), ignorenulls=True).over(w)
    )
    matched = F.col(_PAY)
    if tolerance_seconds is not None:
        within = (
            F.col(on).cast("timestamp").cast("long")
            - matched[on].cast("timestamp").cast("long")
        ) <= tolerance_seconds
        matched = F.when(within, matched)
    return carried.filter(F.col(_SIDE) == 1).select(
        *[c for c in left.columns],
        *[matched[c].alias(f"{c}{suffix}") for c in [on, *value_cols]],
    )
