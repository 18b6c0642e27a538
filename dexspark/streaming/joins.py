"""Watermarked stream-stream interval (event-time range) join.

The reference correlates two asynchronous arrival streams — an
ingested report and the out-of-band metadata/config events that
describe it (RouteIngestedFile.kt:24-38 reads destination metadata for
each arriving file; the two "arrive" independently). Re-expressed
Spark-first, that is Structured Streaming's stream-stream inner join
with an event-time range constraint:

- BOTH inputs carry a watermark, and the join condition bounds how far
  the two event times may diverge (``ts_right BETWEEN ts_left AND
  ts_left + max_delta``). Those two facts together let Spark bound the
  join STATE: a buffered left row is evicted once the right watermark
  passes ``ts_left + max_delta`` (no future right row can match it),
  and symmetrically for right rows.
- Inner-join results are emitted eagerly in the micro-batch where the
  match completes — no window finalization wait.
- Input rows older than their own side's watermark are dropped before
  they touch state: the same deterministic lateness contract as the
  windowed aggregations in ``windowed.py``.

Scale notes: state is O(rows inside the watermark+delta horizon), not
O(stream length); the shuffle is a plain hash partition of both sides
on the equi-key, so hot keys respond to the same salting/AQE levers as
the batch joins. Without the range bound (or with only one watermark)
Spark must buffer a side forever — the ``max_delta`` knob is the
contract that makes 10^10-event operation possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "uid",
    left_ts: str = "ts",
    right_ts: str = "ts",
    delay: str = "10 minutes",
    max_delta: str = "4 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where the right event time falls in
    ``[left_ts, left_ts + max_delta]``. The output carries every column
    of both sides minus the duplicate key; a right-side column whose
    name collides with a left-side one (e.g. the default ``ts`` on
    both) is suffixed ``_r`` so the result never holds two columns of
    one name.

    ``how="inner"`` emits matches eagerly. ``how="left_outer"`` also
    emits every unmatched left row (right columns null) — but only
    once the watermark passes ``left_ts + max_delta``, i.e. once no
    future right row could still match it; until then the row sits in
    state, which is why outer results trail the watermark rather than
    the data. The range bound + both-side watermarks are what keep
    that state finite, so both are applied here unconditionally.

    Both sides get ``withWatermark(ts, delay)`` here so callers cannot
    accidentally build the unbounded-state variant.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported join type: {how!r}")
    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    l_stream = left.withWatermark(left_ts, delay).alias("l")
    r_stream = right.withWatermark(right_ts, delay).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rt >= lt)
        & (rt <= lt + F.expr(f"INTERVAL {max_delta}"))
    )
    joined = l_stream.join(r_stream, cond, how)
    # with the default left_ts == right_ts == 'ts' both sides carry a
    # 'ts' column; emitting two columns of one name breaks every
    # downstream select/withWatermark — suffix the colliding right-side
    # columns instead of demanding callers rename upstream
    left_names = set(left.columns)
    keep = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}").alias(f"{c}_r") if c in left_names else F.col(f"r.{c}")
        for c in right.columns
        if c != key
    ]
    return joined.select(*keep)
