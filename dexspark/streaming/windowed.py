"""Event-time windowed aggregation with watermark-bounded late data.

The core replay path deliberately does NOT need watermarks (the change
log is LSN-ordered and the merge idempotent — SURVEY §2.2), but
operational consumers of the same stream do: "events per 5-minute
window per role" is an event-time aggregate where arrival order and
event order diverge, and unbounded lateness would mean unbounded
state. That is Structured Streaming's native watermark shape
(≙ the reference's Event-Hub tail, RouteIngestedFile.kt:13-20, viewed
as an event-time stream rather than an ordered log):

- ``withWatermark(ts, delay)`` bounds state: a window whose end falls
  behind the watermark is finalized, emitted once (append mode), and
  evicted from the state store.
- Late rows within the delay still aggregate into their open window;
  rows later than the watermark target a finalized window and are
  dropped — the documented, deterministic lateness contract.

Scale notes: state is O(open windows x group keys), independent of
stream length; the shuffle is on (window, group) like any streaming
agg; at 10^10 events the delay knob trades completeness against state
size, and the append-mode sink writes each window exactly once
(idempotent downstream loads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    delay: str = "10 minutes",
    window_duration: str = "5 minutes",
    group_cols: tuple[str, ...] = ("role",),
    sum_col: str | None = "lsn",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling- (or, with ``slide``, sliding-/hopping-) window counts
    (+ optional exact sum) per group with a lateness watermark.
    Returns a streaming DataFrame with columns
    (w_start, w_end, *group_cols, n[, <sum_col>_sum]) suitable for an
    append-mode sink.

    With ``slide`` < ``window_duration`` each event lands in
    ceil(duration/slide) overlapping windows — Spark expands the row
    once per window BEFORE the shuffle, so state and shuffle volume
    scale by that factor (choose the ratio deliberately at 10^10
    events). A late row participates only in its still-open windows:
    windows whose end has passed the watermark were already finalized
    and the expanded row for them is dropped — per-window, not
    per-row, lateness.

    Note there is deliberately NO row-filter parameter: a filter
    placed "after" ``withWatermark`` is pushed below the
    EventTimeWatermark node by the optimizer, so filtered rows would
    silently stop advancing the watermark. Synthetic watermark ticks
    (e.g. flush rows) must instead carry a sentinel group value and be
    dropped from the SINK output (their own far-future window then
    simply never finalizes, or is excluded on read).
    """
    s = stream.withWatermark(ts_col, delay)
    aggs = [F.count(F.lit(1)).alias("n")]
    if sum_col is not None:
        aggs.append(F.sum(sum_col).alias(f"{sum_col}_sum"))
    win = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide is not None
        else F.window(F.col(ts_col), window_duration)
    )
    return (
        s.groupBy(win.alias("w"), *group_cols)
        .agg(*aggs)
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            *group_cols,
            "n",
            *([f"{sum_col}_sum"] if sum_col is not None else []),
        )
    )


def session_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "5 minutes",
    delay: str = "10 minutes",
    group_cols: tuple[str, ...] = ("uid",),
    sum_col: str | None = "lsn",
) -> DataFrame:
    """Gap-based SESSION windows per key with a lateness watermark —
    the streaming shape of sessionization (the batch equivalent is the
    lag+cumsum window in queries.user_sessions). A session's extent is
    the union of each event's [ts, ts+gap) range: events closer than
    the gap merge, the emitted end is last-event + gap, and a session
    is finalized (emitted once, state evicted) when the watermark
    passes its end. Rows whose entire [ts, ts+gap) range is behind the
    watermark are dropped — same lateness contract as windowed_counts,
    same no-filter-before-the-watermark-node caveat.

    Scale: state is O(open sessions), keyed shuffle like any streaming
    agg; the gap knob bounds how long a session can stay open ONLY in
    event time, so the delay knob still governs state lifetime.
    """
    s = stream.withWatermark(ts_col, delay)
    aggs = [F.count(F.lit(1)).alias("n")]
    if sum_col is not None:
        aggs.append(F.sum(sum_col).alias(f"{sum_col}_sum"))
    return (
        s.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), *group_cols)
        .agg(*aggs)
        .select(
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            *group_cols,
            "n",
            *([f"{sum_col}_sum"] if sum_col is not None else []),
        )
    )
