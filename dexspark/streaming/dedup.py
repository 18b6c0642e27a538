"""Streaming duplicate-delivery absorption.

The reference's transport is at-least-once end to end: Event Grid
redelivers on every failed/slow handler and the Durable replay re-runs
activities (FnOrchestrator.kt:182-192 converts activity failure into
retry), so every downstream consumer must tolerate the same record
arriving more than once. The batch engine absorbs that with the
max-LSN dedup inside `apply_changes`; this module is the STREAMING
half — collapse duplicate deliveries before they ever reach a sink or
a stateful operator, with state bounded by the watermark instead of
the stream's lifetime.

Spark-first shape: ``dropDuplicatesWithinWatermark`` keeps one row per
key and remembers the key only until the watermark passes its event
time + delay — O(keys inside the watermark horizon) state, the only
dedup that survives an unbounded stream. The contract that makes it
exact:

- duplicate deliveries of a record carry the SAME event time (true for
  redelivery of an immutable log record), so all copies are inside any
  positive delay of each other and collapse to one;
- a redelivery arriving later than ``delay`` behind the stream's front
  is dropped by the watermark gate at input — also correct, because
  the original was already emitted;
- rows are emitted eagerly on first sight (append mode), so dedup adds
  no latency, unlike windowed aggregation which waits for window
  finalization.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_within_watermark(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """One row per ``keys`` within the watermark horizon: the first
    delivery is emitted immediately, later copies inside ``delay`` are
    dropped from state, and copies older than the watermark are
    dropped at input. The watermark is applied here so callers cannot
    build the unbounded-state variant (plain ``dropDuplicates`` on a
    stream keeps every key forever)."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        list(keys)
    )
