"""Custom stateful streaming operator: per-conversation running
progress over the change stream.

The engine's core replay path needs no user state (LSN order +
idempotent MERGE covers it — SURVEY §2.2), but operational consumers
of the stream do: "how far along is each conversation?" is a rolling
per-key aggregate that must survive micro-batch boundaries AND
restarts. That is exactly Structured Streaming's arbitrary-stateful
shape: ``applyInPandasWithState`` keeps one small state record per
conv_id in the checkpointed state store, each micro-batch's rows for a
key arrive as Arrow-backed pandas frames (vectorized, per input_hint:
no per-row Python), and the operator emits the updated state row.

Scale notes: state is O(live conversations) and partitioned by the
group key, so it shards across executors like any shuffle; at 10^10
events you bound it with a TTL (``ttl_minutes``) so dormant
conversations age out of the store instead of accumulating forever.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events long, max_turn int, last_role string, max_lsn long"
OUTPUT_SCHEMA = (
    "conv_id string, n_events long, max_turn int, last_role string, max_lsn long"
)


def conversation_progress(
    events: DataFrame, ttl_minutes: int | None = None
) -> DataFrame:
    """Streaming transform: one output row per conv_id per micro-batch
    with the running (n_events, max_turn, last_role-by-LSN, max_lsn).

    ``events`` must be a streaming DataFrame with at least
    (conv_id, turn_idx, role, lsn). State survives restarts via the
    query's checkpoint."""

    def update(key, pdfs, state: GroupState):
        # a ProcessingTimeTimeout firing means the key went ttl_minutes
        # without data: evict it (emit nothing). Without this branch the
        # timeout path would re-update + re-arm, so dormant keys would
        # never leave the store and each TTL tick would emit a duplicate
        # unchanged row.
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            n, mx, role, lsn = state.get
        else:
            n, mx, role, lsn = 0, -1, None, -1
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            mx = max(mx, int(pdf["turn_idx"].max()))
            batch_lsn = int(pdf["lsn"].max())
            if batch_lsn > lsn:
                role = str(pdf.loc[pdf["lsn"].idxmax(), "role"])
                lsn = batch_lsn
        state.update((n, mx, role, lsn))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        yield pd.DataFrame(
            [
                {
                    "conv_id": key[0],
                    "n_events": n,
                    "max_turn": mx,
                    "last_role": role,
                    "max_lsn": lsn,
                }
            ]
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("conv_id").applyInPandasWithState(
        update, OUTPUT_SCHEMA, STATE_SCHEMA, "update", timeout
    )
