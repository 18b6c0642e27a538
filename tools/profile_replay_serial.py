"""Profile the driver-serial cost per micro-batch of the headline CDC
replay — the Amdahl term that bounds N→4N scaling efficiency.

The north-rule measurement (tools/bench_scaling.py) reads ~0.80 at
2→8 cores; Amdahl inversion puts the non-scaling fraction at ~8% of
the local[2] wall (~2.3 s per micro-batch at 16M events / 4 batches).
This tool attributes that time: it wraps the phases of
CdcStreamReplay/apply_changes/merge with monotonic timers and prints a
per-batch breakdown plus the streaming-engine overhead (total wall
minus sum of foreachBatch walls).

Phases attributed per batch:
- ledger: committed_batch_ids() + manifest reads (driver Python)
- lineage: the validate→dedup→per-bucket-stats job (collect)
- obs: observation retrieval (reject metrics)
- merge: LakeTable.merge end-to-end (plan + write job + commit)
- other: foreachBatch wall minus the above
Stream overhead = run wall − Σ foreachBatch walls (file listing,
offset/commit log, trigger scheduling — all driver-serial).

Usage: python tools/profile_replay_serial.py [n_events] [cores]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from dexspark.session import get_spark  # noqa: E402
from dexspark.cdc import apply as apply_mod  # noqa: E402
from dexspark.lake.table import LakeTable  # noqa: E402

PHASES: list[dict] = []


def instrument():
    orig_apply = apply_mod.apply_changes
    orig_merge = LakeTable.merge
    orig_ledger = LakeTable.committed_batch_ids

    def timed_apply(table, events, batch_id, **kw):
        rec = {"batch_id": batch_id, "ledger": 0.0, "merge": 0.0}
        PHASES.append(rec)
        t0 = time.monotonic()
        out = orig_apply(table, events, batch_id, **kw)
        rec["apply_total"] = time.monotonic() - t0
        return out

    def timed_merge(self, *a, **kw):
        t0 = time.monotonic()
        out = orig_merge(self, *a, **kw)
        if PHASES:
            PHASES[-1]["merge"] += time.monotonic() - t0
        return out

    def timed_ledger(self):
        t0 = time.monotonic()
        out = orig_ledger(self)
        if PHASES:
            PHASES[-1]["ledger"] += time.monotonic() - t0
        return out

    apply_mod.apply_changes = timed_apply
    LakeTable.merge = timed_merge
    LakeTable.committed_batch_ids = timed_ledger
    # the replay chassis imported apply_changes by name
    import dexspark.streaming.replay as replay_mod

    replay_mod.apply_changes = timed_apply


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    instrument()
    spark = get_spark(f"dexspark-profile-{cores}", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up (codegen + JIT) excluded, mirroring bench_scaling.py
    bench.run_cdc_replay(spark, max(10_000, n_events // 32))
    PHASES.clear()
    t0 = time.monotonic()
    elapsed, applied = bench.run_cdc_replay(spark, n_events)
    total = time.monotonic() - t0
    batch_walls = sum(p.get("apply_total", 0.0) for p in PHASES)
    print(f"\nrun: {elapsed:.2f}s (timed) / {total:.2f}s (incl setup+teardown) "
          f"applied={applied} cores={cores} events={n_events}")
    print(f"{'batch':28s} {'apply':>7s} {'ledger':>7s} {'merge':>7s} {'other':>7s}")
    for p in PHASES:
        other = p.get("apply_total", 0.0) - p["ledger"] - p["merge"]
        print(f"{p['batch_id'][:28]:28s} {p.get('apply_total', 0.0):7.2f} "
              f"{p['ledger']:7.2f} {p['merge']:7.2f} {other:7.2f}")
    print(f"sum(foreachBatch walls) = {batch_walls:.2f}s; "
          f"stream-engine overhead = {elapsed - batch_walls:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
