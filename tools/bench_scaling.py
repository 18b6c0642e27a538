"""Two-cluster-size scaling evidence (BASELINE.json north rule).

Runs the identical CDC replay job at local[8] (N) and local[32] (4N)
on the same input and reports throughput at both plus scaling
efficiency = thr_4N / (4 * thr_N). Writes BENCH/BASELINE.md.

The sandbox is a shared VM with multi-second noise spikes (observed:
identical runs varying 3-5x), so each level runs ``trials`` times and
the BEST run is compared — best-of-N isolates the machine's capability
from co-tenant interference, which is the quantity the scaling
criterion is about.

Usage: python tools/bench_scaling.py [n_events] [trials]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import run_cdc_replay  # noqa: E402
from dexspark.session import get_spark  # noqa: E402


def run_at(cores: int, n_events: int, trials: int) -> dict:
    spark = get_spark(f"dexspark-scale-{cores}", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up to exclude JVM/codegen cold start from the comparison
    run_cdc_replay(spark, max(10_000, n_events // 32))
    times = []
    for i in range(trials):
        elapsed, applied = run_cdc_replay(spark, n_events)
        times.append(elapsed)
        print(
            f"  local[{cores}] trial {i}: {elapsed:.1f}s "
            f"{n_events / elapsed:,.0f} ev/s",
            file=sys.stderr,
            flush=True,
        )
    spark.stop()
    best = min(times)
    return {
        "cores": cores,
        "sec": round(best, 3),
        "all_trials_sec": [round(t, 1) for t in times],
        "events": n_events,
        "applied": applied,
        "events_per_sec": round(n_events / best, 1),
    }


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    r8 = run_at(8, n_events, trials)
    r32 = run_at(32, n_events, trials)
    eff = r32["events_per_sec"] / (4 * r8["events_per_sec"])
    out = {"N_cores": r8, "fourN_cores": r32, "scaling_efficiency": round(eff, 3)}
    print(json.dumps(out))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as fh:
        fh.write(
            f"""# BENCH baseline — two-parallelism scaling evidence

North rule: throughput scaling efficiency >= 0.8 from N to 4N
executors, evidenced in-sandbox by the identical job at two
parallelism levels on the same input (no real cluster available).

Job: end-to-end CDC replay (Structured-Streaming tail over parquet log
segments -> validate -> salted max-LSN dedup -> bucketed COW merge),
{n_events:,} change events, seed 42, 64 buckets, 4 micro-batches,
5% hot-key skew, salt=8, 32 log files per batch. Warm-up run excluded;
best of {trials} trials per level (the sandbox VM shows 3-5x noise
spikes from co-tenant load, so best-of-N measures the plan, not the
neighbors).

| parallelism | wall sec (best) | all trials (sec) | events/sec |
|---|---|---|---|
| local[8]  (N)  | {r8['sec']} | {r8['all_trials_sec']} | {r8['events_per_sec']:,} |
| local[32] (4N) | {r32['sec']} | {r32['all_trials_sec']} | {r32['events_per_sec']:,} |

**Scaling efficiency (thr_4N / (4 x thr_N)): {eff:.3f}**

Caveats: single-JVM local mode shares one driver, one disk, and the
OS page cache between "executors"; shuffle is in-process, and the
driver-side micro-batch orchestration (planning + 3 collect actions
per batch) is a fixed serial cost that a real cluster would amortize
over far larger batches. On a real 4N-executor cluster the same plan
shape applies (bucket-pruned merge, broadcast config joins,
partial-agg dedup, salted hot keys); these numbers evidence plan
scalability, not absolute cluster throughput.
"""
        )


if __name__ == "__main__":
    main()
