"""Bounded-memory evidence for the 100x question (VERDICT r4 #8): run
the headline 16M-event CDC replay with execution memory deliberately
starved and show the merge/dedup stages SPILL (and finish, slower)
instead of OOMing — the behavior a 100 TB run depends on when a
partition exceeds the executor budget.

Two runs on fresh single-use sessions (Spark pins memory config at
JVM start, so a shared session cannot A/B this):

- baseline: the bench defaults (8g driver, spark.memory.fraction 0.6);
- starved:  2g driver heap and spark.memory.fraction=0.3 — execution
  memory per task = 2g x 0.3 / 32 threads ~ 19 MB, well below the
  per-partition dedup/merge working set at 16M events, so the hash
  aggregates and sorts must spill to finish. (Starving further —
  e.g. fraction 0.1 ~ 6 MB/task — drops below Spark's per-task
  minimum page reservation and fails with UNABLE_TO_ACQUIRE_MEMORY
  before any operator can spill; that is the floor of the memory
  manager, not a spill scenario, measured here on 4.1.2.)

Spill bytes come from Spark's status REST API (UI re-enabled for the
run): sum of memoryBytesSpilled/diskBytesSpilled over all stages.

Usage: python tools/bench_spill.py [n_events]
Prints one JSON line per run plus a verdict line; paste into
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import run_cdc_replay  # noqa: E402
from dexspark.session import get_spark  # noqa: E402


def spill_totals(spark) -> dict[str, int]:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    return {
        "stages": len(stages),
        "memory_spilled_bytes": sum(s.get("memoryBytesSpilled", 0) for s in stages),
        "disk_spilled_bytes": sum(s.get("diskBytesSpilled", 0) for s in stages),
        "spilling_stages": sum(
            1 for s in stages if s.get("diskBytesSpilled", 0) > 0
        ),
    }


def one_run(tag: str, n_events: int, driver_mem: str, mem_fraction: str):
    os.environ["DEXSPARK_DRIVER_MEM"] = driver_mem
    spark = get_spark(
        f"spill-{tag}",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.memory.fraction": mem_fraction,
        },
    )
    try:
        elapsed, applied = run_cdc_replay(spark, n_events)
        out = {
            "run": tag,
            "driver_mem": driver_mem,
            "memory_fraction": float(mem_fraction),
            "events": n_events,
            "applied": applied,
            "wall_sec": round(elapsed, 2),
            "events_per_sec": round(n_events / elapsed, 1),
            **spill_totals(spark),
        }
        print(json.dumps(out))
        return out
    finally:
        spark.stop()


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    base = one_run("baseline", n_events, "8g", "0.6")
    starved = one_run("starved", n_events, "2g", "0.3")
    assert starved["applied"] == base["applied"], "divergent results!"
    print(
        json.dumps(
            {
                "verdict": "bounded-memory run completed by spilling",
                "applied_equal": True,
                "slowdown_x": round(
                    starved["wall_sec"] / base["wall_sec"], 2
                ),
                "starved_disk_spilled_mb": round(
                    starved["disk_spilled_bytes"] / 1e6, 1
                ),
                "baseline_disk_spilled_mb": round(
                    base["disk_spilled_bytes"] / 1e6, 1
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
