"""Incremental-view maintenance cost vs base-table size.

The claim lake/matview.py makes for 100 TB is that a refresh costs
O(rows changed since the last refresh), NOT O(base table): the change
feed is bucket-pruned to the commits' touched data, deltas fold in one
map-side-combinable aggregate, and the merge rewrites only the view
buckets holding affected groups. If that is true, refreshing after a
FIXED-SIZE change batch should stay ~flat while the base table grows —
and the naive alternative (recompute the GROUP BY over the whole
table) should grow linearly. This tool measures both curves.

Method: for each base size N, build a table of N events (merged in a
few large commits), refresh the view to current, then apply one
fixed-size change batch (``batch_events``, same at every N, keys drawn
from the same conversation space so it mixes updates + inserts) and
time (a) ``refresh_agg_view`` and (b) a full ``_full_agg`` recompute
over ``table.read()``. Best of ``trials`` replays per point on a warm
JVM (each trial applies a fresh batch so the refresh is never a
no-op).

Usage: python tools/bench_matview.py [sizes_csv] [batch_events] [trials]
Defaults: 200000,800000,3200000  50000  2
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql.types import _parse_datatype_string  # noqa: E402

from dexspark.cdc import apply_changes  # noqa: E402
from dexspark.cdc.generator import gen_change_log  # noqa: E402
from dexspark.lake import LakeTable  # noqa: E402
from dexspark.lake.matview import (  # noqa: E402
    _full_agg,
    create_agg_view,
    refresh_agg_view,
)
from dexspark.session import get_spark  # noqa: E402

PAYLOAD = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)
GROUP = ["conv_id"]
SUMS = {"sum_len": "length(text)"}


def main():
    sizes = [
        int(s)
        for s in (
            sys.argv[1] if len(sys.argv) > 1 else "200000,800000,3200000"
        ).split(",")
    ]
    batch_events = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench-matview", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )

    rows = []
    for n in sizes:
        d = tempfile.mkdtemp(prefix="mv_bench_")
        try:
            table = LakeTable.create(
                spark, os.path.join(d, "t"),
                _parse_datatype_string(PAYLOAD), "conv_id", num_buckets=32,
            )
            n_convs = max(1000, n // 200)  # conv space grows with N
            base = gen_change_log(
                spark, n, n_convs=n_convs, n_batches=4, seed=7
            )
            for b in range(4):
                apply_changes(
                    table, base.filter(F.col("batch_seq") == b),
                    batch_id=f"base{b}",
                )
            view = create_agg_view(
                spark, os.path.join(d, "v"), table, GROUP, SUMS, num_buckets=32
            )
            refresh_agg_view(table, view, GROUP, SUMS)  # bring current

            best_refresh, best_recompute = float("inf"), float("inf")
            base_rows = table.read().count()
            for t in range(trials):
                # fresh fixed-size batch each trial (distinct seed ->
                # distinct LSN range via lsn offset below)
                batch = gen_change_log(
                    spark, batch_events, n_convs=n_convs, n_batches=1,
                    seed=100 + t,
                ).withColumn(
                    "lsn", F.col("lsn") + F.lit((t + 1) * 10 * n)
                )
                apply_changes(table, batch, batch_id=f"delta{t}")

                t0 = time.perf_counter()
                info = refresh_agg_view(table, view, GROUP, SUMS)
                best_refresh = min(best_refresh, time.perf_counter() - t0)
                assert info and info["view_mode"] == "incremental"

                t0 = time.perf_counter()
                _full_agg(table.read(), GROUP, SUMS).count()
                best_recompute = min(
                    best_recompute, time.perf_counter() - t0
                )
            rows.append(
                (n, base_rows, batch_events, best_refresh, best_recompute)
            )
            print(
                f"N={n:>9,}  live={base_rows:>9,}  batch={batch_events:,}  "
                f"refresh={best_refresh:6.2f}s  recompute={best_recompute:6.2f}s",
                flush=True,
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)

    print("\n| base events | live rows | change batch | incremental refresh | full recompute |")
    print("|---|---|---|---|---|")
    for n, live, be, r, rc in rows:
        print(f"| {n:,} | {live:,} | {be:,} | {r:.2f}s | {rc:.2f}s |")


if __name__ == "__main__":
    main()
