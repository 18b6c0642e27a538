"""Snapshot-derived CDC cost (cdc/snapshot.py) vs the binlog tail.

Same synthetic feed two ways: (a) plain tail replay of every change
batch; (b) the same state evolution delivered as K full snapshots and
ingested via apply_snapshot (diff against current state → I/U/D →
merge). Reports wall time and effective events/sec for both, plus the
per-delivery cost curve — the number that matters operationally, since
a snapshot delivery's diff reads O(table) no matter how few rows
changed (the documented, irreducible cost of snapshot-shaped sources).

Usage: python tools/bench_snapshot.py [n_events] [n_snapshots]
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

from dexspark.cdc.apply import apply_changes  # noqa: E402
from dexspark.cdc.dedup import dedupe_latest  # noqa: E402
from dexspark.cdc.generator import gen_change_log  # noqa: E402
from dexspark.cdc.snapshot import apply_snapshot  # noqa: E402
from dexspark.cdc.validate import REASON_COL, flag_events  # noqa: E402
from dexspark.lake.table import LakeTable  # noqa: E402
from dexspark.session import get_spark  # noqa: E402

SCHEMA_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)
KEYS = ["conv_id", "turn_idx"]
PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_snaps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "bench-snapshot", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    schema = _parse_datatype_string(SCHEMA_DDL)
    n_convs = max(200, n_events // 2000)
    log = gen_change_log(
        spark, n_events, n_convs=n_convs, n_batches=n_snaps
    ).persist()
    log.count()

    root = tempfile.mkdtemp(prefix="dexspark_snapbench_")
    try:
        # (a) plain tail replay
        tail = LakeTable.create(
            spark, os.path.join(root, "tail"), schema, "conv_id", 64
        )
        t0 = time.perf_counter()
        for b in range(n_snaps):
            apply_changes(
                tail, log.filter(F.col("batch_seq") == b), batch_id=f"b{b}"
            )
        tail_s = time.perf_counter() - t0

        # (b) the same evolution as full snapshot deliveries
        snap_tbl = LakeTable.create(
            spark, os.path.join(root, "snap"), schema, "conv_id", 64
        )
        max_lsn = int(log.agg(F.max("lsn")).first()[0])
        per = []
        t0 = time.perf_counter()
        for k in range(1, n_snaps + 1):
            w = (max_lsn + 1) * k // n_snaps - 1
            pre = flag_events(log.filter(F.col("lsn") <= w))
            latest = dedupe_latest(
                pre.filter(F.col(REASON_COL).isNull()), KEYS
            )
            snapshot = latest.filter(F.col("op") != "D").select(*PAYLOAD)
            s0 = time.perf_counter()
            r = apply_snapshot(snap_tbl, snapshot, snapshot_lsn=w)
            per.append((time.perf_counter() - s0, r["applied"]))
        snap_s = time.perf_counter() - t0

        a = {tuple(r) for r in tail.read().select(*PAYLOAD).collect()}
        b = {tuple(r) for r in snap_tbl.read().select(*PAYLOAD).collect()}
        assert a == b, "snapshot ingest diverged from the tail replay"

        print(f"events={n_events} deliveries={n_snaps} local[{cpus}]")
        print(
            f"tail replay : {tail_s:7.1f}s  {n_events / tail_s:>10,.0f} ev/s"
        )
        print(
            f"snapshots   : {snap_s:7.1f}s  {n_events / snap_s:>10,.0f} ev/s "
            "(includes per-delivery LWW snapshot synthesis)"
        )
        for i, (s, applied) in enumerate(per):
            print(
                f"  delivery {i + 1}: {s:6.1f}s  applied={applied:,} "
                f"({applied / s:,.0f} rows/s)"
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
