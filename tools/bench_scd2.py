"""SCD2 (full-history) vs SCD1 (latest-image) replay cost.

Same harness as bench.py's run_cdc_replay — generated change log,
streaming tail, foreachBatch apply — with mode="scd2" writing the
interval-chain history table. Prints one JSON line per strategy.

Usage: python tools/bench_scd2.py [n_events] [n_trials]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import _parse_datatype_string  # noqa: E402

from dexspark.cdc.generator import gen_change_log  # noqa: E402
from dexspark.cdc.scd2 import scd2_schema  # noqa: E402
from dexspark.lake.table import LakeTable  # noqa: E402
from dexspark.session import get_spark  # noqa: E402
from dexspark.streaming.replay import CdcStreamReplay  # noqa: E402

PAYLOAD = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)
LOG_SCHEMA = "lsn long, op string, batch_seq long, " + PAYLOAD


def run(spark, n_events: int, mode: str, n_batches: int = 4, num_buckets: int = 64):
    work = tempfile.mkdtemp(prefix="dexspark_bscd2_")
    try:
        log_dir = os.path.join(work, "log")
        log = gen_change_log(
            spark, n_events, n_convs=max(200, n_events // 200),
            n_batches=n_batches, hot_conv_pct=5,
        )
        (
            log.repartition(n_batches * 32, F.col("batch_seq"), F.pmod(F.col("lsn"), 32))
            .write.partitionBy("batch_seq")
            .parquet(log_dir)
        )
        schema = _parse_datatype_string(PAYLOAD)
        if mode == "scd2":
            schema = scd2_schema(schema)
        table = LakeTable.create(
            spark, os.path.join(work, "t"), schema, "conv_id",
            num_buckets=num_buckets,
        )
        replay = CdcStreamReplay(
            spark, table, log_dir + "/*", os.path.join(work, "cp"),
            _parse_datatype_string(LOG_SCHEMA), mode=mode,
        )
        t0 = time.perf_counter()
        results = replay.run_available()
        elapsed = time.perf_counter() - t0
        rows = table.read().count()
        return elapsed, rows, results
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench-scd2", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    for mode in ("scd1", "scd2"):
        times = []
        rows = None
        for _ in range(trials):
            elapsed, rows, _res = run(spark, n_events, mode)
            times.append(round(elapsed, 2))
        best = min(times)
        print(json.dumps({
            "mode": mode,
            "events": n_events,
            "sec": best,
            "events_per_sec": round(n_events / best, 1),
            "table_rows": rows,
            "trials": times,
        }))


if __name__ == "__main__":
    main()
