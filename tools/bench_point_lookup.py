"""Point-lookup + RTBF pruning micro-bench: what do bucket derivation
(key = pmod(xxhash64, n)), min/max stats, and per-file key blooms
(lake/bloom.py) buy on a fragmented table?

Three measurements over the same table (N rows, 32 buckets, appended
in S ts-interleaved slices so each bucket holds S files and min/max
cannot decide anything):

1. baseline   — read().filter(key = v).count(): scans every file.
2. pruned     — read(filters=[(key,'=',v)]).count(): bucket derivation
                cuts to 1/32, blooms cut to the files that may hold the
                key (appends build blooms).
3. RTBF delete — delete_where(key = v): files_rewritten vs total.

Usage: python tools/bench_point_lookup.py [n_rows] [n_slices] [trials]
Appends a disclosure block to BENCH/BASELINE.md with
DEXSPARK_POINT_LOOKUP_WRITE=1.
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

from dexspark.lake import LakeTable  # noqa: E402
from dexspark.session import get_spark  # noqa: E402

SCHEMA_DDL = "conv_id string, turn_idx int, text string, ts timestamp"


def timed(fn, trials: int):
    best, out = float("inf"), None
    for _ in range(trials):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_slices = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("dexspark-point-lookup")
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="dexspark_pl_")
    try:
        table = LakeTable.create(
            spark, os.path.join(d, "t"),
            _parse_datatype_string(SCHEMA_DDL), "conv_id", num_buckets=32,
        )
        base = spark.range(n_rows).select(
            F.concat(F.lit("conv_"), (F.col("id") % 200_000).cast("string")
                     ).alias("conv_id"),
            (F.col("id") % 16).cast("int").alias("turn_idx"),
            F.concat(F.lit("text for row "), F.col("id").cast("string")
                     ).alias("text"),
            F.timestamp_seconds(1704067200 + F.col("id") % 86_400).alias("ts"),
        )
        for s in range(n_slices):
            table.append(base.filter(F.col("conv_id").isNotNull())
                         .filter((F.xxhash64("text") % n_slices) == s - 0))
        m = table.manifest()
        n_files = len(m.files)
        key = "conv_7777"
        # warm-up
        table.read().count()
        base_sec, base_n = timed(
            lambda: table.read().filter(F.col("conv_id") == key).count(),
            trials,
        )
        pr_df = table.read(filters=[("conv_id", "=", key)])
        pruned_files = len(pr_df.inputFiles())
        pruned_sec, pruned_n = timed(
            lambda: table.read(filters=[("conv_id", "=", key)]).count(),
            trials,
        )
        assert base_n == pruned_n, (base_n, pruned_n)
        t0 = time.perf_counter()
        dinfo = table.delete_where([("conv_id", "=", "conv_8888")])
        del_sec = time.perf_counter() - t0
        print(
            f"files={n_files} rows_hit={base_n} "
            f"baseline={base_sec:.2f}s pruned={pruned_sec:.2f}s "
            f"({pruned_files} files) "
            f"rtbf: {dinfo['matched_rows']} rows, "
            f"{dinfo['files_rewritten']}/{n_files} files rewritten, "
            f"{del_sec:.2f}s",
            flush=True,
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()

    block = (
        "\n"
        f"Point-lookup pruning (round 4, local[32], {n_rows:,} rows / "
        f"200k conversations over 32 buckets x {n_slices} interleaved "
        f"append slices = {n_files} files; best of {trials} on a warm "
        "JVM):\n\n"
        "| path | wall | files scanned |\n|---|---|---|\n"
        f"| read().filter(conv_id = X) — full scan | {base_sec:.2f}s | "
        f"{n_files} |\n"
        f"| read(filters=[(conv_id,'=',X)]) — bucket + bloom pruned | "
        f"{pruned_sec:.2f}s | {pruned_files} |\n\n"
        f"RTBF delete of one conversation: {dinfo['matched_rows']} rows, "
        f"rewrote {dinfo['files_rewritten']} of {n_files} files in "
        f"{del_sec:.2f}s (surgical commit; untouched files carry over "
        "byte-identical). Bucket derivation alone gives 1/32; the bloom "
        "sidecars decide WHICH of the bucket's files hold the key.\n"
    )
    print(block)
    if os.environ.get("DEXSPARK_POINT_LOOKUP_WRITE") == "1":
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "BENCH", "BASELINE.md"), "a") as f:
            f.write(block)
        print("appended to BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
