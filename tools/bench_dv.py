"""Deletion-vector vs copy-on-write DELETE micro-bench (lake/dv.py).

Scenario: the worst case for a rewriting delete — a predicate sliver
that touches EVERY file (ts-interleaved append slices, so min/max
stats cannot prune and copy mode must rewrite the whole table), while
matching only a small fraction of rows. This is the scattered-RTBF /
pre-clustering retention shape the dv strategy exists for.

Measured on twin tables (same rows, same layout):

1. copy delete   — delete_where(pred): rewrites all candidate files.
2. dv delete     — delete_where(pred, strategy="dv"): commits (file,
                   position) vectors, zero data-file rewrites.
3. read overhead — read().count() on the dv'd table (anti-join in the
                   plan) vs on the copy table (plain scan).
4. purge         — compact() on the dv'd table: the deferred rewrite,
                   paid once on the maintenance schedule instead of
                   inside the delete.

Usage: python tools/bench_dv.py [n_rows] [n_slices] [trials]
Appends a disclosure block to BENCH/BASELINE.md with
DEXSPARK_DV_WRITE=1.
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


def build(spark, d, n_rows, n_slices):
    table = LakeTable.create(
        spark, d, _parse_datatype_string(SCHEMA_DDL), "conv_id",
        num_buckets=32,
    )
    per = n_rows // n_slices
    for s in range(n_slices):
        # ts interleaves across slices: every file's [min,max] spans
        # the whole range, so stats prune nothing (the honest worst
        # case for copy mode)
        sl = spark.range(per).select(
            F.concat(F.lit("c"), (F.col("id") % 50_000).cast("string"))
            .alias("conv_id"),
            (F.col("id") % 16).cast("int").alias("turn_idx"),
            F.concat(F.lit("slice"), F.lit(s), F.lit(" row "),
                     F.col("id").cast("string")).alias("text"),
            F.timestamp_seconds(
                F.lit(1704067200) + (F.col("id") * n_slices + s) % 86_400
            ).alias("ts"),
        )
        table.append(sl)
    return table


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_slices = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    spark = get_spark("dexspark-dv-bench")
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="dexspark_dvb_")
    try:
        import datetime as dt

        lo = dt.datetime(2024, 1, 1, 0, 0, 0)
        hi = dt.datetime(2024, 1, 1, 0, 7, 12)  # 432/86400 = 0.5% of rows
        pred = [("ts", ">=", lo), ("ts", "<", hi)]

        t_copy = build(spark, os.path.join(d, "copy"), n_rows, n_slices)
        t_dv = build(spark, os.path.join(d, "dv"), n_rows, n_slices)
        n_files = len(t_copy.manifest().files)

        s_copy, i_copy = timed(
            lambda: t_copy.delete_where(pred), 1
        )
        s_dv, i_dv = timed(
            lambda: t_dv.delete_where(pred, strategy="dv"), 1
        )
        assert i_copy["matched_rows"] == i_dv["matched_rows"]

        s_read_copy, n1 = timed(lambda: t_copy.read().count(), trials)
        s_read_dv, n2 = timed(lambda: t_dv.read().count(), trials)
        assert n1 == n2, (n1, n2)

        s_purge, _ = timed(lambda: t_dv.compact(), 1)
        s_read_purged, n3 = timed(lambda: t_dv.read().count(), trials)
        assert n3 == n2

        lines = [
            f"rows={n_rows} files={n_files} matched={i_dv['matched_rows']} "
            f"({100*i_dv['matched_rows']/n_rows:.2f}% of rows, every file a "
            "candidate)",
            f"copy delete : {s_copy:7.2f}s  files_rewritten="
            f"{i_copy['files_rewritten']}",
            f"dv delete   : {s_dv:7.2f}s  files_rewritten=0  "
            f"positions={i_dv['dv_positions_added']}  "
            f"({s_copy / s_dv:.1f}x faster commit)",
            f"read clean  : {s_read_copy:7.2f}s   read dv'd: "
            f"{s_read_dv:7.2f}s  ({s_read_dv / s_read_copy:.2f}x)  "
            f"read post-purge: {s_read_purged:7.2f}s",
            f"compact purge (deferred rewrite): {s_purge:7.2f}s",
        ]
        print("\n".join(lines))
        if os.environ.get("DEXSPARK_DV_WRITE"):
            with open(
                os.path.join(
                    os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))),
                    "BENCH", "BASELINE.md",
                ),
                "a",
            ) as fh:
                fh.write(
                    "\n## Deletion-vector vs copy DELETE "
                    "(tools/bench_dv.py)\n\n```\n"
                    + "\n".join(lines)
                    + "\n```\n"
                )
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
