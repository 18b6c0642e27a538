"""Hot-key skew resilience of the CDC replay (north-star claim: salt
hot conv_id keys to defuse shuffle skew at 10^10-event scale).

Measures the identical end-to-end replay (tail → validate → dedup →
merge) on logs where an increasing share of ALL events hits one
conversation (``hot_conv_pct``), with and without two-phase salted
dedup (``salt_buckets``). What theory predicts and the numbers should
confirm:

- The dedup aggregate (``max(struct(lsn, …))``) partial-combines
  map-side, so each input partition emits at most one row per
  (conv_id, turn_idx) — the post-shuffle hot-key volume is bounded by
  ``partitions × turns``, NOT by the event count. Skew in the LOG
  largely dies before the exchange.
- The residual skew is per-bucket merge work: the hot conversation's
  bucket rewrites more rows. That responds to ``num_buckets`` (and at
  cluster scale AQE skew-join splitting), not to salting.
- Salting therefore buys little at these shapes and costs a second
  shuffle phase — the honest result to record; it exists for the
  pathological single-(key,turn) flood where per-partition combine
  stops helping because ONE key dominates every input partition.

Appends a table to BENCH/BASELINE.md.

Usage: python tools/bench_skew.py [n_events] [trials]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.types import _parse_datatype_string  # noqa: E402

from bench import LOG_SCHEMA, PAYLOAD  # noqa: E402
from dexspark.cdc.generator import gen_change_log  # noqa: E402
from dexspark.lake import LakeTable  # noqa: E402
from dexspark.session import get_spark  # noqa: E402
from dexspark.streaming.replay import CdcStreamReplay  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))


def run_once(
    spark, n_events: int, hot_pct: int, salt: int | None
) -> tuple[float, int]:
    work = tempfile.mkdtemp(prefix="dexspark_skew_")
    try:
        from pyspark.sql import functions as F

        log_dir = os.path.join(work, "log")
        log = gen_change_log(
            spark,
            n_events,
            n_convs=max(200, n_events // 200),
            n_batches=4,
            hot_conv_pct=hot_pct,
        )
        (
            log.repartition(4 * 32, F.col("batch_seq"), F.pmod(F.col("lsn"), 32))
            .write.partitionBy("batch_seq")
            .parquet(log_dir)
        )
        table = LakeTable.create(
            spark,
            os.path.join(work, "transcripts"),
            _parse_datatype_string(PAYLOAD),
            "conv_id",
            num_buckets=64,
        )
        replay = CdcStreamReplay(
            spark,
            table,
            log_dir + "/*",
            os.path.join(work, "cp"),
            _parse_datatype_string(LOG_SCHEMA),
            salt_buckets=salt,
        )
        t0 = time.perf_counter()
        results = replay.run_available()
        elapsed = time.perf_counter() - t0
        return elapsed, sum(r.get("applied", 0) for r in results)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(
        "bench-skew", master=f"local[{CPUS}]", shuffle_partitions=CPUS * 4
    )
    shapes = [(0, None), (25, None), (25, 16), (50, None), (50, 16)]
    rows = []
    for hot, salt in shapes:
        best, applied, all_runs = None, 0, []
        for _ in range(trials):
            sec, app = run_once(spark, n_events, hot, salt)
            all_runs.append(round(sec, 2))
            if best is None or sec < best:
                best, applied = sec, app
        rows.append((hot, salt, best, applied, all_runs))
        print(
            f"hot={hot}% salt={salt}: best {best:.2f}s "
            f"({n_events / best / 1000:.0f}k ev/s), trials {all_runs}",
            flush=True,
        )
    base = rows[0][2]
    lines = [
        "",
        "## Hot-key skew resilience (uniform vs single hot conversation)",
        "",
        f"Same end-to-end replay as the headline bench: {n_events:,} events,"
        f" 4 micro-batches, 64 buckets, local[{CPUS}],"
        f" best of {trials} trials (all trials shown).",
        "",
        "| hot-key share | salt_buckets | sec | ev/s | vs uniform | trials |",
        "|---|---|---|---|---|---|",
    ]
    for hot, salt, sec, _applied, all_runs in rows:
        lines.append(
            f"| {hot}% | {salt or '—'} | {sec:.2f} "
            f"| {n_events / sec / 1000:.0f}k | {base / sec:.2f}× | {all_runs} |"
        )
    lines += [
        "",
        "Reading: the dedup aggregate partial-combines hot keys map-side"
        " (one row per key per input partition survives to the exchange),"
        " so log-level skew is absorbed before the shuffle; the residual"
        " cost is the hot bucket's larger merge rewrite, which scales"
        " with num_buckets, not salting. Salting (two-phase aggregate)"
        " is the escape hatch for a single-(conv,turn) flood where"
        " map-side combine stops reducing volume.",
        "",
    ]
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "BASELINE.md",
    )
    with open(out, "a") as fh:
        fh.write("\n".join(lines))
    print(f"appended to {out}")


if __name__ == "__main__":
    main()
