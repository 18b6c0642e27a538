"""Routed fan-out overhead: what does demuxing one change stream into
N destination tables cost vs applying it to one table?

The work conserved across shapes is the event volume: N destinations
each validate/dedup/merge ~1/N of the rows, so the data-plane cost is
flat by construction. What grows with N is the control plane — one
Spark job per destination per micro-batch (the filters over the one
persisted stamped batch), N smaller merges, N manifest commits. This
bench measures that overhead directly: the same log replayed through
RoutedCdcStreamReplay at N ∈ {1, 2, 4, 8} destinations (N=1 is the
router's own single-destination case, isolating pure router overhead
from the plain CdcStreamReplay reference row).

At cluster scale the sequential per-destination loop underestimates
achievable throughput — destinations are independent jobs a scheduler
pool can run concurrently — so the single-process number here is the
WORST case for the fan-out.

Appends a table to BENCH/BASELINE.md.

Usage: python tools/bench_router.py [n_events] [trials]
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
from dexspark.cdc.router import RoutedCdcStreamReplay  # noqa: E402
from dexspark.lake import LakeTable  # noqa: E402
from dexspark.operators.routing import routes_df  # noqa: E402
from dexspark.session import get_spark  # noqa: E402
from dexspark.streaming.replay import CdcStreamReplay  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
BUCKETS_PER_DEST = 32


def _write_log(spark, work: str, n_events: int, n_dests: int) -> str:
    from pyspark.sql import functions as F

    log_dir = os.path.join(work, "log")
    log = gen_change_log(
        spark, n_events, n_convs=max(200, n_events // 200), n_batches=4
    ).withColumn(
        "stream_id",
        F.concat(
            F.lit("s"),
            F.pmod(F.xxhash64("conv_id"), F.lit(n_dests)).cast("string"),
        ),
    )
    (
        log.repartition(4 * 32, F.col("batch_seq"), F.pmod(F.col("lsn"), 32))
        .write.partitionBy("batch_seq")
        .parquet(log_dir)
    )
    return log_dir


def run_plain(spark, n_events: int) -> tuple[float, int]:
    work = tempfile.mkdtemp(prefix="dexspark_rt_")
    try:
        log_dir = _write_log(spark, work, n_events, 1)
        table = LakeTable.create(
            spark,
            os.path.join(work, "t"),
            _parse_datatype_string(PAYLOAD),
            "conv_id",
            num_buckets=BUCKETS_PER_DEST,
        )
        replay = CdcStreamReplay(
            spark,
            table,
            log_dir + "/*",
            os.path.join(work, "cp"),
            _parse_datatype_string(LOG_SCHEMA + ", stream_id string"),
        )
        t0 = time.perf_counter()
        results = replay.run_available()
        return time.perf_counter() - t0, sum(
            r.get("applied", 0) for r in results
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def run_routed(
    spark, n_events: int, n_dests: int, concurrency: int = 1
) -> tuple[float, int]:
    work = tempfile.mkdtemp(prefix="dexspark_rt_")
    try:
        log_dir = _write_log(spark, work, n_events, n_dests)
        tables = {
            f"t{i}": LakeTable.create(
                spark,
                os.path.join(work, f"t{i}"),
                _parse_datatype_string(PAYLOAD),
                "conv_id",
                num_buckets=BUCKETS_PER_DEST,
            )
            for i in range(n_dests)
        }
        routes = routes_df(
            spark,
            [
                {"route": f"t{i}", "message_types": [f"s{i}"]}
                for i in range(n_dests)
            ],
        )
        tables["misc"] = tables["t0"]  # fallback never fires; alias, not a copy
        replay = RoutedCdcStreamReplay(
            spark,
            tables,
            routes,
            log_dir + "/*",
            os.path.join(work, "cp"),
            _parse_datatype_string(LOG_SCHEMA + ", stream_id string"),
            concurrency=concurrency,
        )
        t0 = time.perf_counter()
        results = replay.run_available()
        applied = sum(
            r.get("applied", 0)
            for res in results
            for r in res["routes"].values()
        )
        return time.perf_counter() - t0, applied
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(
        "bench-router", master=f"local[{CPUS}]", shuffle_partitions=CPUS * 4
    )
    rows = []
    best_plain, all_plain = None, []
    for _ in range(trials):
        sec, _ = run_plain(spark, n_events)
        all_plain.append(round(sec, 2))
        best_plain = sec if best_plain is None else min(best_plain, sec)
    rows.append(("plain (CdcStreamReplay)", best_plain, all_plain))
    print(f"plain: best {best_plain:.2f}s, trials {all_plain}", flush=True)
    for n, conc in ((1, 1), (2, 1), (4, 1), (8, 1), (4, 4), (8, 4)):
        best, runs = None, []
        for _ in range(trials):
            sec, _ = run_routed(spark, n_events, n, concurrency=conc)
            runs.append(round(sec, 2))
            best = sec if best is None else min(best, sec)
        name = f"routed N={n}" + (f" conc={conc}" if conc > 1 else "")
        rows.append((name, best, runs))
        print(f"{name}: best {best:.2f}s, trials {runs}", flush=True)
    lines = [
        "",
        "## Routed fan-out overhead (one stream -> N destination tables)",
        "",
        f"Same end-to-end replay as the headline bench: {n_events:,} events,"
        f" 4 micro-batches, {BUCKETS_PER_DEST} buckets per destination,"
        f" local[{CPUS}], best of {trials} (all trials shown)."
        " Route = hash(conv_id) % N, so destinations are balanced and"
        " the data-plane work is conserved across shapes.",
        "",
        "| shape | sec | ev/s | vs plain | trials |",
        "|---|---|---|---|---|",
    ]
    for name, sec, runs in rows:
        lines.append(
            f"| {name} | {sec:.2f} | {n_events / sec / 1000:.0f}k "
            f"| {best_plain / sec:.2f}x | {runs} |"
        )
    lines += [
        "",
        "Reading: N=1 vs plain is the router's fixed cost (route stamp +"
        " batch persist + per-route count job); growth with N at conc=1"
        " is the control plane — one filter job + merge + manifest commit"
        " per destination per micro-batch, each over ~1/N of the rows."
        " The conc=4 rows apply destinations from concurrent driver"
        " threads (they share no state), buying back the sequential"
        " loop's idle time — the same overlap a cluster scheduler gets"
        " for free across independent jobs.",
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
