"""Vector-index maintenance + query scaling: is the refresh
O(changed vectors), and does probing the index beat re-assigning the
corpus per query batch?

At each corpus size N: build a vectors lake table + IVF inverted
file, then

1. refresh      — catch-up after a fixed-size change batch (M vectors
                  re-embedded; includes the retract-on-cell-move
                  handling);
2. query(index) — ``ivf_topk_via_index``: probe-cell reads + rerank;
3. query(batch) — ``ivf_topk``: full corpus cell re-assignment per
                  query batch (the no-index alternative).

Scale-safe means refresh and query(index) stay ~flat while
query(batch) grows with N. The one-time index build is disclosed.

Usage: python tools/bench_vecindex.py [sizes_csv] [batch] [trials]
Defaults: 25000,100000,400000  batch=2000  trials=2.
Appends a disclosure block to BENCH/BASELINE.md with
DEXSPARK_VECIDX_WRITE=1.
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

from dexspark.functions.similarity import ivf_topk  # noqa: E402
from dexspark.lake import (  # noqa: E402
    LakeTable,
    create_vector_index,
    ivf_topk_via_index,
    refresh_vector_index,
)
from dexspark.session import get_spark  # noqa: E402

DDL = "vec_id bigint, embedding array<float>"
DIM = 64
N_CENTROIDS = 64
N_PROBE = 4
K = 10


def synth_vecs(spark, n, id_offset=0, salt=0):
    """Deterministic pseudo-random vectors in [-8, 8]^DIM."""
    dims = F.sequence(F.lit(0), F.lit(DIM - 1))
    return spark.range(n).select(
        (F.col("id") + id_offset).alias("vec_id"),
        F.transform(
            dims,
            lambda d: (
                F.pmod(
                    F.xxhash64((F.col("id") + id_offset) * 131 + d + salt),
                    F.lit(17),
                )
                - 8
            ).cast("float"),
        ).alias("embedding"),
    )


def timed(fn, trials):
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    sizes = [
        int(s)
        for s in (sys.argv[1] if len(sys.argv) > 1 else "25000,100000,400000").split(",")
    ]
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("dexspark-vecidx-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = synth_vecs(spark, 16, id_offset=10_000_000, salt=99).select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).persist()
    queries.count()
    rows = []
    for n in sizes:
        d = tempfile.mkdtemp(prefix="dexspark_vib_")
        try:
            src = LakeTable.create(
                spark, os.path.join(d, "src"),
                _parse_datatype_string(DDL), "vec_id", num_buckets=16,
            )
            idx = create_vector_index(
                spark, os.path.join(d, "idx"), src, num_buckets=16
            )
            src.merge(
                synth_vecs(spark, n).withColumn("op", F.lit("I")).withColumn(
                    "lsn", F.lit(1).cast("long")
                ),
                key_cols=["vec_id"], summary={"batch_id": "corpus"},
            )
            t0 = time.perf_counter()
            refresh_vector_index(src, idx, dim=DIM, n_centroids=N_CENTROIDS)
            build_sec = time.perf_counter() - t0

            best_refresh = float("inf")
            for trial in range(trials):
                upd = synth_vecs(spark, batch, salt=7 + trial)
                src.merge(
                    upd.withColumn("op", F.lit("U")).withColumn(
                        "lsn", F.lit(2 + trial).cast("long")
                    ),
                    key_cols=["vec_id"], summary={"batch_id": f"b{trial}"},
                )
                t0 = time.perf_counter()
                refresh_vector_index(
                    src, idx, dim=DIM, n_centroids=N_CENTROIDS
                )
                best_refresh = min(best_refresh, time.perf_counter() - t0)

            q_idx = timed(
                lambda: ivf_topk_via_index(
                    idx, queries, dim=DIM, k=K,
                    n_centroids=N_CENTROIDS, n_probe=N_PROBE,
                ).agg(F.count(F.lit(1))).collect(),
                trials,
            )
            q_batch = timed(
                lambda: ivf_topk(
                    src.read(), queries, dim=DIM, k=K,
                    n_centroids=N_CENTROIDS, n_probe=N_PROBE,
                ).agg(F.count(F.lit(1))).collect(),
                trials,
            )
            rows.append((n, build_sec, best_refresh, q_idx, q_batch))
            print(
                f"n={n}: build={build_sec:.1f}s refresh({batch})="
                f"{best_refresh:.1f}s query_idx={q_idx:.1f}s "
                f"query_batch={q_batch:.1f}s",
                flush=True,
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)
    spark.stop()

    lines = [
        "",
        f"IVF vector-index maintenance + query scaling (round 4, "
        f"local[32], dim {DIM}, {N_CENTROIDS} centroids, probe "
        f"{N_PROBE}, 16 queries, {batch} re-embedded vectors per "
        f"refresh, best of {trials}):",
        "",
        "| corpus | index build (once) | incremental refresh | "
        "top-k via index | top-k batch (no index) |",
        "|---|---|---|---|---|",
    ]
    for n, b, r, qi, qb in rows:
        lines.append(
            f"| {n:,} | {b:.1f}s | {r:.1f}s | {qi:.1f}s | {qb:.1f}s |"
        )
    lines.append("")
    lines.append(
        "Refresh tracks the change batch (cell re-assignment for "
        "changed vectors only, retract-on-move); the index query reads "
        "only the probed cells' files (bucket + stats pruning on the "
        "cell key), while the no-index path re-assigns the whole "
        "corpus per query batch."
    )
    block = "\n".join(lines) + "\n"
    print(block)
    if os.environ.get("DEXSPARK_VECIDX_WRITE") == "1":
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "BENCH", "BASELINE.md"), "a") as f:
            f.write(block)
        print("appended to BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
