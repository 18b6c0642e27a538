"""ANN scaling spot-check (mirrors the round-3 near-dup one): run the
approximate top-k operators (`ann_lsh_topk`, `ivf_topk`) over synthetic
clustered corpora from 5k to 400k vectors and report, at each size,
wall time, throughput, and recall@k against the exact `cosine_topk`
oracle computed on the same corpus.

What "scale-safe" must mean here: as the corpus grows, (a) wall time
grows sub-linearly (per-query fixed costs amortize; the bucket/probe
joins stay candidate-bounded), and (b) recall does NOT collapse —
the candidate sets keep containing the true neighbors because the
synthetic corpus keeps its cluster geometry at every size.

Corpus: `n_clusters` seeded Gaussian centers on the unit sphere; each
vector = its cluster center + sigma*noise (seeded per-index, so the
corpus at 5k is a strict prefix of the corpus at 400k). Queries are
perturbed copies of evenly-spaced corpus vectors — every query has
genuine near neighbors at every corpus size.

Usage: python tools/bench_ann_scale.py [sizes_csv] [k] [trials]
Defaults: 5000,25000,100000,400000  k=10  trials=2 (+1 warm-up at the
smallest size). Appends a disclosure block to BENCH/BASELINE.md when
run with DEXSPARK_ANN_WRITE=1.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dexspark.functions.similarity import (  # noqa: E402
    ann_lsh_topk,
    cosine_topk,
    ivf_topk,
)
from dexspark.session import get_spark  # noqa: E402

DIM = 64
N_CLUSTERS = 256
# per-dim noise; over DIM=64 dims ||noise||^2 = 64*SIGMA^2 = 0.10, so
# within-cluster cosine ~ 1/(1+0.10) ~ 0.90 — the "genuine near
# neighbor" regime ANN is used for (sigma 0.15 would give cos ~ 0.41:
# no meaningful neighbors to recall)
SIGMA = 0.04
N_QUERIES = 20
SEED = 42


def make_corpus(n: int) -> np.ndarray:
    """Deterministic clustered corpus; row i only depends on i, so
    smaller sizes are prefixes of larger ones."""
    rng = np.random.default_rng(SEED)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    noise_rng = np.random.default_rng(SEED + 1)
    noise = noise_rng.standard_normal((n, DIM)) * SIGMA
    vecs = centers[np.arange(n) % N_CLUSTERS] + noise
    return (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(
        np.float32
    )


def write_corpus(spark, vecs: np.ndarray, path: str, parts: int = 32):
    import pandas as pd

    n = len(vecs)
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(vecs)}
    )
    sdf = spark.createDataFrame(pdf).repartition(parts)
    sdf.write.mode("overwrite").parquet(path)


def make_queries(spark, vecs: np.ndarray):
    import pandas as pd

    rng = np.random.default_rng(SEED + 2)
    idx = np.linspace(0, len(vecs) - 1, N_QUERIES).astype(int)
    q = vecs[idx] + rng.standard_normal((N_QUERIES, DIM)).astype(np.float32) * 0.02
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    pdf = pd.DataFrame(
        {
            # query ids out of corpus-id range so the self-match filter
            # never hides a genuine neighbor
            "query_id": np.arange(N_QUERIES, dtype=np.int64) + 10_000_000,
            "embedding": list(q.astype(np.float32)),
        }
    )
    return spark.createDataFrame(pdf)


def neighbor_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def recall(approx: dict[int, set[int]], exact: dict[int, set[int]], k: int) -> float:
    hit = sum(len(approx.get(q, set()) & nbrs) for q, nbrs in exact.items())
    return hit / (len(exact) * k)


def timed(fn, trials: int) -> tuple[float, list[float]]:
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        times.append(round(time.perf_counter() - t0, 2))
    return min(times), times


def main():
    sizes = [
        int(x)
        for x in (sys.argv[1] if len(sys.argv) > 1 else "5000,25000,100000,400000").split(",")
    ]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("dexspark-ann-scale", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="dexspark_ann_")
    rows = []
    try:
        all_vecs = make_corpus(max(sizes))
        for i, n in enumerate(sorted(sizes)):
            path = os.path.join(d, f"corpus_{n}")
            write_corpus(spark, all_vecs[:n], path)
            corpus = spark.read.parquet(path)
            queries = make_queries(spark, all_vecs[:n])
            exact = neighbor_sets(cosine_topk(corpus, queries, k=k))
            if i == 0:
                # warm-up: JVM + codegen + Arrow path, excluded from timing
                ann_lsh_topk(
                    corpus, queries, dim=DIM, k=k, n_bits=4, n_bands=4
                ).count()
                ivf_topk(
                    corpus, queries, dim=DIM, k=k, n_centroids=64, n_probe=16
                ).count()
            res = {}
            lsh_df = ann_lsh_topk(
                corpus, queries, dim=DIM, k=k, n_bits=4, n_bands=4
            )
            best, ts = timed(lambda: lsh_df.count(), trials)
            res["lsh"] = (best, ts, recall(neighbor_sets(lsh_df), exact, k))
            ivf_df = ivf_topk(
                corpus, queries, dim=DIM, k=k, n_centroids=64, n_probe=16
            )
            best, ts = timed(lambda: ivf_df.count(), trials)
            res["ivf"] = (best, ts, recall(neighbor_sets(ivf_df), exact, k))
            rows.append((n, res))
            for name, (b, ts, r) in res.items():
                print(
                    f"n={n:>7} {name}: best={b:.2f}s trials={ts} "
                    f"recall@{k}={r:.3f} vecs/sec={n / b:,.0f}",
                    flush=True,
                )
    finally:
        shutil.rmtree(d, ignore_errors=True)

    lines = [
        "",
        f"ANN scaling spot-check (round 4, local[32], dim={DIM}, "
        f"{N_QUERIES} queries, k={k}; LSH 4 bands x 4 bits "
        "(OR-amplified), IVF 64 cells / 16 probes; recall measured "
        "against the exact cosine_topk oracle on the same corpus; "
        f"best of {trials} trials, warm-up excluded):",
        "",
        "| vectors | LSH wall | LSH recall | LSH vecs/sec | IVF wall | IVF recall | IVF vecs/sec |",
        "|---|---|---|---|---|---|---|",
    ]
    for n, res in rows:
        lb, lt, lr = res["lsh"]
        ib, it, ir = res["ivf"]
        lines.append(
            f"| {n:,} | {lb:.2f}s {lt} | {lr:.3f} | {n / lb:,.0f} "
            f"| {ib:.2f}s {it} | {ir:.3f} | {n / ib:,.0f} |"
        )
    block = "\n".join(lines) + "\n"
    print(block)
    if os.environ.get("DEXSPARK_ANN_WRITE") == "1":
        with open(
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "BASELINE.md"),
            "a",
        ) as f:
            f.write(block)
        print("appended to BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
