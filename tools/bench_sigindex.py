"""Signature-index maintenance scaling: is the incremental refresh
really O(changed docs), not O(corpus)?

At each corpus size N: build a docs lake table + signature index, then
apply one change batch of M docs (M fixed as N grows) and measure

1. refresh     — ``refresh_signature_index`` catch-up (diff + M
                 signatures + one merge);
2. recompute   — the from-scratch alternative: signatures of all N
                 docs (what a pipeline without the index pays per
                 ingest batch).

Scale-safe means the refresh column stays ~flat while recompute grows
~linearly with N. The index build itself is a one-time O(N) cost —
reported for disclosure, not a claim.

Corpus: synthetic docs derived deterministically from
``spark.range`` — ~60-word texts with doc_id-seeded token choices so
texts differ but share vocabulary (realistic shingle cardinality).

Usage: python tools/bench_sigindex.py [sizes_csv] [batch] [trials]
Defaults: 25000,100000,400000  batch=2000  trials=2.
Appends a disclosure block to BENCH/BASELINE.md with
DEXSPARK_SIGIDX_WRITE=1.
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

from dexspark.functions.dedup import minhash_signatures  # noqa: E402
from dexspark.lake import (  # noqa: E402
    LakeTable,
    create_signature_index,
    refresh_signature_index,
)
from dexspark.session import get_spark  # noqa: E402

DDL = "doc_id bigint, text string"


def synth_docs(spark, n, id_offset=0, salt=0):
    """~60-token texts, deterministic in (doc_id, salt)."""
    words = F.sequence(F.lit(0), F.lit(59))
    return spark.range(n).select(
        (F.col("id") + id_offset).alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                words,
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.xxhash64((F.col("id") + id_offset) * 61 + i + salt),
                        F.lit(512),
                    ).cast("string"),
                ),
            ),
        ).alias("text"),
    )


def main():
    sizes = [
        int(s)
        for s in (sys.argv[1] if len(sys.argv) > 1 else "25000,100000,400000").split(",")
    ]
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("dexspark-sigidx-bench")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for n in sizes:
        d = tempfile.mkdtemp(prefix="dexspark_sib_")
        try:
            src = LakeTable.create(
                spark, os.path.join(d, "src"),
                _parse_datatype_string(DDL), "doc_id", num_buckets=16,
            )
            idx = create_signature_index(spark, os.path.join(d, "idx"), src)
            corpus = synth_docs(spark, n)
            src.merge(
                corpus.withColumn("op", F.lit("I")).withColumn(
                    "lsn", F.lit(1).cast("long")
                ),
                key_cols=["doc_id"],
                summary={"batch_id": "corpus"},
            )
            t0 = time.perf_counter()
            refresh_signature_index(src, idx)
            build_sec = time.perf_counter() - t0

            best_refresh = float("inf")
            for trial in range(trials):
                # change M docs (updates with new text) — a fresh batch
                # per trial so the refresh has real work each time
                upd = synth_docs(
                    spark, batch, id_offset=trial * batch, salt=7 + trial
                )
                src.merge(
                    upd.withColumn("op", F.lit("U")).withColumn(
                        "lsn", F.lit(2 + trial).cast("long")
                    ),
                    key_cols=["doc_id"],
                    summary={"batch_id": f"b{trial}"},
                )
                t0 = time.perf_counter()
                refresh_signature_index(src, idx)
                best_refresh = min(best_refresh, time.perf_counter() - t0)

            t0 = time.perf_counter()
            minhash_signatures(
                src.read().select("doc_id", "text")
            ).agg(F.count(F.lit(1))).collect()
            recompute_sec = time.perf_counter() - t0
            rows.append((n, build_sec, best_refresh, recompute_sec))
            print(
                f"n={n}: build={build_sec:.1f}s refresh({batch} changed)="
                f"{best_refresh:.1f}s full-recompute={recompute_sec:.1f}s",
                flush=True,
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)
    spark.stop()

    lines = [
        "",
        f"Signature-index maintenance scaling (round 4, local[32], "
        f"{batch} changed docs per refresh, best of {trials}; corpus "
        "synthetic ~60-token docs):",
        "",
        "| corpus | index build (once) | incremental refresh | "
        "from-scratch signatures |",
        "|---|---|---|---|",
    ]
    for n, b, r, f_ in rows:
        lines.append(f"| {n:,} | {b:.1f}s | {r:.1f}s | {f_:.1f}s |")
    lines.append("")
    lines.append(
        "Refresh cost tracks the CHANGE batch (diff is bucket-pruned, "
        "signatures recomputed for changed docs only), while the "
        "no-index alternative re-shingles the whole corpus every "
        "ingest batch — the gap is the index's 100 TB case."
    )
    block = "\n".join(lines) + "\n"
    print(block)
    if os.environ.get("DEXSPARK_SIGIDX_WRITE") == "1":
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "BENCH", "BASELINE.md"), "a") as f:
            f.write(block)
        print("appended to BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
