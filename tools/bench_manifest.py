"""Commit-metadata cost: format-1 inline manifests vs format-2
content-addressed per-bucket shards (lake/manifest.py).

Pure-metadata bench (no Spark): build a snapshot of F data-file
entries across B buckets, then measure the cost of the NEXT commit
when a batch touches only K buckets — the streaming-ingest steady
state at large table sizes. Reports wall time and bytes physically
written for both formats.

Usage: python tools/bench_manifest.py [files] [buckets] [touched]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dexspark.lake import manifest as mf  # noqa: E402


def mk_files(n, buckets, gen=0):
    return [
        mf.DataFile(
            path=f"data/tok{gen if i % buckets < TOUCH else 0}/_bucket={i % buckets}/part-{i:07d}.parquet",
            bucket=i % buckets,
            schema_id=1,
            stats={"lsn": [i * 10, i * 10 + 9]},
            rows=10_000,
            bloom=True,
        )
        for i in range(n)
    ]


def du(d):
    total = 0
    for dirpath, _dirs, names in os.walk(d):
        for n in names:
            total += os.path.getsize(os.path.join(dirpath, n))
    return total


def run(fmt_threshold, n_files, buckets, touched, label, with_memo=False):
    d = tempfile.mkdtemp(prefix="dexspark_mbench_")
    old = mf.SEGMENT_THRESHOLD
    mf.SEGMENT_THRESHOLD = fmt_threshold
    try:
        base = mf.Manifest(
            version=1, current_schema_id=1,
            schemas={1: "{}"}, bucket_key="k", num_buckets=buckets,
            files=mk_files(n_files, buckets, gen=0),
            summary={"operation": "merge"},
        )
        mf.commit_manifest(d, base)
        size0 = du(d)
        # steady-state commit: rewrite `touched` buckets' files
        nxt_files = [
            (
                mf.DataFile(
                    path=f.path.replace("tok0", "tok1"), bucket=f.bucket,
                    schema_id=1, stats=f.stats, rows=f.rows, bloom=True,
                )
                if f.bucket < touched
                else f
            )
            for f in base.files
        ]
        nxt = mf.Manifest(
            version=2, current_schema_id=1,
            schemas={1: "{}"}, bucket_key="k", num_buckets=buckets,
            files=nxt_files, summary={"operation": "merge"}, parent=1,
        )
        t0 = time.perf_counter()
        mf.commit_manifest(d, nxt, base=base if with_memo else None)
        dt = time.perf_counter() - t0
        wrote = du(d) - size0
        mf._READ_CACHE.clear()  # report the COLD read cost
        t0 = time.perf_counter()
        m = mf.read_manifest(d, 2)
        rt = time.perf_counter() - t0
        assert len(m.files) == n_files
        print(
            f"{label:>8}: commit {dt*1000:8.1f} ms  wrote {wrote/1e6:8.2f} MB"
            f"  read {rt*1000:8.1f} ms"
        )
        return dt, wrote
    finally:
        mf.SEGMENT_THRESHOLD = old
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    TOUCH = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    print(f"files={N} buckets={B} touched_buckets={TOUCH}")
    t1, w1 = run(10**12, N, B, TOUCH, "format1")
    t2, w2 = run(1, N, B, TOUCH, "format2")
    t3, w3 = run(1, N, B, TOUCH, "fmt2+memo", with_memo=True)
    print(
        f"steady-state commit: {t1/t3:.0f}x faster, "
        f"{w1/max(w3,1):.0f}x less write I/O with segmented manifests "
        "(memo = the _commit_next path: base manifest supplied)"
    )
