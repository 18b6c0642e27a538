"""Layout evolution cost: evolve_layout (metadata-only) vs rebucket
(eager full rewrite), plus the read-side cost of operating MIXED.

The 100 TB question this answers with numbers: when a table outgrows
its bucket count mid-ingest, what does the resize itself cost, and
what do readers pay while migration is in flight?

Stages (one Spark session, local[N]):
1. build a table of R rows at B_old buckets (several appends so the
   file count is realistic);
2. `evolve_layout(B_new)` — wall time of the commit (expected:
   milliseconds, O(manifest));
3. full-scan read + point lookup while MIXED (old-layout files only);
4. a COW merge touching a few keys (migrates its closure — the
   incremental step), then `maintain()` loops until converged —
   total migration wall time, amortizable over normal operation;
5. fresh copy of the same table: `rebucket(B_new)` — wall time of
   the eager rewrite (expected: O(table));
6. full-scan read + point lookup on the converged table.

Prints one JSON line. Usage:
  python tools/bench_layout.py [rows] [b_old] [b_new]
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

from dexspark.lake.table import LakeTable  # noqa: E402
from dexspark.session import get_spark  # noqa: E402

SCHEMA = "k string, seq long, v string"
CH = SCHEMA + ", op string, lsn long"


def build(spark, d, rows, buckets, appends=8):
    t = LakeTable.create(
        spark, d, _parse_datatype_string(SCHEMA), "k", num_buckets=buckets
    )
    per = rows // appends
    for a in range(appends):
        df = (
            spark.range(a * per, (a + 1) * per)
            .select(
                F.concat(F.lit("k"), F.col("id")).alias("k"),
                F.col("id").alias("seq"),
                F.concat(F.lit("v"), F.col("id")).alias("v"),
            )
        )
        t.append(df)
    return t


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    b_old = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    b_new = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench-layout", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    base = tempfile.mkdtemp(prefix="dexspark_lbench_")
    out: dict = {"rows": rows, "b_old": b_old, "b_new": b_new}
    try:
        d1 = os.path.join(base, "evolve")
        t = build(spark, d1, rows, b_old)
        out["files_before"] = len(t.manifest().files)

        s, _ = timed(lambda: t.read().count())
        out["scan_pre_s"] = round(s, 3)
        s, _ = timed(lambda: t.evolve_layout(b_new))
        out["evolve_s"] = round(s, 4)

        s, n = timed(lambda: t.read().count())
        out["scan_mixed_s"] = round(s, 3)
        assert n == rows, (n, rows)
        s, _ = timed(
            lambda: t.read(filters=[("k", "=", "k123")]).count()
        )
        out["lookup_mixed_s"] = round(s, 3)

        ch = spark.createDataFrame(
            [(f"k{i}", i, "UPD", "U", 10**9 + i) for i in range(5)],
            _parse_datatype_string(CH),
        )
        s, _ = timed(lambda: t.merge(ch, key_cols=["k"]))
        out["merge_migrating_s"] = round(s, 3)

        def converge():
            while not t.layout_status()["migrated"]:
                t.maintain(
                    compact_min_files=10_000,
                    compact_delta_depth=10_000,
                    migrate_layout_groups=b_old,
                )

        s, _ = timed(converge)
        out["converge_s"] = round(s, 3)
        s, n = timed(lambda: t.read().count())
        out["scan_converged_s"] = round(s, 3)
        assert n == rows
        s, _ = timed(
            lambda: t.read(filters=[("k", "=", "k123")]).count()
        )
        out["lookup_converged_s"] = round(s, 3)

        d2 = os.path.join(base, "rebucket")
        t2 = build(spark, d2, rows, b_old)
        s, _ = timed(lambda: t2.rebucket(b_new))
        out["rebucket_s"] = round(s, 3)
        assert t2.read().count() == rows

        out["evolve_vs_rebucket_x"] = round(
            out["rebucket_s"] / out["evolve_s"], 1
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
