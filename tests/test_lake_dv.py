"""Deletion vectors (delete_where strategy="dv", lake/dv.py).

Invariants under test:
1. a dv delete leaves exactly read().filter(NOT pred) — same contract
   as copy mode, checked against a copy-mode twin table;
2. O(matched) commit: clean-bucket candidates are NOT rewritten — every
   data file path carries over, only manifest entries gain a vector;
3. a second delete touching the same files folds the prior vector into
   the new directory (dv_count accumulates, state stays exact);
4. MOR delta buckets fold to base inside the same commit (positional
   deletes against unresolved version stacks are unsafe by design);
5. CDC tombstones survive a matching predicate and still block late
   lower-LSN resurrection;
6. compact() purges: vectors leave the manifest, the rewritten files
   physically lack the deleted rows, and the visible state is
   unchanged;
7. time travel reads pre-delete versions intact; expire_snapshots
   removes dv directories with their manifests; vacuum_orphans keeps
   referenced dv parts and reclaims orphaned dv directories;
8. concurrent dv deletes on the same files both land (rebase refuses a
   stale-vector commit; the loser recomputes) and the final state
   equals serial execution.
"""

import datetime as dt
import glob
import os
import threading
import time

import pyspark.sql.functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from dexspark.lake.table import LakeTable

SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("seq", LongType()),
        StructField("v", StringType()),
        StructField("ts", TimestampType()),
    ]
)

CH_SCHEMA = StructType(
    list(SCHEMA.fields)
    + [StructField("op", StringType()), StructField("lsn", LongType())]
)

T0 = dt.datetime(2024, 1, 1)


def _rows(lo, hi):
    return [
        (f"k{i}", i, f"v{i}", T0 + dt.timedelta(minutes=i))
        for i in range(lo, hi)
    ]


def _mk(spark, d, n_chunks=4, chunk=50):
    t = LakeTable.create(spark, d, SCHEMA, bucket_key="k", num_buckets=2)
    for c in range(n_chunks):
        t.append(
            spark.createDataFrame(_rows(c * chunk, (c + 1) * chunk), SCHEMA)
        )
    return t


def test_dv_delete_equals_filter_and_copy_twin(spark, tmp_table_dir):
    t = _mk(spark, os.path.join(tmp_table_dir, "dv"))
    c = _mk(spark, os.path.join(tmp_table_dir, "copy"))
    i1 = t.delete_where([("seq", ">=", 150)], strategy="dv")
    i2 = c.delete_where([("seq", ">=", 150)])
    assert i1["matched_rows"] == i2["matched_rows"] == 50
    assert i1["strategy"] == "dv" and i1["dv_positions_added"] == 50
    got = sorted(r.seq for r in t.read().collect())
    assert got == list(range(150))
    assert t.read().orderBy("k").collect() == c.read().orderBy("k").collect()


def test_dv_delete_rewrites_no_data_files(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    before = {f.path for f in t.manifest().files}
    info = t.delete_where([("seq", ">=", 150)], strategy="dv")
    after = {f.path for f in t.manifest().files}
    # O(matched) commit: every data file path survives; only entries
    # holding matches gained a vector
    assert before == after
    assert info["files_rewritten"] == 0
    dvd = [f for f in t.manifest().files if f.dv]
    assert dvd and info["dv_files_updated"] == len(dvd)
    assert sum(f.dv_count for f in dvd) == 50
    # stats-pruned: untouched chunks carry no vector
    assert any(not f.dv for f in t.manifest().files)


def test_dv_second_delete_folds_prior_vector(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.delete_where([("seq", ">=", 150)], strategy="dv")
    info = t.delete_where([("seq", "=", 100)], strategy="dv")
    assert info["matched_rows"] == 1
    left = sorted(r.seq for r in t.read().collect())
    assert left == [s for s in range(150) if s != 100]
    # per-file counts accumulate and every referenced dir is complete
    assert sum(f.dv_count for f in t.manifest().files if f.dv) == 51


def test_dv_delete_folds_mor_deltas(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n_chunks=2, chunk=50)
    ch = spark.createDataFrame(
        [
            ("k10", 500, "MOVED_OUT", T0, "U", 1000),
            ("k60", 5, "MOVED_IN", T0, "U", 1001),
        ],
        CH_SCHEMA,
    )
    t.merge(ch, key_cols=["k"], strategy="mor")
    info = t.delete_where([("seq", "<", 20)], strategy="dv")
    assert info["matched_rows"] == 20
    got = {(r.k, r.seq) for r in t.read().collect()}
    assert got == {(f"k{i}", i) for i in range(20, 100) if i != 60} | {
        ("k10", 500)
    }
    # the delta buckets folded to base inside the dv commit
    assert not any(f.kind == "delta" for f in t.manifest().files)


def test_dv_keeps_cdc_tombstones_and_blocks_resurrection(
    spark, tmp_table_dir
):
    t = _mk(spark, tmp_table_dir, n_chunks=1, chunk=20)
    d = spark.createDataFrame(
        [("k5", 5, "v5", T0 + dt.timedelta(minutes=5), "D", 1000)], CH_SCHEMA
    )
    t.merge(d, key_cols=["k"])
    info = t.delete_where([("seq", "<", 10)], strategy="dv")
    assert info["matched_rows"] == 9  # tombstone not counted
    u = spark.createDataFrame(
        [("k5", 5, "RESURRECT", T0 + dt.timedelta(minutes=5), "U", 500)],
        CH_SCHEMA,
    )
    t.merge(u, key_cols=["k"])
    ks = {r.k for r in t.read().collect()}
    assert "k5" not in ks and ks == {f"k{i}" for i in range(10, 20)}


def test_dv_compact_purges_physically(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.delete_where([("seq", ">=", 150)], strategy="dv")
    pre = t.read().orderBy("k").collect()
    t.compact()
    m = t.manifest()
    assert not any(f.dv for f in m.files)
    assert t.read().orderBy("k").collect() == pre
    raw = spark.read.parquet(
        *[os.path.join(t.table_dir, f.path) for f in m.files]
    )
    assert (
        raw.filter(
            (F.col("seq") >= 150) & ~F.coalesce("_deleted", F.lit(False))
        ).count()
        == 0
    )


def test_dv_time_travel_expire_and_vacuum(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n_chunks=2, chunk=20)
    pre_v = t.current_version()
    t.delete_where([("seq", "<", 10)], strategy="dv")
    assert t.read(version=pre_v).count() == 40
    assert t.read().count() == 30
    # referenced dv parts survive vacuum even with zero grace period
    vr = t.vacuum_orphans(older_than_seconds=0)
    assert t.read().count() == 30
    assert not vr["removed"]
    # an orphaned dv dir (lost commit race) ages out
    orphan = os.path.join(t.table_dir, "data", "deadbeef00000000", "dv")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "wb") as fh:
        fh.write(b"x")
    old = time.time() - 7 * 24 * 3600
    os.utime(os.path.join(orphan, "part-0.parquet"), (old, old))
    vr = t.vacuum_orphans()
    assert any("deadbeef" in p for p in vr["removed"])
    # expiring pre-delete history removes the superseded dv state only
    # when no retained manifest references it; here the vector is
    # CURRENT so it must survive
    t.expire_snapshots(keep_last=1)
    assert t.read().count() == 30
    assert glob.glob(os.path.join(t.table_dir, "data", "*", "dv"))
    # a copy-mode rewrite drops the vector; expiry then reclaims it
    t.delete_where([("seq", "<", 100)])
    t.expire_snapshots(keep_last=1)
    assert not glob.glob(os.path.join(t.table_dir, "data", "*", "dv"))
    assert t.read().count() == 0


def test_dv_no_match_is_noop_and_null_rows_survive(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, bucket_key="k", num_buckets=2
    )
    rows = _rows(0, 10) + [("knull", 100, "vnull", None)]
    t.append(spark.createDataFrame(rows, SCHEMA))
    v = t.current_version()
    info = t.delete_where([("seq", ">=", 1000)], strategy="dv")
    assert info["skipped"] and t.current_version() == v
    info = t.delete_where(
        [("ts", "<", T0 + dt.timedelta(minutes=100))], strategy="dv"
    )
    assert info["matched_rows"] == 10
    assert [(r.k, r.seq) for r in t.read().collect()] == [("knull", 100)]


def test_dv_concurrent_deletes_both_land(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n_chunks=2, chunk=50)
    errs = []

    def worker(pred):
        try:
            LakeTable(spark, tmp_table_dir).delete_where(
                pred, strategy="dv"
            )
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append(e)

    th1 = threading.Thread(target=worker, args=([("seq", "<", 10)],))
    th2 = threading.Thread(target=worker, args=([("seq", ">=", 90)],))
    th1.start(); th2.start(); th1.join(); th2.join()
    assert not errs
    left = sorted(r.seq for r in t.read().collect())
    assert left == list(range(10, 90))
    assert sum(f.dv_count for f in t.manifest().files if f.dv) == 20


def test_dv_delete_racing_append_serializes(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n_chunks=2, chunk=50)

    def appender():
        LakeTable(spark, tmp_table_dir).append(
            spark.createDataFrame(_rows(200, 220), SCHEMA)
        )

    th = threading.Thread(target=appender)
    th.start()
    t.delete_where([("seq", "<", 10)], strategy="dv")
    th.join()
    left = sorted(r.seq for r in t.read().collect())
    assert left == list(range(10, 100)) + list(range(200, 220))
