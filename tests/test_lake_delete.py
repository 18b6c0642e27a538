"""Predicate DELETE (LakeTable.delete_where) — the retention /
right-to-be-forgotten surface.

Invariants under test:
1. delete_where(filters) leaves exactly read().filter(NOT pred) — with
   the predicate null-rejecting (NULL rows survive);
2. stats-pruned surgery: files whose min/max exclude the predicate are
   NOT rewritten — their manifest paths carry over byte-identical (the
   100 TB payoff: a one-day retention sweep rewrites one day's files);
3. no-match deletes are no-ops (no commit, version unchanged);
4. buckets with outstanding MOR deltas are resolved and folded to base
   as part of the delete, and the result matches the resolved view;
5. CDC delete tombstones survive a matching predicate, so a late
   lower-LSN redelivery still cannot resurrect a CDC-deleted key;
6. concurrent writers: a delete racing appends / compactions lands via
   surgical rebase or recompute, and the final state equals serial
   execution.
"""

import datetime as dt
import threading

import pyspark.sql.functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from dexspark.lake.table import CommitConflict, LakeTable

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


def test_delete_equals_filter(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    info = t.delete_where([("seq", ">=", 150)])
    assert info["matched_rows"] == 50 and not info.get("skipped")
    got = sorted(r.seq for r in t.read().collect())
    assert got == list(range(150))


def test_delete_conjunction_and_result_rows(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    lo, hi = T0 + dt.timedelta(minutes=60), T0 + dt.timedelta(minutes=70)
    info = t.delete_where([("ts", ">=", lo), ("ts", "<", hi)])
    assert info["matched_rows"] == 10
    left = {r.seq for r in t.read().collect()}
    assert left == set(range(200)) - set(range(60, 70))


def test_delete_surgical_keeps_unmatched_files(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    before = {f.path for f in t.manifest().files}
    info = t.delete_where([("seq", ">=", 150)])
    after = {f.path for f in t.manifest().files}
    # chunks 0-2 carry over untouched: 3/4 of the original paths survive
    kept = before & after
    assert len(kept) * 4 == len(before) * 3
    assert info["files_kept"] == len(kept)
    # rewritten chunk-3 files are new paths
    assert all(p not in before for p in after - kept)


def test_delete_no_match_is_a_no_op(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n_chunks=1, chunk=10)
    v = t.current_version()
    # stats-pruned no-op: no file can match
    info = t.delete_where([("seq", ">=", 1000)])
    assert info["skipped"] and t.current_version() == v
    # stats said maybe, rows said no (seq=5 exists only with k='k5';
    # delete k5's minute but a different seq) — still no commit
    info = t.delete_where(
        [("seq", "=", 5), ("ts", ">", T0 + dt.timedelta(minutes=30))]
    )
    assert info["skipped"] and t.current_version() == v


def test_delete_null_predicate_rows_survive(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, bucket_key="k", num_buckets=2
    )
    rows = _rows(0, 10) + [("knull", 100, "vnull", None)]
    t.append(spark.createDataFrame(rows, SCHEMA))
    info = t.delete_where([("ts", "<", T0 + dt.timedelta(minutes=100))])
    assert info["matched_rows"] == 10
    left = [(r.k, r.seq) for r in t.read().collect()]
    assert left == [("knull", 100)]


def test_delete_folds_mor_deltas(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n_chunks=2, chunk=50)
    # k10 moved OUT of the doomed range by a delta (seq 10 -> 500);
    # k60 moved INTO it (seq 60 -> 5)
    ch = spark.createDataFrame(
        [
            ("k10", 500, "MOVED_OUT", T0, "U", 1000),
            ("k60", 5, "MOVED_IN", T0, "U", 1001),
        ],
        CH_SCHEMA,
    )
    t.merge(ch, key_cols=["k"], strategy="mor")
    info = t.delete_where([("seq", "<", 20)])
    # doomed: seq 0..19 minus k10 (now 500) plus k60 (now 5) = 20 rows
    assert info["matched_rows"] == 20
    got = {(r.k, r.seq) for r in t.read().collect()}
    assert ("k10", 500) in got and ("k60", 5) not in got
    assert got == {(f"k{i}", i) for i in range(20, 100) if i != 60} | {
        ("k10", 500)
    }
    # the delete folded the delta buckets to base
    assert not any(f.kind == "delta" for f in t.manifest().files)


def test_delete_keeps_cdc_tombstones(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n_chunks=1, chunk=20)
    # CDC-delete k5 at lsn 1000 (conditional merge → tombstone row)
    d = spark.createDataFrame(
        [("k5", 5, "v5", T0 + dt.timedelta(minutes=5), "D", 1000)], CH_SCHEMA
    )
    t.merge(d, key_cols=["k"])
    # retention delete matching the tombstone's payload range
    info = t.delete_where([("seq", "<", 10)])
    # 9 live rows die; the k5 tombstone is NOT counted or removed
    assert info["matched_rows"] == 9
    # late lower-LSN redelivery for k5 still loses against the tombstone
    u = spark.createDataFrame(
        [("k5", 5, "RESURRECT", T0 + dt.timedelta(minutes=5), "U", 500)],
        CH_SCHEMA,
    )
    t.merge(u, key_cols=["k"])
    ks = {r.k for r in t.read().collect()}
    assert "k5" not in ks
    assert ks == {f"k{i}" for i in range(10, 20)}


def test_delete_races_appends_and_compactions(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    done = threading.Event()
    errors = []

    def writer():
        c = 20  # seq >= 1000: never matches the delete predicate
        while not done.is_set():
            try:
                t.append(
                    spark.createDataFrame(
                        _rows(c * 50 + 1000, c * 50 + 1010), SCHEMA
                    )
                )
                t.compact(min_files_per_bucket=1)
            except CommitConflict:
                pass  # maintenance yields; next loop retries
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return
            c += 1

    th = threading.Thread(target=writer)
    th.start()
    try:
        info = t.delete_where([("seq", "<", 50)])
    finally:
        done.set()
        th.join(timeout=120)
    assert not errors, errors
    assert info["matched_rows"] == 50
    seqs = sorted(r.seq for r in t.read().collect())
    low = [s for s in seqs if s < 1000]
    assert low == list(range(50, 200))  # delete landed exactly once
    high = [s for s in seqs if s >= 1000]
    assert high == sorted(set(high)) and len(high) % 10 == 0  # appends intact


def test_delete_validates_filters(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n_chunks=1, chunk=10)
    import pytest

    with pytest.raises(ValueError, match="at least one filter"):
        t.delete_where([])
    with pytest.raises(ValueError, match="not in table schema"):
        t.delete_where([("nope", "=", 1)])
