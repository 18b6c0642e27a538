"""Manifest min/max file stats + predicate data skipping
(dexspark/lake/stats.py, LakeTable.read(filters=...)).

The invariants under test:
1. stats are collected at commit time for eligible columns and are
   exactly the file's min/max;
2. read(filters=...) equals read().filter(...) ALWAYS — on pre-stats
   manifests, across schema evolution, and with outstanding MOR deltas;
3. when appends are clustered on the filter column, pruning provably
   skips files (df.inputFiles() shrinks) — the 100 TB payoff;
4. buckets with MOR deltas are never file-pruned (resolution must see
   every version of a key) yet still row-filter correctly.
"""

import datetime as dt

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from dexspark.lake import stats as lake_stats
from dexspark.lake.manifest import DataFile
from dexspark.lake.table import LakeTable

SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("seq", LongType()),
        StructField("v", StringType()),
        StructField("ts", TimestampType()),
    ]
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


def test_stats_collected_and_exact(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n_chunks=1, chunk=10)
    files = t.manifest().files
    assert files
    for f in files:
        assert "seq" in f.stats and "ts" in f.stats
        # strings are deliberately not collected (truncation hazard)
        assert "k" not in f.stats and "v" not in f.stats
    all_seq = [s for f in files for s in f.stats["seq"]]
    assert min(all_seq) == 0 and max(all_seq) == 9


def test_filters_equal_plain_filter(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    lo, hi = T0 + dt.timedelta(minutes=50), T0 + dt.timedelta(minutes=100)
    got = sorted(
        (r.k, r.seq)
        for r in t.read(filters=[("ts", ">=", lo), ("ts", "<", hi)]).collect()
    )
    want = sorted(
        (r.k, r.seq)
        for r in t.read().filter((F.col("ts") >= lo) & (F.col("ts") < hi)).collect()
    )
    assert got == want and len(got) == 50


def test_pruning_skips_files(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    full = t.read()
    pruned = t.read(filters=[("seq", ">=", 150)])
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    # chunk 3 only → exactly 1/4 of the data files
    assert len(pruned.inputFiles()) * 4 == len(full.inputFiles())
    assert pruned.count() == 50


def test_equality_and_open_ops(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    assert t.read(filters=[("seq", "=", 120)]).count() == 1
    assert t.read(filters=[("seq", "<", 10)]).count() == 10
    assert t.read(filters=[("seq", "<=", 10)]).count() == 11
    assert t.read(filters=[("seq", ">", 198)]).count() == 1


def test_mor_delta_buckets_not_pruned_but_correct(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n_chunks=2, chunk=50)
    ch = spark.createDataFrame(
        [("k10", 10, "UPDATED", T0 + dt.timedelta(minutes=10), "U", 1000)],
        StructType(
            list(SCHEMA.fields)
            + [StructField("op", StringType()), StructField("lsn", LongType())]
        ),
    )
    t.merge(ch, key_cols=["k"], strategy="mor")
    got = {
        (r.k, r.v) for r in t.read(filters=[("seq", "<", 20)]).collect()
    }
    want = {
        (r.k, r.v)
        for r in t.read().filter(F.col("seq") < 20).collect()
    }
    assert got == want
    assert ("k10", "UPDATED") in got


def test_filters_validate(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n_chunks=1, chunk=10)
    with pytest.raises(ValueError, match="unsupported filter op"):
        t.read(filters=[("seq", "!=", 1)])
    with pytest.raises(ValueError, match="not in table schema"):
        t.read(filters=[("nope", "=", 1)])


def test_pre_stats_manifest_compatible():
    d = {"path": "p", "bucket": 0, "schema_id": 0}
    f = DataFile.from_json(d)
    assert f.stats == {}
    # no stats → never pruned
    assert lake_stats.file_may_match(
        f.stats, [("seq", "=", 1)], StructType([StructField("seq", LongType())])
    )
    assert "stats" not in f.to_json()


def test_file_may_match_bounds():
    schema = StructType([StructField("x", IntegerType())])
    st = {"x": [10, 20]}
    assert not lake_stats.file_may_match(st, [("x", "=", 9)], schema)
    assert not lake_stats.file_may_match(st, [("x", "<", 10)], schema)
    assert lake_stats.file_may_match(st, [("x", "<=", 10)], schema)
    assert not lake_stats.file_may_match(st, [("x", ">", 20)], schema)
    assert lake_stats.file_may_match(st, [("x", ">=", 20)], schema)
    assert lake_stats.file_may_match(st, [("x", "=", 15)], schema)


def _mk_shuffled(spark, d, n=200):
    """Appends whose ts is NOT clustered by commit: every file spans
    nearly the whole ts range, so stats can't prune until clustering."""
    import random

    t = LakeTable.create(spark, d, SCHEMA, bucket_key="k", num_buckets=2)
    rows = _rows(0, n)
    rng = random.Random(7)
    rng.shuffle(rows)
    for c in range(4):
        t.append(spark.createDataFrame(rows[c * 50:(c + 1) * 50], SCHEMA))
    return t


def test_clustered_compaction_restores_pruning(spark, tmp_table_dir):
    t = _mk_shuffled(spark, tmp_table_dir)
    filt = [("seq", ">=", 150)]
    before = t.read()
    want = sorted(r.seq for r in t.read(filters=filt).collect())
    # unclustered: every file spans the range -> no pruning possible
    assert len(t.read(filters=filt).inputFiles()) == len(before.inputFiles())
    info = t.compact(cluster_by=["seq"], files_per_bucket=4)
    assert info["cluster_by"] == ["seq"] and info["files_after"] > 2
    # same rows, but the range read now touches a fraction of the files
    got = sorted(r.seq for r in t.read(filters=filt).collect())
    assert got == want == list(range(150, 200))
    n_all = len(t.read().inputFiles())
    n_pruned = len(t.read(filters=filt).inputFiles())
    assert n_pruned * 2 <= n_all
    # a retention delete now rewrites only the matching range's files
    dinfo = t.delete_where([("seq", "<", 50)])
    assert dinfo["matched_rows"] == 50
    assert dinfo["files_kept"] > 0
    assert sorted(r.seq for r in t.read().collect()) == list(range(50, 200))


def test_clustered_compaction_preserves_state_and_lsn(spark, tmp_table_dir):
    """Clustering is layout-only: merge history (LSNs, tombstones)
    reads back bit-identical, and a late lower-LSN change still
    loses after the clustered rewrite."""
    import datetime as dtm

    from pyspark.sql.types import LongType as LT, StringType as ST

    t = _mk_shuffled(spark, tmp_table_dir, n=100)
    ch_schema = StructType(
        list(SCHEMA.fields)
        + [StructField("op", ST()), StructField("lsn", LT())]
    )
    t.merge(
        spark.createDataFrame(
            [
                ("k10", 10, "NEW", T0 + dtm.timedelta(minutes=10), "U", 1000),
                ("k20", 20, "v20", T0 + dtm.timedelta(minutes=20), "D", 1001),
            ],
            ch_schema,
        ),
        key_cols=["k"],
    )
    before = {(r.k, r.seq, r.v) for r in t.read().collect()}
    t.compact(cluster_by=["ts"], files_per_bucket=3)
    assert {(r.k, r.seq, r.v) for r in t.read().collect()} == before
    # tombstone for k20 survived the clustered rewrite
    t.merge(
        spark.createDataFrame(
            [("k20", 20, "RESURRECT", T0, "U", 500)], ch_schema
        ),
        key_cols=["k"],
    )
    assert "k20" not in {r.k for r in t.read().collect()}


def test_cluster_by_validates_columns(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n_chunks=1, chunk=10)
    with pytest.raises(ValueError, match="not in table schema"):
        t.compact(cluster_by=["nope"])
