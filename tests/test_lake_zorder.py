"""Z-order clustered compaction (dexspark/lake/zorder.py,
LakeTable.compact(cluster_by=[...], zorder=True)).

Invariants under test:
1. z-ordering is layout-only: table content (rows, per-row applied
   LSN, tombstones) is bit-identical across the rewrite — including
   over MOR delta buckets and null cluster values;
2. the layout pays off on the SECOND dimension: a filter on the last
   cluster column prunes files where the lexicographic layout cannot
   prune any (the whole point of the interleave);
3. 2-D box predicates prune on both dimensions at once;
4. validation: zorder demands >= 2 numeric/timestamp/date columns.
"""

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from dexspark.lake import zorder as lake_zorder
from dexspark.lake.table import LakeTable

SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("x", LongType()),
        StructField("y", LongType()),
    ]
)

SIDE = 64  # SIDE x SIDE grid
N_FILES = 16


def _grid(spark):
    return spark.range(SIDE * SIDE).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"),
        (F.col("id") % SIDE).alias("x"),
        (F.col("id") / SIDE).cast("long").alias("y"),
    )


def _mk(spark, d, zorder):
    t = LakeTable.create(spark, d, SCHEMA, bucket_key="k", num_buckets=1)
    t.append(_grid(spark))
    t.compact(
        cluster_by=["x", "y"], files_per_bucket=N_FILES, zorder=zorder
    )
    return t


def test_zorder_is_layout_only(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, bucket_key="k", num_buckets=2
    )
    t.append(_grid(spark))
    before = sorted(
        t.read(include_system=True).collect(), key=lambda r: r.k
    )
    info = t.compact(cluster_by=["x", "y"], files_per_bucket=4, zorder=True)
    assert info["zorder"] is True
    after = sorted(
        t.read(include_system=True).collect(), key=lambda r: r.k
    )
    assert before == after


def test_zorder_preserves_mor_resolution_and_tombstones(
    spark, tmp_table_dir
):
    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, bucket_key="k", num_buckets=2
    )
    t.append(_grid(spark))
    # MOR updates: bump y for half the keys, delete a stripe
    upd = _grid(spark).filter(F.col("x") < SIDE // 2).select(
        "k", "x", (F.col("y") + 1000).alias("y"),
        F.lit("U").alias("op"), F.lit(1).cast("long").alias("lsn"),
    )
    dele = _grid(spark).filter(F.col("x") == SIDE - 1).select(
        "k", "x", "y",
        F.lit("D").alias("op"), F.lit(2).cast("long").alias("lsn"),
    )
    t.merge(upd.unionByName(dele), key_cols=["k"], strategy="mor")
    before = sorted(t.read().collect(), key=lambda r: r.k)
    t.compact(cluster_by=["x", "y"], files_per_bucket=4, zorder=True)
    after = sorted(t.read().collect(), key=lambda r: r.k)
    assert before == after
    # a late lower-LSN redelivery still loses after the rewrite
    assert all(r.y >= 1000 for r in after if r.x < SIDE // 2)
    assert not any(r.x == SIDE - 1 for r in after)


def test_second_dim_filter_prunes_only_under_zorder(spark, tmp_path_factory):
    lex = _mk(spark, str(tmp_path_factory.mktemp("zlex")), zorder=False)
    zt = _mk(spark, str(tmp_path_factory.mktemp("zz")), zorder=True)
    filt = [("y", "<", SIDE // 8)]
    lex_scan = lex.read(filters=filt)
    z_scan = zt.read(filters=filt)
    # identical results either way
    assert lex_scan.count() == z_scan.count() == SIDE * (SIDE // 8)
    # lexicographic (x, y) files all span the full y range: no pruning
    assert len(lex_scan.inputFiles()) == len(lex.read().inputFiles())
    # z-order prunes at least half the files on the SECOND dimension
    assert len(z_scan.inputFiles()) <= len(zt.read().inputFiles()) // 2


def test_box_filter_prunes_both_dims(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, zorder=True)
    q = SIDE // 8
    filt = [("x", ">=", q), ("x", "<", 2 * q), ("y", ">=", q), ("y", "<", 2 * q)]
    scan = t.read(filters=filt)
    assert scan.count() == q * q
    # a q x q box is 1/64 of the grid; anything at or under half the
    # files proves both dimensions contributed to pruning
    assert len(scan.inputFiles()) <= N_FILES // 2


def test_nulls_land_safely(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, bucket_key="k", num_buckets=1
    )
    with_nulls = _grid(spark).withColumn(
        "y", F.when(F.col("x") == 0, F.lit(None)).otherwise(F.col("y"))
    )
    t.append(with_nulls)
    t.compact(cluster_by=["x", "y"], files_per_bucket=8, zorder=True)
    assert t.read().count() == SIDE * SIDE
    # null-rejecting filter: null-y rows must not match, non-null must
    got = t.read(filters=[("y", ">=", 0)])
    assert got.count() == SIDE * SIDE - SIDE
    assert t.read().filter(F.col("y").isNull()).count() == SIDE


def test_zorder_validation(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, bucket_key="k", num_buckets=1
    )
    t.append(_grid(spark))
    with pytest.raises(ValueError, match="requires cluster_by"):
        t.compact(zorder=True)
    with pytest.raises(ValueError, match=">= 2 cluster columns"):
        t.compact(cluster_by=["x"], zorder=True)
    with pytest.raises(ValueError, match="z-orderable"):
        t.compact(cluster_by=["x", "k"], zorder=True)
    with pytest.raises(ValueError, match="not in table schema"):
        t.compact(cluster_by=["x", "nope"], zorder=True)


def test_interleave_expression_bit_exact(spark):
    # 2-col interleave of known bins: (b0=0b101, b1=0b011) with 3 bits
    # -> z = 0b 1 0 0 1 1 1 (b0 MSB first at each level) = 39
    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    z = df.select(
        lake_zorder._interleave([F.col("a"), F.col("b")], 3).alias("z")
    ).head()[0]
    # bit i of a -> position 2i+1, bit i of b -> position 2i
    expect = sum(
        (((0b101 >> i) & 1) << (2 * i + 1)) | (((0b011 >> i) & 1) << (2 * i))
        for i in range(3)
    )
    assert z == expect == 0b100111
