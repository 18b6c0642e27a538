"""General MERGE INTO clause surface (lake/merge_into.py)."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import _parse_datatype_string

from dexspark.lake.table import LakeTable

SCHEMA = "k string, v int, note string"
LOG = "k string, v int, note string, op string, lsn long"


def mk(spark, d, rows, buckets=4):
    t = LakeTable.create(
        spark, os.path.join(d, "t"), _parse_datatype_string(SCHEMA), "k", buckets
    )
    t.merge(spark.createDataFrame(rows, LOG), ["k"], summary={"batch_id": "seed"})
    return t


def test_clause_order_first_match_wins(spark, tmp_table_dir):
    t = mk(spark, tmp_table_dir, [("a", 1, "x", "I", 1), ("b", 2, "y", "I", 2)])
    # both clauses match 'a'; the FIRST (delete) must win
    t.merge_into(
        spark.createDataFrame([("a", 99)], "k string, v int"), ["k"],
        when_matched=[
            ("delete", "s.v > 0", None),
            ("update", None, {"v": "s.v"}),
        ],
    )
    assert {r.k for r in t.read().collect()} == {"b"}


def test_update_set_star_and_insert_star(spark, tmp_table_dir):
    t = mk(spark, tmp_table_dir, [("a", 1, "x", "I", 1)])
    t.merge_into(
        spark.createDataFrame([("a", 10, "up"), ("c", 30, "new")], SCHEMA),
        ["k"],
        when_matched=[("update", None, None)],      # SET * from source
        when_not_matched=[("insert", None, None)],  # INSERT * from source
    )
    rows = {r.k: (r.v, r.note) for r in t.read().collect()}
    assert rows == {"a": (10, "up"), "c": (30, "new")}


def test_insert_replaces_tombstone(spark, tmp_table_dir):
    t = mk(spark, tmp_table_dir, [("a", 1, "x", "I", 1), ("b", 2, "y", "I", 2)])
    t.merge(
        spark.createDataFrame([("a", None, None, "D", 9)], LOG),
        ["k"], summary={"batch_id": "del"},
    )
    t.merge_into(
        spark.createDataFrame([("a", 7)], "k string, v int"), ["k"],
        when_matched=[("update", None, {"v": "s.v"})],
        when_not_matched=[("insert", None, {"v": "s.v", "note": "'revived'"})],
    )
    rows = {r.k: (r.v, r.note) for r in t.read().collect()}
    # tombstoned key is NOT MATCHED -> insert fires and replaces the stone
    assert rows["a"] == (7, "revived")
    sys_rows = t.read(include_system=True).filter("k = 'a'").collect()
    assert len(sys_rows) == 1 and not sys_rows[0]._deleted


def test_untouched_tombstones_and_buckets_carry_over(spark, tmp_table_dir):
    t = mk(
        spark, tmp_table_dir,
        [(f"k{i}", i, "x", "I", i + 1) for i in range(12)], buckets=6,
    )
    t.merge(
        spark.createDataFrame([("k3", None, None, "D", 99)], LOG),
        ["k"], summary={"batch_id": "del"},
    )
    before = {f.path for f in t.manifest().files}
    # no NOT-MATCHED-BY-SOURCE clause -> only the source's buckets rewrite
    t.merge_into(
        spark.createDataFrame([("k0", 100)], "k string, v int"), ["k"],
        when_matched=[("update", None, {"v": "s.v"})],
    )
    after = {f.path for f in t.manifest().files}
    assert before & after, "untouched buckets must carry over byte-identical"
    # the tombstone for k3 (untouched bucket or not) is still a tombstone
    stone = t.read(include_system=True).filter("k = 'k3'").collect()
    assert len(stone) == 1 and stone[0]._deleted
    assert t.read().filter("k = 'k3'").isEmpty()


def test_not_matched_by_source_touches_all_live_rows(spark, tmp_table_dir):
    t = mk(spark, tmp_table_dir, [("a", 1, "x", "I", 1), ("b", 2, "y", "I", 2),
                                  ("c", 3, "z", "I", 3)])
    t.merge_into(
        spark.createDataFrame([("a", 0)], "k string, v int"), ["k"],
        when_matched=[("update", None, {"note": "'hit'"})],
        when_not_matched_by_source=[
            ("delete", "t.v >= 3", None),
            ("update", None, {"note": "'stale'"}),
        ],
    )
    rows = {r.k: r.note for r in t.read().collect()}
    assert rows == {"a": "hit", "b": "stale"}  # c deleted


def test_statement_lsn_gates_future_cdc(spark, tmp_table_dir):
    t = mk(spark, tmp_table_dir, [("a", 1, "x", "I", 1)])
    t.merge_into(
        spark.createDataFrame([("a", 50)], "k string, v int"), ["k"],
        when_matched=[("update", None, {"v": "s.v"})], lsn=1000,
    )
    # a redelivered OLD event (lsn 5 < 1000) must lose to the manual edit
    t.merge(spark.createDataFrame([("a", 2, "old", "U", 5)], LOG),
            ["k"], summary={"batch_id": "late"})
    assert t.read().collect()[0].v == 50


def test_mor_deltas_fold_through_merge_into(spark, tmp_table_dir):
    t = mk(spark, tmp_table_dir, [("a", 1, "x", "I", 1)])
    t.merge(spark.createDataFrame([("a", 2, "x2", "U", 10)], LOG),
            ["k"], summary={"batch_id": "m1"}, strategy="mor")
    t.merge_into(
        spark.createDataFrame([("a", 9)], "k string, v int"), ["k"],
        when_matched=[("update", None, {"v": "s.v"})], lsn=100,
    )
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0].v == 9 and rows[0].note == "x2"


def test_guards(spark, tmp_table_dir):
    t = mk(spark, tmp_table_dir, [("a", 1, "x", "I", 1)])
    src = spark.createDataFrame([("a", 1)], "k string, v int")
    with pytest.raises(ValueError, match="duplicate keys"):
        t.merge_into(src.unionAll(src), ["k"], when_matched=[("update", None, None)])
    with pytest.raises(ValueError, match="NULL key"):
        t.merge_into(
            spark.createDataFrame([(None, 1)], "k string, v int"), ["k"],
            when_matched=[("update", None, None)],
        )
    with pytest.raises(ValueError, match="at least one clause"):
        t.merge_into(src, ["k"])
    with pytest.raises(ValueError, match="DELETE takes no assignments"):
        t.merge_into(src, ["k"], when_matched=[("delete", None, {"v": "1"})])
    with pytest.raises(ValueError, match="explicit assignments"):
        t.merge_into(src, ["k"],
                     when_not_matched_by_source=[("update", None, None)])
    with pytest.raises(ValueError, match="merge key mismatch"):
        t.merge_into(src.withColumnRenamed("k", "v2"), ["v2"],
                     when_matched=[("update", None, None)])
