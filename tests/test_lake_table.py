"""LakeTable: snapshots, COW merge, bucket pruning, schema evolution."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from dexspark.lake.table import CommitConflict, LakeTable

SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("seq", IntegerType()),
        StructField("v", StringType()),
    ]
)


def _mk(spark, d, rows):
    t = LakeTable.create(spark, d, SCHEMA, bucket_key="k", num_buckets=8)
    if rows:
        t.append(spark.createDataFrame(rows, SCHEMA))
    return t


def test_create_read_empty(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [])
    assert t.read().count() == 0
    assert t.read().schema == SCHEMA


def test_append_and_read(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [("a", 1, "x"), ("b", 2, "y")])
    got = {(r.k, r.seq, r.v) for r in t.read().collect()}
    assert got == {("a", 1, "x"), ("b", 2, "y")}


def test_merge_upsert_delete(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [("a", 1, "x"), ("b", 2, "y"), ("c", 3, "z")])
    changes = spark.createDataFrame(
        [("a", 1, "x2", "U"), ("c", 3, None, "D"), ("d", 4, "w", "I")],
        "k string, seq int, v string, op string",
    )
    t.merge(changes, key_cols=["k"])
    got = {(r.k, r.seq, r.v) for r in t.read().collect()}
    assert got == {("a", 1, "x2"), ("b", 2, "y"), ("d", 4, "w")}


def test_merge_only_rewrites_affected_buckets(spark, tmp_table_dir):
    rows = [(f"k{i}", i, f"v{i}") for i in range(200)]
    t = _mk(spark, tmp_table_dir, rows)
    files_before = {f.path: f.bucket for f in t.manifest().files}
    changes = spark.createDataFrame([("k7", 7, "NEW", "U")], "k string, seq int, v string, op string")
    info = t.merge(changes, key_cols=["k"])
    affected = set(info["affected_buckets"])
    assert len(affected) == 1
    files_after = {f.path: f.bucket for f in t.manifest().files}
    # every file in an untouched bucket must carry over byte-identical
    untouched_before = {p for p, b in files_before.items() if b not in affected}
    assert untouched_before <= set(files_after)
    got = dict((r.k, r.v) for r in t.read().collect())
    assert got["k7"] == "NEW" and got["k0"] == "v0" and len(got) == 200


def test_time_travel(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [("a", 1, "x")])
    v1 = t.current_version()
    t.merge(
        spark.createDataFrame([("a", 1, "x2", "U")], "k string, seq int, v string, op string"),
        key_cols=["k"],
    )
    assert t.read(version=v1).collect()[0].v == "x"
    assert t.read().collect()[0].v == "x2"


def test_schema_evolution_additive_and_widening(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [("a", 1, "x")])
    new = StructType(
        [
            StructField("k", StringType()),
            StructField("seq", LongType()),  # int -> long widening
            StructField("v", StringType()),
            StructField("model", StringType()),  # additive
        ]
    )
    assert t.evolve_schema(new)
    row = t.read().collect()[0]
    assert row.seq == 1 and row.model is None
    assert dict(t.read().dtypes)["seq"] == "bigint"
    # old files still readable; merge under new schema works
    t.merge(
        spark.createDataFrame(
            [("b", 2**40, "y", "m1", "I")],
            "k string, seq long, v string, model string, op string",
        ),
        key_cols=["k"],
    )
    got = {(r.k, r.seq, r.model) for r in t.read().collect()}
    assert got == {("a", 1, None), ("b", 2**40, "m1")}


def test_schema_evolution_rejects_illegal(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [])
    bad = StructType([StructField("k", StringType()), StructField("seq", StringType()), StructField("v", StringType())])
    with pytest.raises(ValueError):
        t.evolve_schema(bad)
    with pytest.raises(ValueError):
        t.evolve_schema(StructType([StructField("k", StringType())]))


def test_commit_conflict(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [])
    m = t.manifest()
    t.append(spark.createDataFrame([("a", 1, "x")], SCHEMA))
    # a second writer holding the stale manifest loses the race
    with pytest.raises(CommitConflict):
        t._commit_next(m, m.files, {"operation": "append"})


def test_lineage_df_from_summaries(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [])
    t.merge(
        spark.createDataFrame([("a", 1, "x", "I")], "k string, seq int, v string, op string"),
        key_cols=["k"],
        summary={"batch_id": "b0", "partitions": [{"bucket": 0, "applied": 1, "start_lsn": 0, "end_lsn": 0, "rejected": 0}]},
    )
    ldf = t.lineage_df()
    assert ldf.filter(F.col("batch_id") == "b0").count() == 1
    assert "b0" in t.committed_batch_ids()


def test_compact_binpacks_small_files(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [("a", 1, "x")])
    for i in range(3):  # three more appends -> up to 4 files in a's bucket
        t.append(spark.createDataFrame([("a", i + 10, f"v{i}")], SCHEMA))
    m = t.manifest()
    per_bucket = {}
    for f in m.files:
        per_bucket[f.bucket] = per_bucket.get(f.bucket, 0) + 1
    assert max(per_bucket.values()) >= 2

    before = {(r.k, r.seq, r.v) for r in t.read().collect()}
    info = t.compact()
    assert info["files_after"] < info["files_before"]
    m2 = t.manifest()
    per_bucket2 = {}
    for f in m2.files:
        per_bucket2[f.bucket] = per_bucket2.get(f.bucket, 0) + 1
    assert max(per_bucket2.values()) == 1
    # contents identical, new snapshot committed
    assert {(r.k, r.seq, r.v) for r in t.read().collect()} == before
    assert m2.version == m.version + 1
    # idempotent: nothing left to compact
    assert t.compact()["skipped"] is True


def test_compact_migrates_old_schema_files(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [("a", 1, "x")])
    wide = StructType(list(SCHEMA.fields) + [StructField("extra", StringType())])
    t.evolve_schema(wide)
    assert any(f.schema_id != t.manifest().current_schema_id for f in t.manifest().files)
    t.compact(min_files_per_bucket=99)  # only stale-schema rewrite triggers
    m = t.manifest()
    assert all(f.schema_id == m.current_schema_id for f in m.files)
    row = t.read().collect()[0]
    assert (row.k, row.seq, row.v, row.extra) == ("a", 1, "x", None)


def test_expire_snapshots_vacuums_unreferenced(spark, tmp_table_dir):
    import os

    t = _mk(spark, tmp_table_dir, [("a", 1, "x")])
    t.merge(
        spark.createDataFrame([("a", 1, "x2", "U")], "k string, seq int, v string, op string"),
        key_cols=["k", "seq"],
    )
    t.merge(
        spark.createDataFrame([("a", 1, "x3", "U")], "k string, seq int, v string, op string"),
        key_cols=["k", "seq"],
    )
    head = t.current_version()
    all_files_before = set()
    for m in t.history():
        all_files_before.update(f.path for f in m.files)
    info = t.expire_snapshots(keep_last=1)
    assert info["expired_versions"] == list(range(1, head))
    assert info["removed_files"] >= 1
    # current snapshot intact
    assert {r.v for r in t.read().collect()} == {"x3"}
    # expired manifests gone; current still reads
    from dexspark.lake import manifest as mf

    assert mf.available_versions(t.table_dir) == [head]
    # referenced data files still on disk
    for f in t.manifest().files:
        assert os.path.exists(os.path.join(t.table_dir, f.path))
    # another expire is a no-op
    assert t.expire_snapshots(keep_last=1)["expired_versions"] == []


def test_merge_out_of_order_batches_commutative(spark, tmp_table_dir):
    """Conditional (LSN-gated) merge: applying batches in the wrong
    order converges to the same state as in-order application."""
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, "k", 4)
    ddl = "k string, seq int, v string, op string, lsn long"
    newer = spark.createDataFrame([("a", 1, "new", "U", 100)], ddl)
    older = spark.createDataFrame([("a", 1, "old", "U", 50)], ddl)
    t.merge(newer, key_cols=["k", "seq"])
    t.merge(older, key_cols=["k", "seq"])  # late arrival must LOSE
    rows = t.read().collect()
    assert [(r.k, r.seq, r.v) for r in rows] == [("a", 1, "new")]


def test_merge_tombstone_blocks_resurrection(spark, tmp_table_dir):
    """A late out-of-order update older than a delete must not
    resurrect the deleted key."""
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, "k", 4)
    ddl = "k string, seq int, v string, op string, lsn long"
    t.merge(spark.createDataFrame([("a", 1, "x", "I", 10)], ddl), key_cols=["k", "seq"])
    t.merge(spark.createDataFrame([("a", 1, None, "D", 30)], ddl), key_cols=["k", "seq"])
    assert t.read().count() == 0
    # late update with lsn between insert and delete -> stays deleted
    t.merge(spark.createDataFrame([("a", 1, "late", "U", 20)], ddl), key_cols=["k", "seq"])
    assert t.read().count() == 0
    # genuinely newer insert (after the delete) -> key comes back
    t.merge(spark.createDataFrame([("a", 1, "back", "I", 40)], ddl), key_cols=["k", "seq"])
    assert [(r.k, r.v) for r in t.read().collect()] == [("a", "back")]


def test_merge_redelivered_batch_is_noop_by_lsn(spark, tmp_table_dir):
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, "k", 4)
    ddl = "k string, seq int, v string, op string, lsn long"
    batch = spark.createDataFrame([("a", 1, "x", "I", 10), ("b", 2, "y", "I", 11)], ddl)
    t.merge(batch, key_cols=["k", "seq"])
    before = {(r.k, r.seq, r.v) for r in t.read().collect()}
    t.merge(batch, key_cols=["k", "seq"])  # verbatim redelivery
    after = {(r.k, r.seq, r.v) for r in t.read().collect()}
    assert before == after == {("a", 1, "x"), ("b", 2, "y")}


# ----------------------------------------------------------- merge-on-read

def _chg(spark, rows):
    return spark.createDataFrame(
        rows, "k string, seq int, v string, op string, lsn long"
    )


def test_mor_merge_upsert_delete(spark, tmp_table_dir):
    """MOR end state identical to COW: upsert + delete + insert."""
    t = _mk(spark, tmp_table_dir, [])
    t.merge(
        _chg(spark, [("a", 1, "x", "I", 1), ("b", 2, "y", "I", 2), ("c", 3, "z", "I", 3)]),
        key_cols=["k"], strategy="mor",
    )
    t.merge(
        _chg(spark, [("a", 1, "x2", "U", 10), ("c", 3, None, "D", 11), ("d", 4, "w", "I", 12)]),
        key_cols=["k"], strategy="mor",
    )
    got = {(r.k, r.seq, r.v) for r in t.read().collect()}
    assert got == {("a", 1, "x2"), ("b", 2, "y"), ("d", 4, "w")}
    # every merge appended deltas; no base rewrite happened
    kinds = [f.kind for f in t.manifest().files]
    assert kinds.count("delta") >= 2 and "base" not in kinds


def test_mor_commit_is_o_batch(spark, tmp_table_dir):
    """A MOR merge must carry every pre-existing file forward untouched
    (the O(batch) write-amplification contract)."""
    t = _mk(spark, tmp_table_dir, [])
    t.merge(
        _chg(spark, [(f"k{i}", i, f"v{i}", "I", i) for i in range(200)]),
        key_cols=["k"], strategy="mor",
    )
    before = {f.path for f in t.manifest().files}
    info = t.merge(
        _chg(spark, [("k7", 7, "NEW", "U", 1000)]), key_cols=["k"], strategy="mor"
    )
    assert info["strategy"] == "mor"
    after = {f.path for f in t.manifest().files}
    assert before <= after  # nothing rewritten or dropped
    assert len(after - before) <= 2  # just the new delta file(s)
    got = dict((r.k, r.v) for r in t.read().collect())
    assert got["k7"] == "NEW" and got["k0"] == "v0" and len(got) == 200


def test_mor_out_of_order_and_tombstone(spark, tmp_table_dir):
    """Read-time resolution is commutative: a late lower-LSN update
    loses to the standing row AND to a delete tombstone."""
    t = _mk(spark, tmp_table_dir, [])
    t.merge(_chg(spark, [("a", 1, "new", "U", 50), ("b", 1, "alive", "I", 10)]),
            key_cols=["k"], strategy="mor")
    t.merge(_chg(spark, [("b", 1, None, "D", 40)]), key_cols=["k"], strategy="mor")
    # redelivered old batch: lower LSNs must not clobber
    t.merge(_chg(spark, [("a", 1, "old", "U", 5), ("b", 1, "zombie", "U", 20)]),
            key_cols=["k"], strategy="mor")
    got = {(r.k, r.v) for r in t.read().collect()}
    assert got == {("a", "new")}  # b stays deleted, a keeps lsn-50 row


def test_mor_compact_folds_deltas_to_base(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [])
    t.merge(_chg(spark, [(f"k{i}", i, f"v{i}", "I", i) for i in range(50)]),
            key_cols=["k"], strategy="mor")
    t.merge(_chg(spark, [("k1", 1, "U1", "U", 100), ("k2", 2, None, "D", 101)]),
            key_cols=["k"], strategy="mor")
    before = {(r.k, r.v) for r in t.read().collect()}
    info = t.compact()
    assert not info.get("skipped")
    m = t.manifest()
    assert all(f.kind == "base" for f in m.files)
    assert {(r.k, r.v) for r in t.read().collect()} == before
    assert len(before) == 49  # k2 deleted
    # tombstone state survives compaction: a stale update still loses
    t.merge(_chg(spark, [("k2", 2, "zombie", "U", 60)]), key_cols=["k"], strategy="mor")
    assert dict((r.k, r.v) for r in t.read().collect()).get("k2") is None


def test_mor_time_travel_and_change_feed(spark, tmp_table_dir):
    from dexspark.lake.changes import table_changes

    t = _mk(spark, tmp_table_dir, [])
    t.merge(_chg(spark, [("a", 1, "x", "I", 1), ("b", 2, "y", "I", 2)]),
            key_cols=["k"], strategy="mor")
    v1 = t.current_version()
    t.merge(_chg(spark, [("a", 1, "x2", "U", 10), ("b", 2, None, "D", 11),
                         ("c", 3, "z", "I", 12)]),
            key_cols=["k"], strategy="mor")
    assert {(r.k, r.v) for r in t.read(version=v1).collect()} == {("a", "x"), ("b", "y")}
    feed = {(r.k, r.op) for r in table_changes(t, v1, key_cols=["k"]).collect()}
    assert feed == {("a", "U"), ("b", "D"), ("c", "I")}


def test_mor_requires_lsn(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [])
    with pytest.raises(ValueError, match="LSN"):
        t.merge(
            spark.createDataFrame([("a", 1, "x", "I")], "k string, seq int, v string, op string"),
            key_cols=["k"], strategy="mor",
        )


def test_mor_across_schema_evolution(spark, tmp_table_dir):
    """Deltas written under an evolved schema resolve correctly against
    base rows written under the old one (per-writer-schema scan groups
    feed one resolve)."""
    t = _mk(spark, tmp_table_dir, [])
    t.merge(_chg(spark, [("a", 1, "x", "I", 1), ("b", 2, "y", "I", 2)]),
            key_cols=["k"], strategy="mor")
    wide = StructType(list(SCHEMA.fields) + [StructField("extra", StringType())])
    t.evolve_schema(wide)
    t.merge(
        spark.createDataFrame(
            [("a", 1, "x2", "e1", "U", 10), ("c", 3, "z", "e2", "I", 11)],
            "k string, seq int, v string, extra string, op string, lsn long",
        ),
        key_cols=["k"], strategy="mor",
    )
    got = {(r.k, r.v, r.extra) for r in t.read().collect()}
    assert got == {("a", "x2", "e1"), ("b", "y", None), ("c", "z", "e2")}
    # compaction folds both schema generations into current-schema base
    t.compact()
    m = t.manifest()
    assert all(f.kind == "base" and f.schema_id == m.current_schema_id for f in m.files)
    assert {(r.k, r.v, r.extra) for r in t.read().collect()} == got


def test_read_columns_projection(spark, tmp_table_dir):
    """read(columns=) equals read().select(...) in every mode, and the
    MOR resolve's packed struct is narrowed: the pre-shuffle aggregate
    must not carry unrequested columns."""
    t = _mk(spark, tmp_table_dir, [("a", 1, "xx"), ("b", 2, "yy")])
    ch = spark.createDataFrame(
        [("a", 9, "XX", "U", 100)],
        StructType(
            list(SCHEMA.fields)
            + [StructField("op", StringType()), StructField("lsn", LongType())]
        ),
    )
    t.merge(ch, key_cols=["k"], strategy="mor")
    got = {tuple(r) for r in t.read(columns=["k", "seq"]).collect()}
    want = {tuple(r) for r in t.read().select("k", "seq").collect()}
    assert got == want == {("a", 9), ("b", 2)}
    df = t.read(columns=["k", "seq"])
    assert df.columns == ["k", "seq"]
    # the resolve aggregate never touches 'v'
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "v#" not in plan, plan
    # composes with filters + include_system; order follows the request
    df2 = t.read(columns=["seq", "k"], filters=[("seq", ">", 1)])
    assert df2.columns == ["seq", "k"]
    assert {tuple(r) for r in df2.collect()} == {(9, "a"), (2, "b")}
    from dexspark.lake.table import SYS_DELETED, SYS_LSN

    sys_df = t.read(columns=["seq"], include_system=True)
    assert sys_df.columns == ["seq", SYS_LSN, SYS_DELETED]
    with pytest.raises(ValueError, match="not in table schema"):
        t.read(columns=["nope"])


def test_vacuum_orphans(spark, tmp_table_dir):
    """Losers of commit races leave written-but-unreferenced files;
    vacuum_orphans removes exactly those, honoring the in-flight grace
    period and never touching any retained manifest's files (time
    travel survives)."""
    import os
    import time

    from dexspark.lake import bloom as lake_bloom

    t = _mk(spark, tmp_table_dir, [("a", 1, "x"), ("b", 2, "y")])
    v_ab = t.current_version()
    t.append(spark.createDataFrame([("c", 3, "z")], SCHEMA))
    # a conflict loser: data written, commit never happened
    orphans = t._write_data(
        spark.createDataFrame([("d", 4, "o")], SCHEMA), t.manifest()
    )
    assert orphans
    old = time.time() - 100_000
    for f in orphans:
        p = os.path.join(tmp_table_dir, f.path)
        os.utime(p, (old, old))
        sc = lake_bloom.sidecar_path(p)
        if os.path.exists(sc):
            os.utime(sc, (old, old))
    # a FRESH orphan stays (grace period)
    fresh = t._write_data(
        spark.createDataFrame([("e", 5, "f")], SCHEMA), t.manifest()
    )
    res = t.vacuum_orphans(older_than_seconds=3600)
    assert sorted(res["removed"]) == sorted(f.path for f in orphans)
    for f in orphans:
        p = os.path.join(tmp_table_dir, f.path)
        assert not os.path.exists(p)
        assert not os.path.exists(lake_bloom.sidecar_path(p))
    for f in fresh:
        assert os.path.exists(os.path.join(tmp_table_dir, f.path))
    # live data + time travel intact
    assert {r.k for r in t.read().collect()} == {"a", "b", "c"}
    assert {r.k for r in t.read(version=v_ab).collect()} == {"a", "b"}
    # idempotent
    assert t.vacuum_orphans(older_than_seconds=3600)["removed_files"] == 0
