"""Snapshot rollback (restore): bad-batch remediation.

The invariant under test: ``rollback(v)`` makes ``read()`` equal
``read(version=v)`` exactly — across COW merges, MOR deltas, schema
evolution, and bucket-layout changes — while PRESERVING the physical
history (time travel + lineage audit) and REWINDING the exactly-once
ledger, so a corrected replay of a rolled-back batch re-applies under
its original batch id instead of no-opping.

≙ reference: replay-from-checkpoint recovery (FnOrchestrator.kt:182-192)
realized as an O(1) snapshot operation on the lake.
"""

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

from dexspark.cdc.apply import apply_changes
from dexspark.lake.table import CommitConflict, LakeTable

SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("seq", IntegerType()),
        StructField("v", StringType()),
    ]
)


def _mk(spark, d, rows=None):
    t = LakeTable.create(spark, d, SCHEMA, bucket_key="k", num_buckets=8)
    if rows:
        t.append(spark.createDataFrame(rows, SCHEMA))
    return t


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "k string, seq int, v string, op string, lsn long"
    )


def _state(t, version=None):
    return {(r.k, r.seq, r.v) for r in t.read(version=version).collect()}


def test_rollback_restores_exact_state_and_keeps_history(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [("a", 1, "x"), ("b", 1, "y")])
    good = t.current_version()
    t.merge(
        _changes(spark, [("a", 2, "BAD", "U", 10), ("c", 1, "BAD", "I", 11)]),
        key_cols=["k"],
        summary={"batch_id": "poison"},
    )
    bad = t.current_version()
    info = t.rollback(good)
    assert info["restored_version"] == good
    assert info["rolled_back_from"] == bad
    # state restored exactly, but as a NEW commit (history preserved)
    assert _state(t) == _state(t, version=good) == {("a", 1, "x"), ("b", 1, "y")}
    assert t.current_version() == bad + 1
    # the bad snapshot is still time-travelable, and the audit trail
    # (lineage) keeps the physical truth of what happened
    assert ("a", 2, "BAD") in _state(t, version=bad)
    assert "poison" in {m.summary.get("batch_id") for m in t.history()}


def test_rollback_rewinds_ledger_so_corrected_batch_reapplies(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [("a", 1, "x")])
    good = t.current_version()
    bad = _changes(spark, [("a", 1, "CORRUPT", "U", 5)])
    t.merge(bad, key_cols=["k"], summary={"batch_id": "b1"})
    assert "b1" in t.committed_batch_ids()
    t.rollback(good)
    # the rolled-back batch leaves the LIVE ledger...
    assert "b1" not in t.committed_batch_ids()
    # ...so the corrected batch lands under the SAME id
    fixed = _changes(spark, [("a", 1, "fixed", "U", 5)])
    t.merge(fixed, key_cols=["k"], summary={"batch_id": "b1"})
    assert _state(t) == {("a", 1, "fixed")}
    assert "b1" in t.committed_batch_ids()


def test_rollback_rewinds_apply_changes_ledger(spark, tmp_table_dir):
    """End-to-end through the CDC apply path: apply → rollback →
    re-apply the same batch_id must re-apply, not skip."""
    t = LakeTable.create(
        spark,
        tmp_table_dir,
        StructType(
            [
                StructField("conv_id", StringType()),
                StructField("turn_idx", IntegerType()),
                StructField("role", StringType()),
                StructField("text", StringType()),
                StructField("tool", StringType()),
                StructField("ts", LongType()),
            ]
        ),
        bucket_key="conv_id",
        num_buckets=4,
    )
    good = t.current_version()

    def ev(text, lsn):
        return spark.createDataFrame(
            [("c1", 0, "user", text, None, 1000, "I", lsn)],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts long, op string, lsn long",
        )

    r1 = apply_changes(t, ev("CORRUPT", 1), batch_id="x1")
    assert not r1.get("skipped")
    # a straight replay of the committed id is a no-op (exactly-once)
    assert apply_changes(t, ev("CORRUPT", 1), batch_id="x1")["skipped"]
    t.rollback(good)
    r2 = apply_changes(t, ev("good", 1), batch_id="x1")
    assert not r2.get("skipped")
    assert [r.text for r in t.read().collect()] == ["good"]


def test_rollback_across_mor_deltas(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [("a", 1, "x")])
    t.merge(
        _changes(spark, [("b", 1, "y", "I", 1)]),
        key_cols=["k"],
        summary={"batch_id": "m1"},
        strategy="mor",
    )
    mid = t.current_version()
    t.merge(
        _changes(spark, [("a", 9, "BAD", "U", 2), ("b", 9, "BAD", "U", 3)]),
        key_cols=["k"],
        summary={"batch_id": "m2"},
        strategy="mor",
    )
    t.rollback(mid)
    # restored state resolves outstanding deltas exactly as of `mid`
    assert _state(t) == {("a", 1, "x"), ("b", 1, "y")}


def test_rollback_across_rebucket_restores_layout(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [("a", 1, "x"), ("b", 1, "y")])
    before = t.current_version()
    t.rebucket(16)
    assert t.manifest().num_buckets == 16
    t.rollback(before)
    assert t.manifest().num_buckets == 8
    assert _state(t) == {("a", 1, "x"), ("b", 1, "y")}
    # the restored layout is fully writable
    t.merge(
        _changes(spark, [("c", 1, "z", "I", 1)]),
        key_cols=["k"],
        summary={"batch_id": "after"},
    )
    assert ("c", 1, "z") in _state(t)


def test_rollback_then_expire_keeps_restored_files(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [("a", 1, "x")])
    good = t.current_version()
    t.merge(
        _changes(spark, [("a", 2, "BAD", "U", 7)]),
        key_cols=["k"],
        summary={"batch_id": "p"},
    )
    t.rollback(good)
    # expiry removes the rolled-back snapshots but must keep every file
    # the live (restored) manifest references
    t.expire_snapshots(keep_last=1)
    assert _state(t) == {("a", 1, "x")}
    t.vacuum_orphans(older_than_seconds=0)
    assert _state(t) == {("a", 1, "x")}


def test_rollback_validation_and_noop(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [("a", 1, "x")])
    head = t.current_version()
    assert t.rollback(head)["skipped"]
    with pytest.raises(ValueError, match="head"):
        t.rollback(head + 5)
    # a target expired out of retention is a loud error, not a guess
    old = t.current_version()
    t.append(spark.createDataFrame([("b", 1, "y")], SCHEMA))
    t.append(spark.createDataFrame([("c", 1, "z")], SCHEMA))
    t.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        t.rollback(old)


def test_rollback_then_evolve_schema_again(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [("a", 1, "x")])
    base = t.current_version()
    wide = StructType(SCHEMA.fields + [StructField("extra", StringType())])
    t.evolve_schema(wide)
    t.rollback(base)
    assert t.schema().fieldNames() == ["k", "seq", "v"]
    # schema evolution works again on the restored lineage
    assert t.evolve_schema(wide)
    assert "extra" in t.schema().fieldNames()
    got = {(r.k, r.seq, r.v, r.extra) for r in t.read().collect()}
    assert got == {("a", 1, "x", None)}


def test_rebase_guard_rejects_stale_schema_ids_after_rollback(spark, tmp_table_dir):
    """A writer holding a manifest from an evolved lineage must NOT
    rebase files tagged with a schema id a concurrent rollback removed
    from the map — that would commit a manifest reads can't decode."""
    t = _mk(spark, tmp_table_dir, [("a", 1, "x")])
    base = t.current_version()
    wide = StructType(SCHEMA.fields + [StructField("extra", StringType())])
    t.evolve_schema(wide)
    stale = t.manifest()  # schemas {0, 1}, current id 1
    new_files = t._write_data(
        spark.createDataFrame([("z", 1, "q", "zz")], wide).select(
            *[F.col(f.name).cast(f.dataType) for f in wide.fields]
        ),
        stale,
    )
    t.rollback(base)  # head now has schemas {0}
    with pytest.raises(CommitConflict, match="rollback"):
        t._commit_delta(stale, set(), new_files, {"operation": "append"})
