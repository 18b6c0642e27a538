"""Branches (write-audit-publish): staging namespace, atomic publish,
ledger fold-in, GC interplay.

≙ the reference's staged-destination pattern (RouteIngestedFile.kt:
57-75: write to a staging container, fan out only after the copy is
durable), generalized to whole-table staging a la Iceberg branch refs.
"""

import os

import pytest
import pyspark.sql.functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from dexspark.cdc import apply_changes
from dexspark.cdc.generator import gen_change_log
from dexspark.lake import LakeTable
from dexspark.lake.table import CommitConflict

SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)


@pytest.fixture(scope="module")
def log(spark):
    return gen_change_log(spark, 3000, n_convs=50, n_batches=4).cache()


def _mk(spark, tmp_path, name="tbl"):
    return LakeTable.create(
        spark, os.path.join(str(tmp_path), name), SCHEMA, "conv_id", 8
    )


def _apply(t, log, b, batch_id=None):
    return apply_changes(
        t, log.filter(F.col("batch_seq") == b), batch_id=batch_id or f"b{b}"
    )


def test_branch_isolation_both_ways(spark, tmp_path, log):
    t = _mk(spark, tmp_path)
    _apply(t, log, 0)
    main_count = t.read().count()
    br = t.create_branch("stage")
    _apply(br, log, 1)
    # branch writes invisible to main
    assert t.read().count() == main_count
    assert br.read().count() > main_count
    # main writes after the fork invisible to the branch
    _apply(t, log, 2)
    assert "b2" not in br.committed_batch_ids()
    assert "b1" not in t.committed_batch_ids()


def test_publish_equals_direct_apply(spark, tmp_path, log):
    t = _mk(spark, tmp_path, "wap")
    ref = _mk(spark, tmp_path, "direct")
    _apply(t, log, 0)
    _apply(ref, log, 0)
    br = t.create_branch("stage")
    _apply(br, log, 1)
    _apply(br, log, 2)
    info = t.publish_branch("stage")
    assert info["published_batch_ids"] == ["b1", "b2"]
    _apply(ref, log, 1)
    _apply(ref, log, 2)
    a, b = t.read(), ref.read()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # published ids are in main's exactly-once ledger
    assert _apply(t, log, 1)["skipped"] is True
    assert _apply(t, log, 2)["skipped"] is True


def test_publish_fast_forward_conflict(spark, tmp_path, log):
    t = _mk(spark, tmp_path)
    _apply(t, log, 0)
    t.create_branch("stale")
    _apply(t.branch_table("stale"), log, 1)
    _apply(t, log, 2)  # main advances past the fork point
    with pytest.raises(CommitConflict, match="re-branch"):
        t.publish_branch("stale")
    # main untouched by the failed publish
    assert "b1" not in t.committed_batch_ids()


def test_publish_empty_branch_skips(spark, tmp_path, log):
    t = _mk(spark, tmp_path)
    _apply(t, log, 0)
    t.create_branch("empty")
    assert t.publish_branch("empty")["skipped"] is True


def test_drop_branch_then_corrected_restage(spark, tmp_path, log):
    """The WAP audit-failure path: a poisoned staged batch is dropped
    with main untouched, and the corrected batch re-applies under the
    ORIGINAL id because the dropped branch's ledger dies with it."""
    t = _mk(spark, tmp_path)
    _apply(t, log, 0)
    br = t.create_branch("poisoned")
    poison = log.filter(F.col("batch_seq") == 1).withColumn(
        "text", F.concat_ws(" ", F.col("text"), F.lit("CORRUPT"))
    )
    apply_changes(br, poison, batch_id="b1")
    t.drop_branch("poisoned")
    assert "poisoned" not in t.list_branches()
    br2 = t.create_branch("fixed")
    assert _apply(br2, log, 1)["skipped"] is False  # original id free
    t.publish_branch("fixed")
    ref = _mk(spark, tmp_path, "direct")
    _apply(ref, log, 0)
    _apply(ref, log, 1)
    a, b = t.read(), ref.read()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_branch_time_travel_crosses_fork(spark, tmp_path, log):
    t = _mk(spark, tmp_path)
    _apply(t, log, 0)
    v0 = t.current_version()
    _apply(t, log, 1)
    br = t.create_branch("stage")
    _apply(br, log, 2)
    # pre-fork version resolves through the fallback to main
    assert br.read(version=v0).count() == t.read(version=v0).count()


def test_branch_schema_evolution_publishes(spark, tmp_path, log):
    t = _mk(spark, tmp_path)
    _apply(t, log, 0)
    br = t.create_branch("evolve")
    wider = StructType(SCHEMA.fields + [StructField("channel", StringType())])
    br.evolve_schema(wider)
    assert "channel" not in t.schema().fieldNames()
    t.publish_branch("evolve")
    assert "channel" in t.schema().fieldNames()


def test_branch_rollback_bounded_at_fork(spark, tmp_path, log):
    t = _mk(spark, tmp_path)
    _apply(t, log, 0)
    v_fork = t.current_version()
    br = t.create_branch("stage")
    _apply(br, log, 1)
    good = br.current_version()
    _apply(br, log, 2, batch_id="bad")
    br.rollback(good)
    assert "bad" not in br.committed_batch_ids()
    with pytest.raises(ValueError, match="fork point"):
        br.rollback(v_fork - 1) if v_fork > 1 else br.rollback(0)


def test_expire_keeps_branch_referenced_files(spark, tmp_path, log):
    t = _mk(spark, tmp_path)
    _apply(t, log, 0)
    br = t.create_branch("stage")
    _apply(br, log, 1)
    branch_count = br.read().count()
    for b in (2, 3):
        _apply(t, log, b)
    t.expire_snapshots(keep_last=1)
    # the branch still reads fully: its files (incl. pre-fork files it
    # shares with expired main versions) survived the expiry
    assert br.read().count() == branch_count


def test_vacuum_spares_branch_files_until_drop(spark, tmp_path, log):
    t = _mk(spark, tmp_path)
    _apply(t, log, 0)
    br = t.create_branch("stage")
    _apply(br, log, 1)
    n = br.read().count()
    assert t.vacuum_orphans(older_than_seconds=0)["removed"] == []
    assert br.read().count() == n
    t.drop_branch("stage")
    # now the branch-only files are orphans and GC reclaims them
    assert t.vacuum_orphans(older_than_seconds=0)["removed"] != []
    assert t.read().count() > 0  # main intact


def test_maintenance_refused_on_branch(spark, tmp_path, log):
    t = _mk(spark, tmp_path)
    _apply(t, log, 0)
    br = t.create_branch("stage")
    with pytest.raises(ValueError, match="main ref"):
        br.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="main ref"):
        br.vacuum_orphans()
    with pytest.raises(ValueError, match="main ref"):
        br.create_branch("nested")
    with pytest.raises(ValueError, match="main ref"):
        br.publish_branch("stage")


def test_create_branch_duplicate_and_bad_names(spark, tmp_path, log):
    t = _mk(spark, tmp_path)
    t.create_branch("dup")
    with pytest.raises(ValueError, match="already exists"):
        t.create_branch("dup")
    for bad in ("", ".hidden", "a/b", "a b", "-x"):
        with pytest.raises(ValueError, match="branch name"):
            t.create_branch(bad)
    with pytest.raises(FileNotFoundError):
        t.branch_table("nope")
