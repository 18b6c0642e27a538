"""Timestamp time travel (read(as_of=...), resolve_as_of).

Invariants:
1. as-of a moment between commits resolves to the newest snapshot at
   or before it — byte-equal to version time travel;
2. as-of before the first retained snapshot raises;
3. commit stamps are monotone even when the driver clock steps
   backwards (clamped to the parent), and equal stamps resolve to the
   NEWEST version (version stays the authority on order);
4. version=/tag=/as_of= are mutually exclusive.
"""

import time
from unittest import mock

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from dexspark.lake.table import LakeTable

SCHEMA = StructType(
    [StructField("k", StringType()), StructField("seq", LongType())]
)


def _append(t, spark, lo, hi):
    t.append(
        spark.createDataFrame([(f"k{i}", i) for i in range(lo, hi)], SCHEMA)
    )


def test_as_of_resolves_between_commits(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, bucket_key="k", num_buckets=2
    )
    _append(t, spark, 0, 10)
    t1 = time.time()
    _append(t, spark, 10, 30)
    t2 = time.time()
    _append(t, spark, 30, 60)
    assert t.read(as_of=t1).count() == 10
    assert t.read(as_of=t2).count() == 30
    assert t.read(as_of=time.time()).count() == 60
    # datetime form, naive = UTC (session timezone)
    import datetime as dt

    d2 = dt.datetime.fromtimestamp(t2, dt.timezone.utc).replace(tzinfo=None)
    assert t.resolve_as_of(d2) == t.resolve_as_of(t2)


def test_as_of_before_history_raises(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, bucket_key="k", num_buckets=2
    )
    with pytest.raises(ValueError, match="no retained snapshot"):
        t.resolve_as_of(0.0)


def test_clock_step_back_clamps_and_newest_wins(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, bucket_key="k", num_buckets=2
    )
    _append(t, spark, 0, 5)
    ts1 = t.manifest().committed_at
    # driver clock steps an hour backwards; the next commit must clamp
    # to the parent's stamp, not reorder history
    with mock.patch("time.time", return_value=ts1 - 3600):
        _append(t, spark, 5, 9)
    ts2 = t.manifest().committed_at
    assert ts2 >= ts1
    # equal stamps: as-of the shared moment resolves to the NEWEST
    assert t.resolve_as_of(ts2) == t.current_version()


def test_selector_exclusivity(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, bucket_key="k", num_buckets=2
    )
    _append(t, spark, 0, 5)
    with pytest.raises(ValueError, match="at most one"):
        t.read(version=1, as_of=time.time())


def test_age_floor_expiry(spark, tmp_table_dir):
    """expire_snapshots(older_than_seconds=...): snapshots younger
    than the horizon survive beyond keep_last; old ones expire; the
    pure keep_last path is unchanged."""
    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, bucket_key="k", num_buckets=2
    )
    for c in range(4):
        _append(t, spark, c * 5, (c + 1) * 5)
    # everything is seconds old -> a 1-hour age floor expires nothing
    r = t.expire_snapshots(keep_last=1, older_than_seconds=3600)
    assert r["expired_versions"] == []
    assert t.read(version=2).count() == 5  # history intact
    # age floor of 0 behaves like pure keep_last
    r = t.expire_snapshots(keep_last=1, older_than_seconds=0)
    assert len(r["expired_versions"]) == 4
    assert t.read().count() == 20


def test_vacuum_dry_run(spark, tmp_table_dir):
    import os
    import time

    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, bucket_key="k", num_buckets=2
    )
    _append(t, spark, 0, 10)
    orphan = os.path.join(
        tmp_table_dir, "data", "deadbeefcafe0000", "part-x.parquet"
    )
    os.makedirs(os.path.dirname(orphan))
    with open(orphan, "wb") as fh:
        fh.write(b"x")
    old = time.time() - 7 * 24 * 3600
    os.utime(orphan, (old, old))
    r = t.vacuum_orphans(dry_run=True)
    assert r["dry_run"] and any("deadbeef" in p for p in r["removed"])
    assert os.path.exists(orphan)  # nothing actually deleted
    r2 = t.vacuum_orphans()
    assert r2["removed"] == r["removed"]
    assert not os.path.exists(orphan)
