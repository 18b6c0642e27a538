"""Bootstrap-then-tail (dexspark.cdc.bootstrap): initial snapshot at
a watermark + incremental tail equals a full from-scratch replay."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import _parse_datatype_string

from dexspark.cdc import apply_changes, bootstrap_table
from dexspark.cdc.dedup import dedupe_latest
from dexspark.cdc.generator import gen_change_log
from dexspark.cdc.validate import REASON_COL, flag_events
from dexspark.lake.table import LakeTable
from dexspark.sources.changelog import PAYLOAD_DDL

KEYS = ["conv_id", "turn_idx"]
PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _table(spark, tmp, name):
    return LakeTable.create(
        spark, os.path.join(tmp, name),
        _parse_datatype_string(PAYLOAD_DDL), "conv_id", num_buckets=4,
    )


def _snapshot_at(log, w):
    pre = flag_events(log.filter(F.col("lsn") <= w))
    latest = dedupe_latest(pre.filter(F.col(REASON_COL).isNull()), KEYS)
    return (
        latest.filter(F.col("op") != "D").select(*PAYLOAD),
        latest.filter(F.col("op") == "D").select(*KEYS, "lsn"),
    )


def _states_equal(a, b):
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


@pytest.fixture(scope="module")
def log(spark):
    # delete-heavy so pre-watermark deletes exist to resurrect
    return gen_change_log(
        spark, 3000, n_convs=60, n_batches=3, delete_pct=20
    ).persist()


def test_bootstrap_overlapping_tail_equals_full_replay(spark, log, tmp_table_dir):
    w = 1499
    snapshot, deletes = _snapshot_at(log, w)
    t = _table(spark, tmp_table_dir, "boot")
    info = bootstrap_table(t, snapshot, watermark_lsn=w, deletes=deletes)
    assert not info["skipped"]
    # idempotent: same batch id no-ops
    assert bootstrap_table(t, snapshot, watermark_lsn=w, deletes=deletes)[
        "skipped"
    ]
    # tail OVERLAPS the watermark: batch 1 spans lsns 1000..1999
    for b in (1, 2):
        apply_changes(t, log.filter(F.col("batch_seq") == b), batch_id=f"b{b}")

    full = _table(spark, tmp_table_dir, "full")
    for b in (0, 1, 2):
        apply_changes(full, log.filter(F.col("batch_seq") == b), batch_id=f"b{b}")
    assert _states_equal(t.read(), full.read())


def test_bootstrap_without_deletes_pins_the_documented_hole(
    spark, log, tmp_table_dir
):
    """Without seeded tombstones, an overlapping tail CAN resurrect a
    key deleted before the watermark — the documented reason the plain
    contract is 'tail strictly after W'. Pin it so the semantics can't
    drift silently."""
    w = 1499
    snapshot, deletes = _snapshot_at(log, w)
    if deletes.count() == 0:
        pytest.skip("no pre-watermark deleted keys in this log")
    t = _table(spark, tmp_table_dir, "boot_nodel")
    bootstrap_table(t, snapshot, watermark_lsn=w)
    for b in (1, 2):
        apply_changes(t, log.filter(F.col("batch_seq") == b), batch_id=f"b{b}")

    full = _table(spark, tmp_table_dir, "full_nodel")
    for b in (0, 1, 2):
        apply_changes(full, log.filter(F.col("batch_seq") == b), batch_id=f"b{b}")
    extra = t.read().exceptAll(full.read())
    # resurrected rows are the only possible divergence, and only if a
    # deleted key's earlier image was redelivered by the overlap
    assert full.read().exceptAll(t.read()).count() == 0
    resurrected = {
        (r["conv_id"], r["turn_idx"]) for r in extra.select(*KEYS).collect()
    }
    deleted = {
        (r["conv_id"], r["turn_idx"]) for r in deletes.select(*KEYS).collect()
    }
    assert resurrected <= deleted


def test_bootstrap_per_row_lsn_clones_a_table(spark, log, tmp_table_dir):
    """lsn_col path: seed from another table's system columns — the
    clone is gate-equivalent to a mid-replay state, so an overlapping
    tail converges WITHOUT an explicit deletes frame (tombstones ride
    along from include_system read)."""
    src = _table(spark, tmp_table_dir, "src")
    apply_changes(src, log.filter(F.col("batch_seq") == 0), batch_id="b0")

    sysread = src.read(include_system=True)
    live = sysread.filter(~F.col("_deleted")).select(
        *PAYLOAD, F.col("_applied_lsn")
    )
    dels = sysread.filter(F.col("_deleted")).select(
        *KEYS, F.col("_applied_lsn")
    )
    clone = _table(spark, tmp_table_dir, "clone")
    bootstrap_table(
        clone, live, lsn_col="_applied_lsn",
        deletes=dels, delete_lsn_col="_applied_lsn",
    )
    assert _states_equal(clone.read(), src.read())

    # overlapping + new tail on both converges identically
    for t in (src, clone):
        apply_changes(t, log.filter(F.col("batch_seq") <= 1), batch_id="b01")
    assert _states_equal(clone.read(), src.read())


def test_bootstrap_guards(spark, log, tmp_table_dir):
    snapshot, _ = _snapshot_at(log, 999)
    t = _table(spark, tmp_table_dir, "guards")
    with pytest.raises(ValueError, match="exactly one"):
        bootstrap_table(t, snapshot)
    with pytest.raises(ValueError, match="exactly one"):
        bootstrap_table(t, snapshot, watermark_lsn=5, lsn_col="lsn")
    apply_changes(t, log.filter(F.col("batch_seq") == 0), batch_id="b0")
    with pytest.raises(ValueError, match="fresh table"):
        bootstrap_table(t, snapshot, watermark_lsn=999)
    bad = spark.createDataFrame([("c1", 0)], "conv_id string, turn_idx int")
    t2 = _table(spark, tmp_table_dir, "guards2")
    with pytest.raises(ValueError, match="lacks columns"):
        bootstrap_table(t2, snapshot, watermark_lsn=999, deletes=bad)


def test_bootstrap_rejects_reserved_columns(spark, log, tmp_table_dir):
    t = _table(spark, tmp_table_dir, "reserved")
    snap_with_lsn = log.filter(F.col("batch_seq") == 0).select(*PAYLOAD, "lsn")
    with pytest.raises(ValueError, match="reserved CDC columns"):
        bootstrap_table(t, snap_with_lsn, watermark_lsn=999)
    # the documented escape hatch: use the column as per-row LSNs
    info = bootstrap_table(t, snap_with_lsn, lsn_col="lsn")
    assert not info["skipped"]
