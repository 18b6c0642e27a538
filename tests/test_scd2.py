"""SCD Type-2 history apply: interval chains, out-of-order batches,
dangling-delete markers, idempotency."""

import datetime as dt
import os

import pytest

import pyspark.sql.functions as F
from pyspark.sql.types import _parse_datatype_string

from dexspark.cdc.scd2 import apply_changes_scd2, scd2_schema, scd2_view
from dexspark.cdc.validate import ValidationConfig
from dexspark.lake.table import LakeTable

PAYLOAD = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)
TS = dt.datetime(2024, 1, 1)


def _mk_history(spark, d, num_buckets=4):
    return LakeTable.create(
        spark,
        os.path.join(d, "hist"),
        scd2_schema(_parse_datatype_string(PAYLOAD)),
        "conv_id",
        num_buckets,
    )


def _events(spark, rows):
    """rows: (lsn, op, conv_id, turn_idx, text)"""
    return spark.createDataFrame(
        [(l, o, c, t, "user", x, None, TS) for (l, o, c, t, x) in rows],
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp",
    )


def _versions(history):
    return {
        (r.conv_id, r.turn_idx, r.valid_from_lsn): (
            r.valid_to_lsn,
            r.closed_by_delete,
            r.is_current,
            r.text,
        )
        for r in scd2_view(history.read()).collect()
    }


def test_basic_chain_and_delete(spark, tmp_table_dir):
    h = _mk_history(spark, tmp_table_dir)
    apply_changes_scd2(
        h,
        _events(
            spark,
            [
                (10, "I", "c1", 0, "v1"),
                (20, "U", "c1", 0, "v2"),
                (30, "D", "c1", 0, None),
                (15, "I", "c2", 0, "w1"),
            ],
        ),
        batch_id="b0",
        cfg=ValidationConfig(check_ts_monotonic=False),
    )
    got = _versions(h)
    assert got == {
        ("c1", 0, 10): (20, False, False, "v1"),
        ("c1", 0, 20): (30, True, False, "v2"),
        ("c2", 0, 15): (None, False, True, "w1"),
    }


def test_out_of_order_middle_insert_and_dangling_delete(spark, tmp_table_dir):
    h = _mk_history(spark, tmp_table_dir)
    cfg = ValidationConfig(check_ts_monotonic=False)
    # later batch first: an update and a DELETE whose predecessors
    # haven't arrived yet
    apply_changes_scd2(
        h,
        _events(spark, [(40, "U", "c1", 0, "v3"), (60, "D", "c1", 0, None)]),
        batch_id="b1",
        cfg=cfg,
    )
    mid = _versions(h)
    assert mid == {("c1", 0, 40): (60, True, False, "v3")}
    # physical table additionally holds no marker here (D was consumed)
    assert h.read().count() == 1

    # earlier batch arrives: opens at 10, a delete at 30 that is
    # dangling (nothing between 30 and 40 yet)
    apply_changes_scd2(
        h,
        _events(spark, [(10, "I", "c1", 0, "v1"), (30, "D", "c1", 0, None)]),
        batch_id="b2",
        cfg=cfg,
    )
    got = _versions(h)
    assert got == {
        ("c1", 0, 10): (30, True, False, "v1"),
        ("c1", 0, 40): (60, True, False, "v3"),
    }
    # the dangling-consumed transition left no extra physical rows:
    # D@30 closed v1 directly, D@60 still recorded on v3
    markers = h.read().filter(
        F.col("valid_to_lsn").eqNullSafe(F.col("valid_from_lsn"))
    )
    assert markers.count() == 0

    # a middle image lands between the stored delete and stored open:
    # 30 is consumed against v1 already; image at 35 must slot in as
    # [35, 40)
    apply_changes_scd2(
        h,
        _events(spark, [(35, "I", "c1", 0, "v2b")]),
        batch_id="b3",
        cfg=cfg,
    )
    got = _versions(h)
    assert got[("c1", 0, 35)] == (40, False, False, "v2b")
    assert got[("c1", 0, 10)] == (30, True, False, "v1")


def test_marker_persisted_then_consumed(spark, tmp_table_dir):
    h = _mk_history(spark, tmp_table_dir)
    cfg = ValidationConfig(check_ts_monotonic=False)
    # delete-first: nothing to close -> zero-length marker persisted,
    # logical view empty
    apply_changes_scd2(
        h, _events(spark, [(50, "D", "c1", 0, None)]), batch_id="b1", cfg=cfg
    )
    assert _versions(h) == {}
    markers = h.read().filter(
        F.col("valid_to_lsn").eqNullSafe(F.col("valid_from_lsn"))
    )
    assert markers.count() == 1

    # the earlier image arrives: marker must close it and disappear
    apply_changes_scd2(
        h, _events(spark, [(20, "I", "c1", 0, "v1")]), batch_id="b2", cfg=cfg
    )
    assert _versions(h) == {("c1", 0, 20): (50, True, False, "v1")}
    assert h.read().count() == 1  # marker row deleted


def test_idempotent_batch_replay(spark, tmp_table_dir):
    h = _mk_history(spark, tmp_table_dir)
    cfg = ValidationConfig(check_ts_monotonic=False)
    ev = _events(spark, [(10, "I", "c1", 0, "v1"), (20, "U", "c1", 0, "v2")])
    r1 = apply_changes_scd2(h, ev, batch_id="b1", cfg=cfg)
    assert not r1["skipped"]
    before = _versions(h)
    r2 = apply_changes_scd2(h, ev, batch_id="b1", cfg=cfg)
    assert r2["skipped"]
    assert _versions(h) == before

    # redelivered events inside a NEW batch id are deduped against
    # stored state, not double-versioned
    r3 = apply_changes_scd2(h, ev, batch_id="b2", cfg=cfg)
    assert not r3["skipped"]
    assert _versions(h) == before


def test_rejects_quarantined_not_versioned(spark, tmp_table_dir):
    h = _mk_history(spark, tmp_table_dir)
    q = LakeTable.create(
        spark,
        os.path.join(tmp_table_dir, "quar"),
        _parse_datatype_string(
            "lsn long, op string, conv_id string, turn_idx int, role string, "
            "text string, tool string, ts timestamp, reject_reason string, "
            "batch_id string"
        ),
        "conv_id",
        2,
    )
    cfg = ValidationConfig(check_ts_monotonic=False)
    bad = spark.createDataFrame(
        [(10, "I", "c1", 0, "alien", "x", None, TS)],
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp",
    )
    res = apply_changes_scd2(h, bad, batch_id="b1", cfg=cfg, quarantine=q)
    assert res["rejected"] == 1
    assert _versions(h) == {}
    assert q.read().count() == 1


def test_marker_survives_unrelated_later_event(spark, tmp_table_dir):
    """A still-dangling marker must NOT be deleted when a later batch
    touches the same key without consuming it (regression: the stale-
    marker anti-join must run against the full rebuild, not the
    changed-rows merge feed)."""
    h = _mk_history(spark, tmp_table_dir)
    cfg = ValidationConfig(check_ts_monotonic=False)
    apply_changes_scd2(
        h, _events(spark, [(50, "D", "c1", 0, None)]), batch_id="b1", cfg=cfg
    )
    # later event on the same key: marker at 50 stays dangling
    apply_changes_scd2(
        h, _events(spark, [(60, "I", "c1", 0, "v2")]), batch_id="b2", cfg=cfg
    )
    markers = h.read().filter(
        F.col("valid_to_lsn").eqNullSafe(F.col("valid_from_lsn"))
    )
    assert markers.count() == 1
    assert _versions(h) == {("c1", 0, 60): (None, False, True, "v2")}

    # the pre-marker image finally arrives: marker consumed, chain
    # [20,50) closed-by-delete, [60,None) current
    apply_changes_scd2(
        h, _events(spark, [(20, "I", "c1", 0, "v1")]), batch_id="b3", cfg=cfg
    )
    assert _versions(h) == {
        ("c1", 0, 20): (50, True, False, "v1"),
        ("c1", 0, 60): (None, False, True, "v2"),
    }
    assert h.read().filter(
        F.col("valid_to_lsn").eqNullSafe(F.col("valid_from_lsn"))
    ).count() == 0


def test_scd2_temporal_join_interval_semantics(spark):
    """Coverage edges of the fact-to-dimension temporal join: opens
    inclusive, closes exclusive, delete gaps uncovered, markers
    invisible, open version covers to +inf; left join nulls the
    uncovered probes instead of dropping them."""
    from dexspark.cdc.scd2 import scd2_temporal_join

    hist = spark.createDataFrame(
        [
            ("A", "v1", 10, 20, False, False),
            ("A", "v2", 20, 30, True, False),   # deleted at 30
            ("A", "marker", 35, 35, True, False),  # dangling-D marker
            ("A", "v3", 40, None, False, True),  # reinserted, open
            ("B", "only", 15, None, False, True),
        ],
        "k string, text string, valid_from_lsn long, valid_to_lsn long, "
        "closed_by_delete boolean, is_current boolean",
    )
    facts = spark.createDataFrame(
        [("A", i) for i in (5, 10, 19, 20, 29, 30, 35, 40, 100)]
        + [("B", 14), ("B", 15)],
        "k string, lsn long",
    )
    inner = {
        (r["k"], r["lsn"]): r["text_dim"]
        for r in scd2_temporal_join(facts, hist, ["k"]).collect()
    }
    assert inner == {
        ("A", 10): "v1", ("A", 19): "v1",       # open inclusive
        ("A", 20): "v2", ("A", 29): "v2",       # close exclusive
        ("A", 40): "v3", ("A", 100): "v3",      # open version -> +inf
        ("B", 15): "only",
    }  # 5 (pre-insert), 30/35 (deleted; marker invisible), B@14 drop

    left = scd2_temporal_join(facts, hist, ["k"], how="left")
    assert left.count() == facts.count()
    nulls = {
        (r["k"], r["lsn"])
        for r in left.filter(F.col("text_dim").isNull()).collect()
    }
    assert nulls == {("A", 5), ("A", 30), ("A", 35), ("B", 14)}
    # no join node at all: union + window, so no BNLJ/cartesian is
    # even possible — assert the plan stays that way
    plan = left._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    with pytest.raises(ValueError, match="inner|left"):
        scd2_temporal_join(facts, hist, ["k"], how="full")


def test_scd2_drop_mode_expectation_quarantines(spark, tmp_table_dir):
    """ADVICE r4: drop-mode CHECK expectations bind to the SCD2 ingest
    path too — a violating new image is quarantined with
    constraint:<name> instead of opening a version; deletes are
    exempt; fail-mode still aborts via merge's stats pass."""
    from dexspark.cdc.validate import REASON_COL
    from dexspark.lake.constraints import ConstraintViolation

    h = _mk_history(spark, tmp_table_dir)
    h.add_constraint(
        "short_text", "length(text) <= 4", on_violation="drop"
    )
    q = LakeTable.create(
        spark,
        os.path.join(tmp_table_dir, "quar"),
        _parse_datatype_string(
            "lsn long, op string, conv_id string, turn_idx int, role string,"
            " text string, tool string, ts timestamp, "
            f"{REASON_COL} string, batch_id string"
        ),
        "conv_id",
        2,
    )
    res = apply_changes_scd2(
        h,
        _events(
            spark,
            [
                (10, "I", "c1", 0, "ok"),
                (20, "U", "c1", 0, "waytoolong"),  # expectation violation
                (30, "D", "c1", 0, None),  # delete exempt
            ],
        ),
        batch_id="b0",
        cfg=ValidationConfig(check_ts_monotonic=False),
        quarantine=q,
    )
    assert res["rejected"] == 1
    got = _versions(h)
    # the violating U never opened a version: v1 runs 10→30, closed by D
    assert got == {("c1", 0, 10): (30, True, False, "ok")}
    qrows = q.read().collect()
    assert [(r.conv_id, r[REASON_COL]) for r in qrows] == [
        ("c1", "constraint:short_text")
    ]

    # fail-mode invariant aborts the batch before anything commits
    h.add_constraint("idx_cap", "turn_idx < 100", on_violation="fail")
    with pytest.raises(ConstraintViolation):
        apply_changes_scd2(
            h,
            _events(spark, [(40, "I", "c9", 500, "x")]),
            batch_id="b1",
            cfg=ValidationConfig(check_ts_monotonic=False),
        )
    assert "b1" not in h.committed_batch_ids()
