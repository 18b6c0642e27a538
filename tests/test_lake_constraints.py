"""CHECK constraints: declaration, metadata-only commits, enforcement
on every write path, and the CDC expectation (drop-to-quarantine)
integration."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from dexspark.cdc.apply import apply_changes
from dexspark.cdc.validate import ValidationConfig
from dexspark.lake.constraints import ConstraintViolation
from dexspark.lake.table import LakeTable

SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("seq", IntegerType()),
        StructField("v", StringType()),
    ]
)


def _mk(spark, d, rows=()):
    t = LakeTable.create(spark, d, SCHEMA, bucket_key="k", num_buckets=4)
    if rows:
        t.append(spark.createDataFrame(list(rows), SCHEMA))
    return t


def _chg(spark, rows):
    return spark.createDataFrame(
        rows, "k string, seq int, v string, op string, lsn long"
    )


def test_add_validates_existing_and_is_metadata_only(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [("a", 1, "x"), ("b", 2, "y")])
    v0 = t.current_version()
    files0 = {f.path for f in t.manifest().files}
    info = t.add_constraint("seq_pos", "seq > 0")
    assert info["validated_rows"] == 2
    assert t.current_version() == v0 + 1
    assert {f.path for f in t.manifest().files} == files0  # no data I/O
    assert t.constraints() == {
        "seq_pos": {"expr": "seq > 0", "on_violation": "fail"}
    }
    # violating existing data blocks the add
    with pytest.raises(ConstraintViolation):
        t.add_constraint("v_short", "length(v) > 5")
    assert "v_short" not in t.constraints()


def test_add_rejects_bad_expr_and_dup_name(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [("a", 1, "x")])
    with pytest.raises(Exception):
        t.add_constraint("bad", "no_such_col > 0")
    t.add_constraint("c1", "seq > 0")
    with pytest.raises(ValueError):
        t.add_constraint("c1", "seq > 0")
    with pytest.raises(ValueError):
        t.add_constraint("c2", "seq > 0", on_violation="explode")


def test_merge_enforces_fail_mode(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [("a", 1, "x")])
    t.add_constraint("seq_pos", "seq > 0")
    v = t.current_version()
    with pytest.raises(ConstraintViolation) as ei:
        t.merge(
            _chg(spark, [("b", -5, "y", "I", 10), ("c", 3, "z", "I", 11)]),
            key_cols=["k"],
        )
    assert ei.value.counts == {"seq_pos": 1}
    assert t.current_version() == v  # nothing committed
    # deletes carry key-only payloads: the constraint must not fire
    t.merge(
        _chg(spark, [("a", None, None, "D", 12), ("d", 4, "w", "I", 13)]),
        key_cols=["k"],
    )
    got = {(r.k, r.seq) for r in t.read().collect()}
    assert got == {("d", 4)}


def test_append_overwrite_enforce(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [("a", 1, "x")])
    t.add_constraint("seq_pos", "seq > 0")
    with pytest.raises(ConstraintViolation):
        t.append(spark.createDataFrame([("b", 0, "y")], SCHEMA))
    with pytest.raises(ConstraintViolation):
        t.overwrite(spark.createDataFrame([("b", 0, "y")], SCHEMA))
    t.append(spark.createDataFrame([("b", 2, "y")], SCHEMA))
    assert t.read().count() == 2


def test_merge_into_enforces(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [("a", 1, "x")])
    t.add_constraint("seq_pos", "seq > 0")
    src = spark.createDataFrame([("a", 1, "x")], SCHEMA)
    with pytest.raises(ConstraintViolation):
        t.merge_into(
            src,
            ["k"],
            when_matched=[("update", None, {"seq": "-1"})],
        )
    # carried-over rows are not re-checked; a clean update passes
    t.merge_into(src, ["k"], when_matched=[("update", None, {"seq": "7"})])
    assert t.read().filter("k = 'a'").first()["seq"] == 7


def test_drop_constraint_and_null_passes(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [("a", 1, "x")])
    t.add_constraint("seq_pos", "seq > 0")
    # SQL-standard CHECK: NULL (UNKNOWN) passes
    t.append(spark.createDataFrame([("n", None, "y")], SCHEMA))
    t.drop_constraint("seq_pos")
    assert t.constraints() == {}
    t.append(spark.createDataFrame([("b", -1, "y")], SCHEMA))
    assert t.read().count() == 3
    with pytest.raises(ValueError):
        t.drop_constraint("seq_pos")


def test_constraints_survive_other_commits(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [("a", 1, "x")])
    t.add_constraint("seq_pos", "seq > 0")
    t.merge(_chg(spark, [("b", 2, "y", "I", 1)]), key_cols=["k"])
    t.compact()
    assert "seq_pos" in t.constraints()


CFG = ValidationConfig(
    key_cols=("k",),
    role_col="_none",
    text_col="_none",
    check_ts_monotonic=False,
)


def test_apply_changes_drop_mode_quarantines(spark, tmp_table_dir, tmp_path):
    t = _mk(spark, tmp_table_dir)
    q = LakeTable.create(
        spark, str(tmp_path / "q"),
        StructType(
            list(
                _chg(spark, [("a", 1, "x", "I", 1)]).schema.fields
            )
            + [
                StructField("reject_reason", StringType()),
                StructField("batch_id", StringType()),
            ]
        ),
        bucket_key="k", num_buckets=2,
    )
    t.add_constraint("seq_cap", "seq < 100", on_violation="drop")
    res = apply_changes(
        t,
        _chg(
            spark,
            [
                ("a", 1, "x", "I", 1),
                ("b", 500, "big", "I", 2),  # expectation violation
                ("c", None, None, "D", 3),  # delete: constraint skipped
            ],
        ),
        batch_id="b0",
        cfg=CFG,
        quarantine=q,
    )
    assert res["rejected"] == 1
    assert res["rejected_by_reason"] == {"constraint:seq_cap": 1}
    assert {r.k for r in t.read().collect()} == {"a"}
    qrows = q.read().collect()
    assert [(r.k, r.reject_reason) for r in qrows] == [
        ("b", "constraint:seq_cap")
    ]


def test_apply_changes_fail_mode_aborts_batch(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.add_constraint("seq_cap", "seq < 100", on_violation="fail")
    with pytest.raises(ConstraintViolation):
        apply_changes(
            t,
            _chg(spark, [("a", 1, "x", "I", 1), ("b", 500, "y", "I", 2)]),
            batch_id="b0",
            cfg=CFG,
        )
    # nothing committed: the batch can be fixed and redelivered
    assert "b0" not in t.committed_batch_ids()
    assert t.read().count() == 0
    res = apply_changes(
        t,
        _chg(spark, [("a", 1, "x", "I", 1), ("b", 50, "y", "I", 2)]),
        batch_id="b0",
        cfg=CFG,
    )
    assert res["applied"] == 2


def test_fail_mode_binds_to_rows_written_not_events(spark, tmp_table_dir):
    """ADVICE r4: fail-mode CHECKs enforce on the post-dedup change set
    (Delta CHECK semantics — rows actually written). A violating event
    superseded in the same batch by a newer valid image for the same
    key must NOT abort; an unsuperseded violation still must."""
    t = _mk(spark, tmp_table_dir)
    t.add_constraint("seq_cap", "seq < 100", on_violation="fail")
    res = apply_changes(
        t,
        _chg(
            spark,
            [
                ("a", 500, "bad", "I", 1),  # violates, superseded by lsn 2
                ("a", 5, "good", "U", 2),
                ("b", 1, "y", "I", 3),
            ],
        ),
        batch_id="b0",
        cfg=CFG,
    )
    assert res["applied"] == 2
    assert {(r.k, r.seq) for r in t.read().collect()} == {("a", 5), ("b", 1)}

    # redelivering the same batch stays a no-op (the old events-level
    # enforcement made this a deterministic poison pill)
    assert apply_changes(
        t, _chg(spark, [("a", 500, "bad", "I", 1)]), batch_id="b0", cfg=CFG
    )["skipped"]

    # a violation that survives dedup still aborts atomically
    with pytest.raises(ConstraintViolation):
        apply_changes(
            t, _chg(spark, [("c", 900, "z", "I", 10)]), batch_id="b1", cfg=CFG
        )
    assert t.read().filter(F.col("k") == "c").count() == 0
