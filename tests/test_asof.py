"""As-of join semantics (union + ordered-window formulation)."""

from datetime import datetime

from pyspark.sql import functions as F

from dexspark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T10:00:00"), 1),
            ("a", _ts("2024-01-01T12:00:00"), 2),
            ("b", _ts("2024-01-01T09:00:00"), 3),
            ("c", _ts("2024-01-01T09:00:00"), 4),  # key with no right rows
        ],
        "k string, ts timestamp, lid int",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T09:30:00"), 100),
            ("a", _ts("2024-01-01T10:00:00"), 200),  # simultaneous with lid=1
            ("a", _ts("2024-01-01T11:00:00"), 300),
            ("b", _ts("2024-01-01T09:30:00"), 400),  # after b's only left row
        ],
        "k string, ts timestamp, rv int",
    )
    return left, right


def test_asof_basic_at_or_before(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="ts", by="k")
    got = {r.lid: r.rv_r for r in out.collect()}
    # lid=1 at 10:00 sees the simultaneous right row (at-or-before)
    assert got == {1: 200, 2: 300, 3: None, 4: None}
    assert out.count() == left.count()  # left join: every left row kept


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="ts", by="k", tolerance_seconds=3600)
    got = {r.lid: r.rv_r for r in out.collect()}
    # lid=2 at 12:00: latest right is 11:00 -> within 3600s, kept
    assert got[2] == 300
    out2 = asof_join(left, right, on="ts", by="k", tolerance_seconds=1800)
    got2 = {r.lid: r.rv_r for r in out2.collect()}
    assert got2[2] is None and got2[1] == 200


def test_asof_single_shuffle_plan(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="ts", by="k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # no join operator at all — union + window; and exactly one
    # hash-partitioning exchange (by key) feeds the window
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_matched_row_kept_intact_with_null_fields(spark):
    """The matched right row must arrive whole: a legitimately-NULL
    value column may not be backfilled from an older right row (the
    struct-carry formulation; pandas merge_asof semantics)."""
    left = spark.createDataFrame(
        [("a", _ts("2024-01-01T12:00:00"), 1)], "k string, ts timestamp, lid int"
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T10:00:00"), 100, "old"),
            ("a", _ts("2024-01-01T11:00:00"), None, None),  # latest, NULL fields
        ],
        "k string, ts timestamp, rv int, tag string",
    )
    row = asof_join(left, right, on="ts", by="k").collect()[0]
    assert row.ts_r == _ts("2024-01-01T11:00:00")
    assert row.rv_r is None and row.tag_r is None  # NOT 100/"old"
