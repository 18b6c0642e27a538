"""Change-log continuity audit (dexspark.cdc.audit).

The contract: report exactly the missing LSN ranges and the LSNs
carrying >1 distinct payload, never flag a benign verbatim
redelivery, and honor caller-expected endpoints — independent of the
input's partition layout and of where the span windows fall.
"""

import pytest
from pyspark.sql import functions as F

from dexspark.cdc.audit import log_continuity_audit

SCHEMA = "lsn long, op string, text string"


def _rows(audit_df):
    return {
        (r["kind"], r["lsn_from"], r["lsn_to"], r["n"])
        for r in audit_df.collect()
    }


@pytest.fixture(scope="module")
def dense(spark):
    return spark.createDataFrame(
        [(i, "I", f"t{i}") for i in range(50)], SCHEMA
    )


def test_clean_log_is_silent(spark, dense):
    assert _rows(log_continuity_audit(dense, span=8)) == set()
    assert (
        _rows(log_continuity_audit(dense, span=8, expected_min=0, expected_max=49))
        == set()
    )


def test_gaps_within_and_across_spans(spark):
    # present: 0..3, 6, 20..22  with span=4 → gap (4,5) straddles the
    # span-0/span-1 boundary (4,5 are span 1's low end — within-span
    # lead can't see 3→6, the boundary stitch must), and (7,19) covers
    # wholly-missing spans 2..4.
    lsns = [0, 1, 2, 3, 6, 20, 21, 22]
    log = spark.createDataFrame([(i, "I", f"t{i}") for i in lsns], SCHEMA)
    assert _rows(log_continuity_audit(log, span=4)) == {
        ("gap", 4, 5, 2),
        ("gap", 7, 19, 13),
    }


def test_conflict_flagged_redelivery_absorbed(spark):
    log = spark.createDataFrame(
        [(0, "I", "a"), (1, "I", "b"), (1, "I", "b"),  # verbatim redelivery
         (2, "I", "c"), (2, "U", "c"),                 # op differs → conflict
         (3, "I", "d"), (3, "I", "D!")],               # text differs → conflict
        SCHEMA,
    )
    assert _rows(log_continuity_audit(log, span=8)) == {
        ("conflict", 2, 2, 2),
        ("conflict", 3, 3, 2),
    }


def test_null_vs_empty_payload_distinct(spark):
    log = spark.createDataFrame([(0, "I", None), (0, "I", "")], SCHEMA)
    assert _rows(log_continuity_audit(log, span=8)) == {("conflict", 0, 0, 2)}


def test_expected_endpoints(spark):
    log = spark.createDataFrame(
        [(i, "I", f"t{i}") for i in (5, 6, 7)], SCHEMA
    )
    got = _rows(
        log_continuity_audit(log, span=8, expected_min=2, expected_max=9)
    )
    assert got == {("gap", 2, 4, 3), ("gap", 8, 9, 2)}
    # observed-range-only audit sees nothing
    assert _rows(log_continuity_audit(log, span=8)) == set()


def test_empty_log_with_both_endpoints(spark):
    log = spark.createDataFrame([], SCHEMA)
    got = _rows(
        log_continuity_audit(log, span=8, expected_min=3, expected_max=7)
    )
    assert got == {("gap", 3, 7, 5)}


def test_layout_independence(spark):
    lsns = [i for i in range(200) if i % 13 != 0]
    log = spark.createDataFrame([(i, "I", f"t{i}") for i in lsns], SCHEMA)
    a = _rows(log_continuity_audit(log, span=32, expected_min=0))
    b = _rows(
        log_continuity_audit(log.repartition(7, F.col("text")), span=32,
                             expected_min=0)
    )
    assert a == b
    # 0 missing → head gap; every other %13 multiple an interior gap
    assert ("gap", 0, 0, 1) in a
    assert len(a) == len([i for i in range(200) if i % 13 == 0])


# ---------------------------------------------------------------------------
# lineage continuity audit (metadata-only, over manifest summaries)
# ---------------------------------------------------------------------------

from types import SimpleNamespace

from dexspark.cdc.audit import lineage_continuity_audit


def _fake_table(spark, batches):
    """batches: list of (batch_id, [(start, end), ...]) per-bucket spans."""
    manifests = [
        SimpleNamespace(
            summary={
                "batch_id": bid,
                "partitions": [
                    {"bucket": i, "start_lsn": s, "end_lsn": e, "applied": 1}
                    for i, (s, e) in enumerate(spans)
                ],
            }
        )
        for bid, spans in batches
    ]
    return SimpleNamespace(
        spark=spark,
        live_summaries=lambda: iter(
            (i, m.summary) for i, m in enumerate(manifests)
        ),
    )


def _lrows(df):
    return {
        (r["kind"], r["a_batch"], r["b_batch"], r["lsn_from"], r["lsn_to"], r["n"])
        for r in df.collect()
    }


def test_lineage_tiling_clean(spark):
    t = _fake_table(
        spark, [("b0", [(0, 40), (41, 99)]), ("b1", [(100, 150)]),
                ("b2", [(151, 151)])]
    )
    assert _lrows(lineage_continuity_audit(t)) == set()


def test_lineage_overlap_and_gap(spark):
    t = _fake_table(
        spark,
        [("b0", [(0, 99)]), ("b1", [(80, 150)]),   # overlap 80..99
         ("b2", [(200, 220)])],                     # gap 151..199
    )
    assert _lrows(lineage_continuity_audit(t)) == {
        ("overlap", "b0", "b1", 80, 99, 20),
        ("range_gap", "b1", "b2", 151, 199, 49),
    }


def test_lineage_contained_range_is_overlap(spark):
    # b1 entirely inside b0 — the running-max walk must still flag it
    t = _fake_table(spark, [("b0", [(0, 99)]), ("b1", [(10, 20)])])
    assert _lrows(lineage_continuity_audit(t)) == {
        ("overlap", "b0", "b1", 10, 20, 11),
    }


def test_lineage_audit_real_replay_overlap(spark, tmp_table_dir):
    """End-to-end: two apply_changes of OVERLAPPING LSN ranges under
    different batch ids — the exactly-once ledger can't see it (ids
    differ), the lineage audit must."""
    import os

    import pyspark.sql.functions as F
    from pyspark.sql.types import _parse_datatype_string

    from dexspark.cdc import apply_changes
    from dexspark.cdc.generator import gen_change_log
    from dexspark.sources.changelog import PAYLOAD_DDL

    t = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "t"),
        _parse_datatype_string(PAYLOAD_DDL), "conv_id", num_buckets=4,
    )
    log = gen_change_log(spark, 2000, n_convs=40, n_batches=1)
    apply_changes(t, log.filter(F.col("lsn") < 1200), batch_id="a")
    apply_changes(t, log.filter(F.col("lsn") >= 800), batch_id="a2")
    got = lineage_continuity_audit(t).collect()
    assert len(got) == 1 and got[0]["kind"] == "overlap"
    assert (got[0]["lsn_from"], got[0]["lsn_to"]) == (800, 1199)

    # clean tiling replay stays silent
    t2 = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "t2"),
        _parse_datatype_string(PAYLOAD_DDL), "conv_id", num_buckets=4,
    )
    apply_changes(t2, log.filter(F.col("lsn") < 1000), batch_id="a")
    apply_changes(t2, log.filter(F.col("lsn") >= 1000), batch_id="b")
    hard = [r for r in lineage_continuity_audit(t2).collect()
            if r["kind"] == "overlap"]
    assert hard == []


from dexspark.lake.table import LakeTable  # noqa: E402  (used above)
