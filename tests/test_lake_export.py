"""Outbound CDC export (lake/export.py): segments, ledger commit
point, snapshot reset across retention gaps, and the files→table
replay leg."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import _parse_datatype_string

from dexspark.lake.export import (
    export_changes,
    read_export,
    read_ledger,
    replay_export,
)
from dexspark.lake.table import LakeTable

SCHEMA_DDL = "k string, seq int, v string, ts timestamp"


def _table(spark, d):
    t = LakeTable.create(
        spark, d, _parse_datatype_string(SCHEMA_DDL), bucket_key="k", num_buckets=4
    )
    t.append(
        spark.createDataFrame(
            [("a", 1, "x"), ("b", 1, "y"), ("c", 1, "z")],
            "k string, seq int, v string",
        ).withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")))
    )
    return t


def _merge(t, spark, rows):
    t.merge(
        spark.createDataFrame(rows, "k string, seq int, v string, op string")
        .withColumn("ts", F.to_timestamp(F.lit("2026-02-02 12:00:00")))
        .select("k", "seq", "v", "ts", "op"),
        key_cols=["k", "seq"],
    )


def _state(t):
    return {
        (r.k, r.seq): (r.v, r.ts) for r in t.read().collect()
    }


def test_export_replay_roundtrip_and_ledgers(spark, tmp_table_dir):
    t = _table(spark, os.path.join(tmp_table_dir, "src"))
    out = os.path.join(tmp_table_dir, "feed")
    e1 = export_changes(t, out, key_cols=["k", "seq"])
    assert e1["mode"] == "incremental"
    _merge(t, spark, [("a", 1, "x2", "U"), ("b", 1, "y", "D"), ("d", 4, "w", "I")])
    e2 = export_changes(t, out, fmt="json", key_cols=["k", "seq"])
    assert e2["mode"] == "incremental" and e2["format"] == "json"
    # producer exactly-once: at head -> no new segment
    assert export_changes(t, out) is None

    dst = LakeTable.create(
        spark,
        os.path.join(tmp_table_dir, "dst"),
        _parse_datatype_string(SCHEMA_DDL),
        bucket_key="k",
        num_buckets=2,
    )
    assert len(replay_export(spark, out, dst)) == 2
    assert replay_export(spark, out, dst) == []  # consumer exactly-once
    assert _state(dst) == _state(t)
    # timestamps survived the JSON hop exactly (recorded Spark schema)
    assert dict(dst.read().dtypes)["ts"] == "timestamp"


def test_orphan_segments_invisible(spark, tmp_table_dir):
    """A producer crash between the segment write and the ledger
    commit leaves an orphan directory; consumers must never see it."""
    t = _table(spark, os.path.join(tmp_table_dir, "src"))
    out = os.path.join(tmp_table_dir, "feed")
    export_changes(t, out, key_cols=["k", "seq"])
    # fake a torn write: a segment directory with no ledger entry
    orphan = os.path.join(out, "seg_999999999")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "garbage.parquet"), "w") as f:
        f.write("not parquet")
    feed = read_export(spark, out)
    assert feed.where(F.col("lsn") == 999999999).count() == 0
    assert {s["segment"] for s in read_ledger(out)} == {
        f"seg_{t.current_version():09d}"
    }


def test_retention_gap_exports_snapshot_and_resets_consumer(spark, tmp_table_dir):
    t = _table(spark, os.path.join(tmp_table_dir, "src"))
    out = os.path.join(tmp_table_dir, "feed")
    export_changes(t, out, key_cols=["k", "seq"])
    dst = LakeTable.create(
        spark,
        os.path.join(tmp_table_dir, "dst"),
        _parse_datatype_string(SCHEMA_DDL),
        bucket_key="k",
        num_buckets=2,
    )
    replay_export(spark, out, dst)

    # consumer drifts: a row the source never had
    _merge(dst, spark, [("zz", 9, "stale", "I")])
    # source moves on and retention drops the exported-from version
    _merge(t, spark, [("a", 1, "x3", "U"), ("c", 1, "z", "D")])
    _merge(t, spark, [("e", 5, "new", "I")])
    t.expire_snapshots(keep_last=1)

    e = export_changes(t, out, key_cols=["k", "seq"])
    assert e["mode"] == "snapshot"
    replay_export(spark, out, dst)
    # reset semantics: stale consumer-only row deleted, source state exact
    assert _state(dst) == _state(t)
    assert ("zz", 9) not in _state(dst)


def test_read_export_since_version_watermark(spark, tmp_table_dir):
    t = _table(spark, os.path.join(tmp_table_dir, "src"))
    out = os.path.join(tmp_table_dir, "feed")
    export_changes(t, out, key_cols=["k", "seq"])
    v1 = t.current_version()
    _merge(t, spark, [("d", 4, "w", "I")])
    export_changes(t, out, key_cols=["k", "seq"])
    late = read_export(spark, out, since_version=v1)
    assert {r.k for r in late.collect()} == {"d"}
    assert read_export(spark, out, since_version=t.current_version()) is None


def test_export_schema_evolution_across_segments(spark, tmp_table_dir):
    t = _table(spark, os.path.join(tmp_table_dir, "src"))
    out = os.path.join(tmp_table_dir, "feed")
    export_changes(t, out, key_cols=["k", "seq"])
    new_schema = _parse_datatype_string(SCHEMA_DDL + ", extra string")
    t.evolve_schema(new_schema)
    t.merge(
        spark.createDataFrame(
            [("f", 6, "v6", "hello", "I")],
            "k string, seq int, v string, extra string, op string",
        )
        .withColumn("ts", F.to_timestamp(F.lit("2026-03-03 00:00:00")))
        .select("k", "seq", "v", "ts", "extra", "op"),
        key_cols=["k", "seq"],
    )
    export_changes(t, out, key_cols=["k", "seq"])

    feed = read_export(spark, out)
    assert "extra" in feed.columns  # aligned across segments
    dst = LakeTable.create(
        spark,
        os.path.join(tmp_table_dir, "dst"),
        _parse_datatype_string(SCHEMA_DDL),
        bucket_key="k",
        num_buckets=2,
    )
    replay_export(spark, out, dst)  # must evolve dst to cover 'extra'
    assert "extra" in [f.name for f in dst.schema().fields]
    assert _state(dst) == _state(t)


def test_streaming_export_subscription(spark, tmp_table_dir):
    """ExportSpec in CdcStreamReplay(views=[...]): every applied
    micro-batch publishes a segment; an external consumer replaying
    the directory tracks the table within one trigger, across a
    checkpoint resume."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import _parse_datatype_string

    from dexspark.cdc.generator import expected_final_state, gen_change_log
    from dexspark.lake.export import ExportSpec
    from dexspark.streaming.replay import CdcStreamReplay

    payload = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    table = LakeTable.create(
        spark,
        os.path.join(tmp_table_dir, "transcripts"),
        _parse_datatype_string(payload),
        "conv_id",
        8,
    )
    out = os.path.join(tmp_table_dir, "feed")
    log_dir = os.path.join(tmp_table_dir, "log")
    cp = os.path.join(tmp_table_dir, "cp")
    log = gen_change_log(spark, 3000, n_convs=40, n_batches=4)

    def replay():
        return CdcStreamReplay(
            spark,
            table,
            log_dir,
            cp,
            _parse_datatype_string("lsn long, op string, batch_seq long, " + payload),
            views=[ExportSpec(out, key_cols=["conv_id", "turn_idx"])],
        )

    log.filter(F.col("batch_seq") < 2).coalesce(2).write.parquet(
        log_dir, mode="append"
    )
    r1 = replay()
    r1.run_available()
    assert any(
        r.get("operation") == "export_changes" for r in r1.results
    )
    log.filter(F.col("batch_seq") >= 2).coalesce(2).write.parquet(
        log_dir, mode="append"
    )
    replay().run_available()  # checkpoint resume

    dst = LakeTable.create(
        spark,
        os.path.join(tmp_table_dir, "dst"),
        _parse_datatype_string(payload),
        "conv_id",
        4,
    )
    replay_export(spark, out, dst)
    expected = expected_final_state(log)
    got = dst.read()
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_cli_export_changes(spark, tmp_table_dir, capsys):
    from dexspark.__main__ import main

    t = _table(spark, os.path.join(tmp_table_dir, "src"))
    out = os.path.join(tmp_table_dir, "feed")
    rc = main(
        [
            "export-changes",
            "--table", os.path.join(tmp_table_dir, "src"),
            "--out", out,
            "--keys", "k,seq",
        ]
    )
    assert rc == 0
    entry = json.loads(capsys.readouterr().out.strip())
    assert entry["to_version"] == t.current_version()
    assert read_export(spark, out).count() == 3
