"""Snapshot-derived CDC (cdc/snapshot.py): I/U/D derivation from full
snapshots, feed-order enforcement (stale snapshots refused), exactly-
once redelivery, validation/quarantine integration, schema evolution,
composition with a later binlog tail, and the CLI entry."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from dexspark.cdc.apply import apply_changes
from dexspark.cdc.snapshot import apply_snapshot, snapshot_changes
from dexspark.cdc.validate import ValidationConfig
from dexspark.lake.table import LakeTable

SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
    ]
)

CFG = ValidationConfig(
    tool_col="_none", ts_col="_none", check_ts_monotonic=False
)


def _mk(spark, d):
    return LakeTable.create(spark, d, SCHEMA, "conv_id", num_buckets=4)


def _snap(spark, rows, schema=SCHEMA):
    return spark.createDataFrame(rows, schema)


def _state(t):
    return {
        (r.conv_id, r.turn_idx): (r.role, r.text) for r in t.read().collect()
    }


def test_first_snapshot_is_all_inserts(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    s1 = _snap(spark, [("c1", 0, "user", "a"), ("c1", 1, "assistant", "b")])
    res = apply_snapshot(t, s1, snapshot_lsn=10, cfg=CFG)
    assert res["applied"] == 2 and res["snapshot_lsn"] == 10
    assert _state(t) == {
        ("c1", 0): ("user", "a"),
        ("c1", 1): ("assistant", "b"),
    }


def test_diff_derives_iud_and_skips_unchanged(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    apply_snapshot(
        t,
        _snap(
            spark,
            [
                ("c1", 0, "user", "a"),
                ("c1", 1, "assistant", "b"),
                ("c2", 0, "user", "c"),
            ],
        ),
        snapshot_lsn=10,
        cfg=CFG,
    )
    # next snapshot: c1/0 changed, c1/1 unchanged, c2/0 gone, c3/0 new
    s2 = _snap(
        spark, [("c1", 0, "user", "a2"), ("c1", 1, "assistant", "b"),
                ("c3", 0, "user", "d")]
    )
    ev = snapshot_changes(t, s2, 20, ["conv_id", "turn_idx"])
    got = {(r.conv_id, r.turn_idx): r.op for r in ev.collect()}
    assert got == {("c1", 0): "U", ("c2", 0): "D", ("c3", 0): "I"}
    assert ev.filter(F.col("lsn") != 20).count() == 0

    res = apply_snapshot(t, s2, snapshot_lsn=20, cfg=CFG)
    # only changed keys flow into the merge — unchanged c1/1 not rewritten
    assert res["applied"] == 3
    assert _state(t) == {
        ("c1", 0): ("user", "a2"),
        ("c1", 1): ("assistant", "b"),
        ("c3", 0): ("user", "d"),
    }


def test_redelivery_skips_before_diff(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    s1 = _snap(spark, [("c1", 0, "user", "a")])
    apply_snapshot(t, s1, snapshot_lsn=10, cfg=CFG)
    v = t.current_version()
    res = apply_snapshot(t, s1, snapshot_lsn=10, cfg=CFG)
    assert res["skipped"] and t.current_version() == v


def test_stale_snapshot_refused(spark, tmp_table_dir):
    """A late-arriving OLD snapshot must be refused outright: the LSN
    gate protects existing rows, but a derived INSERT for a key the
    table never saw (e.g. created only after this snapshot was cut)
    has nothing to lose against and would resurrect superseded
    state."""
    t = _mk(spark, tmp_table_dir)
    apply_snapshot(
        t, _snap(spark, [("c1", 0, "user", "new"), ("c2", 0, "user", "x")]),
        snapshot_lsn=100, cfg=CFG,
    )
    before = _state(t)
    stale = _snap(spark, [("c1", 0, "user", "old"), ("c9", 0, "user", "y")])
    with pytest.raises(ValueError, match="out-of-order snapshot"):
        apply_snapshot(t, stale, snapshot_lsn=50, cfg=CFG)
    # equal watermark under a NEW batch id is out-of-order too (the
    # default batch id would hit the exactly-once ledger first — the
    # redelivery path, which skips; that is the correct precedence)
    with pytest.raises(ValueError, match="out-of-order snapshot"):
        apply_snapshot(t, stale, snapshot_lsn=100, batch_id="s2", cfg=CFG)
    assert apply_snapshot(t, stale, snapshot_lsn=100, cfg=CFG)["skipped"]
    assert _state(t) == before


def test_duplicate_key_snapshot_raises(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    dup = _snap(spark, [("c1", 0, "user", "a"), ("c1", 0, "user", "b")])
    with pytest.raises(ValueError, match="multiple rows"):
        apply_snapshot(t, dup, snapshot_lsn=10, cfg=CFG)


def test_partial_snapshot_refused(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    apply_snapshot(
        t, _snap(spark, [("c1", 0, "user", "a")]), snapshot_lsn=10, cfg=CFG
    )
    narrow = spark.createDataFrame(
        [("c1", 0, "user")],
        StructType(list(SCHEMA.fields[:3])),
    )
    with pytest.raises(ValueError, match="does not cover"):
        apply_snapshot(t, narrow, snapshot_lsn=20, cfg=CFG)
    with pytest.raises(ValueError, match="reserved CDC column"):
        snapshot_changes(
            t,
            _snap(spark, [("c1", 0, "user", "a")]).withColumn(
                "op", F.lit("I")
            ),
            30,
            ["conv_id", "turn_idx"],
        )


def test_invalid_new_image_quarantined_keeps_old(spark, tmp_table_dir, tmp_path):
    t = _mk(spark, tmp_table_dir)
    q_schema = StructType(
        list(SCHEMA.fields)
        + [
            StructField("op", StringType()),
            StructField("lsn", LongType()),
            StructField("reject_reason", StringType()),
            StructField("batch_id", StringType()),
        ]
    )
    q = LakeTable.create(spark, str(tmp_path / "q"), q_schema, "conv_id", 2)
    apply_snapshot(
        t, _snap(spark, [("c1", 0, "user", "good")]),
        snapshot_lsn=10, cfg=CFG, quarantine=q,
    )
    # new snapshot corrupts c1/0's role and adds a valid row
    s2 = _snap(spark, [("c1", 0, "alien", "bad"), ("c2", 0, "user", "ok")])
    res = apply_snapshot(t, s2, snapshot_lsn=20, cfg=CFG, quarantine=q)
    assert res["rejected_by_reason"] == {"bad_role": 1}
    assert _state(t) == {
        ("c1", 0): ("user", "good"),  # old image kept
        ("c2", 0): ("user", "ok"),
    }
    assert [
        (r.conv_id, r.reject_reason) for r in q.read().collect()
    ] == [("c1", "bad_role")]


def test_snapshot_schema_evolution(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    apply_snapshot(
        t, _snap(spark, [("c1", 0, "user", "a")]), snapshot_lsn=10, cfg=CFG
    )
    wide = StructType(list(SCHEMA.fields) + [StructField("model", StringType())])
    s2 = spark.createDataFrame(
        [("c1", 0, "user", "a", "m1"), ("c2", 0, "user", "b", "m2")], wide
    )
    res = apply_snapshot(t, s2, snapshot_lsn=20, cfg=CFG)
    # c1/0's image CHANGED (gained model=m1) → re-emitted as U
    assert res["applied"] == 2
    got = {
        (r.conv_id, r.turn_idx): r.model for r in t.read().collect()
    }
    assert got == {("c1", 0): "m1", ("c2", 0): "m2"}


def test_snapshot_then_tail_composes(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    apply_snapshot(
        t,
        _snap(spark, [("c1", 0, "user", "a"), ("c2", 0, "user", "b")]),
        snapshot_lsn=100,
        cfg=CFG,
    )
    tail = spark.createDataFrame(
        [
            ("c1", 0, "user", "a-new", "U", 150),
            ("c2", 0, None, None, "D", 160),
            ("c1", 0, "user", "a-stale", "U", 90),  # pre-snapshot redelivery
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "op string, lsn long",
    )
    apply_changes(t, tail, batch_id="t1", cfg=CFG)
    assert _state(t) == {("c1", 0): ("user", "a-new")}


def test_cli_ingest_snapshot(spark, tmp_table_dir, tmp_path, capsys):
    """`dexspark ingest-snapshot`: two snapshot deliveries end-to-end
    through the CLI — create-on-first-use, diff-derived U/D on the
    second delivery, out-of-order refusal."""
    import json

    from dexspark.__main__ import main

    ddl = "conv_id string, turn_idx int, role string, text string"
    s1 = str(tmp_path / "s1")
    s2 = str(tmp_path / "s2")
    _snap(spark, [("c1", 0, "user", "a"), ("c2", 0, "user", "b")]).write.parquet(s1)
    _snap(spark, [("c1", 0, "user", "a2")]).write.parquet(s2)
    tdir = str(tmp_path / "t")
    base = ["ingest-snapshot", "--table", tdir, "--payload-schema", ddl,
            "--buckets", "4"]

    assert main(base + ["--snapshot", s1, "--watermark", "10"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["applied"] == 2

    assert main(base + ["--snapshot", s2, "--watermark", "20"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["applied"] == 2  # U for c1/0 + derived D for c2/0

    t = LakeTable(spark, tdir)
    assert _state(t) == {("c1", 0): ("user", "a2")}

    with pytest.raises(ValueError, match="out-of-order snapshot"):
        main(base + ["--snapshot", s1, "--watermark", "15",
                     "--batch-id", "late"])


def test_ingest_snapshot_feed(spark, tmp_table_dir, tmp_path):
    """Feed catch-up: pending deliveries apply in order, superseded and
    already-applied ones skip, re-run is a no-op, malformed entry
    names fail loudly, evolution flows through parquet deliveries."""
    from dexspark.cdc.snapshot import ingest_snapshot_feed

    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "_producer_tmp").mkdir()  # ignored
    _snap(spark, [("c1", 0, "user", "a")]).write.parquet(
        str(feed / "snapshot-10")
    )
    _snap(spark, [("c1", 0, "user", "a2"), ("c2", 0, "user", "b")]).write.parquet(
        str(feed / "snapshot-20")
    )
    t = _mk(spark, tmp_table_dir)
    res = ingest_snapshot_feed(t, str(feed), cfg=CFG)
    assert [r["snapshot_lsn"] for r in res] == [10, 20]
    assert _state(t) == {("c1", 0): ("user", "a2"), ("c2", 0): ("user", "b")}

    assert ingest_snapshot_feed(t, str(feed), cfg=CFG) == []  # no-op

    # a new delivery (with a new column) catches up incrementally
    import pyspark.sql.functions as F

    _snap(spark, [("c2", 0, "user", "b2")]).withColumn(
        "model", F.lit("m1")
    ).write.parquet(str(feed / "snapshot-30"))
    res = ingest_snapshot_feed(t, str(feed), cfg=CFG)
    assert [r["snapshot_lsn"] for r in res] == [30]
    rows = {(r.conv_id, r.turn_idx): r.model for r in t.read().collect()}
    assert rows == {("c2", 0): "m1"}  # c1/0 absent from snapshot-30 -> D

    (feed / "snapshot_bad").mkdir()
    with pytest.raises(ValueError, match="unrecognized feed entry"):
        ingest_snapshot_feed(t, str(feed), cfg=CFG)


def test_cli_ingest_snapshot_feed(spark, tmp_path, capsys):
    import json as _json

    from dexspark.__main__ import main

    ddl = "conv_id string, turn_idx int, role string, text string"
    feed = tmp_path / "feed"
    feed.mkdir()
    _snap(spark, [("c1", 0, "user", "a")]).write.parquet(
        str(feed / "snapshot-5")
    )
    tdir = str(tmp_path / "t")
    assert main(
        ["ingest-snapshot", "--table", tdir, "--payload-schema", ddl,
         "--buckets", "4", "--feed", str(feed)]
    ) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [r["snapshot_lsn"] for r in out] == [5]
    with pytest.raises(SystemExit):
        main(["ingest-snapshot", "--table", tdir, "--feed", str(feed),
              "--snapshot", "x", "--watermark", "9"])


def test_apply_snapshot_scd2_intervals(spark, tmp_table_dir):
    """SCD2 from a snapshot feed: change opens a new version, absence
    closes with closed_by_delete, reappearance opens fresh, unchanged
    images stay open across deliveries."""
    from dexspark.cdc.scd2 import scd2_schema
    from dexspark.cdc.snapshot import apply_snapshot_scd2

    h = LakeTable.create(
        spark, tmp_table_dir, scd2_schema(SCHEMA), "conv_id", num_buckets=4
    )
    apply_snapshot_scd2(
        h, _snap(spark, [("c1", 0, "user", "a"), ("c2", 0, "user", "b")]),
        snapshot_lsn=10, cfg=CFG,
    )
    apply_snapshot_scd2(
        h, _snap(spark, [("c1", 0, "user", "a2")]), snapshot_lsn=20, cfg=CFG
    )
    res = apply_snapshot_scd2(
        h,
        _snap(spark, [("c1", 0, "user", "a2"), ("c2", 0, "user", "b3")]),
        snapshot_lsn=30,
        cfg=CFG,
    )
    got = {
        (r.conv_id, r.text): (
            r.valid_from_lsn, r.valid_to_lsn, r.closed_by_delete, r.is_current
        )
        for r in h.read().collect()
    }
    assert got == {
        ("c1", "a"): (10, 20, False, False),
        ("c1", "a2"): (20, None, False, True),
        ("c2", "b"): (10, 20, True, False),
        ("c2", "b3"): (30, None, False, True),
    }
    # redelivery no-op; out-of-order refused
    assert apply_snapshot_scd2(
        h, _snap(spark, []), snapshot_lsn=30, cfg=CFG
    )["skipped"]
    with pytest.raises(ValueError, match="out-of-order"):
        apply_snapshot_scd2(
            h, _snap(spark, []), snapshot_lsn=25, batch_id="x", cfg=CFG
        )


def test_cli_ingest_snapshot_feed_scd2(spark, tmp_path, capsys):
    """--scd2 feed mode: creates the history table, two deliveries
    produce interval rows."""
    import json as _json

    from dexspark.__main__ import main

    ddl = "conv_id string, turn_idx int, role string, text string"
    feed = tmp_path / "feed"
    feed.mkdir()
    _snap(spark, [("c1", 0, "user", "a")]).write.parquet(
        str(feed / "snapshot-5")
    )
    _snap(spark, [("c1", 0, "user", "a2")]).write.parquet(
        str(feed / "snapshot-9")
    )
    tdir = str(tmp_path / "h")
    assert main(
        ["ingest-snapshot", "--table", tdir, "--payload-schema", ddl,
         "--buckets", "4", "--feed", str(feed), "--scd2"]
    ) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [r["snapshot_lsn"] for r in out] == [5, 9]
    h = LakeTable(spark, tdir)
    got = {
        (r.text, r.valid_from_lsn, r.valid_to_lsn, r.is_current)
        for r in h.read().collect()
    }
    assert got == {("a", 5, 9, False), ("a2", 9, None, True)}


def test_apply_snapshot_mor_strategy(spark, tmp_table_dir):
    """Snapshot ingest over the merge-on-read write path: state equals
    the COW result across deliveries and a compaction."""
    t = _mk(spark, tmp_table_dir)
    apply_snapshot(
        t, _snap(spark, [("c1", 0, "user", "a"), ("c2", 0, "user", "b")]),
        snapshot_lsn=10, cfg=CFG, strategy="mor",
    )
    apply_snapshot(
        t, _snap(spark, [("c1", 0, "user", "a2")]),
        snapshot_lsn=20, cfg=CFG, strategy="mor",
    )
    assert _state(t) == {("c1", 0): ("user", "a2")}
    t.compact()
    assert _state(t) == {("c1", 0): ("user", "a2")}


def test_json_feed_partial_delivery_refused(spark, tmp_table_dir, tmp_path):
    """ADVICE r4 (medium): the JSON feed branch reads under the table
    schema, which NULL-fills columns the delivery never carried — the
    wire-schema check must refuse the delivery BEFORE the diff would
    derive U events wiping that column table-wide."""
    import json as _json

    from dexspark.cdc.snapshot import ingest_snapshot_feed

    t = _mk(spark, tmp_table_dir)
    feed = tmp_path / "feed"
    feed.mkdir()

    d1 = feed / "snapshot-10"
    d1.mkdir()
    (d1 / "part-0.json").write_text(
        _json.dumps(
            {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "a"}
        )
        + "\n"
    )
    res = ingest_snapshot_feed(t, str(feed), fmt="json", cfg=CFG)
    assert [r["snapshot_lsn"] for r in res] == [10]
    assert _state(t) == {("c1", 0): ("user", "a")}

    # second delivery silently drops the `text` column — refused, and
    # the table keeps its state
    d2 = feed / "snapshot-20"
    d2.mkdir()
    (d2 / "part-0.json").write_text(
        _json.dumps({"conv_id": "c1", "turn_idx": 0, "role": "user"}) + "\n"
    )
    with pytest.raises(ValueError, match=r"lacks table columns \['text'\]"):
        ingest_snapshot_feed(t, str(feed), fmt="json", cfg=CFG)
    assert _state(t) == {("c1", 0): ("user", "a")}


def test_cli_schema_imposed_partial_snapshot_refused(spark, tmp_path, capsys):
    """ADVICE r4 (medium), CLI variant: --payload-schema imposes the
    read schema on parquet too, so a delivery written before the table
    gained a column must be refused by the footer-schema check, not
    NULL-filled through the diff."""
    import json as _json

    from dexspark.__main__ import main

    ddl = "conv_id string, turn_idx int, role string, text string"
    tdir = str(tmp_path / "t")
    s1 = str(tmp_path / "s1")
    _snap(spark, [("c1", 0, "user", "a")]).write.parquet(s1)
    base = ["ingest-snapshot", "--table", tdir, "--payload-schema", ddl,
            "--buckets", "4"]
    assert main(base + ["--snapshot", s1, "--watermark", "10"]) == 0
    capsys.readouterr()

    # delivery lacking `text` on the wire, read schema still names it
    narrow = StructType(
        [f for f in SCHEMA.fields if f.name != "text"]
    )
    s2 = str(tmp_path / "s2")
    spark.createDataFrame([("c1", 0, "assistant")], narrow).write.parquet(s2)
    with pytest.raises(ValueError, match=r"lacks table columns \['text'\]"):
        main(base + ["--snapshot", s2, "--watermark", "20"])
    t = LakeTable(spark, tdir)
    assert _state(t) == {("c1", 0): ("user", "a")}


def test_snapshot_stream_ingest_restart_and_ledger(spark, tmp_table_dir, tmp_path):
    """SnapshotStreamIngest (VERDICT r4 #5): the drop zone on the
    streaming chassis. Covers marker discovery in lsn order, resume
    from checkpoint, the crash window (delivery committed to the table
    but not the checkpoint -> redelivered marker skips via ledger),
    and that half-published datasets are invisible until their marker
    lands."""
    from dexspark.cdc.snapshot import (
        SnapshotStreamIngest,
        apply_snapshot,
        publish_delivery,
    )

    t = _mk(spark, tmp_table_dir)
    feed = str(tmp_path / "feed")
    cp = str(tmp_path / "cp")

    _snap(spark, [("c1", 0, "user", "a")]).write.parquet(
        f"{feed}/snapshot-10"
    )
    _snap(spark, [("c1", 0, "user", "a2"), ("c2", 0, "user", "b")]).write.parquet(
        f"{feed}/snapshot-20"
    )
    # dataset 30 exists but is NOT yet published — must be invisible
    _snap(spark, [("c2", 0, "user", "b2")]).write.parquet(
        f"{feed}/snapshot-30"
    )
    publish_delivery(feed, 10)
    publish_delivery(feed, 20)
    publish_delivery(feed, 10)  # idempotent re-publish

    s1 = SnapshotStreamIngest(spark, t, feed, cp, cfg=CFG)
    r1 = s1.run_available()
    assert [r["snapshot_lsn"] for r in r1] == [10, 20]
    assert _state(t) == {("c1", 0): ("user", "a2"), ("c2", 0): ("user", "b")}

    # crash window: delivery 30 lands on the TABLE out-of-band, then
    # its marker is published; the resumed stream must skip via ledger
    apply_snapshot(
        t, spark.read.parquet(f"{feed}/snapshot-30"), snapshot_lsn=30,
        cfg=CFG,
    )
    publish_delivery(feed, 30)
    s2 = SnapshotStreamIngest(spark, t, feed, cp, cfg=CFG)
    r2 = s2.run_available()
    assert len(r2) == 1 and r2[0]["skipped"], r2
    # c1 absent from delivery 30 -> derived delete already applied
    assert _state(t) == {("c2", 0): ("user", "b2")}

    # a fresh delivery applies on the next resume; re-run is a no-op
    _snap(spark, [("c2", 0, "user", "b3")]).write.parquet(
        f"{feed}/snapshot-40"
    )
    publish_delivery(feed, 40)
    r3 = SnapshotStreamIngest(spark, t, feed, cp, cfg=CFG).run_available()
    assert [r["snapshot_lsn"] for r in r3 if not r.get("skipped")] == [40]
    assert SnapshotStreamIngest(spark, t, feed, cp, cfg=CFG).run_available() == []
    assert _state(t) == {("c2", 0): ("user", "b3")}


def test_cli_ingest_snapshot_feed_streaming(spark, tmp_path, capsys):
    """`dexspark ingest-snapshot --feed --checkpoint`: the streaming
    drop-zone consumer through the CLI — first run applies published
    deliveries, a resumed run picks up only the new one."""
    import json as _json

    from dexspark.__main__ import main
    from dexspark.cdc.snapshot import publish_delivery

    ddl = "conv_id string, turn_idx int, role string, text string"
    feed = str(tmp_path / "feed")
    _snap(spark, [("c1", 0, "user", "a")]).write.parquet(
        f"{feed}/snapshot-5"
    )
    publish_delivery(feed, 5)
    tdir = str(tmp_path / "t")
    cp = str(tmp_path / "cp")
    base = ["ingest-snapshot", "--table", tdir, "--payload-schema", ddl,
            "--buckets", "4", "--feed", feed, "--checkpoint", cp]
    assert main(base) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [r["snapshot_lsn"] for r in out] == [5]

    _snap(spark, [("c1", 0, "user", "a2")]).write.parquet(
        f"{feed}/snapshot-9"
    )
    publish_delivery(feed, 9)
    assert main(base) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [r["snapshot_lsn"] for r in out] == [9]
    t = LakeTable(spark, tdir)
    assert _state(t) == {("c1", 0): ("user", "a2")}
