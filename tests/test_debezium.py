"""Debezium-envelope change-log adapter (sources/debezium.py)."""

import json
import os

from pyspark.sql import functions as F

from dexspark.cdc.generator import gen_change_log
from dexspark.sources.debezium import parse_debezium, read_debezium, to_debezium

LOG_COLS = ["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_roundtrip_lossless_for_replay(spark):
    """I/U events survive the envelope bit-for-bit; D events keep
    (key, lsn) — all a delete contributes to the LWW merge."""
    log = gen_change_log(spark, 800, n_convs=20, n_batches=1).select(*LOG_COLS)
    back = parse_debezium(to_debezium(log)).select(*LOG_COLS)
    iu = log.filter(F.col("op") != "D")
    assert iu.exceptAll(back.filter(F.col("op") != "D")).isEmpty()
    keys = ["lsn", "op", "conv_id", "turn_idx"]
    d_in = log.filter(F.col("op") == "D").select(*keys)
    d_out = back.filter(F.col("op") == "D")
    assert d_in.exceptAll(d_out.select(*keys)).isEmpty()
    # non-key payload of a key-only delete reads back NULL
    assert d_out.filter(F.col("role").isNotNull() | F.col("ts").isNotNull()).isEmpty()


def test_op_mapping_and_micro_timestamps(spark):
    """c and r both map to I; ts rides as epoch MICROS (sub-millisecond
    precision preserved)."""
    lines = [
        json.dumps({"payload": {
            "after": {"conv_id": "c1", "turn_idx": 0, "role": "user",
                      "text": "snap", "ts": 1704067200123456},
            "source": {"lsn": 7}, "op": "r"}}),
        json.dumps({"payload": {
            "after": {"conv_id": "c1", "turn_idx": 1, "role": "user",
                      "text": "ins", "ts": 1704067200000000},
            "source": {"lsn": 8}, "op": "c"}}),
    ]
    out = {r.lsn: r for r in
           parse_debezium(spark.createDataFrame([(l,) for l in lines],
                                                "value string")).collect()}
    assert out[7].op == "I" and out[8].op == "I"
    assert out[7].ts.microsecond == 123456


def test_unknown_op_and_corrupt_line_quarantine_not_crash(spark):
    """Debezium t(runcate)/m(essage) ops and corrupt JSON degrade to
    NULL-op/NULL-lsn rows for the validation stage — never a task
    failure (≙ routed parse errors, FnRouter.kt:98-104)."""
    lines = [
        json.dumps({"payload": {"source": {"lsn": 9}, "op": "t"}}),
        "{not json at all",
    ]
    rows = parse_debezium(
        spark.createDataFrame([(l,) for l in lines], "value string")
    ).collect()
    assert all(r.op is None for r in rows)
    assert {r.lsn for r in rows} == {9, None}


def test_streaming_tail_parses_envelopes(spark, tmp_table_dir):
    """read_debezium(streaming=True) is the same projection over a
    Structured-Streaming text tail."""
    log = gen_change_log(spark, 300, n_convs=10, n_batches=1).select(*LOG_COLS)
    seg_dir = os.path.join(tmp_table_dir, "dbz")
    to_debezium(log).coalesce(2).write.text(seg_dir)
    out_dir = os.path.join(tmp_table_dir, "out")
    q = (
        read_debezium(spark, seg_dir, streaming=True)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(tmp_table_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() == log.count()
    assert log.select("lsn").exceptAll(got.select("lsn")).isEmpty()
