"""applyInPandasWithState operator: state survives micro-batches and
restarts (checkpointed state store)."""

import os

import pyspark.sql.functions as F
from pyspark.sql.types import _parse_datatype_string

from dexspark.cdc.generator import gen_change_log
from dexspark.streaming.stateful import conversation_progress

LOG_DDL = (
    "lsn long, op string, batch_seq long, conv_id string, turn_idx int, "
    "role string, text string, tool string, ts timestamp"
)


def _run_until_done(spark, log_dir, cp, sink_name=None):
    """Returns all progress rows emitted during this run (foreachBatch
    sink — the memory sink cannot recover from a checkpoint)."""
    rows = []
    stream = spark.readStream.schema(_parse_datatype_string(LOG_DDL)).parquet(log_dir)
    q = (
        conversation_progress(stream)
        .writeStream.foreachBatch(lambda df, _id: rows.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rows


def test_state_accumulates_across_restarts(spark, tmp_table_dir):
    log = gen_change_log(spark, 2000, n_convs=20, n_batches=2)
    log_dir = os.path.join(tmp_table_dir, "log")
    cp = os.path.join(tmp_table_dir, "cp")

    seg1 = log.filter(F.col("batch_seq") == 0)
    seg1.coalesce(1).write.parquet(log_dir, mode="append")
    rows1 = _run_until_done(spark, log_dir, cp)

    got1 = {r.conv_id: (r.n_events, r.max_turn) for r in rows1}
    exp1 = {
        r.conv_id: (r.cnt, r.mx)
        for r in seg1.groupBy("conv_id")
        .agg(F.count("*").alias("cnt"), F.max("turn_idx").alias("mx"))
        .collect()
    }
    assert got1 == exp1

    # restart with a NEW query over the same checkpoint; second segment
    # arrives — counts must include the first segment (state restored)
    log.filter(F.col("batch_seq") == 1).coalesce(1).write.parquet(
        log_dir, mode="append"
    )
    rows2 = _run_until_done(spark, log_dir, cp)

    got2 = {r.conv_id: (r.n_events, r.max_turn, r.max_lsn) for r in rows2}
    exp_all = {
        r.conv_id: (r.cnt, r.mx, r.ml)
        for r in log.groupBy("conv_id")
        .agg(
            F.count("*").alias("cnt"),
            F.max("turn_idx").alias("mx"),
            F.max("lsn").alias("ml"),
        )
        .collect()
    }
    # only convs updated in segment 2 emit rows in the second run
    for conv, (n, mx, ml) in got2.items():
        assert (n, mx, ml) == exp_all[conv], conv

    # last_role is the role at max lsn (deterministic tie-break)
    one = rows2[0]
    expected_role = (
        log.filter(F.col("conv_id") == one.conv_id)
        .orderBy(F.col("lsn").desc())
        .select("role")
        .first()
        .role
    )
    assert one.last_role == expected_role
