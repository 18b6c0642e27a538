"""Unit tests for the watermarked stream-stream interval join
(dexspark/streaming/joins.py): eager inner-join emission, range-bound
matching, and watermark lateness drops across a checkpointed restart.

The windowed-stream oracle queries cover the full driver contract at
sf0.001 (tests/test_query_oracles.py); these tests pin the operator's
semantics on a hand-built four-row example where every expected pair
is enumerable by eye.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from dexspark.streaming.joins import interval_join

BASE = 1704067200  # 2024-01-01 00:00:00 UTC


def _schema(prefix: str) -> StructType:
    return StructType(
        [
            StructField(f"{prefix}_id", LongType()),
            StructField("uid", LongType()),
            StructField(f"{prefix}_ts", TimestampType()),
        ]
    )


def _rows(spark, prefix, triples):
    """triples: (id, uid, minute)."""
    df = spark.createDataFrame(
        [(i, u, None) for i, u, _ in triples], _schema(prefix)
    )
    mins = {i: m for i, u, m in triples}
    m_col = F.col(f"{prefix}_id")
    expr = None
    for i, m in mins.items():
        c = F.when(m_col == i, F.lit(BASE + m * 60))
        expr = c if expr is None else expr.when(m_col == i, F.lit(BASE + m * 60))
    return df.withColumn(f"{prefix}_ts", F.timestamp_seconds(expr))


def _run(spark, l_dir, r_dir, cp, out_dir):
    left = spark.readStream.schema(_schema("l")).parquet(l_dir + "/*")
    right = spark.readStream.schema(_schema("r")).parquet(r_dir + "/*")
    j = interval_join(
        left, right, key="uid", left_ts="l_ts", right_ts="r_ts",
        delay="10 minutes", max_delta="4 minutes",
    )
    q = (
        j.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@pytest.fixture()
def dirs(tmp_table_dir):
    d = tmp_table_dir
    paths = {k: os.path.join(d, k) for k in ("l", "r", "cp", "out")}
    return paths


def test_interval_join_matches_range_and_drops_late(spark, dirs):
    # Phase 1 (on-time): left probes at minutes 0 and 30, right
    # enrichments at minutes 2 (in range of m=0), 7 (out of range),
    # 33 (in range of m=30), and 59 (advances the watermark to 49).
    _rows(spark, "l", [(1, 7, 0), (2, 7, 30)]).write.parquet(dirs["l"])
    _rows(
        spark, "r", [(10, 7, 2), (11, 7, 7), (12, 7, 33), (13, 99, 59)]
    ).write.parquet(dirs["r"])
    _run(spark, dirs["l"], dirs["r"], dirs["cp"], dirs["out"])
    got = {
        (r.l_id, r.r_id)
        for r in spark.read.parquet(dirs["out"]).collect()
    }
    assert got == {(1, 10), (2, 12)}

    # Phase 2 (restart on the same checkpoint): a right row at minute 5
    # is behind the watermark (49) — dropped at input even though a
    # buffered partner COULD have matched; a left row at minute 56 with
    # a fresh right row at 58 matches eagerly in the same batch.
    _rows(spark, "l", [(3, 7, 56)]).write.mode("append").parquet(dirs["l"])
    _rows(spark, "r", [(14, 7, 5), (15, 7, 58)]).write.mode("append").parquet(
        dirs["r"]
    )
    _run(spark, dirs["l"], dirs["r"], dirs["cp"], dirs["out"])
    got = {
        (r.l_id, r.r_id)
        for r in spark.read.parquet(dirs["out"]).collect()
    }
    assert got == {(1, 10), (2, 12), (3, 15)}


def test_left_outer_emits_unmatched_on_watermark(spark, dirs):
    # uid 7 at minute 0 has a partner (minute 2); uid 8 at minute 0
    # has none. A flush pair (distinct unmatchable keys, far future)
    # pushes the watermark past every real horizon so the unmatched
    # probe is emitted with null right columns.
    _rows(spark, "l", [(1, 7, 0), (2, 8, 0)]).write.parquet(dirs["l"])
    _rows(spark, "r", [(10, 7, 2)]).write.parquet(dirs["r"])

    def run():
        left = spark.readStream.schema(_schema("l")).parquet(dirs["l"] + "/*")
        right = spark.readStream.schema(_schema("r")).parquet(dirs["r"] + "/*")
        j = interval_join(
            left, right, key="uid", left_ts="l_ts", right_ts="r_ts",
            delay="10 minutes", max_delta="4 minutes", how="left_outer",
        )
        q = (
            j.writeStream.format("parquet")
            .option("path", dirs["out"])
            .option("checkpointLocation", dirs["cp"])
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()

    run()
    _rows(spark, "l", [(99, 500, 10_000)]).write.mode("append").parquet(dirs["l"])
    _rows(spark, "r", [(98, 501, 10_000)]).write.mode("append").parquet(dirs["r"])
    run()
    got = {
        (r.l_id, r.r_id)
        for r in spark.read.parquet(dirs["out"]).collect()
    }
    assert got == {(1, 10), (2, None)}


def test_interval_join_rejects_unknown_how(spark):
    df = spark.range(1).select(
        F.col("id").alias("x"), F.lit(7).alias("uid"),
        F.current_timestamp().alias("ts"),
    )
    with pytest.raises(ValueError, match="unsupported join type"):
        interval_join(df, df, how="full_outer")


def test_interval_join_output_columns(spark, dirs):
    _rows(spark, "l", [(1, 7, 0)]).write.parquet(dirs["l"])
    _rows(spark, "r", [(10, 7, 2)]).write.parquet(dirs["r"])
    _run(spark, dirs["l"], dirs["r"], dirs["cp"], dirs["out"])
    out = spark.read.parquet(dirs["out"])
    assert set(out.columns) == {"l_id", "uid", "l_ts", "r_id", "r_ts"}
    row = out.collect()[0]
    assert (row.l_id, row.uid, row.r_id) == (1, 7, 10)
