"""Deterministic synthetic transcript CDC log generator (seed-stable).

Generates the north-rule input shape entirely with Spark expressions —
``spark.range`` + ``xxhash64`` — so a 10^10-event log never exists on
the driver and generation parallelizes like any other scan. No
wall-clock, no Python RNG: same (seed, params) → byte-identical log.

Schema of the change log::

    lsn:long  op:string(I|U|D)  batch_seq:long
    conv_id:string  turn_idx:int  role:string  text:string
    tool:string  ts:timestamp

≙ reference event stream (AzureBlobCreateEventMesage.kt:4-12): lsn ≙
Event Hub sequence number, op ≙ eventType, (conv_id, turn_idx) ≙ blob
URL, payload ≙ blob content + metadata map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

BASE_TS = "2024-01-01 00:00:00"


def _h(col, seed: int, salt: int):
    return F.xxhash64(col, F.lit(seed + salt))


def gen_change_log(
    spark: SparkSession,
    n_events: int,
    n_convs: int = 1_000,
    max_turns: int = 40,
    seed: int = 42,
    n_batches: int = 8,
    hot_conv_pct: int = 0,
    delete_pct: int = 5,
    update_pct: int = 35,
    bad_role_pct: int = 0,
    ts_violation_pct: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """Ordered CDC log. ``hot_conv_pct`` percent of events hit conv 0
    (skew); ``bad_role_pct`` / ``ts_violation_pct`` inject rows the
    validator must quarantine."""
    rng = spark.range(0, n_events, numPartitions=partitions)
    i = F.col("id")

    conv_num = F.when(
        F.pmod(_h(i, seed, 1), 100) < F.lit(hot_conv_pct), F.lit(0)
    ).otherwise(F.pmod(_h(i, seed, 2), F.lit(n_convs)))
    turn_idx = F.pmod(_h(i, seed, 3), F.lit(max_turns)).cast("int")

    opr = F.pmod(_h(i, seed, 4), 100)
    op = (
        F.when(opr < delete_pct, F.lit("D"))
        .when(opr < delete_pct + update_pct, F.lit("U"))
        .otherwise(F.lit("I"))
    )

    role = F.when(
        F.pmod(turn_idx, 7) == 6, F.lit("tool")
    ).otherwise(
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant")), F.pmod(turn_idx, 2).cast("int") + 1
        )
    )
    if bad_role_pct:
        role = F.when(
            F.pmod(_h(i, seed, 5), 100) < bad_role_pct, F.lit("alien")
        ).otherwise(role)

    tool = F.when(
        role == "tool",
        F.concat(F.lit("tool_"), F.pmod(_h(i, seed, 6), 5).cast("string")),
    )

    # ts monotone in turn_idx per conv; violations push ts backwards
    ts_off = turn_idx.cast("long") * 60 + F.pmod(_h(i, seed, 7), 30)
    if ts_violation_pct:
        ts_off = F.when(
            F.pmod(_h(i, seed, 8), 100) < ts_violation_pct,
            -(turn_idx.cast("long") * 3600) - 86_400,
        ).otherwise(ts_off)
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(BASE_TS).cast("timestamp")) + ts_off
    )

    batch_size = max(1, (n_events + n_batches - 1) // n_batches)

    return rng.select(
        i.alias("lsn"),
        op.alias("op"),
        (i / batch_size).cast("long").alias("batch_seq"),
        F.concat(F.lit("conv_"), conv_num.cast("string")).alias("conv_id"),
        turn_idx.alias("turn_idx"),
        role.alias("role"),
        F.concat(
            F.lit("c"), conv_num.cast("string"),
            F.lit(" t"), turn_idx.cast("string"),
            F.lit(" rev"), i.cast("string"),
        ).alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def with_replay_duplicates(log: DataFrame, every_n: int = 10) -> DataFrame:
    """At-least-once delivery: re-emit every n-th event verbatim
    (same LSN), like an Event Hub redelivery. Dedup must collapse these."""
    dupes = log.filter(F.pmod(F.col("lsn"), every_n) == 0)
    return log.unionAll(dupes)


def expected_final_state(log: DataFrame, valid_only: DataFrame | None = None) -> DataFrame:
    """Independent (window-based) computation of the final table state —
    used by tests as the oracle against the engine's aggregate+merge
    path. Deliberately a DIFFERENT formulation (row_number window vs
    max_by aggregate + COW merge)."""
    from pyspark.sql import Window

    src = valid_only if valid_only is not None else log
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(F.col("lsn").desc())
    latest = (
        src.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return latest.filter(F.col("op") != "D").select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
