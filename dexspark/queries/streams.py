"""Structured Streaming consumer family: watermarked event-time
windows (tumbling/sliding/session), stream-stream interval joins
(inner + outer), and duplicate-delivery absorption."""

from __future__ import annotations
import os
import tempfile
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import _parse_datatype_string
from dexspark.cdc.apply import apply_changes
from dexspark.lake.table import LakeTable

from dexspark.queries._common import (  # noqa: F401
    _WIN_BASE_EPOCH,
    load,
)


def _windowed_stream_replay(
    spark: SparkSession,
    sf_dir: str,
    window_duration: str,
    slide: str | None,
) -> DataFrame:
    """Shared harness for the tumbling/sliding event-time window
    queries: three availableNow replays over one checkpoint:

    1. on-time phase (event minutes 0-59) — after it, watermark =
       59 - 10 = 49 min, so windows ending ≤ 49 are finalized;
    2. late phase: rows ≤ 9 min (every window they belong to is
       finalized → DROPPED), rows 50-54 min (late but within delay →
       aggregated into their still-open window(s)), rows 60-119 min
       (new windows);
    3. two flush ticks (role='_flush', far-future event time) that
       only advance the watermark — filtered after the watermark node
       — forcing append-mode emission of every real window.

    Every watermark comparison in the data has a ≥ 5-minute margin
    FOR BOTH window shapes (tumbling 5-min: late-row window ends ≤ 15
    and in-delay ends ≥ 55 vs watermark 49; sliding 10-min/5-min: the
    two windows of a ≤ 9-min row end ≤ 15, the two of a 50-54-min row
    end at 55/60), so the emitted set is exact whatever the engine's
    boundary convention — which is what lets a batch SQL oracle
    reproduce a streaming lateness semantics bit-for-bit."""
    from dexspark.streaming.windowed import windowed_counts

    ev = load(spark, sf_dir, "events")
    lsn = F.col("event_id")
    role = (
        F.when(F.pmod(lsn, 3) == 0, "user")
        .when(F.pmod(lsn, 3) == 1, "assistant")
        .otherwise("tool")
    )
    # phase-2 = lsn % 7 == 6 (coprime with 60, so phase-1 minutes
    # still cover 0..59 and the watermark lands exactly at 49)
    m = (
        F.when(F.pmod(lsn, 7) != 6, F.pmod(lsn, 60))
        .when(F.pmod(lsn, 21) == 6, F.pmod(lsn, 10))       # very late
        .when(F.pmod(lsn, 21) == 13, F.lit(50) + F.pmod(lsn, 5))  # in-delay late
        .otherwise(F.lit(60) + F.pmod(lsn, 60))            # next hour
    )
    rows = ev.select(
        lsn.alias("lsn"),
        role.alias("role"),
        F.timestamp_seconds(
            F.lit(_WIN_BASE_EPOCH) + m.cast("long") * 60
        ).alias("ts"),
    )
    d = tempfile.mkdtemp(prefix="dexspark_q_")
    log_dir = os.path.join(d, "wlog")
    cp = os.path.join(d, "cp")
    out_dir = os.path.join(d, "wout")
    ddl = "lsn long, role string, ts timestamp"
    out_ddl = "w_start timestamp, w_end timestamp, role string, n long, lsn_sum long"

    def run(max_files: int | None = None) -> None:
        # append-mode parquet FILE sink: supports checkpoint recovery
        # across availableNow replays (a memory sink does not) and is
        # the production shape — each finalized window lands exactly
        # once, committed through the sink's metadata log.
        reader = spark.readStream.schema(_parse_datatype_string(ddl))
        if max_files:
            reader = reader.option("maxFilesPerTrigger", max_files)
        stream = reader.parquet(log_dir + "/*")
        agg = windowed_counts(
            stream, ts_col="ts", delay="10 minutes",
            window_duration=window_duration, group_cols=("role",),
            sum_col="lsn", slide=slide,
        )
        q = (
            agg.writeStream.format("parquet").option("path", out_dir)
            .option("checkpointLocation", cp)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()

    phase2 = F.pmod(F.col("lsn"), 7) == 6
    rows.filter(~phase2).repartition(4).write.parquet(log_dir)
    run()
    rows.filter(phase2).repartition(2).write.mode("append").parquet(log_dir)
    run()
    # two flush ticks as two separate runs (one file each, so the
    # batch split is deterministic): the first advances the watermark
    # far past every real window; the second's batch starts AT that
    # watermark and force-emits them all.
    for i, m_flush in enumerate((10000, 20000)):
        flush = spark.createDataFrame(
            [(10**12 + i, "_flush", m_flush)], "lsn long, role string, m long"
        ).select(
            "lsn", "role",
            F.timestamp_seconds(
                F.lit(_WIN_BASE_EPOCH) + F.col("m") * 60
            ).alias("ts"),
        )
        flush.coalesce(1).write.mode("append").parquet(log_dir)
        run()
    # flush ticks aggregate into their own far-future '_flush' window
    # (a filter before the aggregate would be pushed below the
    # watermark node and stop the ticks advancing it — see
    # streaming/windowed.py); drop them from the emitted output here.
    return (
        spark.read.schema(_parse_datatype_string(out_ddl)).parquet(out_dir)
        .filter(F.col("role") != "_flush")
    )


def stream_window_late_data_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute event-time windows with a lateness watermark
    under the hard oracle — see ``_windowed_stream_replay``."""
    return _windowed_stream_replay(spark, sf_dir, "5 minutes", None)


def stream_sliding_window_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) 10-minute windows every 5 minutes, same
    watermark contract — see ``_windowed_stream_replay``. Each kept
    row lands in exactly TWO overlapping windows (Spark expands the
    row per window before the shuffle); lateness is per-window, and
    the minute map keeps both windows of every kept late row open
    (ends 55/60 vs watermark 49) and both windows of every too-late
    row finalized (ends ≤ 15), so the batch oracle just doubles each
    kept row across start offsets {0, -5}."""
    return _windowed_stream_replay(spark, sf_dir, "10 minutes", "5 minutes")


# Mirror: very-late rows (lsn%21=6) target windows finalized by the
# phase-1 watermark and are dropped; everything else aggregates into
# its 5-minute window.
ORACLE_STREAM_WINDOW = f"""
WITH src AS (
  SELECT event_id AS lsn,
    CASE event_id % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
         ELSE 'tool' END AS role,
    CASE WHEN event_id % 7 <> 6 THEN event_id % 60
         WHEN event_id % 21 = 6 THEN NULL
         WHEN event_id % 21 = 13 THEN 50 + event_id % 5
         ELSE 60 + event_id % 60 END AS m
  FROM events
),
kept AS (SELECT * FROM src WHERE m IS NOT NULL)
SELECT
  TIMESTAMP '2024-01-01 00:00:00' + INTERVAL ((m - m % 5)) MINUTE AS w_start,
  TIMESTAMP '2024-01-01 00:00:00' + INTERVAL ((m - m % 5) + 5) MINUTE AS w_end,
  role,
  count(*) AS n,
  CAST(sum(lsn) AS BIGINT) AS lsn_sum
FROM kept
GROUP BY 1, 2, 3
"""


# Sliding variant of the same minute map: each kept row contributes to
# its TWO 10-minute windows, starts (m - m%5) and (m - m%5 - 5); the
# lsn%21=6 rows have both windows behind the watermark and vanish.
ORACLE_SLIDING_WINDOW = """
WITH src AS (
  SELECT event_id AS lsn,
    CASE event_id % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
         ELSE 'tool' END AS role,
    CASE WHEN event_id % 7 <> 6 THEN event_id % 60
         WHEN event_id % 21 = 6 THEN NULL
         WHEN event_id % 21 = 13 THEN 50 + event_id % 5
         ELSE 60 + event_id % 60 END AS m
  FROM events
),
kept AS (SELECT * FROM src WHERE m IS NOT NULL),
expanded AS (
  SELECT lsn, role, (m - m % 5 - off) AS ws
  FROM kept CROSS JOIN (SELECT unnest([0, 5]) AS off) offs
)
SELECT
  TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (ws) MINUTE AS w_start,
  TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (ws + 10) MINUTE AS w_end,
  role,
  count(*) AS n,
  CAST(sum(lsn) AS BIGINT) AS lsn_sum
FROM expanded
GROUP BY 1, 2, 3
"""


# Sparse deterministic minute map for the session-window query: intra-
# cluster diffs 1-3 min (merge), inter-cluster diffs >= 6 min (split) —
# no diff ever equals the 5-min gap, so the session-merge boundary
# convention can never decide a row differently across engines.
_SESS_MINUTES = (0, 2, 4, 15, 17, 30, 32, 34, 45, 47, 49, 59)


def stream_session_windows_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time SESSION windows with a lateness watermark under the
    hard oracle. Same three-phase availableNow scheme as
    ``stream_window_late_data``: an on-time phase (sparse minute
    clusters per key), a late phase (rows at minutes 0-4 target
    sessions finalized by the phase-1 watermark → DROPPED; rows at
    55-56 are in-delay and MERGE into the still-open tail session;
    rows at 70+ open fresh sessions), and two flush ticks under a
    sentinel key. Every merge/split decision has a >= 1-minute margin
    from the exact-gap boundary and every lateness decision a >= 5-min
    margin from the watermark, so a batch lag+cumsum sessionization
    reproduces the emitted set exactly."""
    from dexspark.streaming.windowed import session_counts

    ev = load(spark, sf_dir, "events")
    lsn = F.col("event_id")
    minute_map = F.array(*[F.lit(v) for v in _SESS_MINUTES])
    m = (
        F.when(
            F.pmod(lsn, 7) != 6,
            F.element_at(minute_map, (F.pmod(lsn, 12) + 1).cast("int")),
        )
        .when(F.pmod(lsn, 21) == 6, F.pmod(lsn, 5))            # too late
        .when(F.pmod(lsn, 21) == 13, F.lit(55) + F.pmod(lsn, 2))  # in-delay
        .otherwise(F.lit(70) + F.pmod(lsn, 9) * 6)             # fresh
    )
    rows = ev.select(
        lsn.alias("lsn"),
        F.pmod(lsn, 11).cast("long").alias("uid"),
        F.timestamp_seconds(
            F.lit(_WIN_BASE_EPOCH) + m.cast("long") * 60
        ).alias("ts"),
    )
    d = tempfile.mkdtemp(prefix="dexspark_q_")
    log_dir = os.path.join(d, "slog")
    cp = os.path.join(d, "cp")
    out_dir = os.path.join(d, "sout")
    ddl = "lsn long, uid long, ts timestamp"
    out_ddl = "s_start timestamp, s_end timestamp, uid long, n long, lsn_sum long"

    def run() -> None:
        stream = (
            spark.readStream.schema(_parse_datatype_string(ddl))
            .parquet(log_dir + "/*")
        )
        agg = session_counts(
            stream, ts_col="ts", gap="5 minutes", delay="10 minutes",
            group_cols=("uid",), sum_col="lsn",
        )
        q = (
            agg.writeStream.format("parquet").option("path", out_dir)
            .option("checkpointLocation", cp)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()

    phase2 = F.pmod(F.col("lsn"), 7) == 6
    rows.filter(~phase2).repartition(4).write.parquet(log_dir)
    run()
    rows.filter(phase2).repartition(2).write.mode("append").parquet(log_dir)
    run()
    for i, m_flush in enumerate((10000, 20000)):
        flush = spark.createDataFrame(
            [(10**12 + i, -1, m_flush)], "lsn long, uid long, m long"
        ).select(
            "lsn", "uid",
            F.timestamp_seconds(
                F.lit(_WIN_BASE_EPOCH) + F.col("m") * 60
            ).alias("ts"),
        )
        flush.coalesce(1).write.mode("append").parquet(log_dir)
        run()
    return (
        spark.read.schema(_parse_datatype_string(out_ddl)).parquet(out_dir)
        .filter(F.col("uid") >= 0)
    )


ORACLE_SESSION_WINDOWS = f"""
WITH src AS (
  SELECT event_id AS lsn, event_id % 11 AS uid,
    CASE WHEN event_id % 7 <> 6
           THEN {list(_SESS_MINUTES)}[CAST(event_id % 12 AS INTEGER) + 1]
         WHEN event_id % 21 = 6 THEN NULL
         WHEN event_id % 21 = 13 THEN 55 + event_id % 2
         ELSE 70 + (event_id % 9) * 6 END AS m
  FROM events
),
kept AS (SELECT * FROM src WHERE m IS NOT NULL),
marked AS (
  SELECT *, CASE WHEN m - lag(m) OVER w > 5 THEN 1 ELSE 0 END AS brk
  FROM kept WINDOW w AS (PARTITION BY uid ORDER BY m, lsn)
),
sess AS (
  SELECT *, SUM(brk) OVER (
    PARTITION BY uid ORDER BY m, lsn ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT
  TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (MIN(m)) MINUTE AS s_start,
  TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (MAX(m) + 5) MINUTE AS s_end,
  uid, count(*) AS n, CAST(sum(lsn) AS BIGINT) AS lsn_sum
FROM sess GROUP BY uid, sid
"""


def _interval_join_replay(
    spark: SparkSession, sf_dir: str, how: str
) -> DataFrame:
    """Watermarked stream-stream interval join under the hard oracle
    (≙ the reference correlating a report stream with asynchronous
    metadata events, RouteIngestedFile.kt:24-38). Two file streams
    derived from ``events`` — probes (even lsn) and enrichments (odd
    lsn), both keyed uid = (lsn//2) % 23 — joined on uid with
    r_ts in [l_ts, l_ts + 4 minutes], both sides watermarked at 10
    minutes. availableNow replays over one checkpoint:

    1. on-time phase (minutes 0-59 both sides) — inner-join matches
       emit eagerly in this batch; afterwards both watermarks = 49;
    2. late phase: right rows at minutes 55-58 (within delay → join
       against buffered left state, whose eviction horizon is
       49 - 4 = 45 < 51 = the earliest possible partner, margin 6)
       and rows ≤ 9 min on BOTH sides (behind the watermark → dropped
       at input; their partners' state is independently evicted, so
       the outcome is margin-safe under either mechanism);
    3. (``left_outer`` only) one flush tick per side — DISTINCT
       unmatchable keys (they must not pair with each other either),
       far-future event time — pushing the global watermark past
       every real left row's l_ts + 4min horizon so each unmatched
       left row is flushed out with null right columns. The ticks
       themselves stay safely inside their own horizon (margin
       delay + 4min) and are never emitted.

    The key moduli differ per side (left uid = h%25, right uid =
    h%23): uids 23-24 exist only on the probe side, guaranteeing a
    population of never-matchable probes so the outer variant's
    null-emission path carries real weight.

    Inner joins need no flush: they emit on match, not on state
    expiry. The batch oracle is the plain (inner or left) interval
    join of all kept rows."""
    from dexspark.streaming.joins import interval_join

    ev = load(spark, sf_dir, "events")
    lsn = F.col("event_id")
    h = (lsn / 2).cast("long")  # per-side dense counter
    # left (even lsn): on-time minutes 0-59, or very-late (dropped)
    m_left = F.when(F.pmod(h, 7) != 6, F.pmod(h, 60)).otherwise(F.pmod(h, 10))
    # right (odd lsn): on-time, in-delay late (55-58), or very-late
    m_right = (
        F.when(F.pmod(h, 7) != 6, F.pmod(h, 60))
        .when(F.pmod(h, 14) == 6, F.lit(55) + F.pmod(h, 4))
        .otherwise(F.pmod(h, 10))
    )
    base = ev.select(
        lsn.alias("lsn"),
        # asymmetric moduli: left uids 23-24 have no possible partner
        F.when(F.pmod(lsn, 2) == 0, F.pmod(h, 25))
        .otherwise(F.pmod(h, 23))
        .alias("uid"),
        F.when(F.pmod(lsn, 2) == 0, m_left).otherwise(m_right).alias("m"),
        (F.pmod(h, 7) == 6).alias("phase2"),
    ).withColumn(
        "ts",
        F.timestamp_seconds(F.lit(_WIN_BASE_EPOCH) + F.col("m").cast("long") * 60),
    )
    left_rows = base.filter(F.pmod(F.col("lsn"), 2) == 0).select(
        F.col("lsn").alias("l_lsn"), "uid", F.col("ts").alias("l_ts"), "phase2"
    )
    right_rows = base.filter(F.pmod(F.col("lsn"), 2) == 1).select(
        F.col("lsn").alias("r_lsn"), "uid", F.col("ts").alias("r_ts"), "phase2"
    )
    d = tempfile.mkdtemp(prefix="dexspark_q_")
    l_dir, r_dir = os.path.join(d, "probe"), os.path.join(d, "enrich")
    cp, out_dir = os.path.join(d, "cp"), os.path.join(d, "jout")
    l_ddl = "l_lsn long, uid long, l_ts timestamp"
    r_ddl = "r_lsn long, uid long, r_ts timestamp"
    out_ddl = "l_lsn long, uid long, l_ts timestamp, r_lsn long, r_ts timestamp"

    def run() -> None:
        left_s = (
            spark.readStream.schema(_parse_datatype_string(l_ddl))
            .parquet(l_dir + "/*")
        )
        right_s = (
            spark.readStream.schema(_parse_datatype_string(r_ddl))
            .parquet(r_dir + "/*")
        )
        joined = interval_join(
            left_s, right_s, key="uid", left_ts="l_ts", right_ts="r_ts",
            delay="10 minutes", max_delta="4 minutes", how=how,
        )
        q = (
            joined.writeStream.format("parquet").option("path", out_dir)
            .option("checkpointLocation", cp)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()

    for df, path in ((left_rows, l_dir), (right_rows, r_dir)):
        df.filter(~F.col("phase2")).drop("phase2").repartition(4).write.parquet(path)
    run()
    for df, path in ((left_rows, l_dir), (right_rows, r_dir)):
        df.filter(F.col("phase2")).drop("phase2").repartition(2).write.mode(
            "append"
        ).parquet(path)
    run()
    if how == "left_outer":
        flush_ts = F.timestamp_seconds(
            F.lit(_WIN_BASE_EPOCH) + F.lit(10_000 * 60).cast("long")
        )
        spark.range(1).select(
            F.lit(-1).cast("long").alias("l_lsn"),
            F.lit(999_998).cast("long").alias("uid"),
            flush_ts.alias("l_ts"),
        ).write.mode("append").parquet(l_dir)
        spark.range(1).select(
            F.lit(-1).cast("long").alias("r_lsn"),
            F.lit(999_999).cast("long").alias("uid"),
            flush_ts.alias("r_ts"),
        ).write.mode("append").parquet(r_dir)
        run()
    return spark.read.schema(_parse_datatype_string(out_ddl)).parquet(out_dir)


def stream_interval_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner watermarked interval join — see ``_interval_join_replay``."""
    return _interval_join_replay(spark, sf_dir, "inner")


def stream_interval_join_outer_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer watermarked interval join: matches emit eagerly,
    unmatched probes emit with null enrichment columns once the
    watermark proves no partner can still arrive — see
    ``_interval_join_replay``."""
    return _interval_join_replay(spark, sf_dir, "left_outer")


# Mirror: kept rows are everything except the very-late ones (left
# h%7=6; right h%14=13 — right h%14=6 is the in-delay 55-58 band,
# which the streaming join DOES match); the result is the plain
# interval inner join of the kept sides.
ORACLE_INTERVAL_JOIN = """
WITH src AS (
  SELECT event_id AS lsn, (event_id // 2) AS h
  FROM events
),
left_s AS (
  SELECT lsn AS l_lsn, h % 25 AS uid, h % 60 AS m
  FROM src WHERE lsn % 2 = 0 AND h % 7 <> 6
),
right_s AS (
  SELECT lsn AS r_lsn, h % 23 AS uid,
    CASE WHEN h % 7 <> 6 THEN h % 60 ELSE 55 + h % 4 END AS m
  FROM src WHERE lsn % 2 = 1 AND h % 14 <> 13
)
SELECT
  l.l_lsn, l.uid,
  TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (l.m) MINUTE AS l_ts,
  r.r_lsn,
  TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (r.m) MINUTE AS r_ts
FROM left_s l JOIN right_s r
  ON l.uid = r.uid AND r.m BETWEEN l.m AND l.m + 4
"""


# Left-outer mirror: every kept probe appears; unmatched ones carry
# NULL enrichment columns (the streaming side emits those on state
# expiry once the flush ticks advance the watermark past every real
# horizon).
ORACLE_INTERVAL_JOIN_OUTER = """
WITH src AS (
  SELECT event_id AS lsn, (event_id // 2) AS h
  FROM events
),
left_s AS (
  SELECT lsn AS l_lsn, h % 25 AS uid, h % 60 AS m
  FROM src WHERE lsn % 2 = 0 AND h % 7 <> 6
),
right_s AS (
  SELECT lsn AS r_lsn, h % 23 AS uid,
    CASE WHEN h % 7 <> 6 THEN h % 60 ELSE 55 + h % 4 END AS m
  FROM src WHERE lsn % 2 = 1 AND h % 14 <> 13
)
SELECT
  l.l_lsn, l.uid,
  TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (l.m) MINUTE AS l_ts,
  r.r_lsn,
  TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (r.m) MINUTE AS r_ts
FROM left_s l LEFT JOIN right_s r
  ON l.uid = r.uid AND r.m BETWEEN l.m AND l.m + 4
"""


def stream_dedup_deliveries_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-delivery absorption under the hard oracle: an
    at-least-once transport (≙ Event Grid redelivery + Durable
    activity retry, FnOrchestrator.kt:182-192) delivers every change
    record 1 + lsn%3 times; ``dedup_within_watermark`` must emit each
    exactly once. Two availableNow replays over one checkpoint:

    1. on-time phase: records at minutes 0-59, every copy written in
       the same phase with the SAME event time (redelivery of an
       immutable log record) — all copies collapse in state, one row
       per lsn emitted; afterwards watermark = 49;
    2. late phase: re-deliveries of minute ≤ 9 records (behind the
       watermark by ≥ 40 min → dropped at input — correct, the
       original was already emitted; NOTE this is the case plain
       in-state dedup would get wrong once state expired) plus new
       records at minutes 60-119, again delivered in multiple copies.

    The batch oracle is SELECT DISTINCT over the kept records — exact
    because copies are identical rows and every watermark comparison
    has ≥ 5-minute margins."""
    from dexspark.streaming.dedup import dedup_within_watermark

    ev = load(spark, sf_dir, "events")
    lsn = F.col("event_id")
    m = F.when(F.pmod(lsn, 7) != 6, F.pmod(lsn, 60)).otherwise(
        F.lit(60) + F.pmod(lsn, 60)
    )
    base = ev.select(
        lsn.alias("lsn"),
        F.when(F.pmod(lsn, 3) == 0, F.lit("user"))
        .when(F.pmod(lsn, 3) == 1, F.lit("assistant"))
        .otherwise(F.lit("tool"))
        .alias("role"),
        m.alias("m"),
        (F.pmod(lsn, 7) == 6).alias("phase2"),
        (F.lit(1) + F.pmod(lsn, 3)).cast("int").alias("copies"),
    ).withColumn(
        "ts",
        F.timestamp_seconds(F.lit(_WIN_BASE_EPOCH) + F.col("m").cast("long") * 60),
    )
    dup = base.withColumn(
        "_c", F.explode(F.sequence(F.lit(1), F.col("copies")))
    ).select("lsn", "role", "ts", "phase2")
    d = tempfile.mkdtemp(prefix="dexspark_q_")
    log_dir, cp, out_dir = (
        os.path.join(d, "log"),
        os.path.join(d, "cp"),
        os.path.join(d, "out"),
    )
    ddl = "lsn long, role string, ts timestamp"

    def run() -> None:
        s = spark.readStream.schema(_parse_datatype_string(ddl)).parquet(
            log_dir + "/*"
        )
        deduped = dedup_within_watermark(
            s, keys=("lsn",), ts_col="ts", delay="10 minutes"
        )
        q = (
            deduped.writeStream.format("parquet").option("path", out_dir)
            .option("checkpointLocation", cp)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()

    dup.filter(~F.col("phase2")).drop("phase2").repartition(4).write.parquet(
        log_dir
    )
    run()
    # late re-deliveries of early records + the phase-2 records
    late_redeliver = dup.filter(~F.col("phase2")).drop("phase2").filter(
        F.col("ts")
        < F.timestamp_seconds(F.lit(_WIN_BASE_EPOCH + 10 * 60))
    )
    phase2 = dup.filter(F.col("phase2")).drop("phase2")
    late_redeliver.unionByName(phase2).repartition(2).write.mode(
        "append"
    ).parquet(log_dir)
    run()
    return spark.read.schema(_parse_datatype_string(ddl)).parquet(out_dir)


# Mirror: one row per lsn — phase-1 records (lsn%7<>6, minutes 0-59)
# plus phase-2 records (lsn%7=6, minutes 60-119); duplicate deliveries
# and the behind-watermark re-deliveries contribute nothing.
ORACLE_STREAM_DEDUP = """
SELECT event_id AS lsn,
  CASE event_id % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
       ELSE 'tool' END AS role,
  TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (
    CASE WHEN event_id % 7 <> 6 THEN event_id % 60
         ELSE 60 + event_id % 60 END) MINUTE AS ts
FROM events
"""
