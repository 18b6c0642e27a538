"""Lake-format family: time travel, tags, retention/RTBF deletes
(COW + deletion vectors), provenance, stats/z-order/clustered scans,
metadata-only counts, MERGE INTO, rebucketing."""

from __future__ import annotations
import os
import tempfile
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import _parse_datatype_string
from dexspark.cdc.apply import apply_changes
from dexspark.lake.table import LakeTable

from dexspark.queries._common import (  # noqa: F401
    BATCH,
    FLAGGED_CTE,
    LOG_CTE,
    PAYLOAD,
    _MID_LATEST,
    _WIN_BASE_EPOCH,
    _replay_with_midpoint,
    batch_range,
    derive_log,
    load,
)


def cdc_time_travel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot isolation / time travel: after the FULL replay, read
    the table as-of the mid-replay version — it must equal a replay of
    only the first half of the log. Later merges/compactions must not
    perturb committed history."""
    table, v_mid = _replay_with_midpoint(spark, sf_dir)
    return table.read(version=v_mid)


def cdc_tag_pinned_read_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducibility pin under the hard oracle (≙ Iceberg tags): the
    mid-replay snapshot is TAGGED (the state a training run consumed),
    the replay finishes, the table is compacted, and snapshot retention
    expires everything but the head — yet ``read(tag=)`` must still
    reproduce the pinned state byte-exactly, because a tagged
    snapshot's manifest and data files are exempt from expiry until
    ``drop_tag``. Same oracle as time travel; what's under test is the
    retention exemption (without the tag, this read would fail — the
    version is past the keep_last horizon)."""
    table, v_mid = _replay_with_midpoint(spark, sf_dir)
    table.tag("train-v1", version=v_mid)
    table.compact(min_files_per_bucket=1)
    table.expire_snapshots(keep_last=1)
    return table.read(tag="train-v1")


ORACLE_TIME_TRAVEL = f"""
WITH {LOG_CTE}, {FLAGGED_CTE},
thr AS (SELECT (max(batch_seq) + 2) // 2 AS t FROM log),
{_MID_LATEST}
SELECT conv_id, turn_idx, role, text, tool, ts
FROM latest WHERE rn = 1 AND op <> 'D'
"""


ORACLE_MERGE_INTO = f"""
WITH {LOG_CTE}, {FLAGGED_CTE},
mid AS (SELECT (MIN(batch_seq) + MAX(batch_seq) + 1) // 2 AS m FROM log),
tgt AS (
  SELECT conv_id, turn_idx, role, text, tool, ts FROM (
    SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
    FROM flagged
    WHERE reject_reason IS NULL AND batch_seq < (SELECT m FROM mid)
  ) WHERE rn = 1 AND op <> 'D'
),
src AS (
  SELECT conv_id, turn_idx, bool_or(op = 'D') AS has_delete,
         'p' || CAST(MAX(lsn) AS VARCHAR) AS stext
  FROM log WHERE batch_seq >= (SELECT m FROM mid)
  GROUP BY conv_id, turn_idx
),
merged AS (
  SELECT COALESCE(t.conv_id, s.conv_id) AS conv_id,
         COALESCE(t.turn_idx, s.turn_idx) AS turn_idx,
         CASE WHEN t.conv_id IS NOT NULL AND s.conv_id IS NOT NULL THEN
                CASE WHEN s.has_delete THEN 'drop' ELSE 'upd' END
              WHEN s.conv_id IS NOT NULL THEN
                CASE WHEN NOT s.has_delete THEN 'ins' ELSE 'drop' END
              ELSE CASE WHEN t.turn_idx >= 12 THEN 'drop' ELSE 'stale' END
         END AS act,
         t.role AS trole, t.text AS ttext, t.tool AS ttool, t.ts AS tts,
         s.stext AS stext
  FROM tgt t FULL OUTER JOIN src s
    ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
)
SELECT conv_id, turn_idx,
  CASE WHEN act = 'ins' THEN 'assistant' ELSE trole END AS role,
  CASE WHEN act IN ('upd', 'ins') THEN stext
       WHEN act = 'stale' THEN ttext || ' [stale]'
       ELSE ttext END AS text,
  CASE WHEN act = 'ins' THEN CAST(NULL AS VARCHAR) ELSE ttool END AS tool,
  CASE WHEN act = 'ins' THEN TIMESTAMP '2024-01-02 00:00:00' ELSE tts END AS ts
FROM merged WHERE act <> 'drop'
"""


def lake_merge_into_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ANSI MERGE INTO surface (lake/merge_into.py — the Delta /
    Iceberg user statement, next to the CDC hot path): half the log is
    replayed to build the target, the rest is aggregated into a keyed
    source set, then ONE merge statement exercises every clause family
    in order — WHEN MATCHED AND s.has_delete DELETE, WHEN MATCHED
    UPDATE SET text, WHEN NOT MATCHED AND NOT s.has_delete INSERT
    (tombstoned keys count as NOT matched, so an insert replaces the
    tombstone), WHEN NOT MATCHED BY SOURCE AND t.turn_idx >= 12 DELETE,
    WHEN NOT MATCHED BY SOURCE UPDATE (stale marker). The oracle is the
    literal FULL OUTER JOIN + first-match CASE mirror."""
    log = derive_log(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="dexspark_q_")
    table = LakeTable.create(
        spark, os.path.join(d, "transcripts"),
        _parse_datatype_string(PAYLOAD), "conv_id", num_buckets=16,
    )
    batches = batch_range(log)
    mid = (batches.start + batches.stop) // 2
    for b in range(batches.start, mid):
        apply_changes(table, log.filter(F.col("batch_seq") == b), batch_id=f"mi{b}")
    src = (
        log.filter(F.col("batch_seq") >= mid)
        .groupBy("conv_id", "turn_idx")
        .agg(
            F.expr("bool_or(op = 'D')").alias("has_delete"),
            F.concat(F.lit("p"), F.max("lsn").cast("string")).alias("stext"),
        )
    )
    table.merge_into(
        src, ["conv_id", "turn_idx"],
        when_matched=[
            ("delete", "s.has_delete", None),
            ("update", None, {"text": "s.stext"}),
        ],
        when_not_matched=[
            ("insert", "NOT s.has_delete", {
                "role": "'assistant'", "text": "s.stext",
                "ts": "timestamp'2024-01-02 00:00:00'",
            }),
        ],
        when_not_matched_by_source=[
            ("delete", "t.turn_idx >= 12", None),
            ("update", None, {"text": "concat(t.text, ' [stale]')"}),
        ],
        lsn=10**9,
    )
    return table.read()


def lake_stats_pruned_scan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest min/max data skipping (Iceberg/Delta file-stats
    analogue, lake/stats.py): events land as 8 hourly append commits —
    the time-series ingest shape — and a ts-range read for hour 3
    must prune every other commit's files BEFORE Spark plans the scan
    (asserted by tests/test_lake_stats.py via df.inputFiles(); here
    the oracle checks the result is exactly the row-level filter).
    At 100 TB this is "read one hour of segments", not "read the
    table"."""
    import datetime as _dt

    ev = load(spark, sf_dir, "events")
    lsn = F.col("event_id")
    rows = ev.select(
        lsn.alias("lsn"),
        F.col("user_id").cast("long").alias("uid"),
        F.col("event_type").alias("etype"),
        F.timestamp_seconds(
            F.lit(_WIN_BASE_EPOCH) + F.pmod(lsn, 480).cast("long") * 60
        ).alias("ts"),
        (F.pmod(lsn, 480) / 60).cast("int").alias("_hour"),
    )
    d = tempfile.mkdtemp(prefix="dexspark_q_")
    table = LakeTable.create(
        spark, os.path.join(d, "events_lake"),
        _parse_datatype_string("lsn long, uid long, etype string, ts timestamp"),
        "uid", num_buckets=4,
    )
    for h in range(8):
        table.append(rows.filter(F.col("_hour") == h).drop("_hour"))
    base = _dt.datetime(2024, 1, 1, 0, 0, 0)
    lo = base + _dt.timedelta(hours=3)
    hi = base + _dt.timedelta(hours=4)
    return table.read(filters=[("ts", ">=", lo), ("ts", "<", hi)])


ORACLE_STATS_PRUNED = """
SELECT event_id AS lsn, CAST(user_id AS BIGINT) AS uid,
  event_type AS etype,
  TIMESTAMP '2024-01-01 00:00:00'
    + INTERVAL (event_id % 480) MINUTE AS ts
FROM events
WHERE event_id % 480 BETWEEN 180 AND 239
"""


def lake_clustered_scan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustered compaction under the hard oracle: the same hourly
    ingest as ``lake_stats_pruned_scan``, but arriving UNCLUSTERED
    (each append spans the whole day — the shape after an out-of-order
    backfill), so per-file min/max cannot prune a time-range read.
    ``compact(cluster_by=["ts"])`` rewrites each bucket as
    range-disjoint files; the hour-3 read must then both prune (file
    counts machine-asserted in tests/test_lake_stats.py) and return
    exactly the row-filter result — compaction must never change
    data while changing layout."""
    import datetime as _dt

    ev = load(spark, sf_dir, "events")
    lsn = F.col("event_id")
    rows = ev.select(
        lsn.alias("lsn"),
        F.col("user_id").cast("long").alias("uid"),
        F.col("event_type").alias("etype"),
        F.timestamp_seconds(
            F.lit(_WIN_BASE_EPOCH) + F.pmod(lsn, 480).cast("long") * 60
        ).alias("ts"),
    )
    d = tempfile.mkdtemp(prefix="dexspark_q_")
    table = LakeTable.create(
        spark, os.path.join(d, "events_lake"),
        _parse_datatype_string("lsn long, uid long, etype string, ts timestamp"),
        "uid", num_buckets=4,
    )
    # 4 appends, each a ts-interleaved slice of the day (lsn stripes)
    for s in range(4):
        table.append(rows.filter(F.pmod(F.col("lsn"), 4) == s))
    table.compact(cluster_by=["ts"], files_per_bucket=8)
    base = _dt.datetime(2024, 1, 1, 0, 0, 0)
    lo = base + _dt.timedelta(hours=3)
    hi = base + _dt.timedelta(hours=4)
    return table.read(filters=[("ts", ">=", lo), ("ts", "<", hi)])


def lake_zorder_scan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered compaction under the hard oracle: the same
    unclustered ingest as ``lake_clustered_scan``, but compacted with
    ``zorder=True`` over (ts, uid) so the 2-D box read — one hour AND
    one uid range, the retention-sweep-meets-RTBF shape — can prune
    files on BOTH dimensions (lexicographic ts,uid layout prunes only
    ts; pruning counts machine-asserted in tests/test_lake_zorder.py).
    The oracle checks the layout is content-transparent: the box read
    equals the plain row filter exactly."""
    import datetime as _dt

    ev = load(spark, sf_dir, "events")
    lsn = F.col("event_id")
    rows = ev.select(
        lsn.alias("lsn"),
        F.col("user_id").cast("long").alias("uid"),
        F.col("event_type").alias("etype"),
        F.timestamp_seconds(
            F.lit(_WIN_BASE_EPOCH) + F.pmod(lsn, 480).cast("long") * 60
        ).alias("ts"),
    )
    d = tempfile.mkdtemp(prefix="dexspark_q_")
    table = LakeTable.create(
        spark, os.path.join(d, "events_lake"),
        _parse_datatype_string("lsn long, uid long, etype string, ts timestamp"),
        "uid", num_buckets=4,
    )
    for s in range(4):
        table.append(rows.filter(F.pmod(F.col("lsn"), 4) == s))
    table.compact(cluster_by=["ts", "uid"], files_per_bucket=8, zorder=True)
    base = _dt.datetime(2024, 1, 1, 0, 0, 0)
    lo = base + _dt.timedelta(hours=3)
    hi = base + _dt.timedelta(hours=4)
    return table.read(
        filters=[("ts", ">=", lo), ("ts", "<", hi), ("uid", "<", 500)]
    )


ORACLE_ZORDER_SCAN = """
SELECT event_id AS lsn, CAST(user_id AS BIGINT) AS uid,
  event_type AS etype,
  TIMESTAMP '2024-01-01 00:00:00'
    + INTERVAL (event_id % 480) MINUTE AS ts
FROM events
WHERE event_id % 480 BETWEEN 180 AND 239 AND CAST(user_id AS BIGINT) < 500
"""


def cdc_retention_delete_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate DELETE under the hard oracle — the retention /
    right-to-be-forgotten surface (``DELETE FROM t WHERE ts <
    cutoff``, Delta/Iceberg DELETE analogue; the reference has no
    delete surface — engine-supplied per SURVEY §2.2). The replay
    lands the first half COW and the second half MOR with NO
    compaction, so the sweep crosses both clean buckets (stats-pruned
    file surgery: only files whose min/max admit the cutoff are
    rewritten) and delta buckets (resolved and folded to base as part
    of the delete). Tombstones survive; only live rows matching the
    predicate are purged. Surgery + pruning are machine-asserted in
    tests/test_lake_delete.py; here the oracle checks the surviving
    state is exactly the final state minus the swept range."""
    log = derive_log(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="dexspark_q_")
    table = LakeTable.create(
        spark, os.path.join(d, "transcripts"),
        _parse_datatype_string(PAYLOAD), "conv_id", num_buckets=16,
    )
    batches = batch_range(log)
    mid = (batches.start + batches.stop) // 2
    for b in batches:
        apply_changes(
            table, log.filter(F.col("batch_seq") == b),
            batch_id=f"rd{b}", strategy="cow" if b < mid else "mor",
        )
    import datetime as _dt

    info = table.delete_where(
        [("ts", "<", _dt.datetime(2024, 1, 1, 0, 8, 0))]
    )
    assert info["matched_rows"] > 0 and not info.get("skipped")
    return table.read()


# final replay state minus the swept ts range (ts is never NULL for
# valid rows, so the null-rejecting predicate needs no special case)
ORACLE_RETENTION_DELETE = f"""
WITH {LOG_CTE}, {FLAGGED_CTE},
latest AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM flagged WHERE reject_reason IS NULL
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM latest WHERE rn = 1 AND op <> 'D'
  AND ts >= TIMESTAMP '2024-01-01 00:08:00'
"""


def cdc_retention_delete_dv_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-vector DELETE under the hard oracle (lake/dv.py, ≙
    Delta deletion vectors / Iceberg positional deletes — engine-
    supplied per SURVEY §2.2). Same mixed COW/MOR replay as
    ``cdc_retention_delete``, then TWO dv-strategy deletes: the first
    sweeps a ts range (clean buckets gain (file, position) vectors
    with NO data-file rewrite; delta buckets fold to base in the same
    commit), the second hits the same files so the prior vector folds
    into the new directory. The read the oracle hashes goes through
    the DV anti-join; the query then proves compact() purges the
    positions physically WITHOUT changing the visible state
    (exceptAll both ways) and returns the post-compact read — so one
    oracle row covers the vectorized read path, the vector-union
    path, and the purge."""
    log = derive_log(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="dexspark_q_")
    table = LakeTable.create(
        spark, os.path.join(d, "transcripts"),
        _parse_datatype_string(PAYLOAD), "conv_id", num_buckets=16,
    )
    batches = batch_range(log)
    mid = (batches.start + batches.stop) // 2
    for b in batches:
        apply_changes(
            table, log.filter(F.col("batch_seq") == b),
            batch_id=f"rdv{b}", strategy="cow" if b < mid else "mor",
        )
    import datetime as _dt

    i1 = table.delete_where(
        [("ts", "<", _dt.datetime(2024, 1, 1, 0, 6, 0))], strategy="dv"
    )
    assert i1["matched_rows"] > 0 and not i1.get("skipped")
    i2 = table.delete_where([("turn_idx", "=", 9)], strategy="dv")
    assert i2["matched_rows"] > 0
    assert any(f.dv for f in table.manifest().files), "expected vectors"
    pre = table.read()
    table.compact()
    assert not any(f.dv for f in table.manifest().files)
    post = table.read()
    # purge is layout-only: the visible state is bit-identical
    assert pre.exceptAll(post).count() == 0
    assert post.exceptAll(pre).count() == 0
    return post


# final replay state minus both swept predicates (ts < 00:06 ==
# turn_idx < 6 by construction; turn_idx = 9 is the second vector)
ORACLE_RETENTION_DELETE_DV = f"""
WITH {LOG_CTE}, {FLAGGED_CTE},
latest AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM flagged WHERE reject_reason IS NULL
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM latest WHERE rn = 1 AND op <> 'D'
  AND ts >= TIMESTAMP '2024-01-01 00:06:00'
  AND turn_idx <> 9
"""


def cdc_asof_timestamp_read_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp time travel under the hard oracle (``read(as_of=ts)``
    ≙ Iceberg/Delta TIMESTAMP AS OF): replay the log in four
    LSN-quartile batches, capture the wall clock between batches 1 and
    2, and read as of that moment — the result must equal the replay
    of exactly the first two quartiles, which the oracle recomputes as
    an LSN-truncated LWW. Commit stamps are clamped monotone along the
    snapshot chain (lake/manifest.py), so the captured instant
    resolves deterministically even though its absolute value differs
    every run. Also asserts the as-of read is BYTE-IDENTICAL to
    version time travel at the resolved version."""
    import time as _time

    log = derive_log(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="dexspark_q_")
    table = LakeTable.create(
        spark, os.path.join(d, "transcripts"),
        _parse_datatype_string(PAYLOAD), "conv_id", num_buckets=16,
    )
    lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
    step = max(1, (int(hi) - int(lo) + 4) // 4)
    cuts = [int(lo) + i * step for i in range(5)]
    cuts[4] = int(hi) + 1
    t_mid = None
    for i in range(4):
        sl = log.filter(
            (F.col("lsn") >= cuts[i]) & (F.col("lsn") < cuts[i + 1])
        )
        apply_changes(table, sl, batch_id=f"ao{i}")
        if i == 1:
            t_mid = _time.time()
    v = table.resolve_as_of(t_mid)
    asof = table.read(as_of=t_mid)
    assert asof.exceptAll(table.read(version=v)).count() == 0
    return asof


# LWW over the first two LSN quartiles only — the state the captured
# instant pins (cut arithmetic mirrors the Python: step = max(1,
# (hi-lo+4)//4), cut = lo + 2*step)
ORACLE_ASOF_TIMESTAMP = f"""
WITH {LOG_CTE}, {FLAGGED_CTE},
cut AS (
  SELECT MIN(lsn) + 2 * GREATEST(1, (MAX(lsn) - MIN(lsn) + 4) // 4)
    AS c FROM log
),
latest AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM flagged
  WHERE reject_reason IS NULL AND lsn < (SELECT c FROM cut)
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM latest WHERE rn = 1 AND op <> 'D'
"""


def cdc_row_provenance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level provenance from the lineage metrics table: every live
    row is attributed to the BATCH whose applied-LSN range (recorded
    per bucket in the commit summary, lineage_df) contains the row's
    ``_applied_lsn`` — metadata the merge wrote atomically WITH the
    data, so attribution can never disagree with table contents. The
    join is row-side trivial: lineage is O(batches × buckets) and
    broadcast; the row side is one scan with its system column. The
    oracle recomputes the winner's batch id arithmetically
    (batch_seq = lsn div BATCH — the generator's contract), proving
    the recorded ranges attribute every row exactly."""
    log = derive_log(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="dexspark_q_")
    table = LakeTable.create(
        spark, os.path.join(d, "transcripts"),
        _parse_datatype_string(PAYLOAD), "conv_id", num_buckets=16,
    )
    for b in batch_range(log):
        apply_changes(
            table, log.filter(F.col("batch_seq") == b), batch_id=f"pv{b}"
        )
    lin = table.lineage_df().select(
        "batch_id", "bucket", "start_lsn", "end_lsn"
    )
    state = (
        table.read(include_system=True)
        .filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
        .drop("_deleted")
    )
    m = table.manifest()
    state = state.withColumn(
        "_b", F.pmod(F.xxhash64(F.col("conv_id")), F.lit(m.num_buckets)).cast("int")
    )
    return (
        state.join(
            F.broadcast(lin),
            (state["_b"] == lin["bucket"])
            & (state["_applied_lsn"] >= lin["start_lsn"])
            & (state["_applied_lsn"] <= lin["end_lsn"]),
            "left",
        )
        .select(
            "conv_id", "turn_idx",
            F.col("batch_id").alias("written_by"),
        )
    )


ORACLE_ROW_PROVENANCE = f"""
WITH {LOG_CTE}, {FLAGGED_CTE},
latest AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM flagged WHERE reject_reason IS NULL
)
SELECT conv_id, turn_idx,
       'pv' || CAST(lsn // {BATCH} AS VARCHAR) AS written_by
FROM latest WHERE rn = 1 AND op <> 'D'
"""


def cdc_rtbf_secondary_delete_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-key right-to-be-forgotten under the hard oracle: the
    subject identifier (``author``) is NOT the bucket key, so neither
    bucket derivation nor min/max stats (strings) can prune —
    ``build_blooms("author")`` builds secondary bloom sidecars (one
    thin column read per file, the price every secondary-index build
    pays), after which the RTBF ``delete_where([("author","=",X)])``
    rewrites only files that may hold X. The query replays the log
    with a derived high-cardinality author column, indexes, deletes
    one author, asserts file surgery actually pruned (files_kept >
    0), and returns the surviving state; the oracle recomputes the
    LWW replay minus the subject in SQL."""
    log = derive_log(spark, sf_dir).withColumn(
        "author", F.concat(F.lit("a"), F.pmod(F.col("lsn"), 449).cast("string"))
    )
    d = tempfile.mkdtemp(prefix="dexspark_q_")
    table = LakeTable.create(
        spark, os.path.join(d, "transcripts"),
        _parse_datatype_string(PAYLOAD + ", author string"),
        "conv_id", num_buckets=16,
    )
    lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
    mid_lsn = (int(lo) + int(hi)) // 2
    apply_changes(table, log.filter(F.col("lsn") <= mid_lsn), batch_id="sb_lo")
    apply_changes(table, log.filter(F.col("lsn") > mid_lsn), batch_id="sb_hi")
    info = table.build_blooms("author")
    assert info["files_indexed"] > 0
    # deterministic victim PRESENT in the final state at any SF: the
    # max author string among live rows (the oracle computes the same)
    victim = table.read().agg(F.max("author")).first()[0]
    dinfo = table.delete_where([("author", "=", victim)])
    assert dinfo["matched_rows"] > 0 and not dinfo.get("skipped")
    assert dinfo["files_kept"] > 0, "secondary blooms pruned nothing"
    return table.read()


ORACLE_RTBF_SECONDARY = f"""
WITH {LOG_CTE}, {FLAGGED_CTE},
latest AS (
  SELECT *, 'a' || CAST(lsn % 449 AS VARCHAR) AS author,
         row_number() OVER (
           PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM flagged WHERE reject_reason IS NULL
),
live AS (
  SELECT * FROM latest WHERE rn = 1 AND op <> 'D'
)
SELECT conv_id, turn_idx, role, text, tool, ts, author
FROM live WHERE author <> (SELECT MAX(author) FROM live)
"""


def lake_metadata_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only COUNT (``LakeTable.count_rows``): per-file row
    counts + a footer-derived tombstone-free proof let an append-only
    corpus answer COUNT(*) in O(manifest) with ZERO data I/O — the
    Iceberg/Delta trick of serving counts from manifests, including
    correct arithmetic over deletion vectors (rows − dv_count, exact
    because vectors only ever mark live rows). The query loads the
    documents corpus into a lake table, counts before and after a
    dv-strategy delete, and asserts BOTH answers came from metadata
    alone (``scanned_files == 0``); the oracle recomputes both counts
    in SQL. A CDC table with tombstones falls back to scanning only
    the unprovable files — covered by tests/test_lake_counts.py."""
    docs = load(spark, sf_dir, "documents")
    d = tempfile.mkdtemp(prefix="dexspark_q_")
    table = LakeTable.create(
        spark, os.path.join(d, "docs"),
        _parse_datatype_string(
            "doc_id bigint, text string, lang string, "
            "source string, n_chars bigint"
        ),
        "doc_id", num_buckets=8,
    )
    # two appends = two file generations per bucket (count must sum
    # across commits, not just the newest)
    table.append(docs.filter(F.col("doc_id") % 2 == 0))
    table.append(docs.filter(F.col("doc_id") % 2 == 1))
    c1 = table.count_rows(detail=True)
    assert c1["scanned_files"] == 0, c1
    info = table.delete_where([("n_chars", "<", 300)], strategy="dv")
    assert not info.get("skipped")
    c2 = table.count_rows(detail=True)
    assert c2["scanned_files"] == 0, c2
    assert c2["rows"] == c1["rows"] - info["matched_rows"]
    return spark.createDataFrame(
        [(int(c1["rows"]), int(c2["rows"]))],
        "n_before bigint, n_after bigint",
    )


ORACLE_METADATA_COUNT = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_before,
       CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_after
FROM documents
"""


def cdc_replay_rebucketed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout evolution mid-ingest under the hard oracle: replay the
    first half of the log into a 4-bucket table (a table sized for
    day-one data), ``rebucket(16)`` while outstanding MOR deltas exist,
    then land the remaining batches COW under the new layout. The
    final state must equal the plain serial replay bit-for-bit —
    rebucketing is content-preserving (LSNs, tombstones) and merges
    re-target the new buckets (concurrent-writer guard tested in
    tests/test_lake_rebucket.py)."""
    log = derive_log(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="dexspark_q_")
    table = LakeTable.create(
        spark, os.path.join(d, "transcripts"),
        _parse_datatype_string(PAYLOAD), "conv_id", num_buckets=4,
    )
    batches = batch_range(log)
    mid = (batches.start + batches.stop) // 2
    for b in batches:
        apply_changes(
            table, log.filter(F.col("batch_seq") == b),
            batch_id=f"rb{b}", strategy="mor" if b < mid else "cow",
        )
        if b == mid:
            info = table.rebucket(16)
            assert info["num_buckets"] == 16, info
    assert table.manifest().num_buckets == 16
    return table.read()


def cdc_rtbf_delete_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten under the hard oracle: purge ONE
    conversation by key from the replayed table. Strings carry no
    min/max stats, so this sweep is decided by the per-file key blooms
    (lake/bloom.py): bucket pruning narrows to one bucket, the bloom
    sidecars narrow to the files that may hold the key, and only those
    are rewritten (surgical commit — file counts machine-asserted in
    tests/test_lake_bloom.py). The oracle checks the surviving state
    is exactly the final state minus that conversation."""
    log = derive_log(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="dexspark_q_")
    table = LakeTable.create(
        spark, os.path.join(d, "transcripts"),
        _parse_datatype_string(PAYLOAD), "conv_id", num_buckets=16,
    )
    for b in batch_range(log):
        apply_changes(
            table, log.filter(F.col("batch_seq") == b), batch_id=f"rt{b}"
        )
    # purge the lexicographically-first live conversation — exists at
    # every SF (the fixed 'conv_42' only exists above ~sf0.01)
    victim = table.read().agg(F.min("conv_id")).first()[0]
    info = table.delete_where([("conv_id", "=", victim)])
    assert info["matched_rows"] > 0 and info["files_kept"] > 0, info
    return table.read()


ORACLE_RTBF_DELETE = f"""
WITH {LOG_CTE}, {FLAGGED_CTE},
latest AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM flagged WHERE reject_reason IS NULL
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM latest
WHERE rn = 1 AND op <> 'D'
  AND conv_id <> (
    SELECT min(conv_id) FROM latest WHERE rn = 1 AND op <> 'D'
  )
"""


def catalog_consistent_read_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table atomic catalog under the hard oracle
    (lake/catalog.py): replay the log into a transcript table while an
    aggregate view tracks it; after each joint refresh the catalog
    atomically pins BOTH tables in one commit. The mid-replay pin is
    then read back after both tables have advanced further — the view
    read through the pin must EXACTLY equal re-aggregating the
    transcripts read through the same pin (cross-table consistency: no
    table@new with view@old), and the pin must survive
    expire_snapshots(keep_last=1) via protected_versions. Returns the
    transcripts read through the catalog HEAD pin, so the whole
    catalog read path sits under the replay oracle."""
    from dexspark.lake.catalog import Catalog
    from dexspark.lake.matview import create_agg_view, refresh_agg_view

    log = derive_log(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="dexspark_q_")
    table = LakeTable.create(
        spark, os.path.join(d, "transcripts"),
        _parse_datatype_string(PAYLOAD), "conv_id", num_buckets=16,
    )
    group, sums = ["conv_id"], {"sum_len": "length(text)"}
    view = create_agg_view(
        spark, os.path.join(d, "rollup"), table, group, sums, num_buckets=8
    )
    cat = Catalog.create(
        spark, os.path.join(d, "cat"), {"transcripts": table, "rollup": view}
    )
    batches = batch_range(log)
    mid = (batches.start + batches.stop) // 2
    mid_pin = None
    for b in batches:
        apply_changes(table, log.filter(F.col("batch_seq") == b), batch_id=f"c{b}")
        if b in (batches.start, mid):
            refresh_agg_view(table, view, group, sums)
            cv = cat.commit({"transcripts": None, "rollup": None})
            if b == mid:
                mid_pin = cv
    refresh_agg_view(table, view, group, sums)
    cat.commit({"transcripts": None, "rollup": None})

    # consistency at the mid pin, long after both tables moved on:
    t_mid = cat.read("transcripts", version=mid_pin)
    v_mid = cat.read("rollup", version=mid_pin).select(
        "conv_id", "n_rows", "sum_len"
    )
    recomputed = t_mid.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length("text")).alias("sum_len"),
    )
    assert v_mid.exceptAll(recomputed).count() == 0
    assert recomputed.exceptAll(v_mid).count() == 0

    # the pin protects its snapshot from retention
    table.expire_snapshots(
        keep_last=1, keep_versions=cat.protected_versions("transcripts")
    )
    assert cat.read("transcripts", version=mid_pin).count() == t_mid.count()
    return cat.read("transcripts")
