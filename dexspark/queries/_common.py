"""Shared query infrastructure: table loaders, the synthetic
change-log derivation (and its exact DuckDB CTE mirrors), batch
helpers, and every oracle fragment used by more than one family.
Split out of the former single-module queries.py (round 5); the
registry in __init__.py preserves the driver-window order."""

from __future__ import annotations
import os
import tempfile
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import _parse_datatype_string
from dexspark.cdc.apply import apply_changes
from dexspark.lake.table import LakeTable


PAYLOAD = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


BATCH = 2500  # events per replay batch in the derived log


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def batch_range(log: DataFrame) -> range:
    """Batch ids to replay. batch_seq = lsn div BATCH over dense lsns,
    so the id space is contiguous — one column-pruned min/max aggregate
    (often satisfied from parquet footer stats) replaces a
    distinct+collect full scan before replay even starts."""
    r = log.agg(
        F.min("batch_seq").alias("lo"), F.max("batch_seq").alias("hi")
    ).first()
    return range(int(r["lo"]), int(r["hi"]) + 1)


def derive_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    lsn = F.col("event_id")
    conv = F.pmod(F.col("user_id"), F.lit(200))
    turn = F.pmod(lsn, F.lit(16)).cast("int")
    op = (
        F.when(F.col("event_type") == "error", "D")
        .when(F.col("event_type").isin("view", "purchase"), "U")
        .otherwise("I")
    )
    role = (
        F.when(F.pmod(lsn, 37) == 0, "alien")  # injected invalid
        .when(F.pmod(turn, 7) == 6, "tool")
        .when(F.pmod(turn, 2) == 0, "user")
        .otherwise("assistant")
    )
    tool = F.when(
        role == "tool", F.concat(F.lit("tool_"), F.pmod(lsn, 5).cast("string"))
    )
    text = F.when(
        F.pmod(lsn, 41) == 0, F.lit(None).cast("string")  # injected invalid
    ).otherwise(
        F.concat(
            F.lit("c"), conv.cast("string"),
            F.lit(" t"), turn.cast("string"),
            F.lit(" rev"), lsn.cast("string"),
        )
    )
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit("2024-01-01 00:00:00").cast("timestamp"))
        + turn.cast("long") * 60
    )
    return ev.select(
        lsn.alias("lsn"),
        op.alias("op"),
        F.expr(f"event_id div {BATCH}").alias("batch_seq"),
        F.concat(F.lit("conv_"), conv.cast("string")).alias("conv_id"),
        turn.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


# Exact SQL mirror of derive_log for DuckDB (views are pre-registered).
LOG_CTE = f"""
log AS (
  SELECT
    event_id AS lsn,
    CASE WHEN event_type = 'error' THEN 'D'
         WHEN event_type IN ('view', 'purchase') THEN 'U'
         ELSE 'I' END AS op,
    event_id // {BATCH} AS batch_seq,
    'conv_' || CAST(user_id % 200 AS VARCHAR) AS conv_id,
    CAST(event_id % 16 AS INTEGER) AS turn_idx,
    CASE WHEN event_id % 37 = 0 THEN 'alien'
         WHEN (event_id % 16) % 7 = 6 THEN 'tool'
         WHEN (event_id % 16) % 2 = 0 THEN 'user'
         ELSE 'assistant' END AS role,
    CASE WHEN event_id % 41 = 0 THEN NULL
         ELSE 'c' || CAST(user_id % 200 AS VARCHAR)
              || ' t' || CAST(event_id % 16 AS VARCHAR)
              || ' rev' || CAST(event_id AS VARCHAR) END AS text,
    CASE WHEN event_id % 37 <> 0 AND (event_id % 16) % 7 = 6
         THEN 'tool_' || CAST(event_id % 5 AS VARCHAR) END AS tool,
    TIMESTAMP '2024-01-01 00:00:00'
      + INTERVAL (CAST(event_id % 16 AS INTEGER) * 60) SECOND AS ts
  FROM events
)"""


# validator reason chain, mirrored (order matters; deletes skip payload checks)
REASON_SQL = """
  CASE WHEN op = 'D' THEN NULL
       WHEN role NOT IN ('user', 'assistant', 'system', 'tool') THEN 'bad_role'
       WHEN role = 'tool' AND (tool IS NULL OR trim(tool) = '') THEN 'missing_tool'
       WHEN text IS NULL OR trim(text) = '' THEN 'malformed_text'
       END"""


FLAGGED_CTE = f"flagged AS (SELECT *, {REASON_SQL} AS reject_reason FROM log)"


ORACLE_REPLAY = f"""
WITH {LOG_CTE}, {FLAGGED_CTE},
latest AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM flagged WHERE reject_reason IS NULL
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM latest WHERE rn = 1 AND op <> 'D'
"""


def _replay_with_midpoint(spark: SparkSession, sf_dir: str):
    """Shared setup: full replay, returning (table, v_mid) where v_mid
    is the committed version right after the first half of the log."""
    log = derive_log(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="dexspark_q_")
    table = LakeTable.create(
        spark, os.path.join(d, "transcripts"),
        _parse_datatype_string(PAYLOAD), "conv_id", num_buckets=16,
    )
    batches = batch_range(log)
    thr = (batches.stop + 1) // 2
    v_mid = None
    for b in batches:
        apply_changes(table, log.filter(F.col("batch_seq") == b), batch_id=f"t{b}")
        if b == thr - 1:
            v_mid = table.current_version()
    return table, v_mid


# state after batches < thr only, where thr = (max_batch + 2) // 2
_MID_LATEST = """
latest AS (
  SELECT f.*, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM flagged f, thr WHERE reject_reason IS NULL AND batch_seq < thr.t
)"""


_WIN_BASE_EPOCH = 1704067200  # 2024-01-01 00:00:00 UTC


# mirrors lang_id's argmax-with-tie-break: max score wins; ties go to
# the lexicographically largest language code (Spark struct max).
_MARK = {
    "en": "'the','and','is','of','to','it','in','that'",
    "fr": "'le','la','les','et','est','un','une','des'",
    "de": "'der','die','das','und','ist','ein','nicht','mit'",
    "es": "'el','la','los','es','un','una','que','y'",
    "zh": "'的','是','了','在','我','有','和','不'",
}


_SCORES = ", ".join(
    f"len(list_intersect(toks, [{v}])) AS s_{k}" for k, v in _MARK.items()
)


ORACLE_LANG = f"""
WITH t AS (
  SELECT doc_id,
         list_transform(string_split(trim(text), ' '), x -> lower(x)) AS toks
  FROM documents
), s AS (
  SELECT doc_id, {_SCORES},
         greatest(s_en, s_fr, s_de, s_es, s_zh) AS best
  FROM t
)
SELECT doc_id,
  CASE WHEN best = 0 THEN 'und'
       WHEN s_zh = best THEN 'zh'
       WHEN s_fr = best THEN 'fr'
       WHEN s_es = best THEN 'es'
       WHEN s_en = best THEN 'en'
       ELSE 'de' END AS lang_pred
FROM s
"""
