"""Driver-contract queries: each engine query paired with an exact
DuckDB oracle over the same parquet tables.

Design rules for cross-engine determinism (the driver hash-compares
values):

- The CDC log is DERIVED from the ``events`` parquet table using
  arithmetic/CASE only (no xxhash64 — DuckDB can't reproduce it).
- Injected invalids are deterministic (lsn % 37 → bad role, lsn % 41
  → null text) so the oracle can mirror the validator's reason chain.
- ts is a pure function of turn_idx → monotone per conversation, so
  the ts-monotonicity stage never fires here (it is exercised by
  pytest instead, where the oracle is Spark-side).
- Money/quantity aggregates are cast to DECIMAL before SUM so results
  are exact and order-independent in both engines.
- No float sums anywhere; ratios are returned as (num, den) integer
  pairs.
"""

from __future__ import annotations

import os
import tempfile

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


# --------------------------------------------------------------------------
# canonical CDC log derivation (Spark side)
# --------------------------------------------------------------------------

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


# --------------------------------------------------------------------------
# CDC queries
# --------------------------------------------------------------------------

def cdc_replay_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full engine replay (validate → dedup → COW merge per
    batch) of the derived log into a fresh LakeTable; returns the final
    table state."""
    log = derive_log(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="dexspark_q_")
    table = LakeTable.create(
        spark, os.path.join(d, "transcripts"),
        _parse_datatype_string(PAYLOAD), "conv_id", num_buckets=16,
    )
    batches = sorted(
        r.batch_seq for r in log.select("batch_seq").distinct().collect()
    )
    for b in batches:
        apply_changes(
            table, log.filter(F.col("batch_seq") == b), batch_id=f"b{b}"
        )
    return table.read()


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


def cdc_dedup_latest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dexspark.cdc.dedup import dedupe_latest

    log = derive_log(spark, sf_dir).drop("batch_seq")
    return dedupe_latest(log, ["conv_id", "turn_idx"], salt_buckets=4)


ORACLE_DEDUP = f"""
WITH {LOG_CTE},
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM log
)
SELECT lsn, op, conv_id, turn_idx, role, text, tool, ts FROM r WHERE rn = 1
"""


def cdc_validate_rejects_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dexspark.cdc.validate import REASON_COL, validate_events

    log = derive_log(spark, sf_dir)
    _, rejects = validate_events(log)
    return (
        rejects.groupBy(F.col(REASON_COL).alias("reject_reason"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLE_REJECTS = f"""
WITH {LOG_CTE}, {FLAGGED_CTE}
SELECT reject_reason, count(*) AS n FROM flagged
WHERE reject_reason IS NOT NULL GROUP BY reject_reason
"""


def cdc_lineage_batches_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch lineage after a real replay: applied (post-dedup) rows,
    rejected rows, lsn range — read back from the committed manifest
    summaries (the metrics table), not recomputed from the log."""
    log = derive_log(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="dexspark_q_")
    table = LakeTable.create(
        spark, os.path.join(d, "transcripts"),
        _parse_datatype_string(PAYLOAD), "conv_id", num_buckets=16,
    )
    batches = sorted(
        r.batch_seq for r in log.select("batch_seq").distinct().collect()
    )
    for b in batches:
        apply_changes(table, log.filter(F.col("batch_seq") == b), batch_id=f"b{b}")
    return (
        table.lineage_df()
        .groupBy("batch_id")
        .agg(
            F.sum("applied").alias("applied"),
            F.min("start_lsn").alias("start_lsn"),
            F.max("end_lsn").alias("end_lsn"),
        )
    )


ORACLE_LINEAGE = f"""
WITH {LOG_CTE}, {FLAGGED_CTE},
ded AS (
  SELECT *, row_number() OVER (
    PARTITION BY batch_seq, conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM flagged WHERE reject_reason IS NULL
)
SELECT 'b' || CAST(batch_seq AS VARCHAR) AS batch_id,
       count(*) AS applied, min(lsn) AS start_lsn, max(lsn) AS end_lsn
FROM ded WHERE rn = 1 GROUP BY batch_seq
"""


def route_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7 route lookup with fallback over the events stream (broadcast
    join; 'error' has no config entry → falls back to 'misc')."""
    from dexspark.operators.routing import route_by_config, routes_df

    ev = load(spark, sf_dir, "events")
    routes = routes_df(
        spark,
        [
            {"route": "clickstream", "message_types": ["click", "view"]},
            {"route": "commerce", "message_types": ["purchase"]},
            {"route": "accounts", "message_types": ["signup"]},
        ],
    )
    routed = route_by_config(ev, routes, type_col="event_type")
    return routed.groupBy("route").agg(F.count(F.lit(1)).alias("n_events"))


ORACLE_ROUTE = """
SELECT CASE WHEN event_type IN ('click', 'view') THEN 'clickstream'
            WHEN event_type = 'purchase' THEN 'commerce'
            WHEN event_type = 'signup' THEN 'accounts'
            ELSE 'misc' END AS route,
       count(*) AS n_events
FROM events GROUP BY 1
"""


# --------------------------------------------------------------------------
# relational coverage (TPC-H-style; exact DECIMAL aggregates)
# --------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).alias("sum_qty"),
            F.sum(dec("l_extendedprice")).alias("sum_base_price"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
                .cast("decimal(28,4)")
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_Q1 = """
SELECT l_returnflag, l_linestatus,
  sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
  sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
  sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      AS DECIMAL(28,4))) AS sum_disc_price,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_revenue_by_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load(spark, sf_dir, "customer")
    od = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        cu.filter(F.col("c_mktsegment") == "BUILDING")
        .join(od, cu.c_custkey == od.o_custkey)
        .join(li, od.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
                .cast("decimal(28,4)")
            ).alias("revenue")
        )
    )


ORACLE_Q3 = """
SELECT o_orderkey, o_orderdate,
  sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      AS DECIMAL(28,4))) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate
"""


def q5_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume per nation through a 5-way join (customer→orders→lineitem
    →supplier→nation); dims broadcast."""
    cu = load(spark, sf_dir, "customer")
    od = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
                .cast("decimal(28,4)")
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_Q5 = """
SELECT n_name,
  sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      AS DECIMAL(28,4))) AS revenue,
  count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# documents: text analysis + dedup
# --------------------------------------------------------------------------

def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dexspark.functions.text import token_count

    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        token_count(F.col("text")).alias("n_tokens"),
    )


ORACLE_TOKENS = """
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
FROM documents
"""


def doc_exact_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dexspark.functions.dedup import exact_dedup

    docs = load(spark, sf_dir, "documents")
    kept = exact_dedup(docs, text_col="text", id_col="doc_id")
    return kept.select("doc_id", "n_copies")


ORACLE_EXACT_DEDUP = """
SELECT min(doc_id) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY text
"""


QUERIES: dict[str, tuple] = {
    "cdc_replay_final_state": (cdc_replay_final_state, ORACLE_REPLAY),
    "cdc_dedup_latest": (cdc_dedup_latest_q, ORACLE_DEDUP),
    "cdc_validate_rejects": (cdc_validate_rejects_q, ORACLE_REJECTS),
    "cdc_lineage_batches": (cdc_lineage_batches_q, ORACLE_LINEAGE),
    "route_events": (route_events_q, ORACLE_ROUTE),
    "q1_pricing_summary": (q1_pricing_summary, ORACLE_Q1),
    "q3_revenue_by_order": (q3_revenue_by_order, ORACLE_Q3),
    "q5_nation_volume": (q5_nation_volume, ORACLE_Q5),
    "doc_token_stats": (doc_token_stats, ORACLE_TOKENS),
    "doc_exact_dedup": (doc_exact_dedup_q, ORACLE_EXACT_DEDUP),
}
