"""Pipeline/routing family: the reference-shaped orchestration
surface — config-driven DAG pipelines and broadcast config-lookup
routing with fallback + error channels."""

from __future__ import annotations
import os
import tempfile
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import _parse_datatype_string
from dexspark.cdc.apply import apply_changes
from dexspark.lake.table import LakeTable

from dexspark.queries._common import (  # noqa: F401
    load,
)


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


def route_events_2key_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8 two-key route lookup (≙ FnRouter.kt:138-149): events carry a
    derived (type, version) pair; combos absent from the config go to
    the error channel, reported here as route='_unrouted'."""
    from dexspark.operators.routing import route_by_config_2key

    ev = load(spark, sf_dir, "events").withColumn(
        "message_version",
        F.concat(F.lit("v"), F.pmod(F.col("event_id"), 3).cast("string")),
    )
    routes = spark.createDataFrame(
        [
            ("click", "v0", "clicks-a"),
            ("click", "v1", "clicks-b"),
            ("view", "v0", "views"),
            ("view", "v1", "views"),
            ("view", "v2", "views"),
            ("purchase", "v0", "commerce"),
        ],
        "message_type string, message_version string, route string",
    )
    routed, unrouted = route_by_config_2key(
        ev, routes, type_col="event_type", version_col="message_version"
    )
    got = routed.groupBy("route").agg(F.count(F.lit(1)).alias("n_events"))
    err = unrouted.agg(F.count(F.lit(1)).alias("n_events")).select(
        F.lit("_unrouted").alias("route"), "n_events"
    )
    return got.unionByName(err)


ORACLE_ROUTE_2KEY = """
WITH r AS (
  SELECT CASE
    WHEN event_type = 'click' AND event_id % 3 = 0 THEN 'clicks-a'
    WHEN event_type = 'click' AND event_id % 3 = 1 THEN 'clicks-b'
    WHEN event_type = 'view' THEN 'views'
    WHEN event_type = 'purchase' AND event_id % 3 = 0 THEN 'commerce'
    ELSE '_unrouted' END AS route
  FROM events
)
SELECT route, count(*) AS n_events FROM r GROUP BY route
"""


def routed_sink_readback_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9 routed copy + O18 staged read-back: route the event stream,
    write it partitioned by route (provenance stamped, counts riding
    the write job), then consume ONE staged route — the read must
    partition-prune to that directory. Returns the consumed route's
    aggregate + the writer's notification counts as rows."""
    from dexspark.operators.routing import route_by_config, routes_df
    from dexspark.operators.sink import read_route, write_routed

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
    out = os.path.join(tempfile.mkdtemp(prefix="dexspark_q_"), "staged")
    counts = write_routed(
        routed, out, routes=["clickstream", "commerce", "accounts", "misc"]
    )
    staged = read_route(spark, out, "commerce")
    consumed = staged.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("event_id").alias("lo"),
        F.max("event_id").alias("hi"),
    ).select(F.lit("consumed:commerce").alias("k"), "n", "lo", "hi")
    notif = spark.createDataFrame(
        sorted((f"notified:{r}", int(n)) for r, n in counts.items()),
        "k string, n long",
    ).select("k", "n", F.lit(None).cast("long").alias("lo"), F.lit(None).cast("long").alias("hi"))
    return consumed.unionByName(notif)


ORACLE_SINK_READBACK = """
WITH r AS (
  SELECT event_id,
         CASE WHEN event_type IN ('click', 'view') THEN 'clickstream'
              WHEN event_type = 'purchase' THEN 'commerce'
              WHEN event_type = 'signup' THEN 'accounts'
              ELSE 'misc' END AS route
  FROM events
)
SELECT 'consumed:commerce' AS k, count(*) AS n,
       min(event_id) AS lo, max(event_id) AS hi
FROM r WHERE route = 'commerce'
UNION ALL
SELECT 'notified:' || route AS k, count(*) AS n,
       CAST(NULL AS BIGINT) AS lo, CAST(NULL AS BIGINT) AS hi
FROM r GROUP BY route
"""


def pipeline_doc_words_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Config-driven pipeline DAG (≙ FnOrchestrator, SURVEY §2
    O12-O14): gate short docs to the error channel, fan out one branch
    per word, reject over-long/empty words per-branch
    (fanInFailIfAnyFail=false: healthy siblings continue), fan in and
    aggregate per doc. Fan-out is a posexplode (no shuffle); the only
    shuffle is the final per-doc aggregate."""
    from dexspark.plans import CHILDREN_COL, Stage, Pipeline, init_lineage
    from dexspark.plans.pipeline import REASON_COL

    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")

    def gate(d):
        return d.withColumn(
            REASON_COL, F.when(F.col("n_chars") < 10, F.lit("too_short"))
        )

    def split_words(d):
        return d.withColumn(CHILDREN_COL, F.split(F.trim("text"), " "))

    def check_word(d):
        return d.withColumn(
            REASON_COL,
            F.when(F.length("_child") == 0, F.lit("empty_word")).when(
                F.length("_child") > 12, F.lit("too_long")
            ),
        )

    p = Pipeline(
        [
            Stage("gate", gate),
            Stage("split", split_words, fan_out_after=True),
            Stage("check", check_word),
            Stage("join", lambda d: d, fan_in_before=True, fan_in_fail_if_any_fail=False),
        ]
    )
    res = p.run(docs, exec_id_cols=["doc_id"])
    return res.output.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.length("_child")).alias("sum_wlen"),
    )


ORACLE_PIPELINE_WORDS = """
WITH words AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
  FROM documents WHERE n_chars >= 10
)
SELECT doc_id, COUNT(*) AS n_words, CAST(SUM(len(w)) AS BIGINT) AS sum_wlen
FROM words WHERE len(w) > 0 AND len(w) <= 12
GROUP BY doc_id
"""


def pipeline_config_doc_words_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O19 plan front end (≙ FnRouter.kt:120-126 Jackson parse +
    FnOrchestrator.kt:29-34): the SAME doc-words DAG as
    pipeline_doc_words, but built from an OrchestratorConfiguration-
    shaped JSON document through ``pipeline_from_config`` — so the
    parser, step ordering/contiguity checks, fan marker balancing, and
    registry resolution are all on the oracle-checked path."""
    import json

    from dexspark.plans import CHILDREN_COL
    from dexspark.plans.pipeline import REASON_COL, pipeline_from_config

    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")

    registry = {
        "gate": lambda d: d.withColumn(
            REASON_COL, F.when(F.col("n_chars") < 10, F.lit("too_short"))
        ),
        "split": lambda d: d.withColumn(CHILDREN_COL, F.split(F.trim("text"), " ")),
        "check": lambda d: d.withColumn(
            REASON_COL,
            F.when(F.length("_child") == 0, F.lit("empty_word")).when(
                F.length("_child") > 12, F.lit("too_long")
            ),
        ),
        "join": lambda d: d,
    }
    config = json.loads(
        """
        {"steps": [
          {"stepNumber": 1, "functionToRun": "gate"},
          {"stepNumber": 2, "functionToRun": "split", "fanOutAfter": true},
          {"stepNumber": 3, "functionToRun": "check"},
          {"stepNumber": 4, "functionToRun": "join", "fanInBefore": true,
           "fanInFailIfAnyFail": false}
        ]}
        """
    )
    p = pipeline_from_config(config, registry)
    res = p.run(docs, exec_id_cols=["doc_id"])
    return res.output.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.length("_child")).alias("sum_wlen"),
    )
