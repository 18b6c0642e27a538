"""Config-driven routing operators.

≙ reference ingestion router:

- O7 single-key route lookup with "?" fallback
  (RouteIngestedFile.kt:44-55, fileconfigs.json:17-22): a broadcast
  hash join against a small route table + ``coalesce`` to the default
  route. The reference scans a JSON list per record
  (``firstOrNull { it.messageTypes.contains(t) }``); here the config is
  exploded once into (key → route) rows and the per-record work is a
  broadcast-hash probe inside whole-stage codegen.
- O8 two-key route lookup with error channel (FnRouter.kt:138-149):
  equi-join on (type, version); unmatched rows go to the rejects side
  instead of a null route.
- O5 required-field gate (FnRouter.kt:80-84): null-check split with
  reasons, same quarantine-channel shape as cdc.validate.

All pure DataFrame ops — Catalyst broadcasts the config side
(explicitly hinted) so routing adds no shuffle to the event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

ROUTE_COL = "route"
DEFAULT_ROUTE = "misc"  # ≙ FileType "?" fallback, fileconfigs.json:17-22


def routes_df(
    spark: SparkSession, configs: list[dict], key_field: str = "message_types"
) -> DataFrame:
    """Build a (key, route) lookup DataFrame from reference-shaped route
    configs: [{"route": "csv", "message_types": ["a", "b"]}, ...]."""
    rows = [
        (mt, c["route"]) for c in configs for mt in c[key_field]
    ]
    return spark.createDataFrame(rows, "message_type string, route string")


def route_by_config(
    events: DataFrame,
    routes: DataFrame,
    type_col: str = "message_type",
    default_route: str = DEFAULT_ROUTE,
) -> DataFrame:
    """O7: stamp each event with its route; unknown types fall back to
    ``default_route``. Broadcast join — the event stream is never
    shuffled."""
    r = F.broadcast(routes.withColumnRenamed("message_type", type_col))
    return events.join(r, on=type_col, how="left").withColumn(
        ROUTE_COL, F.coalesce(F.col(ROUTE_COL), F.lit(default_route))
    )


def route_by_config_2key(
    events: DataFrame,
    routes: DataFrame,
    type_col: str = "message_type",
    version_col: str = "message_version",
) -> tuple[DataFrame, DataFrame]:
    """O8: (routed, unrouted) on a two-key equi match. ``routes`` must
    have (message_type, message_version, route)."""
    r = F.broadcast(
        routes.withColumnRenamed("message_type", type_col).withColumnRenamed(
            "message_version", version_col
        )
    )
    joined = events.join(r, on=[type_col, version_col], how="left")
    routed = joined.filter(F.col(ROUTE_COL).isNotNull())
    unrouted = joined.filter(F.col(ROUTE_COL).isNull()).drop(ROUTE_COL)
    return routed, unrouted


def split_required_fields(
    events: DataFrame, required: list[str], reason_col: str = "reject_reason"
) -> tuple[DataFrame, DataFrame]:
    """O5: (valid, rejects) on null required fields, with the first
    missing field named in the reason (≙ FnRouter.kt:80-84 error
    messages)."""
    reason = F.lit(None).cast("string")
    for c in reversed(required):
        reason = F.when(F.col(c).isNull(), F.lit(f"missing:{c}")).otherwise(reason)
    flagged = events.withColumn(reason_col, reason)
    return (
        flagged.filter(F.col(reason_col).isNull()).drop(reason_col),
        flagged.filter(F.col(reason_col).isNotNull()),
    )
