"""Routed sink: write events to per-route staged destinations.

≙ reference O9 routed copy + O18 staged destination topology:
the router streams each blob to ``routedfiles/data/{csv,hl7,misc}/
staged`` with provenance stamped into blob metadata
(RouteIngestedFile.kt:57-75, ``system_provider="DEX-ROUTING"`` at
:72-73), and Event Grid prefix filters fan the staged prefixes out to
per-route topics (eventgridsystemtopic/dex-rs-file-ingested/
template.json:48,77,106).

Spark-native: one ``partitionBy(route)`` parquet write replaces the
per-record copy loop — the directory layout *is* the topic fan-out
(downstream consumers subscribe to ``route=<r>/``), and provenance is
a column, not a metadata sidecar. Dynamic partition write with
in-partition sort so each task streams one route file at a time; at
100 TB you repartition on (route, salt) to bound file count per route
while keeping writes parallel.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

PROVENANCE_COL = "routed_by"
PROVENANCE = "dexspark-routing"  # ≙ system_provider="DEX-ROUTING"


def write_routed(
    df: DataFrame,
    out_dir: str,
    route_col: str = "route",
    mode: str = "append",
    files_per_route: int = 1,
    routes: list[str] | None = None,
) -> dict[str, Any]:
    """Write ``df`` partitioned by route with provenance stamped.

    Returns {route: row_count} (the counts double as the "ingested"
    notification the reference publishes per topic). Pass the known
    route set (the router's config always has it) so the counts ride
    the write job via ``Observation`` — ONE computation of the
    upstream per sink call. Without ``routes`` a column-pruned
    ``distinct`` discovers them first (moves only the route column,
    never the payload). Rows with a route outside ``routes`` are still
    written and reported under ``"_other"``."""
    if routes is None:
        # NULL routes must not join the sort (None < str raises); they
        # fall out of the observed per-route counts and surface under
        # "_other" via the _total delta below.
        routes = sorted(
            r[0]
            for r in df.select(route_col).distinct().collect()
            if r[0] is not None
        )
    obs = Observation()
    stamped = df.withColumn(PROVENANCE_COL, F.lit(PROVENANCE)).observe(
        obs,
        F.count(F.lit(1)).alias("_total"),
        *[
            F.count(F.when(F.col(route_col) == r, 1)).alias(f"_r{i}")
            for i, r in enumerate(routes)
        ],
    )
    n_routes = max(1, len(routes))
    (
        stamped.repartition(n_routes * files_per_route, F.col(route_col))
        .sortWithinPartitions(route_col)
        .write.partitionBy(route_col)
        .mode(mode)
        .parquet(out_dir)
    )
    try:
        m = obs.get
    except Exception:
        # an empty input writes zero rows through zero tasks, so the
        # metrics node never fires and the observation has no row
        return {}
    counts = {
        r: int(m[f"_r{i}"]) for i, r in enumerate(routes) if int(m[f"_r{i}"])
    }
    other = int(m["_total"]) - sum(counts.values())
    if other:
        counts["_other"] = other
    return counts


def read_route(
    spark: SparkSession, out_dir: str, route: str
) -> DataFrame:
    """Consume one staged route (≙ a Service Bus topic subscription):
    partition pruning makes this an O(route) read, not O(sink)."""
    return (
        spark.read.option("basePath", out_dir)
        .parquet(os.path.join(out_dir, f"route={route}"))
    )
