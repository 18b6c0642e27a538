"""Routing operators + routed sink (reference O5/O7/O8/O9/O18)."""

import pyspark.sql.functions as F

from dexspark.operators.routing import (
    DEFAULT_ROUTE,
    route_by_config,
    route_by_config_2key,
    routes_df,
    split_required_fields,
)
from dexspark.operators.sink import (
    PROVENANCE,
    PROVENANCE_COL,
    read_route,
    write_routed,
)

CONFIGS = [
    {"route": "csv", "message_types": ["DAART", "COVID-ELR"]},
    {"route": "hl7", "message_types": ["HL7-V2"]},
]


def _events(spark):
    return spark.createDataFrame(
        [
            (1, "DAART"),
            (2, "HL7-V2"),
            (3, "UNKNOWN-TYPE"),
            (4, "COVID-ELR"),
        ],
        "event_id int, message_type string",
    )


def test_route_with_fallback(spark):
    routed = route_by_config(_events(spark), routes_df(spark, CONFIGS))
    got = {r.event_id: r.route for r in routed.collect()}
    assert got == {1: "csv", 2: "hl7", 3: DEFAULT_ROUTE, 4: "csv"}


def test_route_is_broadcast_join(spark):
    routed = route_by_config(_events(spark), routes_df(spark, CONFIGS))
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_route_2key_error_channel(spark):
    routes = spark.createDataFrame(
        [("DAART", "1", "csv-v1")],
        "message_type string, message_version string, route string",
    )
    ev = spark.createDataFrame(
        [(1, "DAART", "1"), (2, "DAART", "9")],
        "event_id int, message_type string, message_version string",
    )
    routed, unrouted = route_by_config_2key(ev, routes)
    assert [r.event_id for r in routed.collect()] == [1]
    assert [r.event_id for r in unrouted.collect()] == [2]


def test_split_required_fields(spark):
    ev = spark.createDataFrame(
        [(1, "u"), (2, None)], "event_id int, url string"
    )
    ok, bad = split_required_fields(ev, ["url"])
    assert [r.event_id for r in ok.collect()] == [1]
    assert [(r.event_id, r.reject_reason) for r in bad.collect()] == [
        (2, "missing:url")
    ]


def test_write_routed_and_read_route(spark, tmp_table_dir):
    routed = route_by_config(_events(spark), routes_df(spark, CONFIGS))
    out = tmp_table_dir + "/staged"
    counts = write_routed(routed, out)
    assert counts == {"csv": 2, "hl7": 1, DEFAULT_ROUTE: 1}

    csv = read_route(spark, out, "csv")
    assert {r.event_id for r in csv.collect()} == {1, 4}
    # provenance stamped on every row (≙ system_provider metadata)
    assert {r[PROVENANCE_COL] for r in csv.collect()} == {PROVENANCE}
    # partition pruning: reading one route scans only that directory
    plan = csv._jdf.queryExecution().executedPlan().toString()
    assert "route=csv" in plan and "route=hl7" not in plan

    # append lands new files without clobbering existing routes
    more = route_by_config(
        spark.createDataFrame([(9, "HL7-V2")], "event_id int, message_type string"),
        routes_df(spark, CONFIGS),
    )
    write_routed(more, out)
    assert read_route(spark, out, "hl7").count() == 2
    assert read_route(spark, out, "csv").count() == 2


def test_write_routed_known_routes_single_pass(spark, tmp_table_dir):
    """With the route set supplied, counts ride the write job via
    Observation (no second computation of the upstream); unexpected
    route values are still written and surface as _other."""
    routed = route_by_config(_events(spark), routes_df(spark, CONFIGS))
    out = tmp_table_dir + "/staged1p"
    counts = write_routed(
        routed, out, routes=["csv", "hl7", DEFAULT_ROUTE, "unused"]
    )
    assert counts == {"csv": 2, "hl7": 1, DEFAULT_ROUTE: 1}  # unused omitted

    surprise = routed.withColumn(
        "route", F.when(F.col("event_id") == 1, "rogue").otherwise(F.col("route"))
    )
    counts2 = write_routed(surprise, out + "_b", routes=["csv", "hl7", DEFAULT_ROUTE])
    assert counts2["_other"] == 1 and counts2["csv"] == 1
    # rogue rows are written, not dropped
    assert read_route(spark, out + "_b", "rogue").count() == 1


def test_write_routed_null_routes_discovery(spark, tmp_table_dir):
    """ADVICE r2: NULL in the route column must not crash route
    discovery (None is unsortable against str); NULL-routed rows are
    written and reported under _other."""
    df = spark.createDataFrame(
        [(1, "csv"), (2, None), (3, "hl7"), (4, None)],
        "event_id int, route string",
    )
    out = tmp_table_dir + "_nullroutes"
    counts = write_routed(df, out)
    assert counts["csv"] == 1 and counts["hl7"] == 1
    assert counts["_other"] == 2
    # NULL-routed rows land under the null partition, still readable
    total = spark.read.option("basePath", out).parquet(out).count()
    assert total == 4
