"""Driver contract for the spark-graft builder (PySpark target).

entry()    — flagship CDC replay on sf0.001
queries()  — implemented operators (SURVEY.md §2 + pipeline functions)
oracle_sql() — exact DuckDB equivalents (see dexspark/queries/ for
the cross-engine determinism rules; the registry in its __init__
preserves the driver-window order)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dexspark.queries import QUERIES, cdc_replay_final_state  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC replay (validate → dedup → COW merge) of a
    change log derived from sf0.001 events into a fresh LakeTable."""
    return cdc_replay_final_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
