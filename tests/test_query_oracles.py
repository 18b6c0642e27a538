"""Driver-contract parity: run a representative subset of queries()
against their DuckDB oracle_sql() at sf0.001 and compare row counts,
column names, and order-insensitive values — the same check the driver
applies at sf0.01. (tools/check_oracles.py runs the full set.)"""

from __future__ import annotations

import os
from decimal import Decimal

import duckdb
import pytest

from dexspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

SUBSET = [
    "doc_quality_scores",
    "doc_lang_id",
    "doc_near_dup_pairs",
    "doc_fingerprint_groups",
    "emb_cosine_topk",
    "emb_ann_lsh_topk",
    "media_feature_stats",
    "cdc_schema_evolution_replay",
    # round-2 surfaces
    "doc_simhash_near_dups",
    "cdc_stream_replay_final_state",
    "conv_progress_stateful",
    "doc_gzip_unpack_roundtrip",
    "q1_pricing_summary",
    # round-3 surfaces
    "cdc_quarantine_reprocess",
    "cdc_config_hot_reload",
    "stream_window_late_data",
    "stream_session_windows",
    "cdc_replay_mor",
    "cdc_feed_mirror",
    "cdc_validate_ts_monotonic",
    # round-4 surfaces
    "stream_sliding_window",
    "stream_interval_join",
    "stream_interval_join_outer",
    "stream_dedup_deliveries",
    "emb_ann_multiband_topk",
    "lake_stats_pruned_scan",
    "cdc_replay_concurrent_maintenance",
    # TPC-H sweep completion (all 22 shapes now covered)
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q12_priority_class",
    "q15_top_supplier",
    "q20_dominant_suppliers",
    "q21_waiting_supplier",
    "cdc_routed_fanout",
]


def canon(v):
    """Type-tagged so heterogenous columns (e.g. nullable strings)
    stay sortable; mirrors tools/check_oracles.canon."""
    if v is None:
        return ("n", "")
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        return ("f", round(v, 9))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, (list, tuple)):
        return ("a", tuple(canon(x) for x in v))
    return ("o", type(v).__name__, str(v))


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata not present")
    fn, sql = QUERIES[name]
    sdf = fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = sdf.collect()
    res = duck.sql(sql)
    duck_cols = list(res.columns)
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols)
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_vals = sorted(tuple(canon(r[i]) for i in s_idx) for r in spark_rows)
    d_vals = sorted(tuple(canon(r[i]) for i in d_idx) for r in duck_rows)
    assert len(s_vals) == len(d_vals), f"{name}: {len(s_vals)} vs {len(d_vals)}"
    mismatches = [(s, d) for s, d in zip(s_vals, d_vals) if s != d]
    assert not mismatches, f"{name}: first diff {mismatches[0]}"
