"""Metadata-only COUNT (LakeTable.count_rows).

Invariants:
1. append-only tables answer from the manifest alone (zero files
   scanned) and match read().count() exactly;
2. deletion vectors subtract exactly (vectors only mark live rows);
3. tombstone-carrying files are detected via the footer proof and
   scanned — never trusted;
4. MOR delta buckets always scan (resolve collapses keys);
5. pre-upgrade manifests (no recorded row counts) degrade to a scan,
   never a wrong answer.
"""

import json
import os

import pyspark.sql.functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from dexspark.lake import manifest as mf
from dexspark.lake.table import LakeTable

SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("seq", LongType()),
        StructField("v", StringType()),
    ]
)

CH_SCHEMA = StructType(
    list(SCHEMA.fields)
    + [StructField("op", StringType()), StructField("lsn", LongType())]
)


def _mk(spark, d, n=100):
    t = LakeTable.create(spark, d, SCHEMA, bucket_key="k", num_buckets=2)
    rows = [(f"k{i}", i, f"v{i}") for i in range(n)]
    t.append(spark.createDataFrame(rows[: n // 2], SCHEMA))
    t.append(spark.createDataFrame(rows[n // 2 :], SCHEMA))
    return t


def test_append_only_counts_from_metadata(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    c = t.count_rows(detail=True)
    assert c == {"rows": 100, "metadata_files": 4, "scanned_files": 0}
    assert t.count_rows() == t.read().count() == 100


def test_dv_delete_stays_metadata_only(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.delete_where([("seq", "<", 10)], strategy="dv")
    c = t.count_rows(detail=True)
    assert c["scanned_files"] == 0 and c["rows"] == 90
    assert t.read().count() == 90


def test_tombstones_force_a_scan_and_stay_exact(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    d = spark.createDataFrame(
        [("k5", 5, "v5", "D", 1000), ("k7", 7, "v7", "D", 1001)], CH_SCHEMA
    )
    t.merge(d, key_cols=["k"])  # COW: tombstones land in base files
    c = t.count_rows(detail=True)
    assert c["scanned_files"] > 0
    assert c["rows"] == t.read().count() == 98
    # compaction keeps tombstones -> the affected buckets still scan,
    # untouched buckets stay metadata-answered
    t.compact(min_files_per_bucket=1)
    c2 = t.count_rows(detail=True)
    assert c2["rows"] == 98


def test_mor_deltas_force_a_scan_and_stay_exact(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    ch = spark.createDataFrame(
        [("k5", 500, "UPD", "U", 1000), ("knew", 1, "NEW", "I", 1001)],
        CH_SCHEMA,
    )
    t.merge(ch, key_cols=["k"], strategy="mor")
    c = t.count_rows(detail=True)
    assert c["scanned_files"] > 0
    assert c["rows"] == t.read().count() == 101


def test_pre_upgrade_manifest_degrades_to_scan(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    # strip the recorded row counts from the current manifest, as a
    # manifest written before this feature would look
    v = t.current_version()
    p = mf.manifest_path(t.table_dir, v)
    with open(p) as fh:
        d = json.load(fh)
    for f in d["files"]:
        f.pop("rows", None)
    os.remove(p)
    with open(p, "w") as fh:
        json.dump(d, fh)
    c = t.count_rows(detail=True)
    assert c["metadata_files"] == 0 and c["scanned_files"] == 4
    assert c["rows"] == 100


def test_time_travel_counts(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    v = t.current_version()
    t.append(spark.createDataFrame([("x", 1000, "x")], SCHEMA))
    assert t.count_rows() == 101
    assert t.count_rows(version=v) == 100
