"""maintain() — one-call metadata-driven maintenance policy.

Invariants:
1. triggers fire per bucket from the MANIFEST alone (file count, MOR
   delta depth, deletion-vector ratio, stale schema) and only
   triggered buckets rewrite — untouched buckets' paths carry over;
2. the visible state is unchanged by any maintenance pass;
3. expire/vacuum steps run only when asked;
4. the CLI subcommand wires the same policy.
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

from dexspark.__main__ import main
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


def test_maintain_triggers_and_scoped_rewrite(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, bucket_key="k", num_buckets=4
    )
    # fragment every bucket with 5 appends -> "files" trigger at >=4
    for c in range(5):
        t.append(
            spark.createDataFrame(
                [(f"k{i}", i + 1000 * c, f"v{c}") for i in range(40)], SCHEMA
            )
        )
    pre_state = t.read().orderBy("k", "seq").collect()
    res = t.maintain(compact_min_files=4)
    assert res["buckets_triggered"] and all(
        "files" in why for why in res["buckets_triggered"].values()
    )
    assert t.read().orderBy("k", "seq").collect() == pre_state
    m = t.manifest()
    assert all(
        sum(1 for f in m.files if f.bucket == b) == 1
        for b in range(4)
    )
    # second pass: nothing degraded, nothing triggered, no commit
    v = t.current_version()
    res2 = t.maintain(compact_min_files=4)
    assert not res2["buckets_triggered"] and "compact" not in res2
    assert t.current_version() == v


def test_maintain_delta_and_dv_triggers(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, bucket_key="k", num_buckets=2
    )
    t.append(
        spark.createDataFrame(
            [(f"k{i}", i, "v") for i in range(100)], SCHEMA
        )
    )
    # dv-delete a slice first (marks rows in both buckets), THEN pile
    # MOR deltas onto whatever bucket holds k1 — a dv delete with
    # outstanding deltas would fold them itself (tested in
    # test_lake_dv.py), which is not the policy path under test here
    t.delete_where([("seq", ">=", 90)], strategy="dv")
    for n in range(3):
        ch = spark.createDataFrame(
            [("k1", 1, f"u{n}", "U", 1000 + n)], CH_SCHEMA
        )
        t.merge(ch, key_cols=["k"], strategy="mor")
    res = t.maintain(
        compact_min_files=99, compact_delta_depth=3, compact_dv_ratio=0.01
    )
    whys = {w for ws in res["buckets_triggered"].values() for w in ws}
    assert "delta_depth" in whys and "dv_ratio" in whys
    m = t.manifest()
    assert not any(f.kind == "delta" for f in m.files)
    assert not any(f.dv for f in m.files)
    assert sorted(r.seq for r in t.read().collect()) == [
        s for s in range(90)
    ]


def test_maintain_expire_and_vacuum_steps(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, bucket_key="k", num_buckets=2
    )
    for c in range(3):
        t.append(
            spark.createDataFrame([(f"k{c}", c, "v")], SCHEMA)
        )
    res = t.maintain(
        compact_min_files=99, expire_keep_last=1, vacuum_grace_seconds=3600
    )
    assert res["expire"]["expired_versions"]
    assert res["vacuum"]["removed_files"] == 0
    assert t.read().count() == 3
    res2 = t.maintain(compact_min_files=99)
    assert "expire" not in res2 and "vacuum" not in res2


def test_cli_maintain(spark, tmp_table_dir, capsys):
    d = os.path.join(tmp_table_dir, "t")
    t = LakeTable.create(spark, d, SCHEMA, bucket_key="k", num_buckets=2)
    for c in range(4):
        t.append(
            spark.createDataFrame(
                [(f"k{i}", i + 100 * c, "v") for i in range(10)], SCHEMA
            )
        )
    rc = main(
        ["maintain", "--table", d, "--compact-min-files", "4",
         "--expire-keep-last", "2"]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["buckets_triggered"]
    assert out["compact"]["affected_buckets"]
    assert out["expire"]["expired_versions"]
    assert LakeTable(spark, d).read().count() == 40


def test_maintain_keeps_secondary_blooms_current(spark, tmp_table_dir):
    """VERDICT r4 #6: build_blooms(column) marks the column as indexed
    (table property), new files land uncovered, and maintain()'s
    uncovered-file trigger rebuilds coverage automatically — a
    post-index ingest regains point-predicate pruning with no manual
    re-run. bloom_coverage() feeds the trigger and the status CLI."""
    from pyspark.sql.types import _parse_datatype_string

    from dexspark.lake.table import LakeTable

    sch = _parse_datatype_string("k string, author string, v long")
    t = LakeTable.create(
        spark, tmp_table_dir, sch, bucket_key="k", num_buckets=2
    )
    for c in range(2):
        t.append(
            spark.createDataFrame(
                [(f"k{c}_{i}", f"author{c}", i) for i in range(40)], sch
            )
        )
    t.build_blooms("author")
    assert t.bloom_indexed_columns() == ["author"]
    assert t.bloom_coverage() == {"author": {"covered": 4, "uncovered": 0}}

    # post-index ingest: new files land uncovered
    t.append(
        spark.createDataFrame(
            [(f"k9_{i}", "author9", i) for i in range(40)], sch
        )
    )
    cov = t.bloom_coverage()["author"]
    assert cov["uncovered"] == 2 and cov["covered"] == 4

    # the policy run regains full coverage without a manual rebuild
    info = t.maintain(compact_min_files=99, bloom_uncovered_files=1)
    assert info["blooms"]["author"]["files_indexed"] == 2
    assert t.bloom_coverage() == {"author": {"covered": 6, "uncovered": 0}}
    # ...and the new author's point lookup actually prunes
    m = t.manifest()
    kept = [
        f for f in m.files
        if t._bloom_keep(f, [], [("author", "=", "author9")])
    ]
    assert len(kept) == 2
    assert t.read(filters=[("author", "=", "author9")]).count() == 40

    # below-threshold coverage holes do NOT trigger (bounded churn)
    t.append(
        spark.createDataFrame(
            [(f"kA_{i}", "authorA", i) for i in range(40)], sch
        )
    )
    info = t.maintain(compact_min_files=99, bloom_uncovered_files=5)
    assert "blooms" not in info
    # disabled policy never rebuilds
    info = t.maintain(compact_min_files=99, bloom_uncovered_files=None)
    assert "blooms" not in info
