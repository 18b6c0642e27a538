"""Change-feed reader: snapshot diff → I/U/D events, and the roundtrip
invariant (applying the feed to the old snapshot reproduces the new)."""

from pyspark.sql import functions as F
from pyspark.sql.types import _parse_datatype_string

from dexspark.lake.changes import table_changes
from dexspark.lake.table import LakeTable

SCHEMA_DDL = "k string, seq int, v string"


def _table(spark, d):
    t = LakeTable.create(
        spark, d, _parse_datatype_string(SCHEMA_DDL), bucket_key="k", num_buckets=4
    )
    t.append(
        spark.createDataFrame(
            [("a", 1, "x"), ("b", 1, "y"), ("c", 1, "z")], SCHEMA_DDL
        )
    )
    return t


def test_table_changes_classifies_iud(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    v1 = t.current_version()
    t.merge(
        spark.createDataFrame(
            [
                ("a", 1, "x2", "U"),   # update
                ("b", 1, "y", "D"),    # delete
                ("d", 1, "w", "I"),    # insert
                # c untouched
            ],
            "k string, seq int, v string, op string",
        ),
        key_cols=["k", "seq"],
    )
    v2 = t.current_version()

    feed = table_changes(t, v1, v2, key_cols=["k", "seq"])
    got = {(r.k, r.seq): (r.op, r.v) for r in feed.collect()}
    assert got == {
        ("a", 1): ("U", "x2"),
        ("b", 1): ("D", "y"),   # delete carries the old payload
        ("d", 1): ("I", "w"),
    }


def test_table_changes_roundtrip_reproduces_snapshot(spark, tmp_table_dir):
    import os

    t = _table(spark, tmp_table_dir + "/src")
    v1 = t.current_version()
    t.merge(
        spark.createDataFrame(
            [("a", 1, "x9", "U"), ("c", 1, "z", "D"), ("e", 5, "q", "I")],
            "k string, seq int, v string, op string",
        ),
        key_cols=["k", "seq"],
    )
    v2 = t.current_version()

    # replica starts from snapshot v1, applies the feed, must equal v2
    replica = LakeTable.create(
        spark,
        os.path.join(tmp_table_dir, "replica"),
        _parse_datatype_string(SCHEMA_DDL),
        bucket_key="k",
        num_buckets=4,
    )
    replica.append(t.read(version=v1))
    replica.merge(table_changes(t, v1, v2, key_cols=["k", "seq"]), key_cols=["k", "seq"])

    a = replica.read()
    b = t.read(version=v2)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_table_changes_across_schema_evolution(spark, tmp_table_dir):
    from pyspark.sql.types import StringType, StructField, StructType

    t = _table(spark, tmp_table_dir)
    v1 = t.current_version()
    wide = StructType(
        list(t.schema().fields) + [StructField("extra", StringType())]
    )
    t.evolve_schema(wide)
    t.merge(
        spark.createDataFrame(
            [("a", 1, "x", "hello", "U")],
            "k string, seq int, v string, extra string, op string",
        ),
        key_cols=["k", "seq"],
    )
    feed = table_changes(t, v1, key_cols=["k", "seq"])
    got = {(r.k, r.seq): (r.op, r.v, r.extra) for r in feed.collect()}
    # only 'a' changed: same v, extra went NULL -> "hello"
    assert got == {("a", 1): ("U", "x", "hello")}


def test_table_changes_bucket_pruning(spark, tmp_table_dir):
    """Bucket pruning is metadata-only and lossless: the pruned feed
    equals the unpruned one, and a single-key merge marks strictly
    fewer buckets than the table has."""
    from dexspark.lake.changes import changed_buckets

    t = _table(spark, tmp_table_dir)
    v1 = t.current_version()
    t.merge(
        spark.createDataFrame(
            [("a", 1, "x2", "U")], "k string, seq int, v string, op string"
        ),
        key_cols=["k", "seq"],
    )
    v2 = t.current_version()

    cb = changed_buckets(t, v1, v2)
    all_buckets = {f.bucket for f in t.manifest(v2).files}
    assert cb and cb < all_buckets  # strictly pruned

    pruned = table_changes(t, v1, v2, key_cols=["k", "seq"])
    full = table_changes(t, v1, v2, key_cols=["k", "seq"], prune_buckets=False)
    assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, full.collect()))
    assert {r.k for r in pruned.collect()} == {"a"}


def test_mirror_table_closed_loop(spark, tmp_table_dir):
    """mirror_table keeps a downstream table equal to upstream through
    upserts, deletes, maintenance-only versions, and resumption — with
    a different bucket count, and exactly-once on re-run."""
    import os

    from dexspark.lake.changes import mirror_table

    src = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "src"),
        _parse_datatype_string(SCHEMA_DDL), "k", 4,
    )
    dst = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "dst"),
        _parse_datatype_string(SCHEMA_DDL), "k", 2,
    )
    chg = "k string, seq int, v string, op string, lsn long"
    src.merge(spark.createDataFrame(
        [("a", 1, "x", "I", 1), ("b", 2, "y", "I", 2)], chg), key_cols=["k"])
    mirror_table(src, dst, key_cols=["k"])
    assert {(r.k, r.v) for r in dst.read().collect()} == {("a", "x"), ("b", "y")}

    # upsert + delete + a maintenance-only version, then resume
    src.merge(spark.createDataFrame(
        [("a", 1, "x2", "U", 10), ("b", 2, None, "D", 11), ("c", 3, "z", "I", 12)],
        chg), key_cols=["k"])
    src.compact(min_files_per_bucket=1)  # diff-empty version
    res = mirror_table(src, dst, key_cols=["k"])
    assert len(res) == 2  # one real diff + one empty maintenance diff
    assert {(r.k, r.v) for r in dst.read().collect()} == {("a", "x2"), ("c", "z")}
    # exactly-once: nothing left to mirror
    assert mirror_table(src, dst, key_cols=["k"]) == []
