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
    # composed catch-up: the 2-version backlog (merge + maintenance)
    # lands as ONE merge commit
    assert len(res) == 1
    assert {(r.k, r.v) for r in dst.read().collect()} == {("a", "x2"), ("c", "z")}
    # exactly-once: nothing left to mirror
    assert mirror_table(src, dst, key_cols=["k"]) == []


def test_mirror_backlog_lands_in_one_merge(spark, tmp_table_dir):
    """A 10-version backlog mirrors as ONE composed diff + ONE merge
    commit (VERDICT r3 item #3: O(1) merges per catch-up, not
    O(versions))."""
    import os

    from dexspark.lake.changes import mirror_table

    chg = "k string, seq int, v string, op string, lsn long"
    src = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "src"),
        _parse_datatype_string(SCHEMA_DDL), "k", 4,
    )
    dst = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "dst"),
        _parse_datatype_string(SCHEMA_DDL), "k", 2,
    )
    for i in range(10):
        src.merge(
            spark.createDataFrame([(f"k{i % 4}", i, f"v{i}", "U", i)], chg),
            key_cols=["k"],
        )
    v_dst_before = dst.current_version()
    res = mirror_table(src, dst, key_cols=["k"])
    assert len(res) == 1
    # exactly one merge commit landed on dst
    assert dst.current_version() == v_dst_before + 1
    got = {(r.k, r.v) for r in dst.read().collect()}
    assert got == {("k0", "v8"), ("k1", "v9"), ("k2", "v6"), ("k3", "v7")}
    assert mirror_table(src, dst, key_cols=["k"]) == []


def test_mirror_per_version_audit_mode(spark, tmp_table_dir):
    """per_version=True keeps the one-merge-per-version audit loop and
    matches the composed mode's final state."""
    import os

    from dexspark.lake.changes import mirror_table

    chg = "k string, seq int, v string, op string, lsn long"
    src = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "src"),
        _parse_datatype_string(SCHEMA_DDL), "k", 4,
    )
    dst = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "dst"),
        _parse_datatype_string(SCHEMA_DDL), "k", 2,
    )
    for i in range(4):
        src.merge(
            spark.createDataFrame([(f"k{i}", i, f"v{i}", "I", i)], chg),
            key_cols=["k"],
        )
    res = mirror_table(src, dst, key_cols=["k"], per_version=True)
    assert len(res) == 4  # one merge per source version
    got = {(r.k, r.v) for r in dst.read().collect()}
    assert got == {("k0", "v0"), ("k1", "v1"), ("k2", "v2"), ("k3", "v3")}


def test_mirror_resyncs_across_expired_history(spark, tmp_table_dir):
    """If src expired the last-mirrored version, the mirror must NOT
    silently skip the gap (the old divergence bug) — it falls back to
    a full-state resync and converges."""
    import os

    from dexspark.lake.changes import mirror_table

    chg = "k string, seq int, v string, op string, lsn long"
    src = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "src"),
        _parse_datatype_string(SCHEMA_DDL), "k", 4,
    )
    dst = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "dst"),
        _parse_datatype_string(SCHEMA_DDL), "k", 2,
    )
    src.merge(spark.createDataFrame(
        [("a", 1, "x", "I", 1), ("b", 2, "y", "I", 2)], chg), key_cols=["k"])
    mirror_table(src, dst, key_cols=["k"])
    # src advances AND expires past the mirror horizon
    src.merge(spark.createDataFrame(
        [("a", 1, "x2", "U", 10), ("b", 2, None, "D", 11), ("c", 3, "z", "I", 12)],
        chg), key_cols=["k"])
    src.expire_snapshots(keep_last=1)
    res = mirror_table(src, dst, key_cols=["k"])
    assert len(res) == 1
    assert res[0]["mirror_mode"] == "resync"
    assert {(r.k, r.v) for r in dst.read().collect()} == {("a", "x2"), ("c", "z")}
    # open a REAL gap (expire past the resynced version) — audit mode
    # must refuse rather than silently skip it
    src.merge(spark.createDataFrame([("d", 4, "w", "I", 20)], chg), key_cols=["k"])
    src.merge(spark.createDataFrame([("e", 5, "u", "I", 21)], chg), key_cols=["k"])
    src.expire_snapshots(keep_last=1)
    import pytest

    with pytest.raises(ValueError, match="mirror gap"):
        mirror_table(src, dst, key_cols=["k"], per_version=True)


def test_mirror_fresh_dst_against_expired_src_bootstraps(spark, tmp_table_dir):
    """A brand-new replica of a src whose create manifest is expired
    bootstraps via resync instead of silently mirroring nothing."""
    import os

    from dexspark.lake.changes import mirror_table

    chg = "k string, seq int, v string, op string, lsn long"
    src = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "src"),
        _parse_datatype_string(SCHEMA_DDL), "k", 4,
    )
    src.merge(spark.createDataFrame(
        [("a", 1, "x", "I", 1), ("b", 2, "y", "I", 2)], chg), key_cols=["k"])
    src.expire_snapshots(keep_last=1)
    dst = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "dst"),
        _parse_datatype_string(SCHEMA_DDL), "k", 2,
    )
    res = mirror_table(src, dst, key_cols=["k"])
    assert len(res) == 1 and res[0]["mirror_mode"] == "resync"
    assert {(r.k, r.v) for r in dst.read().collect()} == {("a", "x"), ("b", "y")}


def test_mirror_skips_evolution_when_dst_already_covers(spark, tmp_table_dir):
    """ADVICE fix: dst newer/wider than src must NOT trigger
    evolve_schema toward the narrower schema (which raised
    'dropping column not supported')."""
    import os

    from dexspark.lake.changes import mirror_table

    chg = "k string, seq int, v string, op string, lsn long"
    src = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "src"),
        _parse_datatype_string(SCHEMA_DDL), "k", 4,
    )
    src.merge(spark.createDataFrame([("a", 1, "x", "I", 1)], chg), key_cols=["k"])
    # dst created wider (e.g. from a later src schema)
    dst = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "dst"),
        _parse_datatype_string(SCHEMA_DDL + ", extra string"), "k", 2,
    )
    res = mirror_table(src, dst, key_cols=["k"])
    assert len(res) == 1
    rows = dst.read().collect()
    assert {(r.k, r.v, r.extra) for r in rows} == {("a", "x", None)}
    # dst schema untouched (no narrowing attempted)
    assert dst.schema().fieldNames() == ["k", "seq", "v", "extra"]


def test_mirror_replays_src_evolution_onto_dst(spark, tmp_table_dir):
    """src evolving mid-history: cmd_mirror-style dst (created at an
    old schema) is evolved forward exactly once, and the mirrored
    state carries the new column."""
    import os

    from pyspark.sql.types import StructField, StringType

    from dexspark.lake.changes import mirror_table

    chg = "k string, seq int, v string, op string, lsn long"
    src = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "src"),
        _parse_datatype_string(SCHEMA_DDL), "k", 4,
    )
    dst = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "dst"),
        _parse_datatype_string(SCHEMA_DDL), "k", 2,
    )
    src.merge(spark.createDataFrame([("a", 1, "x", "I", 1)], chg), key_cols=["k"])
    mirror_table(src, dst, key_cols=["k"])
    src.evolve_schema(
        _parse_datatype_string(SCHEMA_DDL + ", extra string")
    if False else __import__("pyspark.sql.types", fromlist=["StructType"]).StructType(
        list(src.schema().fields) + [StructField("extra", StringType())]
    ))
    src.merge(
        spark.createDataFrame(
            [("b", 2, "y", "hello", "I", 5)],
            "k string, seq int, v string, extra string, op string, lsn long",
        ),
        key_cols=["k"],
    )
    res = mirror_table(src, dst, key_cols=["k"])
    assert len(res) == 1
    assert dst.schema().fieldNames() == ["k", "seq", "v", "extra"]
    got = {(r.k, r.v, r.extra) for r in dst.read().collect()}
    assert got == {("a", "x", None), ("b", "y", "hello")}


def test_default_keys_prefer_recorded_merge_keys(spark, tmp_table_dir):
    """ADVICE fix: table_changes/mirror default to the manifest's
    recorded merge_keys, not the (possibly partial) bucket key."""
    import os

    t = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "t"),
        _parse_datatype_string(SCHEMA_DDL), "k", 4,
    )
    chg = "k string, seq int, v string, op string, lsn long"
    v0 = t.current_version()
    # composite merge key (k, seq) over bucket key k
    t.merge(
        spark.createDataFrame(
            [("a", 1, "x", "I", 1), ("a", 2, "y", "I", 2)], chg
        ),
        key_cols=["k", "seq"],
    )
    # default keys = recorded merge_keys → both (a,1) and (a,2) appear
    feed = table_changes(t, v0)
    got = {(r.k, r.seq, r.op) for r in feed.collect()}
    assert got == {("a", 1, "I"), ("a", 2, "I")}


def test_table_changes_images_emits_pre_and_post(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    v1 = t.current_version()
    t.merge(
        spark.createDataFrame(
            [("a", 1, "x2", "U"), ("b", 1, "y", "D"), ("d", 1, "w", "I")],
            "k string, seq int, v string, op string",
        ),
        key_cols=["k", "seq"],
    )
    feed = table_changes(t, v1, t.current_version(), key_cols=["k", "seq"], images=True)
    got = {
        (r.k, r.seq): (r.op, r._old and r._old.v, r._new and r._new.v)
        for r in feed.collect()
    }
    assert got == {
        ("a", 1): ("U", "x", "x2"),   # both images on update
        ("b", 1): ("D", "y", None),   # no post-image on delete
        ("d", 1): ("I", None, "w"),   # no pre-image on insert
    }
