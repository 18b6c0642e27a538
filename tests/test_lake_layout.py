"""Metadata-only layout evolution (LakeTable.evolve_layout +
lake/layout.py algebra) — Iceberg-style partition-spec evolution for
hash buckets.

Invariants under test:
1. the algebra is exact: bucket overlap / closure / intersection agree
   with brute force over the key-hash space;
2. evolve_layout is O(metadata): zero data files move, and reads (full,
   point-lookup, time-travel) are identical before/after;
3. migration is incremental and correct while layouts are mixed: COW
   merges migrate exactly the closure they touch, MOR deltas resolve
   against old-layout bases, compaction and maintain() converge the
   table back to one layout, and the change feed stays exact across
   the boundary;
4. the divisibility-chain policy is enforced (coprime jumps →
   rebucket()), and shrinking is as valid as growing.

No reference-repo analogue (the reference routes blobs, it has no
bucketed storage); this is engine-supplied lakehouse surface
(SURVEY §2.2), so the oracle here is brute force + the table's own
pre-evolution behavior.
"""

import math

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from dexspark.lake import layout as lake_layout
from dexspark.lake import manifest as mf
from dexspark.lake.changes import table_changes
from dexspark.lake.table import LakeTable

import pytest

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


def _mk(spark, d, n=200, buckets=4):
    t = LakeTable.create(spark, d, SCHEMA, bucket_key="k", num_buckets=buckets)
    t.append(
        spark.createDataFrame([(f"k{i}", i, f"v{i}") for i in range(n)], SCHEMA)
    )
    return t


def _state(t, **kw):
    return {(r.k, r.seq, r.v) for r in t.read(**kw).collect()}


def _file(layout, bucket, path="p"):
    return mf.DataFile(path=path, bucket=bucket, schema_id=1, layout=layout)


# --------------------------------------------------------------- pure algebra


def test_overlaps_matches_brute_force():
    # keys(n, b) = {h : h % n == b}; overlap iff some h is in both
    layouts = [1, 2, 3, 4, 6, 8, 12]
    H = range(0, 24 * 20)  # covers every residue class of lcm(layouts)
    for n1 in layouts:
        for n2 in layouts:
            for b1 in range(n1):
                for b2 in range(n2):
                    truth = any(h % n1 == b1 and h % n2 == b2 for h in H)
                    assert lake_layout.overlaps(n1, b1, n2, b2) == truth


def test_close_buckets_single_layout_is_identity():
    files = [_file(8, b, f"f{b}") for b in range(8)]
    closed, members = lake_layout.close_buckets({2, 5}, files, 8)
    assert closed == {2, 5}
    assert {f.path for f in members} == {"f2", "f5"}


def test_close_buckets_key_exact_under_mixed_layouts():
    # files under 4 and 16; seed one 16-bucket → closure must pull in
    # the 4-bucket parent AND every 16-bucket that parent spans
    files = [_file(4, b, f"old{b}") for b in range(4)] + [
        _file(16, b, f"new{b}") for b in range(16)
    ]
    closed, members = lake_layout.close_buckets({5}, files, 16)
    # old bucket 5 % 4 == 1 shares keys; its 16-residues are 1,5,9,13
    assert closed == {1, 5, 9, 13}
    assert {f.path for f in members} == {"old1", "new1", "new5", "new9", "new13"}
    # key-exactness: every key of every member file lands in `closed`
    for h in range(0, 16 * 50):
        for f in members:
            if h % f.layout == f.bucket:
                assert h % 16 in closed
    # and no non-member file holds a key of the closed set
    mem = {f.path for f in members}
    for f in files:
        if f.path in mem:
            continue
        assert not any(
            h % f.layout == f.bucket and h % 16 in closed
            for h in range(0, 16 * 50)
        )


def test_close_buckets_transitive_across_three_layouts():
    # 2 → 4 → 8 chain: seeding an 8-bucket must close through the
    # 4-layout file into everything the 2-layout file spans
    files = [_file(2, 0, "two0"), _file(4, 2, "four2")] + [
        _file(8, b, f"eight{b}") for b in range(8)
    ]
    closed, members = lake_layout.close_buckets({2}, files, 8)
    # 8-bucket 2 ↔ four2 (2 % 4) ↔ two0 (2 % 2 == 0) ↔ all even 8-buckets
    assert closed == {0, 2, 4, 6}
    assert {f.path for f in members} == {
        "two0", "four2", "eight0", "eight2", "eight4", "eight6",
    }


def test_bucket_sets_intersect_brute_force():
    for n1, n2 in [(4, 16), (16, 4), (8, 12), (3, 5)]:
        for b1 in range(n1):
            for b2 in range(n2):
                truth = any(
                    h % n1 == b1 and h % n2 == b2
                    for h in range(0, n1 * n2 * 4)
                )
                assert (
                    lake_layout.bucket_sets_intersect(n1, [b1], n2, [b2])
                    == truth
                )


def test_validate_evolution_divisibility_chain():
    lake_layout.validate_evolution(16, {4})       # grow by multiple
    lake_layout.validate_evolution(2, {4})        # shrink by divisor
    lake_layout.validate_evolution(16, {4, 8, 16})
    with pytest.raises(ValueError, match="rebucket"):
        lake_layout.validate_evolution(6, {4})    # coprime-ish jump
    with pytest.raises(ValueError, match="rebucket"):
        lake_layout.validate_evolution(8, {4, 3})  # one live layout fails
    with pytest.raises(ValueError):
        lake_layout.validate_evolution(0, {4})


# ------------------------------------------------------------- table surface


def test_evolve_is_metadata_only_and_reads_identical(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    before = _state(t)
    paths_before = {f.path for f in t.manifest().files}
    info = t.evolve_layout(16)
    assert info["num_buckets_before"] == 4 and info["num_buckets"] == 16
    m = t.manifest()
    assert m.num_buckets == 16
    # zero data movement: same physical files, now carrying layout=4
    assert {f.path for f in m.files} == paths_before
    assert all(f.layout == 4 for f in m.files)
    assert _state(t) == before
    st = t.layout_status()
    assert st["migrated"] is False and set(st["layouts"]) == {"4"}
    # idempotent no-op
    assert t.evolve_layout(16)["skipped"] is True


def test_evolve_rejects_non_chain_count(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    with pytest.raises(ValueError, match="rebucket"):
        t.evolve_layout(6)


def test_new_writes_land_under_new_layout(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n=100)
    t.evolve_layout(16)
    t.append(
        spark.createDataFrame(
            [(f"n{i}", 1000 + i, "new") for i in range(50)], SCHEMA
        )
    )
    m = t.manifest()
    layouts = {f.layout for f in m.files}
    assert layouts == {4, 16}
    assert all(
        f.bucket < f.layout for f in m.files
    )  # ids valid under each file's own layout
    assert len(_state(t)) == 150


def test_point_lookup_prunes_under_each_layout(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n=100)
    t.evolve_layout(16)
    t.append(spark.createDataFrame([("extra", 1, "e")], SCHEMA))
    m = t.manifest()
    kb = t._buckets_for_keys(m, ["k7"])
    # per-layout residues of the same xxhash64
    assert set(kb) == {4, 16}
    assert kb[16] % 4 == kb[4]
    got = t.read(filters=[("k", "=", "k7")]).collect()
    assert {(r.k, r.v) for r in got} == {("k7", "v7")}


def test_cow_merge_migrates_touched_closure_only(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n=200)
    t.evolve_layout(16)
    before = _state(t)
    info = t.merge(
        spark.createDataFrame(
            [("k1", 1, "NEW", "U", 1000), ("k2", 2, "v2", "D", 1001)],
            CH_SCHEMA,
        ),
        key_cols=["k"],
    )
    # the rewrite replaced whole key-space classes: affected buckets are
    # closed (each touched old-4 bucket expands to its 4 children)
    aff = set(info["affected_buckets"])
    assert aff == {
        b for s in aff for b in range(s % 4, 16, 4)
    }, "affected set is closed under the 4→16 overlap relation"
    m = t.manifest()
    # every rewritten file is on the current layout; untouched old-4
    # groups remain (incremental, not wholesale)
    assert {f.layout for f in m.files} == {4, 16}
    for f in m.files:
        if f.layout == 4:
            assert f.bucket % 4 not in {b % 4 for b in aff}
    expect = (before - {("k1", 1, "v1"), ("k2", 2, "v2")}) | {("k1", 1, "NEW")}
    assert _state(t) == expect


def test_mor_deltas_resolve_across_layouts(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n=100)
    t.evolve_layout(16)
    before = _state(t)
    t.merge(
        spark.createDataFrame(
            [("k3", 3, "MOR", "U", 2000), ("k4", 4, "v4", "D", 2001)],
            CH_SCHEMA,
        ),
        key_cols=["k"],
        strategy="mor",
    )
    m = t.manifest()
    deltas = [f for f in m.files if f.kind == "delta"]
    assert deltas and all(f.layout == 16 for f in deltas)
    assert {f.layout for f in m.files if f.kind != "delta"} == {4}
    expect = (before - {("k3", 3, "v3"), ("k4", 4, "v4")}) | {("k3", 3, "MOR")}
    assert _state(t) == expect
    # point lookups against keys inside AND outside the delta class
    assert {(r.k, r.v) for r in t.read(filters=[("k", "=", "k3")]).collect()} == {
        ("k3", "MOR")
    }
    assert t.read(filters=[("k", "=", "k4")]).count() == 0
    assert {(r.k, r.v) for r in t.read(filters=[("k", "=", "k5")]).collect()} == {
        ("k5", "v5")
    }
    # LSN gate still holds across the layout boundary: an older
    # redelivery for the same key cannot clobber the delta
    t.merge(
        spark.createDataFrame([("k3", 3, "STALE", "U", 1500)], CH_SCHEMA),
        key_cols=["k"],
        strategy="mor",
    )
    assert {(r.k, r.v) for r in t.read(filters=[("k", "=", "k3")]).collect()} == {
        ("k3", "MOR")
    }


def test_compact_finishes_migration(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n=120)
    t.evolve_layout(16)
    t.merge(
        spark.createDataFrame([("k9", 9, "X", "U", 3000)], CH_SCHEMA),
        key_cols=["k"],
        strategy="mor",
    )
    before = _state(t)
    t.compact(min_files_per_bucket=1)
    m = t.manifest()
    assert all(f.layout == 16 for f in m.files)
    assert not any(f.kind == "delta" for f in m.files)
    assert t.layout_status()["migrated"] is True
    assert _state(t) == before


def test_maintain_migrates_stragglers_with_budget(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n=200)
    t.evolve_layout(16)
    before = _state(t)
    # budget of 2 groups: exactly 2 of the 4 old groups migrate
    out = t.maintain(
        compact_min_files=10_000,
        compact_delta_depth=10_000,
        migrate_layout_groups=2,
    )
    assert [
        why
        for k, why in out["buckets_triggered"].items()
        if k.startswith("4/")
    ] == [["stale_layout"], ["stale_layout"]]
    st = t.layout_status()
    assert st["layouts"]["4"]["files"] > 0  # stragglers remain
    assert _state(t) == before
    # repeated runs converge to one layout
    t.maintain(
        compact_min_files=10_000,
        compact_delta_depth=10_000,
        migrate_layout_groups=8,
    )
    assert t.layout_status()["migrated"] is True
    assert _state(t) == before


def test_change_feed_exact_across_evolution(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n=100)
    v1 = t.current_version()
    t.evolve_layout(16)
    t.merge(
        spark.createDataFrame(
            [
                ("k1", 1, "U1", "U", 100),
                ("k2", 2, "v2", "D", 101),
                ("zz", 999, "INS", "U", 102),
            ],
            CH_SCHEMA,
        ),
        key_cols=["k"],
    )
    v2 = t.current_version()
    feed = table_changes(t, v1, v2, key_cols=["k"])
    got = {r.k: (r.op, r.v) for r in feed.collect()}
    assert got == {"k1": ("U", "U1"), "k2": ("D", "v2"), "zz": ("I", "INS")}
    # an evolve commit alone diffs to the empty set
    t2_from = t.current_version()
    t.evolve_layout(32)
    assert table_changes(t, t2_from, t.current_version(), key_cols=["k"]).count() == 0


def test_shrink_layout(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n=80, buckets=8)
    before = _state(t)
    t.evolve_layout(2)
    assert _state(t) == before
    t.merge(
        spark.createDataFrame([("k1", 1, "S", "U", 50)], CH_SCHEMA),
        key_cols=["k"],
    )
    # the touched class migrated to the 2-layout; state correct
    m = t.manifest()
    assert {f.layout for f in m.files} == {8, 2}
    assert _state(t) == (before - {("k1", 1, "v1")}) | {("k1", 1, "S")}
    t.compact(min_files_per_bucket=1)
    assert t.layout_status()["migrated"] is True


def test_time_travel_and_rollback_across_evolution(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n=60)
    v1 = t.current_version()
    before = _state(t)
    t.evolve_layout(16)
    t.merge(
        spark.createDataFrame([("k1", 1, "NEW", "U", 10)], CH_SCHEMA),
        key_cols=["k"],
    )
    # time travel to the pre-evolution snapshot reads the old layout
    assert _state(t, version=v1) == before
    t.rollback(v1)
    m = t.manifest()
    assert m.num_buckets == 4
    assert _state(t) == before


def test_chained_evolutions_three_live_layouts(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n=90, buckets=2)
    s0 = _state(t)
    t.evolve_layout(4)
    t.append(spark.createDataFrame([("a4", 1, "x4")], SCHEMA))
    t.evolve_layout(16)
    t.append(spark.createDataFrame([("a16", 1, "x16")], SCHEMA))
    m = t.manifest()
    assert {f.layout for f in m.files} == {2, 4, 16}
    want = s0 | {("a4", 1, "x4"), ("a16", 1, "x16")}
    assert _state(t) == want
    # a merge touching one key closes across all three layouts soundly
    t.merge(
        spark.createDataFrame([("k1", 1, "Z", "U", 5)], CH_SCHEMA),
        key_cols=["k"],
    )
    assert _state(t) == (want - {("k1", 1, "v1")}) | {("k1", 1, "Z")}
    # full convergence
    t.compact(min_files_per_bucket=1)
    assert t.layout_status()["migrated"] is True
    assert _state(t) == (want - {("k1", 1, "v1")}) | {("k1", 1, "Z")}


def test_delete_across_mixed_layouts(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n=100)
    t.evolve_layout(16)
    t.append(spark.createDataFrame([("k1", 77, "dup-key")], SCHEMA))
    before = _state(t)
    info = t.delete_where([("v", "=", "dup-key")])
    assert not info.get("skipped")
    assert _state(t) == before - {("k1", 77, "dup-key")}
    info = t.delete_where([("v", "=", "v1")])
    assert not info.get("skipped")
    assert _state(t) == before - {("k1", 77, "dup-key"), ("k1", 1, "v1")}


def test_evolve_races_writers(spark, tmp_table_dir):
    """Appends and merges racing an evolve_layout: unlike rebucket
    (whose rewrite invalidates in-flight file sets), evolve moves no
    data — in-flight writers' files self-describe their layout and
    REBASE cleanly, so every row lands exactly once and the head
    layout is the evolved one."""
    import threading

    from dexspark.lake.table import CommitConflict

    t = _mk(spark, tmp_table_dir, n=100, buckets=2)
    errors = []
    started = threading.Event()

    def writer():
        try:
            for i in range(6):
                if i == 1:
                    started.set()
                t.append(
                    spark.createDataFrame(
                        [(f"a{i}_{j}", 1000 + i * 10 + j, "w") for j in range(5)],
                        SCHEMA,
                    )
                )
                t.merge(
                    spark.createDataFrame(
                        [(f"k{i}", i, f"UPD{i}", "U", 5000 + i)], CH_SCHEMA
                    ),
                    key_cols=["k"],
                )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    th = threading.Thread(target=writer)
    th.start()
    started.wait(60)
    try:
        t.evolve_layout(8)
    except CommitConflict:
        pass  # the evolve may yield; writers must survive regardless
    th.join(timeout=300)
    assert not errors, errors
    rows = {(r.k, r.v) for r in t.read().collect()}
    appended = [r for r in t.read().collect() if r.k.startswith("a")]
    assert len(appended) == 30 == len({r.k for r in appended})
    for i in range(6):
        assert (f"k{i}", f"UPD{i}") in rows
    assert len(rows) == 130
    # converge and re-verify: migration preserves the raced state
    if t.manifest().num_buckets == 8:
        t.compact(min_files_per_bucket=1)
        assert t.layout_status()["migrated"] is True
        assert {(r.k, r.v) for r in t.read().collect()} == rows


def test_streaming_replay_across_evolution(spark, tmp_table_dir):
    """Checkpointed streaming replay with an evolve_layout between two
    run_available() windows: the resumed tail ingests into the evolved
    (mixed-layout) table and the final state equals the full-log
    oracle — the mid-flight resize a long-running 100 TB ingest needs."""
    import os

    import pyspark.sql.functions as F
    from pyspark.sql.types import _parse_datatype_string

    from dexspark.cdc.generator import expected_final_state, gen_change_log
    from dexspark.streaming.replay import CdcStreamReplay

    PAYLOAD = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    LOG_SCHEMA = "lsn long, op string, batch_seq long, " + PAYLOAD
    log = gen_change_log(spark, 4000, n_convs=60, n_batches=4)
    table = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "transcripts"),
        _parse_datatype_string(PAYLOAD), "conv_id", 4,
    )
    log_dir = os.path.join(tmp_table_dir, "log")
    cp = os.path.join(tmp_table_dir, "cp")

    def replayer():
        return CdcStreamReplay(
            spark, table, log_dir, cp, _parse_datatype_string(LOG_SCHEMA)
        )

    log.filter(F.col("batch_seq") < 2).coalesce(2).write.parquet(
        log_dir, mode="append"
    )
    replayer().run_available()

    table.evolve_layout(16)  # O(metadata), between micro-batch windows

    log.filter(F.col("batch_seq") >= 2).coalesce(2).write.parquet(
        log_dir, mode="append"
    )
    r2 = replayer()
    r2.run_available()
    assert all(not r["skipped"] for r in r2.results)

    expected = expected_final_state(log)
    got = table.read()
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
    # converge and re-check
    while not table.layout_status()["migrated"]:
        table.maintain(
            compact_min_files=10_000, compact_delta_depth=10_000,
            migrate_layout_groups=16,
        )
    got = table.read()
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_cli_evolve_layout_and_status(spark, tmp_table_dir, capsys):
    """CLI surface: evolve-layout command + layout_status in status."""
    import json

    from dexspark.__main__ import main

    _mk(spark, tmp_table_dir, n=50)
    rc = main(
        ["--master", "local[4]", "evolve-layout",
         "--table", tmp_table_dir, "--buckets", "16"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["num_buckets"] == 16
    assert out["layout_status"]["migrated"] is False
    rc = main(["--master", "local[4]", "status", "--table", tmp_table_dir])
    assert rc == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["layout_status"]["layouts"]["4"]["files"] > 0


def test_bloom_coverage_survives_layout_migration(spark, tmp_table_dir):
    """Composition with secondary indexes: migration rewrites files
    (fresh, bloom-less entries), and maintain()'s uncovered-file
    trigger re-indexes them in the SAME call — point-predicate
    pruning on the indexed column is never lost for longer than one
    maintenance cycle while the table converges to the new layout."""
    from pyspark.sql.types import _parse_datatype_string

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
    cov = t.bloom_coverage()["author"]
    assert cov["uncovered"] == 0 and cov["covered"] > 0

    t.evolve_layout(8)
    while not t.layout_status()["migrated"]:
        t.maintain(
            compact_min_files=10_000, compact_delta_depth=10_000,
            migrate_layout_groups=2, bloom_uncovered_files=1,
        )
    cov = t.bloom_coverage()["author"]
    assert cov["uncovered"] == 0 and cov["covered"] == len(t.manifest().files)
    got = {r.k for r in t.read(filters=[("author", "=", "author1")]).collect()}
    assert got == {f"k1_{i}" for i in range(40)}


def test_scd2_history_across_evolution(spark, tmp_table_dir):
    """Composition with SCD2: the history's bucket-pruned stored read
    computes batch buckets under the CURRENT layout; read()'s closure
    pulls in the old-layout files holding the same keys, so interval
    chains built across an evolve are identical to the fixed-layout
    outcome (same batches applied to a never-evolved history)."""
    import datetime as dt
    import os

    from pyspark.sql.types import _parse_datatype_string

    from dexspark.cdc.scd2 import apply_changes_scd2, scd2_schema, scd2_view

    PAYLOAD = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    TS = dt.datetime(2024, 1, 1)

    def events(rows):
        return spark.createDataFrame(
            [(l, o, c, t, "user", x, None, TS) for (l, o, c, t, x) in rows],
            "lsn long, op string, conv_id string, turn_idx int, "
            "role string, text string, tool string, ts timestamp",
        )

    def versions(h):
        return {
            (r.conv_id, r.turn_idx, r.valid_from_lsn): (
                r.valid_to_lsn, r.closed_by_delete, r.is_current, r.text
            )
            for r in scd2_view(h.read()).collect()
        }

    b1 = [(10 + i, "I", f"c{i}", 0, "v1") for i in range(12)]
    b2 = [(30 + i, "U", f"c{i}", 0, "v2") for i in range(0, 12, 2)]
    b3 = [(50 + i, "D", f"c{i}", 0, "v2") for i in range(0, 12, 3)]

    def build(d, evolve):
        h = LakeTable.create(
            spark, os.path.join(tmp_table_dir, d),
            scd2_schema(_parse_datatype_string(PAYLOAD)), "conv_id", 2,
        )
        apply_changes_scd2(h, events(b1), batch_id="s1")
        if evolve:
            h.evolve_layout(8)
        apply_changes_scd2(h, events(b2), batch_id="s2")
        apply_changes_scd2(h, events(b3), batch_id="s3")
        return h

    h_ev = build("ev", evolve=True)
    h_ref = build("ref", evolve=False)
    assert versions(h_ev) == versions(h_ref)
    # and migration convergence preserves the chains
    while not h_ev.layout_status()["migrated"]:
        h_ev.maintain(
            compact_min_files=10_000, compact_delta_depth=10_000,
            migrate_layout_groups=8,
        )
    assert versions(h_ev) == versions(h_ref)
