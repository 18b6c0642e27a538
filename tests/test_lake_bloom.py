"""Per-file key bloom sidecars (dexspark/lake/bloom.py) + point-lookup
file skipping in read(filters=) and delete_where.

Invariants:
1. bloom answers are one-sided: never a false "absent" (correctness),
   ~1% false "maybe" at the design point (effectiveness);
2. read(filters=[(key, '=', v)]) equals read().filter(...) AND touches
   fewer files when the key lives in one append slice;
3. an RTBF delete on the bucket key rewrites only the files that may
   hold the key — the sweep the min/max stats can't prune (strings);
4. format compatibility: files without sidecars are never pruned;
   expire_snapshots removes sidecars with their data files.
"""

import os

import pyspark.sql.functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from dexspark.lake import bloom as lake_bloom
from dexspark.lake.table import LakeTable

SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("seq", LongType()),
        StructField("v", StringType()),
    ]
)


def _mk(spark, d, n_chunks=4, chunk=100):
    """Disjoint key slices per append: k0..k99, k100..k199, ... so a
    point lookup has exactly one containing file per bucket."""
    t = LakeTable.create(spark, d, SCHEMA, bucket_key="k", num_buckets=2)
    for c in range(n_chunks):
        rows = [
            (f"k{i}", i, f"v{i}") for i in range(c * chunk, (c + 1) * chunk)
        ]
        t.append(spark.createDataFrame(rows, SCHEMA))
    return t


def test_bloom_one_sided_and_effective():
    keys = [f"conv_{i}" for i in range(5_000)]
    blob = lake_bloom.build(keys)
    # no false absents, ever
    assert all(lake_bloom.might_contain(blob, k) for k in keys)
    # false-maybe rate near the 1% design point
    probes = [f"other_{i}" for i in range(10_000)]
    fp = sum(lake_bloom.might_contain(blob, p) for p in probes) / len(probes)
    assert fp < 0.03, fp
    # nulls are never added and never prune
    assert lake_bloom.might_contain(blob, None)
    # garbage sidecars cannot prune
    assert lake_bloom.might_contain(b"not a bloom", "x")


def test_point_lookup_prunes_files(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    assert all(f.bloom for f in t.manifest().files)
    got = t.read(filters=[("k", "=", "k250")]).collect()
    assert [(r.k, r.seq) for r in got] == [("k250", 250)]
    # the lookup plans a fraction of the table's files: only the files
    # whose bloom admits k250 (1 true + rare false-maybes), never the
    # 4-appends x bucket full set
    n_all = len(t.read().inputFiles())
    n_hit = len(t.read(filters=[("k", "=", "k250")]).inputFiles())
    assert n_hit < n_all / 2, (n_hit, n_all)
    # absent key → usually zero files, always zero rows
    assert t.read(filters=[("k", "=", "nope")]).count() == 0


def test_rtbf_delete_rewrites_only_containing_files(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    n_files = len(t.manifest().files)
    info = t.delete_where([("k", "=", "k250")])
    assert info["matched_rows"] == 1
    # stats can't decide string keys; the bloom restricts the rewrite
    # to the files that may hold the key
    assert info["files_rewritten"] < n_files / 2
    assert info["files_kept"] > 0
    left = t.read().count()
    assert left == 399
    assert t.read(filters=[("k", "=", "k250")]).count() == 0
    # absent key: stats+bloom prove no match → skipped, no commit
    v = t.current_version()
    assert t.delete_where([("k", "=", "never_there")])["skipped"]
    assert t.current_version() == v


def test_pre_bloom_files_never_pruned(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n_chunks=2)
    # simulate a foreign/pre-bloom writer: drop the sidecars + flags
    m = t.manifest()
    for f in m.files:
        f.bloom = False
        sc = lake_bloom.sidecar_path(os.path.join(tmp_table_dir, f.path))
        if os.path.exists(sc):
            os.remove(sc)
    t._commit_next(m, m.files, {"operation": "overwrite"})
    got = t.read(filters=[("k", "=", "k50")]).collect()
    assert [(r.k, r.seq) for r in got] == [("k50", 50)]
    # without sidecars the blooms cannot prune WITHIN the bucket: the
    # scan must touch every file of k50's bucket (key->bucket pruning
    # still applies — it needs no per-file metadata)
    m2 = t.manifest()
    # _buckets_for_keys returns {layout: bucket} (per-file-layout exact
    # since evolve_layout landed); membership mirrors the scan's rule
    kb = t._buckets_for_keys(m2, ["k50"])
    per_bucket = [f for f in m2.files if kb.get(f.layout) == f.bucket]
    assert len(t.read(filters=[("k", "=", "k50")]).inputFiles()) == len(
        per_bucket
    )
    assert len(per_bucket) > 1  # the no-pruning claim is non-vacuous


def test_expire_removes_sidecars(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n_chunks=2)
    old = [
        os.path.join(tmp_table_dir, f.path) for f in t.manifest(1).files
    ]
    t.compact(min_files_per_bucket=1)
    t.expire_snapshots(keep_last=1)
    for p in old:
        assert not os.path.exists(p)
        assert not os.path.exists(lake_bloom.sidecar_path(p))
    # survivors keep theirs
    for f in t.manifest().files:
        assert os.path.exists(
            lake_bloom.sidecar_path(os.path.join(tmp_table_dir, f.path))
        )


def test_bloom_with_mor_deltas_and_range_filters(spark, tmp_table_dir):
    """Bloom pruning composes with MOR resolution and non-key filters:
    results always equal the row-level filter."""
    t = _mk(spark, tmp_table_dir, n_chunks=2)
    ch_schema = StructType(
        list(SCHEMA.fields)
        + [StructField("op", StringType()), StructField("lsn", LongType())]
    )
    t.merge(
        spark.createDataFrame([("k50", 50, "NEW", "U", 99)], ch_schema),
        key_cols=["k"],
        strategy="mor",
    )
    for flt in ([("k", "=", "k50")], [("k", "=", "k150"), ("seq", ">", 100)]):
        got = sorted((r.k, r.v) for r in t.read(filters=flt).collect())
        cond = F.lit(True)
        for c, _, val in flt:
            cond = cond & (
                (F.col(c) == val) if c == "k" else (F.col(c) > val)
            )
        want = sorted((r.k, r.v) for r in t.read().filter(cond).collect())
        assert got == want
    assert t.read(filters=[("k", "=", "k50")]).first().v == "NEW"


def test_filter_values_canonicalized_to_key_type(spark, tmp_table_dir):
    """A semantically-equal but differently-typed filter value (1000.0
    on a long key, or a numeric string) must probe the bloom / derive
    the bucket / compare stats under the COLUMN's type — not its own
    repr — or files get wrongly 'proven absent'."""
    uid_schema = StructType(
        [StructField("uid", LongType()), StructField("v", StringType())]
    )
    t = LakeTable.create(
        spark, tmp_table_dir, uid_schema, bucket_key="uid", num_buckets=4
    )
    t.append(
        spark.createDataFrame([(1000, "a"), (7, "b")], uid_schema)
    )
    for val in (1000, 1000.0, "1000", "1000.0"):
        got = t.read(filters=[("uid", "=", val)]).collect()
        assert [(r.uid, r.v) for r in got] == [(1000, "a")], val
    # redundant equal-valued conjuncts are NOT unsatisfiable
    got = t.read(filters=[("uid", "=", 1000), ("uid", "=", 1000.0)]).collect()
    assert [(r.uid, r.v) for r in got] == [(1000, "a")]
    # genuinely different values ARE (scan nothing, return nothing)
    assert t.read(filters=[("uid", "=", 7), ("uid", "=", 1000)]).count() == 0
    # a fractional float can match no long — empty, not an error
    assert t.read(filters=[("uid", "=", 1000.5)]).count() == 0


def test_vacuum_collects_orphaned_bloom_sidecars(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n_chunks=1)
    # simulate a vacuum crash between the two removes: a .bloom whose
    # parquet is gone
    m = t.manifest()
    f = m.files[0]
    abs_p = os.path.join(t.table_dir, f.path)
    orphan_sc = abs_p.replace(".parquet", "_gone.parquet") + ".bloom"
    with open(orphan_sc, "wb") as fh:
        fh.write(b"DXBLOOM1" + b"\0" * 136)
    os.utime(orphan_sc, (1, 1))  # well past any grace period
    info = t.vacuum_orphans(older_than_seconds=60)
    assert not os.path.exists(orphan_sc)
    assert any(p.endswith(".bloom") for p in info["removed_sidecars"])
    assert not any(p.endswith(".bloom") for p in info["removed"])


def test_secondary_blooms_prune_non_key_lookups(spark, tmp_table_dir):
    """build_blooms(column): = predicates on a NON-key string column
    prune files (min/max stats never cover strings), results stay
    exact, and the non-key RTBF delete rewrites only containing
    files."""
    import os

    import pyspark.sql.functions as F
    from pyspark.sql.types import _parse_datatype_string

    from dexspark.lake.table import LakeTable

    sch = _parse_datatype_string("k string, author string, v long")
    t = LakeTable.create(
        spark, tmp_table_dir, sch, bucket_key="k", num_buckets=2
    )
    # 4 appends x 2 buckets = 8 files; authors partitioned by slice so
    # each author lives in exactly one append generation
    for c in range(4):
        t.append(
            spark.createDataFrame(
                [(f"k{c}_{i}", f"author{c}", i) for i in range(50)], sch
            )
        )
    info = t.build_blooms("author")
    assert info["files_indexed"] == 8
    m = t.manifest()
    assert all(f.bloom_cols == ["author"] for f in m.files)
    # re-run is a no-op (all covered)
    assert t.build_blooms("author")["skipped"]

    # read with the secondary = filter: exact result
    got = t.read(filters=[("author", "=", "author2")]).count()
    assert got == 50
    # the pruning itself: candidate selection keeps only files whose
    # bloom may contain author2 (2 of 8 — one per bucket)
    key_vals = []
    kept = [
        f
        for f in m.files
        if t._bloom_keep(f, key_vals, [("author", "=", "author2")])
    ]
    assert len(kept) == 2

    # non-key RTBF delete: only containing files rewrite
    dinfo = t.delete_where([("author", "=", "author1")])
    assert dinfo["matched_rows"] == 50
    assert dinfo["files_rewritten"] == 2 and dinfo["files_kept"] == 6
    assert t.read().count() == 150

    # guards
    import pytest

    with pytest.raises(ValueError, match="bucket key"):
        t.build_blooms("k")
    with pytest.raises(ValueError, match="no column"):
        t.build_blooms("ghost")


def test_secondary_blooms_survive_gc_and_clean_up(spark, tmp_table_dir):
    import glob
    import os

    from pyspark.sql.types import _parse_datatype_string

    from dexspark.lake.table import LakeTable

    sch = _parse_datatype_string("k string, author string, v long")
    t = LakeTable.create(
        spark, tmp_table_dir, sch, bucket_key="k", num_buckets=2
    )
    t.append(
        spark.createDataFrame(
            [(f"k{i}", f"a{i}", i) for i in range(20)], sch
        )
    )
    t.build_blooms("author")
    pat = os.path.join(tmp_table_dir, "data", "*", "*", "*.author.bloom")
    assert glob.glob(pat)
    # vacuum keeps sidecars of referenced files
    t.vacuum_orphans(older_than_seconds=0)
    assert glob.glob(pat)
    # a rewrite (compact forces it) + expiry removes the stale ones
    t.compact(min_files_per_bucket=1)
    t.expire_snapshots(keep_last=1)
    assert not glob.glob(pat)
    assert t.read().count() == 20
