"""Format-2 segmented manifests (lake/manifest.py): per-bucket
content-addressed file-list shards, shard reuse across commits, GC,
branch hard-linking, and format-1 compatibility."""

import json
import os

import pytest

from dexspark.lake import manifest as mf
from dexspark.lake.table import LakeTable
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("seq", IntegerType()),
        StructField("v", StringType()),
    ]
)


@pytest.fixture()
def seg_always(monkeypatch):
    monkeypatch.setattr(mf, "SEGMENT_THRESHOLD", 1)


def _mk(spark, d, rows):
    t = LakeTable.create(spark, d, SCHEMA, bucket_key="k", num_buckets=4)
    t.append(spark.createDataFrame(rows, SCHEMA))
    return t


def _root(t, v=None):
    with open(mf.manifest_path(t.table_dir, v or t.current_version())) as fh:
        return json.load(fh)


ROWS = [(f"k{i}", i, f"v{i}") for i in range(16)]


def test_segmented_roundtrip_and_reuse(spark, tmp_table_dir, seg_always):
    t = _mk(spark, tmp_table_dir, ROWS)
    root = _root(t)
    assert root["format_version"] == 2
    assert "files" not in root and root["file_count"] > 0
    m = t.manifest()
    assert len(m.files) == root["file_count"]
    assert {r.k for r in t.read().collect()} == {f"k{i}" for i in range(16)}

    # a merge touching ONE key rewrites only that bucket's shard:
    # every other bucket keeps its shard name (content-addressed reuse)
    before = root["segments"]
    t.merge(
        spark.createDataFrame(
            [("k3", 3, "v3x", "U", 100)],
            "k string, seq int, v string, op string, lsn long",
        ),
        key_cols=["k"],
    )
    after = _root(t)["segments"]
    changed = [b for b in before if before[b] != after.get(b)]
    assert len(changed) == 1
    unchanged = [b for b in before if b not in changed]
    assert unchanged and all(before[b] == after[b] for b in unchanged)
    assert {r.v for r in t.read().filter("k='k3'").collect()} == {"v3x"}


def test_gc_removes_only_unreferenced(spark, tmp_table_dir, seg_always):
    t = _mk(spark, tmp_table_dir, ROWS)
    for i in range(3):
        t.append(spark.createDataFrame([(f"x{i}", i, "y")], SCHEMA))
    n_roots = len(mf.available_versions(t.table_dir))
    assert n_roots >= 4
    res = t.expire_snapshots(keep_last=1)
    assert res["expired_versions"]
    # default grace keeps everything young; explicit zero-grace sweep
    removed = mf.gc_segments(t.table_dir, grace_seconds=0)
    assert removed
    # the retained head remains fully readable
    m = t.manifest()
    assert len(m.files) > 0
    assert t.read().count() == 19
    # every shard the head references survived
    for s in mf.root_segment_names(t.table_dir, t.current_version()):
        assert os.path.exists(os.path.join(mf.segment_dir(t.table_dir), s))
    # idempotent
    assert mf.gc_segments(t.table_dir, grace_seconds=0) == []


def test_branch_survives_main_gc(spark, tmp_table_dir, seg_always):
    t = _mk(spark, tmp_table_dir, ROWS)
    b = t.create_branch("audit")
    fork = b.current_version()
    # main advances past the fork and expires it
    t.append(spark.createDataFrame([("z", 99, "z")], SCHEMA))
    t.expire_snapshots(keep_last=1)
    mf.gc_segments(t.table_dir, grace_seconds=0)
    # branch still reads its fork-point state via its own hard links
    assert b.read(version=fork).count() == 16
    assert b.read().count() == 16


def test_mixed_format_history(spark, tmp_table_dir, monkeypatch):
    # format-1 commits first (threshold high) ...
    monkeypatch.setattr(mf, "SEGMENT_THRESHOLD", 10**9)
    t = _mk(spark, tmp_table_dir, ROWS)
    v1 = t.current_version()
    assert "files" in _root(t, v1)
    # ... then format-2 (threshold low); both readable, time travel OK
    monkeypatch.setattr(mf, "SEGMENT_THRESHOLD", 1)
    t.append(spark.createDataFrame([("z", 99, "z")], SCHEMA))
    assert _root(t)["format_version"] == 2
    assert t.read(version=v1).count() == 16
    assert t.read().count() == 17


def test_identical_content_converges(tmp_path):
    d = str(tmp_path)
    c = mf._segment_content(
        [mf.DataFile(path="data/a.parquet", bucket=0, schema_id=1)]
    )
    n1 = mf._write_segment(d, c)
    n2 = mf._write_segment(d, c)
    assert n1 == n2
    assert os.listdir(mf.segment_dir(d)) == [n1]


def test_concurrent_merge_vs_compact_segmented(spark, tmp_table_dir, seg_always):
    """The commit-race guarantees hold under format 2: a stream of
    LSN-gated merges racing a compaction loop, every batch exactly
    once, final state = serial replay, with every commit going through
    shard write/reuse and the read cache."""
    import threading

    from dexspark.lake.table import CommitConflict

    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, bucket_key="k", num_buckets=4
    )
    t.append(
        spark.createDataFrame([(f"k{i}", 0, "v0") for i in range(20)], SCHEMA)
    )
    n_batches, errors = 6, []
    done = threading.Event()

    def merger():
        try:
            for b in range(n_batches):
                rows = [
                    (f"k{i}", b + 1, f"v{b + 1}", "U", b * 100 + i)
                    for i in range(20)
                ]
                t.merge(
                    spark.createDataFrame(
                        rows,
                        "k string, seq int, v string, op string, lsn long",
                    ),
                    key_cols=["k"],
                    summary={"batch_id": f"mb{b}"},
                )
        except Exception as e:  # pragma: no cover
            errors.append(e)
        finally:
            done.set()

    def maintainer():
        while not done.is_set():
            try:
                t.compact(min_files_per_bucket=1)
            except CommitConflict:
                pass
            done.wait(1.0)

    threads = [
        threading.Thread(target=merger), threading.Thread(target=maintainer)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    assert not errors, errors
    ids = {
        m.summary.get("batch_id")
        for m in t.history()
        if str(m.summary.get("batch_id", "")).startswith("mb")
    }
    assert ids == {f"mb{b}" for b in range(n_batches)}
    got = {(r.k, r.seq, r.v) for r in t.read().collect()}
    assert got == {(f"k{i}", n_batches, f"v{n_batches}") for i in range(20)}
    assert _root(t)["format_version"] == 2
