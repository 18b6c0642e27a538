"""CommitStore: the pluggable create-if-absent commit protocol
(lake/commitstore.py). Both implementations — POSIX link(2) and the
object-store catalog-swap model — must satisfy the same contract:
exactly one winner per final name, losers raised FileExistsError,
content-addressed publishes idempotent, crashed winners recoverable.
The catalog store additionally runs under the real table-level
concurrency races from test_concurrent_commits.py."""

import json
import os
import threading

import pytest

from dexspark.lake import commitstore as cs
from dexspark.lake import manifest as mf

STORES = [cs.PosixLinkStore(), cs.CatalogSwapStore()]
IDS = ["posix", "catalog"]


def _tmpfile(d, body):
    p = os.path.join(d, f".tmp-{body}")
    with open(p, "w") as fh:
        fh.write(body)
    return p


@pytest.mark.parametrize("store", STORES, ids=IDS)
def test_publish_exactly_one_winner(tmp_path, store):
    d = str(tmp_path)
    final = os.path.join(d, "v00000001.json")
    t1 = _tmpfile(d, "winner")
    t2 = _tmpfile(d, "loser")
    store.publish(t1, final)
    with pytest.raises(FileExistsError):
        store.publish(t2, final)
    with open(final) as fh:
        assert fh.read() == "winner"


@pytest.mark.parametrize("store", STORES, ids=IDS)
def test_publish_racing_threads_single_winner(tmp_path, store):
    d = str(tmp_path)
    final = os.path.join(d, "v00000042.json")
    n = 16
    barrier = threading.Barrier(n)
    outcomes = [None] * n

    def worker(i):
        t = _tmpfile(d, f"w{i}")
        barrier.wait(timeout=60)
        try:
            store.publish(t, final)
            outcomes[i] = "won"
        except FileExistsError:
            outcomes[i] = "lost"
        finally:
            os.unlink(t)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(60)
    assert outcomes.count("won") == 1, outcomes
    assert outcomes.count("lost") == n - 1
    with open(final) as fh:
        assert fh.read() == f"w{outcomes.index('won')}"


@pytest.mark.parametrize("store", STORES, ids=IDS)
def test_publish_content_idempotent(tmp_path, store):
    final = os.path.join(str(tmp_path), "segs", "seg-abc.json")
    store.publish_content(b"[1,2]", final)
    store.publish_content(b"[1,2]", final)  # no error, converged
    with open(final, "rb") as fh:
        assert fh.read() == b"[1,2]"


@pytest.mark.parametrize("store", STORES, ids=IDS)
def test_mirror_idempotent_and_independent(tmp_path, store):
    d = str(tmp_path)
    src = os.path.join(d, "src.json")
    with open(src, "w") as fh:
        fh.write("body")
    dst = os.path.join(d, "sub", "dst.json")
    os.makedirs(os.path.dirname(dst))
    store.mirror(src, dst)
    store.mirror(src, dst)  # idempotent
    os.unlink(src)  # the mirror must survive the source's removal
    with open(dst) as fh:
        assert fh.read() == "body"


def test_catalog_store_recovers_crashed_winner(tmp_path):
    """Winner dies between the CAS and the final PUT: the pointer names
    a staged object, the final name is absent. The next contender must
    FINISH the dead winner's publish before reporting its lost race."""
    store = cs.CatalogSwapStore()
    d = str(tmp_path)
    final = os.path.join(d, "v00000007.json")
    # simulate the half-done winner by hand: staged object + pointer
    staged_name = ".stage-v00000007.json-deadbeef"
    with open(os.path.join(d, staged_name), "w") as fh:
        fh.write("winner-body")
    cdir = os.path.join(d, cs.CATALOG_DIR)
    os.makedirs(cdir)
    with open(os.path.join(cdir, "v00000007.json.ptr"), "w") as fh:
        fh.write(staged_name)

    t = _tmpfile(d, "contender")
    with pytest.raises(FileExistsError):
        store.publish(t, final)
    with open(final) as fh:
        assert fh.read() == "winner-body"  # the DEAD winner's commit

    # recover() is a no-op once healed
    assert store.recover(d) == []


def test_catalog_store_recover_scans_directory(tmp_path):
    store = cs.CatalogSwapStore()
    d = str(tmp_path)
    staged_name = ".stage-v00000003.json-cafe"
    with open(os.path.join(d, staged_name), "w") as fh:
        fh.write("x")
    cdir = os.path.join(d, cs.CATALOG_DIR)
    os.makedirs(cdir)
    with open(os.path.join(cdir, "v00000003.json.ptr"), "w") as fh:
        fh.write(staged_name)
    assert store.recover(d) == ["v00000003.json"]
    assert os.path.exists(os.path.join(d, "v00000003.json"))


def test_get_store_env_selection(monkeypatch):
    monkeypatch.delenv("DEXSPARK_COMMIT_STORE", raising=False)
    assert cs.get_store().name == "posix"
    monkeypatch.setenv("DEXSPARK_COMMIT_STORE", "catalog")
    assert cs.get_store().name == "catalog"
    monkeypatch.setenv("DEXSPARK_COMMIT_STORE", "bogus")
    with pytest.raises(ValueError, match="bogus"):
        cs.get_store()


@pytest.fixture
def catalog_mode():
    cs.set_store(cs.CatalogSwapStore())
    try:
        yield
    finally:
        cs.set_store(None)


def test_table_concurrency_suite_under_catalog_store(
    spark, tmp_table_dir, catalog_mode
):
    """VERDICT r4 #2 done-criterion: the REAL table-level writer race
    (LSN-gated merges vs a compaction loop, retry-with-rebase) passes
    unchanged under the object-store commit protocol."""
    from test_concurrent_commits import (
        test_merge_vs_compact_threads_both_land,
    )

    test_merge_vs_compact_threads_both_land(spark, tmp_table_dir)


def test_disjoint_merges_under_catalog_store(
    spark, tmp_table_dir, catalog_mode
):
    from test_concurrent_commits import (
        test_disjoint_bucket_merges_rebase_without_recompute,
    )

    test_disjoint_bucket_merges_rebase_without_recompute(
        spark, tmp_table_dir
    )


def test_segmented_commits_under_catalog_store(
    spark, tmp_table_dir, catalog_mode, monkeypatch
):
    """Format-2 segmented manifests (content-addressed shards + root)
    publish correctly through the catalog-swap store, including shard
    reuse across commits."""
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from dexspark.lake.table import LakeTable

    monkeypatch.setattr(mf, "SEGMENT_THRESHOLD", 1)  # force format 2
    schema = StructType(
        [StructField("k", StringType()), StructField("n", IntegerType())]
    )
    t = LakeTable.create(spark, tmp_table_dir, schema, "k", num_buckets=4)
    t.append(spark.createDataFrame([("a", 1), ("b", 2)], schema))
    t.append(spark.createDataFrame([("c", 3)], schema))
    got = {(r.k, r.n) for r in t.read().collect()}
    assert got == {("a", 1), ("b", 2), ("c", 3)}
    # roots are format 2 and shards exist on disk
    with open(mf.manifest_path(tmp_table_dir, t.current_version())) as fh:
        root = json.load(fh)
    assert root["format_version"] == 2 and root["segments"]
    for s in set(root["segments"].values()):
        assert os.path.exists(os.path.join(mf.segment_dir(tmp_table_dir), s))


def test_branch_and_tag_under_catalog_store(spark, tmp_table_dir, catalog_mode):
    from pyspark.sql.types import StringType, StructField, StructType

    from dexspark.lake.table import LakeTable

    schema = StructType([StructField("k", StringType())])
    t = LakeTable.create(spark, tmp_table_dir, schema, "k", num_buckets=2)
    t.append(spark.createDataFrame([("a",)], schema))
    t.tag("rel")
    with pytest.raises(ValueError, match="already exists"):
        t.tag("rel")
    b = t.create_branch("audit")
    with pytest.raises(ValueError, match="already exists"):
        t.create_branch("audit")
    assert {r.k for r in b.read().collect()} == {"a"}


def test_catalog_winner_survives_helpful_loser_finishing_first(tmp_path):
    """The zero-winner race (caught by the 16-thread matrix under
    co-tenant load): a racer that loses the CAS immediately runs
    commit recovery, and if it lands between the winner's CAS and the
    winner's final PUT it moves the winner's staged object to the
    final name FIRST. The winner's publish must then still return
    success — the CAS is the commit point and the published bytes are
    its own — not surface FileNotFoundError and report a won race as
    a failure. Reproduced deterministically by injecting the helper's
    _finish() right before the winner's step-3 move."""
    store = cs.CatalogSwapStore()
    d = str(tmp_path)
    final = os.path.join(d, "v00000009.json")
    t = _tmpfile(d, "winner-bytes")
    real_replace = os.replace
    state = {"helped": False}

    def racing_replace(src, dst, *a, **kw):
        if dst == final and not state["helped"]:
            state["helped"] = True
            # the helpful loser heals the "dead" winner first
            store._finish(store._ptr(final), final)
        return real_replace(src, dst, *a, **kw)

    from unittest import mock

    with mock.patch.object(cs.os, "replace", racing_replace):
        store.publish(t, final)  # must NOT raise
    assert state["helped"]
    with open(final) as fh:
        assert fh.read() == "winner-bytes"
    # and a later racer still loses cleanly
    t2 = _tmpfile(d, "late")
    with pytest.raises(FileExistsError):
        store.publish(t2, final)
