"""Tags: immutable named snapshots, retention-exempt until dropped
(≙ Iceberg tags — the reproducibility pin a training run records)."""

import os

import pytest
from pyspark.sql.types import StringType, StructField, StructType

from dexspark.lake import LakeTable

SCHEMA = StructType(
    [StructField("k", StringType()), StructField("v", StringType())]
)


def _mk(spark, tmp_path, name="tbl"):
    return LakeTable.create(
        spark, os.path.join(str(tmp_path), name), SCHEMA, "k", num_buckets=4
    )


def _row(spark, t, k, v):
    t.append(spark.createDataFrame([(k, v)], SCHEMA))


def test_tag_read_and_expiry_exemption(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _row(spark, t, "a", "1")
    pinned = t.current_version()
    t.tag("train-v1")
    assert t.resolve_tag("train-v1") == pinned
    _row(spark, t, "b", "2")
    _row(spark, t, "c", "3")
    t.expire_snapshots(keep_last=1)
    # the tagged snapshot still reads exactly; untagged mid versions gone
    assert {(r.k, r.v) for r in t.read(tag="train-v1").collect()} == {("a", "1")}
    with pytest.raises(FileNotFoundError):
        t.manifest(pinned + 1)
    # after drop_tag the pin ages out on the next expiry
    t.drop_tag("train-v1")
    t.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        t.read(tag="train-v1")


def test_tag_data_files_survive_expiry(spark, tmp_path):
    """The exemption covers DATA files too: a compaction rewrites every
    bucket, then expiry — the tagged snapshot's pre-compaction files
    must not be reclaimed."""
    t = _mk(spark, tmp_path)
    _row(spark, t, "a", "1")
    _row(spark, t, "b", "2")
    t.tag("pin")
    pinned_rows = {(r.k, r.v) for r in t.read(tag="pin").collect()}
    t.compact(min_files_per_bucket=1)
    _row(spark, t, "c", "3")
    t.expire_snapshots(keep_last=1)
    t.vacuum_orphans(older_than_seconds=0)
    assert {(r.k, r.v) for r in t.read(tag="pin").collect()} == pinned_rows


def test_tag_immutability_and_errors(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _row(spark, t, "a", "1")
    t.tag("x")
    with pytest.raises(ValueError, match="already exists"):
        t.tag("x")  # tags never move silently
    with pytest.raises(FileNotFoundError):
        t.resolve_tag("nope")
    with pytest.raises(FileNotFoundError):
        t.tag("y", version=999)
    with pytest.raises(ValueError, match="branch name"):
        t.tag("bad/name")
    with pytest.raises(ValueError):
        t.read(version=1, tag="x")  # mutually exclusive
    assert t.list_tags() == {"x": t.current_version()}
    br = t.create_branch("b")
    with pytest.raises(ValueError, match="main"):
        br.tag("z")


def test_cli_tag(spark, tmp_path, capsys):
    import json

    from dexspark.__main__ import main

    t = _mk(spark, tmp_path)
    _row(spark, t, "a", "1")
    d = t.table_dir
    assert main(["tag", "create", "--table", d, "--name", "rel"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"operation": "tag", "tag": "rel", "version": t.current_version()}
    assert main(["tag", "list", "--table", d]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["tags"] == {"rel": t.current_version()}
    assert main(["tag", "drop", "--table", d, "--name", "rel"]) == 0
    assert t.list_tags() == {}
