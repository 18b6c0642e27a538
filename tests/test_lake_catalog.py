"""Multi-table atomic catalog (lake/catalog.py): pin-set commits,
consistent cross-table reads, loss-handling on racing commits, and
retention protection for pinned versions."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import _parse_datatype_string

from dexspark.lake.catalog import Catalog
from dexspark.lake.table import LakeTable

DDL = "k string, v int"


def _pair(spark, d):
    a = LakeTable.create(
        spark, os.path.join(d, "a"), _parse_datatype_string(DDL), "k", 2
    )
    b = LakeTable.create(
        spark, os.path.join(d, "b"), _parse_datatype_string(DDL), "k", 2
    )
    a.append(spark.createDataFrame([("x", 1)], DDL))
    b.append(spark.createDataFrame([("x", 10)], DDL))
    return a, b


def test_create_pins_heads_and_read_travels(spark, tmp_table_dir):
    a, b = _pair(spark, tmp_table_dir)
    cat = Catalog.create(
        spark, os.path.join(tmp_table_dir, "cat"), {"a": a, "b": b}
    )
    v0 = cat.current_version()
    # tables advance; the catalog pin does not move until commit
    a.append(spark.createDataFrame([("y", 2)], DDL))
    assert cat.read("a").count() == 1
    cv = cat.commit({"a": None})
    assert cv == v0 + 1
    assert cat.read("a").count() == 2
    # catalog time travel: the old pin set still reads the old state
    assert cat.read("a", version=v0).count() == 1
    # unmentioned member carried its pin
    assert cat.pins()["b"]["version"] == b.current_version()


def test_commit_is_all_or_nothing_per_version(spark, tmp_table_dir):
    a, b = _pair(spark, tmp_table_dir)
    cat = Catalog.create(
        spark, os.path.join(tmp_table_dir, "cat"), {"a": a, "b": b}
    )
    a.append(spark.createDataFrame([("y", 2)], DDL))
    b.append(spark.createDataFrame([("y", 20)], DDL))
    before = cat.current_version()
    cat.commit({"a": None, "b": None})
    # a reader holding a catalog version sees either both updates or
    # neither: at `before`, both old; at head, both new
    assert cat.read("a", version=before).count() == 1
    assert cat.read("b", version=before).count() == 1
    assert cat.read("a").count() == 2
    assert cat.read("b").count() == 2


def test_commit_race_loses_cleanly(spark, tmp_table_dir):
    a, b = _pair(spark, tmp_table_dir)
    d = os.path.join(tmp_table_dir, "cat")
    cat1 = Catalog.create(spark, d, {"a": a, "b": b})
    cat2 = Catalog(spark, d)
    a.append(spark.createDataFrame([("y", 2)], DDL))
    # both writers read base, first publish wins, second must raise
    base = cat1.current_version()
    cat1.commit({"a": None})
    pins = cat2.pins(base)
    with pytest.raises(FileExistsError):
        cat2._publish(base + 1, pins)
    # retry from the new head succeeds
    assert cat2.commit({"b": None}) == base + 2


def test_validation_errors(spark, tmp_table_dir):
    a, b = _pair(spark, tmp_table_dir)
    cat = Catalog.create(
        spark, os.path.join(tmp_table_dir, "cat"), {"a": a, "b": b}
    )
    with pytest.raises(ValueError, match="not catalog members"):
        cat.commit({"zzz": None})
    with pytest.raises(ValueError, match="not available"):
        cat.commit({"a": 999})
    with pytest.raises(ValueError, match="no table"):
        cat.read("zzz")
    with pytest.raises(ValueError, match="already exists"):
        Catalog.create(spark, os.path.join(tmp_table_dir, "cat"), {"a": a})


def test_protected_versions_survive_expiry(spark, tmp_table_dir):
    a, b = _pair(spark, tmp_table_dir)
    cat = Catalog.create(
        spark, os.path.join(tmp_table_dir, "cat"), {"a": a, "b": b}
    )
    pinned_v = cat.pins()["a"]["version"]
    for i in range(3):
        a.append(spark.createDataFrame([(f"r{i}", i)], DDL))
    prot = cat.protected_versions("a")
    assert pinned_v in prot
    info = a.expire_snapshots(keep_last=1, keep_versions=prot)
    assert pinned_v not in info["expired_versions"]
    # the pinned snapshot still reads exactly
    assert cat.read("a", version=cat.versions()[0]).count() == 1
    # contrast: without protection the same pin is destroyed
    b_pinned = cat.pins()["b"]["version"]
    for i in range(3):
        b.append(spark.createDataFrame([(f"s{i}", i)], DDL))
    info = b.expire_snapshots(keep_last=1)
    assert b_pinned in info["expired_versions"]
    with pytest.raises(Exception):
        cat.read("b", version=cat.versions()[0]).count()


def test_read_kwargs_passthrough(spark, tmp_table_dir):
    a, b = _pair(spark, tmp_table_dir)
    cat = Catalog.create(
        spark, os.path.join(tmp_table_dir, "cat"), {"a": a, "b": b}
    )
    df = cat.read("a", columns=["k"])
    assert df.columns == ["k"]
