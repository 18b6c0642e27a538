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


def test_streaming_catalog_pins_trigger_aligned(spark, tmp_table_dir):
    """CatalogPinSpec rides the replay LAST in the views list: each
    applied micro-batch publishes one pin set under which the rollup
    view exactly matches the transcripts — consistency holds at EVERY
    retained catalog version, not just head."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import _parse_datatype_string

    from dexspark.cdc.generator import gen_change_log
    from dexspark.lake.catalog import CatalogPinSpec
    from dexspark.lake.matview import AggViewSpec, create_agg_view
    from dexspark.streaming.replay import CdcStreamReplay

    payload = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    table = LakeTable.create(
        spark,
        os.path.join(tmp_table_dir, "transcripts"),
        _parse_datatype_string(payload),
        "conv_id",
        8,
    )
    group, sums = ["conv_id"], {"sum_len": "length(text)"}
    view = create_agg_view(
        spark, os.path.join(tmp_table_dir, "rollup"), table, group, sums, 4
    )
    cat = Catalog.create(
        spark,
        os.path.join(tmp_table_dir, "cat"),
        {"transcripts": table, "rollup": view},
    )
    log = gen_change_log(spark, 2000, n_convs=30, n_batches=2)
    log_dir = os.path.join(tmp_table_dir, "log")
    log.coalesce(2).write.parquet(log_dir)
    replay = CdcStreamReplay(
        spark,
        table,
        log_dir,
        os.path.join(tmp_table_dir, "cp"),
        _parse_datatype_string("lsn long, op string, batch_seq long, " + payload),
        views=[
            AggViewSpec(view, group, sums),
            CatalogPinSpec(cat, ["transcripts", "rollup"]),
        ],
    )
    replay.run_available()
    pinned = [r for r in replay.results if r.get("operation") == "catalog_pin"]
    assert pinned, "no pin commits recorded"
    # consistency at every pin, including historical ones
    for cv in cat.versions():
        if cv == 0:
            continue
        t = cat.read("transcripts", version=cv)
        v = cat.read("rollup", version=cv).select("conv_id", "n_rows", "sum_len")
        rec = t.groupBy("conv_id").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.length("text")).alias("sum_len"),
        )
        assert v.exceptAll(rec).count() == 0
        assert rec.exceptAll(v).count() == 0
    # nothing moved since the last pin -> spec no-ops
    assert CatalogPinSpec(cat, ["transcripts", "rollup"]).refresh(table) is None


def test_cli_catalog(spark, tmp_table_dir, capsys):
    import json as _json

    from dexspark.__main__ import main

    a, b = _pair(spark, tmp_table_dir)
    cat_dir = os.path.join(tmp_table_dir, "cat")
    assert main([
        "catalog", "create", "--dir", cat_dir,
        "--tables", f"a={a.table_dir}", f"b={b.table_dir}",
    ]) == 0
    a.append(spark.createDataFrame([("y", 2)], DDL))
    assert main(["catalog", "commit", "--dir", cat_dir, "--members", "a"]) == 0
    assert main(["catalog", "show", "--dir", cat_dir]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    shown = _json.loads(out[-1])
    assert shown["catalog_version"] == 1
    assert shown["tables"]["a"]["version"] == a.current_version()


def test_read_kwargs_passthrough(spark, tmp_table_dir):
    a, b = _pair(spark, tmp_table_dir)
    cat = Catalog.create(
        spark, os.path.join(tmp_table_dir, "cat"), {"a": a, "b": b}
    )
    df = cat.read("a", columns=["k"])
    assert df.columns == ["k"]


def test_catalog_expire_keeps_newest_pins(spark, tmp_table_dir):
    a, b = _pair(spark, tmp_table_dir)
    cat = Catalog.create(
        spark, os.path.join(tmp_table_dir, "cat"), {"a": a, "b": b}
    )
    for i in range(4):
        a.append(spark.createDataFrame([(f"r{i}", i)], DDL))
        cat.commit({"a": None})
    dropped = cat.expire(keep_last=2)
    assert dropped == [0, 1, 2]
    assert cat.versions() == [3, 4]
    # dropped pins no longer protect their snapshots
    assert cat.protected_versions("a") == {
        cat.pins(3)["a"]["version"],
        cat.pins(4)["a"]["version"],
    }
    assert cat.read("a").count() == 5
