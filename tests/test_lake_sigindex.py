"""Incrementally-maintained MinHash signature index
(dexspark/lake/sigindex.py).

Invariants under test:
1. after any sequence of inserts/updates/deletes, the index equals
   the from-scratch signature table of the source head (the batch
   path), so candidate pairs are identical by construction;
2. refresh is exactly-once (re-running no-ops) and resumable (a
   skipped refresh catches up in one merge);
3. updates REPLACE signatures (stale signatures would fabricate or
   miss pairs); deletes and text->NULL updates evict them;
4. retention gap (expire_snapshots past the last refresh) triggers
   the rebuild fallback instead of silent divergence.
"""

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import _parse_datatype_string

from dexspark.functions.dedup import minhash_signatures
from dexspark.lake import (
    LakeTable,
    create_signature_index,
    near_dup_pairs_via_index,
    refresh_signature_index,
)

DDL = "doc_id bigint, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DDL)


def _mk(spark, d):
    src = LakeTable.create(
        spark, str(d / "src"), _parse_datatype_string(DDL), "doc_id", 4
    )
    idx = create_signature_index(spark, str(d / "idx"), src)
    return src, idx


def _apply(src, df, op, lsn, batch_id):
    src.merge(
        df.withColumn("op", F.lit(op)).withColumn(
            "lsn", F.lit(lsn).cast("long")
        ),
        key_cols=["doc_id"],
        summary={"batch_id": batch_id},
    )


def _index_equals_batch(src, idx):
    live = src.read().select("doc_id", "text")
    want = sorted(
        minhash_signatures(live).collect(), key=lambda r: r.doc_id
    )
    got = sorted(idx.read().collect(), key=lambda r: r.doc_id)
    return [(r.doc_id, r.minhash) for r in want] == [
        (r.doc_id, r.minhash) for r in got
    ]


TEXTS = [
    "the quick brown fox jumps over the lazy dog again and again",
    "the quick brown fox jumps over the lazy dog again and again!",
    "a completely different document about spark shuffle partitions",
    "yet another unrelated text concerning parquet row group sizes",
]


def test_lifecycle_matches_batch_path(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sigidx")
    src, idx = _mk(spark, d)
    _apply(src, _docs(spark, [(0, TEXTS[0]), (2, TEXTS[2])]), "I", 1, "b1")
    assert refresh_signature_index(src, idx)["index_mode"] == "incremental"
    assert _index_equals_batch(src, idx)

    # update doc 2's text + insert a near-dup of doc 0
    _apply(src, _docs(spark, [(1, TEXTS[1]), (2, TEXTS[3])]), "U", 2, "b2")
    assert refresh_signature_index(src, idx)["index_mode"] == "incremental"
    assert _index_equals_batch(src, idx)

    # delete doc 2
    _apply(src, _docs(spark, [(2, TEXTS[3])]), "D", 3, "b3")
    refresh_signature_index(src, idx)
    assert _index_equals_batch(src, idx)
    assert idx.read().filter(F.col("doc_id") == 2).count() == 0

    pairs = near_dup_pairs_via_index(
        idx, src.read(), num_hashes=64, bands=32
    ).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(0, 1)]


def test_refresh_exactly_once_and_catchup(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sigidx")
    src, idx = _mk(spark, d)
    _apply(src, _docs(spark, [(0, TEXTS[0])]), "I", 1, "b1")
    assert refresh_signature_index(src, idx) is not None
    assert refresh_signature_index(src, idx) is None  # no-op re-run
    v_before = idx.manifest().version
    # two source batches with NO refresh in between: one merge catches up
    _apply(src, _docs(spark, [(1, TEXTS[1])]), "I", 2, "b2")
    _apply(src, _docs(spark, [(2, TEXTS[2])]), "I", 3, "b3")
    info = refresh_signature_index(src, idx)
    assert info["index_mode"] == "incremental"
    assert idx.manifest().version == v_before + 1
    assert _index_equals_batch(src, idx)


def test_update_replaces_signature(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sigidx")
    src, idx = _mk(spark, d)
    _apply(src, _docs(spark, [(0, TEXTS[0]), (1, TEXTS[2])]), "I", 1, "b1")
    refresh_signature_index(src, idx)
    # no pair yet; now rewrite doc 1 into a near-dup of doc 0
    assert (
        near_dup_pairs_via_index(idx, src.read(), bands=32).count() == 0
    )
    _apply(src, _docs(spark, [(1, TEXTS[1])]), "U", 2, "b2")
    refresh_signature_index(src, idx)
    pairs = near_dup_pairs_via_index(idx, src.read(), bands=32).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(0, 1)]


def test_null_text_update_mirrors_batch_path(spark, tmp_path_factory):
    """A text -> NULL update must leave the index in exactly the state
    the batch path would compute: the doc keeps the empty-shingle
    signature (minhash_signatures never drops rows), it does NOT keep
    the stale real-text signature."""
    d = tmp_path_factory.mktemp("sigidx")
    src, idx = _mk(spark, d)
    _apply(src, _docs(spark, [(0, TEXTS[0]), (1, TEXTS[1])]), "I", 1, "b1")
    refresh_signature_index(src, idx)
    before = idx.read().filter(F.col("doc_id") == 1).head().minhash
    _apply(src, _docs(spark, [(1, None)]), "U", 2, "b2")
    refresh_signature_index(src, idx)
    after = idx.read().filter(F.col("doc_id") == 1).head().minhash
    assert after != before
    assert _index_equals_batch(src, idx)


def test_retention_gap_falls_back_to_rebuild(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sigidx")
    src, idx = _mk(spark, d)
    _apply(src, _docs(spark, [(0, TEXTS[0])]), "I", 1, "b1")
    refresh_signature_index(src, idx)
    _apply(src, _docs(spark, [(1, TEXTS[1])]), "I", 2, "b2")
    _apply(src, _docs(spark, [(2, TEXTS[2])]), "I", 3, "b3")
    src.expire_snapshots(keep_last=1)
    info = refresh_signature_index(src, idx)
    assert info["index_mode"] == "rebuild"
    assert _index_equals_batch(src, idx)


def test_ingest_dedup_gate(spark, tmp_path_factory):
    from dexspark.lake import ingest_dedup_gate

    d = tmp_path_factory.mktemp("sigidx")
    src, idx = _mk(spark, d)
    _apply(src, _docs(spark, [(0, TEXTS[0]), (2, TEXTS[2])]), "I", 1, "b1")
    refresh_signature_index(src, idx)
    # incoming batch: one near-dup of corpus doc 0, one fresh doc
    incoming = _docs(spark, [(10, TEXTS[1]), (11, TEXTS[3])])
    hits = ingest_dedup_gate(
        idx, src.read(), incoming, num_hashes=64, bands=32
    ).collect()
    assert [(r.id_corpus, r.id_new) for r in hits] == [(0, 10)]
    assert all(r.jaccard_x1000 >= 800 for r in hits)


def test_create_validates_id_col(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sigidx")
    src = LakeTable.create(
        spark, str(d / "src"), _parse_datatype_string(DDL), "doc_id", 4
    )
    with pytest.raises(ValueError, match="not in source schema"):
        create_signature_index(spark, str(d / "idx"), src, id_col="nope")


def test_streaming_subscription_keeps_index_current(
    spark, tmp_path_factory
):
    """SigIndexSpec in CdcStreamReplay(views=[...]): a documents-shaped
    change stream (validation checks bind to the columns the payload
    actually has) keeps the near-dup index within one trigger of the
    table, across a checkpoint resume."""
    import os

    from dexspark.cdc.validate import ValidationConfig
    from dexspark.lake.sigindex import SigIndexSpec
    from dexspark.streaming.replay import CdcStreamReplay

    d = tmp_path_factory.mktemp("sigidx_stream")
    src, idx = _mk(spark, d)
    log_dir = str(d / "log")
    cfg = ValidationConfig(key_cols=("doc_id",))

    def replay():
        return CdcStreamReplay(
            spark,
            src,
            log_dir,
            str(d / "checkpoint"),
            _parse_datatype_string("lsn long, op string, " + DDL),
            cfg=cfg,
            views=[SigIndexSpec(idx)],
        )

    seg1 = _docs(spark, [(0, TEXTS[0]), (2, TEXTS[2])]).select(
        F.lit(1).cast("long").alias("lsn"), F.lit("I").alias("op"), "*"
    )
    seg1.coalesce(1).write.parquet(log_dir, mode="append")
    r1 = replay()
    r1.run_available()
    assert _index_equals_batch(src, idx)
    assert any(r.get("trigger") == "view_refresh" for r in r1.results)

    # second segment arrives later: insert a near-dup, delete doc 2
    seg2 = _docs(spark, [(1, TEXTS[1])]).select(
        F.lit(2).cast("long").alias("lsn"), F.lit("I").alias("op"), "*"
    ).unionByName(
        _docs(spark, [(2, TEXTS[2])]).select(
            F.lit(3).cast("long").alias("lsn"), F.lit("D").alias("op"), "*"
        )
    )
    seg2.coalesce(1).write.parquet(log_dir, mode="append")
    replay().run_available()  # checkpoint resume
    assert _index_equals_batch(src, idx)
    pairs = near_dup_pairs_via_index(
        idx, src.read(), num_hashes=64, bands=32
    ).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(0, 1)]


def test_maintenance_only_source_version_advances_ledger(
    spark, tmp_path_factory
):
    """A source compact() (layout-only version) must advance the
    index's maintained watermark via an empty merge — not leave the
    refresh re-diffing the same gap forever."""
    d = tmp_path_factory.mktemp("sigidx")
    src, idx = _mk(spark, d)
    _apply(src, _docs(spark, [(0, TEXTS[0]), (1, TEXTS[2])]), "I", 1, "b1")
    refresh_signature_index(src, idx)
    src.compact(min_files_per_bucket=1)
    info = refresh_signature_index(src, idx)
    assert info is not None and info["change_rows"] == 0
    assert refresh_signature_index(src, idx) is None
    assert _index_equals_batch(src, idx)
