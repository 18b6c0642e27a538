"""Invariants for the deterministic sampling/splitting/chunking/packing
family (dexspark.functions.sampling).

The property that matters at scale is LAYOUT INDEPENDENCE: every
assignment must be a pure function of the row, so repartitioning the
input (what AQE, retries, or a different cluster size effectively do)
cannot move a document between splits, samples, chunks, or packs.
"""

import pytest
from pyspark.sql import functions as F

from dexspark.functions.sampling import (
    HASH_SPACE,
    context_chunks,
    pack_sequences,
    split_assign,
    split_thresholds,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, ("word%d " % (i % 7)) * (5 + i % 40), ["en", "zh", "es"][i % 3])
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


FR = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_split_total_and_disjoint(docs):
    out = split_assign(docs, "doc_id", FR)
    per = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        F.count("*").alias("n")).collect()}
    assert sum(per.values()) == 300
    # every named split is populated at this size and roughly sized
    assert per["train"] > per["val"] and per["train"] > per["test"]


def test_split_layout_independent(docs):
    a = {r["doc_id"]: r["split"] for r in split_assign(docs, "doc_id", FR).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in split_assign(docs.repartition(7), "doc_id", FR).collect()
    }
    assert a == b


def test_split_append_consistent(docs):
    """A doc's split does not depend on which other docs are present."""
    full = {r["doc_id"]: r["split"] for r in split_assign(docs, "doc_id", FR).collect()}
    half = {
        r["doc_id"]: r["split"]
        for r in split_assign(docs.where("doc_id < 150"), "doc_id", FR).collect()
    }
    assert all(full[k] == v for k, v in half.items())


def test_split_thresholds_monotone():
    t = split_thresholds(FR)
    assert t == sorted(t) and all(0 < x < HASH_SPACE for x in t)
    # fractions sum > 1 is rejected before any plan is built
    with pytest.raises(ValueError):
        split_assign(None, "k", {"a": 0.9, "b": 0.2})
    with pytest.raises(ValueError):
        split_assign(None, "k", {})


def test_stratified_sample_subset_and_deterministic(docs):
    kept = stratified_sample(docs, "doc_id", {"en": 0.3}, "lang", 1.0)
    ids = {r["doc_id"] for r in kept.collect()}
    ids2 = {
        r["doc_id"]
        for r in stratified_sample(
            docs.repartition(5), "doc_id", {"en": 0.3}, "lang", 1.0
        ).collect()
    }
    assert ids == ids2
    # non-en strata kept whole; en strictly thinned at this size
    n_en_all = docs.where("lang = 'en'").count()
    n_en_kept = kept.where("lang = 'en'").count()
    assert 0 < n_en_kept < n_en_all
    assert kept.where("lang != 'en'").count() == docs.where("lang != 'en'").count()


def test_context_chunks_reconstruct_no_overlap(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghij" * 25), (2, "xy"), (3, "")],
        "doc_id long, text string",
    )
    ch = context_chunks(df, size=100, overlap=0).orderBy("doc_id", "chunk_idx")
    rows = ch.collect()
    # empty doc emits nothing
    assert {r["doc_id"] for r in rows} == {1, 2}
    rebuilt = "".join(r["chunk"] for r in rows if r["doc_id"] == 1)
    assert rebuilt == "abcdefghij" * 25


def test_context_chunks_overlap_prefix_property(spark):
    text = "".join(chr(97 + i % 26) for i in range(337))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = context_chunks(df, size=120, overlap=20).orderBy("chunk_idx").collect()
    stride = 100
    for r in rows:
        start = r["chunk_idx"] * stride
        assert r["chunk"] == text[start : start + 120]
    # coverage: last chunk reaches the end of the text
    last = rows[-1]
    assert last["chunk_idx"] * stride + last["chunk_len"] == len(text)


def test_context_chunks_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        context_chunks(df, size=10, overlap=10)


def test_pack_sequences_bounds_and_determinism(docs):
    sized = docs.select("doc_id", F.length("text").cast("long").alias("n_tok"))
    budget = 500
    packed = pack_sequences(sized, "n_tok", budget, ("doc_id",), n_shards=4)
    agg = (
        packed.groupBy("shard", "pack_id")
        .agg(F.sum("n_tok").alias("tot"), F.max("n_tok").alias("mx"))
        .collect()
    )
    # next-fit-with-overflow: a pack holds docs whose PRIOR cumsum is in
    # [pack*budget, (pack+1)*budget), so its total is < budget + its
    # largest member
    for r in agg:
        assert r["tot"] < budget + r["mx"]
    a = {(r["doc_id"]): (r["shard"], r["pack_id"]) for r in packed.collect()}
    b = {
        (r["doc_id"]): (r["shard"], r["pack_id"])
        for r in pack_sequences(
            sized.repartition(9), "n_tok", budget, ("doc_id",), n_shards=4
        ).collect()
    }
    assert a == b


def test_pack_sequences_contiguous_in_order(docs):
    """Within a shard, pack_id is non-decreasing in doc order — packs
    are contiguous runs, never interleaved."""
    sized = docs.select("doc_id", F.length("text").cast("long").alias("n_tok"))
    packed = pack_sequences(sized, "n_tok", 500, ("doc_id",), n_shards=4)
    for shard in range(4):
        seq = [
            r["pack_id"]
            for r in packed.where(F.col("shard") == shard)
            .orderBy("doc_id")
            .collect()
        ]
        assert seq == sorted(seq)


def test_source_cap_sample_caps_heads_keeps_tails(docs):
    from dexspark.functions.sampling import source_cap_sample

    # lang distribution is uniform thirds (100 each); cap at 40:
    # every stratum is over the cap, expected keep ≈ 40 per lang
    kept = source_cap_sample(docs, "doc_id", "lang", cap=40)
    per = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    for lang, n in per.items():
        assert 20 <= n <= 60, (lang, n)  # ~40 expected, binomial spread

    # cap above every count → identity (whole corpus passes, exactly)
    whole = source_cap_sample(docs, "doc_id", "lang", cap=1000)
    assert whole.count() == docs.count()

    # membership is layout-independent and a subset of the input
    a = {r["doc_id"] for r in kept.collect()}
    b = {
        r["doc_id"]
        for r in source_cap_sample(
            docs.repartition(11), "doc_id", "lang", cap=40
        ).collect()
    }
    assert a == b
    assert a <= {r["doc_id"] for r in docs.collect()}


def test_source_cap_sample_append_monotone(docs):
    """Growing a source can only shrink its threshold: a row kept at
    the larger corpus was also kept at the smaller one (the cap gets
    SHARED across more rows, it never admits new ones)."""
    from dexspark.functions.sampling import source_cap_sample

    small = docs.where(F.col("doc_id") < 150)
    kept_small = {
        r["doc_id"]
        for r in source_cap_sample(small, "doc_id", "lang", cap=30).collect()
    }
    kept_big = {
        r["doc_id"]
        for r in source_cap_sample(docs, "doc_id", "lang", cap=30).collect()
    }
    assert {i for i in kept_big if i < 150} <= kept_small
