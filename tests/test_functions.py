"""Unit tests for corpus-curation functions: dedup families, text
analysis, similarity search, multimodal plumbing."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Row, functions as F


# ------------------------------------------------------------------ dedup

def test_exact_dedup(spark):
    from dexspark.functions.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "aa bb"), (2, "aa bb"), (3, "cc dd"), (4, "aa bb")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_copies for r in exact_dedup(df).collect()}
    assert out == {1: 3, 3: 1}


def test_minhash_lsh_finds_near_dups_not_distinct(spark):
    from dexspark.functions.dedup import minhash_lsh_pairs, ngram_jaccard

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different content about spark shuffle partitions and skew"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = minhash_lsh_pairs(df, num_hashes=64, bands=32)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got

    j = {(r.id_a, r.id_b): r.jaccard_x1000 for r in ngram_jaccard(df, pairs).collect()}
    assert j[(1, 2)] >= 500


def test_ngram_jaccard_exact_values(spark):
    from dexspark.functions.dedup import ngram_jaccard

    # identical docs → jaccard 1000; shingle sets equal
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = ngram_jaccard(df, pairs).collect()[0]
    assert (r.n_inter, r.n_union, r.jaccard_x1000) == (2, 2, 1000)


def test_simhash_identical_and_hamming(spark):
    from dexspark.functions.dedup import hamming_near_dups, simhash

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),  # identical → hamming 0
            (3, "zeta eta theta iota kappa"),
        ],
        "doc_id long, text string",
    )
    sigs = simhash(df).select("doc_id", "simhash")
    vals = {r.doc_id: r.simhash for r in sigs.collect()}
    assert vals[1] == vals[2]
    dups = {(r.id_a, r.id_b): r.hamming for r in hamming_near_dups(sigs).collect()}
    assert dups.get((1, 2)) == 0


# ------------------------------------------------------------------- text

def test_lang_id_markers(spark):
    from dexspark.functions.text import lang_id

    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat and it is fine"),
            (2, "le chat est sur la table et les chaises"),
            (3, "qqq www eee rrr"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.lang_pred for r in lang_id(df).collect()}
    assert out == {1: "en", 2: "fr", 3: "und"}


def test_quality_score_values(spark):
    from dexspark.functions.text import quality_score

    df = spark.createDataFrame([(1, "The cat sat.")], "doc_id long, text string")
    r = quality_score(df).collect()[0]
    assert r.n_tokens == 3
    assert r.n_chars_q == 12
    assert r.mean_word_len_x1000 == 4000
    assert r.ends_with_punct is True
    assert r.n_stopwords == 1  # 'the' (lowercased)


def test_fingerprint_normalization(spark):
    from dexspark.functions.text import fingerprint

    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "  hello world "), (3, "other")],
        "doc_id long, text string",
    )
    fp = {r.doc_id: r.fp for r in fingerprint(df).collect()}
    assert fp[1] == fp[2] != fp[3]


# -------------------------------------------------------------- similarity

def _unit(vals):
    return [float(v) for v in vals]


def test_cosine_topk_exact(spark):
    from dexspark.functions.similarity import cosine_topk

    rows = [
        (0, _unit([1, 0, 0, 0])),
        (1, _unit([0.9, 0.1, 0, 0])),   # closest to 0
        (2, _unit([0, 1, 0, 0])),       # orthogonal to 0
        (3, _unit([0.8, 0.2, 0, 0])),   # second-closest to 0
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_topk(emb, q, k=2).orderBy("rank").collect()
    assert [r.neighbor_id for r in out] == [1, 3]
    assert out[0].rank == 1 and out[1].rank == 2
    assert out[0].score_x1e6 > out[1].score_x1e6


def test_ann_lsh_same_bucket_for_identical(spark):
    from dexspark.functions.similarity import ann_lsh_topk

    rows = [(i, _unit([1.0 + 0.001 * i, 2.0, -1.0, 0.5])) for i in range(6)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ann_lsh_topk(emb, q, dim=4, k=3, n_bits=2).collect()
    # near-identical vectors share the bucket → neighbors found
    assert len(out) == 3
    assert all(r.score_x1e6 > 999_000 for r in out)


# -------------------------------------------------------------- multimodal

def test_to_media_and_extract_features(spark):
    import hashlib

    from dexspark.multimodal.media import extract_features, to_media

    df = spark.createDataFrame([(1, "hello"), (2, "")], "doc_id long, text string")
    media = to_media(df, "doc_id", "text")
    feats = {r.media_id: r for r in extract_features(media).collect()}
    assert feats[1].n_bytes == 5
    assert feats[1].sha256_hex == hashlib.sha256(b"hello").hexdigest()
    assert len(feats[1].feature) == 8
    assert feats[2].n_bytes == 0
    # deterministic fake feature: stable across calls
    again = {r.media_id: r for r in extract_features(media).collect()}
    assert again[1].feature == feats[1].feature


def test_decode_stub_strict_raises():
    from dexspark.multimodal.media import decode_stub

    with pytest.raises(NotImplementedError):
        decode_stub(b"\x00", "image", strict=True)


def test_frame_sample_fanout(spark):
    from dexspark.multimodal.media import frame_sample, to_media

    df = spark.createDataFrame(
        [(1, "x" * 3000), (2, "y" * 100)], "doc_id long, text string"
    )
    media = to_media(df, "doc_id", "text", media_type="video")
    frames = frame_sample(media, every_n_bytes=1024).collect()
    by_id: dict[int, list] = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id[1]) == 2  # 3000 // 1024
    assert len(by_id[2]) == 1  # min 1 frame
    assert bytes(by_id[1][0].frame_bytes) == b"x" * 1024


def test_minhash_signature_has_distinct_hash_functions(spark):
    """Regression: a 2-arg lambda in F.transform binds (element, index),
    which once degenerated all K minhash functions to one."""
    from dexspark.functions.dedup import minhash_signatures

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id int, text string",
    )
    sig = minhash_signatures(df, num_hashes=16).collect()[0]["minhash"]
    assert len(set(sig)) == 16


def test_ivf_topk_semantics(spark):
    """IVF: one cell per corpus vector; a probe that covers the query's
    own cell must surface an exact duplicate at rank 1 with cos=1."""
    import pyspark.sql.functions as F

    from dexspark.functions.similarity import ivf_topk

    dim = 8
    rows = [
        (i, [float((i * 37 + d * 17) % 101 - 50) for d in range(dim)])
        for i in range(40)
    ]
    rows.append((100, rows[5][1]))  # exact duplicate of vec 5
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") == 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(emb, queries, dim=dim, k=3, n_centroids=4, n_probe=2).collect()
    assert 1 <= len(out) <= 3
    by_rank = sorted(out, key=lambda r: r.rank)
    # the duplicate shares the query's cell by construction (identical
    # vector -> identical best centroid), so it MUST be found
    assert by_rank[0].neighbor_id == 100 and by_rank[0].score_x1e6 == 10**6
    scores = [r.score_x1e6 for r in by_rank]
    assert scores == sorted(scores, reverse=True)


def test_redact_pii(spark):
    from dexspark.functions.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@ex-ample.org or 555-123-4567 thanks"),
            (2, "two mails x@y.io and z@w.co, phone +1 555 987 6543"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in redact_pii(df).collect()}
    assert got[1].n_emails == 1 and got[1].n_phones == 1
    assert got[1].text_redacted == "mail me at <EMAIL> or <PHONE> thanks"
    assert got[2].n_emails == 2 and got[2].n_phones == 1
    assert "<EMAIL>" in got[2].text_redacted and "<PHONE>" in got[2].text_redacted
    assert got[3].n_emails == 0 and got[3].n_phones == 0
    assert got[3].text_redacted == "nothing sensitive here"


def test_repetition_stats(spark):
    from dexspark.functions.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),   # bigrams: ab ba ab ba ab -> 5 total, 2 distinct
            (2, "all words differ here"),
            (3, "single"),        # shorter than n -> zero grams
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(df, n=2).collect()}
    assert (got[1].n_grams, got[1].n_distinct_grams) == (5, 2)
    assert got[1].dup_gram_ratio_x1000 == 600
    assert got[2].dup_gram_ratio_x1000 == 0
    assert (got[3].n_grams, got[3].dup_gram_ratio_x1000) == (0, 0)


def test_decontaminate(spark):
    from dexspark.functions.dedup import decontaminate

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words appear in this sentence"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "we ask about the quick brown fox here")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in decontaminate(train, bench, shingle_n=3).collect()}
    assert got[1].contaminated and got[1].n_contaminated_shingles >= 2
    assert not got[2].contaminated and got[2].n_contaminated_shingles == 0


def test_connected_components_chain_and_islands(spark):
    """A 12-node path graph (worst case for plain propagation: O(n)
    rounds) must converge within the pointer-jumping bound, and
    disjoint components must not leak labels."""
    from dexspark.functions.dedup import connected_components

    chain = [(i, i + 1) for i in range(100, 111)]          # 100..111
    island = [(7, 9), (9, 3)]                              # {3, 7, 9}
    pair = [(500, 501)]                                    # {500, 501}
    edges = spark.createDataFrame(
        chain + island + pair, "id_a long, id_b long"
    )
    got = {
        r.id: r.group_id
        for r in connected_components(edges, max_iterations=8).collect()
    }
    assert {got[i] for i in range(100, 112)} == {100}
    assert got[3] == got[7] == got[9] == 3
    assert got[500] == got[501] == 500
    assert len(got) == 12 + 3 + 2  # only nodes that appear in edges


def test_near_dup_groups_transitive_keep_one(spark):
    """a-b + b-c must collapse to ONE canonical doc (the transitive
    closure pairs alone cannot express)."""
    from dexspark.functions.dedup import near_dup_groups

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 4), (0, 5)], "id_a long, id_b long"
    )
    rows = {r.doc_id: r for r in near_dup_groups(docs, pairs).collect()}
    assert rows[1].group_id == rows[2].group_id == rows[4].group_id == 1
    assert rows[1].group_size == 3
    assert rows[1].is_canonical and not rows[2].is_canonical
    assert rows[0].group_id == 0 and rows[0].group_size == 2
    assert 3 not in rows  # doc in no pair is not emitted


def test_quantized_topk_recall_and_packing(spark):
    """int8-quantized exact top-k: byte-packed storage is 1 byte/dim,
    and on well-separated vectors the quantized ranking agrees with
    the exact float ranking (quantization noise << separation)."""
    import numpy as np

    from dexspark.functions.similarity import cosine_topk, quantized_topk

    rng = np.random.RandomState(7)
    dim = 16
    base = rng.uniform(-1, 1, size=(10, dim))
    rows = []
    vid = 0
    for b in base:
        for _ in range(4):  # 4 tight copies per cluster
            rows.append(
                (vid, (b + rng.uniform(-0.01, 0.01, dim)).tolist())
            )
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter("vec_id % 4 = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = quantized_topk(emb, queries, dim=dim, k=3)
    exact = cosine_topk(emb, queries, k=3)
    g = {(r.query_id, r.rank): r.neighbor_id for r in got.collect()}
    e = {(r.query_id, r.rank): r.neighbor_id for r in exact.collect()}
    # same cluster members in the top-3 for every query (set-equal per
    # query; within-cluster order may differ under quantization noise)
    for q in range(0, 40, 4):
        gs = {g[(q, r)] for r in (1, 2, 3)}
        es = {e[(q, r)] for r in (1, 2, 3)}
        assert gs == es, (q, gs, es)
        assert gs == {q + 1, q + 2, q + 3} | {q} - {q}


def test_remove_boilerplate_semantics(spark):
    from dexspark.functions.text import remove_boilerplate

    boiler = "SUBSCRIBE NOW"
    rows = [
        (i, f"unique prose {i}\n\n{boiler}\n\nalso unique {i}")
        for i in range(6)
    ] + [(100, "no boiler here"), (101, boiler)]  # doc that is ONLY boiler
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_boilerplate(docs, max_repeats=4).collect()}
    assert out[0].text_clean == "unique prose 0\n\nalso unique 0"
    assert out[0].n_paras_kept == 2 and out[0].n_paras_dropped == 1
    assert out[100].text_clean == "no boiler here"
    assert out[100].n_paras_dropped == 0
    # a doc reduced to nothing still comes back (empty, all dropped)
    assert out[101].text_clean == "" and out[101].n_paras_dropped == 1
    # within-doc repetition below the cross-doc threshold survives
    rep = spark.createDataFrame(
        [(1, "x\n\nx\n\nx\n\nx\n\nx")], "doc_id long, text string"
    )
    r = remove_boilerplate(rep, max_repeats=4).collect()[0]
    assert r.n_paras_kept == 5  # 5 copies but only 1 distinct doc


def test_dedup_spans_exact_substr(spark):
    from dexspark.functions.dedup import dedup_spans

    shared = "one two three four five six seven eight"  # exactly 8 tokens
    rows = [
        # shared span mid-document, unique prose around it
        (1, f"alpha bravo {shared} charlie delta"),
        (2, f"echo foxtrot golf {shared} hotel"),
        # doc shorter than the window: untouched even though it
        # repeats doc 4's text prefix
        (3, "one two three"),
        (4, "one two three india juliet"),
        # whole-doc verbatim duplicates: everything removed
        (5, shared),
        (6, shared),
    ]
    out = {
        r.doc_id: r
        for r in dedup_spans(
            spark.createDataFrame(rows, "doc_id int, text string"), min_len=8
        ).collect()
    }
    assert out[1].text_clean == "alpha bravo charlie delta"
    assert out[2].text_clean == "echo foxtrot golf hotel"
    assert out[1].n_tokens_dropped == 8 and out[2].n_tokens_dropped == 8
    assert out[3].text_clean == "one two three" and out[3].n_tokens_dropped == 0
    assert out[4].n_tokens_dropped == 0
    assert out[5].text_clean == "" and out[5].n_tokens_kept == 0
    assert out[6].text_clean == ""


def test_dedup_spans_overlap_and_within_doc(spark):
    from dexspark.functions.dedup import dedup_spans

    # a 10-token duplicated run: overlapping 8-grams must merge into
    # ONE maximal removed span, not leave boundary tokens behind
    run = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    rows = [
        (1, f"pre {run} post"),
        (2, f"{run} tail2"),
        # within-document repetition also counts as duplication
        (3, "w1 w2 w3 w4 w5 w6 w7 w8 mid w1 w2 w3 w4 w5 w6 w7 w8 end3"),
    ]
    out = {
        r.doc_id: r
        for r in dedup_spans(
            spark.createDataFrame(rows, "doc_id int, text string"), min_len=8
        ).collect()
    }
    assert out[1].text_clean == "pre post" and out[1].n_tokens_dropped == 10
    assert out[2].text_clean == "tail2"
    assert out[3].text_clean == "mid end3" and out[3].n_tokens_dropped == 16


def test_corpus_familiarity_exact(spark):
    """Hand-computed bit-length scores: common bigrams score higher;
    <2-token and empty docs emit zero rows-of-score but stay present."""
    from dexspark.functions.text import corpus_familiarity

    docs = spark.createDataFrame(
        [("d1", "a b A  b"), ("d2", "a b"), ("d3", "x"), ("d4", " ")],
        "doc_id string, text string",
    )
    got = {
        r.doc_id: (r.n_bigrams, r.fam_sum, r.fam_avg_x1000)
        for r in corpus_familiarity(docs).collect()
    }
    # counts: "a b" x3 (bit_len 2), "b a" x1 (bit_len 1)
    assert got == {
        "d1": (3, 5, 1666),
        "d2": (1, 2, 2000),
        "d3": (0, 0, 0),
        "d4": (0, 0, 0),
    }


def test_semantic_dedup_rule(spark):
    """Identical vectors in one cell: lowest id kept, rest dropped;
    an orthogonal vector survives regardless of cell."""
    from dexspark.functions.similarity import semantic_dedup

    dim = 4
    v = [1.0, 0.0, 0.0, 0.0]
    w = [0.0, 1.0, 0.0, 0.0]
    emb = spark.createDataFrame(
        [(1, v), (2, v), (3, v), (10, w)],
        "vec_id int, embedding array<float>",
    )
    got = {
        r.vec_id: r.is_kept
        for r in semantic_dedup(
            emb, dim=dim, threshold_x1e6=990_000, n_centroids=4
        ).collect()
    }
    assert got == {1: True, 2: False, 3: False, 10: True}


def test_c4_line_clean_rules(spark):
    """Each C4 rule pinned: terminal punctuation, min words, braces,
    and the doc-level min-lines gate."""
    from dexspark.functions.text import c4_line_clean

    good = "Here is a perfectly reasonable sentence."
    doc1 = "\n".join([good, "Nav Home", "x = { y }", good, good])
    doc2 = "\n".join([good, "too short."])  # only 1 qualifying line
    df = spark.createDataFrame(
        [("d1", doc1), ("d2", doc2)], "doc_id string, text string"
    )
    got = {
        r.doc_id: (r.text_clean, r.n_lines_kept, r.n_lines_dropped, r.is_kept)
        for r in c4_line_clean(df).collect()
    }
    assert got["d1"] == ("\n".join([good] * 3), 3, 2, True)
    assert got["d2"] == ("", 1, 1, False)


def test_containment_pairs_asymmetry(spark):
    """A prefix-contained doc is flagged A-in-B but not B-in-A; the
    boilerplate cap excludes hot shingles from the numerator."""
    from dexspark.functions.dedup import containment_pairs

    big = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    small = "alpha beta gamma delta epsilon"  # pure prefix of big
    other = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, big), (2, small), (3, other)], "doc_id int, text string"
    )
    got = {
        (r.id_contained, r.id_container): r.containment_x1000
        for r in containment_pairs(df, threshold_x1000=800).collect()
    }
    assert (2, 1) in got and got[(2, 1)] == 1000
    assert (1, 2) not in got  # big is NOT contained in small
    assert all(3 not in k for k in got)


def test_kmv_distinct_accuracy_and_exact_path(spark):
    """Small sets are EXACT (n < k); larger sets estimate within the
    ~1/sqrt(k) bound."""
    from dexspark.functions.sketches import kmv_distinct

    small = spark.range(0, 50).selectExpr("id % 7 AS v")
    r = kmv_distinct(small, "v", k=64).first()
    assert (r.n_hashes, r.distinct_est) == (7, 7)

    big = spark.range(0, 40_000).selectExpr("id % 10000 AS v")
    r = kmv_distinct(big, "v", k=1024).first()
    assert r.n_hashes == 1024
    assert abs(r.distinct_est - 10000) < 10000 * 0.15  # ~5 sigma

    import pytest as _pytest

    with _pytest.raises(ValueError):
        kmv_distinct(big, "v", k=1)


def test_kmv_overlap_exact_small_sets(spark):
    """Below k the sketch is exact: known overlap recovered exactly."""
    from dexspark.functions.sketches import kmv_overlap

    a = spark.range(0, 100).selectExpr("id AS v")        # 0..99
    b = spark.range(50, 200).selectExpr("id AS v")       # 50..199
    r = kmv_overlap(a, b, "v", k=1024).first()
    assert r.k_used == 200 and r.union_est == 200
    assert r.n_both == 50 and r.inter_est == 50
    assert r.jaccard_x1000 == 250
