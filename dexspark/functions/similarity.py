"""Similarity search over embedding columns (array<float>).

Two strategies, both expression-only (JVM-side, no Python in the hot
path):

- ``cosine_topk``: exact brute-force top-k. The query set is broadcast
  (it is small by construction); each corpus partition scores its rows
  locally and reduces to a per-partition top-k **before** the shuffle,
  so the network carries O(partitions x Q x k) rows — never the
  N x Q score matrix. This is the 100 TB-safe shape of brute force.
- ``ann_lsh_topk``: sign-random-projection LSH. Signatures use integer
  LCG-derived hyperplane weights (pure arithmetic — reproducible in
  any engine, which is how the DuckDB oracle mirrors it exactly), so
  candidate generation is a bucket equi-join: only same-signature
  pairs are scored. Recall < 1 by design; the scale win is that the
  per-bucket join replaces the N x Q cross product.

Scale notes: at 10^9 vectors you shard buckets further (prefix of the
signature as a partition key) and keep per-bucket rerank bounded;
both shapes below survive that unchanged.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

# LCG constants (numerical recipes); weights in [-1024, 1023] — integer
# arithmetic only so any SQL engine reproduces the exact same planes.
_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2**31


def dot(a: Column, b: Column) -> Column:
    """Exact dot product of two array columns, accumulated in double
    left-to-right (deterministic, engine-reproducible)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k neighbors for every query vector.

    ``queries`` must have (query_id_col, vec_col). Returns
    (query_id, neighbor_id, rank, score_x1e6:long). Ties broken by
    neighbor id so output is total-ordered and engine-independent.

    Plan shape: broadcast-nested-loop against the broadcast query set
    (the corpus scan itself never shuffles), then ONE row-level
    shuffle of the Q x N scored matrix into (_qid, _p) groups whose
    top-k comes from a row_number window over Spark's EXTERNAL sort —
    spillable, O(1) heap per task, never an in-memory array of the
    whole group — and a final k-bounded reduce over the P*k
    survivors. The shuffle is the cost of exactness; the scale paths
    that avoid it are ann_lsh_topk / ivf_topk below.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qvec")
        )
    )
    scored = (
        corpus.select(F.col(id_col).alias("_nid"), F.col(vec_col).alias("_nvec"))
        .join(q, F.col("_nid") != F.col("_qid"))  # exclude self-match
        .select(
            "_qid",
            "_nid",
            cosine(F.col("_qvec"), F.col("_nvec")).alias("_score"),
        )
    )
    # two-phase bounded top-k via row_number windows: the local phase
    # ranks within (query, input-partition) through Spark's EXTERNAL
    # sort — spillable, O(1) heap per task — where the previous
    # collect_list+slice materialized every scored row of a group in
    # one in-memory array (unbounded as Q x partition-size grows).
    # The final phase ranks the P*k survivors per query (tiny).
    local_w = Window.partitionBy("_qid", "_p").orderBy(
        F.col("_score").desc(), F.col("_nid").asc()
    )
    local = (
        scored.withColumn("_p", F.spark_partition_id())
        .withColumn("_rn", F.row_number().over(local_w))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_p")
    )
    final_w = Window.partitionBy("_qid").orderBy(
        F.col("_score").desc(), F.col("_nid").asc()
    )
    final = (
        local.withColumn("_rank", F.row_number().over(final_w))
        .filter(F.col("_rank") <= k)
    )
    return final.select(
        F.col("_qid").alias("query_id"),
        F.col("_nid").alias("neighbor_id"),
        F.col("_rank").cast("int").alias("rank"),
        F.round(F.col("_score") * 1e6).cast("long").alias("score_x1e6"),
    )


def _plane_weight_int(bit: int, d: int, dim: int, seed: int) -> int:
    """Deterministic hyperplane weight in [-1024, 1023] from an LCG
    over the flat index — pure integer arithmetic, any engine can
    reproduce it bit-for-bit."""
    idx = (seed * 7919 + bit * dim + d) % _LCG_M
    return ((_LCG_A * idx + _LCG_C) % _LCG_M) % 2048 - 1024


def _plane_weight(bit: int, d: int, dim: int, seed: int) -> Column:
    return F.lit(float(_plane_weight_int(bit, d, dim, seed)))


def lsh_signature(
    vec_col: Column, dim: int, n_bits: int = 8, seed: int = 42
) -> Column:
    """n_bits-bit sign-random-projection signature as a long. Each bit
    is sign(<vec, plane_b>) with LCG-integer planes, unrolled into
    straight-line codegen'd expressions (see _sig_fast)."""
    return _sig_fast(vec_col, dim, n_bits, seed)


def _sig_fast(vec_col: Column, dim: int, n_bits: int, seed: int) -> Column:
    """Same signature, but computed as n_bits explicit weighted sums —
    unrolled expressions that whole-stage-codegen compiles to straight-
    line JVM code (no per-element array lookup)."""
    sig = F.lit(0).cast("long")
    for b in range(n_bits):
        proj = None
        for d in range(dim):
            term = vec_col[d].cast("double") * _plane_weight(b, d, dim, seed)
            proj = term if proj is None else proj + term
        sig = sig + F.when(proj >= 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def _centroid_weight_int(c: int, d: int, dim: int, seed: int) -> int:
    """Deterministic IVF centroid component in [-1024, 1023] — same
    integer-LCG discipline as the LSH planes (separate stream via a
    different prime), so any engine reproduces the coarse quantizer."""
    idx = (seed * 104729 + c * dim + d) % _LCG_M
    return ((_LCG_A * idx + _LCG_C) % _LCG_M) % 2048 - 1024


def centroid_norm(c: int, dim: int, seed: int) -> float:
    return sum(_centroid_weight_int(c, d, dim, seed) ** 2 for d in range(dim)) ** 0.5


def _centroid_scores_udf(dim: int, n_centroids: int, seed: int):
    """Arrow pandas UDF: per-vector array of K centroid scores
    (<vec, centroid_c>/||centroid_c|| — cosine up to the vec's own
    norm, a common positive factor, so argmax/ranking are unaffected).

    Dense matmul is the one place expressions lose: K*dim unrolled
    terms blow janino's 64KB method cap (measured at K=8, dim=64 —
    whole-stage codegen emits a 16k-line class and falls back to
    interpreted), and at real IVF sizes (K=2^12) they're not even
    expressible. numpy over Arrow batches is the right tool — BUT the
    accumulation loops over d explicitly so each score is the strict
    left-to-right sum t0+t1+..., bit-identical to the SQL oracle's
    sequential additions (np.dot's pairwise/SIMD summation would NOT
    be)."""
    import numpy as np

    W = np.array(
        [
            [_centroid_weight_int(c, d, dim, seed) for d in range(dim)]
            for c in range(n_centroids)
        ],
        dtype=np.float64,
    )
    norms = np.sqrt((W * W).sum(axis=1))

    @F.pandas_udf("array<double>")
    def scores(vecs: pd.Series) -> pd.Series:
        arr = np.asarray(vecs.tolist(), dtype=np.float64)  # n x dim
        acc = np.zeros((arr.shape[0], n_centroids), dtype=np.float64)
        for d in range(dim):
            acc += arr[:, [d]] * W[:, d]
        acc /= norms
        return pd.Series(list(acc))

    return scores


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-style approximate top-k: a fixed coarse quantizer (the
    deterministic LCG centroids) assigns every corpus vector to its
    nearest cell — ONE cell each, a narrow map — and each query probes
    its ``n_probe`` best cells, exact-cosine reranking only those
    candidates. The inverted-file trade: recall bounded by the probe
    list, compute cut from O(N·Q) to O(N·Q·n_probe/n_centroids).

    Scale shape: the probe list (queries × n_probe) is broadcast, so
    the corpus is never shuffled; at 10^9 vectors raise n_centroids
    (2^12+) and persist the assignment as a partition/bucket key so a
    probe prunes whole files. Returns (query_id, neighbor_id, rank,
    score_x1e6) like the other top-k operators.
    """
    c_assigned = ivf_assign_cells(
        corpus, dim, n_centroids, seed, id_col, vec_col
    )
    probes = ivf_query_probes(
        queries, dim, n_centroids, n_probe, seed, query_id_col, vec_col
    )
    return ivf_rerank(c_assigned, probes, k)


def _cell_struct_arr(n_centroids: int):
    """Struct array over a ``_scores`` column: (score, -cell, cell) so
    ``array_max`` breaks ties toward the LOWER cell id."""
    return F.array(
        *[
            F.struct(
                F.col("_scores")[c].alias("s"),
                F.lit(-c).alias("negc"),
                F.lit(c).alias("c"),
            )
            for c in range(n_centroids)
        ]
    )


def ivf_assign_cells(
    df: DataFrame,
    dim: int,
    n_centroids: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(_nid, _nvec, _cell): each vector's single nearest-centroid
    cell. Split out of ``ivf_topk`` so the incrementally-maintained
    vector index (lake/vecindex.py) assigns cells with the IDENTICAL
    quantizer — index and batch paths agree by construction. The
    K-score array materializes once per row (one Arrow batch pass);
    argmax is a cheap JVM expression over that column."""
    scores = _centroid_scores_udf(dim, n_centroids, seed)
    cell_arr = _cell_struct_arr(n_centroids)
    return (
        df.select(
            F.col(id_col).alias("_nid"),
            F.col(vec_col).alias("_nvec"),
            scores(F.col(vec_col)).alias("_scores"),
        )
        .select("_nid", "_nvec", F.array_max(cell_arr)["c"].alias("_cell"))
    )


def ivf_query_probes(
    queries: DataFrame,
    dim: int,
    n_centroids: int = 8,
    n_probe: int = 2,
    seed: int = 42,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Broadcast-ready (_qid, _qvec, _cell) probe list: each query's
    ``n_probe`` best cells by quantizer score (ties toward the lower
    cell id, matching ``ivf_assign_cells``)."""
    scores = _centroid_scores_udf(dim, n_centroids, seed)
    cell_arr = _cell_struct_arr(n_centroids)
    qexp = (
        queries.select(
            F.col(query_id_col).alias("_qid"),
            F.col(vec_col).alias("_qvec"),
            scores(F.col(vec_col)).alias("_scores"),
        )
        .select("_qid", "_qvec", F.explode(cell_arr).alias("p"))
    )
    wp = Window.partitionBy("_qid").orderBy(
        F.col("p.s").desc(), F.col("p.c").asc()
    )
    return F.broadcast(
        qexp.withColumn("_pr", F.row_number().over(wp))
        .filter(F.col("_pr") <= n_probe)
        .select("_qid", "_qvec", F.col("p.c").alias("_cell"))
    )


def ivf_rerank(c_assigned: DataFrame, probes: DataFrame, k: int) -> DataFrame:
    """Exact-cosine rerank of cell-matched candidates → the standard
    (query_id, neighbor_id, rank, score_x1e6) top-k output."""
    scored = (
        c_assigned.join(probes, on="_cell")
        .filter(F.col("_nid") != F.col("_qid"))
        .select(
            "_qid", "_nid", cosine(F.col("_qvec"), F.col("_nvec")).alias("_score")
        )
    )
    w = Window.partitionBy("_qid").orderBy(F.col("_score").desc(), F.col("_nid").asc())
    return (
        scored.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .select(
            F.col("_qid").alias("query_id"),
            F.col("_nid").alias("neighbor_id"),
            F.col("_rank").cast("int").alias("rank"),
            F.round(F.col("_score") * 1e6).cast("long").alias("score_x1e6"),
        )
    )


# Above this many unrolled mul-add terms (bands x bits x dim) the
# generated consume method for the signature explode exceeds janino's
# 64KB cap and Spark silently drops to interpreted mode — measured: a
# single 4-bit/64-dim family (256 terms) compiles, the 4-band family
# (1024) does not, and no Project/Generate staging avoids it (the
# optimizer collapses the projection into the generator). Past the
# limit the signatures come from an Arrow pandas UDF instead, with the
# same strict left-to-right accumulation so both paths stay
# bit-identical to the SQL oracle.
_UNROLL_TERM_LIMIT = 512


def _band_sigs_udf(dim: int, n_bits: int, seed: int, n_bands: int):
    """Arrow pandas UDF: all band signatures for a vector in one batch
    pass — array<long> of length n_bands (band b's planes seeded
    seed + 1009*b, matching the expression path and the oracle).
    Accumulates over d explicitly (rows vectorized, dims sequential)
    so each projection is the strict left-to-right sum t0+t1+... —
    bit-identical to the unrolled expressions; np.dot's pairwise/SIMD
    summation would not be."""
    import numpy as np

    W = np.array(
        [
            [
                [_plane_weight_int(bit, d, dim, seed + 1009 * b) for d in range(dim)]
                for bit in range(n_bits)
            ]
            for b in range(n_bands)
        ],
        dtype=np.float64,
    )

    @F.pandas_udf("array<long>")
    def sigs(vecs: pd.Series) -> pd.Series:
        arr = np.asarray(vecs.tolist(), dtype=np.float64)  # n x dim
        n = arr.shape[0]
        out = np.zeros((n, n_bands), dtype=np.int64)
        for b in range(n_bands):
            for bit in range(n_bits):
                acc = np.zeros(n, dtype=np.float64)
                for d in range(dim):
                    acc += arr[:, d] * W[b, bit, d]
                out[:, b] += (acc >= 0).astype(np.int64) << bit
        return pd.Series(list(out))

    return sigs


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_bits: int = 8,
    seed: int = 42,
    n_bands: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates = same LSH bucket in ANY of
    ``n_bands`` independent signature families (OR-amplification —
    the same banding MinHash-LSH uses for near-dups), exact cosine
    rerank on the candidate union. Returns (query_id, neighbor_id,
    rank, score_x1e6). Queries with < k candidates return fewer rows —
    that is the accuracy/cost trade the operator makes; raise
    ``n_bands`` to push recall toward 1 at linear candidate cost
    (P(miss) = (1 - p^n_bits)^n_bands for per-bit agreement p).

    Plan shape: the corpus explodes to n_bands (band, signature) rows
    — a narrow map, no shuffle — and equi-joins the broadcast query
    signatures on the band-qualified bucket; a pair matching several
    bands is scored per match and collapsed by a (qid, nid) group-by
    (scores are deterministic, max = first), so the one real shuffle
    is candidate-bounded. At 10^9 vectors: persist the exploded
    signature column as a bucket/partition key and the join prunes
    whole files per band.
    """
    if n_bands * n_bits * dim > _UNROLL_TERM_LIMIT:
        sig_udf = _band_sigs_udf(dim, n_bits, seed, n_bands)

        def banded(vc: Column) -> Column:
            # band offsets keep families in disjoint bucket ranges;
            # added JVM-side over the UDF's raw signatures
            return F.explode(
                F.transform(
                    sig_udf(vc),
                    lambda s, i: s + (i * (2**n_bits)).cast("long"),
                )
            )

    else:

        def banded(vc: Column) -> Column:
            return F.explode(
                F.array(
                    *[
                        _sig_fast(vc, dim, n_bits, seed + 1009 * b)
                        + F.lit(b * (2**n_bits)).cast("long")
                        for b in range(n_bands)
                    ]
                )
            )

    c = corpus.select(
        F.col(id_col).alias("_nid"),
        F.col(vec_col).alias("_nvec"),
        banded(F.col(vec_col)).alias("_bucket"),
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("_qid"),
            F.col(vec_col).alias("_qvec"),
            banded(F.col(vec_col)).alias("_bucket"),
        )
    )
    scored = (
        c.join(q, on="_bucket")
        .filter(F.col("_nid") != F.col("_qid"))
        .select("_qid", "_nid", cosine(F.col("_qvec"), F.col("_nvec")).alias("_score"))
    )
    if n_bands > 1:
        scored = scored.groupBy("_qid", "_nid").agg(F.max("_score").alias("_score"))
    w = Window.partitionBy("_qid").orderBy(
        F.col("_score").desc(), F.col("_nid").asc()
    )
    return (
        scored.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .select(
            F.col("_qid").alias("query_id"),
            F.col("_nid").alias("neighbor_id"),
            F.col("_rank").cast("int").alias("rank"),
            F.round(F.col("_score") * 1e6).cast("long").alias("score_x1e6"),
        )
    )


def cosine_near_dups(
    corpus: DataFrame,
    dim: int,
    threshold_x1e6: int,
    n_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates = same
    sign-random-projection bucket (self equi-join on the signature —
    replaces the N^2 cross product), verified by exact cosine >=
    threshold. Returns (id_a, id_b, cos_x1e6) with id_a < id_b.

    Recall < 1 by design (cross-bucket near-dups are missed); raise
    ``n_bits`` to shrink buckets (cost) or lower it to raise recall.
    Scale notes: at 10^9 vectors a popular bucket grows quadratically —
    shard hot buckets by a salt on one side plus an OR-ed band family
    (MinHash-LSH style) rather than one signature; the plan shape
    (equi-join on bucket, verify in-row) is unchanged."""
    sigs = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        _sig_fast(F.col(vec_col), dim, n_bits, seed).alias("_bucket"),
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    pairs = a.join(
        b,
        (F.col("a._bucket") == F.col("b._bucket"))
        & (F.col("a._id") < F.col("b._id")),
    ).select(
        F.col("a._id").alias("id_a"),
        F.col("b._id").alias("id_b"),
        F.round(cosine(F.col("a._v"), F.col("b._v")) * 1e6)
        .cast("long")
        .alias("cos_x1e6"),
    )
    return pairs.filter(F.col("cos_x1e6") >= F.lit(threshold_x1e6))


# ---------------------------------------------------------------- quantized
def quantize_int8_expr(vec_col: Column, clip: float = 1.0) -> Column:
    """array<float> → array<int> int8-range quantization with a FIXED
    symmetric range: ``floor(clip(x, ±clip) * 127 + 0.5)`` — no
    data-dependent scale statistics, so the mapping is a pure function
    any engine reproduces bit-exactly (the property the DuckDB oracle
    relies on). Pure codegen expressions."""
    s = 127.0 / clip
    return F.transform(
        vec_col,
        lambda v: F.floor(
            F.greatest(
                F.lit(-clip), F.least(F.lit(clip), v.cast("double"))
            )
            * s
            + F.lit(0.5)
        ).cast("int"),
    )


def _pack_int8_udf():
    import numpy as np

    @F.pandas_udf("binary")
    def pack(vecs: pd.Series) -> pd.Series:
        # same arithmetic as quantize_int8_expr, vectorized; int8
        # two's-complement bytes -> TRUE 1 byte/dim at rest
        return vecs.map(
            lambda v: np.floor(
                np.clip(np.asarray(v, dtype=np.float64), -1.0, 1.0)
                * 127.0
                + 0.5
            )
            .astype(np.int8)
            .tobytes()
        )

    return pack


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k over INT8-QUANTIZED embeddings — the memory-bound
    scale path: vectors live as packed int8 binary (4× smaller than
    float32 at rest and in cache; at 10^10 vectors that is the
    difference between an in-memory corpus shard and a spilling one),
    and scoring is an integer dot product (exact in int32/int64, so
    the DuckDB oracle reproduces every score bit-for-bit — unlike
    float reductions, integer sums are order-independent).

    Plan shape mirrors ``cosine_topk``: the quantized query matrix
    broadcasts via closure (Q is small by construction), each Arrow
    batch scores locally as one numpy int32 GEMM and reduces to its
    per-query top-k BEFORE the shuffle, so the exchange carries
    O(batches × Q × k) rows, never the N × Q score matrix; one final
    window pass picks the global top-k. Ties break on neighbor id
    ascending (deterministic, oracle-matched)."""
    import numpy as np

    qrows = (
        queries.select(
            F.col(query_id_col), quantize_int8_expr(F.col(vec_col)).alias("_q")
        )
        .collect()
    )
    qids = np.array([r[query_id_col] for r in qrows], dtype=np.int64)
    qmat = np.array([r["_q"] for r in qrows], dtype=np.int32)  # Q × dim

    packed = corpus.select(
        F.col(id_col).alias("_id"), _pack_int8_udf()(F.col(vec_col)).alias("_b")
    )

    def score_batches(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            c = np.frombuffer(
                b"".join(pdf["_b"].tolist()), dtype=np.int8
            ).reshape(len(pdf), dim).astype(np.int32)
            ids = pdf["_id"].to_numpy()
            s = c @ qmat.T  # batch × Q, exact int32
            out_q, out_n, out_s = [], [], []
            for j in range(len(qids)):
                col = s[:, j]
                mask = ids != qids[j]  # never return the query itself
                cand_ids, cand_s = ids[mask], col[mask]
                # batch-local top-k, ties by id asc (lexsort is stable)
                order = np.lexsort((cand_ids, -cand_s))[:k]
                out_q.extend([qids[j]] * len(order))
                out_n.extend(cand_ids[order])
                out_s.extend(cand_s[order])
            yield pd.DataFrame(
                {
                    query_id_col: np.array(out_q, dtype=np.int64),
                    "neighbor_id": np.array(out_n, dtype=np.int64),
                    "score": np.array(out_s, dtype=np.int64),
                }
            )

    scored = packed.mapInPandas(
        score_batches,
        schema=f"{query_id_col} long, neighbor_id long, score long",
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            "score",
        )
    )


def semantic_dedup(
    corpus: DataFrame,
    dim: int,
    threshold_x1e6: int,
    n_centroids: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings with the coarse quantizer
    and removing near-duplicates WITHIN each cluster — the pass that
    catches paraphrases and template rewrites exact/MinHash dedup
    cannot (different tokens, same meaning), at O(n²/k) pair cost
    instead of all-pairs.

    Deterministic keep rule: a vector is dropped iff some LOWER-id
    vector in its cell has cosine ≥ threshold with it (the paper keeps
    one representative per ε-ball; lowest-id-wins makes the choice
    engine-independent and oracle-checkable). Returns
    ``(id_col, cell:int, is_kept:boolean)`` for every input row.

    Scale shape: cell assignment is one Arrow batch pass (the same
    quantizer the IVF index uses — ivf_assign_cells); candidates are a
    self equi-join ON THE CELL (never all-pairs), verified by exact
    in-row cosine; the drop set is one distinct + left-anti join. At
    10^9 vectors raise ``n_centroids`` so cells stay bounded (the
    paper uses k ~ sqrt(n)); a pathological hot cell responds to AQE
    skew handling like any hot join key."""
    # persisted: `cells` feeds the self-join's BOTH sides and the final
    # join-back, so without this the Arrow centroid-scoring pass runs
    # three times per call (lifetime left to Spark's LRU eviction, the
    # same rule as the near-dup signature persist)
    from pyspark import StorageLevel

    cells = ivf_assign_cells(
        corpus, dim, n_centroids, seed, id_col, vec_col
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a = cells.select(
        F.col("_nid").alias("_ida"), F.col("_nvec").alias("_va"), "_cell"
    )
    b = cells.select(
        F.col("_nid").alias("_idb"), F.col("_nvec").alias("_vb"), "_cell"
    )
    dropped = (
        a.join(b, "_cell")
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(
            F.round(cosine(F.col("_va"), F.col("_vb")) * 1e6).cast("long")
            >= F.lit(int(threshold_x1e6))
        )
        .select(F.col("_idb").alias("_nid"))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return (
        cells.join(dropped, "_nid", "left")
        .select(
            F.col("_nid").alias(id_col),
            F.col("_cell").alias("cell"),
            F.coalesce(~F.col("_dropped"), F.lit(True)).alias("is_kept"),
        )
    )
