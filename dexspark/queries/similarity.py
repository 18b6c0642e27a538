"""Embedding-similarity family: exact/quantized cosine top-k,
LSH/multiband/IVF ANN (batch + incremental index), semantic dedup,
and the multimodal media stub plumbing."""

from __future__ import annotations
import os
import tempfile
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import _parse_datatype_string
from dexspark.cdc.apply import apply_changes
from dexspark.lake.table import LakeTable

from dexspark.queries._common import (  # noqa: F401
    load,
)


EMB_DIM = 64


ANN_BITS = 4


def emb_cosine_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dexspark.functions.similarity import cosine_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk(emb, queries, k=5)


_COS_SQL = """
list_dot_product(q.qv, CAST(e.embedding AS DOUBLE[]))
/ (sqrt(list_dot_product(q.qv, q.qv))
   * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[]))))
"""


ORACLE_COSINE_TOPK = f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 8
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {_COS_SQL} AS score
  FROM embeddings e, q WHERE e.vec_id <> q.query_id
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
       CAST(round(score * 1e6) AS BIGINT) AS score_x1e6
FROM r WHERE rank <= 5
"""


def emb_quantized_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INT8-quantized exact top-k (functions/similarity.py::
    quantized_topk) — the memory-bound scale path: packed int8 binary
    vectors (4× smaller than float32) scored by an integer GEMM per
    Arrow batch with batch-local top-k before the shuffle. The fixed
    symmetric quantizer (clip ±1, scale 127, floor(x+0.5)) is a pure
    function, and integer dot products are order-independent, so the
    oracle reproduces every score BIT-FOR-BIT — an exactness claim a
    float reduction could not make."""
    from dexspark.functions.similarity import quantized_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return quantized_topk(emb, queries, dim=EMB_DIM, k=5)


_QUANT_SQL = """
CAST(list_transform(CAST(embedding AS DOUBLE[]),
     x -> floor(greatest(-1.0, least(1.0, x)) * 127.0 + 0.5))
  AS BIGINT[])
"""


ORACLE_QUANTIZED_TOPK = f"""
WITH q AS (
  SELECT vec_id AS query_id, {_QUANT_SQL} AS qv
  FROM embeddings WHERE vec_id < 8
), c AS (
  SELECT vec_id, {_QUANT_SQL} AS cv FROM embeddings
), scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         CAST(list_dot_product(CAST(q.qv AS DOUBLE[]),
                               CAST(c.cv AS DOUBLE[])) AS BIGINT) AS score
  FROM c, q WHERE c.vec_id <> q.query_id
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, score
FROM r WHERE rank <= 5
"""


def emb_ann_lsh_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dexspark.functions.similarity import ann_lsh_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann_lsh_topk(emb, queries, dim=EMB_DIM, k=5, n_bits=ANN_BITS)


def _ann_proj_sql(bit: int, seed: int = 42) -> str:
    # mirror of dexspark.functions.similarity._plane_weight:
    # idx = (seed*7919 + bit*64 + d); w = ((A*idx + C) % 2^31) % 2048 - 1024
    return (
        "list_sum([CAST(embedding[d+1] AS DOUBLE) * CAST("
        f"((1103515245 * ({seed * 7919} + {bit} * 64 + d) + 12345) % 2147483648) "
        "% 2048 - 1024 AS DOUBLE) for d in range(0, 64)])"
    )


def _ann_sig_sql(seed: int = 42) -> str:
    return " + ".join(
        f"(CASE WHEN {_ann_proj_sql(b, seed)} >= 0 THEN {2 ** b} ELSE 0 END)"
        for b in range(ANN_BITS)
    )


_ANN_SIG_SQL = _ann_sig_sql(42)


ORACLE_ANN_TOPK = f"""
WITH sigs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         ({_ANN_SIG_SQL}) AS bucket
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv, bucket FROM sigs WHERE vec_id < 8
), scored AS (
  SELECT q.query_id, s.vec_id AS neighbor_id,
         list_dot_product(q.qv, s.v)
         / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(s.v, s.v))) AS score
  FROM sigs s JOIN q ON s.bucket = q.bucket AND s.vec_id <> q.query_id
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
       CAST(round(score * 1e6) AS BIGINT) AS score_x1e6
FROM r WHERE rank <= 5
"""


ANN_BANDS = 4


def emb_ann_multiband_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-amplified multi-band LSH top-k: 4 independent 4-bit
    signature families; a corpus vector is a candidate if it shares a
    bucket with the query in ANY band (P(miss) = (1-p^4)^4 — the same
    amplification MinHash banding uses for near-dups). The oracle
    rebuilds every band's planes arithmetically and mirrors the
    band-union + per-pair max-score collapse, so candidate generation
    across all four families is hash-checked."""
    from dexspark.functions.similarity import ann_lsh_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann_lsh_topk(
        emb, queries, dim=EMB_DIM, k=5, n_bits=ANN_BITS, n_bands=ANN_BANDS
    )


def _ann_multiband_oracle_sql() -> str:
    # band b: plane seed 42 + 1009*b, bucket offset b * 2^ANN_BITS —
    # mirrors ann_lsh_topk(n_bands=ANN_BANDS) exactly
    band_cols = ", ".join(
        f"(({_ann_sig_sql(42 + 1009 * b)}) + {b * (2 ** ANN_BITS)}) AS bucket_{b}"
        for b in range(ANN_BANDS)
    )
    expanded = " UNION ALL ".join(
        f"SELECT vec_id, v, bucket_{b} AS bucket FROM sigs"
        for b in range(ANN_BANDS)
    )
    return f"""
WITH sigs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, {band_cols}
  FROM embeddings
), expanded AS (
  {expanded}
), q AS (
  SELECT vec_id AS query_id, v AS qv, bucket FROM expanded WHERE vec_id < 8
), scored AS (
  SELECT q.query_id, s.vec_id AS neighbor_id,
         MAX(list_dot_product(q.qv, s.v)
             / (sqrt(list_dot_product(q.qv, q.qv))
                * sqrt(list_dot_product(s.v, s.v)))) AS score
  FROM expanded s JOIN q ON s.bucket = q.bucket AND s.vec_id <> q.query_id
  GROUP BY 1, 2
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
       CAST(round(score * 1e6) AS BIGINT) AS score_x1e6
FROM r WHERE rank <= 5
"""


IVF_CENTROIDS = 8


IVF_PROBE = 2


def emb_ivf_incremental_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k served from the incrementally-maintained inverted
    file (lake/vecindex.py): vectors arrive as three CDC batches — the
    first lands NEGATED embeddings the second must fix (a guaranteed
    cell MOVE: retract-from-old + insert-into-new in one merge), the
    second also inserts junk vectors the third DELETES — with the
    index refreshed off the pre/post-image change feed after each
    batch, O(changed vectors) per refresh. The final query probes the
    INDEX (only the probed cells' files are read); the oracle is the
    same exact arithmetic quantizer mirror as ``emb_ivf_topk``, so
    assignment, probe list, and ranking are all hash-checked."""
    from dexspark.lake.vecindex import (
        create_vector_index,
        ivf_topk_via_index,
        refresh_vector_index,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    d = tempfile.mkdtemp(prefix="dexspark_q_")
    src = LakeTable.create(
        spark, os.path.join(d, "vec_lake"),
        _parse_datatype_string("vec_id bigint, embedding array<float>"),
        "vec_id", num_buckets=8,
    )
    idx = create_vector_index(spark, os.path.join(d, "vec_ivf"), src)

    def rf():
        refresh_vector_index(
            src, idx, dim=EMB_DIM, n_centroids=IVF_CENTROIDS
        )

    half = emb.filter(F.pmod(F.col("vec_id"), 2) == 0)
    corrupted = half.withColumn(
        "embedding", F.transform("embedding", lambda x: -x)
    )
    junk = emb.limit(10).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    src.merge(
        corrupted.withColumn("op", F.lit("I")).withColumn(
            "lsn", F.lit(1).cast("long")
        ),
        key_cols=["vec_id"], summary={"batch_id": "v1"},
    )
    rf()
    src.merge(
        emb.unionByName(junk).withColumn("op", F.lit("U")).withColumn(
            "lsn", F.lit(2).cast("long")
        ),
        key_cols=["vec_id"], summary={"batch_id": "v2"},
    )
    rf()
    src.merge(
        junk.withColumn("op", F.lit("D")).withColumn(
            "lsn", F.lit(3).cast("long")
        ),
        key_cols=["vec_id"], summary={"batch_id": "v3"},
    )
    rf()
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk_via_index(
        idx, queries, dim=EMB_DIM, k=5,
        n_centroids=IVF_CENTROIDS, n_probe=IVF_PROBE,
    )


def emb_ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN (the 'scale path' beyond flat LSH): deterministic
    LCG coarse quantizer assigns each vector one cell; queries probe
    their 2 best of 8 cells and exact-rerank. The oracle rebuilds the
    same quantizer arithmetically, so assignment, probe list, and
    ranking are all hash-checked."""
    from dexspark.functions.similarity import ivf_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(
        emb, queries, dim=EMB_DIM, k=5,
        n_centroids=IVF_CENTROIDS, n_probe=IVF_PROBE,
    )


def _ivf_score_parts():
    """Shared SQL fragments reproducing the arithmetic quantizer —
    used by the IVF top-k oracle AND the SemDeDup oracle so the cell
    assignment is one definition."""
    from dexspark.functions.similarity import _centroid_weight_int, centroid_norm

    def score(c: int) -> str:
        terms = " + ".join(
            f"CAST(embedding[{d + 1}] AS DOUBLE) * "
            f"{float(_centroid_weight_int(c, d, EMB_DIM, 42))!r}"
            for d in range(EMB_DIM)
        )
        return f"({terms}) / {centroid_norm(c, EMB_DIM, 42)!r}"

    s_exprs = ", ".join(f"{score(c)} AS s_{c}" for c in range(IVF_CENTROIDS))
    s_names = ", ".join(f"s_{c}" for c in range(IVF_CENTROIDS))
    whens = " ".join(
        f"WHEN s_{c} = m THEN {c}" for c in range(IVF_CENTROIDS)
    )
    return s_exprs, s_names, whens


def _ivf_oracle_sql() -> str:
    s_exprs, s_names, whens = _ivf_score_parts()
    expanded = " UNION ALL ".join(
        f"SELECT vec_id, v, {c} AS c, s_{c} AS s FROM cs WHERE vec_id < 8"
        for c in range(IVF_CENTROIDS)
    )
    return f"""
WITH cs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, {s_exprs} FROM embeddings
), assigned AS (
  SELECT vec_id, v, CASE {whens} END AS cell
  FROM (SELECT *, greatest({s_names}) AS m FROM cs)
), probes AS (
  SELECT vec_id AS query_id, v AS qv, c AS cell FROM (
    SELECT vec_id, v, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c ASC) AS pr
    FROM ({expanded})
  ) WHERE pr <= {IVF_PROBE}
), scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         list_dot_product(p.qv, a.v)
         / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.v, a.v))) AS score
  FROM assigned a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.query_id
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
       CAST(round(score * 1e6) AS BIGINT) AS score_x1e6
FROM r WHERE rank <= 5
"""


def emb_semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (functions/similarity.py::semantic_dedup): quantizer
    cells + within-cell cosine near-dup removal, lowest-id
    representative kept. The oracle reproduces the arithmetic
    quantizer (shared CTE with the IVF oracle) and the pairwise
    drop rule in SQL."""
    from dexspark.functions.similarity import semantic_dedup

    emb = load(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, dim=EMB_DIM, threshold_x1e6=400_000,
        n_centroids=IVF_CENTROIDS,
    )


def _semdedup_oracle_sql() -> str:
    s_exprs, s_names, whens = _ivf_score_parts()
    return f"""
WITH cs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, {s_exprs} FROM embeddings
), assigned AS (
  SELECT vec_id, v, CASE {whens} END AS cell
  FROM (SELECT *, greatest({s_names}) AS m FROM cs)
), dropped AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE CAST(round(list_dot_product(a.v, b.v)
    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
    * 1e6) AS BIGINT) >= 400000
)
SELECT a.vec_id, CAST(a.cell AS INTEGER) AS cell,
       d.vec_id IS NULL AS is_kept
FROM assigned a LEFT JOIN dropped d USING (vec_id)
"""


def emb_cosine_near_dups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucketed candidates +
    exact verify (the 'embedding-cosine near-dup' curation operator)."""
    from dexspark.functions.similarity import cosine_near_dups

    emb = load(spark, sf_dir, "embeddings")
    return cosine_near_dups(
        emb, dim=EMB_DIM, threshold_x1e6=400_000, n_bits=ANN_BITS
    )


ORACLE_EMB_NEAR_DUPS = f"""
WITH sigs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         ({_ANN_SIG_SQL}) AS bucket
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(round(list_dot_product(a.v, b.v)
         / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
         * 1e6) AS BIGINT) AS cos_x1e6
FROM sigs a JOIN sigs b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE CAST(round(list_dot_product(a.v, b.v)
  / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
  * 1e6) AS BIGINT) >= 400000
"""


def media_feature_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text wrapped as opaque binary payloads → Arrow-batched
    mapInPandas feature extraction (sha256 + byte length; codec step
    stubbed deterministically — see dexspark.multimodal.media)."""
    from dexspark.multimodal.media import extract_features, to_media

    docs = load(spark, sf_dir, "documents")
    media = to_media(docs, id_col="doc_id", payload_col="text")
    feats = extract_features(media)
    return feats.select("media_id", "n_bytes", "sha256_hex")


ORACLE_MEDIA = """
SELECT doc_id AS media_id,
       octet_length(CAST(text AS BLOB)) AS n_bytes,
       sha256(text) AS sha256_hex
FROM documents
"""
