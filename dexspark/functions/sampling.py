"""Deterministic sampling / splitting / chunking / packing for
training-data pipelines.

Every operator here is a pure Catalyst expression pipeline (JVM-side,
whole-stage codegen — no Python per row) and every assignment is a
function of the ROW, never of the partitioning, task order, or RNG
state: re-running the job, changing the cluster size, or re-shuffling
the input cannot move a document between splits. That property is the
whole point at 100 TB — a train/val split that depends on
`rand(seed)` + partition layout silently changes under AQE re-plans,
speculative retries, or a different executor count; an md5-of-key
threshold does not.

Cross-engine reproducibility: the hash is `md5(salt || key)` hex, of
which the first 6 hex digits (24 bits) are read as an integer in
[0, 16^6). Any engine with md5 + substring reproduces the exact split
(the driver's DuckDB oracle does: `CAST('0x' || substr(md5(..),1,6)
AS BIGINT)`), so the split survives an engine migration — the same
guarantee the reference's config-driven routing gives destinations
(≙ FnRouter.kt:67-88: content-hash routing is engine-portable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# 16^6 — the space of the 24-bit hash prefix used for thresholds.
HASH_SPACE = 16 ** 6


def hash_bucket(key: Column, salt: str = "") -> Column:
    """24-bit integer in [0, 16^6) from md5(salt || key) — the shared
    primitive under splits and samples. String-typed input is hashed
    as-is; other types go through their canonical string form, which
    both Spark and the SQL oracle produce identically for ints.

    NULL keys hash to NULL, which every threshold comparison treats as
    false — so a null-keyed row lands in the LAST split under
    ``split_assign`` (the when-chain's otherwise) and is DROPPED by
    ``stratified_sample``. A corpus with nullable ids should validate
    them upstream (the CDC path already rejects null keys)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 6), 16, 10
    ).cast("long")


def split_thresholds(fractions: dict[str, float]) -> list[int]:
    """The integer hash thresholds `split_assign` compares against —
    exposed so an external oracle embeds the EXACT same ints (cumsum
    float order included) rather than re-deriving them."""
    cum, out = 0.0, []
    for name in list(fractions)[:-1]:
        cum += fractions[name]
        out.append(int(cum * HASH_SPACE))
    return out


def split_assign(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split (train/val/test/...) by hash
    threshold. `fractions` maps split name -> fraction; they must sum
    to <= 1.0 (any remainder falls into the LAST split, so the
    conventional {train: .9, val: .05, test: .05} is exact).

    Narrow: no shuffle, no state — a row's split is computable from
    the row alone, so late-arriving data lands in the same split it
    would have on day one (append-consistency for growing corpora).
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    h = hash_bucket(F.col(key_col), salt)
    expr = None
    names = list(fractions)
    for name, thr in zip(names[:-1], split_thresholds(fractions)):
        cond = h < F.lit(thr)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    fractions_by_stratum: dict[str, float],
    stratum_col: str,
    default_fraction: float = 0.0,
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic per-stratum sample: keep a row iff its hash falls
    under its stratum's threshold. The idiomatic use is rebalancing a
    corpus (e.g. downsample English to 10%, keep low-resource
    languages whole) — `sampleBy` semantics but reproducible across
    runs, engines, and cluster sizes, and with no RNG state to seed.

    Narrow (filter only): the decision needs no shuffle and no
    per-stratum count pass. Thresholds are per-stratum constants
    folded into one codegen'd CASE."""
    h = hash_bucket(F.col(key_col), salt)
    thr = None
    for stratum, frac in fractions_by_stratum.items():
        cond = F.col(stratum_col) == F.lit(stratum)
        lim = F.lit(int(frac * HASH_SPACE))
        thr = F.when(cond, lim) if thr is None else thr.when(cond, lim)
    thr = (
        F.lit(int(default_fraction * HASH_SPACE))
        if thr is None
        else thr.otherwise(F.lit(int(default_fraction * HASH_SPACE)))
    )
    return df.where(h < thr)


def source_cap_sample(
    df: DataFrame,
    key_col: str,
    source_col: str,
    cap: int,
    salt: str = "cap-v1",
) -> DataFrame:
    """Cap every source at ~``cap`` rows: a source at or under the cap
    passes whole; an over-represented source keeps each row iff its
    hash falls under ``floor(cap * HASH_SPACE / n_source)`` — the
    standard "cap the head domains" rebalancing step of corpus
    curation (per-domain page caps, per-source document caps), where
    the FRACTION is derived from the data instead of configured.

    Unlike a float-weighted mixture (``n^tau`` temperatures), the
    threshold is computed with exact int64 arithmetic — both operands
    of the one division are < 2^53, so the IEEE quotient (and its
    floor) is bit-identical in any engine — which keeps the sample
    membership oracle-reproducible even though it depends on runtime
    counts.

    Plan shape: one map-side-combined ``groupBy(source).count()``
    (output = #sources rows), broadcast back onto the corpus, then a
    codegen'd hash filter — the corpus itself never shuffles, and the
    decision stays a pure function of (row, per-source count)."""
    if cap < 0:
        raise ValueError("cap must be >= 0")
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    thr = F.when(F.col("_n") <= cap, F.lit(HASH_SPACE)).otherwise(
        F.floor(F.lit(cap * HASH_SPACE) / F.col("_n"))
    )
    h = hash_bucket(F.col(key_col), salt)
    return (
        df.join(F.broadcast(counts), on=source_col)
        .where(h < thr)
        .drop("_n")
    )


def context_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    size: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into fixed-width character windows with
    optional overlap — the context-length chunking step every training
    pipeline runs before tokenization. Output: id_cols + chunk_idx +
    chunk (+ chunk_len).

    stride = size - overlap; chunk i covers [i*stride, i*stride+size).
    The last chunk may be short; a chunk is emitted iff it starts
    inside the text, so a doc of length L yields ceil(max(L-overlap,1)
    / stride) chunks and an empty doc yields none.

    Shape: explode(sequence(...)) + substring — all codegen, 1->N
    fan-out with no UDF and no shuffle (≙ the reference's 1->N
    decompression fan-out, FnDecompressor.kt:31-52, re-expressed for
    text windows)."""
    if overlap < 0 or overlap >= size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    t = F.col(text_col)
    n_chunks = F.ceil((F.greatest(F.length(t) - overlap, F.lit(1))) / F.lit(stride))
    idx = F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int")))
    out = (
        df.where(F.length(t) > 0)
        .withColumn("chunk_idx", idx)
        .withColumn(
            "chunk", F.substring(t, F.col("chunk_idx") * stride + 1, size)
        )
        .withColumn("chunk_len", F.length("chunk").cast("long"))
    )
    return out.select(*id_cols, "chunk_idx", "chunk", "chunk_len")


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_cols: tuple[str, ...],
    shard_col: Column | None = None,
    n_shards: int = 64,
    out_col: str = "pack_id",
) -> DataFrame:
    """Assign documents to fixed-token-budget packs (sequence packing
    for training): documents are taken in a STABLE deterministic order
    and a document whose tokens start before a pack boundary joins
    that pack — greedy next-fit with overflow, the semantics most
    packing pipelines use before truncation. pack_id is
    floor(prior_cum_tokens / budget) within a shard, so the
    assignment is a pure function of (order, token counts) — no RNG,
    no partition dependence.

    Scale shape: a single global running sum would serialize on one
    task, so packing runs per SHARD (default: hash of the first order
    column mod n_shards — deterministic), giving n_shards independent
    window partitions; each shard's packs are disjoint by
    construction (pack key = (shard, pack_id)). One shuffle on the
    shard key; the window is a running sum over Spark's external
    sort, O(1) state per row."""
    shard = (
        shard_col
        if shard_col is not None
        else F.pmod(hash_bucket(F.col(order_cols[0]), "pack-shard"), F.lit(n_shards))
    ).alias("shard")
    w = Window.partitionBy("shard").orderBy(*[F.col(c) for c in order_cols])
    cum = F.sum(F.col(token_col)).over(w) - F.col(token_col)
    return (
        df.withColumn("shard", shard)
        .withColumn(out_col, F.floor(cum / F.lit(budget)).cast("long"))
    )
