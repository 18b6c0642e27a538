"""Deduplication families for corpus curation at scale.

- exact_dedup: fingerprint → groupBy. One shuffle on a 64-bit key;
  min-id winner is deterministic.
- minhash_lsh_pairs: shingles → K minhashes → B bands → bucket
  self-join. The self-join happens per (band, band-hash) bucket, so
  candidate generation is output-bounded, never O(n²).
- simhash: 64-bit near-dup signature via per-bit majority vote over
  token hashes — expression-only (explode + groupBy bit-vote).
- ngram_jaccard: exact Jaccard on shingle sets for a candidate pair
  set (verification stage after LSH).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _norm(text_col: str) -> "F.Column":
    return F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")


def shingles(text_col: str, n: int = 3) -> "F.Column":
    """Word n-gram shingles as an array<string> (distinct)."""
    toks = F.split(_norm(text_col), " ")
    k = F.size(toks) - (n - 1)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct text: the minimum id wins; ``n_copies``
    counts the group. Hash-groupBy — the only shuffle key is the 64-bit
    fingerprint + full text for collision safety."""
    return (
        df.groupBy(text_col)
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .drop(text_col)
        .select(id_col, "n_copies")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """K minhash values per doc, computed as expressions: for hash k,
    min over shingles of xxhash64(shingle, seed+k). No UDF, no explode
    — the K mins are array ops over the shingle array."""
    # explode + K codegen'd min() aggregates, NOT a higher-order
    # lambda: Spark evaluates HOF lambdas interpreted (no whole-stage
    # codegen), which measured ~30x slower for K xxhash64 calls per
    # shingle. Here every hash runs inside the codegen'd HashAggregate
    # and map-side partial agg collapses each doc to one row of K mins
    # before any shuffle.
    #
    # Work expands ~(shingles x K) per input row, so a narrow input
    # (one parquet file -> one partition; a single row group cannot be
    # byte-range split) would serialize the whole expansion on one
    # task. Spread the *input rows* across the cluster first — the
    # repartition moves only (id, text), never the expansion.
    src = df.select(id_col, text_col)
    target = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target)
    ex = src.select(id_col, F.explode(shingles(text_col, shingle_n)).alias("_s"))
    mins = [
        F.min(F.xxhash64(F.col("_s"), F.lit(seed + k))).alias(f"_h{k}")
        for k in range(num_hashes)
    ]
    return (
        ex.groupBy(id_col)
        .agg(*mins)
        .select(
            id_col,
            F.array(*[F.col(f"_h{k}") for k in range(num_hashes)]).alias("minhash"),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) whose signatures
    collide in ≥1 LSH band. rows_per_band = num_hashes/bands sets the
    similarity knee. Scale shape: explode to (doc, band, band_hash),
    self-join per bucket — shuffle is K/B hashes per doc, candidates
    bounded by real collisions. Hot buckets (a boilerplate phrase
    shared by millions of docs) skew the join key: AQE's skew-join
    (enabled in dexspark.session) splits those shuffle partitions and
    replicates the other side at runtime, so a hot bucket spreads
    across tasks; the QUADRATIC pair count within a truly pathological
    bucket is inherent to LSH and is capped upstream by raising
    rows_per_band (fewer, more selective collisions)."""
    rows = num_hashes // bands
    # Both sides of the self-join (and any downstream verification)
    # consume the signature table; without a persist Spark recomputes
    # the whole shingle-explode x K-hash aggregation per consumer
    # (measured 2x on the r02 bench). Signatures are K longs per doc —
    # orders of magnitude smaller than the texts — so MEMORY_AND_DISK
    # is cheap at any scale; eviction is LRU if the cluster is tight.
    from pyspark.storagelevel import StorageLevel

    sigs = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_n, seed
    ).persist(StorageLevel.MEMORY_AND_DISK)
    return lsh_pairs_from_signatures(sigs, id_col, num_hashes, bands)


def band_buckets(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Explode stored signatures to (id, band, bucket) LSH keys.

    Split out of ``minhash_lsh_pairs`` so a PRECOMPUTED signature
    table (e.g. the incrementally-maintained index in
    dexspark/lake/sigindex.py) can generate candidates without
    re-shingling any text — banding is K/B xxhash64 calls per doc,
    orders of magnitude cheaper than the signature computation."""
    rows = num_hashes // bands
    return sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("minhash")[b * rows + r].cast("string")
                                    for r in range(rows)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def lsh_pairs_from_signatures(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Candidate pairs from a signature table (id, minhash array):
    band-explode + per-bucket self-join, identical to the tail of
    ``minhash_lsh_pairs``."""
    banded = band_buckets(sigs, id_col, num_hashes, bands)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact Jaccard for candidate pairs: intersection/union of shingle
    sets, returned as exact integer (inter, union) + x1000 ratio.

    The shingle expression is a higher-order function (interpreted,
    not codegen'd), so computing it on a narrow input serializes the
    whole corpus onto one task (a single parquet row group is not
    byte-range splittable). Spread the input rows across the cluster
    FIRST — same guard as minhash_signatures; this was the r02 bench
    regression (5k docs shingled serially ≈ 8s of the 16s total)."""
    src = df.select(id_col, text_col)
    target = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target)
    sh = src.select(F.col(id_col), shingles(text_col, shingle_n).alias("sh"))
    j = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("long")
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b"))).cast("long")
    return j.select(
        "id_a",
        "id_b",
        inter.alias("n_inter"),
        union.alias("n_union"),
        F.when(union > 0, (inter * 1000 / union).cast("long"))
        .otherwise(F.lit(0))
        .alias("jaccard_x1000"),
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", out_col: str = "simhash"
) -> DataFrame:
    """64-bit SimHash: per-bit majority vote over token hashes.
    Expression-only: for each bit, count tokens with that bit set vs
    total; bit set in output iff set-count*2 > total.

    Token hash = first 16 hex chars of md5, split into two 32-bit
    halves — md5 over UTF-8 is byte-identical in every engine, so
    (unlike xxhash64) an external SQL oracle can reproduce the
    signature bit-for-bit. Returns exactly (id_col, out_col), one row
    per distinct id (duplicate-id input rows vote into one signature).
    """
    # explode tokens + 64 codegen'd conditional-sum aggregates (same
    # rationale as minhash_signatures: HOF lambdas are interpreted;
    # explode+agg runs in whole-stage codegen with map-side partial
    # agg, and narrow single-file inputs are spread first)
    src = df.select(id_col, text_col)
    target = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target)
    toks = F.filter(F.split(_norm(text_col), " "), lambda t: t != "")
    # explode_outer: a row whose text has no tokens keeps one all-NULL
    # vote row, so it survives with signature 0 instead of vanishing;
    # the md5 of the NULL token is NULL, so the padding row casts no
    # votes (but still counts into _n, which only raises the majority
    # bar — an all-NULL doc gets signature 0 either way)
    md5c = F.md5(F.col("_t"))
    ex = (
        src.select(id_col, F.explode_outer(toks).alias("_t"))
        .withColumn("_hhi", F.conv(F.substring(md5c, 1, 8), 16, 10).cast("long"))
        .withColumn("_hlo", F.conv(F.substring(md5c, 9, 8), 16, 10).cast("long"))
    )
    votes = [
        F.sum(
            F.bit_get(F.col("_hlo" if i < 32 else "_hhi"), F.lit(i % 32)).cast("long")
        ).alias(f"_v{i}")
        for i in range(64)
    ]
    agg = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"), *votes)
    # majority bits -> signed long: bit masks are disjoint, so a plain
    # sum of selected masks reconstructs the two's-complement value
    # (1<<63 is Long.MIN_VALUE)
    sig = None
    for i in range(64):
        mask = (1 << i) if i < 63 else -(1 << 63)
        term = F.when(
            F.col(f"_v{i}") * 2 > F.col("_n"), F.lit(mask).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return agg.select(id_col, sig.alias(out_col))


def hamming_near_dups(
    sigs: DataFrame, id_col: str = "doc_id", sig_col: str = "simhash", max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs by banding the 64-bit signature into 4
    16-bit chunks (pigeonhole: hamming ≤ 3 ⇒ ≥1 identical chunk), then
    verifying hamming distance via bit_count(xor)."""
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright(F.col(sig_col), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("val"),
            )
            for c in range(4)
        ]
    )
    banded = sigs.select(id_col, sig_col, F.explode(chunks).alias("cc")).select(
        id_col, sig_col, "cc.chunk", "cc.val"
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col(f"a.{sig_col}").bitwiseXOR(F.col(f"b.{sig_col}"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_hamming)


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 8,
) -> DataFrame:
    """Train/test decontamination: flag training documents that share
    any word n-gram shingle with a benchmark/eval set (the standard
    n-gram-overlap scrub run before LLM pretraining).

    Scale shape: benchmark sets are tiny next to a 100 TB corpus, so
    the distinct benchmark shingle keys BROADCAST and the corpus side
    never shuffles — contamination detection rides the corpus scan.
    Shingles are md5-keyed (engine-portable); per-doc distinct
    contaminated-shingle counts come from one map-side-combinable
    aggregate. Production default n=8 tokens; lower it for tiny
    synthetic vocabularies."""
    def _sh(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col), F.explode(shingles(text_col, shingle_n)).alias("_sh")
        )

    bench_keys = (
        _sh(bench).select(F.md5(F.col("_sh")).alias("_k")).distinct()
    )
    hits = (
        _sh(train)
        .select(id_col, F.md5(F.col("_sh")).alias("_k"))
        .join(F.broadcast(bench_keys), "_k")
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("_k")).alias("_n_hits"))
    )
    return (
        train.join(hits, id_col, "left")
        .withColumn(
            "n_contaminated_shingles",
            F.coalesce(F.col("_n_hits"), F.lit(0)).cast("long"),
        )
        .withColumn("contaminated", F.col("_n_hits").isNotNull())
        .drop("_n_hits")
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(id, group_id) for every node of the pair graph — group_id is
    the MINIMUM node id reachable, so components get a deterministic
    canonical representative (the dedup "keep the smallest doc_id"
    rule).

    The step a near-dup pipeline needs after pair generation: pairs
    say "a duplicates b", groups say "keep ONE of {a, b, c, ...}" —
    without the closure, a-b and b-c would keep a and b.

    Scale shape: min-label propagation with POINTER JUMPING — each
    round takes (1) the min label over graph neighbors (join edges to
    labels, shuffle keyed by node id) and (2) label(label(x))
    (labels self-join), so label chains halve every round and
    convergence is O(log component-diameter) rounds, not O(diameter)
    — a pathological 1000-doc chain converges in ~10 rounds where
    plain propagation needs 1000. Labels only ever decrease, so the
    exact-sum convergence probe (one map-combined aggregate per
    round, decimal accumulator — no overflow) detects the fixpoint
    without comparing whole label sets. Near-dup components are
    near-cliques in practice (diameter 1-2): expect 2-3 rounds.
    """
    und = (
        edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
        .union(edges.select(F.col(dst).alias("_u"), F.col(src).alias("_v")))
        .distinct()
        .persist()
    )
    labels = (
        und.select(F.col("_u").alias("id"))
        .distinct()
        .withColumn("group_id", F.col("id"))
        .persist()
    )

    def _sum(df: DataFrame) -> int:
        r = df.agg(
            F.sum(F.col("group_id").cast("decimal(38,0)")).alias("s")
        ).first()
        return int(r["s"] or 0)

    prev = _sum(labels)
    try:
        for _ in range(max_iterations):
            nbr = und.join(
                labels, und["_v"] == labels["id"]
            ).select(F.col("_u").alias("id"), F.col("group_id"))
            cand = (
                labels.select("id", "group_id")
                .union(nbr)
                .groupBy("id")
                .agg(F.min("group_id").alias("group_id"))
            )
            ptr = cand.select(
                F.col("id").alias("_pid"), F.col("group_id").alias("_pgrp")
            )
            nxt = (
                cand.join(ptr, cand["group_id"] == ptr["_pid"], "left")
                .select(
                    cand["id"],
                    F.least(
                        cand["group_id"],
                        F.coalesce(F.col("_pgrp"), cand["group_id"]),
                    ).alias("group_id"),
                )
                .persist()
            )
            cur = _sum(nxt)
            labels.unpersist()
            labels = nxt
            if cur == prev:
                return labels
            prev = cur
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds — component diameter beyond the pointer-jumping bound"
        )
    finally:
        und.unpersist()


def near_dup_groups(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Verified near-dup pairs → canonical groups: every doc that
    appears in a pair gets (doc_id, group_id, group_size,
    is_canonical) with group_id = min doc id of its component. The
    curation step keeps ``is_canonical`` rows and drops the rest —
    transitively, so a-b + b-c keeps only a. Docs in no pair are not
    emitted (they are their own group trivially)."""
    from pyspark.sql.window import Window

    comp = connected_components(pairs, max_iterations=25)
    # group size via a count window — one shuffle on group_id, no
    # broadcast (group count is O(corpus) at scale, never collect it)
    return comp.select(
        F.col("id").alias(id_col),
        "group_id",
        F.count(F.lit(1))
        .over(Window.partitionBy("group_id"))
        .alias("group_size"),
        (F.col("id") == F.col("group_id")).alias("is_canonical"),
    )


def dedup_spans(
    df: DataFrame,
    min_len: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring span dedup (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better" — the ExactSubstr
    pass): every token that lies inside some ``min_len``-token window
    whose exact token sequence occurs MORE THAN ONCE in the corpus
    (within- or cross-document, all occurrences counted) is removed;
    the survivors are re-joined in order. Because any duplicated
    substring of >= min_len tokens is the union of its duplicated
    min_len-windows, this removes precisely the maximal duplicated
    spans — the memorization-prone verbatim repeats exact-dup,
    near-dup, and paragraph passes all miss (a quote spanning a
    paragraph break, a template sentence inside unique prose).

    Scale shape: tokens explode once into (pos, gram-hash) pairs
    (bounded by corpus token count), ONE map-combined count shuffle
    on the 64-bit gram hash, one hash join of grams against the
    duplicated-gram set (NOT broadcast — duplicated grams are
    O(duplicated text), unbounded by Zipf), then a per-doc
    reassembly aggregate bounded by tokens-per-document. The cover
    mask is per-doc array work (codegen HOFs, no extra shuffle);
    worst case O(tokens x covered-windows) per document. The 64-bit
    hash stands in for the gram (collision odds ~n^2/2^64, the
    same trade remove_boilerplate makes). Returns (id_col,
    text_clean, n_tokens_kept, n_tokens_dropped)."""
    L = int(min_len)
    if L < 2:
        raise ValueError("min_len must be >= 2")
    sep = "\x1f"  # tokens are whitespace-split, so \x1f never occurs
    toks = df.select(
        F.col(id_col),
        F.when(
            F.length(F.trim(F.col(text_col))) == 0,
            F.array().cast("array<string>"),
        )
        .otherwise(F.split(F.trim(F.col(text_col)), r"\s+"))
        .alias("_ts"),
    )
    grams = (
        toks.filter(F.size("_ts") >= L)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("_ts") - L),
                    lambda i: F.struct(
                        i.alias("_pos"),
                        F.xxhash64(
                            F.concat_ws(sep, F.slice("_ts", i + 1, L))
                        ).alias("_gh"),
                    ),
                )
            ).alias("_g"),
        )
        .select(F.col(id_col), F.col("_g._pos").alias("_pos"),
                F.col("_g._gh").alias("_gh"))
    )
    dup = (
        grams.groupBy("_gh")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= 2)
        .select("_gh")
    )
    cov = (
        grams.join(dup, "_gh")
        .groupBy(id_col)
        .agg(F.collect_set("_pos").alias("_starts"))
    )
    joined = toks.join(cov, id_col, "left")
    starts = F.coalesce(F.col("_starts"), F.array().cast("array<int>"))
    covered = F.array_distinct(
        F.flatten(F.transform(starts, lambda s: F.sequence(s, s + L - 1)))
    )
    indexed = F.transform(
        F.col("_ts"), lambda t, i: F.struct(t.alias("_t"), i.alias("_i"))
    )
    kept = F.filter(indexed, lambda x: ~F.array_contains(covered, x["_i"]))
    return joined.select(
        F.col(id_col),
        F.concat_ws(" ", F.transform(kept, lambda x: x["_t"])).alias("text_clean"),
        F.size(kept).cast("long").alias("n_tokens_kept"),
        (F.size("_ts") - F.size(kept)).cast("long").alias("n_tokens_dropped"),
    )


def containment_pairs(
    df: DataFrame,
    threshold_x1000: int = 800,
    max_doc_freq: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Asymmetric near-containment detection: ordered pairs (A, B)
    where A's shingle set is (mostly) INSIDE B's — the quote/embed/
    superset case symmetric Jaccard misses by construction (a page
    quoting a whole short document scores low Jaccard because B's
    extra text inflates the union, but A's containment is ~1.0).
    Standard curation use: drop the contained duplicate, keep the
    container (Lee et al. 2021 report these as a major residual class
    after exact + near dedup).

    containment(A→B) = |shingles(A) ∩ shingles(B)| / |shingles(A)|,
    reported x1000 in exact integer arithmetic. Shingles appearing in
    more than ``max_doc_freq`` documents are excluded from the
    NUMERATOR (boilerplate would otherwise pair everything with
    everything — the same Zipf-head cap the boilerplate pass uses);
    the denominator stays the full set, so the score only
    under-counts: a reported containment is real.

    Scale shape: one explode, one map-combined doc-frequency count,
    one self equi-join ON THE SHINGLE restricted to cold shingles
    (bounded fan-out ≤ max_doc_freq² per shingle — never all-pairs),
    one (A,B) count aggregate. No UDF.

    Returns (id_contained, id_container, n_shared, n_shingles,
    containment_x1000) for ordered pairs over the threshold."""
    # persisted: the exploded frame feeds the size count, the doc-freq
    # count, AND the cold-shingle join; lifetime is left to Spark's LRU
    # eviction — the same rule as the near-dup signature and
    # familiarity bigram persists (an unpersist here would fire before
    # the caller materializes the lazily-returned result)
    ex = (
        df.select(
            F.col(id_col).alias("_doc"),
            F.explode(shingles(text_col, shingle_n)).alias("_g"),
        )
        .persist()
    )
    sizes = ex.groupBy("_doc").agg(F.count(F.lit(1)).alias("_n"))
    dfreq = ex.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
    cold = ex.join(
        dfreq.filter(F.col("_df") <= max_doc_freq), "_g"
    ).select("_doc", "_g")
    a = cold.select(F.col("_doc").alias("_ida"), "_g")
    b = cold.select(F.col("_doc").alias("_idb"), "_g")
    shared = (
        a.join(b, "_g")
        .filter(F.col("_ida") != F.col("_idb"))
        .groupBy("_ida", "_idb")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(sizes, F.col("_ida") == F.col("_doc"))
        .filter(
            F.col("n_shared") * 1000 >= F.col("_n") * F.lit(int(threshold_x1000))
        )
        .select(
            F.col("_ida").alias("id_contained"),
            F.col("_idb").alias("id_container"),
            F.col("n_shared").cast("long").alias("n_shared"),
            F.col("_n").cast("long").alias("n_shingles"),
            F.expr("n_shared * 1000 div _n").cast("long").alias(
                "containment_x1000"
            ),
        )
    )
