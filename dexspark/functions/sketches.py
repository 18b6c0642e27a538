"""Cardinality sketches for 100 TB-scale profiling.

KMV (k-minimum-values, Bar-Yossef et al. 2002): keep the k smallest
distinct hash values of a column; the k-th smallest estimates the
distinct count as (k-1) · M / h_k (hashes of N distinct values are
~uniform on [0, M), so the k-th smallest sits near k·M/N). The sketch
Spark's own ``approx_count_distinct`` (HyperLogLog++) cannot give us
here: HLL register layouts are engine-private, so its answers are not
reproducible outside Spark — KMV over an md5-derived hash is exact
integer arithmetic any engine replays bit-for-bit, which makes the
estimator itself oracle-checkable (the same property the engine's
MinHash/SimHash sketches exploit).

Scale shape: one map-combined DISTINCT shuffle of an 8-byte hash
column, then a bounded TakeOrdered(k) — per-partition top-k on the
executors, k rows to the driver. No UDF.

Hash domain: 48 bits (12 hex chars of md5) so (k-1)·M stays inside
int64 and both engines divide in BIGINT. 48 bits start to saturate
near ~2^24 distinct values (birthday bound biases the estimate low);
at larger true cardinalities widen the hash and move the arithmetic
to DECIMAL — the estimator is the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HASH_HEX_CHARS = 12
DOMAIN = 16 ** HASH_HEX_CHARS  # 2^48


def kmv_hash(col: F.Column) -> F.Column:
    """48-bit md5-derived hash, reproducible in any engine (values are
    hashed via their canonical string form)."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, HASH_HEX_CHARS), 16, 10
    ).cast("long")


def kmv_distinct(df: DataFrame, col: str, k: int = 1024) -> DataFrame:
    """One-row DataFrame: ``(n_hashes, kth_min, distinct_est)``.

    ``n_hashes`` = how many distinct hashes the sketch holds (< k means
    the column's distinct count is below k and ``distinct_est`` is
    EXACT); ``kth_min`` = the k-th smallest distinct hash;
    ``distinct_est`` = (k-1)·M div kth_min, exact int64 arithmetic.
    Standard error ~ 1/sqrt(k) (~3% at k=1024). k is capped at 2^15 so
    (k-1)·M provably fits int64 ((2^15)·2^48 = 2^63) — silent int64
    wraparound would be a wrong answer, not an error."""
    if not 1 < k <= 32768:
        raise ValueError(f"k must be in (1, 32768], got {k}")
    # NULLs are excluded explicitly (a NULL hashes to NULL, and the
    # engines disagree on NULL sort placement — Spark first, most SQL
    # engines last): the sketch counts distinct NON-NULL values
    mins = (
        df.select(kmv_hash(F.col(col)).alias("_h"))
        .where(F.col("_h").isNotNull())
        .distinct()
        .orderBy("_h")
        .limit(k)
    )
    n = F.count(F.lit(1)).cast("long")
    hk = F.max("_h")
    return mins.agg(
        n.alias("n_hashes"),
        hk.cast("long").alias("kth_min"),
        F.when(n < k, n)
        .otherwise(F.expr(f"{(k - 1) * DOMAIN}L div max(_h)"))
        .cast("long")
        .alias("distinct_est"),
    )


def kmv_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    col_a: str,
    col_b: str | None = None,
    k: int = 1024,
) -> DataFrame:
    """Corpus-overlap estimation from KMV sketches — "how much does
    crawl B repeat crawl A" WITHOUT joining them row-by-row (the
    screening question before a full decontamination pass; at 100 TB
    an exact distinct-intersection is a massive shuffle, this is two
    sketch scans + k rows on the driver).

    Standard KMV set algebra (Beyer et al. 2007): take the k smallest
    distinct hashes of A ∪ B; the fraction of them present in BOTH
    sides estimates Jaccard, and scaled by the union estimate gives
    the intersection size. Returns one row:
    ``(k_used, n_both, union_est, inter_est, jaccard_x1000)`` — all
    exact int64 arithmetic over md5-derived hashes, so the estimator
    is engine-reproducible like ``kmv_distinct``. ``inter_est`` is
    computed as n_both·(U div k) + (n_both·(U mod k)) div k — the
    exact same floor(n_both·U/k) value (integer identity) without the
    n_both·U product, which could silently wrap int64 at large k·U."""
    if not 1 < k <= 32768:
        raise ValueError(f"k must be in (1, 32768], got {k}")
    col_b = col_b or col_a
    ha = (
        df_a.select(kmv_hash(F.col(col_a)).alias("_h"))
        .where(F.col("_h").isNotNull())
        .distinct()
        .withColumn("_a", F.lit(1))
        .withColumn("_b", F.lit(0))
    )
    hb = (
        df_b.select(kmv_hash(F.col(col_b)).alias("_h"))
        .where(F.col("_h").isNotNull())
        .distinct()
        .withColumn("_a", F.lit(0))
        .withColumn("_b", F.lit(1))
    )
    union_mins = (
        ha.unionByName(hb)
        .groupBy("_h")
        .agg(F.max("_a").alias("_ina"), F.max("_b").alias("_inb"))
        .orderBy("_h")
        .limit(k)
    )
    n = F.count(F.lit(1)).cast("long")
    hk = F.max("_h")
    union_est = F.when(n < k, n).otherwise(
        F.expr(f"{(k - 1) * DOMAIN}L div max(_h)")
    ).cast("long")
    n_both = F.sum(
        F.when((F.col("_ina") == 1) & (F.col("_inb") == 1), 1).otherwise(0)
    ).cast("long")
    return union_mins.agg(
        n.alias("k_used"),
        n_both.alias("n_both"),
        union_est.alias("union_est"),
    ).select(
        "k_used",
        "n_both",
        "union_est",
        F.expr(
            "n_both * (union_est div k_used) + "
            "(n_both * (union_est % k_used)) div k_used"
        ).cast("long").alias("inter_est"),
        F.expr("n_both * 1000 div k_used").cast("long").alias("jaccard_x1000"),
    )
