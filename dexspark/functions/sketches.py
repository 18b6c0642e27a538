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
    Standard error ~ 1/sqrt(k) (~3% at k=1024)."""
    if not 1 < k <= 1_000_000:
        raise ValueError(f"k must be in (1, 1e6], got {k}")
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
