"""Multi-dimensional z-order clustering for compaction.

1-D ``cluster_by`` (lexicographic range partitioning) gives tight
per-file min/max on the FIRST sort column only: with
``cluster_by=["ts", "uid"]`` every file still spans the full ``uid``
range, so a uid-only (or uid-dominant box) predicate prunes nothing.
Z-ordering interleaves the bits of per-column bin indices so files
cover compact hyper-rectangles in EVERY clustered dimension — the
same layout Delta's ``OPTIMIZE ZORDER BY`` and Iceberg's z-order
rewrite produce (the reference has no storage layout at all — its
routed blobs are opaque, RouteIngestedFile.kt:21-34 — so this is
engine-supplied surface per SURVEY §2.2).

Shape, Spark-first and skew-resistant:

1. **Bin** each cluster column into ``2^bits`` quantile bins. Bin
   boundaries come from one ``approxQuantile`` pass (Greenwald-Khanna
   sketch, driver gets ~257 doubles per column — never the data), so
   a skewed column still spreads across all bins where a linear
   ``width_bucket`` would collapse into one. The per-row bin lookup
   compiles to a balanced ``CASE WHEN`` binary-search tree —
   ``bits`` comparisons per row, whole-stage-codegen, no UDF.
2. **Interleave** the bin bits into one long with
   ``shiftleft``/``shiftright``/``bitwiseAND`` expressions (pure
   codegen arithmetic).
3. **Range-partition + sort** by (bucket, z) — Spark's own sampled
   range partitioner splits the z-curve into contiguous segments, and
   each segment is a compact region of the clustered space. File
   min/max stats (lake/stats.py) then prune box predicates on any
   combination of the clustered columns; no z-specific read logic is
   needed, which also means a z-ordered table stays readable by every
   existing code path.

Only numeric/timestamp/date columns are z-orderable: string bins
would need order-preserving string→int mapping that truncated parquet
stats can't back safely (same reasoning as stats.py's string
exclusion), and point lookups on the bucket key already have bloom
sidecars. Nulls deliberately land in bin 0: null rows cannot satisfy
the null-rejecting filter grammar, so their placement affects only
file-stat tightness, never correctness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import DateType, StructType, TimestampType

from dexspark.lake import stats as lake_stats

Z_COL = "_z"

MAX_BITS = 16  # 16 bits x 4 cols = 64-bit z value ceiling


def _as_double(col: Column, dt) -> Column:
    if isinstance(dt, DateType):
        col = col.cast("timestamp")
    return col.cast("double")


def _bin_search_expr(col: Column, bounds: list[float]) -> Column:
    """Balanced CASE WHEN tree mapping value -> count(bounds <= v).

    ``bounds`` is sorted; the result is the bin index in
    [0, len(bounds)]. Depth is ceil(log2(len+1)) comparisons per row,
    all codegen — no higher-order interpreted loop over 2^bits
    boundaries."""

    def go(lo: int, hi: int) -> Column:
        # invariant: bounds[lo-1] <= v < bounds[hi] (virtual sentinels)
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return (
            F.when(col >= F.lit(bounds[mid]), go(mid + 1, hi))
            .otherwise(go(lo, mid))
        )

    if not bounds:
        return F.lit(0)
    return F.when(col.isNull(), F.lit(0)).otherwise(go(0, len(bounds)))


def _interleave(bin_cols: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits of each bin column into one long.

    Bit i of column j lands at position i*k + (k-1-j), so all columns
    contribute equally at every scale of the curve (column 0 is the
    most significant within each group)."""
    k = len(bin_cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, bc in enumerate(bin_cols):
            bit = F.shiftright(bc.cast("long"), i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * k + (k - 1 - j))
    return z


def validate_zorder_cols(cols: list[str], schema: StructType) -> None:
    if len(cols) < 2:
        raise ValueError(
            "zorder needs >= 2 cluster columns; use cluster_by alone "
            "for 1-D range clustering"
        )
    if len(cols) > 4:
        raise ValueError("zorder supports at most 4 columns")
    by_name = {f.name: f.dataType for f in schema.fields}
    for c in cols:
        dt = by_name.get(c)
        if dt is None:
            raise ValueError(f"cluster column {c!r} not in table schema")
        if not isinstance(
            dt, lake_stats._NUMERIC + (TimestampType, DateType)
        ):
            raise ValueError(
                f"zorder column {c!r} has type {dt.simpleString()}; only "
                "numeric/timestamp/date columns are z-orderable (string "
                "min/max stats may be truncated — see lake/stats.py)"
            )


def with_zvalue(
    df: DataFrame, cols: list[str], schema: StructType, bits: int = 8
) -> DataFrame:
    """Return ``df`` with a ``_z`` long column interleaving quantile
    bins of ``cols``. One extra pass over the projected cluster
    columns (the quantile sketch); everything else is expressions on
    the main pass. Caller drops ``_z`` after partitioning."""
    if not 1 <= bits <= MAX_BITS:
        raise ValueError(f"bits must be in [1, {MAX_BITS}]")
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must fit in a signed long")
    by_name = {f.name: f.dataType for f in schema.fields}
    probe_cols = [
        _as_double(F.col(c), by_name[c]).alias(f"_zq{i}")
        for i, c in enumerate(cols)
    ]
    n_bins = 1 << bits
    probs = [i / n_bins for i in range(1, n_bins)]
    # one sketch pass; relativeError trades sketch size for boundary
    # precision — boundaries only shape the layout, never results
    quantiles = df.select(*probe_cols).approxQuantile(
        [f"_zq{i}" for i in range(len(cols))], probs, 1.0 / (4 * n_bins)
    )
    bin_cols = []
    for i, c in enumerate(cols):
        bounds = sorted({q for q in quantiles[i] if q == q})  # drop NaN, dedup
        bin_cols.append(
            _bin_search_expr(_as_double(F.col(c), by_name[c]), bounds)
        )
    return df.withColumn(Z_COL, _interleave(bin_cols, bits))
