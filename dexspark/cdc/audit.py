"""Change-log continuity audit: prove the log is gap-free and
conflict-free BEFORE trusting a replay of it.

Every exactly-once guarantee downstream (LSN-gated merge, resumable
checkpoints, mirror/export LSN ordering) assumes the tailed log is
complete and internally consistent. A real binlog/WAL tailer checks
that assumption instead of inheriting it: a dropped segment upstream
(object-store eventual consistency, a producer crash between segment
uploads) shows up as an LSN GAP, and a producer bug that reuses a
sequence number shows up as two different payloads under one LSN.
≙ the reference's existence/validity gate on each incoming event
(FnRouter.kt:72-89 rejects events whose blob is missing or malformed)
lifted from per-record to whole-log: "is the stream I am about to
replay the stream the producer wrote?"

Three findings, one output shape ``(kind, lsn_from, lsn_to, n)``:

- ``gap``       — LSNs [lsn_from, lsn_to] are absent (n = count).
- ``conflict``  — one LSN, n (>1) DISTINCT payload fingerprints: the
  log is corrupt; replay must stop (which copy is true?).
- benign redelivery — the same (LSN, payload) delivered twice — is
  deliberately NOT a finding: the dedup stage absorbs it by design
  (cdc/dedup.py), so flagging it would page a human for a non-event.

Scale shape (10^10 LSNs): no global sort, no single-task window, no
driver state. The log is grouped once by LSN (the one unavoidable
exact-audit shuffle — map-side partial agg first, so what shuffles is
one row per (lsn, fingerprint)), then windowed WITHIN hash-sized LSN
spans (``span`` consecutive LSNs per window partition — parallel,
externally sorted), and spans are stitched by a per-span min/max
aggregate that is O(distinct_lsns / span) rows — KBs at 10^10. The
audit never materializes the payload: fingerprints are fixed-width
md5 from the first map pass.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame, Window, functions as F

if TYPE_CHECKING:  # pragma: no cover
    from dexspark.lake.table import LakeTable

AUDIT_COLS = ("kind", "lsn_from", "lsn_to", "n")

# NUL-ish sentinels so a NULL column and an empty string fingerprint
# differently, and so column boundaries can't alias ("ab","c" vs
# "a","bc").
_NULL = "\x00null\x00"
_SEP = "\x1f"


def payload_fingerprint(cols: list[str]) -> Column:
    """Canonical md5 fingerprint of a row's payload: every column cast
    to string, NULLs mapped to a sentinel, joined with a separator no
    payload contains. Cross-engine reproducible (same construction in
    ANSI SQL: md5(concat_ws(...)))."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def log_continuity_audit(
    log: DataFrame,
    lsn_col: str = "lsn",
    payload_cols: list[str] | None = None,
    span: int = 1 << 20,
    expected_min: int | None = None,
    expected_max: int | None = None,
) -> DataFrame:
    """Audit a change log for LSN gaps and same-LSN payload conflicts.

    ``payload_cols`` defaults to every column but the LSN.
    ``expected_min`` / ``expected_max`` extend the audit to the log's
    endpoints (e.g. from the last checkpoint's end_lsn + 1): without
    them a truncated head/tail is invisible because the observed
    min/max define the range. Returns ``(kind, lsn_from, lsn_to, n)``
    — empty means the log is exactly the dense LSN range it claims.
    """
    payload_cols = payload_cols or [c for c in log.columns if c != lsn_col]
    lsn = F.col(lsn_col).cast("long")

    # one shuffle: distinct (lsn, fingerprint), partially aggregated
    # map-side. n_variants > 1 under one LSN = corruption.
    per_lsn = (
        log.select(lsn.alias("lsn"), payload_fingerprint(payload_cols).alias("_fp"))
        .groupBy("lsn")
        .agg(F.count_distinct(F.col("_fp")).alias("_variants"))
    )

    conflicts = per_lsn.filter(F.col("_variants") > 1).select(
        F.lit("conflict").alias("kind"),
        F.col("lsn").alias("lsn_from"),
        F.col("lsn").alias("lsn_to"),
        F.col("_variants").cast("long").alias("n"),
    )

    # gaps WITHIN a span: lead() under a (span)-partitioned window —
    # parallel across spans, external sort within one.
    spanned = per_lsn.withColumn("_span", (F.col("lsn") / span).cast("long"))
    w = Window.partitionBy("_span").orderBy(F.col("lsn").asc())
    inner = (
        spanned.withColumn("_next", F.lead("lsn").over(w))
        .filter(F.col("_next") > F.col("lsn") + 1)
        .select(
            F.lit("gap").alias("kind"),
            (F.col("lsn") + 1).alias("lsn_from"),
            (F.col("_next") - 1).alias("lsn_to"),
            (F.col("_next") - F.col("lsn") - 1).alias("n"),
        )
    )

    # gaps BETWEEN spans (including wholly-missing spans): stitch the
    # per-span min/max — O(spans) rows, so the unpartitioned window is
    # over a tiny aggregate, never the data.
    edges = spanned.groupBy("_span").agg(
        F.min("lsn").alias("_mn"), F.max("lsn").alias("_mx")
    )
    # the constant partition key silences WindowExec's "No Partition
    # Defined ... moving all data to a single partition" warning —
    # single-partition is the POINT here (the stitch is a total order
    # over O(spans) aggregate rows, asserted data-independent by
    # tests/test_physical_plans.py), and the constant key states that
    # on the plan instead of tripping the scary-by-default log line.
    ew = Window.partitionBy(F.lit(0)).orderBy(F.col("_span").asc())
    boundary = (
        edges.withColumn("_next_mn", F.lead("_mn").over(ew))
        .filter(F.col("_next_mn") > F.col("_mx") + 1)
        .select(
            F.lit("gap").alias("kind"),
            (F.col("_mx") + 1).alias("lsn_from"),
            (F.col("_next_mn") - 1).alias("lsn_to"),
            (F.col("_next_mn") - F.col("_mx") - 1).alias("n"),
        )
    )

    out = conflicts.unionByName(inner).unionByName(boundary)

    # endpoint truncation vs the range the caller EXPECTS (one global
    # min/max agg — tree-reduced, tiny result). An EMPTY log with both
    # endpoints given reports the whole range as one gap; with only one
    # endpoint the missing range is unbounded, so emptiness is the
    # caller's error to notice (the head/tail filters are null-safe
    # no-ops then).
    if expected_min is not None or expected_max is not None:
        lo, hi = expected_min, expected_max
        ends = per_lsn.agg(
            F.min("lsn").alias("_mn"), F.max("lsn").alias("_mx")
        )
        head = tail = None
        if lo is not None:
            empty_ok = F.col("_mn").isNull() & F.lit(hi is not None)
            to = F.coalesce(
                F.col("_mn") - 1,
                F.lit(hi).cast("long") if hi is not None else F.lit(None),
            )
            head = ends.filter(empty_ok | (F.col("_mn") > lo)).select(
                F.lit("gap").alias("kind"),
                F.lit(lo).cast("long").alias("lsn_from"),
                to.alias("lsn_to"),
                (to - lo + 1).alias("n"),
            )
        if hi is not None:
            # an empty log is fully covered by the head gap above
            tail = ends.filter(F.col("_mx") < hi).select(
                F.lit("gap").alias("kind"),
                (F.col("_mx") + 1).alias("lsn_from"),
                F.lit(hi).cast("long").alias("lsn_to"),
                (F.lit(hi) - F.col("_mx")).alias("n"),
            )
        for piece in (head, tail):
            if piece is not None:
                out = out.unionByName(piece)
    return out


LINEAGE_AUDIT_DDL = (
    "kind string, a_batch string, b_batch string, "
    "lsn_from long, lsn_to long, n long"
)


def lineage_continuity_audit(table: "LakeTable") -> DataFrame:
    """Exactly-once sanity over a table's OWN metrics: the applied-LSN
    ranges of the batches on the live lineage must be pairwise
    disjoint, and consecutive ranges should leave no hole.

    Two kinds:

    - ``overlap`` (hard) — two committed batches claim the same LSNs:
      a double-apply, a misordered tail, or two producers writing the
      same sequence range. The LSN-gated merge masks the damage for
      last-writer-wins state, but SCD2 history, change-feed consumers,
      and lineage-based replay accounting are all wrong — stop and
      investigate.
    - ``range_gap`` (advisory) — LSNs between two batches that no
      batch applied. Legitimately thinned edges (rejected or deduped
      rows at a batch boundary carry LSNs that never reach the merge)
      look identical to a dropped log segment from here, so a gap is
      a pointer back to ``log_continuity_audit`` on the source log,
      not a verdict.

    Metadata-only: walks manifest summaries on the live lineage (the
    same chain as the exactly-once ledger — rolled-back batches drop
    out, published branch batches fold in where their publish commit
    carries lineage). O(commits) driver work, zero data I/O; findings
    are returned as a DataFrame for a uniform audit surface."""
    spans: dict[str, list[int]] = {}
    for _v, s in table.live_summaries():  # roots only — O(commits)
        bid = s.get("batch_id")
        if bid is None:
            continue
        lsns = [
            int(p[k])
            for p in s.get("partitions", [])
            for k in ("start_lsn", "end_lsn")
            if p.get(k) is not None
        ]
        if not lsns:
            continue
        cur = spans.setdefault(str(bid), [min(lsns), max(lsns)])
        cur[0] = min(cur[0], min(lsns))
        cur[1] = max(cur[1], max(lsns))

    findings: list[tuple] = []
    ordered = sorted(spans.items(), key=lambda kv: (kv[1][0], kv[1][1]))
    run_end: int | None = None
    run_batch: str | None = None
    for bid, (lo, hi) in ordered:
        if run_end is not None:
            if lo <= run_end:
                ov_hi = min(hi, run_end)
                findings.append(
                    ("overlap", run_batch, bid, lo, ov_hi, ov_hi - lo + 1)
                )
            elif lo > run_end + 1:
                findings.append(
                    ("range_gap", run_batch, bid, run_end + 1, lo - 1,
                     lo - run_end - 1)
                )
        if run_end is None or hi > run_end:
            run_end, run_batch = hi, bid
    return table.spark.createDataFrame(findings, LINEAGE_AUDIT_DDL)
