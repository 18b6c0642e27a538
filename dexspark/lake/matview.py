"""Incrementally-maintained aggregate views (materialized rollups).

A 100 TB CDC store is rarely read raw: dashboards, monitors, and
feature pipelines read GROUP-BY rollups of it. Recomputing a rollup
after every ingest micro-batch is O(table); this module keeps it
current in O(changed rows) by subscribing to the lake's own change
feed — classic self-maintainable-view algebra:

- supported aggregates: COUNT(*) (always, as ``n_rows``), integer
  SUMs of arbitrary non-null row expressions (AVG is derivable as
  sum/count by the reader), and integer MIN/MAX. SUM/COUNT are fully
  self-maintainable; MIN/MAX are only PARTIALLY so — inserts and
  replacing updates fold in exactly (``least``/``greatest`` against
  the stored extremum), but a delete that removes the current
  extremum cannot be undone from the change feed alone. Those groups
  are detected per refresh (an old-image value touching the stored
  extremum with no new-image value re-covering it) and re-scanned
  from the SOURCE head — one job over only the dirty groups,
  bucket-pruned when the group key is the source bucket key, never
  O(table) unless deletions hit the extremum of every group at once.
- maintenance: every changed row contributes ``-contribution(old)``
  and ``+contribution(new)`` to its group (pre/post images from
  ``table_changes(images=True)``, bucket-pruned so I/O is O(changed
  data)); contributions fold into per-group deltas by one map-side-
  combinable aggregate; deltas merge into the stored totals with ONE
  keyed COW merge that reads only the view buckets holding affected
  groups. A group whose row count reaches zero is deleted from the
  view.
- exactly-once: the refresh commits under batch id
  ``{prefix}-v{head}`` in the VIEW's ledger with the source head
  version as the LSN — the same monotone-version gate the change-feed
  mirror uses (lake/changes.py::mirror_table), so re-running a refresh
  is a no-op and a crashed refresh resumes cleanly.
- self-healing: if ``expire_snapshots`` on the source has dropped the
  last-maintained version (or a fresh view faces a source with expired
  history), the incremental diff is impossible — the refresh falls
  back to a full REBUILD (recompute the rollup at head, snapshot-diff
  it against the stored view, one merge) instead of silently diverging.

≙ reference: the staged pub-sub topology's downstream consumers
(eventgridsystemtopic/dex-rs-file-ingested/template.json:48-106 route
each staged write to per-route subscribers); here the subscriber is an
aggregate rather than a copy, held exactly consistent by the same
ledger discipline.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from dexspark.lake import manifest as mf
from dexspark.lake.changes import last_done_version, snapshot_diff, table_changes
from dexspark.lake.table import LakeTable

N_ROWS = "n_rows"


def _check_spec(
    view: LakeTable,
    group_cols: list[str],
    sum_exprs: dict[str, str],
    min_exprs: dict[str, str] | None,
    max_exprs: dict[str, str] | None,
) -> None:
    """Refuse a refresh whose aggregate spec does not match the view's
    stored schema: merge's schema alignment would silently DROP a
    newly-requested aggregate column (it projects changes onto the view
    schema), so spec drift must be an error, not a no-op."""
    want = group_cols + [N_ROWS] + list(sum_exprs) + list(min_exprs or {}) + list(
        max_exprs or {}
    )
    have = [f.name for f in view.schema().fields]
    if sorted(want) != sorted(have):
        raise ValueError(
            f"aggregate spec {sorted(want)} does not match the view's "
            f"schema {sorted(have)} — re-create the view (or fix the "
            "spec); merging a drifted spec would silently drop columns"
        )


def view_schema(
    src_schema: StructType,
    group_cols: list[str],
    sum_exprs: dict[str, str],
    min_exprs: dict[str, str] | None = None,
    max_exprs: dict[str, str] | None = None,
) -> StructType:
    """Schema of the rollup table: the grouping columns (types taken
    from the source schema) + ``n_rows`` + one long per SUM/MIN/MAX."""
    by_name = {f.name: f for f in src_schema.fields}
    missing = [c for c in group_cols if c not in by_name]
    if missing:
        raise ValueError(f"group columns not in source schema: {missing}")
    agg_names = list(sum_exprs) + list(min_exprs or {}) + list(max_exprs or {})
    clash = [n for n in agg_names if n in group_cols or n == N_ROWS]
    if clash:
        raise ValueError(f"aggregate names collide with group/{N_ROWS}: {clash}")
    if len(set(agg_names)) != len(agg_names):
        raise ValueError(f"duplicate aggregate names: {agg_names}")
    fields = [StructField(c, by_name[c].dataType, True) for c in group_cols]
    fields.append(StructField(N_ROWS, LongType(), True))
    fields.extend(StructField(n, LongType(), True) for n in agg_names)
    return StructType(fields)


def create_agg_view(
    spark: SparkSession,
    view_dir: str,
    src: LakeTable,
    group_cols: list[str],
    sum_exprs: dict[str, str],
    num_buckets: int = 8,
    min_exprs: dict[str, str] | None = None,
    max_exprs: dict[str, str] | None = None,
) -> LakeTable:
    """Create (or open) the rollup table for ``src`` grouped by
    ``group_cols`` with the given SUM/MIN/MAX expressions.

    Each dict maps output column name → a Spark SQL expression over
    the source's payload columns (e.g. ``{"sum_len": "length(text)"}``).
    Expressions must be NON-NULL on every live row: SQL aggregates skip
    nulls, but a retraction of null is null, so a nullable expression
    would make incremental and recomputed totals diverge — wrap with
    ``coalesce(e, 0)`` at the call site if the column is nullable.
    GROUP columns must be non-null too (keyed joins throughout the
    refresh and merge are null-unsafe); the refresh raises on a null
    group value rather than silently corrupting the view."""
    if LakeTable.exists(view_dir):
        return LakeTable(spark, view_dir)
    schema = view_schema(src.schema(), group_cols, sum_exprs, min_exprs, max_exprs)
    return LakeTable.create(
        spark, view_dir, schema, bucket_key=group_cols[0], num_buckets=num_buckets
    )


def _full_agg(
    df: DataFrame,
    group_cols: list[str],
    sum_exprs: dict[str, str],
    min_exprs: dict[str, str] | None = None,
    max_exprs: dict[str, str] | None = None,
) -> DataFrame:
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias(N_ROWS),
        *[
            F.sum(F.expr(e).cast("long")).cast("long").alias(n)
            for n, e in sum_exprs.items()
        ],
        *[
            F.min(F.expr(e).cast("long")).alias(n)
            for n, e in (min_exprs or {}).items()
        ],
        *[
            F.max(F.expr(e).cast("long")).alias(n)
            for n, e in (max_exprs or {}).items()
        ],
    )


def _delta_rows(
    view: LakeTable,
    feed: DataFrame,
    group_cols: list[str],
    sum_exprs: dict[str, str],
    min_exprs: dict[str, str] | None = None,
    max_exprs: dict[str, str] | None = None,
    src: LakeTable | None = None,
    head: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Fold a pre/post-image change feed into per-group view rows
    ready to merge: new totals for affected groups (op U) and deletes
    for groups whose row count reached zero (op D).

    MIN/MAX maintenance: per group the feed yields a new-image
    candidate (the batch's own extremum) and an old-image candidate
    (the extremum of what was removed/replaced). A stored extremum M
    survives unless an old value touched it (``old <= M`` for MIN)
    AND no new value re-covers it (``new > M``); only those DIRTY
    groups are re-aggregated from the source head (``src`` at version
    ``head``), one semi-joined job over only those groups."""
    min_exprs = min_exprs or {}
    max_exprs = max_exprs or {}
    names = list(sum_exprs)
    ext = list(min_exprs.items()) + list(max_exprs.items())

    def contributions(img_col: str, sign: int) -> DataFrame:
        img = feed.filter(F.col(img_col).isNotNull()).select(f"{img_col}.*")
        side = "n" if sign > 0 else "o"
        other = "o" if sign > 0 else "n"
        return img.select(
            *group_cols,
            F.lit(sign).cast("long").alias("_dn"),
            *[
                (F.expr(e).cast("long") * F.lit(sign)).alias(n)
                for n, e in sum_exprs.items()
            ],
            # extreme candidates, side-tagged (the other side is null
            # so the per-group agg below sees each side separately)
            *[F.expr(e).cast("long").alias(f"_{side}e_{n}") for n, e in ext],
            *[F.lit(None).cast("long").alias(f"_{other}e_{n}") for n, _ in ext],
        )

    mn = list(min_exprs)
    mx = list(max_exprs)
    changed = [F.col("_dn") != 0] + [F.col(f"_d_{n}") != 0 for n in names] + [
        # a changed extreme-expr value can move MIN/MAX even when every
        # SUM delta cancels; an unchanged one (U touching other
        # columns) cannot — its value left and re-entered the group
        ~F.col(f"_ne_{n}").eqNullSafe(F.col(f"_oe_{n}"))
        for n, _ in ext
    ]
    deltas = (
        contributions("_new", 1)
        .unionByName(contributions("_old", -1))
        .groupBy(*group_cols)
        .agg(
            F.sum("_dn").cast("long").alias("_dn"),
            *[F.sum(n).cast("long").alias(f"_d_{n}") for n in names],
            *[F.min(f"_ne_{n}").alias(f"_ne_{n}") for n in mn],
            *[F.min(f"_oe_{n}").alias(f"_oe_{n}") for n in mn],
            *[F.max(f"_ne_{n}").alias(f"_ne_{n}") for n in mx],
            *[F.max(f"_oe_{n}").alias(f"_oe_{n}") for n in mx],
        )
        # all-zero deltas (a U that changed only non-aggregated
        # columns) would rewrite view buckets for nothing — drop them
        .filter(reduce(lambda a, b: a | b, changed))
        # the per-group frame is read up to three times (bucket
        # collect, dirty-key scan, the merge itself) — persist it;
        # the caller unpersists after the merge commits
        .persist()
    )

    # read ONLY the view buckets that can hold an affected group: the
    # distinct-bucket collect is bounded by the view's bucket count,
    # never by data size
    m = view.manifest()
    null_group = reduce(
        lambda a, b: a | b, [F.col(c).isNull() for c in group_cols]
    )
    b_rows = (
        deltas.select(
            view._bucket_expr(m).alias("_b"), null_group.alias("_null")
        )
        .distinct()
        .collect()
    )
    if any(r["_null"] for r in b_rows):
        # a NULL group value can never join back to its stored view row
        # (every keyed join in the refresh and the merge is null-unsafe;
        # xxhash64 even buckets NULL like a real value) — corrupting
        # silently is worse than failing loudly
        deltas.unpersist()
        raise ValueError(
            "NULL in a group-by column: group columns must be non-null "
            "on every live row (coalesce them in the source or group by "
            "a derived non-null expression)"
        )
    b_ids = sorted(int(r["_b"]) for r in b_rows)
    existing = view.read(buckets=b_ids).select(
        *group_cols,
        F.col(N_ROWS).alias("_v_n"),
        *[F.col(n).alias(f"_v_{n}") for n in names + mn + mx],
    )
    joined = deltas.join(existing, on=group_cols, how="left")
    new_n = F.coalesce(F.col("_v_n"), F.lit(0)) + F.col("_dn")

    def dirty(n: str, is_min: bool):
        v, old, new = F.col(f"_v_{n}"), F.col(f"_oe_{n}"), F.col(f"_ne_{n}")
        hit = (old <= v) if is_min else (old >= v)
        covered = (new <= v) if is_min else (new >= v)
        return v.isNotNull() & old.isNotNull() & hit & ~F.coalesce(
            covered, F.lit(False)
        )

    ext_cols: list = []
    if ext:
        dirty_flags = [dirty(n, True) for n in mn] + [dirty(n, False) for n in mx]
        any_dirty = reduce(lambda a, b: a | b, dirty_flags) & (new_n > 0)
        if src is None:
            raise ValueError("min/max maintenance requires the source table")
        dirty_keys = joined.filter(any_dirty).select(*group_cols)
        sm = src.manifest(head)
        if group_cols[0] == sm.bucket_key:
            # group key starts at the source bucket key: the rescan
            # only reads the source buckets holding dirty groups
            db = (
                dirty_keys.select(src._bucket_expr(sm).alias("_b"))
                .distinct()
                .collect()
            )
            src_state = src.read(
                version=head, buckets=sorted(int(r["_b"]) for r in db)
            )
        else:
            src_state = src.read(version=head)
        # no broadcast hint: AQE broadcasts the dirty set when small
        # (the common case — deletions rarely hit many extrema at
        # once) but falls back to a shuffle join when a mass delete
        # dirties millions of groups, instead of OOMing the driver
        rescan = (
            src_state.join(dirty_keys, group_cols, "left_semi")
            .groupBy(*group_cols)
            .agg(
                *[
                    F.min(F.expr(e).cast("long")).alias(f"_r_{n}")
                    for n, e in min_exprs.items()
                ],
                *[
                    F.max(F.expr(e).cast("long")).alias(f"_r_{n}")
                    for n, e in max_exprs.items()
                ],
            )
        )
        joined = joined.join(rescan, on=group_cols, how="left")
        for n, is_min in [(n, True) for n in mn] + [(n, False) for n in mx]:
            fold = F.least if is_min else F.greatest
            incremental = fold(
                F.coalesce(F.col(f"_v_{n}"), F.col(f"_ne_{n}")),
                F.coalesce(F.col(f"_ne_{n}"), F.col(f"_v_{n}")),
            )
            ext_cols.append(
                F.when(dirty(n, is_min), F.col(f"_r_{n}"))
                .otherwise(incremental)
                .alias(n)
            )

    out = joined.select(
        *group_cols,
        new_n.alias(N_ROWS),
        *[
            (F.coalesce(F.col(f"_v_{n}"), F.lit(0)) + F.col(f"_d_{n}")).alias(n)
            for n in names
        ],
        *ext_cols,
        F.when(new_n == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
    )
    return out, deltas


@dataclass
class AggViewSpec:
    """A rollup subscription bundled for a streaming ingest: pass a
    list of these to ``CdcStreamReplay(views=...)`` and each applied
    micro-batch is followed by an incremental refresh — the downstream
    dashboard is never more than one micro-batch behind the table.
    Refreshes ride the view's own ledger, so a replayed micro-batch
    (restart, redelivery) refreshes as a no-op."""

    view: "LakeTable"
    group_cols: list[str]
    sum_exprs: dict[str, str] = field(default_factory=dict)
    batch_id_prefix: str = "aggview"
    min_exprs: dict[str, str] = field(default_factory=dict)
    max_exprs: dict[str, str] = field(default_factory=dict)
    # every N applied refreshes, expire old view snapshots (keeping
    # ``keep_last``): a long-running stream refreshes the view every
    # micro-batch, and without in-loop expiry the view dir accumulates
    # one manifest + one set of rewritten bucket files per trigger,
    # forever. Caution: expiry prunes the ledger entries the resume
    # gate reads, but the gate only needs the LATEST {prefix}-v{N}
    # entry, which keep_last >= 1 always retains.
    expire_every: int = 0
    keep_last: int = 8
    _refreshes: int = field(default=0, repr=False)

    def refresh(self, src: "LakeTable") -> dict[str, Any] | None:
        info = refresh_agg_view(
            src,
            self.view,
            self.group_cols,
            self.sum_exprs,
            batch_id_prefix=self.batch_id_prefix,
            min_exprs=self.min_exprs,
            max_exprs=self.max_exprs,
        )
        if info is not None and self.expire_every:
            self._refreshes += 1
            if self._refreshes >= self.expire_every:
                self._refreshes = 0
                info["expired"] = self.view.expire_snapshots(
                    keep_last=self.keep_last
                )
        return info


def refresh_agg_view(
    src: LakeTable,
    view: LakeTable,
    group_cols: list[str],
    sum_exprs: dict[str, str],
    batch_id_prefix: str = "aggview",
    min_exprs: dict[str, str] | None = None,
    max_exprs: dict[str, str] | None = None,
) -> dict[str, Any] | None:
    """Bring ``view`` up to date with ``src``'s head snapshot.

    Call after every ingest batch (or on any schedule — it catches up
    from wherever it last committed in ONE merge, like the mirror's
    composed catch-up). Returns the merge info dict, or None when the
    view is already current. Cost: O(rows changed since the last
    refresh) + one view merge touching only affected buckets — never
    O(source table), except in the documented rebuild fallback."""
    _check_spec(view, group_cols, sum_exprs, min_exprs, max_exprs)
    versions = mf.available_versions(src.meta_dir)
    if not versions:
        return None
    head = versions[-1]
    maintained = last_done_version(view, batch_id_prefix)
    if maintained is not None and maintained >= head:
        return None

    is_create = src.manifest(versions[0]).summary.get("operation") == "create"
    feed = deltas = None
    if maintained is not None and maintained in versions:
        feed = table_changes(src, maintained, head, images=True)
    elif maintained is None and is_create:
        feed = table_changes(src, versions[0], head, images=True)
    if feed is not None:
        # the diff join is read twice (affected-bucket collect + the
        # merge itself) — persist it so the snapshot scan runs once
        feed = feed.persist()
        changes, deltas = _delta_rows(
            view, feed, group_cols, sum_exprs,
            min_exprs=min_exprs, max_exprs=max_exprs, src=src, head=head,
        )
        mode = "incremental"
    else:
        # retention gap (src history expired past the last refresh):
        # recompute the rollup at head and diff it against the stored
        # view — O(table) exactly once, never silent divergence
        target = _full_agg(
            src.read(version=head), group_cols, sum_exprs, min_exprs, max_exprs
        )
        null_groups = reduce(
            lambda a, b: a | b, [F.col(c).isNull() for c in group_cols]
        )
        if target.filter(null_groups).limit(1).count() > 0:
            raise ValueError(
                "NULL in a group-by column: group columns must be "
                "non-null on every live row"
            )
        payload = (
            group_cols + [N_ROWS] + list(sum_exprs)
            + list(min_exprs or {}) + list(max_exprs or {})
        )
        changes = snapshot_diff(
            view.read().select(*payload), target.select(*payload),
            group_cols, payload,
        )
        mode = "rebuild"

    try:
        return view.merge(
            changes.withColumn("lsn", F.lit(head).cast("long")),
            key_cols=group_cols,
            summary={
                "batch_id": f"{batch_id_prefix}-v{head}",
                "maintained_version": head,
                "view_mode": mode,
                "maintained_from": maintained,
            },
        )
    finally:
        if deltas is not None:
            deltas.unpersist()
        if feed is not None:
            feed.unpersist()
