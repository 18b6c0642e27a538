"""Change-feed reader: diff two table snapshots into I/U/D events.

The engine's write side turns change events into snapshots; this is the
read side — reconstructing a change feed FROM snapshots (Delta's
``table_changes`` / Iceberg's changelog scan), so a downstream consumer
can subscribe to a table it does not ingest. Together they make the
lake table a CDC hub: log → table → log.

Plan shape: one full-outer join of the two snapshots on the merge key.
Both sides are bucketed on the same key already, and unchanged rows are
dropped by a null-safe struct comparison BEFORE anything wide happens —
so the output is O(changed rows). At 100 TB you run this per-bucket
(both reads prune to the same bucket list) and the join never sees
unaffected buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dexspark.lake.table import LakeTable, _align


def table_changes(
    table: LakeTable,
    from_version: int,
    to_version: int | None = None,
    key_cols: list[str] | None = None,
    op_col: str = "op",
) -> DataFrame:
    """Rows that changed between two snapshots, classified I/U/D.

    Output schema = current payload schema of ``to_version`` plus
    ``op_col``; D rows carry the deleted row's (old) payload. Rows
    identical in both snapshots are dropped."""
    m = table.manifest(to_version)
    key_cols = key_cols or [m.bucket_key]
    new_schema = table.schema(to_version)
    payload = [f.name for f in new_schema.fields]
    non_keys = [c for c in payload if c not in key_cols]

    old = _align(table.read(version=from_version), new_schema)
    new = table.read(version=to_version)

    o = old.select(
        *[F.col(c).alias(f"_o_{c}") for c in payload],
        *[F.col(c) for c in key_cols],
    )
    n = new.select(
        *[F.col(c).alias(f"_n_{c}") for c in payload],
        *[F.col(c) for c in key_cols],
    )
    j = o.join(n, on=key_cols, how="full_outer")

    in_old = F.col(f"_o_{key_cols[0]}").isNotNull()
    in_new = F.col(f"_n_{key_cols[0]}").isNotNull()
    same = F.struct(*[F.col(f"_o_{c}") for c in non_keys]).eqNullSafe(
        F.struct(*[F.col(f"_n_{c}") for c in non_keys])
    )

    op = (
        F.when(~in_old & in_new, F.lit("I"))
        .when(in_old & ~in_new, F.lit("D"))
        .when(~same, F.lit("U"))
    )
    side = F.when(in_new, F.lit("n")).otherwise(F.lit("o"))
    out_cols = [
        F.when(side == "n", F.col(f"_n_{c}")).otherwise(F.col(f"_o_{c}")).alias(c)
        for c in payload
    ]
    return (
        j.withColumn(op_col, op)
        .filter(F.col(op_col).isNotNull())
        .select(*out_cols, F.col(op_col))
    )
