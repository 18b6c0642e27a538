"""Table-level CHECK constraints — declarative data-quality rules that
travel WITH the table, not with any one pipeline.

≙ the reference's validation gates (FnRouter.kt:80-84 required-field
checks, FnCSVValidationGeneric.kt:30-48 per-record rules) — but where
those rules live in each route's config and bind only to the ingest
path, a table constraint is part of the TABLE's metadata (manifest
properties, versioned like the schema), so every writer — CDC merge,
plain append, MERGE INTO, a mirror — sees the same contract. The model
is Delta's CHECK constraints / DLT expectations:

- ``on_violation="fail"`` (Delta ``ADD CONSTRAINT``): a hard
  invariant. Any write introducing a violating row raises
  ``ConstraintViolation`` and nothing commits. Adding the constraint
  validates EXISTING rows first (one scan), so a live "fail"
  constraint is a table-wide proof.
- ``on_violation="drop"`` (DLT ``expect_or_drop``): an expectation.
  The CDC apply pipeline routes violating rows to the quarantine
  (reason ``constraint:<name>``) and counts them in lineage like any
  validation reject; plain writers treat it as advisory.

NULL semantics follow the SQL standard for CHECK: a row violates only
when the predicate evaluates to FALSE — UNKNOWN (NULL) passes. Express
non-null rules explicitly (``col IS NOT NULL``).

Scale shape: enforcement is a handful of codegen'd CASE aggregates
riding jobs the write path already runs (the merge's per-bucket stats
pass, an Observation on append's write job) — zero extra scans on the
hot path, no UDF, no driver-side row work.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import Column, functions as F

PREFIX = "constraint."
REASON_PREFIX = "constraint:"
MODES = ("fail", "drop")


class ConstraintViolation(Exception):
    """A write would introduce rows that break a "fail"-mode CHECK
    constraint (or ``add_constraint`` found existing rows that do).
    Carries ``counts``: {constraint_name: violating_row_count}."""

    def __init__(self, message: str, counts: dict[str, int]):
        super().__init__(message)
        self.counts = dict(counts)


def validate_name(name: str) -> None:
    if not re.fullmatch(r"[A-Za-z0-9][A-Za-z0-9._-]{0,127}", name):
        raise ValueError(
            f"invalid constraint name {name!r}: use letters, digits, "
            "'.', '_', '-' (must not start with a separator)"
        )


def defs_from_properties(properties: dict[str, str]) -> dict[str, dict]:
    """{name: {"expr": sql, "on_violation": mode}} from manifest
    properties (``constraint.<name>`` → JSON), name-sorted so every
    consumer evaluates the same deterministic order."""
    out = {}
    for k in sorted(properties):
        if k.startswith(PREFIX):
            out[k[len(PREFIX):]] = json.loads(properties[k])
    return out


def is_violated(expr_sql: str) -> Column:
    """Boolean column: TRUE iff the CHECK predicate evaluates to FALSE
    for the row (SQL-standard CHECK — UNKNOWN passes)."""
    return ~F.coalesce(F.expr(expr_sql).cast("boolean"), F.lit(True))


def violation_count_aggs(
    defs: dict[str, dict],
    modes: tuple[str, ...] = ("fail",),
    skip: Column | None = None,
    alias_prefix: str = "_cviol_",
) -> list[Column]:
    """One codegen'd conditional-count aggregate per constraint in
    ``modes`` — made to ride a job the caller is already running
    (merge's stats pass, an Observation on a write). ``skip`` masks
    rows the constraint does not apply to (CDC deletes carry key-only
    payloads)."""
    aggs = []
    for name, d in defs.items():
        if d["on_violation"] not in modes:
            continue
        cond = is_violated(d["expr"])
        if skip is not None:
            cond = cond & ~skip
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).alias(alias_prefix + name)
        )
    return aggs


def raise_if_violated(counts: dict[str, int], context: str) -> None:
    bad = {n: c for n, c in counts.items() if c}
    if bad:
        detail = ", ".join(f"{n}={c}" for n, c in sorted(bad.items()))
        raise ConstraintViolation(
            f"{context}: CHECK constraint violated ({detail})", bad
        )


def drop_mode_reason(defs: dict[str, dict], skip: Column | None = None):
    """CASE expression assigning ``constraint:<name>`` (first violated
    constraint in name order) to rows that break a "drop"-mode
    expectation — slots into the validation reason chain after the
    built-in checks. None when no drop-mode constraint exists."""
    expr = None
    for name, d in defs.items():
        if d["on_violation"] != "drop":
            continue
        cond = is_violated(d["expr"])
        if skip is not None:
            cond = cond & ~skip
        step = F.when(cond, F.lit(REASON_PREFIX + name))
        expr = step if expr is None else expr.when(cond, F.lit(REASON_PREFIX + name))
    return expr
