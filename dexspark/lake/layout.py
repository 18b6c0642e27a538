"""Bucket-layout algebra for metadata-only layout evolution.

``evolve_layout(n)`` (lake/table.py) changes a table's bucket count as
an O(metadata) commit — existing files stay on disk under the layout
they were written with (``DataFile.layout``), new writes bucket under
the new one, and every subsequent rewrite (COW merge, compaction,
maintain) migrates what it touches. This module is the math that makes
reads and merges correct while two (or more) layouts coexist.

The one fact everything builds on: a file written as bucket ``b``
under layout ``n`` holds exactly the keys with ``xxhash64(key) ≡ b
(mod n)``. Two files' key-spaces therefore intersect **iff** their
bucket ids are congruent modulo ``gcd(n1, n2)``::

    keys(n1, b1) ∩ keys(n2, b2) ≠ ∅  ⇔  b1 ≡ b2 (mod gcd(n1, n2))

(CRT: the pair of congruences ``h ≡ b1 (mod n1), h ≡ b2 (mod n2)`` is
solvable iff ``b1 ≡ b2 (mod gcd)``.)

``close_buckets`` computes the fixpoint closure of a seed bucket set
under that overlap relation against a live file set. The closed set
has the property the whole engine leans on — **class reads are
key-exact**: every key of every overlapping file falls back inside the
closed set (for a key ``h`` in file ``(n_f, b_f)``, its reference
bucket ``h mod n_ref`` is congruent to ``b_f mod gcd(n_f, n_ref)``, so
the fixpoint already added it). A COW merge that removes the closure's
files and rewrites their rows under the current layout is therefore a
perfect replacement: no row escapes, no row duplicates — and because
conflict resolution is max-LSN last-writer-wins (associative and
commutative), migrating one closure group at a time is as correct as
rebucketing the whole table at once.

``evolve_layout`` requires the new count to be a multiple or divisor
of every LIVE layout (enforced in lake/table.py). Correctness does not
need this — the gcd algebra above is total — but granularity does:
with a divisibility chain (16 → 64), a touched new bucket pulls in
exactly its one parent old bucket (closure size ``new/old``); with
coprime layouts gcd degenerates toward 1 and a closure can swallow the
table. Arbitrary layout jumps remain available as ``rebucket()`` (full
rewrite).

No reference-repo analogue: the reference's router has no bucketed
storage at all (RouteIngestedFile.kt routes blobs); this is the
engine-supplied lakehouse surface (SURVEY §2.2), modeled on Iceberg's
partition-spec evolution (spec-id per file, new spec for new data)
realized for hash buckets.
"""

from __future__ import annotations

import math
from typing import Iterable

from dexspark.lake import manifest as mf

Group = tuple[int, int]  # (layout, bucket)


def overlaps(n1: int, b1: int, n2: int, b2: int) -> bool:
    """True iff the key-spaces of bucket ``b1`` under layout ``n1``
    and bucket ``b2`` under layout ``n2`` can share a key."""
    g = math.gcd(n1, n2)
    return b1 % g == b2 % g


def file_groups(files: Iterable[mf.DataFile]) -> dict[Group, list[mf.DataFile]]:
    """Partition files by physical placement group (layout, bucket) —
    the unit all closure math works on (distinct groups ≤ Σ layouts,
    however many files the table has)."""
    out: dict[Group, list[mf.DataFile]] = {}
    for f in files:
        out.setdefault((f.layout, f.bucket), []).append(f)
    return out


def is_mixed(files: Iterable[mf.DataFile], num_buckets: int) -> bool:
    """Any file still under a layout other than ``num_buckets``?"""
    return any(f.layout != num_buckets for f in files)


def close_buckets(
    seeds: Iterable[int],
    files: Iterable[mf.DataFile],
    n_ref: int,
) -> tuple[set[int], list[mf.DataFile]]:
    """Fixpoint closure of ``seeds`` (bucket ids under layout
    ``n_ref``) against ``files``.

    Returns ``(closed_buckets, member_files)`` where:

    - ``member_files`` = every file whose key-space intersects the
      closed set (equivalently: every file that can hold a key of any
      seed bucket, transitively through other files' key-spaces);
    - ``closed_buckets`` ⊇ seeds is closed: every key of every member
      file has its ``n_ref`` bucket inside it.

    Single-layout fast path (every file layout == n_ref): the closure
    is the identity — seeds unchanged, members = files with bucket in
    seeds — zero overhead for the 99% of tables that never evolved.

    Driver-side cost: O(distinct groups × rounds); rounds ≤ number of
    distinct layouts (each round can only coarsen via a new gcd).
    """
    S = set(seeds)
    files = list(files)
    if not is_mixed(files, n_ref):
        return S, [f for f in files if f.bucket in S]
    groups = file_groups(files)
    # residues of S modulo each gcd we may meet, recomputed per round
    member_keys: set[Group] = set()
    while True:
        grew = False
        for (n, b), _fs in groups.items():
            if (n, b) in member_keys:
                continue
            g = math.gcd(n, n_ref)
            if (b % g) in {s % g for s in S}:
                member_keys.add((n, b))
                grew = True
        # expand S: all n_ref buckets overlapping any member group
        for n, b in member_keys:
            g = math.gcd(n, n_ref)
            r = b % g
            add = set(range(r, n_ref, g)) - S
            if add:
                S |= add
                grew = True
        if not grew:
            return S, [f for k in sorted(member_keys) for f in groups[k]]


def files_overlapping(
    files: Iterable[mf.DataFile], buckets: set[int], n_ref: int
) -> list[mf.DataFile]:
    """Files whose key-space intersects ``buckets`` (ids under layout
    ``n_ref``) — NO transitive closure. For a closed set (from
    ``close_buckets``) this selection is key-exact; for an arbitrary
    set it is a superset at file granularity (an old coarse file may
    carry keys of other buckets too)."""
    out = []
    res_cache: dict[int, set[int]] = {}
    for f in files:
        g = math.gcd(f.layout, n_ref)
        rs = res_cache.get(g)
        if rs is None:
            rs = {b % g for b in buckets}
            res_cache[g] = rs
        if f.bucket % g in rs:
            out.append(f)
    return out


def bucket_sets_intersect(
    n1: int, buckets1: Iterable[int], n2: int, buckets2: Iterable[int]
) -> bool:
    """Could any key live in both bucket sets (each under its own
    layout)? The conflict-detection primitive: two REPLACEMENT commits
    recorded under different current layouts collide iff this is true
    of their affected sets."""
    g = math.gcd(n1, n2)
    r1 = {b % g for b in buckets1}
    return any(b % g in r1 for b in buckets2)


def validate_evolution(
    new_num_buckets: int, live_layouts: set[int]
) -> None:
    """Enforce the divisibility-chain policy: the new bucket count
    must be a multiple or divisor of every live layout (current
    manifest layout included by the caller). Keeps closure groups at
    ratio granularity instead of gcd-1 table-swallowing ones; raises
    with the rebucket() escape hatch otherwise."""
    if new_num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")
    for n in live_layouts:
        if new_num_buckets % n != 0 and n % new_num_buckets != 0:
            raise ValueError(
                f"evolve_layout({new_num_buckets}) is not a multiple or "
                f"divisor of live layout {n}: incremental migration "
                "would degrade to whole-table closure groups — use "
                "rebucket() for arbitrary layout changes"
            )
