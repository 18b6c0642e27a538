"""Per-file key bloom filters for point-lookup data skipping.

min/max stats (lake/stats.py) deliberately skip string columns, so an
equality predicate on the bucket key — the right-to-be-forgotten
sweep ``delete_where([("conv_id", "=", X)])``, or a single-conversation
read — can bucket-prune but must still touch EVERY file of that
bucket. This module adds the Iceberg-puffin analogue: at commit time
each data file gets a small sidecar bloom filter over its bucket-key
values; at prune time an ``=`` filter on that column skips any file
whose bloom proves the key absent. Bloom answers are one-sided
("definitely absent" / "maybe present"), so skipping is a pure
optimization — the row-level residual filter still runs on survivors.

Design choices, sized for a manifest that must stay small:

- The bloom lives NEXT TO the data file (``<file>.bloom``), never
  inline in the manifest JSON — a compacted bucket file can hold 10^5+
  keys (~100 KB of bitset), and manifests are read on every commit.
  The sidecar is read lazily, only for files that survived bucket +
  stats pruning, so the prune-time I/O is a few KB per candidate file.
- Sized at ~10 bits/key, 7 probes → ~1% false-maybe rate, the classic
  operating point. Sizes round up to a power of two so the probe is a
  mask, not a modulo against an arbitrary bit count.
- Hashing is md5-based double hashing (h1 + i*h2), deterministic
  across Python versions and machines — the same property the
  fingerprint/LSH family relies on (functions/dedup.py). Keys are
  hashed by their canonical string form; NULL keys are never added
  (an ``=`` predicate is null-rejecting, so a NULL row could not have
  matched anyway).
- Format: 16-byte header (magic ``DXBLOOM1``, u32 m_bits, u32 k) +
  bitset. A file without a sidecar (pre-bloom commits, foreign
  writers) is simply never pruned — format-compatible both ways.
"""

from __future__ import annotations

import hashlib
import os
import struct
from typing import Any, Iterable

MAGIC = b"DXBLOOM1"
BITS_PER_KEY = 10
K_PROBES = 7
MIN_BITS = 1 << 10  # 128 bytes floor
SUFFIX = ".bloom"


def _hashes(value: Any) -> tuple[int, int]:
    d = hashlib.md5(str(value).encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1  # odd → full cycle on 2^m
    return h1, h2


def build(values: Iterable[Any]) -> bytes:
    """Serialize a bloom over the given (non-null) key values."""
    vals = [v for v in values if v is not None]
    m = MIN_BITS
    target = max(1, len(set(map(str, vals)))) * BITS_PER_KEY
    while m < target:
        m <<= 1
    mask = m - 1
    bits = bytearray(m // 8)
    for v in vals:
        h1, h2 = _hashes(v)
        for i in range(K_PROBES):
            b = (h1 + i * h2) & mask
            bits[b >> 3] |= 1 << (b & 7)
    return MAGIC + struct.pack("<II", m, K_PROBES) + bytes(bits)


def might_contain(blob: bytes, value: Any) -> bool:
    """False only when the bloom PROVES the key absent."""
    if value is None or len(blob) < 16 or blob[:8] != MAGIC:
        return True  # unreadable sidecar → cannot prune
    m, k = struct.unpack("<II", blob[8:16])
    if len(blob) != 16 + m // 8:
        return True
    mask = m - 1
    h1, h2 = _hashes(value)
    for i in range(k):
        b = (h1 + i * h2) & mask
        if not blob[16 + (b >> 3)] & (1 << (b & 7)):
            return False
    return True


def sidecar_path(data_file_abs: str, col: str | None = None) -> str:
    """``<file>.bloom`` for the bucket key; ``<file>.<col>.bloom`` for
    a secondary column (build_blooms — the Iceberg-puffin secondary
    index analogue)."""
    if col is None:
        return data_file_abs + SUFFIX
    return f"{data_file_abs}.{col}{SUFFIX}"


def data_path(sidecar_abs: str) -> str:
    """Inverse of ``sidecar_path`` — keep the naming scheme in ONE
    place so a future change cannot desynchronize producers from the
    GC sweep that pairs sidecars back to their data files. Handles
    both the key form (``x.parquet.bloom``) and the secondary form
    (``x.parquet.<col>.bloom``)."""
    if not sidecar_abs.endswith(SUFFIX):
        raise ValueError(f"not a sidecar path: {sidecar_abs!r}")
    base = sidecar_abs[: -len(SUFFIX)]
    if base.endswith(".parquet"):
        return base
    stem = base.rpartition(".")[0]
    if stem.endswith(".parquet"):
        return stem
    return base  # unknown layout: pairing fails safe (mtime rules)


def sidecars_for(data_file_abs: str) -> list[str]:
    """Every existing bloom sidecar (key + secondary) of a data file —
    the GC sweep removes these alongside the file."""
    d = os.path.dirname(data_file_abs)
    prefix = os.path.basename(data_file_abs) + "."
    try:
        names = os.listdir(d)
    except OSError:
        return []
    out = []
    for n in names:
        if n.endswith(SUFFIX) and (
            n == os.path.basename(data_file_abs) + SUFFIX
            or n.startswith(prefix)
        ):
            out.append(os.path.join(d, n))
    return out


def write_for_file(
    data_file_abs: str, key_col: str, sidecar_col: str | None = None
) -> bool:
    """Build + write the sidecar for one freshly-written parquet file.
    Reads ONLY the key column (columnar, local, O(file rows) but a
    single thin column — the cost Iceberg pays to build puffin blooms).
    ``sidecar_col`` names the sidecar (the table-current column name)
    when it differs from the file's physical column (``key_col``),
    e.g. a secondary bloom built over files written before a rename.
    Returns False (and writes nothing) when the column is missing."""
    import pyarrow.parquet as pq

    try:
        col = pq.read_table(data_file_abs, columns=[key_col]).column(0)
    except Exception:
        return False
    blob = build(col.to_pylist())
    dest = sidecar_path(data_file_abs, sidecar_col)
    tmp = dest + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(blob)
    os.replace(tmp, dest)
    return True


def read_sidecar(data_file_abs: str, col: str | None = None) -> bytes | None:
    try:
        with open(sidecar_path(data_file_abs, col), "rb") as fh:
            return fh.read()
    except OSError:
        return None


def file_may_contain(
    data_file_abs: str, value: Any, col: str | None = None
) -> bool:
    """Prune-time check: False only when a readable sidecar proves the
    key absent; missing sidecar → cannot prune."""
    blob = read_sidecar(data_file_abs, col)
    if blob is None:
        return True
    return might_contain(blob, value)
