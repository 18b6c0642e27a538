"""Archive decompression: 1→N fan-out of compressed payloads.

≙ reference O10 decompressor (FnDecompressor.kt:38-139): a routed file
whose payload is an archive is expanded into its entries — recursively,
so a zip inside a zip yields the inner leaves
(FnDecompressor.kt:105-139, nested recursion at :113-116) — and each
leaf becomes its own downstream record, path-qualified like
``outer.zip/inner.zip/file.txt``. Single-stream gzip payloads unwrap
to one leaf; non-archive payloads pass through unchanged.

Spark-native shape: ``mapInPandas`` over Arrow batches — payload bytes
never touch the driver, expansion is per-partition parallel, and the
1→N growth happens inside the stream (no shuffle). Decoding uses only
the Python stdlib (zipfile/gzip over BytesIO), so unlike the media
codecs (dexspark.multimodal.media) nothing here is stubbed.

Scale notes: one input partition expands by its archive fan-out, so
repartition narrow archive lists before this operator (same guard as
the explode-heavy dedup ops). ``max_depth`` bounds recursion against
zip bombs; a depth overrun is reported as a reject row, not an
exception, so one hostile blob cannot sink the batch (the reference's
per-record error channel, FnOrchestrator.kt:95-111).
"""

from __future__ import annotations

import gzip
import io
import tarfile
import zipfile
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

ENTRY_PATH_COL = "entry_path"
ENTRY_BYTES_COL = "entry_bytes"
REASON_COL = "reject_reason"

_ZIP_MAGIC = b"PK\x03\x04"
_GZIP_MAGIC = b"\x1f\x8b"
# POSIX ustar magic at offset 257 — plain (uncompressed) tar; .tar.gz
# reaches here through the gzip branch's recursion
_TAR_MAGIC_OFFSET = 257
_TAR_MAGIC = (b"ustar\x00", b"ustar ")


def _expand(name: str, payload: bytes, depth: int, max_depth: int):
    """Yield (leaf_path, leaf_bytes, reason) for one payload,
    recursing into nested archives.

    The depth bound only gates RECURSION into a further archive, so a
    plain leaf nested inside exactly ``max_depth`` archives still comes
    through as a leaf; only the max_depth+1'th decompression is refused.
    Every decode failure a hostile payload can provoke (truncated gzip
    → EOFError, corrupt deflate stream → zlib.error, encrypted zip
    entry → RuntimeError, plus the library's own OSError/BadZipFile)
    lands in the reject channel instead of failing the Spark task.
    """
    if payload is None:
        yield name, None, None
        return
    head = bytes(payload[:4])
    if head[:4] == _ZIP_MAGIC:
        if depth >= max_depth:
            yield name, None, "max_archive_depth"
            return
        try:
            with zipfile.ZipFile(io.BytesIO(payload)) as zf:
                for info in zf.infolist():
                    if info.is_dir():
                        continue
                    inner = zf.read(info)
                    yield from _expand(
                        f"{name}/{info.filename}", inner, depth + 1, max_depth
                    )
        except (zipfile.BadZipFile, RuntimeError, zlib.error, OSError, EOFError):
            yield name, None, "bad_archive"
        return
    if (
        len(payload) > _TAR_MAGIC_OFFSET + 6
        and bytes(payload[_TAR_MAGIC_OFFSET : _TAR_MAGIC_OFFSET + 6])
        in _TAR_MAGIC
    ):
        if depth >= max_depth:
            yield name, None, "max_archive_depth"
            return
        try:
            with tarfile.open(fileobj=io.BytesIO(payload), mode="r:") as tf:
                for info in tf.getmembers():
                    if not info.isfile():
                        continue  # dirs/symlinks/devices are not leaves
                    fh = tf.extractfile(info)
                    inner = fh.read() if fh is not None else None
                    yield from _expand(
                        f"{name}/{info.name}", inner, depth + 1, max_depth
                    )
        except (tarfile.TarError, zlib.error, OSError, EOFError):
            yield name, None, "bad_archive"
        return
    if head[:2] == _GZIP_MAGIC:
        if depth >= max_depth:
            yield name, None, "max_archive_depth"
            return
        try:
            inner = gzip.decompress(payload)
        except (OSError, EOFError, zlib.error):
            yield name, None, "bad_archive"
            return
        stripped = name[:-3] if name.endswith(".gz") else name
        yield from _expand(stripped, inner, depth + 1, max_depth)
        return
    yield name, payload, None  # not an archive: already a leaf


def unpack_archives(
    df: DataFrame,
    name_col: str = "name",
    payload_col: str = "payload",
    max_depth: int = 8,
) -> DataFrame:
    """Expand every archive payload into its (recursive) leaf entries.

    Input: any DataFrame with a string ``name_col`` and binary
    ``payload_col``. Output: all OTHER input columns unchanged, plus
    ``entry_path`` (string), ``entry_bytes`` (binary) and
    ``reject_reason`` (string, NULL for good leaves) — one row per
    leaf, in archive order; non-archive rows come through 1:1.
    """
    keep = [c for c in df.columns if c != payload_col and c != name_col]
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in keep
    )
    prefix = f"{out_schema}, " if out_schema else ""
    schema = (
        f"{prefix}{ENTRY_PATH_COL} string, "
        f"{ENTRY_BYTES_COL} binary, {REASON_COL} string"
    )

    def explode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for rec in pdf.to_dict("records"):
                payload = rec[payload_col]
                payload = bytes(payload) if payload is not None else None
                for path, data, reason in _expand(
                    rec[name_col] or "", payload, 0, max_depth
                ):
                    row = {c: rec[c] for c in keep}
                    row[ENTRY_PATH_COL] = path
                    row[ENTRY_BYTES_COL] = data
                    row[REASON_COL] = reason
                    rows.append(row)
            yield pd.DataFrame(
                rows, columns=[*keep, ENTRY_PATH_COL, ENTRY_BYTES_COL, REASON_COL]
            )

    return df.mapInPandas(explode_batches, schema)
