"""Archive decompression fan-out (≙ FnDecompressor, incl. nested
recursion — mirrors Unit_FnDecompressor.happyPath_zip's
exact-output-set assertion)."""

import gzip
import io
import zipfile

from dexspark.operators.decompress import unpack_archives


def _zip(entries: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in entries.items():
            zf.writestr(name, data)
    return buf.getvalue()


def test_nested_zip_exact_output_set(spark):
    inner = _zip({"deep/a.txt": b"alpha", "b.txt": b"beta"})
    outer = _zip({"inner.zip": inner, "top.txt": b"gamma"})
    df = spark.createDataFrame(
        [("blob1.zip", bytearray(outer))], "name string, payload binary"
    )
    out = unpack_archives(df, name_col="name", payload_col="payload")
    got = {
        (r.entry_path, bytes(r.entry_bytes)) for r in out.collect()
    }
    # exact set: every leaf, path-qualified through the nesting
    assert got == {
        ("blob1.zip/inner.zip/deep/a.txt", b"alpha"),
        ("blob1.zip/inner.zip/b.txt", b"beta"),
        ("blob1.zip/top.txt", b"gamma"),
    }
    assert {r.reject_reason for r in out.collect()} == {None}


def test_gzip_and_passthrough_and_extra_cols(spark):
    gz = gzip.compress(b"hello stream")
    df = spark.createDataFrame(
        [
            (1, "notes.txt.gz", bytearray(gz)),
            (2, "plain.bin", bytearray(b"raw bytes")),
        ],
        "src_id int, name string, payload binary",
    )
    rows = {r.src_id: r for r in unpack_archives(df).collect()}
    assert bytes(rows[1].entry_bytes) == b"hello stream"
    assert rows[1].entry_path == "notes.txt"  # .gz suffix stripped
    assert bytes(rows[2].entry_bytes) == b"raw bytes"
    assert rows[2].entry_path == "plain.bin"


def test_bad_archive_and_depth_bomb_go_to_error_channel(spark):
    truncated = _zip({"x": b"y"})[:10]  # zip magic, corrupt body
    bomb = b"data"
    for i in range(12):  # nest deeper than max_depth
        bomb = _zip({f"l{i}.zip": bomb}) if i else _zip({"leaf": bomb})
    df = spark.createDataFrame(
        [("bad.zip", bytearray(truncated)), ("bomb.zip", bytearray(bomb))],
        "name string, payload binary",
    )
    out = unpack_archives(df, max_depth=8).collect()
    reasons = {r.name if hasattr(r, "name") else r.entry_path: r.reject_reason for r in out}
    by_path = {r.entry_path: r for r in out}
    assert by_path["bad.zip"].reject_reason == "bad_archive"
    assert any(
        r.reject_reason == "max_archive_depth" for r in out
    )  # bomb bounded, batch survives
    assert all(r.entry_bytes is None for r in out if r.reject_reason)
