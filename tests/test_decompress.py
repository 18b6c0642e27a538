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


# -- property: arbitrary nested archives expand to exactly their leaves --
try:
    from hypothesis import given, settings, strategies as st

    _leaf = st.binary(min_size=0, max_size=32)

    def _tree(depth):
        if depth == 0:
            return _leaf
        return st.one_of(
            _leaf,
            st.dictionaries(
                st.from_regex(r"[a-z]{1,6}(\.txt)?", fullmatch=True),
                _tree(depth - 1),
                min_size=1,
                max_size=3,
            ),
        )

    def _pack(node):
        """dict -> zip bytes; bytes -> leaf payload."""
        if isinstance(node, dict):
            return _zip({k: _pack(v) for k, v in node.items()})
        return node

    def _leaves(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                yield from _leaves(v, f"{prefix}/{k}")
        else:
            # a leaf that *looks* like an archive (zip/gzip magic) would
            # be descended into; the generator's tiny random payloads
            # only collide with magics rarely — filtered in the test
            yield prefix, node

    _MAGICS = (b"PK\x03\x04", b"\x1f\x8b")

    @settings(max_examples=60, deadline=None)
    @given(_tree(3))
    def test_expand_property(node):
        from dexspark.operators.decompress import _expand

        expected = {
            (p, d)
            for p, d in _leaves(node, "root")
            if not any(d[: len(m)] == m for m in _MAGICS)
        }
        got = {
            (p, d)
            for p, d, reason in _expand("root", _pack(node), 0, 8)
            if reason is None
        }
        # every clean expected leaf is recovered verbatim at its path
        assert expected <= got

except ImportError:  # hypothesis not installed
    pass

def test_hostile_payloads_reject_not_crash(spark):
    """ADVICE r2: every decode failure a hostile payload can provoke
    must land in the reject channel, never fail the task. Truncated
    gzip raises EOFError (not OSError); corrupt deflate raises
    zlib.error — both previously escaped the handler."""
    truncated_gz = gzip.compress(b"x" * 1000)[:12]  # gzip magic, cut body
    df = spark.createDataFrame(
        [("t.gz", bytearray(truncated_gz))], "name string, payload binary"
    )
    out = unpack_archives(df).collect()
    assert len(out) == 1 and out[0].reject_reason == "bad_archive"
    assert out[0].entry_bytes is None


def test_leaf_at_max_depth_passes_through():
    """ADVICE r2 off-by-one: a plain leaf nested inside exactly
    max_depth archives is still a leaf — only recursing into the
    (max_depth+1)'th archive is refused."""
    from dexspark.operators.decompress import _expand

    payload = b"leaf-data"
    nested = payload
    for i in range(3):
        nested = _zip({f"l{i}": nested})
    # 3 levels of zip, max_depth=3: the leaf IS reachable
    got = list(_expand("root.zip", nested, 0, 3))
    assert got == [("root.zip/l2/l1/l0", payload, None)]
    # one level deeper than allowed: the inner archive is refused
    deeper = _zip({"l3": nested})
    got2 = list(_expand("root.zip", deeper, 0, 3))
    assert got2 == [("root.zip/l3/l2/l1", None, "max_archive_depth")]


def test_tar_and_tar_gz_expand(spark):
    """tar and tar.gz payloads expand to their file leaves (dirs and
    symlinks skipped); a zip nested inside a tar recurses; truncated
    tar rejects."""
    import gzip
    import io
    import tarfile
    import zipfile

    def make_tar(entries, extra=None):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            d = tarfile.TarInfo("subdir")
            d.type = tarfile.DIRTYPE
            tf.addfile(d)
            for name, data in entries:
                ti = tarfile.TarInfo(name)
                ti.size = len(data)
                tf.addfile(ti, io.BytesIO(data))
            if extra is not None:
                ti = tarfile.TarInfo(extra[0])
                ti.size = len(extra[1])
                tf.addfile(ti, io.BytesIO(extra[1]))
        return buf.getvalue()

    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr("inner.txt", b"deep")
    tar_plain = make_tar(
        [("a.txt", b"alpha"), ("subdir/b.txt", b"beta")],
        extra=("n.zip", zbuf.getvalue()),
    )
    tar_gz = gzip.compress(make_tar([("c.txt", b"gamma")]))
    df = spark.createDataFrame(
        [
            ("t.tar", bytearray(tar_plain)),
            ("t.tar.gz", bytearray(tar_gz)),
            ("trunc.tar", bytearray(tar_plain[:400])),
        ],
        "name string, payload binary",
    )
    from dexspark.operators.decompress import unpack_archives

    rows = {
        r.entry_path: (bytes(r.entry_bytes) if r.entry_bytes else None,
                       r.reject_reason)
        for r in unpack_archives(df).collect()
    }
    assert rows["t.tar/a.txt"] == (b"alpha", None)
    assert rows["t.tar/subdir/b.txt"] == (b"beta", None)
    assert rows["t.tar/n.zip/inner.txt"] == (b"deep", None)
    # the gzip layer strips .gz before recursing (existing convention)
    assert rows["t.tar/c.txt"] == (b"gamma", None)
    assert rows["trunc.tar"][1] == "bad_archive"
    assert not any(p.endswith("/subdir") for p in rows)
