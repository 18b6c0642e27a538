"""Incrementally-maintained aggregate views (lake/matview.py).

Invariant under test: after every refresh, the view's contents equal a
full GROUP-BY recompute of the source's head snapshot — through
inserts, updates, deletes, multi-version catch-up, group retirement,
and the retention-gap rebuild fallback."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import _parse_datatype_string

from dexspark.lake.matview import (
    _full_agg,
    create_agg_view,
    refresh_agg_view,
    view_schema,
)
from dexspark.lake.table import LakeTable

SCHEMA = "conv_id string, turn_idx int, lang string, text string"
GROUP = ["lang"]
SUMS = {"sum_len": "length(text)"}


def _batch(spark, rows, lsn0):
    rows = [r + (lsn0 + i,) for i, r in enumerate(rows)]
    return spark.createDataFrame(rows, SCHEMA + ", op string, lsn long")


def _src(spark, d):
    t = LakeTable.create(
        spark, d, _parse_datatype_string(SCHEMA), bucket_key="conv_id", num_buckets=4
    )
    t.merge(
        _batch(
            spark,
            [
                ("c1", 0, "en", "hello world", "I"),
                ("c1", 1, "en", "more text here", "I"),
                ("c2", 0, "fr", "bonjour", "I"),
            ],
            100,
        ),
        key_cols=["conv_id", "turn_idx"],
        summary={"batch_id": "b1"},
    )
    return t


def _assert_view_equals_recompute(view, src):
    expected = _full_agg(src.read(), GROUP, SUMS)
    got = view.read().select("lang", "n_rows", "sum_len")
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_view_schema_validates(spark):
    src = _parse_datatype_string(SCHEMA)
    s = view_schema(src, ["lang"], {"sum_len": "length(text)"})
    assert [f.name for f in s.fields] == ["lang", "n_rows", "sum_len"]
    with pytest.raises(ValueError):
        view_schema(src, ["nope"], {})
    with pytest.raises(ValueError):
        view_schema(src, ["lang"], {"lang": "1"})


def test_initial_refresh_builds_rollup(spark, tmp_table_dir):
    src = _src(spark, tmp_table_dir + "/src")
    view = create_agg_view(spark, tmp_table_dir + "/v", src, GROUP, SUMS, num_buckets=4)
    info = refresh_agg_view(src, view, GROUP, SUMS)
    assert info["view_mode"] == "incremental"
    _assert_view_equals_recompute(view, src)
    rows = {r.lang: (r.n_rows, r.sum_len) for r in view.read().collect()}
    assert rows == {"en": (2, 25), "fr": (1, 7)}


def test_incremental_update_delete_and_group_retirement(spark, tmp_table_dir):
    src = _src(spark, tmp_table_dir + "/src")
    view = create_agg_view(spark, tmp_table_dir + "/v", src, GROUP, SUMS, num_buckets=4)
    refresh_agg_view(src, view, GROUP, SUMS)
    # two src commits, ONE composed catch-up refresh
    src.merge(
        _batch(
            spark,
            [
                ("c1", 0, "en", "hello world EDITED longer", "U"),
                ("c2", 0, "fr", "bonjour", "D"),  # retires the fr group
                ("c3", 0, "de", "hallo", "I"),
            ],
            200,
        ),
        key_cols=["conv_id", "turn_idx"],
        summary={"batch_id": "b2"},
    )
    src.merge(
        _batch(
            spark,
            [("c3", 1, "de", "zweiter", "I"), ("c1", 1, "en", "more text here", "D")],
            300,
        ),
        key_cols=["conv_id", "turn_idx"],
        summary={"batch_id": "b3"},
    )
    info = refresh_agg_view(src, view, GROUP, SUMS)
    assert info["view_mode"] == "incremental"
    rows = {r.lang: (r.n_rows, r.sum_len) for r in view.read().collect()}
    # fr reached n_rows == 0 and must be DELETED, not kept at zero
    assert rows == {"en": (1, 25), "de": (2, 12)}
    _assert_view_equals_recompute(view, src)


def test_refresh_is_idempotent(spark, tmp_table_dir):
    src = _src(spark, tmp_table_dir + "/src")
    view = create_agg_view(spark, tmp_table_dir + "/v", src, GROUP, SUMS, num_buckets=4)
    assert refresh_agg_view(src, view, GROUP, SUMS) is not None
    v = view.current_version()
    assert refresh_agg_view(src, view, GROUP, SUMS) is None  # already current
    assert view.current_version() == v  # no empty commit either


def test_noop_source_commit_refreshes_cleanly(spark, tmp_table_dir):
    # a layout-only src commit (compaction) yields an empty feed; the
    # refresh must still advance the maintained version (ledger-only
    # commit) so the next refresh doesn't rediff the same interval
    src = _src(spark, tmp_table_dir + "/src")
    view = create_agg_view(spark, tmp_table_dir + "/v", src, GROUP, SUMS, num_buckets=4)
    refresh_agg_view(src, view, GROUP, SUMS)
    head = src.current_version()
    src.compact(min_files_per_bucket=1)  # force a full layout-only rewrite
    assert src.current_version() > head  # the compaction really committed
    info = refresh_agg_view(src, view, GROUP, SUMS)
    assert info is not None and info["view_mode"] == "incremental"
    _assert_view_equals_recompute(view, src)
    assert refresh_agg_view(src, view, GROUP, SUMS) is None


def test_retention_gap_falls_back_to_rebuild(spark, tmp_table_dir):
    src = _src(spark, tmp_table_dir + "/src")
    view = create_agg_view(spark, tmp_table_dir + "/v", src, GROUP, SUMS, num_buckets=4)
    refresh_agg_view(src, view, GROUP, SUMS)
    src.merge(
        _batch(spark, [("c4", 0, "en", "new conversation", "I")], 400),
        key_cols=["conv_id", "turn_idx"],
        summary={"batch_id": "b4"},
    )
    src.expire_snapshots(keep_last=1)  # drops the maintained version
    info = refresh_agg_view(src, view, GROUP, SUMS)
    assert info["view_mode"] == "rebuild"
    _assert_view_equals_recompute(view, src)


def test_fresh_view_on_expired_history_rebuilds(spark, tmp_table_dir):
    # a view created AFTER the src's create manifest was expired cannot
    # diff from the beginning — must rebuild, not silently diverge
    src = _src(spark, tmp_table_dir + "/src")
    src.merge(
        _batch(spark, [("c9", 0, "it", "ciao", "I")], 500),
        key_cols=["conv_id", "turn_idx"],
        summary={"batch_id": "b9"},
    )
    src.expire_snapshots(keep_last=1)
    view = create_agg_view(spark, tmp_table_dir + "/v", src, GROUP, SUMS, num_buckets=4)
    info = refresh_agg_view(src, view, GROUP, SUMS)
    assert info["view_mode"] == "rebuild"
    _assert_view_equals_recompute(view, src)


def test_refresh_per_batch_matches_composed(spark, tmp_table_dir):
    # refreshing after every commit and refreshing once at the end must
    # converge to the same rollup
    def ingest(t):
        t.merge(
            _batch(
                spark,
                [
                    ("c1", 0, "en", "hello world longer now", "U"),
                    ("c5", 0, "es", "hola", "I"),
                ],
                600,
            ),
            key_cols=["conv_id", "turn_idx"],
            summary={"batch_id": "m1"},
        )
        t.merge(
            _batch(spark, [("c5", 0, "es", "hola amigos", "U")], 700),
            key_cols=["conv_id", "turn_idx"],
            summary={"batch_id": "m2"},
        )

    src_a = _src(spark, tmp_table_dir + "/a")
    view_a = create_agg_view(spark, tmp_table_dir + "/va", src_a, GROUP, SUMS, 4)
    refresh_agg_view(src_a, view_a, GROUP, SUMS)
    src_a.merge(
        _batch(
            spark,
            [
                ("c1", 0, "en", "hello world longer now", "U"),
                ("c5", 0, "es", "hola", "I"),
            ],
            600,
        ),
        key_cols=["conv_id", "turn_idx"],
        summary={"batch_id": "m1"},
    )
    refresh_agg_view(src_a, view_a, GROUP, SUMS)
    src_a.merge(
        _batch(spark, [("c5", 0, "es", "hola amigos", "U")], 700),
        key_cols=["conv_id", "turn_idx"],
        summary={"batch_id": "m2"},
    )
    refresh_agg_view(src_a, view_a, GROUP, SUMS)

    src_b = _src(spark, tmp_table_dir + "/b")
    view_b = create_agg_view(spark, tmp_table_dir + "/vb", src_b, GROUP, SUMS, 4)
    ingest(src_b)
    refresh_agg_view(src_b, view_b, GROUP, SUMS)

    a = view_a.read().select("lang", "n_rows", "sum_len")
    b = view_b.read().select("lang", "n_rows", "sum_len")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    _assert_view_equals_recompute(view_a, src_a)


MINS = {"min_len": "length(text)"}
MAXS = {"max_len": "length(text)", "max_turn": "turn_idx"}


def _assert_minmax_equals_recompute(view, src):
    expected = _full_agg(src.read(), GROUP, SUMS, MINS, MAXS)
    cols = ["lang", "n_rows", "sum_len", "min_len", "max_len", "max_turn"]
    got = view.read().select(*cols)
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def _minmax_view(spark, d, src):
    return create_agg_view(
        spark, d, src, GROUP, SUMS, num_buckets=4,
        min_exprs=MINS, max_exprs=MAXS,
    )


def _refresh_mm(src, view):
    return refresh_agg_view(
        src, view, GROUP, SUMS, min_exprs=MINS, max_exprs=MAXS
    )


def test_minmax_initial_and_insert_only(spark, tmp_table_dir):
    src = _src(spark, tmp_table_dir + "/src")
    view = _minmax_view(spark, tmp_table_dir + "/v", src)
    assert _refresh_mm(src, view)["view_mode"] == "incremental"
    _assert_minmax_equals_recompute(view, src)
    # insert-only batch: extremes fold in with no rescan needed
    src.merge(
        _batch(spark, [("c7", 3, "en", "xy", "I")], 800),  # new min_len for en
        key_cols=["conv_id", "turn_idx"],
        summary={"batch_id": "mm1"},
    )
    assert _refresh_mm(src, view) is not None
    _assert_minmax_equals_recompute(view, src)
    rows = {r.lang: r.min_len for r in view.read().collect()}
    assert rows["en"] == 2


def test_minmax_delete_of_extremum_rescans_group(spark, tmp_table_dir):
    src = _src(spark, tmp_table_dir + "/src")
    view = _minmax_view(spark, tmp_table_dir + "/v", src)
    _refresh_mm(src, view)
    # en rows: len 11 ("hello world") and 14 ("more text here");
    # delete the max-len row — the stored extremum is gone and only a
    # source rescan of the group can recover the new max (11)
    src.merge(
        _batch(spark, [("c1", 1, "en", "more text here", "D")], 900),
        key_cols=["conv_id", "turn_idx"],
        summary={"batch_id": "mm2"},
    )
    assert _refresh_mm(src, view) is not None
    rows = {r.lang: (r.n_rows, r.min_len, r.max_len) for r in view.read().collect()}
    assert rows["en"] == (1, 11, 11)
    _assert_minmax_equals_recompute(view, src)


def test_minmax_update_replacing_extremum(spark, tmp_table_dir):
    src = _src(spark, tmp_table_dir + "/src")
    view = _minmax_view(spark, tmp_table_dir + "/v", src)
    _refresh_mm(src, view)
    # shrink the longest en row IN PLACE (old image hits max, new image
    # does not re-cover it) and grow the fr row (pure fold, no rescan)
    src.merge(
        _batch(
            spark,
            [
                ("c1", 1, "en", "tiny", "U"),
                ("c2", 0, "fr", "bonjour tout le monde", "U"),
            ],
            1000,
        ),
        key_cols=["conv_id", "turn_idx"],
        summary={"batch_id": "mm3"},
    )
    assert _refresh_mm(src, view) is not None
    rows = {
        r.lang: (r.min_len, r.max_len) for r in view.read().collect()
    }
    assert rows["en"] == (4, 11)   # max fell back to "hello world"
    assert rows["fr"] == (21, 21)  # grew via the incremental fold
    _assert_minmax_equals_recompute(view, src)


def test_minmax_rebuild_after_retention_gap(spark, tmp_table_dir):
    src = _src(spark, tmp_table_dir + "/src")
    view = _minmax_view(spark, tmp_table_dir + "/v", src)
    _refresh_mm(src, view)
    src.merge(
        _batch(spark, [("c1", 0, "en", "hello world", "D")], 1100),
        key_cols=["conv_id", "turn_idx"],
        summary={"batch_id": "mm4"},
    )
    src.expire_snapshots(keep_last=1)
    info = _refresh_mm(src, view)
    assert info["view_mode"] == "rebuild"
    _assert_minmax_equals_recompute(view, src)


def test_refresh_is_bucket_pruned(spark, tmp_table_dir):
    # a change confined to one group must merge into exactly the ONE
    # view bucket holding that group — the O(changed rows) contract,
    # machine-checked via the merge's affected-bucket lineage
    src = _src(spark, tmp_table_dir + "/src")
    view = create_agg_view(spark, tmp_table_dir + "/v", src, GROUP, SUMS, num_buckets=8)
    refresh_agg_view(src, view, GROUP, SUMS)
    src.merge(
        _batch(spark, [("c1", 2, "en", "a third english turn", "I")], 1500),
        key_cols=["conv_id", "turn_idx"],
        summary={"batch_id": "bp1"},
    )
    info = refresh_agg_view(src, view, GROUP, SUMS)
    assert len(info["affected_buckets"]) == 1 and info["change_rows"] == 1
    _assert_view_equals_recompute(view, src)


def test_view_over_mor_source(spark, tmp_table_dir):
    # the change feed resolves merge-on-read deltas at read time, so a
    # view must stay exact over a MOR source — across outstanding
    # deltas AND a compaction between refreshes
    src = LakeTable.create(
        spark, tmp_table_dir + "/src", _parse_datatype_string(SCHEMA),
        bucket_key="conv_id", num_buckets=4,
    )
    view = create_agg_view(spark, tmp_table_dir + "/v", src, GROUP, SUMS, num_buckets=4)
    src.merge(
        _batch(
            spark,
            [
                ("c1", 0, "en", "hello world", "I"),
                ("c2", 0, "fr", "bonjour", "I"),
            ],
            100,
        ),
        key_cols=["conv_id", "turn_idx"],
        summary={"batch_id": "m1"},
        strategy="mor",
    )
    refresh_agg_view(src, view, GROUP, SUMS)
    _assert_view_equals_recompute(view, src)
    src.merge(
        _batch(
            spark,
            [("c1", 0, "en", "hello world, edited", "U"),
             ("c2", 0, "fr", "bonjour", "D")],
            200,
        ),
        key_cols=["conv_id", "turn_idx"],
        summary={"batch_id": "m2"},
        strategy="mor",
    )
    src.compact()
    refresh_agg_view(src, view, GROUP, SUMS)
    rows = {r.lang: (r.n_rows, r.sum_len) for r in view.read().collect()}
    assert rows == {"en": (1, 19)}
    _assert_view_equals_recompute(view, src)


def test_null_group_value_raises(spark, tmp_table_dir):
    # a NULL group value can never join back to its stored view row
    # (null-unsafe keyed joins throughout) — must fail loudly, not
    # silently accumulate duplicate NULL rows
    src = LakeTable.create(
        spark, tmp_table_dir + "/src", _parse_datatype_string(SCHEMA),
        bucket_key="conv_id", num_buckets=4,
    )
    src.merge(
        _batch(spark, [("c1", 0, None, "hello", "I")], 100),
        key_cols=["conv_id", "turn_idx"],
        summary={"batch_id": "n1"},
    )
    view = create_agg_view(spark, tmp_table_dir + "/v", src, GROUP, SUMS, num_buckets=4)
    with pytest.raises(ValueError, match="NULL in a group-by column"):
        refresh_agg_view(src, view, GROUP, SUMS)


def test_spec_drift_raises(spark, tmp_table_dir):
    # refreshing an existing view with a different aggregate spec must
    # error: merge's schema alignment would silently drop the new column
    src = _src(spark, tmp_table_dir + "/src")
    view = create_agg_view(spark, tmp_table_dir + "/v", src, GROUP, SUMS, num_buckets=4)
    refresh_agg_view(src, view, GROUP, SUMS)
    with pytest.raises(ValueError, match="does not match the view's"):
        refresh_agg_view(
            src, view, GROUP, SUMS, min_exprs={"min_len": "length(text)"}
        )


def test_aggviewspec_expire_every_bounds_view_history(spark, tmp_table_dir):
    # a per-micro-batch refresh accumulates one view snapshot per
    # trigger forever; expire_every prunes them in-loop while the
    # latest ledger entry (all the resume gate needs) always survives
    from dexspark.lake import manifest as mf
    from dexspark.lake.matview import AggViewSpec

    src = _src(spark, tmp_table_dir + "/src")
    view = create_agg_view(spark, tmp_table_dir + "/v", src, GROUP, SUMS, num_buckets=4)
    spec = AggViewSpec(view, GROUP, SUMS, expire_every=2, keep_last=2)
    for i in range(5):
        src.merge(
            _batch(spark, [("c1", i, "en", f"turn number {i}", "U" if i == 0 else "I")], 2000 + i),
            key_cols=["conv_id", "turn_idx"],
            summary={"batch_id": f"e{i}"},
        )
        assert spec.refresh(src) is not None
    assert len(mf.available_versions(view.table_dir)) <= 4  # pruned
    assert spec.refresh(src) is None  # resume gate survives expiry
    _assert_view_equals_recompute(view, src)
