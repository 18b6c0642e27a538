"""Property-based tests (hypothesis): the CDC core against a pure-
Python reference model, mirroring SURVEY §5's golden final-state
strategy with adversarial inputs instead of fixed fixtures."""

from datetime import datetime, timedelta

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from dexspark.cdc.dedup import dedupe_latest

BASE = datetime(2024, 1, 1)

# small key space to force collisions; duplicate LSNs allowed only as
# verbatim redeliveries (same payload), like at-least-once delivery
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),   # conv
        st.integers(min_value=0, max_value=3),   # turn
        st.integers(min_value=0, max_value=50),  # lsn
        st.sampled_from(["I", "U", "D"]),
    ),
    min_size=1,
    max_size=60,
)


def _rows(evs):
    # payload is a pure function of (conv, turn, lsn) so equal-LSN
    # redeliveries are byte-identical (at-least-once semantics)
    return [
        (
            lsn,
            op,
            f"c{conv}",
            turn,
            "user",
            f"text-{conv}-{turn}-{lsn}",
            None,
            # monotone in turn within a conv so the ts-monotonicity
            # validator never fires (it is tested separately)
            BASE + timedelta(seconds=turn),
        )
        for conv, turn, lsn, op in evs
    ]


SCHEMA = (
    "lsn long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp"
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy)
def test_dedupe_latest_matches_python_model(spark, evs):
    # ops at the same (key, lsn) must be identical too (verbatim
    # redelivery) — keep the first op seen for that (key, lsn)
    seen = {}
    canon = []
    for conv, turn, lsn, op in evs:
        op = seen.setdefault((conv, turn, lsn), op)
        canon.append((conv, turn, lsn, op))

    df = spark.createDataFrame(_rows(canon), SCHEMA)
    got = {
        (r.conv_id, r.turn_idx): (r.lsn, r.op, r.text)
        for r in dedupe_latest(df, ["conv_id", "turn_idx"]).collect()
    }

    model = {}
    for conv, turn, lsn, op in canon:
        k = (f"c{conv}", turn)
        if k not in model or lsn > model[k][0]:
            model[k] = (lsn, op, f"text-{conv}-{turn}-{lsn}")
    assert got == model


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy, st.integers(min_value=2, max_value=5))
def test_replay_final_state_matches_model_any_batching(spark, tmp_path_factory, evs, n_batches):
    """Applying the same LSN-ordered log in ANY batch partitioning
    yields the same final table (batch boundaries are an execution
    detail, not semantics)."""
    from pyspark.sql.types import _parse_datatype_string

    from dexspark.cdc.apply import apply_changes
    from dexspark.lake.table import LakeTable

    seen = {}
    canon = []
    for conv, turn, lsn, op in evs:
        op = seen.setdefault((conv, turn, lsn), op)
        canon.append((conv, turn, lsn, op))
    # one event per (key, lsn); order by lsn for batching
    uniq = {}
    for conv, turn, lsn, op in canon:
        uniq[(conv, turn, lsn)] = (conv, turn, lsn, op)
    ordered = sorted(uniq.values(), key=lambda e: e[2])

    d = tmp_path_factory.mktemp("prop_tbl")
    payload = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    table = LakeTable.create(
        spark, str(d), _parse_datatype_string(payload), "conv_id", num_buckets=4
    )
    size = max(1, len(ordered) // n_batches)
    for b, start in enumerate(range(0, len(ordered), size)):
        chunk = ordered[start : start + size]
        df = spark.createDataFrame(_rows(chunk), SCHEMA)
        apply_changes(table, df, batch_id=f"p{b}")

    model = {}
    for conv, turn, lsn, op in ordered:
        k = (f"c{conv}", turn)
        if k not in model or lsn >= model[k][0]:
            model[k] = (lsn, op)
    expected = {k for k, (lsn, op) in model.items() if op != "D"}
    got = {(r.conv_id, r.turn_idx) for r in table.read().collect()}
    assert got == expected


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events_strategy,
    st.integers(min_value=2, max_value=5),
    st.randoms(use_true_random=False),
    st.integers(min_value=0, max_value=4),
)
def test_mor_replay_any_batching_any_order(
    spark, tmp_path_factory, evs, n_batches, rng, compact_at
):
    """Merge-on-read replay is commutative: ANY batch partitioning,
    applied in ANY order, with a compaction injected at an arbitrary
    point, converges to the same final state as the Python model —
    the read-time max-LSN resolve must behave exactly like the COW
    write-time gate under adversarial schedules."""
    from pyspark.sql.types import _parse_datatype_string

    from dexspark.cdc.apply import apply_changes
    from dexspark.lake.table import LakeTable

    seen = {}
    canon = []
    for conv, turn, lsn, op in evs:
        op = seen.setdefault((conv, turn, lsn), op)
        canon.append((conv, turn, lsn, op))
    uniq = {}
    for conv, turn, lsn, op in canon:
        uniq[(conv, turn, lsn)] = (conv, turn, lsn, op)
    ordered = sorted(uniq.values(), key=lambda e: e[2])

    size = max(1, len(ordered) // n_batches)
    chunks = [ordered[s : s + size] for s in range(0, len(ordered), size)]
    order = list(range(len(chunks)))
    rng.shuffle(order)  # adversarial: batches arrive out of order

    d = tmp_path_factory.mktemp("prop_mor")
    payload = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    table = LakeTable.create(
        spark, str(d), _parse_datatype_string(payload), "conv_id", num_buckets=4
    )
    for i, b in enumerate(order):
        df = spark.createDataFrame(_rows(chunks[b]), SCHEMA)
        apply_changes(table, df, batch_id=f"pm{b}", strategy="mor")
        if i == min(compact_at, len(order) - 1):
            table.compact()

    model = {}
    for conv, turn, lsn, op in ordered:
        k = (f"c{conv}", turn)
        if k not in model or lsn >= model[k][0]:
            model[k] = (lsn, op)
    expected = {k for k, (lsn, op) in model.items() if op != "D"}
    got = {(r.conv_id, r.turn_idx) for r in table.read().collect()}
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy, st.integers(min_value=1, max_value=4))
def test_agg_view_refresh_matches_recompute(spark, tmp_path_factory, evs, n_refresh):
    """After any op sequence (duplicate extremes, group retirement,
    re-insert after delete) and any refresh cadence, the incremental
    COUNT/SUM/MIN/MAX rollup equals a from-scratch GROUP BY of the
    final table — the self-maintainability contract of lake/matview."""
    from pyspark.sql.types import _parse_datatype_string

    from dexspark.cdc.apply import apply_changes
    from dexspark.lake.matview import (
        _full_agg,
        create_agg_view,
        refresh_agg_view,
    )
    from dexspark.lake.table import LakeTable

    seen = {}
    uniq = {}
    for conv, turn, lsn, op in evs:
        op = seen.setdefault((conv, turn, lsn), op)
        uniq[(conv, turn, lsn)] = (conv, turn, lsn, op)
    ordered = sorted(uniq.values(), key=lambda e: e[2])

    d = tmp_path_factory.mktemp("prop_view")
    payload = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    table = LakeTable.create(
        spark, str(d / "t"), _parse_datatype_string(payload), "conv_id", num_buckets=4
    )
    group = ["conv_id"]
    sums = {"sum_len": "length(text)"}
    mins = {"min_len": "length(text)"}
    maxs = {"max_turn": "turn_idx", "max_len": "length(text)"}
    view = create_agg_view(
        spark, str(d / "v"), table, group, sums, num_buckets=4,
        min_exprs=mins, max_exprs=maxs,
    )
    size = max(1, len(ordered) // n_refresh)
    for b, start in enumerate(range(0, len(ordered), size)):
        chunk = ordered[start : start + size]
        df = spark.createDataFrame(_rows(chunk), SCHEMA)
        apply_changes(table, df, batch_id=f"pv{b}")
        refresh_agg_view(
            table, view, group, sums, min_exprs=mins, max_exprs=maxs
        )

    cols = ["conv_id", "n_rows", "sum_len", "min_len", "max_turn", "max_len"]
    expected = _full_agg(table.read(), group, sums, mins, maxs).select(*cols)
    got = view.read().select(*cols)
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events_strategy,
    st.integers(min_value=2, max_value=4),
    st.lists(st.sampled_from(["direct", "wap", "wap_retry"]), min_size=4, max_size=4),
)
def test_wap_any_staging_pattern_matches_direct(
    spark, tmp_path_factory, evs, n_batches, modes
):
    """Every batch applied either directly, staged-and-published, or
    staged-poisoned-dropped-restaged-published yields the same final
    state as a plain direct replay — branch staging is an execution
    detail, never semantics (exactly-once holds across the ledger
    fold-in and the drop-branch id release)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import _parse_datatype_string

    from dexspark.cdc.apply import apply_changes
    from dexspark.lake.table import LakeTable

    uniq = {}
    for conv, turn, lsn, op in evs:
        uniq.setdefault((conv, turn, lsn), (conv, turn, lsn, op))
    ordered = sorted(uniq.values(), key=lambda e: e[2])

    payload = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    d = tmp_path_factory.mktemp("prop_wap")
    table = LakeTable.create(
        spark, str(d / "t"), _parse_datatype_string(payload), "conv_id", 4
    )
    size = max(1, len(ordered) // n_batches)
    chunks = [ordered[s : s + size] for s in range(0, len(ordered), size)]
    for b, chunk in enumerate(chunks):
        df = spark.createDataFrame(_rows(chunk), SCHEMA)
        mode = modes[b % len(modes)]
        if mode == "direct":
            apply_changes(table, df, batch_id=f"w{b}")
        else:
            if mode == "wap_retry":
                br = table.create_branch(f"s{b}-bad")
                poison = df.withColumn("text", F.lit("CORRUPT"))
                apply_changes(br, poison, batch_id=f"w{b}")
                table.drop_branch(f"s{b}-bad")
            br = table.create_branch(f"s{b}")
            apply_changes(br, df, batch_id=f"w{b}")
            table.publish_branch(f"s{b}")
        # redelivery of an already-committed batch must no-op in
        # every mode (ledger covers direct AND published ids)
        assert apply_changes(table, df, batch_id=f"w{b}")["skipped"] is True

    model = {}
    for conv, turn, lsn, op in ordered:
        k = (f"c{conv}", turn)
        if k not in model or lsn >= model[k][0]:
            model[k] = (lsn, op)
    expected = {k for k, (lsn, op) in model.items() if op != "D"}
    got = {(r.conv_id, r.turn_idx) for r in table.read().collect()}
    assert got == expected


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events_strategy,
    st.integers(min_value=2, max_value=5),
    st.randoms(use_true_random=False),
)
def test_scd2_history_any_batching_any_order(
    spark, tmp_path_factory, evs, n_batches, rng
):
    """SCD2 apply is commutative: ANY batch partitioning, applied in
    ANY order, converges to the interval chains a single in-order pass
    would produce (Python model) — late batches whose LSNs land
    between stored versions must split intervals exactly; dangling
    deletes must persist as markers until consumed and never leak
    into the logical view."""
    from pyspark.sql.types import _parse_datatype_string

    from dexspark.cdc.scd2 import apply_changes_scd2, scd2_schema, scd2_view
    from dexspark.lake.table import LakeTable

    seen = {}
    uniq = {}
    for conv, turn, lsn, op in evs:
        op = seen.setdefault((conv, turn, lsn), op)
        uniq[(conv, turn, lsn)] = (conv, turn, lsn, op)
    ordered = sorted(uniq.values(), key=lambda e: e[2])

    d = tmp_path_factory.mktemp("prop_scd2")
    payload = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    history = LakeTable.create(
        spark, str(d), scd2_schema(_parse_datatype_string(payload)),
        "conv_id", num_buckets=4,
    )
    size = max(1, len(ordered) // n_batches)
    chunks = [
        (b, ordered[start : start + size])
        for b, start in enumerate(range(0, len(ordered), size))
    ]
    rng.shuffle(chunks)
    for b, chunk in chunks:
        df = spark.createDataFrame(_rows(chunk), SCHEMA)
        apply_changes_scd2(history, df, batch_id=f"s{b}")

    # Python model: per key, the lsn-sorted event list; each non-D
    # event opens a version closed by the next event (image or D)
    per_key = {}
    for conv, turn, lsn, op in ordered:
        per_key.setdefault((f"c{conv}", turn), []).append((lsn, op))
    model = set()
    for (conv, turn), evts in per_key.items():
        evts.sort()
        for i, (lsn, op) in enumerate(evts):
            if op == "D":
                continue
            nxt = evts[i + 1] if i + 1 < len(evts) else None
            model.add((
                conv, turn, lsn,
                nxt[0] if nxt else None,
                bool(nxt and nxt[1] == "D"),
                nxt is None,
            ))

    got = {
        (r.conv_id, r.turn_idx, r.valid_from_lsn, r.valid_to_lsn,
         r.closed_by_delete, r.is_current)
        for r in scd2_view(history.read()).collect()
    }
    assert got == model


# ---------------------------------------------------------------------------
# log continuity audit vs a pure-Python reference model
# ---------------------------------------------------------------------------

audit_strategy = st.tuples(
    st.sets(st.integers(min_value=0, max_value=120), min_size=0, max_size=60),
    st.sets(st.integers(min_value=0, max_value=120), min_size=0, max_size=8),
    st.sets(st.integers(min_value=0, max_value=120), min_size=0, max_size=8),
    st.integers(min_value=2, max_value=40),  # span
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(audit_strategy)
def test_log_audit_matches_reference_model(spark, data):
    """Arbitrary present-LSN sets with arbitrary conflict injections
    and verbatim redeliveries, audited at an arbitrary span, equal a
    trivial O(n log n) single-threaded reference model."""
    from dexspark.cdc.audit import log_continuity_audit

    present, conflicts, redeliveries, span = data
    conflicts &= present
    redeliveries &= present
    rows = [(i, f"p{i}") for i in present]
    rows += [(i, f"CONFLICT{i}") for i in conflicts]
    rows += [(i, f"p{i}") for i in redeliveries]
    df = spark.createDataFrame(rows, "lsn long, text string")

    got = {
        (r["kind"], r["lsn_from"], r["lsn_to"], r["n"])
        for r in log_continuity_audit(df, span=span, expected_min=0).collect()
    }

    expect = {("conflict", i, i, 2) for i in conflicts}
    seq = sorted(present)
    if seq and seq[0] > 0:
        expect.add(("gap", 0, seq[0] - 1, seq[0]))
    for a, b in zip(seq, seq[1:]):
        if b > a + 1:
            expect.add(("gap", a + 1, b - 1, b - a - 1))
    assert got == expect


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events_strategy,
    st.lists(
        st.integers(min_value=0, max_value=50),
        min_size=1, max_size=3, unique=True,
    ),
)
def test_snapshot_ingest_converges_to_direct_replay(
    spark, tmp_path_factory, evs, raw_cuts
):
    """Delivering the feed as full snapshots at ARBITRARY cut points,
    then tailing the rest of the log, equals a direct replay of the
    whole log — the cdc/snapshot.py derivation (I/U/D from state
    diffs, absence→delete) composes with the LSN gate at any cut
    placement."""
    from pyspark.sql.types import _parse_datatype_string

    from dexspark.cdc.apply import apply_changes
    from dexspark.cdc.snapshot import apply_snapshot
    from dexspark.cdc.validate import ValidationConfig
    from dexspark.lake.table import LakeTable

    seen = {}
    uniq = {}
    for conv, turn, lsn, op in evs:
        op = seen.setdefault((conv, turn, lsn), op)
        uniq[(conv, turn, lsn)] = (conv, turn, lsn, op)
    ordered = sorted(uniq.values(), key=lambda e: e[2])
    cuts = sorted(raw_cuts)
    cfg = ValidationConfig()

    def model_state(upto):
        m = {}
        for conv, turn, lsn, op in ordered:
            if lsn <= upto:
                k = (f"c{conv}", turn)
                if k not in m or lsn >= m[k][0]:
                    m[k] = (lsn, op)
        return {k for k, (lsn, op) in m.items() if op != "D"}

    d = tmp_path_factory.mktemp("prop_snap_tbl")
    payload = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    table = LakeTable.create(
        spark, str(d), _parse_datatype_string(payload), "conv_id",
        num_buckets=4,
    )
    # deliver each cut as a full snapshot of the true state at the cut
    for w in cuts:
        keys = model_state(w)
        img = {}
        for conv, turn, lsn, op in ordered:
            if lsn <= w and (f"c{conv}", turn) in keys:
                k = (f"c{conv}", turn)
                if k not in img or lsn >= img[k][0]:
                    img[k] = (lsn, (conv, turn, lsn, op))
        rows = _rows([e for _, e in img.values()])
        snap = spark.createDataFrame(rows, SCHEMA).select(
            "conv_id", "turn_idx", "role", "text", "tool", "ts"
        )
        apply_snapshot(table, snap, snapshot_lsn=w, cfg=cfg)
    # tail: everything past the last cut
    tail = [e for e in ordered if e[2] > cuts[-1]]
    if tail:
        apply_changes(
            table,
            spark.createDataFrame(_rows(tail), SCHEMA),
            batch_id="tail",
            cfg=cfg,
        )
    got = {(r.conv_id, r.turn_idx) for r in table.read().collect()}
    assert got == model_state(50)
