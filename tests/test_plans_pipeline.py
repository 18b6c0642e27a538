"""Pipeline-DAG orchestrator semantics, mirroring the reference's
Unit_FnOrchestrator.kt test matrix (two-layer fan branch ids, error
propagation to custom/global handlers, fan-in failure policies,
malformed fan specs) in set-oriented DataFrame form."""

from pyspark.sql import functions as F

from dexspark.plans import (
    BRANCH_COL,
    CHILDREN_COL,
    EXEC_COL,
    Pipeline,
    Stage,
    init_lineage,
    pipeline_from_config,
)
from dexspark.plans.pipeline import PipelineError, REASON_COL


def _src(spark, n=3):
    return spark.createDataFrame(
        [(f"doc{i}", f"alpha beta gamma delta {i}") for i in range(n)],
        "doc_id string, text string",
    )


def _split_words(df):
    """Fan-out producer: one child per word."""
    return df.withColumn(CHILDREN_COL, F.split("text", " "))


def _child_len(df):
    return df.withColumn("wlen", F.length("_child"))


def _passthrough(df):
    return df


def test_two_layer_fan_branch_ids(spark):
    """≙ Unit_FnOrchestrator.happyPath_twoLayerFan (:108-138): exact
    hierarchical branch ids after nested fan-out."""
    df = init_lineage(_src(spark, 1), ["doc_id"])
    p = Pipeline(
        [
            Stage("split", _split_words, fan_out_after=True),
            # second-layer fan: each word fans into its characters
            Stage(
                "chars",
                lambda d: d.withColumn(
                    CHILDREN_COL, F.split(F.col("_child"), "(?!^)")
                ).drop("_child"),
                fan_out_after=True,
            ),
            Stage("ident", _passthrough, fan_in_before=True),
            Stage("ident2", _passthrough, fan_in_before=True),
        ]
    )
    res = p.run(df)
    rows = res.output.select(BRANCH_COL).distinct().collect()
    # after both fan-ins the branch path is back at root
    assert {r[BRANCH_COL] for r in rows} == {"0"}

    # without the fan-ins, ids are hierarchical "0_<word>_<char>"
    p2 = Pipeline(p.stages[:2])
    out = p2.run(init_lineage(_src(spark, 1), ["doc_id"]))
    branches = {r[BRANCH_COL] for r in out.output.select(BRANCH_COL).collect()}
    assert "0_0_0" in branches and "0_4_0" in branches
    # word 0 is "alpha" -> 5 chars -> branches 0_0_0 .. 0_0_4
    assert {f"0_0_{i}" for i in range(5)} <= branches


def test_fan_out_expansion_and_fan_in(spark):
    df = init_lineage(_src(spark), ["doc_id"])
    p = Pipeline(
        [
            Stage("split", _split_words, fan_out_after=True),
            Stage("wlen", _child_len),
            Stage("collect", _passthrough, fan_in_before=True),
        ]
    )
    res = p.run(df)
    out = res.output
    # 3 docs x 5 words
    assert out.count() == 15
    assert {r[BRANCH_COL] for r in out.select(BRANCH_COL).distinct().collect()} == {"0"}
    assert res.rejects is None


def test_branch_error_fail_if_any_fail_true(spark):
    """≙ fanInFailIfAnyFail=true (FnOrchestrator.kt:144-152): one failed
    branch sinks all sibling branches of the same instance."""
    df = init_lineage(_src(spark, 2), ["doc_id"])

    def flag_word_4_of_doc0(d):
        return d.withColumn(
            REASON_COL,
            F.when(
                (F.col("doc_id") == "doc0") & (F.col("_child") == "0"),
                F.lit("bad_word"),
            ),
        )

    p = Pipeline(
        [
            Stage("split", _split_words, fan_out_after=True),
            Stage("check", flag_word_4_of_doc0),
            Stage("join", _passthrough, fan_in_before=True, fan_in_fail_if_any_fail=True),
        ]
    )
    res = p.run(df)
    out = res.output.collect()
    # all 5 branches of doc0 are gone; doc1's 5 survive
    assert len(out) == 5
    assert {r["doc_id"] for r in out} == {"doc1"}
    counts = res.reject_counts()
    assert counts["check"] == 1  # the originating reject
    assert counts["join"] == 4  # the sunk siblings


def test_branch_error_fail_if_any_fail_false(spark):
    """≙ fanInFailIfAnyFail=false (Unit_FnOrchestrator.kt:141-165):
    failed branches drop, healthy siblings continue."""
    df = init_lineage(_src(spark, 2), ["doc_id"])

    def flag_one(d):
        return d.withColumn(
            REASON_COL,
            F.when(
                (F.col("doc_id") == "doc0") & (F.col("_child") == "0"),
                F.lit("bad_word"),
            ),
        )

    p = Pipeline(
        [
            Stage("split", _split_words, fan_out_after=True),
            Stage("check", flag_one),
            Stage("join", _passthrough, fan_in_before=True, fan_in_fail_if_any_fail=False),
        ]
    )
    res = p.run(df)
    out = res.output.collect()
    assert len(out) == 9  # doc0 keeps 4 of 5 words, doc1 all 5
    assert res.reject_counts() == {"check": 1}


def test_custom_error_fn_called(spark):
    """≙ customErrorFunction (FnOrchestrator.kt:95-111)."""
    seen = []

    def on_err(stage, rejects):
        seen.append((stage, rejects.count()))

    df = init_lineage(_src(spark, 2), ["doc_id"])
    p = Pipeline(
        [
            Stage(
                "gate",
                lambda d: d.withColumn(
                    REASON_COL,
                    F.when(F.col("doc_id") == "doc1", F.lit("blocked")),
                ),
                on_error=on_err,
            )
        ]
    )
    res = p.run(df)
    assert seen == [("gate", 1)]
    assert res.output.count() == 1


def test_global_error_fn_on_stage_crash(spark):
    """≙ globalErrorFunction (FnOrchestrator.kt:51-56)."""
    seen = []

    def boom(d):
        raise RuntimeError("stage exploded")

    p = Pipeline(
        [Stage("boom", boom)], global_error_fn=lambda e: seen.append(e.stage)
    )
    df = init_lineage(_src(spark), ["doc_id"])
    try:
        p.run(df)
        raise AssertionError("expected PipelineError")
    except PipelineError as e:
        assert e.stage == "boom"
    assert seen == ["boom"]


def test_config_parsing_happy_and_malformed(spark):
    """≙ Unit_FnRouter.happyPath (:38-64) config→plan construction and
    Unit_FnOrchestrator fan-misconfig tests (:300-334)."""
    registry = {"split": _split_words, "wlen": _child_len, "join": _passthrough}
    cfg = {
        "steps": [
            {"stepNumber": 1, "functionToRun": "split", "fanOutAfter": True},
            {"stepNumber": 2, "functionToRun": "wlen"},
            {
                "stepNumber": 3,
                "functionToRun": "join",
                "fanInBefore": True,
                "fanInFailIfAnyFail": False,
            },
        ]
    }
    p = pipeline_from_config(cfg, registry)
    assert [s.name for s in p.stages] == ["split", "wlen", "join"]
    assert p.stages[0].fan_out_after and p.stages[2].fan_in_before
    res = p.run(init_lineage(_src(spark), ["doc_id"]))
    assert res.output.count() == 15

    import pytest

    with pytest.raises(ValueError, match="no steps"):
        pipeline_from_config({"steps": []}, registry)
    with pytest.raises(ValueError, match="contiguous"):
        pipeline_from_config(
            {"steps": [{"stepNumber": 2, "functionToRun": "split"}]}, registry
        )
    with pytest.raises(ValueError, match="unknown function"):
        pipeline_from_config(
            {"steps": [{"stepNumber": 1, "functionToRun": "nope"}]}, registry
        )
    with pytest.raises(ValueError, match="without a matching"):
        pipeline_from_config(
            {"steps": [{"stepNumber": 1, "functionToRun": "join", "fanInBefore": True}]},
            registry,
        )
    with pytest.raises(ValueError, match="unbalanced"):
        pipeline_from_config(
            {"steps": [{"stepNumber": 1, "functionToRun": "split", "fanOutAfter": True}]},
            registry,
        )


def test_exec_id_is_deterministic(spark):
    a = init_lineage(_src(spark), ["doc_id"]).select(EXEC_COL).collect()
    b = init_lineage(_src(spark), ["doc_id"]).select(EXEC_COL).collect()
    assert sorted(r[EXEC_COL] for r in a) == sorted(r[EXEC_COL] for r in b)
