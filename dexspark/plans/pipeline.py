"""Declarative pipeline DAG executed over DataFrames.

≙ the reference Durable-Functions orchestrator — its most heavily
tested component (Unit_FnOrchestrator.kt:108-334):

- serialized plan = linear step list with fan markers
  (OrchestratorDtos.kt:8-25 ``OrchestratorConfiguration{steps[],
  globalErrorFunction}``, ``OrchestratorStep{stepNumber, functionToRun,
  customErrorFunction, fanOutAfter, fanInBefore, fanInFailIfAnyFail}``)
- recursive interpreter with hierarchical branch ids ``"0_1_0"``
  (FnOrchestrator.kt:61-180, branch id built at :78,:126)
- per-step error channel + custom/global error functions
  (FnOrchestrator.kt:95-111, 51-56)
- fan-out spawns one sub-orchestration per child with an ``allOf``
  barrier; ``fanInFailIfAnyFail`` decides whether one failed branch
  sinks the whole fan (FnOrchestrator.kt:119-130, 144-162)

The Spark re-expression is *set-oriented*: every source row is its own
"orchestration instance" (the reference runs one instance per event),
so one DataFrame pass executes all instances at once:

- lineage columns ``_exec_id`` / ``_branch`` thread per-row identity
  and the hierarchical branch path through the DAG
  (≙ ActivityParams.executionId, ActivityDtos.kt:20-25)
- fan-out = ``posexplode`` of a children array; the branch id extends
  by ``_<pos>`` exactly like the reference's ``"${branchIndex}_$index"``
- the fan-in barrier is Spark's stage boundary; ``fail_if_any_fail``
  becomes a broadcast anti-join against the exec ids that had any
  failed branch in the fan scope
- the error channel is a rejects DataFrame per stage (rows carrying a
  non-null ``reject_reason``), tagged with the stage name and unioned
  — counted, never dropped silently

Everything stays lazy/declarative until the caller acts on the result;
stage functions are plain ``DataFrame -> DataFrame`` transforms so
Catalyst fuses the whole pipeline into as few physical stages as the
shuffle structure allows. At 100 TB the same plan shape holds: fan-out
is an explode (no shuffle), fan-in policy is one small anti-join
(broadcast), rejects ride the same scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, functions as F

EXEC_COL = "_exec_id"
BRANCH_COL = "_branch"
CHILDREN_COL = "_children"
REASON_COL = "reject_reason"
STAGE_COL = "_stage"

StageFn = Callable[[DataFrame], DataFrame]
# (stage_name, rejects) — rejects is None when invoked as the global
# error fallback for a plan-level failure (no per-record frame exists)
ErrorFn = Callable[[str, DataFrame | None], None]


def init_lineage(df: DataFrame, exec_id_cols: list[str] | None = None) -> DataFrame:
    """Stamp orchestration lineage onto source rows: a deterministic
    ``_exec_id`` (hash of the given key columns, or all columns) and the
    root branch id ``"0"`` (≙ FnRouter.kt:129 building the initial
    ActivityParams with a fresh executionId)."""
    cols = exec_id_cols or df.columns
    return df.withColumn(
        EXEC_COL, F.xxhash64(*[F.col(c) for c in cols])
    ).withColumn(BRANCH_COL, F.lit("0"))


def fan_out(df: DataFrame, children_col: str = CHILDREN_COL) -> DataFrame:
    """1→N expansion: posexplode an array column produced by the
    previous stage; each child extends the branch path with its index
    (≙ FnOrchestrator.kt:123-127 ``"${branchIndex}_$index"``; the
    decompressor's fanOutParams, FnDecompressor.kt:83-88).

    Pure narrow transformation — no shuffle; a 1→10^4 zip expansion
    parallelizes because the *input* rows are already partitioned."""
    others = [c for c in df.columns if c not in (children_col, BRANCH_COL)]
    return df.select(
        *others,
        F.col(BRANCH_COL),
        F.posexplode(children_col).alias("_pos", "_child"),
    ).select(
        *others,
        F.concat_ws("_", F.col(BRANCH_COL), F.col("_pos").cast("string")).alias(
            BRANCH_COL
        ),
        F.col("_child"),
    )


def _branch_parent(col):
    return F.regexp_replace(col, r"_[0-9]+$", "")


@dataclass
class Stage:
    """One pipeline step (≙ OrchestratorStep, OrchestratorDtos.kt:15-21).

    ``fn`` transforms the batch; rows it marks with a non-null
    ``reject_reason`` column are split to the error channel after the
    stage. ``fan_out_after`` explodes the stage's ``_children`` array
    column into child branches. ``fan_in_before`` pops one branch level
    before this stage runs and applies ``fan_in_fail_if_any_fail``.
    ``on_error`` ≙ customErrorFunction: called with (stage_name,
    rejects_df) when the stage produced rejects."""

    name: str
    fn: StageFn
    fan_out_after: bool = False
    fan_in_before: bool = False
    fan_in_fail_if_any_fail: bool = True
    on_error: ErrorFn | None = None
    config: dict = field(default_factory=dict)


@dataclass
class PipelineResult:
    output: DataFrame
    rejects: DataFrame | None  # unioned error channel, with _stage column

    def reject_counts(self) -> dict[str, int]:
        if self.rejects is None:
            return {}
        return {
            r[STAGE_COL]: int(r["count"])
            for r in self.rejects.groupBy(STAGE_COL).count().collect()
        }


class PipelineError(RuntimeError):
    """Raised when a stage itself throws (plan-level failure, not a
    per-record reject). ≙ the orchestration-level failure path that
    triggers globalErrorFunction (FnOrchestrator.kt:51-56)."""

    def __init__(self, stage: str, cause: Exception):
        super().__init__(f"stage '{stage}' failed: {cause}")
        self.stage = stage
        self.cause = cause


class Pipeline:
    """Interpreter for a linear stage list with fan markers
    (≙ FnOrchestrator.kt:22-59 orchestrator + :61-180 recursive
    sub-orchestrator, flattened: Spark's set-at-a-time execution makes
    the recursion unnecessary — branch state lives in ``_branch``)."""

    def __init__(
        self,
        stages: list[Stage],
        global_error_fn: Callable[[PipelineError], None] | None = None,
    ):
        self.stages = stages
        self.global_error_fn = global_error_fn

    def run(self, df: DataFrame, exec_id_cols: list[str] | None = None) -> PipelineResult:
        if EXEC_COL not in df.columns:
            df = init_lineage(df, exec_id_cols)
        # rejects grouped by fan scope (stack because fans nest, ≙ the
        # recursive interpreter's call stack): a fan-in's failure policy
        # looks only at rejects raised since its matching fan-out
        scopes: list[list[DataFrame]] = [[]]
        try:
            for stage in self.stages:
                if stage.fan_in_before:
                    in_scope = scopes.pop() if len(scopes) > 1 else []
                    df = df.withColumn(BRANCH_COL, _branch_parent(F.col(BRANCH_COL)))
                    scopes[-1].extend(in_scope)
                    if stage.fan_in_fail_if_any_fail and in_scope:
                        # one failed branch sinks every sibling of the
                        # same orchestration instance
                        # (FnOrchestrator.kt:144-152)
                        failed_src = in_scope[0]
                        for r in in_scope[1:]:
                            failed_src = failed_src.unionByName(r)
                        failed = F.broadcast(failed_src.select(EXEC_COL).distinct())
                        sunk = (
                            df.join(failed, EXEC_COL, "left_semi")
                            .withColumn(
                                REASON_COL, F.lit(f"fan_failed:{stage.name}")
                            )
                        )
                        scopes[-1].append(self._tag(stage.name, sunk))
                        df = df.join(failed, EXEC_COL, "left_anti")

                out = self._run_stage(stage, df)

                if REASON_COL in out.columns:
                    stage_rejects = out.filter(F.col(REASON_COL).isNotNull())
                    df = out.filter(F.col(REASON_COL).isNull()).drop(REASON_COL)
                    scopes[-1].append(self._tag(stage.name, stage_rejects))
                    if stage.on_error is not None:
                        stage.on_error(stage.name, stage_rejects)
                else:
                    df = out

                if stage.fan_out_after:
                    scopes.append([])  # new fan scope opens clean
                    df = fan_out(df)
        except PipelineError as e:
            if self.global_error_fn is not None:
                self.global_error_fn(e)
            raise
        all_rejects = [r for scope in scopes for r in scope]
        rejects = None
        for r in all_rejects:
            rejects = r if rejects is None else rejects.unionByName(r)
        return PipelineResult(output=df, rejects=rejects)

    def _run_stage(self, stage: Stage, df: DataFrame) -> DataFrame:
        try:
            return stage.fn(df)
        except Exception as e:  # plan-level failure, not per-record
            raise PipelineError(stage.name, e) from e

    def _tag(self, stage_name: str, new: DataFrame) -> DataFrame:
        return new.select(
            F.col(EXEC_COL),
            F.col(BRANCH_COL),
            F.lit(stage_name).alias(STAGE_COL),
            F.col(REASON_COL),
        )


def pipeline_from_config(
    config: dict[str, Any],
    registry: dict[str, StageFn],
    error_registry: dict[str, ErrorFn] | None = None,
    global_error_fn: Callable[[PipelineError], None] | None = None,
) -> Pipeline:
    """Parse an OrchestratorConfiguration-shaped JSON plan
    (≙ O19 front end, FnRouter.kt:120-126 Jackson parse +
    FnOrchestrator.kt:29-34 deserialization, including the
    step-count/ordering invariant of FnOrchestrator.kt:44-47).

    ``config`` = {"steps": [{"stepNumber": 1, "functionToRun": name,
    "customErrorFunction": name?, "fanOutAfter": bool,
    "fanInBefore": bool, "fanInFailIfAnyFail": bool,
    "functionConfiguration": {...}?}, ...],
    "globalErrorFunction": name?}. Functions resolve via ``registry``.
    """
    error_registry = error_registry or {}
    steps = sorted(config.get("steps", []), key=lambda s: s.get("stepNumber", 0))
    if not steps:
        raise ValueError("pipeline config has no steps")
    nums = [s.get("stepNumber") for s in steps]
    if nums != list(range(1, len(steps) + 1)):
        raise ValueError(f"stepNumbers must be 1..{len(steps)} contiguous, got {nums}")
    depth = 0
    stages: list[Stage] = []
    for s in steps:
        fn_name = s.get("functionToRun")
        if fn_name not in registry:
            raise ValueError(f"unknown function '{fn_name}' in step {s.get('stepNumber')}")
        if s.get("fanInBefore"):
            depth -= 1
            if depth < 0:
                raise ValueError("fanInBefore without a matching fanOutAfter")
        on_error = None
        if s.get("customErrorFunction"):
            err_name = s["customErrorFunction"]
            if err_name not in error_registry:
                raise ValueError(f"unknown error function '{err_name}'")
            on_error = error_registry[err_name]
        stages.append(
            Stage(
                name=fn_name,
                fn=registry[fn_name],
                fan_out_after=bool(s.get("fanOutAfter")),
                fan_in_before=bool(s.get("fanInBefore")),
                fan_in_fail_if_any_fail=s.get("fanInFailIfAnyFail", True),
                on_error=on_error,
                config=s.get("functionConfiguration") or {},
            )
        )
        if s.get("fanOutAfter"):
            depth += 1
    if depth != 0:
        raise ValueError(f"unbalanced fan markers: {depth} fan-out(s) never fan in")
    g = config.get("globalErrorFunction")
    if g is not None and global_error_fn is None and error_registry.get(g):
        reg_err = error_registry[g]

        def global_error_fn(e: PipelineError) -> None:  # noqa: F811
            # ErrorFn's rejects arg is None on the plan-level path
            reg_err(e.stage, None)

    return Pipeline(stages, global_error_fn=global_error_fn)
