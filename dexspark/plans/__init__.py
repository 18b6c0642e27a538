from dexspark.plans.pipeline import (  # noqa: F401
    BRANCH_COL,
    CHILDREN_COL,
    EXEC_COL,
    Pipeline,
    PipelineResult,
    Stage,
    fan_out,
    init_lineage,
    pipeline_from_config,
)
