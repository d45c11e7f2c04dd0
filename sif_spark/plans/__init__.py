from sif_spark.plans.audit import (
    plan_string,
    scans,
    join_strategies,
    has_pushed_filter,
    codegen_stage_count,
    global_windows,
    audit,
)

__all__ = [
    "plan_string",
    "scans",
    "join_strategies",
    "has_pushed_filter",
    "codegen_stage_count",
    "global_windows",
    "audit",
]
