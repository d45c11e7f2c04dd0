from sif_spark.plans.audit import (
    plan_string,
    scans,
    join_strategies,
    has_pushed_filter,
    codegen_stage_count,
    global_windows,
    normalized_plan,
    plan_fingerprint,
    audit,
)

__all__ = [
    "normalized_plan",
    "plan_fingerprint",
    "plan_string",
    "scans",
    "join_strategies",
    "has_pushed_filter",
    "codegen_stage_count",
    "global_windows",
    "audit",
]
