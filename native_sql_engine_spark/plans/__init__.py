from .inspect import (
    executed_plan,
    formatted_plan,
    pushed_filters,
    read_schema_columns,
    has_node,
    wholestage_span_count,
    assert_scan_pruned,
    plan_signature,
)

__all__ = [
    "executed_plan",
    "formatted_plan",
    "pushed_filters",
    "read_schema_columns",
    "has_node",
    "wholestage_span_count",
    "assert_scan_pruned",
    "plan_signature",
]
