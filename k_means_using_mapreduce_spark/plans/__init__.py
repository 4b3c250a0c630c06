from .explain import (
    broadcast_join_count,
    broadcast_nlj_count,
    exchange_count,
    executed_plan,
    formatted_plan,
    pushed_filters,
    read_schemas,
    sort_merge_join_count,
)

__all__ = [
    "broadcast_join_count",
    "broadcast_nlj_count",
    "exchange_count",
    "executed_plan",
    "formatted_plan",
    "pushed_filters",
    "read_schemas",
    "sort_merge_join_count",
]
