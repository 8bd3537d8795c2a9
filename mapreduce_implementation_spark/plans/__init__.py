from .inspect import (
    plan_string, assert_broadcast_join, assert_partial_aggregate,
    assert_pushed_filter, assert_read_schema_only, assert_take_ordered,
)

__all__ = [
    "plan_string", "assert_broadcast_join", "assert_partial_aggregate",
    "assert_pushed_filter", "assert_read_schema_only", "assert_take_ordered",
]
