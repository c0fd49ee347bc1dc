"""Physical-plan inspection helpers."""

from .explain import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    assert_single_shuffle,
    count_shuffles,
    plan_string,
)

__all__ = [
    "plan_string",
    "count_shuffles",
    "assert_pushed_filters",
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_single_shuffle",
]
