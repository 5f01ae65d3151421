"""Physical-plan auditing: the engine's scale contract, asserted.

Catalyst owns planning; this package owns CHECKING that the plans we
ship are the plans we designed for 100 TB (broadcast star joins, pruned
scans, pushed filters, no cartesian blowups, no row-at-a-time Python).
tests/test_plan_quality.py runs these invariants over the whole query
registry so a regression in plan shape fails CI like a wrong answer
would.
"""

from .audit import (
    count_op,
    has_op,
    physical_plan,
    pushed_filters,
    read_schemas,
)

__all__ = [
    "physical_plan",
    "count_op",
    "has_op",
    "pushed_filters",
    "read_schemas",
]
