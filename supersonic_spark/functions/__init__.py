"""Expression-level function library (SURVEY.md §2.7-2.8)."""

from .sketches import (
    approx_distinct,
    kmv_distinct_count,
    kmv_estimate,
    kmv_merge,
    kmv_partials,
    mg_heavy_hitters,
    mg_partials,
)
from .stateful import (
    changed,
    running_min_with_flush,
    running_sum,
    smudge,
    smudge_if,
)

__all__ = [
    "approx_distinct",
    "changed",
    "kmv_distinct_count",
    "kmv_estimate",
    "kmv_merge",
    "kmv_partials",
    "mg_heavy_hitters",
    "mg_partials",
    "running_min_with_flush",
    "running_sum",
    "smudge",
    "smudge_if",
]
