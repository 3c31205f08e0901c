"""Expression-level function library (SURVEY.md §2.7-2.8)."""

from .stateful import (
    changed,
    running_min_with_flush,
    running_sum,
    smudge,
    smudge_if,
)

__all__ = [
    "changed",
    "running_min_with_flush",
    "running_sum",
    "smudge",
    "smudge_if",
]
