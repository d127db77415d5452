"""Physical-plan inspection utilities (scale guardrails)."""

from .audit import (
    executed_plan,
    has_broadcast_hash_join,
    has_partition_filters,
    has_pushed_filters,
    has_take_ordered,
    whole_stage_codegen_ids,
)

__all__ = [
    "executed_plan",
    "has_pushed_filters",
    "has_partition_filters",
    "has_broadcast_hash_join",
    "has_take_ordered",
    "whole_stage_codegen_ids",
]
