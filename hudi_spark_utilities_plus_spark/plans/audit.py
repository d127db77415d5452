"""Physical-plan audits — the 100 TB guardrails, checkable in tests.

A plan that is correct at sf0.01 but wrong at 100 TB usually shows the
defect in its physical plan long before it shows it in wall time: a
filter that didn't reach the parquet scan, a dimension join that didn't
broadcast, an ORDER BY + LIMIT planned as a global sort. These helpers
read the executed plan string so tests can pin the properties down
(tests/test_plans.py), and `audit_report` summarizes them for a human.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def has_pushed_filters(df: DataFrame) -> bool:
    """Predicate pushdown reached the file scan (PushedFilters non-empty)."""
    m = re.search(r"PushedFilters: \[([^\]]*)\]", executed_plan(df))
    return bool(m and m.group(1).strip())


def has_partition_filters(df: DataFrame) -> bool:
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", executed_plan(df))
    return bool(m and m.group(1).strip())


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning check)."""
    m = re.search(r"ReadSchema: struct<([^>]*)>", executed_plan(df))
    if not m:
        return []
    return [p.split(":")[0].strip() for p in m.group(1).split(",") if p.strip()]


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def has_shuffle_exchange(df: DataFrame) -> bool:
    return "Exchange hashpartitioning" in executed_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    """ORDER BY + LIMIT planned as TakeOrderedAndProject (no global sort)."""
    return "TakeOrderedAndProject" in executed_plan(df)


def whole_stage_codegen_ids(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider = fewer pipeline breaks)."""
    return len(set(re.findall(r"\*\((\d+)\)", executed_plan(df))))


def audit_report(df: DataFrame) -> dict[str, object]:
    plan = executed_plan(df)
    return {
        "pushed_filters": has_pushed_filters(df),
        "partition_filters": has_partition_filters(df),
        "read_schema": read_schema_columns(df),
        "broadcast_hash_join": "BroadcastHashJoin" in plan,
        "sort_merge_join": "SortMergeJoin" in plan,
        "take_ordered": "TakeOrderedAndProject" in plan,
        "codegen_spans": whole_stage_codegen_ids(df),
        "exchanges": plan.count("Exchange "),
    }
