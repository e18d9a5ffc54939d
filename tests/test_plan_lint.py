"""Unit tests for tools/plan_lint.py's plan-string heuristics (no Spark)."""

from __future__ import annotations

import importlib.util
import pathlib

spec = importlib.util.spec_from_file_location(
    "plan_lint", pathlib.Path(__file__).parent.parent / "tools" / "plan_lint.py"
)
plan_lint = importlib.util.module_from_spec(spec)
spec.loader.exec_module(plan_lint)


def test_single_partition_feeding_sort_is_flagged():
    phys = """*(3) Sort [cents DESC NULLS LAST], true, 0
+- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]
   +- HashAggregate(keys=[k], functions=[sum(v)])
"""
    assert plan_lint._single_partition_consumers(phys) == [
        "*(3) Sort [cents DESC NULLS LAST], true, 0"
    ]


def test_single_partition_feeding_final_aggregate_is_fine():
    phys = """*(3) HashAggregate(keys=[], functions=[sum(v)])
+- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]
   +- HashAggregate(keys=[], functions=[partial_sum(v)])
"""
    assert plan_lint._single_partition_consumers(phys) == []


def test_sort_aggregate_consumer_is_an_aggregate_not_a_sort():
    phys = """*(2) SortAggregate(key=[k], functions=[collect_list(v)])
+- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=9]
   +- SortAggregate(key=[k], functions=[partial_collect_list(v)])
"""
    assert plan_lint._single_partition_consumers(phys) == []


def test_global_limit_consumer_is_fine():
    phys = """GlobalLimit 20, 10
+- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=2]
   +- LocalLimit 30
"""
    assert plan_lint._single_partition_consumers(phys) == []


def test_whitelist_entries_all_carry_reasons():
    for q, entry in plan_lint.WHITELIST.items():
        for check, reason in entry.items():
            assert isinstance(reason, str) and len(reason) > 10, (q, check)
