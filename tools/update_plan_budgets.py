"""Snapshot per-query shuffle-exchange counts into tests/plan_budgets.json.

The plan lint (tests/test_plans.py) fails any query whose executed plan
grows MORE shuffle exchanges than this snapshot records — so a regression
that adds a shuffle to any of the 100+ queries is caught, and a deliberate
plan change requires rerunning this tool and committing the diff.

Run: python tools/update_plan_budgets.py
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, ".")

def count_shuffles(plan: str) -> int:
    """Distinct shuffle exchanges in an executed-plan string. Counts
    DISTINCT [plan_id=N] values rather than raw `Exchange` text matches:
    InMemoryRelation prints its cached child plan once PER ReadReference,
    so a cached subtree's exchanges would otherwise be counted once per
    consumer and the metric would punish adding a (cost-free) extra read
    of an already-cached frame. Exchanges printed without a plan_id (none
    today — AQE stamps every live exchange) fall back to text count.
    Twin of tests/test_plans.py::_count_shuffles — edit in lockstep."""
    with_id = re.findall(
        r"Exchange (?:hash|range|SinglePartition)\S*[^\n]*\[plan_id=(\d+)\]",
        plan,
    )
    without_id = re.findall(
        r"Exchange (?:hash|range|SinglePartition)(?![^\n]*\[plan_id=)", plan
    )
    return len(set(with_id)) + len(without_id)


def main() -> None:
    from fink_filters_spark.session import get_session

    import __spark_entry__ as entry

    spark = get_session("plan-budgets", cpus=8)
    budgets = {}
    for name, fn in sorted(entry.queries().items()):
        spark.catalog.clearCache()  # keep counts order-independent
        plan = (
            fn(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        budgets[name] = count_shuffles(plan)
    with open("tests/plan_budgets.json", "w") as f:
        json.dump(budgets, f, indent=1, sort_keys=True)
    print(f"tests/plan_budgets.json written ({len(budgets)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
