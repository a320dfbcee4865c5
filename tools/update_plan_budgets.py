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

SHUFFLE_RE = re.compile(r"Exchange (hash|range|SinglePartition)")


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
        budgets[name] = len(SHUFFLE_RE.findall(plan))
    with open("tests/plan_budgets.json", "w") as f:
        json.dump(budgets, f, indent=1, sort_keys=True)
    print(f"tests/plan_budgets.json written ({len(budgets)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
