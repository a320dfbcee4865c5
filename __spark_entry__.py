"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented SURVEY §2 operator as (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — matching DuckDB SQL per query (same column names/types).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# self-bootstrap: keep the package importable even when this module is
# loaded by file path from a different working directory
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from fink_filters_spark.queries import oracle_dict, queries_dict  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from fink_filters_spark.queries.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return queries_dict()


def oracle_sql() -> dict[str, str]:
    return oracle_dict()
