"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()``
exposes every implemented operator from SURVEY.md §2 (plus the
beyond-reference data-pipeline operators); ``oracle_sql()`` gives the
DuckDB twin for each (omitted for non-SQL-expressible ops → rows-only
check). Implementations live in ``hours_api_clickup_spark/plans/registry.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hours_api_clickup_spark.plans.registry import QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "flagship_hours_by_user_day"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (hours per user per Oslo-date) on sf0.001."""
    return QUERIES[FLAGSHIP].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in QUERIES.items()
        if spec.oracle is not None
    }
