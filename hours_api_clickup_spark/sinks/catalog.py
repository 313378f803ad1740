"""DDL-on-first-use (S12).

The reference creates its dataset and five tables if absent, with
pinned schemas (``fetch_clickup_data.py:938-948,950-969,1006-1032,
1069-1090,1140-1160,1198-1251,1401-1446``). Spark analog: namespace +
``CREATE TABLE IF NOT EXISTS`` against the session catalog, schema from
the same StructTypes in schemas.py — so first write and steady-state
write are the same code path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from hours_api_clickup_spark import schemas as S

TABLE_SCHEMAS: dict[str, StructType] = {
    "fact_time_entries": S.FACT_TIME_ENTRIES_SCHEMA,
    "staging_time_entries": S.STAGING_TIME_ENTRIES_SCHEMA,
    "dim_lists": S.DIM_LISTS_SCHEMA,
    "dim_tasks": S.DIM_TASKS_SCHEMA,
    "dim_accounts": S.DIM_ACCOUNTS_SCHEMA,
    "dim_apps": S.DIM_APPS_SCHEMA,
}


def ensure_namespace(spark: SparkSession, namespace: str) -> None:
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {namespace}")


def ensure_table(
    spark: SparkSession,
    name: str,
    schema: StructType,
    namespace: str | None = None,
    partition_by: str | None = None,
) -> str:
    """CREATE TABLE IF NOT EXISTS with the pinned schema; returns the
    qualified name. Existing tables are left untouched (the reference's
    exists-check, fetch_clickup_data.py:1204-1208)."""
    qualified = f"{namespace}.{name}" if namespace else name
    if namespace:
        ensure_namespace(spark, namespace)
    ddl = schema.toDDL()
    partition = f" PARTITIONED BY ({partition_by})" if partition_by else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {qualified} ({ddl}) USING parquet{partition}"
    )
    return qualified


def ensure_star_schema(spark: SparkSession, namespace: str = "hours") -> list[str]:
    """Create the full five-table star schema if absent."""
    return [
        ensure_table(spark, name, schema, namespace)
        for name, schema in TABLE_SCHEMAS.items()
    ]
