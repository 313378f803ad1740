"""Schema-pinned readers.

Every ingest path uses an explicit StructType — the reference's
hard-won lesson (``fetch_clickup_data.py:1096-1106``: inference drifted
FLOAT columns). JSON fixtures flow through the same code path a REST
response body would, so tests exercise the identical ingest."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from hours_api_clickup_spark.schemas import (
    RAW_TASK_SCHEMA,
    RAW_TIME_ENTRY_SCHEMA,
)


def read_json_fixture(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """NDJSON → DataFrame with a pinned schema. PERMISSIVE mode keeps
    malformed rows as null-filled rows instead of failing the scan —
    the distributed analog of the reference's per-row try/except
    (fetch_clickup_data.py:891-926)."""
    return spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)


def read_raw_time_entries(spark: SparkSession, path: str) -> DataFrame:
    return read_json_fixture(spark, path, RAW_TIME_ENTRY_SCHEMA)


def read_raw_tasks(spark: SparkSession, path: str) -> DataFrame:
    return read_json_fixture(spark, path, RAW_TASK_SCHEMA)


def from_rows(spark: SparkSession, rows: list[dict], schema: StructType) -> DataFrame:
    """Driver-side rows (e.g. a fetched REST payload) → DataFrame with
    the pinned schema — the createDataFrame seam the chunked fetcher
    feeds into."""
    return spark.createDataFrame(rows, schema=schema)
