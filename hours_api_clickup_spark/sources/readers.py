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


def read_json_with_quarantine(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """NDJSON → (valid, quarantine): PERMISSIVE parse with the corrupt
    raw line captured in ``_corrupt_record`` — malformed rows are
    ROUTED, not dropped (``read_json_fixture``'s null-fill) and not
    fatal (FAILFAST). The quarantine frame keeps the raw line plus the
    source file and a stable row id so an operator can inspect, fix,
    and replay exactly the failed records — the distributed form of the
    reference's per-row try/except-and-log
    (fetch_clickup_data.py:891-926), upgraded with a replayable sink.

    Scale note: one scan serves both outputs (the corrupt column is
    just another projected field; Spark evaluates the parse once per
    row), and the quarantine side is a filter — no second read of the
    source.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField

    with_corrupt = StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType())]
    )
    raw = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        # input_file_name() must bind while the scan context is live —
        # after cache() it returns ''
        .select("*", F.input_file_name().alias("__source_file"))
        # Spark refuses a query that references ONLY the corrupt column
        # of a lazily-parsed source (QUERY_ONLY_CORRUPT_RECORD_COLUMN);
        # the documented contract is to materialize the parsed batch
        # first — an ingest batch, so bounded by the chunk planner.
        .cache()
    )
    valid = raw.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record", "__source_file"
    )
    quarantine = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line"),
        F.col("__source_file").alias("source_file"),
        F.monotonically_increasing_id().alias("quarantine_id"),
    )
    return valid, quarantine
