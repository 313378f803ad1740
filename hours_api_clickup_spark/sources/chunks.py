"""Scan-window chunk planning (S2).

The reference splits a [start, end) range into 30-day chunks and fetches
them sequentially, skipping failed chunks
(``fetch_clickup_data.py:124-147``). Here chunk bounds are data — a
DataFrame of (chunk_id, chunk_start, chunk_end) — so a REST-backed
source fans the fetches out across executors (the reference has no
intra-job parallelism at all; this is the main scan-side win) and
per-chunk failure tolerance is a per-partition try/except.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHUNK_DAYS = 30


def window_chunks(
    spark: SparkSession,
    start: dt.datetime,
    end: dt.datetime,
    chunk_days: int = CHUNK_DAYS,
) -> DataFrame:
    """[start, end) → one row per chunk: (chunk_id, chunk_start, chunk_end).

    Mirrors the 30-day splitting loop at fetch_clickup_data.py:124-147,
    including the final short chunk.
    """
    if end <= start:
        raise ValueError(f"empty window: {start} .. {end}")
    step_s = chunk_days * 86400
    return (
        spark.range(0, _n_chunks(start, end, chunk_days))
        .select(
            F.col("id").alias("chunk_id"),
            (F.lit(start) + F.col("id") * F.expr(f"INTERVAL {step_s} SECOND")).alias(
                "chunk_start"
            ),
            F.least(
                F.lit(start)
                + (F.col("id") + 1) * F.expr(f"INTERVAL {step_s} SECOND"),
                F.lit(end),
            ).alias("chunk_end"),
        )
    )


def _n_chunks(start: dt.datetime, end: dt.datetime, chunk_days: int) -> int:
    total_s = (end - start).total_seconds()
    step_s = chunk_days * 86400
    return int(-(-total_s // step_s))


def month_windows(df: DataFrame, date_col: str) -> DataFrame:
    """Append a month partition column for the fact table.

    Partitioning the fact by month of start_date_oslo makes the windowed
    merge (M1) prune to ~2-3 partitions instead of scanning history —
    the analog of the reference's windowed MERGE touching only recent
    rows (fetch_clickup_data.py:1280-1282).
    """
    return df.withColumn("month", F.date_format(F.col(date_col), "yyyy-MM"))
