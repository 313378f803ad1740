"""Shared plumbing for the query registry (split round 4): the QUERIES
dict, the @register decorator, table loading, and the determinism
rules every (Spark callable, DuckDB oracle SQL) pair follows. Query
definitions live in registry_reference / registry_datapipe /
registry_streaming / registry_analytics; the façade + driver-window
rotation lives in plans/registry.py.

Determinism rules (so the order-insensitive value-hash matches DuckDB):
- Money/fractional sums go through DECIMAL casts (exact, order-independent)
  and are cast to DOUBLE only once at the end. A double .005 boundary is
  never exactly representable, so double→decimal rounding agrees across
  engines.
- Timezone math uses session-TZ-independent forms on both engines
  (from_utc_timestamp ↔ timezone('Europe/Oslo', timezone('UTC', ts))).
- Every computed column is aliased identically in Spark and SQL.

Scale notes are attached per query: these run at sf0.01 for correctness
and sf0.1 for bench, but each plan is written for the 100 TB shape
(broadcast dims, key-partitioned windows, no driver-side collection).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Columns stored as parquet TIMESTAMP(NANOS), which Spark's parquet reader
# rejects by default. We read them as long (legacy conf) and truncate
# ns → µs with integer division (`div`, not `/` — ns-since-epoch exceeds
# 2^53 so double division would lose precision). DuckDB truncates the
# same way when reading nanos into its µs timestamps.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    nanos_cols = _NANOS_TS_COLS.get(name, ())
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in nanos_cols:
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    # tz-less parquet timestamps arrive as TIMESTAMP_NTZ, which half the
    # timestamp builtins (unix_millis, casts to numeric) reject. The
    # session timezone is pinned to UTC, so NTZ → LTZ keeps the same
    # wall-clock instant DuckDB sees for the same file.
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver records rows-only check
    survey_ids: str = ""  # SURVEY.md §2 operator ids this query covers
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, survey_ids: str = "", doc: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, survey_ids=survey_ids, doc=doc)
        return fn

    return deco


def _dec(c: Column | str, spec: str = "decimal(12,2)") -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(spec)
