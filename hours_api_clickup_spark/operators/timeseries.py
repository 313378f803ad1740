"""Time-series operators: as-of join and gap-based sessionization.

Neither exists in the reference (its data is tiny and BigQuery-side),
but both are core to a time-tracking/event domain at scale and neither
is a Spark built-in — they're the "custom operator expressed as a
composition of DataFrame ops" case (build-spec: as-of join, range join).

- ``as_of_join``: for each left row, the latest right row with
  right_ts ≤ left_ts per key. Implemented with the union+window trick:
  tag both sides, union, one window sorted by (ts, side) per key,
  last-non-null carry-forward. ONE shuffle on the key — never the
  O(n·m) range join a naive ``l.ts >= r.ts`` theta-join would plan.
- ``sessionize``: split each key's event stream into sessions at
  inactivity gaps > ``gap``: lag → gap flag → running sum. Two window
  passes over the same key partitioning (one shuffle; the second window
  reuses the partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Left as-of join: append ``right_cols`` from the most recent right
    row with ``right_ts <= left_ts`` for the same ``on`` key (nulls when
    no prior right row exists)."""
    l_tag = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__side", F.lit(1)
    )
    r_tag = (
        right.select(
            on,
            F.col(right_ts).alias("__ts"),
            *[F.col(c) for c in right_cols],
        )
        .withColumn("__side", F.lit(0))
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in right_cols:
        if c not in l_tag.columns:
            l_tag = l_tag.withColumn(
                c, F.lit(None).cast(dict(r_tag.dtypes)[c])
            )
    unioned = l_tag.unionByName(r_tag.select(*l_tag.columns))
    # right rows sort before left rows at equal ts (side 0 < 1), so an
    # exactly-simultaneous right row is visible to the left row
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[c for c in left.columns],
        "__side",
        *[
            F.last(
                F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True
            )
            .over(w)
            .alias(f"__asof_{c}")
            for c in right_cols
        ],
    )
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            *[c for c in left.columns],
            *[F.col(f"__asof_{c}").alias(c) for c in right_cols],
        )
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Append ``session_id`` (per-key counter from 0): a new session
    starts when the gap since the key's previous event exceeds
    ``gap_minutes``."""
    w_order = Window.partitionBy(key).orderBy(F.col(ts).asc())
    gap_s = F.col(ts).cast("long") - F.lag(F.col(ts).cast("long")).over(w_order)
    new_session = F.when(
        gap_s.isNull() | (gap_s > gap_minutes * 60), 1
    ).otherwise(0)
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        "session_id", F.sum(new_session).over(w_run) - F.lit(1)
    )
