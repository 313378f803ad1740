"""Incremental materialized-rollup maintenance (algebraic partial
aggregates).

The reference maintains its fact table incrementally (windowed MERGE
every 6 h, ``fetch_clickup_data.py:1273-1333``) but recomputes every
*aggregate* from scratch in consumer SQL. At 100 TB the rollups
themselves must be maintained incrementally: keep the aggregation's
ALGEBRAIC STATE per group — (count, sum) here, from which sum/avg
finalize — merge the delta batch's partial state into it, and never
rescan history. This is classic incremental view maintenance (e.g.
Gray et al., "Data Cube", and every streaming-SQL engine's agg state);
Spark's own partial aggregation does the identical merge inside one
job — this operator persists that state ACROSS jobs.

- ``partial_rollup``: one map-side-combining shuffle keyed by the
  group key → state rows.
- ``merge_rollup_states``: union of state frames → same keyed
  aggregation (states are tiny: |groups| rows, not |input| rows).
- ``finalize_rollup``: projection only.

Mergeable by sum: COUNT, SUM, (thus AVG), MIN/MAX. COUNT(DISTINCT) is
NOT algebraic — its at-scale mergeable form is the HLL sketch
(``agg_approx_stats``); keep exact distinct out of incremental rollups.

Sums are carried as DECIMAL so merge order can never change the result
(exact integer arithmetic), finalized to DOUBLE once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_SUM_TYPE = "decimal(18,2)"


def partial_rollup(df: DataFrame, keys: list[str], val: str) -> DataFrame:
    """Aggregate ``df`` to per-group algebraic state: (cnt, sum_dec)."""
    return df.groupBy(*keys).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col(val).cast(STATE_SUM_TYPE)).alias("sum_dec"),
    )


def merge_rollup_states(*states: DataFrame) -> DataFrame:
    """Merge partial-state frames (same schema) into one state frame.
    Cost is keyed on |groups|, independent of the history row count —
    the whole point of keeping state instead of recomputing."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy(
        *[c for c in merged.columns if c not in ("cnt", "sum_dec")]
    ).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_dec").alias("sum_dec"),
    )


def finalize_rollup(state: DataFrame, val: str) -> DataFrame:
    """State → presentation: total (double) and mean (double division of
    the exact total — IEEE-identical across engines)."""
    total = F.col("sum_dec").cast("double")
    return state.select(
        *[c for c in state.columns if c not in ("cnt", "sum_dec")],
        F.col("cnt").alias("n"),
        total.alias(f"total_{val}"),
        (total / F.col("cnt").cast("double")).alias(f"avg_{val}"),
    )
