"""Distributed EXACT quantiles — the scale path for percentile checks.

Spark's built-in exact ``percentile`` aggregate concentrates every value
into one aggregation buffer (OK at verification scale, impossible at
100 TB); ``percentile_approx`` bounds state but is approximate. This
operator computes exact interpolated quantiles with bounded per-task
state using the classic two-phase global-rank scan (same family as
``datapipe/packing.py``'s prefix sum):

  1. range-repartition the values (Spark samples split points, so the
     P ranges are balanced) and sort within partitions
  2. count rows per range partition — a P-row side table; its running
     sum is each partition's global rank offset
  3. global rank = partition offset + local row_number; the quantile
     positions p·(n-1) pick at most 2 ranks per requested quantile, so
     the final aggregate reduces ~2·|qs| rows

Shuffle budget: one range exchange of the bare value column + one tiny
pid-keyed exchange for the local rank window; nothing ever concentrates
more than one range partition of doubles in a task. Interpolation is the
p·(n-1) linear rule shared by Spark's ``percentile`` and DuckDB's
``quantile_cont``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame, value_col: str, qs: list[float], out_names: list[str] | None = None
) -> DataFrame:
    """One-row DataFrame of exact linear-interpolated quantiles of
    ``value_col`` (nulls ignored), one double column per entry of ``qs``
    (named ``out_names`` or ``q_<100p>``). Empty input → one all-null row.
    """
    if out_names is None:
        out_names = [f"q_{int(round(q * 100))}" for q in qs]
    # duplicate requested quantiles (or names colliding after rounding)
    # must not collide in the output either
    seen: dict[str, int] = {}
    uniq = []
    for n in out_names:
        k = seen.get(n, 0)
        seen[n] = k + 1
        uniq.append(n if k == 0 else f"{n}_{k + 1}")
    out_names = uniq
    vals = df.select(F.col(value_col).cast("double").alias("v")).filter(
        F.col("v").isNotNull()
    )
    p = vals.sparkSession.sparkContext.defaultParallelism
    # The counts branch and the rank branch BOTH consume this exchange.
    # Correctness requires they see the identical partitioning: if the
    # planner materialized two separate range exchanges, each samples
    # its own split points (the sampler's seed mixes in the RDD id), and
    # divergent boundaries would silently corrupt the global ranks.
    # ReuseExchange usually unifies them, but "usually" is not a
    # correctness guarantee — so pin the partitioning by materializing
    # the ranged values once (eager localCheckpoint). The extra copy is
    # the bare double column, block-replicated on the executors that
    # already hold the shuffle output; both branches then read the same
    # RDD and the same pids by construction (ADVICE r2).
    ranged = vals.repartitionByRange(p, F.col("v")).localCheckpoint()

    # per-partition counts → running offsets (P rows, broadcast back)
    pid = F.spark_partition_id().alias("pid")
    counts = ranged.select(pid).groupBy("pid").agg(F.count("*").alias("c"))
    w_off = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offs = counts.select(
        "pid",
        F.coalesce(F.sum("c").over(w_off), F.lit(0)).alias("off"),
        F.sum("c").over(
            Window.orderBy("pid").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )

    w_local = Window.partitionBy("pid").orderBy("v")
    ranked = (
        ranged.select(pid, "v")
        .withColumn("rn", F.row_number().over(w_local))
        .join(F.broadcast(offs), "pid")
        # 0-based global rank in value order
        .withColumn("rank", F.col("off") + F.col("rn") - 1)
    )

    # keep only the ≤ 2·|qs| rows any quantile can touch
    keep = F.lit(False)
    for q in qs:
        pos = F.lit(float(q)) * (F.col("n") - 1).cast("double")
        keep = (
            keep
            | (F.col("rank") == F.floor(pos).cast("long"))
            | (F.col("rank") == F.ceil(pos).cast("long"))
        )
    picked = ranked.filter(keep)

    aggs = [F.max("n").alias("n")]
    for i, q in enumerate(qs):
        pos = F.lit(float(q)) * (F.col("n") - 1).cast("double")
        lo = F.floor(pos).cast("long")
        hi = F.ceil(pos).cast("long")
        aggs.append(
            F.min(F.when(F.col("rank") == lo, F.col("v"))).alias(f"__lo_{i}")
        )
        aggs.append(
            F.min(F.when(F.col("rank") == hi, F.col("v"))).alias(f"__hi_{i}")
        )
    one = picked.agg(*aggs)

    outs = []
    for i, (q, name) in enumerate(zip(qs, out_names)):
        pos = F.lit(float(q)) * (F.col("n") - 1).cast("double")
        frac = pos - F.floor(pos)
        lo_v = F.col(f"__lo_{i}")
        hi_v = F.col(f"__hi_{i}")
        outs.append((lo_v + frac * (hi_v - lo_v)).alias(name))
    return one.select(*outs)


def grouped_exact_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[float],
    out_names: list[str] | None = None,
) -> DataFrame:
    """Exact interpolated quantiles of ``value_col`` PER GROUP — one row
    per group, one double column per quantile. The grouped complement of
    ``exact_quantiles``: ranking rides ONE hash shuffle on the group key
    (rank and group-count windows share the same partitioning, so the
    second window adds no exchange), and only the ≤ 2·|qs| picked rows
    per group reach the final aggregate. State per task is bounded by
    its groups' sizes — the right shape when groups are plentiful; a
    single giant group degenerates to one partition, at which point the
    range-partitioned global form applies per group instead.

    Nulls in ``value_col`` are ignored; groups with only nulls are
    absent from the output (same as SQL ``GROUP BY`` + quantile_cont
    over an all-null group returning null — those rows carry no value).
    """
    if out_names is None:
        out_names = [f"q_{int(round(q * 100))}" for q in qs]
    seen: dict[str, int] = {}
    uniq = []
    for n in out_names:
        k = seen.get(n, 0)
        seen[n] = k + 1
        uniq.append(n if k == 0 else f"{n}_{k + 1}")
    out_names = uniq

    vals = df.select(
        F.col(group_col).alias("g"), F.col(value_col).cast("double").alias("v")
    ).filter(F.col("v").isNotNull())
    w_rank = Window.partitionBy("g").orderBy("v")
    w_all = Window.partitionBy("g").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = vals.select(
        "g",
        "v",
        (F.row_number().over(w_rank) - 1).alias("rank"),
        F.count("*").over(w_all).alias("n"),
    )

    keep = F.lit(False)
    for q in qs:
        pos = F.lit(float(q)) * (F.col("n") - 1).cast("double")
        keep = (
            keep
            | (F.col("rank") == F.floor(pos).cast("long"))
            | (F.col("rank") == F.ceil(pos).cast("long"))
        )
    picked = ranked.filter(keep)

    aggs = []
    for i, q in enumerate(qs):
        pos = F.lit(float(q)) * (F.col("n") - 1).cast("double")
        aggs.append(
            F.min(
                F.when(F.col("rank") == F.floor(pos).cast("long"), F.col("v"))
            ).alias(f"__lo_{i}")
        )
        aggs.append(
            F.min(
                F.when(F.col("rank") == F.ceil(pos).cast("long"), F.col("v"))
            ).alias(f"__hi_{i}")
        )
    per_group = picked.groupBy("g").agg(F.max("n").alias("n"), *aggs)

    outs = [F.col("g").alias(group_col)]
    for i, (q, name) in enumerate(zip(qs, out_names)):
        pos = F.lit(float(q)) * (F.col("n") - 1).cast("double")
        frac = pos - F.floor(pos)
        outs.append(
            (
                F.col(f"__lo_{i}")
                + frac * (F.col(f"__hi_{i}") - F.col(f"__lo_{i}"))
            ).alias(name)
        )
    return per_group.select(*outs)
