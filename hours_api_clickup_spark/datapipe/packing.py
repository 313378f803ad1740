"""Sequence packing: global token offsets + context-window chunk spans.

GPT-style training pipelines concatenate the whole curated corpus into
one token stream and slice it into fixed-length context windows; the
data-engineering half of that is assigning every document its offset
range [start_offset, end_offset) in the global stream and the chunk ids
its bytes land in (documents straddle chunk boundaries by design —
packing never pads per document).

The core primitive is a GLOBAL prefix sum in a deterministic order —
the classic scale trap: a naive ``Window.orderBy(id)`` with no
partition key collapses the whole table into ONE partition. This
implementation is the textbook two-phase distributed scan (Blelloch,
"Prefix sums and their applications", CMU-CS-90-190):

  1. ``repartitionByRange(id)`` — ascending id ranges map to ascending
     physical partitions (sampled range exchange + local sort; no
     global sort).
  2. Per-partition running sum, keyed by ``spark_partition_id()`` —
     local work only.
  3. The per-partition totals (one row per partition) become prefix
     offsets on the driver-side tiny relation and broadcast-join back.

Wall-clock scales as one range exchange + one local pass, independent
of total size per executor; the only driver-side data is P totals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def global_prefix_offsets(
    df: DataFrame,
    id_col: str,
    size_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``start_offset``/``end_offset``: the half-open range each row
    occupies in the stream formed by concatenating rows in ``id_col``
    order. Two-phase distributed prefix sum — see module docstring.

    Preconditions: ``id_col`` values must be unique (ties make the
    within-partition order — and therefore the offsets — nondeterministic)
    and ``size_col`` may be any sign (per-partition totals are computed
    with SUM, which is correct for negative sizes too; max(running sum)
    would not be)."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # The per-row local-cumsum branch and the per-partition totals branch
    # BOTH consume this range exchange, and the downstream join stitches
    # their results together BY __pid. If the planner materializes two
    # separate exchanges (ReuseExchange is an optimization, not a
    # guarantee — observed to split under a struct sort key), each
    # samples its own range boundaries and the two branches disagree on
    # which rows live in which __pid → silently corrupt offsets. Pin the
    # partitioning by materializing the ranged rows once (eager
    # localCheckpoint) — same hazard and fix as operators/quantiles.py.
    ranged = (
        df.repartitionByRange(n, _c(id_col))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(_c(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn(
        "__local_cum", F.sum(_c(size_col)).over(w_local)
    )
    # one row per partition; SUM == partition total for any size sign
    totals = local.groupBy("__pid").agg(F.sum(_c(size_col)).alias("__ptot"))
    w_prefix = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )  # tiny relation (P rows) — single-partition window is fine HERE
    offsets = totals.withColumn(
        "__offset", F.coalesce(F.sum("__ptot").over(w_prefix), F.lit(0))
    ).select("__pid", "__offset")
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn("end_offset", F.col("__local_cum") + F.col("__offset"))
        .withColumn("start_offset", F.col("end_offset") - _c(size_col))
        .drop("__pid", "__local_cum")
    )


def pack_into_chunks(
    df: DataFrame,
    id_col: str,
    size_col: str,
    chunk_size: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each row its global offsets and the fixed-size chunk span
    [start_chunk, end_chunk] it occupies. Rows with size 0 are dropped
    (they occupy no chunk). A downstream shard writer groups by
    ``start_chunk div chunks_per_shard`` to emit training shards."""
    sized = df.filter(_c(size_col) > 0)
    with_offsets = global_prefix_offsets(sized, id_col, size_col, num_partitions)
    return with_offsets.select(
        *df.columns,
        "start_offset",
        "end_offset",
        F.expr(f"start_offset div {int(chunk_size)}").alias("start_chunk"),
        F.expr(f"(end_offset - 1) div {int(chunk_size)}").alias("end_chunk"),
    )


def write_training_shards(
    packed: DataFrame,
    out_dir: str,
    chunks_per_shard: int,
) -> None:
    """Materialize a packed corpus as training shards: one directory per
    ``shard_id = start_chunk div chunks_per_shard``, each written by a
    single task (repartition on the shard key) so a shard's contents are
    deterministic and a trainer streams shard files independently.

    Shard size is bounded by construction (chunks_per_shard × chunk_size
    units), so one-task-per-shard is load-balanced by design — pick
    chunks_per_shard so a shard is a few hundred MB: large enough to
    amortize file overhead, small enough that loss of one task's work on
    retry is cheap.
    """
    with_shard = packed.withColumn(
        "shard_id", F.expr(f"start_chunk div {int(chunks_per_shard)}")
    )
    (
        with_shard.repartition(F.col("shard_id"))
        # sort inside each shard task: repartition alone delivers rows
        # in shuffle-fetch order, which varies run to run — the
        # docstring's determinism claim needs a total order, and
        # start_offset is unique per row (review r8)
        .sortWithinPartitions("shard_id", "start_offset")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(out_dir)
    )
