"""Z-order (Morton) clustering: multi-dimensional data locality for
file/row-group skipping.

A table sorted by one column prunes scans filtered on THAT column only;
a 2-D box query on (x, y) over an x-sorted layout still reads every
file for the y predicate. Interleaving the bits of bucketized x and y
into a single z-value and range-partitioning + sorting the write on it
bounds BOTH columns' min/max per file, so parquet footer stats skip
files/row groups for predicates on either dimension — the technique
behind Delta/Iceberg Z-ORDER table layout (public docs; same math as
the classic Morton curve).

The bit interleave is plain integer arithmetic (``(x div 2^i) % 2``
spelled per engine), so the z-values themselves are engine-portable and
the registry query ``zorder_cell_stats`` carries a full DuckDB
hash-match oracle. All Catalyst-side expressions are codegen'd — no
UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value_sql(x: str, y: str, bits: int = 8, intdiv: str = "div") -> str:
    """SQL text computing the Morton interleave of two bucketized
    non-negative ints in [0, 2^bits): bit i of x lands at position 2i,
    bit i of y at 2i+1. ``intdiv`` is the engine's integer-division
    operator (Spark ``div``, DuckDB ``//``); the rest is shared."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x}) {intdiv} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({y}) {intdiv} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def z_value(x: Column | str, y: Column | str, bits: int = 8) -> Column:
    """Column form of ``z_value_sql`` (codegen'd shift/mask sum)."""
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftright(xc.cast("long"), i).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * i)
        )
        z = z + F.shiftright(yc.cast("long"), i).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * i + 1)
        )
    return z


def zorder_write(
    df: DataFrame,
    x: Column,
    y: Column,
    path: str,
    bits: int = 8,
    n_files: int | None = None,
) -> None:
    """Write ``df`` z-ordered on the two bucketized dimensions: range-
    partition on the z-value (balanced files along the curve — Spark
    samples split points) and sort within each partition so parquet
    row-group min/max stats are tight on z, and therefore bounded on
    BOTH x and y (each z-range is a small set of Morton quadrants).

    Scale shape: one range exchange of the z column + the payload;
    no global sort into a single task, no skew (the curve spreads
    hot spots of either single dimension across quadrants)."""
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    out = df.withColumn("__z", z_value(x, y, bits))
    out.repartitionByRange(n, F.col("__z")).sortWithinPartitions(
        "__z"
    ).drop("__z").write.mode("overwrite").parquet(path)
