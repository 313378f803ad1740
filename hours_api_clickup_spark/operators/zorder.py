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


def scan_stats(df) -> tuple[int, int]:
    """(files, rows) the LAST materialization of ``df`` actually pulled
    through its parquet scan node. In vanilla Spark (no table-format
    metadata layer) footer stats cannot skip files at SPLIT planning —
    every file becomes a task and ``numFiles`` stays constant; the
    pruning a clustered layout buys happens at ROW-GROUP level inside
    the reader (pushed predicates vs row-group min/max), which shows up
    as the scan's ``number of output rows``. A Delta/Iceberg manifest
    would additionally skip whole files up front; this helper measures
    the engine-native effect so tests assert the payoff end-to-end."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()

    def walk(node):
        try:
            metrics = node.metrics()
            found = {}
            it = metrics.iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() in ("numFiles", "numOutputRows"):
                    found[kv._1()] = int(kv._2().value())
            if "numFiles" in found:
                return found["numFiles"], found.get("numOutputRows", -1)
        except Exception:
            pass
        # the AQE root wraps the real tree and reports no children —
        # descend into the executed subtree it finalized
        if "AdaptiveSparkPlan" in node.getClass().getSimpleName():
            return walk(node.executedPlan())
        n = node.children().size() if hasattr(node, "children") else 0
        for i in range(n):
            got = walk(node.children().apply(i))
            if got is not None:
                return got
        return None

    got = walk(plan)
    if got is None:
        raise ValueError("no FileScan metrics in the executed plan")
    return got
