"""Duplicate-cluster resolution: connected components over near-dup
pair edges + survivor selection.

The dedup families (``dedup.py``, ``similarity.py``) emit *pairs*; a
curation pipeline must then group pairs into clusters and keep one
survivor per cluster. The reference has no such operator (its dedup is
keep-latest-per-key, ``fetch_clickup_data.py:1774-1777``); this is one
of the beyond-reference training-data operators.

Algorithm: iterative min-label propagation ("hash-to-min" style — see
Rastogi et al., "Finding connected components in map-reduce in
logarithmic rounds", ICDE 2013; the large-star/small-star variant of
Kiveris et al., "Connected components in MapReduce and beyond", SoCC
2014 is the drop-in upgrade if cluster diameters ever grow). Each
round every node takes the min component id seen across itself and its
neighbors; convergence needs O(diameter) rounds. Near-dup clusters are
near-cliques (diameter ≤ ~3), so 3-4 rounds settle in practice; a
``max_iter`` guard fails loudly rather than looping forever.

Scale shape per round: ONE shuffle join (edges ⋈ labels on the
neighbor id) + ONE groupBy(node).min — both keyed on the node id, so
AQE reuses the same hash partitioning; the edge list is
``localCheckpoint``-ed once so the (possibly expensive) pair-generation
plan upstream is never re-executed per round. Label state is
checkpointed each round to keep lineage flat — the standard Pregel
discipline on Spark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with the min node id of its connected component.

    ``nodes``: one row per node (isolated nodes keep their own id —
    they form singleton clusters). ``edges``: undirected pair list;
    symmetrized internally, self-loops and duplicates are harmless
    (min() over a multiset).

    Returns ``(node: long, component: long)``.
    """
    node_ids = nodes.select(_c(node_col).cast("long").alias("node")).distinct()
    sym = (
        edges.select(
            _c(src_col).cast("long").alias("u"),
            _c(dst_col).cast("long").alias("v"),
        )
        .union(
            edges.select(
                _c(dst_col).cast("long").alias("u"),
                _c(src_col).cast("long").alias("v"),
            )
        )
        # restrict to the declared node universe (and drop null ids):
        # an endpoint absent from ``nodes`` used to INVENT output rows
        # the caller never supplied, with labels that may not have
        # converged through the missing node's other edges (review r8)
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .join(node_ids.withColumnRenamed("node", "u"), "u", "left_semi")
        .join(node_ids.withColumnRenamed("node", "v"), "v", "left_semi")
        # materialize once: every round re-joins this edge list, and the
        # upstream pair-generation plan (GEMM / LSH) must not re-run
        .localCheckpoint(eager=True)
    )
    labels = (
        node_ids.withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # the frame whose localCheckpoint blocks back ``labels`` — kept so
    # _free_checkpoint always sees the bare LogicalRDD (a projection on
    # top would hide it from the reflection path)
    labels_ckpt = labels

    def _free_checkpoint(df: DataFrame) -> None:
        """Best-effort release of a superseded localCheckpoint's cached
        blocks (standard Pregel-on-Spark discipline): without it each
        round pins another full label-set copy until context GC — up to
        max_iter copies on the biggest inputs (review r8). Reaches the
        checkpointed RDD through the analyzed LogicalRDD; swallows any
        reflection miss, since retention is a memory-pressure concern,
        never a correctness one."""
        try:
            df._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:
            pass

    for _ in range(max_iter):
        # neighbor v's current component flows to u …
        msgs = sym.join(
            labels, sym["v"] == labels["node"], "inner"
        ).select(
            F.col("u").alias("node"),
            F.col("component"),
            F.lit(False).alias("is_self"),
        )
        # … and each node keeps the min over {self} ∪ neighbors. The
        # convergence test rides the SAME aggregation: a node changed
        # iff some neighbor label beat its own (min < self), so tagging
        # the self row lets one groupBy deliver both the new label and
        # the changed flag — the per-round labels⋈new_labels join that
        # used to re-shuffle both label sets just to detect convergence
        # is gone (r12: 2 shuffles/round → 1).
        new_labels = (
            labels.select(
                "node", "component", F.lit(True).alias("is_self")
            )
            .union(msgs)
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                (
                    F.min("component")
                    < F.max(F.when(F.col("is_self"), F.col("component")))
                ).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        done = new_labels.filter(F.col("changed")).isEmpty()
        _free_checkpoint(labels_ckpt)
        labels_ckpt = new_labels
        labels = new_labels.select("node", "component")
        if done:
            _free_checkpoint(sym)
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def resolve_dup_clusters(
    nodes: DataFrame,
    pairs: DataFrame,
    node_col: str,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Cluster near-dup pairs and pick the min-id survivor per cluster.

    Returns ``(<node_col>: long, cluster_id: long, is_survivor: bool)``
    — filter ``is_survivor`` to materialize the deduplicated corpus;
    singletons are their own survivor, so the filter never drops
    documents that had no near-dup.
    """
    comp = connected_components(nodes, pairs, node_col, src_col, dst_col)
    return comp.select(
        F.col("node").alias(node_col),
        F.col("component").alias("cluster_id"),
        (F.col("component") == F.col("node")).alias("is_survivor"),
    )
