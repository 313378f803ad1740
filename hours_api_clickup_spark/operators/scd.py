"""Slowly-changing-dimension Type 2: effective-dated attribute history.

The reference keeps dimensions current-state-only (dim_* full replace /
MERGE upsert, fetch_clickup_data.py:1335-1399) — history is lost on
every sync. SCD2 is the standard warehouse answer: one row per
(key, attribute-state) interval with ``valid_from`` / ``valid_to`` /
``is_current``, so facts can join the dimension AS OF their event time
(the `asof_join` operator is the matching probe side).

Two forms:

- ``scd2_compact``   — batch build: collapse a full observation log into
  the minimal interval history (change-point detection + interval
  stitching). One shuffle on the key; both windows share it.
- ``scd2_apply``     — incremental maintenance: fold a new observation
  batch into an existing history WITHOUT reprocessing unaffected keys
  (semi-join prune → recompact only the touched keys' current rows ∪
  the batch). At 100 TB the history is bucketed by key, so the apply
  touches |affected-keys| buckets, not the dimension scan.

Determinism: observation order is (eff_col, *order_cols) — callers pass
a unique tiebreaker (an id column) so change detection is total-ordered
and engine-portable. Attribute comparison is null-safe (a NULL→value
transition is a change).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _changed(attr_cols: Sequence[str]) -> Column:
    cond = None
    for a in attr_cols:
        c = ~F.col(a).eqNullSafe(F.col(f"__prev_{a}"))
        cond = c if cond is None else cond | c
    # first observation of a key: every __prev is the window's leading
    # NULL, which eqNullSafe treats as a real value — so add the
    # explicit first-row test on the sentinel marker instead.
    return F.col("__first") | cond


def scd2_compact(
    df: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    eff_col: str,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Observation log → minimal SCD2 history.

    Change-point detection: a row opens a new interval iff it is the
    key's first observation or any tracked attribute differs
    (null-safely) from the previous observation. ``valid_to`` is the
    next interval's ``valid_from`` (half-open [from, to) intervals —
    the convention the as-of join expects); the last interval has
    ``valid_to`` NULL and ``is_current`` true.

    Plan shape: two windows over the same (key) partitioning and
    (eff, *order) ordering — one exchange, reused (the second window
    runs on the change rows, a subset with the same partitioning).
    """
    keys = [F.col(k) for k in key_cols]
    order = [F.col(eff_col), *[F.col(o) for o in order_cols]]
    w = Window.partitionBy(*keys).orderBy(*order)
    obs = df.withColumn("__first", F.row_number().over(w) == 1)
    for a in attr_cols:
        obs = obs.withColumn(f"__prev_{a}", F.lag(a).over(w))
    seg = obs.filter(_changed(attr_cols))
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return seg.select(
        *key_cols,
        *attr_cols,
        F.col(eff_col).alias("valid_from"),
        F.lead(eff_col).over(w2).alias("valid_to"),
        F.lead(eff_col).over(w2).isNull().alias("is_current"),
    )


def scd2_apply(
    history: DataFrame,
    batch: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    eff_col: str,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Fold an observation batch into an existing SCD2 history.

    Algebra: let A = keys present in the batch. Rows of keys ∉ A and
    CLOSED rows of keys ∈ A are untouched (historical intervals never
    reopen — the batch is required to be entirely later than the
    history, the standard forward-only ingest contract; late-arriving
    corrections are a full recompact of the affected keys' logs). The
    affected keys' CURRENT rows are re-derived by compacting
    (current-row-as-observation ∪ batch): if the first batch
    observation repeats the current attributes the current row simply
    survives (no-op change), otherwise it closes at the first changed
    observation's eff and new intervals follow.

    Incremental ≡ batch: ``scd2_apply(scd2_compact(log₁), log₂) ==
    scd2_compact(log₁ ∪ log₂)`` whenever max(log₁.eff) ≤ min(log₂.eff)
    per key — property-tested.

    Scale: the batch's key set prunes everything — anti/semi joins on
    the key, and with the history bucketed by key the rewrite touches
    only affected buckets (the same touched-partition contract as
    operators/merge.py).
    """
    batch_keys = batch.select(*key_cols).dropDuplicates()
    untouched = history.join(batch_keys, list(key_cols), "left_anti")
    affected_closed = history.filter(~F.col("is_current")).join(
        batch_keys, list(key_cols), "left_semi"
    )
    cur_obs = (
        history.filter(F.col("is_current"))
        .join(batch_keys, list(key_cols), "left_semi")
        .select(
            *key_cols,
            *attr_cols,
            F.col("valid_from").alias(eff_col),
            # current rows sort before every batch row (forward-only
            # contract) — any constant works for the tiebreakers
            *[F.lit(None).cast(batch.schema[o].dataType).alias(o) for o in order_cols],
        )
    )
    obs = cur_obs.unionByName(
        batch.select(*key_cols, *attr_cols, eff_col, *order_cols)
    )
    recompacted = scd2_compact(obs, key_cols, attr_cols, eff_col, order_cols)
    out_cols = [*key_cols, *attr_cols, "valid_from", "valid_to", "is_current"]
    return (
        untouched.select(*out_cols)
        .unionByName(affected_closed.select(*out_cols))
        .unionByName(recompacted.select(*out_cols))
    )
