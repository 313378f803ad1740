"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; these helpers cover the cases AQE can't re-plan:

- ``salted_agg``: two-phase aggregation for skewed group keys. Phase 1
  aggregates on (key, salt) — the hot key's rows spread over S
  reducers — phase 2 combines the S partials. Works for any algebraic
  aggregate (sum/count/min/max); avg = sum/count at phase 2.

Skewed JOINS need no helper here: small build sides broadcast (no
shuffle to skew — the engine broadcasts dims everywhere), and large
skewed shuffle joins are re-planned by AQE skew-join splitting, which
session.py enables.

At 100 TB: a single ClickUp workspace/user with millions of time
entries (or one near-duplicate document cluster) is exactly the hot-key
shape phase-1 salting absorbs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16
_SALT = "__salt"


def with_salt(df: DataFrame, n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Per-row salt in [0, n_salts) from monotonically_increasing_id —
    dense within each partition, so pmod cycles through every salt even
    when the rows themselves are low-cardinality (hashing row content
    would collapse identical rows onto one salt, defeating the spread).
    The salt only shapes the shuffle, never the result, so its exact
    assignment needs no cross-run stability."""
    return df.withColumn(
        _SALT, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name → (phase1_agg_expr, phase2_combine_expr);
    phase 2 expressions reference the phase-1 output column by name.
    Example::

        salted_agg(df, ["k"], {
            "total": (F.sum("v"), F.sum("total")),
            "n":     (F.count("*"), F.sum("n")),
        })
    """
    phase1 = (
        with_salt(df, n_salts)
        .groupBy(*keys, _SALT)
        .agg(*[expr.alias(name) for name, (expr, _) in aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[combine.alias(name) for name, (_, combine) in aggs.items()]
    )
