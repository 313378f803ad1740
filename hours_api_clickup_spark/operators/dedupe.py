"""Keep-latest-per-key deduplication (D1).

Reference semantics (``fetch_clickup_data.py:1774-1777``): sort ascending
by ``at`` with nulls last, then ``drop_duplicates(keep='last')`` per id —
so per key the max-``at`` row survives, EXCEPT that a null-``at``
duplicate beats every non-null one (nulls sort last and the last row is
kept). ``desc_nulls_first`` reproduces that tiebreak exactly.

Scale: a ranking window partitioned by the key — one hash shuffle on the
key, no global sort, no driver collection. AQE handles skewed keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__rn"


def dedupe_latest(
    df: DataFrame,
    key: str | Sequence[str] = "id",
    ts: str = "at",
    tiebreak: Sequence[Column] | None = None,
    null_wins: bool = True,
) -> DataFrame:
    """Keep one row per key: max ``ts`` wins; null ``ts`` wins overall when
    ``null_wins`` (the reference's pandas edge case).

    ``tiebreak``: extra deterministic ordering columns for equal
    timestamps (pandas keeps input order; Spark has none, so callers pass
    e.g. a unique id descending).
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = [
        F.col(ts).desc_nulls_first() if null_wins else F.col(ts).desc_nulls_last()
    ]
    if tiebreak is not None:
        order.extend(tiebreak)
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )
