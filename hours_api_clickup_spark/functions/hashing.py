"""Hashing column functions.

- ``sha256_if_nonempty`` ← PII email hashing, None when empty
  (``fetch_clickup_data.py:846``)
- ``rolling_fingerprint`` — polynomial rolling hash over characters, a
  deterministic document fingerprint (beyond-reference text-analysis op).
  Pure Catalyst (``aggregate`` over ``split``), no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31


def sha256_if_nonempty(col: Column | str) -> Column:
    """SHA-256 hex digest; null for null/empty input (fetch_clickup_data.py:846)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(c) > 0, F.sha2(c, 256))


def rolling_fingerprint(col: Column | str) -> Column:
    """Polynomial rolling hash: h = (h*31 + ascii(c)) mod 1e9+7 over chars.

    Max intermediate value < (1e9+7)*31 + 255 < 2^35, safe in LongType.
    Deterministic and engine-portable (DuckDB list_reduce reproduces it).
    """
    c = F.col(col) if isinstance(col, str) else col
    chars = F.filter(F.split(c, ""), lambda x: x != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda h, ch: (h * FINGERPRINT_BASE + F.ascii(ch)) % F.lit(FINGERPRINT_MOD),
    )
