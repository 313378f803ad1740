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


def md5_hash32(col: Column | str) -> Column:
    """First 32 bits of md5 as a non-negative long in [0, 2^32).

    The engine-portable hash for *variable-length* strings: md5 produces
    the same lowercase hex in every engine, and the 8-hex-digit parse is
    plain ascii arithmetic (`0-9` → 48-57, `a-f` → 97-102), so the value
    is reproducible bit-for-bit in DuckDB (``md5_hash32_sql``) — unlike
    xxhash64, whose seed/finalizer are Spark-internal. Every term is a
    codegen'd builtin (no interpreted higher-order functions); Catalyst
    subexpression elimination computes the md5 once.
    """
    c = F.col(col) if isinstance(col, str) else col
    m = F.md5(c)
    out = F.lit(0).cast("long")
    for j in range(8):
        a = F.ascii(F.substring(m, F.lit(j + 1), F.lit(1)))
        out = out * 16 + (a - F.when(a >= 97, F.lit(87)).otherwise(F.lit(48)))
    return out


def md5_word_sql(md5_expr: str, lo: int = 1) -> str:
    """Engine-portable SQL parsing hex chars [lo, lo+8) of an
    already-computed md5 hex string into a 32-bit word as int64. Plain
    ascii arithmetic + CASE WHEN — the same text parses and evaluates
    identically in Spark SQL and DuckDB, so one generator serves both
    engines (md5 hex output is identical everywhere)."""
    terms = []
    for j in range(8):
        a = f"ascii(substring({md5_expr}, {lo + j}, 1))"
        # CAST: DuckDB ascii() is INT32; the 16^7 scale overflows it
        terms.append(
            f"CAST({a} - CASE WHEN {a} >= 97 THEN 87 ELSE 48 END AS BIGINT)"
            f" * {16 ** (7 - j)}"
        )
    return "(" + " + ".join(terms) + ")"


def md5_hash32_sql(md5_expr: str) -> str:
    """DuckDB twin of ``md5_hash32``: parse the first 8 hex chars of an
    already-computed md5 string expression into the same int64."""
    return md5_word_sql(md5_expr, 1)
