"""Date/time column functions.

- ``epoch_ms_to_ts`` ← epoch-ms → UTC timestamp, None on 0/invalid
  (``fetch_clickup_data.py:815-817,588-594,727-735``)
- ``oslo_date`` ← UTC timestamp → Europe/Oslo civil date
  (``fetch_clickup_data.py:822-825``)

DST correctness comes from ``from_utc_timestamp`` + the IANA tz database;
nothing here depends on the session or host timezone (the session tz is
pinned to UTC in session.py regardless).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

OSLO_TZ = "Europe/Oslo"


def epoch_ms_to_ts(col: Column | str) -> Column:
    """Epoch-milliseconds (possibly string-typed) → TimestampType (UTC).

    0 and unparseable inputs → null, matching the reference's plain
    truthiness guards + try/except (``if start_ms:`` at
    fetch_clickup_data.py:816,588-594). Negative ms also → null — a
    DELIBERATE deviation: the reference's truthiness guard would pass
    negatives through as pre-1970 timestamps, which in a time-tracking
    domain are always corrupt input, not real instants.
    """
    c = F.col(col) if isinstance(col, str) else col
    # try_cast on BOTH steps: under ANSI mode a NaN/±inf/≥2^63 double
    # would throw CAST_OVERFLOW in the long cast and kill the job; the
    # contract is malformed-input → null
    ms = c.cast("string").try_cast("double").try_cast("long")
    return F.when(ms > 0, F.timestamp_millis(ms))


def local_civil_date(ts: Column | str, tz: str) -> Column:
    """UTC timestamp → civil date in ``tz`` (DST-aware)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.to_date(F.from_utc_timestamp(c, tz))


def oslo_date(ts: Column | str) -> Column:
    """UTC timestamp → Europe/Oslo civil date (fetch_clickup_data.py:822-825)."""
    return local_civil_date(ts, OSLO_TZ)
