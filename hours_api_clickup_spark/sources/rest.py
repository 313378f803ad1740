"""HTTP retry/backoff policy (S8) — engine concern, offline-testable.

The reference copies the same wrapper five times
(``fetch_clickup_data.py:54-85`` et al.): 3 retries, exponential
2^attempt sleep, retry on 429/5xx/exception. One policy object here;
the transport is injected so tests never touch a network.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field


class RetryableHTTPError(Exception):
    def __init__(self, status: int, msg: str = ""):
        self.status = status
        super().__init__(f"HTTP {status} {msg}")


RETRYABLE_STATUSES = frozenset({429, 500, 502, 503, 504})


@dataclass
class RetryPolicy:
    max_retries: int = 3
    base_delay_s: float = 1.0
    sleep: Callable[[float], None] = field(default=time.sleep)

    def delay(self, attempt: int) -> float:
        # 2^attempt exponential backoff (fetch_clickup_data.py:64)
        return self.base_delay_s * (2**attempt)


def fetch_with_retry(
    fetch: Callable[[], dict],
    policy: RetryPolicy | None = None,
) -> dict:
    """Run ``fetch`` with the reference's retry semantics: retry on
    retryable HTTP statuses and on any exception, up to max_retries,
    then re-raise."""
    policy = policy or RetryPolicy()
    last_exc: Exception | None = None
    for attempt in range(policy.max_retries + 1):
        try:
            return fetch()
        except RetryableHTTPError as exc:
            if exc.status not in RETRYABLE_STATUSES:
                raise
            last_exc = exc
        except Exception as exc:  # noqa: BLE001 — reference retries broadly
            last_exc = exc
        if attempt < policy.max_retries:
            policy.sleep(policy.delay(attempt))
    assert last_exc is not None
    raise last_exc
