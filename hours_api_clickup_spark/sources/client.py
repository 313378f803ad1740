"""Live ClickUp REST client (closes S1–S8 end-to-end).

The reference constructs four near-identical ``requests.Session``-based
fetchers (``fetch_clickup_data.py:40-52`` time entries, ``:296-310``
lists/tasks, ``:487-514`` accounts, ``:630-645`` apps), each with its
own copy of the retry loop. Here the transport is ONE client object:

- retry/backoff delegates to :mod:`sources.rest` (the policy object the
  offline tests already pin — 3 retries, 2^attempt sleep, 429/5xx
  retryable, other 4xx raise immediately);
- pagination delegates to :mod:`sources.pagination` (the two
  termination policies: empty-page for tasks ``:428-429``, short-page
  for accounts ``:616-617``);
- 30-day chunking delegates to :mod:`sources.chunks` semantics — the
  driver-side sequential loop mirrors ``fetch_all_time_entries``
  (``:126-147``, skip-failed-chunk), and :func:`make_chunk_fetch_fn`
  plugs the same per-chunk fetch into
  ``sources.distributed_fetch.fetch_chunks_distributed`` so a backfill
  fans out across executors instead of serializing on the driver.

``base_url`` is injected so integration tests drive the full stack
against a local ``http.server`` fixture — no call site hardcodes the
production endpoint. Rate-limit courtesy sleeps (``:112`` 0.5s between
chunk requests, ``:415`` 0.3s between pages) are injectable for the
same reason.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import Any

from hours_api_clickup_spark.sources.pagination import (
    PagePolicy,
    collect_all_pages,
)
from hours_api_clickup_spark.sources.rest import (
    RETRYABLE_STATUSES,
    RetryableHTTPError,
    RetryPolicy,
    fetch_with_retry,
)

DEFAULT_BASE_URL = "https://api.clickup.com/api/v2"
PAGE_SIZE = 100  # fetch_clickup_data.py:413 (limit=100)


class HTTPStatusError(Exception):
    """Non-retryable HTTP failure (4xx other than 429)."""

    def __init__(self, status: int, body: str = ""):
        self.status = status
        super().__init__(f"HTTP {status}: {body[:200]}")


class ClickUpClient:
    """Thin ``requests``-backed ClickUp API client.

    One session, one retry policy, endpoint methods returning plain
    row dicts — the ``createDataFrame`` seam (``sources.readers.
    from_rows``) turns them into DataFrames with the pinned schemas.
    """

    def __init__(
        self,
        token: str,
        team_id: str,
        base_url: str = DEFAULT_BASE_URL,
        policy: RetryPolicy | None = None,
        page_sleep_s: float = 0.3,  # fetch_clickup_data.py:415
        chunk_sleep_s: float = 0.5,  # fetch_clickup_data.py:112
        timeout_s: float = 30.0,  # fetch_clickup_data.py:58
        session: Any | None = None,
        auth_scheme: str | None = None,
    ):
        import requests

        self.token = token
        self.team_id = team_id
        self.base_url = base_url.rstrip("/")
        self.policy = policy or RetryPolicy()
        self.page_sleep_s = page_sleep_s
        self.chunk_sleep_s = chunk_sleep_s
        self.timeout_s = timeout_s
        self.session = session or requests.Session()
        # the reference sends `Bearer <token>` on the time-entries
        # fetcher (:50) and the raw token on the others (:642). ClickUp
        # accepts both for PERSONAL tokens (`pk_…`) but OAuth2 access
        # tokens require the Bearer prefix on every endpoint (advice
        # r6) — default to raw for pk_ tokens, Bearer otherwise, and
        # let auth_scheme ('' | 'Bearer') override either way.
        if auth_scheme is None:
            auth_scheme = "" if token.startswith("pk_") else "Bearer"
        self.auth_scheme = auth_scheme
        auth_value = f"{auth_scheme} {token}".strip() if auth_scheme else token
        self.session.headers.update(
            {"Authorization": auth_value, "Content-Type": "application/json"}
        )

    # -- transport ---------------------------------------------------------

    def get_json(self, path: str, params: dict | None = None) -> dict:
        """GET {base_url}{path} with the reference's retry semantics."""
        url = f"{self.base_url}{path}"

        def attempt() -> dict:
            resp = self.session.get(
                url, params=params or {}, timeout=self.timeout_s
            )
            if resp.status_code == 200:
                return resp.json()
            # every non-200 routes through RetryableHTTPError so the
            # pinned policy decides: 429/5xx retry with backoff, any
            # other 4xx raises on the FIRST attempt (rest.py:48-50)
            raise RetryableHTTPError(resp.status_code, resp.text[:200])

        try:
            return fetch_with_retry(attempt, self.policy)
        except RetryableHTTPError as exc:
            if exc.status not in RETRYABLE_STATUSES:
                raise HTTPStatusError(exc.status, str(exc)) from exc
            raise

    # -- time entries (S1/S2/S8) -------------------------------------------

    def fetch_time_entries_chunk(
        self, start_ms: int, end_ms: int, assignees: list[str] | None = None
    ) -> list[dict]:
        """One windowed time-entries request
        (fetch_clickup_data.py:87-122): epoch-ms bounds, optional
        comma-joined assignee filter, rows under ``data``."""
        if self.chunk_sleep_s:
            time.sleep(self.chunk_sleep_s)
        params: dict[str, Any] = {"start_date": start_ms, "end_date": end_ms}
        if assignees:
            params["assignee"] = ",".join(assignees)
        data = self.get_json(
            f"/team/{self.team_id}/time_entries", params=params
        )
        return data.get("data", [])

    def fetch_all_time_entries(
        self,
        start_ms: int,
        end_ms: int,
        assignees: list[str] | None = None,
        chunk_days: int = 30,
    ) -> list[dict]:
        """Sequential 30-day-chunk loop (fetch_clickup_data.py:126-147):
        a failed chunk is skipped, not fatal. The distributed form of
        the same loop is ``fetch_chunks_distributed`` +
        :func:`make_chunk_fetch_fn`."""
        step_ms = chunk_days * 86_400_000
        out: list[dict] = []
        cur = start_ms
        while cur < end_ms:
            hi = min(cur + step_ms, end_ms)
            try:
                out.extend(
                    self.fetch_time_entries_chunk(cur, hi, assignees)
                )
            except Exception:  # noqa: BLE001 — skip-and-continue (:140-144)
                pass
            cur = hi
        return out

    # -- hierarchy + paginated task scans (S3–S7) --------------------------

    def fetch_spaces(self) -> list[dict]:
        """GET /team/{id}/space (fetch_clickup_data.py:318-323)."""
        data = self.get_json(f"/team/{self.team_id}/space")
        return data.get("spaces", [])

    def fetch_folders(self, space_id: str) -> list[dict]:
        data = self.get_json(f"/space/{space_id}/folder")
        return data.get("folders", [])

    def fetch_folderless_lists(self, space_id: str) -> list[dict]:
        data = self.get_json(f"/space/{space_id}/list")
        return data.get("lists", [])

    def fetch_folder_lists(self, folder_id: str) -> list[dict]:
        data = self.get_json(f"/folder/{folder_id}/list")
        return data.get("lists", [])

    def _task_page(
        self, path: str, page: int, extra_query: str = ""
    ) -> list[dict]:
        if self.page_sleep_s:
            time.sleep(self.page_sleep_s)
        data = self.get_json(
            path,
            params={
                "page": page,
                "limit": PAGE_SIZE,
                "include_closed": "true",
                "subtasks": "true",
                **dict(
                    kv.split("=", 1) for kv in extra_query.split("&") if kv
                ),
            },
        )
        return data.get("tasks", [])

    def fetch_tasks_from_list(
        self, list_id: str, archived: bool = False
    ) -> list[dict]:
        """All tasks of one list, empty-page termination
        (fetch_clickup_data.py:411-465; S4). The two-pass archived scan
        (S5) is two calls with archived=False/True."""
        return collect_all_pages(
            lambda page: self._task_page(
                f"/list/{list_id}/task",
                page,
                f"archived={'true' if archived else 'false'}",
            ),
            policy=PagePolicy.EMPTY_PAGE,
            page_size=PAGE_SIZE,
        )

    def fetch_account_tasks(self, list_id: str) -> list[dict]:
        """Accounts list scan, SHORT-page termination
        (fetch_clickup_data.py:599-617; S6)."""
        return collect_all_pages(
            lambda page: self._task_page(
                f"/list/{list_id}/task", page, "archived=false"
            ),
            policy=PagePolicy.SHORT_PAGE,
            page_size=PAGE_SIZE,
        )

    def fetch_team_tasks(self) -> list[dict]:
        """Team-wide task scan (apps; fetch_clickup_data.py:688-704,
        S7) — empty-page termination; the custom_item_id==1005 filter
        is applied Spark-side (operators.hierarchy), not here."""
        return collect_all_pages(
            lambda page: self._task_page(f"/team/{self.team_id}/task", page),
            policy=PagePolicy.EMPTY_PAGE,
            page_size=PAGE_SIZE,
        )


def make_chunk_fetch_fn(
    token: str,
    team_id: str,
    base_url: str = DEFAULT_BASE_URL,
    assignees: list[str] | None = None,
    chunk_sleep_s: float = 0.5,
) -> Callable:
    """Picklable per-chunk fetch for ``fetch_chunks_distributed``:
    captures only plain strings; each executor builds its own client +
    HTTP session lazily on first call (sessions don't pickle)."""
    state: dict[str, Any] = {}

    def fetch(chunk_start, chunk_end) -> list[dict]:
        if "client" not in state:
            state["client"] = ClickUpClient(
                token,
                team_id,
                base_url=base_url,
                chunk_sleep_s=chunk_sleep_s,
            )
        to_ms = lambda t: int(t.timestamp() * 1000)  # noqa: E731
        return state["client"].fetch_time_entries_chunk(
            to_ms(chunk_start), to_ms(chunk_end), assignees
        )

    return fetch
