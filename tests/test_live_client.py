"""Live REST client integration tests (VERDICT r5 #2, closes S1–S8).

A local ``http.server`` fixture serves ClickUp-shaped JSON
(``fetch_clickup_data.py:87-122`` time entries, ``:411-465`` paginated
tasks) with injectable 429/500 responses, and the full stack runs over
real HTTP: ClickUpClient → retry/backoff → pagination policies →
30-day chunking → ``from_rows`` → ``sync_refresh`` into a parquet fact
table — no mocked transport anywhere.
"""

from __future__ import annotations

import datetime as dt
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from hours_api_clickup_spark.sources.client import (
    ClickUpClient,
    HTTPStatusError,
    make_chunk_fetch_fn,
)
from hours_api_clickup_spark.sources.rest import RetryPolicy
from tests.test_domain_semantics import _entry

T0 = 1_717_200_000_000  # 2024-06-01 00:00:00 UTC in epoch ms
DAY = 86_400_000


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # silence
        pass

    def do_GET(self):
        parsed = urlparse(self.path)
        qs = {k: v[0] for k, v in parse_qs(parsed.query).items()}
        srv = self.server
        srv.request_log.append(
            (parsed.path, qs, self.headers.get("Authorization"))
        )
        # failure injection: pop the next scripted status for this path
        plan = srv.fail_plan.get(parsed.path)
        if plan:
            status = plan.pop(0)
            self._respond(status, {"err": "injected"})
            return
        if parsed.path.endswith("/time_entries"):
            lo, hi = int(qs["start_date"]), int(qs["end_date"])
            rows = [
                e
                for e in srv.entries
                if e["start"] is not None and lo <= int(e["start"]) < hi
            ]
            self._respond(200, {"data": rows})
        elif "/task" in parsed.path:
            page, limit = int(qs.get("page", 0)), int(qs.get("limit", 100))
            tasks = srv.tasks[page * limit : (page + 1) * limit]
            self._respond(200, {"tasks": tasks})
        else:
            self._respond(404, {"err": "no route"})

    def _respond(self, status, payload):
        body = json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def api_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.entries = []
    srv.tasks = []
    srv.fail_plan = {}
    srv.request_log = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    srv.base_url = f"http://127.0.0.1:{srv.server_address[1]}"
    yield srv
    srv.shutdown()
    t.join(timeout=5)


def _client(srv, sleeps=None):
    return ClickUpClient(
        "tok-123",
        "team9",
        base_url=srv.base_url,
        policy=RetryPolicy(
            sleep=(sleeps.append if sleeps is not None else (lambda s: None))
        ),
        page_sleep_s=0.0,
        chunk_sleep_s=0.0,
    )


def test_retry_on_injected_429_then_500(api_server):
    api_server.entries = [_entry("e1", start_ms=T0, at_ms=T0)]
    path = "/team/team9/time_entries"
    api_server.fail_plan[path] = [429, 500]
    sleeps: list[float] = []
    rows = _client(api_server, sleeps).fetch_time_entries_chunk(
        T0 - DAY, T0 + DAY
    )
    assert [r["id"] for r in rows] == ["e1"]
    # 3 requests hit the wire; backoff was 2^0 then 2^1 seconds
    hits = [p for p, _, _ in api_server.request_log if p == path]
    assert len(hits) == 3
    assert sleeps == [1.0, 2.0]
    # the auth header rode every request — tok-123 isn't a pk_ personal
    # token, so the OAuth2 Bearer scheme applies (advice r6)
    assert all(a == "Bearer tok-123" for _, _, a in api_server.request_log)


def test_auth_scheme_selection(api_server):
    """pk_ personal tokens go raw (the reference's :642 form), anything
    else gets the Bearer prefix OAuth2 requires, and auth_scheme
    overrides either default."""
    api_server.entries = [_entry("e1", start_ms=T0, at_ms=T0)]

    def hdr(**kw):
        api_server.request_log.clear()
        ClickUpClient(
            kw.pop("token"), "team9", base_url=api_server.base_url,
            page_sleep_s=0.0, chunk_sleep_s=0.0, **kw,
        ).fetch_time_entries_chunk(T0 - DAY, T0 + DAY)
        return api_server.request_log[-1][2]

    assert hdr(token="pk_123_ABC") == "pk_123_ABC"
    assert hdr(token="oauth-access-tok") == "Bearer oauth-access-tok"
    assert hdr(token="pk_123_ABC", auth_scheme="Bearer") == "Bearer pk_123_ABC"
    assert hdr(token="oauth-access-tok", auth_scheme="") == "oauth-access-tok"


def test_non_retryable_4xx_raises_immediately(api_server):
    path = "/team/team9/time_entries"
    api_server.fail_plan[path] = [401]
    with pytest.raises(HTTPStatusError) as ei:
        _client(api_server).fetch_time_entries_chunk(T0, T0 + DAY)
    assert ei.value.status == 401
    assert len(api_server.request_log) == 1  # no retries on plain 4xx


def _task(i):
    return {"id": f"t{i}", "name": f"Task {i}"}


def test_pagination_policies_over_http(api_server):
    api_server.tasks = [_task(i) for i in range(250)]
    c = _client(api_server)

    got = c.fetch_tasks_from_list("l1")
    assert len(got) == 250
    # empty-page policy: 100,100,50,0 → 4 requests
    assert (
        len([p for p, _, _ in api_server.request_log if "/list/l1/" in p])
        == 4
    )

    api_server.request_log.clear()
    got = c.fetch_account_tasks("l1")
    assert len(got) == 250
    # short-page policy stops AT the 50-row page → 3 requests
    assert (
        len([p for p, _, _ in api_server.request_log if "/list/l1/" in p])
        == 3
    )

    api_server.request_log.clear()
    got = c.fetch_team_tasks()
    assert len(got) == 250 and got[0]["id"] == "t0"


def test_chunked_fetch_over_http(api_server):
    # entries spread over ~70 days → 3 chunks of 30 days
    api_server.entries = [
        _entry("a", start_ms=T0 + 1 * DAY, at_ms=T0),
        _entry("b", start_ms=T0 + 35 * DAY, at_ms=T0),
        _entry("c", start_ms=T0 + 65 * DAY, at_ms=T0),
    ]
    rows = _client(api_server).fetch_all_time_entries(T0, T0 + 70 * DAY)
    assert sorted(r["id"] for r in rows) == ["a", "b", "c"]
    # three windowed requests, bounds abutting (fetch_clickup_data.py:130)
    path = "/team/team9/time_entries"
    windows = [
        (int(q["start_date"]), int(q["end_date"]))
        for p, q, _ in api_server.request_log
        if p == path
    ]
    assert len(windows) == 3
    assert all(a[1] == b[0] for a, b in zip(windows, windows[1:]))


def test_chunked_fetch_skips_failed_chunk(api_server):
    """A chunk that fails through ALL its retries is skipped, and the
    remaining chunks still land (fetch_clickup_data.py:140-144)."""
    api_server.entries = [
        _entry("a", start_ms=T0 + 1 * DAY, at_ms=T0),
        _entry("b", start_ms=T0 + 35 * DAY, at_ms=T0),
        _entry("c", start_ms=T0 + 65 * DAY, at_ms=T0),
    ]
    path = "/team/team9/time_entries"
    c = _client(api_server)
    # chunk 1 succeeds unscripted; then 4 scripted failures exhaust
    # chunk 2's first attempt + 3 retries; chunk 3 succeeds unscripted.
    # Scripted statuses only pop when present, so schedule them after
    # chunk 1's single request by priming the plan inside a wrapper.
    orig = c.fetch_time_entries_chunk
    seen = {"n": 0}

    def arm_then_fetch(lo, hi, assignees=None):
        seen["n"] += 1
        if seen["n"] == 2:
            api_server.fail_plan[path] = [429, 500, 503, 502]
        return orig(lo, hi, assignees)

    c.fetch_time_entries_chunk = arm_then_fetch
    rows = c.fetch_all_time_entries(T0, T0 + 70 * DAY)
    # failed middle chunk skipped, the rest survived
    assert sorted(r["id"] for r in rows) == ["a", "c"]
    assert not api_server.fail_plan[path]  # all 4 failures were consumed


def test_sync_refresh_end_to_end_over_http(spark, api_server, tmp_path):
    """The VERDICT's done-bar: sync_refresh driven by rows fetched over
    real HTTP with injected 429/500s along the way."""
    from hours_api_clickup_spark.pipelines import sync_refresh
    from hours_api_clickup_spark.schemas import RAW_TIME_ENTRY_SCHEMA
    from hours_api_clickup_spark.sources.readers import from_rows

    api_server.entries = [
        _entry("e1", start_ms=T0, at_ms=T0, duration="3600000"),
        _entry("e2", start_ms=T0 + 2 * DAY, at_ms=T0, duration="1800000"),
        # same id fetched twice (overlapping windows) → dedup keeps latest
        _entry("e2", start_ms=T0 + 2 * DAY, at_ms=T0 + 99, duration="7200000"),
    ]
    path = "/team/team9/time_entries"
    api_server.fail_plan[path] = [429, 500]  # survive transient failures

    c = _client(api_server)
    raw_rows = c.fetch_all_time_entries(T0 - DAY, T0 + 30 * DAY)
    assert len(raw_rows) == 3

    raw = from_rows(spark, raw_rows, RAW_TIME_ENTRY_SCHEMA)
    fact_path = str(tmp_path / "fact")
    today = dt.date(2024, 6, 10)
    res = sync_refresh(spark, raw, fact_path, today, days=30)
    assert res.rows == 2  # e1 + deduped e2
    got = {
        r["id"]: r["duration_hours"]
        for r in spark.read.parquet(fact_path).collect()
    }
    assert got["e1"] == 1.0
    assert got["e2"] == 2.0  # latest `at` won the dedup


def test_distributed_chunk_fetch_over_http(spark, api_server):
    """The chunk plan fans out through mapInPandas and each executor
    task fetches its window over HTTP via make_chunk_fetch_fn."""
    from pyspark.sql.types import StringType, StructField, StructType

    from hours_api_clickup_spark.sources.chunks import window_chunks
    from hours_api_clickup_spark.sources.distributed_fetch import (
        fetch_chunks_distributed,
    )

    api_server.entries = [
        _entry("a", start_ms=T0 + 1 * DAY, at_ms=T0),
        _entry("b", start_ms=T0 + 35 * DAY, at_ms=T0),
        _entry("c", start_ms=T0 + 65 * DAY, at_ms=T0),
    ]
    start = dt.datetime.fromtimestamp(T0 / 1000, dt.timezone.utc)
    chunks = window_chunks(
        spark, start, start + dt.timedelta(days=70), chunk_days=30
    )
    assert chunks.count() == 3

    inner = make_chunk_fetch_fn(
        "tok-123", "team9", base_url=api_server.base_url, chunk_sleep_s=0.0
    )

    def fetch(lo, hi):
        # tz-naive chunk bounds from Spark → pin UTC before epoch-ms
        lo = lo.replace(tzinfo=dt.timezone.utc)
        hi = hi.replace(tzinfo=dt.timezone.utc)
        return [
            {"id": r["id"], "start": r["start"], "at": r["at"]}
            for r in inner(lo, hi)
        ]

    schema = StructType(
        [
            StructField("id", StringType()),
            StructField("start", StringType()),
            StructField("at", StringType()),
        ]
    )
    out = fetch_chunks_distributed(chunks, fetch, schema, max_parallel=3)
    assert sorted(r["id"] for r in out.collect()) == ["a", "b", "c"]
