"""Thin HTTP façade mirroring the reference's Flask surface.

The reference serves 8 routes (``/root/reference/main.py:22-232``):
POST /sync/refresh, /sync/full_reindex, /sync/lists, /sync/tasks,
/sync/accounts, /sync/apps and GET /health, / — each a thin wrapper
that invokes the pipeline and answers ``{'status': 'success', ...}`` /
``{'status': 'error', 'error': ...}``. This module maps the same routes
1:1 onto :mod:`hours_api_clickup_spark.pipelines` (the tested sync
surface), using only the stdlib ``http.server`` — the runtime has no
web framework, and the façade is deliberately free of any logic beyond
routing + JSON envelopes so every behavior stays tested at the
pipelines layer.

Input sources are configured paths (REST-fed or fixture JSONL — the
sandbox analog of the reference's env-configured ClickUp API client);
outputs are parquet tables under ``ServerConfig.warehouse``.
"""

from __future__ import annotations

import datetime as dt
import json
import threading
from dataclasses import dataclass
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hours_api_clickup_spark import pipelines
from hours_api_clickup_spark.sources.readers import (
    read_raw_tasks,
    read_raw_time_entries,
)

SERVICE = "hours-api-clickup-spark"
VERSION = "2.0.0"  # mirrors main.py:221

ENDPOINTS = {
    "POST /sync/refresh": "windowed refresh (body: {'days': N}, default 60)",
    "POST /sync/full_reindex": "full history replace",
    "POST /sync/lists": "lists dim snapshot",
    "POST /sync/tasks": "tasks dim snapshot",
    "POST /sync/accounts": "accounts dim + bridge snapshot",
    "POST /sync/apps": "applications dim snapshot",
    "GET /health": "service health",
    "GET /": "this listing",
}


@dataclass
class ServerConfig:
    spark: SparkSession
    entries_path: str  # raw time-entry JSONL (REST-fed or fixture)
    tasks_path: str  # raw task JSONL (feeds lists/tasks/accounts/apps)
    warehouse: str  # output root for fact/dim parquet tables
    today_oslo: dt.date | None = None  # None → current Europe/Oslo date
    refresh_days: int = pipelines.DEFAULT_REFRESH_DAYS


def _today(cfg: ServerConfig) -> dt.date:
    if cfg.today_oslo is not None:
        return cfg.today_oslo
    from zoneinfo import ZoneInfo

    return dt.datetime.now(ZoneInfo("Europe/Oslo")).date()


def _dispatch_sync(cfg: ServerConfig, route: str, body: dict) -> dict:
    """Run one sync route; returns the reference-shaped success payload."""
    spark = cfg.spark
    if route == "/sync/refresh":
        days = int(body.get("days", cfg.refresh_days))
        res = pipelines.sync_refresh(
            spark,
            read_raw_time_entries(spark, cfg.entries_path),
            f"{cfg.warehouse}/fact_time_entries",
            today_oslo=_today(cfg),
            days=days,
        )
        return {"status": "success", "mode": "refresh", "days": days, "rows": res.rows}
    if route == "/sync/full_reindex":
        res = pipelines.sync_full_reindex(
            spark,
            read_raw_time_entries(spark, cfg.entries_path),
            f"{cfg.warehouse}/fact_time_entries",
        )
        return {"status": "success", "mode": "full_reindex", "rows": res.rows}

    raw_tasks = read_raw_tasks(spark, cfg.tasks_path)
    if route == "/sync/lists":
        # the reference walks Space → Folder → List via the API; the
        # hierarchy columns of the task feed carry the same facts here
        raw_lists = raw_tasks.select(
            "space_id", "space_name", "folder_id", "folder_name",
            "list_id", "list_name",
        ).distinct()
        res = pipelines.sync_lists(raw_lists, f"{cfg.warehouse}/dim_lists")
    elif route == "/sync/tasks":
        res = pipelines.sync_tasks(raw_tasks, f"{cfg.warehouse}/dim_tasks")
    elif route == "/sync/accounts":
        res = pipelines.sync_accounts(
            raw_tasks.filter(F.col("custom_item_id") == 1001),
            f"{cfg.warehouse}/dim_accounts",
        )
    elif route == "/sync/apps":
        res = pipelines.sync_apps(raw_tasks, f"{cfg.warehouse}/dim_apps")
    else:
        raise KeyError(route)
    return {"status": "success", "mode": res.mode, "rows": res.rows}


def make_handler(cfg: ServerConfig) -> type[BaseHTTPRequestHandler]:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet; Spark logs carry the detail
            pass

        def _json(self, code: int, payload: dict) -> None:
            data = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/health":
                h = pipelines.health(cfg.spark)
                self._json(
                    200, {**h, "service": SERVICE, "version": VERSION}
                )
            elif self.path == "/":
                self._json(200, {"service": SERVICE, "endpoints": ENDPOINTS})
            else:
                self._json(404, {"status": "error", "error": "not found"})

        def do_POST(self):
            length = int(self.headers.get("Content-Length") or 0)
            raw = self.rfile.read(length) if length else b""
            try:
                body = json.loads(raw) if raw else {}
            except json.JSONDecodeError:
                self._json(400, {"status": "error", "error": "invalid JSON body"})
                return
            if self.path not in {
                "/sync/refresh", "/sync/full_reindex", "/sync/lists",
                "/sync/tasks", "/sync/accounts", "/sync/apps",
            }:
                self._json(404, {"status": "error", "error": "not found"})
                return
            try:
                self._json(200, _dispatch_sync(cfg, self.path, body))
            except Exception as exc:  # route contract: errors → 500 JSON
                self._json(500, {"status": "error", "error": str(exc)})

    return Handler


def start_server(
    cfg: ServerConfig, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """Start the façade on a daemon thread; ``.server_address[1]`` holds
    the bound port (port 0 → ephemeral). ``.shutdown()`` stops it."""
    srv = ThreadingHTTPServer((host, port), make_handler(cfg))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv
