"""BigQuery adapter unit tests (VERDICT r5 #3, closes S10/S11).

``google.cloud.bigquery`` is absent in this sandbox, so a fake module +
client drive the adapter and the tests assert the EXACT call and SQL
sequence the reference executes (fetch_clickup_data.py:1253-1271 staging
load, :1313-1331 parameterized refresh MERGE, :1335-1399 full reindex).
"""

from __future__ import annotations

import datetime as dt
from types import SimpleNamespace

import pandas as pd
import pytest

from hours_api_clickup_spark.sinks.bigquery import (
    BigQuerySink,
    BigQuerySinkConfig,
    bigquery_available,
    bq_schema_fields,
)
from hours_api_clickup_spark.sinks.warehouse import MERGE_COLUMNS


class _FakeJob:
    def __init__(self, log, kind):
        self.log = log
        self.kind = kind

    def result(self):
        self.log.append((self.kind, "result"))
        return self


class _FakeClient:
    def __init__(self):
        self.calls: list = []

    def create_table(self, table, exists_ok=False):
        self.calls.append(("create_table", table.table_id, exists_ok))
        return table

    def load_table_from_dataframe(self, pdf, table_id, job_config=None):
        self.calls.append(
            (
                "load",
                table_id,
                job_config.kw.get("write_disposition"),
                {c: str(pdf[c].dtype) for c in pdf.columns},
            )
        )
        return _FakeJob(self.calls, "load")

    def query(self, sql, job_config=None):
        params = (
            [tuple(p) for p in job_config.kw["query_parameters"]]
            if job_config
            else None
        )
        self.calls.append(("query", sql, params))
        return _FakeJob(self.calls, "query")


def _fake_bq():
    def _cfg(**kw):
        return SimpleNamespace(kw=kw)

    return SimpleNamespace(
        SchemaField=lambda name, typ: (name, typ),
        Table=lambda table_id, schema=None: SimpleNamespace(
            table_id=table_id, schema=schema
        ),
        LoadJobConfig=_cfg,
        QueryJobConfig=_cfg,
        ScalarQueryParameter=lambda n, t, v: (n, t, v),
        Client=lambda project=None: _FakeClient(),
    )


@pytest.fixture()
def sink():
    bq = _fake_bq()
    client = _FakeClient()
    cfg = BigQuerySinkConfig("proj", "hours")
    return BigQuerySink(cfg, client=client, bq=bq), client, bq


def _staging_pdf():
    cols = {c: ["x"] for c in MERGE_COLUMNS}
    pdf = pd.DataFrame(cols)
    pdf["duration_ms"] = [3600000]
    pdf["task_status_orderindex"] = [None]
    pdf["duration_hours"] = [1.0]
    pdf["start_date_oslo"] = [dt.date(2024, 6, 1)]
    return pdf


def test_schema_fields_match_reference_ddl(sink):
    s, _, bq = sink
    from hours_api_clickup_spark.schemas import STAGING_TIME_ENTRIES_SCHEMA

    fields = bq_schema_fields(STAGING_TIME_ENTRIES_SCHEMA, bq)
    assert len(fields) == 31
    by_name = dict(fields)
    # spot-check the reference's hand-written types (:1200-1247)
    assert by_name["id"] == "STRING"
    assert by_name["duration_ms"] == "INTEGER"
    assert by_name["duration_hours"] == "FLOAT"
    assert by_name["billable"] == "BOOLEAN"
    assert by_name["start_utc"] == "TIMESTAMP"
    assert by_name["start_date_oslo"] == "DATE"
    assert by_name["task_status_orderindex"] == "INTEGER"


def test_upload_staging_is_write_truncate_with_int64_casts(sink):
    s, client, _ = sink
    n = s.upload_staging(_staging_pdf())
    assert n == 1
    kind, table_id, disposition, dtypes = client.calls[0]
    assert (kind, table_id) == ("load", "proj.hours.staging_time_entries")
    assert disposition == "WRITE_TRUNCATE"
    # the reference's nullable-integer casts (:1260-1262)
    assert dtypes["duration_ms"] == "Int64"
    assert dtypes["task_status_orderindex"] == "Int64"
    assert client.calls[1] == ("load", "result")  # blocked on the job


def test_merge_refresh_is_parameterized_query(sink):
    s, client, _ = sink
    s.merge_refresh(days=60)
    kind, sql, params = client.calls[0]
    assert kind == "query"
    assert params == [("days", "INT64", 60)]  # ScalarQueryParameter (:1326)
    assert "DECLARE refresh_days INT64 DEFAULT @days" in sql
    assert "MERGE `proj.hours.fact_time_entries` T" in sql
    assert "WHEN NOT MATCHED BY SOURCE" in sql
    assert client.calls[1] == ("query", "result")


def test_full_refresh_sync_call_sequence(sink):
    """ensure tables → WRITE_TRUNCATE upload → MERGE, in that order —
    the refresh-mode tail of the reference's run() (:1769-1806)."""
    s, client, _ = sink
    n = s.sync_refresh(_staging_pdf(), days=30)
    assert n == 1
    kinds = [c[0] for c in client.calls]
    assert kinds == [
        "create_table",  # staging DDL-on-first-use (exists_ok)
        "create_table",  # fact
        "load",
        "load",  # job.result()
        "query",
        "query",  # job.result()
    ]
    assert client.calls[0][1:] == ("proj.hours.staging_time_entries", True)
    assert client.calls[1][1:] == ("proj.hours.fact_time_entries", True)


def test_full_reindex_uses_unparameterized_merge(sink):
    s, client, _ = sink
    s.sync_full_reindex(_staging_pdf())
    sql = [c for c in client.calls if c[0] == "query" and len(c) == 3][0][1]
    assert "USING `proj.hours.staging_time_entries` S" in sql
    assert "WHEN NOT MATCHED BY SOURCE THEN" in sql
    assert "@days" not in sql


def test_import_guard_reports_sandbox_truthfully():
    # this sandbox has no google.cloud.bigquery — the guard must say so,
    # and constructing without an injected module must raise ImportError
    if bigquery_available():  # pragma: no cover — prod environment
        pytest.skip("real bigquery present")
    with pytest.raises(ImportError):
        BigQuerySink(BigQuerySinkConfig("p", "d"))


def test_upload_accepts_spark_dataframe(spark, sink):
    s, client, _ = sink
    sdf = spark.createDataFrame(
        [("e1", 3600000)], "id string, duration_ms long"
    )
    n = s.upload_staging(sdf)
    assert n == 1
    assert client.calls[0][3]["duration_ms"] == "Int64"


class _FakeWriter:
    """Records the df.write option chain the direct path builds."""

    def __init__(self, log):
        self.log = log
        self.opts = {}

    def format(self, fmt):
        self.log.append(("format", fmt))
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def mode(self, m):
        self.log.append(("mode", m))
        return self

    def save(self):
        self.log.append(("save", dict(self.opts)))


class _FakeSparkDF:
    def __init__(self, log, n=7):
        self.write = _FakeWriter(log)
        self._n = n
        self.log = log

    def persist(self):
        self.log.append(("persist",))
        return self

    def unpersist(self):
        self.log.append(("unpersist",))
        return self

    def count(self):
        self.log.append(("count",))
        return self._n


def test_direct_write_method_uses_connector_not_driver(sink):
    """Verdict r6 #5: write_method='direct' streams from executors via
    the spark-bigquery connector — the exact option set is pinned and
    the pandas/client load path is never touched."""
    _, client, bq = sink
    cfg = BigQuerySinkConfig("proj", "hours", write_method="direct")
    s = BigQuerySink(cfg, client=client, bq=bq)
    log: list = []
    n = s.upload_staging(_FakeSparkDF(log, n=7))
    assert n == 7
    assert ("format", "bigquery") in log and ("mode", "overwrite") in log
    save = next(e for e in log if e[0] == "save")[1]
    assert save == {
        "table": "proj.hours.staging_time_entries",
        "writeMethod": "direct",
    }
    # the driver-side client path stayed cold
    assert not any(c[0] == "load" for c in client.calls)
    # single upstream evaluation: persisted BEFORE the count, released
    # after the save (review r7 — count-then-save without persist runs
    # the upstream plan twice)
    order = [e[0] for e in log]
    assert order.index("persist") < order.index("count")
    assert order.index("save") < order.index("unpersist")


def test_write_method_typos_fail_fast():
    """Review r7: anything but 'pandas'/'direct' must raise at config
    time — a typo silently taking the pandas branch would driver-collect
    the very table the direct path exists for."""
    with pytest.raises(ValueError, match="write_method"):
        BigQuerySinkConfig("proj", "hours", write_method="DIRECT")
    with pytest.raises(ValueError, match="write_method"):
        BigQuerySinkConfig("proj", "hours", write_method="Direct")


def test_direct_write_method_rejects_pandas(sink):
    _, client, bq = sink
    cfg = BigQuerySinkConfig("proj", "hours", write_method="direct")
    s = BigQuerySink(cfg, client=client, bq=bq)
    with pytest.raises(TypeError, match="direct"):
        s.upload_staging(_staging_pdf())
