"""BigQuery client adapter — the live call path for S10/S11.

The statement side of the sink already exists (``sinks/warehouse.py``
renders the reference's two MERGE texts and equivalence-tests their
portable twin against DuckDB); this module adds the ~30-line
``google.cloud.bigquery`` call sequence the reference runs around those
statements (``fetch_clickup_data.py:1253-1271`` WRITE_TRUNCATE staging
load, ``:1313-1331`` parameterized refresh MERGE, ``:1333-1399`` full
reindex MERGE, ``:1198-1251`` DDL-on-first-use).

Import-guarded: the ``google.cloud.bigquery`` package is not installed
in this sandbox, so the module object is INJECTED (``bq=``) — unit
tests drive the adapter with a fake module/client and assert the exact
call + SQL sequence; production constructs :class:`BigQuerySink` with
no ``bq`` argument and gets the real import (or a clear ImportError).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

from hours_api_clickup_spark import schemas as S
from hours_api_clickup_spark.sinks.warehouse import (
    bigquery_merge_full_reindex_sql,
    bigquery_merge_refresh_sql,
)


def bigquery_available() -> bool:
    try:
        import google.cloud.bigquery  # noqa: F401

        return True
    except ImportError:
        return False


#: Spark type → BigQuery SchemaField type, the names the reference's
#: hand-written DDL uses (fetch_clickup_data.py:1200-1247).
_BQ_TYPES = {
    T.StringType(): "STRING",
    T.LongType(): "INTEGER",
    T.IntegerType(): "INTEGER",
    T.DoubleType(): "FLOAT",
    T.FloatType(): "FLOAT",
    T.BooleanType(): "BOOLEAN",
    T.TimestampType(): "TIMESTAMP",
    T.DateType(): "DATE",
}

#: pandas nullable-Int64 casts the reference applies before upload so
#: NULL-able integer columns survive the Arrow hop
#: (fetch_clickup_data.py:1260-1262).
_NULLABLE_INT_COLS = ("duration_ms", "task_status_orderindex")


def bq_schema_fields(schema: T.StructType, bq) -> list:
    """Pinned Spark schema → list of bigquery.SchemaField (the same 31
    fields the reference enumerates by hand)."""
    return [
        bq.SchemaField(f.name, _BQ_TYPES[f.dataType]) for f in schema.fields
    ]


@dataclass
class BigQuerySinkConfig:
    project_id: str
    dataset: str
    fact_table: str = "fact_time_entries"
    staging_table: str = "staging_time_entries"
    #: staging upload path: "pandas" = the reference's
    #: load_table_from_dataframe (driver collects the window — correct
    #: for the bounded refresh window, a bottleneck on a 100× table);
    #: "direct" = the spark-bigquery connector's Storage Write API path
    #: (df.write.format("bigquery"), executors stream straight to BQ —
    #: the distributed path; verdict r6 #5).
    write_method: str = "pandas"

    def __post_init__(self) -> None:
        # fail fast: a typo ('Direct', 'DIRECT') silently falling
        # through to the pandas branch would driver-collect the very
        # table the direct path exists for (review r7)
        if self.write_method not in ("pandas", "direct"):
            raise ValueError(
                f"write_method must be 'pandas' or 'direct', "
                f"got {self.write_method!r}"
            )


class BigQuerySink:
    """The reference's BigQueryUploader call path behind one object.

    ``client``/``bq`` injection points: tests pass fakes; production
    passes neither and gets ``bigquery.Client(project=...)``.
    """

    def __init__(
        self, config: BigQuerySinkConfig, client=None, bq=None
    ):
        if bq is None:
            from google.cloud import bigquery as bq  # noqa: PLC0415
        self.bq = bq
        self.config = config
        self.client = client or bq.Client(project=config.project_id)

    # -- DDL-on-first-use (fetch_clickup_data.py:1198-1251) ---------------

    def _table_id(self, name: str) -> str:
        c = self.config
        return f"{c.project_id}.{c.dataset}.{name}"

    def ensure_staging_table(self) -> None:
        table = self.bq.Table(
            self._table_id(self.config.staging_table),
            schema=bq_schema_fields(S.STAGING_TIME_ENTRIES_SCHEMA, self.bq),
        )
        self.client.create_table(table, exists_ok=True)

    def ensure_fact_table(self) -> None:
        table = self.bq.Table(
            self._table_id(self.config.fact_table),
            schema=bq_schema_fields(S.FACT_TIME_ENTRIES_SCHEMA, self.bq),
        )
        self.client.create_table(table, exists_ok=True)

    # -- staging upload (fetch_clickup_data.py:1253-1271) -----------------

    def upload_staging(self, df) -> int:
        """WRITE_TRUNCATE load of one refresh window's staging rows.

        ``write_method="pandas"`` (default): accepts a Spark DataFrame
        (bounded: one window) or a pandas frame; applies the
        reference's nullable-Int64 casts and loads through the client —
        the reference's exact call shape.

        ``write_method="direct"``: Spark DataFrame only; executors
        stream to BigQuery through the spark-bigquery connector's
        Storage Write API (``writeMethod=direct``), truncating the
        staging table (``mode=overwrite`` ≡ WRITE_TRUNCATE). No driver
        collect — the path for anything bigger than a refresh window."""
        if self.config.write_method == "direct":
            if not hasattr(df, "write"):
                raise TypeError(
                    "write_method='direct' needs a Spark DataFrame "
                    "(executors write; a pandas frame has no "
                    "distributed path)"
                )
            # persist before count-then-save: without it the upstream
            # plan executes TWICE (once per action) — doubling exactly
            # the expensive-transform case this path exists for — and a
            # nondeterministic upstream could return a count that
            # disagrees with what was written (review r7)
            df = df.persist()
            try:
                n = df.count()
                (
                    df.write.format("bigquery")
                    .option("table", self._table_id(self.config.staging_table))
                    .option("writeMethod", "direct")
                    .mode("overwrite")
                    .save()
                )
            finally:
                df.unpersist()
            return n
        pdf = df.toPandas() if hasattr(df, "toPandas") else df.copy()
        for col in _NULLABLE_INT_COLS:
            if col in pdf.columns:
                pdf[col] = pdf[col].astype("Int64")
        job_config = self.bq.LoadJobConfig(write_disposition="WRITE_TRUNCATE")
        job = self.client.load_table_from_dataframe(
            pdf, self._table_id(self.config.staging_table), job_config=job_config
        )
        job.result()  # block like the reference (:1269)
        return len(pdf)

    # -- server-side MERGE (fetch_clickup_data.py:1273-1399) --------------

    def merge_refresh(self, days: int) -> None:
        c = self.config
        query = bigquery_merge_refresh_sql(
            c.project_id, c.dataset, c.fact_table, c.staging_table
        )
        job_config = self.bq.QueryJobConfig(
            query_parameters=[
                self.bq.ScalarQueryParameter("days", "INT64", days)
            ]
        )
        self.client.query(query, job_config=job_config).result()

    def merge_full_reindex(self) -> None:
        c = self.config
        query = bigquery_merge_full_reindex_sql(
            c.project_id, c.dataset, c.fact_table, c.staging_table
        )
        self.client.query(query).result()

    # -- end-to-end sync units (fetch_clickup_data.py:1769-1806) ----------

    def sync_refresh(self, staged_df, days: int) -> int:
        """staging upload + windowed MERGE, the refresh-mode tail of the
        reference's run(): returns staged row count."""
        self.ensure_staging_table()
        self.ensure_fact_table()
        n = self.upload_staging(staged_df)
        self.merge_refresh(days)
        return n

    def sync_full_reindex(self, staged_df) -> int:
        self.ensure_staging_table()
        self.ensure_fact_table()
        n = self.upload_staging(staged_df)
        self.merge_full_reindex()
        return n
