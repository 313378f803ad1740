"""Warehouse-SQL sink twin of the reference's BigQuery MERGE pipeline.

The reference ships its fact table to BigQuery in three server-side
steps: WRITE_TRUNCATE the staging table
(``fetch_clickup_data.py:1253-1271``), then one MERGE statement — the
windowed refresh (``:1273-1333``) or the full reindex (``:1335-1399``).
The Spark-side algebra of those MERGEs is implemented and
property-tested in ``operators/merge.py``; what this module adds is the
*statement* side of the sink:

- :func:`bigquery_merge_refresh_sql` / :func:`bigquery_merge_full_reindex_sql`
  render the exact BigQuery-dialect MERGE text the live connector would
  submit (column list from ``schemas.STAGING_TIME_ENTRIES_SCHEMA``, the
  same 31 columns the reference enumerates by hand), so the only thing
  missing in this sandbox is the ``google.cloud.bigquery`` client
  object itself;
- :func:`merge_refresh_statements` / :func:`merge_full_reindex_statements`
  compile the same MERGE semantics to a portable two-statement
  DELETE+INSERT transaction that any ANSI warehouse without MERGE can
  run — executed and equivalence-tested here against DuckDB as the
  stand-in warehouse (``tests/test_warehouse_sink.py`` proves the
  transaction's result row-for-row equal to ``operators.merge``'s
  Spark output on the §4.3 case-analysis fixture);
- :func:`upload_staging_truncate` is the WRITE_TRUNCATE staging load
  (Arrow hop, no CSV detour).

Equivalence sketch (SURVEY.md §4.3): with W the window predicate and
S_w = staging rows satisfying W, the refresh MERGE yields

    fact' = S_w  ∪  { t ∈ fact : t.id ∉ keys(S_w)  ∧  ¬W(t) }

because MATCHED rows are overwritten column-for-column by their S_w
twin (== delete + reinsert), NOT-MATCHED S_w rows are inserted, and
NOT-MATCHED-BY-SOURCE rows are deleted only when W(t) is TRUE — a NULL
date makes BETWEEN non-true, so null-dated history survives, which is
why the DELETE below wraps the window in COALESCE(..., FALSE) rather
than negating it. The full reindex degenerates to fact' = staging.

Scale note: staging is one refresh window (the reference uploads ≤ a
few thousand rows per run), so the Arrow materialization in
``upload_staging_truncate`` is bounded by construction — the same
bound the reference's ``load_table_from_dataframe`` relies on. The
fact table never moves through the driver: both MERGE forms run
entirely inside the warehouse.
"""

from __future__ import annotations

import datetime as dt
from typing import Sequence

from hours_api_clickup_spark import schemas as S

#: the reference's hand-enumerated MERGE column list
#: (fetch_clickup_data.py:1279-1311) — derived here from the pinned
#: staging schema so the two can never drift.
MERGE_COLUMNS: tuple[str, ...] = tuple(
    f.name for f in S.STAGING_TIME_ENTRIES_SCHEMA.fields
)

#: columns needing identifier quoting in BigQuery (reserved word `at`,
#: fetch_clickup_data.py:1289).
_BQ_QUOTED = {"at"}


def _bq_ident(col: str) -> str:
    return f"`{col}`" if col in _BQ_QUOTED else col


def _date_lit(d: dt.date) -> str:
    return f"DATE '{d.isoformat()}'"


# ---------------------------------------------------------------------------
# BigQuery dialect — the statement the live connector would submit.
# ---------------------------------------------------------------------------


def bigquery_merge_refresh_sql(
    project_id: str,
    dataset: str,
    fact_table: str,
    staging_table: str,
    key: str = "id",
    date_col: str = "start_date_oslo",
    columns: Sequence[str] = MERGE_COLUMNS,
) -> str:
    """The windowed-refresh MERGE, fetch_clickup_data.py:1273-1333.

    Parameterized on @days exactly like the reference (ScalarQueryParameter,
    :1329-1331); the window anchors at CURRENT_DATE('Europe/Oslo').
    """
    fact = f"`{project_id}.{dataset}.{fact_table}`"
    staging = f"`{project_id}.{dataset}.{staging_table}`"
    sets = ",\n          ".join(
        f"{_bq_ident(c)} = S.{_bq_ident(c)}" for c in columns if c != key
    )
    window = (
        f'{date_col} BETWEEN DATE_SUB(CURRENT_DATE("Europe/Oslo"), '
        f'INTERVAL refresh_days DAY) AND CURRENT_DATE("Europe/Oslo")'
    )
    return f"""DECLARE refresh_days INT64 DEFAULT @days;

MERGE {fact} T
USING (
  SELECT * FROM {staging}
  WHERE {window}
) S
ON T.{key} = S.{key}
WHEN MATCHED THEN UPDATE SET
          {sets}
WHEN NOT MATCHED THEN
  INSERT ROW
WHEN NOT MATCHED BY SOURCE
  AND T.{window}
THEN DELETE;"""


def bigquery_merge_full_reindex_sql(
    project_id: str,
    dataset: str,
    fact_table: str,
    staging_table: str,
    key: str = "id",
    columns: Sequence[str] = MERGE_COLUMNS,
) -> str:
    """The full-reindex MERGE, fetch_clickup_data.py:1335-1399."""
    fact = f"`{project_id}.{dataset}.{fact_table}`"
    staging = f"`{project_id}.{dataset}.{staging_table}`"
    sets = ",\n          ".join(
        f"{_bq_ident(c)} = S.{_bq_ident(c)}" for c in columns if c != key
    )
    col_list = ", ".join(_bq_ident(c) for c in columns)
    val_list = ", ".join(f"S.{_bq_ident(c)}" for c in columns)
    return f"""MERGE {fact} T
USING {staging} S
ON T.{key} = S.{key}
WHEN MATCHED THEN UPDATE SET
          {sets}
WHEN NOT MATCHED THEN
  INSERT ({col_list})
  VALUES ({val_list})
WHEN NOT MATCHED BY SOURCE THEN
  DELETE;"""


# ---------------------------------------------------------------------------
# Portable ANSI transaction — executable on warehouses without MERGE
# (DuckDB 1.0 here); semantics identical to the MERGE forms above.
# ---------------------------------------------------------------------------


def merge_refresh_statements(
    fact_table: str,
    staging_table: str,
    window_lo: dt.date,
    window_hi: dt.date,
    key: str = "id",
    date_col: str = "start_date_oslo",
    columns: Sequence[str] = MERGE_COLUMNS,
) -> list[str]:
    """DELETE+INSERT pair equal to the refresh MERGE; run both inside
    one transaction (:func:`apply_statements`). The DELETE removes
    (a) every fact row whose key appears in staging-in-window — the
    MATCHED branch's overwrite, re-supplied by the INSERT — and (b)
    every fact row whose own date is TRULY inside the window — the
    NOT-MATCHED-BY-SOURCE delete; COALESCE keeps NULL-dated history.
    Columns are listed explicitly (name-matched like BigQuery MERGE,
    not positional) so a column-order drift between fact and staging
    errors instead of silently transposing values."""
    lo, hi = _date_lit(window_lo), _date_lit(window_hi)
    w_fact = f"COALESCE({date_col} BETWEEN {lo} AND {hi}, FALSE)"
    w_stg = f"{date_col} BETWEEN {lo} AND {hi}"
    col_list = ", ".join(columns)
    return [
        f"DELETE FROM {fact_table} WHERE {w_fact} OR {key} IN "
        f"(SELECT {key} FROM {staging_table} WHERE {w_stg})",
        f"INSERT INTO {fact_table} ({col_list}) "
        f"SELECT {col_list} FROM {staging_table} WHERE {w_stg}",
    ]


def merge_full_reindex_statements(
    fact_table: str,
    staging_table: str,
    columns: Sequence[str] = MERGE_COLUMNS,
) -> list[str]:
    """fact' = staging (SURVEY §4.3 M2), column lists explicit."""
    col_list = ", ".join(columns)
    return [
        f"DELETE FROM {fact_table}",
        f"INSERT INTO {fact_table} ({col_list}) "
        f"SELECT {col_list} FROM {staging_table}",
    ]


def check_staging_key_unique(
    con, staging_table: str, key: str = "id", where: str | None = None
) -> None:
    """Mirror BigQuery MERGE's multiple-match error: MERGE raises when
    more than one source row matches one target row, but the portable
    DELETE+INSERT pair would silently insert both. Call this before
    :func:`apply_statements`; raises ValueError on duplicate keys."""
    pred = f" WHERE {where}" if where else ""
    dup = con.execute(
        f"SELECT {key}, COUNT(*) AS n FROM {staging_table}{pred} "
        f"GROUP BY {key} HAVING COUNT(*) > 1 LIMIT 5"
    ).fetchall()
    if dup:
        raise ValueError(
            f"staging key '{key}' is not unique in {staging_table} — "
            f"MERGE would error on multiple matches; sample: {dup}"
        )


def apply_statements(con, statements: Sequence[str]) -> None:
    """Run the statement list as ONE transaction on a DB-API-ish
    connection (DuckDB here): all-or-nothing, like the single MERGE
    job the reference submits — a mid-transaction failure leaves the
    fact table untouched."""
    con.execute("BEGIN TRANSACTION")
    try:
        for stmt in statements:
            con.execute(stmt)
    except Exception:
        con.execute("ROLLBACK")
        raise
    con.execute("COMMIT")


def upload_staging_truncate(con, spark_df, staging_table: str) -> int:
    """WRITE_TRUNCATE staging load (fetch_clickup_data.py:1253-1271):
    replace the staging table's ROWS with the DataFrame's rows via one
    Arrow hop, keeping the pinned table schema when the table already
    exists — BigQuery's WRITE_TRUNCATE truncates data but coerces the
    load to the existing table schema (and errors on drift), so a
    CREATE OR REPLACE that silently redefines the schema from the
    DataFrame would hide drift this load must surface. Name-matched
    insert (BY NAME) mirrors BigQuery's field-name matching. Returns
    the row count. Bounded: staging is one refresh window, the same
    bound the reference's load job relies on."""
    tbl = spark_df.toArrow()
    con.register("_staging_arrow_tmp", tbl)
    # one finally for BOTH branches: a failing CREATE TABLE used to skip
    # the unregister, pinning the whole staged batch in memory and
    # shadowing the view name for later calls on this connection
    # (review r6)
    try:
        exists = con.execute(
            "SELECT COUNT(*) FROM information_schema.tables "
            "WHERE table_name = ?",
            [staging_table],
        ).fetchone()[0]
        if exists:
            con.execute("BEGIN TRANSACTION")
            try:
                con.execute(f"DELETE FROM {staging_table}")
                con.execute(
                    f"INSERT INTO {staging_table} BY NAME "
                    "SELECT * FROM _staging_arrow_tmp"
                )
            except Exception:
                con.execute("ROLLBACK")
                raise
            con.execute("COMMIT")
        else:
            con.execute(
                f"CREATE TABLE {staging_table} AS "
                "SELECT * FROM _staging_arrow_tmp"
            )
    finally:
        con.unregister("_staging_arrow_tmp")
    return tbl.num_rows
