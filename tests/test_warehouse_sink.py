"""The warehouse-SQL sink twin must equal the Spark-side MERGE algebra.

Runs the portable DELETE+INSERT transaction (sinks/warehouse.py) on
DuckDB as the stand-in warehouse and compares row-for-row with
operators/merge.py's Spark output on the same §4.3 case-analysis
fixture test_domain_semantics.py pins — so the statement path and the
DataFrame path can never drift. Also pins the BigQuery-dialect MERGE
text (fetch_clickup_data.py:1273-1399) the live connector would submit.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from hours_api_clickup_spark.operators.merge import (
    merge_full_reindex,
    merge_refresh,
)
from hours_api_clickup_spark.sinks.warehouse import (
    MERGE_COLUMNS,
    apply_statements,
    bigquery_merge_full_reindex_sql,
    bigquery_merge_refresh_sql,
    merge_full_reindex_statements,
    merge_refresh_statements,
    upload_staging_truncate,
)

LO, HI = dt.date(2024, 5, 1), dt.date(2024, 6, 30)
COLS = ("id", "start_date_oslo", "v")


def _fixture(spark):
    mk = lambda i, d, v: (f"id{i}", dt.date(2024, d[0], d[1]), float(v))
    fact = spark.createDataFrame(
        [
            mk(1, (1, 10), 1),  # outside window, untouched
            mk(2, (6, 1), 1),  # inside window, also in staging → updated
            mk(3, (6, 2), 1),  # inside window, not in staging → deleted
            mk(4, (1, 11), 1),  # outside window, key not in staging-window
            ("id7", None, 1.0),  # NULL date: BETWEEN not true → kept
            mk(8, (1, 13), 1),  # outside window but key IS in staging-window
            #                     → MATCHED branch overwrites it
        ],
        "id string, start_date_oslo date, v double",
    )
    staging = spark.createDataFrame(
        [
            mk(2, (6, 1), 2),  # update
            mk(5, (6, 3), 9),  # insert (new in window)
            mk(6, (1, 12), 9),  # outside window → ignored by refresh
            mk(8, (6, 4), 7),  # in window; matches out-of-window fact row
        ],
        ["id", "start_date_oslo", "v"],
    )
    return fact, staging


def _window_pred():
    return F.col("start_date_oslo").between(F.lit(LO), F.lit(HI))


def _warehouse(fact_df, staging_df):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE fact_time_entries "
        "(id VARCHAR, start_date_oslo DATE, v DOUBLE)"
    )
    con.register("_fact_arrow", fact_df.toArrow())
    con.execute("INSERT INTO fact_time_entries SELECT * FROM _fact_arrow")
    n = upload_staging_truncate(con, staging_df, "staging_time_entries")
    assert n == staging_df.count()
    return con


def _rows(x):
    if hasattr(x, "collect"):
        return sorted((r["id"], r["start_date_oslo"], r["v"]) for r in x.collect())
    return sorted(map(tuple, x.fetchall()))


def test_refresh_transaction_equals_spark_merge(spark):
    fact, staging = _fixture(spark)
    expected = _rows(merge_refresh(fact, staging, _window_pred(), key="id"))

    con = _warehouse(fact, staging)
    apply_statements(
        con,
        merge_refresh_statements(
            "fact_time_entries", "staging_time_entries", LO, HI,
            columns=COLS,
        ),
    )
    got = _rows(con.sql("SELECT * FROM fact_time_entries"))
    assert got == expected
    # the out-of-window matched row was overwritten, not duplicated
    assert ("id8", dt.date(2024, 6, 4), 7.0) in got
    assert ("id8", dt.date(2024, 1, 13), 1.0) not in got
    # null-dated history survived the windowed delete
    assert ("id7", None, 1.0) in got
    con.close()


def test_refresh_transaction_idempotent(spark):
    fact, staging = _fixture(spark)
    con = _warehouse(fact, staging)
    stmts = merge_refresh_statements(
        "fact_time_entries", "staging_time_entries", LO, HI, columns=COLS
    )
    apply_statements(con, stmts)
    once = _rows(con.sql("SELECT * FROM fact_time_entries"))
    apply_statements(con, stmts)
    twice = _rows(con.sql("SELECT * FROM fact_time_entries"))
    assert once == twice
    con.close()


def test_full_reindex_transaction_equals_spark_merge(spark):
    fact, staging = _fixture(spark)
    expected = _rows(merge_full_reindex(fact, staging))
    con = _warehouse(fact, staging)
    apply_statements(
        con,
        merge_full_reindex_statements(
            "fact_time_entries", "staging_time_entries", columns=COLS
        ),
    )
    got = _rows(con.sql("SELECT * FROM fact_time_entries"))
    assert got == expected == _rows(staging)
    con.close()


def test_failed_transaction_leaves_fact_untouched(spark):
    fact, staging = _fixture(spark)
    con = _warehouse(fact, staging)
    before = _rows(con.sql("SELECT * FROM fact_time_entries"))
    stmts = merge_refresh_statements(
        "fact_time_entries", "staging_time_entries", LO, HI, columns=COLS
    )
    with pytest.raises(Exception):
        apply_statements(con, stmts[:1] + ["INSERT INTO no_such_table VALUES (1)"])
    assert _rows(con.sql("SELECT * FROM fact_time_entries")) == before
    con.close()


def test_staging_upload_is_write_truncate(spark):
    fact, staging = _fixture(spark)
    con = _warehouse(fact, staging)
    upload_staging_truncate(con, staging.limit(1), "staging_time_entries")
    assert con.sql("SELECT COUNT(*) FROM staging_time_entries").fetchone()[0] == 1
    con.close()


def test_staging_upload_keeps_pinned_schema_and_surfaces_drift(spark):
    """BigQuery's WRITE_TRUNCATE keeps the existing table schema and
    errors on drift (ADVICE r5): re-uploading must not redefine the
    staging table, and a DataFrame missing a pinned column must raise,
    not silently narrow the table."""
    fact, staging = _fixture(spark)
    con = _warehouse(fact, staging)
    before = [
        tuple(r)
        for r in con.sql(
            "SELECT column_name, data_type FROM information_schema.columns "
            "WHERE table_name='staging_time_entries' ORDER BY ordinal_position"
        ).fetchall()
    ]
    upload_staging_truncate(con, staging.limit(2), "staging_time_entries")
    after = [
        tuple(r)
        for r in con.sql(
            "SELECT column_name, data_type FROM information_schema.columns "
            "WHERE table_name='staging_time_entries' ORDER BY ordinal_position"
        ).fetchall()
    ]
    assert before == after
    # drifted frame (column renamed away) errors and leaves rows intact
    drifted = staging.withColumnRenamed("v", "v_renamed")
    with pytest.raises(Exception):
        upload_staging_truncate(con, drifted, "staging_time_entries")
    assert (
        con.sql("SELECT COUNT(*) FROM staging_time_entries").fetchone()[0] == 2
    )
    con.close()


def test_insert_is_name_matched_not_positional(spark):
    """The explicit column list makes the INSERT name-matched: a fact
    table created with a different column order still receives values
    in the right columns (positional SELECT * would transpose)."""
    fact, staging = _fixture(spark)
    con = duckdb.connect()
    # fact with permuted column order vs staging
    con.execute(
        "CREATE TABLE fact_time_entries "
        "(v DOUBLE, id VARCHAR, start_date_oslo DATE)"
    )
    upload_staging_truncate(con, staging, "staging_time_entries")
    apply_statements(
        con,
        merge_refresh_statements(
            "fact_time_entries", "staging_time_entries", LO, HI, columns=COLS
        ),
    )
    got = sorted(
        map(tuple, con.sql(
            "SELECT id, start_date_oslo, v FROM fact_time_entries"
        ).fetchall())
    )
    assert ("id2", dt.date(2024, 6, 1), 2.0) in got
    con.close()


def test_staging_key_uniqueness_guard(spark):
    from hours_api_clickup_spark.sinks.warehouse import (
        check_staging_key_unique,
    )

    fact, staging = _fixture(spark)
    con = _warehouse(fact, staging)
    check_staging_key_unique(con, "staging_time_entries", key="id")  # ok
    dup = staging.union(staging.limit(1))
    upload_staging_truncate(con, dup, "staging_time_entries")
    with pytest.raises(ValueError, match="not unique"):
        check_staging_key_unique(con, "staging_time_entries", key="id")
    con.close()


def test_bigquery_merge_text_matches_reference_shape():
    sql = bigquery_merge_refresh_sql("p", "d", "fact_t", "staging_t")
    # the three branches, the Oslo-anchored window, the @days parameter
    assert "WHEN MATCHED THEN UPDATE SET" in sql
    assert "WHEN NOT MATCHED THEN" in sql and "INSERT ROW" in sql
    assert "WHEN NOT MATCHED BY SOURCE" in sql and "THEN DELETE" in sql
    assert 'CURRENT_DATE("Europe/Oslo")' in sql
    assert "DECLARE refresh_days INT64 DEFAULT @days" in sql
    # every non-key staging column is SET (the reference enumerates all
    # 30 by hand, fetch_clickup_data.py:1279-1311); `at` is backquoted
    assert len(MERGE_COLUMNS) == 31
    for c in MERGE_COLUMNS:
        if c != "id":
            probe = "`at` = S.`at`" if c == "at" else f"{c} = S.{c}"
            assert probe in sql, c
    full = bigquery_merge_full_reindex_sql("p", "d", "fact_t", "staging_t")
    assert "WHEN NOT MATCHED BY SOURCE THEN" in full
    assert full.count("S.`at`") == 2  # SET and VALUES lists
    assert "INSERT (" in full and "VALUES (" in full
