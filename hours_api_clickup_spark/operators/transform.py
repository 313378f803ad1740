"""The flagship wide-flattening projection (P1-P11).

The reference flattens one nested time-entry dict into 31 flat typed
columns row-at-a-time in Python (``transform_time_entry``,
``fetch_clickup_data.py:803-926``). Here the same mapping is ONE
declarative ``select()`` over a nested-struct DataFrame — Catalyst turns
it into a single whole-stage-codegen projection, vectorized and
column-pruned; at 100 TB this is a scan+project with zero shuffles.

Per-row error tolerance (``fetch_clickup_data.py:891-926`` catches any
exception and emits a minimal all-null row keeping ``id``) is subsumed by
null-safe expressions: every cast is a ``try_cast``-style safe function,
so a malformed field nulls that column instead of killing the row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hours_api_clickup_spark.functions.casts import safe_bool, safe_int
from hours_api_clickup_spark.functions.datetime_fns import epoch_ms_to_ts, oslo_date
from hours_api_clickup_spark.functions.hashing import sha256_if_nonempty

MS_PER_HOUR = 3_600_000.0


def _str_or_null(c: Column) -> Column:
    """str(x) if truthy else None (fetch_clickup_data.py:829-832)."""
    s = c.cast("string")
    return F.when((s.isNotNull()) & (s != ""), s)


def _str_or_empty(c: Column) -> Column:
    """Reference ``.get(key, '')`` semantics: '' when absent
    (fetch_clickup_data.py:831-849 — task_name, the status triple, the
    user string fields, description/source/task_url all default to '').
    A struct field that is null and a key that is missing are the same
    thing in a columnar world, so both map to '' — the one (documented)
    deviation is a key *present with an explicit null*, which dict.get
    would pass through as None and this maps to '' as well."""
    s = c.cast("string")
    return F.coalesce(s, F.lit(""))


def transform_time_entries(raw: DataFrame) -> DataFrame:
    """Nested raw time entries → the 31-column flat fact schema.

    Mirrors ``transform_time_entry`` (fetch_clickup_data.py:803-926)
    column for column; see schemas.FACT_TIME_ENTRIES_SCHEMA.
    """
    start_ts = epoch_ms_to_ts("start")
    duration_ms = safe_int("duration")
    return raw.select(
        F.col("id").cast("string").alias("id"),
        start_ts.alias("start_utc"),
        epoch_ms_to_ts("end").alias("end_utc"),
        duration_ms.alias("duration_ms"),
        # duration_hours: 0.0 when duration falsy/null (fetch_clickup_data.py:820)
        F.coalesce(duration_ms / F.lit(MS_PER_HOUR), F.lit(0.0)).alias(
            "duration_hours"
        ),
        safe_bool("billable").alias("billable"),
        _str_or_empty(F.col("description")).alias("description"),
        _str_or_empty(F.col("source")).alias("source"),
        epoch_ms_to_ts("at").alias("at"),
        safe_bool("is_locked").alias("is_locked"),
        _str_or_null(F.col("approval_id")).alias("approval_id"),
        _str_or_empty(F.col("task_url")).alias("task_url"),
        # nested-struct access (P2, fetch_clickup_data.py:827-855)
        _str_or_null(F.col("task.id")).alias("task_id"),
        _str_or_empty(F.col("task.name")).alias("task_name"),
        F.col("task.custom_type").cast("string").alias("task_custom_type"),
        F.col("task.custom_id").cast("string").alias("task_custom_id"),
        _str_or_empty(F.col("task.status.status")).alias("task_status_status"),
        _str_or_empty(F.col("task.status.color")).alias("task_status_color"),
        _str_or_empty(F.col("task.status.type")).alias("task_status_type"),
        safe_int(F.col("task.status.orderindex")).alias("task_status_orderindex"),
        _str_or_null(F.col("user.id")).alias("user_id"),
        _str_or_empty(F.col("user.username")).alias("user_username"),
        _str_or_empty(F.col("user.email")).alias("user_email"),
        # SHA-256 of email, null when empty (P7, fetch_clickup_data.py:846)
        sha256_if_nonempty(F.col("user.email")).alias("user_email_sha256"),
        _str_or_empty(F.col("user.color")).alias("user_color"),
        _str_or_empty(F.col("user.initials")).alias("user_initials"),
        _str_or_empty(F.col("user.profilePicture")).alias("user_profilePicture"),
        _str_or_null(F.col("task_location.list_id")).alias("task_location_list_id"),
        _str_or_null(F.col("task_location.folder_id")).alias(
            "task_location_folder_id"
        ),
        _str_or_null(F.col("task_location.space_id")).alias("task_location_space_id"),
        # Europe/Oslo civil date (P6, fetch_clickup_data.py:822-825)
        oslo_date(start_ts).alias("start_date_oslo"),
    )
