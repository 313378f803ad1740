"""Explicit StructTypes for every table the engine materializes.

The reference pins BigQuery schemas by hand after being burned by type
inference ("especially FLOAT for arr",
``/root/reference/fetch_clickup_data.py:1096-1106``). We follow suit:
every DataFrame this engine creates carries an explicit schema; no
inference anywhere.

Sources (reference file:line):
- fact/staging time entries: ``fetch_clickup_data.py:1215-1247,1410-1442``
- dim_lists:    ``fetch_clickup_data.py:958-965``
- dim_tasks:    ``fetch_clickup_data.py:1014-1028``
- dim_accounts: ``fetch_clickup_data.py:1077-1086``
- dim_apps:     ``fetch_clickup_data.py:1148-1156``
- nested raw time entry: ``fetch_clickup_data.py:807-855``
- nested raw task:       ``fetch_clickup_data.py:431-456,546-558,737-748``
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --------------------------------------------------------------------------
# Nested raw input schemas (API-shaped). The reference flattens these
# row-at-a-time in Python (fetch_clickup_data.py:803-926); we keep them as
# real nested StructTypes and flatten with one declarative select().
# --------------------------------------------------------------------------

TASK_STATUS_STRUCT = StructType(
    [
        StructField("status", StringType()),
        StructField("color", StringType()),
        StructField("type", StringType()),
        # orderindex arrives as string sometimes (fetch_clickup_data.py:839)
        StructField("orderindex", StringType()),
    ]
)

RAW_TIME_ENTRY_SCHEMA = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("start", StringType()),  # epoch ms, sometimes non-numeric
        StructField("end", StringType()),
        StructField("duration", StringType()),
        StructField("at", StringType()),
        StructField("billable", StringType()),  # bool/str/num mixed → safe_bool
        StructField("is_locked", StringType()),
        StructField("description", StringType()),
        StructField("source", StringType()),
        StructField("approval_id", StringType()),
        StructField("task_url", StringType()),
        StructField(
            "task",
            StructType(
                [
                    StructField("id", StringType()),
                    StructField("name", StringType()),
                    StructField("custom_type", StringType()),
                    StructField("custom_id", StringType()),
                    StructField("status", TASK_STATUS_STRUCT),
                ]
            ),
        ),
        StructField(
            "user",
            StructType(
                [
                    StructField("id", StringType()),
                    StructField("username", StringType()),
                    StructField("email", StringType()),
                    StructField("color", StringType()),
                    StructField("initials", StringType()),
                    StructField("profilePicture", StringType()),
                ]
            ),
        ),
        StructField(
            "task_location",
            StructType(
                [
                    StructField("list_id", StringType()),
                    StructField("folder_id", StringType()),
                    StructField("space_id", StringType()),
                ]
            ),
        ),
    ]
)

CUSTOM_FIELD_STRUCT = StructType(
    [
        StructField("id", StringType()),  # field UUID
        StructField("value", StringType()),  # scalar/CSV-text variants
        # array-of-linked-task variant (fetch_clickup_data.py:742-748)
        StructField(
            "value_links",
            ArrayType(StructType([StructField("id", StringType())])),
        ),
    ]
)

RAW_TASK_SCHEMA = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("name", StringType()),
        StructField(
            "status",
            StructType(
                [StructField("status", StringType()), StructField("type", StringType())]
            ),
        ),
        StructField("time_estimate", LongType()),  # ms, nullable
        StructField("url", StringType()),
        StructField("archived", BooleanType()),
        StructField("custom_item_id", LongType()),
        StructField("custom_fields", ArrayType(CUSTOM_FIELD_STRUCT)),
        StructField(
            "assignees",
            ArrayType(StructType([StructField("username", StringType())])),
        ),
        StructField("date_created", StringType()),  # epoch ms as string
        StructField("list_id", StringType()),
        StructField("list_name", StringType()),
        StructField("folder_id", StringType()),
        StructField("folder_name", StringType()),
        StructField("space_id", StringType()),
        StructField("space_name", StringType()),
    ]
)

# --------------------------------------------------------------------------
# Flat materialized tables (the star schema)
# --------------------------------------------------------------------------

FACT_TIME_ENTRIES_SCHEMA = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("start_utc", TimestampType()),
        StructField("end_utc", TimestampType()),
        StructField("duration_ms", LongType()),
        StructField("duration_hours", DoubleType()),
        StructField("billable", BooleanType()),
        StructField("description", StringType()),
        StructField("source", StringType()),
        StructField("at", TimestampType()),
        StructField("is_locked", BooleanType()),
        StructField("approval_id", StringType()),
        StructField("task_url", StringType()),
        StructField("task_id", StringType()),
        StructField("task_name", StringType()),
        StructField("task_custom_type", StringType()),
        StructField("task_custom_id", StringType()),
        StructField("task_status_status", StringType()),
        StructField("task_status_color", StringType()),
        StructField("task_status_type", StringType()),
        StructField("task_status_orderindex", LongType()),
        StructField("user_id", StringType()),
        StructField("user_username", StringType()),
        StructField("user_email", StringType()),
        StructField("user_email_sha256", StringType()),
        StructField("user_color", StringType()),
        StructField("user_initials", StringType()),
        StructField("user_profilePicture", StringType()),
        StructField("task_location_list_id", StringType()),
        StructField("task_location_folder_id", StringType()),
        StructField("task_location_space_id", StringType()),
        StructField("start_date_oslo", DateType()),
    ]
)

STAGING_TIME_ENTRIES_SCHEMA = FACT_TIME_ENTRIES_SCHEMA

DIM_LISTS_SCHEMA = StructType(
    [
        StructField("space_id", StringType(), nullable=False),
        StructField("space_name", StringType(), nullable=False),
        StructField("folder_id", StringType()),  # '' when folder-less
        StructField("folder_name", StringType()),
        StructField("list_id", StringType(), nullable=False),
        StructField("list_name", StringType(), nullable=False),
    ]
)

DIM_TASKS_SCHEMA = StructType(
    [
        StructField("space_id", StringType(), nullable=False),
        StructField("space_name", StringType(), nullable=False),
        StructField("folder_id", StringType()),
        StructField("folder_name", StringType()),
        StructField("list_id", StringType(), nullable=False),
        StructField("list_name", StringType(), nullable=False),
        StructField("task_id", StringType(), nullable=False),
        StructField("task_name", StringType()),
        StructField("status", StringType()),
        StructField("time_estimate_hrs", DoubleType()),
        StructField("url", StringType()),
        StructField("closed", BooleanType()),
        StructField("archived", BooleanType()),
    ]
)

DIM_ACCOUNTS_SCHEMA = StructType(
    [
        StructField("account_task_id", StringType(), nullable=False),
        StructField("account_name", StringType()),
        StructField("connected_list_id", StringType()),  # '' when none
        StructField("hours_discount", DoubleType()),
        StructField("status", StringType()),
        StructField("date_created", TimestampType()),
        StructField("assignees", StringType()),  # ', '-joined
        StructField("arr", DoubleType()),
    ]
)

DIM_APPS_SCHEMA = StructType(
    [
        StructField("task_id", StringType(), nullable=False),
        StructField("application_name", StringType()),
        StructField("account_task_ids", StringType()),  # ', '-joined, '' when none
        StructField("arr", DoubleType()),
        StructField("last_updated", TimestampType()),
        StructField("status", StringType()),
        StructField("maintenance", BooleanType()),
    ]
)
