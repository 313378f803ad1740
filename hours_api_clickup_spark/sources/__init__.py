from hours_api_clickup_spark.sources.chunks import month_windows, window_chunks
from hours_api_clickup_spark.sources.pagination import (
    PagePolicy,
    paginate,
)
from hours_api_clickup_spark.sources.readers import (
    read_json_fixture,
    read_raw_tasks,
    read_raw_time_entries,
)
from hours_api_clickup_spark.sources.rest import RetryPolicy, fetch_with_retry

__all__ = [
    "window_chunks",
    "month_windows",
    "paginate",
    "PagePolicy",
    "read_json_fixture",
    "read_raw_time_entries",
    "read_raw_tasks",
    "RetryPolicy",
    "fetch_with_retry",
]
