from hours_api_clickup_spark.streaming.refresh import (
    streaming_hours_by_user_day,
    streaming_refresh,
)

__all__ = ["streaming_refresh", "streaming_hours_by_user_day"]
