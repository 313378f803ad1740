from hours_api_clickup_spark.operators.dedupe import dedupe_latest
from hours_api_clickup_spark.operators.explode import (
    joined_ids_from_links,
    joined_usernames,
    split_explode_with_empty,
)
from hours_api_clickup_spark.operators.merge import (
    merge_full_reindex,
    merge_refresh,
)
from hours_api_clickup_spark.operators.transform import transform_time_entries

__all__ = [
    "transform_time_entries",
    "dedupe_latest",
    "merge_refresh",
    "merge_full_reindex",
    "split_explode_with_empty",
    "joined_ids_from_links",
    "joined_usernames",
]
