from hours_api_clickup_spark.functions.casts import safe_bool, safe_float, safe_int
from hours_api_clickup_spark.functions.datetime_fns import (
    OSLO_TZ,
    epoch_ms_to_ts,
    local_civil_date,
    oslo_date,
)
from hours_api_clickup_spark.functions.hashing import (
    rolling_fingerprint,
    sha256_if_nonempty,
)

__all__ = [
    "safe_bool",
    "safe_int",
    "safe_float",
    "epoch_ms_to_ts",
    "oslo_date",
    "local_civil_date",
    "OSLO_TZ",
    "sha256_if_nonempty",
    "rolling_fingerprint",
]
