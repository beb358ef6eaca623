from tagminder_spark.functions.core import (
    MV_DELIM,
    album_root,
    blank_to_null,
    is_blank,
    md5_invalid,
    mv_join,
    mv_tokens,
    truthy,
)
from tagminder_spark.functions.dates import (
    decade,
    epoch_to_ts,
    normalize_date,
    normalize_year,
)

__all__ = [
    "MV_DELIM",
    "album_root",
    "blank_to_null",
    "is_blank",
    "md5_invalid",
    "mv_join",
    "mv_tokens",
    "truthy",
    "decade",
    "epoch_to_ts",
    "normalize_date",
    "normalize_year",
]
