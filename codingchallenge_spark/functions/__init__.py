from codingchallenge_spark.functions.normalize import (
    content_sha,
    name_norm,
    normalize_records,
    record_id,
    tokenize,
)

__all__ = [
    "content_sha",
    "name_norm",
    "normalize_records",
    "record_id",
    "tokenize",
]
