from .io import (
    read_csv,
    read_parquet,
    write_bucketed,
    write_csv,
    write_parquet,
    cached,
    normalize_object_store_uri,
)

__all__ = [
    "read_csv",
    "read_parquet",
    "write_bucketed",
    "write_csv",
    "write_parquet",
    "cached",
    "normalize_object_store_uri",
]
