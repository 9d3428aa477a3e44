from .hashing import h64, h64_sql, hex_bucket, hex_bucket_sql  # noqa: F401
