from debezium_spark.functions.core import (
    content_sha256,
    row_digest,
    salted_key,
    table_digest_agg,
)

__all__ = ["content_sha256", "row_digest", "salted_key", "table_digest_agg"]
