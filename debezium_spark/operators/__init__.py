from debezium_spark.operators.apply import compute_changes, split_pk_changes
from debezium_spark.operators.flatten import extract_new_record_state
from debezium_spark.operators.filters import (
    column_exclude,
    skipped_operations,
    table_include,
)
from debezium_spark.operators.masking import mask_column, truncate_column
from debezium_spark.operators.routing import (
    by_logical_table_router,
    content_based_router,
    topic_for,
)
from debezium_spark.operators.tombstones import with_tombstones

__all__ = [
    "compute_changes",
    "split_pk_changes",
    "extract_new_record_state",
    "table_include",
    "column_exclude",
    "skipped_operations",
    "mask_column",
    "truncate_column",
    "topic_for",
    "by_logical_table_router",
    "content_based_router",
    "with_tombstones",
]
