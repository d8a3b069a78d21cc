from debezium_spark.operators.apply import compute_changes, split_pk_changes
from debezium_spark.operators.flatten import extract_new_record_state
from debezium_spark.operators.filters import (
    column_exclude,
    skipped_operations,
    snapshot_row_filter,
    table_include,
)
from debezium_spark.operators.masking import hash_mask_column, mask_column, truncate_column
from debezium_spark.operators.outbox import outbox_route
from debezium_spark.operators.quarantine import read_quarantine, split_valid
from debezium_spark.operators.routing import (
    by_logical_table_router,
    content_based_router,
    topic_for,
)
from debezium_spark.operators.tombstones import with_tombstones
from debezium_spark.operators.transactions import stamp_transaction, transaction_summary

__all__ = [
    "compute_changes",
    "split_pk_changes",
    "extract_new_record_state",
    "table_include",
    "column_exclude",
    "skipped_operations",
    "snapshot_row_filter",
    "mask_column",
    "hash_mask_column",
    "truncate_column",
    "outbox_route",
    "split_valid",
    "read_quarantine",
    "topic_for",
    "by_logical_table_router",
    "content_based_router",
    "with_tombstones",
    "stamp_transaction",
    "transaction_summary",
]
