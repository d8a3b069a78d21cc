from debezium_spark.sources.batches import list_batches, read_batch

__all__ = ["list_batches", "read_batch"]
