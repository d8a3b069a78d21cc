from debezium_spark.streaming.engine import CdcEngine

__all__ = ["CdcEngine"]
