from debezium_spark.streaming.engine import CdcEngine
from debezium_spark.streaming.progress import ProcessCommitter

__all__ = ["CdcEngine", "ProcessCommitter"]
