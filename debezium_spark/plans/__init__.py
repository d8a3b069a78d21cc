from debezium_spark.plans.table import LakeTable

__all__ = ["LakeTable"]
