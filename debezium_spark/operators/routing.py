"""Routing operators — the "shuffle" of the reference system.

- ``topic_for``: TopicSelector (``schema/TopicSelector.java:39-92``) —
  ``prefix.db.table`` naming.
- ``by_logical_table_router``: ByLogicalTableRouter
  (``transforms/ByLogicalTableRouter.java:55-106``) — regex re-route to merge
  sharded physical tables into one logical table.
- ``content_based_router``: debezium-scripting ContentBasedRouter — routing
  decided by an expression over the record; here an ANSI SQL expression
  (Catalyst ``F.expr``) instead of JSR-223 Groovy/JS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def topic_for(env: DataFrame, prefix: str) -> DataFrame:
    return env.withColumn(
        "topic", F.concat_ws(".", F.lit(prefix), F.col("source.db"), F.col("source.table"))
    )


def by_logical_table_router(env: DataFrame, pattern: str, replacement: str) -> DataFrame:
    """Rewrite source.table by regex (shard merge); the original physical
    table is preserved in __dbz__physicalTableIdentifier per the reference."""
    return env.withColumn(
        "__dbz__physicalTableIdentifier", F.col("source.table")
    ).withColumn(
        "source",
        F.col("source").withField(
            "table", F.regexp_replace(F.col("source.table"), pattern, replacement)
        ),
    )


def content_based_router(env: DataFrame, route_expr: str) -> DataFrame:
    """route = <sql expression over the envelope row>."""
    return env.withColumn("route", F.expr(route_expr))
