"""Include/exclude filters — the reference's Selectors/RelationalTableFilters
(``relational/Selectors.java``, applied at ``EventDispatcher.java:235-239``)
and skipped-operations (``CommonConnectorConfig.java:419``, enforced at
``EventDispatcher.java:266-273``) as Catalyst predicates (pushdown-friendly:
apply before any UDF or shuffle)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_include(env: DataFrame, include_regex: str | None = None, exclude_regex: str | None = None) -> DataFrame:
    """Regex allow/deny on fully-qualified ``db.table``."""
    fq = F.concat_ws(".", F.col("source.db"), F.col("source.table"))
    if include_regex:
        env = env.filter(fq.rlike(include_regex))
    if exclude_regex:
        env = env.filter(~fq.rlike(exclude_regex))
    return env


def skipped_operations(env: DataFrame, skipped: list[str]) -> DataFrame:
    """Drop configured op types (e.g. no deletes)."""
    return env.filter(~F.col("op").isin(skipped))


def column_exclude(env: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column projection filter (column.exclude.list,
    TableSchemaBuilder.java:147-153) — drops fields from both payloads."""
    out = env
    for c in cols:
        out = out.withColumn(
            "after", F.when(F.col("after").isNotNull(), F.col("after").dropFields(c))
        ).withColumn(
            "before", F.when(F.col("before").isNotNull(), F.col("before").dropFields(c))
        )
    return out


def snapshot_row_filter(df: DataFrame, where_expr: str) -> DataFrame:
    """snapshot.select.statement.overrides — per-table WHERE applied at the
    bootstrap read (RelationalSnapshotChangeEventSource.java:601-658)."""
    return df.filter(F.expr(where_expr))
