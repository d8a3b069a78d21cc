"""Include/exclude filters — the reference's Selectors/RelationalTableFilters
(``relational/Selectors.java``, applied at ``EventDispatcher.java:235-239``)
and skipped-operations (``CommonConnectorConfig.java:419``, enforced at
``EventDispatcher.java:266-273``) as Catalyst predicates (pushdown-friendly:
apply before any UDF or shuffle)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_include(env: DataFrame, include_regex: str | None = None, exclude_regex: str | None = None) -> DataFrame:
    """Regex allow/deny on fully-qualified ``db.table``. Patterns match
    the FULL name (Debezium ``Selectors`` semantics — anchored here, so
    ``inventory.orders`` cannot also keep ``inventory.orders_audit`` or
    ``myinventory.orders`` the way a bare substring ``rlike`` would;
    final review r5). Already-anchored patterns stay equivalent under
    the extra wrap."""
    fq = F.concat_ws(".", F.col("source.db"), F.col("source.table"))
    if include_regex:
        env = env.filter(fq.rlike(f"^(?:{include_regex})$"))
    if exclude_regex:
        env = env.filter(~fq.rlike(f"^(?:{exclude_regex})$"))
    return env


def skipped_operations(env: DataFrame, skipped: list[str]) -> DataFrame:
    """Drop configured op types (e.g. no deletes). NULL-op rows are NOT
    "configured to skip" — three-valued ``isin`` would silently drop them
    here, BEFORE the engine's quarantine probe, violating 'one bad row
    never wedges OR vanishes' (final review r5); they pass through and
    quarantine downstream as ``unknown_op``."""
    return env.filter(~F.coalesce(F.col("op").isin(skipped), F.lit(False)))


def column_exclude(env: DataFrame, cols: list[str], scope_pred=None) -> DataFrame:
    """Per-column projection filter (column.exclude.list,
    TableSchemaBuilder.java:147-153) — drops fields from both payloads.

    With ``scope_pred`` (a row predicate on source.db/source.table) the
    schema cannot vary per row, so matching rows get the field NULLed
    instead of dropped — the value is removed, the slot stays. Per-table
    chains (MultiTableEngine / build_engine(db=, table=)) resolve the scope
    at chain-build time and take the true schema-level drop."""
    out = env
    for c in cols:
        for side in ("after", "before"):
            struct_t = out.schema[side].dataType
            if c not in struct_t.fieldNames():
                continue
            if scope_pred is None:
                out = out.withColumn(
                    side, F.when(F.col(side).isNotNull(), F.col(side).dropFields(c))
                )
            else:
                ftype = struct_t[c].dataType
                nulled = F.col(side).withField(c, F.lit(None).cast(ftype))
                out = out.withColumn(
                    side,
                    F.when(
                        F.col(side).isNotNull() & scope_pred, nulled
                    ).otherwise(F.col(side)),
                )
    return out


def snapshot_row_filter(df: DataFrame, where_expr: str) -> DataFrame:
    """snapshot.select.statement.overrides — per-table WHERE applied at the
    bootstrap read (RelationalSnapshotChangeEventSource.java:601-658)."""
    return df.filter(F.expr(where_expr))
