"""Forward-migration DDL translation (MySQL source → openGauss target).

The reference replays MySQL DDL nearly verbatim — openGauss B-compatibility
accepts MySQL syntax — but rectifies identifiers before handing the text to
the target (``debezium-connector-mysql/sink/replay/ReplayTask.java:274-380``
constructDdl / rectifyForeignRelyDdl / ignoreSchemaName):

1. every DDL is preceded by ``set current_schema to <sink_schema>;`` where
   the sink schema comes from the source→sink schema mapping;
2. ``FOREIGN KEY … REFERENCES`` clauses remap the referenced table's schema
   through the mapping and re-wrap both parts in the target quote (a
   reference to an unmapped schema drops the statement — the reference logs
   and skips it);
3. ``ALTER TABLE s.t RENAME TO …`` strips the schema from the old name;
4. ``DROP TABLE`` strips the `` `schema`. `` prefix;
5. any other table-scoped DDL replaces the FIRST occurrence of the
   ``schema.table`` qualifier (any of the four backquote combinations) with
   the bare backquoted table name — the ``set current_schema`` prelude
   supplies the schema.

DDL events are control-plane (one per schema change, not per row), so the
scalar function is the contract and the Arrow-batched wrapper exists only
for bulk replay of schema-change topics.
"""

from __future__ import annotations

from typing import Iterator, Mapping

from pyspark.sql import DataFrame


def _backquoted(name: str) -> str:
    return f"`{name}`"


def _strip_backquote(name: str) -> str:
    if len(name) >= 2 and name[0] == "`" and name[-1] == "`":
        return name[1:-1]
    return name


def _rectify_foreign_rely(
    ddl: str, source_schema: str, schema_mapping: Mapping[str, str]
) -> str | None:
    """``ReplayTask.rectifyForeignRelyDdl:330-370`` — remap the REFERENCES
    target. Returns None when the referenced schema has no mapping (the
    reference skips the DDL)."""
    low = ddl.lower()
    if not (
        (low.startswith("alter table") or low.startswith("create table"))
        and "foreign key" in low
        and "references" in low
    ):
        return ddl
    index = low.index("references")
    prefix, suffix = ddl[:index], ddl[index + len("references"):]
    if len(suffix.split(".")) > 1:
        old_schema = _strip_backquote(suffix.split(".")[0].strip())
        if old_schema not in schema_mapping:
            return None
        suffix = suffix.replace(old_schema, schema_mapping[old_schema], 1)
        head = suffix[: suffix.rindex("(")].strip()
        schema_part, table_part = head.split(".")[0], head.split(".")[1]
        suffix = suffix.replace(schema_part, f'"{_strip_backquote(schema_part)}"')
        suffix = suffix.replace(table_part, f'"{_strip_backquote(table_part)}"')
    else:
        ref_table = suffix.strip()[: suffix.strip().rindex("(")]
        suffix = suffix.replace(ref_table, f'"{_strip_backquote(ref_table)}"')
    return f"{prefix} references {suffix}"


def _ignore_schema_name(ddl: str, schema: str, table: str) -> str:
    """``ReplayTask.ignoreSchemaName:371-380`` — first ``schema.table``
    qualifier (4 quote combos) → bare backquoted table."""
    for name in (
        f"{schema}.{table}",
        f"{_backquoted(schema)}.{table}",
        f"{schema}.{_backquoted(table)}",
        f"{_backquoted(schema)}.{_backquoted(table)}",
    ):
        if name in ddl:
            return ddl.replace(name, _backquoted(table), 1)
    return ddl


def translate_ddl(
    ddl: str,
    source_schema: str,
    table: str | None,
    schema_mapping: Mapping[str, str],
) -> list[str]:
    """One source DDL event → the ordered statement list the sink applies.

    Returns ``[]`` when the statement must be skipped (unmapped FK schema).
    ``table`` is the source event's table field; schema-scoped DDL (empty
    table) passes through untouched after the prelude —
    ``ReplayTask.constructDdl:274-320``.
    """
    sink_schema = schema_mapping.get(source_schema, source_schema)
    statements = [f"set current_schema to {sink_schema};"]
    if not table:
        statements.append(ddl)
        return statements

    rectified = _rectify_foreign_rely(ddl, source_schema, schema_mapping)
    if rectified is None:
        return []
    ddl = rectified
    low = ddl.lower()
    if low.startswith("alter table") and "rename to" in low and "`rename to" not in low:
        pre = low.index("table")
        post = low.index("rename")
        old_full = ddl[pre + 6: post].strip()
        if len(old_full.split(".")) == 2:
            ddl = ddl.replace(old_full, old_full.split(".")[1], 1)
    elif low.startswith("drop table"):
        ddl = ddl.replace(f"{_backquoted(source_schema)}.", "", 1)
    else:
        ddl = _ignore_schema_name(ddl, source_schema, table)
    statements.append(ddl)
    return statements


def translate_ddl_batch(
    df: DataFrame, schema_mapping: Mapping[str, str]
) -> DataFrame:
    """Bulk path: rows of (ddl, db, tbl) → exploded (seq, stmt) per event,
    Arrow-batched like the wire codecs. ``seq`` preserves the per-event
    statement order (prelude before DDL)."""
    mapping = dict(schema_mapping)

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"ddl": [], "db": [], "tbl": [], "seq": [], "stmt": []}
            for ddl, db, tbl in zip(pdf["ddl"], pdf["db"], pdf["tbl"]):
                stmts = translate_ddl(
                    ddl, db, None if tbl is None or tbl == "" else tbl, mapping
                )
                for i, s in enumerate(stmts):
                    out["ddl"].append(ddl)
                    out["db"].append(db)
                    out["tbl"].append(tbl)
                    out["seq"].append(i)
                    out["stmt"].append(s)
            yield pd.DataFrame(out)

    return df.select("ddl", "db", "tbl").mapInPandas(
        gen, "ddl string, db string, tbl string, seq int, stmt string"
    )
