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

import re
from typing import Iterator, Mapping

from pyspark.sql import DataFrame


def _backquoted(name: str) -> str:
    return f"`{name}`"


#: the table reference immediately after REFERENCES: `q`.`q` / `q`.bare /
#: bare.`q` / bare.bare / `q` / bare — ONLY the leading identifier tokens,
#: so a '.' later in the statement (a decimal default, a second column, a
#: comment) can never be mistaken for a schema qualifier.
_REF_TABLE = re.compile(
    r"\s*(?P<first>`[^`]+`|[\w$]+)(?:\s*\.\s*(?P<second>`[^`]+`|[\w$]+))?"
)


def _strip_backquote(name: str) -> str:
    if len(name) >= 2 and name[0] == "`" and name[-1] == "`":
        return name[1:-1]
    return name


def _mask_quoted(low: str) -> str:
    """Quoted spans (backtick / single / double, doubling-escape aware) →
    spaces, same length, so keyword searches can never anchor inside an
    identifier or string literal (e.g. a column named ``references``).
    Positions in the mask map 1:1 onto the original."""
    out = list(low)
    i, n = 0, len(low)
    while i < n:
        c = low[i]
        if c in ("`", "'", '"'):
            j = i + 1
            while j < n:
                if low[j] == c:
                    if j + 1 < n and low[j + 1] == c:  # doubled = literal
                        j += 2
                        continue
                    break
                j += 1
            for k in range(i, min(j + 1, n)):
                out[k] = " "
            i = j + 1
        else:
            i += 1
    return "".join(out)


def _rectify_foreign_rely(
    ddl: str, source_schema: str, schema_mapping: Mapping[str, str]
) -> str | None:
    """``ReplayTask.rectifyForeignRelyDdl:330-370`` — remap EVERY
    ``FOREIGN KEY … REFERENCES`` target through the schema mapping (a
    CREATE TABLE may declare several foreign keys; rewriting only the
    first ships later clauses with the unmapped source schema — final
    review r5). Returns None when any referenced schema has no mapping
    (the reference skips the DDL)."""
    low = ddl.lower()
    if not (low.startswith("alter table") or low.startswith("create table")):
        return ddl
    parts: list[str] = []
    cur = ddl
    while True:
        # keyword matches run against a quote-masked copy (same length,
        # same positions) so an identifier or literal containing
        # "references" or "foreign key" can never anchor the clause; the
        # REFERENCES keyword is whole-word and must follow a FOREIGN KEY
        # that is itself unquoted (a column-level REFERENCES with no
        # preceding FOREIGN KEY passes through, as before)
        masked = _mask_quoted(cur.lower())
        kw = None
        for cand in re.finditer(r"\breferences\b", masked):
            if masked.rfind("foreign key", 0, cand.start()) != -1:
                kw = cand
                break
        if kw is None:
            parts.append(cur)
            return "".join(parts)
        suffix = cur[kw.end():]
        m = _REF_TABLE.match(suffix)
        if m is None:  # nothing identifier-like follows REFERENCES
            parts.append(cur[: kw.end()])
            cur = suffix
            continue
        if m.group("second") is not None:
            old_schema = _strip_backquote(m.group("first"))
            if old_schema not in schema_mapping:
                return None
            head = (
                f'"{schema_mapping[old_schema]}"'
                f'."{_strip_backquote(m.group("second"))}"'
            )
        else:
            head = f'"{_strip_backquote(m.group("first"))}"'
        parts.append(f"{cur[: kw.start()]}references {head}")
        cur = suffix[m.end():]


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
    # RENAME TO anchors on the quote-masked whole-word keyword, not a
    # substring scan — a schema/table name CONTAINING "rename" (quoted or
    # not, e.g. `alter table renamedb.t rename to t2`) must not truncate
    # the old-name span (final review r5: low.index("rename") hit the
    # identifier and left the schema qualifier unstripped)
    _masked = _mask_quoted(low)
    _rn = re.search(r"\brename\s+to\b", _masked)
    if low.startswith("alter table") and _rn is not None:
        pre = _masked.index("table")
        old_full = ddl[pre + 6: _rn.start()].strip()
        if len(old_full.split(".")) == 2:
            ddl = ddl.replace(old_full, old_full.split(".")[1], 1)
    elif low.startswith("drop table"):
        # strip the schema qualifier whether or not it is backquoted — the
        # set current_schema prelude supplies it on the target
        for prefix in (f"{_backquoted(source_schema)}.", f"{source_schema}."):
            if prefix in ddl:
                ddl = ddl.replace(prefix, "", 1)
                break
    else:
        ddl = _ignore_schema_name(ddl, source_schema, table)
    statements.append(ddl)
    return statements


def iter_translations(
    ddls, dbs, tbls, mapping: Mapping[str, str]
):
    """Shared explode loop over parallel (ddl, db, tbl) sequences → yields
    ``(row_index, seq, stmt)`` — the single place the per-event statement
    expansion semantics live (empty/None ddl text is skipped: an op='l'
    record with no payload carries nothing to replay)."""
    for i, (ddl, db, tbl) in enumerate(zip(ddls, dbs, tbls)):
        if not ddl:
            continue
        stmts = translate_ddl(
            ddl, db, None if tbl is None or tbl == "" else tbl, mapping
        )
        for seq, s in enumerate(stmts):
            yield i, seq, s


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
            for i, seq, s in iter_translations(
                pdf["ddl"], pdf["db"], pdf["tbl"], mapping
            ):
                out["ddl"].append(pdf["ddl"].iloc[i])
                out["db"].append(pdf["db"].iloc[i])
                out["tbl"].append(pdf["tbl"].iloc[i])
                out["seq"].append(seq)
                out["stmt"].append(s)
            yield pd.DataFrame(out)

    return df.select("ddl", "db", "tbl").mapInPandas(
        gen, "ddl string, db string, tbl string, seq int, stmt string"
    )
