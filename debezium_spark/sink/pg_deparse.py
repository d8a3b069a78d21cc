"""Reverse-migration DDL: expand PostgreSQL/openGauss ``ddl_deparse`` JSON.

openGauss emits DDL through the event-trigger deparse machinery as a JSON
tree whose nodes carry a ``fmt`` template with conversion specifiers —
``%{param}I`` (identifier), ``%{param}D`` (dotted name), ``%{param}s``
(string / nested node), ``%{param}L`` (string literal), ``%{param}T`` (type
name), ``%{param}n`` (number), ``%{param:sep}X`` (array joined by ``sep``),
``%%`` (literal percent). The reference's sink expands this tree back into
SQL text while remapping schemas
(``debezium-connector-opengauss/sink/ddl/OpengaussDdlParser.java:70-420``):
schema names rewrite through the source→sink mapping inside dotted names,
type names, trigger/object identities, ``nextval('schema.seq')`` defaults,
view queries and function signatures; nested nodes with ``present: false``
vanish; the openGauss-only ``NOT FENCED NOT SHIPPABLE`` rides out of
function bodies; a trailing ``;`` is appended and the empty storage clause
``  WITH ()`` is dropped.

This module implements that expansion as a deterministic pure function (the
format is PostgreSQL's public deparse format). DDL is control-plane — one
event per schema change — so the scalar function is the contract and the
Arrow-batched wrapper exists for bulk replay.
"""

from __future__ import annotations

import json
import re
from decimal import Decimal
from typing import Iterator, Mapping

from pyspark.sql import DataFrame

_FUNCTION_PREFIX = "CREATE OR REPLACE FUNCTION "
_FUNCTION_SUFFIX = " RETURNS"
_EMPTY_WITH = "  WITH ()"
_SEQUENCE_PREFIX = "pg_catalog.nextval('"


class DeparseState:
    """Mutable expansion context — the OpengaussDdlParser instance fields."""

    def __init__(self, schema_mapping: Mapping[str, str]):
        self.schema_mapping = dict(schema_mapping)
        self.identifier: str | None = None
        self.old_schema: str | None = None
        self.owner: str | None = None
        self.is_table_refreshed = False

    def map_schema(self, schema: str) -> str:
        return self.schema_mapping.get(schema, schema)


def _quote_identifier(value: str) -> str:
    """``OpengaussDdlParser.quoteIdentifier:215-225`` — wrap in double
    quotes, backslash-escaping ``"`` and ``\\``."""
    out = ['"']
    for ch in value:
        if ch in ('"', "\\"):
            out.append("\\")
        out.append(ch)
    out.append('"')
    return "".join(out)


def _adjust_obj_identity(value: str, st: DeparseState) -> str:
    if " on " in value:  # trigger: "<name> on <schema>.<table>"
        head, full = value.split(" on ", 1)
        parts = full.split(".")
        parts[0] = st.map_schema(parts[0])
        return f"{head} on {'.'.join(parts)}"
    parts = value.split(".")
    st.old_schema = parts[0]
    parts[0] = st.map_schema(parts[0])
    st.identifier = ".".join(parts)
    return st.identifier


def _adjust_function(value: str, st: DeparseState) -> str:
    i = value.index(_FUNCTION_PREFIX) + len(_FUNCTION_PREFIX)
    j = value.index(_FUNCTION_SUFFIX)
    name = value[i:j].strip()
    parts = name.split(".")
    parts[0] = st.map_schema(parts[0])
    return value.replace(name, ".".join(parts)).replace(
        "NOT FENCED NOT SHIPPABLE", ""
    )


def _adjust_field_comment(value: str, st: DeparseState) -> str:
    parts = value.split(".")
    parts[0] = st.map_schema(parts[0])
    return ".".join(parts)


def _adjust_default(value: str, st: DeparseState) -> str:
    if value.startswith(_SEQUENCE_PREFIX) and st.old_schema is not None:
        old = _SEQUENCE_PREFIX + st.old_schema
        new = _SEQUENCE_PREFIX + st.map_schema(st.old_schema)
        return value.replace(old, new)
    return value


def _adjust_view_query(value: str, st: DeparseState) -> str:
    """Remap ``schema.`` qualifiers in a view body through EVERY mapping
    entry. Token-anchored (no match mid-identifier like ``myapp.`` for the
    key ``app``, nor after a ``.`` — that position is a column qualifier);
    known edge: a qualifier-shaped substring inside a string literal in the
    view body is remapped too, as in the reference's plain replace."""
    out = value
    for schema, mapped in st.schema_mapping.items():
        out = re.sub(
            rf'(?<![\w$".]){re.escape(schema)}\.', f"{mapped}.", out
        )
    return out


_ADJUSTERS = {
    "function": _adjust_function,
    "objidentity": _adjust_obj_identity,
    "identity": _adjust_field_comment,
    "default": _adjust_default,
    "query": _adjust_view_query,
}


def _as_json_object(value) -> dict | None:
    if isinstance(value, dict):
        return value
    if isinstance(value, str):
        try:
            parsed = json.loads(value)
        except (ValueError, TypeError):
            return None
        return parsed if isinstance(parsed, dict) else None
    return None


def _expand_dotted_name(out: list[str], key: str, value, st: DeparseState) -> None:
    obj = _as_json_object(value) or {}
    schema = obj.get("schemaname")
    full = []
    if schema:
        mapped = st.map_schema(schema)
        out.append(_quote_identifier(mapped) + ".")
        full.append(mapped)
    objname = obj.get("objname")
    if objname:
        out.append(_quote_identifier(objname))
        full.append(objname)
    if key == "identity":
        st.old_schema = schema
        st.identifier = ".".join(full)
    if key == "owner":
        st.owner = ".".join(full)
    attr = obj.get("attrname")
    if attr:
        out.append("." + _quote_identifier(attr))


def _expand_type_name(out: list[str], value, st: DeparseState) -> None:
    obj = _as_json_object(value) or {}
    decorator = "[]" if obj.get("typarray") else ""
    schema = obj.get("schemaname")
    typename = obj.get("typename") or ""
    if schema is None:
        out.append(_quote_identifier(typename))
    elif schema == "":
        out.append(typename)
    else:
        out.append(f"{st.map_schema(schema)}.{typename}")
    typmod = obj.get("typmod")
    out.append((typmod or "") + decorator)


def _expand_element(
    out: list[str], key: str, value, spec: str, st: DeparseState
) -> bool:
    """Expand one ``%{key}spec`` element; returns False when the element is
    suppressed (``present: false`` or a missing nested node) so array
    expansion can skip it and its separator."""
    if spec == "I":
        out.append(_quote_identifier("" if value is None else str(value)))
    elif spec == "D":
        _expand_dotted_name(out, key, value, st)
    elif spec == "L":
        # %L prints NULL unquoted for a null/absent parameter (PostgreSQL's
        # string_to_text_literal), never the stringified None
        out.append("NULL" if value is None else f"'{value}'")
    elif spec == "T":
        _expand_type_name(out, value, st)
    elif spec == "n":
        out.append(str(Decimal(str(value))))
    else:  # 's'
        obj = _as_json_object(value)
        if obj is not None:
            if obj.get("present") is False:
                return False
            _expand_node(out, obj, st)
            return True
        if value is None:
            return False
        text = str(value)
        if key == "objtype" and text.upper() == "TABLE":
            st.is_table_refreshed = True
        if key in _ADJUSTERS:
            text = _ADJUSTERS[key](text, st)
        out.append(text)
    return True


def _expand_node(out: list[str], node: dict, st: DeparseState) -> None:
    fmt = node.get("fmt")
    if not fmt:
        out.append("''")
        return
    i, end = 0, len(fmt)
    while i < end:
        ch = fmt[i]
        if ch != "%":
            out.append(ch)
            i += 1
            continue
        i += 1
        if i < end and fmt[i] == "%":
            out.append("%")
            i += 1
            continue
        param, sep, is_array = None, None, False
        if i < end and fmt[i] == "{":
            i += 1
            name, septxt, target = [], [], None
            while i < end and fmt[i] != "}":
                if fmt[i] == ":" and target is None:
                    is_array, target = True, septxt
                else:
                    (target if target is not None else name).append(fmt[i])
                i += 1
            i += 1  # past '}'
            param = "".join(name)
            sep = "".join(septxt) if is_array else None
        if param is None or i >= end:
            raise ValueError(f"missing conversion name in fmt {fmt!r}")
        spec = fmt[i]
        i += 1
        if spec not in "IDsLTn":
            raise ValueError(f"invalid conversion specifier {spec!r} in {fmt!r}")
        value = node.get(param)
        if is_array:
            items = value if isinstance(value, list) else []
            first = True
            for item in items:
                piece: list[str] = []
                if _expand_element(piece, param, item, spec, st):
                    if not first:
                        out.append(sep or "")
                    out.extend(piece)
                    first = False
        else:
            _expand_element(out, param, value, spec, st)


def expand_ddl_json(
    json_value: str, schema_mapping: Mapping[str, str] | None = None
) -> tuple[str, dict]:
    """Deparse-JSON → SQL text + object info (identifier/owner/refresh).

    Invalid JSON returns ``("", {})`` like the reference's error path
    (``OpengaussDdlParser.parse:75-95``)."""
    st = DeparseState(schema_mapping or {})
    root = _as_json_object(json_value)
    if root is None:
        return "", {}
    out: list[str] = []
    try:
        _expand_node(out, root, st)
    except (ValueError, KeyError, IndexError):
        return "", {}
    sql = ("".join(out) + ";").replace(_EMPTY_WITH, "")
    return sql, {
        "identifier": st.identifier,
        "owner": st.owner,
        "is_table_refreshed": st.is_table_refreshed,
    }


def expand_ddl_json_batch(
    df: DataFrame, schema_mapping: Mapping[str, str] | None = None
) -> DataFrame:
    """Bulk path: rows with a ``ddl_json`` column → (ddl_json, sql,
    identifier), Arrow-batched."""
    mapping = dict(schema_mapping or {})

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            sqls, idents = [], []
            for j in pdf["ddl_json"]:
                sql, info = expand_ddl_json(j, mapping)
                sqls.append(sql)
                idents.append(info.get("identifier"))
            yield pd.DataFrame(
                {"ddl_json": pdf["ddl_json"], "sql": sqls, "identifier": idents}
            )

    return df.select("ddl_json").mapInPandas(
        gen, "ddl_json string, sql string, identifier string"
    )
