"""DDL-driven schema evolution.

The reference parses DDL text with ANTLR and historizes structured
``TableChanges`` JSON (``relational/history/JsonTableChangeSerializer.java:
44-67,121-129``; change types CREATE/ALTER/DROP at ``TableChanges.java:
179-184``), replaying the ledger on restart (``AbstractDatabaseHistory.java``).

Here DDL arrives as envelope rows with ``op='l'`` whose ``after.content``
carries the structured TableChanges JSON (v1 supports ALTER ADD COLUMN; the
full SQL-text path would go through sqlglot in v2). Applying a DDL is a
**batch barrier**: events before it merge with the old schema, events after
with the new — enforced by the engine's segmentation (SURVEY §3.3). The
applied DDLs are appended to a ``schema_history`` ledger and application is
idempotent (LakeTable.alter_add_columns no-ops on re-add), so crash/replay
across a DDL is safe."""

from __future__ import annotations

import json
import os

from debezium_spark.plans.table import LakeTable

DDL_OP = "l"


def parse_table_changes(tc_json: str) -> list[tuple[str, str]]:
    """TableChanges JSON → [(column_name, spark_type_ddl)] to add.

    Shape: {"type": "ALTER", "add_columns": [{"name": "license",
    "type": "string"}]} — the structured (not SQL-text) form, mirroring the
    serializer's column array (JsonTableChangeSerializer.java:187-233)."""
    doc = json.loads(tc_json)
    if doc.get("type") not in ("ALTER", "CREATE"):
        return []
    return [(c["name"], c.get("type", "string")) for c in doc.get("add_columns", [])]


def apply_ddl(table: LakeTable, tc_json: str, offset: tuple[str, int]) -> None:
    """Apply one structured DDL to the target and append the history ledger
    row (offset_file, offset_pos, table_changes_json) — FIXTURES.md F5."""
    cols = parse_table_changes(tc_json)
    if cols:
        table.alter_add_columns(cols)
    ledger = os.path.join(table.root, "_schema_history.jsonl")
    with open(ledger, "a") as f:
        f.write(
            json.dumps(
                {
                    "offset_file": offset[0],
                    "offset_pos": offset[1],
                    "table_changes": json.loads(tc_json),
                    "schema_version": table.manifest()["version"],
                }
            )
            + "\n"
        )


def schema_history(table: LakeTable) -> list[dict]:
    ledger = os.path.join(table.root, "_schema_history.jsonl")
    if not os.path.exists(ledger):
        return []
    with open(ledger) as f:
        return [json.loads(line) for line in f if line.strip()]
