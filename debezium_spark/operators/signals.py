"""Signal table — the control plane (SURVEY §2.7).

The reference watches a dedicated signal table for action rows
(``debezium-core/.../pipeline/signal/Signal.java:100-111``; actions ``log``,
``schema-changes``, ``execute-snapshot`` via ``signal/ExecuteSnapshot.java``,
plus open/close incremental-snapshot window markers). Here the signal table
is any small DataFrame/parquet of ``(id, type, data)`` rows the driver reads
at batch boundaries; the engine-facing output is a list of typed actions.

Window open/close markers are not needed: Spark batch boundaries are
explicit, so an ``execute-snapshot`` signal maps directly to
``CdcEngine.backfill`` (the DBLog chunk semantics collapse into the engine's
ordered last-wins dedupe — see ``CdcEngine.backfill``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class SignalAction:
    signal_id: str
    type: str  # log | execute-snapshot | schema-changes
    data: dict


KNOWN_TYPES = {"log", "execute-snapshot", "schema-changes"}


def read_signals(signals: DataFrame) -> list[SignalAction]:
    """Collect and parse signal rows (driver-side; the signal table is tiny
    by construction — it is a command channel, not data)."""
    out: list[SignalAction] = []
    for r in signals.select("id", "type", "data").collect():
        if r["type"] not in KNOWN_TYPES:
            continue  # unknown actions are skipped, as in Signal.java
        try:
            data = json.loads(r["data"]) if r["data"] else {}
        except (TypeError, ValueError):
            data = {}
        out.append(SignalAction(signal_id=str(r["id"]), type=r["type"], data=data))
    return out


def signal_log(engine, action: SignalAction) -> int:
    """``log`` action (reference ``signal/Log.java``: interpolates and logs
    the message). Here the message lands durably as a lineage row on the
    table's next manifest version — a metadata-only commit (no data files,
    fence untouched), so the operator's audit trail rides the same channel
    as batch metrics. Returns the committed version."""
    return engine.table.commit_buckets(
        {},
        [],
        None,
        [{
            "batch": f"signal/{action.signal_id}",
            "bucket": -1, "events": 0, "deletes": 0, "upserts": 0,
            "signal": "log",
            "message": str(action.data.get("message", "")),
        }],
    )


def signal_schema_changes(engine, action: SignalAction) -> DataFrame:
    """``schema-changes`` action (reference ``signal/SchemaChanges.java``:
    re-emits schema change events so a consumer can rebuild its schema
    history). Returns the table's ``_schema_history.jsonl`` ledger as
    schema-change envelope rows — op='l', the raw DDL text, the offset it
    applied at, and the post-apply schema version — in replay order
    (file-major, the schema.py offset-order contract).

    Compacted ledgers: per-op entries folded into a checkpoint no longer
    exist, so the checkpoint itself is re-emitted FIRST as a synthetic
    baseline row (op='l', ddl null, ``ops_json`` = the complete restored
    schema state). Without it a consumer rebuilding its history from this
    signal would see only the post-compaction tail and silently converge
    to the wrong schema."""
    from debezium_spark.operators.schema_evolution import schema_history_split

    cp, entries = schema_history_split(engine.table)
    rows = []
    if cp is not None:
        rows.append((
            cp.get("offset_file"),
            cp.get("offset_pos"),
            "l",
            None,
            json.dumps({
                "checkpoint": True,
                "schema": cp["schema"],
                "renames": cp.get("renames", {}),
                "dropped": cp.get("dropped", []),
                "folded": cp.get("folded", 0),
            }),
            cp.get("schema_version"),
        ))
    rows += [
        (
            e.get("offset_file"),
            e.get("offset_pos"),
            "l",
            e.get("raw"),
            json.dumps(e.get("ops", [])),
            e.get("schema_version"),
        )
        for e in entries
    ]
    schema = (
        "offset_file string, offset_pos long, op string, ddl string,"
        " ops_json string, schema_version long"
    )
    return engine.spark.createDataFrame(rows, schema).orderBy(
        F.coalesce(F.col("offset_file"), F.lit("")), "offset_pos"
    )


def dispatch_signals(engine, signals: DataFrame, snapshot_provider=None) -> list[tuple]:
    """Drive every signal-table action against an engine (the reference's
    ``Signal.process`` loop, Signal.java:100-111). Returns one
    ``(signal_id, type, result)`` per handled action:

    - ``log`` → lineage commit (result = manifest version);
    - ``schema-changes`` → schema-history envelope DataFrame;
    - ``execute-snapshot`` → chunked incremental snapshot (DBLog);
      ``snapshot_provider(data) -> DataFrame`` supplies the op='r' source
      rows for the requested data-collections (the reference likewise
      re-reads the source via its JDBC connection). Skipped if no provider.
    """
    out: list[tuple] = []
    for a in read_signals(signals):
        if a.type == "log":
            out.append((a.signal_id, a.type, signal_log(engine, a)))
        elif a.type == "schema-changes":
            out.append((a.signal_id, a.type, signal_schema_changes(engine, a)))
        elif a.type == "execute-snapshot" and snapshot_provider is not None:
            src = snapshot_provider(a.data)
            out.append(
                (a.signal_id, a.type,
                 engine.incremental_snapshot(src, batch_id=f"signal-{a.signal_id}"))
            )
    return out
