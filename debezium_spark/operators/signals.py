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
