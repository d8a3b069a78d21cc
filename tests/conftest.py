from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("debezium-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()


def sequential_oracle(events: list[dict], key_cols=("repo", "path")) -> dict:
    """Single-threaded reference apply (FIXTURES.md F6): the ground truth the
    distributed engine must match. Applies envelope events in (pos) order:
    c/u/r upsert after (PK-change update deletes the old key first); d
    deletes by before-key."""
    state: dict[tuple, dict] = {}
    for e in sorted(events, key=lambda e: e["source"]["pos"]):
        op, before, after = e["op"], e.get("before"), e.get("after")
        if op in ("c", "u", "r"):
            if op == "u" and before is not None:
                bkey = tuple(before[c] for c in key_cols)
                akey = tuple(after[c] for c in key_cols)
                if bkey != akey:
                    state.pop(bkey, None)
            state[tuple(after[c] for c in key_cols)] = after
        elif op == "d":
            state.pop(tuple(before[c] for c in key_cols), None)
    return state
