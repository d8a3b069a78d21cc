"""FIXTURES.md F3: the reference's canonical inventory fixture
(connector_test.sql) and the golden record ordering asserted by
MySqlConnectorIT.java:1510-1596 — PK-change update emits exactly
[delete(old), tombstone(old), insert(new)]; delete emits
[delete, tombstone]; tombstones-disabled drops the markers."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from debezium_spark import MultiTableEngine, TableSpec
from debezium_spark.operators.apply import split_pk_changes
from debezium_spark.operators.tombstones import with_tombstones
from debezium_spark.schema import envelope_schema

def _orders_env(spark, rows):
    payload = StructType.fromDDL(
        "order_number int, order_date date, purchaser int, quantity int, product_id int"
    )
    return spark.createDataFrame(rows, envelope_schema(payload))


def _row(pos, op, before, after):
    return {
        "before": before,
        "after": after,
        "op": op,
        "ts_ms": pos,
        "source": {"file": "binlog.000001", "pos": pos, "gtid": None, "snapshot": None,
                   "db": "inventory", "table": "orders", "ts_ms": pos},
        "transaction": None,
    }


def _order(n, qty=1):
    import datetime

    return {"order_number": n, "order_date": datetime.date(2016, 1, 16),
            "purchaser": 1001, "quantity": qty, "product_id": 102}


def test_pk_change_golden_ordering(spark):
    """UPDATE order_number 10001→10101 ⇒ exactly
    [delete(10001), tombstone(10001), insert(10101)], in that order."""
    env = _orders_env(spark, [_row(7, "u", _order(10001), _order(10101))])
    out = (
        split_pk_changes(env, ["order_number"], tombstones_on_delete=True)
        .orderBy("_sub")
        .select(
            "op", "_sub", "_tombstone",
            F.coalesce(F.col("after.order_number"), F.col("before.order_number")).alias("k"),
            F.col("after.order_number").alias("after_k"),
        )
        .collect()
    )
    golden = [
        ("d", 0, False, 10001, None),     # delete under the OLD key
        ("d", 1, True, 10001, None),      # tombstone for the OLD key
        ("c", 2, False, 10101, 10101),    # insert under the NEW key
    ]
    assert [(r["op"], r["_sub"], r["_tombstone"], r["k"], r["after_k"]) for r in out] == golden


def test_delete_golden_ordering_and_tombstone_toggle(spark):
    env = _orders_env(spark, [_row(9, "d", _order(10101), None)])
    out = with_tombstones(env).orderBy("_sub").select("op", "_tombstone").collect()
    assert [(r["op"], r["_tombstone"]) for r in out] == [("d", False), ("d", True)]
    # tombstones disabled: the raw envelope is the record stream — one delete
    plain = split_pk_changes(env, ["order_number"], tombstones_on_delete=False).collect()
    assert len(plain) == 1 and plain[0]["op"] == "d"


def test_inventory_multi_table_seed_and_dml(spark, tmp_path):
    """The four canonical inventory tables routed per-table; seed counts per
    connector_test.sql (9/9/4/5); the golden PK-change update lands as
    delete+insert across the engine."""
    specs = [
        TableSpec("inventory", "products",
                  StructType.fromDDL("id int, name string, description string, weight float"),
                  ["id"], n_buckets=2),
        TableSpec("inventory", "products_on_hand",
                  StructType.fromDDL("product_id int, quantity int"),
                  ["product_id"], n_buckets=2),
        TableSpec("inventory", "customers",
                  StructType.fromDDL("id int, first_name string, last_name string, email string"),
                  ["id"], n_buckets=2),
        TableSpec("inventory", "orders",
                  StructType.fromDDL("order_number int, order_date string, purchaser int,"
                                     " quantity int, product_id int"),
                  ["order_number"], n_buckets=2),
    ]
    mte = MultiTableEngine(spark, str(tmp_path / "lake"), specs)

    import json

    def wire(pos, table, after, before=None, op="c"):
        return {
            "before_json": json.dumps(before) if before else None,
            "after_json": json.dumps(after) if after else None,
            "op": op, "ts_ms": pos,
            "source": {"file": "f", "pos": pos, "gtid": None, "snapshot": None,
                       "db": "inventory", "table": table, "ts_ms": pos},
            "transaction": None,
        }

    rows, pos = [], 0
    for i in range(9):
        rows.append(wire(pos, "products", {"id": 101 + i, "name": f"p{i}",
                                           "description": "d", "weight": 1.5 + i})); pos += 1
        rows.append(wire(pos, "products_on_hand", {"product_id": 101 + i, "quantity": i})); pos += 1
    for i in range(4):
        rows.append(wire(pos, "customers", {"id": 1001 + i, "first_name": "a",
                                            "last_name": "b", "email": f"e{i}@x"})); pos += 1
    for i in range(5):
        rows.append(wire(pos, "orders", {"order_number": 10001 + i, "order_date": "2016-01-16",
                                         "purchaser": 1001, "quantity": 1,
                                         "product_id": 102})); pos += 1
    # the golden PK-change: order 10001 renumbered to 10101
    old = {"order_number": 10001, "order_date": "2016-01-16", "purchaser": 1001,
           "quantity": 1, "product_id": 102}
    new = dict(old, order_number=10101)
    rows.append(wire(pos, "orders", new, before=old, op="u")); pos += 1

    from debezium_spark.streaming.multi import WIRE_SCHEMA

    mte.apply_wire_batch(spark.createDataFrame(rows, WIRE_SCHEMA), batch_id="b0")

    assert mte.table("inventory", "products").read().count() == 9
    assert mte.table("inventory", "products_on_hand").read().count() == 9
    assert mte.table("inventory", "customers").read().count() == 4
    orders = {r["order_number"] for r in mte.table("inventory", "orders").read().collect()}
    assert orders == {10101, 10002, 10003, 10004, 10005}  # 10001 renumbered
