"""Multi-table routing: per-table schemas, per-table key columns
(message.key.columns analog), unregistered-table drop, idle heartbeat."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from debezium_spark.streaming.multi import (
    MultiTableEngine,
    TableSpec,
    envelope_to_wire,
    wire_to_envelope,
)


def _wire(spark, rows):
    """rows: (pos, db, table, op, before_json, after_json)."""
    data = [
        {
            "before_json": r[4],
            "after_json": r[5],
            "op": r[3],
            "ts_ms": 1000 + r[0],
            "source": {
                "file": "binlog.000001",
                "pos": r[0],
                "gtid": None,
                "snapshot": None,
                "db": r[1],
                "table": r[2],
                "ts_ms": 1000 + r[0],
            },
            "transaction": None,
        }
        for r in rows
    ]
    from debezium_spark.streaming.multi import WIRE_SCHEMA

    return spark.createDataFrame(data, WIRE_SCHEMA)


def test_multi_table_routes_by_identity_with_per_table_keys(spark, tmp_path):
    users = TableSpec(
        "app", "users",
        StructType.fromDDL("uid long, name string"),
        key_cols=["uid"], n_buckets=2, mode="cow",
    )
    # orders keyed by a *composite, non-PK* key — message.key.columns analog
    orders = TableSpec(
        "app", "orders",
        StructType.fromDDL("region string, order_no long, amount long"),
        key_cols=["region", "order_no"], n_buckets=2, mode="mor",
    )
    mte = MultiTableEngine(spark, str(tmp_path / "lake"), [users, orders])

    rows = [
        (0, "app", "users", "c", None, '{"uid": 1, "name": "ada"}'),
        (1, "app", "orders", "c", None, '{"region": "eu", "order_no": 7, "amount": 100}'),
        (2, "app", "users", "u", '{"uid": 1, "name": "ada"}', '{"uid": 1, "name": "ada2"}'),
        (3, "app", "ghost", "c", None, '{"x": 1}'),  # unregistered -> dropped
        (4, "app", "orders", "u",
         '{"region": "eu", "order_no": 7, "amount": 100}',
         '{"region": "eu", "order_no": 7, "amount": 250}'),
    ]
    versions = mte.apply_wire_batch(_wire(spark, rows), batch_id="b0")
    assert set(versions) == {"app.users", "app.orders"}

    u = {r["uid"]: r["name"] for r in mte.table("app", "users").read().collect()}
    assert u == {1: "ada2"}
    o = mte.table("app", "orders").read().collect()
    assert [(r["region"], r["order_no"], r["amount"]) for r in o] == [("eu", 7, 250)]
    # per-table fences track each table's own max offset
    assert mte.table("app", "users").fence()[1] == 2
    assert mte.table("app", "orders").fence()[1] == 4


def test_multi_table_idle_heartbeat_advances_quiet_fence(spark, tmp_path):
    a = TableSpec("app", "a", StructType.fromDDL("k long, v string"), ["k"], n_buckets=2)
    b = TableSpec("app", "b", StructType.fromDDL("k long, v string"), ["k"], n_buckets=2)
    mte = MultiTableEngine(spark, str(tmp_path / "lake"), [a, b])

    mte.apply_wire_batch(
        _wire(spark, [
            (0, "app", "a", "c", None, '{"k": 1, "v": "x"}'),
            (1, "app", "b", "c", None, '{"k": 1, "v": "y"}'),
        ]),
        batch_id="b0",
    )
    # second batch touches only table a; b must heartbeat to the global max
    mte.apply_wire_batch(
        _wire(spark, [(5, "app", "a", "u", '{"k": 1, "v": "x"}', '{"k": 1, "v": "x2"}')]),
        batch_id="b1",
    )
    assert mte.table("app", "a").fence()[1] == 5
    assert mte.table("app", "b").fence()[1] == 5
    assert any(r.get("heartbeat") for r in mte.table("app", "b").lineage())
    assert mte.table("app", "b").read().count() == 1  # data untouched


def test_wire_roundtrip_preserves_envelope(spark):
    from debezium_spark import ChangeLogGenerator

    gen = ChangeLogGenerator(spark, seed=5, n_repos=4)
    env = gen.events(200)
    payload = env.schema["after"].dataType
    back = wire_to_envelope(envelope_to_wire(env), payload)
    a = env.select(F.sha2(F.concat_ws("|",
        F.coalesce(F.col("after.repo"), F.col("before.repo")),
        F.coalesce(F.col("after.path"), F.col("before.path")),
        F.coalesce(F.col("after.content"), F.lit("")), F.col("op"),
        F.col("source.pos").cast("string")), 256).alias("h"))
    b = back.select(F.sha2(F.concat_ws("|",
        F.coalesce(F.col("after.repo"), F.col("before.repo")),
        F.coalesce(F.col("after.path"), F.col("before.path")),
        F.coalesce(F.col("after.content"), F.lit("")), F.col("op"),
        F.col("source.pos").cast("string")), 256).alias("h"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_create_table_auto_registration_and_drop_retirement(spark, tmp_path):
    """Mid-stream CREATE TABLE materializes a new TableSpec/LakeTable on
    the fly (Tables.java overwriteTable; MySqlAntlrDdlParser create-table
    listener) — its own DML later in the same batch applies. DROP TABLE
    retires the capture; subsequent events for it drop like any
    unregistered table, and the lake data stays on disk."""
    import json
    from debezium_spark.streaming.multi import WIRE_SCHEMA

    users = TableSpec("app", "users", StructType.fromDDL("uid long, name string"),
                      ["uid"], n_buckets=2)
    mte = MultiTableEngine(spark, str(tmp_path / "lake"), [users], default_buckets=2)

    def row(pos, table, op, after, before=None):
        return {
            "before_json": before, "after_json": after, "op": op, "ts_ms": 1000 + pos,
            "source": {"file": "binlog.000001", "pos": pos, "gtid": None,
                       "snapshot": None, "db": "app", "table": table,
                       "ts_ms": 1000 + pos},
            "transaction": None,
        }

    create_sql = ("CREATE TABLE app.orders (order_no BIGINT NOT NULL, "
                  "amount DECIMAL(10,2), note VARCHAR(64), PRIMARY KEY (order_no)) "
                  "ENGINE=InnoDB")
    b0 = [
        row(1, "users", "c", '{"uid": 1, "name": "ada"}'),
        row(2, "orders", "l", json.dumps({"content": create_sql})),
        row(3, "orders", "c", '{"order_no": 7, "amount": 12.50, "note": "a"}'),
        row(4, "orders", "u", '{"order_no": 7, "amount": 99.00, "note": "b"}',
            '{"order_no": 7, "amount": 12.50, "note": "a"}'),
    ]
    versions = mte.apply_wire_batch(spark.createDataFrame(b0, WIRE_SCHEMA), "b0")
    assert set(versions) == {"app.users", "app.orders"}
    got = mte.table("app", "orders").read().collect()
    assert [(r["order_no"], float(r["amount"]), r["note"]) for r in got] == [(7, 99.0, "b")]
    assert mte.table("app", "orders").fence()[1] == 4
    assert ("app", "orders") in mte.specs

    # DROP TABLE retires the capture; later events for it are dropped
    orders_root = mte.table("app", "orders").root
    b1 = [row(5, "orders", "l", json.dumps({"content": "DROP TABLE app.orders"}))]
    mte.apply_wire_batch(spark.createDataFrame(b1, WIRE_SCHEMA), "b1")
    assert ("app", "orders") not in mte.specs and ("app", "orders") in mte.retired
    b2 = [row(6, "orders", "c", '{"order_no": 8, "amount": 1.00, "note": "x"}'),
          row(7, "users", "u", '{"uid": 1, "name": "ada2"}', '{"uid": 1, "name": "ada"}')]
    mte.apply_wire_batch(spark.createDataFrame(b2, WIRE_SCHEMA), "b2")
    assert {r["name"] for r in mte.table("app", "users").read().collect()} == {"ada2"}
    # retired lake data untouched on disk
    from debezium_spark.plans.table import LakeTable
    survivor = LakeTable(spark, orders_root, ["order_no"], n_buckets=2)
    assert survivor.read().count() == 1

    # a CREATE for an uncaptured DATABASE is ignored (include-list semantics)
    b3 = [row(8, "t2", "l", json.dumps(
        {"content": "CREATE TABLE otherdb.t2 (id INT, PRIMARY KEY(id))"}))]
    b3[0]["source"]["db"] = "otherdb"
    mte.apply_wire_batch(spark.createDataFrame(b3, WIRE_SCHEMA), "b3")
    assert ("otherdb", "t2") not in mte.specs


def test_recreate_after_drop_starts_fresh(spark, tmp_path):
    """Review regression: re-CREATE of a dropped table resurrected the old
    LakeTable (stale manifest/keys/rows). The old incarnation's directory
    archives and the new one registers clean — including DROP;CREATE inside
    ONE batch, processed in offset order."""
    import json
    import os
    from debezium_spark.streaming.multi import WIRE_SCHEMA

    users = TableSpec("app", "users", StructType.fromDDL("uid long, name string"),
                      ["uid"], n_buckets=2)
    mte = MultiTableEngine(spark, str(tmp_path / "lake"), [users], default_buckets=2)

    def row(pos, table, op, after):
        return {
            "before_json": None, "after_json": after, "op": op, "ts_ms": pos,
            "source": {"file": "f", "pos": pos, "gtid": None, "snapshot": None,
                       "db": "app", "table": table, "ts_ms": pos},
            "transaction": None,
        }

    ddl = lambda pos, table, sql: row(pos, table, "l", json.dumps({"content": sql}))  # noqa: E731
    # create orders (schema A), load it
    mte.apply_wire_batch(spark.createDataFrame([
        ddl(1, "orders", "CREATE TABLE app.orders (order_no BIGINT, amount BIGINT, PRIMARY KEY(order_no))"),
        row(2, "orders", "c", '{"order_no": 7, "amount": 10}'),
    ], WIRE_SCHEMA), "b0")
    assert mte.table("app", "orders").read().count() == 1

    # DROP;CREATE with a DIFFERENT schema + key in one batch, then insert
    mte.apply_wire_batch(spark.createDataFrame([
        ddl(3, "orders", "DROP TABLE app.orders"),
        ddl(4, "orders", "CREATE TABLE app.orders (id INT, qty INT, PRIMARY KEY(id))"),
        row(5, "orders", "c", '{"id": 1, "qty": 3}'),
    ], WIRE_SCHEMA), "b1")
    got = mte.table("app", "orders").read().collect()
    assert [(r["id"], r["qty"]) for r in got] == [(1, 3)]
    assert mte.specs[("app", "orders")].key_cols == ["id"]
    # old incarnation archived, not deleted
    base = os.path.join(str(tmp_path / "lake"), "app")
    assert any(n.startswith("orders@dropped.") for n in os.listdir(base))


def test_rename_table_moves_capture_and_data(spark, tmp_path):
    """RENAME TABLE mid-stream (Tables.renameTable): the capture + lake
    data move to the new identity; later events under the new name apply
    to the same table, the old name drops like any unregistered table."""
    import json
    from debezium_spark.streaming.multi import WIRE_SCHEMA

    users = TableSpec("app", "users", StructType.fromDDL("uid long, name string"),
                      ["uid"], n_buckets=2)
    mte = MultiTableEngine(spark, str(tmp_path / "lake"), [users])

    def row(pos, table, op, after):
        return {
            "before_json": None, "after_json": after, "op": op, "ts_ms": pos,
            "source": {"file": "f", "pos": pos, "gtid": None, "snapshot": None,
                       "db": "app", "table": table, "ts_ms": pos},
            "transaction": None,
        }

    mte.apply_wire_batch(spark.createDataFrame(
        [row(1, "users", "c", '{"uid": 1, "name": "ada"}')], WIRE_SCHEMA), "b0")
    mte.apply_wire_batch(spark.createDataFrame([
        row(2, "users", "l", json.dumps(
            {"content": "ALTER TABLE app.users RENAME TO app.members"})),
        row(3, "members", "u", '{"uid": 1, "name": "ada2"}'),
        row(4, "members", "c", '{"uid": 2, "name": "bob"}'),
    ], WIRE_SCHEMA), "b1")
    assert ("app", "users") not in mte.specs and ("app", "members") in mte.specs
    got = {r["uid"]: r["name"] for r in mte.table("app", "members").read().collect()}
    assert got == {1: "ada2", 2: "bob"}
    # old-name events now drop (unregistered)
    mte.apply_wire_batch(spark.createDataFrame(
        [row(5, "users", "c", '{"uid": 9, "name": "zed"}')], WIRE_SCHEMA), "b2")
    assert mte.table("app", "members").read().count() == 2


def test_rename_same_batch_old_name_rows_follow_the_capture(spark, tmp_path):
    """Review regression: RENAME was applied to the catalog before dispatch,
    so same-batch events under the OLD name were silently dropped. They now
    alias to the renamed capture — including bundled column DDL addressed
    to the old name."""
    import json
    from debezium_spark.streaming.multi import WIRE_SCHEMA

    users = TableSpec("app", "users", StructType.fromDDL("uid long, name string"),
                      ["uid"], n_buckets=2)
    mte = MultiTableEngine(spark, str(tmp_path / "lake"), [users])

    def row(pos, table, op, after):
        return {
            "before_json": None, "after_json": after, "op": op, "ts_ms": pos,
            "source": {"file": "f", "pos": pos, "gtid": None, "snapshot": None,
                       "db": "app", "table": table, "ts_ms": pos},
            "transaction": None,
        }

    ddl = lambda pos, table, sql: row(pos, table, "l", json.dumps({"content": sql}))  # noqa: E731
    mte.apply_wire_batch(spark.createDataFrame([
        row(1, "users", "c", '{"uid": 1, "name": "ada"}'),       # old name, pre-rename
        ddl(2, "users", "ALTER TABLE app.users RENAME TO app.members"),
        row(3, "members", "c", '{"uid": 2, "name": "bob"}'),     # new name
    ], WIRE_SCHEMA), "b0")
    got = {r["uid"]: r["name"] for r in mte.table("app", "members").read().collect()}
    assert got == {1: "ada", 2: "bob"}  # pos-1 row was NOT dropped
    assert mte.table("app", "members").fence()[1] == 3


def test_recreate_old_name_after_rename_gets_fresh_table(spark, tmp_path):
    """Review regression: after RENAME users->members (members keeps the
    users/ directory), CREATE TABLE users must NOT adopt members' live
    manifest — the new incarnation allocates a fresh @gen directory."""
    import json
    from debezium_spark.streaming.multi import WIRE_SCHEMA

    users = TableSpec("app", "users", StructType.fromDDL("uid long, name string"),
                      ["uid"], n_buckets=2)
    mte = MultiTableEngine(spark, str(tmp_path / "lake"), [users], default_buckets=2)

    def row(pos, table, op, after):
        return {
            "before_json": None, "after_json": after, "op": op, "ts_ms": pos,
            "source": {"file": "f", "pos": pos, "gtid": None, "snapshot": None,
                       "db": "app", "table": table, "ts_ms": pos},
            "transaction": None,
        }

    ddl = lambda pos, table, sql: row(pos, table, "l", json.dumps({"content": sql}))  # noqa: E731
    mte.apply_wire_batch(spark.createDataFrame([
        row(1, "users", "c", '{"uid": 1, "name": "ada"}'),
        ddl(2, "users", "ALTER TABLE app.users RENAME TO app.members"),
    ], WIRE_SCHEMA), "b0")
    members_root = mte.table("app", "members").root

    # new table reusing the old NAME, different schema/key
    mte.apply_wire_batch(spark.createDataFrame([
        ddl(3, "users", "CREATE TABLE app.users (id INT, qty INT, PRIMARY KEY(id))"),
        row(4, "users", "c", '{"id": 9, "qty": 2}'),
    ], WIRE_SCHEMA), "b1")
    assert mte.table("app", "users").root != members_root  # fresh @gen dir
    assert [(r["id"], r["qty"]) for r in mte.table("app", "users").read().collect()] == [(9, 2)]
    # the renamed capture is untouched
    assert {r["uid"] for r in mte.table("app", "members").read().collect()} == {1}
    assert mte.table("app", "members").root == members_root


def test_path_record_in_wire_batch_loads_slices(spark, tmp_path):
    """Review regression: the pre-pass barrier flag omitted op='p', so PATH
    records in multi-table wire batches bypassed the barrier machinery."""
    import json
    from debezium_spark.sources.slices import export_csv_slices
    from debezium_spark.streaming.multi import WIRE_SCHEMA

    src = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "k long, v string"
    )
    sdir = str(tmp_path / "slices")
    export_csv_slices(src, ["k"], slice_size=5).write.parquet(sdir)

    spec = TableSpec("app", "t", StructType.fromDDL("k long, v string"), ["k"],
                     n_buckets=2)
    mte = MultiTableEngine(spark, str(tmp_path / "lake"), [spec])
    batch = spark.createDataFrame([
        {"before_json": None,
         "after_json": json.dumps({"content": sdir}),
         "op": "p", "ts_ms": 1,
         "source": {"file": "f", "pos": 1, "gtid": None, "snapshot": None,
                    "db": "app", "table": "t", "ts_ms": 1},
         "transaction": None},
        {"before_json": None, "after_json": '{"k": 3, "v": "updated"}',
         "op": "u", "ts_ms": 2,
         "source": {"file": "f", "pos": 2, "gtid": None, "snapshot": None,
                    "db": "app", "table": "t", "ts_ms": 2},
         "transaction": None},
    ], WIRE_SCHEMA)
    mte.apply_wire_batch(batch, "b0")
    state = {r["k"]: r["v"] for r in mte.table("app", "t").read().collect()}
    assert len(state) == 20           # slice set loaded
    assert state[3] == "updated"      # post-PATH event wins
    assert mte.table("app", "t").fence()[1] == 2


def test_unregistered_traffic_still_heartbeats_captured_tables(spark, tmp_path):
    """Review regression: restricting the global fence to registered tables
    starved idle captured fences when a batch carried only filtered-table
    traffic — offset-bearing heartbeats exist precisely for that case."""
    a = TableSpec("app", "a", StructType.fromDDL("k long, v string"), ["k"], n_buckets=2)
    mte = MultiTableEngine(spark, str(tmp_path / "lake"), [a], auto_register=False)
    mte.apply_wire_batch(
        _wire(spark, [(1, "app", "a", "c", None, '{"k": 1, "v": "x"}')]), "b0"
    )
    assert mte.table("app", "a").fence()[1] == 1
    # next batch: ONLY unregistered-table rows, valid offsets
    mte.apply_wire_batch(
        _wire(spark, [(9, "app", "ghost", "c", None, '{"x": 1}')]), "b1"
    )
    assert mte.table("app", "a").fence()[1] == 9  # heartbeat advanced


def test_null_pos_groups_quarantine_instead_of_wedging(spark, tmp_path):
    """Advisor regression: a (db,table) group whose every source.pos is null
    — including unregistered tables — crashed the dispatcher with
    'NoneType > int' on the global-offset max. Poison records must
    quarantine; healthy tables must still apply and heartbeat."""
    import json
    from debezium_spark.streaming.multi import WIRE_SCHEMA

    # parquet/wire data can violate declared nullability (Spark enforces it
    # only in createDataFrame) — mirror that with a nullable-pos schema
    nullable_wire = StructType.fromJson(
        json.loads(
            json.dumps(WIRE_SCHEMA.jsonValue()).replace('"nullable": false', '"nullable": true')
        )
    )

    a = TableSpec("app", "a", StructType.fromDDL("k long, v string"), ["k"], n_buckets=2)
    b = TableSpec("app", "b", StructType.fromDDL("k long, v string"), ["k"], n_buckets=2)
    mte = MultiTableEngine(spark, str(tmp_path / "lake"), [a, b])

    def src(pos, table):
        return {"file": "binlog.000001", "pos": pos,
                "gtid": None, "snapshot": None, "db": "app", "table": table,
                "ts_ms": 1000}

    rows = [
        # healthy group for table a
        {"before_json": None, "after_json": '{"k": 1, "v": "x"}', "op": "c",
         "ts_ms": 1000, "source": src(3, "a"), "transaction": None},
        # registered table b: ALL rows null-pos (poison)
        {"before_json": None, "after_json": '{"k": 9, "v": "bad"}', "op": "c",
         "ts_ms": 1000, "source": src(None, "b"), "transaction": None},
        # unregistered table, null pos — must just be dropped
        {"before_json": None, "after_json": '{"x": 1}', "op": "c",
         "ts_ms": 1000, "source": src(None, "ghost"), "transaction": None},
    ]
    wire = spark.createDataFrame(rows, nullable_wire)
    versions = mte.apply_wire_batch(wire, batch_id="b0")  # must not raise
    assert set(versions) == {"app.a", "app.b"}
    assert versions["app.b"] is None  # nothing committable for b
    assert {(r["k"], r["v"]) for r in mte.table("app", "a").read().collect()} == {(1, "x")}
    assert mte.table("app", "a").fence()[1] == 3
    # b's poison rows landed in quarantine, not the table
    from debezium_spark.operators.quarantine import read_quarantine

    assert mte.table("app", "b").read().count() == 0
    q = read_quarantine(spark, mte.table("app", "b").root)
    assert q.count() == 1 and q.first()["reason"] is not None

    # all-poison batch (no registered fence at all): no crash, no commits
    wire2 = spark.createDataFrame([rows[1]], nullable_wire)
    v2 = mte.apply_wire_batch(wire2, batch_id="b1")
    assert v2["app.a"] is None and v2["app.b"] is None


def test_parallel_dispatch_equals_sequential(spark, tmp_path):
    """Thread-pool dispatch (8 workers) must produce byte-identical
    per-table states to sequential dispatch — merges on disjoint tables
    commute and Spark actions are thread-safe on a persisted input."""
    import json
    from pyspark.sql.types import StructType
    from debezium_spark.streaming.multi import WIRE_SCHEMA

    rows = []
    for i in range(2000):
        t = f"t{i % 16}"
        rows.append({
            "before_json": None,
            "after_json": json.dumps({"k": i % 50, "v": f"v{i}"}),
            "op": "c" if i % 4 else "u",
            "ts_ms": i,
            "source": {"file": "f", "pos": i, "gtid": None, "snapshot": None,
                       "db": "app", "table": t, "ts_ms": i},
            "transaction": None,
        })
    wire = spark.createDataFrame(rows, WIRE_SCHEMA)
    specs = lambda: [  # noqa: E731
        TableSpec("app", f"t{i}", StructType.fromDDL("k long, v string"), ["k"], n_buckets=2)
        for i in range(16)
    ]
    seq = MultiTableEngine(spark, str(tmp_path / "seq"), specs(), max_parallel_tables=1)
    par = MultiTableEngine(spark, str(tmp_path / "par"), specs(), max_parallel_tables=8)
    vs = seq.apply_wire_batch(wire, batch_id="b0")
    vp = par.apply_wire_batch(wire, batch_id="b0")
    assert set(vs) == set(vp) == {f"app.t{i}" for i in range(16)}
    for i in range(16):
        a = {(r["k"], r["v"]) for r in seq.table("app", f"t{i}").read().collect()}
        b = {(r["k"], r["v"]) for r in par.table("app", f"t{i}").read().collect()}
        assert a == b and len(a) > 0
        assert seq.table("app", f"t{i}").fence() == par.table("app", f"t{i}").fence()


def test_typed_parse_rejects_survive_to_quarantine(spark, tmp_path):
    """ADVICE r3 #3: a value the generic-map pre-pass cannot prove bad (a
    non-integral JSON number / string-quoted number for a long key) but the
    strict typed from_json rejects must land in QUARANTINE — never vanish
    silently from both the table and the quarantine."""
    from debezium_spark.streaming.multi import WIRE_SCHEMA

    a = TableSpec("app", "a", StructType.fromDDL("k long, v string"), ["k"], n_buckets=2)
    mte = MultiTableEngine(spark, str(tmp_path / "lake"), [a])

    def row(pos, after):
        return {"before_json": None, "after_json": after, "op": "c", "ts_ms": 1000,
                "source": {"file": "binlog.000001", "pos": pos, "gtid": None,
                           "snapshot": None, "db": "app", "table": "a", "ts_ms": 1000},
                "transaction": None}

    wire = spark.createDataFrame(
        [
            row(1, '{"k": 1, "v": "good"}'),
            row(2, '{"k": 1.5, "v": "frac"}'),    # map carries "1.5", typed parse nulls
            row(3, '{"k": "7", "v": "quoted"}'),  # map carries "7", typed parse nulls
        ],
        WIRE_SCHEMA,
    )
    mte.apply_wire_batch(wire, batch_id="b0")
    assert {r["k"] for r in mte.table("app", "a").read().collect()} == {1}
    from debezium_spark.operators.quarantine import read_quarantine

    q = read_quarantine(spark, mte.table("app", "a").root).collect()
    assert sorted(r["pos"] for r in q) == [2, 3]
    assert {r["reason"] for r in q} == {"null_key"}
    # fence covers the quarantined offsets (they were consumed)
    assert mte.table("app", "a").fence()[1] == 3


def test_prepass_expression_bounded_at_high_table_counts(spark, tmp_path):
    """Judge r3 watch-item #1: the pre-pass validity expression must stay
    ONE flat lookup however many tables are registered — no per-spec
    validity-tree when-chain (codegen grew linearly per table)."""
    from debezium_spark.streaming.multi import WIRE_SCHEMA

    n_specs = 220
    specs = [
        TableSpec("app", f"t{i}",
                  StructType.fromDDL("k string, m long, v string"),
                  ["k"] if i % 2 == 0 else ["k", "m"], n_buckets=2)
        for i in range(n_specs)
    ]
    mte = MultiTableEngine(spark, str(tmp_path / "lake"), specs,
                           max_parallel_tables=8)
    wire = spark.createDataFrame([], WIRE_SCHEMA)
    plan = mte._prepass_stats(wire)._jdf.queryExecution().optimizedPlan().toString()
    # exactly one validity tree: the rule-set markers appear once, not per spec
    assert plan.count("null_key") <= 1
    assert plan.count("unknown_op") <= 1
    assert plan.lower().count("from_json") <= 2

    # and it actually evaluates: one good + one bad row among 220 specs
    rows = [
        {"before_json": None, "after_json": '{"k": "x", "m": 1, "v": "ok"}',
         "op": "c", "ts_ms": 0,
         "source": {"file": "f", "pos": 1, "gtid": None, "snapshot": None,
                    "db": "app", "table": "t1", "ts_ms": 0}, "transaction": None},
        {"before_json": None, "after_json": '{"v": "no-key"}', "op": "c", "ts_ms": 0,
         "source": {"file": "f", "pos": 2, "gtid": None, "snapshot": None,
                    "db": "app", "table": "t0", "ts_ms": 0}, "transaction": None},
    ]
    stats = {(r["db"], r["t"]): r for r in
             mte._prepass_stats(spark.createDataFrame(rows, WIRE_SCHEMA)).collect()}
    assert stats[("app", "t1")]["nb"] == 0
    assert stats[("app", "t0")]["nb"] == 1
    # provability: all-string keys exact, long-bearing keys hint-only
    assert mte._prepass_key_provable(mte.specs[("app", "t0")])
    assert not mte._prepass_key_provable(mte.specs[("app", "t1")])


def test_catalog_mutations_survive_restart(spark, tmp_path):
    """ADVICE r3 #1: mid-stream CREATE/DROP/RENAME persist to _catalog.jsonl
    and replay on construction — a restarted engine must not resume a
    dropped capture, must keep capturing a mid-stream-created table, and
    must route a renamed table's events to its original data."""
    import json
    from debezium_spark.streaming.multi import WIRE_SCHEMA

    users = TableSpec("app", "users", StructType.fromDDL("uid long, name string"),
                      ["uid"], n_buckets=2)
    aud = TableSpec("app", "audit", StructType.fromDDL("aid long, msg string"),
                    ["aid"], n_buckets=2)
    lake = str(tmp_path / "lake")
    mte = MultiTableEngine(spark, lake, [users, aud], default_buckets=2)

    def row(pos, table, op, after, before=None):
        return {
            "before_json": before, "after_json": after, "op": op, "ts_ms": 1000 + pos,
            "source": {"file": "binlog.000001", "pos": pos, "gtid": None,
                       "snapshot": None, "db": "app", "table": table,
                       "ts_ms": 1000 + pos},
            "transaction": None,
        }

    b0 = [
        row(1, "users", "c", '{"uid": 1, "name": "ada"}'),
        row(2, "audit", "c", '{"aid": 10, "msg": "boot"}'),
        row(3, "orders", "l", json.dumps({"content":
            "CREATE TABLE app.orders (order_no BIGINT, v VARCHAR(10) DEFAULT 'n',"
            " PRIMARY KEY (order_no))"})),
        row(4, "orders", "c", '{"order_no": 7, "v": "a"}'),
        row(5, "audit", "l", json.dumps({"content": "DROP TABLE app.audit"})),
        row(6, "users", "l", json.dumps({"content":
            "RENAME TABLE app.users TO app.accounts"})),
    ]
    mte.apply_wire_batch(spark.createDataFrame(b0, WIRE_SCHEMA), "b0")
    assert ("app", "orders") in mte.specs and ("app", "audit") not in mte.specs
    assert ("app", "accounts") in mte.specs and ("app", "users") not in mte.specs

    # ---- RESTART with the ORIGINAL static spec list ----
    mte2 = MultiTableEngine(spark, lake, [users, aud], default_buckets=2)
    assert ("app", "orders") in mte2.specs, "created capture must survive restart"
    assert ("app", "audit") not in mte2.specs, "dropped capture must stay retired"
    assert ("app", "accounts") in mte2.specs and ("app", "users") not in mte2.specs
    # the created table's DEFAULT metadata survived the ledger round-trip
    assert mte2.specs[("app", "orders")].payload_schema["v"].metadata[
        "EXISTS_DEFAULT"] == "'n'"

    b1 = [
        row(7, "orders", "c", '{"order_no": 8, "v": "b"}'),
        row(8, "accounts", "u", '{"uid": 1, "name": "ada2"}',
            '{"uid": 1, "name": "ada"}'),
        row(9, "audit", "c", '{"aid": 11, "msg": "ghost"}'),  # must be dropped
    ]
    mte2.apply_wire_batch(spark.createDataFrame(b1, WIRE_SCHEMA), "b1")
    assert {r["order_no"] for r in mte2.table("app", "orders").read().collect()} == {7, 8}
    acc = mte2.table("app", "accounts").read().collect()
    assert [(r["uid"], r["name"]) for r in acc] == [(1, "ada2")]  # same data lineage
    # audit stayed retired: its lake state is untouched by the ghost row
    from debezium_spark.plans.table import LakeTable as LT
    assert LT(spark, f"{lake}/app/audit", ["aid"]).read().count() == 1

    # double-restart is stable (idempotent replay)
    mte3 = MultiTableEngine(spark, lake, [users, aud], default_buckets=2)
    assert set(mte3.specs) == set(mte2.specs)


def test_rename_recovery_without_old_spec_in_static_list(spark, tmp_path):
    """Review r4 #7: restart whose static spec list no longer mentions the
    OLD name (it was renamed away, after all) must still register the
    capture under its NEW name from the ledgered spec — its events must
    not vanish."""
    import json
    from debezium_spark.streaming.multi import WIRE_SCHEMA

    users = TableSpec("app", "users", StructType.fromDDL("uid long, name string"),
                      ["uid"], n_buckets=2)
    lake = str(tmp_path / "lake")
    mte = MultiTableEngine(spark, lake, [users])

    def row(pos, table, op, after, before=None):
        return {"before_json": before, "after_json": after, "op": op,
                "ts_ms": 1000 + pos,
                "source": {"file": "binlog.000001", "pos": pos, "gtid": None,
                           "snapshot": None, "db": "app", "table": table,
                           "ts_ms": 1000 + pos},
                "transaction": None}

    mte.apply_wire_batch(spark.createDataFrame([
        row(1, "users", "c", '{"uid": 1, "name": "ada"}'),
        row(2, "users", "l", json.dumps(
            {"content": "RENAME TABLE app.users TO app.accounts"})),
    ], WIRE_SCHEMA), "b0")

    # restart with NO static specs at all — ledger alone must restore the
    # renamed capture
    mte2 = MultiTableEngine(spark, lake, [])
    assert ("app", "accounts") in mte2.specs
    mte2.apply_wire_batch(spark.createDataFrame([
        row(3, "accounts", "u", '{"uid": 1, "name": "ada2"}',
            '{"uid": 1, "name": "ada"}'),
    ], WIRE_SCHEMA), "b1")
    got = mte2.table("app", "accounts").read().collect()
    assert [(r["uid"], r["name"]) for r in got] == [(1, "ada2")]


def test_prepass_dotted_identities_do_not_collide(spark, tmp_path):
    """Review r4 #5: ('a.b','c') and ('a','b.c') must stay distinct in the
    pre-pass lookup (a '.'-joined key aliased them, which ANSI's duplicate
    map-key EXCEPTION policy turned into a whole-batch failure)."""
    s1 = TableSpec("a.b", "c", StructType.fromDDL("k string, v string"), ["k"], n_buckets=2)
    s2 = TableSpec("a", "b.c", StructType.fromDDL("m string, v string"), ["m"], n_buckets=2)
    mte = MultiTableEngine(spark, str(tmp_path / "lake"), [s1, s2],
                           auto_register=False)
    rows = [
        {"before_json": None, "after_json": '{"k": "x", "v": "1"}', "op": "c",
         "ts_ms": 0, "source": {"file": "f", "pos": 1, "gtid": None,
                                "snapshot": None, "db": "a.b", "table": "c",
                                "ts_ms": 0}, "transaction": None},
        {"before_json": None, "after_json": '{"v": "no-m-key"}', "op": "c",
         "ts_ms": 0, "source": {"file": "f", "pos": 2, "gtid": None,
                                "snapshot": None, "db": "a", "table": "b.c",
                                "ts_ms": 0}, "transaction": None},
    ]
    from debezium_spark.streaming.multi import WIRE_SCHEMA
    stats = {(r["db"], r["t"]): r for r in
             mte._prepass_stats(spark.createDataFrame(rows, WIRE_SCHEMA)).collect()}
    assert stats[("a.b", "c")]["nb"] == 0      # has its key 'k'
    assert stats[("a", "b.c")]["nb"] == 1      # missing its key 'm'


def test_create_table_now_default_resolves_and_reads(spark, tmp_path):
    """Review r5 regression (verified against Spark 4): CREATE TABLE with
    DEFAULT CURRENT_TIMESTAMP used to embed the unresolved NUL marker as
    EXISTS_DEFAULT in the auto-registered schema — every subsequent read of
    the new table threw INVALID_DEFAULT_VALUE.UNRESOLVED_EXPRESSION and the
    poisoned cols persisted to the catalog ledger. The marker now resolves
    to the DDL row's own ts_ms before schema/ledger, and a restart replays
    the resolved literal."""
    import json

    from debezium_spark.streaming.multi import WIRE_SCHEMA

    users = TableSpec("app", "users", StructType.fromDDL("uid long, name string"),
                      ["uid"], n_buckets=2)
    mte = MultiTableEngine(spark, str(tmp_path / "lake"), [users], default_buckets=2)

    def row(pos, table, op, after):
        return {
            "before_json": None, "after_json": after, "op": op, "ts_ms": 1000 + pos,
            "source": {"file": "binlog.000001", "pos": pos, "gtid": None,
                       "snapshot": None, "db": "app", "table": table,
                       "ts_ms": 1000 + pos},
            "transaction": None,
        }

    create_sql = ("CREATE TABLE app.audit (id BIGINT NOT NULL, "
                  "seen TIMESTAMP DEFAULT CURRENT_TIMESTAMP, "
                  "n INT DEFAULT -1, PRIMARY KEY (id))")
    b0 = [
        row(1, "audit", "l", json.dumps({"content": create_sql})),
        row(2, "audit", "c", '{"id": 7, "seen": null, "n": 3}'),
    ]
    mte.apply_wire_batch(spark.createDataFrame(b0, WIRE_SCHEMA), "b0")
    got = mte.table("app", "audit").read().collect()  # must not raise
    assert [(r["id"], r["n"]) for r in got] == [(7, 3)]
    meta = dict(mte.table("app", "audit").schema()["seen"].metadata or {})
    assert "\x00" not in (meta.get("EXISTS_DEFAULT") or "")
    assert meta.get("EXISTS_DEFAULT", "").startswith("TIMESTAMP '")
    # signed default survives as a plain literal
    meta_n = dict(mte.table("app", "audit").schema()["n"].metadata or {})
    assert meta_n.get("EXISTS_DEFAULT") == "-1"

    # restart replays the catalog ledger — resolved literal, readable table
    mte2 = MultiTableEngine(spark, str(tmp_path / "lake"), [users],
                            default_buckets=2)
    assert ("app", "audit") in mte2.specs
    assert mte2.table("app", "audit").read().count() == 1


def test_catalog_ddl_replays_file_major_across_rotation(spark, tmp_path):
    """Review r5: catalog DDL rows sorted by pos only, so a batch spanning
    a binlog rotation replayed a later file's CREATE before the earlier
    file's DROP of the same name — the CREATE no-opped (key still live),
    then the DROP retired the NEW incarnation. The sort is now file-major
    (file, pos), the schema.py offset-order contract."""
    import json
    from debezium_spark.streaming.multi import WIRE_SCHEMA

    users = TableSpec("app", "users", StructType.fromDDL("uid long, name string"),
                      ["uid"], n_buckets=2)
    mte = MultiTableEngine(spark, str(tmp_path / "lake"), [users], default_buckets=2)

    def row(file, pos, table, op, after):
        return {
            "before_json": None, "after_json": after, "op": op, "ts_ms": pos,
            "source": {"file": file, "pos": pos, "gtid": None, "snapshot": None,
                       "db": "app", "table": table, "ts_ms": pos},
            "transaction": None,
        }

    ddl = lambda f, p, t, sql: row(f, p, t, "l", json.dumps({"content": sql}))  # noqa: E731
    mte.apply_wire_batch(spark.createDataFrame([
        ddl("binlog.000001", 1, "orders",
            "CREATE TABLE app.orders (order_no BIGINT, amount BIGINT, PRIMARY KEY(order_no))"),
        row("binlog.000001", 2, "orders", "c", '{"order_no": 7, "amount": 10}'),
    ], WIRE_SCHEMA), "b0")

    # one batch spans the rotation: DROP late in file 1, re-CREATE with a
    # NEW schema early (small per-file pos) in file 2, then an insert
    mte.apply_wire_batch(spark.createDataFrame([
        ddl("binlog.000001", 900, "orders", "DROP TABLE app.orders"),
        ddl("binlog.000002", 50, "orders",
            "CREATE TABLE app.orders (id INT, qty INT, PRIMARY KEY(id))"),
        row("binlog.000002", 60, "orders", "c", '{"id": 1, "qty": 3}'),
    ], WIRE_SCHEMA), "b1")
    assert ("app", "orders") in mte.specs  # alive: DROP ordered BEFORE CREATE
    assert mte.specs[("app", "orders")].key_cols == ["id"]
    got = mte.table("app", "orders").read().collect()
    assert [(r["id"], r["qty"]) for r in got] == [(1, 3)]


def test_vector_payload_replicates_through_wire_path(spark, tmp_path):
    """An embeddings table — array<float> vector + map<string,string> meta
    — replicates through the wire path end-to-end: the typed from_json
    parse materializes the complex columns, updates last-win by PK, and
    the lake read hands back exact vectors (the CDC story for an ML
    feature/embedding store)."""
    emb = TableSpec(
        "ml", "embeddings",
        StructType.fromDDL(
            "vec_id long, embedding array<float>, meta map<string,string>"),
        key_cols=["vec_id"], n_buckets=2, mode="mor",
    )
    mte = MultiTableEngine(spark, str(tmp_path / "lake"), [emb])
    rows = [
        (0, "ml", "embeddings", "c", None,
         '{"vec_id": 1, "embedding": [0.5, -1.25], "meta": {"model": "m1"}}'),
        (1, "ml", "embeddings", "c", None,
         '{"vec_id": 2, "embedding": [2.0, 3.5], "meta": null}'),
        # re-embed vec 1 with a new model revision
        (2, "ml", "embeddings", "u",
         '{"vec_id": 1, "embedding": [0.5, -1.25], "meta": {"model": "m1"}}',
         '{"vec_id": 1, "embedding": [9.0, 8.0], "meta": {"model": "m2"}}'),
    ]
    mte.apply_wire_batch(_wire(spark, rows), batch_id="b0")
    got = {r["vec_id"]: r for r in
           mte.table("ml", "embeddings").read().collect()}
    assert got[1]["embedding"] == [9.0, 8.0]
    assert got[1]["meta"] == {"model": "m2"}
    assert got[2]["embedding"] == [2.0, 3.5] and got[2]["meta"] is None


def test_same_batch_rename_into_new_db_then_create(spark, tmp_path):
    """Final review r5: known_dbs was frozen before the catalog-DDL walk,
    so RENAME app.users → newdb.accounts followed by CREATE TABLE
    newdb.orders IN THE SAME BATCH skipped the create as
    outside-the-include-list — and since the DDL event is consumed with
    the batch, newdb.orders never registered and all its DML vanished.
    The rename must extend the capture to the new db immediately."""
    import json
    from debezium_spark.streaming.multi import WIRE_SCHEMA

    users = TableSpec("app", "users", StructType.fromDDL("uid long, name string"),
                      ["uid"], n_buckets=2)
    lake = str(tmp_path / "lake")
    mte = MultiTableEngine(spark, lake, [users])

    def row(pos, db, table, op, after, before=None):
        return {"before_json": before, "after_json": after, "op": op,
                "ts_ms": 1000 + pos,
                "source": {"file": "binlog.000001", "pos": pos, "gtid": None,
                           "snapshot": None, "db": db, "table": table,
                           "ts_ms": 1000 + pos},
                "transaction": None}

    mte.apply_wire_batch(spark.createDataFrame([
        row(1, "app", "users", "c", '{"uid": 1, "name": "ada"}'),
        row(2, "app", "users", "l", json.dumps(
            {"content": "RENAME TABLE app.users TO newdb.accounts"})),
        row(3, "newdb", "orders", "l", json.dumps(
            {"content": "CREATE TABLE newdb.orders (order_no BIGINT,"
                        " PRIMARY KEY (order_no))"})),
        row(4, "newdb", "orders", "c", '{"order_no": 7}'),
    ], WIRE_SCHEMA), "b0")

    assert ("newdb", "accounts") in mte.specs
    assert ("newdb", "orders") in mte.specs, \
        "same-batch CREATE in the renamed-into db must register"
    assert [r["order_no"] for r in
            mte.table("newdb", "orders").read().collect()] == [7]

    # the registration survives a restart (catalog ledger replay)
    mte2 = MultiTableEngine(spark, lake, [users])
    assert ("newdb", "orders") in mte2.specs
    mte2.apply_wire_batch(spark.createDataFrame([
        row(5, "newdb", "orders", "c", '{"order_no": 8}'),
    ], WIRE_SCHEMA), "b1")
    assert {r["order_no"] for r in
            mte2.table("newdb", "orders").read().collect()} == {7, 8}
