"""Avro binary converter (functions/avro.py): spec-vector byte checks,
frame layout, exact envelope round-trip, schema-mismatch guard."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from debezium_spark.functions.avro import (
    MAGIC,
    _zigzag_decode,
    _zigzag_encode,
    avro_schema_json,
    avro_to_envelope,
    envelope_to_avro,
    from_avro,
    schema_id,
    to_avro,
)


def test_zigzag_spec_vectors():
    """The Avro spec's own binary-encoding examples."""
    vectors = {0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03", 2: b"\x04",
               -64: b"\x7f", 64: b"\x80\x01", 8192: b"\x80\x80\x01"}
    for n, b in vectors.items():
        assert _zigzag_encode(n) == b, n
        assert _zigzag_decode(b, 0) == (n, len(b)), n
    # 64-bit extremes survive
    for n in (2**62, -(2**62), 2**63 - 1, -(2**63)):
        enc = _zigzag_encode(n)
        assert _zigzag_decode(enc, 0)[0] == n


def test_frame_layout_hand_decoded(spark):
    """A frame is magic + 4-byte schema id + datum; the datum is decodable
    with nothing but the spec rules (no library, no this-module decoder)."""
    df = spark.createDataFrame([(7, "hi")], "k long, v string")
    frame = bytes(to_avro(df).first()["avro"])
    assert frame[:1] == MAGIC
    sid = int.from_bytes(frame[1:5], "big")
    assert sid == schema_id(StructType.fromDDL("k long, v string"))
    # hand-decode: union(1) zigzag, long 7 zigzag, union(1), len 2, 'hi'
    assert frame[5:] == b"\x02" + b"\x0e" + b"\x02" + b"\x04" + b"hi"


def test_envelope_roundtrip_exact(spark):
    from debezium_spark import ChangeLogGenerator

    gen = ChangeLogGenerator(spark, seed=33, n_repos=4)
    env = gen.events(300)
    payload = env.schema["after"].dataType
    back = avro_to_envelope(envelope_to_avro(env), payload)

    def canon(df):
        return df.select(
            F.col("source.pos").alias("p"), "op",
            F.coalesce(F.col("after.content"), F.col("before.content")).alias("c"),
            F.col("transaction.id").alias("tx"),
            F.col("source.gtid").alias("g"),
        )

    a, b = canon(env), canon(back)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # deletes keep before/null after through the unions
    assert back.filter((F.col("op") == "d") & F.col("after").isNotNull()).count() == 0


def test_longs_above_2_53_roundtrip_exactly(spark):
    """Review regression: nullable long columns crossed the Arrow->pandas
    boundary as float64, silently rounding values above 2^53 (PG LSN-scale
    offsets). The codec ships integers as strings outbound and decodes to
    Python-int object columns inbound."""
    big = 9007199254740993  # 2^53 + 1: float64 rounds this to ...992
    df = spark.createDataFrame(
        [(1, big), (2, None), (3, -big)], "k long, v long"
    )
    out = {r["k"]: r["v"] for r in from_avro(
        to_avro(df), StructType.fromDDL("k long, v long")).collect()}
    assert out == {1: big, 2: None, 3: -big}


def test_schema_mismatch_rejected(spark):
    df = spark.createDataFrame([(1, "x")], "k long, v string")
    frames = to_avro(df)
    wrong = StructType.fromDDL("k long, v string, extra long")
    with pytest.raises(Exception, match="schema id mismatch"):
        from_avro(frames, wrong).collect()


def test_writer_schema_is_valid_avro_json(spark):
    from debezium_spark import ChangeLogGenerator

    env = ChangeLogGenerator(spark, seed=1, n_repos=2).events(5)
    doc = json.loads(avro_schema_json(env.schema))
    assert doc["type"] == "record"
    names = [f["name"] for f in doc["fields"]]
    assert names == ["before", "after", "op", "ts_ms", "source", "transaction"]
    # every field is a nullable union
    assert all(isinstance(f["type"], list) and f["type"][0] == "null"
               for f in doc["fields"])


def test_float_nan_distinct_from_null_roundtrip(spark):
    """ADVICE r3 #4: a real IEEE NaN payload value must round-trip as NaN
    (the spec encodes it exactly), while a null keeps the union's null
    branch; infinities and non-dyadic doubles stay bit-exact."""
    import math

    from debezium_spark.functions.avro import from_avro, to_avro
    from pyspark.sql.types import StructType

    df = spark.createDataFrame(
        [(1, float("nan"), 1.5), (2, None, float("inf")),
         (3, 0.1, float("-inf")), (4, -2.5e-300, None)],
        "id long, d double, f double",
    )
    schema = StructType.fromDDL("id long, d double, f double")
    back = {r["id"]: r for r in from_avro(to_avro(df), schema).collect()}
    assert math.isnan(back[1]["d"]) and back[1]["f"] == 1.5
    assert back[2]["d"] is None and back[2]["f"] == float("inf")
    assert back[3]["d"] == 0.1 and back[3]["f"] == float("-inf")
    assert back[4]["d"] == -2.5e-300 and back[4]["f"] is None


def test_nested_float_nan_roundtrip(spark):
    """Review r4 #1: a NaN nested inside a struct column (the envelope
    before/after shape) must round-trip as NaN, not null — at every
    nesting depth."""
    import math

    from debezium_spark.functions.avro import from_avro, to_avro
    from pyspark.sql.types import StructType

    df = spark.range(2).selectExpr(
        "id",
        "CASE WHEN id = 0 THEN named_struct('amount', double('NaN'), "
        "  'inner', named_struct('f', 1.5D)) "
        "ELSE named_struct('amount', CAST(NULL AS DOUBLE), "
        "  'inner', named_struct('f', double('-Infinity'))) END AS payload",
    )
    schema = StructType.fromDDL(
        "id long, payload struct<amount: double, inner: struct<f: double>>"
    )
    back = {r["id"]: r for r in from_avro(to_avro(df), schema).collect()}
    assert math.isnan(back[0]["payload"]["amount"])
    assert back[0]["payload"]["inner"]["f"] == 1.5
    assert back[1]["payload"]["amount"] is None
    assert back[1]["payload"]["inner"]["f"] == float("-inf")
