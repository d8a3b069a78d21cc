"""Binary wire codec edge cases (sources/wire.py)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from debezium_spark.functions.serde import from_byte_buffer, to_byte_buffer
from debezium_spark.sources.wire import decode_binary_wire, encode_binary_wire


def test_binary_wire_roundtrip_unicode_and_nulls(spark):
    from debezium_spark import ChangeLogGenerator

    gen = ChangeLogGenerator(spark, seed=13, n_repos=4)
    env = gen.events(300).withColumn(
        "after",
        F.when(
            F.col("after").isNotNull(),
            F.col("after").withField(
                "content", F.concat(F.col("after.content"), F.lit(" ünïcødé→☃"))
            ),
        ),
    )
    payload = env.schema["after"].dataType
    back = decode_binary_wire(encode_binary_wire(env), payload)

    def canon(df):
        return df.select(
            F.col("source.pos").alias("pos"),
            "op",
            F.coalesce(F.col("after.repo"), F.col("before.repo")).alias("repo"),
            F.coalesce(F.col("after.content"), F.lit("")).alias("content"),
        )

    a, b = canon(env), canon(back)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # deletes keep before, null after; creates the reverse
    assert back.filter((F.col("op") == "d") & F.col("after").isNotNull()).count() == 0
    assert back.filter((F.col("op") == "c") & F.col("before").isNotNull()).count() == 0


def test_null_pos_envelope_survives_encode(spark):
    """Advisor regression: a null source.pos reached the Arrow encoder as
    NaN and int(NaN) aborted the whole task — one poison envelope must
    instead ride the wire (sentinel frame) and decode back to a NULL pos so
    downstream quarantine sees it; healthy rows are untouched."""
    from debezium_spark import ChangeLogGenerator

    gen = ChangeLogGenerator(spark, seed=19, n_repos=3)
    env = gen.events(50).withColumn(
        "source",
        F.when(
            F.col("source.pos") == 7,
            F.col("source").withField("pos", F.lit(None).cast("long")),
        ).otherwise(F.col("source")),
    ).withColumn(
        "ts_ms",
        F.when(F.col("source.pos").isNull(), F.lit(None).cast("long"))
        .otherwise(F.col("ts_ms")),
    )
    payload = env.schema["after"].dataType
    back = decode_binary_wire(encode_binary_wire(env), payload)  # must not raise
    assert back.count() == 50
    assert back.filter(F.col("source.pos").isNull()).count() == 1
    # non-poison offsets round-trip exactly
    a = sorted(r["pos"] for r in env.select(F.col("source.pos").alias("pos"))
               .filter(F.col("pos").isNotNull()).collect())
    b = sorted(r["pos"] for r in back.select(F.col("source.pos").alias("pos"))
               .filter(F.col("pos").isNotNull()).collect())
    assert a == b


def test_byte_buffer_converter_roundtrip(spark):
    from debezium_spark import ChangeLogGenerator

    gen = ChangeLogGenerator(spark, seed=17, n_repos=4)
    env = gen.events(200)
    payload = env.schema["after"].dataType
    assert isinstance(payload, StructType)
    back = from_byte_buffer(to_byte_buffer(env), payload=payload)
    a = env.select(F.col("source.pos").alias("p"), F.col("after.content").alias("c"))
    b = back.select(F.col("source.pos").alias("p"), F.col("after.content").alias("c"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
