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


def test_two_char_ops_and_null_file_ride_the_wire(spark):
    """Review r5: ord(op) aborted the task on the fork's 'tc'/'ts' ops, and
    a NULL source.file laundered to '' — which passes the null_offset
    validity check and poisons the file-major fence. Both must round-trip
    intact now (op length-prefixed; '' and NULL distinct on the wire)."""
    from debezium_spark import ChangeLogGenerator

    gen = ChangeLogGenerator(spark, seed=23, n_repos=3)
    env = gen.events(20).withColumn(
        "op", F.when(F.col("source.pos") == 3, F.lit("tc")).otherwise(F.col("op"))
    ).withColumn(
        "source",
        F.when(
            F.col("source.pos") == 5,
            F.col("source").withField("file", F.lit(None).cast("string")),
        ).otherwise(F.col("source")),
    )
    payload = env.schema["after"].dataType
    back = decode_binary_wire(encode_binary_wire(env), payload)
    assert back.filter(F.col("op") == "tc").count() == 1
    assert back.filter(F.col("source.file").isNull()).count() == 1
    assert back.filter(F.col("source.file") == "").count() == 0


def test_corrupt_frame_decodes_to_poison_row_not_task_failure(spark):
    """One flipped-magic or truncated frame must decode to an all-null
    poison row (quarantines as unknown_op downstream), not abort the Arrow
    task — symmetric with the encoder's sentinel contract."""
    from debezium_spark import ChangeLogGenerator

    gen = ChangeLogGenerator(spark, seed=29, n_repos=3)
    env = gen.events(10)
    payload = env.schema["after"].dataType
    frames = encode_binary_wire(env)
    corrupt = frames.limit(3).select(
        F.when(F.monotonically_increasing_id() == 0, F.lit(b"\x00garbage"))
        .when(F.monotonically_increasing_id() == 1, F.expr("substring(frame, 1, 11)"))
        # tail-truncation inside the LAST length-prefixed field: slicing
        # doesn't raise, so only the exact-length gate catches it — without
        # the gate this decodes to a silently clipped payload string
        .otherwise(F.expr("substring(frame, 1, length(frame) - 3)"))
        .alias("frame")
    )
    both = frames.unionByName(corrupt)
    back = decode_binary_wire(both, payload)
    assert back.count() == 13
    poison = back.filter(F.col("op").isNull() & F.col("source.pos").isNull())
    assert poison.count() == 3


def test_wire_longs_above_2_53_exact_with_sibling_null(spark):
    """Review r5: one null pos in an Arrow batch coerced the pandas pos
    column to float64, rounding healthy offsets above 2^53 (PG LSN scale).
    String transport on encode + object dtype on decode keep them exact."""
    from debezium_spark import ChangeLogGenerator

    big = 9007199254740993  # 2^53 + 1
    gen = ChangeLogGenerator(spark, seed=31, n_repos=3)
    env = gen.events(4).withColumn(
        "source",
        F.when(
            F.col("source.pos") == 1,
            F.col("source").withField("pos", F.lit(None).cast("long")),
        ).when(
            F.col("source.pos") == 2,
            F.col("source").withField("pos", F.lit(big).cast("long")),
        ).otherwise(F.col("source")),
    ).coalesce(1)  # one Arrow batch: the null and the big value co-reside
    payload = env.schema["after"].dataType
    back = decode_binary_wire(encode_binary_wire(env), payload)
    got = sorted(
        r["p"] for r in back.select(F.col("source.pos").alias("p"))
        .filter(F.col("p").isNotNull()).collect()
    )
    assert big in got


def test_wire_preserves_source_ts_gtid_snapshot_transaction(spark):
    """Review r5: the v1 decoder fabricated source.ts_ms from the envelope
    ts_ms and dropped gtid/snapshot/transaction. v2 frames carry all of
    them; a null transaction stays null (not a struct of nulls)."""
    from debezium_spark import ChangeLogGenerator

    gen = ChangeLogGenerator(spark, seed=37, n_repos=3)
    env = gen.events(30).withColumn(
        "source", F.col("source").withField("ts_ms", F.col("source.ts_ms") + 7)
    )
    payload = env.schema["after"].dataType
    back = decode_binary_wire(encode_binary_wire(env), payload)

    def canon(df):
        return df.select(
            F.col("source.pos").alias("p"),
            F.col("source.ts_ms").alias("sts"),
            F.col("source.gtid").alias("g"),
            F.col("source.snapshot").alias("sn"),
            F.col("transaction.id").alias("tx"),
            F.col("transaction.total_order").alias("tot"),
        )

    # envelope ts_ms != source.ts_ms by construction here, so the old
    # fabrication (source.ts_ms := envelope ts_ms) would fail this compare
    a, b = canon(env), canon(back)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    nulltx = env.filter(F.col("transaction").isNull()).count()
    assert back.filter(F.col("transaction").isNull()).count() == nulltx


def test_oversized_metadata_field_drops_only_itself(spark):
    """Final review r5: a legitimate-but-huge metadata value (a GTID set
    from a many-UUID topology can exceed the u16 length cap) used to poison
    the WHOLE frame — payload, offsets and op all nulled, a valid change
    event lost to quarantine. Now only the oversized metadata slot
    (gtid/snapshot/tx_id) nulls; the event rides the wire intact. A
    structural identifier (db) at that size is genuine corruption and
    still degrades to the all-null poison frame."""
    from debezium_spark import ChangeLogGenerator

    gen = ChangeLogGenerator(spark, seed=41, n_repos=3)
    env = gen.events(6)
    payload = env.schema["after"].dataType
    big = "a" * 70_000

    huge_gtid = env.withColumn(
        "source", F.col("source").withField("gtid", F.lit(big))
    )
    back = decode_binary_wire(encode_binary_wire(huge_gtid), payload)
    assert back.where(F.col("op").isNull()).count() == 0
    assert back.where(F.col("source.gtid").isNotNull()).count() == 0
    # payload and offsets intact
    want = env.select(F.col("source.pos").alias("p"), F.col("op").alias("o"))
    got = back.select(F.col("source.pos").alias("p"), F.col("op").alias("o"))
    assert want.exceptAll(got).count() == 0 and got.exceptAll(want).count() == 0

    huge_db = env.withColumn(
        "source", F.col("source").withField("db", F.lit(big))
    )
    back = decode_binary_wire(encode_binary_wire(huge_db), payload)
    assert back.where(F.col("op").isNull()).count() == env.count()
