"""Debezium wire-type → Spark type matrix (functions/typeconv.py), checked
against Python's arbitrary-precision ints/decimals as the oracle."""

from __future__ import annotations

import decimal

import pytest
from pyspark.sql import functions as F

from debezium_spark.functions import typeconv as tc


def _twos(v: int) -> bytes:
    n = max(1, (v.bit_length() + 8) // 8)
    return v.to_bytes(n, "big", signed=True)


@pytest.mark.parametrize(
    "unscaled,scale",
    [
        (12345, 2),
        (-12345, 2),
        (0, 0),
        (255, 0),
        (-1, 0),
        (2**63, 0),                                  # crosses the conv 64-bit split
        (-(2**63) - 1, 0),
        (12345678901234567890123456789, 9),          # 29 digits, 16-byte path
        (-12345678901234567890123456789, 9),
        (10**37 - 1, 18),
        (10**37, 0),                                 # 16-byte positive boundary
        (-(10**37), 0),                              # 16-byte negative (review regression:
                                                     # unsigned-first decode overflowed 38 digits)
    ],
)
def test_decimal_from_unscaled_bytes(spark, unscaled, scale):
    out = (
        spark.createDataFrame([(_twos(unscaled),)], "b binary")
        .select(tc.decimal_from_unscaled_bytes(F.col("b"), scale).alias("d"))
        .first()["d"]
    )
    # Decimal construction from a string is exact (no context rounding)
    assert decimal.Decimal(str(out)) == decimal.Decimal(f"{unscaled}E-{scale}")


def test_variable_scale_decimal(spark):
    rows = [((2, _twos(12345)),), ((0, _twos(-7)),), ((5, _twos(99)),)]
    df = spark.createDataFrame(rows, "v struct<scale:int,value:binary>")
    out = [r["d"] for r in df.select(tc.variable_scale_decimal(F.col("v")).alias("d")).collect()]
    assert [decimal.Decimal(str(x)) for x in out] == [
        decimal.Decimal("123.45"),
        decimal.Decimal("-7"),
        decimal.Decimal("0.00099"),
    ]


def test_decimal_string_and_double_modes_map_specials_to_null(spark):
    df = spark.createDataFrame(
        [("123.45", 123.45), ("NaN", float("nan")), ("-Infinity", float("-inf"))],
        "s string, d double",
    )
    out = df.select(
        tc.decimal_from_string(F.col("s"), 12, 2).alias("fs"),
        tc.decimal_from_double(F.col("d"), 12, 2).alias("fd"),
    ).collect()
    assert str(out[0]["fs"]) == "123.45" and str(out[0]["fd"]) == "123.45"
    assert out[1]["fs"] is None and out[1]["fd"] is None
    assert out[2]["fs"] is None and out[2]["fd"] is None


def test_temporals(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    row = (
        spark.createDataFrame(
            [(19000, 1700000000123, 1700000000123456, 1700000000123456789,
              "2023-11-14T22:13:20.123+00:00", 3600000)],
            "d int, ms long, us long, ns long, z string, tms long",
        )
        .select(
            tc.from_debezium_date(F.col("d")).cast("string").alias("date"),
            tc.from_debezium_timestamp_ms(F.col("ms")).cast("string").alias("ts_ms"),
            tc.from_debezium_timestamp_us(F.col("us")).cast("string").alias("ts_us"),
            tc.from_debezium_timestamp_ns(F.col("ns")).cast("string").alias("ts_ns"),
            tc.from_zoned_timestamp(F.col("z")).cast("string").alias("zts"),
            tc.time_micros(F.col("tms"), "millis").alias("t_us"),
        )
        .first()
    )
    assert row["date"] == "2022-01-08"
    assert row["ts_ms"] == "2023-11-14 22:13:20.123"
    assert row["ts_us"] == "2023-11-14 22:13:20.123456"
    assert row["ts_ns"] == "2023-11-14 22:13:20.123456"
    assert row["zts"] == "2023-11-14 22:13:20.123"
    assert row["t_us"] == 3600000000  # 1h past midnight in micros


def test_binary_bits_geometry(spark):
    df = spark.createDataFrame([("aGVsbG8=", bytes([0x01, 0x02]), b"WKB0", 4326)],
                               "b64 string, bits binary, wkb binary, srid long")
    row = df.select(
        tc.binary_from_base64(F.col("b64")).alias("raw"),
        tc.bits_to_long(F.col("bits")).alias("bits"),
        tc.geometry_struct(F.col("wkb"), F.col("srid")).alias("geo"),
    ).first()
    assert bytes(row["raw"]) == b"hello"
    assert row["bits"] == 513  # little-endian 0x0201
    assert bytes(row["geo"]["wkb"]) == b"WKB0" and row["geo"]["srid"] == 4326


def test_nano_timestamp_integer_floor(spark):
    """Review regression: double division rounded nanos within ~128ns of a
    microsecond boundary UP — 1699999999999999999 ns must floor to
    ...:19.999999, not cross the second boundary."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = spark.createDataFrame(
        [(1699999999999999999,), (1700000000123456999,)], "ns long"
    ).select(tc.from_debezium_timestamp_ns(F.col("ns")).cast("string").alias("t")).collect()
    assert rows[0]["t"] == "2023-11-14 22:13:19.999999"
    assert rows[1]["t"] == "2023-11-14 22:13:20.123456"
    us = spark.createDataFrame([(1999,)], "n long").select(
        tc.time_micros(F.col("n"), "nanos").alias("u")).first()["u"]
    assert us == 1


def test_bits_to_long_multibyte_lead_bytes(spark):
    """Review regression: F.reverse on binary reversed UTF-8 *characters*;
    bytes in the multi-byte-lead range (0xC2-0xF4) were kept glued to the
    following byte. [0xC3, 0x01] little-endian is 0x01C3 = 451."""
    out = spark.createDataFrame([(bytes([0xC3, 0x01]),), (bytes([0xFF, 0x80, 0x01]),)],
                                "b binary").select(
        tc.bits_to_long(F.col("b")).alias("v")).collect()
    assert out[0]["v"] == 0x01C3
    assert out[1]["v"] == 0x0180FF


def test_decimal_16byte_full_range_boundaries(spark):
    """Review regression: (hi-bias)*2^64 overflowed 38 digits for negatives
    within 2^64 of -10^38."""
    for v in (10**38 - 1, -(10**38 - 1), -(10**38 - 12345678)):
        out = (
            spark.createDataFrame([(_twos(v),)], "b binary")
            .select(tc.decimal_from_unscaled_bytes(F.col("b"), 0).alias("d"))
            .first()["d"]
        )
        assert out is not None and int(out) == v


def test_bits_to_long_full_64bit_range(spark):
    """Review regression: unsigned conv + cast('long') overflowed to NULL
    for any value with bit 63 set — the whole upper half of the range."""
    cases = [
        (bytes([0, 0, 0, 0, 0, 0, 0, 0x80]), -(2**63)),   # little-endian MSB set
        (bytes([0xFF] * 8), -1),
        (bytes([0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0x7F]), 2**63 - 1),
        (bytes([0x0A]), 10),
    ]
    out = spark.createDataFrame([(b,) for b, _ in cases], "b binary").select(
        tc.bits_to_long(F.col("b")).alias("v")).collect()
    assert [r["v"] for r in out] == [w for _, w in cases]


def test_negative_wire_scale_decimals(spark):
    """Review regression: BigDecimal-legal negative scales (NUMBER(p,-2))
    silently dropped the 10^|scale| factor."""
    df = spark.createDataFrame(
        [(bytes([5]), -2), (bytes([0xFB]), -3), (bytes([5]), 2)],
        "v binary, sc int",
    )
    out = df.select(
        tc.variable_scale_decimal(
            F.struct(F.col("sc").alias("scale"), F.col("v").alias("value"))
        ).cast("string").alias("vsd"),
        tc.decimal_from_unscaled_bytes(F.col("v"), -2).cast("long").alias("fixed"),
    ).collect()
    assert [r["vsd"] for r in out] == [
        "500.000000000000000000", "-5000.000000000000000000", "0.050000000000000000",
    ]
    assert [r["fixed"] for r in out] == [500, -500, 500]


def test_year_zoned_time_durations(spark):
    """The five r4 temporal classes (time/{Year,ZonedTime,MicroDuration,
    NanoDuration}.java): wire forms → canonical Spark values."""
    df = spark.createDataFrame(
        [
            (2024, "10:15:30+01:00", 1.5e6, 1_234_567_891),
            (1901, "00:30:00+01:00", -2.7e6, 999),       # offset wraps past midnight
            (2155, "23:59:59.250-08:30", 0.0, -1_234_567_891),
        ],
        "y int, zt string, md double, nd long",
    )
    out = df.select(
        tc.from_debezium_year(F.col("y")).alias("yr"),
        tc.from_zoned_time(F.col("zt")).alias("zt"),
        tc.from_micro_duration(F.col("md")).alias("md"),
        tc.from_nano_duration(F.col("nd")).alias("nd"),
    ).collect()
    assert [r["yr"] for r in out] == [2024, 1901, 2155]
    # 10:15:30+01:00 → 09:15:30 UTC; 00:30+01:00 → 23:30 previous day wraps;
    # 23:59:59.25-08:30 → 08:29:59.25 next day wraps
    assert out[0]["zt"] == ((10 * 3600 + 15 * 60 + 30) - 3600) * 1_000_000
    assert out[1]["zt"] == (23 * 3600 + 30 * 60) * 1_000_000
    assert out[2]["zt"] == (8 * 3600 + 29 * 60 + 59) * 1_000_000 + 250_000
    assert [r["md"] for r in out] == [1_500_000, -2_700_000, 0]
    # nanos → micros truncate toward zero (Java integer division), agreeing
    # with from_micro_duration's (long) cast on negative durations (ADVICE r4)
    assert [r["nd"] for r in out] == [1_234_567, 0, -1_234_567]


def test_interval_parse_and_micros(spark):
    """io.debezium.time.Interval ISO strings (Interval.toIsoString forms and
    sparse variants) → components + the MicroDuration.durationMicros
    approximation (days_per_month default 30)."""
    df = spark.createDataFrame(
        [
            ("P1Y2M3DT4H5M6.5S",),
            ("P0Y0M0DT0H0M0S",),
            ("PT15M",),            # sparse: only minutes
            ("P7D",),              # sparse: only days
            ("P-1Y14MT0.000000001S",),  # negative + >12 months + nano frac
        ],
        "s string",
    )
    parsed = df.select(tc.interval_parse(F.col("s")).alias("p")).collect()
    assert parsed[0]["p"].asDict() | {} == {
        "years": 1, "months": 2, "days": 3, "hours": 4, "minutes": 5,
        "seconds": __import__("decimal").Decimal("6.500000000"),
    }
    assert parsed[2]["p"]["minutes"] == 15 and parsed[2]["p"]["days"] == 0
    assert parsed[3]["p"]["days"] == 7
    assert parsed[4]["p"]["years"] == -1 and parsed[4]["p"]["months"] == 14

    # default = MicroDuration.DAYS_PER_MONTH_AVG (365.25/12) parity;
    # dpm=30.0 reproduces the ChronoUnit fallback when passed explicitly
    assert tc.DAYS_PER_MONTH_AVG == 365.25 / 12
    sel = df.select(
        tc.interval_micros(F.col("s")).alias("m"),
        tc.interval_micros(F.col("s"), days_per_month=30.0).alias("m30"),
    ).collect()
    def ref(y, mo, d, h, mi, s, dpm):  # MicroDuration.durationMicros
        ndays = (y * 12 + mo) * dpm + d
        return int((((ndays * 24 + h) * 60 + mi) * 60 + s) * 1e6)
    rows = [(1, 2, 3, 4, 5, 6.5), (0, 0, 0, 0, 0, 0), (0, 0, 0, 0, 15, 0),
            (0, 0, 7, 0, 0, 0), (-1, 14, 0, 0, 0, 1e-9)]
    assert [r["m"] for r in sel] == [ref(*a, 365.25 / 12) for a in rows]
    assert [r["m30"] for r in sel] == [ref(*a, 30.0) for a in rows]


def test_wkb_point_xy(spark):
    """data/geometry/Point.java:70-82 parseWKBPoint parity: 21-byte WKB
    (BOM + uint32 type 1 + two doubles) in both endiannesses, full double
    range incl. -0.0, subnormal min, MAX_VALUE; wrong type / wrong length →
    NULL (reference throws); NaN/Inf bit patterns → null coordinate."""
    import math
    import struct

    def wkb(x, y, little=True):
        if little:
            return b"\x01" + struct.pack("<I", 1) + struct.pack("<dd", x, y)
        return b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", x, y)

    cases = [
        (1.0, -2.5), (0.0, -0.0), (123456.789, -1e-300),
        (5e-324, 1.7976931348623157e308),          # min subnormal, max finite
        (2.2250738585072014e-308, -2.225073858507201e-308),  # normal/subnormal edge
        (math.pi, -math.e),
    ]
    rows = [(i, wkb(x, y)) for i, (x, y) in enumerate(cases)]
    rows += [(100, wkb(cases[0][0], cases[0][1], little=False))]  # big-endian BOM
    rows += [(101, b"\x01" + struct.pack("<I", 2) + struct.pack("<dd", 1.0, 2.0))]  # not a Point
    rows += [(102, wkb(1.0, 2.0)[:-1])]  # truncated
    rows += [(103, b"\x01" + struct.pack("<I", 1) + struct.pack("<dd", float("nan"), float("inf")))]
    df = spark.createDataFrame(rows, "i int, wkb binary")
    out = {
        r["i"]: r["p"]
        for r in df.select("i", tc.wkb_point_xy(F.col("wkb")).alias("p")).collect()
    }
    for i, (x, y) in enumerate(cases):
        assert out[i]["x"] == x and out[i]["y"] == y, (i, out[i])
    # -0.0 sign preserved
    assert math.copysign(1.0, out[1]["y"]) == -1.0
    assert out[100]["x"] == cases[0][0] and out[100]["y"] == cases[0][1]
    assert out[101] is None and out[102] is None
    assert out[103]["x"] is None and out[103]["y"] is None


def test_enum_set_array(spark):
    """io.debezium.data.EnumSet comma-separated wire string → array<string>.
    Empty string = empty set (MySQL SET '' serialization), not [''];
    NULL passes through; single member = one-element array."""
    df = spark.createDataFrame(
        [(0, "a,b,c"), (1, ""), (2, None), (3, "solo")], "i int, s string"
    )
    out = {
        r["i"]: r["v"]
        for r in df.select("i", tc.enum_set_array(F.col("s")).alias("v")).collect()
    }
    assert out[0] == ["a", "b", "c"]
    assert out[1] == []
    assert out[2] is None
    assert out[3] == ["solo"]
