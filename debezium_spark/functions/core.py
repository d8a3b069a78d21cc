"""Shared column functions — all pure Catalyst (no Python UDFs).

``content_sha256`` is the per-row correctness invariant of the north rule
(sha256(content) equality vs the oracle final state); ``row_digest`` /
``table_digest_agg`` are the aggregate digests of FIXTURES.md F6."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def content_sha256(col: str = "content") -> Column:
    return F.sha2(F.col(col), 256)


def row_digest(cols: list[str]) -> Column:
    """sha256 over a canonical pipe-joined row rendering (F6 secondary
    invariant). Canonical = injective: NULLs render as an explicit sentinel
    (``concat_ws`` silently SKIPS nulls, colliding ('a',NULL,'b') with
    ('a','b',NULL)) and backslash/pipe are escaped so values containing the
    delimiter cannot collide either (review r4). The sentinel ``\\0``
    (lone backslash + digit zero) cannot survive the escape — every
    backslash in an escaped value is doubled or precedes ``|`` — so no
    genuine string value can collide with NULL (ADVICE r4: the previous
    ``\\x00NULL`` sentinel contained no escapable char and was reachable)."""
    def canon(c: str) -> Column:
        s = F.col(c).cast("string")
        esc = F.replace(
            F.replace(s, F.lit("\\"), F.lit("\\\\")), F.lit("|"), F.lit("\\|")
        )
        return F.coalesce(esc, F.lit("\\0"))

    return F.sha2(F.concat_ws("|", *[canon(c) for c in cols]), 256)


def table_digest_agg(cols: list[str]) -> Column:
    """Order-insensitive whole-table digest: xor-free commutative digest via
    sum of the first 15 hex chars of each row digest (exact in decimal)."""
    piece = F.conv(F.substring(row_digest(cols), 1, 15), 16, 10).cast("decimal(38,0)")
    return F.sum(piece)


def salted_key(key_cols: list[str], salt_factor: int) -> Column:
    """Secondary spread term for the merge-write repartition: a pure
    function of the key, so it spreads the DISTINCT keys of a hot bucket
    across ``salt_factor`` sub-partitions — it does NOT split the rows of
    one hot key (being key-deterministic, every row of a key lands in one
    partition; final review r5 corrected the docstring's claim otherwise).
    That is the right tool here because merge inputs are deduped to one
    row per key, making bucket-level skew — many keys hashing to one
    bucket — the only skew that exists. To spread a genuinely hot key in
    NON-deduped data, salt with a per-row term (e.g.
    ``pmod(xxhash64(monotonically_increasing_id()), k)``) and re-group."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols], F.lit(0x5A17)), F.lit(salt_factor))
