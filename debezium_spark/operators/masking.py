"""Column maskers — the reference's ColumnMappers
(``relational/mapping/MaskStrings.java`` — constant mask or salted SHA-256 —
and ``relational/mapping/TruncateStrings.java``), as nested-field
transformations on both payloads. Pure Catalyst (F.sha2 / F.substring):
no Python on the hot path."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _map_payload_field(env: DataFrame, field: str, fn, scope_pred=None) -> DataFrame:
    """Apply ``fn`` to a payload field on both sides. ``scope_pred`` (a row
    predicate, e.g. on source.db/source.table) restricts the transform to
    matching rows — the reference scopes ColumnMappers by fully-qualified
    column (``relational/mapping/*``, Selectors), not by bare field name."""
    out = env
    for side in ("after", "before"):
        new_val = fn(F.col(f"{side}.{field}"))
        if scope_pred is not None:
            new_val = F.when(scope_pred, new_val).otherwise(F.col(f"{side}.{field}"))
        out = out.withColumn(
            side,
            F.when(
                F.col(side).isNotNull(),
                F.col(side).withField(field, new_val),
            ),
        )
    return out


def mask_column(env: DataFrame, field: str, mask: str = "***", scope_pred=None) -> DataFrame:
    """MaskStrings constant-mask mode."""
    return _map_payload_field(
        env, field, lambda c: F.when(c.isNotNull(), F.lit(mask)), scope_pred
    )


def hash_mask_column(
    env: DataFrame, field: str, salt: str, algo: str = "SHA-256", scope_pred=None
) -> DataFrame:
    """MaskStrings hash mode: salted hash (MaskStrings.java
    HashValueConverter). Algorithms map to JVM-side functions: SHA-224/
    256/384/512 via ``sha2``, SHA-1 via ``sha1``, MD5 via ``md5``."""
    a = algo.upper().replace("-", "")
    if a in ("SHA224", "SHA256", "SHA384", "SHA512"):
        bits = int(a[3:])
        fn = lambda c: F.sha2(c, bits)  # noqa: E731
    elif a == "SHA1":
        fn = F.sha1
    elif a == "MD5":
        fn = F.md5
    else:
        raise ValueError(f"unsupported mask hash algorithm {algo!r}")
    return _map_payload_field(
        env, field, lambda c: F.when(c.isNotNull(), fn(F.concat(F.lit(salt), c))),
        scope_pred,
    )


def truncate_column(env: DataFrame, field: str, length: int, scope_pred=None) -> DataFrame:
    """TruncateStrings: truncate to n chars."""
    return _map_payload_field(env, field, lambda c: F.substring(c, 1, length), scope_pred)
