"""Target-table metadata for sink statement generation.

The reference sinks query the TARGET database's ``information_schema`` per
table to learn column order, data types, scales and primary-key membership
(``debezium-connector-mysql/sink/util/SqlTools.java:72-117``
``getTableMetaData``; ``sink/object/ColumnMetaData.java``,
``TableMetaData.java``). There is no JDBC target in this engine, so the same
facts are either given explicitly or derived from the lake table's Spark
schema plus the key columns — the information the engine already owns.

Column type names use the TARGET dialect's ``information_schema`` vocabulary
(``character varying``, ``bytea``, ``timestamp without time zone`` … for an
openGauss target; ``varchar``, ``blob``, ``datetime`` … for a MySQL target),
because that is what drives per-type literal rendering in the reference's
``DebeziumValueConverters`` and in :mod:`debezium_spark.sink.sqlgen`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
    TimestampType,
)


@dataclass(frozen=True)
class ColumnMeta:
    """One target column — ``sink/object/ColumnMetaData.java``."""

    name: str
    type_name: str
    is_primary: bool = False
    #: numeric scale (``numeric_scale`` in information_schema), -1 = none
    scale: int = -1
    #: character/bit maximum length, -1 = none
    length: int = -1


@dataclass(frozen=True)
class TableMeta:
    """Target table identity + ordered columns — ``TableMetaData.java``."""

    schema_name: str
    table_name: str
    columns: tuple[ColumnMeta, ...] = field(default_factory=tuple)

    def primary_columns(self) -> tuple[ColumnMeta, ...]:
        """PK columns; the WHERE fallback when empty is ALL columns
        (``SqlTools.getWhereConditionList``)."""
        return tuple(c for c in self.columns if c.is_primary)


# Spark type → openGauss / PostgreSQL information_schema data_type
_OPENGAUSS_TYPES: list[tuple[type, str]] = [
    (ByteType, "tinyint"),
    (ShortType, "smallint"),
    (IntegerType, "integer"),
    (LongType, "bigint"),
    (FloatType, "real"),
    (DoubleType, "double precision"),
    (StringType, "text"),
    (BinaryType, "bytea"),
    (DateType, "date"),
    (TimestampType, "timestamp without time zone"),
    (BooleanType, "boolean"),
]

# Spark type → MySQL information_schema data_type
_MYSQL_TYPES: list[tuple[type, str]] = [
    (ByteType, "tinyint"),
    (ShortType, "smallint"),
    (IntegerType, "int"),
    (LongType, "bigint"),
    (FloatType, "float"),
    (DoubleType, "double"),
    (StringType, "text"),
    (BinaryType, "blob"),
    (DateType, "date"),
    (TimestampType, "datetime"),
    (BooleanType, "bit"),
]


def _type_name(dt: DataType, dialect: str) -> tuple[str, int]:
    if isinstance(dt, DecimalType):
        return ("numeric" if dialect == "opengauss" else "decimal", dt.scale)
    table = _OPENGAUSS_TYPES if dialect == "opengauss" else _MYSQL_TYPES
    for klass, name in table:
        if isinstance(dt, klass):
            return (name, -1)
    raise ValueError(f"no {dialect} type mapping for Spark type {dt.simpleString()}")


def table_meta_from_schema(
    schema_name: str,
    table_name: str,
    spark_schema: StructType,
    key_cols: list[str],
    dialect: str = "opengauss",
    type_overrides: dict[str, str] | None = None,
) -> TableMeta:
    """Derive :class:`TableMeta` from a Spark payload schema.

    ``type_overrides`` maps column name → target type name for columns whose
    target type is not implied by the Spark type (e.g. a string column that
    is ``json`` or ``enum`` on the target, a binary column that is a
    ``point``) — the cases the reference learns from the target's
    information_schema.
    """
    overrides = type_overrides or {}
    cols = []
    for f in spark_schema.fields:
        if f.name in overrides:
            tname, scale = overrides[f.name], -1
            if isinstance(f.dataType, DecimalType):
                scale = f.dataType.scale
        else:
            tname, scale = _type_name(f.dataType, dialect)
        cols.append(
            ColumnMeta(f.name, tname, is_primary=f.name in key_cols, scale=scale)
        )
    return TableMeta(schema_name, table_name, tuple(cols))
