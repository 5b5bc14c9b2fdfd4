"""Vitess/MySQL type system → Spark SQL types.

Two-stage mapping mirroring the reference semantics (not the code):
stage 1 resolves a VStream field type to a JDBC-ish family
(reference: ``VitessType.resolve``, src/main/java/io/debezium/connector/vitess/VitessType.java:89-157);
stage 2 picks the emitted Spark type + conversion behavior per column
metadata and connector modes
(reference: ``VitessValueConverter``, VitessValueConverter.java:81-128,171-217).

All VStream values arrive as UTF-8 bytes; the reference parses them row at a
time (connection/VitessColumnValue.java:40-88). Here raw values are strings in
an Arrow batch and conversion is a Catalyst ``cast``/expression — vectorized,
JVM-side.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum
from typing import Optional

from pyspark.sql import types as T


class BigIntUnsignedHandlingMode(str, Enum):
    """How BIGINT UNSIGNED values are emitted.

    Reference: ``bigint.unsigned.handling.mode``
    (VitessConnectorConfig.java:123-186,471-480; VitessValueConverter.java:226-261).
    """

    STRING = "string"  # default: lossless, hash-compatible
    PRECISE = "precise"  # DecimalType(20,0)
    LONG = "long"  # lossy two's-complement


class BinaryHandlingMode(str, Enum):
    """Reference: ``binary.handling.mode`` (bytes/base64/hex),
    exercised in VitessConnectorIT.java:899-936."""

    BYTES = "bytes"
    BASE64 = "base64"
    HEX = "hex"


class TemporalPrecisionMode(str, Enum):
    """Reference: ``time.precision.mode`` ∈ {adaptive_time_microseconds,
    connect, isostring}; plain ``adaptive`` rejected
    (VitessConnectorConfig.java:493-514)."""

    ADAPTIVE_TIME_MICROSECONDS = "adaptive_time_microseconds"
    CONNECT = "connect"
    ISOSTRING = "isostring"


# VStream field type name → canonical JDBC-ish family.
# Reference: VitessType.java:89-157.
_VSTREAM_TO_FAMILY = {
    "INT8": "SMALLINT",
    "UINT8": "SMALLINT",
    "INT16": "SMALLINT",
    "UINT16": "INTEGER",
    "INT24": "INTEGER",
    "UINT24": "INTEGER",
    "INT32": "INTEGER",
    "UINT32": "BIGINT",
    "INT64": "BIGINT",
    "UINT64": "UINT64",
    "FLOAT32": "FLOAT",
    "FLOAT64": "DOUBLE",
    "DECIMAL": "VARCHAR",
    "VARCHAR": "VARCHAR",
    "CHAR": "VARCHAR",
    "TEXT": "VARCHAR",
    "JSON": "JSON",
    "ENUM": "ENUM",
    "SET": "SET",
    "YEAR": "YEAR",
    "DATE": "DATE",
    "TIME": "TIME",
    "DATETIME": "DATETIME",
    "TIMESTAMP": "TIMESTAMP",
    "BLOB": "BLOB",
    "BINARY": "BINARY",
    "VARBINARY": "BINARY",
    "BIT": "BIT",
}

# Column types whose BLOB/BINARY wire type is really text
# (reference: VitessType.java:113-132 — *TEXT column stays string, CHAR/VARCHAR/
# ENUM/SET sent as VARBINARY stay string).
_TEXTUAL_OVERRIDES = re.compile(r"(text|char|enum|set)", re.IGNORECASE)


@dataclass(frozen=True)
class ResolvedType:
    """Outcome of type resolution for one column."""

    family: str  # JDBC-ish stage-1 family
    spark_type: T.DataType  # decoded Spark type in before/after struct
    logical_name: Optional[str] = None  # Debezium semantic-type analog
    enum_values: tuple[str, ...] = ()  # permitted values for ENUM/SET
    precision: Optional[int] = None  # fractional-second precision for temporals
    # FieldEvent.enum_set_string_values: ENUM/SET arrive as literal STRINGS
    # (copy phase / newer Vitess) — conversion must NOT reinterpret a
    # numeric-looking literal ('2' in ENUM('2','1')) as an index/bitmask
    enum_string_literals: bool = False
    # the TemporalPrecisionMode this type was RESOLVED under (temporal
    # families only; None elsewhere) — decode paths that take a pre-resolved
    # schema use it to reject a contradictory temporal_mode kwarg instead of
    # silently ignoring it
    temporal_mode: Optional["TemporalPrecisionMode"] = None


def parse_enum_or_set_values(column_type: str) -> tuple[str, ...]:
    """Parse ``enum('a','b')`` / ``set('a','b')`` into permitted values.

    Handles MySQL's doubled-quote escape (``''`` inside a literal).
    Reference semantics: VitessType.java:164-217.
    """
    m = re.match(r"^\s*(enum|set)\s*\((.*)\)\s*$", column_type, re.IGNORECASE | re.DOTALL)
    if not m:
        return ()
    body = m.group(2)
    values: list[str] = []
    buf: list[str] = []
    in_quote = False
    i = 0
    while i < len(body):
        ch = body[i]
        if in_quote:
            if ch == "'":
                if i + 1 < len(body) and body[i + 1] == "'":  # escaped quote
                    buf.append("'")
                    i += 1
                else:
                    in_quote = False
                    values.append("".join(buf))
                    buf = []
            else:
                buf.append(ch)
        elif ch == "'":
            in_quote = True
        i += 1
    return tuple(values)


def resolve(
    field_type: str,
    column_type: str = "",
    *,
    decimals: Optional[int] = None,
    bigint_unsigned_mode: BigIntUnsignedHandlingMode = BigIntUnsignedHandlingMode.STRING,
    temporal_mode: TemporalPrecisionMode = TemporalPrecisionMode.ADAPTIVE_TIME_MICROSECONDS,
    binary_mode: BinaryHandlingMode = BinaryHandlingMode.BYTES,
) -> ResolvedType:
    """Resolve a VStream field to its decoded Spark type.

    Mirrors the semantics of VitessType.resolve (VitessType.java:89-157) +
    VitessValueConverter.schemaBuilder (VitessValueConverter.java:81-128);
    Spark-native expression: the mapping table in SURVEY.md §1.3.

    Temporal families record the ``temporal_mode`` they were resolved under
    (``ResolvedType.temporal_mode``), so decode paths taking a pre-resolved
    schema can reject a contradictory mode kwarg loudly.
    """
    import dataclasses

    rt = _resolve_type(
        field_type,
        column_type,
        decimals=decimals,
        bigint_unsigned_mode=bigint_unsigned_mode,
        temporal_mode=temporal_mode,
        binary_mode=binary_mode,
    )
    if rt.family in ("DATE", "TIME", "DATETIME", "TIMESTAMP"):
        rt = dataclasses.replace(rt, temporal_mode=temporal_mode)
    return rt


def _resolve_type(
    field_type: str,
    column_type: str = "",
    *,
    decimals: Optional[int] = None,
    bigint_unsigned_mode: BigIntUnsignedHandlingMode = BigIntUnsignedHandlingMode.STRING,
    temporal_mode: TemporalPrecisionMode = TemporalPrecisionMode.ADAPTIVE_TIME_MICROSECONDS,
    binary_mode: BinaryHandlingMode = BinaryHandlingMode.BYTES,
) -> ResolvedType:
    ft = field_type.upper()
    family = _VSTREAM_TO_FAMILY.get(ft, "OTHER")

    # BLOB/BINARY columns that are actually textual per their column type
    if family in ("BLOB", "BINARY") and _TEXTUAL_OVERRIDES.search(column_type or ""):
        family = "VARCHAR"

    if family == "SMALLINT":
        return ResolvedType(family, T.ShortType())
    if family == "INTEGER":
        return ResolvedType(family, T.IntegerType())
    if family == "BIGINT":
        return ResolvedType(family, T.LongType())
    if family == "UINT64":
        if bigint_unsigned_mode is BigIntUnsignedHandlingMode.PRECISE:
            return ResolvedType(family, T.DecimalType(20, 0))
        if bigint_unsigned_mode is BigIntUnsignedHandlingMode.LONG:
            return ResolvedType(family, T.LongType())
        return ResolvedType(family, T.StringType())
    if family == "FLOAT":
        # Reference emits FLOAT64 for FLOAT32 (VitessType.java:148-149)
        return ResolvedType(family, T.DoubleType())
    if family == "DOUBLE":
        return ResolvedType(family, T.DoubleType())
    if family == "JSON":
        return ResolvedType(family, T.StringType(), logical_name="io.debezium.data.Json")
    if family == "ENUM":
        return ResolvedType(
            family, T.StringType(), logical_name="io.debezium.data.Enum",
            enum_values=parse_enum_or_set_values(column_type),
        )
    if family == "SET":
        return ResolvedType(
            family, T.StringType(), logical_name="io.debezium.data.EnumSet",
            enum_values=parse_enum_or_set_values(column_type),
        )
    if family == "YEAR":
        return ResolvedType(family, T.IntegerType(), logical_name="io.debezium.time.Year")
    if family == "DATE":
        if temporal_mode is TemporalPrecisionMode.ISOSTRING:
            return ResolvedType(family, T.StringType())
        return ResolvedType(family, T.DateType())
    if family == "TIME":
        # No Spark TimeType: micros-since-midnight LongType (reference
        # io.debezium.time.MicroTime, VitessValueConverter.java:365-399);
        # connect mode = millis (org.apache.kafka.connect.data.Time analog,
        # VitessValueConverter.java:128-152 via JdbcValueConverters connect)
        if temporal_mode is TemporalPrecisionMode.ISOSTRING:
            return ResolvedType(family, T.StringType(), precision=decimals)
        if temporal_mode is TemporalPrecisionMode.CONNECT:
            return ResolvedType(
                family, T.LongType(),
                logical_name="org.apache.kafka.connect.data.Time", precision=decimals,
            )
        return ResolvedType(
            family, T.LongType(), logical_name="io.debezium.time.MicroTime", precision=decimals
        )
    if family == "DATETIME":
        if temporal_mode is TemporalPrecisionMode.ISOSTRING:
            return ResolvedType(family, T.StringType(), precision=decimals)
        if temporal_mode is TemporalPrecisionMode.CONNECT:
            # Connect Timestamp = epoch millis: same Spark type, value
            # truncated to millisecond precision at conversion
            return ResolvedType(
                family, T.TimestampNTZType(),
                logical_name="org.apache.kafka.connect.data.Timestamp",
                precision=decimals,
            )
        return ResolvedType(family, T.TimestampNTZType(), precision=decimals)
    if family == "TIMESTAMP":
        # UTC ZonedTimestamp string in reference default mode
        # (VitessValueConverter.java:446-511); Spark-native TimestampType (UTC).
        # NOTE: TIMESTAMP is deliberately EXCLUDED from isostring —
        # VitessValueConverter.isTemporal() covers only DATE/TIME/DATETIME
        # (VitessValueConverter.java:138-146), so TIMESTAMP always goes
        # through ZonedTimestamp and emits 'yyyy-MM-ddTHH:mm:ss[.f]Z'
        # regardless of time.precision.mode=isostring.
        if temporal_mode is TemporalPrecisionMode.CONNECT:
            return ResolvedType(
                family, T.TimestampType(),
                logical_name="org.apache.kafka.connect.data.Timestamp",
                precision=decimals,
            )
        return ResolvedType(
            family, T.StringType(), logical_name="io.debezium.time.ZonedTimestamp",
            precision=decimals,
        )
    if family == "VARCHAR":
        return ResolvedType(family, T.StringType())
    if family in ("BLOB", "BINARY"):
        if binary_mode in (BinaryHandlingMode.BASE64, BinaryHandlingMode.HEX):
            return ResolvedType(family, T.StringType())
        return ResolvedType(family, T.BinaryType())
    if family == "BIT":
        # BIT(1) → boolean, BIT(N>1) → bytes (VitessValueConverter.java:154-167)
        if decimals == 1 or re.fullmatch(r"bit\(1\)", (column_type or "").lower()):
            return ResolvedType(family, T.BooleanType())
        return ResolvedType(family, T.BinaryType())
    # Unknown type: dropped unless include.unknown.datatypes
    # (VitessType.java:154-155, VitessValueConverter.java:120-122)
    return ResolvedType("OTHER", T.BinaryType())


@dataclass(frozen=True)
class ColumnMetaData:
    """Schema-registry column entry.

    Reference analog: connection/ColumnMetaData.java:18-45 +
    connection/KeyMetaData.java:12-24.
    """

    name: str
    resolved: ResolvedType
    optional: bool = True
    is_primary_key: bool = False
    is_unique_key: bool = False


# MySQL protocol column-definition flags as delivered in VStream FIELD events
# (public mysql_com.h constants; reference reads them at
# VStreamOutputMessageDecoder.java:360-369).
NOT_NULL_FLAG = 0x1
PRI_KEY_FLAG = 0x2
UNIQUE_KEY_FLAG = 0x4


def field_event_to_schema(
    keyspace: str,
    shard: str,
    table: str,
    fields: "list[dict] | list",
    *,
    enum_set_string_values: bool = False,
    **resolve_modes,
) -> "TableSchema":
    """D4: one FIELD event → a :class:`TableSchema` registry entry.

    Reference: VStreamOutputMessageDecoder.handleFieldMessage
    (VStreamOutputMessageDecoder.java:331-377) — per column: validate the
    name, resolve the VStream type against the MySQL column type, derive
    key/optional metadata from the protocol flags.

    ``enum_set_string_values`` mirrors ``FieldEvent.enum_set_string_values``
    (set during VStream Copy and on newer Vitess): ENUM/SET values arrive as
    literal strings instead of indexes/bitmasks. The flag is threaded into
    each ENUM/SET column's :class:`ResolvedType` so ``convert_raw`` skips
    index/bitmask reinterpretation entirely — relying on "non-numeric
    literals pass through" corrupts permitted values that LOOK numeric
    (ENUM('2','1'): literal '2' would decode as index 2 → '1').
    """
    columns: list[ColumnMetaData] = []
    for f in fields:
        get = f.get if isinstance(f, dict) else lambda k, d=None: getattr(f, k, d)
        name = get("name", "")
        validate_column_name(name)
        flags = int(get("flags", 0) or 0)
        resolved = resolve(get("type", "") or "", get("column_type", "") or "", **resolve_modes)
        if enum_set_string_values and resolved.family in ("ENUM", "SET"):
            import dataclasses

            resolved = dataclasses.replace(resolved, enum_string_literals=True)
        columns.append(
            ColumnMetaData(
                name=name,
                resolved=resolved,
                optional=(flags & NOT_NULL_FLAG) == 0,
                is_primary_key=(flags & PRI_KEY_FLAG) != 0,
                is_unique_key=(flags & UNIQUE_KEY_FLAG) != 0,
            )
        )
    return TableSchema(keyspace, shard, table, columns)


_ANONYMIZED = re.compile(r"^@\d+$")


def validate_column_name(name: str) -> None:
    """Reject empty / ``@``-anonymized names (Vitess schema-reload bug guard).

    Reference: VStreamOutputMessageDecoder.java:456-470.
    """
    if not name:
        raise ValueError("empty column name in FIELD event")
    if _ANONYMIZED.match(name):
        raise ValueError(
            f"illegal anonymized column name {name!r}: vstream FIELD event not fully parsed"
        )


def select_key_columns(columns: list[ColumnMetaData]) -> list[str]:
    """Record-key selection: all PK columns; else first unique-key column;
    else keyless. Reference: VStreamOutputMessageDecoder.java:436-447."""
    pks = [c.name for c in columns if c.is_primary_key]
    if pks:
        return pks
    for c in columns:
        if c.is_unique_key:
            return [c.name]
    return []


@dataclass
class TableSchema:
    """One (keyspace, shard, table)'s inferred schema."""

    keyspace: str
    shard: str
    table: str
    columns: list[ColumnMetaData] = field(default_factory=list)

    @property
    def key_columns(self) -> list[str]:
        return select_key_columns(self.columns)

    def spark_struct(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c.name, c.resolved.spark_type, c.optional) for c in self.columns]
        )


SYSTEM_SCHEMAS = frozenset({"mysql", "performance_schema", "sys", "information_schema"})


class SchemaRegistry:
    """Per-(shard, table) schema registry built from FIELD events.

    The shard acts as the catalog component so each shard's schema evolves
    independently during online DDL (reference: VitessDatabaseSchema.java:105-117).
    New FIELD events overwrite the entry (VitessDatabaseSchema.java:86-99).
    """

    def __init__(self) -> None:
        self._tables: dict[tuple[str, str, str], TableSchema] = {}

    @staticmethod
    def _key(keyspace: str, shard: str, table: str) -> tuple[str, str, str]:
        return (keyspace, shard, table)

    def register(self, schema: TableSchema) -> None:
        for c in schema.columns:
            validate_column_name(c.name)
        self._tables[self._key(schema.keyspace, schema.shard, schema.table)] = schema

    def apply_field_event(
        self,
        keyspace: str,
        shard: str,
        table: str,
        fields: list,
        *,
        enum_set_string_values: bool = False,
        **resolve_modes,
    ) -> TableSchema:
        """X2/X3: FIELD event → registry overwrite for that (shard, table).
        Online DDL mid-stream = a new FIELD event = a new entry here
        (VitessDatabaseSchema.applySchemaChangesForTable, :86-99)."""
        schema = field_event_to_schema(
            keyspace, shard, table, fields,
            enum_set_string_values=enum_set_string_values, **resolve_modes,
        )
        self.register(schema)
        return schema

    def get(self, keyspace: str, shard: str, table: str) -> Optional[TableSchema]:
        return self._tables.get(self._key(keyspace, shard, table))

    def tables(self) -> list[TableSchema]:
        return list(self._tables.values())
