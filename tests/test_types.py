"""Type-resolution tests, modeled on the reference's VitessTypeTest /
VitessValueConverterTest coverage (SURVEY.md §5 tier 1)."""

import pytest
from pyspark.sql import types as T

from debezium_connector_vitess_spark.types import (
    BigIntUnsignedHandlingMode,
    BinaryHandlingMode,
    ColumnMetaData,
    SchemaRegistry,
    TableSchema,
    TemporalPrecisionMode,
    parse_enum_or_set_values,
    resolve,
    select_key_columns,
    validate_column_name,
)


@pytest.mark.parametrize(
    "ftype,expected",
    [
        ("INT8", T.ShortType()),
        ("UINT8", T.ShortType()),
        ("INT16", T.ShortType()),
        ("UINT16", T.IntegerType()),
        ("INT24", T.IntegerType()),
        ("UINT24", T.IntegerType()),
        ("INT32", T.IntegerType()),
        ("UINT32", T.LongType()),
        ("INT64", T.LongType()),
        ("FLOAT32", T.DoubleType()),
        ("FLOAT64", T.DoubleType()),
        ("DECIMAL", T.StringType()),
        ("VARCHAR", T.StringType()),
        ("JSON", T.StringType()),
        ("YEAR", T.IntegerType()),
        ("DATE", T.DateType()),
        ("TIME", T.LongType()),
        ("DATETIME", T.TimestampNTZType()),
        ("TIMESTAMP", T.StringType()),
        ("BLOB", T.BinaryType()),
        ("VARBINARY", T.BinaryType()),
    ],
)
def test_resolve_default_modes(ftype, expected):
    assert resolve(ftype).spark_type == expected


def test_uint64_modes():
    assert resolve("UINT64").spark_type == T.StringType()
    assert (
        resolve("UINT64", bigint_unsigned_mode=BigIntUnsignedHandlingMode.PRECISE).spark_type
        == T.DecimalType(20, 0)
    )
    assert (
        resolve("UINT64", bigint_unsigned_mode=BigIntUnsignedHandlingMode.LONG).spark_type
        == T.LongType()
    )


def test_textual_binary_overrides():
    # *TEXT column delivered as BLOB stays a string (VitessType.java:113-117)
    assert resolve("BLOB", "mediumtext").spark_type == T.StringType()
    # CHAR/ENUM/SET delivered as VARBINARY stay strings (VitessType.java:118-132)
    assert resolve("VARBINARY", "varchar(32)").spark_type == T.StringType()
    assert resolve("BINARY", "binary(2)").spark_type == T.BinaryType()


def test_binary_modes():
    assert resolve("VARBINARY", binary_mode=BinaryHandlingMode.HEX).spark_type == T.StringType()
    assert resolve("VARBINARY", binary_mode=BinaryHandlingMode.BASE64).spark_type == T.StringType()


def test_temporal_modes():
    assert resolve("TIMESTAMP").logical_name == "io.debezium.time.ZonedTimestamp"
    assert (
        resolve("TIMESTAMP", temporal_mode=TemporalPrecisionMode.CONNECT).spark_type
        == T.TimestampType()
    )
    assert (
        resolve("DATETIME", temporal_mode=TemporalPrecisionMode.ISOSTRING).spark_type
        == T.StringType()
    )
    assert resolve("TIME").logical_name == "io.debezium.time.MicroTime"


def test_bit():
    assert resolve("BIT", "bit(1)").spark_type == T.BooleanType()
    assert resolve("BIT", "bit(8)").spark_type == T.BinaryType()


def test_enum_set_parse():
    assert parse_enum_or_set_values("enum('small','medium','large')") == (
        "small", "medium", "large",
    )
    assert parse_enum_or_set_values("set('a','b','c','d')") == ("a", "b", "c", "d")
    # doubled-quote escape
    assert parse_enum_or_set_values("enum('a''b','c')") == ("a'b", "c")
    # ambiguous numeric literals stay literals (enum_ambiguous_table fixture)
    assert parse_enum_or_set_values("enum('2','0','1')") == ("2", "0", "1")
    assert parse_enum_or_set_values("int(11)") == ()


def test_enum_resolution_carries_values():
    r = resolve("ENUM", "enum('small','medium','large')")
    assert r.spark_type == T.StringType()
    assert r.enum_values == ("small", "medium", "large")


def test_column_name_validation():
    validate_column_name("ok_name")
    with pytest.raises(ValueError):
        validate_column_name("")
    with pytest.raises(ValueError):
        validate_column_name("@1")


def test_key_selection():
    pk = ColumnMetaData("id", resolve("INT64"), is_primary_key=True)
    uk = ColumnMetaData("u", resolve("INT32"), is_unique_key=True)
    plain = ColumnMetaData("v", resolve("VARCHAR"))
    assert select_key_columns([pk, uk, plain]) == ["id"]
    assert select_key_columns([plain, uk]) == ["u"]
    assert select_key_columns([plain]) == []


def test_schema_registry_per_shard():
    reg = SchemaRegistry()
    s1 = TableSchema("ks", "-80", "t1", [ColumnMetaData("id", resolve("INT64"))])
    s2 = TableSchema("ks", "80-", "t1", [
        ColumnMetaData("id", resolve("INT64")),
        ColumnMetaData("extra", resolve("VARCHAR")),
    ])
    reg.register(s1)
    reg.register(s2)
    # shards evolve independently (VitessDatabaseSchema.java:105-117)
    assert len(reg.get("ks", "-80", "t1").columns) == 1
    assert len(reg.get("ks", "80-", "t1").columns) == 2
    # re-register overwrites (VitessDatabaseSchema.java:86-99)
    reg.register(TableSchema("ks", "-80", "t1", s2.columns))
    assert len(reg.get("ks", "-80", "t1").columns) == 2


def test_schema_registry_rejects_anonymized():
    reg = SchemaRegistry()
    bad = TableSchema("ks", "0", "t", [ColumnMetaData("@1", resolve("INT64"))])
    with pytest.raises(ValueError):
        reg.register(bad)
