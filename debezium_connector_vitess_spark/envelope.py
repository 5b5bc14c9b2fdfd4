"""The CDC envelope — canonical output record shape.

Reference: Debezium envelope built by VitessChangeRecordEmitter.java:31-114 and
VitessSourceInfoStructMaker.java:20-44 (see FIXTURES.md §1). Spark-native: the
envelope is a fixed StructType-per-table DataFrame schema; construction is a
single ``select`` of Catalyst expressions (whole-stage codegen, no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import CONNECTOR_NAME, __version__
from .types import TableSchema

# op codes (reference VitessChangeRecordEmitter.java:56-69)
OP_CREATE = "c"
OP_UPDATE = "u"
OP_DELETE = "d"


def source_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("version", T.StringType(), False),
            T.StructField("connector", T.StringType(), False),
            T.StructField("name", T.StringType(), False),
            T.StructField("ts_ms", T.LongType(), False),
            T.StructField("snapshot", T.StringType(), True),
            T.StructField("db", T.StringType(), False),
            T.StructField("keyspace", T.StringType(), False),
            T.StructField("table", T.StringType(), False),
            T.StructField("shard", T.StringType(), False),
            T.StructField("vgtid", T.StringType(), False),
        ]
    )


def envelope_schema(row_schema: T.StructType, with_transaction: bool = False) -> T.StructType:
    fields = [
        T.StructField("op", T.StringType(), False),
        T.StructField("before", row_schema, True),
        T.StructField("after", row_schema, True),
        T.StructField("source", source_schema(), False),
        T.StructField("ts_ms", T.LongType(), False),
    ]
    if with_transaction:
        fields.append(T.StructField("transaction", transaction_schema(), True))
    return T.StructType(fields)


def transaction_schema() -> T.StructType:
    """Reference: VitessSchemaFactory.java:33-44 +
    VitessOrderedTransactionStructMaker.java:38-57."""
    return T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("total_order", T.LongType(), True),
            T.StructField("data_collection_order", T.LongType(), True),
            T.StructField("transaction_epoch", T.LongType(), True),
            T.StructField("transaction_rank", T.DecimalType(38, 0), True),
        ]
    )


def source_struct(
    server_name: str,
    *,
    keyspace: Column,
    table: Column,
    shard: Column,
    vgtid: Column,
    ts_ms: Column,
    snapshot: Column | None = None,
) -> Column:
    """Build the ``source`` block (SourceInfo.java:35-146; db is always empty,
    SourceInfo.java:60-64)."""
    return F.struct(
        F.lit(__version__).alias("version"),
        F.lit(CONNECTOR_NAME).alias("connector"),
        F.lit(server_name).alias("name"),
        ts_ms.cast(T.LongType()).alias("ts_ms"),
        (snapshot if snapshot is not None else F.lit(None).cast(T.StringType())).alias("snapshot"),
        F.lit("").alias("db"),
        keyspace.alias("keyspace"),
        table.alias("table"),
        shard.alias("shard"),
        vgtid.alias("vgtid"),
    )


def with_record_key(df: DataFrame, schema: TableSchema) -> DataFrame:
    """Attach the record key struct: PK columns from the after-image (before
    for deletes); keyless tables get a null key.
    Reference: VStreamOutputMessageDecoder.java:436-447 (key metadata),
    VitessConnectorIT.java:1964-2059 (keyless behavior)."""
    keys = schema.key_columns
    if not keys:
        return df.withColumn("key", F.lit(None).cast(T.StringType()))
    image = F.when(F.col("op") == OP_DELETE, F.col("before")).otherwise(F.col("after"))
    return df.withColumn("key", F.to_json(F.struct(*[image[k].alias(k) for k in keys])))


def extract_new_record_state(df: DataFrame) -> DataFrame:
    """ExtractNewRecordState SMT analog: flatten the envelope to the after
    image + op (reference README.md:28; upstream Debezium SMT). Drops deletes'
    null after rows like the upstream default."""
    return df.filter(F.col("after").isNotNull()).select("after.*", "op")


def sanitize_field_name_expr(name: Column) -> Column:
    """D13: ``schema.name.adjustment.mode=avro`` analog — make a field name
    Avro-legal: every char outside [A-Za-z0-9_] becomes '_', and a leading
    digit gets a '_' prefix. Reference behavior exercised at
    VitessConnectorIT.java:2103-2137 (inherited Debezium name adjuster)."""
    cleaned = F.regexp_replace(name, "[^A-Za-z0-9_]", "_")
    return F.when(cleaned.rlike("^[0-9]"), F.concat(F.lit("_"), cleaned)).otherwise(cleaned)
