"""Deterministic change-log model over the driver's ``events`` table.

The correctness harness has no live Vitess: the synthetic ``events`` parquet
(TESTDATA.md) stands in for a recorded VStream. This module maps it — purely
deterministically, so a DuckDB oracle can replicate the semantics — onto the
raw VEvent frame consumed by ``decode.py``, exercising the whole decode spine
(SURVEY.md §7.2 minimum end-to-end slice).

The model (shared contract between Spark queries and oracle SQL):

    keyspace  = 'ks0'
    shard     = element of ['-40','40-80','80-c0','c0-'] chosen by user_id % 4
    table     = 'tbl' || (user_id % 3)
    op        = signup→'c' (insert), error→'d' (delete), else 'u' (update)
    tx_id     = event_id DIV 10  (10 consecutive events = one transaction)
    gtid      = 'MySQL56/host0:1-' || (event_id + 100)
    vgtid     = '[{"keyspace":"ks0","shard":"' || shard || '","gtid":"' || gtid || '"}]'
    before    = {user_id, value-1.0, props} for u/d, absent for c
    after     = {user_id, value, props} for c/u, absent for d

The change table schema registered for decode: user_id INT64, value FLOAT64,
props JSON.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .types import ColumnMetaData, TableSchema, resolve

KEYSPACE = "ks0"
SHARDS = ["-40", "40-80", "80-c0", "c0-"]


def change_table_schema(table: str, shard: str = "0") -> TableSchema:
    return TableSchema(
        KEYSPACE,
        shard,
        table,
        [
            ColumnMetaData("user_id", resolve("INT64"), optional=False, is_primary_key=True),
            ColumnMetaData("value", resolve("FLOAT64")),
            ColumnMetaData("props", resolve("JSON")),
        ],
    )


def shard_col() -> F.Column:
    arr = F.array(*[F.lit(s) for s in SHARDS])
    return F.element_at(arr, (F.col("user_id") % 4 + 1).cast("int"))


def op_col() -> F.Column:
    return (
        F.when(F.col("event_type") == "signup", F.lit("c"))
        .when(F.col("event_type") == "error", F.lit("d"))
        .otherwise(F.lit("u"))
    )


def gtid_col() -> F.Column:
    """The fixture model's deterministic per-event GTID (one definition,
    shared by the raw-VEvent builder and any registry row that needs a
    position without the full envelope)."""
    return F.concat(
        F.lit("MySQL56/host0:1-"), (F.col("event_id") + 100).cast("string")
    )


def events_to_raw_vevents(events: DataFrame) -> DataFrame:
    """events parquet → raw VEvent frame (decode.RAW_EVENT_SCHEMA layout)."""
    shard = shard_col()
    gtid = gtid_col()
    vgtid = F.concat(
        F.lit('[{"keyspace":"ks0","shard":"'), shard, F.lit('","gtid":"'), gtid, F.lit('"}]')
    )
    op = op_col()
    before_map = F.when(
        op.isin("u", "d"),
        F.create_map(
            F.lit("user_id"), F.col("user_id").cast("string"),
            F.lit("value"), (F.col("value") - F.lit(1.0)).cast("string"),
            F.lit("props"), F.col("props"),
        ),
    )
    after_map = F.when(
        op.isin("c", "u"),
        F.create_map(
            F.lit("user_id"), F.col("user_id").cast("string"),
            F.lit("value"), F.col("value").cast("string"),
            F.lit("props"), F.col("props"),
        ),
    )
    return events.select(
        F.lit("ROW").alias("event_kind"),
        F.lit(KEYSPACE).alias("keyspace"),
        shard.alias("shard"),
        F.concat(F.lit("tbl"), (F.col("user_id") % 3).cast("string")).alias("table_name"),
        gtid.alias("gtid"),
        vgtid.alias("vgtid"),
        (F.col("event_id") / 10).cast("long").cast("string").alias("tx_id"),
        F.col("ts"),
        F.array(
            F.struct(before_map.alias("before"), after_map.alias("after"))
        ).alias("row_changes"),
        F.lit(None).cast("string").alias("statement"),
        F.lit(None).cast(_fields_type()).alias("fields"),
        F.col("event_id"),  # carried for deterministic ordering in tests
    )


def _fields_type():
    from .decode import FIELDS_TYPE

    return FIELDS_TYPE


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the events table, normalizing its TIMESTAMP(NANOS) parquet column
    (Spark rejects nanos by default; read as long then convert to micros).

    The single-file testdata scan plans ONE partition, so spread it across
    cores here (harness-only code — a real VStream replay arrives pre-split
    by shard; see registry._spread for the same rationale)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_field = dict(df.dtypes)["ts"]
    if ts_field == "bigint":
        # integer div: ns values (~1.7e18) exceed double's exact-integer range
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_field == "timestamp_ntz":
        # parquet written without isAdjustedToUTC → Spark 4 infers NTZ; the
        # testdata wall clock IS UTC (the DuckDB oracle's epoch_ms treats it
        # so). Pure NTZ arithmetic pins that interpretation regardless of the
        # caller's spark.sql.session.timeZone (to_utc_timestamp would not:
        # its implicit NTZ→TIMESTAMP cast goes through the session zone).
        df = df.withColumn(
            "ts",
            F.timestamp_micros(
                F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
            ),
        )
    return df.repartition(spark.sparkContext.defaultParallelism)
