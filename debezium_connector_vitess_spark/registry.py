"""Query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 gets a named query here plus a
DuckDB oracle SQL statement with IDENTICAL column names and semantics. The
driver (and ``tests/test_oracle_parity.py``) runs both at the same scale
factor and compares row counts + schemas + order-insensitive value hashes.

Conventions:
- each query callable takes ``(spark, sf_dir)`` and returns a DataFrame;
- all computed columns aliased identically on both sides;
- oracle views pre-registered: region nation customer supplier part orders
  lineitem events documents embeddings.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import changelog
from .decode import decode_table
from .envelope import extract_new_record_state, with_record_key

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# CDC decode spine (SURVEY §2.2 D1-D12 + §7.2 minimum end-to-end slice)
# ---------------------------------------------------------------------------

# Shared oracle fragments mirroring changelog.py's deterministic model.
_ORACLE_OP = "CASE WHEN event_type='signup' THEN 'c' WHEN event_type='error' THEN 'd' ELSE 'u' END"
_ORACLE_SHARD = "(['-40','40-80','80-c0','c0-'])[CAST(user_id % 4 AS INT) + 1]"
_ORACLE_GTID = "'MySQL56/host0:1-' || CAST(event_id + 100 AS VARCHAR)"
_ORACLE_TABLE = "'tbl' || CAST(user_id % 3 AS VARCHAR)"


@register(
    "cdc_envelope",
    oracle=f"""
    SELECT
      {_ORACLE_OP} AS op,
      'ks0' AS keyspace,
      {_ORACLE_SHARD} AS shard,
      {_ORACLE_TABLE} AS table_name,
      epoch_ms(ts) AS ts_ms,
      {_ORACLE_GTID} AS gtid,
      '[{{"keyspace":"ks0","shard":"' || {_ORACLE_SHARD} || '","gtid":"' || {_ORACLE_GTID} || '"}}]' AS vgtid,
      CAST(event_id // 10 AS VARCHAR) AS tx_id,
      CASE WHEN {_ORACLE_OP} IN ('u','d') THEN user_id END AS before_user_id,
      CASE WHEN {_ORACLE_OP} IN ('u','d') THEN value - 1.0 END AS before_value,
      CASE WHEN {_ORACLE_OP} IN ('c','u') THEN user_id END AS after_user_id,
      CASE WHEN {_ORACLE_OP} IN ('c','u') THEN value END AS after_value,
      CASE WHEN {_ORACLE_OP} IN ('c','u') THEN props END AS after_props,
      '{{"user_id":' || CAST(user_id AS VARCHAR) || '}}' AS key
    FROM events
    WHERE user_id % 3 = 1
    """,
)
def cdc_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum end-to-end slice: replayed events → typed CDC envelope for one
    table (D1-D3 dispatch/explode/decode, D8-D12 conversion/envelope/key)."""
    raw = changelog.events_to_raw_vevents(changelog.load_events(spark, sf_dir))
    schema = changelog.change_table_schema("tbl1")
    env = decode_table(raw, schema)
    env = with_record_key(env, schema)
    return env.select(
        "op",
        F.col("source.keyspace").alias("keyspace"),
        F.col("source.shard").alias("shard"),
        F.col("source.table").alias("table_name"),
        "ts_ms",
        "gtid",
        F.col("source.vgtid").alias("vgtid"),
        "tx_id",
        F.col("before.user_id").alias("before_user_id"),
        F.col("before.value").alias("before_value"),
        F.col("after.user_id").alias("after_user_id"),
        F.col("after.value").alias("after_value"),
        F.col("after.props").alias("after_props"),
        "key",
    )


@register(
    "cdc_op_counts",
    oracle=f"""
    SELECT {_ORACLE_TABLE} AS table_name, {_ORACLE_OP} AS op, count(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def cdc_op_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type dispatch + op derivation (D1/D2) aggregated per table."""
    raw = changelog.events_to_raw_vevents(changelog.load_events(spark, sf_dir))
    from .decode import explode_row_changes

    return (
        explode_row_changes(raw)
        .groupBy(F.col("table_name"), F.col("op"))
        .agg(F.count("*").alias("n"))
    )


@register(
    "cdc_extract_new_state",
    oracle=f"""
    SELECT user_id, value, props, {_ORACLE_OP} AS op
    FROM events
    WHERE user_id % 3 = 1 AND event_type <> 'error'
    """,
)
def cdc_extract_new_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtractNewRecordState SMT analog (M5): flatten envelope to after-image."""
    raw = changelog.events_to_raw_vevents(changelog.load_events(spark, sf_dir))
    env = decode_table(raw, changelog.change_table_schema("tbl1"))
    return extract_new_record_state(env).select("user_id", "value", "props", "op")


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    return cdc_envelope(spark, sf_dir)
