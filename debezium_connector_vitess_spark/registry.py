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
from .txmeta.batch import transaction_boundaries

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


# ---------------------------------------------------------------------------
# Filters (SURVEY §2.3), SMTs (§2.7), sinks (§2.1), DDL (§2.6), txmeta (§2.5)
# ---------------------------------------------------------------------------


@register(
    "filter_table_include",
    oracle=f"""
    SELECT {_ORACLE_TABLE} AS table_name, count(*) AS n
    FROM events
    WHERE regexp_matches('ks0.' || {_ORACLE_TABLE}, '^(?:ks0\\.tbl[02])$')
    GROUP BY 1
    """,
)
def filter_table_include(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F6: table.include.list regex against keyspace.table, pre-decode."""
    from .filters import TableFilter

    raw = changelog.events_to_raw_vevents(changelog.load_events(spark, sf_dir))
    tf = TableFilter(include_list=[r"ks0\.tbl[02]"])
    return tf.apply(raw).groupBy("table_name").agg(F.count("*").alias("n"))


@register(
    "filter_column_ops",
    oracle="""
    SELECT doc_id, substring(text, 1, 20) AS text, sha256(source) AS source, n_chars
    FROM documents
    """,
)
def filter_column_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: column include/truncate/mask as select/substring/sha2 ops."""
    from .filters import ColumnFilter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cf = ColumnFilter(
        include=["doc_id", "text", "source", "n_chars"],
        truncate={"text": 20},
        mask_hash=["source"],
    )
    return cf.apply_flat(docs)


@register(
    "smt_field_transforms",
    oracle=f"""
    SELECT {_ORACLE_OP} AS op, {_ORACLE_SHARD} AS shard, '' AS vgtid, epoch_ms(ts) AS ts_ms
    FROM events WHERE user_id % 3 = 0
    """,
)
def smt_field_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1+M2: RemoveField (source.snapshot) + ReplaceFieldValue (source.vgtid='')."""
    from .transforms import remove_field, replace_field_value

    raw = changelog.events_to_raw_vevents(changelog.load_events(spark, sf_dir))
    env = decode_table(raw, changelog.change_table_schema("tbl0"))
    env = replace_field_value(env, "source.vgtid", "")
    env = remove_field(env, "source.snapshot", "tx_id")
    assert "snapshot" not in env.select("source.*").columns
    return env.select(
        "op",
        F.col("source.shard").alias("shard"),
        F.col("source.vgtid").alias("vgtid"),
        "ts_ms",
    )


@register(
    "smt_use_local_vgtid",
    oracle=f"""
    SELECT event_id,
           {_ORACLE_SHARD} AS shard,
           '[{{"keyspace":"ks0","shard":"' || {_ORACLE_SHARD} || '","gtid":"' || {_ORACLE_GTID} || '"}}]' AS local_vgtid
    FROM events
    """,
)
def smt_use_local_vgtid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3: UseLocalVgtid — multi-shard vgtid reduced to the record's own shard."""
    from .changelog import SHARDS
    from .transforms import local_vgtid_expr

    raw = changelog.events_to_raw_vevents(changelog.load_events(spark, sf_dir))
    full = F.to_json(
        F.array(
            *[
                F.struct(
                    F.lit("ks0").alias("keyspace"),
                    F.lit(s).alias("shard"),
                    F.col("gtid").alias("gtid"),
                )
                for s in SHARDS
            ]
        )
    )
    return raw.select(
        "event_id",
        "shard",
        local_vgtid_expr(full, F.col("shard")).alias("local_vgtid"),
    )


@register(
    "smt_filter_transaction_records",
    oracle=f"""
    SELECT 'data' AS record_kind, count(*) AS n FROM events WHERE user_id % 3 = 2
    """,
)
def smt_filter_transaction_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4: FilterTransactionTopicRecords — drop BEGIN/END tx-topic records from
    a mixed stream."""
    from .transforms import filter_transaction_topic_records

    raw = changelog.events_to_raw_vevents(changelog.load_events(spark, sf_dir))
    env = decode_table(raw, changelog.change_table_schema("tbl2"))
    data = env.select(F.lit("data").alias("record_kind"))
    tx = (
        transaction_boundaries(raw.filter(F.col("table_name") == "tbl2"))
        .select(F.lit("transaction").alias("record_kind"))
    )
    mixed = data.unionAll(tx)
    return filter_transaction_topic_records(mixed).groupBy("record_kind").agg(
        F.count("*").alias("n")
    )


@register(
    "topic_routing",
    oracle=f"""
    SELECT {_ORACLE_TABLE} AS table_name,
           CASE WHEN {_ORACLE_TABLE} = 'tbl2' THEN 'audit.custom'
                ELSE 'cdc.' || {_ORACLE_TABLE} END AS topic,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def topic_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: table→topic naming with prefix + per-table override."""
    from .sinks import TopicNamingStrategy

    raw = changelog.events_to_raw_vevents(changelog.load_events(spark, sf_dir))
    strat = TopicNamingStrategy(prefix="cdc", overrides={"tbl2": "audit.custom"})
    return strat.attach(raw).groupBy("table_name", "topic").agg(F.count("*").alias("n"))


@register(
    "cloudevents_format",
    oracle=f"""
    SELECT {_ORACLE_OP} AS op,
           'name:test_server;vgtid:[{{"keyspace":"ks0","shard":"' || {_ORACLE_SHARD} || '","gtid":"' || {_ORACLE_GTID} || '"}}]' AS ce_id,
           'io.debezium.connector.vitess.DataChangeEvent' AS ce_type,
           'ks0' AS ce_keyspace
    FROM events WHERE user_id % 3 = 0
    """,
)
def cloudevents_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: CloudEvents envelope metadata (CE id = name:{server};vgtid:{vgtid})."""
    from .sinks import cloudevents_wrap

    raw = changelog.events_to_raw_vevents(changelog.load_events(spark, sf_dir))
    env = decode_table(raw, changelog.change_table_schema("tbl0"), server_name="test_server")
    return cloudevents_wrap(env, "test_server").select("op", "ce_id", "ce_type", "ce_keyspace")


@register(
    "heartbeat_positions",
    oracle=f"""
    SELECT {_ORACLE_SHARD} AS shard,
           epoch_ms(ts) // 3600000 AS bucket,
           max(epoch_ms(ts)) AS last_ts_ms,
           max(event_id + 100) AS last_seq
    FROM events GROUP BY 1, 2
    """,
)
def heartbeat_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: heartbeat side-output — latest stream position per shard per
    interval (1h bucket), derived from the gtid sequence."""
    raw = changelog.events_to_raw_vevents(changelog.load_events(spark, sf_dir))
    ts_ms = F.unix_millis(F.col("ts"))
    return (
        raw.select(
            "shard",
            ts_ms.alias("ts_ms"),
            F.regexp_extract("gtid", r"(\d+)$", 1).cast("long").alias("seq"),
        )
        .groupBy("shard", F.expr("ts_ms div 3600000").alias("bucket"))
        .agg(F.max("ts_ms").alias("last_ts_ms"), F.max("seq").alias("last_seq"))
    )


@register(
    "ddl_schema_changes",
    oracle="""
    SELECT 'ks0' AS keyspace, '0' AS shard,
           't' || CAST(doc_id AS VARCHAR) AS table_name,
           CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'CREATE' WHEN 1 THEN 'ALTER'
                WHEN 2 THEN 'DROP' ELSE 'ALTER' END AS operation,
           doc_id * 1000 AS ts_ms
    FROM documents
    """,
)
def ddl_schema_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: DDL event → schema-change record (operation + table extraction,
    comment stripping, RENAME→ALTER)."""
    from .transforms import schema_change_records

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id").cast("string")
    stmt = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("CREATE TABLE `t"), d, F.lit("` (id INT)")))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("ALTER TABLE t"), d, F.lit(" ADD COLUMN c INT")))
        .when(F.col("doc_id") % 4 == 2, F.concat(F.lit("/* gh-ost */ DROP TABLE IF EXISTS t"), d))
        .otherwise(F.concat(F.lit("RENAME TABLE t"), d, F.lit(" TO t"), d, F.lit("x")))
    )
    raw_ddl = docs.select(
        F.lit("DDL").alias("event_kind"),
        F.lit("ks0").alias("keyspace"),
        F.lit("0").alias("shard"),
        F.lit(None).cast("string").alias("table_name"),
        F.lit(None).cast("string").alias("gtid"),
        F.lit("[]").alias("vgtid"),
        F.lit(None).cast("string").alias("tx_id"),
        F.timestamp_millis(F.col("doc_id") * 1000).alias("ts"),
        F.lit(None).cast(
            "array<struct<before:map<string,string>,after:map<string,string>>>"
        ).alias("row_changes"),
        stmt.alias("statement"),
    )
    return schema_change_records(raw_ddl).select(
        "keyspace", "shard", "table_name", "operation", "ts_ms"
    )


@register(
    "tx_boundaries",
    oracle="""
    SELECT CAST(event_id // 10 AS VARCHAR) AS tx_id,
           count(*) AS event_count,
           min(epoch_ms(ts)) AS begin_ts_ms,
           max(epoch_ms(ts)) AS end_ts_ms,
           max_by('MySQL56/host0:1-' || CAST(event_id + 100 AS VARCHAR), event_id) AS end_gtid
    FROM events GROUP BY 1
    """,
)
def tx_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: transaction BEGIN/END summary records with event counts."""
    raw = changelog.events_to_raw_vevents(changelog.load_events(spark, sf_dir))
    return transaction_boundaries(raw)


@register(
    "tx_rank",
    oracle="""
    SELECT event_id, (event_id + 100) + (user_id + 1) AS transaction_rank
    FROM events
    """,
)
def tx_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2+T3: GTID-set parse + rank = Σ max-sequence over hosts, as a pure
    Catalyst expression over a two-host GTID."""
    from .txmeta.batch import rank_expr

    events = changelog.load_events(spark, sf_dir)
    gtid = F.concat(
        F.lit("MySQL56/hostA:1-"),
        (F.col("event_id") + 100).cast("string"),
        F.lit(",hostB:1-"),
        (F.col("user_id") + 1).cast("string"),
    )
    return events.select(
        "event_id", rank_expr(gtid).cast("long").alias("transaction_rank")
    )


@register(
    "tx_epoch",
    oracle=f"""
    SELECT event_id, shard,
           1 + SUM(CASE WHEN prev_h IS NOT NULL AND prev_h <> h THEN 1 ELSE 0 END)
               OVER (PARTITION BY shard ORDER BY event_id) AS transaction_epoch
    FROM (
      SELECT event_id, {_ORACLE_SHARD} AS shard, (event_id // 997) % 3 AS h,
             LAG((event_id // 997) % 3) OVER (PARTITION BY {_ORACLE_SHARD} ORDER BY event_id) AS prev_h
      FROM events
    )
    """,
)
def tx_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: per-shard epoch — running count of host-set breaks (failovers) over
    the shard's transaction order; initial epoch 1 models an overridden start."""
    from .txmeta.batch import epoch_batch

    events = changelog.load_events(spark, sf_dir)
    gtid = F.concat(
        F.lit("MySQL56/host"),
        (F.expr("event_id div 997") % 3).cast("string"),
        F.lit(":1-"),
        F.col("event_id").cast("string"),
    )
    df = events.select("event_id", changelog.shard_col().alias("shard"), gtid.alias("gtid"))
    return epoch_batch(df).select("event_id", "shard", "transaction_epoch")


@register(
    "tx_order",
    oracle="""
    SELECT event_id,
           ROW_NUMBER() OVER (PARTITION BY event_id // 10 ORDER BY event_id) AS total_order,
           ROW_NUMBER() OVER (PARTITION BY event_id // 10, user_id % 3 ORDER BY event_id) AS data_collection_order
    FROM events
    """,
)
def tx_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8: total_order / data_collection_order counters within a transaction."""
    from .txmeta.batch import with_tx_order

    raw = changelog.events_to_raw_vevents(changelog.load_events(spark, sf_dir))
    return with_tx_order(raw).select("event_id", "total_order", "data_collection_order")
