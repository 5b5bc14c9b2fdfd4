"""Sink shaping: topic routing, CloudEvents, heartbeats, Kafka/parquet writers.

SURVEY.md §2.1 S5-S9.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class TopicNamingStrategy:
    """dataChangeTopic(TableId) = {prefix|override-prefix}.{table}:
    ``override_prefix`` (override.data.change.topic.prefix) replaces the
    prefix for every table EXCEPT those matching the exclude-regex list
    (override.data.change.topic.prefix.exclude.list, full-match on the
    table name); per-table topic ``overrides`` win over both. Schema-change
    topic override analog.
    Reference: TableTopicNamingStrategy.java:51-138, VitessTopicSelector.java.
    """

    prefix: str
    overrides: dict[str, str] = field(default_factory=dict)  # table -> topic
    override_prefix: Optional[str] = None
    override_prefix_exclude: tuple[str, ...] = ()
    schema_change_topic: Optional[str] = None

    def data_change_topic(
        self, table: Column, keyspace: Optional[Column] = None
    ) -> Column:
        expr = F.concat(F.lit(self.prefix), F.lit("."), table)
        if self.override_prefix:
            overridden = F.concat(F.lit(self.override_prefix), F.lit("."), table)
            if self.override_prefix_exclude:
                # The reference matches exclude patterns against the
                # schema-qualified 'keyspace.table' string
                # (TableTopicNamingStrategy + VitessTableIdToStringMapper),
                # so upstream-style patterns like '.*\.heartbeat' work; the
                # bare table name is the fallback when no keyspace is known.
                subject = (
                    F.concat(keyspace, F.lit("."), table)
                    if keyspace is not None
                    else table
                )
                pattern = "|".join(f"(?:{p})" for p in self.override_prefix_exclude)
                expr = F.when(subject.rlike(f"^(?:{pattern})$"), expr).otherwise(overridden)
            else:
                expr = overridden
        for tbl, topic in sorted(self.overrides.items()):
            expr = F.when(table == tbl, F.lit(topic)).otherwise(expr)
        # sanitizedTopicName (inherited AbstractTopicNamingStrategy behavior):
        # characters Kafka rejects in topic names become '_'
        return F.regexp_replace(expr, r"[^a-zA-Z0-9._-]", "_")

    def attach(
        self,
        df: DataFrame,
        table_col: str = "table_name",
        keyspace_col: str = "keyspace",
    ) -> DataFrame:
        """S6: add the routing ``topic`` column. Exclude-regex matching uses
        the keyspace-qualified name when the frame carries a keyspace."""
        ks = F.col(keyspace_col) if keyspace_col in df.columns else None
        return df.withColumn("topic", self.data_change_topic(F.col(table_col), ks))

    def schema_change_topic_name(self) -> str:
        """Override if set, else the prefix itself (the upstream default
        schema-change topic, TableTopicNamingStrategy.schemaChangeTopic)."""
        import re

        return re.sub(r"[^a-zA-Z0-9._-]", "_", self.schema_change_topic or self.prefix)

    def attach_schema_changes(self, df: DataFrame) -> DataFrame:
        """Route schema-change records (X1 output) to the schema topic."""
        return df.withColumn("topic", F.lit(self.schema_change_topic_name()))


def cloudevents_wrap(df: DataFrame, server_name: str) -> DataFrame:
    """S9: CloudEvents output format.

    CE id = ``name:{server};vgtid:{vgtid}``; extension source fields
    {vgtid, keyspace}. Reference: converters/VitessCloudEventsMaker.java:23-41.
    Input: envelope frame with source struct. Output adds ce_* columns + a
    JSON body.
    """
    ce_id = F.concat(
        F.lit("name:"), F.lit(server_name), F.lit(";vgtid:"), F.col("source.vgtid")
    )
    return (
        df.withColumn("ce_id", ce_id)
        .withColumn("ce_specversion", F.lit("1.0"))
        .withColumn("ce_source", F.concat(F.lit("/debezium/vitess/"), F.lit(server_name)))
        .withColumn("ce_type", F.lit("io.debezium.connector.vitess.DataChangeEvent"))
        .withColumn("ce_vgtid", F.col("source.vgtid"))
        .withColumn("ce_keyspace", F.col("source.keyspace"))
    )


def heartbeat_records(raw_df: DataFrame, interval_ms: int = 1000) -> DataFrame:
    """S7: rate-limited heartbeat side-output ``{vgtid, ts_ms}``.

    Reference emits at most one heartbeat per interval when the offset exists
    (VitessHeartbeatImpl.java:46-79). Batch analog: bucket events by interval
    per shard, keep the last position in each bucket — same densification
    guarantee (a position at least every interval while events flow).
    """
    return (
        raw_df.withColumn("ts_ms", F.unix_millis(F.col("ts")))
        .withColumn("bucket", (F.col("ts_ms") / interval_ms).cast("long"))
        .groupBy("shard", "bucket")
        .agg(F.max_by("vgtid", F.col("ts_ms")).alias("vgtid"), F.max("ts_ms").alias("ts_ms"))
        .drop("bucket")
    )


def kafka_records(df: DataFrame, *, key_col: str = "key", topic_col: str = "topic") -> DataFrame:
    """S5: the Kafka record contract — (key, value, topic) exactly as the
    kafka sink consumes them: key cast to string, value = JSON of every other
    column, topic passed through. Separated from the transport so the record
    shape is testable without a broker."""
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*[c for c in df.columns if c not in (key_col, topic_col)])).alias("value"),
        F.col(topic_col).alias("topic"),
    )


def write_kafka(df: DataFrame, bootstrap_servers: str, *, key_col: str = "key",
                topic_col: str = "topic", checkpoint: Optional[str] = None):
    """S5: Kafka sink (streaming). Requires the spark-sql-kafka package on the
    classpath; gated so local/test environments without it still import."""
    out = kafka_records(df, key_col=key_col, topic_col=topic_col)
    writer = out.writeStream.format("kafka").option("kafka.bootstrap.servers", bootstrap_servers)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def write_parquet_stream(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: tuple[str, ...] = (),
    *,
    available_now: bool = False,
):
    """Delta-style table sink stand-in: partitioned parquet append with
    exactly-once via the streaming checkpoint. ``available_now=True`` drains
    what is available and stops (bounded backfills/tests)."""
    writer = df.writeStream.format("parquet").option("path", path).option(
        "checkpointLocation", checkpoint
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
