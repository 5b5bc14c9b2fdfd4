"""Single-message-transform (SMT) equivalents + DDL metadata extraction.

SURVEY.md §2.7 M1-M4 and §2.6 X1. Each SMT is a DataFrame→DataFrame function
over the envelope; all are stateless Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _drop_dotted(df: DataFrame, path: str) -> DataFrame:
    """Drop a field by dotted path from the envelope (struct rebuild)."""
    if "." not in path:
        return df.drop(path)
    root, rest = path.split(".", 1)
    return df.withColumn(root, F.col(root).dropFields(rest))


def remove_field(df: DataFrame, *paths: str) -> DataFrame:
    """RemoveField SMT: drop fields by dotted path from schema+struct.

    Reference: transforms/RemoveField.java:57-153 (recursive schema rebuild);
    Spark-native: ``dropFields`` handles the nested rebuild in Catalyst.
    """
    for p in paths:
        df = _drop_dotted(df, p)
    return df


def replace_field_value(df: DataFrame, path: str, value) -> DataFrame:
    """ReplaceFieldValue SMT: overwrite a dotted-path field with a constant
    (e.g. blank out a huge vgtid). Reference: transforms/ReplaceFieldValue.java:74-145.
    """
    lit = F.lit(value)
    if "." not in path:
        return df.withColumn(path, lit)
    root, rest = path.split(".", 1)
    return df.withColumn(root, F.col(root).withField(rest, lit))


def local_vgtid_expr(vgtid: Column, shard: Column) -> Column:
    """Keep only the record's own shard's entry of the vgtid JSON array.

    Reference: transforms/UseLocalVgtid.java:32-103 + Vgtid.java:125-132.
    Spark-native: parse → filter → re-serialize, all in Catalyst.
    """
    entries = F.from_json(
        vgtid,
        "array<struct<keyspace:string,shard:string,gtid:string>>",
    )
    own = F.filter(entries, lambda e: e.getField("shard") == shard)
    return F.to_json(own)


def use_local_vgtid(df: DataFrame) -> DataFrame:
    """UseLocalVgtid SMT over the envelope (source.vgtid + source.shard)."""
    return df.withColumn(
        "source",
        F.col("source").withField(
            "vgtid", local_vgtid_expr(F.col("source.vgtid"), F.col("source.shard"))
        ),
    )


def filter_transaction_topic_records(df: DataFrame, kind_col: str = "record_kind") -> DataFrame:
    """FilterTransactionTopicRecords SMT: drop BEGIN/END transaction-topic
    records (reference matches by schema name,
    transforms/FilterTransactionTopicRecords.java:34-47; here records carry an
    explicit kind column)."""
    return df.filter(F.col(kind_col) != "transaction")


# ---------------------------------------------------------------------------
# DDL metadata extraction (X1)
# ---------------------------------------------------------------------------

# Reference: connection/DdlMetadataExtractor.java:21-96 — strip comments,
# first keyword = operation (RENAME reported as ALTER), extract table name.
_COMMENT_RE = r"/\*.*?\*/"
_OP_RE = r"(?i)^\s*(CREATE|ALTER|DROP|TRUNCATE|RENAME)\b"
# table name = first identifier after TABLE keyword, optionally backquoted
_TABLE_RE = r"(?i)TABLE\s+(?:IF\s+(?:NOT\s+)?EXISTS\s+)?`?([\w.]+)`?"


def ddl_operation_expr(statement: Column) -> Column:
    cleaned = F.trim(F.regexp_replace(statement, _COMMENT_RE, ""))
    op = F.upper(F.regexp_extract(cleaned, _OP_RE, 1))
    # RENAME is reported as ALTER (DdlMetadataExtractor semantics)
    return F.when(op == "RENAME", F.lit("ALTER")).otherwise(op)


def ddl_table_expr(statement: Column) -> Column:
    cleaned = F.trim(F.regexp_replace(statement, _COMMENT_RE, ""))
    return F.regexp_extract(cleaned, _TABLE_RE, 1)


def schema_change_records(raw_df: DataFrame, server_name: str = "vitess") -> DataFrame:
    """DDL events → schema-change side-output stream (X1).

    Emitted when ``include.schema.changes`` (default true in reference,
    VitessConnectorConfig.java:378-390); every DDL also rotates the VGTID
    (handled by the source's offset protocol)."""
    ddl = raw_df.filter(F.col("event_kind") == "DDL")
    return ddl.select(
        F.lit(server_name).alias("server_name"),
        F.col("keyspace"),
        F.col("shard"),
        ddl_table_expr(F.col("statement")).alias("table_name"),
        ddl_operation_expr(F.col("statement")).alias("operation"),
        F.col("statement").alias("ddl"),
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        F.col("vgtid"),
    )


def enforce_record_size(
    df: DataFrame,
    max_size: int,
    string_cols: tuple[str, ...],
    *,
    min_field_size: int = 0,
) -> DataFrame:
    """EnforceRecordSize SMT (advertised upstream transform, exercised at
    VitessConnectorIT.java shouldTruncateProportionallyBasedOnColumnSize):
    when a record's string payload exceeds ``max_size``, truncate each
    eligible string field proportionally to its share of the payload, so
    larger fields lose more absolute characters. Fields shorter than
    ``min_field_size`` are exempt.

    Pure integer Catalyst arithmetic, per row: over = total - max_size;
    cut_c = ceil(over * len_c / eligible_total); new_len = len_c - cut_c.
    Ceiling each cut guarantees the truncated payload fits the budget.
    """
    lens = {c: F.coalesce(F.length(F.col(c)), F.lit(0)) for c in string_cols}
    total = None
    eligible_total = None
    for c, ln in lens.items():
        total = ln if total is None else total + ln
        el = F.when(ln >= min_field_size, ln).otherwise(F.lit(0))
        eligible_total = el if eligible_total is None else eligible_total + el
    over = total - F.lit(max_size)
    needs = (over > 0) & (eligible_total > 0)
    # one projection: every truncation reads the ORIGINAL lengths, so cuts
    # are proportional to the pre-truncation payload, not to each other
    out = []
    for c in df.columns:
        if c in lens:
            ln = lens[c]
            cut = F.ceil(over * ln / eligible_total).cast("int")
            new_len = F.greatest(ln - cut, F.lit(0))
            out.append(
                F.when(
                    needs & (ln >= min_field_size),
                    F.col(c).substr(F.lit(1), new_len),
                )
                .otherwise(F.col(c))
                .alias(c)
            )
        else:
            out.append(F.col(c))
    return df.select(*out)
