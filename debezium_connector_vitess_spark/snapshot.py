"""Initial snapshot (VStream Copy analog) — SURVEY.md §2.1 S3, §2.4 O6.

The reference triggers a server-side table copy by starting from an empty
GTID; progress is the per-table last PK carried inside the VGTID
(TablePrimaryKeys.java:27-368). The Spark-native analog is a batch backfill
unioned ahead of the stream:

- **bulk path**: one ``spark.read`` of the source table (parquet/JDBC) — Spark
  parallelizes the scan; right for a fresh backfill on a cluster;
- **chunked path**: keyset pagination over the PK with the cursor recorded as
  a copy-phase ``TableLastPK`` in the source's initial offset, so an
  interrupted backfill resumes where it stopped (exactly the VStream Copy
  resume semantics);
- **handoff**: copy rows are emitted as op='r' (snapshot read) envelopes, then
  the stream takes over from the VGTID captured at copy start.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .vgtid import ShardGtid, TableLastPK, Vgtid

OP_SNAPSHOT_READ = "r"  # Debezium snapshot-read op code


@dataclass
class CopyCursor:
    """Resumable keyset cursor for one table's copy phase."""

    table: str
    pk_column: str
    last_pk: Optional[int] = None  # None = not started
    done: bool = False

    def to_table_last_pk(self) -> TableLastPK:
        return TableLastPK(
            table_name=self.table,
            lastpk={"fields": [{"name": self.pk_column}], "rows": [str(self.last_pk)]}
            if self.last_pk is not None
            else {},
        )


def snapshot_chunk(
    df: DataFrame,
    cursor: CopyCursor,
    *,
    chunk_size: int,
) -> tuple[DataFrame, CopyCursor]:
    """One keyset page: rows with pk > last_pk, ordered, limited.

    Returns (chunk, advanced cursor). Catalyst pushes the range predicate to
    the scan (parquet min/max pruning / JDBC WHERE), so each page reads only
    what it needs — this is what makes the copy resumable at 100 TB without
    rescanning.
    """
    pk = F.col(cursor.pk_column)
    page = df
    if cursor.last_pk is not None:
        page = page.filter(pk > cursor.last_pk)
    page = page.orderBy(pk).limit(chunk_size)
    rows = page.select(cursor.pk_column).agg(
        F.max(cursor.pk_column).alias("mx"), F.count("*").alias("n")
    ).collect()[0]
    new_cursor = CopyCursor(
        table=cursor.table,
        pk_column=cursor.pk_column,
        last_pk=rows["mx"] if rows["mx"] is not None else cursor.last_pk,
        done=rows["n"] < chunk_size,
    )
    return page, new_cursor


def snapshot_table(
    spark: SparkSession,
    path: str,
    *,
    table: str,
    keyspace: str,
    shard_expr: F.Column,
    pk_column: str = "id",
) -> DataFrame:
    """Bulk backfill of one table as op='r' snapshot envelopes."""
    df = spark.read.parquet(path)
    return df.select(
        F.lit(OP_SNAPSHOT_READ).alias("op"),
        F.lit(keyspace).alias("keyspace"),
        shard_expr.alias("shard"),
        F.lit(table).alias("table_name"),
        F.struct(*[F.col(c) for c in df.columns]).alias("after"),
    )


def initial_offset_with_copy(
    keyspace: str,
    shards: list[str],
    cursors: list[CopyCursor],
) -> Vgtid:
    """Offset document during the copy phase: empty GTIDs + per-table last-PK
    (the ``table_p_ks`` VGTID element, Vgtid.java:44-59)."""
    tpks = tuple(c.to_table_last_pk() for c in cursors if not c.done)
    return Vgtid(tuple(ShardGtid(keyspace, s, "", tpks) for s in sorted(shards)))
