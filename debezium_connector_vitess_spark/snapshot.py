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


def snapshot_copy(
    df: DataFrame,
    cursor: CopyCursor,
    *,
    chunk_size: int,
) -> tuple[DataFrame, list[int]]:
    """One-pass chunked copy: all PK ranges planned up front.

    The naive keyset loop (per page: ``orderBy(pk).limit(chunk)`` over all
    remaining rows + a ``collect()`` round-trip) is O(n²/chunk) work and one
    driver sync per page — at 100 TB, a 1 B-row table at chunk 10k would be
    100k sequential driver round-trips. Instead this does ONE stats aggregate
    (min/max/count of the remaining PK range — the only driver sync), derives
    equal-width PK ranges covering ~``chunk_size`` rows each, and tags every
    row with its ``copy_chunk`` arithmetically — a narrow codegen'd
    projection on a single scan. Skewed PKs make chunk populations uneven,
    which only affects resume granularity, not memory (chunks are offsets,
    not buffers).

    Returns ``(rows, boundaries)``: ``rows`` is the remaining copy as one
    DataFrame with a ``copy_chunk`` column; ``boundaries[i]`` is chunk i's
    inclusive upper PK — exactly the value a restart records as the cursor's
    ``last_pk`` (the ``table_p_ks`` element of the VGTID,
    TablePrimaryKeys.java:27-368). The cursor's range predicate pushes to the
    scan (parquet min/max pruning / JDBC WHERE), so a resumed copy reads only
    what it still needs.
    """
    pk = F.col(cursor.pk_column)
    remaining = df.filter(pk > cursor.last_pk) if cursor.last_pk is not None else df
    stats = remaining.agg(
        F.min(pk).alias("mn"), F.max(pk).alias("mx"), F.count("*").alias("n")
    ).collect()[0]
    if not stats["n"]:
        return remaining.withColumn("copy_chunk", F.lit(0).cast("long")), []
    mn, mx, n = int(stats["mn"]), int(stats["mx"]), int(stats["n"])
    n_chunks = max(1, -(-n // chunk_size))
    width = max(1, -(-(mx - mn + 1) // n_chunks))
    chunked = remaining.withColumn(
        "copy_chunk", F.floor((pk - F.lit(mn)) / F.lit(width)).cast("long")
    )
    boundaries = [min(mn + (i + 1) * width - 1, mx) for i in range(n_chunks)]
    return chunked, boundaries


def cursor_at(cursor: CopyCursor, boundaries: list[int], chunk_idx: int) -> CopyCursor:
    """Cursor state after chunk ``chunk_idx`` completed — what the offset
    document records so an interrupted copy resumes at the next range."""
    return CopyCursor(
        table=cursor.table,
        pk_column=cursor.pk_column,
        last_pk=boundaries[chunk_idx],
        done=chunk_idx >= len(boundaries) - 1,
    )


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
