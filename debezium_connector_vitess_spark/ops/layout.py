"""Output layout: balanced, key-clustered training shards.

The write side of a 100 TB pipeline is its own scale problem: a plain
``df.write`` emits one file per upstream partition — after a groupBy that's
``shuffle.partitions`` arbitrary-size files with random key placement, so
downstream epoch readers get no pruning and shard-sized batches are luck.
This module makes shard geometry explicit:

- **rows-per-shard control**: shard count = ceil(rows / rows_per_shard); the
  one ``count()`` is a columnless scan (cheap even at 100 TB: parquet
  row-group metadata), or the caller passes ``num_shards`` to skip it.
- **range clustering**: ``repartitionByRange(sort_col)`` + in-partition sort
  gives globally non-overlapping key ranges per file, so parquet min/max
  footers prune file-level on the sort key for any downstream range read —
  the poor man's Z-order, exact for a single key.
- Range boundaries come from Spark's reservoir sampling of the key
  (`RangePartitioner`), so shards are balanced up to sampling error without
  a full sort.
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_for_shards(
    df: DataFrame,
    *,
    sort_col: str,
    rows_per_shard: Optional[int] = None,
    num_shards: Optional[int] = None,
) -> DataFrame:
    """Re-layout ``df`` into ``num_shards`` range-partitioned, internally
    sorted partitions (one output file each under a direct ``.write``).

    Exactly one of ``rows_per_shard`` / ``num_shards`` must be given.
    """
    if (rows_per_shard is None) == (num_shards is None):
        raise ValueError("pass exactly one of rows_per_shard / num_shards")
    if num_shards is None:
        n = df.count()
        num_shards = max(1, math.ceil(n / rows_per_shard))
    return df.repartitionByRange(num_shards, F.col(sort_col)).sortWithinPartitions(
        sort_col
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    sort_col: str,
    rows_per_shard: Optional[int] = None,
    num_shards: Optional[int] = None,
    format: str = "parquet",
    mode: str = "overwrite",
) -> DataFrame:
    """Write ``df`` as balanced sort-clustered shards and return the shard
    manifest (one row per output file: file, rows, min/max of the sort key)
    computed distributed from the written data — the manifest a trainer's
    data loader consumes.
    """
    clustered = cluster_for_shards(
        df, sort_col=sort_col, rows_per_shard=rows_per_shard, num_shards=num_shards
    )
    clustered.write.format(format).mode(mode).save(path)
    spark = df.sparkSession
    return (
        spark.read.format(format)
        .load(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count("*").alias("rows"),
            F.min(sort_col).alias(f"min_{sort_col}"),
            F.max(sort_col).alias(f"max_{sort_col}"),
        )
    )


def read_shard_range(
    spark,
    path: str,
    *,
    sort_col: str,
    lo,
    hi,
    manifest: Optional[DataFrame] = None,
    format: str = "parquet",
) -> DataFrame:
    """Manifest-pruned range read — the consumption side the range-clustered
    layout exists for: load ONLY the shard files whose [min, max] key span
    overlaps [lo, hi] (inclusive), then filter exactly.

    ``manifest`` is the frame :func:`write_training_shards` returned; pass
    ``None`` to rebuild it from the written footers. The manifest is
    file-list-sized (one row per output file) so collecting it driver-side
    is the same class of operation as Spark's own file-listing; the pruned
    read plus the pushed-down ``BETWEEN`` filter means unselected shards are
    never opened.
    """
    if manifest is None:
        manifest = (
            spark.read.format(format)
            .load(path)
            .groupBy(F.input_file_name().alias("file"))
            .agg(
                F.min(sort_col).alias(f"min_{sort_col}"),
                F.max(sort_col).alias(f"max_{sort_col}"),
            )
        )
    files = [
        r["file"]
        for r in manifest.filter(
            (F.col(f"min_{sort_col}") <= hi) & (F.col(f"max_{sort_col}") >= lo)
        ).collect()
    ]
    base = spark.read.format(format)
    if not files:
        return base.load(path).filter(F.lit(False))
    return base.load(files).filter(F.col(sort_col).between(lo, hi))
