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
from pyspark.sql.window import Window


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


def shuffle_for_training(
    df: DataFrame,
    *,
    id_col: str,
    seed: int,
    num_shards: int,
) -> DataFrame:
    """Deterministic seeded GLOBAL shuffle — the training-epoch randomization
    a data loader needs, as a reproducible layout instead of runtime chance.

    Every row gets a shuffle key = 60-bit md5 prefix of ``"{id}:{seed}"``
    (:func:`ops.text.token_hash_expr`'s engine-agnostic construction — any
    SQL engine can recompute and audit the exact epoch order), then
    ``shard = key mod num_shards`` and ``pos`` = the row's rank inside its
    shard ordered by (key, id). The induced total order (shard, pos) is a
    pure function of (id set, seed): independent of input partitioning, file
    order, or cluster size — re-running an epoch reproduces it bit-for-bit,
    and a new seed is a fresh permutation. md5's uniformity makes shard
    sizes balanced to ~sqrt(n/num_shards).

    Scale shape: ONE hash-partition exchange on ``shard`` + a per-shard sort
    window — parallelism = ``num_shards`` (pick ≥ cluster cores; thousands
    at 100 TB), never a single-partition stage. The per-shard ``row_number``
    is exactly the sort the shard file needs anyway before writing.
    """
    key = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.col(id_col), F.lit(seed))), 1, 15),
        16,
        10,
    ).cast("long")
    out = df.withColumn("_skey", key).withColumn(
        "shard", F.pmod(F.col("_skey"), F.lit(num_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("_skey", id_col)
    return out.withColumn("pos", (F.row_number().over(w) - 1).cast("long")).drop(
        "_skey"
    )


def zorder_key_expr(
    cols: list[str],
    *,
    bounds: dict[str, tuple[int, int]],
    bits: int = 8,
) -> "F.Column":
    """Morton/Z-order key over ``cols``: each column's value is normalized to
    a ``bits``-bit integer code against its EXACT global [min, max] (pure
    integer math — ``((v - mn) * 2^bits) div (mx - mn + 1)`` — so the key is
    an engine-independent deterministic function, auditable in any SQL
    engine), then the codes' bits are interleaved (bit b of column i lands
    at position ``b * len(cols) + i``).

    Range-clustering by this key (``repartitionByRange`` + in-partition
    sort) gives files whose parquet min/max footers are narrow on EVERY
    participating column at once — the multi-dimensional generalization of
    the single-key range layout: a 2-D box predicate prunes files on both
    dimensions, where a single-key sort prunes on one and scans everything
    for the other (the lakehouse OPTIMIZE ZORDER BY pattern).

    ``bounds`` maps column → (min, max), computed exactly by
    :func:`column_bounds` (one tiny global aggregate). NULLs code to 0 (the
    minimum cell) — they cluster together at the origin instead of
    poisoning the key. Columns must be integral; ``bits`` × len(cols) ≤ 63
    so the key fits a BIGINT. Exactness guard: the normalization is
    ``floor((v - mn) * 2^bits / span)`` in double arithmetic, which is
    provably floor-exact while ``span * 2^bits < 2^52`` (numerator exactly
    representable; IEEE nearest-division error < the 1/span gap to the next
    integer) — wider spans (hash-distributed ids) raise, pre-shift them
    into range first.
    """
    k = len(cols)
    if k == 0:
        raise ValueError("zorder_key_expr needs at least one column")
    if bits * k > 63:
        raise ValueError(f"bits * len(cols) = {bits * k} exceeds a BIGINT")
    terms = []
    for i, c in enumerate(cols):
        if c not in bounds:
            raise ValueError(f"no bounds for column {c!r}")
        mn, mx = bounds[c]
        if mx < mn:
            raise ValueError(f"bounds for {c!r} are inverted: ({mn}, {mx})")
        span = (mx - mn) + 1
        if span << bits >= 1 << 52:
            raise ValueError(
                f"column {c!r} spans {span} values — floor-exact z-coding "
                f"needs span * 2^bits < 2^52; shift/bucket the column (e.g. "
                f"v >> {max(0, (span.bit_length() + bits) - 52)}) first"
            )
        code = F.floor(
            ((F.coalesce(F.col(c), F.lit(mn)).cast("long") - F.lit(mn)) * F.lit(1 << bits))
            / F.lit(span)
        ).cast("long")
        for b in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(code, b).bitwiseAND(F.lit(1)), b * k + i
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def column_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple[int, int]]:
    """Exact global (min, max) per column in ONE aggregate pass — the tiny
    scan that anchors :func:`zorder_key_expr`'s normalization. min/max are
    exact (not sampled) so the z-key is reproducible by any engine reading
    the same data."""
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"__mn_{c}"))
        aggs.append(F.max(c).alias(f"__mx_{c}"))
    row = df.agg(*aggs).collect()[0]
    out = {}
    for c in cols:
        mn, mx = row[f"__mn_{c}"], row[f"__mx_{c}"]
        if mn is None:
            raise ValueError(f"column {c!r} is all-NULL — no z-order bounds")
        out[c] = (int(mn), int(mx))
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    *,
    cols: list[str],
    num_shards: int,
    bits: int = 8,
    bounds: Optional[dict[str, tuple[int, int]]] = None,
    format: str = "parquet",
    mode: str = "overwrite",
) -> DataFrame:
    """Write ``df`` Z-order-clustered on ``cols`` and return the
    MULTI-COLUMN manifest (one row per file with min/max of EVERY
    participating column) that :func:`read_zordered_box` prunes against.

    Layout = ``repartitionByRange(num_shards, zkey)`` + in-partition sort by
    the key: one exchange, boundaries from Spark's reservoir sample of the
    key (balanced shards without a full sort), same write shape as
    :func:`write_training_shards`. The z-key itself is dropped from the
    files — it's reconstructible from ``bounds``, and the pruning contract
    lives in the per-column footer ranges, not the key."""
    if bounds is None:
        bounds = column_bounds(df, cols)
    zkey = zorder_key_expr(cols, bounds=bounds, bits=bits)
    clustered = (
        df.withColumn("__zkey", zkey)
        .repartitionByRange(num_shards, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
    clustered.write.format(format).mode(mode).save(path)
    spark = df.sparkSession
    aggs = [F.count("*").alias("rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return (
        spark.read.format(format)
        .load(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
    )


def read_zordered_box(
    spark,
    path: str,
    *,
    box: dict[str, tuple[int, int]],
    manifest: DataFrame,
    format: str = "parquet",
) -> DataFrame:
    """Manifest-pruned BOX read over a Z-ordered layout: open only the files
    whose per-column [min, max] spans overlap EVERY box edge (inclusive),
    then filter exactly. The multi-dimensional twin of
    :func:`read_shard_range` — on a Z-ordered layout each dimension's spans
    are narrow, so a selective 2-D box opens a small corner of the file set
    instead of every file a single-key sort would leave overlapping on the
    second dimension."""
    pred = F.lit(True)
    for c, (lo, hi) in box.items():
        pred = pred & (F.col(f"min_{c}") <= hi) & (F.col(f"max_{c}") >= lo)
    files = [r["file"] for r in manifest.filter(pred).collect()]
    base = spark.read.format(format)
    if not files:
        return base.load(path).filter(F.lit(False))
    out = base.load(files)
    for c, (lo, hi) in box.items():
        out = out.filter(F.col(c).between(lo, hi))
    return out


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str,
    num_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (+ optionally sorted) catalog table so
    every later equi-join or aggregation on ``bucket_col`` is CO-LOCATED:
    Spark's bucketing contract hashes ``bucket_col`` into ``num_buckets``
    files per partition at WRITE time, and a scan of two tables bucketed the
    same way feeds a SortMergeJoin with ZERO Exchange (and, when ``sort``,
    zero per-task Sort) — the single biggest shuffle eliminator for a hub
    table that is joined repeatedly on the same key (e.g. a doc_id-keyed
    corpus joined by every curation signal frame).

    At 100 TB this is the difference between re-shuffling the corpus once
    per consumer and paying the layout cost once at ingest. Pick
    ``num_buckets`` ≈ corpus_bytes / target_task_bytes (e.g. 100 TB /
    256 MB ≈ 400k is too many files — bucket the JOIN side you broadcast
    can't handle, typically 2-8k buckets, and let AQE coalesce). The
    no-Exchange join plan is pinned by
    tests/test_plans.py::test_bucketed_join_has_no_exchange.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


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


def key_skew_profile(
    df: DataFrame,
    cols: list[str],
    *,
    top_n: int = 10,
    sample_frac: float | None = None,
) -> DataFrame:
    """Heavy-hitter profile of candidate shuffle keys — the measurement
    behind every salting / broadcast / AQE-skew decision: before keying a
    100 TB join or groupBy on a column, ask what fraction of the corpus its
    hottest values hold. Returns (column, value, n, rank, share) for each
    column's ``top_n`` most frequent values; NULL is profiled as a value in
    its own right (an unexpectedly hot NULL is the classic silent skew key,
    and it sorts first among ties).

    One pass for ALL columns: the frame stacks to (column, value) pairs and
    aggregates once — partial (map-side) aggregation collapses each
    partition's pairs to its local distinct set before the exchange, so the
    shuffle carries per-partition distinct (column, value) combos, not
    n_rows × n_cols. That is the right shape for KEY-like columns (bounded
    cardinality); for near-unique columns the distinct set IS the data —
    pass ``sample_frac`` to profile a Bernoulli sample instead (shares are
    estimates; a heavy hitter at 1% of the corpus is unmissable at any
    reasonable fraction). Ranking runs per column on the aggregated
    (distinct-values)-sized frame; ties break on value ascending so the
    report is deterministic across engines and runs.
    """
    if not cols:
        raise ValueError("cols must name at least one column to profile")
    if top_n <= 0:
        raise ValueError(f"top_n must be positive, got {top_n}")
    if sample_frac is not None:
        if not 0.0 < sample_frac <= 1.0:
            raise ValueError(f"sample_frac must be in (0, 1], got {sample_frac}")
        df = df.sample(fraction=sample_frac, seed=7)
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("kv")
    ).select("kv.column", "kv.value")
    counts = stacked.groupBy("column", "value").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("column").orderBy(
        F.col("n").desc(), F.col("value").asc_nulls_first()
    )
    totals = counts.groupBy("column").agg(F.sum("n").alias("__t"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .join(F.broadcast(totals), on="column")
        .select(
            "column",
            "value",
            "n",
            "rank",
            (F.col("n") / F.col("__t")).alias("share"),
        )
    )


def audit_file_layout(
    spark,
    path: str,
    *,
    small_mb: float = 32.0,
    large_mb: float = 2048.0,
) -> DataFrame:
    """Parquet file-geometry audit — the small-files / giant-files report
    that decides whether a 100 TB corpus needs compaction before anything
    else touches it: a scan of 10⁷ kilobyte files loses to task-scheduling
    overhead no matter how good the query plan is, and multi-GB single-
    row-group files defeat split parallelism.

    One row per data file: (file, bytes, rows, n_row_groups,
    max_row_group_bytes, flag) with flag ∈ small|large|fat_row_group|ok —
    ``small``/``large`` against the thresholds, ``fat_row_group`` when one
    row group exceeds ``large_mb`` (a file that size with MANY row groups
    still splits fine, so the row-group check is what actually matters for
    parallelism).

    Scale shape: the file LIST is driver-side (same filesystem-metadata
    cost every planner pays); the footer reads are DISTRIBUTED — the list
    becomes a one-column frame and an Arrow seam opens each footer
    (metadata pages only, never data pages), so auditing a million files
    parallelizes across the cluster instead of serializing on the driver.

    Precondition: a POSIX path visible to driver AND executors (local
    mode, NFS, fuse mounts). Remote schemes (s3://, hdfs://) are rejected
    loudly — os.walk would silently find nothing and pyarrow's local open
    would fail executor-side; route those through a mount or list+read via
    the object store's own client. A nonexistent path raises rather than
    returning an empty report: the documented compaction recipe feeds this
    report into shard sizing, and an accidentally-empty report must not
    masquerade as a healthy corpus.
    """
    import os

    if "://" in path:
        raise ValueError(
            f"audit_file_layout reads POSIX paths only, got {path!r} — mount "
            "the store or list it with its own client"
        )
    if not os.path.isdir(path):
        raise FileNotFoundError(f"not a directory: {path!r}")
    names = []
    for root, _dirs, fs in os.walk(path):
        for f in fs:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                names.append(os.path.join(root, f))
    if not names:
        return spark.createDataFrame(
            [],
            "file string, bytes long, rows long, n_row_groups int, "
            "max_row_group_bytes long, flag string",
        )

    small_b = int(small_mb * 1024 * 1024)
    large_b = int(large_mb * 1024 * 1024)

    def read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                md = pq.ParquetFile(f).metadata
                size = os.path.getsize(f)
                rg_bytes = [
                    md.row_group(i).total_byte_size for i in range(md.num_row_groups)
                ]
                max_rg = max(rg_bytes) if rg_bytes else 0
                if max_rg > large_b:
                    flag = "fat_row_group"
                elif size < small_b:
                    flag = "small"
                elif size > large_b:
                    flag = "large"
                else:
                    flag = "ok"
                rows.append((f, size, md.num_rows, md.num_row_groups, max_rg, flag))
            yield pd.DataFrame(
                rows,
                columns=[
                    "file", "bytes", "rows", "n_row_groups",
                    "max_row_group_bytes", "flag",
                ],
            )

    files = spark.createDataFrame([(n,) for n in sorted(names)], "file string")
    return files.repartition(min(len(names), 64)).mapInPandas(
        read_footers,
        schema=(
            "file string, bytes long, rows long, n_row_groups int, "
            "max_row_group_bytes long, flag string"
        ),
    )


def target_rows_per_shard(audit_df: DataFrame, *, target_mb: float = 512.0) -> int:
    """The missing arithmetic between :func:`audit_file_layout` and
    :func:`write_training_shards`: a rows-per-shard target that lands
    output files near ``target_mb``, from the audited corpus's own
    bytes-per-row (Σ bytes / Σ rows over the report — compression and
    schema already priced in, no guessing). One aggregate over the
    file-count-sized audit frame; returns at least 1. An EMPTY audit
    raises: silently defaulting would hand write_training_shards
    rows_per_shard=1 and explode the corpus into one file per row — the
    exact pathology this pipeline exists to fix.

    Compaction is then two calls::

        audit = audit_file_layout(spark, src)
        rows = target_rows_per_shard(audit, target_mb=512)
        write_training_shards(spark.read.parquet(src), dst,
                              sort_col="doc_id", rows_per_shard=rows)
    """
    if target_mb <= 0:
        raise ValueError(f"target_mb must be positive, got {target_mb}")
    tot = audit_df.agg(
        F.sum("bytes").alias("b"), F.sum("rows").alias("r")
    ).collect()[0]
    if not tot["r"]:
        raise ValueError(
            "audit frame has no rows — refusing to size shards from an "
            "empty report (would default to one file per row)"
        )
    bytes_per_row = tot["b"] / tot["r"]
    return max(1, int(target_mb * 1024 * 1024 / bytes_per_row))
