"""Catalyst-native transaction-metadata derivation over replayed change frames.

The streaming engine computes epoch/rank in the stateful operator
(``txmeta/streaming.py``); for bounded replays the same semantics are pure
window/aggregate expressions — no state, no UDFs. SURVEY.md §2.5 T1-T8.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _gtid_body(gtid: Column) -> Column:
    """Strip the version prefix ('MySQL56/…' → '…'); Gtid.java:57-83 analog."""
    return F.regexp_replace(gtid, "^[^/]*/", "")


def rank_expr(gtid: Column) -> Column:
    """T3: transaction rank = Σ max-sequence over hosts
    (VitessRankProvider.java:12-19). Pure expression: split entries, take each
    entry's trailing number, sum as DecimalType(38,0)."""
    entries = F.split(_gtid_body(gtid), ",")
    seqs = F.transform(
        entries, lambda e: F.regexp_extract(e, r"(\d+)$", 1).cast("decimal(38,0)")
    )
    return F.aggregate(
        seqs, F.lit(0).cast("decimal(38,0)"), lambda acc, x: acc + x
    )


def host_set_expr(gtid: Column) -> Column:
    """Sorted host list of a GTID set (Gtid.getHosts analog)."""
    entries = F.split(_gtid_body(gtid), ",")
    return F.sort_array(F.transform(entries, lambda e: F.split_part(e, F.lit(":"), F.lit(1))))


def epoch_batch(
    df: DataFrame,
    *,
    shard_col: str = "shard",
    order_col: str = "event_id",
    gtid_col: str = "gtid",
    tx_col: str | None = None,
    initial_epoch: int = 1,
) -> DataFrame:
    """T4 batch analog: per-shard epoch = running count of host-set breaks.

    A break is any transition where the new host set is NOT a superset of the
    previous (failover) — VitessEpochProvider.java:69-83. ``initial_epoch=1``
    models a replay that began from an overridden position (current/empty ⇒
    +1 on the first real transaction, VitessEpochProvider.java:46-56).

    Scale shape: epochs are a *per-transaction* property (the reference
    derives them on BEGIN — VitessOrderedTransactionContext.java:109-127), so
    with ``tx_col`` set the window runs over the deduplicated
    ``(shard, tx)`` frame — an order of magnitude smaller than the event
    frame — and the result joins back onto the events. Only the narrow
    (shard, tx, order, gtid) projection is ever sorted; the wide event
    payload never enters the window. Without ``tx_col`` (per-event streams)
    the window still sorts only a narrow projection and joins back, so the
    per-shard sort never carries the event payload either way.

    Parallelism is #shards — the per-shard running count is the reference's
    own ordering contract (epochs are defined by each shard's sequential
    history), so a shard's prefix cannot be computed out of order. For
    unbounded histories the incremental path is the streaming operator
    (txmeta.streaming), which carries the running state in the checkpoint
    instead of re-sorting the backlog.
    """
    keys = [shard_col, tx_col] if tx_col is not None else [shard_col, order_col]
    if tx_col is not None:
        # one row per (shard, tx): the tx's gtid (constant within it) and its
        # first position — a map-side-combining aggregation, ~10× reduction
        narrow = df.groupBy(shard_col, tx_col).agg(
            F.min(order_col).alias("__tx_order"),
            F.min(gtid_col).alias("__tx_gtid"),
        )
        order, gtid = F.col("__tx_order"), F.col("__tx_gtid")
    else:
        narrow = df.select(shard_col, order_col, gtid_col)
        order, gtid = F.col(order_col), F.col(gtid_col)
    w = Window.partitionBy(shard_col).orderBy(order)
    # stage the host set once — it feeds both lag() and the current-row
    # comparison, and the regex split/sort is the expensive part
    staged = narrow.withColumn("__hosts", host_set_expr(gtid))
    hosts = F.col("__hosts")
    prev_hosts = F.lag(hosts).over(w)
    brk = F.when(
        prev_hosts.isNotNull() & (F.size(F.array_except(prev_hosts, hosts)) > 0), F.lit(1)
    ).otherwise(F.lit(0))
    running = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    epochs = staged.withColumn(
        "transaction_epoch", (running + F.lit(initial_epoch)).cast("long")
    ).select(*keys, "transaction_epoch")
    return df.join(epochs, on=keys)


def with_tx_order(
    df: DataFrame,
    *,
    tx_col: str = "tx_id",
    table_col: str = "table_name",
    order_col: str = "event_id",
) -> DataFrame:
    """T8: total_order (position in tx) and data_collection_order (position in
    tx per table) — VitessOrderedTransactionStructMaker.java:38-57 analog."""
    w_tx = Window.partitionBy(tx_col).orderBy(order_col)
    w_tbl = Window.partitionBy(tx_col, table_col).orderBy(order_col)
    return df.withColumn("total_order", F.row_number().over(w_tx).cast("long")).withColumn(
        "data_collection_order", F.row_number().over(w_tbl).cast("long")
    )


def transaction_boundaries(
    df: DataFrame,
    *,
    tx_col: str = "tx_id",
    order_col: str = "event_id",
) -> DataFrame:
    """T1: per-transaction BEGIN/END summary with event counts
    (dispatchTransactionStartedEvent/CommittedEvent analog,
    VitessStreamingChangeEventSource.java:98-121)."""
    return df.groupBy(tx_col).agg(
        F.count("*").alias("event_count"),
        F.min(F.unix_millis("ts")).alias("begin_ts_ms"),
        F.max(F.unix_millis("ts")).alias("end_ts_ms"),
        F.max_by("gtid", F.col(order_col)).alias("end_gtid"),
    )
