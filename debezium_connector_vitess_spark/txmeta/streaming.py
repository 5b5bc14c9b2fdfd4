"""Stateful ordered-transaction metadata for streams (T4/T7 streaming path).

The one genuinely stateful operator in the engine (SURVEY.md §7.1 step 5):
keyed by shard, state = {previous gtid, epoch}; on every transaction boundary
the epoch advances per the failover rules (txmeta/epoch.py) and the rank is
computed from the GTID set. State lives in the Spark streaming checkpoint —
the analog of the reference storing ``transaction_epoch`` in Kafka Connect
offsets (VitessOrderedTransactionContext.java:109-127).

Implemented with ``applyInPandasWithState`` (Arrow-batched; state access per
shard group). Input: the raw VEvent frame filtered to COMMIT boundaries.
Output: one row per transaction with epoch + rank.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .epoch import epoch_for_gtid
from .gtid import get_rank

TX_META_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType(), False),
        T.StructField("tx_id", T.StringType(), True),
        T.StructField("gtid", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("transaction_epoch", T.LongType(), True),
        T.StructField("transaction_rank", T.StringType(), True),  # decimal as string
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("prev_gtid", T.StringType(), True),
        T.StructField("epoch", T.LongType(), True),
    ]
)


def _process_shard(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    shard = key[0]
    if state.exists:
        prev_gtid, epoch = state.get
    else:
        # no stored state = overridden start (current/empty): first real tx +1
        prev_gtid, epoch = "current", 0

    # concat all Arrow chunks of the group, then sort ONCE — per-chunk sorting
    # could interleave commits if Arrow split the group across chunks
    chunks = list(pdf_iter)
    if not chunks:
        yield pd.DataFrame(columns=[f.name for f in TX_META_SCHEMA.fields])
        return
    pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
    pdf = pdf.sort_values("seq_order", kind="mergesort")
    out: list[dict[str, Any]] = []
    for row in pdf.itertuples(index=False):
        gtid = row.gtid
        epoch = epoch_for_gtid(epoch, prev_gtid, gtid)
        prev_gtid = gtid
        out.append(
            {
                "shard": shard,
                "tx_id": row.tx_id,
                "gtid": gtid,
                "ts_ms": row.ts_ms,
                "transaction_epoch": epoch,
                "transaction_rank": str(get_rank(gtid)),
            }
        )
    state.update((prev_gtid, epoch))
    yield pd.DataFrame(out, columns=[f.name for f in TX_META_SCHEMA.fields])


def ordered_tx_metadata_stream(raw_df: DataFrame) -> DataFrame:
    """Raw VEvent stream → per-transaction (epoch, rank) records.

    Transaction boundaries = COMMIT events (the reassembly buffer guarantees
    they carry the tx's final position). ``seq_order`` is the transaction RANK
    (Σ max-sequence over ALL hosts of the GTID set, ``rank_expr``): the GTID
    set only grows within a shard, so the sum is strictly increasing across
    commits — monotone even across a failover, where the trailing host's
    sequence resets (the case the epoch counter exists for).
    """
    from .batch import rank_expr

    commits = raw_df.filter(F.col("event_kind") == "COMMIT").select(
        "shard",
        "tx_id",
        "gtid",
        F.unix_millis("ts").alias("ts_ms"),
        rank_expr(F.col("gtid")).alias("seq_order"),
    )
    return commits.groupBy("shard").applyInPandasWithState(
        _process_shard,
        outputStructType=TX_META_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
