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

    out: list[dict[str, Any]] = []
    for pdf in pdf_iter:
        pdf = pdf.sort_values("seq_order")
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
    they carry the tx's final position). ``seq_order`` uses the GTID's trailing
    sequence so within-batch ordering matches stream order.
    """
    commits = raw_df.filter(F.col("event_kind") == "COMMIT").select(
        "shard",
        "tx_id",
        "gtid",
        F.unix_millis("ts").alias("ts_ms"),
        F.regexp_extract("gtid", r"(\d+)$", 1).cast("long").alias("seq_order"),
    )
    return commits.groupBy("shard").applyInPandasWithState(
        _process_shard,
        outputStructType=TX_META_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
