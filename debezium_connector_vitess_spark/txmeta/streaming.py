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


KS_STATE_SCHEMA = T.StructType(
    [T.StructField("state_json", T.StringType(), True)]
)


def _process_keyspace(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Keyspace-keyed variant of :func:`_process_shard` carrying the WHOLE
    shard→{prev_gtid, epoch} map in one group state, so a shard born from a
    reshard can inherit max(parent epochs)+1 from its key-range parents
    (T5, ShardLineage.java:26-94) — lineage that per-shard state cannot see
    (SURVEY §7.4: keyed state by keyspace when lineage is needed)."""
    import json

    from .epoch import _overlaps

    if state.exists:
        shard_state: dict = json.loads(state.get[0])
    else:
        shard_state = {}
    chunks = list(pdf_iter)
    if not chunks:
        yield pd.DataFrame(columns=[f.name for f in TX_META_SCHEMA.fields])
        return
    pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
    # chronological application across shards (the reference's single consumer
    # thread): a child's first commit must observe its parent's final epoch
    pdf = pdf.sort_values(["ts_ms", "seq_order"], kind="mergesort")
    out: list[dict[str, Any]] = []
    for row in pdf.itertuples(index=False):
        shard = row.shard
        st = shard_state.get(shard)
        if st is None:
            parents = [
                s["epoch"] for sh, s in shard_state.items() if _overlaps(shard, sh)
            ]
            if parents:
                # reshard: inherited epoch applies to the first tx as-is
                epoch = max(parents) + 1
                prev_gtid = None
            else:
                # genuinely new shard = overridden start (current): first
                # real transaction increments (epoch_for_gtid below)
                prev_gtid, epoch = "current", 0
        else:
            prev_gtid, epoch = st["prev_gtid"], st["epoch"]
        if prev_gtid is not None:
            epoch = epoch_for_gtid(epoch, prev_gtid, row.gtid)
        shard_state[shard] = {"prev_gtid": row.gtid, "epoch": epoch}
        out.append(
            {
                "shard": shard,
                "tx_id": row.tx_id,
                "gtid": row.gtid,
                "ts_ms": row.ts_ms,
                "transaction_epoch": epoch,
                "transaction_rank": str(get_rank(row.gtid)),
            }
        )
    state.update((json.dumps(shard_state, sort_keys=True),))
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


try:  # the tws API ships with Spark 4.x; keep module import safe elsewhere
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor as _StatefulProcessorBase,
    )
except ImportError:  # pragma: no cover
    _StatefulProcessorBase = object  # type: ignore[assignment,misc]


class _OrderedTxProcessor(_StatefulProcessorBase):
    """StatefulProcessor for :func:`ordered_tx_metadata_stream_tws` — same
    per-shard state machine as :func:`_process_shard` on the
    current-generation stateful API (ValueState instead of GroupState)."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("tx_state", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timer_values):
        shard = key[0]
        stored = self._state.get() if self._state.exists() else None
        prev_gtid, epoch = stored if stored is not None else ("current", 0)
        chunks = list(rows)
        if not chunks:
            yield pd.DataFrame(columns=[f.name for f in TX_META_SCHEMA.fields])
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values("seq_order", kind="mergesort")
        out: list[dict[str, Any]] = []
        for row in pdf.itertuples(index=False):
            epoch = epoch_for_gtid(epoch, prev_gtid, row.gtid)
            prev_gtid = row.gtid
            out.append(
                {
                    "shard": shard,
                    "tx_id": row.tx_id,
                    "gtid": row.gtid,
                    "ts_ms": row.ts_ms,
                    "transaction_epoch": epoch,
                    "transaction_rank": str(get_rank(row.gtid)),
                }
            )
        self._state.update((prev_gtid, epoch))
        yield pd.DataFrame(out, columns=[f.name for f in TX_META_SCHEMA.fields])

    def close(self) -> None:
        pass


def ordered_tx_metadata_stream_tws(raw_df: DataFrame) -> DataFrame:
    """T4/T7 on ``transformWithStateInPandas`` (the current-generation Spark
    stateful API, Spark 4.x): per-shard ``ValueState`` {prev_gtid, epoch}.

    Same output contract as :func:`ordered_tx_metadata_stream` (the parity
    test runs both over the same replay stream and compares row sets).
    Requires (a) the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider``) and (b) the ``google.protobuf``
    runtime, which tws's Python state-server protocol imports
    (``pyspark.sql.streaming.proto``). This container ships neither
    protobuf nor pip access, so HERE the parity test skips — the same
    environmental gate as the grpcio live channel; plan construction is
    exercised, execution is not. The ``applyInPandasWithState`` form
    remains the default registry/bench path; this one is the
    forward-compatible implementation (and the base to hang per-key TTL
    timers on)."""
    from .batch import rank_expr

    proc = _OrderedTxProcessor()
    commits = raw_df.filter(F.col("event_kind") == "COMMIT").select(
        "shard",
        "tx_id",
        "gtid",
        F.unix_millis("ts").alias("ts_ms"),
        rank_expr(F.col("gtid")).alias("seq_order"),
    )
    return commits.groupBy("shard").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=TX_META_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def ordered_tx_metadata_stream_lineage(raw_df: DataFrame) -> DataFrame:
    """Ordered-tx metadata WITH reshard-epoch lineage (T4/T5/T7 streaming).

    Keyed by keyspace instead of shard: one group state holds the keyspace's
    entire shard→{prev_gtid, epoch} map (small — shard counts are tens to
    hundreds, and only this operator's state, not the data, concentrates per
    keyspace), so when a reshard makes a never-seen shard appear mid-stream
    its epoch is inherited from the key-range-overlapping parents
    (max(parent epochs)+1, ShardLineage.java:26-94) rather than restarting
    at an overridden-start epoch.
    """
    from .batch import rank_expr

    commits = raw_df.filter(F.col("event_kind") == "COMMIT").select(
        "keyspace",
        "shard",
        "tx_id",
        "gtid",
        F.unix_millis("ts").alias("ts_ms"),
        rank_expr(F.col("gtid")).alias("seq_order"),
    )
    return commits.groupBy("keyspace").applyInPandasWithState(
        _process_keyspace,
        outputStructType=TX_META_SCHEMA,
        stateStructType=KS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
