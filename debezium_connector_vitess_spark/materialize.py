"""Latest-state materialization: changelog → current table snapshot.

The standard downstream-consumer pattern for the reference's output records
(reference README.md:28: consumers sink the CDC envelope into a queryable
table via JDBC-sink upsert or a compacted Kafka topic keyed by the record
key, VitessChangeRecordEmitter.java:31-114 / record keys
VStreamOutputMessageDecoder.java:436-447). Here it is a first-class engine
operator, in two execution shapes:

- **Batch** (:func:`materialize_latest`): ONE partial-aggregable shuffle —
  ``max_by`` per (table, key) aggregates map-side before the exchange, so
  100 TB of changelog reduces to ~|live keys| without a sort or a window.
- **Streaming** (:func:`materialize_stream`): ``applyInPandasWithState``
  keyed by (keyspace, table, record key); per-key state = {seq, change_idx,
  op, after_json}; each micro-batch emits one compacted upsert record per
  touched key (the Kafka log-compaction analog — a tombstone for a last-op
  DELETE). State lives in the Spark streaming checkpoint, partitioned by
  the group key, so state size scales with |live keys| per executor, not
  with stream length.

Ordering key: any per-shard monotone sequence. The default parses the
trailing sequence number of the envelope's own ``gtid`` (a MySQL GTID's
per-host sequence only grows within a shard, Vgtid.java:26-106); a key
lives in exactly one shard at a time, so shard-local monotonicity is
sufficient for per-key last-write-wins. Every row change of one Vitess
TRANSACTION shares a GTID, so ties are broken by ``change_idx`` — the
change's position inside the transaction (decode.explode_row_changes) —
making "last write" deterministic for multi-change-per-key transactions.
An unparseable GTID yields seq NULL, coalesced to −1: the row competes at
lowest precedence instead of silently vanishing from ``max_by``.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

OP_DELETE = "d"


def gtid_seq(gtid: Column) -> Column:
    """Trailing sequence number of a single-host GTID string → long (NULL if
    none — ANSI-safe). Shared with the decode spine: one parser, not three
    divergent regexes (`decode.gtid_seq_expr`)."""
    from .decode import gtid_seq_expr

    return gtid_seq_expr(gtid)


def _change_idx_col(df: DataFrame) -> Column:
    """Tie-break column: the change's position inside its transaction when
    the frame carries one (decode_table/explode_row_changes do), else 0."""
    return F.col("change_idx") if "change_idx" in df.columns else F.lit(0)


def _seq_cols(df: DataFrame, seq: Column | None) -> tuple[Column, Column]:
    """(seq coalesced to −1, change_idx) — the ordering pair every
    materialize shape agrees on."""
    if seq is None:
        seq = gtid_seq(F.col("gtid"))
    return F.coalesce(seq, F.lit(-1)).cast("long"), _change_idx_col(df)


def materialize_latest(
    env: DataFrame,
    *,
    key_cols: list[str],
    value_cols: list[str],
    seq: Column | None = None,
) -> DataFrame:
    """Batch latest-state snapshot of a decoded CDC envelope frame.

    ``key_cols`` are the table's PK columns (taken from the after image,
    before image for deletes); ``value_cols`` are the after-image columns to
    materialize. Per (table, key), the image at the highest (``seq``,
    ``change_idx``) wins; a last-op DELETE removes the key. Single ``max_by``
    aggregation — partial-aggregable, no sort, no window (pinned by
    tests/test_plans.py::test_cdc_materialize_is_partial_agg_not_window).
    """
    seq_c, cidx = _seq_cols(env, seq)

    def image(k: str) -> Column:
        return F.coalesce(F.col(f"after.{k}"), F.col(f"before.{k}"))

    flat = env.select(
        F.col("source.table").alias("table_name"),
        *[image(k).alias(k) for k in key_cols],
        F.col("op"),
        *[F.col(f"after.{c}").alias(c) for c in value_cols],
        seq_c.alias("seq"),
        cidx.alias("change_idx"),
    )
    # struct ordering = lexicographic (seq, change_idx): same-transaction
    # changes to one key resolve to the LAST change, not an arbitrary one
    ordv = F.struct(F.col("seq"), F.col("change_idx"))
    aggs = [F.max_by(F.col("op"), ordv).alias("_last_op")] + [
        F.max_by(F.col(c), ordv).alias(c) for c in value_cols
    ]
    return (
        flat.groupBy("table_name", *key_cols)
        .agg(*aggs)
        .filter(F.col("_last_op") != OP_DELETE)
        .drop("_last_op")
    )


def _keyed_changes(raw_df: DataFrame, schemas: list, seq: Column | None) -> DataFrame:
    """Shared head of the one-scan multi-table shapes: explode row changes
    once, restrict to the schema list, key each change by its table's PK
    values pulled straight from the undecoded string image map (a when-chain
    over the bounded table list — narrow, codegen'd), attach the ordering
    pair. Raises on an empty schema list — filter(None) would otherwise
    surface as an unrelated PySpark type error."""
    from .decode import explode_row_changes

    if not schemas:
        raise ValueError("materialize multi requires at least one table schema")
    changes = explode_row_changes(raw_df)
    pred = None
    for s in schemas:
        c = (F.col("keyspace") == s.keyspace) & (F.col("table_name") == s.table)
        pred = c if pred is None else (pred | c)
    changes = changes.filter(pred)

    image = F.coalesce(F.col("change.after"), F.col("change.before"))
    key_expr = F.lit(None).cast("string")
    for s in schemas:
        cond = (F.col("keyspace") == s.keyspace) & (F.col("table_name") == s.table)
        k = F.to_json(
            F.struct(*[image.getItem(c).alias(c) for c in s.key_columns])
        )
        key_expr = F.when(cond, k).otherwise(key_expr)

    seq_c, cidx = _seq_cols(changes, seq)
    return changes.select(
        F.col("keyspace"),
        F.col("table_name"),
        key_expr.alias("key"),
        F.col("op"),
        F.col("change.after").alias("after_map"),
        seq_c.alias("seq"),
        cidx.alias("change_idx"),
    )


def materialize_latest_multi(
    raw_df: DataFrame,
    schemas: list,
    *,
    seq: Column | None = None,
    materialize: bool = True,
) -> dict[tuple[str, str], DataFrame]:
    """One-pass MULTI-TABLE latest-state snapshot from the raw event stream.

    ``materialize_latest`` consumes a per-table decoded envelope, so
    materializing T tables costs T scans of the changelog. At 100 TB the scan
    dominates — this variant compacts FIRST and decodes LAST:

    1. explode row changes once (one scan of the raw stream);
    2. key each change by its table's PK values (:func:`_keyed_changes`);
    3. ONE ``max_by`` shuffle over (keyspace, table, key) carrying the raw
       image maps — partial-aggregable, so the exchange ships ~|live keys|;
    4. typed decode (``typed_row_struct``) only for the survivors, per table.

    Returns {(keyspace, table): snapshot DataFrame (key + typed columns)}.

    With ``materialize=True`` (default) the compacted snapshot is eagerly
    ``localCheckpoint``-ed, so the scan+shuffle execute exactly ONCE and
    every per-table branch reads the checkpointed blocks (pinned by
    tests/test_plans.py). Without it, Catalyst pushes each branch's table
    filter below the exchange — three different exchanges, three scans
    (ReuseExchange cannot fire on non-identical exchanges). At 100 TB this
    in-memory materialization is exactly the "write the snapshot once, then
    read it per table" shape; callers that own the job lifecycle reclaim the
    blocks with ``cache.checkpoint_scope`` (bench.py wraps every query).
    """
    from .decode import typed_row_struct

    flat = _keyed_changes(raw_df, schemas, seq)
    ordv = F.struct(F.col("seq"), F.col("change_idx"))
    live = (
        flat.groupBy("keyspace", "table_name", "key")
        .agg(F.max_by(F.struct("op", "after_map"), ordv).alias("last"))
        .filter(F.col("last.op") != OP_DELETE)
    )
    if materialize:
        live = live.localCheckpoint(eager=True)
    out: dict[tuple[str, str], DataFrame] = {}
    for s in schemas:
        part = live.filter(
            (F.col("keyspace") == s.keyspace) & (F.col("table_name") == s.table)
        )
        out[(s.keyspace, s.table)] = part.select(
            "keyspace",
            "table_name",
            "key",
            typed_row_struct(F.col("last.after_map"), s).alias("row"),
        )
    return out


def materialize_history(
    env: DataFrame,
    *,
    key_cols: list[str],
    value_cols: list[str],
    seq: Column | None = None,
) -> DataFrame:
    """Changelog → SCD2 (type-2 slowly-changing-dimension) HISTORY table —
    the complement of :func:`materialize_latest`: instead of the current
    snapshot, every version a key ever held, as validity intervals.

    Per (table, key) ordered by (``seq``, ``change_idx``), each
    create/update image becomes one version row valid over
    ``[valid_from_seq, valid_to_seq)`` where ``valid_to_seq`` is the seq of
    the key's NEXT change (NULL = still current). A DELETE emits no row of
    its own but closes the previous version's interval, so
    ``filter("is_current")`` is exactly the :func:`materialize_latest`
    snapshot (asserted by tests/test_materialize.py). This is the standard
    warehouse consumption pattern for the reference's envelope stream (the
    JDBC-sink "SCD2 / history table" mode consumers build from before/after
    images, VitessChangeRecordEmitter.java:31-114).

    Scale shape: ONE shuffle on (table, key) + a per-key ``lead`` window —
    parallelism is |keys|, never a single-partition stage, and window state
    per task is one key's version chain. No streaming twin is needed: the
    envelope stream IS the SCD2 append log (each record already carries its
    open interval start); interval CLOSING is inherently a lookahead and
    belongs in this batch derivation.
    """
    seq_c, cidx = _seq_cols(env, seq)

    def image(k: str) -> Column:
        return F.coalesce(F.col(f"after.{k}"), F.col(f"before.{k}"))

    flat = env.select(
        F.col("source.table").alias("table_name"),
        *[image(k).alias(k) for k in key_cols],
        F.col("op"),
        *[F.col(f"after.{c}").alias(c) for c in value_cols],
        seq_c.alias("seq"),
        cidx.alias("change_idx"),
    )
    w = Window.partitionBy("table_name", *key_cols).orderBy("seq", "change_idx")
    return (
        flat.withColumn("valid_to_seq", F.lead("seq").over(w))
        .filter(F.col("op") != OP_DELETE)
        .select(
            "table_name",
            *key_cols,
            *value_cols,
            F.col("seq").alias("valid_from_seq"),
            "valid_to_seq",
            F.col("valid_to_seq").isNull().alias("is_current"),
        )
    )


def materialize_history_multi(
    raw_df: DataFrame,
    schemas: list,
    *,
    seq: Column | None = None,
    materialize: bool = True,
) -> dict[tuple[str, str], DataFrame]:
    """One-pass MULTI-TABLE SCD2 history from the raw event stream — the
    :func:`materialize_history` semantics on :func:`materialize_latest_multi`'s
    one-scan shape: explode once, key by the undecoded image map
    (:func:`_keyed_changes` — the SAME keyed frame the latest-state path
    uses, so the two can never diverge on key semantics), ONE
    (keyspace, table, key) shuffle feeding the per-key ``lead`` window, typed
    decode per table branch. Unlike the latest-state path the window keeps
    every version (history IS all rows), so the win of this variant is purely
    the single changelog scan; ``materialize=True`` checkpoints the windowed
    frame so the T table branches don't re-run scan+window T times.

    Returns {(keyspace, table): history frame (key + typed row +
    valid_from_seq / valid_to_seq / is_current)}.
    """
    from .decode import typed_row_struct

    flat = _keyed_changes(raw_df, schemas, seq)
    w = Window.partitionBy("keyspace", "table_name", "key").orderBy(
        "seq", "change_idx"
    )
    hist = (
        flat.withColumn("valid_to_seq", F.lead("seq").over(w))
        .filter(F.col("op") != OP_DELETE)
    )
    if materialize:
        hist = hist.localCheckpoint(eager=True)
    out: dict[tuple[str, str], DataFrame] = {}
    for s in schemas:
        part = hist.filter(
            (F.col("keyspace") == s.keyspace) & (F.col("table_name") == s.table)
        )
        out[(s.keyspace, s.table)] = part.select(
            "keyspace",
            "table_name",
            "key",
            typed_row_struct(F.col("after_map"), s).alias("row"),
            F.col("seq").alias("valid_from_seq"),
            "valid_to_seq",
            F.col("valid_to_seq").isNull().alias("is_current"),
        )
    return out


MAT_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("keyspace", T.StringType(), True),
        T.StructField("table_name", T.StringType(), False),
        T.StructField("key", T.StringType(), True),
        T.StructField("seq", T.LongType(), True),
        T.StructField("op", T.StringType(), True),
        T.StructField("after_json", T.StringType(), True),
    ]
)

MAT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), True),
        T.StructField("change_idx", T.LongType(), True),
        T.StructField("op", T.StringType(), True),
        T.StructField("after_json", T.StringType(), True),
    ]
)


def _fold_lww(
    stored: tuple | None, pdf: pd.DataFrame
) -> tuple[int, int, Any, Any]:
    """Pure last-write-wins fold shared by BOTH streaming compactors: the
    micro-batch's maximum (seq, change_idx) row against the stored state.
    Rows whose seq is null (unparseable GTID under a lenient custom ``seq``)
    are ignored — exactly what batch ``max_by`` does with a null ordering
    value — instead of idxmax returning NaN and killing the micro-batch."""
    seq, cidx, op, after_json = stored if stored is not None else (-1, -1, None, None)
    valid = pdf[pdf["seq"].notna()]
    if len(valid):
        i = valid.sort_values(
            ["seq", "change_idx"], kind="stable"
        ).index[-1]
        bseq = int(pdf["seq"].loc[i])
        bcidx = int(pdf["change_idx"].loc[i])
        if (bseq, bcidx) > (seq, cidx):
            seq, cidx = bseq, bcidx
            op = pdf["op"].loc[i]
            aj = pdf["after_json"].loc[i]
            after_json = None if pd.isna(aj) else aj
    return seq, cidx, op, after_json


def _require_key(rec_key) -> None:
    """Keyless tables (envelope.with_record_key emits key=NULL) must not be
    compacted: every row of the table would collapse into ONE state entry
    and the 'snapshot' would silently be the single last-written row. Fail
    loudly instead."""
    if rec_key is None:
        raise ValueError(
            "materialize_stream received a NULL record key — keyless tables "
            "cannot be compacted (the whole table would collapse to one "
            "state entry); filter them out or supply a synthetic key"
        )


def _process_key(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
    evict_deleted: bool = False,
    idle_ttl_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    keyspace, table_name, rec_key = key
    if idle_ttl_ms is not None and state.hasTimedOut:
        # key idle past the TTL: release its state, emit nothing (the compacted
        # image didn't change — downstream already holds the latest record);
        # a later re-arrival starts fresh and wins by seq against seq = -1.
        # Yield NOTHING rather than an empty frame: a TTL sweep fires this
        # path once per evicted key, and an empty-DataFrame yield still pays
        # pandas construction + an Arrow batch per group (the minhash-stream
        # measurement: ~20-25% of the state operator's wall)
        state.remove()
        return
    _require_key(rec_key)
    stored = tuple(state.get) if state.exists else None

    chunks = list(pdf_iter)
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
    seq, cidx, op, after_json = _fold_lww(stored, pdf)
    if evict_deleted and op == OP_DELETE:
        # the key's image is gone; per-shard ordered delivery means any later
        # event for this key carries a HIGHER seq, so fresh state after a
        # re-insert still wins correctly — state need not outlive the
        # tombstone. NOTE this trades the stored seq for bounded state: a
        # REPLAYED lower-seq event arriving after the eviction would be
        # applied as fresh — that's why evict_deleted is opt-in (default
        # False) and requires the ordered-delivery contract documented on
        # materialize_stream.
        if state.exists:
            state.remove()
    else:
        state.update((seq, cidx, op, after_json))
        if idle_ttl_ms is not None:
            state.setTimeoutDuration(idle_ttl_ms)
    out: dict[str, Any] = {
        "keyspace": keyspace,
        "table_name": table_name,
        "key": rec_key,
        "seq": seq,
        "op": op,
        # tombstone for deletes: the compacted record carries no image
        "after_json": None if op == OP_DELETE else after_json,
    }
    yield pd.DataFrame([out], columns=[f.name for f in MAT_STREAM_SCHEMA.fields])


def _flat_stream(keyed_env: DataFrame, seq: Column | None) -> DataFrame:
    """Shared projection for both streaming compactors. Keys state by
    (keyspace, table, key): same-named tables in different keyspaces must
    not share state — their GTID sequences are unrelated and whichever is
    numerically higher would permanently suppress the other's updates."""
    seq_c, cidx = _seq_cols(keyed_env, seq)
    return keyed_env.select(
        F.col("source.keyspace").alias("keyspace"),
        F.col("source.table").alias("table_name"),
        F.col("key"),
        seq_c.alias("seq"),
        cidx.cast("long").alias("change_idx"),
        F.col("op"),
        F.to_json(F.col("after")).alias("after_json"),
    )


def materialize_stream(
    keyed_env: DataFrame,
    *,
    seq: Column | None = None,
    evict_deleted: bool = False,
    idle_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming latest-state compaction of a keyed CDC envelope stream.

    Input: a (possibly multi-table union of) decoded envelope stream(s) that
    already carry the record ``key`` column (envelope.with_record_key, D12).
    Output: per micro-batch, ONE compacted record per touched (keyspace,
    table, key) — the current image serialized as JSON, or a tombstone (null
    ``after_json``) when the key's last operation is a DELETE. Exactly the
    contract of a compacted Kafka topic / JDBC-sink upsert feed. Keyless
    tables (null ``key``) are rejected with a clear error — compacting one
    would collapse the whole table into a single record.

    ``evict_deleted=True`` removes a key's state once its tombstone is
    emitted, so state size tracks |LIVE keys| instead of |keys ever seen| —
    the difference between bounded and unbounded state on a delete-heavy
    100 TB workload. Safe under the engine's delivery contract (a key lives
    in one shard; shard delivery is seq-ordered, so post-delete events always
    carry higher seqs and last-write-wins is preserved); leave False if the
    upstream can replay out of order past a delete — an evicted key's seq is
    gone, so a replayed lower-seq event would be applied as fresh state.

    ``idle_ttl_ms`` bounds state on key-churn workloads WITHOUT deletes
    (e.g. session-style keys that are written once and never touched again):
    a key idle for longer than the TTL is dropped from the state store
    (ProcessingTimeTimeout; no output row — the compacted image did not
    change). A re-arrival after eviction starts from seq = -1 and therefore
    still wins by seq. Choose a TTL comfortably above the upstream's maximum
    replay window so a checkpoint-restart replay can't observe the eviction.
    """
    flat = _flat_stream(keyed_env, seq)

    def process(key, pdf_iter, state):
        return _process_key(
            key, pdf_iter, state, evict_deleted=evict_deleted, idle_ttl_ms=idle_ttl_ms
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return flat.groupBy("keyspace", "table_name", "key").applyInPandasWithState(
        process,
        outputStructType=MAT_STREAM_SCHEMA,
        stateStructType=MAT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


try:  # the tws API ships with Spark 4.x; keep module import safe elsewhere
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor as _StatefulProcessorBase,
    )
except ImportError:  # pragma: no cover
    _StatefulProcessorBase = object  # type: ignore[assignment,misc]


class CompactorProcessor(_StatefulProcessorBase):
    """StatefulProcessor for :func:`materialize_stream_tws` — the same
    per-(keyspace, table, key) last-write-wins state machine as
    :func:`_process_key` (both fold through the shared :func:`_fold_lww`,
    so the two streaming paths cannot drift) on the current-generation
    stateful API (ValueState instead of GroupState), with idle-TTL via REAL
    per-key timers:

    - every input batch re-arms the key's single timer to now + TTL
      (``deleteTimer`` then ``registerTimer`` — tws keeps a timer LIST per
      key, so re-arming must drop the stale one or expirations multiply);
    - :meth:`handleExpiredTimer` releases the key's state and emits nothing
      — the compacted image didn't change, downstream already holds the
      latest record; a later re-arrival starts fresh against seq = -1 and
      wins by seq, the exact eviction contract of the
      ``applyInPandasWithState`` compactor's ProcessingTimeTimeout path;
    - an ``evict_deleted`` tombstone also cancels the key's timers — a dead
      key must not hold timer state either.

    The timer/state logic is plain Python over the handle interface, so the
    unit suite drives it with a fake handle even though executing the full
    query needs the protobuf runtime + RocksDB provider this container
    lacks (see :func:`materialize_stream_tws`)."""

    def __init__(
        self, *, evict_deleted: bool = False, idle_ttl_ms: int | None = None
    ) -> None:
        self._evict_deleted = evict_deleted
        self._idle_ttl_ms = idle_ttl_ms

    def init(self, handle) -> None:
        self._handle = handle
        self._state = handle.getValueState("mat_state", MAT_STATE_SCHEMA)

    def _rearm_timer(self, timer_values) -> None:
        if self._idle_ttl_ms is None:
            return
        # snapshot before deleting: the real tws runtime streams listTimers()
        # from the state server — mutating mid-iteration can skip entries
        for t in list(self._handle.listTimers()):
            self._handle.deleteTimer(t)
        self._handle.registerTimer(
            timer_values.getCurrentProcessingTimeInMs() + self._idle_ttl_ms
        )

    def _cancel_timers(self) -> None:
        if self._idle_ttl_ms is None:
            return
        for t in list(self._handle.listTimers()):
            self._handle.deleteTimer(t)

    def handleInputRows(self, key, rows, timer_values):
        keyspace, table_name, rec_key = key
        _require_key(rec_key)
        stored = tuple(self._state.get()) if self._state.exists() else None
        chunks = list(rows)
        if not chunks:
            yield pd.DataFrame(columns=[f.name for f in MAT_STREAM_SCHEMA.fields])
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        seq, cidx, op, after_json = _fold_lww(stored, pdf)
        if self._evict_deleted and op == OP_DELETE:
            if self._state.exists():
                self._state.clear()
            self._cancel_timers()
        else:
            self._state.update((seq, cidx, op, after_json))
            self._rearm_timer(timer_values)
        yield pd.DataFrame(
            [
                {
                    "keyspace": keyspace,
                    "table_name": table_name,
                    "key": rec_key,
                    "seq": seq,
                    "op": op,
                    "after_json": None if op == OP_DELETE else after_json,
                }
            ],
            columns=[f.name for f in MAT_STREAM_SCHEMA.fields],
        )

    def handleExpiredTimer(self, key, timer_values, expired_timer_info):
        # key idle past the TTL: release its state, emit nothing (the
        # compacted image didn't change); re-arrival starts fresh vs seq = -1
        self._state.clear()
        yield pd.DataFrame(columns=[f.name for f in MAT_STREAM_SCHEMA.fields])

    def close(self) -> None:
        pass


def materialize_stream_tws(
    keyed_env: DataFrame,
    *,
    seq: Column | None = None,
    evict_deleted: bool = False,
    idle_ttl_ms: int | None = None,
) -> DataFrame:
    """:func:`materialize_stream` on ``transformWithStateInPandas`` (the
    current-generation Spark stateful API) — same output contract, same
    ``evict_deleted`` semantics, and the SAME ``idle_ttl_ms`` feature via
    per-key timers (``timeMode='processingTime'``) instead of
    ProcessingTimeTimeout, so the forward path keeps feature parity with
    the default compactor (round-6; see :class:`CompactorProcessor`).

    Requires the RocksDB state store provider and the ``google.protobuf``
    runtime (tws's Python state-server protocol) — absent in this
    container, so the execution parity test skips exactly like the txmeta
    tws twin (`txmeta/streaming.py` ordered_tx_metadata_stream_tws); plan
    construction and the processor's timer/state logic are exercised
    regardless."""
    flat = _flat_stream(keyed_env, seq)
    return flat.groupBy("keyspace", "table_name", "key").transformWithStateInPandas(
        statefulProcessor=CompactorProcessor(
            evict_deleted=evict_deleted, idle_ttl_ms=idle_ttl_ms
        ),
        outputStructType=MAT_STREAM_SCHEMA,
        outputMode="update",
        timeMode="processingTime" if idle_ttl_ms is not None else "none",
    )
