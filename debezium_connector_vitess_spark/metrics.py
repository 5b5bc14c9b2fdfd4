"""Streaming metrics (SURVEY §2.8 E5).

The reference exposes Debezium's snapshot/streaming JMX metrics per task
(reference: metrics/VitessChangeEventSourceMetricsFactory.java:21-36,
metrics/VitessStreamingChangeEventSourceMetrics.java:21-30 — thin subclasses
of the Debezium defaults: total events, rate, last position, uptime). The
Spark-idiomatic analog is a ``StreamingQueryListener``: Spark already measures
rows/rates/durations per micro-batch; this listener surfaces them under the
same names the reference's consumers watch, keyed by query, plus the
CDC-specific "last VGTID" gauge read from the source offset.
"""

from __future__ import annotations

import json
import math
import time
from dataclasses import dataclass, field

try:  # pragma: no cover - import shape differs across PySpark minor versions
    from pyspark.sql.streaming import StreamingQueryListener
except ImportError:  # pragma: no cover
    from pyspark.sql.streaming.listener import StreamingQueryListener


@dataclass
class StreamingMetrics:
    """Per-query gauge set (names mirror Debezium's streaming metrics)."""

    total_number_of_events_seen: int = 0
    number_of_committed_transactions: int = 0
    last_event_rate: float = 0.0
    milli_seconds_since_last_event: float | None = None
    last_offset: dict | list | None = None
    connected: bool = False
    # monotonic clock: interval gauges must survive NTP steps / clock changes
    start_ts: float = field(default_factory=time.monotonic)
    _last_event_ts: float | None = None

    @property
    def uptime_ms(self) -> float:
        return (time.monotonic() - self.start_ts) * 1000.0

    def snapshot(self) -> dict:
        if self._last_event_ts is not None:
            self.milli_seconds_since_last_event = (
                time.monotonic() - self._last_event_ts
            ) * 1000.0
        return {
            "TotalNumberOfEventsSeen": self.total_number_of_events_seen,
            "NumberOfCommittedTransactions": self.number_of_committed_transactions,
            "LastEventRate": self.last_event_rate,
            "MilliSecondsSinceLastEvent": self.milli_seconds_since_last_event,
            "LastOffset": self.last_offset,
            "Connected": self.connected,
            "UptimeMs": self.uptime_ms,
        }


class CdcMetricsListener(StreamingQueryListener):
    """Attach with ``spark.streams.addListener(listener)``; read
    ``listener.metrics[query_name].snapshot()`` (or all via ``report()``)."""

    def __init__(self) -> None:
        self.metrics: dict[str, StreamingMetrics] = {}
        # query id -> metrics key: scopes termination to the right query and
        # keeps concurrently-running unnamed queries from merging counters
        self._key_by_id: dict[str, str] = {}

    def _get(self, query_id, name: str | None) -> StreamingMetrics:
        qid = str(query_id)
        key = self._key_by_id.setdefault(qid, name or f"<unnamed:{qid[:8]}>")
        return self.metrics.setdefault(key, StreamingMetrics())

    def onQueryStarted(self, event) -> None:
        m = self._get(event.id, event.name)
        m.connected = True
        m.start_ts = time.monotonic()

    def onQueryProgress(self, event) -> None:
        p = event.progress
        m = self._get(p.id, p.name)
        rows = int(p.numInputRows or 0)
        m.total_number_of_events_seen += rows
        if rows:
            # zero-row batches (watermark-flush ticks) are not commits — the
            # reference gauge counts real source transactions
            m.number_of_committed_transactions += 1
            m._last_event_ts = time.monotonic()
        rate = p.processedRowsPerSecond
        # NaN/Infinity (zero-duration batches) would poison json.dumps output
        m.last_event_rate = (
            float(rate) if rate is not None and math.isfinite(rate) else 0.0
        )
        offsets: list = []
        for src in p.sources or []:
            end = src.endOffset
            try:
                offsets.append(json.loads(end) if isinstance(end, str) else end)
            except (ValueError, TypeError):
                offsets.append(end)
        if offsets:
            # one source -> the offset dict (the common CDC shape); joins of
            # several streams -> the per-source list, nothing silently dropped
            m.last_offset = offsets[0] if len(offsets) == 1 else offsets

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing dependent
        pass

    def onQueryTerminated(self, event) -> None:
        # QueryTerminatedEvent carries only ids — resolve through the id map
        # so ONLY the terminated query disconnects, not every tracked one
        key = self._key_by_id.get(str(event.id))
        if key is not None and key in self.metrics:
            self.metrics[key].connected = False

    def report(self) -> dict[str, dict]:
        return {name: m.snapshot() for name, m in self.metrics.items()}


# ---------------------------------------------------------------------------
# Windowed change-rate time series (E5 as a first-class TABLE, not a gauge)
# ---------------------------------------------------------------------------
#
# The listener above mirrors the reference's JMX gauges (point-in-time rates,
# metrics/VitessStreamingChangeEventSourceMetrics.java:21-30). Production
# monitoring wants the HISTORY: events/sec per table+shard per interval, with
# late-arriving events handled explicitly. The Spark-idiomatic form is a
# tumbling/sliding event-time window aggregation; the streaming twin is the
# same plan behind a watermark (append mode — a window row is emitted exactly
# once, when the watermark passes its end, and events later than the
# watermark are dropped, which is the documented late-data contract).
#
# Scale shape (100 TB): one shuffle on (window, *keys) with map-side partial
# aggregation — the reduced frame is |windows| x |tables x shards| rows, not
# |events|. Streaming state = open windows only; the watermark evicts every
# window older than (max event time - delay), so state is bounded by
# (delay / window) * |key space| regardless of stream length.

_DURATION_UNIT_SECONDS = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
}


def _duration_seconds(duration: str) -> float:
    """'2 hours' -> 7200.0 (the subset of Spark's CalendarInterval syntax the
    rate denominator needs)."""
    n, _, unit = duration.strip().partition(" ")
    try:
        return float(n) * _DURATION_UNIT_SECONDS[unit.strip().lower()]
    except (KeyError, ValueError) as exc:
        raise ValueError(f"unsupported window duration {duration!r}") from exc


def ensure_utc_event_time(df, event_time: str = "ts"):
    """Normalize a TIMESTAMP_NTZ event-time column to TIMESTAMP (LTZ),
    interpreting the NTZ wall clock as UTC — Spark 4 infers NTZ from parquet
    written without isAdjustedToUTC, and ``unix_millis``/watermarks want LTZ.
    Pure NTZ arithmetic pins the UTC interpretation regardless of the
    caller's spark.sql.session.timeZone (an implicit NTZ→TIMESTAMP cast
    would go through the session zone instead). No-op on LTZ columns, so
    every event-time operator below accepts either type."""
    from pyspark.sql import functions as F

    if dict(df.dtypes).get(event_time) != "timestamp_ntz":
        return df
    return df.withColumn(
        event_time,
        F.timestamp_micros(
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
                f"`{event_time}`)"
            )
        ),
    )


def change_rates(
    df,
    *,
    window_duration: str = "1 hour",
    slide_duration: str | None = None,
    keys: tuple = ("table_name", "shard"),
    event_time: str = "ts",
    op: str = "op",
    value_col: str | None = None,
):
    """Per-(window, *keys) change counts and rate over a decoded change frame.

    Works identically on a bounded DataFrame and (behind
    :func:`change_rates_stream`'s watermark) on a stream — the plan is the
    same windowed aggregate either way.

    Output: window_start_ms/window_end_ms (epoch millis), *keys, n_events,
    n_creates/n_updates/n_deletes (op in {'c','u','d'}), events_per_hour
    (exact: n / window-hours; window-hours is a small power-of-two-friendly
    constant so the double is bit-stable across engines).

    ``value_col`` (optional) adds magnitude columns for a numeric payload —
    value_sum/value_avg/value_min/value_max per window — the other half of
    a monitoring history (how MUCH, not just how often). All four are
    map-side-combining aggregates, so the exchange still carries one reduced
    row per (window, *keys); percentiles are deliberately NOT offered here
    (exact ones don't partial-aggregate — at scale, run
    ``percentile_approx`` over this function's input in a separate pass).
    """
    from pyspark.sql import functions as F

    df = ensure_utc_event_time(df, event_time)
    win = F.window(event_time, window_duration, slide_duration or window_duration)
    hours = F.lit(_duration_seconds(window_duration) / 3600.0)
    opc = F.col(op)
    aggs = [
        F.count("*").alias("n_events"),
        F.sum(F.when(opc == "c", 1).otherwise(0)).cast("long").alias("n_creates"),
        F.sum(F.when(opc == "u", 1).otherwise(0)).cast("long").alias("n_updates"),
        F.sum(F.when(opc == "d", 1).otherwise(0)).cast("long").alias("n_deletes"),
    ]
    value_cols = []
    if value_col is not None:
        v = F.col(value_col)
        aggs += [
            F.sum(v).alias("value_sum"),
            F.avg(v).alias("value_avg"),
            F.min(v).alias("value_min"),
            F.max(v).alias("value_max"),
        ]
        value_cols = ["value_sum", "value_avg", "value_min", "value_max"]
    agg = df.groupBy(win.alias("win"), *[F.col(k) for k in keys]).agg(*aggs)
    return agg.select(
        F.unix_millis(F.col("win.start")).alias("window_start_ms"),
        F.unix_millis(F.col("win.end")).alias("window_end_ms"),
        *keys,
        "n_events",
        "n_creates",
        "n_updates",
        "n_deletes",
        (F.col("n_events") / hours).alias("events_per_hour"),
        *value_cols,
    )


def _apply_post_agg_exclude(df, exclude, count_col: str = "n_events"):
    """Drop excluded groups AFTER a streaming aggregation, with the pushdown
    barrier every streaming entry point depends on.

    The ``(count_col < 0)`` disjunct is never true (count(*) >= 1 in every
    group): it exists solely as a PUSHDOWN BARRIER. A key-only predicate is
    pushed by Catalyst through the Aggregate, then below the
    EventTimeWatermark node, all the way into the file scan — where it would
    remove the sentinel rows before they reach the watermark operator
    (observed: the clock froze at max-real-ts − delay and the final windows
    never flushed). Referencing an aggregate output keeps the filter above
    the Aggregate; it must not be a constant-foldable reference
    (isnull(count) folds to false — count is non-nullable — and the barrier
    silently vanishes). ``count_col`` names the caller's count(*) output
    (``n_events`` for the change-rate family, ``n_docs`` for the corpus
    profile).

    ``exclude`` is coalesced to false first: on a NULL grouping key the raw
    three-valued logic makes ``(~NULL) | false`` NULL and Filter would drop
    a legitimate group — NULL keys must mean "not excluded", not "gone".
    """
    from pyspark.sql import functions as F

    not_excluded = ~F.coalesce(exclude, F.lit(False))
    return df.filter(not_excluded | (F.col(count_col) < F.lit(0)))


def change_rates_stream(
    stream_df,
    *,
    watermark_delay: str = "2 hours",
    exclude=None,
    event_time: str = "ts",
    **kwargs,
):
    """Streaming twin of :func:`change_rates`: watermarked event-time window
    aggregation, run in APPEND mode so each window row is final (emitted once
    the watermark passes window end; later-than-watermark events are dropped
    — the explicit late-data policy).

    ``exclude`` (optional Column predicate over the grouping keys) drops
    clock-advancing sentinel/heartbeat rows — the reference's heartbeats
    (S7) serve exactly this role of moving the position forward without
    producing data. It is applied AFTER the aggregation, not before: a
    pre-aggregation filter gets pushed by Catalyst below the
    EventTimeWatermark node into the file scan, so the sentinel rows would
    never reach the watermark operator and the event-time clock would never
    advance (observed — the final windows then never flush). Post-agg, the
    sentinel's own (tiny, per-window) groups are simply dropped from the
    output; exclusion by key is exact.
    """
    from pyspark.sql import functions as F

    # normalize BEFORE the watermark: rewriting the column afterwards would
    # drop the event-time designation and append mode would be rejected
    wm = ensure_utc_event_time(stream_df, event_time).withWatermark(
        event_time, watermark_delay
    )
    rates = change_rates(wm, event_time=event_time, **kwargs)
    if exclude is not None:
        rates = _apply_post_agg_exclude(rates, exclude)  # barrier lives there
    return rates


def sessionize(
    df,
    *,
    gap: str = "30 minutes",
    keys: tuple = ("user_id",),
    event_time: str = "ts",
):
    """Gap-based sessionization: consecutive events of the same key belong to
    one session while the inter-event gap stays under ``gap`` (the third
    event-time window shape next to tumbling/sliding — ``F.session_window``,
    JVM-side). Training-data use: grouping raw interaction/event logs into
    dialogue or browsing sessions before packing.

    Output per session: *keys, session_start_ms (first event),
    session_end_ms (last event + gap — Spark's session_window convention),
    n_events, duration_ms (last - first event, i.e. end - gap - start).

    Scale shape: one shuffle on the keys with Spark's session merge; output
    is |sessions| rows. The equivalent hand-rolled form is a lag-window +
    running-sum island id (two shuffles); session_window does it in one.
    """
    from pyspark.sql import functions as F

    df = ensure_utc_event_time(df, event_time)
    gap_ms = int(_duration_seconds(gap) * 1000)
    sw = F.session_window(event_time, gap)
    return (
        df.groupBy(sw.alias("session"), *[F.col(k) for k in keys])
        .agg(F.count("*").alias("n_events"))
        .select(
            *keys,
            F.unix_millis(F.col("session.start")).alias("session_start_ms"),
            F.unix_millis(F.col("session.end")).alias("session_end_ms"),
            "n_events",
            (
                F.unix_millis(F.col("session.end"))
                - F.lit(gap_ms)
                - F.unix_millis(F.col("session.start"))
            ).alias("duration_ms"),
        )
    )


def sessionize_stream(
    stream_df,
    *,
    watermark_delay: str = "2 hours",
    exclude=None,
    event_time: str = "ts",
    **kwargs,
):
    """Streaming sessionization: the same session_window aggregate behind a
    watermark in APPEND mode. A session row is emitted exactly once — when
    the watermark passes (last event + gap), i.e. the session can no longer
    be extended. ``exclude`` follows the :func:`change_rates_stream`
    contract: post-agg with a pushdown barrier, so clock-advancing sentinel
    rows reach the watermark operator.
    """
    from pyspark.sql import functions as F

    wm = ensure_utc_event_time(stream_df, event_time).withWatermark(
        event_time, watermark_delay
    )
    sessions = sessionize(wm, event_time=event_time, **kwargs)
    if exclude is not None:
        sessions = _apply_post_agg_exclude(sessions, exclude)
    return sessions


def funnel_pairs(
    left,
    right,
    *,
    key: str = "user_id",
    within: str = "1 hour",
    left_time: str = "ts",
    right_time: str = "ts",
    how: str = "inner",
):
    """Interval join: for each left event, the right events of the same key
    within ``(left_ts, left_ts + within]`` — the funnel/causality primitive
    (signup → first error, order → shipment, prompt → response pairing for
    dialogue data assembly). ``how='left_outer'`` keeps unmatched left
    events with null right columns — the conversion-rate shape (matched /
    total lefts).

    Works on bounded frames AND as a stream-stream join via
    :func:`funnel_pairs_stream` — the join condition is identical; streaming
    adds watermarks so both sides' state is evictable.

    Output: key, left_ts_ms, right_ts_ms, lag_ms (right - left, in (0, within]);
    right_ts_ms/lag_ms null for unmatched lefts under left_outer.

    Scale shape: one shuffle per side on the key (co-partitioned equi-join);
    the time-range predicate is applied inside the join, so per-key fan-out
    is bounded by event density × window — not a cartesian.
    """
    from pyspark.sql import functions as F

    if how not in ("inner", "left", "left_outer", "leftouter"):
        # the output schema takes the KEY from the left side: right/full
        # outer would emit rows with a NULL key and NULL left_ts — reject
        # loudly instead of producing silently unusable rows
        raise ValueError(
            f"funnel_pairs supports how='inner'/'left_outer', got {how!r}"
        )
    left = ensure_utc_event_time(left, left_time)
    right = ensure_utc_event_time(right, right_time)
    # millisecond granularity: int(seconds) would silently truncate
    # '1.5 seconds' to 1 and narrow the join bound
    within_ms = int(round(_duration_seconds(within) * 1000))
    # rename per side BEFORE joining: gives each side distinct attributes, so
    # self-joins (left and right derived from the same frame) stay
    # unambiguous, batch and streaming alike
    l = left.select(F.col(key).alias("__fk"), F.col(left_time).alias("__lts"))
    r = right.select(F.col(key).alias("__frk"), F.col(right_time).alias("__rts"))
    lt = F.unix_millis(F.col("__lts"))
    rt = F.unix_millis(F.col("__rts"))
    # the range condition must compare the RAW watermarked timestamp columns
    # (timestamp arithmetic, not unix_millis-wrapped) — Spark's streaming
    # analyzer only recognizes an event-time range condition in that form,
    # and outer stream-stream joins are rejected without one
    joined = l.join(
        r,
        on=[
            F.col("__fk") == F.col("__frk"),
            F.col("__rts") > F.col("__lts"),
            F.col("__rts")
            <= F.col("__lts") + F.expr(f"INTERVAL {within_ms} MILLISECONDS"),
        ],
        how=how,
    )
    return joined.select(
        F.col("__fk").alias(key),
        lt.alias("left_ts_ms"),
        rt.alias("right_ts_ms"),
        (rt - lt).alias("lag_ms"),
    )


def funnel_pairs_stream(
    stream_left,
    stream_right,
    *,
    watermark_delay: str = "2 hours",
    within: str = "1 hour",
    left_time: str = "ts",
    right_time: str = "ts",
    **kwargs,
):
    """Streaming twin of :func:`funnel_pairs`: a stream-stream interval
    join. Inner matches emit as soon as both sides arrive (no watermark
    needed to EMIT); the watermarks bound the join STATE — each side can
    discard events once the other side's clock has passed their latest
    possible match (left keeps ``within + delay``, right keeps ``delay``).
    Without them the join state grows with the stream.

    ``how='left_outer'``: an unmatched left emits (with null right columns)
    only when the watermark passes ``left_ts + within`` — the earliest
    moment "no match" is PROVABLE rather than merely not-yet-observed. Both
    the watermark and the time-range join condition are mandatory for outer
    emission (Spark refuses the query otherwise).
    """
    wl = ensure_utc_event_time(stream_left, left_time).withWatermark(
        left_time, watermark_delay
    )
    wr = ensure_utc_event_time(stream_right, right_time).withWatermark(
        right_time, watermark_delay
    )
    return funnel_pairs(wl, wr, within=within, left_time=left_time, right_time=right_time, **kwargs)


def asof_join(
    left,
    right,
    *,
    on: str,
    left_time: str = "ts",
    right_time: str = "ts",
    value_cols: list[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_r",
    direction: str = "backward",
):
    """As-of join (``pandas.merge_asof`` semantics): each left row picks
    the LATEST right row with the same key whose time is ``<= left_time``
    (``direction="backward"``, the default — "what was the most recent
    reading/price/state when this event happened"), or the EARLIEST right
    row at-or-after it (``direction="forward"`` — "what happened next").
    The temporal-enrichment join every event-time pipeline eventually
    needs.

    Built as UNION + window, not a join: both sides stack into one frame
    tagged by origin, ONE shuffle on the key, and a per-key
    ``last(ignorenulls)`` running window carries the latest right payload
    forward onto each left row. No pair fan-out exists at any skew — a
    key with a million left rows and a million right rows costs one sorted
    partition pass, where a range-condition join would explode toward the
    product. Ties (equal timestamps) match: the right row sorts BEFORE the
    left row at the same instant.

    ``value_cols`` names the right columns to carry (default: everything
    except the key and time); each lands on the output with ``suffix``,
    plus ``{right_time}{suffix}`` = the matched row's time (NULL when no
    right row precedes). A collision between those output names and an
    existing left column raises up front (two same-named columns would
    poison every downstream reference). ``tolerance`` (e.g. ``"1 hour"``)
    voids matches older than the window — the matched columns go NULL,
    exactly merge_asof's contract. NULL times never participate: right
    rows with a NULL time are dropped (pandas raises on them; silently
    sorting them first would phantom-match every row with no real
    predecessor) and left rows with a NULL time come back unmatched.
    Event-time columns may be NTZ parquet reads; both sides pass through
    :func:`ensure_utc_event_time`.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql import types as _T

    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}"
        )
    left = ensure_utc_event_time(left, left_time)
    right = ensure_utc_event_time(right, right_time)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_time)]
    out_names = [f"{right_time}{suffix}"] + [f"{c}{suffix}" for c in value_cols]
    clash = [n for n in out_names if n in left.columns]
    if clash:
        raise ValueError(
            f"output column(s) {clash} collide with left columns — pick a "
            f"different suffix (got {suffix!r})"
        )
    right = right.filter(F.col(right_time).isNotNull())
    rv = F.struct(
        F.col(right_time).alias("__t"), *[F.col(c) for c in value_cols]
    )

    def _hashable(dt) -> bool:
        if isinstance(dt, _T.MapType):
            return False
        if isinstance(dt, _T.ArrayType):
            return _hashable(dt.elementType)
        if isinstance(dt, _T.StructType):
            return all(_hashable(f.dataType) for f in dt.fields)
        return True

    # the duplicate-(key,time) tiebreak hashes only hash-capable value
    # columns (xxhash64 rejects MapType anywhere in its input); when none
    # qualify the pick among byte-identical-time rows falls back to scan
    # order — documented, and only reachable for duplicate right times
    tie_cols = [
        c
        for c in (right_time, *value_cols)
        if _hashable(right.schema[c].dataType)
    ]
    tie = (
        F.xxhash64(*[F.col(c) for c in tie_cols]) if tie_cols else F.lit(0)
    )
    r_side = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__ts"),
        F.lit(0).alias("__tag"),  # right sorts first at equal times: ties match
        tie.cast("long").alias("__tie"),
        rv.alias("__rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left.columns],
    )
    l_side = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(0).cast("long").alias("__tie"),
        F.lit(None).cast(r_side.schema["__rv"].dataType).alias("__rv"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    # forward = the same scan mirrored: order time DESC so "latest
    # preceding" becomes "earliest following"; the tag still puts the
    # right row first at equal times, so ties match in both directions.
    # The payload hash is the final sort key: two RIGHT rows sharing
    # (key, time) would otherwise match nondeterministically by partition
    # scan order — hashing the hashable value columns makes the pick a
    # pure function of the data (left rows carry a constant there, so
    # they never compete).
    tsord = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(tsord, "__tag", "__tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_side.unionByName(r_side)
        .withColumn("__m", F.last("__rv", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 1)
        # a NULL-time left row has no temporal position: unmatched by
        # contract (in the forward scan NULLs sort last and would
        # otherwise inherit the earliest right row)
        .withColumn("__m", F.when(F.col("__ts").isNotNull(), F.col("__m")))
    )
    if tolerance is not None:
        iv = F.expr(f"INTERVAL {tolerance}")
        in_window = (
            F.col("__m.__t") >= F.col("__ts") - iv
            if direction == "backward"
            else F.col("__m.__t") <= F.col("__ts") + iv
        )
        carried = carried.withColumn("__m", F.when(in_window, F.col("__m")))
    return carried.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        F.col("__m.__t").alias(f"{right_time}{suffix}"),
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
