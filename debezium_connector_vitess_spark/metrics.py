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
    last_offset: dict | None = None
    connected: bool = False
    start_ts: float = field(default_factory=time.time)
    _last_event_ts: float | None = None

    @property
    def uptime_ms(self) -> float:
        return (time.time() - self.start_ts) * 1000.0

    def snapshot(self) -> dict:
        if self._last_event_ts is not None:
            self.milli_seconds_since_last_event = (
                time.time() - self._last_event_ts
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

    def _get(self, name: str) -> StreamingMetrics:
        return self.metrics.setdefault(name or "<unnamed>", StreamingMetrics())

    def onQueryStarted(self, event) -> None:
        m = self._get(event.name)
        m.connected = True
        m.start_ts = time.time()

    def onQueryProgress(self, event) -> None:
        p = event.progress
        m = self._get(p.name)
        rows = int(p.numInputRows or 0)
        m.total_number_of_events_seen += rows
        m.number_of_committed_transactions += 1  # one committed micro-batch
        m.last_event_rate = float(p.processedRowsPerSecond or 0.0)
        if rows:
            m._last_event_ts = time.time()
        try:
            src = p.sources[0]
            end = src.endOffset
            m.last_offset = json.loads(end) if isinstance(end, str) else end
        except (IndexError, ValueError, TypeError):
            pass

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing dependent
        pass

    def onQueryTerminated(self, event) -> None:
        for m in self.metrics.values():
            m.connected = False

    def report(self) -> dict[str, dict]:
        return {name: m.snapshot() for name, m in self.metrics.items()}
