"""Transaction reassembly: buffer VEvents until BEGIN..COMMIT is complete.

Semantics per reference (connection/VitessReplicationConnection.java:128-300),
re-expressed: events arrive in stream order, possibly split across responses;
a transaction is only emitted once its COMMIT is seen, so a consumer (and the
offset protocol, O1) never observes a half transaction. DDL/OTHER/HEARTBEAT
force an immediate flush; duplicate BEGINs (copy phase) are dropped; COMMIT
without BEGIN is an ordering violation.

Used executor-side inside the streaming source's ``read``; pure Python and
unit-testable without Spark or gRPC.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

Event = dict[str, Any]  # one VEvent: {"kind": ..., "seq": ..., ...}

_FLUSH_KINDS = {"DDL", "OTHER", "HEARTBEAT"}


@dataclass
class CompletedTransaction:
    events: list[Event]
    end_seq: Optional[int] = None  # stream position after this tx (offset boundary)


@dataclass
class TransactionBuffer:
    _buffer: list[Event] = field(default_factory=list)
    _in_tx: bool = False

    def add(self, event: Event) -> list[CompletedTransaction]:
        """Feed one event; return zero or more completed transactions."""
        kind = event.get("kind")
        out: list[CompletedTransaction] = []
        if kind == "BEGIN":
            if self._in_tx:
                # VStream Copy emits duplicate BEGINs; drop the duplicate
                # (reference dedups, VitessReplicationConnection.java:166-240)
                return out
            self._in_tx = True
            self._buffer.append(event)
        elif kind == "COMMIT":
            if not self._in_tx:
                raise ValueError(
                    "COMMIT without BEGIN: transaction ordering violated — the "
                    "recording starts mid-transaction (recorder attached inside "
                    "BEGIN..COMMIT), or an earlier DDL/HEARTBEAT interrupted and "
                    "closed the open transaction (sendNow)"
                )
            self._buffer.append(event)
            out.append(CompletedTransaction(self._buffer, end_seq=event.get("seq")))
            self._buffer = []
            self._in_tx = False
        elif kind in _FLUSH_KINDS:
            # flush anything pending, then emit the event alone
            if self._buffer:
                # an open tx interrupted by DDL/OTHER: reference sends buffered
                # events now (sendNow path); emit as its own completed group
                out.append(CompletedTransaction(self._buffer, end_seq=None))
                self._buffer = []
                self._in_tx = False
            out.append(CompletedTransaction([event], end_seq=event.get("seq")))
        else:  # ROW / FIELD / VGTID / VERSION
            if not self._in_tx and kind == "ROW":
                raise ValueError(
                    "ROW event outside BEGIN..COMMIT — the recording starts "
                    "mid-transaction, or a mid-transaction DDL/HEARTBEAT closed "
                    "the open transaction before this row (sendNow)"
                )
            self._buffer.append(event)
        return out

    @property
    def pending(self) -> int:
        return len(self._buffer)
