"""Protobuf-shaped VStream wire layer: packed-row decode + transport machine.

The live connector consumes ``vtgate.VStream`` — a gRPC server-stream of
``VStreamResponse{ events: [VEvent] }`` where row images arrive *packed*:
``Query.Row = { lengths: [sint64], values: bytes }`` (one length per column,
-1 ⇒ SQL NULL, values = the non-null cells' UTF-8 bytes concatenated). This
module re-expresses that wire surface as plain dataclasses that mirror the
public Vitess protos (``binlogdata.proto`` / ``query.proto`` /
``vtgate.proto``) one-to-one, so the whole transport — request build →
response stream → transaction buffering → packed-row decode → raw event
frame — runs and is tested without grpcio or a live Vitess: any object with
a ``vstream(request)`` iterator (a real gRPC stub adapter or a test fake)
drives it.

Reference semantics re-expressed here:
- packed-row decode: ``VStreamOutputMessageDecoder.resolveColumns``
  (VStreamOutputMessageDecoder.java:298-329) — lengths+concatenated bytes,
  -1 ⇒ null, column count must match the FIELD-derived schema;
- FIELD handling incl. ``exclude_keyspace_from_table_name`` table-name
  splitting (VStreamOutputMessageDecoder.java:331-388);
- response buffering/state machine: BEGIN/COMMIT ordering validation,
  copy-phase duplicate-BEGIN dedup, DDL/OTHER/HEARTBEAT send-now, latest
  VGTID wins (VitessReplicationConnection.java:128-300);
- request build: flags + table-filter rules + start VGTID
  (VitessReplicationConnection.java:302-343).
"""

from __future__ import annotations

import base64
import binascii
import json
from dataclasses import dataclass, field as dc_field
from datetime import datetime, timezone
from typing import Iterable, Iterator, Optional, Sequence

from ..types import SchemaRegistry, TableSchema, field_event_to_schema, resolve
from ..vgtid import ShardGtid, Vgtid
from .vstream import VStreamConfig, VStreamFlags, VStreamRule, build_flags

# ---------------------------------------------------------------------------
# Wire dataclasses (1:1 with the public Vitess proto messages)
# ---------------------------------------------------------------------------


@dataclass(frozen=True, slots=True)
class WireRow:
    """``query.Row``: lengths (sint64, -1 ⇒ NULL) + concatenated value bytes."""

    lengths: tuple[int, ...]
    values: bytes


@dataclass(frozen=True, slots=True)
class WireRowChange:
    """``binlogdata.RowChange``: before/after packed images."""

    before: Optional[WireRow] = None
    after: Optional[WireRow] = None


@dataclass(frozen=True, slots=True)
class WireRowEvent:
    """``binlogdata.RowEvent``."""

    table_name: str
    row_changes: tuple[WireRowChange, ...]
    keyspace: str = ""
    shard: str = ""


@dataclass(frozen=True, slots=True)
class WireField:
    """``query.Field`` (the subset the decoder consumes)."""

    name: str
    type: str  # Query.Type enum name, e.g. INT64 / VARCHAR / VARBINARY
    column_type: str = ""  # full MySQL column type, e.g. enum('a','b')
    flags: int = 0


@dataclass(frozen=True, slots=True)
class WireFieldEvent:
    """``binlogdata.FieldEvent``."""

    table_name: str
    fields: tuple[WireField, ...]
    keyspace: str = ""
    shard: str = ""
    enum_set_string_values: bool = False


@dataclass(frozen=True, slots=True)
class WireVgtid:
    """``binlogdata.VGtid``: list of per-shard positions."""

    shard_gtids: tuple[ShardGtid, ...]

    def to_vgtid(self) -> Vgtid:
        return Vgtid.of(*self.shard_gtids)


@dataclass(frozen=True, slots=True)
class WireVEvent:
    """``binlogdata.VEvent``. ``timestamp`` is epoch seconds, ``current_time``
    epoch nanos — both as in the proto; decode prefers ``current_time`` for
    sub-second precision when set."""

    type: str  # BEGIN|COMMIT|ROW|FIELD|VGTID|DDL|OTHER|HEARTBEAT|COPY_COMPLETED|VERSION
    timestamp: int = 0
    current_time: int = 0
    row_event: Optional[WireRowEvent] = None
    field_event: Optional[WireFieldEvent] = None
    vgtid: Optional[WireVgtid] = None
    statement: Optional[str] = None
    keyspace: str = ""
    shard: str = ""


@dataclass(frozen=True)
class VStreamRequest:
    """``vtgate.VStreamRequest``: start position + tablet type + filter +
    flags; ``headers`` is the call's gRPC ASCII metadata (attached via an
    interceptor in the reference, VitessReplicationConnection.java:116-126)."""

    vgtid: Vgtid
    tablet_type: str = "MASTER"
    rules: tuple[VStreamRule, ...] = ()
    flags: VStreamFlags = dc_field(default_factory=VStreamFlags)
    headers: tuple[tuple[str, str], ...] = ()


@dataclass(frozen=True, slots=True)
class VStreamResponse:
    """``vtgate.VStreamResponse``: a batch of VEvents."""

    events: tuple[WireVEvent, ...]


# ---------------------------------------------------------------------------
# Packed-row codec
# ---------------------------------------------------------------------------


def pack_row(cells: Sequence[Optional[bytes]]) -> WireRow:
    """Cells → packed Row, the exact inverse of :func:`unpack_row` (what
    vstreamer does server-side; test shape: TestHelper.newRow)."""
    lengths = tuple(-1 if c is None else len(c) for c in cells)
    values = b"".join(c for c in cells if c is not None)
    return WireRow(lengths=lengths, values=values)


def unpack_row(row: WireRow, num_columns: int) -> list[Optional[bytes]]:
    """Packed Row → per-column raw bytes (None ⇒ SQL NULL).

    Mirrors ``resolveColumns`` (VStreamOutputMessageDecoder.java:298-329):
    the column count from the row must match the cached schema's, the offset
    into ``values`` only advances for non-null cells.
    """
    if len(row.lengths) != num_columns:
        raise ValueError(
            f"The number of columns in the ROW event ({len(row.lengths)}) is "
            f"different from the in-memory table schema ({num_columns})."
        )
    cells: list[Optional[bytes]] = []
    off = 0
    for ln in row.lengths:
        if ln == -1:
            cells.append(None)
        else:
            if off + ln > len(row.values):
                raise ValueError(
                    f"packed row truncated: need {off + ln} bytes, have {len(row.values)}"
                )
            cells.append(row.values[off : off + ln])
            off += ln
    if off != len(row.values):
        raise ValueError(
            f"packed row has {len(row.values) - off} trailing bytes not claimed by lengths"
        )
    return cells


_BINARY_FAMILIES = {"BLOB", "BINARY", "BIT"}


def cell_to_transport_str(cell: Optional[bytes], family: str) -> Optional[str]:
    """Raw wire bytes → the transport string the Catalyst decode layer
    consumes (decode.RAW_EVENT_SCHEMA row images are ``map<string,string>``
    with binary columns base64-encoded by the source)."""
    if cell is None:
        return None
    if family in _BINARY_FAMILIES:
        return base64.b64encode(cell).decode("ascii")
    return cell.decode("utf-8")


# ---------------------------------------------------------------------------
# Decoder: FIELD-driven schema registry + packed ROW → raw event dicts
# ---------------------------------------------------------------------------


class ReshardDetectedError(RuntimeError):
    """``stop_on_reshard`` tripped: the VGTID's shard set changed mid-stream.

    The reference sets the flag on the request and VTGate ends the stream at
    a reshard boundary; client-side we also verify (O7 +
    VitessConnectorConfig.java:314-321) so a replayed/buggy server cannot
    silently migrate the subscription."""


class WireDecoder:
    """Stateful per-connection decoder: consumes :class:`WireVEvent`s in
    stream order, maintains the per-(shard, table) schema registry from FIELD
    events, and turns ROW events' packed images into the transport
    ``map<string,string>`` shape.

    The Java analog is ``VStreamOutputMessageDecoder`` + the
    ``VitessDatabaseSchema`` cache it writes through (:331-377).
    """

    def __init__(
        self,
        keyspace: str = "",
        *,
        exclude_keyspace_from_table_name: bool = False,
    ) -> None:
        self.keyspace = keyspace
        self.exclude_keyspace_from_table_name = exclude_keyspace_from_table_name
        self.registry = SchemaRegistry()
        self._families: dict[tuple[str, str, str], list[tuple[str, str]]] = {}

    def schema_table_tuple(self, table_name: str) -> tuple[str, str]:
        """``getSchemaTableTuple`` (VStreamOutputMessageDecoder.java:379-388):
        qualified ``keyspace.table`` unless the server was told to exclude the
        keyspace, in which case the configured keyspace applies."""
        if self.exclude_keyspace_from_table_name:
            return self.keyspace, table_name
        parts = table_name.split(".")
        if len(parts) != 2:
            raise ValueError(
                f"table name {table_name!r} should be keyspace-qualified "
                f"(schemaTableTuple size {len(parts)})"
            )
        return parts[0], parts[1]

    def apply_field_event(self, ev: WireFieldEvent) -> TableSchema:
        keyspace, table = self.schema_table_tuple(ev.table_name)
        fields = [
            {
                "name": f.name,
                "type": f.type,
                "column_type": f.column_type,
                "flags": f.flags,
            }
            for f in ev.fields
        ]
        schema = field_event_to_schema(
            keyspace, ev.shard, table, fields,
            enum_set_string_values=ev.enum_set_string_values,
        )
        self.registry.register(schema)
        self._families[(ev.shard, keyspace, table)] = [
            (f.name, resolve(f.type, f.column_type).family) for f in ev.fields
        ]
        return schema

    def decode_row_image(
        self, shard: str, keyspace: str, table: str, row: Optional[WireRow]
    ) -> Optional[dict[str, Optional[str]]]:
        if row is None:
            return None
        fams = self._families.get((shard, keyspace, table))
        if fams is None:
            raise ValueError(
                f"ROW event for {keyspace}.{table} (shard {shard}) arrived "
                f"before its FIELD event: no schema cached"
            )
        # fused unpack + transport-string loop (hot path: one call per row
        # image) — same validation and output as
        # unpack_row + cell_to_transport_str per cell, without the
        # intermediate cells list and two function calls per column
        lengths, values = row.lengths, row.values
        if len(lengths) != len(fams):
            raise ValueError(
                f"The number of columns in the ROW event ({len(lengths)}) is "
                f"different from the in-memory table schema ({len(fams)})."
            )
        nvalues = len(values)
        binary_families = _BINARY_FAMILIES
        b64encode = base64.b64encode
        out: dict[str, Optional[str]] = {}
        off = 0
        for (name, family), ln in zip(fams, lengths):
            if ln == -1:
                out[name] = None
                continue
            end = off + ln
            if end > nvalues:
                raise ValueError(
                    f"packed row truncated: need {end} bytes, have {nvalues}"
                )
            cell = values[off:end]
            off = end
            if family in binary_families:
                out[name] = b64encode(cell).decode("ascii")
            else:
                out[name] = cell.decode("utf-8")
        if off != nvalues:
            raise ValueError(
                f"packed row has {nvalues - off} trailing bytes not claimed by lengths"
            )
        return out


# ---------------------------------------------------------------------------
# Response observer: the onNext state machine
# ---------------------------------------------------------------------------

# buffered event-type signatures that identify a harmless duplicate BEGIN
# during VStream Copy (VitessReplicationConnection.java:178-193)
_COPY_DUP_BEGIN_SHAPES = {
    ("BEGIN", "FIELD"),
    ("BEGIN", "FIELD", "VGTID"),
    ("COPY_COMPLETED", "BEGIN", "FIELD"),
    ("COPY_COMPLETED", "BEGIN", "FIELD", "VGTID"),
}

_SEND_NOW = {"DDL", "OTHER", "HEARTBEAT"}


@dataclass
class _Flush:
    events: list[WireVEvent]
    vgtid: Optional[WireVgtid]


class VStreamObserver:
    """Buffers VEvents across responses until a transaction is complete.

    Pure-Python re-expression of the anonymous ``StreamObserver`` in
    ``VitessReplicationConnection.startStreaming`` (:128-300): only whole
    BEGIN..COMMIT groups (or send-now events) are released, the latest VGTID
    event in the group is the group's position, ordering violations raise.
    """

    def __init__(self, *, is_in_vstream_copy: bool = False) -> None:
        self._buffer: list[WireVEvent] = []
        self._new_vgtid: Optional[WireVgtid] = None
        self._begin_seen = False
        self._commit_seen = False
        self.is_in_vstream_copy = is_in_vstream_copy

    def _reset(self) -> None:
        self._buffer = []
        self._new_vgtid = None
        self._begin_seen = False
        self._commit_seen = False

    def on_response(self, response: VStreamResponse) -> list[_Flush]:
        send_now = False
        heartbeat = False
        for ev in response.events:
            if ev.type == "VGTID":
                self._new_vgtid = ev.vgtid
            elif ev.type == "BEGIN":
                if self._commit_seen:
                    raise ValueError("Received BEGIN event after receiving COMMIT event")
                if self._begin_seen:
                    shape = tuple(e.type for e in self._buffer)
                    if shape in _COPY_DUP_BEGIN_SHAPES:
                        # copy-phase duplicate BEGIN: no records copied, the
                        # buffered prelude is safely discarded
                        self._reset()
                    else:
                        raise ValueError(
                            f"Received duplicate BEGIN events. Buffered event "
                            f"types: {', '.join(shape)}"
                        )
                self._begin_seen = True
            elif ev.type == "COMMIT":
                if not self._begin_seen:
                    raise ValueError("Received COMMIT event before receiving BEGIN event")
                if self._commit_seen:
                    raise ValueError("Received duplicate COMMIT events")
                self._commit_seen = True
            elif ev.type in _SEND_NOW:
                send_now = True
                heartbeat = heartbeat or ev.type == "HEARTBEAT"
            self._buffer.append(ev)

        if (not self._begin_seen or not self._commit_seen) and not send_now:
            return []  # partial transaction: keep buffering
        if self._new_vgtid is None and not heartbeat:
            # no position for this group: skip it — the reference logs and
            # resets identically; log loudly because the offset still advances
            # past the dropped events (a DDL here would vanish silently)
            import logging

            logging.getLogger(__name__).warning(
                "dropping VStream group with no VGTID position (types: %s) — "
                "the offset advances past it; the reference does the same",
                ", ".join(e.type for e in self._buffer),
            )
            self._reset()
            return []
        if any(e.type == "COPY_COMPLETED" for e in self._buffer):
            self.is_in_vstream_copy = False
        flush = _Flush(events=self._buffer, vgtid=self._new_vgtid)
        self._reset()
        return [flush]

    @property
    def pending(self) -> int:
        return len(self._buffer)


# ---------------------------------------------------------------------------
# Transport: request build + channel drive → raw event dicts
# ---------------------------------------------------------------------------


def build_request(
    config: VStreamConfig,
    *,
    rules: Iterable[VStreamRule] = (),
    metadata=None,
    start_vgtid: Optional[Vgtid] = None,
) -> VStreamRequest:
    """Compile config → the VStreamRequest the reference sends
    (VitessReplicationConnection.java:302-343): start position (O3), flags
    incl. partial-snapshot table list (F3), and server-side filter rules (F2)."""
    vgtid = start_vgtid if start_vgtid is not None else config.resolve_start_vgtid()
    return VStreamRequest(
        vgtid=vgtid,
        tablet_type=config.tablet_type.upper(),
        rules=tuple(rules),
        flags=build_flags(config, metadata),
        headers=tuple(sorted(config.grpc_headers.items())),
    )


class VStreamTransport:
    """Drives one VStream call end to end against any channel-shaped object.

    ``channel.vstream(request)`` must return an iterator of
    :class:`VStreamResponse` — the async gRPC stub adapter in production, a
    fake in tests. Yields raw event dicts in the replay-frame shape consumed
    by ``decode.RAW_EVENT_SCHEMA`` adapters.
    """

    def __init__(
        self,
        channel,
        config: VStreamConfig,
        *,
        rules: Iterable[VStreamRule] = (),
        metadata=None,
        start_vgtid: Optional[Vgtid] = None,
    ) -> None:
        self.config = config
        self.channel = channel
        self.request = build_request(
            config, rules=rules, metadata=metadata, start_vgtid=start_vgtid
        )
        self.decoder = WireDecoder(
            config.keyspace,
            exclude_keyspace_from_table_name=config.exclude_keyspace_from_table_name,
        )
        self.observer = VStreamObserver(
            is_in_vstream_copy=self.request.vgtid.is_initial()
        )
        self._subscribed_shards = frozenset(self.request.vgtid.shards)

    def flushes(self) -> Iterator[tuple[list[dict], Optional[WireVgtid]]]:
        """Stream → (decoded raw event dicts, position) per completed
        transaction/group. The position is the group's VGTID — what the O1
        rotate/reset protocol commits as the offset after the group."""
        for response in self.channel.vstream(self.request):
            for flush in self.observer.on_response(response):
                self._check_reshard(flush.vgtid)
                yield list(decode_flush(self.decoder, flush)), flush.vgtid
        if self.observer.pending:
            raise ValueError(
                f"stream ended mid-transaction with {self.observer.pending} "
                f"buffered events"
            )

    def events(self) -> Iterator[dict]:
        """Stream → decoded raw event dicts, whole transactions at a time."""
        for rows, _vgtid in self.flushes():
            yield from rows

    def _check_reshard(self, vgtid: Optional[WireVgtid]) -> None:
        if vgtid is None or not self.config.stop_on_reshard:
            return
        # a VGTID may carry a subset of subscribed shards; a reshard shows up
        # as shard names we never subscribed to (children of a split/merge)
        unknown = frozenset(sg.shard for sg in vgtid.shard_gtids) - self._subscribed_shards
        if unknown:
            raise ReshardDetectedError(
                f"shard set changed: unsubscribed shards {sorted(unknown)} "
                f"appeared (subscribed {sorted(self._subscribed_shards)}) with "
                f"stop_on_reshard set"
            )


def decode_flush(decoder: WireDecoder, flush: _Flush) -> Iterator[dict]:
    """One completed transaction/group → raw event dicts.

    The group's VGTID (the latest VGTID event, per the observer) is the
    position of every event in it — the reference's "all events in a tx share
    one VGTID; tx id = the entire VGTID string"
    (VStreamOutputMessageDecoder.java:121-150).
    """
    vgtid_json = flush.vgtid.to_vgtid().to_json() if flush.vgtid else None

    def _gtid_for(shard: str) -> Optional[str]:
        if flush.vgtid is None:
            return None
        for sg in flush.vgtid.shard_gtids:
            if sg.shard == shard:
                return sg.gtid
        return None

    def _resolve_ts(ev: WireVEvent) -> datetime:
        ts_micros = (
            ev.current_time // 1_000 if ev.current_time else ev.timestamp * 1_000_000
        )
        return datetime.fromtimestamp(ts_micros / 1e6, tz=timezone.utc)

    # ROW events are stamped with their transaction's COMMIT timestamp (the
    # observer records it when COMMIT arrives: VitessReplicationConnection
    # .java:204, consumed by the row handlers at VStreamOutputMessageDecoder
    # .java:206-282); BEGIN/COMMIT/DDL/OTHER keep their own event timestamp.
    #
    # Documented divergence: when a send-now event (DDL/OTHER/HEARTBEAT)
    # flushes a PARTIAL transaction (BEGIN+ROWs buffered, COMMIT not yet
    # seen), those rows keep their own event timestamps. The reference's row
    # handlers would consume whatever commitTimestamp the observer last
    # recorded — i.e. the PREVIOUS transaction's commit time, which is stale.
    # Event time is the less-wrong stamp; the case itself cannot arise from
    # MySQL binlogs (DDL auto-commits, so it never lands inside an open tx).
    commit_ts: Optional[datetime] = None
    for ev in flush.events:
        if ev.type == "COMMIT":
            commit_ts = _resolve_ts(ev)

    for ev in flush.events:
        ts = commit_ts if (ev.type == "ROW" and commit_ts is not None) else _resolve_ts(ev)
        if ev.type == "FIELD" and ev.field_event is not None:
            fe = ev.field_event
            keyspace, table = decoder.schema_table_tuple(fe.table_name)
            decoder.apply_field_event(fe)
            yield {
                "kind": "FIELD",
                "keyspace": keyspace,
                "shard": fe.shard,
                "table": table,
                "gtid": _gtid_for(fe.shard),
                "vgtid": vgtid_json,
                "ts": ts,
                "row_changes": None,
                "statement": None,
                "fields": [(f.name, f.type, f.column_type, f.flags) for f in fe.fields],
            }
        elif ev.type == "ROW" and ev.row_event is not None:
            re = ev.row_event
            keyspace, table = decoder.schema_table_tuple(re.table_name)
            changes = [
                (
                    decoder.decode_row_image(re.shard, keyspace, table, rc.before),
                    decoder.decode_row_image(re.shard, keyspace, table, rc.after),
                )
                for rc in re.row_changes
            ]
            yield {
                "kind": "ROW",
                "keyspace": keyspace,
                "shard": re.shard,
                "table": table,
                "gtid": _gtid_for(re.shard),
                "vgtid": vgtid_json,
                "ts": ts,
                "row_changes": changes,
                "statement": None,
                "fields": None,
            }
        elif ev.type in ("VGTID", "VERSION", "COPY_COMPLETED"):
            continue  # positions are carried on the flush; no standalone row
        else:  # BEGIN / COMMIT / DDL / OTHER / HEARTBEAT
            yield {
                "kind": ev.type,
                "keyspace": ev.keyspace or decoder.keyspace or None,
                "shard": ev.shard or None,
                "gtid": _gtid_for(ev.shard) if ev.shard else None,
                "vgtid": vgtid_json,
                "ts": ts,
                "table": None,
                "row_changes": None,
                "statement": ev.statement,
                "fields": None,
            }


# ---------------------------------------------------------------------------
# JSON serde — the recorded-wire fixture format (replay `format=wire`)
# ---------------------------------------------------------------------------


def vevent_to_json(ev: WireVEvent) -> str:
    d: dict = {"type": ev.type, "timestamp": ev.timestamp}
    if ev.current_time:
        d["current_time"] = ev.current_time
    if ev.row_event is not None:
        d["row_event"] = {
            "table_name": ev.row_event.table_name,
            "keyspace": ev.row_event.keyspace,
            "shard": ev.row_event.shard,
            "row_changes": [
                {
                    k: (
                        {
                            "lengths": list(r.lengths),
                            "values": base64.b64encode(r.values).decode("ascii"),
                        }
                        if r is not None
                        else None
                    )
                    for k, r in (("before", rc.before), ("after", rc.after))
                    if r is not None
                }
                for rc in ev.row_event.row_changes
            ],
        }
    if ev.field_event is not None:
        d["field_event"] = {
            "table_name": ev.field_event.table_name,
            "keyspace": ev.field_event.keyspace,
            "shard": ev.field_event.shard,
            "enum_set_string_values": ev.field_event.enum_set_string_values,
            "fields": [
                {
                    "name": f.name,
                    "type": f.type,
                    "column_type": f.column_type,
                    "flags": f.flags,
                }
                for f in ev.field_event.fields
            ],
        }
    if ev.vgtid is not None:
        d["vgtid"] = {
            "shard_gtids": [sg.to_dict() for sg in ev.vgtid.shard_gtids]
        }
    if ev.statement is not None:
        d["statement"] = ev.statement
    if ev.keyspace:
        d["keyspace"] = ev.keyspace
    if ev.shard:
        d["shard"] = ev.shard
    return json.dumps(d, separators=(",", ":"))


def _row_from_json(d: Optional[dict]) -> Optional[WireRow]:
    if d is None:
        return None
    # binascii.a2b_base64 IS base64.b64decode's core (b64decode merely
    # ASCII-encodes str input and delegates); calling it directly skips the
    # wrapper on the replay hot path — identical bytes out
    return WireRow(
        lengths=tuple(d["lengths"]),
        values=binascii.a2b_base64(d["values"].encode("ascii")),
    )


def vevent_from_json(raw: str) -> WireVEvent:
    d = json.loads(raw)
    row_event = None
    if "row_event" in d:
        re = d["row_event"]
        row_event = WireRowEvent(
            table_name=re["table_name"],
            keyspace=re.get("keyspace", ""),
            shard=re.get("shard", ""),
            row_changes=tuple(
                WireRowChange(
                    before=_row_from_json(rc.get("before")),
                    after=_row_from_json(rc.get("after")),
                )
                for rc in re["row_changes"]
            ),
        )
    field_event = None
    if "field_event" in d:
        fe = d["field_event"]
        field_event = WireFieldEvent(
            table_name=fe["table_name"],
            keyspace=fe.get("keyspace", ""),
            shard=fe.get("shard", ""),
            enum_set_string_values=fe.get("enum_set_string_values", False),
            fields=tuple(
                WireField(
                    name=f["name"],
                    type=f.get("type", "VARCHAR"),
                    column_type=f.get("column_type", ""),
                    flags=f.get("flags", 0),
                )
                for f in fe["fields"]
            ),
        )
    vgtid = None
    if "vgtid" in d:
        vgtid = WireVgtid(
            shard_gtids=tuple(
                ShardGtid.from_dict(sg) for sg in d["vgtid"]["shard_gtids"]
            )
        )
    return WireVEvent(
        type=d["type"],
        timestamp=d.get("timestamp", 0),
        current_time=d.get("current_time", 0),
        row_event=row_event,
        field_event=field_event,
        vgtid=vgtid,
        statement=d.get("statement"),
        keyspace=d.get("keyspace", ""),
        shard=d.get("shard", ""),
    )


def raw_event_tuple(d: dict, default_shard: Optional[str] = None) -> tuple:
    """Decoded event dict → decode.RAW_EVENT_SCHEMA tuple (tx id = the entire
    VGTID string, VStreamOutputMessageDecoder.java:121-150)."""
    # direct indexing: every decode_flush dict carries all of these keys
    # (the only producers are decode_flush and its transport twin)
    vg = d["vgtid"]
    return (
        d["kind"],
        d["keyspace"],
        d["shard"] or default_shard,
        d["table"],
        d["gtid"],
        vg,
        vg,
        d["ts"],
        d["row_changes"],
        d["statement"],
        d["fields"],
    )


class FakeChannel:
    """Test double for the gRPC channel: records the request, replays
    pre-built responses. Any iterable of responses (or a callable taking the
    request) works."""

    def __init__(self, responses: Iterable[VStreamResponse] | None = None, fn=None):
        self._responses = list(responses or [])
        self._fn = fn
        self.requests: list[VStreamRequest] = []

    def vstream(self, request: VStreamRequest) -> Iterator[VStreamResponse]:
        self.requests.append(request)
        if self._fn is not None:
            yield from self._fn(request)
        else:
            yield from self._responses


def _gtid_seq(gtid: str) -> int:
    import re

    m = re.search(r"(\d+)$", gtid or "")
    return int(m.group(1)) if m else 0


class JsonlChannel:
    """Channel that replays a recorded wire-format stream (``{shard}.jsonl``
    of protobuf-shaped VEvents) honoring the request's VGTID resume position
    — the VStream contract: resume is exclusive-start per shard, and FIELD
    events re-send before a table's first ROW on every new stream
    (VitessReplicationConnection.java:329-331 comment, VStream semantics).

    This is what lets the LIVE source path (request → responses → buffer →
    packed decode → VGTID offsets) run end to end against recorded data:
    tests and offline replays inject it via the ``channelFactory`` option.
    """

    def __init__(self, path: str) -> None:
        self.path = path

    def vstream(self, request: VStreamRequest) -> Iterator[VStreamResponse]:
        import os

        shard_txs: dict[str, list] = {}
        for fname in sorted(os.listdir(self.path)):
            if not fname.endswith(".jsonl"):
                continue
            shard = fname[: -len(".jsonl")]
            events = [
                vevent_from_json(line)
                for line in open(os.path.join(self.path, fname), encoding="utf-8")
                if line.strip()
            ]
            txs: list[list[WireVEvent]] = []
            cur: list[WireVEvent] = []
            for ev in events:
                cur.append(ev)
                if ev.type == "COMMIT":
                    txs.append(cur)
                    cur = []
            if cur:
                txs.append(cur)
            sg = request.vgtid.get_shard_gtid(shard)
            resume = _gtid_seq(sg.gtid) if sg is not None else 0
            # mid-copy resume (TablePrimaryKeys.java:27-368 semantics): the
            # offset's table_p_ks lists every UNFINISHED table — the
            # in-progress one with its lastpk, pending ones with an empty
            # lastpk. Tables absent from the map are fully copied.
            mid_copy = sg is not None and bool(sg.table_p_ks)
            resume_tpks: dict[str, Optional[int]] = {}
            if sg is not None:
                for t in sg.table_p_ks:
                    rows_ = t.lastpk.get("rows") if t.lastpk else None
                    resume_tpks[t.table_name] = int(rows_[0]) if rows_ else None
            pending: list[list[WireVEvent]] = []
            skipped_fields: list[WireVEvent] = []

            def _tx_table(tx) -> Optional[str]:
                for ev in tx:
                    if ev.type == "ROW" and ev.row_event is not None:
                        return ev.row_event.table_name.rsplit(".", 1)[-1]
                    if ev.type == "FIELD" and ev.field_event is not None:
                        return ev.field_event.table_name.rsplit(".", 1)[-1]
                return None

            for tx in txs:
                vg = next((ev.vgtid for ev in tx if ev.vgtid is not None), None)
                entry = vg.to_vgtid().get_shard_gtid(shard) if vg is not None else None
                seq = _gtid_seq(entry.gtid) if entry is not None else 0
                skip = False
                if mid_copy:
                    # copy chunks (and the copy base position) filter by
                    # lastpk; stream transactions past the base are kept
                    if seq <= resume:
                        tbl = _tx_table(tx)
                        if tbl is not None:
                            if tbl not in resume_tpks:
                                skip = True  # table finished before restart
                            elif resume_tpks[tbl] is not None:
                                chunk_pk = None
                                if entry is not None:
                                    for t in entry.table_p_ks:
                                        if t.table_name == tbl and t.lastpk.get("rows"):
                                            chunk_pk = int(t.lastpk["rows"][0])
                                if chunk_pk is not None and chunk_pk <= resume_tpks[tbl]:
                                    skip = True
                elif seq <= resume:
                    skip = True
                if skip:
                    skipped_fields.extend(e for e in tx if e.type == "FIELD")
                else:
                    pending.append(tx)
            if pending and skipped_fields:
                # re-send schemas at stream start, inside the first tx (the
                # dedup keeps only the latest FIELD per table)
                latest: dict[str, WireVEvent] = {}
                for ev in skipped_fields:
                    latest[ev.field_event.table_name] = ev
                first = pending[0]
                pending[0] = [first[0], *latest.values(), *first[1:]]
            shard_txs[shard] = pending
        # interleave shards round-robin, one transaction per response
        while any(shard_txs.values()):
            for shard in sorted(shard_txs):
                if shard_txs[shard]:
                    yield VStreamResponse(events=tuple(shard_txs[shard].pop(0)))


def jsonl_channel_factory(options: dict) -> JsonlChannel:
    """``channelFactory`` entry point: ``option("path", dir)`` names the
    recorded wire stream."""
    path = options.get("path")
    if not path:
        raise ValueError("jsonl_channel_factory requires a 'path' option")
    return JsonlChannel(path)
