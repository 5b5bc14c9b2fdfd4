"""Pure-stdlib protobuf wire codec for the VStream RPC message subset.

The live source needs exactly one RPC: ``vtgateservice.Vitess/VStream`` —
serialize one ``vtgate.VStreamRequest``, deserialize a stream of
``vtgate.VStreamResponse``. gRPC channels accept plain ``request_serializer``
/ ``response_deserializer`` callables, so no generated pb2 stubs (and no
protobuf runtime) are required: this module implements the protobuf wire
format (varints, zigzag, length-delimited fields, packed repeats) for just
the messages involved, mapping directly onto the dataclasses in
``sources/wire.py``.

Message shapes and field numbers follow the PUBLIC Apache-2.0 Vitess protos
(``proto/vtgate.proto``, ``proto/binlogdata.proto``, ``proto/query.proto``,
``proto/topodata.proto``) — the same messages the reference drives through
its generated Java stubs (VitessReplicationConnection.java:302-343).
Unknown incoming fields are skipped by wire type, so newer server versions
remain readable; a KNOWN field number arriving with the wrong wire type is
treated as unknown and skipped too (protobuf-runtime behavior) — decoders
never interpret a varint as a length, so a malformed or hostile frame can't
trigger huge allocations; it either decodes or raises ValueError.

Field numbers marked BEST-EFFORT below were added to vtgate.proto recently
for the CDC use case and could not be cross-checked in this environment;
verify against the deployed Vitess version before production use. Every
other number is the long-stable public definition.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

from ..vgtid import ShardGtid, TableLastPK, Vgtid
from .vstream import VStreamFlags, VStreamRule
from .wire import (
    VStreamRequest,
    VStreamResponse,
    WireField,
    WireFieldEvent,
    WireRow,
    WireRowChange,
    WireRowEvent,
    WireVEvent,
    WireVgtid,
)

# ---------------------------------------------------------------------------
# Wire-format primitives
# ---------------------------------------------------------------------------

_WT_VARINT, _WT_FIXED64, _WT_LEN, _WT_FIXED32 = 0, 1, 2, 5


def encode_varint(n: int) -> bytes:
    """Unsigned LEB128. Negative ints encode as their 64-bit two's complement
    (protobuf semantics for int32/int64/enum)."""
    if n < 0:
        n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint too long")


def zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _tag(field_no: int, wt: int) -> bytes:
    return encode_varint((field_no << 3) | wt)


def _e_varint(out: bytearray, field_no: int, n: int, *, keep_zero: bool = False) -> None:
    if n or keep_zero:
        out += _tag(field_no, _WT_VARINT)
        out += encode_varint(n)


def _e_bytes(out: bytearray, field_no: int, b: bytes, *, keep_empty: bool = False) -> None:
    if b or keep_empty:
        out += _tag(field_no, _WT_LEN)
        out += encode_varint(len(b))
        out += b


def _e_str(out: bytearray, field_no: int, s: Optional[str]) -> None:
    if s:
        _e_bytes(out, field_no, s.encode("utf-8"))


def _e_msg(out: bytearray, field_no: int, payload: bytes, *, keep_empty: bool = False) -> None:
    _e_bytes(out, field_no, payload, keep_empty=keep_empty)


def iter_fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_no, wire_type, value); length-delimited values are bytes,
    varints ints, fixed32/64 raw ints. Groups (wire types 3/4) are rejected —
    none of these protos use them."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = decode_varint(buf, pos)
        field_no, wt = key >> 3, key & 0x7
        if wt == _WT_VARINT:
            val, pos = decode_varint(buf, pos)
        elif wt == _WT_LEN:
            ln, pos = decode_varint(buf, pos)
            if pos + ln > n:
                raise ValueError("truncated length-delimited field")
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == _WT_FIXED64:
            if pos + 8 > n:
                raise ValueError("truncated fixed64")
            (val,) = struct.unpack_from("<Q", buf, pos)
            pos += 8
        elif wt == _WT_FIXED32:
            if pos + 4 > n:
                raise ValueError("truncated fixed32")
            (val,) = struct.unpack_from("<I", buf, pos)
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt} (field {field_no})")
        yield field_no, wt, val


# ---------------------------------------------------------------------------
# Enums (topodata.TabletType, binlogdata.VEventType, query.Type)
# ---------------------------------------------------------------------------

# topodata.proto TabletType (MASTER is the legacy alias of PRIMARY)
TABLET_TYPE_TO_INT = {
    "UNKNOWN": 0, "PRIMARY": 1, "MASTER": 1, "REPLICA": 2, "RDONLY": 3,
    "BATCH": 3, "SPARE": 4, "EXPERIMENTAL": 5, "BACKUP": 6, "RESTORE": 7,
    "DRAINED": 8,
}

# binlogdata.proto VEventType
_VEVENT_TYPES = (
    "UNKNOWN", "GTID", "BEGIN", "COMMIT", "ROLLBACK", "DDL", "INSERT",
    "REPLACE", "UPDATE", "DELETE", "SET", "OTHER", "ROW", "FIELD",
    "HEARTBEAT", "VGTID", "JOURNAL", "VERSION", "LASTPK", "SAVEPOINT",
    "COPY_COMPLETED",
)
VEVENT_TYPE_TO_INT = {name: i for i, name in enumerate(_VEVENT_TYPES)}
INT_TO_VEVENT_TYPE = dict(enumerate(_VEVENT_TYPES))

# query.proto Type: value = base id | flags (the proto encodes the flag bits
# in the enum values themselves: ISINTEGRAL=256, ISUNSIGNED=512, ISFLOAT=1024,
# ISQUOTED=2048, ISTEXT=4096, ISBINARY=8192)
_I, _U, _F, _Q, _T, _B = 256, 512, 1024, 2048, 4096, 8192
QUERY_TYPE_TO_INT = {
    "NULL_TYPE": 0,
    "INT8": 1 | _I, "UINT8": 2 | _I | _U, "INT16": 3 | _I, "UINT16": 4 | _I | _U,
    "INT24": 5 | _I, "UINT24": 6 | _I | _U, "INT32": 7 | _I, "UINT32": 8 | _I | _U,
    "INT64": 9 | _I, "UINT64": 10 | _I | _U,
    "FLOAT32": 11 | _F, "FLOAT64": 12 | _F,
    "TIMESTAMP": 13 | _Q, "DATE": 14 | _Q, "TIME": 15 | _Q, "DATETIME": 16 | _Q,
    "YEAR": 17 | _I | _U, "DECIMAL": 18,
    "TEXT": 19 | _Q | _T, "BLOB": 20 | _Q | _B,
    "VARCHAR": 21 | _Q | _T, "VARBINARY": 22 | _Q | _B,
    "CHAR": 23 | _Q | _T, "BINARY": 24 | _Q | _B,
    "BIT": 25 | _Q, "ENUM": 26 | _Q, "SET": 27 | _Q, "TUPLE": 28,
    "GEOMETRY": 29 | _Q, "JSON": 30 | _Q, "EXPRESSION": 31,
    "HEXNUM": 32 | _T, "HEXVAL": 33 | _T, "BITNUM": 34 | _T,
}
INT_TO_QUERY_TYPE = {v: k for k, v in QUERY_TYPE_TO_INT.items()}


# ---------------------------------------------------------------------------
# query.proto messages
# ---------------------------------------------------------------------------


def encode_row(row: WireRow) -> bytes:
    """query.Row: repeated sint64 lengths = 1 (packed zigzag); bytes values = 2."""
    out = bytearray()
    if row.lengths:
        packed = b"".join(encode_varint(zigzag_encode(ln)) for ln in row.lengths)
        _e_bytes(out, 1, packed)
    _e_bytes(out, 2, row.values)
    return bytes(out)


def decode_row(buf: bytes) -> WireRow:
    lengths: list[int] = []
    values = b""
    for field_no, wt, val in iter_fields(buf):
        if field_no == 1 and wt == _WT_LEN:  # packed
            pos = 0
            while pos < len(val):
                n, pos = decode_varint(val, pos)
                lengths.append(zigzag_decode(n))
        elif field_no == 1 and wt == _WT_VARINT:  # unpacked fallback
            lengths.append(zigzag_decode(val))
        elif field_no == 2 and wt == _WT_LEN:
            values = bytes(val)
    return WireRow(lengths=tuple(lengths), values=values)


def encode_field(f: WireField) -> bytes:
    """query.Field: name=1, type=2 (enum), column_type=11, flags=10 — the
    subset the decoder consumes; other metadata fields are left unset."""
    out = bytearray()
    _e_str(out, 1, f.name)
    _e_varint(out, 2, QUERY_TYPE_TO_INT.get(f.type, 0))
    _e_varint(out, 10, f.flags)
    _e_str(out, 11, f.column_type)
    return bytes(out)


def decode_field(buf: bytes) -> WireField:
    name = column_type = ""
    type_name = "NULL_TYPE"
    flags = 0
    for field_no, wt, val in iter_fields(buf):
        if field_no == 1 and wt == _WT_LEN:
            name = bytes(val).decode("utf-8")
        elif field_no == 2 and wt == _WT_VARINT:
            type_name = INT_TO_QUERY_TYPE.get(int(val), "NULL_TYPE")
        elif field_no == 10 and wt == _WT_VARINT:
            flags = int(val)
        elif field_no == 11 and wt == _WT_LEN:
            column_type = bytes(val).decode("utf-8")
    return WireField(name=name, type=type_name, column_type=column_type, flags=flags)


def _encode_lastpk_result(lastpk: dict) -> bytes:
    """query.QueryResult (fields=1, rows=4) carrying the copy-phase last-PK —
    the shape TablePrimaryKeys serializes (TablePrimaryKeys.java:27-368).
    ``lastpk`` is the vgtid-module dict {"fields": [{"name": ...}], "rows":
    [str, ...]}."""
    out = bytearray()
    for f in lastpk.get("fields", []):
        fb = bytearray()
        _e_str(fb, 1, f.get("name", ""))
        _e_varint(fb, 2, QUERY_TYPE_TO_INT.get(f.get("type", ""), 0))
        _e_msg(out, 1, bytes(fb), keep_empty=True)
    rows = lastpk.get("rows", [])
    if rows:
        cells = [str(r).encode("utf-8") for r in rows]
        _e_msg(out, 4, encode_row(WireRow(
            lengths=tuple(len(c) for c in cells), values=b"".join(cells)
        )))
    return bytes(out)


def _decode_lastpk_result(buf: bytes) -> dict:
    fields: list[dict] = []
    rows: list[str] = []
    for field_no, wt, val in iter_fields(buf):
        if field_no == 1 and wt == _WT_LEN:
            f = decode_field(bytes(val))
            d = {"name": f.name}
            if f.type != "NULL_TYPE":
                d["type"] = f.type
            fields.append(d)
        elif field_no == 4 and wt == _WT_LEN:
            row = decode_row(bytes(val))
            off = 0
            for ln in row.lengths:
                if ln < 0:
                    rows.append("")
                else:
                    rows.append(row.values[off : off + ln].decode("utf-8"))
                    off += ln
    out: dict = {}
    if fields:
        out["fields"] = fields
    if rows:
        out["rows"] = rows
    return out


# ---------------------------------------------------------------------------
# binlogdata.proto messages
# ---------------------------------------------------------------------------


def encode_table_last_pk(tpk: TableLastPK) -> bytes:
    """binlogdata.TableLastPK: table_name=1, lastpk=3 (2 is reserved)."""
    out = bytearray()
    _e_str(out, 1, tpk.table_name)
    if tpk.lastpk:
        _e_msg(out, 3, _encode_lastpk_result(tpk.lastpk))
    return bytes(out)


def decode_table_last_pk(buf: bytes) -> TableLastPK:
    table_name = ""
    lastpk: dict = {}
    for field_no, wt, val in iter_fields(buf):
        if field_no == 1 and wt == _WT_LEN:
            table_name = bytes(val).decode("utf-8")
        elif field_no == 3 and wt == _WT_LEN:
            lastpk = _decode_lastpk_result(bytes(val))
    return TableLastPK(table_name=table_name, lastpk=lastpk)


def encode_shard_gtid(sg: ShardGtid) -> bytes:
    """binlogdata.ShardGtid: keyspace=1, shard=2, gtid=3, table_p_ks=4."""
    out = bytearray()
    _e_str(out, 1, sg.keyspace)
    _e_str(out, 2, sg.shard)
    _e_str(out, 3, sg.gtid)
    for tpk in sg.table_p_ks or ():
        _e_msg(out, 4, encode_table_last_pk(tpk), keep_empty=True)
    return bytes(out)


def decode_shard_gtid(buf: bytes) -> ShardGtid:
    keyspace = shard = gtid = ""
    tpks: list[TableLastPK] = []
    for field_no, wt, val in iter_fields(buf):
        if wt != _WT_LEN:
            continue
        if field_no == 1:
            keyspace = bytes(val).decode("utf-8")
        elif field_no == 2:
            shard = bytes(val).decode("utf-8")
        elif field_no == 3:
            gtid = bytes(val).decode("utf-8")
        elif field_no == 4:
            tpks.append(decode_table_last_pk(bytes(val)))
    return ShardGtid(keyspace=keyspace, shard=shard, gtid=gtid, table_p_ks=tuple(tpks))


def encode_vgtid(shard_gtids) -> bytes:
    """binlogdata.VGtid: repeated ShardGtid shard_gtids = 1."""
    out = bytearray()
    for sg in shard_gtids:
        _e_msg(out, 1, encode_shard_gtid(sg), keep_empty=True)
    return bytes(out)


def decode_vgtid(buf: bytes) -> WireVgtid:
    sgs = [
        decode_shard_gtid(bytes(val))
        for field_no, wt, val in iter_fields(buf)
        if field_no == 1 and wt == _WT_LEN
    ]
    return WireVgtid(shard_gtids=tuple(sgs))


def encode_rule(rule: VStreamRule) -> bytes:
    """binlogdata.Rule: match=1, filter=2."""
    out = bytearray()
    _e_str(out, 1, rule.match)
    _e_str(out, 2, rule.filter)
    return bytes(out)


def encode_filter(rules) -> bytes:
    """binlogdata.Filter: repeated Rule rules = 1."""
    out = bytearray()
    for r in rules:
        _e_msg(out, 1, encode_rule(r), keep_empty=True)
    return bytes(out)


def encode_row_change(rc: WireRowChange) -> bytes:
    """binlogdata.RowChange: before=1, after=2."""
    out = bytearray()
    if rc.before is not None:
        _e_msg(out, 1, encode_row(rc.before), keep_empty=True)
    if rc.after is not None:
        _e_msg(out, 2, encode_row(rc.after), keep_empty=True)
    return bytes(out)


def decode_row_change(buf: bytes) -> WireRowChange:
    before = after = None
    for field_no, wt, val in iter_fields(buf):
        if field_no == 1 and wt == _WT_LEN:
            before = decode_row(bytes(val))
        elif field_no == 2 and wt == _WT_LEN:
            after = decode_row(bytes(val))
    return WireRowChange(before=before, after=after)


def encode_row_event(ev: WireRowEvent) -> bytes:
    """binlogdata.RowEvent: table_name=1, row_changes=2, keyspace=3, shard=4."""
    out = bytearray()
    _e_str(out, 1, ev.table_name)
    for rc in ev.row_changes:
        _e_msg(out, 2, encode_row_change(rc), keep_empty=True)
    _e_str(out, 3, ev.keyspace)
    _e_str(out, 4, ev.shard)
    return bytes(out)


def decode_row_event(buf: bytes) -> WireRowEvent:
    table_name = keyspace = shard = ""
    rcs: list[WireRowChange] = []
    for field_no, wt, val in iter_fields(buf):
        if wt != _WT_LEN:
            continue
        if field_no == 1:
            table_name = bytes(val).decode("utf-8")
        elif field_no == 2:
            rcs.append(decode_row_change(bytes(val)))
        elif field_no == 3:
            keyspace = bytes(val).decode("utf-8")
        elif field_no == 4:
            shard = bytes(val).decode("utf-8")
    return WireRowEvent(
        table_name=table_name, row_changes=tuple(rcs), keyspace=keyspace, shard=shard
    )


def encode_field_event(ev: WireFieldEvent) -> bytes:
    """binlogdata.FieldEvent: table_name=1, fields=2, keyspace=3, shard=4,
    enum_set_string_values=25 (added for the CDC use case; Vitess numbers the
    newer FieldEvent fields from 25 up)."""
    out = bytearray()
    _e_str(out, 1, ev.table_name)
    for f in ev.fields:
        _e_msg(out, 2, encode_field(f), keep_empty=True)
    _e_str(out, 3, ev.keyspace)
    _e_str(out, 4, ev.shard)
    _e_varint(out, 25, 1 if ev.enum_set_string_values else 0)
    return bytes(out)


def decode_field_event(buf: bytes) -> WireFieldEvent:
    table_name = keyspace = shard = ""
    fields: list[WireField] = []
    enum_set = False
    for field_no, wt, val in iter_fields(buf):
        if field_no == 1 and wt == _WT_LEN:
            table_name = bytes(val).decode("utf-8")
        elif field_no == 2 and wt == _WT_LEN:
            fields.append(decode_field(bytes(val)))
        elif field_no == 3 and wt == _WT_LEN:
            keyspace = bytes(val).decode("utf-8")
        elif field_no == 4 and wt == _WT_LEN:
            shard = bytes(val).decode("utf-8")
        elif field_no == 25 and wt == _WT_VARINT:
            enum_set = bool(val)
    return WireFieldEvent(
        table_name=table_name, fields=tuple(fields), keyspace=keyspace,
        shard=shard, enum_set_string_values=enum_set,
    )


def encode_vevent(ev: WireVEvent) -> bytes:
    """binlogdata.VEvent: type=1, timestamp=2, statement=4, row_event=5,
    field_event=6, vgtid=7, current_time=20, keyspace=22, shard=23."""
    out = bytearray()
    _e_varint(out, 1, VEVENT_TYPE_TO_INT.get(ev.type, 0))
    _e_varint(out, 2, ev.timestamp)
    _e_str(out, 4, ev.statement)
    if ev.row_event is not None:
        _e_msg(out, 5, encode_row_event(ev.row_event), keep_empty=True)
    if ev.field_event is not None:
        _e_msg(out, 6, encode_field_event(ev.field_event), keep_empty=True)
    if ev.vgtid is not None:
        _e_msg(out, 7, encode_vgtid(ev.vgtid.shard_gtids), keep_empty=True)
    _e_varint(out, 20, ev.current_time)
    _e_str(out, 22, ev.keyspace)
    _e_str(out, 23, ev.shard)
    return bytes(out)


def decode_vevent(buf: bytes) -> WireVEvent:
    type_name = "UNKNOWN"
    timestamp = current_time = 0
    statement = None
    row_event = field_event = vgtid = None
    keyspace = shard = ""
    for field_no, wt, val in iter_fields(buf):
        if field_no == 1 and wt == _WT_VARINT:
            type_name = INT_TO_VEVENT_TYPE.get(int(val), "UNKNOWN")
        elif field_no == 2 and wt == _WT_VARINT:
            timestamp = int(val)
        elif field_no == 4 and wt == _WT_LEN:
            statement = bytes(val).decode("utf-8")
        elif field_no == 5 and wt == _WT_LEN:
            row_event = decode_row_event(bytes(val))
        elif field_no == 6 and wt == _WT_LEN:
            field_event = decode_field_event(bytes(val))
        elif field_no == 7 and wt == _WT_LEN:
            vgtid = decode_vgtid(bytes(val))
        elif field_no == 20 and wt == _WT_VARINT:
            current_time = int(val)
        elif field_no == 22 and wt == _WT_LEN:
            keyspace = bytes(val).decode("utf-8")
        elif field_no == 23 and wt == _WT_LEN:
            shard = bytes(val).decode("utf-8")
    return WireVEvent(
        type=type_name, timestamp=timestamp, current_time=current_time,
        row_event=row_event, field_event=field_event, vgtid=vgtid,
        statement=statement, keyspace=keyspace, shard=shard,
    )


# ---------------------------------------------------------------------------
# vtgate.proto messages — the RPC surface
# ---------------------------------------------------------------------------


def encode_vstream_flags(flags: VStreamFlags, *, heartbeat_interval_s: int = 0) -> bytes:
    """vtgate.VStreamFlags: minimize_skew=1, heartbeat_interval=2,
    stop_on_reshard=3, cells=4, cell_preference=5, tablet_order=6,
    stream_keyspace_heartbeats=7.

    BEST-EFFORT numbers (recent CDC-driven additions, not verifiable in this
    environment): exclude_keyspace_from_table_name=9, tables_to_copy=10.
    """
    out = bytearray()
    _e_varint(out, 2, heartbeat_interval_s or flags.heartbeat_interval_s)
    _e_varint(out, 3, 1 if flags.stop_on_reshard else 0)
    _e_varint(out, 7, 1 if flags.stream_keyspace_heartbeats else 0)
    _e_varint(out, 9, 1 if flags.exclude_keyspace_from_table_name else 0)
    for t in flags.tables_to_copy:
        _e_str(out, 10, t)
    return bytes(out)


def encode_vstream_request(req: VStreamRequest) -> bytes:
    """vtgate.VStreamRequest: tablet_type=2, vgtid=3, filter=4, flags=5
    (caller_id=1 unset). This is the ``request_serializer`` handed to
    ``grpc.Channel.unary_stream``."""
    out = bytearray()
    _e_varint(out, 2, TABLET_TYPE_TO_INT.get(req.tablet_type.upper(), 0))
    _e_msg(out, 3, encode_vgtid(req.vgtid.shard_gtids), keep_empty=True)
    if req.rules:
        _e_msg(out, 4, encode_filter(req.rules), keep_empty=True)
    fl = encode_vstream_flags(req.flags)
    if fl:
        _e_msg(out, 5, fl)
    return bytes(out)


def decode_vstream_request(buf: bytes) -> dict:
    """Request decode (fake-server side of tests): tablet_type + vgtid +
    rule (match, filter) pairs, enough to assert what a client sent."""
    out: dict = {"tablet_type": 0, "shard_gtids": [], "rules": []}
    for field_no, wt, val in iter_fields(buf):
        if field_no == 2 and wt == _WT_VARINT:
            out["tablet_type"] = int(val)
        elif field_no == 3 and wt == _WT_LEN:
            out["shard_gtids"] = list(decode_vgtid(bytes(val)).shard_gtids)
        elif field_no == 4 and wt == _WT_LEN:
            for f_no, f_wt, rv in iter_fields(bytes(val)):
                if f_no == 1 and f_wt == _WT_LEN:
                    match = filt = ""
                    for r_no, r_wt, x in iter_fields(bytes(rv)):
                        if r_wt != _WT_LEN:
                            continue
                        if r_no == 1:
                            match = bytes(x).decode("utf-8")
                        elif r_no == 2:
                            filt = bytes(x).decode("utf-8")
                    out["rules"].append((match, filt))
    return out


def encode_vstream_response(resp: VStreamResponse) -> bytes:
    """vtgate.VStreamResponse: repeated binlogdata.VEvent events = 1."""
    out = bytearray()
    for ev in resp.events:
        _e_msg(out, 1, encode_vevent(ev), keep_empty=True)
    return bytes(out)


def decode_vstream_response(buf: bytes) -> VStreamResponse:
    """The ``response_deserializer`` handed to ``grpc.Channel.unary_stream``:
    raw frame bytes → the VStreamResponse dataclass the transport's
    observer/decoder machine consumes."""
    events = [
        decode_vevent(bytes(val))
        for field_no, wt, val in iter_fields(buf)
        if field_no == 1 and wt == _WT_LEN
    ]
    return VStreamResponse(events=tuple(events))
