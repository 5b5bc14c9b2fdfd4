"""Protobuf wire codec + gRPC adapter tests.

The codec is exercised at the BYTE level: hand-computed golden frames,
encode→decode round-trips (including hypothesis-generated packed rows), and
unknown-field skipping. The adapter test drives VStreamTransport through a
fake grpc.Channel whose unary_stream round-trips real serialized frames —
the entire live path minus the socket. A real-channel construction test runs
only where grpcio is installed.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from debezium_connector_vitess_spark.sources import proto as P
from debezium_connector_vitess_spark.sources.grpc_adapter import (
    HAVE_GRPC,
    VSTREAM_METHOD,
    GrpcVStreamChannel,
    channel_options,
)
from debezium_connector_vitess_spark.sources.vstream import (
    VStreamConfig,
    VStreamFlags,
    VStreamRule,
)
from debezium_connector_vitess_spark.sources.wire import (
    VStreamRequest,
    VStreamResponse,
    VStreamTransport,
    WireField,
    WireFieldEvent,
    WireRow,
    WireRowChange,
    WireRowEvent,
    WireVEvent,
    WireVgtid,
    pack_row,
)
from debezium_connector_vitess_spark.vgtid import ShardGtid, TableLastPK, Vgtid


class TestPrimitives:
    def test_varint_golden(self):
        assert P.encode_varint(0) == b"\x00"
        assert P.encode_varint(1) == b"\x01"
        assert P.encode_varint(300) == b"\xac\x02"
        # negative ints are 10-byte two's-complement varints
        assert len(P.encode_varint(-1)) == 10

    @given(st.integers(min_value=0, max_value=(1 << 64) - 1))
    @settings(max_examples=200)
    def test_varint_roundtrip(self, n):
        val, pos = P.decode_varint(P.encode_varint(n), 0)
        assert val == n and pos == len(P.encode_varint(n))

    @given(st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1))
    @settings(max_examples=200)
    def test_zigzag_roundtrip(self, n):
        assert P.zigzag_decode(P.zigzag_encode(n) & ((1 << 64) - 1)) == n

    def test_zigzag_golden(self):
        # protobuf spec examples
        assert P.zigzag_encode(0) == 0
        assert P.zigzag_encode(-1) == 1
        assert P.zigzag_encode(1) == 2
        assert P.zigzag_encode(-2) == 3


class TestQueryRow:
    def test_row_golden_bytes(self):
        # query.Row { lengths: [2, -1, 1] (packed sint64 zigzag), values: "abc" }
        row = WireRow(lengths=(2, -1, 1), values=b"abc")
        got = P.encode_row(row)
        # field 1 wt2: tag 0x0A, len 3, zigzag(2)=4, zigzag(-1)=1, zigzag(1)=2
        # field 2 wt2: tag 0x12, len 3, "abc"
        assert got == b"\x0a\x03\x04\x01\x02\x12\x03abc"
        assert P.decode_row(got) == row

    def test_unpacked_lengths_accepted(self):
        # same row with lengths as unpacked varints (wire type 0) — old
        # serializers may emit this; decoder must accept it
        unpacked = b"\x08\x04\x08\x01\x08\x02\x12\x03abc"
        assert P.decode_row(unpacked) == WireRow(lengths=(2, -1, 1), values=b"abc")

    @given(
        st.lists(
            st.one_of(st.none(), st.binary(max_size=20)), min_size=0, max_size=8
        )
    )
    @settings(max_examples=100)
    def test_packed_row_roundtrip(self, cells):
        row = pack_row(cells)
        assert P.decode_row(P.encode_row(row)) == row


def _sample_events() -> list[WireVEvent]:
    fields = (
        WireField("id", "INT64", "bigint(20)", 3),
        WireField("name", "VARCHAR", "varchar(64)", 0),
        WireField("tags", "SET", "set('a','b')", 0),
    )
    return [
        WireVEvent("BEGIN", timestamp=1700000001, keyspace="ks", shard="-80"),
        WireVEvent(
            "FIELD",
            current_time=1700000001_000_000_000,
            field_event=WireFieldEvent(
                table_name="ks.t1", fields=fields, keyspace="ks", shard="-80",
                enum_set_string_values=True,
            ),
        ),
        WireVEvent(
            "ROW",
            timestamp=1700000002,
            row_event=WireRowEvent(
                table_name="ks.t1",
                row_changes=(
                    WireRowChange(after=pack_row([b"7", b"bob", None])),
                    WireRowChange(
                        before=pack_row([b"8", None, b"a,b"]),
                        after=pack_row([b"8", b"ann", b"a"]),
                    ),
                ),
                keyspace="ks",
                shard="-80",
            ),
        ),
        WireVEvent(
            "VGTID",
            vgtid=WireVgtid(
                shard_gtids=(
                    ShardGtid("ks", "-80", "MySQL56/host0:1-42"),
                    ShardGtid(
                        "ks", "80-", "MySQL56/host0:1-40",
                        (TableLastPK(
                            table_name="t1",
                            lastpk={"fields": [{"name": "id", "type": "INT64"}],
                                    "rows": ["7"]},
                        ),),
                    ),
                )
            ),
        ),
        WireVEvent("DDL", timestamp=1700000003, statement="ALTER TABLE t1 ADD c INT"),
        WireVEvent("COMMIT", timestamp=1700000002, keyspace="ks", shard="-80"),
        WireVEvent("COPY_COMPLETED", keyspace="ks", shard="-80"),
        WireVEvent("HEARTBEAT", current_time=1700000004_000_000_000),
    ]


class TestMessages:
    @pytest.mark.parametrize("ev", _sample_events(), ids=lambda e: e.type)
    def test_vevent_roundtrip(self, ev):
        assert P.decode_vevent(P.encode_vevent(ev)) == ev

    def test_response_roundtrip(self):
        resp = VStreamResponse(events=tuple(_sample_events()))
        assert P.decode_vstream_response(P.encode_vstream_response(resp)) == resp

    def test_unknown_fields_skipped(self):
        # a newer server may add fields; decoder must skip every wire type
        base = P.encode_vevent(WireVEvent("BEGIN", timestamp=5))
        unknown = (
            P._tag(99, 0) + P.encode_varint(7)          # varint
            + P._tag(98, 2) + b"\x03xyz"                # length-delimited
            + P._tag(97, 1) + b"\x01\x02\x03\x04\x05\x06\x07\x08"  # fixed64
            + P._tag(96, 5) + b"\x01\x02\x03\x04"       # fixed32
        )
        ev = P.decode_vevent(base + unknown)
        assert ev.type == "BEGIN" and ev.timestamp == 5

    def test_rule_golden_bytes(self):
        got = P.encode_rule(VStreamRule(match="t1", filter="select * from t1"))
        assert got == b"\x0a\x02t1\x12\x10select * from t1"

    def test_request_roundtrip_via_fake_server_decode(self):
        req = VStreamRequest(
            vgtid=Vgtid.of(
                ShardGtid("ks", "-80", "MySQL56/host0:1-10"),
                ShardGtid("ks", "80-", "current"),
            ),
            tablet_type="MASTER",
            rules=(VStreamRule("t1", "select * from t1"),),
            flags=VStreamFlags(stop_on_reshard=True, tables_to_copy=("t1",)),
        )
        seen = P.decode_vstream_request(P.encode_vstream_request(req))
        assert seen["tablet_type"] == P.TABLET_TYPE_TO_INT["MASTER"] == 1
        assert [(sg.shard, sg.gtid) for sg in seen["shard_gtids"]] == [
            ("-80", "MySQL56/host0:1-10"), ("80-", "current"),
        ]
        assert seen["rules"] == [("t1", "select * from t1")]

    def test_query_type_enum_values(self):
        # spot-check the flag formula against the public query.proto values
        assert P.QUERY_TYPE_TO_INT["INT8"] == 257
        assert P.QUERY_TYPE_TO_INT["UINT64"] == 778
        assert P.QUERY_TYPE_TO_INT["FLOAT64"] == 1036
        assert P.QUERY_TYPE_TO_INT["VARCHAR"] == 6165
        assert P.QUERY_TYPE_TO_INT["VARBINARY"] == 10262
        assert P.QUERY_TYPE_TO_INT["JSON"] == 2078
        assert P.QUERY_TYPE_TO_INT["DECIMAL"] == 18


class FakeGrpcChannel:
    """grpc.Channel-shaped fake operating on REAL serialized bytes: the
    serializer runs on the request, the deserializer on pre-encoded response
    frames — everything between the adapter and the socket is exercised."""

    def __init__(self, response_frames: list[bytes]) -> None:
        self._frames = response_frames
        self.requests: list[bytes] = []
        self.method = None
        self.metadata = None

    def unary_stream(self, method, request_serializer=None, response_deserializer=None):
        self.method = method

        def call(request, metadata=None, **_kwargs):
            self.metadata = metadata
            raw = request_serializer(request)
            assert isinstance(raw, bytes)
            self.requests.append(raw)
            for frame in self._frames:
                yield response_deserializer(frame)

        return call


class TestGrpcAdapter:
    def _frames(self) -> list[bytes]:
        evs = _sample_events()
        # one response per tx phase: [BEGIN, FIELD, ROW], [VGTID, COMMIT]
        return [
            P.encode_vstream_response(VStreamResponse(events=tuple(evs[0:3]))),
            P.encode_vstream_response(VStreamResponse(events=(evs[3], evs[5]))),
        ]

    def _config(self) -> VStreamConfig:
        return VStreamConfig(
            vtgate_host="vtgate:15991", keyspace="ks", shards=["-80", "80-"],
            snapshot_mode="never", grpc_headers={"x-auth": "tok"},
        )

    def test_transport_end_to_end_over_bytes(self):
        fake = FakeGrpcChannel(self._frames())
        channel = GrpcVStreamChannel(self._config(), grpc_channel=fake)
        transport = VStreamTransport(channel, self._config())
        flushes = list(transport.flushes())
        assert fake.method == VSTREAM_METHOD
        assert fake.metadata == [("x-auth", "tok")]
        # the request really crossed the wire as protobuf bytes
        sent = P.decode_vstream_request(fake.requests[0])
        assert {sg.shard for sg in sent["shard_gtids"]} == {"-80", "80-"}
        # one completed transaction flushed, rows decoded via FIELD schema
        assert len(flushes) == 1
        rows, vgtid = flushes[0]
        row_dicts = [d for d in rows if d["kind"] == "ROW"]
        assert len(row_dicts) == 1
        changes = row_dicts[0]["row_changes"]
        assert len(changes) == 2
        assert changes[0][1] == {"id": "7", "name": "bob", "tags": None}
        assert changes[1][0] == {"id": "8", "name": None, "tags": "a,b"}
        assert {sg.shard for sg in vgtid.shard_gtids} == {"-80", "80-"}
        # copy-phase lastpk survived the proto round-trip
        tpk = next(sg for sg in vgtid.shard_gtids if sg.shard == "80-").table_p_ks[0]
        assert tpk.table_name == "t1" and tpk.lastpk["rows"] == ["7"]

    def test_close_delegates(self):
        class Closeable(FakeGrpcChannel):
            def __init__(self):
                super().__init__([])
                self.closed = False

            def close(self):
                self.closed = True

        ch = Closeable()
        GrpcVStreamChannel(self._config(), grpc_channel=ch).close()
        assert ch.closed

    def test_channel_options_mirror_reference_tuning(self):
        cfg = VStreamConfig(max_inbound_message_bytes=8 << 20, keepalive_interval_ms=5000)
        opts = dict(channel_options(cfg))
        assert opts["grpc.max_receive_message_length"] == 8 << 20
        assert opts["grpc.keepalive_time_ms"] == 5000
        cfg2 = VStreamConfig()
        assert "grpc.keepalive_time_ms" not in dict(channel_options(cfg2))
        assert "grpc.lb_policy_name" not in dict(channel_options(cfg2))
        cfg3 = VStreamConfig(load_balancing_policy="round_robin")
        assert dict(channel_options(cfg3))["grpc.lb_policy_name"] == "round_robin"

    @pytest.mark.skipif(not HAVE_GRPC, reason="grpcio not installed")
    def test_real_channel_construction(self):  # pragma: no cover
        channel = GrpcVStreamChannel(self._config())
        channel.close()

    def test_without_grpcio_raises_guidance(self):
        if HAVE_GRPC:  # pragma: no cover
            pytest.skip("grpcio installed")
        with pytest.raises(NotImplementedError, match="grpcio"):
            GrpcVStreamChannel(self._config())


class TestFuzz:
    @given(st.binary(max_size=200))
    @settings(max_examples=300)
    def test_decode_arbitrary_bytes_never_hangs(self, data):
        """Garbage frames either decode to SOME response or raise ValueError /
        UnicodeDecodeError — never hang, crash the interpreter, or leak other
        exception types (a malicious/corrupt server frame fails the batch
        cleanly and Spark's retry takes over)."""
        try:
            P.decode_vstream_response(data)
        except (ValueError, UnicodeDecodeError):
            pass

    @given(st.binary(max_size=100))
    @settings(max_examples=200)
    def test_roundtrip_after_successful_decode(self, data):
        """Any frame that DOES decode re-encodes to something that decodes to
        the same response (the codec subset is self-consistent)."""
        try:
            resp = P.decode_vstream_response(data)
        except (ValueError, UnicodeDecodeError):
            return
        assert P.decode_vstream_response(P.encode_vstream_response(resp)) == resp
