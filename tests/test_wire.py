"""Protobuf-shaped wire layer: packed-row decode, response state machine,
fake-channel transport (S1/D3).

Mirrors the reference's decoder/connection unit strategy: fabricated VEvents
driven through the state machine without a database
(VStreamOutputMessageDecoderTest.java:61-663,
VitessReplicationConnectionIT buffering semantics re-expressed offline).
"""

from __future__ import annotations

import pytest

from debezium_connector_vitess_spark.sources.vstream import (
    VStreamConfig,
    VStreamRule,
)
from debezium_connector_vitess_spark.sources.wire import (
    FakeChannel,
    ReshardDetectedError,
    VStreamObserver,
    VStreamResponse,
    VStreamTransport,
    WireDecoder,
    WireField,
    WireFieldEvent,
    WireRow,
    WireRowChange,
    WireRowEvent,
    WireVEvent,
    WireVgtid,
    build_request,
    cell_to_transport_str,
    decode_flush,
    pack_row,
    unpack_row,
    vevent_from_json,
    vevent_to_json,
)
from debezium_connector_vitess_spark.vgtid import ShardGtid, Vgtid

# the reference's canonical 4-column test row (TestHelper.defaultColumnValues:
# bool_col INT8 "1", int_col INT32 NULL, long_col INT32 "23",
# string_col VARBINARY "test")
CELLS = [b"1", None, b"23", b"test"]
FIELDS = (
    WireField("bool_col", "INT8", "tinyint(1)", 0),
    WireField("int_col", "INT32", "int(11)", 0),
    WireField("long_col", "INT32", "int(11)", 0),
    WireField("string_col", "VARBINARY", "varbinary(256)", 0),
)


def field_event(table="ks.t1", shard="0", **kw):
    return WireFieldEvent(table_name=table, fields=FIELDS, keyspace="ks", shard=shard, **kw)


def row_event(table="ks.t1", shard="0", before=None, after=None):
    return WireRowEvent(
        table_name=table,
        shard=shard,
        keyspace="ks",
        row_changes=(WireRowChange(before=before, after=after),),
    )


def vgtid_event(gtid="MySQL56/host0:1-10", shard="0", keyspace="ks"):
    return WireVEvent(
        "VGTID", vgtid=WireVgtid(shard_gtids=(ShardGtid(keyspace, shard, gtid),))
    )


class TestPackedRow:
    def test_pack_unpack_round_trip(self):
        row = pack_row(CELLS)
        assert row.lengths == (1, -1, 2, 4)
        assert row.values == b"123test"
        assert unpack_row(row, 4) == CELLS

    def test_null_only_row(self):
        row = pack_row([None, None])
        assert row.lengths == (-1, -1) and row.values == b""
        assert unpack_row(row, 2) == [None, None]

    def test_column_count_mismatch_raises(self):
        # shouldThrowExceptionWithDetailedMessageOnRowSchemaMismatch (:506)
        row = pack_row(CELLS)
        with pytest.raises(ValueError, match="number of columns in the ROW event"):
            unpack_row(row, 3)

    def test_truncated_values_raises(self):
        with pytest.raises(ValueError, match="truncated"):
            unpack_row(WireRow(lengths=(5,), values=b"ab"), 1)

    def test_trailing_bytes_raises(self):
        with pytest.raises(ValueError, match="trailing"):
            unpack_row(WireRow(lengths=(1,), values=b"abc"), 1)

    def test_binary_family_base64(self):
        assert cell_to_transport_str(b"\x00\xff", "BLOB") == "AP8="
        assert cell_to_transport_str(b"abc", "VARCHAR") == "abc"
        assert cell_to_transport_str(None, "BLOB") is None


class TestWireDecoder:
    def test_field_then_row(self):
        # shouldProcessFieldEvent (:276) + row decode
        dec = WireDecoder()
        dec.apply_field_event(field_event())
        img = dec.decode_row_image("0", "ks", "t1", pack_row(CELLS))
        # VARBINARY is a binary-family column: the transport base64-encodes it
        # and the typed decode layer (convert_raw) restores the bytes
        assert img == {
            "bool_col": "1",
            "int_col": None,
            "long_col": "23",
            "string_col": "dGVzdA==",
        }

    def test_row_before_field_raises(self):
        dec = WireDecoder()
        with pytest.raises(ValueError, match="before its FIELD event"):
            dec.decode_row_image("0", "ks", "t1", pack_row(CELLS))

    def test_exclude_keyspace_from_table_name(self):
        # shouldProcessFieldEventExcludeKeyspaceFromTableName (:248)
        dec = WireDecoder("ks", exclude_keyspace_from_table_name=True)
        dec.apply_field_event(field_event(table="t1"))
        assert dec.registry.get("ks", "0", "t1") is not None
        img = dec.decode_row_image("0", "ks", "t1", pack_row(CELLS))
        assert img["long_col"] == "23"

    def test_unqualified_name_without_flag_raises(self):
        dec = WireDecoder("ks")
        with pytest.raises(ValueError, match="keyspace-qualified"):
            dec.apply_field_event(field_event(table="t1"))

    def test_schema_evolution_per_shard(self):
        # shouldHandleAddColumnPerShard / RemoveColumnPerShard (:336,:421)
        dec = WireDecoder()
        dec.apply_field_event(field_event(shard="-80"))
        dec.apply_field_event(field_event(shard="80-"))
        extra = FIELDS + (WireField("new_col", "VARCHAR", "varchar(10)", 0),)
        dec.apply_field_event(
            WireFieldEvent(table_name="ks.t1", fields=extra, keyspace="ks", shard="-80")
        )
        # shard -80 now has 5 columns, shard 80- still 4
        five = dec.decode_row_image("-80", "ks", "t1", pack_row(CELLS + [b"x"]))
        four = dec.decode_row_image("80-", "ks", "t1", pack_row(CELLS))
        assert five["new_col"] == "x" and len(four) == 4
        with pytest.raises(ValueError, match="number of columns"):
            dec.decode_row_image("-80", "ks", "t1", pack_row(CELLS))

    def test_binary_column_base64_in_image(self):
        fields = (WireField("b", "BLOB", "blob", 0),)
        dec = WireDecoder()
        dec.apply_field_event(
            WireFieldEvent(table_name="ks.t1", fields=fields, keyspace="ks", shard="0")
        )
        img = dec.decode_row_image("0", "ks", "t1", pack_row([b"\x01\x02"]))
        assert img == {"b": "AQI="}


class TestObserver:
    def _tx(self, *mid):
        return [
            WireVEvent("BEGIN"),
            *mid,
            vgtid_event(),
            WireVEvent("COMMIT"),
        ]

    def test_complete_tx_flushes(self):
        obs = VStreamObserver()
        ev = self._tx(WireVEvent("ROW", row_event=row_event(after=pack_row(CELLS))))
        flushes = obs.on_response(VStreamResponse(events=tuple(ev)))
        assert len(flushes) == 1
        assert [e.type for e in flushes[0].events] == ["BEGIN", "ROW", "VGTID", "COMMIT"]
        assert flushes[0].vgtid.shard_gtids[0].gtid == "MySQL56/host0:1-10"
        assert obs.pending == 0

    def test_tx_spanning_responses_buffers(self):
        obs = VStreamObserver()
        assert obs.on_response(VStreamResponse(events=(WireVEvent("BEGIN"),))) == []
        assert obs.pending == 1
        row = WireVEvent("ROW", row_event=row_event(after=pack_row(CELLS)))
        assert obs.on_response(VStreamResponse(events=(row,))) == []
        flushes = obs.on_response(
            VStreamResponse(events=(vgtid_event(), WireVEvent("COMMIT")))
        )
        assert len(flushes) == 1 and len(flushes[0].events) == 4

    def test_commit_before_begin_raises(self):
        obs = VStreamObserver()
        with pytest.raises(ValueError, match="COMMIT event before receiving BEGIN"):
            obs.on_response(VStreamResponse(events=(WireVEvent("COMMIT"),)))

    def test_duplicate_commit_raises(self):
        obs = VStreamObserver()
        obs.on_response(VStreamResponse(events=(WireVEvent("BEGIN"),)))
        with pytest.raises(ValueError, match="duplicate COMMIT"):
            obs.on_response(
                VStreamResponse(events=(WireVEvent("COMMIT"), WireVEvent("COMMIT")))
            )

    def test_copy_phase_duplicate_begin_resets(self):
        # reference: BEGIN,FIELD then duplicate BEGIN is a harmless copy quirk
        obs = VStreamObserver(is_in_vstream_copy=True)
        obs.on_response(
            VStreamResponse(
                events=(WireVEvent("BEGIN"), WireVEvent("FIELD", field_event=field_event()))
            )
        )
        flushes = obs.on_response(
            VStreamResponse(
                events=(WireVEvent("BEGIN"), vgtid_event(), WireVEvent("COMMIT"))
            )
        )
        assert len(flushes) == 1
        assert [e.type for e in flushes[0].events] == ["BEGIN", "VGTID", "COMMIT"]

    def test_duplicate_begin_outside_copy_shape_raises(self):
        obs = VStreamObserver()
        obs.on_response(
            VStreamResponse(
                events=(
                    WireVEvent("BEGIN"),
                    WireVEvent("ROW", row_event=row_event(after=pack_row(CELLS))),
                )
            )
        )
        with pytest.raises(ValueError, match="duplicate BEGIN"):
            obs.on_response(VStreamResponse(events=(WireVEvent("BEGIN"),)))

    def test_ddl_sends_now(self):
        # shouldProcessDdlEvent (:199): DDL outside a tx flushes immediately
        obs = VStreamObserver()
        flushes = obs.on_response(
            VStreamResponse(
                events=(vgtid_event(), WireVEvent("DDL", statement="ALTER TABLE t1 ADD c int"))
            )
        )
        assert len(flushes) == 1
        assert flushes[0].events[-1].statement == "ALTER TABLE t1 ADD c int"

    def test_heartbeat_without_vgtid_still_flushes(self):
        # shouldProcessHeartbeatEvent (:91)
        obs = VStreamObserver()
        flushes = obs.on_response(VStreamResponse(events=(WireVEvent("HEARTBEAT"),)))
        assert len(flushes) == 1 and flushes[0].vgtid is None

    def test_no_vgtid_group_skipped(self):
        # shouldNotProcessBeginEventIfNoVgtid (:119) — group without a
        # position is dropped, not emitted
        obs = VStreamObserver()
        flushes = obs.on_response(
            VStreamResponse(events=(WireVEvent("BEGIN"), WireVEvent("COMMIT")))
        )
        assert flushes == [] and obs.pending == 0

    def test_latest_vgtid_wins(self):
        obs = VStreamObserver()
        flushes = obs.on_response(
            VStreamResponse(
                events=(
                    WireVEvent("BEGIN"),
                    vgtid_event("MySQL56/host0:1-5"),
                    vgtid_event("MySQL56/host0:1-9"),
                    WireVEvent("COMMIT"),
                )
            )
        )
        assert flushes[0].vgtid.shard_gtids[0].gtid == "MySQL56/host0:1-9"

    def test_row_events_get_commit_timestamp(self):
        """shouldSetRowEventsToCommitTimestamp: ROW rows carry the tx COMMIT's
        timestamp; BEGIN keeps its own (VitessReplicationConnection.java:204)."""
        dec = WireDecoder()
        dec.apply_field_event(field_event())
        obs = VStreamObserver()
        flushes = obs.on_response(
            VStreamResponse(
                events=(
                    WireVEvent("BEGIN", timestamp=1),
                    WireVEvent("ROW", timestamp=1, row_event=row_event(after=pack_row(CELLS))),
                    vgtid_event(),
                    WireVEvent("COMMIT", timestamp=2),
                )
            )
        )
        rows = list(decode_flush(dec, flushes[0]))
        by_kind = {r["kind"]: r for r in rows}
        assert by_kind["ROW"]["ts"].timestamp() == 2
        assert by_kind["BEGIN"]["ts"].timestamp() == 1
        assert by_kind["COMMIT"]["ts"].timestamp() == 2

    def test_send_now_events_keep_own_timestamp(self):
        """shouldSetOtherEventsToEventTimestamp: DDL/OTHER groups (no COMMIT)
        are stamped with their own event timestamp."""
        dec = WireDecoder()
        obs = VStreamObserver()
        flushes = obs.on_response(
            VStreamResponse(
                events=(
                    vgtid_event(),
                    WireVEvent("OTHER", timestamp=1),
                )
            )
        )
        rows = list(decode_flush(dec, flushes[0]))
        assert rows[0]["kind"] == "OTHER" and rows[0]["ts"].timestamp() == 1


class TestSerde:
    def test_round_trip(self):
        ev = WireVEvent(
            "ROW",
            timestamp=1700000000,
            current_time=1700000000123456789,
            row_event=row_event(before=pack_row([None, b"x"]), after=pack_row(CELLS[:2])),
        )
        back = vevent_from_json(vevent_to_json(ev))
        assert back == ev

    def test_field_and_vgtid_round_trip(self):
        for ev in (
            WireVEvent("FIELD", field_event=field_event(enum_set_string_values=True)),
            vgtid_event(),
            WireVEvent("DDL", statement="ALTER TABLE x", keyspace="ks", shard="0"),
        ):
            assert vevent_from_json(vevent_to_json(ev)) == ev


class TestTransport:
    def _config(self, **kw):
        return VStreamConfig(
            keyspace="ks",
            shards=["-80", "80-"],
            snapshot_mode="never",
            **kw,
        )

    def _responses(self):
        return [
            VStreamResponse(
                events=(
                    WireVEvent("BEGIN"),
                    WireVEvent("FIELD", field_event=field_event(shard="-80")),
                    WireVEvent(
                        "ROW",
                        row_event=row_event(shard="-80", after=pack_row(CELLS)),
                    ),
                    vgtid_event(shard="-80"),
                    WireVEvent("COMMIT"),
                )
            )
        ]

    def test_request_build_carries_flags_rules_position(self):
        # VitessReplicationConnection.java:302-343
        chan = FakeChannel(self._responses())
        config = self._config(stop_on_reshard=True)
        rules = (VStreamRule(match="t1", filter="select * from t1"),)
        transport = VStreamTransport(chan, config, rules=rules)
        list(transport.events())
        assert len(chan.requests) == 1
        req = chan.requests[0]
        assert req.flags.stop_on_reshard is True
        assert req.rules == rules
        assert req.vgtid.shards == ["-80", "80-"]
        assert all(sg.gtid == "current" for sg in req.vgtid.shard_gtids)

    def test_events_decoded_through_packed_path(self):
        chan = FakeChannel(self._responses())
        transport = VStreamTransport(chan, self._config())
        out = list(transport.events())
        rows = [e for e in out if e["kind"] == "ROW"]
        assert len(rows) == 1
        before, after = rows[0]["row_changes"][0]
        assert before is None
        assert after == {
            "bool_col": "1",
            "int_col": None,
            "long_col": "23",
            "string_col": "dGVzdA==",
        }
        assert rows[0]["gtid"] == "MySQL56/host0:1-10"
        assert rows[0]["tx_id"] if "tx_id" in rows[0] else rows[0]["vgtid"]

    def test_stop_on_reshard_raises(self):
        # O7 + VitessConnectorConfig.java:314-321: new shard set mid-stream
        responses = self._responses() + [
            VStreamResponse(
                events=(
                    WireVEvent("BEGIN"),
                    WireVEvent(
                        "VGTID",
                        vgtid=WireVgtid(
                            shard_gtids=(
                                ShardGtid("ks", "-40", "MySQL56/host0:1-11"),
                                ShardGtid("ks", "40-80", "MySQL56/host0:1-11"),
                            )
                        ),
                    ),
                    WireVEvent("COMMIT"),
                )
            )
        ]
        transport = VStreamTransport(
            FakeChannel(responses), self._config(stop_on_reshard=True)
        )
        with pytest.raises(ReshardDetectedError, match="shard set changed"):
            list(transport.events())
        # without the flag the same stream is fine
        transport = VStreamTransport(FakeChannel(responses), self._config())
        assert len(list(transport.events())) > 0

    def test_stream_ending_mid_tx_raises(self):
        responses = [VStreamResponse(events=(WireVEvent("BEGIN"),))]
        transport = VStreamTransport(FakeChannel(responses), self._config())
        with pytest.raises(ValueError, match="mid-transaction"):
            list(transport.events())

    def test_exclude_keyspace_from_table_name(self):
        responses = [
            VStreamResponse(
                events=(
                    WireVEvent("BEGIN"),
                    WireVEvent("FIELD", field_event=field_event(table="t1", shard="-80")),
                    WireVEvent(
                        "ROW",
                        row_event=row_event(table="t1", shard="-80", after=pack_row(CELLS)),
                    ),
                    vgtid_event(shard="-80"),
                    WireVEvent("COMMIT"),
                )
            )
        ]
        config = self._config(exclude_keyspace_from_table_name=True)
        transport = VStreamTransport(FakeChannel(responses), config)
        rows = [e for e in list(transport.events()) if e["kind"] == "ROW"]
        # unqualified wire name resolved against the configured keyspace
        assert rows[0]["keyspace"] == "ks" and rows[0]["table"] == "t1"

    def test_initial_snapshot_request_is_copy(self):
        config = VStreamConfig(keyspace="ks", shards=["0"], snapshot_mode="initial")
        req = build_request(config)
        assert req.vgtid.is_initial()


# ---------------------------------------------------------------------------
# Spark-level: wire-format replay (packed-row path end to end) + replay-source
# reshard enforcement
# ---------------------------------------------------------------------------


@pytest.fixture()
def wire_dir(tmp_path, sf_dir):
    from debezium_connector_vitess_spark.sources.fixtures import (
        write_wire_replay_fixture,
    )

    d = str(tmp_path / "wire")
    write_wire_replay_fixture(sf_dir, d, tx_size=10)
    return d


def _run_stream(spark, df, name, checkpoint):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_wire_replay_end_to_end(spark, wire_dir, tmp_path):
    """Recorded packed-row stream → response machine → decoded envelope rows
    match the plain (map-based) decode of the same model."""
    from debezium_connector_vitess_spark.sources.replay import register

    register(spark)
    raw = (
        spark.readStream.format("vitess-replay")
        .option("path", wire_dir)
        .option("wireFormat", "true")
        .load()
    )
    out = _run_stream(spark, raw, "wire_e2e", str(tmp_path / "ck"))
    rows = out.filter(out.event_kind == "ROW")
    fields = out.filter(out.event_kind == "FIELD")
    assert fields.count() == 12  # 3 tables × 4 shards
    n = rows.count()
    assert n > 0
    # every row change decoded from packed bytes into the map image
    sample = rows.limit(5).collect()
    for r in sample:
        for before, after in r.row_changes:
            img = after or before
            assert set(img.keys()) == {"user_id", "value", "props"}
    # gtid is the commit position, shared by all events of the transaction
    assert rows.filter(rows.gtid.isNull()).count() == 0


def test_wire_replay_restart_resumes_on_boundary(spark, sf_dir, tmp_path):
    """Kill the stream, grow the recorded wire stream, restart from the same
    checkpoint: the resumed partitions start mid-file, so the decoder must
    re-prime its FIELD-derived schema from the prefix (the live source
    re-receives FIELDs on reconnect) and every ROW appears exactly once
    (O1/O2 through the packed-row path)."""
    from debezium_connector_vitess_spark.sources.fixtures import (
        write_wire_replay_fixture,
    )
    from debezium_connector_vitess_spark.sources.replay import register

    register(spark)
    d = str(tmp_path / "wire_grow")
    ck = str(tmp_path / "ck2")
    out = str(tmp_path / "out2")
    write_wire_replay_fixture(sf_dir, d, tx_size=10, limit=120)

    def run_once():
        df = (
            spark.readStream.format("vitess-replay")
            .option("path", d)
            .option("wireFormat", "true")
            .load()
        )
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n1 = spark.read.parquet(out).filter("event_kind='ROW'").count()
    assert n1 == 120

    # stream grows while stopped; restart resumes from checkpointed offset,
    # mid-file — the second window carries no FIELD events of its own
    write_wire_replay_fixture(sf_dir, d, tx_size=10, limit=120, start_event=120)
    run_once()
    rows = spark.read.parquet(out).filter("event_kind='ROW'")
    assert rows.count() == 240  # no loss, no duplication
    # decoded images still carry the full schema learned before the restart
    sample = rows.orderBy(rows.gtid.desc()).limit(3).collect()
    for r in sample:
        for before, after in r.row_changes:
            assert set((after or before).keys()) == {"user_id", "value", "props"}


def test_replay_stop_on_reshard(spark, tmp_path):
    """O7 client-side: a new shard file appearing mid-stream raises when
    stopOnReshard is set, and is absorbed when it is not."""
    import json
    import os

    from debezium_connector_vitess_spark.sources.replay import (
        VitessReplayStreamReader,
    )
    from debezium_connector_vitess_spark.sources.wire import ReshardDetectedError

    d = str(tmp_path / "reshard")
    os.makedirs(d)

    def tx(seq):
        return [
            {"kind": "BEGIN", "keyspace": "ks", "seq": seq},
            {"kind": "ROW", "keyspace": "ks", "table": "t", "seq": seq,
             "row_changes": [{"after": {"id": "1"}}]},
            {"kind": "COMMIT", "keyspace": "ks", "seq": seq},
        ]

    with open(os.path.join(d, "-80.jsonl"), "w") as fh:
        for e in tx(1):
            fh.write(json.dumps(e) + "\n")

    reader = VitessReplayStreamReader({"path": d, "stoponreshard": "true"})
    reader.initialOffset()
    reader.latestOffset()  # same shard set: fine
    with open(os.path.join(d, "80-.jsonl"), "w") as fh:
        for e in tx(2):
            fh.write(json.dumps(e) + "\n")
    with pytest.raises(ReshardDetectedError, match="shard set changed"):
        reader.latestOffset()

    # without the flag, the new shard is picked up (reshard-transparent, O7)
    reader2 = VitessReplayStreamReader({"path": d})
    reader2.initialOffset()
    off = reader2.latestOffset()
    assert set(off) == {"-80", "80-"}


def test_request_tablet_type_and_headers():
    """Request parity: tablet type + gRPC ASCII metadata travel on the
    request (VitessReplicationConnection.java:116-126,336-338)."""
    config = VStreamConfig(
        keyspace="ks",
        shards=["0"],
        snapshot_mode="never",
        tablet_type="replica",
        grpc_headers={"x-user": "cdc", "x-team": "data"},
    )
    req = build_request(config)
    assert req.tablet_type == "REPLICA"
    assert req.headers == (("x-team", "data"), ("x-user", "cdc"))
    with pytest.raises(ValueError, match="tablet_type"):
        VStreamConfig(keyspace="ks", shards=["0"], tablet_type="PRIMARYISH")


def test_field_event_rejects_anonymized_columns():
    """D5 through the wire path: Vitess schema-reload anonymization (@1, @2)
    must fail fast, not silently produce unusable schemas
    (VStreamOutputMessageDecoder.java:456-470)."""
    dec = WireDecoder()
    bad = field_event()
    bad = WireFieldEvent(
        table_name=bad.table_name,
        fields=(WireField("@1", "INT64", "bigint(20)", 0),),
        keyspace=bad.keyspace,
        shard=bad.shard,
    )
    with pytest.raises(ValueError, match="@"):
        dec.apply_field_event(bad)
