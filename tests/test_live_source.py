"""Live vitess-cdc source: VGTID offsets end to end over a recorded wire
stream (S1 proper — request/resume → responses → buffer → packed decode)."""

from __future__ import annotations

import json
import os

import pytest

from debezium_connector_vitess_spark.sources.fixtures import write_wire_replay_fixture
from debezium_connector_vitess_spark.sources.live import VitessCdcSimpleStreamReader
from debezium_connector_vitess_spark.sources.wire import jsonl_channel_factory
from debezium_connector_vitess_spark.vgtid import Vgtid

FACTORY = "debezium_connector_vitess_spark.sources.wire:jsonl_channel_factory"


@pytest.fixture()
def wire_dir(tmp_path, sf_dir):
    d = str(tmp_path / "wire")
    write_wire_replay_fixture(sf_dir, d, tx_size=10, limit=200)
    return d


def _reader(wire_dir, **extra):
    opts = {
        "keyspace": "ks0",
        "shards": "-40,40-80,80-c0,c0-",
        "snapshotmode": "never",
        "channelfactory": FACTORY,
        "path": wire_dir,
    }
    opts.update(extra)
    return VitessCdcSimpleStreamReader(opts)


class TestReaderContract:
    def test_initial_offset_is_vgtid(self, wire_dir):
        r = _reader(wire_dir)
        off = r.initialOffset()
        v = Vgtid.from_json(off["vgtid"])
        assert sorted(v.shards) == ["-40", "40-80", "80-c0", "c0-"]
        assert all(sg.gtid == "current" for sg in v.shard_gtids)

    def test_read_advances_vgtid_and_decodes_rows(self, wire_dir):
        r = _reader(wire_dir)
        rows, end = r.read(r.initialOffset())
        rows = list(rows)
        kinds = {t[0] for t in rows}
        assert "ROW" in kinds and "FIELD" in kinds
        v = Vgtid.from_json(end["vgtid"])
        # every shard advanced off 'current' to a concrete position
        assert all(sg.gtid.startswith("MySQL56/") for sg in v.shard_gtids)
        # row images decoded from packed bytes
        row = next(t for t in rows if t[0] == "ROW")
        before, after = row[8][0]
        img = after or before
        assert set(img) == {"user_id", "value", "props"}

    def test_resume_from_offset_no_loss_no_dup(self, wire_dir):
        """The committed VGTID is the reconnect position: a second read from
        the mid-stream offset returns exactly the remaining transactions."""
        r = _reader(wire_dir, maxrecordsperbatch="100")
        start = r.initialOffset()
        rows1, mid = r.read(start)
        rows1 = list(rows1)
        assert len(rows1) >= 100  # capped at a tx boundary past the cap

        # drain the rest in further capped micro-batches
        later: list[tuple] = []
        off = mid
        for _ in range(20):
            rows_n, off2 = r.read(off)
            rows_n = list(rows_n)
            if not rows_n and off2 == off:
                break
            later.extend(rows_n)
            off = off2

        full_rows, _ = _reader(wire_dir).read(start)
        n_full = sum(1 for t in full_rows if t[0] == "ROW")
        n1 = sum(1 for t in rows1 if t[0] == "ROW")
        n2 = sum(1 for t in later if t[0] == "ROW")
        assert n1 + n2 == n_full
        # gtid positions never overlap between the reads per shard
        max1 = {}
        for t in rows1:
            if t[0] == "ROW":
                max1[t[2]] = max(max1.get(t[2], 0), int(t[4].rsplit("-", 1)[1]))
        for t in later:
            if t[0] == "ROW":
                assert int(t[4].rsplit("-", 1)[1]) > max1.get(t[2], 0)

    def test_resume_resends_field_events(self, wire_dir):
        """A reconnect mid-stream re-receives FIELD events before the first
        ROW of each table (VStream contract), so decode has schemas."""
        r = _reader(wire_dir, maxrecordsperbatch="50")
        _rows, mid = r.read(r.initialOffset())
        rows2, _ = r.read(mid)
        rows2 = list(rows2)
        first_row_idx = next(i for i, t in enumerate(rows2) if t[0] == "ROW")
        field_idx = [i for i, t in enumerate(rows2) if t[0] == "FIELD"]
        assert field_idx and min(field_idx) < first_row_idx

    def test_read_between_offsets_replays_range(self, wire_dir):
        r = _reader(wire_dir, maxrecordsperbatch="80")
        start = r.initialOffset()
        rows1, mid = r.read(start)
        replayed = list(r.readBetweenOffsets(start, mid))
        assert sum(1 for t in replayed if t[0] == "ROW") == sum(
            1 for t in list(rows1) if t[0] == "ROW"
        )

    def test_explicit_vgtid_start(self, wire_dir):
        """O3: an explicit VGTID option is the exclusive start position."""
        r0 = _reader(wire_dir)
        _rows, end = r0.read(r0.initialOffset())
        r = _reader(wire_dir, vgtid=end["vgtid"])
        rows, _ = r.read(r.initialOffset())
        assert sum(1 for t in rows if t[0] == "ROW") == 0  # stream drained


def test_live_source_spark_end_to_end(spark, wire_dir, tmp_path):
    """Full Spark streaming query over format('vitess-cdc'): VGTID offsets in
    the checkpoint, decoded raw frame out."""
    from debezium_connector_vitess_spark.sources import live

    live.register(spark)
    df = (
        spark.readStream.format("vitess-cdc")
        .option("keyspace", "ks0")
        .option("shards", "-40,40-80,80-c0,c0-")
        .option("snapshotMode", "never")
        .option("channelFactory", FACTORY)
        .option("path", wire_dir)
        .load()
    )
    ck = str(tmp_path / "ck")
    q = (
        df.writeStream.format("memory")
        .queryName("live_out")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("live_out")
    assert out.filter("event_kind = 'ROW'").count() == 200
    assert out.filter("event_kind = 'ROW' AND vgtid IS NULL").count() == 0
    # the checkpointed offset is a VGTID document (the offset log's last line
    # carries the reader's offset dict, possibly nested/stringified)
    offsets_dir = os.path.join(ck, "offsets")
    files = sorted(f for f in os.listdir(offsets_dir) if not f.startswith("."))
    content = open(os.path.join(offsets_dir, files[-1])).read()
    assert '\\"vgtid\\"' in content or '"vgtid"' in content
    assert "MySQL56/" in content


class TestRetry:
    """E1/E2: retriable transport errors reconnect from the last flushed
    VGTID; non-retriable errors fail the batch."""

    def _flaky(self, wire_dir, fail_after=3):
        from debezium_connector_vitess_spark.sources.wire import JsonlChannel

        class Flaky:
            def __init__(self):
                self.inner = JsonlChannel(wire_dir)
                self.connects = 0

            def vstream(self, request):
                self.connects += 1
                it = self.inner.vstream(request)
                if self.connects == 1:
                    for i, resp in enumerate(it):
                        if i >= fail_after:
                            raise ConnectionError("stream reset (UNAVAILABLE)")
                        yield resp
                else:
                    yield from it

        return Flaky()

    def test_retriable_error_reconnects_from_last_vgtid(self, wire_dir):
        flaky = self._flaky(wire_dir, fail_after=3)
        r = _reader(wire_dir, retrybasedelays="0.001")
        r._channel_factory = lambda opts: flaky
        rows, end = r.read(r.initialOffset())
        rows = list(rows)
        assert flaky.connects == 2  # one reconnect
        clean, _ = _reader(wire_dir).read(_reader(wire_dir).initialOffset())
        n_clean = sum(1 for t in clean if t[0] == "ROW")
        assert sum(1 for t in rows if t[0] == "ROW") == n_clean  # no loss/dup

    def test_non_retriable_error_propagates(self, wire_dir):
        class Broken:
            def vstream(self, request):
                raise ValueError("bad data")
                yield  # pragma: no cover

        r = _reader(wire_dir)
        r._channel_factory = lambda opts: Broken()
        with pytest.raises(ValueError, match="bad data"):
            list(r.read(r.initialOffset())[0])

    def test_retries_exhausted_raises_last_error(self, wire_dir):
        class AlwaysDown:
            def __init__(self):
                self.connects = 0

            def vstream(self, request):
                self.connects += 1
                raise ConnectionError("down")
                yield  # pragma: no cover

        chan = AlwaysDown()
        r = _reader(wire_dir, retrymaxattempts="3", retrybasedelays="0.001")
        r._channel_factory = lambda opts: chan
        with pytest.raises(ConnectionError, match="down"):
            r.read(r.initialOffset())
        assert chan.connects == 4  # initial + 3 retries


def test_full_pipeline_live_to_routed_parquet(spark, wire_dir, tmp_path):
    """The user pipeline end to end: vitess-cdc live source (VGTID offsets,
    packed-row decode) -> typed envelope -> record key -> topic routing ->
    partitioned parquet sink, restarted mid-way from the checkpoint with
    exactly-once output (SURVEY §7.2 extended to the live path + S5/S6)."""
    from debezium_connector_vitess_spark import changelog
    from debezium_connector_vitess_spark.decode import decode_table
    from debezium_connector_vitess_spark.envelope import with_record_key
    from debezium_connector_vitess_spark.sinks import (
        TopicNamingStrategy,
        write_parquet_stream,
    )
    from debezium_connector_vitess_spark.sources import live

    live.register(spark)

    def run(out, ck, max_records=None):
        reader = (
            spark.readStream.format("vitess-cdc")
            .option("keyspace", "ks0")
            .option("shards", "-40,40-80,80-c0,c0-")
            .option("snapshotMode", "never")
            .option("channelFactory", FACTORY)
            .option("path", wire_dir)
        )
        if max_records:
            reader = reader.option("maxRecordsPerBatch", str(max_records))
        raw = reader.load()
        schema = changelog.change_table_schema("tbl1")
        env = with_record_key(decode_table(raw, schema), schema)
        naming = TopicNamingStrategy(prefix="cdc", overrides={"tbl1": "cdc.users"})
        routed = naming.attach(
            env.select(
                "op", "key", "ts_ms", "gtid",
                F.col("source.table").alias("table_name"),
                F.col("after.user_id").alias("user_id"),
            )
        )
        q = write_parquet_stream(
            routed, out, ck, partition_by=("topic",), available_now=True
        )
        q.awaitTermination(120)

    import pyspark.sql.functions as F

    out = str(tmp_path / "routed")
    ck = str(tmp_path / "ck_pipe")
    # first run: one bounded batch (availableNow falls back to single batch
    # for Python sources, so the cap bounds the run); second run drains the
    # rest from the same checkpoint
    run(out, ck, max_records=60)
    n1 = spark.read.parquet(out).count()
    run(out, ck)
    result = spark.read.parquet(out)

    # a clean uncapped run is the exactly-once reference output
    clean_out, clean_ck = str(tmp_path / "clean"), str(tmp_path / "ck_clean")
    run(clean_out, clean_ck)
    expected = spark.read.parquet(clean_out)
    assert 0 < n1 < expected.count()
    assert result.count() == expected.count()  # no loss, no duplication
    # all rows routed to the override topic for tbl1
    assert result.select("topic").distinct().collect()[0]["topic"] == "cdc.users"
