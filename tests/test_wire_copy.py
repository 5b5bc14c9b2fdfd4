"""VStream Copy phase through the wire/live path (S3/O6): copy-state VGTIDs
with table_p_ks last PKs, the duplicate-BEGIN quirk, COPY_COMPLETED, and
mid-copy resume."""

from __future__ import annotations

import pytest

from debezium_connector_vitess_spark.sources.fixtures import write_wire_copy_fixture
from debezium_connector_vitess_spark.sources.live import VitessCdcSimpleStreamReader
from debezium_connector_vitess_spark.vgtid import Vgtid

FACTORY = "debezium_connector_vitess_spark.sources.wire:jsonl_channel_factory"


@pytest.fixture()
def copy_dir(tmp_path, sf_dir):
    d = str(tmp_path / "wire_copy")
    # small chunks so each table needs several copy transactions (mid-copy
    # offsets then genuinely carry a lastpk)
    write_wire_copy_fixture(sf_dir, d, rows_per_tx=1, stream_txs=4)
    return d


def _reader(copy_dir, **extra):
    opts = {
        "keyspace": "ks0",
        "shards": "-40,40-80,80-c0,c0-",
        "snapshotmode": "initial",  # empty GTID => VStream Copy
        "channelfactory": FACTORY,
        "path": copy_dir,
    }
    opts.update(extra)
    return VitessCdcSimpleStreamReader(opts)


def _row_keys(rows):
    """(shard, table, user_id) of every copy/stream ROW-event row image."""
    out = []
    for t in rows:
        if t[0] != "ROW":
            continue
        for before, after in t[8]:
            img = after or before
            out.append((t[2], t[3], img["user_id"], "u" if before else "c"))
    return out


class TestCopyPhase:
    def test_initial_snapshot_reads_copy_then_stream(self, copy_dir):
        r = _reader(copy_dir)
        start = r.initialOffset()
        assert Vgtid.from_json(start["vgtid"]).is_initial()
        rows, end = r.read(start)
        rows = list(rows)
        kinds = {t[0] for t in rows}
        # COPY_COMPLETED is positional machinery, never an output row
        assert "COPY_COMPLETED" not in kinds
        keys = _row_keys(rows)
        inserts = [k for k in keys if k[3] == "c"]
        updates = [k for k in keys if k[3] == "u"]
        assert inserts and updates  # copy inserts + stream updates
        # every copied (shard, table, user) appears exactly once
        assert len(inserts) == len(set(inserts))
        # the final offset is past the copy base position with no lastpk left
        v = Vgtid.from_json(end["vgtid"])
        assert all(not sg.table_p_ks for sg in v.shard_gtids)
        assert all(int(sg.gtid.rsplit("-", 1)[1]) > 50 for sg in v.shard_gtids)

    def test_mid_copy_offset_carries_lastpk(self, copy_dir):
        """Stopping inside the copy leaves table_p_ks in the offset — the
        VGTID form the reference persists (TablePrimaryKeys.java:27-368)."""
        r = _reader(copy_dir, maxrecordsperbatch="8")
        _rows, mid = r.read(r.initialOffset())
        v = Vgtid.from_json(mid["vgtid"])
        assert any(sg.table_p_ks for sg in v.shard_gtids)
        tpk = next(sg.table_p_ks[0] for sg in v.shard_gtids if sg.table_p_ks)
        assert tpk.table_name.startswith("tbl")
        assert tpk.lastpk["rows"]

    def test_mid_copy_resume_no_recopy_no_loss(self, copy_dir):
        """Resuming from a mid-copy offset continues at the recorded last PK:
        union of reads = one uncapped read, with no row copied twice."""
        r = _reader(copy_dir, maxrecordsperbatch="8")
        start = r.initialOffset()
        rows1, off = r.read(start)
        all_rows = list(rows1)
        for _ in range(100):
            rows_n, off2 = r.read(off)
            rows_n = list(rows_n)
            if not rows_n and off2 == off:
                break
            all_rows.extend(rows_n)
            off = off2
        full, _ = _reader(copy_dir).read(start)
        expect = _row_keys(list(full))
        got = _row_keys(all_rows)
        assert sorted(got) == sorted(expect)

    def test_duplicate_begin_quirk_absorbed(self, copy_dir):
        """The copy prelude [BEGIN, FIELD] followed by a fresh BEGIN must be
        absorbed (reference: harmless copy-phase duplicate), not an error."""
        r = _reader(copy_dir)
        rows, _ = r.read(r.initialOffset())
        assert sum(1 for t in rows if t[0] == "ROW") > 0

    def test_copy_field_events_flag_enum_set_strings(self, copy_dir):
        """Copy-phase FIELD events set enum_set_string_values; the decoded
        schema path accepts the flag (ENUM/SET values arrive as literals)."""
        from debezium_connector_vitess_spark.sources.wire import (
            WireDecoder,
            WireField,
            WireFieldEvent,
        )

        dec = WireDecoder()
        schema = dec.apply_field_event(
            WireFieldEvent(
                table_name="ks0.t",
                fields=(WireField("e", "ENUM", "enum('a','b')", 0),),
                keyspace="ks0",
                shard="0",
                enum_set_string_values=True,
            )
        )
        assert schema.columns[0].resolved.family == "ENUM"
