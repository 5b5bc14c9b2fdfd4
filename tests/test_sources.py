"""Streaming-source tests: transaction buffer, replay source end-to-end with
checkpoint restart (the §7.2 kill-and-resume guarantee), vstream control plane."""

import json
import os

import pytest
from pyspark.sql import functions as F

from debezium_connector_vitess_spark.filters import TableFilter
from debezium_connector_vitess_spark.sources.buffer import TransactionBuffer
from debezium_connector_vitess_spark.sources.fixtures import write_replay_fixture
from debezium_connector_vitess_spark.sources.vstream import (
    VStreamConfig,
    assign_shards_to_tasks,
    build_rules,
    is_retriable,
    rules_for_filter,
)


# ---------------------------------------------------------------------------
# TransactionBuffer (S2)
# ---------------------------------------------------------------------------


def test_buffer_basic_tx():
    buf = TransactionBuffer()
    assert buf.add({"kind": "BEGIN", "seq": 1}) == []
    assert buf.add({"kind": "ROW", "seq": 1}) == []
    out = buf.add({"kind": "COMMIT", "seq": 2})
    assert len(out) == 1
    assert [e["kind"] for e in out[0].events] == ["BEGIN", "ROW", "COMMIT"]
    assert out[0].end_seq == 2


def test_buffer_duplicate_begin_deduped():
    buf = TransactionBuffer()
    buf.add({"kind": "BEGIN", "seq": 1})
    buf.add({"kind": "BEGIN", "seq": 1})  # copy-phase duplicate
    out = buf.add({"kind": "COMMIT", "seq": 1})
    assert [e["kind"] for e in out[0].events] == ["BEGIN", "COMMIT"]


def test_buffer_commit_without_begin_raises():
    with pytest.raises(ValueError):
        TransactionBuffer().add({"kind": "COMMIT", "seq": 1})


def test_buffer_row_outside_tx_raises():
    with pytest.raises(ValueError):
        TransactionBuffer().add({"kind": "ROW", "seq": 1})


def test_buffer_ddl_flushes():
    buf = TransactionBuffer()
    buf.add({"kind": "BEGIN", "seq": 1})
    buf.add({"kind": "ROW", "seq": 1})
    out = buf.add({"kind": "DDL", "seq": 2, "statement": "ALTER TABLE t ADD c INT"})
    assert len(out) == 2  # interrupted tx flushed, then the DDL itself
    assert [e["kind"] for e in out[0].events] == ["BEGIN", "ROW"]
    assert [e["kind"] for e in out[1].events] == ["DDL"]
    assert buf.pending == 0


# ---------------------------------------------------------------------------
# VStream control plane (S1/S4/F2/E1/O3/O4)
# ---------------------------------------------------------------------------


def test_build_rules():
    rules = build_rules(["t1", "t2"])
    assert rules[0].match == "t1" and rules[0].filter == "select * from t1"


def test_rules_for_filter():
    tf = TableFilter(include_list=[r"ks\.t[12]"])
    rules = rules_for_filter([("ks", "t1"), ("ks", "t3"), ("mysql", "user")], tf)
    assert [r.match for r in rules] == ["t1"]


def test_assign_shards_round_robin():
    assert assign_shards_to_tasks(["80-", "-80"], 1) == [["-80", "80-"]]
    assert assign_shards_to_tasks(["80-", "-80", "x"], 2) == [["-80", "x"], ["80-"]]
    assert assign_shards_to_tasks(["a"], 8) == [["a"]]


def test_resolve_start_vgtid():
    cfg = VStreamConfig(keyspace="ks", shards=["-80", "80-"], snapshot_mode="initial")
    assert cfg.resolve_start_vgtid().is_initial()
    cfg2 = VStreamConfig(keyspace="ks", shards=["-80"], snapshot_mode="never")
    assert cfg2.resolve_start_vgtid().shard_gtids[0].gtid == "current"
    explicit = '[{"keyspace":"ks","shard":"-80","gtid":"MySQL56/h:1-5"}]'
    cfg3 = VStreamConfig(keyspace="ks", shards=["-80"], explicit_vgtid=explicit)
    assert cfg3.resolve_start_vgtid().shard_gtids[0].gtid == "MySQL56/h:1-5"
    cfg4 = VStreamConfig(keyspace="ks", shards=["0"], explicit_vgtid=explicit)
    with pytest.raises(ValueError):
        cfg4.resolve_start_vgtid()


def test_is_retriable():
    assert is_retriable(ConnectionError("reset"))
    assert not is_retriable(ValueError("bad data"))


# ---------------------------------------------------------------------------
# Replay source end-to-end (S1 replay mode, O1/O2)
# ---------------------------------------------------------------------------


@pytest.fixture()
def replay_dir(tmp_path, sf_dir):
    d = str(tmp_path / "replay")
    write_replay_fixture(sf_dir, d, limit=300)
    return d


def _start_stream(spark, replay_dir, out_name, checkpoint):
    from debezium_connector_vitess_spark.sources.replay import register

    register(spark)
    df = spark.readStream.format("vitess-replay").option("path", replay_dir).load()
    return (
        df.writeStream.format("memory")
        .queryName(out_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _write_tx_file(path, shard, txs, append=False):
    """txs: list of (seq, n_rows); 1 tx = BEGIN + n ROW + COMMIT lines."""
    os.makedirs(path, exist_ok=True)
    mode = "a" if append else "w"
    with open(os.path.join(path, f"{shard}.jsonl"), mode, encoding="utf-8") as fh:
        for seq, n_rows in txs:
            events = [{"kind": "BEGIN", "keyspace": "ks", "seq": seq}]
            events += [
                {
                    "kind": "ROW",
                    "keyspace": "ks",
                    "table": "t",
                    "seq": seq,
                    "ts_ms": 0,
                    "row_changes": [{"before": None, "after": {"id": str(seq)}}],
                }
                for _ in range(n_rows)
            ]
            events.append({"kind": "COMMIT", "keyspace": "ks", "seq": seq})
            for e in events:
                fh.write(json.dumps(e) + "\n")


def test_boundary_index_cached_and_incremental(tmp_path):
    """The reader holds ONE _BoundaryIndex; a second latestOffset scans only
    appended bytes instead of re-parsing the file (round-2 verdict fix)."""
    from debezium_connector_vitess_spark.sources.replay import VitessReplayStreamReader

    d = str(tmp_path / "replay")
    _write_tx_file(d, "0", [(1, 1), (2, 1)])  # 6 lines, boundaries at 3 and 6
    reader = VitessReplayStreamReader({"path": d})
    reader.initialOffset()
    assert reader.latestOffset() == {"0": 6}
    fpath = os.path.join(d, "0.jsonl")
    st = reader._index._state[fpath]
    assert st["offset"] == os.path.getsize(fpath)  # fully consumed

    # tamper with the cached state: if latestOffset constructed a fresh
    # index (the round-2 bug) this sentinel would vanish and the result
    # would be recomputed from a full re-parse
    st["bounds"] = [41, 42]
    assert reader.latestOffset() == {"0": 42}

    # append one tx: only the appended bytes are scanned, so the cached
    # sentinel boundaries survive and the new boundary lands after them
    _write_tx_file(d, "0", [(3, 1)], append=True)
    assert reader.latestOffset() == {"0": 9}
    assert st["bounds"] == [41, 42, 9]
    assert st["offset"] == os.path.getsize(fpath)


def test_max_records_per_batch_caps_on_tx_boundaries(tmp_path):
    """E3: maxRecordsPerBatch splits a large replay into bounded micro-batches
    whose ends always land on transaction boundaries."""
    from debezium_connector_vitess_spark.sources.replay import VitessReplayStreamReader

    d = str(tmp_path / "replay")
    _write_tx_file(d, "0", [(i, 1) for i in range(1, 11)])  # 10 txs × 3 lines
    reader = VitessReplayStreamReader({"path": d, "maxrecordsperbatch": "7"})
    start = reader.initialOffset()
    assert start == {"0": 0}
    ends = []
    prev = start
    for _ in range(10):
        end = reader.latestOffset()
        if end == prev:
            break
        ends.append(end["0"])
        prev = end
    # 30 lines, cap 7 → boundaries 6,12,18,24,30 (two whole txs per batch)
    assert ends == [6, 12, 18, 24, 30]
    # every planned end is a tx boundary: read() must not raise
    starts = [0] + ends[:-1]
    seen_rows = 0
    for s, e in zip(starts, ends):
        parts = reader.partitions({"0": s}, {"0": e})
        for p in parts:
            rows = list(reader.read_rows(p))
            seen_rows += sum(1 for r in rows if r[0] == "ROW")
    assert seen_rows == 10


def test_max_records_oversized_tx_taken_whole(tmp_path):
    from debezium_connector_vitess_spark.sources.replay import VitessReplayStreamReader

    d = str(tmp_path / "replay")
    _write_tx_file(d, "0", [(1, 10), (2, 1)])  # 12-line tx then a small one
    reader = VitessReplayStreamReader({"path": d, "maxrecordsperbatch": "5"})
    reader.initialOffset()
    # first tx exceeds the cap but a tx never splits across batches
    assert reader.latestOffset() == {"0": 12}
    assert reader.latestOffset() == {"0": 15}


def test_max_records_restart_resumes_on_boundary(tmp_path):
    """A fresh reader (restart) re-learns progress from partitions()/commit()
    and keeps capping from there."""
    from debezium_connector_vitess_spark.sources.replay import VitessReplayStreamReader

    d = str(tmp_path / "replay")
    _write_tx_file(d, "0", [(i, 1) for i in range(1, 11)])
    reader = VitessReplayStreamReader({"path": d, "maxrecordsperbatch": "7"})
    # simulate Spark replaying the WAL-pending batch [6, 12) after restart
    reader.partitions({"0": 6}, {"0": 12})
    assert reader.latestOffset() == {"0": 18}
    reader.commit({"0": 18})
    assert reader.latestOffset() == {"0": 24}


def test_replay_stream_end_to_end(spark, replay_dir, tmp_path):
    q = _start_stream(spark, replay_dir, "replay_out", str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    rows = spark.sql("SELECT event_kind, count(*) AS n FROM replay_out GROUP BY 1").collect()
    counts = {r["event_kind"]: r["n"] for r in rows}
    assert counts.get("ROW", 0) == 300
    assert counts.get("BEGIN", 0) == counts.get("COMMIT", 0) > 0
    # every ROW row carries shard/table/vgtid
    bad = spark.sql(
        "SELECT count(*) AS n FROM replay_out WHERE event_kind='ROW' AND "
        "(shard IS NULL OR table_name IS NULL OR vgtid IS NULL)"
    ).collect()[0]["n"]
    assert bad == 0


def test_replay_restart_no_loss_no_dup(spark, sf_dir, tmp_path):
    """Kill the stream, grow the recorded stream, restart from the same
    checkpoint: every ROW event appears exactly once (O1/O2)."""
    from debezium_connector_vitess_spark.sources.replay import register

    register(spark)
    d = str(tmp_path / "replay2")
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "out2")
    write_replay_fixture(sf_dir, d, limit=120)

    def run_once():
        df = spark.readStream.format("vitess-replay").option("path", d).load()
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n1 = spark.read.parquet(out).filter("event_kind='ROW'").count()
    assert n1 == 120

    # stream grows while stopped; restart resumes from checkpointed offset
    write_replay_fixture(sf_dir, d, limit=120, start_event=120)
    run_once()
    rows = spark.read.parquet(out).filter("event_kind='ROW'")
    assert rows.count() == 240  # no loss
    # no duplicates: each (shard, gtid) row-event position seen exactly once
    dups = (
        rows.groupBy("shard", "gtid").count().filter("count > 1").count()
    )
    assert dups == 0


def test_replay_decode_integration(spark, replay_dir, tmp_path):
    """Streamed raw events → decode_table → envelope, as a streaming query."""
    from debezium_connector_vitess_spark import changelog
    from debezium_connector_vitess_spark.decode import decode_table
    from debezium_connector_vitess_spark.sources.replay import register

    register(spark)
    raw = spark.readStream.format("vitess-replay").option("path", replay_dir).load()
    env = decode_table(raw, changelog.change_table_schema("tbl1"))
    q = (
        env.writeStream.format("memory")
        .queryName("replay_env")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.sql(
        "SELECT op, count(*) n, sum(CASE WHEN after.user_id IS NULL THEN 1 ELSE 0 END) null_after "
        "FROM replay_env GROUP BY op ORDER BY op"
    ).collect()
    by_op = {r["op"]: r for r in out}
    assert set(by_op) <= {"c", "u", "d"} and len(by_op) > 0
    if "d" in by_op:
        assert by_op["d"]["null_after"] == by_op["d"]["n"]


def test_stateful_tx_metadata_stream(spark, replay_dir, tmp_path):
    """T4/T7 streaming: per-shard epoch/rank via applyInPandasWithState,
    state persisted in the checkpoint."""
    from debezium_connector_vitess_spark.sources.replay import register
    from debezium_connector_vitess_spark.txmeta.streaming import ordered_tx_metadata_stream

    register(spark)
    raw = spark.readStream.format("vitess-replay").option("path", replay_dir).load()
    meta = ordered_tx_metadata_stream(raw)
    q = (
        meta.writeStream.format("memory")
        .queryName("txmeta_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_tx"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM txmeta_out").collect()
    assert len(rows) > 0
    # constant host in fixtures: overridden start bumps epoch to 1, then flat
    assert all(r["transaction_epoch"] == 1 for r in rows)
    # rank equals the gtid max sequence (single host, range 1-N)
    for r in rows[:10]:
        assert r["transaction_rank"] == r["gtid"].rsplit("-", 1)[-1]


def test_snapshot_one_pass_chunked_copy(spark, sf_dir):
    """S3/O6: chunked copy planned in one pass — a single stats aggregate,
    arithmetic chunk assignment, chunk boundaries as resume markers."""
    from debezium_connector_vitess_spark.snapshot import (
        CopyCursor,
        cursor_at,
        initial_offset_with_copy,
        snapshot_copy,
    )

    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    total = df.count()
    cursor = CopyCursor(table="customer", pk_column="c_custkey")
    snap, bounds = snapshot_copy(df, cursor, chunk_size=40)
    # one DataFrame covers the whole copy; chunks partition it exactly
    assert snap.count() == total
    per_chunk = {r["copy_chunk"]: r["n"] for r in
                 snap.groupBy("copy_chunk").agg(F.count("*").alias("n")).collect()}
    assert sum(per_chunk.values()) == total
    assert max(per_chunk) <= len(bounds) - 1
    # each chunk's rows respect its boundary (the resume marker)
    mx = snap.groupBy("copy_chunk").agg(F.max("c_custkey").alias("mx")).collect()
    for r in mx:
        assert r["mx"] <= bounds[r["copy_chunk"]]

    # resume after chunk 0: only later chunks' rows remain, none re-read
    mid = cursor_at(cursor, bounds, 0)
    assert not mid.done and mid.last_pk == bounds[0]
    rest, rest_bounds = snapshot_copy(df, mid, chunk_size=40)
    assert rest.count() == total - per_chunk[0]
    assert rest.agg(F.min("c_custkey")).collect()[0][0] > bounds[0]
    # finishing the last chunk marks the copy done
    assert cursor_at(mid, rest_bounds, len(rest_bounds) - 1).done

    # interrupted copy is recorded in the offset document
    v = initial_offset_with_copy("ks0", ["-80", "80-"], [mid])
    assert v.is_initial()
    assert v.shard_gtids[0].table_p_ks[0].table_name == "customer"
    assert v.shard_gtids[0].table_p_ks[0].lastpk["rows"] == [str(bounds[0])]


def test_snapshot_copy_single_scan_plan(spark, sf_dir):
    """The copy must be ONE scan stage: no per-page loop artifacts (no
    union of limits, no global sort) in the physical plan."""
    from debezium_connector_vitess_spark.snapshot import CopyCursor, snapshot_copy

    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    snap, _ = snapshot_copy(
        df, CopyCursor(table="customer", pk_column="c_custkey"), chunk_size=40
    )
    plan = snap._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "Union" not in plan and "GlobalLimit" not in plan and "Sort" not in plan


def test_metrics_listener(spark, replay_dir, tmp_path):
    """E5: StreamingQueryListener analog of the reference's streaming metrics
    (events seen, committed tx/batches, last offset, connected flag)."""
    import time as _time

    from debezium_connector_vitess_spark.metrics import CdcMetricsListener

    listener = CdcMetricsListener()
    spark.streams.addListener(listener)
    try:
        q = _start_stream(spark, replay_dir, "metrics_out", str(tmp_path / "ckpt_m"))
        q.awaitTermination(120)
        for _ in range(50):  # listener events are delivered asynchronously
            if listener.metrics.get("metrics_out", None) and listener.metrics[
                "metrics_out"
            ].total_number_of_events_seen:
                break
            _time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)
    snap = listener.metrics["metrics_out"].snapshot()
    assert snap["TotalNumberOfEventsSeen"] > 0
    assert snap["NumberOfCommittedTransactions"] >= 1
    assert snap["LastOffset"] is not None
    assert snap["UptimeMs"] > 0


def test_build_flags_tables_to_copy():
    """F3 wired into the request flags (VitessReplicationConnection.java:302-314)."""
    from debezium_connector_vitess_spark.sources.metadata import VitessMetadata
    from debezium_connector_vitess_spark.sources.vstream import VStreamConfig, build_flags

    def fake_execute(sql, shard=None):
        if "show tables" in sql.lower():
            return [["orders"], ["supplier"], ["customer"]]
        raise AssertionError(sql)

    md = VitessMetadata(keyspace="commerce", execute=fake_execute)
    cfg = VStreamConfig(
        keyspace="commerce",
        snapshot_mode_tables=[r"commerce\.(orders|supplier)"],
        stop_on_reshard=True,
        heartbeat_interval_s=5,
    )
    flags = build_flags(cfg, md)
    assert flags.tables_to_copy == ("orders", "supplier")
    assert flags.stop_on_reshard and flags.heartbeat_interval_s == 5

    # unset option -> empty tables_to_copy, no metadata round-trip needed
    assert build_flags(VStreamConfig(keyspace="commerce")).tables_to_copy == ()


def test_wire_fixture_generated_once_per_session(spark, sf_dir):
    """The wire replay fixture is generated once per (sf_dir, params) per
    process: repeat query invocations replay the SAME files with zero
    driver-side writes (mtimes unchanged), and stay correct."""
    import os

    from debezium_connector_vitess_spark.registry import QUERIES
    from debezium_connector_vitess_spark.sources.fixtures import (
        cached_fixture_dir,
        write_wire_replay_fixture,
    )

    n1 = QUERIES["cdc_envelope"](spark, sf_dir, sides=("wire",)).count()
    d = cached_fixture_dir("wire_replay", sf_dir, write_wire_replay_fixture, tx_size=10)
    mtimes = {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)}
    n2 = QUERIES["cdc_envelope"](spark, sf_dir, sides=("wire",)).count()
    assert n1 == n2 > 0
    d2 = cached_fixture_dir("wire_replay", sf_dir, write_wire_replay_fixture, tx_size=10)
    assert d2 == d
    assert {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)} == mtimes


def test_watermark_dir_caps_first_batch_after_restart(tmp_path):
    """E3 cold-start cap: after a restart past a clean commit the engine asks
    latestOffset before the reader ever learns the start position, so without
    state the first batch drains the whole backlog. With watermarkDir the
    planned watermark survives the restart and the first batch is bounded,
    still landing on a transaction boundary."""
    from debezium_connector_vitess_spark.sources.replay import VitessReplayStreamReader

    d = str(tmp_path / "replay")
    wm = str(tmp_path / "wm")
    _write_tx_file(d, "0", [(i, 1) for i in range(1, 11)])  # 10 txs × 3 lines
    opts = {"path": d, "maxrecordsperbatch": "7", "watermarkdir": wm}
    r1 = VitessReplayStreamReader(opts)
    r1.initialOffset()
    end1 = r1.latestOffset()
    assert end1 == {"0": 6}  # capped from the start of stream
    r1.commit(end1)
    # restart after clean commit: fresh reader, latestOffset called FIRST
    r2 = VitessReplayStreamReader(opts)
    end2 = r2.latestOffset()
    assert end2 == {"0": 12}  # bounded relative to the persisted watermark
    # without the sidecar the documented uncapped cold start drains the file
    r3 = VitessReplayStreamReader({"path": d, "maxrecordsperbatch": "7"})
    assert r3.latestOffset() == {"0": 30}


def test_lineage_stream_restart_inherits_across_checkpoint(spark, tmp_path):
    """T5 streaming across a REAL checkpoint restart: parents stream in run 1,
    the stream stops, the split lands (child shard files appear), and on
    restart the keyspace-keyed state recovered from the checkpoint gives the
    children max(parent epochs)+1 while the surviving shard's chain
    continues unbroken."""
    from debezium_connector_vitess_spark.sources.replay import register
    from debezium_connector_vitess_spark.txmeta.streaming import (
        ordered_tx_metadata_stream_lineage,
    )

    register(spark)
    d = str(tmp_path / "lineage_replay")
    ckpt = str(tmp_path / "ckpt_lineage")
    out = str(tmp_path / "out_lineage")
    _write_tx_file(d, "-80", [(10, 1), (20, 1)])
    _write_tx_file(d, "80-", [(11, 1)])

    def run_once():
        raw = spark.readStream.format("vitess-replay").option("path", d).load()
        meta = ordered_tx_metadata_stream_lineage(raw)
        q = (
            meta.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    got1 = {
        (r["shard"], r["gtid"]): r["transaction_epoch"]
        for r in spark.read.parquet(out).collect()
    }
    assert len(got1) == 3 and set(got1.values()) == {1}

    # split lands while the stream is down; '80-' also keeps committing
    _write_tx_file(d, "-40", [(30, 1)])
    _write_tx_file(d, "40-80", [(31, 1)])
    _write_tx_file(d, "80-", [(21, 1)], append=True)
    run_once()
    got2 = {
        (r["shard"], r["gtid"]): r["transaction_epoch"]
        for r in spark.read.parquet(out).collect()
        if (r["shard"], r["gtid"]) not in got1
    }
    assert got2 == {
        ("-40", "MySQL56/host0:1-30"): 2,
        ("40-80", "MySQL56/host0:1-31"): 2,
        ("80-", "MySQL56/host0:1-21"): 1,
    }


def test_stateful_tx_metadata_stream_tws(spark, replay_dir, tmp_path):
    """The transformWithStateInPandas implementation must produce exactly the
    applyInPandasWithState operator's output over the same replay stream
    (same epochs, ranks, ordering contract).

    Skipped where the google.protobuf runtime is absent: tws's state-server
    protocol needs it (pyspark.sql.streaming.proto), and this container does
    not ship it — same environmental gate as the grpcio live-channel tests."""
    import pytest

    pytest.importorskip("google.protobuf")
    from debezium_connector_vitess_spark.sources.replay import register
    from debezium_connector_vitess_spark.txmeta.streaming import (
        ordered_tx_metadata_stream,
        ordered_tx_metadata_stream_tws,
    )

    register(spark)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        raw = spark.readStream.format("vitess-replay").option("path", replay_dir).load()
        q = (
            ordered_tx_metadata_stream_tws(raw)
            .writeStream.format("memory")
            .queryName("txmeta_tws")
            .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        raw2 = spark.readStream.format("vitess-replay").option("path", replay_dir).load()
        q2 = (
            ordered_tx_metadata_stream(raw2)
            .writeStream.format("memory")
            .queryName("txmeta_aip")
            .option("checkpointLocation", str(tmp_path / "ckpt_aip"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(180)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    tws = sorted(map(tuple, spark.sql("SELECT * FROM txmeta_tws").collect()))
    aip = sorted(map(tuple, spark.sql("SELECT * FROM txmeta_aip").collect()))
    assert len(tws) > 0
    assert tws == aip


def test_tws_operator_plan_construction(spark, replay_dir):
    """Building the tws operator's plan (schema, grouping) needs no protobuf
    runtime — only execution does; the unresolved plan must carry the same
    output schema as the applyInPandasWithState operator."""
    from debezium_connector_vitess_spark.sources.replay import register
    from debezium_connector_vitess_spark.txmeta.streaming import (
        ordered_tx_metadata_stream,
        ordered_tx_metadata_stream_tws,
    )

    register(spark)
    raw = spark.readStream.format("vitess-replay").option("path", replay_dir).load()
    tws = ordered_tx_metadata_stream_tws(raw)
    aip = ordered_tx_metadata_stream(raw)
    assert tws.schema == aip.schema
    assert tws.isStreaming


def test_restart_cap_default_on_without_watermark_option(tmp_path):
    """E3 default-on restart cap: with ONLY maxRecordsPerBatch set (no
    watermarkDir ceremony), the sidecar is derived from the source path, so
    a cold start against a large backlog yields a first batch bounded by the
    cap, landing on a transaction boundary; a FRESH query over the same dir
    resets the sidecar instead of inheriting a stale watermark."""
    from debezium_connector_vitess_spark.sources.replay import VitessReplayStreamReader

    d = str(tmp_path / "replay")
    _write_tx_file(d, "0", [(i, 1) for i in range(1, 11)])  # 10 txs × 3 lines
    opts = {"path": d, "maxrecordsperbatch": "7"}
    r1 = VitessReplayStreamReader(opts)
    r1.initialOffset()
    end1 = r1.latestOffset()
    assert end1 == {"0": 6}
    r1.commit(end1)
    # restart after clean commit: latestOffset is called before the reader
    # ever learns the start — the derived sidecar bounds the first batch
    r2 = VitessReplayStreamReader(opts)
    assert r2.latestOffset() == {"0": 12}
    # a FRESH query (initialOffset called) resets the sidecar to 0
    r3 = VitessReplayStreamReader(opts)
    r3.initialOffset()
    assert r3.latestOffset() == {"0": 6}


# ---------------------------------------------------------------------------
# Replay-source review hardening (r6)
# ---------------------------------------------------------------------------


def test_stale_watermark_sidecar_clamped_to_file_bounds(tmp_path):
    """The runner calls latestOffset BEFORE initialOffset on a fresh query: a
    sidecar left by a previous query over a since-regenerated (shorter)
    fixture must clamp to the file's real boundaries — committing an end
    past EOF would permanently skip lines appended later (silent data
    loss)."""
    import json as _json

    from debezium_connector_vitess_spark.sources.replay import VitessReplayStreamReader

    d = str(tmp_path / "replay")
    _write_tx_file(d, "0", [(1, 1), (2, 1)])  # boundaries at 3, 6
    wm_dir = os.path.join(d, "_watermark")
    os.makedirs(wm_dir)
    with open(os.path.join(wm_dir, "planned_watermark.json"), "w") as fh:
        _json.dump({"0": 18}, fh)  # stale: previous, longer fixture

    reader = VitessReplayStreamReader({"path": d, "maxrecordsperbatch": "4"})
    end = reader.latestOffset()  # runner order: BEFORE initialOffset
    assert end == {"0": 6}  # clamped to the real last boundary, not 18

    # appended transactions are reached, not skipped past
    _write_tx_file(d, "0", [(3, 1)], append=True)
    assert reader.latestOffset() == {"0": 9}


def test_mid_tx_heartbeat_boundary_agrees_with_buffer(tmp_path):
    """A mid-transaction HEARTBEAT makes TransactionBuffer flush AND close
    the open group (reference sendNow); the driver's boundary index must
    plan the same cut or read() reports pending events forever."""
    from debezium_connector_vitess_spark.sources.replay import (
        ReplayPartition,
        VitessReplayStreamReader,
    )

    d = str(tmp_path / "replay")
    os.makedirs(d)
    events = [
        {"kind": "BEGIN", "keyspace": "ks", "seq": 1},
        {"kind": "ROW", "keyspace": "ks", "table": "t", "seq": 1, "ts_ms": 0,
         "row_changes": [{"before": None, "after": {"id": "1"}}]},
        {"kind": "HEARTBEAT", "keyspace": "ks", "seq": 1},
    ]
    with open(os.path.join(d, "0.jsonl"), "w") as fh:
        for e in events:
            fh.write(json.dumps(e) + "\n")
    reader = VitessReplayStreamReader({"path": d})
    reader.initialOffset()
    end = reader.latestOffset()
    assert end == {"0": 3}  # the heartbeat closed the interrupted tx
    rows = list(
        reader.read_rows(ReplayPartition("0", os.path.join(d, "0.jsonl"), 0, 3))
    )
    kinds = [r[0] for r in rows]
    assert kinds == ["BEGIN", "ROW", "HEARTBEAT"]  # no pending error


def test_wire_fixture_without_wireformat_option_errors_clearly(tmp_path):
    """Reading a 'type'-keyed wire fixture without wireFormat=true must name
    the misconfiguration, not report a confusing boundary error."""
    from debezium_connector_vitess_spark.sources.replay import (
        ReplayPartition,
        VitessReplayStreamReader,
    )

    d = str(tmp_path / "replay")
    os.makedirs(d)
    with open(os.path.join(d, "0.jsonl"), "w") as fh:
        fh.write(json.dumps({"type": "BEGIN", "keyspace": "ks"}) + "\n")
        fh.write(json.dumps({"type": "COMMIT", "keyspace": "ks"}) + "\n")
    reader = VitessReplayStreamReader({"path": d})
    reader.initialOffset()
    end = reader.latestOffset()
    with pytest.raises(ValueError, match="wireFormat"):
        list(reader.read_rows(ReplayPartition("0", os.path.join(d, "0.jsonl"), 0, end["0"])))


def test_byte_range_read_equals_line_skip_read(tmp_path):
    """partitions() resolves (start_byte, end_byte) from the boundary index so
    the executor seeks instead of re-reading every prior line; both paths
    must yield identical tuples."""
    from debezium_connector_vitess_spark.sources.replay import (
        ReplayPartition,
        VitessReplayStreamReader,
    )

    d = str(tmp_path / "replay")
    _write_tx_file(d, "0", [(i, 2) for i in range(1, 6)])  # 5 txs × 4 lines
    reader = VitessReplayStreamReader({"path": d, "maxrecordsperbatch": "4"})
    reader.initialOffset()
    e1 = reader.latestOffset()
    e2 = reader.latestOffset()
    parts = reader.partitions(e1, e2)
    assert len(parts) == 1
    p = parts[0]
    assert p.start_byte is not None and p.end_byte is not None and p.start_byte > 0
    fast = list(reader.read_rows(p))
    slow = list(
        reader.read_rows(
            ReplayPartition("0", p.file_path, p.start_line, p.end_line)
        )
    )
    assert fast == slow and len(fast) > 0


def test_wire_field_prefix_matches_any_json_spacing(tmp_path):
    """The restart FIELD re-priming must recognize '\"type\": \"FIELD\"'
    written with default json.dumps spacing, not only the compact form."""
    from debezium_connector_vitess_spark.sources.replay import _FIELD_LINE_RE

    compact = json.dumps({"type": "FIELD", "x": 1}, separators=(",", ":"))
    spaced = json.dumps({"type": "FIELD", "x": 1})
    assert _FIELD_LINE_RE.search(compact)
    assert _FIELD_LINE_RE.search(spaced)
    assert not _FIELD_LINE_RE.search(json.dumps({"type": "ROW"}))


def test_replay_arrow_batches_match_rows(tmp_path):
    """read() ships Arrow RecordBatches (r13): their content must be
    byte-identical to what the Spark worker would build from the read_rows
    tuple path via its per-value converters — both serde shapes (plain and
    wire), including nested row_changes/fields and the timestamp column."""
    import pyarrow as pa
    from pyspark.sql.conversion import LocalDataToArrowConversion
    from pyspark.sql.pandas.types import to_arrow_schema

    from debezium_connector_vitess_spark.decode import RAW_EVENT_SCHEMA
    from debezium_connector_vitess_spark.sources.fixtures import (
        write_wire_replay_fixture,
    )
    from debezium_connector_vitess_spark.sources.replay import (
        VitessReplayStreamReader,
    )

    pa_schema = to_arrow_schema(RAW_EVENT_SCHEMA)
    convs = [
        LocalDataToArrowConversion._create_converter(f.dataType)
        for f in RAW_EVENT_SCHEMA.fields
    ]

    def reference_batch(rows):
        pylist = [[] for _ in range(len(convs))]
        for r in rows:
            for c, conv in enumerate(convs):
                pylist[c].append(conv(r[c]))
        return pa.RecordBatch.from_arrays(pylist, schema=pa_schema)

    def check(d, opts):
        reader = VitessReplayStreamReader(opts)
        reader.initialOffset()
        parts = reader.partitions(
            {s: 0 for s in reader._files}, reader.latestOffset()
        )
        for p in parts:
            rows = list(reader.read_rows(p))
            batches = list(VitessReplayStreamReader(opts).read(p))
            assert all(isinstance(b, pa.RecordBatch) for b in batches)
            assert sum(b.num_rows for b in batches) == len(rows)
            if rows:
                got = pa.Table.from_batches(batches)
                want = pa.Table.from_batches([reference_batch(rows)])
                assert got.equals(want)

    plain = str(tmp_path / "plain")
    _write_tx_file(plain, "0", [(i, 3) for i in range(1, 5)])
    check(plain, {"path": plain})

    wire = str(tmp_path / "wire")
    write_wire_replay_fixture("/root/testdata/sf0.001", wire, tx_size=5)
    check(wire, {"path": wire, "wireFormat": "true"})
