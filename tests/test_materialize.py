"""Latest-state materialization: batch/stream equivalence, per-batch
compaction contract, and tombstone semantics."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from debezium_connector_vitess_spark import changelog
from debezium_connector_vitess_spark.decode import decode_table
from debezium_connector_vitess_spark.envelope import with_record_key
from debezium_connector_vitess_spark.materialize import (
    materialize_latest,
    materialize_stream,
)
from debezium_connector_vitess_spark.sources import replay as replay_source
from debezium_connector_vitess_spark.sources.fixtures import (
    cached_fixture_dir,
    write_replay_fixture,
)


def _keyed_env(raw):
    parts = []
    for t in ("tbl0", "tbl1", "tbl2"):
        schema = changelog.change_table_schema(t)
        parts.append(with_record_key(decode_table(raw, schema), schema))
    return parts[0].unionByName(parts[1]).unionByName(parts[2])


def test_stream_matches_batch_across_many_microbatches(spark, sf_dir, tmp_path):
    """With the replay watermark pre-seeded and a small batch cap, each
    availableNow run processes exactly one capped micro-batch (E3 restart
    cap); restarting from the same checkpoint until drained forces per-key
    state across batch AND restart boundaries. The final compacted snapshot
    must equal the one-shot batch materialization, and each micro-batch's
    output must be compacted — at most ONE record per (table, key)."""
    import json
    import os

    replay_source.register(spark)
    replay_dir = cached_fixture_dir(
        "txmeta_replay", sf_dir, write_replay_fixture, tx_size=10, host_period=10
    )
    ckpt = str(tmp_path / "ckpt")
    wm_dir = str(tmp_path / "wm")
    os.makedirs(wm_dir)
    wm_file = os.path.join(wm_dir, "planned_watermark.json")
    with open(wm_file, "w", encoding="utf-8") as fh:
        json.dump({s: 0 for s in changelog.SHARDS}, fh)

    batches: list[pd.DataFrame] = []

    def capture(df, batch_id):
        pdf = df.toPandas()
        if len(pdf):
            batches.append(pdf)

    prev_wm = None
    for _ in range(64):
        raw = (
            spark.readStream.format("vitess-replay")
            .option("path", replay_dir)
            .option("maxRecordsPerBatch", 100)
            .option("watermarkDir", wm_dir)
            .load()
        )
        q = (
            materialize_stream(_keyed_env(raw))
            .writeStream.foreachBatch(capture)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        with open(wm_file, "r", encoding="utf-8") as fh:
            wm = fh.read()
        if wm == prev_wm:
            break
        prev_wm = wm

    assert len(batches) > 2, "batch cap must force several micro-batches"
    for pdf in batches:
        if len(pdf):
            assert not pdf.duplicated(["table_name", "key"]).any()

    out = pd.concat(batches, ignore_index=True)
    # final snapshot: last emission per key (seq monotone), tombstones dropped
    last = out.sort_values("seq").groupby(["table_name", "key"], as_index=False).last()
    stream_final = last[last["op"] != "d"]

    # tombstones never carry an image
    assert out[out["op"] == "d"]["after_json"].isna().all()

    batch_raw = changelog.events_to_raw_vevents(changelog.load_events(spark, sf_dir))
    parts = [
        decode_table(batch_raw, changelog.change_table_schema(t))
        for t in ("tbl0", "tbl1", "tbl2")
    ]
    env = parts[0].unionByName(parts[1]).unionByName(parts[2])
    batch_final = (
        materialize_latest(env, key_cols=["user_id"], value_cols=["value", "props"])
        .select("table_name", "user_id", "value")
        .toPandas()
    )

    img = pd.json_normalize(stream_final["after_json"].map(__import__("json").loads))
    got = pd.DataFrame(
        {
            "table_name": stream_final["table_name"].values,
            "user_id": img["user_id"].astype("int64").values,
            "value": img["value"].astype("float64").values,
        }
    ).sort_values(["table_name", "user_id"]).reset_index(drop=True)
    want = batch_final.sort_values(["table_name", "user_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_materialize_latest_matches_sequential_fold(spark):
    """Randomized (seeded) op stream over a small key space: the one-shuffle
    max_by materialization must equal a literal sequential fold of the
    changelog (dict replay in arrival order)."""
    import random

    rng = random.Random(42)
    rows = []
    state: dict[int, float | None] = {}
    for seq in range(1, 401):
        uid = rng.randrange(12)
        op = rng.choice(["c", "u", "d"])
        val = round(rng.uniform(0, 100), 3)
        if op == "d":
            state[uid] = None
            before, after = (uid, val), (None, None)
        else:
            state[uid] = val
            before, after = (None, None), (uid, val)
        rows.append((op, f"MySQL56/h:1-{seq}", before, after, ("t",)))
    env = spark.createDataFrame(
        rows,
        "op string, gtid string,"
        " before struct<user_id:int, value:double>,"
        " after struct<user_id:int, value:double>,"
        " source struct<table:string>",
    )
    got = {
        r.user_id: r.value
        for r in materialize_latest(
            env, key_cols=["user_id"], value_cols=["value"]
        ).collect()
    }
    want = {k: v for k, v in state.items() if v is not None}
    assert got == want


def test_materialize_latest_last_op_delete_removes_key(spark):
    """An insert followed by a higher-seq delete leaves no row; a delete
    followed by a higher-seq re-insert resurrects the key."""
    env = spark.createDataFrame(
        [
            # key 1: c then d  -> gone
            ("c", "MySQL56/h:1-1", (None, None), (1, 10.0), ("t", )),
            ("d", "MySQL56/h:1-2", (1, 10.0), (None, None), ("t", )),
            # key 2: c, d, then c again -> present with the new image
            ("c", "MySQL56/h:1-3", (None, None), (2, 20.0), ("t", )),
            ("d", "MySQL56/h:1-4", (2, 20.0), (None, None), ("t", )),
            ("c", "MySQL56/h:1-5", (None, None), (2, 21.0), ("t", )),
        ],
        "op string, gtid string,"
        " before struct<user_id:int, value:double>,"
        " after struct<user_id:int, value:double>,"
        " source struct<table:string>",
    )
    got = (
        materialize_latest(env, key_cols=["user_id"], value_cols=["value"])
        .orderBy("user_id")
        .collect()
    )
    assert [(r.user_id, r.value) for r in got] == [(2, 21.0)]


def test_materialize_history_matches_sequential_replay(spark):
    """Randomized (seeded) op stream: the windowed SCD2 derivation must equal
    a literal per-key replay — every c/u image is a version whose interval
    closes at the key's NEXT event seq (update OR delete), NULL valid_to
    marks the single open version, deletes emit no row."""
    import random

    from debezium_connector_vitess_spark.materialize import materialize_history

    rng = random.Random(7)
    rows = []
    per_key: dict[int, list[tuple[int, str, float]]] = {}
    for seq in range(1, 401):
        uid = rng.randrange(12)
        op = rng.choice(["c", "u", "d"])
        val = round(rng.uniform(0, 100), 3)
        if op == "d":
            before, after = (uid, val), (None, None)
        else:
            before, after = (None, None), (uid, val)
        rows.append((op, f"MySQL56/h:1-{seq}", before, after, ("t",)))
        per_key.setdefault(uid, []).append((seq, op, val))
    env = spark.createDataFrame(
        rows,
        "op string, gtid string,"
        " before struct<user_id:int, value:double>,"
        " after struct<user_id:int, value:double>,"
        " source struct<table:string>",
    )
    want = set()
    for uid, evs in per_key.items():
        for i, (seq, op, val) in enumerate(evs):
            if op == "d":
                continue
            nxt = evs[i + 1][0] if i + 1 < len(evs) else None
            want.add((uid, val, seq, nxt, nxt is None))
    got = {
        (r.user_id, r.value, r.valid_from_seq, r.valid_to_seq, r.is_current)
        for r in materialize_history(
            env, key_cols=["user_id"], value_cols=["value"]
        ).collect()
    }
    assert got == want


def test_materialize_history_is_current_equals_latest(spark, sf_dir):
    """The open versions of the SCD2 history ARE the latest-state snapshot:
    history WHERE is_current ≡ materialize_latest, on both the per-table
    envelope path and the one-scan multi path over the changelog fixture."""
    from debezium_connector_vitess_spark.materialize import (
        materialize_history,
        materialize_history_multi,
        materialize_latest_multi,
    )

    raw = changelog.events_to_raw_vevents(changelog.load_events(spark, sf_dir))
    schemas = [changelog.change_table_schema(t) for t in ("tbl0", "tbl1", "tbl2")]

    # per-table envelope path
    env = decode_table(raw, changelog.change_table_schema("tbl1"))
    latest = {
        (r.table_name, r.user_id, r.value)
        for r in materialize_latest(
            env, key_cols=["user_id"], value_cols=["value", "props"]
        ).collect()
    }
    current = {
        (r.table_name, r.user_id, r.value)
        for r in materialize_history(
            env, key_cols=["user_id"], value_cols=["value", "props"]
        )
        .filter("is_current")
        .collect()
    }
    assert current == latest and latest

    # one-scan multi path
    latest_m = materialize_latest_multi(raw, schemas)
    hist_m = materialize_history_multi(raw, schemas)
    for tk in latest_m:
        want = {(r.key, r.row.value) for r in latest_m[tk].collect()}
        got = {
            (r.key, r.row.value)
            for r in hist_m[tk].filter("is_current").collect()
        }
        assert got == want


def test_exact_dedup_stream_across_batches_and_restarts(spark, sf_dir, tmp_path):
    """Streaming exact dedup holds its seen-hash state across micro-batches
    AND checkpoint restarts: content is collapsed to a low-cardinality
    derivative so duplicates are guaranteed to span batch boundaries, the
    stream runs as capped availableNow restarts, and every distinct hash
    must be emitted exactly once over the WHOLE run."""
    import json
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark import changelog
    from debezium_connector_vitess_spark.ops.dedup import exact_dedup_stream
    from debezium_connector_vitess_spark.sources import replay as replay_source
    from debezium_connector_vitess_spark.sources.fixtures import (
        cached_fixture_dir,
        write_replay_fixture,
    )

    replay_source.register(spark)
    replay_dir = cached_fixture_dir(
        "txmeta_replay", sf_dir, write_replay_fixture, tx_size=10, host_period=10
    )
    ckpt = str(tmp_path / "ckpt")
    wm_dir = str(tmp_path / "wm")
    os.makedirs(wm_dir)
    wm_file = os.path.join(wm_dir, "planned_watermark.json")
    with open(wm_file, "w", encoding="utf-8") as fh:
        json.dump({s: 0 for s in changelog.SHARDS}, fh)

    batches: list[pd.DataFrame] = []

    def capture(df, batch_id):
        pdf = df.toPandas()
        if len(pdf):
            batches.append(pdf)

    prev_wm = None
    for _ in range(64):
        raw = (
            spark.readStream.format("vitess-replay")
            .option("path", replay_dir)
            .option("maxRecordsPerBatch", 100)
            .option("watermarkDir", wm_dir)
            .load()
        )
        # 12 distinct contents over thousands of events: duplicates cross
        # every batch and restart boundary
        content = raw.select(
            F.concat(
                F.lit("doc "), F.abs(F.xxhash64("gtid") % 12).cast("string")
            ).alias("text")
        )
        q = (
            exact_dedup_stream(content, "text")
            .writeStream.foreachBatch(capture)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        with open(wm_file, "r", encoding="utf-8") as fh:
            wm = fh.read()
        if wm == prev_wm:
            break
        prev_wm = wm

    out = pd.concat(batches, ignore_index=True)
    # every distinct hash exactly once across ALL batches and restarts —
    # a re-emission after a restart would mean the state store lost the key
    assert not out["content_hash"].duplicated().any()
    assert sorted(out["text"].unique()) == sorted(out["text"])
    # and the survivors cover every distinct content in the stream
    assert len(out) == 12


def test_materialize_stream_evict_deleted_state(spark, sf_dir, tmp_path):
    """evict_deleted=True: identical compacted output (per-shard ordered
    delivery keeps last-write-wins intact), strictly smaller state store —
    observed via the state operator's numRowsTotal metric."""
    replay_source.register(spark)
    replay_dir = cached_fixture_dir(
        "txmeta_replay", sf_dir, write_replay_fixture, tx_size=10, host_period=10
    )

    def run(evict, name):
        raw = (
            spark.readStream.format("vitess-replay").option("path", replay_dir).load()
        )
        q = (
            materialize_stream(_keyed_env(raw), evict_deleted=evict)
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
        out = spark.sql(
            f"SELECT table_name, key, seq, op, after_json FROM {name}"
        ).collect()
        # final record per key (highest seq wins across micro-batches)
        final = {}
        for r in out:
            k = (r["table_name"], r["key"])
            if k not in final or r["seq"] > final[k]["seq"]:
                final[k] = r
        return state_rows, {k: (v["op"], v["after_json"]) for k, v in final.items()}

    kept_rows, kept_final = run(False, "mat_keep")
    evict_rows, evict_final = run(True, "mat_evict")
    assert evict_final == kept_final
    n_deleted = sum(1 for op, _ in kept_final.items() if _[0] == "d")
    assert n_deleted > 0  # fixture has delete-terminated keys
    assert evict_rows == kept_rows - n_deleted


def test_materialize_stream_idle_ttl_evicts_state(spark, sf_dir, tmp_path):
    """idle_ttl_ms: keys idle past the TTL leave the state store (strictly
    fewer state rows than the no-TTL run after the same capped-batch drain),
    while the compacted output is unchanged — a re-arrival after eviction
    starts from seq = -1 and still wins by seq."""
    import json
    import os
    import time

    replay_source.register(spark)
    replay_dir = cached_fixture_dir(
        "txmeta_replay", sf_dir, write_replay_fixture, tx_size=10, host_period=10
    )

    def run(ttl, name):
        ckpt = str(tmp_path / f"ckpt_{name}")
        wm_dir = str(tmp_path / f"wm_{name}")
        os.makedirs(wm_dir)
        with open(
            os.path.join(wm_dir, "planned_watermark.json"), "w", encoding="utf-8"
        ) as fh:
            json.dump({s: 0 for s in changelog.SHARDS}, fh)
        rows: list = []

        def capture(df, _batch_id):
            rows.extend(df.collect())

        state_rows = 0
        prev_wm = None
        for _ in range(64):
            raw = (
                spark.readStream.format("vitess-replay")
                .option("path", replay_dir)
                .option("maxRecordsPerBatch", 100)
                .option("watermarkDir", wm_dir)
                .load()
            )
            q = (
                materialize_stream(_keyed_env(raw), idle_ttl_ms=ttl)
                .writeStream.foreachBatch(capture)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            if q.lastProgress and q.lastProgress.get("stateOperators"):
                state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
            with open(
                os.path.join(wm_dir, "planned_watermark.json"), encoding="utf-8"
            ) as fh:
                wm = fh.read()
            if wm == prev_wm:
                break
            prev_wm = wm
            if ttl is not None:
                time.sleep(0.05)  # let every idle key age past the 1 ms TTL
        final = {}
        for r in rows:
            k = (r["table_name"], r["key"])
            if k not in final or r["seq"] > final[k]["seq"]:
                final[k] = r
        return state_rows, {k: (v["op"], v["after_json"]) for k, v in final.items()}

    kept_rows, kept_final = run(None, "mat_nottl")
    # 1 ms TTL: keys idle across a restart boundary time out, so only keys
    # touched near the end of the drain survive in the store — yet the
    # compacted record stream is identical (re-arrivals win by seq vs -1)
    ttl_rows, ttl_final = run(1, "mat_ttl")
    assert ttl_final == kept_final
    assert ttl_rows < kept_rows


class _FakeValueState:
    def __init__(self):
        self._v = None
        self._set = False

    def exists(self):
        return self._set

    def get(self):
        return self._v

    def update(self, v):
        self._v, self._set = v, True

    def clear(self):
        self._v, self._set = None, False


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()
        self.timers: list[int] = []

    def getValueState(self, name, schema):
        return self.state

    def registerTimer(self, ts):
        self.timers.append(ts)

    def deleteTimer(self, ts):
        self.timers.remove(ts)

    def listTimers(self):
        return list(self.timers)


class _FakeTimerValues:
    def __init__(self, now_ms):
        self._now = now_ms

    def getCurrentProcessingTimeInMs(self):
        return self._now


def test_compactor_tws_timer_logic():
    """CompactorProcessor's idle-TTL timer machinery, driven through a fake
    handle (the logic is plain Python over the handle interface — no
    protobuf/RocksDB needed): every batch re-arms the key's SINGLE timer to
    now + TTL (stale timer deleted, so expirations don't multiply), expiry
    clears the state and emits nothing, and an evict_deleted tombstone
    cancels the timers along with the state."""
    import pandas as pd

    from debezium_connector_vitess_spark.materialize import CompactorProcessor

    proc = CompactorProcessor(idle_ttl_ms=5000)
    h = _FakeHandle()
    proc.init(h)

    def batch(seq, op, aj):
        return iter(
            [
                pd.DataFrame(
                    {"seq": [seq], "change_idx": [0], "op": [op], "after_json": [aj]}
                )
            ]
        )

    out1 = list(proc.handleInputRows(("ks", "t", "k1"), batch(1, "c", "{}"), _FakeTimerValues(1000)))
    assert h.timers == [6000]  # armed at now + ttl
    assert h.state.get() == (1, 0, "c", "{}")
    assert len(out1) == 1 and out1[0]["seq"].iloc[0] == 1

    # second batch re-arms: old timer gone, exactly one live timer
    list(proc.handleInputRows(("ks", "t", "k1"), batch(2, "u", "{}"), _FakeTimerValues(3000)))
    assert h.timers == [8000]
    assert h.state.get()[0] == 2

    # expiry: state released, no output rows
    expired = list(proc.handleExpiredTimer(("ks", "t", "k1"), _FakeTimerValues(9000), None))
    assert not h.state.exists()
    assert sum(len(p) for p in expired) == 0

    # re-arrival after expiry starts fresh against seq = -1 and wins
    out2 = list(proc.handleInputRows(("ks", "t", "k1"), batch(1, "u", "{}"), _FakeTimerValues(9500)))
    assert h.state.get()[0] == 1 and out2[0]["seq"].iloc[0] == 1

    # evict_deleted tombstone cancels timers with the state
    proc_e = CompactorProcessor(evict_deleted=True, idle_ttl_ms=5000)
    he = _FakeHandle()
    proc_e.init(he)
    list(proc_e.handleInputRows(("ks", "t", "k2"), batch(1, "c", "{}"), _FakeTimerValues(1000)))
    assert he.timers and he.state.exists()
    out_d = list(proc_e.handleInputRows(("ks", "t", "k2"), batch(2, "d", None), _FakeTimerValues(2000)))
    assert he.timers == [] and not he.state.exists()
    assert out_d[0]["op"].iloc[0] == "d" and pd.isna(out_d[0]["after_json"].iloc[0])


def test_materialize_stream_tws_plan_construction(spark, sf_dir):
    """Building the tws compactor's plan needs no protobuf runtime — only
    execution does; the unresolved plan must carry the same output schema as
    the applyInPandasWithState compactor, with and without the TTL
    (timeMode='processingTime' vs 'none')."""
    from debezium_connector_vitess_spark.materialize import materialize_stream_tws

    replay_source.register(spark)
    replay_dir = cached_fixture_dir(
        "txmeta_replay", sf_dir, write_replay_fixture, tx_size=10, host_period=10
    )
    raw = spark.readStream.format("vitess-replay").option("path", replay_dir).load()
    base = materialize_stream(_keyed_env(raw))
    for ttl in (None, 60_000):
        tws = materialize_stream_tws(_keyed_env(raw), idle_ttl_ms=ttl)
        assert tws.schema == base.schema
        assert tws.isStreaming


def test_materialize_stream_tws_matches_default(spark, sf_dir, tmp_path):
    """Execution parity: the tws compactor must produce exactly the
    applyInPandasWithState compactor's per-batch output over the same replay
    stream. Skipped where the google.protobuf runtime is absent (tws's
    state-server protocol imports it) — the same environmental gate as the
    txmeta tws twin."""
    import pytest

    pytest.importorskip("google.protobuf")
    from debezium_connector_vitess_spark.materialize import materialize_stream_tws

    replay_source.register(spark)
    replay_dir = cached_fixture_dir(
        "txmeta_replay", sf_dir, write_replay_fixture, tx_size=10, host_period=10
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    results = {}
    try:
        for name, op in (
            ("tws", materialize_stream_tws),
            ("aip", materialize_stream),
        ):
            raw = (
                spark.readStream.format("vitess-replay")
                .option("path", replay_dir)
                .load()
            )
            q = (
                op(_keyed_env(raw))
                .writeStream.format("memory")
                .queryName(f"mat_{name}")
                .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            results[name] = sorted(
                map(tuple, spark.sql(f"SELECT * FROM mat_{name}").collect())
            )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    assert len(results["tws"]) > 0
    assert results["tws"] == results["aip"]


def test_dedup_stream_fixture_suppresses_every_copy_batch(spark, sf_dir, tmp_path):
    """The dedup_exact registry row's streaming leg: micro-batch 0 (the
    bootstrap snapshot) emits every row; every LATER micro-batch (the
    shifted-id duplicate copies) is fully suppressed by state seeded in
    earlier batches — so each suppression provably crossed a batch
    boundary. Also pins the fixture's arrival-order contract: one file per
    trigger, oldest first."""
    from debezium_connector_vitess_spark.ops.dedup import exact_dedup_stream
    from debezium_connector_vitess_spark.sources.fixtures import (
        cached_fixture_dir,
        write_dedup_stream_fixture,
    )

    fixture = cached_fixture_dir("dedup_stream", sf_dir, write_dedup_stream_fixture)
    per_batch: list[tuple[int, int]] = []

    def capture(df, batch_id):
        per_batch.append((int(batch_id), df.count()))

    raw = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(fixture)
    )
    q = (
        exact_dedup_stream(raw, "text")
        .writeStream.foreachBatch(capture)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    counts = dict(per_batch)
    assert len(counts) == 3  # bootstrap + 2 copy files, one per trigger
    assert counts[0] > 0  # every bootstrap row is a first arrival
    assert counts[1] == 0 and counts[2] == 0  # copies: all suppressed cross-batch


def test_minhash_dedup_stream_candidates_match_batch(spark, tmp_path):
    """Streaming fuzzy dedup: near-duplicates are flagged against the
    bucket's FIRST arrival across micro-batch boundaries, distinct docs are
    never flagged, and — because the hashed-shingle and per-permutation
    expressions are literally shared with the hashed batch family
    (minhash_dedup_pairs' candidate stage) — every reported (id, dup_of)
    pair is a hashed-family batch candidate pair at equal knobs."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from debezium_connector_vitess_spark.ops.dedup import (
        _bucket_pair_candidates,
        _hashed_shingles,
        _sig_from_hashed,
        minhash_band_keys,
        minhash_dedup_stream,
    )

    src = tmp_path / "src"
    os.makedirs(src)
    base = "the quick brown fox jumps over the lazy dog again and again " * 4
    rows_by_file = [
        # batch 0: 1 and 2 are near-dups of each other; 3 is distinct
        [
            (1, base + "alpha tail"),
            (2, base + "beta tail"),
            (3, "completely different content about database replication streams"),
        ],
        # batch 1: 4 is a near-dup of 1/2 (MUST be attributed across the
        # micro-batch boundary); 5 is distinct
        [
            (4, base + "gamma tail"),
            (5, "unrelated corpus describing sailing knots and rigging maintenance"),
        ],
    ]
    for order, rows in enumerate(rows_by_file):
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        p = str(src / f"f{order}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (1_700_000_000 + order * 10,) * 2)

    emitted: list[tuple[int, int, int]] = []

    def capture(df, batch_id):
        for r in df.collect():
            emitted.append((int(batch_id), r.id, r.dup_of))

    raw = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        minhash_dedup_stream(raw, "text", "doc_id")
        .writeStream.foreachBatch(capture)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    flagged = {(i, d) for (_b, i, d) in emitted}
    flagged_ids = {i for (i, _d) in flagged}
    # the near-dup family is flagged against first arrival (min id in batch
    # 0 = doc 1); distinct docs never appear
    assert flagged_ids == {2, 4}
    assert all(d == 1 for (_i, d) in flagged)
    # doc 4's report crossed the micro-batch boundary via bucket state
    assert any(b == 1 and i == 4 for (b, i, _d) in emitted)
    # parity: every streamed pair is a HASHED-family batch candidate pair
    # at equal knobs (the stream shares _hashed_shingle_array/_perm_hash
    # with this exact path — NOT with minhash_lsh_candidates, whose
    # per-permutation hashes run over the shingle string, a different
    # min-wise family with different buckets)
    all_rows = [r for rows in rows_by_file for r in rows]
    batch_df = spark.createDataFrame(all_rows, "doc_id bigint, text string")
    sig = _sig_from_hashed(_hashed_shingles(batch_df, "text", "doc_id", 3), 32)
    banded = minhash_band_keys(sig, num_perm=32, bands=8)
    batch_pairs = {
        (r["id_a"], r["id_b"])
        for r in _bucket_pair_candidates(banded, ["band", "bhash"]).collect()
    }
    assert {(min(i, d), max(i, d)) for (i, d) in flagged} <= batch_pairs


def test_minhash_dedup_stream_winner_rearrival_is_silent(spark, tmp_path):
    """Coarse-slot state fold (r11): a bucket's stored WINNER re-arriving
    alone in a later micro-batch emits nothing (it is not a duplicate of
    itself) while the slot's state survives the touch — a near-dup arriving
    after that is still attributed to the original first arrival."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from debezium_connector_vitess_spark.ops.dedup import minhash_dedup_stream

    src = tmp_path / "src"
    os.makedirs(src)
    base = "the quick brown fox jumps over the lazy dog again and again " * 4
    batches = [
        [(5, base + "alpha")],   # seeds buckets
        [(5, base + "alpha")],   # the winner re-arrives ALONE
        [(9, base + "alpha2")],  # near-dup: must still attribute to 5
    ]
    for i, rows in enumerate(batches):
        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        p = str(src / f"f{i}.parquet")
        pq.write_table(t, p)
        os.utime(p, (1_700_000_000 + i * 10,) * 2)
    got: list[tuple[int, int, int]] = []

    def cap(df, batch_id):
        got.extend((int(batch_id), r.id, r.dup_of) for r in df.collect())

    q = (
        minhash_dedup_stream(
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src)),
            "text",
            "doc_id",
        )
        .writeStream.foreachBatch(cap)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert got and all(i == 9 and d == 5 for (_b, i, d) in got)
    assert all(b == 2 for (b, _i, _d) in got)  # batches 0 and 1 were silent


def test_minhash_dedup_stream_idle_ttl_evicts_buckets(spark, tmp_path):
    """idle_ttl_ms: buckets idle past the TTL leave the state store, so a
    near-duplicate arriving AFTER eviction starts a fresh bucket and is NOT
    flagged — the bounded-state horizon trade the operator documents.
    Timed-out keys are only processed in a batch where they have no input
    (input presence wins over expiry in applyInPandasWithState), so the
    eviction is driven by an intermediate batch of unrelated content.

    noDataMicroBatches is disabled for the test: with ProcessingTimeTimeout
    the stateful operator reports shouldRunAnotherBatch=true on EVERY batch,
    so Trigger.AvailableNow keeps scheduling empty timer batches and never
    terminates (the operator docstring documents the trade). Timers still
    fire in every DATA batch, which is when eviction matters."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from debezium_connector_vitess_spark.ops.dedup import minhash_dedup_stream

    src = tmp_path / "src"
    os.makedirs(src)
    base = "the quick brown fox jumps over the lazy dog again and again " * 4

    def write(name, rows, order):
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        p = str(src / name)
        pq.write_table(tbl, p)
        os.utime(p, (1_700_000_000 + order * 10,) * 2)

    emitted: list[tuple[int, int]] = []

    def capture(df, _batch_id):
        for r in df.collect():
            emitted.append((r.id, r.dup_of))

    def run():
        raw = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            minhash_dedup_stream(raw, "text", "doc_id", idle_ttl_ms=1)
            .writeStream.foreachBatch(capture)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        # run 1: the near-dup family seeds its buckets; 2 flagged against 1
        write("f0.parquet", [(1, base + "alpha tail"), (2, base + "beta tail")], 0)
        run()
        assert (2, 1) in emitted
        _time.sleep(0.05)  # age the family's buckets past the 1 ms TTL
        # run 2: unrelated content — the idle expired buckets are evicted here
        write(
            "f1.parquet",
            [(3, "unrelated corpus describing sailing knots and rigging")],
            1,
        )
        run()
        # run 3: a near-dup re-arrival AFTER eviction starts a fresh bucket
        write("f2.parquet", [(4, base + "gamma tail")], 2)
        run()
        assert all(i != 4 for (i, _d) in emitted)
    finally:
        spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")


def test_exact_dedup_stream_watermark_bounds_state(spark, tmp_path):
    """`dedup_window` variant: duplicates within the watermark horizon are
    suppressed, and state is EVICTED once the watermark passes
    event_time + window — a later re-arrival of the same content is emitted
    again as a fresh first arrival. This is the bounded-state contract for
    unbounded corpora: state ∝ distinct hashes per horizon, not per stream
    lifetime."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from debezium_connector_vitess_spark.ops.dedup import exact_dedup_stream

    src = tmp_path / "src"
    os.makedirs(src)
    t0 = 1_600_000_000  # event-time origin (epoch seconds)
    H = 3600

    def write(name, rows, order):
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array([r[2] * 1_000_000 for r in rows], pa.timestamp("us")),
            }
        )
        p = str(src / name)
        pq.write_table(tbl, p)
        os.utime(p, (1_700_000_000 + order * 10,) * 2)

    # batch 0: first arrivals of A and B. A duplicate of B in the SAME batch
    # is suppressed in-batch.
    write("f0.parquet", [(1, "doc A", t0), (2, "doc B", t0), (9, "doc B", t0 + H)], 0)
    # batch 1: fresh doc C 49h later — emitted, and its event time advances
    # the watermark to t0 + 25h > t0 + 24h, so A/B's state is evicted at
    # batch end. (A re-arrival of A here would instead EXTEND A's state
    # expiry — dropDuplicatesWithinWatermark refreshes event-time state on
    # every duplicate — which is why the watermark must advance via a
    # different key to observe eviction.)
    write("f1.parquet", [(3, "doc C", t0 + 49 * H)], 1)
    # batch 2: runs WITH watermark t0+25h (watermarks lag one batch: the
    # value used in batch N is computed from events through batch N-1), but
    # input rows are matched against state BEFORE end-of-batch eviction —
    # so this re-arrival of A is still suppressed, and A/B's expired state
    # rows are removed at this batch's end.
    write("f2.parquet", [(4, "doc A", t0 + 50 * H)], 2)
    # batch 3: NOW the state is gone — A must be RE-emitted
    write("f3.parquet", [(5, "doc A", t0 + 51 * H)], 3)

    emitted: list[tuple[int, int]] = []

    def capture(df, batch_id):
        for r in df.collect():
            emitted.append((int(batch_id), r.doc_id))

    raw = (
        spark.readStream.schema("doc_id bigint, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        exact_dedup_stream(raw, "text", event_time_col="ts", dedup_window="24 hours")
        .writeStream.foreachBatch(capture)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    by_batch: dict[int, list[int]] = {}
    for bid, doc in emitted:
        by_batch.setdefault(bid, []).append(doc)
    assert sorted(by_batch.get(0, [])) == [1, 2]  # in-batch duplicate of B suppressed
    assert by_batch.get(1, []) == [3]  # fresh doc; advances the watermark
    assert by_batch.get(2, []) == []  # arrives before end-of-batch eviction
    assert by_batch.get(3, []) == [5]  # past-horizon re-arrival re-emitted
    # state telemetry: rows were actually REMOVED when the watermark passed
    removed = sum(
        op["numRowsRemoved"]
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    assert removed >= 2  # A and B evicted once the watermark passed expiry


def test_gtid_seq_single_tx_form_and_malformed(spark):
    """The default ordering key parses BOTH GTID forms — range
    'host:1-<seq>' and the single-transaction 'host:<seq>' a fresh shard
    emits first — and yields NULL (not an ANSI cast error) for a GTID with
    no trailing digits; materialize coalesces that NULL to -1 so the row
    competes at lowest precedence instead of vanishing from max_by."""
    from debezium_connector_vitess_spark.materialize import gtid_seq, materialize_latest

    vals = spark.createDataFrame(
        [("MySQL56/u:1-57",), ("MySQL56/u:5",), ("garbage",), (None,)], "g STRING"
    ).select(gtid_seq(F.col("g")).alias("s"))
    assert [r.s for r in vals.collect()] == [57, 5, None, None]

    # a malformed-GTID row must not silently delete the key from the snapshot
    env = spark.createDataFrame(
        [
            ("MySQL56/u:5", "c", 1, 10.0),
            ("garbage", "u", 1, 99.0),  # seq -> -1: loses, but present
        ],
        "gtid STRING, op STRING, k INT, v DOUBLE",
    ).select(
        "gtid",
        "op",
        F.struct(F.col("k"), F.col("v")).alias("after"),
        F.lit(None).cast("struct<k:int,v:double>").alias("before"),
        F.struct(F.lit("t").alias("table")).alias("source"),
    )
    out = materialize_latest(env, key_cols=["k"], value_cols=["v"]).collect()
    assert [(r.k, r.v) for r in out] == [(1, 10.0)]


def test_same_gtid_transaction_ties_break_by_change_idx(spark):
    """All row changes of one Vitess transaction share a GTID: the LAST
    change in the transaction must win (change_idx tie-break), batch and
    stream agreeing. UPDATE then DELETE of the same key in one tx => the key
    is gone from the snapshot."""
    import pandas as pd

    from debezium_connector_vitess_spark.materialize import (
        _fold_lww,
        materialize_latest,
    )

    gtid = "MySQL56/u:1-7"
    env = spark.createDataFrame(
        [
            (gtid, "u", 0, 1, 5.0),  # change 0: update
            (gtid, "d", 1, 1, None),  # change 1: delete — must win the tie
        ],
        "gtid STRING, op STRING, change_idx INT, k INT, v DOUBLE",
    ).select(
        "gtid",
        "op",
        "change_idx",
        F.when(F.col("op") != "d", F.struct(F.col("k"), F.col("v"))).alias("after"),
        F.struct(F.col("k"), F.col("v")).alias("before"),
        F.struct(F.lit("t").alias("table")).alias("source"),
    )
    assert materialize_latest(env, key_cols=["k"], value_cols=["v"]).count() == 0

    # the shared streaming fold agrees (same ordering pair)
    pdf = pd.DataFrame(
        {
            "seq": [7, 7],
            "change_idx": [0, 1],
            "op": ["u", "d"],
            "after_json": ["{}", None],
        }
    )
    seq, cidx, op, _ = _fold_lww(None, pdf)
    assert (seq, cidx, op) == (7, 1, "d")
    # null-seq rows are ignored, all-null folds to the stored state (no crash)
    allnull = pd.DataFrame(
        {"seq": [None], "change_idx": [0], "op": ["u"], "after_json": ["{}"]}
    )
    assert _fold_lww((3, 0, "c", "{}"), allnull) == (3, 0, "c", "{}")


def test_stream_compactor_rejects_null_record_key():
    """Keyless tables (with_record_key emits key=NULL) collapse the whole
    table into one state entry — the compactor must reject them loudly."""
    import pandas as pd
    import pytest as _pytest

    from debezium_connector_vitess_spark.materialize import CompactorProcessor

    proc = CompactorProcessor()
    proc.init(_FakeHandle())
    rows = iter(
        [pd.DataFrame({"seq": [1], "change_idx": [0], "op": ["c"], "after_json": ["{}"]})]
    )
    with _pytest.raises(ValueError, match="keyless"):
        list(proc.handleInputRows(("ks", "t", None), rows, _FakeTimerValues(0)))


def test_stream_state_is_keyed_by_keyspace(spark, sf_dir):
    """Same-named tables in different keyspaces must not share compactor
    state: the streaming plan groups by (keyspace, table, key) and the
    output schema carries the keyspace."""
    raw = changelog.events_to_raw_vevents(changelog.load_events(spark, sf_dir))
    out = materialize_stream(_keyed_env(raw))
    assert [f.name for f in out.schema.fields][:3] == ["keyspace", "table_name", "key"]
