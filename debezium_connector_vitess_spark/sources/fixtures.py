"""Replay-fixture writer: record the deterministic changelog model as VEvent
JSONL files, one per shard — the 'recorded stream' the replay source plays.

Test utility (driver-side, small data); mirrors changelog.py's model so the
streamed output can be compared with the batch pipeline.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Callable

import duckdb

from ..changelog import KEYSPACE, SHARDS
from ..vgtid import ShardGtid

# session-level fixture cache: (kind, sf_dir, params) → generated directory.
# Registry queries replay the same deterministic stream every invocation, so
# regenerating the JSONL per call would put driver-side file writes inside the
# timed query (wrong shape at bench/sf0.1+ scale). One generation per process.
_FIXTURE_CACHE: dict[tuple, str] = {}


def cached_fixture_dir(kind: str, sf_dir: str, writer: Callable[..., dict], **kwargs) -> str:
    """Generate a replay fixture once per (kind, sf_dir, params) per process
    and return its directory; later calls reuse the files untouched."""
    key = (kind, os.path.abspath(sf_dir), tuple(sorted(kwargs.items())))
    path = _FIXTURE_CACHE.get(key)
    if path is None or not os.path.isdir(path):
        path = tempfile.mkdtemp(prefix=f"{kind}_")
        writer(sf_dir, path, **kwargs)
        _FIXTURE_CACHE[key] = path
    return path


def write_replay_fixture(
    sf_dir: str,
    out_dir: str,
    *,
    limit: int | None = None,
    tx_size: int = 3,
    start_event: int = 0,
    host_period: int | None = None,
) -> dict[str, int]:
    """events.parquet → {out_dir}/{shard}.jsonl. Returns rows-per-shard.

    Events are grouped per shard into transactions of ``tx_size`` row events,
    each bracketed by BEGIN/COMMIT. ``start_event``/``limit`` allow appending
    later windows of the same stream for restart tests.

    ``host_period=P`` models MySQL failovers: the GTID host cycles
    host0→host1→host2 every P transactions per shard (written as a ``host``
    field on each line), so per-shard epochs advance 1 + txn//P through the
    ordered-tx operator. Default (None) keeps the single-host stream.
    """
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    lim = f"AND event_id >= {start_event}" + (
        f" AND event_id < {start_event + limit}" if limit is not None else ""
    )
    counts: dict[str, int] = {}
    for i, shard in enumerate(SHARDS):
        rows = con.execute(
            f"""
            SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value, props
            FROM '{sf_dir}/events.parquet'
            WHERE user_id % 4 = {i} {lim}
            ORDER BY event_id
            """
        ).fetchall()
        path = os.path.join(out_dir, f"{shard}.jsonl")
        n = 0
        with open(path, "a", encoding="utf-8") as fh:
            for t in range(0, len(rows), tx_size):
                chunk = rows[t : t + tx_size]
                host = ((t // tx_size) // host_period) % 3 if host_period else 0
                hkv = {"host": host} if host_period else {}
                seq0 = int(chunk[0][0]) + 100
                fh.write(json.dumps({"kind": "BEGIN", "keyspace": KEYSPACE, "seq": seq0,
                                     "ts_ms": int(chunk[0][1]), **hkv}) + "\n")
                n += 1
                for event_id, ts_ms, user_id, event_type, value, props in chunk:
                    op_is_c = event_type == "signup"
                    op_is_d = event_type == "error"
                    before = None if op_is_c else {
                        "user_id": str(user_id), "value": str(value - 1.0), "props": props,
                    }
                    after = None if op_is_d else {
                        "user_id": str(user_id), "value": str(value), "props": props,
                    }
                    fh.write(json.dumps({
                        "kind": "ROW",
                        "keyspace": KEYSPACE,
                        "table": f"tbl{int(user_id) % 3}",
                        "seq": int(event_id) + 100,
                        "ts_ms": int(ts_ms),
                        "row_changes": [{"before": before, "after": after}],
                        **hkv,
                    }) + "\n")
                    n += 1
                seq1 = int(chunk[-1][0]) + 100
                fh.write(json.dumps({"kind": "COMMIT", "keyspace": KEYSPACE, "seq": seq1,
                                     "ts_ms": int(chunk[-1][1]), **hkv}) + "\n")
                n += 1
        counts[shard] = n
    con.close()
    return counts


def write_reshard_replay_fixture(
    sf_dir: str,
    out_dir: str,
    *,
    tx_size: int = 10,
) -> dict[str, int]:
    """Replay fixture modeling a 2-way shard split (Reshard, O7/T5).

    Phase 1 (event_id < half, half = (max_event_id+1)//2): two shards,
    ``-80`` (user_id even) and ``80-`` (user_id odd). Phase 2: ``-80`` splits
    into ``-40`` (user_id % 4 == 0) and ``40-80`` (user_id % 4 == 2) — their
    hex key ranges overlap the parent's, which is exactly what epoch lineage
    keys on — while ``80-`` keeps streaming across both phases untouched.
    Per shard, events ordered by event_id form transactions of ``tx_size``;
    commit gtid seq = max(event_id)+100 on host0 (no failovers — any epoch
    movement in this fixture comes from the reshard alone).
    """
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    (half,) = con.execute(
        f"SELECT (max(event_id)+1)//2 FROM '{sf_dir}/events.parquet'"
    ).fetchone()
    shard_preds = {
        "-80": f"user_id % 2 = 0 AND event_id < {half}",
        "80-": "user_id % 2 = 1",
        "-40": f"user_id % 4 = 0 AND event_id >= {half}",
        "40-80": f"user_id % 4 = 2 AND event_id >= {half}",
    }
    counts: dict[str, int] = {}
    for shard, pred in shard_preds.items():
        rows = con.execute(
            f"""
            SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value, props
            FROM '{sf_dir}/events.parquet' WHERE {pred} ORDER BY event_id
            """
        ).fetchall()
        path = os.path.join(out_dir, f"{shard}.jsonl")
        n = 0
        with open(path, "w", encoding="utf-8") as fh:
            for t in range(0, len(rows), tx_size):
                chunk = rows[t : t + tx_size]
                seq = int(chunk[-1][0]) + 100
                fh.write(json.dumps({"kind": "BEGIN", "keyspace": KEYSPACE,
                                     "seq": int(chunk[0][0]) + 100,
                                     "ts_ms": int(chunk[0][1])}) + "\n")
                n += 1
                for event_id, ts_ms, user_id, event_type, value, props in chunk:
                    fh.write(json.dumps({
                        "kind": "ROW", "keyspace": KEYSPACE,
                        "table": f"tbl{int(user_id) % 3}",
                        "seq": int(event_id) + 100, "ts_ms": int(ts_ms),
                        "row_changes": [{"before": None, "after": {
                            "user_id": str(user_id), "value": str(value),
                            "props": props}}],
                    }) + "\n")
                    n += 1
                fh.write(json.dumps({"kind": "COMMIT", "keyspace": KEYSPACE,
                                     "seq": seq,
                                     "ts_ms": int(chunk[-1][1])}) + "\n")
                n += 1
        counts[shard] = n
    con.close()
    return counts


def write_wire_replay_fixture(
    sf_dir: str,
    out_dir: str,
    *,
    tx_size: int = 10,
    limit: int | None = None,
    start_event: int = 0,
) -> dict[str, int]:
    """events.parquet → {out_dir}/{shard}.jsonl in the *wire* format: each
    line a protobuf-shaped VEvent (sources/wire.py serde) whose ROW events
    carry packed ``query.Row`` images (lengths + concatenated bytes).

    Stream shape per shard (mirrors a live VStream): one FIELD event per
    table inside the first transaction, then per transaction of ``tx_size``
    row events: BEGIN, ROWs, VGTID (the commit position — all events in a tx
    share it), COMMIT. The deterministic model matches the duckdb oracle of
    ``cdc_envelope_wire``: tx n on a shard covers that shard's events ranked
    [n*tx_size, (n+1)*tx_size) by event_id; commit seq = max(event_id)+100.
    """
    from .wire import (
        WireField,
        WireFieldEvent,
        WireRowChange,
        WireRowEvent,
        WireVEvent,
        WireVgtid,
        pack_row,
        vevent_to_json,
    )

    os.makedirs(out_dir, exist_ok=True)
    lim = f"AND event_id >= {start_event}" + (
        f" AND event_id < {start_event + limit}" if limit is not None else ""
    )
    con = duckdb.connect()
    table_fields = (
        WireField("user_id", "INT64", "bigint(20)", 3),
        WireField("value", "FLOAT64", "double", 0),
        WireField("props", "JSON", "json", 0),
    )
    counts: dict[str, int] = {}
    for i, shard in enumerate(SHARDS):
        rows = con.execute(
            f"""
            SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value, props
            FROM '{sf_dir}/events.parquet'
            WHERE user_id % 4 = {i} {lim}
            ORDER BY event_id
            """
        ).fetchall()
        path = os.path.join(out_dir, f"{shard}.jsonl")
        n = 0

        def w(fh, ev):
            fh.write(vevent_to_json(ev) + "\n")

        with open(path, "a", encoding="utf-8") as fh:
            for t in range(0, len(rows), tx_size):
                chunk = rows[t : t + tx_size]
                ts0_ns = int(chunk[0][1]) * 1_000_000
                w(fh, WireVEvent("BEGIN", current_time=ts0_ns, keyspace=KEYSPACE, shard=shard))
                n += 1
                if t == 0 and start_event == 0:
                    for tbl in ("tbl0", "tbl1", "tbl2"):
                        w(fh, WireVEvent(
                            "FIELD",
                            current_time=ts0_ns,
                            field_event=WireFieldEvent(
                                table_name=f"{KEYSPACE}.{tbl}",
                                fields=table_fields,
                                keyspace=KEYSPACE,
                                shard=shard,
                            ),
                        ))
                        n += 1
                for event_id, ts_ms, user_id, event_type, value, props in chunk:
                    op_is_c = event_type == "signup"
                    op_is_d = event_type == "error"
                    props_cell = props.encode() if props is not None else None
                    before = None if op_is_c else pack_row([
                        str(user_id).encode(),
                        repr(float(value) - 1.0).encode(),
                        props_cell,
                    ])
                    after = None if op_is_d else pack_row([
                        str(user_id).encode(),
                        repr(float(value)).encode(),
                        props_cell,
                    ])
                    w(fh, WireVEvent(
                        "ROW",
                        current_time=int(ts_ms) * 1_000_000,
                        row_event=WireRowEvent(
                            table_name=f"{KEYSPACE}.tbl{int(user_id) % 3}",
                            row_changes=(WireRowChange(before=before, after=after),),
                            keyspace=KEYSPACE,
                            shard=shard,
                        ),
                    ))
                    n += 1
                commit_seq = int(chunk[-1][0]) + 100
                ts1_ns = int(chunk[-1][1]) * 1_000_000
                w(fh, WireVEvent(
                    "VGTID",
                    current_time=ts1_ns,
                    vgtid=WireVgtid(shard_gtids=(
                        ShardGtid(KEYSPACE, shard, f"MySQL56/host0:1-{commit_seq}"),
                    )),
                ))
                n += 1
                w(fh, WireVEvent("COMMIT", current_time=ts1_ns, keyspace=KEYSPACE, shard=shard))
                n += 1
        counts[shard] = n
    con.close()
    return counts


def write_wire_copy_fixture(
    sf_dir: str,
    out_dir: str,
    *,
    rows_per_tx: int = 25,
    stream_txs: int = 4,
    tx_size: int = 10,
) -> dict[str, int]:
    """Wire-format recorded stream WITH a VStream Copy phase prelude.

    Per shard (mirrors the reference's copy shapes,
    VitessReplicationConnection.java:166-240 + TablePrimaryKeys.java:27-368):
    for each table in order, chunked copy transactions
    ``[BEGIN, FIELD(enum_set_string_values), VGTID(copy pos + table_p_ks
    lastpk), ROW inserts, COMMIT]`` — including one duplicate-BEGIN quirk tx
    ``[BEGIN, FIELD]`` then a fresh BEGIN — then ``COPY_COMPLETED`` riding
    ahead of the first regular transaction, then ``stream_txs`` normal
    transactions. Copy VGTIDs pin the shard gtid at the copy base position;
    the stream phase advances past it.
    """
    import duckdb as _duckdb

    from ..vgtid import TableLastPK
    from .wire import (
        WireField,
        WireFieldEvent,
        WireRowChange,
        WireRowEvent,
        WireVEvent,
        WireVgtid,
        pack_row,
        vevent_to_json,
    )

    os.makedirs(out_dir, exist_ok=True)
    con = _duckdb.connect()
    table_fields = (
        WireField("user_id", "INT64", "bigint(20)", 3),
        WireField("value", "FLOAT64", "double", 0),
        WireField("props", "JSON", "json", 0),
    )
    COPY_SEQ = 50  # copy-phase base position; stream seqs start above it
    counts: dict[str, int] = {}
    for i, shard in enumerate(SHARDS):
        users = con.execute(
            f"""
            SELECT DISTINCT user_id FROM '{sf_dir}/events.parquet'
            WHERE user_id % 4 = {i} ORDER BY user_id
            """
        ).fetchall()
        path = os.path.join(out_dir, f"{shard}.jsonl")
        n = 0

        def w(fh, ev):
            nonlocal n
            fh.write(vevent_to_json(ev) + "\n")
            n += 1

        def copy_vgtid(table_i: int, lastpk: int | None):
            """Copy-state VGTID: table_p_ks lists EVERY unfinished table —
            the in-progress one with its lastpk, later ones with an empty
            lastpk — exactly how Vitess tracks copy progress (entries are
            removed as tables complete; empty table_p_ks = copy done)."""
            tpks = []
            if lastpk is not None:
                tpks.append(TableLastPK(table_name=f"tbl{table_i}",
                                        lastpk={"fields": [{"name": "user_id"}],
                                                "rows": [str(lastpk)]}))
                pending_from = table_i + 1
            else:
                pending_from = table_i + 1
            for j in range(pending_from, 3):
                tpks.append(TableLastPK(table_name=f"tbl{j}", lastpk={}))
            return WireVgtid(shard_gtids=(
                ShardGtid(KEYSPACE, shard, f"MySQL56/host0:1-{COPY_SEQ}", tuple(tpks)),))

        with open(path, "w", encoding="utf-8") as fh:
            for tbl_i in range(3):
                tbl = f"tbl{tbl_i}"
                rows = [u for (u,) in users if u % 3 == tbl_i]
                fe = WireFieldEvent(
                    table_name=f"{KEYSPACE}.{tbl}", fields=table_fields,
                    keyspace=KEYSPACE, shard=shard, enum_set_string_values=True,
                )
                if tbl_i == 0:
                    # the copy-phase duplicate-BEGIN quirk: [BEGIN, FIELD]
                    # then a fresh BEGIN (no records were copied)
                    w(fh, WireVEvent("BEGIN", keyspace=KEYSPACE, shard=shard))
                    w(fh, WireVEvent("FIELD", field_event=fe))
                for t in range(0, len(rows), rows_per_tx):
                    chunk = rows[t : t + rows_per_tx]
                    w(fh, WireVEvent("BEGIN", keyspace=KEYSPACE, shard=shard))
                    w(fh, WireVEvent("FIELD", field_event=fe))
                    for uid in chunk:
                        w(fh, WireVEvent("ROW", row_event=WireRowEvent(
                            table_name=f"{KEYSPACE}.{tbl}",
                            row_changes=(WireRowChange(after=pack_row([
                                str(uid).encode(), b"0.0", None])),),
                            keyspace=KEYSPACE, shard=shard,
                        )))
                    done = t + rows_per_tx >= len(rows)
                    w(fh, WireVEvent("VGTID", vgtid=copy_vgtid(
                        tbl_i, None if done else chunk[-1])))
                    w(fh, WireVEvent("COMMIT", keyspace=KEYSPACE, shard=shard))
            # copy finished: COPY_COMPLETED rides ahead of the first regular tx
            w(fh, WireVEvent("COPY_COMPLETED", keyspace=KEYSPACE, shard=shard))
            for s_tx in range(stream_txs):
                seq = COPY_SEQ + (s_tx + 1) * tx_size
                w(fh, WireVEvent("BEGIN", keyspace=KEYSPACE, shard=shard))
                for k in range(tx_size):
                    uid = users[k % len(users)][0] if users else 1
                    w(fh, WireVEvent("ROW", row_event=WireRowEvent(
                        table_name=f"{KEYSPACE}.tbl{int(uid) % 3}",
                        row_changes=(WireRowChange(
                            before=pack_row([str(uid).encode(), b"0.0", None]),
                            after=pack_row([str(uid).encode(), b"1.0", None]),
                        ),),
                        keyspace=KEYSPACE, shard=shard,
                    )))
                w(fh, WireVEvent("VGTID", vgtid=WireVgtid(shard_gtids=(
                    ShardGtid(KEYSPACE, shard, f"MySQL56/host0:1-{seq}"),))))
                w(fh, WireVEvent("COMMIT", keyspace=KEYSPACE, shard=shard))
        counts[shard] = n
    con.close()
    return counts


def write_dedup_stream_fixture(sf_dir: str, out_dir: str, *, copy_files: int = 2) -> dict[str, int]:
    """Ordered micro-batch corpus for the streaming exact-dedup leg of the
    ``dedup_exact`` registry row: a bootstrap + incremental-ingest replay.

    File 0 (oldest mtime) = the batch-deduplicated originals — the snapshot a
    production pipeline bootstraps its dedup state from. Files 1..copy_files
    (strictly later mtimes) = exact duplicate copies with shifted ids — the
    re-arrivals a continuous ingest must suppress. Spark's file stream source
    with ``maxFilesPerTrigger=1`` and ``latestFirst=false`` (the default)
    processes files oldest-first, so arrival order is deterministic and
    first-arrival-wins equals min-id-wins — the same answer as batch
    :func:`~..ops.dedup.exact_dedup` and one DuckDB oracle serves both legs.

    Winner selection uses the oracle's own normalization SQL so a corpus with
    intra-original exact dupes (sf0.1 has 8) still yields one deterministic
    winner per content hash in file 0.
    """
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    norm = (
        "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),"
        " '\\s+', ' ', 'g'))"
    )
    f0 = os.path.join(out_dir, "batch_000_bootstrap.parquet")
    con.execute(
        f"""
        COPY (
          SELECT min(doc_id) AS doc_id, arg_min(text, doc_id) AS text
          FROM '{sf_dir}/documents.parquet'
          GROUP BY md5({norm}) ORDER BY doc_id
        ) TO '{f0}' (FORMAT PARQUET)
        """
    )
    counts = {os.path.basename(f0): con.execute(f"SELECT count(*) FROM '{f0}'").fetchone()[0]}
    for i in range(copy_files):
        fi = os.path.join(out_dir, f"batch_{i + 1:03d}_copies.parquet")
        con.execute(
            f"""
            COPY (
              SELECT doc_id + 100000 AS doc_id, text
              FROM '{sf_dir}/documents.parquet'
              WHERE doc_id % {copy_files} = {i} ORDER BY doc_id
            ) TO '{fi}' (FORMAT PARQUET)
            """
        )
        counts[os.path.basename(fi)] = con.execute(
            f"SELECT count(*) FROM '{fi}'"
        ).fetchone()[0]
    con.close()
    # stagger mtimes so oldest-first discovery order == bootstrap, copies...
    base = os.path.getmtime(f0)
    for j, name in enumerate(sorted(counts)):
        p = os.path.join(out_dir, name)
        os.utime(p, (base + 10 * j, base + 10 * j))
    return counts


def write_minhash_stream_fixture(
    sf_dir: str, out_dir: str, *, copy_files: int = 2, n_fresh: int = 20
) -> dict[str, int]:
    """Ordered micro-batch corpus for the streaming MinHash-LSH dedup leg of
    the ``dedup_minhash_lsh`` registry row — the bootstrap-then-ingest replay
    shape ``write_dedup_stream_fixture`` established.

    File 0 (oldest mtime) = ALL originals — the corpus whose LSH buckets
    seed the stream state. Files 1..copy_files = exact duplicate copies of
    the EVEN-id originals with shifted ids (+100000), split across files so
    suppression provably crosses micro-batch boundaries. The last file =
    ``n_fresh`` genuinely-new documents (ids 200000+, mutually disjoint
    vocabularies) — the negative control: they enter the same LSH buckets
    pipeline but have no ≥-threshold partner, so batch-side verification
    must drop every one of them."""
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    f0 = os.path.join(out_dir, "batch_000_bootstrap.parquet")
    con.execute(
        f"""
        COPY (
          SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id
        ) TO '{f0}' (FORMAT PARQUET)
        """
    )
    counts = {
        os.path.basename(f0): con.execute(
            f"SELECT count(*) FROM '{f0}'"
        ).fetchone()[0]
    }
    for i in range(copy_files):
        fi = os.path.join(out_dir, f"batch_{i + 1:03d}_copies.parquet")
        con.execute(
            f"""
            COPY (
              SELECT doc_id + 100000 AS doc_id, text
              FROM '{sf_dir}/documents.parquet'
              WHERE doc_id % 2 = 0 AND (doc_id // 2) % {copy_files} = {i}
              ORDER BY doc_id
            ) TO '{fi}' (FORMAT PARQUET)
            """
        )
        counts[os.path.basename(fi)] = con.execute(
            f"SELECT count(*) FROM '{fi}'"
        ).fetchone()[0]
    ff = os.path.join(out_dir, f"batch_{copy_files + 1:03d}_fresh.parquet")
    fresh_rows = ", ".join(
        f"(200000 + {i}, 'fresh negative control ' || "
        f"'aa{i}x bb{i}y cc{i}z dd{i}w ee{i}v ff{i}u')"
        for i in range(n_fresh)
    )
    con.execute(
        f"COPY (SELECT * FROM (VALUES {fresh_rows}) t(doc_id, text) "
        f"ORDER BY doc_id) TO '{ff}' (FORMAT PARQUET)"
    )
    counts[os.path.basename(ff)] = n_fresh
    con.close()
    # stagger mtimes so oldest-first discovery order == bootstrap, copies,
    # fresh
    base = os.path.getmtime(f0)
    for j, name in enumerate(sorted(counts)):
        p = os.path.join(out_dir, name)
        os.utime(p, (base + 10 * j, base + 10 * j))
    return counts


#: epoch ms of 2024-01-01T00:00:00Z — hour-aligned, so the synthetic
#: document event times land on Spark's epoch-aligned window boundaries
PROFILE_STREAM_T0_MS = 1704067200000


def write_profile_stream_fixture(
    sf_dir: str, out_dir: str, *, n_files: int = 3, sentinel_hours: int = 8
) -> dict[str, int]:
    """Time-ordered micro-batch replay for the streaming leg of the
    ``corpus_health`` registry row: the documents table with a synthetic
    in-order event time (``ts_ms = T0 + doc_id minutes`` — the arrival
    clock of a continuous crawl feed), split into ``n_files`` contiguous
    event-time ranges, followed by TWO clock-advancing sentinel files on
    the reserved source '__advance__' (same two-file flush protocol as
    ``write_rate_stream_fixture``: the first advances the watermark, the
    second's batch emits the final windows). Sentinel rows are excluded
    post-aggregation and never enter state."""
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    base_select = f"""
      SELECT doc_id, source, text,
             {PROFILE_STREAM_T0_MS} + doc_id * 60000 AS ts_ms,
             ntile({n_files}) OVER (ORDER BY doc_id) AS part
      FROM '{sf_dir}/documents.parquet'
    """
    counts: dict[str, int] = {}
    for i in range(n_files):
        fi = os.path.join(out_dir, f"batch_{i:03d}.parquet")
        con.execute(
            f"""
            COPY (
              SELECT doc_id, source, text, ts_ms FROM ({base_select})
              WHERE part = {i + 1} ORDER BY ts_ms
            ) TO '{fi}' (FORMAT PARQUET)
            """
        )
        counts[os.path.basename(fi)] = con.execute(
            f"SELECT count(*) FROM '{fi}'"
        ).fetchone()[0]
    for k in range(2):
        fs = os.path.join(out_dir, f"batch_{n_files + k:03d}_sentinel.parquet")
        con.execute(
            f"""
            COPY (
              SELECT CAST(-1 AS BIGINT) AS doc_id, '__advance__' AS source,
                     '' AS text,
                     {PROFILE_STREAM_T0_MS} + max(doc_id) * 60000
                       + {sentinel_hours + k} * 3600000 AS ts_ms
              FROM '{sf_dir}/documents.parquet'
            ) TO '{fs}' (FORMAT PARQUET)
            """
        )
        counts[os.path.basename(fs)] = 1
    con.close()
    # backdated mtimes: a future-stamped file is invisible to the stream's
    # availableNow snapshot (see write_rate_stream_fixture)
    base = os.path.getmtime(fs)
    names = sorted(counts)
    for j, name in enumerate(names):
        p = os.path.join(out_dir, name)
        t = base - 10 * (len(names) - 1 - j)
        os.utime(p, (t, t))
    return counts


def write_rate_stream_fixture(
    sf_dir: str, out_dir: str, *, n_files: int = 3, sentinel_hours: int = 8
) -> dict[str, int]:
    """Time-ordered micro-batch replay for the streaming leg of the
    ``change_rate_windows`` registry row.

    Files 0..n_files-1 split the events stream into contiguous event-time
    ranges (oldest mtime first, so ``maxFilesPerTrigger=1`` replays them in
    arrival == event-time order — the in-order CDC stream). The final files
    hold clock-advancing sentinel rows stamped past ``max(ts) +
    sentinel_hours`` on the reserved table name '__advance__': they play the
    reference's heartbeat role (S7 — move the position forward without data)
    and push the watermark past every real window's end so append mode
    emits them all; the rows themselves are excluded after the watermark
    node and never enter aggregate state.
    """
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    shard_sql = "(['-40','40-80','80-c0','c0-'])[CAST(user_id % 4 AS INT) + 1]"
    op_sql = "CASE WHEN event_type='signup' THEN 'c' WHEN event_type='error' THEN 'd' ELSE 'u' END"
    base_select = f"""
      SELECT epoch_ms(ts) AS ts_ms, 'tbl' || CAST(user_id % 3 AS VARCHAR) AS table_name,
             {shard_sql} AS shard, {op_sql} AS op,
             ntile({n_files}) OVER (ORDER BY ts, event_id) AS part
      FROM '{sf_dir}/events.parquet'
    """
    counts: dict[str, int] = {}
    for i in range(n_files):
        fi = os.path.join(out_dir, f"batch_{i:03d}.parquet")
        con.execute(
            f"""
            COPY (
              SELECT ts_ms, table_name, shard, op FROM ({base_select})
              WHERE part = {i + 1} ORDER BY ts_ms
            ) TO '{fi}' (FORMAT PARQUET)
            """
        )
        counts[os.path.basename(fi)] = con.execute(
            f"SELECT count(*) FROM '{fi}'"
        ).fetchone()[0]
    # TWO sentinel files: the watermark used by micro-batch N is computed
    # from data through batch N-1, so a single clock-advance would close the
    # final windows without any later batch left to EMIT them (availableNow
    # runs no flush batch after the last file). Sentinel #1 advances the
    # clock; sentinel #2's batch runs under that advanced watermark and
    # flushes every real window.
    for k in range(2):
        fs = os.path.join(out_dir, f"batch_{n_files + k:03d}_sentinel.parquet")
        con.execute(
            f"""
            COPY (
              SELECT epoch_ms(max(ts)) + {sentinel_hours + k} * 3600000 AS ts_ms,
                     '__advance__' AS table_name, '-' AS shard, 'u' AS op
              FROM '{sf_dir}/events.parquet'
            ) TO '{fs}' (FORMAT PARQUET)
            """
        )
        counts[os.path.basename(fs)] = 1
    con.close()
    # stagger mtimes BACKWARD from now: a file stamped in the future is
    # invisible to the stream's availableNow snapshot if the query starts
    # within the stagger span (observed — the sentinel batches silently
    # became empty no-data batches and the final windows never flushed)
    base = os.path.getmtime(fs)
    names = sorted(counts)
    for j, name in enumerate(names):
        p = os.path.join(out_dir, name)
        t = base - 10 * (len(names) - 1 - j)
        os.utime(p, (t, t))
    return counts
