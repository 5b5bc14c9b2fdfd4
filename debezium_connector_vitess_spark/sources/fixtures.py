"""Replay-fixture writer: record the deterministic changelog model as VEvent
JSONL files, one per shard — the 'recorded stream' the replay source plays.

Test utility (driver-side, small data); mirrors changelog.py's model so the
streamed output can be compared with the batch pipeline.
"""

from __future__ import annotations

import json
import os

import duckdb

from ..changelog import KEYSPACE, SHARDS


def write_replay_fixture(
    sf_dir: str,
    out_dir: str,
    *,
    limit: int | None = None,
    tx_size: int = 3,
    start_event: int = 0,
) -> dict[str, int]:
    """events.parquet → {out_dir}/{shard}.jsonl. Returns rows-per-shard.

    Events are grouped per shard into transactions of ``tx_size`` row events,
    each bracketed by BEGIN/COMMIT. ``start_event``/``limit`` allow appending
    later windows of the same stream for restart tests.
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
                seq0 = int(chunk[0][0]) + 100
                fh.write(json.dumps({"kind": "BEGIN", "keyspace": KEYSPACE, "seq": seq0,
                                     "ts_ms": int(chunk[0][1])}) + "\n")
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
                    }) + "\n")
                    n += 1
                seq1 = int(chunk[-1][0]) + 100
                fh.write(json.dumps({"kind": "COMMIT", "keyspace": KEYSPACE, "seq": seq1,
                                     "ts_ms": int(chunk[-1][1])}) + "\n")
                n += 1
        counts[shard] = n
    con.close()
    return counts
