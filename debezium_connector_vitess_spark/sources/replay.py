"""File-replay streaming source: recorded VEvent JSONL → raw VEvent frame.

The replay source is the test/bounded stand-in for the live VStream gRPC
source (SURVEY.md §7.1 step 3: "a file/replay mode that streams recorded
VEvent JSON replaces the live gRPC dependency"). It exercises the exact
offset/partition contract the live source uses:

- one input partition per shard (reference: shards round-robined over tasks,
  VitessConnector.java:87-156; Spark schedules the partitions);
- offsets are ``{shard: line_position}`` documents that only land on
  transaction boundaries (O1 rotate/reset protocol: a restart never replays a
  half transaction because positions between BEGIN and COMMIT are never
  reported);
- restart resumes from the checkpointed offset (O2).

Layout: ``{path}/{shard}.jsonl``, one VEvent per line:
``{"kind": "BEGIN|ROW|COMMIT|FIELD|DDL|HEARTBEAT|OTHER", "keyspace": str,
"table": str|null, "seq": int, "ts_ms": int,
"row_changes": [{"before": {..}|null, "after": {..}|null}]|null,
"statement": str|null,
"fields": [{"name": str, "type": str, "column_type": str, "flags": int}]|null}``.
``seq`` is the per-shard GTID sequence after the event. FIELD events carry the
table's column metadata (D4 schema inference — the binlogdata.FieldEvent
analog); they ride inside or ahead of a transaction and are never an offset
boundary on their own (they describe the rows that follow).

Wire format (``option("wireFormat", "true")``): each line is a protobuf-shaped
VEvent (sources/wire.py serde) whose ROW events carry *packed* row images —
``{"lengths": [...], "values": "<base64>"}``, the ``query.Row`` wire shape —
and the executor read path reassembles transactions with the VStream response
state machine and decodes rows against the FIELD-derived schema, exactly as
the live gRPC source does (VStreamOutputMessageDecoder.java:298-329).
"""

from __future__ import annotations

import json
import os
from bisect import bisect_right
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

from .buffer import _FLUSH_KINDS, TransactionBuffer

FORMAT_NAME = "vitess-replay"

_NON_BOUNDARY_KINDS = {"FIELD", "VGTID", "VERSION", "COPY_COMPLETED"}

# matches the FIELD type tag under any json.dumps spacing — a substring pinned
# to separators=(',', ':') misses '"type": "FIELD"' and breaks wire restarts
import re as _re

_FIELD_LINE_RE = _re.compile(r'"type"\s*:\s*"FIELD"')

# fast kind extraction for the boundary scan: every fixture line is a
# json.dumps'd dict whose FIRST key is the kind ("kind" for plain replay,
# "type" for wire serde — sources/fixtures.py + wire.vevent_to_json), so a
# prefix match replaces a full json.loads per line (measured 8× faster on the
# sf0.1 wire fixture's latestOffset scan). Lines the prefix doesn't match
# (hand-written fixtures, different key order) fall back to json.loads.
_KIND_PREFIX_RE = _re.compile(rb'^\{"(?:kind|type)":\s*"([A-Za-z_]+)"')

from itertools import islice

#: rows per Arrow batch out of ``read()`` — bounds worker memory while
#: keeping batches large enough for the columnar build to amortize
_ARROW_BATCH_ROWS = 16384

_ARROW_SCHEMA_CACHE = []


def _arrow_event_schema():
    """Arrow schema for RAW_EVENT_SCHEMA — the exact schema the Spark worker
    derives for this source (pyspark's ``to_arrow_schema``), cached."""
    if not _ARROW_SCHEMA_CACHE:
        from pyspark.sql.pandas.types import to_arrow_schema

        from ..decode import RAW_EVENT_SCHEMA

        _ARROW_SCHEMA_CACHE.append(to_arrow_schema(RAW_EVENT_SCHEMA))
    return _ARROW_SCHEMA_CACHE[0]


def _rows_to_arrow_batch(rows: list, schema):
    """RAW_EVENT_SCHEMA tuples → one ``pyarrow.RecordBatch``, built
    column-wise. Struct-typed values are shaped as dicts (pyarrow's struct
    builder rejects tuples); everything else converts natively. Output is
    byte-identical to the Spark worker's per-value converter path
    (test_replay_arrow_batches_match_rows) at ~3× less Python work."""
    import pyarrow as pa

    cols = list(zip(*rows))
    row_changes = [
        None if v is None else [{"before": b, "after": a} for (b, a) in v]
        for v in cols[8]
    ]
    fields = [
        None
        if v is None
        else [
            {"name": n, "type": t, "column_type": ct, "flags": fl}
            for (n, t, ct, fl) in v
        ]
        for v in cols[10]
    ]
    data = list(cols[:8]) + [row_changes, cols[9], fields]
    arrays = [
        pa.array(data[i], type=schema.field(i).type) for i in range(len(data))
    ]
    return pa.RecordBatch.from_arrays(arrays, schema=schema)


def _shard_files(path: str) -> dict[str, str]:
    return {
        f[: -len(".jsonl")]: os.path.join(path, f)
        for f in sorted(os.listdir(path))
        if f.endswith(".jsonl")
    }


class _BoundaryIndex:
    """Incremental per-file index of transaction-boundary line numbers.

    ``latestOffset`` runs once per trigger on the driver; re-reading and
    json-parsing the whole file every time is a driver bottleneck once the
    replay grows. Cache the parse state per file — consumed byte offset, line
    count, open-transaction depth, and the sorted list of boundary line
    numbers — and scan only the bytes appended since the previous call. A
    file whose size shrank (rewritten fixture) resets its state. Only
    complete lines (terminated by a newline) are consumed, so a
    partially-flushed trailing line is left for the next call.
    """

    def __init__(self) -> None:
        self._state: dict[str, dict] = {}

    def boundaries(self, file_path: str) -> list[int]:
        size = os.path.getsize(file_path)
        st = self._state.get(file_path)
        if st is None or size < st["size"]:
            st = {
                "size": 0,
                "offset": 0,
                "line": 0,
                "depth": 0,
                "bounds": [],
                "bbytes": [],
            }
            self._state[file_path] = st
        if size > st["size"]:
            with open(file_path, "rb") as fh:
                fh.seek(st["offset"])
                chunk = fh.read(size - st["offset"])
            last_nl = chunk.rfind(b"\n")
            if last_nl >= 0:
                complete = chunk[: last_nl + 1]
                pos = st["offset"]
                for raw in complete.split(b"\n")[:-1]:
                    st["line"] += 1
                    pos += len(raw) + 1
                    if not raw.strip():
                        continue
                    # the scan needs only the kind tag; the prefix regex
                    # replaces a full json.loads per line (the driver-side
                    # latestOffset bottleneck on large replays), with a
                    # json.loads fallback for lines the prefix doesn't match
                    m = _KIND_PREFIX_RE.match(raw)
                    if m is not None:
                        kind = m.group(1).decode("ascii")
                    else:
                        d = json.loads(raw)
                        kind = d.get("kind") or d.get("type")
                    if kind == "BEGIN":
                        st["depth"] = 1
                    elif kind == "COMMIT":
                        st["depth"] = 0
                        st["bounds"].append(st["line"])
                        st["bbytes"].append(pos)
                    elif st["depth"] == 1 and kind in _FLUSH_KINDS:
                        # mid-tx DDL/OTHER/HEARTBEAT: TransactionBuffer's
                        # sendNow path flushes AND closes the open group
                        # (reference VitessReplicationConnection.java:206-217)
                        # — the index must agree or it plans ranges the
                        # executor's buffer reports as pending
                        st["depth"] = 0
                        st["bounds"].append(st["line"])
                        st["bbytes"].append(pos)
                    elif st["depth"] == 0 and kind not in _NON_BOUNDARY_KINDS:
                        # DDL/HEARTBEAT/OTHER outside a tx are their own
                        # boundary; FIELD/VGTID/VERSION/COPY_COMPLETED are
                        # not — they describe or position the rows that
                        # follow, so they must land in the same micro-batch
                        st["bounds"].append(st["line"])
                        st["bbytes"].append(pos)
                st["offset"] += len(complete)
            st["size"] = size
        return st["bounds"]

    def byte_for_line(self, file_path: str, line: int) -> int | None:
        """Byte offset where ``line`` (an offset value: count of consumed
        lines, always a boundary or 0) ends — lets the executor seek instead
        of reading-and-discarding every prior line (O(L²) across capped
        micro-batches otherwise). None when the line isn't a known boundary
        (e.g. a restart offset predating this index instance's file state)."""
        if line == 0:
            return 0
        st = self._state.get(file_path)
        if st is None:
            return None
        i = bisect_right(st["bounds"], line) - 1
        if i >= 0 and st["bounds"][i] == line:
            return st["bbytes"][i]
        return None


def _capped_end(bounds: list[int], start: int, cap: int | None) -> int:
    """Furthest boundary the source may report for one shard.

    O1 semantics: only whole transactions, so the end is always a boundary
    line. With a record cap (E3 analog of the reference's bounded
    ``ChangeEventQueue``, max.batch.size — VitessConnectorTask.java:118-125),
    pick the largest boundary within ``start + cap``; if even the first
    pending transaction exceeds the cap, take it whole anyway (a transaction
    never splits across micro-batches), which matches the reference where an
    oversized transaction still flows through the queue as one unit.
    """
    if not bounds:
        return start
    latest = bounds[-1]
    if latest <= start:
        return start
    if cap is None:
        return latest
    i = bisect_right(bounds, start + cap)
    if i == 0 or bounds[i - 1] <= start:
        # no boundary within the cap: take the first one past start
        return bounds[bisect_right(bounds, start)]
    return bounds[i - 1]


def local_vgtid_json(keyspace: str, shard: str, seq: int, host: int = 0) -> str:
    return json.dumps(
        [{"keyspace": keyspace, "shard": shard, "gtid": f"MySQL56/host{host}:1-{seq}"}],
        separators=(",", ":"),
    )


@dataclass
class ReplayPartition(InputPartition):
    shard: str
    file_path: str
    start_line: int
    end_line: int
    wire: bool = False
    keyspace: str = ""
    exclude_keyspace: bool = False
    # byte range resolved from the driver's boundary index: the executor
    # seeks instead of re-reading every prior line (None = fall back)
    start_byte: int | None = None
    end_byte: int | None = None


def _truthy(v) -> bool:
    return str(v).lower() in ("true", "1", "yes")


class VitessReplayStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self._path = options.get("path")
        if not self._path:
            raise ValueError("vitess-replay requires a 'path' option")
        self._files = _shard_files(self._path)
        if not self._files:
            raise ValueError(f"no {{shard}}.jsonl replay files under {self._path}")
        # one index per reader: latestOffset scans only appended bytes per
        # trigger instead of re-parsing every line of every shard file
        self._index = _BoundaryIndex()
        # E3 batch cap. Limitation of the Python streaming-source API: there
        # is no admission-control latestOffset(start, limit) variant, and the
        # runner asks for latestOffset before initialOffset/partitions reveal
        # the start, so after a restart-past-clean-commit the FIRST
        # micro-batch is uncapped; every subsequent batch is bounded relative
        # to the last planned end. Mitigation: ``watermarkDir`` persists the
        # planned watermark in a sidecar (the planned end rides outside the
        # engine's offset WAL, which the reader never gets to read back), so
        # a cold start resumes capping from where the previous run planned.
        # (Under the availableNow/once single-batch fallback the whole run is
        # one batch by Spark's design.)
        max_records = options.get("maxrecordsperbatch") or options.get(
            "maxRecordsPerBatch"
        )
        self._max_records = int(max_records) if max_records is not None else None
        self._watermark_file = None
        wm_dir = options.get("watermarkdir") or options.get("watermarkDir")
        if not wm_dir and self._max_records is not None:
            # DEFAULT-ON restart cap: when batches are capped, the sidecar is
            # derived from the source path (`<path>/_watermark`) so a cold
            # start against a large backlog is bounded with no extra options.
            # (The Python streaming-source API never lets the reader see the
            # checkpoint dir, so the source path is the stable anchor.) A
            # read-only source path degrades gracefully to the documented
            # uncapped-first-batch behavior.
            wm_dir = os.path.join(self._path, "_watermark")
        if wm_dir:
            try:
                os.makedirs(wm_dir, exist_ok=True)
                self._watermark_file = os.path.join(wm_dir, "planned_watermark.json")
            except OSError:
                self._watermark_file = None
        self._wire = _truthy(options.get("wireformat") or options.get("wireFormat") or "")
        self._keyspace = options.get("keyspace", "")
        self._exclude_keyspace = _truthy(
            options.get("excludekeyspacefromtablename")
            or options.get("excludeKeyspaceFromTableName")
            or ""
        )
        # O7 / stop_on_reshard: remember the shard set we subscribed to; a
        # later re-list that differs is a reshard
        self._stop_on_reshard = _truthy(
            options.get("stoponreshard") or options.get("stopOnReshard") or ""
        )
        self._subscribed_shards = frozenset(self._files)
        # last planned end per shard, so latestOffset can cap the next batch
        # relative to where the previous one stopped (E3 backpressure); kept
        # current from initialOffset / partitions / commit, and re-loaded
        # from the watermark sidecar on a cold start so the first batch after
        # a restart is bounded too
        self._planned: dict[str, int] | None = self._load_watermark()

    def _load_watermark(self) -> dict[str, int] | None:
        if self._watermark_file is None or not os.path.exists(self._watermark_file):
            return None
        try:
            with open(self._watermark_file, "r", encoding="utf-8") as fh:
                return {str(k): int(v) for k, v in json.load(fh).items()}
        except (ValueError, OSError):
            return None  # unreadable sidecar: fall back to the documented cold-start behavior

    def _save_watermark(self) -> None:
        if self._watermark_file is None or self._planned is None:
            return
        tmp = self._watermark_file + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(self._planned, fh)
        os.replace(tmp, self._watermark_file)

    def initialOffset(self) -> dict:
        # start of stream = empty position per shard (snapshot.mode analog:
        # replay files begin with the copy-phase transactions). Only FRESH
        # queries reach here (restarts resume from the checkpoint), so also
        # reset the sidecar: a stale watermark left by a previous query over
        # the same replay dir must not leak into this query's capping.
        self._planned = {shard: 0 for shard in self._files}
        self._save_watermark()
        return {shard: 0 for shard in self._files}

    def latestOffset(self) -> dict:
        # re-list so shards added between batches are picked up (reshard, O7)
        self._files = _shard_files(self._path)
        if self._stop_on_reshard and frozenset(self._files) != self._subscribed_shards:
            from .wire import ReshardDetectedError

            raise ReshardDetectedError(
                f"shard set changed from {sorted(self._subscribed_shards)} to "
                f"{sorted(self._files)} with stop_on_reshard set"
            )
        end = {}
        for shard, f in self._files.items():
            bounds = self._index.boundaries(f)
            start = (self._planned or {}).get(shard, 0)
            # clamp a STALE sidecar: the runner calls latestOffset before
            # initialOffset on a fresh query, so a watermark left by a
            # previous query over a since-regenerated (shorter) fixture
            # would otherwise commit an end past EOF and permanently skip
            # lines appended later — silent data loss
            limit = bounds[-1] if bounds else 0
            if start > limit:
                start = limit
            if self._max_records is not None and self._planned is not None:
                end[shard] = _capped_end(bounds, start, self._max_records)
            else:
                end[shard] = limit
        if self._planned is not None or self._max_records is None:
            self._planned = dict(end)
            self._save_watermark()
        return end

    def _advance_planned(self, end: dict) -> None:
        """Single home of the planned-watermark merge (max per shard) used by
        both ``partitions`` and ``commit``."""
        if self._planned is None:
            self._planned = dict(end)
        else:
            for s, e in end.items():
                self._planned[s] = max(self._planned.get(s, 0), e)
        self._save_watermark()

    def partitions(self, start: dict, end: dict):
        self._advance_planned(end)
        if not self._files:
            raise ValueError(
                f"no {{shard}}.jsonl replay files remain under {self._path} — "
                "the replay dir was cleared or its files renamed mid-stream"
            )
        parts = [
            ReplayPartition(
                shard=s,
                file_path=self._files[s],
                start_line=start.get(s, 0),
                end_line=end_line,
                wire=self._wire,
                keyspace=self._keyspace,
                exclude_keyspace=self._exclude_keyspace,
                start_byte=self._index.byte_for_line(self._files[s], start.get(s, 0)),
                end_byte=self._index.byte_for_line(self._files[s], end_line),
            )
            for s, end_line in end.items()
            if end_line > start.get(s, 0)
        ]
        # Spark requires ≥1 partition; emit an empty range when idle
        if not parts:
            s = next(iter(self._files))
            parts = [ReplayPartition(s, self._files[s], 0, 0)]
        return parts

    def read(self, partition: ReplayPartition) -> Iterator:
        """Arrow read path: decoded rows leave the Python worker as
        ``pyarrow.RecordBatch``es built column-wise in one pass (r12 VERDICT
        item #3). Yielding tuples instead makes the Spark worker run a
        per-value recursive type converter over every row before building
        the very same batches — measured 3.2× slower on the wire fixture's
        nested row_changes/fields columns, byte-identical output
        (test_replay_arrow_batches_match_rows). The decode state machine
        itself stays row-at-a-time Python by design: it is the S1/D3
        semantic surface, not a serialization seam."""
        rows = self.read_rows(partition)
        schema = _arrow_event_schema()
        while True:
            chunk = list(islice(rows, _ARROW_BATCH_ROWS))
            if not chunk:
                return
            yield _rows_to_arrow_batch(chunk, schema)

    def read_rows(self, partition: ReplayPartition) -> Iterator[tuple]:
        """RAW_EVENT_SCHEMA tuples for one partition (the pre-Arrow ``read``
        surface, kept for tests and diagnostic consumers)."""
        if partition.end_line <= partition.start_line:
            return
        lines, prefix_fields = self._partition_lines(partition)
        if partition.wire:
            yield from self._read_wire(partition, lines, prefix_fields)
            return
        events = [json.loads(line) for line in lines]
        for ev in events:
            if "kind" not in ev and "type" in ev:
                raise ValueError(
                    "replay line is wire-format ('type'-keyed) but the source "
                    "was opened without option('wireFormat', 'true') — set it, "
                    "or point 'path' at a non-wire fixture"
                )
        buf = TransactionBuffer()
        for ev in events:
            for tx in buf.add(ev):
                yield from self._tx_rows(partition.shard, tx.events)
        if buf.pending:
            raise ValueError(
                f"offset range did not end on a transaction boundary "
                f"(shard={partition.shard}, pending={buf.pending})"
            )

    def _partition_lines(
        self, partition: ReplayPartition
    ) -> tuple[list[str], list[str]]:
        """The partition's payload lines plus (wire mode) the FIELD lines
        before it. With a resolved byte range the payload is one seek + one
        bounded read; otherwise fall back to line counting from the top."""
        prefix_fields: list[str] = []
        if partition.start_byte is not None and partition.end_byte is not None:
            with open(partition.file_path, "rb") as fh:
                if partition.wire and partition.start_byte > 0:
                    # wire restarts mid-file: the FIELD events before the
                    # resume point must re-prime the decoder's schema cache
                    # (the live gRPC source re-receives FIELDs on reconnect;
                    # VStreamOutputMessageDecoder.java:73-75); they are not
                    # re-emitted — they were already delivered
                    head = fh.read(partition.start_byte).decode("utf-8")
                    prefix_fields = [
                        ln for ln in head.splitlines() if _FIELD_LINE_RE.search(ln)
                    ]
                fh.seek(partition.start_byte)
                body = fh.read(partition.end_byte - partition.start_byte)
            lines = [ln for ln in body.decode("utf-8").splitlines() if ln.strip()]
            return lines, prefix_fields
        lines = []
        with open(partition.file_path, "r", encoding="utf-8") as fh:
            for i, line in enumerate(fh):
                if i >= partition.end_line:
                    break
                if not line.strip():
                    continue
                if i < partition.start_line:
                    if partition.wire and _FIELD_LINE_RE.search(line):
                        prefix_fields.append(line)
                    continue
                lines.append(line)
        return lines, prefix_fields

    def _read_wire(
        self,
        partition: ReplayPartition,
        lines: list[str],
        prefix_fields: list[str] | None = None,
    ) -> Iterator[tuple]:
        """Packed-row read path (D3): drive the recorded VEvents through the
        VStream response state machine + wire decoder — the same code the
        live gRPC source runs — and emit RAW_EVENT_SCHEMA tuples.

        Reference: resolveColumns lengths+bytes decode
        (VStreamOutputMessageDecoder.java:298-329) behind the onNext
        buffering machine (VitessReplicationConnection.java:128-300).
        """
        from .wire import (
            VStreamObserver,
            VStreamResponse,
            WireDecoder,
            decode_flush,
            raw_event_tuple,
            vevent_from_json,
        )

        events = [vevent_from_json(line) for line in lines]
        decoder = WireDecoder(
            partition.keyspace,
            exclude_keyspace_from_table_name=partition.exclude_keyspace,
        )
        for line in prefix_fields or []:
            ev = vevent_from_json(line)
            if ev.type == "FIELD" and ev.field_event is not None:
                decoder.apply_field_event(ev.field_event)
        observer = VStreamObserver()
        # group recorded events into response-sized batches that close after a
        # COMMIT, as VTGate does (a transaction may span responses but a new
        # one never starts mid-response); small cap exercises multi-response
        # transaction buffering
        responses: list[VStreamResponse] = []
        batch: list = []
        for ev in events:
            batch.append(ev)
            if ev.type == "COMMIT" or len(batch) >= 8:
                responses.append(VStreamResponse(events=tuple(batch)))
                batch = []
        if batch:
            responses.append(VStreamResponse(events=tuple(batch)))
        for response in responses:
            for flush in observer.on_response(response):
                for d in decode_flush(decoder, flush):
                    yield raw_event_tuple(d, default_shard=partition.shard)
        if observer.pending:
            raise ValueError(
                f"offset range did not end on a transaction boundary "
                f"(shard={partition.shard}, pending={observer.pending})"
            )

    def _tx_rows(self, shard: str, events: list[dict]) -> Iterator[tuple]:
        # tx id = the VGTID at COMMIT (reference: entire VGTID string,
        # VStreamOutputMessageDecoder.java:121-150); per-partition the local one
        last_seq = max((e.get("seq", 0) for e in events), default=0)
        keyspace = next((e["keyspace"] for e in events if e.get("keyspace")), "ks")
        # recorded failover model: the line's host (default host0) names the
        # GTID's serving host, so epochs derived downstream see real breaks
        tx_host = next(
            (e.get("host", 0) for e in events if e.get("kind") == "COMMIT"), 0
        )
        vgtid = local_vgtid_json(keyspace, shard, last_seq, tx_host)
        for e in events:
            ts_ms = e.get("ts_ms", 0)
            ts = datetime.fromtimestamp(ts_ms / 1000.0, tz=timezone.utc)
            row_changes = None
            if e.get("row_changes") is not None:
                row_changes = [
                    (rc.get("before"), rc.get("after")) for rc in e["row_changes"]
                ]
            fields = None
            if e.get("fields") is not None:
                fields = [
                    (f.get("name"), f.get("type"), f.get("column_type"), f.get("flags"))
                    for f in e["fields"]
                ]
            yield (
                e["kind"],
                e.get("keyspace"),
                shard,
                e.get("table"),
                f"MySQL56/host{e.get('host', 0)}:1-{e.get('seq', 0)}",
                vgtid,
                vgtid,
                ts,
                row_changes,
                e.get("statement"),
                fields,
            )

    def commit(self, end: dict) -> None:
        # files are immutable; checkpoint WAL is the offset store. Track the
        # committed position so a capped latestOffset measures from it.
        self._advance_planned(end)


class VitessReplayDataSource(DataSource):
    """``spark.readStream.format("vitess-replay").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        from ..decode import RAW_EVENT_SCHEMA

        return RAW_EVENT_SCHEMA

    def streamReader(self, schema) -> VitessReplayStreamReader:
        return VitessReplayStreamReader(self.options)


def register(spark) -> None:
    """Register the source and ship the package to Python workers.

    The DataSource class is cloudpickled into Spark's Python workers (including
    the driver-side streaming-source planner), which re-import this package
    there. The package must therefore be importable by those processes: have it
    on PYTHONPATH before the SparkSession's JVM starts (pip install, or
    ``PYTHONPATH=/path/to/repo``), or launch from the repo root. addPyFile
    ships the code to remote executors for task-side reads on a cluster.
    """
    _ship_package(spark)
    spark.dataSource.register(VitessReplayDataSource)


def _ship_package(spark) -> None:
    import zipfile

    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.path.dirname(pkg_dir)
    marker = "_vitess_cdc_pkg_shipped"
    if getattr(spark, marker, False):
        return
    import tempfile

    zpath = os.path.join(tempfile.mkdtemp(), "debezium_connector_vitess_spark.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    spark.sparkContext.addPyFile(zpath)
    setattr(spark, marker, True)
