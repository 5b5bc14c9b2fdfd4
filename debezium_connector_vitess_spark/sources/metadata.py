"""VTGate SQL metadata client — the driver-side control plane (S4).

Before the streaming plan is built, the driver asks VTGate for databases,
shards, and tables (``SHOW DATABASES`` / ``SHOW VITESS_SHARDS LIKE 'ks/%'`` /
``SHOW TABLES [FROM ks]`` / ``SHOW VITESS_TABLETS``) and prunes empty shards.
Reference semantics: VitessMetadata.java:64-234,
VitessReplicationConnection.java:71-105 (execute + identifier quoting).

This is pure driver-side Python (the ``spark.catalog`` analog for a gRPC
source): results feed ``partitions()`` of the streaming source — one input
partition per (group of) shard(s) — so pruning here is the partition-pruning
analog at 100 TB: empty shards never become Spark tasks.

The gRPC transport is injected as a callable so the logic is testable without
a live cluster; the live path reuses :class:`VStreamConnection`'s channel.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence

# VTGate workload hint prepended to every control-plane query so Vitess
# operators can attribute/deprioritize connector traffic
# (VitessMetadata.java:36-47).
WORKLOAD_HINT = "/*vt+ WORKLOAD_NAME=debezium */ "

# Executor signature: (sql, shard | None) -> rows, each row a list of
# str-or-None cell values (already unpacked from the VTGate wire format).
ExecuteFn = Callable[[str, Optional[str]], list[list[Optional[str]]]]


def quote_identifier(identifier: str) -> str:
    """MySQL backtick quoting with backtick doubling
    (VitessReplicationConnection.java:103-105)."""
    return "`" + identifier.replace("`", "``") + "`"


def escape_string_literal(value: str) -> str:
    """Escape for embedding in a single-quoted MySQL literal
    (VitessMetadata.java:50-53)."""
    return value.replace("\\", "\\\\").replace("'", "\\'")


def escape_like_pattern(value: str) -> str:
    """Escape LIKE wildcards so they match literally; backslash first, then
    ``_``/``%`` (VitessMetadata.java:55-62 — an unescaped ``_`` in a keyspace
    name would over-match, e.g. ``foo_bar`` also matching ``foo-bar``)."""
    return value.replace("\\", "\\\\").replace("_", "\\_").replace("%", "\\%")


def parse_packed_rows(rows: Sequence[tuple[Sequence[int], bytes]]) -> list[list[Optional[str]]]:
    """VTGate wire rows (lengths + concatenated UTF-8 values; −1 ⇒ NULL) →
    cell lists (VitessMetadata.java:177-198 — same packing as VStream ROW
    events, decoded here driver-side for tiny control-plane results)."""
    out: list[list[Optional[str]]] = []
    for lengths, packed in rows:
        cells: list[Optional[str]] = []
        offset = 0
        for length in lengths:
            if length == -1:
                cells.append(None)
            else:
                cells.append(packed[offset : offset + length].decode("utf-8"))
                offset += length
        out.append(cells)
    return out


def flatten_and_concat(rows: list[list[Optional[str]]]) -> list[str]:
    """Each row's cells joined into one string (VitessMetadata.java:221-226)."""
    return ["".join(c for c in row if c is not None) for row in rows]


def shards_from_shard_rows(rows: list[list[Optional[str]]]) -> list[str]:
    """``SHOW VITESS_SHARDS`` rows are ``keyspace/shard`` strings; keep the
    shard part (VitessMetadata.java:115-125)."""
    shards = []
    for value in flatten_and_concat(rows):
        parts = value.split("/")
        if len(parts) != 2:
            raise ValueError(f"wrong shard field format: {value!r}")
        shards.append(parts[1])
    return shards


def non_empty_shards_from_tablets(
    tablet_rows: list[list[Optional[str]]], keyspace: str
) -> list[str]:
    """``SHOW VITESS_TABLETS`` rows → sorted distinct shards of the keyspace
    that have at least one serving tablet (VitessMetadata.java:201-216;
    row layout: cell 1 = keyspace, cell 2 = shard)."""
    shards = {
        row[2]
        for row in tablet_rows
        if len(row) >= 3 and row[1] == keyspace and row[2] is not None
    }
    return sorted(shards)


@dataclass
class VitessMetadata:
    """Control-plane queries against VTGate, transport-injected.

    ``execute`` runs one SQL statement (optionally shard-targeted) and
    returns unpacked rows. The live implementation wraps the blocking gRPC
    ``Execute`` call on :class:`VStreamConnection`'s channel; tests inject a
    fake. Reference: VitessMetadata.java:30-234.
    """

    keyspace: str
    execute: ExecuteFn
    exclude_empty_shards: bool = False
    configured_shards: tuple[str, ...] = ()

    def _query(self, sql: str, shard: Optional[str] = None) -> list[list[Optional[str]]]:
        return self.execute(WORKLOAD_HINT + sql, shard)

    def get_databases(self) -> list[str]:
        """``SHOW DATABASES`` — also the connection smoke test
        (VitessMetadata.java:228-234, VitessConnector.java:257-271)."""
        return flatten_and_concat(self._query("SHOW DATABASES"))

    def get_shards(self) -> list[str]:
        """Shard discovery; with ``exclude_empty_shards`` the serving-tablet
        route is used (F5 empty-shard pruning, VitessMetadata.java:64-75)."""
        if self.exclude_empty_shards:
            return non_empty_shards_from_tablets(
                self._query("SHOW VITESS_TABLETS"), self.keyspace
            )
        like = escape_string_literal(escape_like_pattern(self.keyspace))
        rows = self._query(f"SHOW VITESS_SHARDS LIKE '{like}/%'")
        return shards_from_shard_rows(rows)

    def get_tables(self) -> list[str]:
        """Table discovery (VitessMetadata.java:77-110): keyspace-qualified
        ``SHOW TABLES FROM ks``; under exclude-empty-shards, plain
        ``SHOW TABLES`` targeted at one known-serving shard (configured shard
        preferred — deterministic here: first, not random)."""
        if self.exclude_empty_shards:
            shards = list(self.configured_shards) or self.get_shards()
            if not shards:
                raise ValueError(f"no serving shards found for keyspace {self.keyspace!r}")
            return flatten_and_concat(self._query("SHOW TABLES", shards[0]))
        rows = self._query(f"SHOW TABLES FROM {quote_identifier(self.keyspace)}")
        return flatten_and_concat(rows)

    def validate_connection(self) -> None:
        """Fail fast if VTGate is unreachable or the keyspace is absent
        (VitessConnector.java:257-271)."""
        databases = self.get_databases()
        if self.keyspace not in databases:
            raise ValueError(
                f"keyspace {self.keyspace!r} not found; databases: {databases}"
            )
