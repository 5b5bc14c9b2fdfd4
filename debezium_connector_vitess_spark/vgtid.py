"""VGTID — the stream position (offset) document.

A VGTID is a JSON array of per-shard positions
``{"keyspace": .., "shard": .., "gtid": .., "table_p_ks": [..]}``;
during VStream Copy the ``table_p_ks`` element carries the last primary key
copied per table. Reference semantics: Vgtid.java:26-229,
TablePrimaryKeys.java:27-368.

In the Spark engine this document IS the streaming-source offset: the custom
data source serializes a :class:`Vgtid` into the checkpoint WAL and restores
it in ``initialOffset``/restart (SURVEY.md §2.4 O1-O3).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Optional

# Sentinel GTID values (reference: Vgtid.java:116-123,
# VitessConnectorConfig.java:655-661)
EMPTY_GTID = ""  # triggers VStream Copy (initial snapshot)
CURRENT_GTID = "current"  # start at the current binlog position

KEYSPACE_KEY = "keyspace"
SHARD_KEY = "shard"
GTID_KEY = "gtid"
TABLE_P_KS_KEY = "table_p_ks"


@dataclass(frozen=True)
class TableLastPK:
    """Copy-phase progress for one table: fields + last-PK row.

    Reference: TablePrimaryKeys.java:27-56 (fields/rows JSON inside VGTID).
    The lastpk is kept as an opaque JSON-able dict: {"fields": [...], "rows": [...]}.
    """

    table_name: str
    lastpk: dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return {"table_name": self.table_name, "lastpk": self.lastpk}

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "TableLastPK":
        return TableLastPK(table_name=d["table_name"], lastpk=d.get("lastpk", {}))


@dataclass(frozen=True)
class ShardGtid:
    """One shard's position inside a VGTID (Vgtid.java:170-229)."""

    keyspace: str
    shard: str
    gtid: str
    table_p_ks: tuple[TableLastPK, ...] = ()

    def to_dict(self) -> dict[str, Any]:
        d: dict[str, Any] = {
            KEYSPACE_KEY: self.keyspace,
            SHARD_KEY: self.shard,
            GTID_KEY: self.gtid,
        }
        if self.table_p_ks:
            d[TABLE_P_KS_KEY] = [t.to_dict() for t in self.table_p_ks]
        return d

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "ShardGtid":
        return ShardGtid(
            keyspace=d[KEYSPACE_KEY],
            shard=d[SHARD_KEY],
            gtid=d.get(GTID_KEY, EMPTY_GTID),
            table_p_ks=tuple(TableLastPK.from_dict(t) for t in d.get(TABLE_P_KS_KEY, [])),
        )


@dataclass(frozen=True)
class Vgtid:
    """Ordered list of per-shard GTIDs with cached JSON form (Vgtid.java:41-58)."""

    shard_gtids: tuple[ShardGtid, ...]

    def to_json(self) -> str:
        return json.dumps([s.to_dict() for s in self.shard_gtids], separators=(",", ":"))

    @staticmethod
    def from_json(raw: str) -> "Vgtid":
        return Vgtid(tuple(ShardGtid.from_dict(d) for d in json.loads(raw)))

    @staticmethod
    def of(*shard_gtids: ShardGtid) -> "Vgtid":
        return Vgtid(tuple(shard_gtids))

    def get_shard_gtid(self, shard: str, keyspace: Optional[str] = None) -> Optional[ShardGtid]:
        for s in self.shard_gtids:
            if s.shard == shard and (keyspace is None or s.keyspace == keyspace):
                return s
        return None

    def local_vgtid(self, shard: str) -> "Vgtid":
        """Keep only the given shard's entry (reference: Vgtid.java:125-132,
        used by the UseLocalVgtid SMT, transforms/UseLocalVgtid.java:32-103)."""
        s = self.get_shard_gtid(shard)
        return Vgtid((s,) if s else ())

    def with_replaced(self, new: ShardGtid) -> "Vgtid":
        """Replace the matching (keyspace, shard) entry."""
        out = []
        replaced = False
        for s in self.shard_gtids:
            if s.keyspace == new.keyspace and s.shard == new.shard:
                out.append(new)
                replaced = True
            else:
                out.append(s)
        if not replaced:
            out.append(new)
        return Vgtid(tuple(out))

    @property
    def shards(self) -> list[str]:
        return [s.shard for s in self.shard_gtids]

    def is_initial(self) -> bool:
        """All-empty GTIDs ⇒ VStream Copy from scratch."""
        return all(s.gtid == EMPTY_GTID for s in self.shard_gtids)


def default_vgtid(
    keyspace: str,
    shards: list[str],
    snapshot_mode: str = "initial",
) -> Vgtid:
    """Default position when no stored offset exists.

    ``initial`` → empty GTID per shard (server-side VStream Copy);
    ``never`` → ``current``. Reference: VitessReplicationConnection.java:401-480,
    VitessConnectorConfig.java:655-661.
    """
    gtid = EMPTY_GTID if snapshot_mode == "initial" else CURRENT_GTID
    return Vgtid(tuple(ShardGtid(keyspace, s, gtid) for s in sorted(shards)))
