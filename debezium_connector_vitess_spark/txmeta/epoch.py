"""Transaction epoch: per-shard failover/reshard counter.

Semantics per reference (pipeline/txmetadata/VitessEpochProvider.java:37-198,
ShardEpochMap.java:25-95, ShardLineage.java:26-94), re-expressed in Python:

- epoch stays flat while the new GTID's host set is a superset of the
  previous one; any shrink/disjoint host set (failover) increments it;
- resuming from an overridden position (``current`` / ``""``) increments on
  the first real transaction; a standard→overridden transition is an error;
- on reshard, a brand-new shard inherits ``max(parent epochs) + 1`` where
  parents are shards whose hex key ranges overlap (optional; else 0);
- a ``connector.generation`` change bumps every epoch by one.

In the Spark engine this state lives in the streaming checkpoint: the
stateful operator (``txmeta/streaming.py``) keys by keyspace and keeps
{prev_vgtid, shard→epoch} as group state.
"""

from __future__ import annotations

import json
from typing import Optional

from ..vgtid import CURRENT_GTID, EMPTY_GTID, Vgtid
from .gtid import Gtid

# Lexicographic ±infinity sentinels for open-ended shard ranges.
_NEG_INF = "\u0000"
_POS_INF = "\uffff"


def _shard_bounds(shard: str) -> tuple[str, str]:
    """Hex key-range bounds of a shard name like '-80', '40-80', '80-'.

    An absent bound is open-ended (−∞ / +∞). A non-range shard name ('0')
    is treated as the full range.
    """
    s = shard.lower()
    if "-" not in s:
        return (_NEG_INF, _POS_INF)
    lo, _, hi = s.partition("-")
    return (lo or _NEG_INF, hi or _POS_INF)


def _overlaps(a: str, b: str) -> bool:
    alo, ahi = _shard_bounds(a)
    blo, bhi = _shard_bounds(b)
    return alo < bhi and ahi > blo


class ShardEpochMap:
    """shard → epoch, JSON round-trippable (reference ShardEpochMap.java:25-95)."""

    def __init__(self, mapping: Optional[dict[str, int]] = None) -> None:
        self._m: dict[str, int] = dict(mapping or {})

    @staticmethod
    def from_json(raw: str) -> "ShardEpochMap":
        return ShardEpochMap({k: int(v) for k, v in json.loads(raw).items()})

    def to_json(self) -> str:
        return json.dumps(dict(sorted(self._m.items())), separators=(",", ":"))

    def get(self, shard: str) -> Optional[int]:
        return self._m.get(shard)

    def put(self, shard: str, epoch: int) -> None:
        self._m[shard] = epoch

    def items(self):
        return self._m.items()

    def increment_all(self) -> None:
        for k in self._m:
            self._m[k] += 1

    def copy(self) -> "ShardEpochMap":
        return ShardEpochMap(self._m)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, ShardEpochMap) and self._m == other._m

    def __repr__(self) -> str:
        return f"ShardEpochMap({self._m})"


def inherited_epoch(new_shard: str, epochs: ShardEpochMap) -> int:
    """Epoch of a shard born from a reshard: max(parent epochs)+1, parents =
    key-range overlap; 0 when no parents (reference ShardLineage.java:26-94)."""
    max_parent = -1
    for shard, epoch in epochs.items():
        if _overlaps(new_shard, shard):
            max_parent = max(max_parent, epoch)
    return max_parent + 1


def _is_overridden(gtid: str) -> bool:
    return gtid in (CURRENT_GTID, EMPTY_GTID)


def epoch_for_gtid(previous_epoch: int, previous_gtid: str, gtid: str) -> int:
    """Single-shard epoch transition (reference VitessEpochProvider.java:46-83)."""
    if _is_overridden(previous_gtid) and _is_overridden(gtid):
        return previous_epoch  # still waiting for the first real transaction
    if _is_overridden(previous_gtid):
        return previous_epoch + 1  # first transaction after an overridden start
    if _is_overridden(gtid):
        raise ValueError(
            f"current GTID cannot be an override value if previous is standard: "
            f"prev={previous_gtid!r} cur={gtid!r}"
        )
    prev, cur = Gtid.parse(previous_gtid), Gtid.parse(gtid)
    if cur.is_host_set_superset_of(prev):
        return previous_epoch
    return previous_epoch + 1  # failover: host set shrank or is disjoint


class EpochProvider:
    """Tracks the shard→epoch map across VGTID transitions.

    Reference: VitessEpochProvider.java:151-198 (getEpoch / getNewShardEpochMap).
    """

    def __init__(
        self,
        epochs: Optional[ShardEpochMap] = None,
        *,
        inherit_epoch: bool = False,
        connector_generation: int = 0,
    ) -> None:
        self.epochs = epochs or ShardEpochMap()
        self.inherit_epoch = inherit_epoch
        self.connector_generation = connector_generation

    def load(self, offsets: dict, config_generation: int = 0) -> None:
        raw = offsets.get("transaction_epoch")
        if raw:
            self.epochs = ShardEpochMap.from_json(raw)
        last_gen = offsets.get("connector_generation", config_generation)
        if config_generation != last_gen:
            self.epochs.increment_all()
        self.connector_generation = config_generation

    def store(self, offsets: dict) -> dict:
        offsets["transaction_epoch"] = self.epochs.to_json()
        offsets["connector_generation"] = self.connector_generation
        return offsets

    def get_epoch(self, shard: str, previous_vgtid: str, vgtid: str) -> int:
        """Advance the map for one BEGIN and return the tx shard's epoch."""
        if previous_vgtid is None:
            raise ValueError(f"previous vgtid cannot be None (shard={shard})")
        prev = Vgtid.from_json(previous_vgtid)
        cur = Vgtid.from_json(vgtid)
        new_map = ShardEpochMap()
        for sg in cur.shard_gtids:
            prev_sg = prev.get_shard_gtid(sg.shard)
            if prev_sg is not None:
                prev_epoch = self.epochs.get(sg.shard)
                if prev_epoch is None:
                    raise ValueError(
                        f"previous epoch cannot be None for shard {sg.shard} "
                        f"present in previous vgtid"
                    )
                new_map.put(sg.shard, epoch_for_gtid(prev_epoch, prev_sg.gtid, sg.gtid))
            elif self.inherit_epoch:
                new_map.put(sg.shard, inherited_epoch(sg.shard, self.epochs))
            else:
                new_map.put(sg.shard, 0)
        self.epochs = new_map
        epoch = self.epochs.get(shard)
        if epoch is None:
            raise ValueError(f"no epoch for shard {shard} after update")
        return epoch
