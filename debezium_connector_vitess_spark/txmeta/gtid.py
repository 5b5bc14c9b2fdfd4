"""MySQL GTID-set parsing and transaction rank.

Semantics per reference (pipeline/txmetadata/Gtid.java:57-83,
VitessRankProvider.java:12-19), re-expressed in Python:

- a GTID string looks like ``MySQL56/host1:1-100,host2:5`` — an optional
  version prefix ending in ``/``, then comma-separated ``host:intervals``
  entries where the interval list's last number is the max sequence;
- rank(gtid) = sum of max sequence over hosts (monotone per shard).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Gtid:
    version: str
    hosts: frozenset[str]
    max_sequences: tuple[int, ...]

    @staticmethod
    def parse(transaction_id: str) -> "Gtid":
        version = ""
        rest = transaction_id
        slash = transaction_id.find("/")
        if slash != -1:
            version, rest = transaction_id[:slash], transaction_id[slash + 1 :]
        hosts: set[str] = set()
        seqs: list[int] = []
        for entry in rest.split(","):
            entry = entry.strip()
            if not entry:
                continue
            parts = entry.split(":")
            host = parts[0]
            hosts.add(host)
            # last interval's last bound is the max sequence; intervals may be
            # "1-10" ranges or single positions
            last_interval = parts[-1]
            seqs.append(int(last_interval.split("-")[-1]))
        return Gtid(version=version, hosts=frozenset(hosts), max_sequences=tuple(seqs))

    def is_host_set_superset_of(self, other: "Gtid") -> bool:
        return self.hosts >= other.hosts


def get_rank(transaction_id: str) -> int:
    """Transaction rank = Σ max-sequence over hosts.

    Exact integer (Python int ≙ reference BigDecimal; emit as
    ``DecimalType(38,0)`` in the envelope's transaction block).
    """
    return sum(Gtid.parse(transaction_id).max_sequences)
