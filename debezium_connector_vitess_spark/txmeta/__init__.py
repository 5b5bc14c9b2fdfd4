"""Ordered transaction metadata (epoch, rank) — SURVEY.md §2.5 T1-T8.

(epoch, rank) is a per-shard total order robust to MySQL failover and Vitess
reshard; downstream consumers dedup with max-by(epoch, rank).
"""

from .gtid import Gtid, get_rank
from .epoch import ShardEpochMap, EpochProvider, inherited_epoch

__all__ = ["Gtid", "get_rank", "ShardEpochMap", "EpochProvider", "inherited_epoch"]
