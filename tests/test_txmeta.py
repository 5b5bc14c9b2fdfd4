"""Epoch/rank/lineage tests (reference VitessEpochProviderTest / GtidTest /
ShardLineageTest / VitessRankProviderTest analogs)."""

import pytest

from debezium_connector_vitess_spark.txmeta import (
    EpochProvider,
    Gtid,
    ShardEpochMap,
    get_rank,
    inherited_epoch,
)
from debezium_connector_vitess_spark.txmeta.epoch import epoch_for_gtid
from debezium_connector_vitess_spark.vgtid import ShardGtid, Vgtid

HOST1 = "a790d864-9ba1-11ea-99f6-0242ac11000a"
HOST2 = "b790d864-9ba1-11ea-99f6-0242ac11000b"


def test_gtid_parse():
    g = Gtid.parse(f"MySQL56/{HOST1}:1-1513")
    assert g.version == "MySQL56"
    assert g.hosts == frozenset({HOST1})
    assert g.max_sequences == (1513,)


def test_gtid_parse_multi_host_multi_interval():
    g = Gtid.parse(f"MySQL56/{HOST1}:1-10:12-15,{HOST2}:8")
    assert g.hosts == frozenset({HOST1, HOST2})
    assert sorted(g.max_sequences) == [8, 15]


def test_rank():
    assert get_rank(f"MySQL56/{HOST1}:1-1513") == 1513
    assert get_rank(f"MySQL56/{HOST1}:1-10,{HOST2}:1-7") == 17
    # single positions take the position itself
    assert get_rank(f"{HOST1}:5") == 5


def test_epoch_transitions():
    std1 = f"MySQL56/{HOST1}:1-10"
    std2 = f"MySQL56/{HOST1}:1-20"
    both = f"MySQL56/{HOST1}:1-20,{HOST2}:1-5"
    only2 = f"MySQL56/{HOST2}:1-9"
    # same/superset host set: flat
    assert epoch_for_gtid(3, std1, std2) == 3
    assert epoch_for_gtid(3, std1, both) == 3
    # shrink (failover): +1
    assert epoch_for_gtid(3, both, only2) == 4
    # disjoint: +1
    assert epoch_for_gtid(0, std1, only2) == 1
    # overridden → first standard: +1
    assert epoch_for_gtid(0, "current", std1) == 1
    assert epoch_for_gtid(0, "", std1) == 1
    # overridden → overridden: flat
    assert epoch_for_gtid(0, "current", "") == 0
    # standard → overridden: error
    with pytest.raises(ValueError):
        epoch_for_gtid(0, std1, "current")


def test_shard_lineage():
    epochs = ShardEpochMap({"-80": 1, "80-": 3})
    # '-40' splits from '-80'
    assert inherited_epoch("-40", epochs) == 2
    # '40-c0' overlaps both parents
    assert inherited_epoch("40-c0", epochs) == 4
    # no parents
    assert inherited_epoch("x1-x2", ShardEpochMap({})) == 0
    # full-range shard overlaps everything
    assert inherited_epoch("0", epochs) == 4


def test_epoch_provider_flow():
    prev = Vgtid.of(ShardGtid("ks", "-80", f"MySQL56/{HOST1}:1-10")).to_json()
    cur = Vgtid.of(ShardGtid("ks", "-80", f"MySQL56/{HOST1}:1-20")).to_json()
    p = EpochProvider(ShardEpochMap({"-80": 0}))
    assert p.get_epoch("-80", prev, cur) == 0
    # failover on the shard
    cur2 = Vgtid.of(ShardGtid("ks", "-80", f"MySQL56/{HOST2}:1-2")).to_json()
    assert p.get_epoch("-80", cur, cur2) == 1


def test_epoch_provider_reshard():
    prev = Vgtid.of(ShardGtid("ks", "-80", f"MySQL56/{HOST1}:1-10")).to_json()
    cur = Vgtid.of(
        ShardGtid("ks", "-40", f"MySQL56/{HOST1}:1-10"),
        ShardGtid("ks", "40-80", f"MySQL56/{HOST1}:1-10"),
    ).to_json()
    p = EpochProvider(ShardEpochMap({"-80": 5}), inherit_epoch=True)
    assert p.get_epoch("-40", prev, cur) == 6
    assert p.epochs.get("40-80") == 6
    p2 = EpochProvider(ShardEpochMap({"-80": 5}), inherit_epoch=False)
    assert p2.get_epoch("-40", prev, cur) == 0


def test_epoch_provider_generation_bump():
    p = EpochProvider()
    p.load({"transaction_epoch": '{"-80":2,"80-":3}', "connector_generation": 0},
           config_generation=1)
    assert p.epochs == ShardEpochMap({"-80": 3, "80-": 4})
    out = p.store({})
    assert out["connector_generation"] == 1


def test_shard_epoch_map_json():
    m = ShardEpochMap({"80-": 1, "-80": 0})
    assert m.to_json() == '{"-80":0,"80-":1}'
    assert ShardEpochMap.from_json(m.to_json()) == m


class _FakeGroupState:
    def __init__(self, value=None):
        self._value = value

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, value):
        self._value = value


def test_keyspace_lineage_inherits_epoch_across_reshard():
    """T5 streaming state machine (driven directly, no Spark): a shard that
    appears mid-stream inherits max(parent epochs)+1 from key-range-
    overlapping parents; a non-overlapping new shard gets overridden-start
    semantics; the state JSON round-trips across micro-batches."""
    import json

    import pandas as pd

    from debezium_connector_vitess_spark.txmeta.streaming import _process_keyspace

    def batch(rows):
        return pd.DataFrame(
            rows, columns=["keyspace", "shard", "tx_id", "gtid", "ts_ms", "seq_order"]
        )

    state = _FakeGroupState()
    # batch 1: parent '-80' commits twice (epoch 1 = overridden start +1)
    out1 = next(_process_keyspace(
        ("ks",),
        iter([batch([
            ("ks", "-80", "t1", "MySQL56/hostA:1-10", 100, 10),
            ("ks", "-80", "t2", "MySQL56/hostA:1-20", 200, 20),
        ])]),
        state,
    ))
    assert list(out1["transaction_epoch"]) == [1, 1]
    assert json.loads(state.get[0])["-80"]["epoch"] == 1

    # batch 2 (restart boundary): children of the '-80' split inherit 1+1=2
    # from the persisted state; unrelated new shard '80-' starts fresh at 1
    out2 = next(_process_keyspace(
        ("ks",),
        iter([batch([
            ("ks", "-40", "t3", "MySQL56/hostA:1-5", 300, 5),
            ("ks", "40-80", "t4", "MySQL56/hostA:1-6", 310, 6),
            ("ks", "80-", "t5", "MySQL56/hostA:1-7", 320, 7),
            ("ks", "-40", "t6", "MySQL56/hostB:1-8", 330, 8),  # failover on child
        ])]),
        state,
    ))
    got = dict(zip(out2["tx_id"], out2["transaction_epoch"]))
    assert got == {"t3": 2, "t4": 2, "t5": 1, "t6": 3}
