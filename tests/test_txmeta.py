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
