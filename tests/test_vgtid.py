"""VGTID JSON round-trip tests (reference VgtidTest.java analog)."""

import json

from debezium_connector_vitess_spark.vgtid import (
    CURRENT_GTID,
    EMPTY_GTID,
    ShardGtid,
    TableLastPK,
    Vgtid,
    default_vgtid,
)

GTID = "MySQL56/a790d864-9ba1-11ea-99f6-0242ac11000a:1-1513"


def test_round_trip():
    v = Vgtid.of(
        ShardGtid("ks", "-80", GTID),
        ShardGtid("ks", "80-", GTID),
    )
    raw = v.to_json()
    assert Vgtid.from_json(raw) == v
    parsed = json.loads(raw)
    assert parsed[0]["keyspace"] == "ks"
    assert parsed[0]["shard"] == "-80"
    assert parsed[0]["gtid"] == GTID


def test_table_p_ks_round_trip():
    lastpk = {"fields": [{"name": "id", "type": "INT64"}], "rows": [{"lengths": ["2"], "values": "10"}]}
    v = Vgtid.of(ShardGtid("ks", "0", EMPTY_GTID, (TableLastPK("t1", lastpk),)))
    v2 = Vgtid.from_json(v.to_json())
    assert v2.shard_gtids[0].table_p_ks[0].table_name == "t1"
    assert v2.shard_gtids[0].table_p_ks[0].lastpk == lastpk
    assert v2.is_initial()


def test_local_vgtid():
    v = Vgtid.of(ShardGtid("ks", "-80", GTID), ShardGtid("ks", "80-", "other"))
    local = v.local_vgtid("80-")
    assert local.shards == ["80-"]
    assert local.shard_gtids[0].gtid == "other"


def test_with_replaced():
    v = Vgtid.of(ShardGtid("ks", "-80", GTID), ShardGtid("ks", "80-", GTID))
    v2 = v.with_replaced(ShardGtid("ks", "-80", "new"))
    assert v2.get_shard_gtid("-80").gtid == "new"
    assert v2.get_shard_gtid("80-").gtid == GTID


def test_default_vgtid_modes():
    v = default_vgtid("ks", ["80-", "-80"], snapshot_mode="initial")
    assert v.shards == ["-80", "80-"]  # sorted
    assert v.is_initial()
    v = default_vgtid("ks", ["0"], snapshot_mode="never")
    assert v.shard_gtids[0].gtid == CURRENT_GTID
