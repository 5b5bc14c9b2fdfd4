"""VitessCdcEngine: the reference's connector properties drive the engine.

Each test configures the facade with property names copied verbatim from the
reference's documentation/config class (VitessConnectorConfig.java, Connect
worker SMT config) and checks the resulting streams — MIGRATION.md made
executable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debezium_connector_vitess_spark import changelog
from debezium_connector_vitess_spark.engine import VitessCdcEngine
from debezium_connector_vitess_spark.sources import replay as replay_source
from debezium_connector_vitess_spark.sources.fixtures import (
    cached_fixture_dir,
    write_replay_fixture,
)

BASE_PROPS = {
    "database.hostname": "vtgate.example",
    "database.port": "15991",
    "vitess.keyspace": "ks0",
    "vitess.shard": "-40,40-80,80-c0,c0-",
    "vitess.tablet.type": "REPLICA",
    "snapshot.mode": "never",
    "topic.prefix": "prod.cdc",
    "max.batch.size": "512",
}


def _schemas():
    return [changelog.change_table_schema(t) for t in ("tbl0", "tbl1", "tbl2")]


def _drain(df, name, spark):
    if name in [t.name for t in spark.catalog.listTables()]:
        spark.catalog.dropTempView(name)
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_properties_parse_into_source_config():
    eng = VitessCdcEngine(None, {
        **BASE_PROPS,
        "vitess.grpc.headers": "x-auth:tok,x-team:cdc",
        "vitess.stop_on_reshard": "true",
        "vitess.keepalive.interval.ms": "30000",
        "vitess.grpc.max_inbound_message_size": "8388608",
        "heartbeat.interval.ms": "5000",
    })
    c = eng.config
    assert c.vtgate_host == "vtgate.example:15991"
    assert c.shards == ["-40", "40-80", "80-c0", "c0-"]
    assert c.tablet_type == "REPLICA"
    assert c.snapshot_mode == "never"
    assert c.grpc_headers == {"x-auth": "tok", "x-team": "cdc"}
    assert c.stop_on_reshard and c.keepalive_interval_ms == 30000
    assert c.max_inbound_message_bytes == 8 * 1024 * 1024
    assert c.heartbeat_interval_s == 5
    opts = eng.source_options()
    assert opts["vtgatehost"] == "vtgate.example:15991"
    assert opts["maxrecordsperbatch"] == "512"
    assert opts["stoponreshard"] == "true"


def test_invalid_tablet_type_rejected():
    with pytest.raises(ValueError):
        VitessCdcEngine(None, {**BASE_PROPS, "vitess.tablet.type": "SPROCKET"})


def test_unsupported_transform_rejected():
    with pytest.raises(ValueError, match="unsupported transform"):
        VitessCdcEngine(None, {
            **BASE_PROPS,
            "transforms": "x",
            "transforms.x.type": "com.example.Mystery",
        })


def test_envelope_end_to_end_with_filters_and_smts(spark, sf_dir):
    """Full property-driven run over the replay stream: table include filter,
    column mask/truncate, and a Connect-style SMT chain (blank the vgtid the
    way the reference's ReplaceFieldValue doc example does)."""
    replay_source.register(spark)
    replay_dir = cached_fixture_dir(
        "txmeta_replay", sf_dir, write_replay_fixture, tx_size=10, host_period=10
    )
    eng = VitessCdcEngine(spark, {
        **BASE_PROPS,
        "table.include.list": "ks0.tbl1",
        "column.mask.with.4.chars": "ks0.tbl1.props",
        "transforms": "novgtid",
        "transforms.novgtid.type":
            "io.debezium.connector.vitess.transforms.ReplaceFieldValue",
        "transforms.novgtid.field_names": "source.vgtid",
        "transforms.novgtid.field_value": "",
    })
    raw = eng.raw_stream("vitess-replay", path=replay_dir)
    env = eng.envelope(raw, _schemas())
    out = _drain(env, "engine_env_sink", spark)

    rows = out.collect()
    assert rows and all(r.source.table == "tbl1" for r in rows)
    # masked column: every non-null props value is the 4-star constant
    vals = {r.after.props for r in rows if r.after is not None}
    assert vals == {"****"}
    # SMT blanked the vgtid
    assert {r.source.vgtid for r in rows} == {""}
    # record keys are the PK JSON
    assert all(r.key.startswith('{"user_id":') for r in rows)
    # decoded row count matches the changelog model for tbl1
    expected = (
        changelog.load_events(spark, sf_dir)
        .filter(F.col("user_id") % 3 == 1)
        .count()
    )
    assert len(rows) == expected


def test_topic_routing_from_properties(spark, sf_dir):
    """override.data.change.topic.prefix + exclude list routes per table and
    the Kafka record contract comes out (key, value, topic)."""
    replay_source.register(spark)
    replay_dir = cached_fixture_dir(
        "txmeta_replay", sf_dir, write_replay_fixture, tx_size=10, host_period=10
    )
    eng = VitessCdcEngine(spark, {
        **BASE_PROPS,
        "override.data.change.topic.prefix": "other",
        "override.data.change.topic.prefix.exclude.list": r".*\.tbl1",
    })
    raw = eng.raw_stream("vitess-replay", path=replay_dir)
    env = eng.envelope(raw, _schemas())
    out = _drain(eng.topics(env), "engine_topic_sink", spark)
    assert set(out.columns) == {"key", "value", "topic"}
    topics = {r.topic for r in out.select("topic").distinct().collect()}
    # tbl1 matches the keyspace-qualified exclude → keeps the default prefix
    assert topics == {"prod.cdc.tbl1", "other.tbl0", "other.tbl2"}


def test_extract_new_record_state_chain(spark, sf_dir):
    """ExtractNewRecordState as the terminal SMT flattens to the after image
    (deletes dropped), like the advertised upstream chain."""
    replay_source.register(spark)
    replay_dir = cached_fixture_dir(
        "txmeta_replay", sf_dir, write_replay_fixture, tx_size=10, host_period=10
    )
    eng = VitessCdcEngine(spark, {
        **BASE_PROPS,
        "table.include.list": "ks0.tbl1",
        "transforms": "unwrap",
        "transforms.unwrap.type": "io.debezium.transforms.ExtractNewRecordState",
    })
    raw = eng.raw_stream("vitess-replay", path=replay_dir)
    out = _drain(eng.envelope(raw, _schemas()), "engine_enrs_sink", spark)
    assert {"user_id", "value", "props", "op"} <= set(out.columns)
    assert {r.op for r in out.select("op").distinct().collect()} <= {"c", "u"}


def test_transaction_metadata_property_wiring(spark, sf_dir):
    """provide.transaction.metadata exposes the ordered-tx stream; epochs
    advance through the fixture's host failovers (epoch = 1 + txn//10)."""
    replay_source.register(spark)
    replay_dir = cached_fixture_dir(
        "txmeta_replay", sf_dir, write_replay_fixture, tx_size=10, host_period=10
    )
    eng = VitessCdcEngine(spark, {
        **BASE_PROPS,
        "provide.transaction.metadata": "true",
    })
    raw = eng.raw_stream("vitess-replay", path=replay_dir)
    out = _drain(eng.transaction_metadata(raw), "engine_txmeta_sink", spark)
    rows = out.collect()
    assert rows
    assert {"shard", "tx_id", "gtid", "transaction_epoch", "transaction_rank"} <= set(
        out.columns
    )
    assert max(r.transaction_epoch for r in rows) >= 2  # failovers advanced it

    with pytest.raises(ValueError, match="provide.transaction.metadata"):
        VitessCdcEngine(spark, BASE_PROPS).transaction_metadata(raw)


def test_materialize_from_facade(spark, sf_dir):
    """engine.materialize: one-pass latest-state snapshots for the included
    tables, matching the batch materialization's row count for tbl1."""
    from debezium_connector_vitess_spark.cache import checkpoint_scope

    eng = VitessCdcEngine(spark, {**BASE_PROPS, "table.include.list": "ks0.tbl1"})
    raw = changelog.events_to_raw_vevents(changelog.load_events(spark, sf_dir))
    with checkpoint_scope(spark):
        snaps = eng.materialize(raw, _schemas())
        assert set(snaps) == {("ks0", "tbl1")}
        snap = snaps[("ks0", "tbl1")]
        rows = snap.collect()
        assert rows and all(r.table_name == "tbl1" for r in rows)
        # every live key appears exactly once
        keys = [r.key for r in rows]
        assert len(keys) == len(set(keys))
        assert all(r.row.user_id is not None for r in rows)


def test_schema_changes_and_heartbeats_from_properties(spark, sf_dir):
    """include.schema.changes gates the DDL side-output and routes it to the
    schema-change topic (the sanitized prefix by default); heartbeat.interval.ms
    densifies positions from the raw stream."""
    eng = VitessCdcEngine(spark, {
        **BASE_PROPS,
        "include.schema.changes": "true",
        "heartbeat.interval.ms": "60000",
    })
    raw = changelog.events_to_raw_vevents(changelog.load_events(spark, sf_dir))
    ddl = raw.limit(0).unionByName(
        raw.limit(3)
        .withColumn("event_kind", F.lit("DDL"))
        .withColumn("statement", F.lit("ALTER TABLE tbl1 ADD COLUMN c INT"))
    )
    out = eng.schema_changes(ddl).collect()
    assert out and all(r.operation == "ALTER" and r.table_name == "tbl1" for r in out)
    assert {r.topic for r in out} == {"prod.cdc"}

    hb = eng.heartbeats(raw)
    n = hb.count()
    assert 0 < n <= raw.count()
    assert {"vgtid", "ts_ms"} <= set(hb.columns)

    with pytest.raises(ValueError, match="include.schema.changes"):
        VitessCdcEngine(spark, BASE_PROPS).schema_changes(ddl)


def test_time_precision_mode_through_engine(spark):
    """time.precision.mode flows from the reference property into schema
    resolution: connect -> Connect Time/Timestamp logical types; adaptive
    (plain) rejected like VitessConnectorConfig.java:493-514."""
    import pytest
    from pyspark.sql import types as T

    from debezium_connector_vitess_spark.engine import VitessCdcEngine

    props = dict(BASE_PROPS)
    props["time.precision.mode"] = "connect"
    eng = VitessCdcEngine(spark, props)
    schema = eng.schema_from_field_event(
        "ks0", "-80", "t",
        [{"name": "created", "type": "TIME", "column_type": "time(3)"},
         {"name": "ts", "type": "TIMESTAMP", "column_type": "timestamp"}],
    )
    by_name = {c.name: c.resolved for c in schema.columns}
    assert by_name["created"].logical_name == "org.apache.kafka.connect.data.Time"
    assert by_name["ts"].spark_type == T.TimestampType()

    props["time.precision.mode"] = "adaptive"
    with pytest.raises(ValueError):
        VitessCdcEngine(spark, props)


def test_auth_gtid_alias_and_epoch_seed_properties(spark):
    """database.user/password attach static-auth metadata (the reference's
    StaticAuthCredentials keys); deprecated vitess.gtid warns and is IGNORED
    for the start position (reference getVgtid() reads only vitess.vgtid,
    VitessConnectorConfig.java:655-661); vitess.shard.epoch.map /
    vitess.connector.generation seed the epoch provider."""
    import warnings

    from debezium_connector_vitess_spark.engine import VitessCdcEngine

    vg = '[{"keyspace":"ks","shard":"-80","gtid":"MySQL56/host:1-5"}]'
    props = dict(BASE_PROPS)
    props.update({
        "database.user": "cdc_user",
        "database.password": "s3cret",
        "vitess.gtid": vg,
        "vitess.shard.epoch.map": '{"-80": 3}',
        "vitess.connector.generation": "2",
    })
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        eng = VitessCdcEngine(spark, props)
    assert any(issubclass(w.category, DeprecationWarning) for w in caught)
    assert eng.config.grpc_headers["username"] == "cdc_user"
    assert eng.config.grpc_headers["password"] == "s3cret"
    # deprecated alias is NOT consumed as the start position
    assert eng.config.explicit_vgtid is None
    prov = eng.epoch_provider()
    assert prov.epochs.get("-80") == 3
    assert prov.connector_generation == 2

    # vitess.vgtid is the only field that sets the explicit position
    props["vitess.vgtid"] = '[{"keyspace":"ks","shard":"-80","gtid":"MySQL56/host:1-9"}]'
    eng2 = VitessCdcEngine(spark, props)
    assert "1-9" in eng2.config.explicit_vgtid
