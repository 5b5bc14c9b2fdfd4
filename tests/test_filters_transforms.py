"""Filter + SMT unit tests (reference Filters/RemoveFieldTest/
ReplaceFieldValueTest/UseLocalVgtidTest analogs)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from debezium_connector_vitess_spark.filters import ColumnFilter, TableFilter, prune_empty_shards
from debezium_connector_vitess_spark.sinks import TopicNamingStrategy
from debezium_connector_vitess_spark.transforms import (
    ddl_operation_expr,
    ddl_table_expr,
    local_vgtid_expr,
)


def test_table_filter_matches():
    tf = TableFilter(include_list=[r"ks\.t[12]"])
    assert tf.matches("ks", "t1")
    assert not tf.matches("ks", "t3")
    # system schemas always excluded (Filters.java:20-58)
    assert not tf.matches("mysql", "t1")
    tf2 = TableFilter(exclude_list=[r"ks\.secret.*"])
    assert tf2.matches("ks", "t1")
    assert not tf2.matches("ks", "secret_stuff")
    # anchored full-match: partial match must not leak through
    tf3 = TableFilter(include_list=[r"ks\.t"])
    assert not tf3.matches("ks", "t1")


def test_table_filter_predicate(spark):
    df = spark.createDataFrame(
        [("ks", "t1"), ("ks", "t2"), ("mysql", "user"), ("ks", "nope")],
        "keyspace string, table_name string",
    )
    tf = TableFilter(include_list=[r"ks\.t[12]"])
    got = sorted(r["table_name"] for r in tf.apply(df).collect())
    assert got == ["t1", "t2"]


def test_column_filter_flat(spark):
    df = spark.createDataFrame([Row(a="hello world", b="x", c=1, d="drop me")])
    cf = ColumnFilter(exclude=["d"], truncate={"a": 5}, mask_const={"b": "***"})
    out = cf.apply_flat(df).collect()[0]
    assert out["a"] == "hello"
    assert out["b"] == "***"
    assert "d" not in out.asDict()


def test_column_filter_images(spark):
    df = spark.createDataFrame(
        [Row(op="u", before=Row(v="secret", k=1), after=Row(v="secret2", k=1)),
         Row(op="c", before=None, after=Row(v="s3", k=2))],
    )
    cf = ColumnFilter(mask_hash=["v"])
    rows = {r["op"]: r for r in cf.apply_images(df).collect()}
    assert rows["u"]["before"]["v"] != "secret" and len(rows["u"]["before"]["v"]) == 64
    assert rows["c"]["before"] is None  # null images stay null
    assert rows["c"]["after"]["k"] == 2


def test_prune_empty_shards():
    assert prune_empty_shards({"-80": True, "80-": False, "0": True}) == ["-80", "0"]


def test_local_vgtid_expr(spark):
    vg = ('[{"keyspace":"ks","shard":"-80","gtid":"g1"},'
          '{"keyspace":"ks","shard":"80-","gtid":"g2"}]')
    df = spark.createDataFrame([Row(vgtid=vg, shard="80-")])
    out = df.select(local_vgtid_expr(F.col("vgtid"), F.col("shard")).alias("lv")).collect()[0]["lv"]
    assert out == '[{"keyspace":"ks","shard":"80-","gtid":"g2"}]'


def test_ddl_extraction(spark):
    cases = [
        ("CREATE TABLE `foo` (id INT)", "CREATE", "foo"),
        ("alter table bar add column c int", "ALTER", "bar"),
        ("/* comment */ DROP TABLE IF EXISTS baz", "DROP", "baz"),
        ("RENAME TABLE a1 TO a2", "ALTER", "a1"),
        ("TRUNCATE TABLE big", "TRUNCATE", "big"),
    ]
    df = spark.createDataFrame([(s,) for s, _, _ in cases], "statement string")
    out = df.select(
        ddl_operation_expr(F.col("statement")).alias("op"),
        ddl_table_expr(F.col("statement")).alias("tbl"),
    ).collect()
    for (stmt, op, tbl), row in zip(cases, out):
        assert row["op"] == op, stmt
        assert row["tbl"] == tbl, stmt


def test_topic_naming(spark):
    df = spark.createDataFrame([("t1",), ("special",)], "table_name string")
    strat = TopicNamingStrategy(prefix="cdc", overrides={"special": "custom.topic"})
    got = {r["table_name"]: r["topic"] for r in strat.attach(df).collect()}
    assert got == {"t1": "cdc.t1", "special": "custom.topic"}


def test_snapshot_table_filter_empty_copies_nothing():
    # Filters.java:39-43 — unset snapshot.mode.tables means NO table copied
    from debezium_connector_vitess_spark.filters import SnapshotTableFilter

    stf = SnapshotTableFilter()
    assert not stf.matches("ks", "t1")
    assert stf.tables_to_copy("ks", ["t1", "t2"]) == []


def test_snapshot_table_filter_include_regex():
    from debezium_connector_vitess_spark.filters import SnapshotTableFilter

    stf = SnapshotTableFilter([r"ks\.orders", r"ks\.inv.*"])
    assert stf.matches("ks", "orders")
    assert stf.matches("ks", "inventory")
    assert not stf.matches("ks", "customer")
    # anchored: partial match must not leak
    assert not stf.matches("ks", "orders_archive")
    assert stf.tables_to_copy("ks", ["orders", "customer", "inventory"]) == [
        "orders",
        "inventory",
    ]


def test_snapshot_table_filter_predicate(spark):
    from debezium_connector_vitess_spark.filters import SnapshotTableFilter

    df = spark.createDataFrame(
        [("ks", "orders"), ("ks", "customer")], "keyspace string, table_name string"
    )
    stf = SnapshotTableFilter([r"ks\.orders"])
    got = [r["table_name"] for r in df.filter(stf.predicate(F.col("keyspace"), F.col("table_name"))).collect()]
    assert got == ["orders"]
    empty = SnapshotTableFilter()
    assert df.filter(empty.predicate(F.col("keyspace"), F.col("table_name"))).count() == 0


def test_kafka_record_contract(spark):
    """S5: the exact (key, value, topic) shape the kafka sink consumes —
    key stringified, value = JSON of all non-key/topic columns, topic
    passed through (VitessConnectorTask.java:236-240 poll analog)."""
    import json

    from debezium_connector_vitess_spark.sinks import kafka_records

    df = spark.createDataFrame(
        [(7, "cdc.t1", "c", 1.5)], "key long, topic string, op string, val double"
    )
    out = kafka_records(df)
    assert out.columns == ["key", "value", "topic"]
    r = out.collect()[0]
    assert r["key"] == "7"
    assert r["topic"] == "cdc.t1"
    assert json.loads(r["value"]) == {"op": "c", "val": 1.5}


def test_enforce_record_size_proportional(spark):
    """Larger fields lose more absolute characters; small fields exempt;
    within-budget records untouched (EnforceRecordSize semantics,
    VitessConnectorIT shouldTruncateProportionallyBasedOnColumnSize)."""
    from debezium_connector_vitess_spark.transforms import enforce_record_size

    df = spark.createDataFrame(
        [
            (1, "a" * 1000, "b" * 1500, "id"),   # oversize: truncate both
            (2, "a" * 10, "b" * 20, "id"),       # within budget: untouched
        ],
        "k long, text_col string, mediumtext_col string, tiny string",
    )
    out = {
        r["k"]: r
        for r in enforce_record_size(
            df, 1000, ("text_col", "mediumtext_col", "tiny"), min_field_size=4
        ).collect()
    }
    r1 = out[1]
    assert len(r1["text_col"]) < 1000 and len(r1["mediumtext_col"]) < 1500
    # proportional: the larger column is cut more in absolute chars
    assert (1500 - len(r1["mediumtext_col"])) > (1000 - len(r1["text_col"]))
    # budget met and the tiny field (< min_field_size) untouched
    assert len(r1["text_col"]) + len(r1["mediumtext_col"]) + len(r1["tiny"]) <= 1000
    assert r1["tiny"] == "id"
    r2 = out[2]
    assert r2["text_col"] == "a" * 10 and r2["mediumtext_col"] == "b" * 20


def test_topic_override_prefix_with_exclude_list(spark):
    """override.data.change.topic.prefix applies to every table EXCEPT the
    exclude-regex list, which keeps the normal prefix; per-table overrides
    win over both (TableTopicNamingStrategy.java:51-138)."""
    df = spark.createDataFrame(
        [("t1",), ("legacy_a",), ("special",)], "table_name string"
    )
    strat = TopicNamingStrategy(
        prefix="cdc",
        override_prefix="v2",
        override_prefix_exclude=("legacy_.*",),
        overrides={"special": "custom.topic"},
    )
    got = {r["table_name"]: r["topic"] for r in strat.attach(df).collect()}
    assert got == {"t1": "v2.t1", "legacy_a": "cdc.legacy_a", "special": "custom.topic"}


def test_topic_override_exclude_matches_qualified_name(spark):
    """The exclude regex matches the schema-qualified 'keyspace.table' string
    (TableTopicNamingStrategy + VitessTableIdToStringMapper), so
    upstream-style patterns like '.*\\.heartbeat' keep the default prefix."""
    df = spark.createDataFrame(
        [("ks0", "heartbeat"), ("ks0", "users"), ("other", "heartbeat")],
        "keyspace string, table_name string",
    )
    strat = TopicNamingStrategy(
        prefix="cdc",
        override_prefix="v2",
        override_prefix_exclude=(r".*\.heartbeat", r"ks0\.users_archive"),
    )
    got = {
        (r["keyspace"], r["table_name"]): r["topic"] for r in strat.attach(df).collect()
    }
    assert got == {
        ("ks0", "heartbeat"): "cdc.heartbeat",
        ("ks0", "users"): "v2.users",
        ("other", "heartbeat"): "cdc.heartbeat",
    }


def test_topic_name_sanitized(spark):
    """Characters Kafka rejects in topic names become '_' (inherited
    sanitizedTopicName behavior); dashes/dots stay (tables with dashes
    stream to same-named topics)."""
    df = spark.createDataFrame([("my table!",), ("dash-ok",)], "table_name string")
    strat = TopicNamingStrategy(prefix="cdc")
    got = {r["table_name"]: r["topic"] for r in strat.attach(df).collect()}
    assert got == {"my table!": "cdc.my_table_", "dash-ok": "cdc.dash-ok"}


def test_schema_change_topic_routing(spark):
    """Schema-change records route to the override topic if set, else to the
    prefix itself (upstream default), sanitized either way."""
    df = spark.createDataFrame([("t1", "CREATE")], "table_name string, operation string")
    default = TopicNamingStrategy(prefix="cdc srv")
    assert default.schema_change_topic_name() == "cdc_srv"
    overridden = TopicNamingStrategy(prefix="cdc", schema_change_topic="schema-hist")
    out = overridden.attach_schema_changes(df).collect()[0]
    assert out["topic"] == "schema-hist"
