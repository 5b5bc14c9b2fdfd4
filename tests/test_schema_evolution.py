"""FIELD-event schema inference + mid-stream evolution — the Spark analog of
VStreamOutputMessageDecoderTest.java:336-505 (add/remove column, per-shard
independence) and handleFieldMessage (:331-377)."""

import json

import pytest

from debezium_connector_vitess_spark.decode import (
    RAW_EVENT_SCHEMA,
    collect_field_schemas,
    decode_table_evolving,
)
from debezium_connector_vitess_spark.types import (
    NOT_NULL_FLAG,
    PRI_KEY_FLAG,
    UNIQUE_KEY_FLAG,
    SchemaRegistry,
    field_event_to_schema,
)
from pyspark.sql import types as T


def _fields_v1():
    return [
        {"name": "id", "type": "INT64", "column_type": "bigint(20)",
         "flags": PRI_KEY_FLAG | NOT_NULL_FLAG},
        {"name": "name", "type": "VARCHAR", "column_type": "varchar(64)", "flags": 0},
    ]


def test_field_event_to_schema_resolution_and_flags():
    s = field_event_to_schema("ks", "-80", "t1", _fields_v1())
    assert [c.name for c in s.columns] == ["id", "name"]
    assert isinstance(s.columns[0].resolved.spark_type, T.LongType)
    assert s.columns[0].is_primary_key and not s.columns[0].optional
    assert s.columns[1].optional and not s.columns[1].is_primary_key
    assert s.key_columns == ["id"]


def test_field_event_to_schema_unique_key_and_enum():
    fields = [
        {"name": "code", "type": "VARCHAR", "column_type": "varchar(8)",
         "flags": UNIQUE_KEY_FLAG},
        {"name": "status", "type": "ENUM", "column_type": "enum('a','b')", "flags": 0},
    ]
    s = field_event_to_schema("ks", "0", "t", fields, enum_set_string_values=True)
    assert s.key_columns == ["code"]  # unique key fallback, no PK
    assert s.columns[1].resolved.enum_values == ("a", "b")


def test_field_event_rejects_anonymized_columns():
    with pytest.raises(ValueError, match="anonymized"):
        field_event_to_schema("ks", "0", "t", [{"name": "@1", "type": "INT64"}])


def test_registry_apply_field_event_overwrites_per_shard():
    reg = SchemaRegistry()
    reg.apply_field_event("ks", "-80", "t1", _fields_v1())
    reg.apply_field_event("ks", "80-", "t1", _fields_v1())
    # online DDL lands on one shard first (X3): only that shard's entry moves
    v2 = _fields_v1() + [{"name": "extra", "type": "INT32", "column_type": "int(11)", "flags": 0}]
    reg.apply_field_event("ks", "-80", "t1", v2)
    assert [c.name for c in reg.get("ks", "-80", "t1").columns] == ["id", "name", "extra"]
    assert [c.name for c in reg.get("ks", "80-", "t1").columns] == ["id", "name"]


def _raw(rows):
    return rows


def _field_row(shard, seq, fields):
    return ("FIELD", "ks", shard, "t1", f"MySQL56/host0:1-{seq}",
            None, None, None, None, None,
            [(f["name"], f["type"], f.get("column_type"), f.get("flags")) for f in fields])


def _row_event(shard, seq, after, before=None):
    return ("ROW", "ks", shard, "t1", f"MySQL56/host0:1-{seq}",
            "[]", str(seq), None, [(before, after)], None, None)


def test_decode_table_evolving_add_column(spark):
    v1 = _fields_v1()
    v2 = v1 + [{"name": "age", "type": "INT32", "column_type": "int(11)", "flags": 0}]
    rows = [
        _field_row("-80", 1, v1),
        _row_event("-80", 2, {"id": "1", "name": "a", "age": "99"}),  # age unknown yet
        _field_row("-80", 10, v2),
        _row_event("-80", 11, {"id": "2", "name": "b", "age": "7"}),
    ]
    df = spark.createDataFrame(rows, RAW_EVENT_SCHEMA)
    out = decode_table_evolving(df, "ks", "t1").orderBy("seq").collect()
    assert [r["schema_gen"] for r in out] == [1, 2]
    assert out[0]["after_age"] is None  # gen-1 schema does not know the column
    assert out[1]["after_age"] == 7
    assert out[0]["after_id"] == 1 and out[0]["after_name"] == "a"


def test_decode_table_evolving_remove_column_and_per_shard(spark):
    v1 = _fields_v1()
    v_dropped = [v1[0]]  # DROP COLUMN name
    rows = [
        _field_row("-80", 1, v1),
        _field_row("80-", 1, v1),
        _row_event("-80", 2, {"id": "1", "name": "a"}),
        _field_row("-80", 5, v_dropped),  # drop lands on -80 only
        _row_event("-80", 6, {"id": "2", "name": "zombie"}),
        _row_event("80-", 6, {"id": "3", "name": "c"}),
    ]
    df = spark.createDataFrame(rows, RAW_EVENT_SCHEMA)
    out = {(r["shard"], r["seq"]): r for r in decode_table_evolving(df, "ks", "t1").collect()}
    assert out[("-80", 2)]["after_name"] == "a"
    assert out[("-80", 6)]["after_name"] is None  # dropped column decodes to null
    assert out[("80-", 6)]["after_name"] == "c"  # other shard unaffected (X3)
    assert out[("-80", 6)]["schema_gen"] == 2 and out[("80-", 6)]["schema_gen"] == 1


def test_collect_field_schemas_orders_generations(spark):
    v1 = _fields_v1()
    v2 = v1 + [{"name": "x", "type": "FLOAT64", "column_type": "double", "flags": 0}]
    df = spark.createDataFrame(
        [_field_row("-80", 20, v2), _field_row("-80", 1, v1)], RAW_EVENT_SCHEMA
    )
    gens = collect_field_schemas(df, "ks", "t1")["-80"]
    assert [(seq, g) for seq, g, _ in gens] == [(1, 1), (20, 2)]
    assert [c.name for c in gens[1][2].columns] == ["id", "name", "x"]


def test_replay_stream_carries_field_events(spark, tmp_path):
    """FIELD events flow source → raw frame → registry (D4 end-to-end)."""
    from debezium_connector_vitess_spark.sources.replay import register

    d = tmp_path / "replay"
    d.mkdir()
    events = [
        {"kind": "FIELD", "keyspace": "ks", "table": "t1", "seq": 1,
         "fields": _fields_v1()},
        {"kind": "BEGIN", "keyspace": "ks", "seq": 1},
        {"kind": "ROW", "keyspace": "ks", "table": "t1", "seq": 2,
         "row_changes": [{"before": None, "after": {"id": "1", "name": "a"}}]},
        {"kind": "COMMIT", "keyspace": "ks", "seq": 2},
    ]
    with open(d / "-80.jsonl", "w") as fh:
        for e in events:
            fh.write(json.dumps(e) + "\n")
    register(spark)
    df = spark.readStream.format("vitess-replay").option("path", str(d)).load()
    q = (
        df.writeStream.format("memory").queryName("field_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    batch = spark.sql("SELECT * FROM field_out").collect()
    fields_rows = [r for r in batch if r["event_kind"] == "FIELD"]
    assert len(fields_rows) == 1
    reg = SchemaRegistry()
    reg.apply_field_event(
        "ks", fields_rows[0]["shard"], fields_rows[0]["table_name"],
        [f.asDict() for f in fields_rows[0]["fields"]],
    )
    got = reg.get("ks", "-80", "t1")
    assert got is not None and got.key_columns == ["id"]
