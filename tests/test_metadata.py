"""VTGate metadata client (S4): quoting/escaping, wire-row parsing, shard and
table discovery with a fake transport."""

from __future__ import annotations

import pytest

from debezium_connector_vitess_spark.sources.metadata import (
    VitessMetadata,
    WORKLOAD_HINT,
    escape_like_pattern,
    escape_string_literal,
    flatten_and_concat,
    non_empty_shards_from_tablets,
    parse_packed_rows,
    quote_identifier,
    shards_from_shard_rows,
)


def test_quote_identifier():
    assert quote_identifier("ks") == "`ks`"
    assert quote_identifier("we`ird") == "`we``ird`"


def test_escape_string_literal():
    assert escape_string_literal(r"a\b'c") == r"a\\b\'c"


def test_escape_like_pattern_wildcards_literal():
    assert escape_like_pattern("foo_bar") == r"foo\_bar"
    assert escape_like_pattern("100%") == r"100\%"
    # backslash escaped first, so it doesn't double-escape the added ones
    assert escape_like_pattern(r"a\_b") == r"a\\\_b"


def test_parse_packed_rows_null_and_offsets():
    rows = parse_packed_rows([([3, -1, 2], b"abcde"), ([0], b"")])
    assert rows == [["abc", None, "de"], [""]]


def test_flatten_and_concat_skips_nulls():
    assert flatten_and_concat([["a", None, "b"], [None]]) == ["ab", ""]


def test_shards_from_shard_rows():
    assert shards_from_shard_rows([["ks/-80"], ["ks/80-"]]) == ["-80", "80-"]
    with pytest.raises(ValueError):
        shards_from_shard_rows([["no-slash"]])


def test_non_empty_shards_from_tablets():
    rows = [
        ["cell1", "ks", "-80", "PRIMARY", "SERVING"],
        ["cell1", "ks", "-80", "REPLICA", "SERVING"],  # dup shard
        ["cell1", "other", "0", "PRIMARY", "SERVING"],  # other keyspace
        ["cell1", "ks", "80-", "PRIMARY", "SERVING"],
        ["short"],  # malformed row skipped
    ]
    assert non_empty_shards_from_tablets(rows, "ks") == ["-80", "80-"]


class FakeExec:
    def __init__(self, responses):
        self.responses = responses
        self.calls = []

    def __call__(self, sql, shard):
        self.calls.append((sql, shard))
        for prefix, rows in self.responses.items():
            if sql.removeprefix(WORKLOAD_HINT).startswith(prefix):
                return rows
        raise AssertionError(f"unexpected query: {sql}")


def test_get_shards_via_like():
    ex = FakeExec({"SHOW VITESS_SHARDS": [["my_ks/-80"], ["my_ks/80-"]]})
    md = VitessMetadata(keyspace="my_ks", execute=ex)
    assert md.get_shards() == ["-80", "80-"]
    # the keyspace's underscore is escaped in the LIKE pattern
    assert r"my\\_ks/%" in ex.calls[0][0]
    assert ex.calls[0][0].startswith(WORKLOAD_HINT)


def test_get_shards_exclude_empty_uses_tablets():
    ex = FakeExec({"SHOW VITESS_TABLETS": [["c", "ks", "0", "PRIMARY", "SERVING"]]})
    md = VitessMetadata(keyspace="ks", execute=ex, exclude_empty_shards=True)
    assert md.get_shards() == ["0"]


def test_get_tables_quotes_keyspace():
    ex = FakeExec({"SHOW TABLES FROM `my`` ks`": [["t1"], ["t2"]]})
    md = VitessMetadata(keyspace="my` ks", execute=ex)
    assert md.get_tables() == ["t1", "t2"]


def test_get_tables_exclude_empty_targets_serving_shard():
    ex = FakeExec(
        {
            "SHOW VITESS_TABLETS": [["c", "ks", "-80", "PRIMARY", "SERVING"]],
            "SHOW TABLES": [["t1"]],
        }
    )
    md = VitessMetadata(keyspace="ks", execute=ex, exclude_empty_shards=True)
    assert md.get_tables() == ["t1"]
    assert ex.calls[-1] == (WORKLOAD_HINT + "SHOW TABLES", "-80")


def test_validate_connection():
    ex = FakeExec({"SHOW DATABASES": [["ks"], ["other"]]})
    VitessMetadata(keyspace="ks", execute=ex).validate_connection()
    with pytest.raises(ValueError, match="not found"):
        VitessMetadata(keyspace="absent", execute=ex).validate_connection()


def test_plan_shard_partitions_precedence():
    from debezium_connector_vitess_spark.sources.vstream import (
        VStreamConfig,
        plan_shard_partitions,
    )

    ex = FakeExec({"SHOW VITESS_SHARDS": [["ks/-80"], ["ks/80-"]]})
    md = VitessMetadata(keyspace="ks", execute=ex)
    # discovery path: one shard per partition
    assert plan_shard_partitions(VStreamConfig(keyspace="ks"), md) == [["-80"], ["80-"]]
    # configured shards win over discovery; max_tasks groups them
    cfg = VStreamConfig(keyspace="ks", shards=["a", "b", "c"])
    assert plan_shard_partitions(cfg, md, max_tasks=2) == [["a", "c"], ["b"]]
    # explicit vgtid wins over both (reshard: stored shards may differ)
    cfg = VStreamConfig(
        keyspace="ks",
        shards=["a"],
        explicit_vgtid='[{"keyspace":"ks","shard":"-40","gtid":"current"},'
        '{"keyspace":"ks","shard":"40-","gtid":"current"}]',
    )
    assert plan_shard_partitions(cfg, md) == [["-40"], ["40-"]]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no shards"):
        plan_shard_partitions(VStreamConfig(keyspace="ks"))
