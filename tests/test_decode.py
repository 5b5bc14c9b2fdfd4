"""Value-conversion tests over fabricated raw events — the Spark analog of the
reference's VitessValueConverterTest / ReplicationMessageColumnValueResolverTest
(SURVEY.md §5 tier 1)."""

import base64
import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from debezium_connector_vitess_spark.decode import (
    RAW_EVENT_SCHEMA,
    convert_raw,
    decode_table,
    enum_index_to_literal,
    explode_row_changes,
    set_bitmask_to_csv,
    time_to_micros,
)
from debezium_connector_vitess_spark.types import (
    BinaryHandlingMode,
    ColumnMetaData,
    TableSchema,
    resolve,
)


def _one_col(spark, raw_value, expr_fn):
    df = spark.createDataFrame([Row(raw=raw_value)], "raw string")
    return df.select(expr_fn(F.col("raw")).alias("out")).collect()[0]["out"]


def test_time_to_micros(spark):
    assert _one_col(spark, "10:59:59", time_to_micros) == (10 * 3600 + 59 * 60 + 59) * 1_000_000
    assert _one_col(spark, "00:00:01.5", time_to_micros) == 1_500_000
    assert _one_col(spark, "838:59:59", time_to_micros) == (838 * 3600 + 59 * 60 + 59) * 1_000_000
    assert _one_col(spark, "-01:00:00", time_to_micros) == -3_600_000_000
    assert _one_col(spark, "01:02:03.000123", time_to_micros) == (3600 + 120 + 3) * 1_000_000 + 123


def test_enum_index_to_literal(spark):
    vals = ("small", "medium", "large")
    assert _one_col(spark, "2", lambda c: enum_index_to_literal(c, vals)) == "medium"
    assert _one_col(spark, "0", lambda c: enum_index_to_literal(c, vals)) == ""  # invalid sentinel
    # copy phase sends literals through
    assert _one_col(spark, "large", lambda c: enum_index_to_literal(c, vals)) == "large"
    # ambiguous numeric enum values: index decode wins (enum_ambiguous_table)
    amb = ("2", "0", "1")
    assert _one_col(spark, "1", lambda c: enum_index_to_literal(c, amb)) == "2"


def test_set_bitmask_to_csv(spark):
    vals = ("a", "b", "c", "d")
    assert _one_col(spark, "5", lambda c: set_bitmask_to_csv(c, vals)) == "a,c"
    assert _one_col(spark, "0", lambda c: set_bitmask_to_csv(c, vals)) == ""
    assert _one_col(spark, "15", lambda c: set_bitmask_to_csv(c, vals)) == "a,b,c,d"


def test_set_copy_phase_literal_passthrough(spark):
    # VStream Copy sends SET as literal strings — delivered as-is
    # (VitessValueConverter.java:325-338)
    vals = ("a", "b", "c")
    assert _one_col(spark, "a,b", lambda c: set_bitmask_to_csv(c, vals)) == "a,b"
    assert _one_col(spark, "c", lambda c: set_bitmask_to_csv(c, vals)) == "c"


def test_set_full_64_member_range(spark):
    # MySQL SET allows 64 members; bit 63 set ⇒ unsigned mask ≥ 2^63
    vals = tuple(f"m{i}" for i in range(64))
    assert _one_col(spark, str(1 << 63), lambda c: set_bitmask_to_csv(c, vals)) == "m63"
    assert (
        _one_col(spark, str((1 << 63) | 1), lambda c: set_bitmask_to_csv(c, vals)) == "m0,m63"
    )
    assert _one_col(spark, str(2**64 - 1), lambda c: set_bitmask_to_csv(c, vals)) == ",".join(
        vals
    )


def test_enum_missing_options_fallback(spark):
    # no parsed enum values: numeric index → '' (reference null-options
    # branch), literal passes through
    assert _one_col(spark, "3", lambda c: enum_index_to_literal(c, ())) == ""
    assert _one_col(spark, "lit", lambda c: enum_index_to_literal(c, ())) == "lit"


def test_bit1_base64_transport(spark):
    # BIT(1) over the binlog wire format is base64 bytes: bytes[0] != 0
    # (VitessValueConverter.java:154-167); '0'/'1' literals also accepted
    r = resolve("BIT", "bit(1)", decimals=1)
    assert _one_col(spark, base64.b64encode(b"\x01").decode(), lambda c: convert_raw(c, r)) is True
    assert _one_col(spark, base64.b64encode(b"\x00").decode(), lambda c: convert_raw(c, r)) is False
    assert _one_col(spark, "1", lambda c: convert_raw(c, r)) is True
    assert _one_col(spark, "0", lambda c: convert_raw(c, r)) is False


@pytest.mark.parametrize(
    "ftype,coltype,raw,expected",
    [
        ("INT8", "tinyint", "1", 1),
        ("INT32", "int", "-2147483648", -2147483648),
        ("INT64", "bigint", "23", 23),
        ("UINT64", "bigint unsigned", "18446744073709551615", "18446744073709551615"),
        ("FLOAT32", "float", "1.5", 1.5),
        ("DECIMAL", "decimal(10,4)", "12.3400", "12.3400"),
        ("JSON", "json", '{"a":1}', '{"a":1}'),
        ("YEAR", "year", "2024", 2024),
        ("DATE", "date", "2024-03-01", datetime.date(2024, 3, 1)),
        ("DATE", "date", "0000-00-00", None),  # zero-date nullable mode
        ("TIMESTAMP", "timestamp", "2024-03-01 10:00:00", "2024-03-01T10:00:00Z"),
        ("TIMESTAMP", "timestamp", "0000-00-00 00:00:00", None),
    ],
)
def test_convert_raw_families(spark, ftype, coltype, raw, expected):
    out = _one_col(spark, raw, lambda c: convert_raw(c, resolve(ftype, coltype)))
    assert out == expected


def test_convert_zero_date_epoch_mode(spark):
    out = _one_col(
        spark,
        "0000-00-00",
        lambda c: convert_raw(c, resolve("DATE"), nullable_zero_dates=False),
    )
    assert out == datetime.date(1970, 1, 1)


def test_binary_modes(spark):
    b64 = base64.b64encode(b"\x01\x02").decode()
    assert _one_col(spark, b64, lambda c: convert_raw(c, resolve("VARBINARY"))) == b"\x01\x02"
    assert (
        _one_col(
            spark, b64,
            lambda c: convert_raw(c, resolve("VARBINARY", binary_mode=BinaryHandlingMode.HEX),
                                  binary_mode=BinaryHandlingMode.HEX),
        )
        == "0102"
    )


def _raw_events_df(spark):
    rows = [
        # one tx: BEGIN, insert+update in one ROW event, delete, COMMIT
        ("BEGIN", "ks", "-80", None, "g1", "[vg1]", "tx1", datetime.datetime(2024, 1, 1), None, None, None),
        (
            "ROW", "ks", "-80", "t1", "g1", "[vg1]", "tx1",
            datetime.datetime(2024, 1, 1, 0, 0, 1),
            [
                {"before": None, "after": {"id": "1", "v": "x"}},
                {"before": {"id": "1", "v": "x"}, "after": {"id": "1", "v": "y"}},
            ],
            None,
            None,
        ),
        (
            "ROW", "ks", "-80", "t1", "g1", "[vg1]", "tx1",
            datetime.datetime(2024, 1, 1, 0, 0, 2),
            [{"before": {"id": "2", "v": "z"}, "after": None}],
            None,
            None,
        ),
        ("COMMIT", "ks", "-80", None, "g2", "[vg2]", "tx1", datetime.datetime(2024, 1, 1, 0, 0, 3), None, None, None),
    ]
    return spark.createDataFrame(rows, RAW_EVENT_SCHEMA)


def test_explode_row_changes_ops(spark):
    out = explode_row_changes(_raw_events_df(spark)).select("op", "change_idx").collect()
    assert sorted((r["op"], r["change_idx"]) for r in out) == [("c", 0), ("d", 0), ("u", 1)]


def test_decode_table_envelope(spark):
    schema = TableSchema(
        "ks", "-80", "t1",
        [
            ColumnMetaData("id", resolve("INT64"), optional=False, is_primary_key=True),
            ColumnMetaData("v", resolve("VARCHAR")),
        ],
    )
    env = decode_table(_raw_events_df(spark), schema, server_name="test_server")
    rows = {(r["op"]): r for r in env.collect()}
    assert set(rows) == {"c", "u", "d"}
    assert rows["c"]["before"] is None and rows["c"]["after"]["id"] == 1
    assert rows["u"]["before"]["v"] == "x" and rows["u"]["after"]["v"] == "y"
    assert rows["d"]["after"] is None and rows["d"]["before"]["id"] == 2
    src = rows["c"]["source"]
    assert src["connector"] == "vitess" and src["name"] == "test_server"
    assert src["db"] == "" and src["shard"] == "-80" and src["vgtid"] == "[vg1]"
    assert rows["c"]["ts_ms"] == 1704067201000


class TestFailureHandling:
    """E4: event.processing.failure.handling.mode warn/skip semantics."""

    def _frame(self, spark):
        from pyspark.sql import Row

        return spark.createDataFrame(
            [
                Row(id=1, raw={"v": "1.5", "n": "7"}),
                Row(id=2, raw={"v": "garbage", "n": "8"}),
                Row(id=3, raw={"v": None, "n": "bad"}),
            ]
        )

    def _schema(self):
        from debezium_connector_vitess_spark.types import (
            ColumnMetaData,
            TableSchema,
            resolve,
        )

        return TableSchema(
            "ks", "0", "t",
            [ColumnMetaData("v", resolve("FLOAT64")), ColumnMetaData("n", resolve("INT32"))],
        )

    def test_decode_errors_expr_flags_bad_columns(self, spark):
        from pyspark.sql import functions as F

        from debezium_connector_vitess_spark.decode import decode_errors_expr

        df = self._frame(spark)
        out = {
            r["id"]: r["errs"]
            for r in df.select(
                "id", decode_errors_expr(F.col("raw"), self._schema()).alias("errs")
            ).collect()
        }
        assert out[1] == []
        assert out[2] == ["v"]
        assert out[3] == ["n"]  # null raw value is NOT an error; bad int is

    def test_permissive_convert_nulls_malformed(self, spark):
        from pyspark.sql import functions as F

        from debezium_connector_vitess_spark.decode import convert_raw
        from debezium_connector_vitess_spark.types import resolve

        df = self._frame(spark)
        vals = {
            r["id"]: r["v"]
            for r in df.select(
                "id",
                convert_raw(F.col("raw").getItem("v"), resolve("FLOAT64"), permissive=True).alias("v"),
            ).collect()
        }
        assert vals[1] == 1.5 and vals[2] is None and vals[3] is None


def test_sanitize_field_name(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.envelope import sanitize_field_name_expr

    df = spark.createDataFrame(
        [Row(n="9to5-col"), Row(n="ok_name"), Row(n="weird col!"), Row(n="_fine9")]
    )
    out = [r["s"] for r in df.select(sanitize_field_name_expr(F.col("n")).alias("s")).collect()]
    assert out == ["_9to5_col", "ok_name", "weird_col_", "_fine9"]


def test_load_events_ts_is_session_timezone_independent(spark, sf_dir):
    """The events parquet arrives as TIMESTAMP_NTZ (no isAdjustedToUTC); the
    loader must pin the UTC interpretation via pure NTZ arithmetic so
    unix_millis matches the DuckDB oracle's epoch_ms under ANY
    spark.sql.session.timeZone (regression: to_utc_timestamp routes the
    NTZ→TIMESTAMP cast through the session zone and drifts)."""
    import duckdb

    from debezium_connector_vitess_spark import changelog

    con = duckdb.connect()
    expect = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT event_id, epoch_ms(ts) FROM read_parquet('{sf_dir}/events.parquet') "
            "ORDER BY event_id LIMIT 50"
        ).fetchall()
    }
    con.close()
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/Chicago", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = {
                r["event_id"]: r["ms"]
                for r in changelog.load_events(spark, sf_dir)
                .select("event_id", F.unix_millis("ts").alias("ms"))
                .filter(F.col("event_id") < 50)
                .collect()
            }
            assert got == {k: v for k, v in expect.items() if k < 50}, tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_connect_and_isostring_temporal_modes(spark):
    """time.precision.mode=connect (millis truncation, Connect logical
    types) and isostring (raw VStream string passthrough) — reference
    VitessValueConverter connect path + ReplicationMessageColumnValueResolver
    isostring passthrough (:63-73)."""
    import datetime

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from debezium_connector_vitess_spark.decode import convert_raw
    from debezium_connector_vitess_spark.types import TemporalPrecisionMode, resolve

    df = spark.createDataFrame(
        [("11:22:33.123456", "-100:30:00.999", "2024-03-05 10:20:30.123456",
          "2024-03-05 10:20:30.123456")],
        "t string, tneg string, dt string, ts string",
    )
    conn = lambda fam: resolve(fam, temporal_mode=TemporalPrecisionMode.CONNECT)
    iso = lambda fam: resolve(fam, temporal_mode=TemporalPrecisionMode.ISOSTRING)
    out = df.select(
        convert_raw(F.col("t"), conn("TIME")).alias("t_ms"),
        convert_raw(F.col("tneg"), conn("TIME")).alias("tneg_ms"),
        convert_raw(F.col("dt"), conn("DATETIME")).alias("dt_conn"),
        convert_raw(F.col("ts"), conn("TIMESTAMP")).alias("ts_conn"),
        convert_raw(F.col("t"), iso("TIME")).alias("t_iso"),
        convert_raw(F.col("ts"), iso("TIMESTAMP")).alias("ts_iso"),
    )
    assert out.schema["ts_conn"].dataType == T.TimestampType()
    assert out.schema["dt_conn"].dataType == T.TimestampNTZType()
    r = out.collect()[0]
    assert r["t_ms"] == (11 * 3600 + 22 * 60 + 33) * 1000 + 123
    assert r["tneg_ms"] == -((100 * 3600 + 30 * 60) * 1000 + 999)
    assert r["dt_conn"] == datetime.datetime(2024, 3, 5, 10, 20, 30, 123000)
    # session tz pinned UTC in conftest; connect TIMESTAMP is millis-truncated
    assert r["ts_conn"] == datetime.datetime(2024, 3, 5, 10, 20, 30, 123000)
    # isostring: untouched VStream strings for DATE/TIME/DATETIME — but
    # TIMESTAMP is excluded from isostring (VitessValueConverter.isTemporal()
    # covers only DATE/TIME/DATETIME, VitessValueConverter.java:138-146), so
    # it still emits the ZonedTimestamp ISO-8601 Z form
    assert r["t_iso"] == "11:22:33.123456"
    assert r["ts_iso"] == "2024-03-05T10:20:30.123456Z"


def test_connect_time_resolution_logical_names():
    from pyspark.sql import types as T

    from debezium_connector_vitess_spark.types import TemporalPrecisionMode, resolve

    t = resolve("TIME", temporal_mode=TemporalPrecisionMode.CONNECT)
    assert t.spark_type == T.LongType()
    assert t.logical_name == "org.apache.kafka.connect.data.Time"
    dt = resolve("DATETIME", temporal_mode=TemporalPrecisionMode.CONNECT)
    assert dt.logical_name == "org.apache.kafka.connect.data.Timestamp"
    # TIMESTAMP is excluded from isostring: always ZonedTimestamp
    # (VitessValueConverter.java:138-146 — isTemporal() omits TIMESTAMP)
    ts_iso = resolve("TIMESTAMP", temporal_mode=TemporalPrecisionMode.ISOSTRING)
    assert ts_iso.spark_type == T.StringType()
    assert ts_iso.logical_name == "io.debezium.time.ZonedTimestamp"


def test_connect_time_millis_many_cases(spark):
    """Connect-mode TIME millis vs a Python reference over generated cases:
    negatives, zero, max range (838:59:59), every fractional width."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.decode import convert_raw
    from debezium_connector_vitess_spark.types import TemporalPrecisionMode, resolve

    cases = []
    for h, m, s, frac in [
        (0, 0, 0, ""), (0, 0, 1, ".9"), (1, 2, 3, ".04"), (12, 34, 56, ".789"),
        (99, 59, 59, ".9999"), (100, 30, 0, ".99999"), (838, 59, 59, ".999999"),
        (8, 0, 0, ".000001"), (23, 59, 59, ".5"),
    ]:
        base = f"{h}:{m:02d}:{s:02d}{frac}"
        cases.append(base)
        cases.append("-" + base)

    def expect(t):
        neg = t.startswith("-")
        body = t.lstrip("-")
        hms, _, frac = body.partition(".")
        h, m, s = (int(x) for x in hms.split(":"))
        micros = int((frac + "000000")[:6]) if frac else 0
        total_us = (h * 3600 + m * 60 + s) * 1_000_000 + micros
        ms = total_us // 1000  # toward zero on the magnitude
        return -ms if neg else ms

    r = resolve("TIME", temporal_mode=TemporalPrecisionMode.CONNECT)
    df = spark.createDataFrame([(c,) for c in cases], "raw string")
    got = {
        row["raw"]: row["ms"]
        for row in df.select("raw", convert_raw(F.col("raw"), r).alias("ms")).collect()
    }
    for c in cases:
        assert got[c] == expect(c), (c, got[c], expect(c))


def test_decode_review_hardening(spark):
    """r6 decode review regressions: numeric-looking ENUM/SET literals under
    enum_set_string_values are NOT reinterpreted as indexes/bitmasks;
    malformed TIME nulls instead of ANSI-killing the task; a legitimate
    zero-date is not flagged as a decode error; decode_table accepts the
    full mode set including temporal_mode."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.decode import (
        convert_raw,
        decode_errors_expr,
        time_to_micros,
    )
    from debezium_connector_vitess_spark.types import (
        TableSchema,
        field_event_to_schema,
    )

    # ENUM('2','1') with string literals: '2' must stay '2', not index->'1'
    schema = field_event_to_schema(
        "ks", "-", "t",
        [{"name": "e", "type": "ENUM", "column_type": "enum('2','1')", "flags": 0},
         {"name": "s", "type": "SET", "column_type": "set('2','3')", "flags": 0}],
        enum_set_string_values=True,
    )
    df = spark.createDataFrame([("2", "2")], "e STRING, s STRING")
    got = df.select(
        convert_raw(F.col("e"), schema.columns[0].resolved).alias("e"),
        convert_raw(F.col("s"), schema.columns[1].resolved).alias("s"),
    ).collect()[0]
    assert (got.e, got.s) == ("2", "2")
    # without the flag, index semantics still apply
    schema_idx = field_event_to_schema(
        "ks", "-", "t",
        [{"name": "e", "type": "ENUM", "column_type": "enum('2','1')", "flags": 0}],
    )
    got_idx = df.select(
        convert_raw(F.col("e"), schema_idx.columns[0].resolved).alias("e")
    ).collect()[0]
    assert got_idx.e == "1"  # '2' as 1-based index

    # malformed TIME -> NULL, not an ANSI crash
    bad = spark.createDataFrame([("garbage",), ("12:34:56",)], "t STRING")
    vals = [r.v for r in bad.select(time_to_micros(F.col("t")).alias("v")).collect()]
    assert vals[0] is None and vals[1] == (12 * 3600 + 34 * 60 + 56) * 1_000_000

    # zero-date is an INTENTIONAL null, not a decode error
    dschema = field_event_to_schema(
        "ks", "-", "t",
        [{"name": "d", "type": "DATE", "column_type": "date", "flags": 0}],
    )
    m = F.create_map(F.lit("d"), F.col("raw"))
    errs = spark.createDataFrame(
        [("0000-00-00",), ("not-a-date",), ("2024-01-01",)], "raw STRING"
    ).select(decode_errors_expr(m, dschema).alias("errs")).collect()
    assert [list(r.errs) for r in errs] == [[], ["d"], []]
