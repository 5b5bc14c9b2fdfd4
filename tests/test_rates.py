"""Windowed change-rate time series (metrics.change_rates / _stream).

The registry row ``change_rate_windows`` proves stream == batch == DuckDB on
the full events fixture; these tests pin the two behaviors the oracle can't
see: the late-data drop contract and the watermark pushdown barrier.
"""

import os
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from debezium_connector_vitess_spark.metrics import (
    _duration_seconds,
    change_rates,
    change_rates_stream,
)

HOUR_MS = 3600 * 1000
T0 = 1704067200000  # 2024-01-01T00:00:00Z


def _write_file(spark, path: str, rows, mtime: float) -> None:
    tmp = tempfile.mkdtemp(prefix="rates_part_")
    (
        spark.createDataFrame(rows, "ts_ms bigint, table_name string, shard string, op string")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.rename(os.path.join(tmp, part), path)
    os.utime(path, (mtime, mtime))


def _run_stream(spark, fixture_dir: str, **stream_kwargs):
    raw = (
        spark.readStream.schema("ts_ms bigint, table_name string, shard string, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(fixture_dir)
        .select(F.timestamp_millis("ts_ms").alias("ts"), "table_name", "shard", "op")
    )
    rates = change_rates_stream(raw, **stream_kwargs)
    collected: list = []

    def capture(df, _bid) -> None:
        collected.extend(df.collect())

    q = (
        rates.writeStream.foreachBatch(capture)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="rates_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return collected


def test_duration_seconds():
    assert _duration_seconds("1 hour") == 3600.0
    assert _duration_seconds("30 minutes") == 1800.0
    with pytest.raises(ValueError):
        _duration_seconds("1 fortnight")


def test_stream_drops_late_events_and_emits_each_window_once(spark):
    """The append-mode late-data contract: an event older than the watermark
    never reaches an already-emitted window, and every window row is emitted
    exactly once."""
    fixture = tempfile.mkdtemp(prefix="rates_late_")
    now = time.time()
    # File 0: three events in [T0, T0+1h) plus one at T0+6h. After this batch
    # the watermark becomes T0+6h - 2h = T0+4h, far past the first window.
    _write_file(
        spark,
        os.path.join(fixture, "batch_000.parquet"),
        [
            (T0 + 5 * 60000, "tbl0", "-40", "c"),
            (T0 + 10 * 60000, "tbl0", "-40", "u"),
            (T0 + 20 * 60000, "tbl0", "-40", "d"),
            (T0 + 6 * HOUR_MS, "tbl0", "-40", "u"),
        ],
        now - 50,
    )
    # File 1: clock advance. Its batch runs under watermark T0+4h, which
    # closes and EMITS the first window (state evicted).
    _write_file(
        spark,
        os.path.join(fixture, "batch_001.parquet"),
        [(T0 + 20 * HOUR_MS, "__advance__", "-", "u")],
        now - 40,
    )
    # File 2: a LATE event for the first window, arriving AFTER that window
    # was emitted and evicted (watermark now T0+18h) — must be dropped.
    # (An event up to `delay` late that arrives BEFORE its window closes is
    # absorbed — that is what the 2h tolerance means; the drop contract is
    # for rows arriving after eviction.)
    _write_file(
        spark,
        os.path.join(fixture, "batch_002.parquet"),
        [(T0 + 30 * 60000, "tbl0", "-40", "u")],
        now - 30,
    )
    # File 3: final clock advance so everything still open flushes.
    _write_file(
        spark,
        os.path.join(fixture, "batch_003.parquet"),
        [(T0 + 21 * HOUR_MS, "__advance__", "-", "u")],
        now - 20,
    )
    rows = _run_stream(
        spark,
        fixture,
        watermark_delay="2 hours",
        exclude=F.col("table_name") == "__advance__",
    )
    by_window = {r.window_start_ms: r for r in rows}
    # exactly-once: no duplicate window rows across micro-batches
    assert len(rows) == len(by_window) == 2
    first = by_window[T0]
    # 3 on-time events; the late 'u' at T0+30min was dropped by the watermark
    assert (first.n_events, first.n_creates, first.n_updates, first.n_deletes) == (3, 1, 1, 1)
    assert by_window[T0 + 6 * HOUR_MS].n_events == 1
    # no sentinel rows leaked into the output
    assert all(r.table_name == "tbl0" for r in rows)


def test_exclude_filter_is_not_pushed_below_watermark(spark):
    """The exclude predicate must stay ABOVE the aggregate: pushed into the
    scan it would drop clock-advancing rows before the EventTimeWatermark
    operator and the final windows would never flush (the n_events < 0
    disjunct in change_rates_stream is the barrier; isnull(count) folds away
    because count is non-nullable)."""
    fixture = tempfile.mkdtemp(prefix="rates_plan_")
    _write_file(
        spark,
        os.path.join(fixture, "batch_000.parquet"),
        [(T0, "tbl0", "-40", "c")],
        time.time() - 10,
    )
    raw = (
        spark.readStream.schema("ts_ms bigint, table_name string, shard string, op string")
        .parquet(fixture)
        .select(F.timestamp_millis("ts_ms").alias("ts"), "table_name", "shard", "op")
    )
    rates = change_rates_stream(
        raw, watermark_delay="2 hours", exclude=F.col("table_name") == "__advance__"
    )
    plan = rates._jdf.queryExecution().explainString(
        rates.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    for line in plan.splitlines():
        if "PushedFilters" in line:
            assert "__advance__" not in line, f"exclude pushed into scan: {line}"
    assert "__advance__" in plan  # the filter exists, above the aggregate


def test_profile_stream_exclude_not_pushed_below_watermark(spark):
    """corpus_profile_stream's exclude goes through the SAME post-agg
    barrier (count_col='n_docs'): the sentinel-domain predicate must not
    reach the scan's PushedFilters, or the clock-advancing rows die before
    the watermark operator."""
    from debezium_connector_vitess_spark.ops.text import corpus_profile_stream

    fixture = tempfile.mkdtemp(prefix="profile_plan_")
    spark.createDataFrame(
        [(1, "web", "hello world", T0)],
        "doc_id bigint, source string, text string, ts_ms bigint",
    ).write.parquet(os.path.join(fixture, "batch_000.parquet"))
    raw = (
        spark.readStream.schema(
            "doc_id bigint, source string, text string, ts_ms bigint"
        )
        .parquet(fixture)
        .select(F.timestamp_millis("ts_ms").alias("ts"), "source", "text")
    )
    prof = corpus_profile_stream(
        raw, "text", ts_col="ts", domain_col="source",
        exclude=F.col("domain") == "__advance__",
    )
    plan = prof._jdf.queryExecution().explainString(
        prof.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    for line in plan.splitlines():
        if "PushedFilters" in line:
            assert "__advance__" not in line, f"exclude pushed into scan: {line}"
    assert "__advance__" in plan  # the filter exists, above the aggregate


def test_batch_sliding_windows_cover_each_event_twice(spark):
    rows = [
        (T0 + 5 * 60000, "tbl0", "-40", "c"),
        (T0 + HOUR_MS + 5 * 60000, "tbl1", "40-80", "u"),
    ]
    df = spark.createDataFrame(
        rows, "ts_ms bigint, table_name string, shard string, op string"
    ).select(F.timestamp_millis("ts_ms").alias("ts"), "table_name", "shard", "op")
    out = change_rates(df, window_duration="2 hours", slide_duration="1 hour").collect()
    # each event lands in exactly two 2h windows => 4 rows, rate = n/2
    assert len(out) == 4
    assert all(r.window_end_ms - r.window_start_ms == 2 * HOUR_MS for r in out)
    assert all(r.events_per_hour == r.n_events / 2.0 for r in out)


def test_sessionize_matches_duckdb_gaps_and_islands(spark, sf_dir):
    """session_window == the classic lag/running-sum islands derivation.
    Boundary convention: Spark merges [ts, ts+gap) windows on OVERLAP, so an
    event exactly `gap` after its predecessor starts a NEW session — the
    oracle's new-session predicate is >= gap, not > gap."""
    import duckdb

    from debezium_connector_vitess_spark.changelog import load_events
    from debezium_connector_vitess_spark.metrics import sessionize

    evs = load_events(spark, sf_dir).select("user_id", "ts")
    got = (
        sessionize(evs, gap="30 minutes", keys=("user_id",))
        .toPandas()
        .sort_values(["user_id", "session_start_ms"])
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            f"""
            WITH ordered AS (
              SELECT user_id, ts,
                     CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
                          OVER (PARTITION BY user_id ORDER BY ts) >= 1800000
                          THEN 1 ELSE 0 END AS new_session
              FROM '{sf_dir}/events.parquet'),
            islands AS (
              SELECT user_id, ts,
                     sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                            ROWS UNBOUNDED PRECEDING) AS sid
              FROM ordered)
            SELECT user_id,
                   epoch_ms(min(ts)) AS session_start_ms,
                   epoch_ms(max(ts)) + 1800000 AS session_end_ms,
                   CAST(count(*) AS BIGINT) AS n_events,
                   epoch_ms(max(ts)) - epoch_ms(min(ts)) AS duration_ms
            FROM islands GROUP BY user_id, sid
            ORDER BY user_id, session_start_ms
            """
        )
        .df()
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"), check_dtype=False
    )


def test_sessionize_stream_extends_sessions_across_micro_batches(spark):
    """An event arriving in a LATER micro-batch, within gap of an open
    session, must extend it (session merge in the state store) — and the
    merged session is emitted exactly once, equal to the batch answer."""
    from debezium_connector_vitess_spark.metrics import sessionize, sessionize_stream

    fixture = tempfile.mkdtemp(prefix="sess_stream_")
    now = time.time()
    real = [
        (T0, 1, "u"),
        (T0 + 10 * 60000, 1, "u"),
        (T0 + 5 * 60000, 2, "c"),
    ]
    late_extension = [(T0 + 25 * 60000, 1, "u")]  # 15 min after user 1's last
    _write_file(
        spark,
        os.path.join(fixture, "batch_000.parquet"),
        [(ts, f"u{uid}", str(uid), op) for ts, uid, op in real],
        now - 50,
    )
    _write_file(
        spark,
        os.path.join(fixture, "batch_001.parquet"),
        [(ts, f"u{uid}", str(uid), op) for ts, uid, op in late_extension],
        now - 40,
    )
    _write_file(
        spark,
        os.path.join(fixture, "batch_002.parquet"),
        [(T0 + 20 * HOUR_MS, "__advance__", "-", "u")],
        now - 30,
    )
    _write_file(
        spark,
        os.path.join(fixture, "batch_003.parquet"),
        [(T0 + 21 * HOUR_MS, "__advance__", "-", "u")],
        now - 20,
    )
    raw = (
        spark.readStream.schema("ts_ms bigint, table_name string, shard string, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(fixture)
        .select(F.timestamp_millis("ts_ms").alias("ts"), "table_name", "shard", "op")
    )
    sessions = sessionize_stream(
        raw,
        gap="30 minutes",
        keys=("table_name",),
        watermark_delay="2 hours",
        exclude=F.col("table_name") == "__advance__",
    )
    collected: list = []

    def capture(df, _bid) -> None:
        collected.extend(df.collect())

    q = (
        sessions.writeStream.foreachBatch(capture)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="sess_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted((r.table_name, r.session_start_ms, r.n_events) for r in collected)
    batch_df = spark.createDataFrame(
        [(ts, f"u{uid}", str(uid), op) for ts, uid, op in real + late_extension],
        "ts_ms bigint, table_name string, shard string, op string",
    ).select(F.timestamp_millis("ts_ms").alias("ts"), "table_name", "shard", "op")
    want = sorted(
        (r.table_name, r.session_start_ms, r.n_events)
        for r in sessionize(batch_df, gap="30 minutes", keys=("table_name",)).collect()
    )
    assert got == want
    assert got == [("u1", T0, 3), ("u2", T0 + 5 * 60000, 1)]


def test_funnel_pairs_matches_duckdb_interval_join(spark, sf_dir):
    import duckdb
    import pandas as pd

    from debezium_connector_vitess_spark.changelog import load_events
    from debezium_connector_vitess_spark.metrics import funnel_pairs

    evs = load_events(spark, sf_dir)
    signups = evs.filter(F.col("event_type") == "signup").select("user_id", "ts")
    errors = evs.filter(F.col("event_type") == "error").select("user_id", "ts")
    got = (
        funnel_pairs(signups, errors, key="user_id", within="1 hour")
        .toPandas()
        .sort_values(["user_id", "left_ts_ms", "right_ts_ms"])
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            f"""
            SELECT s.user_id,
                   epoch_ms(s.ts) AS left_ts_ms,
                   epoch_ms(e.ts) AS right_ts_ms,
                   epoch_ms(e.ts) - epoch_ms(s.ts) AS lag_ms
            FROM (SELECT user_id, ts FROM '{sf_dir}/events.parquet'
                  WHERE event_type = 'signup') s
            JOIN (SELECT user_id, ts FROM '{sf_dir}/events.parquet'
                  WHERE event_type = 'error') e
              ON s.user_id = e.user_id
             AND epoch_ms(e.ts) > epoch_ms(s.ts)
             AND epoch_ms(e.ts) <= epoch_ms(s.ts) + 3600000
            ORDER BY 1, 2, 3
            """
        )
        .df()
        .reset_index(drop=True)
    )
    assert len(got) > 0  # the fixture actually exercises the join
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"), check_dtype=False
    )


def test_funnel_pairs_stream_joins_across_micro_batches(spark):
    """Stream-stream interval join: a right event arriving in a LATER
    micro-batch than its left partner must still match (buffered join
    state), and the bounded-replay result equals the batch join."""
    from debezium_connector_vitess_spark.metrics import funnel_pairs, funnel_pairs_stream

    now = time.time()
    ldir = tempfile.mkdtemp(prefix="funnel_l_")
    rdir = tempfile.mkdtemp(prefix="funnel_r_")
    lrows = [(T0, "s", "1", "c"), (T0 + 3 * HOUR_MS, "s", "2", "c")]
    rrows0 = [(T0 + 10 * 60000, "e", "1", "d")]  # same-batch match for user 1
    rrows1 = [
        (T0 + 30 * 60000, "e", "1", "d"),  # later-batch match for user 1
        (T0 + 2 * HOUR_MS, "e", "1", "d"),  # outside 1h window — no match
        (T0 + 3 * HOUR_MS + 5 * 60000, "e", "2", "d"),  # match for user 2
    ]
    _write_file(spark, os.path.join(ldir, "l0.parquet"), lrows, now - 40)
    _write_file(spark, os.path.join(rdir, "r0.parquet"), rrows0, now - 40)
    _write_file(spark, os.path.join(rdir, "r1.parquet"), rrows1, now - 30)

    schema = "ts_ms bigint, table_name string, shard string, op string"

    def stream(d):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
            .select(
                F.timestamp_millis("ts_ms").alias("ts"),
                F.col("shard").cast("long").alias("user_id"),
            )
        )

    pairs = funnel_pairs_stream(
        stream(ldir), stream(rdir), key="user_id", within="1 hour", watermark_delay="2 hours"
    )
    collected: list = []

    def capture(df, _bid) -> None:
        collected.extend(df.collect())

    q = (
        pairs.writeStream.foreachBatch(capture)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="funnel_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted((r.user_id, r.left_ts_ms, r.right_ts_ms, r.lag_ms) for r in collected)

    def batch_frame(rows):
        return spark.createDataFrame(rows, schema).select(
            F.timestamp_millis("ts_ms").alias("ts"),
            F.col("shard").cast("long").alias("user_id"),
        )

    want = sorted(
        (r.user_id, r.left_ts_ms, r.right_ts_ms, r.lag_ms)
        for r in funnel_pairs(
            batch_frame(lrows), batch_frame(rrows0 + rrows1), key="user_id", within="1 hour"
        ).collect()
    )
    assert got == want
    assert [g[3] for g in got] == [10 * 60000, 30 * 60000, 5 * 60000]


def test_change_rates_conservation_and_tumbling_identity(spark, sf_dir):
    """Invariants on the real corpus: (1) window counts conserve the event
    total (tumbling partitions the stream); (2) op counts sum to n_events;
    (3) a slide equal to the duration IS the tumbling window."""
    from debezium_connector_vitess_spark.changelog import load_events, op_col, shard_col
    from debezium_connector_vitess_spark.metrics import change_rates

    evs = load_events(spark, sf_dir).select(
        "ts",
        F.concat(F.lit("tbl"), (F.col("user_id") % 3).cast("string")).alias("table_name"),
        shard_col().alias("shard"),
        op_col().alias("op"),
    )
    total = evs.count()
    tumb = change_rates(evs).cache()
    agg = tumb.agg(
        F.sum("n_events").alias("n"),
        F.sum(F.col("n_creates") + F.col("n_updates") + F.col("n_deletes")).alias("ops"),
    ).first()
    assert agg.n == total and agg.ops == total
    ident = change_rates(evs, window_duration="1 hour", slide_duration="1 hour")
    assert sorted(map(tuple, tumb.collect())) == sorted(map(tuple, ident.collect()))
    tumb.unpersist()


def test_sessionize_sessions_are_disjoint_and_conserve_events(spark, sf_dir):
    """Per key: sessions cover every event exactly once, consecutive sessions
    are separated by at least `gap`, and duration_ms == (last - first)."""
    from debezium_connector_vitess_spark.changelog import load_events
    from debezium_connector_vitess_spark.metrics import sessionize

    evs = load_events(spark, sf_dir).select("user_id", "ts")
    total = evs.count()
    gap_ms = 1800000
    sess = sessionize(evs, gap="30 minutes", keys=("user_id",)).toPandas()
    assert int(sess.n_events.sum()) == total
    assert (sess.duration_ms == sess.session_end_ms - gap_ms - sess.session_start_ms).all()
    for _, g in sess.groupby("user_id"):
        g = g.sort_values("session_start_ms")
        starts = g.session_start_ms.to_numpy()
        last_events = (g.session_end_ms - gap_ms).to_numpy()
        # next session starts >= gap after the previous session's last event
        assert (starts[1:] - last_events[:-1] >= gap_ms).all()


def test_funnel_left_outer_emits_unmatched_after_watermark(spark):
    """left_outer stream-stream interval join: the unmatched left emits with
    null right columns only once the watermark passes left_ts + within (no
    match is then PROVABLE); matched lefts behave as inner. Result equals
    the batch left join."""
    from debezium_connector_vitess_spark.metrics import funnel_pairs, funnel_pairs_stream

    now = time.time()
    ldir = tempfile.mkdtemp(prefix="funnel_lo_l_")
    rdir = tempfile.mkdtemp(prefix="funnel_lo_r_")
    lrows = [(T0, "s", "1", "c"), (T0, "s", "2", "c")]  # user 2 never converts
    rrows = [(T0 + 10 * 60000, "e", "1", "d")]
    _write_file(spark, os.path.join(ldir, "l0.parquet"), lrows, now - 50)
    _write_file(spark, os.path.join(rdir, "r0.parquet"), rrows, now - 50)
    # clock advances on BOTH sides (join watermark = min over inputs), twice
    # so the bump from the first advance flushes in the second's batch
    for i, ts in enumerate((T0 + 20 * HOUR_MS, T0 + 21 * HOUR_MS)):
        _write_file(spark, os.path.join(ldir, f"l{i+1}.parquet"), [(ts, "s", "9", "c")], now - 40 + 10 * i)
        _write_file(spark, os.path.join(rdir, f"r{i+1}.parquet"), [(ts, "e", "9", "d")], now - 40 + 10 * i)

    schema = "ts_ms bigint, table_name string, shard string, op string"

    def stream(d):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
            .select(
                F.timestamp_millis("ts_ms").alias("ts"),
                F.col("shard").cast("long").alias("user_id"),
            )
        )

    pairs = funnel_pairs_stream(
        stream(ldir),
        stream(rdir),
        key="user_id",
        within="1 hour",
        watermark_delay="2 hours",
        how="left_outer",
    )
    collected: list = []

    def capture(df, _bid) -> None:
        collected.extend(df.collect())

    q = (
        pairs.writeStream.foreachBatch(capture)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="funnel_lo_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # user 9 is the clock driver: its own final left can never flush (no
    # later event advances the watermark past it) — compare the real users
    got = sorted(
        (r.user_id, r.left_ts_ms, r.right_ts_ms, r.lag_ms)
        for r in collected
        if r.user_id != 9
    )

    def batch_frame(rows):
        return spark.createDataFrame(rows, schema).select(
            F.timestamp_millis("ts_ms").alias("ts"),
            F.col("shard").cast("long").alias("user_id"),
        )

    want = sorted(
        (r.user_id, r.left_ts_ms, r.right_ts_ms, r.lag_ms)
        for r in funnel_pairs(
            batch_frame(lrows),
            batch_frame(rrows),
            key="user_id",
            within="1 hour",
            how="left_outer",
        ).collect()
    )
    assert got == want
    # the never-converting user 2 is present, with nulls
    unmatched = [g for g in got if g[0] == 2]
    assert unmatched == [(2, T0, None, None)]


def test_event_time_ops_accept_timestamp_ntz_input(spark, sf_dir):
    """Library-boundary robustness: a raw Spark 4 parquet read of the events
    table yields a TIMESTAMP_NTZ ts (no isAdjustedToUTC in the footer), and
    unix_millis/session_window/watermarks want LTZ. Every event-time operator
    normalizes via ensure_utc_event_time (NTZ wall clock pinned as UTC — the
    same convention changelog.load_events documents), so results on the raw
    NTZ frame must equal results on the load_events-normalized frame."""
    from debezium_connector_vitess_spark.metrics import funnel_pairs, sessionize

    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "user_id", "ts", "event_type"
    )
    assert dict(raw.dtypes)["ts"] == "timestamp_ntz"  # the hazard is live

    from debezium_connector_vitess_spark.changelog import load_events

    norm = load_events(spark, sf_dir).select("user_id", "ts", "event_type")
    assert dict(norm.dtypes)["ts"] == "timestamp"

    for frame in (raw, norm):
        assert dict(sessionize(frame).dtypes)["session_start_ms"] == "bigint"
    got = sorted(sessionize(raw).collect())
    want = sorted(sessionize(norm).collect())
    assert got == want

    def pairs(frame):
        return sorted(
            funnel_pairs(
                frame.filter("event_type='signup'").select("user_id", "ts"),
                frame.filter("event_type='error'").select("user_id", "ts"),
                key="user_id",
                within="1 hour",
                how="left_outer",
            ).collect()
        )

    assert pairs(raw) == pairs(norm)

    got_r = sorted(change_rates(raw.withColumn("table_name", F.lit("t"))
                                .withColumn("shard", F.lit("-"))
                                .withColumn("op", F.lit("c"))).collect())
    want_r = sorted(change_rates(norm.withColumn("table_name", F.lit("t"))
                                 .withColumn("shard", F.lit("-"))
                                 .withColumn("op", F.lit("c"))).collect())
    assert got_r == want_r


def test_change_rates_value_columns_match_duckdb(spark, sf_dir):
    """value_col adds per-window sum/avg/min/max magnitude columns (all
    map-side-combining — the exchange stays one reduced row per group);
    parity against DuckDB on the events value payload. Averages are rounded
    (cross-engine float sums); min/max/count are exact."""
    import os

    import duckdb

    from debezium_connector_vitess_spark.changelog import load_events
    from debezium_connector_vitess_spark.metrics import change_rates

    evs = (
        load_events(spark, sf_dir)
        .select(
            "ts",
            F.concat(F.lit("t"), (F.col("user_id") % 2).cast("string")).alias(
                "table_name"
            ),
            F.lit("-").alias("shard"),
            F.lit("c").alias("op"),
            "value",
        )
    )
    got = sorted(
        change_rates(evs, value_col="value")
        .select(
            "window_start_ms",
            "table_name",
            "n_events",
            F.round("value_sum", 4).alias("value_sum"),
            F.round("value_avg", 4).alias("value_avg"),
            "value_min",
            "value_max",
        )
        .collect()
    )
    src = os.path.join(sf_dir, "events.parquet")
    want = sorted(
        duckdb.sql(
            f"""
            SELECT (epoch_ms(ts) // 3600000) * 3600000 AS window_start_ms,
                   't' || CAST(user_id % 2 AS VARCHAR) AS table_name,
                   count(*) AS n_events,
                   round(sum(value), 4) AS value_sum,
                   round(avg(value), 4) AS value_avg,
                   min(value) AS value_min,
                   max(value) AS value_max
            FROM read_parquet('{src}')
            GROUP BY 1, 2
            """
        ).fetchall()
    )
    assert [tuple(r) for r in got] == want


def test_change_rates_stream_carries_value_columns(spark, tmp_path):
    """The streaming twin inherits value_col through kwargs: per-window
    magnitudes emitted exactly once, equal to the batch answer on the same
    (pre-sentinel) data."""
    import os
    import time as _time

    from debezium_connector_vitess_spark.metrics import change_rates, change_rates_stream

    fixture = str(tmp_path / "vfix")
    os.makedirs(fixture)
    rows1 = [(T0 + i * 60000, "t0", "-", "c", float(i)) for i in range(10)]
    # TWO sentinel files: the first advances the watermark, the batch
    # triggered by the second flushes the closed windows (a watermark update
    # only takes effect at the NEXT micro-batch)
    rows2 = [(T0 + 10 * HOUR_MS, "__advance__", "-", "c", 0.0)]
    rows3 = [(T0 + 11 * HOUR_MS, "__advance__", "-", "c", 0.0)]
    raw_schema = "ts_ms LONG, table_name STRING, shard STRING, op STRING, value DOUBLE"
    now = _time.time()
    for i, rows in enumerate((rows1, rows2, rows3)):
        # single .parquet FILE per logical batch (rename the part file out),
        # backdated mtime — the _write_file idiom: a directory write confuses
        # the file source's per-file ordering and availableNow snapshot
        tmp = str(tmp_path / f"stage{i}")
        spark.createDataFrame(rows, raw_schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        path = os.path.join(fixture, f"f{i}.parquet")
        os.rename(os.path.join(tmp, part), path)
        os.utime(path, (now - 100 + i, now - 100 + i))

    def to_events(df):
        return df.select(
            F.timestamp_millis("ts_ms").alias("ts"), "table_name", "shard", "op", "value"
        )

    stream = to_events(
        spark.readStream.schema(raw_schema).option("maxFilesPerTrigger", 1).parquet(fixture)
    )
    rates = change_rates_stream(
        stream,
        watermark_delay="1 hour",
        exclude=F.col("table_name") == "__advance__",
        value_col="value",
    )
    collected = []
    q = (
        rates.writeStream.foreachBatch(lambda df, _b: collected.extend(df.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    batch = to_events(
        spark.createDataFrame(rows1, raw_schema)
    )
    want = sorted(
        tuple(r) for r in change_rates(batch, value_col="value").collect()
    )
    assert sorted(tuple(r) for r in collected) == want


def test_json_extraction_composes_with_windowed_value_stats(spark, sf_dir):
    """End-to-end typed event analytics: parse the props JSON column, window
    the numeric payload by the EXTRACTED key — with_json_fields feeding
    change_rates(keys=extracted, value_col=...), all one Catalyst plan, one
    scan, one shuffle; parity against DuckDB doing both steps in SQL."""
    import os

    import duckdb

    from debezium_connector_vitess_spark.metrics import change_rates
    from debezium_connector_vitess_spark.ops.jsoncol import with_json_fields

    src = os.path.join(sf_dir, "events.parquet")
    evs = with_json_fields(
        spark.read.parquet(src), "props", "k BIGINT"
    ).select(
        "ts",
        (F.col("props_parsed.k") % 10).cast("string").alias("kbucket"),
        F.lit("c").alias("op"),
        "value",
    )
    got = sorted(
        change_rates(evs, keys=("kbucket",), value_col="value")
        .select(
            "window_start_ms",
            "kbucket",
            "n_events",
            F.round("value_sum", 4).alias("value_sum"),
        )
        .collect()
    )
    want = sorted(
        duckdb.sql(
            f"""
            SELECT (epoch_ms(ts) // 3600000) * 3600000 AS window_start_ms,
                   CAST(CAST(props->>'k' AS BIGINT) % 10 AS VARCHAR) AS kbucket,
                   count(*) AS n_events,
                   round(sum(value), 4) AS value_sum
            FROM read_parquet('{src}')
            GROUP BY 1, 2
            """
        ).fetchall()
    )
    assert [tuple(r) for r in got] == want


def test_exclude_barrier_keeps_null_key_groups(spark):
    """Three-valued logic hazard: with a NULL grouping key, (~NULL | false)
    is NULL and Filter would drop a legitimate group. The shared barrier
    coalesces the exclude predicate to false first, so NULL keys mean 'not
    excluded'."""
    from debezium_connector_vitess_spark.metrics import _apply_post_agg_exclude

    df = spark.createDataFrame(
        [("t0", 3), (None, 2), ("__advance__", 1)], "table_name STRING, n_events INT"
    )
    kept = sorted(
        (
            r.table_name
            for r in _apply_post_agg_exclude(
                df, F.col("table_name") == "__advance__"
            ).collect()
        ),
        key=str,
    )
    assert kept == [None, "t0"]


def test_funnel_pairs_fractional_within_and_how_validation(spark):
    """within='1.5 seconds' must honor the half second (int truncation would
    silently narrow the bound); right/full outer joins are rejected loudly
    (the output key comes from the left side)."""
    from debezium_connector_vitess_spark.metrics import funnel_pairs

    left = spark.createDataFrame([(1, T0)], "user_id INT, ts_ms LONG").select(
        "user_id", F.timestamp_millis("ts_ms").alias("ts")
    )
    right = spark.createDataFrame(
        [(1, T0 + 1400), (1, T0 + 1600)], "user_id INT, ts_ms LONG"
    ).select("user_id", F.timestamp_millis("ts_ms").alias("ts"))
    got = sorted(
        r.lag_ms
        for r in funnel_pairs(left, right, key="user_id", within="1.5 seconds").collect()
    )
    assert got == [1400]  # 1600 > 1500ms excluded; 1400 kept (int() would drop it)
    with pytest.raises(ValueError, match="left_outer"):
        funnel_pairs(left, right, key="user_id", how="full_outer")


class _FakeProgress:
    def __init__(self, qid, name, rows, rate, sources):
        self.id, self.name, self.numInputRows = qid, name, rows
        self.processedRowsPerSecond = rate
        self.sources = sources


class _Obj:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def test_metrics_listener_scoping_and_guards():
    """Listener unit contract: termination disconnects ONLY the terminated
    query; unnamed queries do not merge; zero-row batches are not commits;
    NaN/Infinity rates are zeroed; multi-source offsets are all recorded."""
    from debezium_connector_vitess_spark.metrics import CdcMetricsListener

    lis = CdcMetricsListener()
    lis.onQueryStarted(_Obj(id="q1", name="a"))
    lis.onQueryStarted(_Obj(id="q2", name=None))
    lis.onQueryStarted(_Obj(id="q3", name=None))
    assert len(lis.metrics) == 3  # unnamed queries kept distinct

    src1, src2 = _Obj(endOffset='{"p": 1}'), _Obj(endOffset='{"p": 2}')
    lis.onQueryProgress(_Obj(progress=_FakeProgress("q1", "a", 5, float("nan"), [src1, src2])))
    lis.onQueryProgress(_Obj(progress=_FakeProgress("q1", "a", 0, 100.0, [src1])))
    m = lis.metrics["a"]
    assert m.total_number_of_events_seen == 5
    assert m.number_of_committed_transactions == 1  # zero-row batch not counted
    assert m.last_event_rate == 100.0  # NaN was zeroed, then replaced
    import json as _json

    assert "NaN" not in _json.dumps(m.snapshot())
    # the multi-source batch recorded BOTH offsets; the later single-source
    # batch collapsed back to the plain dict shape
    lis.onQueryProgress(_Obj(progress=_FakeProgress("q1", "a", 1, float("inf"), [src1, src2])))
    assert lis.metrics["a"].last_offset == [{"p": 1}, {"p": 2}]
    assert lis.metrics["a"].last_event_rate == 0.0  # Infinity guarded

    lis.onQueryTerminated(_Obj(id="q2", runId="r2"))
    names = {k: v.connected for k, v in lis.metrics.items()}
    assert names["a"] is True  # untouched
    assert sum(1 for v in names.values() if not v) == 1  # only q2 disconnected


def test_asof_join_matches_duckdb_asof(spark, sf_dir):
    """As-of join: exact parity with DuckDB's native ASOF LEFT JOIN on a
    real events split (orders enriched with the latest same-key event at or
    before their time), ties match, tolerance voids stale matches, and the
    plan is one key shuffle + one window — no join operator at all."""
    import duckdb
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.metrics import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # split one frame into "quotes" (even ids) and "trades" (odd ids) on a
    # shared low-cardinality key so as-of matches are plentiful
    right = ev.filter("event_id % 2 = 0").select(
        F.col("user_id").alias("k"), "ts", F.col("event_id").alias("rid")
    )
    left = ev.filter("event_id % 2 = 1").select(
        F.col("user_id").alias("k"), "ts", F.col("event_id").alias("lid")
    )
    out = asof_join(left, right, on="k", value_cols=["rid"])
    got = {
        (r["lid"]): (r["rid_r"],)
        for r in out.collect()
    }

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    want = {
        r[0]: (r[1],)
        for r in con.execute("""
            SELECT l.event_id, r.event_id
            FROM (SELECT user_id k, ts, event_id FROM events WHERE event_id % 2 = 1) l
            ASOF LEFT JOIN
                 (SELECT user_id k, ts, event_id FROM events WHERE event_id % 2 = 0) r
            ON l.k = r.k AND l.ts >= r.ts
        """).fetchall()
    }
    assert got == want and any(v[0] is not None for v in got.values())

    # tolerance: a zero-window tolerance keeps only exact-tie matches
    tol = asof_join(left, right, on="k", value_cols=["rid"], tolerance="0 seconds")
    tied = {r["lid"]: r["rid_r"] for r in tol.collect()}
    lt = {r["lid"]: r["ts"] for r in left.collect()}
    rts = {r["rid"]: r["ts"] for r in right.collect()}
    for lid, rid in tied.items():
        if rid is not None:
            assert rts[rid] == lt[lid]

    # plan shape: NO join operator anywhere (the whole point — no pair
    # fan-out at any skew); every row shuffles exactly once on the key
    # (Spark pushes the window's single logical exchange below the union,
    # one per branch, both keyed on __k — no secondary reshuffle)
    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    exchanges = re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    assert 1 <= len(exchanges) <= 2
    assert all(k.startswith("__k") for k in exchanges), exchanges


def test_asof_join_forward_direction(spark, sf_dir):
    """direction='forward': each left row takes the EARLIEST same-key right
    row at-or-after its time — parity with DuckDB ASOF (l.ts <= r.ts), and
    the backward/forward pair brackets every left event correctly
    (matched_backward.ts <= l.ts <= matched_forward.ts whenever both
    exist)."""
    import duckdb
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.metrics import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    right = ev.filter("event_id % 2 = 0").select(
        F.col("user_id").alias("k"), "ts", F.col("event_id").alias("rid")
    )
    left = ev.filter("event_id % 2 = 1").select(
        F.col("user_id").alias("k"), "ts", F.col("event_id").alias("lid")
    )
    fwd = asof_join(left, right, on="k", value_cols=["rid"], direction="forward")
    got = {r["lid"]: r["rid_r"] for r in fwd.collect()}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    want = dict(
        con.execute("""
            SELECT l.event_id, r.event_id
            FROM (SELECT user_id k, ts, event_id FROM events WHERE event_id % 2 = 1) l
            ASOF LEFT JOIN
                 (SELECT user_id k, ts, event_id FROM events WHERE event_id % 2 = 0) r
            ON l.k = r.k AND l.ts <= r.ts
        """).fetchall()
    )
    assert got == want and any(v is not None for v in got.values())

    # bracket property vs the backward direction
    back = {
        r["lid"]: r["ts_r"]
        for r in asof_join(left, right, on="k", value_cols=["rid"]).collect()
    }
    fts = {r["lid"]: r["ts_r"] for r in fwd.collect()}
    lts = {r["lid"]: r["ts"] for r in left.collect()}
    both = [l for l in lts if back.get(l) is not None and fts.get(l) is not None]
    assert both
    for l in both:
        assert back[l] <= lts[l] <= fts[l]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        asof_join(left, right, on="k", direction="nearest")


def test_asof_join_duplicate_right_times_deterministic(spark):
    """Two right rows sharing (key, time): the match is a pure function of
    the data (payload-hash tiebreak), identical across runs and input
    partitionings — never partition scan order."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.metrics import asof_join

    left = spark.createDataFrame(
        [(1, 1_000_000, 10)], "k bigint, ts_ms bigint, lid bigint"
    ).select("k", F.timestamp_millis("ts_ms").alias("ts"), "lid")
    right_rows = [(1, 500_000, rid) for rid in (101, 102, 103)]
    right = spark.createDataFrame(
        right_rows, "k bigint, ts_ms bigint, rid bigint"
    ).select("k", F.timestamp_millis("ts_ms").alias("ts"), "rid")

    picks = set()
    for parts in (1, 3, 7):
        out = asof_join(left, right.repartition(parts), on="k", value_cols=["rid"])
        picks.add(out.collect()[0]["rid_r"])
    assert len(picks) == 1 and picks.pop() in (101, 102, 103)


def test_asof_join_null_times_and_collisions(spark):
    """NULL times never participate: a NULL-time right row is no phantom
    match (backward), a NULL-time left row comes back unmatched (forward —
    where desc ordering would otherwise hand it the earliest right row);
    map-typed value columns work (tie-break skips unhashable types); an
    output-name collision raises up front."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.metrics import asof_join

    left = spark.createDataFrame(
        [(1, 1_000_000, 10), (1, None, 11)], "k bigint, ts_ms bigint, lid bigint"
    ).select("k", F.timestamp_millis("ts_ms").alias("ts"), "lid")
    right = spark.createDataFrame(
        [(1, None, 101)], "k bigint, ts_ms bigint, rid bigint"
    ).select("k", F.timestamp_millis("ts_ms").alias("ts"), "rid")

    for direction in ("backward", "forward"):
        got = {
            r["lid"]: r["rid_r"]
            for r in asof_join(
                left, right, on="k", value_cols=["rid"], direction=direction
            ).collect()
        }
        assert got == {10: None, 11: None}, (direction, got)

    # map-typed value column: plan must build (xxhash64 rejects MapType)
    right_map = spark.createDataFrame(
        [(1, 500_000)], "k bigint, ts_ms bigint"
    ).select(
        "k",
        F.timestamp_millis("ts_ms").alias("ts"),
        F.create_map(F.lit("a"), F.lit("b")).alias("attrs"),
    )
    out = asof_join(left, right_map, on="k", value_cols=["attrs"]).collect()
    got_m = {r["lid"]: r["attrs_r"] for r in out}
    assert got_m[10] == {"a": "b"} and got_m[11] is None

    with _pytest.raises(ValueError):
        asof_join(
            left.withColumn("rid_r", F.lit(1)), right, on="k", value_cols=["rid"]
        )


def test_asof_join_property_vs_brute_force(spark):
    """Property: for arbitrary small event sets (duplicate keys and times,
    NULL-free), the union+window as-of equals a literal per-row brute
    force in BOTH directions — each left row's match is the max (backward)
    / min (forward) right time satisfying the inequality, with the matched
    payload drawn from that timestamp's rows."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.metrics import asof_join

    side_st = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),      # key
            st.integers(min_value=0, max_value=20),     # time (seconds)
        ),
        min_size=1, max_size=12,
    )

    @given(side_st, side_st)
    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def check(lrows, rrows):
        left = spark.createDataFrame(
            [(k, t * 1000, i) for i, (k, t) in enumerate(lrows)],
            "k bigint, ts_ms bigint, lid bigint",
        ).select("k", F.timestamp_millis("ts_ms").alias("ts"), "lid")
        right = spark.createDataFrame(
            [(k, t * 1000, 100 + i) for i, (k, t) in enumerate(rrows)],
            "k bigint, ts_ms bigint, rid bigint",
        ).select("k", F.timestamp_millis("ts_ms").alias("ts"), "rid")
        for direction in ("backward", "forward"):
            got = {
                r["lid"]: (r["ts_r"], r["rid_r"])
                for r in asof_join(
                    left, right, on="k", value_cols=["rid"], direction=direction
                ).collect()
            }
            assert set(got) == set(range(len(lrows)))
            for i, (k, t) in enumerate(lrows):
                cands = [
                    (rt, 100 + j)
                    for j, (rk, rt) in enumerate(rrows)
                    if rk == k and (rt <= t if direction == "backward" else rt >= t)
                ]
                mt, mrid = got[i]
                if not cands:
                    assert (mt, mrid) == (None, None), (direction, i)
                    continue
                best_t = (max if direction == "backward" else min)(
                    rt for rt, _ in cands
                )
                assert mt is not None and mt.second + mt.minute * 60 == best_t
                # the matched payload is one of that timestamp's rows
                assert mrid in {rid for rt, rid in cands if rt == best_t}

    check()


def test_corpus_profile_stream_matches_batch(spark, tmp_path):
    """Streaming corpus health: each closed (window, domain) row emits
    exactly once in APPEND mode and equals the same aggregation run in
    batch over the pre-sentinel documents (shared plan — the function works
    on both input kinds; watermark is a no-op in batch)."""
    from debezium_connector_vitess_spark.ops.text import corpus_profile_stream

    fixture = str(tmp_path / "docsfix")
    os.makedirs(fixture)
    schema = "ts_ms bigint, source string, text string"
    # two content batches inside hours 0-1, then two clock-advancing
    # sentinel files (first moves the watermark, second's batch flushes)
    rows1 = [
        (T0 + i * 60000, "srcA",
         f"document number {i} with some plainly varied prose content here")
        for i in range(6)
    ] + [(T0 + 10 * 60000, "srcB", "")]
    rows2 = [
        (T0 + (30 + i) * 60000, "srcA",
         f"later cohort {i} carrying contact me at bob{i}@example.com please")
        for i in range(4)
    ]
    rows3 = [(T0 + 9 * HOUR_MS, "__advance__", "x")]
    rows4 = [(T0 + 10 * HOUR_MS, "__advance__", "x")]
    now = time.time()
    for i, rows in enumerate((rows1, rows2, rows3, rows4)):
        tmp = str(tmp_path / f"stage{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(fixture, f"f{i}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (now - 100 + i, now - 100 + i))

    def to_docs(df):
        return df.select(F.timestamp_millis("ts_ms").alias("ts"), "source", "text")

    stream = to_docs(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(fixture)
    )
    prof = corpus_profile_stream(
        stream, "text", ts_col="ts", window="1 hour", watermark_delay="30 minutes"
    )
    collected = []
    q = (
        prof.writeStream.foreachBatch(lambda df, _b: collected.extend(df.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start_ms"], r["domain"]): (
            r["n_docs"], r["n_empty"], r["n_tokens"], r["n_chars"],
            r["quality_points"], r["n_docs_with_pii"],
        )
        for r in collected
        if r["domain"] != "__advance__"
    }
    assert got, "no closed windows flushed — watermark never advanced"
    batch = to_docs(spark.createDataFrame(rows1 + rows2, schema))
    expected = {
        (r["window_start_ms"], r["domain"]): (
            r["n_docs"], r["n_empty"], r["n_tokens"], r["n_chars"],
            r["quality_points"], r["n_docs_with_pii"],
        )
        for r in corpus_profile_stream(
            batch, "text", ts_col="ts", window="1 hour",
            watermark_delay="30 minutes",
        ).collect()
    }
    assert got == expected
    # the PII cohort landed: srcA's window counts 4 email-bearing docs
    key = (T0, "srcA")
    assert key in got and got[key][5] == 4
    # exactly-once: no (window, domain) appeared twice across micro-batches
    seen = [
        (r["window_start_ms"], r["domain"])
        for r in collected if r["domain"] != "__advance__"
    ]
    assert len(seen) == len(set(seen))
