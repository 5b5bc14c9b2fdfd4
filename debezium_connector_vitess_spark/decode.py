"""Stateless event decode: raw VEvent rows → typed CDC envelope.

This is the Spark-native re-expression of the reference's decode path
(connection/VStreamOutputMessageDecoder.java:56-377 +
connection/ReplicationMessageColumnValueResolver.java:24-73 +
VitessValueConverter.java:81-544): every conversion is a Catalyst column
expression (whole-stage codegen; no Python UDFs in the hot path). VStream
delivers all values as UTF-8 bytes; here the transport representation is a
``map<string,string>`` of raw column values per row image, with binary columns
base64-encoded by the source.

Raw VEvent frame schema (what the streaming source / replay adapter emits):

    event_kind   string   -- BEGIN|ROW|COMMIT|FIELD|DDL|HEARTBEAT|OTHER (D1)
    keyspace     string
    shard        string
    table_name   string   -- null for BEGIN/COMMIT
    gtid         string   -- shard-local GTID after this event
    vgtid        string   -- full VGTID JSON at this point
    tx_id        string   -- transaction id (the VGTID string in the reference)
    ts           timestamp
    row_changes  array<struct<before map<string,string>, after map<string,string>>>
    statement    string   -- DDL text, else null
    fields       array<struct<name,type,column_type,flags>> -- FIELD events only
"""

from __future__ import annotations

import decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .envelope import OP_CREATE, OP_DELETE, OP_UPDATE, source_struct
from .types import (
    BigIntUnsignedHandlingMode,
    BinaryHandlingMode,
    ResolvedType,
    TableSchema,
)

RAW_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_kind", T.StringType(), False),
        T.StructField("keyspace", T.StringType(), True),
        T.StructField("shard", T.StringType(), True),
        T.StructField("table_name", T.StringType(), True),
        T.StructField("gtid", T.StringType(), True),
        T.StructField("vgtid", T.StringType(), True),
        T.StructField("tx_id", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField(
            "row_changes",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("before", T.MapType(T.StringType(), T.StringType()), True),
                        T.StructField("after", T.MapType(T.StringType(), T.StringType()), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField("statement", T.StringType(), True),
        T.StructField(
            "fields",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType(), False),
                        T.StructField("type", T.StringType(), True),
                        T.StructField("column_type", T.StringType(), True),
                        T.StructField("flags", T.IntegerType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

FIELDS_TYPE = RAW_EVENT_SCHEMA["fields"].dataType

ZERO_DATE = "0000-00-00"


def _zero_date_guard(raw: Column, pattern: str, nullable_mode: bool, epoch_expr: Column) -> Column:
    """MySQL zero-dates are unrepresentable: map to null (nullable mode /
    override.datetime.to.nullable) or epoch (reference
    VitessValueConverter.java:410-443,486-511)."""
    is_zero = raw.startswith(pattern)
    if nullable_mode:
        return F.when(is_zero, F.lit(None)).otherwise(raw)
    return F.when(is_zero, epoch_expr).otherwise(raw)


def time_to_micros(raw: Column) -> Column:
    """MySQL TIME ('[-]HHH:MM:SS[.ffffff]', range ±838:59:59) → micros
    (io.debezium.time.MicroTime analog; VitessValueConverter.java:365-399).
    Pure expression: sign split + regexp field extraction."""
    sign = F.when(raw.startswith("-"), F.lit(-1)).otherwise(F.lit(1))
    body = F.regexp_replace(raw, "^-", "")

    def _digits(pat: str) -> Column:
        # '' on a regexp miss: the ''-guard yields NULL instead of an ANSI
        # CAST_INVALID_INPUT that would kill the task for one malformed TIME
        # even in the warn/skip failure modes (same guard as gtid_seq_expr)
        e = F.regexp_extract(body, pat, 1)
        return F.when(e != F.lit(""), e).cast("long")

    h = _digits(r"^(\d+):")
    m = _digits(r"^\d+:(\d+)")
    s = _digits(r"^\d+:\d+:(\d+)")
    frac = F.regexp_extract(body, r"\.(\d+)$", 1)
    micros = F.coalesce(
        (F.rpad(frac, 6, "0").cast("long")), F.lit(0)
    )
    return (sign * ((h * 3600 + m * 60 + s) * F.lit(1000000) + micros)).cast("long")


def set_bitmask_to_csv(raw: Column, values: tuple[str, ...]) -> Column:
    """SET 64-bit bitmask → comma-joined member list
    (VitessValueConverter.java:325-363). ``concat_ws`` skips the null slots.

    A non-numeric raw value passes through unchanged: VStream Copy sends
    ENUM/SET as literal strings ('a,b'), which the reference delivers as-is
    (VitessValueConverter.java:325-338).

    MySQL SET allows 64 members; the bitmask is an unsigned 64-bit value, so
    it is parsed as decimal(20,0) and wrapped to the signed-64 bit pattern
    (values ≥ 2^63 map to negative longs), then each member bit is tested
    with an arithmetic shift + AND — valid for all 64 bit positions.
    """
    if not values:
        return raw
    dec = raw.try_cast(T.DecimalType(20, 0))
    signed = (
        F.when(dec >= F.lit(decimal.Decimal(2**63)), dec - F.lit(decimal.Decimal(2**64)))
        .otherwise(dec)
        .cast("long")
    )
    members = [
        F.when(F.shiftright(signed, i).bitwiseAND(F.lit(1)) == 1, F.lit(v))
        for i, v in enumerate(values)
    ]
    csv = F.when(signed.isNotNull(), F.concat_ws(",", *members))
    return F.when(raw.rlike("^[0-9]+$"), csv).otherwise(raw)


def enum_index_to_literal(raw: Column, values: tuple[str, ...]) -> Column:
    """ENUM 1-based index → literal; a non-numeric raw value (copy phase sends
    literals) passes through (VitessValueConverter.java:288-313). Index 0 is
    MySQL's invalid-value sentinel → empty string."""
    if not values:
        # reference delivers '' when the enum options are missing
        # (VitessValueConverter.java convertEnumToString null-options branch);
        # literals (copy phase) still pass through
        return F.when(raw.rlike("^[0-9]+$"), F.lit("")).otherwise(raw)
    arr = F.array(*[F.lit(v) for v in values])
    idx = raw.try_cast("int")  # literals (copy phase) must not trip ANSI cast
    return (
        F.when(raw.rlike("^[0-9]+$") & (idx > 0) & (idx <= len(values)), F.element_at(arr, idx))
        .when(raw.rlike("^[0-9]+$"), F.lit(""))
        .otherwise(raw)
    )


def convert_raw(
    raw: Column,
    resolved: ResolvedType,
    *,
    bigint_unsigned_mode: BigIntUnsignedHandlingMode = BigIntUnsignedHandlingMode.STRING,
    binary_mode: BinaryHandlingMode = BinaryHandlingMode.BYTES,
    nullable_zero_dates: bool = True,
    permissive: bool = False,
) -> Column:
    """Raw UTF-8 value → typed Spark value for one column (D8/D9).

    Catalyst-native equivalent of ReplicationMessageColumnValueResolver.java:24-73
    + the converter closures in VitessValueConverter.java:81-544.

    ``permissive=True`` nulls malformed values (try_cast) instead of failing
    the task under ANSI mode — the warn/skip failure-handling path (E4).
    """

    def _cast(col: Column, t: T.DataType) -> Column:
        return col.try_cast(t) if permissive else col.cast(t)

    fam = resolved.family
    if fam == "SMALLINT":
        return _cast(raw, T.ShortType())
    if fam == "INTEGER":
        return _cast(raw, T.IntegerType())
    if fam == "BIGINT":
        return _cast(raw, T.LongType())
    if fam == "UINT64":
        if bigint_unsigned_mode is BigIntUnsignedHandlingMode.PRECISE:
            return _cast(raw, T.DecimalType(20, 0))
        if bigint_unsigned_mode is BigIntUnsignedHandlingMode.LONG:
            return _cast(raw, T.LongType())
        return raw  # lossless string (default)
    if fam in ("FLOAT", "DOUBLE"):
        return _cast(raw, T.DoubleType())
    if fam in ("VARCHAR", "JSON"):
        return raw  # DECIMAL also lands here (scale-preserving string)
    if fam == "ENUM":
        if resolved.enum_string_literals:
            return raw  # FieldEvent.enum_set_string_values: already a literal
        return enum_index_to_literal(raw, resolved.enum_values)
    if fam == "SET":
        if resolved.enum_string_literals:
            return raw
        return set_bitmask_to_csv(raw, resolved.enum_values)
    if fam == "YEAR":
        return _cast(raw, T.IntegerType())
    # isostring temporal mode: raw VStream string passes through untouched
    # (ReplicationMessageColumnValueResolver.java:63-73)
    if fam in ("DATE", "TIME", "DATETIME", "TIMESTAMP") and isinstance(
        resolved.spark_type, T.StringType
    ) and resolved.logical_name is None:
        return raw
    if fam == "DATE":
        guarded = _zero_date_guard(raw, ZERO_DATE, nullable_zero_dates, F.lit("1970-01-01"))
        return _cast(guarded, T.DateType())
    if fam == "TIME":
        micros = time_to_micros(raw)
        if resolved.logical_name == "org.apache.kafka.connect.data.Time":
            # connect mode: millis-since-midnight, fraction truncated toward
            # zero (Duration.toMillis semantics; negative TIME keeps sign)
            return ((micros - micros % 1000) / F.lit(1000)).cast("long")
        return micros
    if fam == "DATETIME":
        guarded = _zero_date_guard(
            raw, ZERO_DATE, nullable_zero_dates, F.lit("1970-01-01 00:00:00")
        )
        if resolved.logical_name == "org.apache.kafka.connect.data.Timestamp":
            # connect mode: millisecond precision — drop fraction digits > 3
            guarded = F.regexp_replace(guarded, r"(\.\d{1,3})\d*$", r"$1")
        return _cast(guarded, T.TimestampNTZType())
    if fam == "TIMESTAMP":
        # VStream sends UTC 'yyyy-MM-dd HH:mm:ss[.f]'; emit ISO-8601 Z string
        # (io.debezium.time.ZonedTimestamp; VitessValueConverter.java:446-511)
        guarded = _zero_date_guard(raw, ZERO_DATE, nullable_zero_dates, F.lit("1970-01-01 00:00:00"))
        iso = F.concat(F.regexp_replace(guarded, " ", "T"), F.lit("Z"))
        if resolved.logical_name == "org.apache.kafka.connect.data.Timestamp":
            # connect mode: Spark TimestampType at millisecond precision; the
            # explicit Z keeps the parse session-timezone-independent
            iso = F.concat(
                F.regexp_replace(
                    F.regexp_replace(guarded, r"(\.\d{1,3})\d*$", r"$1"), " ", "T"
                ),
                F.lit("Z"),
            )
            return _cast(iso, T.TimestampType())
        return F.when(guarded.isNotNull(), iso)
    if fam in ("BLOB", "BINARY"):
        # transport is base64 for binary columns
        if binary_mode is BinaryHandlingMode.BASE64:
            return raw
        if binary_mode is BinaryHandlingMode.HEX:
            return F.lower(F.hex(F.unbase64(raw)))
        return F.unbase64(raw)
    if fam == "BIT":
        if isinstance(resolved.spark_type, T.BooleanType):
            # Two transports: the copy phase / replay fixtures send '0'/'1'
            # literals; the binlog wire format sends base64 bytes — reference
            # derives boolean from bytes[0] != 0
            # (VitessValueConverter.java:154-167). Accept both.
            from_bytes = F.conv(F.hex(F.unbase64(raw)), 16, 10).try_cast("long") != 0
            return F.when(
                raw.rlike("^(0|1|true|false)$"), _cast(raw, T.BooleanType())
            ).otherwise(from_bytes)
        return F.unbase64(raw)
    # unknown (OTHER): include as raw bytes if configured, else the caller drops it
    return F.encode(raw, "utf-8")


class EventProcessingFailureHandlingMode:
    """``event.processing.failure.handling.mode`` analog (SURVEY §2.8 E4;
    reference: inherited Debezium config, exercised TestHelper.java:209-211).

    fail: ANSI cast — a malformed value fails the job (Spark task retry →
    stream restart from checkpoint, the reference's Connect-restart analog).
    warn: PERMISSIVE decode — malformed values null out, the row carries the
    failed column names in ``decode_errors``.
    skip: PERMISSIVE decode, rows with any failed column are dropped.
    """

    FAIL = "fail"
    WARN = "warn"
    SKIP = "skip"


# families whose conversion can reject a malformed raw string (UINT64 /
# TIME / TIMESTAMP included: whether they CAN fail depends on the configured
# mode, and the check below converts with the ACTUAL modes, so a mode whose
# conversion is pure passthrough can never false-flag)
_CASTABLE_FAMILIES = {
    "SMALLINT", "INTEGER", "BIGINT", "FLOAT", "DOUBLE", "YEAR", "DATE",
    "DATETIME", "BIT", "UINT64", "TIME", "TIMESTAMP",
}

_ZERO_DATE_FAMILIES = {"DATE", "DATETIME", "TIMESTAMP"}


def decode_errors_expr(
    map_col: Column,
    schema: TableSchema,
    *,
    nullable_zero_dates: bool = True,
    **modes,
) -> Column:
    """Array of column names whose raw value is present but fails conversion
    (try_cast ⇒ null). Drives the warn/skip failure-handling modes.

    Must receive the SAME mode kwargs as the decode it polices — checking
    with defaults while decoding with overrides diverges the two (a value
    the real decode handled fine gets its row dropped in skip mode).
    Legitimate MySQL zero-dates are exempt: under ``nullable_zero_dates``
    their null is INTENTIONAL, indistinguishable from a try_cast failure
    without this guard."""
    checks = []
    for c in schema.columns:
        if c.resolved.family not in _CASTABLE_FAMILIES:
            continue
        raw = map_col.getItem(c.name)
        converted = convert_raw(
            raw, c.resolved, nullable_zero_dates=nullable_zero_dates,
            permissive=True, **modes,
        )
        failed = raw.isNotNull() & converted.isNull()
        if nullable_zero_dates and c.resolved.family in _ZERO_DATE_FAMILIES:
            failed = failed & ~raw.startswith(ZERO_DATE)
        checks.append(F.when(failed, F.lit(c.name)))
    if not checks:
        return F.array().cast(T.ArrayType(T.StringType()))
    return F.array_compact(F.array(*checks))


def typed_row_struct(map_col: Column, schema: TableSchema, **modes) -> Column:
    """map<string,string> raw image → typed struct in schema column order.
    Null map ⇒ null struct (missing before/after image)."""
    fields = [
        convert_raw(map_col.getItem(c.name), c.resolved, **modes).alias(c.name)
        for c in schema.columns
    ]
    return F.when(map_col.isNotNull(), F.struct(*fields))


def dispatch_row_events(raw_df: DataFrame) -> DataFrame:
    """D1: keep ROW events (BEGIN/COMMIT/FIELD/DDL/HEARTBEAT handled by their
    own side-channels; see txmeta/, sinks.py heartbeats, transforms DDL)."""
    return raw_df.filter(F.col("event_kind") == "ROW")


def explode_row_changes(raw_df: DataFrame) -> DataFrame:
    """D2: one output row per row-change; operation derived from image
    presence: after-only=c, both=u, before-only=d
    (VStreamOutputMessageDecoder.java:152-290)."""
    df = dispatch_row_events(raw_df).select(
        "keyspace",
        "shard",
        "table_name",
        "gtid",
        "vgtid",
        "tx_id",
        "ts",
        F.posexplode("row_changes").alias("change_idx", "change"),
    )
    return df.select(
        "*",
        F.when(F.col("change.before").isNull(), F.lit(OP_CREATE))
        .when(F.col("change.after").isNull(), F.lit(OP_DELETE))
        .otherwise(F.lit(OP_UPDATE))
        .alias("op"),
    )


def gtid_seq_expr(col: Column = None) -> Column:
    """Per-shard sequence after an event = trailing integer of the local GTID.
    Handles both the range form 'MySQL56/host0:1-<seq>' and the
    single-transaction form 'uuid:<seq>' a fresh shard emits first. Orders
    FIELD events against ROW events within a shard.

    A GTID with no trailing digits yields NULL, never an error: Spark 4 runs
    ANSI mode by default, where regexp_extract's empty-string miss would
    throw CAST_INVALID_INPUT from the long cast and kill the whole job for
    one malformed position string."""
    ex = F.regexp_extract(col if col is not None else F.col("gtid"), r"(\d+)$", 1)
    return F.when(ex != F.lit(""), ex).cast("long")


def collect_field_schemas(
    raw_df: DataFrame,
    keyspace: str,
    table: str,
    **resolve_modes,
) -> dict[str, list]:
    """D4: collect this table's FIELD events and build per-shard schema
    generations: ``{shard: [(seq, gen, TableSchema), ...]}`` sorted by seq.

    Driver-side ``collect()`` by design: FIELD events are schema changes —
    O(#DDLs), thousands at most on any real stream — exactly the state the
    reference keeps in memory in VitessDatabaseSchema (:86-117). The row
    data never leaves the cluster.
    """
    from .types import field_event_to_schema

    rows = (
        raw_df.filter(
            (F.col("event_kind") == "FIELD")
            & (F.col("keyspace") == keyspace)
            & (F.col("table_name") == table)
        )
        .select("shard", gtid_seq_expr().alias("seq"), "fields")
        .collect()
    )
    per_shard: dict[str, list] = {}
    # a FIELD event whose gtid has no parseable seq (gtid_seq_expr yields
    # NULL) sorts and bounds as -1 — earliest — instead of a None/int
    # TypeError on the driver and a null boundary that never matches
    for r in sorted(
        rows, key=lambda r: (r["shard"], r["seq"] if r["seq"] is not None else -1)
    ):
        fields = [f.asDict() for f in r["fields"] or []]
        schema = field_event_to_schema(keyspace, r["shard"], table, fields, **resolve_modes)
        gens = per_shard.setdefault(r["shard"], [])
        bseq = r["seq"] if r["seq"] is not None else -1
        gens.append((bseq, len(gens) + 1, schema))
    return per_shard


def decode_table_evolving(
    raw_df: DataFrame,
    keyspace: str,
    table: str,
    **modes,
) -> DataFrame:
    """D4+X3: decode a table whose schema is carried in-stream by FIELD events.

    Spark-first shape (reference: VStreamOutputMessageDecoder.java:331-377 +
    per-shard evolution tests VStreamOutputMessageDecoderTest.java:336-505):

    1. FIELD events (rare) are collected driver-side into per-shard schema
       generations — the in-memory VitessDatabaseSchema analog.
    2. Each row event gets its ``schema_gen`` from a *broadcast-style
       when-chain* over the collected boundaries (``seq >= boundary``) — a
       narrow codegen'd projection; no window, no shuffle, so the assignment
       survives any scale.
    3. Rows are decoded once per distinct column-set signature (not per
       shard×generation), and the branches union on the superset of columns
       with type-conflicts resolved toward the latest generation.

    Output is FLAT (``before_<col>`` / ``after_<col>`` superset + envelope
    spine): with a dynamic schema the nested before/after structs would have
    per-branch types and could not union.
    """
    resolve_modes = {
        k: modes[k] for k in ("bigint_unsigned_mode", "temporal_mode", "binary_mode")
        if k in modes
    }
    convert_modes = {k: v for k, v in modes.items() if k != "temporal_mode"}
    per_shard = collect_field_schemas(raw_df, keyspace, table, **resolve_modes)
    if not per_shard:
        raise ValueError(f"no FIELD events for {keyspace}.{table}: schema unknown")

    changes = explode_row_changes(raw_df).filter(
        (F.col("keyspace") == keyspace) & (F.col("table_name") == table)
    )
    seq = gtid_seq_expr()

    # (2) schema_gen: count boundaries passed. One when-branch per shard,
    # each summing only that shard's boundary terms, so a row evaluates
    # O(#shards) equality checks + O(its shard's #DDLs) comparisons — not the
    # O(#shards × #generations) flat sum of every shard's boundaries.
    gen = None
    for shard, gens in per_shard.items():
        shard_gen = F.lit(0)
        for bseq, _g, _schema in gens:
            shard_gen = shard_gen + F.when(seq >= bseq, 1).otherwise(0)
        # clamp to gen 1: VStream sends FIELD before any of a shard's rows,
        # so a 0 here means an unparseable/null row gtid — decode it with
        # the shard's first schema instead of silently dropping the row
        # (rows from shards with NO field event still vanish: nothing can
        # decode them, mirroring the loud no-FIELD-at-all ValueError above)
        shard_gen = F.greatest(shard_gen, F.lit(1))
        cond = F.col("shard") == shard
        gen = F.when(cond, shard_gen) if gen is None else gen.when(cond, shard_gen)
    changes = changes.withColumn("seq", seq).withColumn(
        "schema_gen", gen.otherwise(F.lit(0)).cast("int")
    )

    # (3) group (shard, gen) by column-set signature
    def signature(schema: TableSchema):
        # enum_values is part of the identity: generations differing only in
        # ENUM/SET members must NOT share a decode branch (the stale value
        # list silently mis-decodes indexes added by the DDL)
        return tuple(
            (c.name, str(c.resolved.spark_type), c.resolved.family, c.resolved.enum_values)
            for c in schema.columns
        )

    groups: dict[tuple, dict] = {}
    # name -> (boundary seq, ResolvedType): LATEST generation wins by the
    # schema's boundary seq — plain insertion order would leave whichever
    # shard iterated last, which can be the OLDEST type
    latest: dict[str, tuple] = {}
    for shard, gens in per_shard.items():
        for bseq, g, schema in gens:
            sig = signature(schema)
            entry = groups.setdefault(sig, {"schema": schema, "keys": []})
            entry["keys"].append((shard, g))
            for c in schema.columns:
                prev = latest.get(c.name)
                if prev is None or bseq >= prev[0]:
                    latest[c.name] = (bseq, c.resolved)
    superset: dict[str, object] = {n: rv for n, (_b, rv) in latest.items()}

    ts_ms = F.unix_millis(F.col("ts"))
    frames = []
    for sig, entry in groups.items():
        schema: TableSchema = entry["schema"]
        have = {c.name for c in schema.columns}
        cond = None
        for shard, g in entry["keys"]:
            c = (F.col("shard") == shard) & (F.col("schema_gen") == g)
            cond = c if cond is None else (cond | c)
        sub = changes.filter(cond)
        cols = []
        for img in ("before", "after"):
            m = F.col(f"change.{img}")
            for name, resolved in superset.items():
                if name in have:
                    col_schema = next(c for c in schema.columns if c.name == name)
                    v = convert_raw(m.getItem(name), col_schema.resolved, **convert_modes)
                    # type conflicts across generations resolve to the latest
                    # type; try_cast: an unconvertible old-type value must
                    # null, not ANSI-kill the job
                    v = v.try_cast(resolved.spark_type)
                else:
                    v = F.lit(None).cast(resolved.spark_type)
                cols.append(F.when(m.isNotNull(), v).alias(f"{img}_{name}"))
        frames.append(
            sub.select(
                F.col("op"),
                F.col("keyspace"),
                F.col("shard"),
                F.col("table_name"),
                F.col("gtid"),
                F.col("tx_id"),
                F.col("seq"),
                F.col("schema_gen"),
                ts_ms.alias("ts_ms"),
                *cols,
            )
        )
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out


def decode_table(
    raw_df: DataFrame,
    schema: TableSchema,
    *,
    server_name: str = "vitess",
    **modes,
) -> DataFrame:
    """Full decode for one table: dispatch → explode → typed images → envelope.

    Output: op, before, after, source, ts_ms (FIXTURES.md §1). The plan is a
    single stage of narrow ops — scan → filter → project — so Catalyst pushes
    the table filter into the source and the whole thing codegens.

    ``temporal_mode`` is a RESOLVE-time setting (it picks the decoded Spark
    type, so it is baked into the pre-resolved ``schema``): passing one here
    that contradicts the schema's resolve-time mode raises instead of being
    silently dropped — the silent drop masked schema/decode mode mismatches.
    A matching (or redundant-on-non-temporal) value is accepted and ignored.
    """
    passed_tm = modes.pop("temporal_mode", None)
    if passed_tm is not None:
        resolved_tms = {
            c.resolved.temporal_mode
            for c in schema.columns
            if c.resolved.temporal_mode is not None
        }
        if resolved_tms and resolved_tms != {passed_tm}:
            raise ValueError(
                f"decode_table: temporal_mode={passed_tm} contradicts the "
                f"schema's resolve-time mode(s) {sorted(m.value for m in resolved_tms)} — "
                f"temporal_mode picks the decoded Spark type and must be "
                f"passed to types.resolve() when the schema is built"
            )
    changes = explode_row_changes(raw_df).filter(
        (F.col("keyspace") == schema.keyspace) & (F.col("table_name") == schema.table)
    )
    ts_ms = F.unix_millis(F.col("ts"))
    return changes.select(
        F.col("op"),
        typed_row_struct(F.col("change.before"), schema, **modes).alias("before"),
        typed_row_struct(F.col("change.after"), schema, **modes).alias("after"),
        source_struct(
            server_name,
            keyspace=F.col("keyspace"),
            table=F.col("table_name"),
            shard=F.col("shard"),
            vgtid=F.col("vgtid"),
            ts_ms=ts_ms,
        ).alias("source"),
        ts_ms.alias("ts_ms"),
        F.col("tx_id"),
        F.col("gtid"),
        F.col("shard"),
        # position within the transaction's row_changes: all changes of one
        # Vitess transaction share a GTID, so materialize's last-write-wins
        # needs this to break same-seq ties deterministically
        F.col("change_idx"),
    )
