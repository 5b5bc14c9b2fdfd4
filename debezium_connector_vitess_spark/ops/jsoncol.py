"""Typed access to JSON string columns — the step after CDC JSON parity.

The reference emits MySQL JSON columns as JSON STRINGS
(``VitessValueConverter.java:84`` returns ``Json.builder()``, logical type
``io.debezium.data.Json``; this repo mirrors that in ``types.py``), and
every consumer re-parses them downstream. The same shape appears across
training-data corpora: a ``props``/``metadata`` string column carrying
fetch headers, quality labels, or crawl annotations. This module makes the
downstream parse a first-class engine operator:

- :func:`infer_json_schema` — schema discovery from a bounded prefix of the
  corpus (an O(sample_rows) collect, never O(corpus)); pass a pre-sampled
  frame for corpus-wide randomization.
- :func:`with_json_fields` — ONE codegen'd ``from_json`` projection (JVM
  Jackson parse, inside whole-stage codegen — zero Python seams), with the
  engine's E4 error-mode vocabulary (``errors=fail|null|skip``, same as
  ``ops/multimodal.py``): ``null`` keeps a malformed row with a struct of
  nulls, ``skip`` drops it, ``fail`` raises on the first one.

Scale shape (100 TB): extraction is map-only — no shuffle, no state; the
parsed struct prunes like any other nested column (select ``props.k`` and
Parquet/Catalyst read only that leaf downstream of the parse). Schema
inference cost is bounded by ``sample_rows`` regardless of corpus size; pass
an explicit schema to skip it entirely (the production path — inference is
for exploration, a pinned schema is for pipelines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ERROR_MODES = ("fail", "null", "skip")


def infer_json_schema(
    df: DataFrame,
    col: str,
    *,
    sample_rows: int = 1024,
) -> T.StructType:
    """Infer a :class:`~pyspark.sql.types.StructType` for a JSON string
    column from the first ``sample_rows`` non-null documents in scan order.

    The sample is collected to the driver — an O(sample_rows) transfer, and
    ``limit`` executes incrementally so only the partitions needed to fill
    it are scanned — and parsed by ``spark.read.json``, which unions the
    per-document schemas (a field seen as int in one doc and string in
    another widens to string, Spark's standard JSON reconciliation).

    Two deliberate limits, both documented for the caller: (1) the prefix is
    NOT a corpus-wide random sample — on a date-partitioned corpus a field
    added in recent files will be missed; pass a pre-sampled frame
    (``df.sample(...)``) when drift matters. (2) Fields absent from the
    sample are absent from the schema. For pipelines, infer once, review,
    and pin the result as an explicit schema.

    Malformed sample documents never leak into the result: Spark's JSON
    reader surfaces them as a corrupt-record field, which is stripped here
    (it would otherwise pollute every downstream ``select(out + ".*")``).
    """
    spark = df.sparkSession
    rows = (
        df.select(col).where(F.col(col).isNotNull()).limit(sample_rows).collect()
    )
    strings = [r[0] for r in rows if r[0] is not None]
    if not strings:
        return T.StructType([])
    inferred = spark.read.json(spark.sparkContext.parallelize(strings, 1)).schema
    corrupt_name = spark.conf.get(
        "spark.sql.columnNameOfCorruptRecord", "_corrupt_record"
    )
    return T.StructType([f for f in inferred.fields if f.name != corrupt_name])


def with_json_fields(
    df: DataFrame,
    col: str,
    schema: T.StructType | str | None = None,
    *,
    out: str | None = None,
    errors: str = "null",
    drop_source: bool = False,
    sample_rows: int = 1024,
) -> DataFrame:
    """Parse JSON string column ``col`` into a typed struct column ``out``
    (default ``<col>_parsed``) in one codegen'd ``from_json`` projection.

    ``schema`` may be a StructType, a DDL string (``"k BIGINT, tag STRING"``),
    or None to run :func:`infer_json_schema` first. ``errors`` follows the
    engine's E4 vocabulary (``decode.py`` / ``ops/multimodal.py``):

    - ``null`` (default): a malformed document yields a struct of nulls
      (Spark's PERMISSIVE convention — the struct itself is NOT null) — the
      row survives.
    - ``skip``: rows whose JSON failed to parse are dropped (detected via
      the corrupt-record column, the only reliable malformed signal); null
      sources survive.
    - ``fail``: raise on the first malformed document (Spark FAILFAST).
    """
    if errors not in _ERROR_MODES:
        raise ValueError(f"errors must be fail|null|skip, got {errors!r}")
    if schema is None:
        schema = infer_json_schema(df, col, sample_rows=sample_rows)
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    out = out or f"{col}_parsed"
    if errors == "skip":
        field_names = {f.name for f in schema.fields}
        corrupt = "_corrupt_json"
        while corrupt in field_names:  # never collide with a real field
            corrupt += "_"
        aug = T.StructType(
            list(schema.fields) + [T.StructField(corrupt, T.StringType())]
        )
        parsed = df.withColumn(
            out,
            F.from_json(F.col(col), aug, {"columnNameOfCorruptRecord": corrupt}),
        )
        # getField takes names literally (dotted field names stay safe)
        parsed = parsed.where(F.col(out).getField(corrupt).isNull())
        # strip the marker so the output struct is exactly the asked schema
        parsed = parsed.withColumn(
            out,
            F.when(
                F.col(out).isNotNull(),
                F.struct(
                    *[
                        F.col(out).getField(f.name).alias(f.name)
                        for f in schema.fields
                    ]
                ),
            ),
        )
    else:
        options = {"mode": "FAILFAST"} if errors == "fail" else {}
        parsed = df.withColumn(out, F.from_json(F.col(col), schema, options))
    if drop_source:
        parsed = parsed.drop(col)
    return parsed
