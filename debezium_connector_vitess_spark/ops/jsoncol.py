"""Typed access to JSON string columns — the step after CDC JSON parity.

The reference emits MySQL JSON columns as JSON STRINGS
(``VitessValueConverter.java:84`` returns ``Json.builder()``, logical type
``io.debezium.data.Json``; this repo mirrors that in ``types.py``), and
every consumer re-parses them downstream. The same shape appears across
training-data corpora: a ``props``/``metadata`` string column carrying
fetch headers, quality labels, or crawl annotations. This module makes the
downstream parse a first-class engine operator:

- :func:`infer_json_schema` — sample-based schema discovery. Spark's
  ``schema_of_json`` takes ONE literal; the scalable idiom is a bounded
  driver-side sample (like ``pack_sequences``' quantile bounds: an O(sample)
  collect, never O(corpus)) merged by ``spark.read.json``'s schema union.
- :func:`with_json_fields` — ONE codegen'd ``from_json`` projection (JVM
  Jackson parse, inside whole-stage codegen — zero Python seams), with the
  engine's E4 error-mode contract (``decode.py``): ``permissive`` keeps a
  malformed row with a struct of nulls, ``skip`` drops it (corrupt-record
  marker detection), ``fail`` raises on the first one.

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

_ERROR_MODES = ("permissive", "skip", "fail")


def infer_json_schema(
    df: DataFrame,
    col: str,
    *,
    sample_rows: int = 1024,
    seed: int = 0,
) -> T.StructType:
    """Infer a :class:`~pyspark.sql.types.StructType` for a JSON string
    column from a bounded random sample.

    The sample (``limit(sample_rows)`` over a seeded ``sample``) is collected
    to the driver — an O(sample_rows) transfer independent of corpus size —
    and parsed by ``spark.read.json``, which unions the per-document schemas
    (a field seen as int in one doc and string in another widens to string,
    Spark's standard JSON reconciliation). Fields absent from the sample are
    absent from the schema: for pipelines, infer once, review, and pin the
    result as an explicit schema.
    """
    spark = df.sparkSession
    # fraction chosen to overshoot sample_rows on large frames; limit() caps.
    n = df.select(col).where(F.col(col).isNotNull())
    frac_base = max(n.limit(sample_rows * 4).count(), 1)
    frac = min(1.0, (sample_rows * 2) / frac_base)
    rows = (
        n.sample(fraction=frac, seed=seed).limit(sample_rows).collect()
    )
    strings = [r[0] for r in rows if r[0] is not None]
    if not strings:
        return T.StructType([])
    reader = spark.read
    return reader.json(spark.sparkContext.parallelize(strings, 1)).schema


def with_json_fields(
    df: DataFrame,
    col: str,
    schema: T.StructType | str | None = None,
    *,
    out: str | None = None,
    mode: str = "permissive",
    drop_source: bool = False,
    sample_rows: int = 1024,
) -> DataFrame:
    """Parse JSON string column ``col`` into a typed struct column ``out``
    (default ``<col>_parsed``) in one codegen'd ``from_json`` projection.

    ``schema`` may be a StructType, a DDL string (``"k BIGINT, tag STRING"``),
    or None to run :func:`infer_json_schema` first. ``mode`` follows the
    engine's E4 error contract (``decode.py``):

    - ``permissive`` (default): a malformed document yields a struct of
      nulls (Spark's PERMISSIVE convention) — the row survives.
    - ``skip``: rows whose JSON failed to parse are dropped (detected via
      the corrupt-record column, the only reliable malformed signal —
      PERMISSIVE does NOT null the struct itself); null sources survive.
    - ``fail``: raise on the first malformed document (Spark FAILFAST).
    """
    if mode not in _ERROR_MODES:
        raise ValueError(f"mode must be one of {_ERROR_MODES}, got {mode!r}")
    if schema is None:
        schema = infer_json_schema(df, col, sample_rows=sample_rows)
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    out = out or f"{col}_parsed"
    if mode == "skip":
        corrupt = "_corrupt_json"
        aug = T.StructType(
            list(schema.fields) + [T.StructField(corrupt, T.StringType())]
        )
        parsed = df.withColumn(
            out,
            F.from_json(F.col(col), aug, {"columnNameOfCorruptRecord": corrupt}),
        )
        parsed = parsed.where(F.col(f"{out}.{corrupt}").isNull())
        # strip the marker so the output struct is exactly the asked schema
        parsed = parsed.withColumn(
            out,
            F.when(
                F.col(out).isNotNull(),
                F.struct(*[F.col(f"{out}.{f.name}") for f in schema.fields]),
            ),
        )
    else:
        options = {"mode": "FAILFAST"} if mode == "fail" else {}
        parsed = df.withColumn(out, F.from_json(F.col(col), schema, options))
    if drop_source:
        parsed = parsed.drop(col)
    return parsed
