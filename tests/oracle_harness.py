"""Local mirror of the driver's correctness gate: run a Spark query and its
DuckDB oracle on the same parquet tables, compare row count + schema + values
order-insensitively."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    import datetime

    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                pass
            df[c] = df[c].astype("datetime64[ns]")
        elif df[c].dtype == object:
            # bytes ↔ memoryview; datetime.date ↔ datetime64 (Spark DateType
            # arrives as python dates, DuckDB DATE as datetime64)
            df[c] = df[c].map(lambda v: bytes(v) if isinstance(v, (bytearray, memoryview)) else v)
            if df[c].map(lambda v: v is None or isinstance(v, datetime.date)).all() and not df[c].isna().all():
                df[c] = pd.to_datetime(df[c], errors="coerce").astype("datetime64[ns]")
    df = df.sort_values(by=list(df.columns), na_position="first", kind="mergesort")
    return df.reset_index(drop=True)


def compare(spark_df, oracle_sql: str, sf_dir: str, *, float_rtol: float = 0.0) -> None:
    con = duckdb_conn(sf_dir)
    try:
        expected = con.execute(oracle_sql).df()
    finally:
        con.close()
    actual = spark_df.toPandas()

    assert len(actual) == len(expected), (
        f"row count mismatch: spark={len(actual)} oracle={len(expected)}"
    )
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"column mismatch: spark={sorted(actual.columns)} oracle={sorted(expected.columns)}"
    )
    a, e = _normalize(actual), _normalize(expected)
    for c in a.columns:
        # Dtype-KIND gate: if one engine hands pandas an integer column and
        # the other a float column, the values may be numerically equal but
        # they format differently ("1234" vs "1234.0") — the driver's value
        # hash compares FORMATTED values, so this is a real red even when
        # allclose passes. The canonical offender: DuckDB SUM(BIGINT) returns
        # HUGEINT, which .df() converts to float64, while Spark SUM(BIGINT)
        # stays int64 — cast such oracle outputs ::BIGINT in the outer
        # SELECT. (NULL-bearing int columns convert to float64 in BOTH
        # engines, so that case stays symmetric and passes this gate.)
        ak, ek = a[c].dtype.kind, e[c].dtype.kind
        numeric = {"i", "u", "f"}
        if ak in numeric and ek in numeric:
            assert (ak in "iu") == (ek in "iu"), (
                f"dtype kind mismatch in column {c!r}: spark={a[c].dtype} "
                f"oracle={e[c].dtype} — numerically equal values hash "
                f"differently when one side is float-formatted; cast the "
                f"oracle output (::BIGINT for DuckDB HUGEINT sums) or the "
                f"query so both engines agree"
            )
        av, ev = a[c].to_numpy(), e[c].to_numpy()
        if np.issubdtype(np.asarray(av).dtype, np.floating) or np.issubdtype(
            np.asarray(ev).dtype, np.floating
        ):
            av = pd.to_numeric(a[c], errors="coerce").to_numpy(dtype=float)
            ev = pd.to_numeric(e[c], errors="coerce").to_numpy(dtype=float)
            both_nan = np.isnan(av) & np.isnan(ev)
            if float_rtol == 0.0:
                ok = (av == ev) | both_nan
            else:
                ok = np.isclose(av, ev, rtol=float_rtol, atol=0.0, equal_nan=True)
            assert ok.all(), f"value mismatch in float column {c!r}: " + str(
                list(zip(av[~ok][:5], ev[~ok][:5]))
            )
        else:
            mism = ~(
                (pd.isna(a[c]) & pd.isna(e[c]))
                | (a[c].astype(object) == e[c].astype(object))
            )
            assert not mism.any(), (
                f"value mismatch in column {c!r}: "
                + str(list(zip(a[c][mism][:5], e[c][mism][:5])))
            )
