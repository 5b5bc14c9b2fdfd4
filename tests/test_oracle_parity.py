"""Run EVERY registered query against its DuckDB oracle at sf0.001 — the local
mirror of the driver's CORRECTNESS gate. Any query registered without this
passing is not done."""

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare

#: rows allowed to hash DOUBLE columns: raw data values decoded from the
#: fixture (identical bits in both engines by construction) or single-op
#: per-row/per-group floats — green since round 1. Multi-stage float
#: PIPELINES must ship integer-quantized instead (the r5/r6 phantom
#: hash-reds: bit-exact values, driver hash still flagged them). A new row
#: with an unlisted double column fails here with instructions, not two
#: rounds later in the driver artifact.
_HASHED_DOUBLE_ALLOWLIST = {
    "cdc_envelope": {"before_value", "after_value"},
    "cdc_extract_new_state": {"value"},
    "cdc_materialize": {"value"},
    "cdc_materialize_stream": {"value"},
    "change_rate_windows": {"events_per_hour"},
    "schema_evolution": {"before_value", "after_value"},
    "text_metrics": {"mean_word_len", "quality_score", "repeated_frac"},
    "embedding_quantize": {"scale"},
    "multimodal_metadata": {"scale"},
    "pricing_summary": {"sum_qty", "sum_base_price", "sum_disc_price"},
    "revenue_by_nation": {"revenue"},
    "type_decode_all": {"float_col"},
    "decode_error_modes": {"value"},
}


def _cases():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    return [(name, qs[name], oracles.get(name)) for name in sorted(qs)]


@pytest.mark.parametrize("name,fn,oracle", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(spark, sf_dir, name, fn, oracle):
    df = fn(spark, sf_dir)
    # substring match so array<double>/struct<...float...> nested floats hit
    # the gate too, not only top-level double columns (r7 advice)
    stray = {
        c for c, t in df.dtypes if ("double" in t or "float" in t)
    } - _HASHED_DOUBLE_ALLOWLIST.get(name, set())
    assert not stray, (
        f"{name} hashes new double column(s) {sorted(stray)} — emit "
        f"CAST(ROUND(x*10^k) AS BIGINT) twins in query AND oracle (with a "
        f"margin test if it's a cross-row float sum), or extend the "
        f"allowlist only for raw data values / single-op floats"
    )
    if oracle is None:
        # weaker rows-only check (driver does the same for non-SQL ops)
        assert df.count() >= 0
        return
    compare(df, oracle, sf_dir)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
