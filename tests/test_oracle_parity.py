"""Run EVERY registered query against its DuckDB oracle at sf0.001 — the local
mirror of the driver's CORRECTNESS gate. Any query registered without this
passing is not done."""

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare


def _cases():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    return [(name, qs[name], oracles.get(name)) for name in sorted(qs)]


@pytest.mark.parametrize("name,fn,oracle", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(spark, sf_dir, name, fn, oracle):
    df = fn(spark, sf_dir)
    if oracle is None:
        # weaker rows-only check (driver does the same for non-SQL ops)
        assert df.count() >= 0
        return
    compare(df, oracle, sf_dir)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
