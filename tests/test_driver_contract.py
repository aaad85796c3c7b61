"""Emulates the driver's verify pass: entry() smoke + every queries()
entry vs its oracle_sql() at sf0.01 (the driver's correctness tier).
Keeping this green means CORRECTNESS_r{N}.json should be green."""

from __future__ import annotations

import pytest
from conftest import SF_CORRECT, assert_df_matches_duckdb

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["docid", "score"]


def test_oracle_keys_subset():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0


def _pairs():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    return [(name, q[name], o.get(name)) for name in sorted(q)]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_vs_oracle(spark, duck_correct, name, fn, sql):
    df = fn(spark, SF_CORRECT)
    if sql is None:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    assert_df_matches_duckdb(df, duck_correct, sql)
