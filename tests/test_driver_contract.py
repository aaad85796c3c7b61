"""Emulates the driver's verify pass: entry() smoke + every queries()
entry vs its oracle_sql() at sf0.01 (the driver's correctness tier).
Keeping this green means CORRECTNESS_r{N}.json should be green.

Two tiers (registry.py): the PRIMARY registry is what the driver sees
(capped at its 50-row check limit — asserted here); the EXTENDED
registry holds consolidated-away variants that run through the SAME
comparator in this suite only.
"""

from __future__ import annotations

import pytest
from conftest import SF_CORRECT, assert_df_matches_duckdb

import __spark_entry__ as entrymod
from open_source_search_engine_spark.operators import registry


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


def test_primary_registry_within_driver_cap():
    """Every primary entry lands a driver CORRECTNESS row: the driver
    checks the first 50 registrations, so the primary tier must hold
    at most 50 — and every one of them must be oracle-paired (zero
    rows-only driver entries)."""
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert len(q) <= registry.DRIVER_QUERY_CAP
    missing = set(q) - set(o)
    assert not missing, f"primary entries without oracle: {missing}"


def _pairs():
    q = dict(entrymod.queries())
    o = dict(entrymod.oracle_sql())
    eq = registry.extended_queries()
    eo = registry.extended_oracles()
    assert not set(q) & set(eq), "name collision between tiers"
    q.update(eq)
    o.update(eo)
    return [(name, q[name], o.get(name)) for name in sorted(q)]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_vs_oracle(spark, duck_correct, name, fn, sql):
    df = fn(spark, SF_CORRECT)
    if sql is None:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    assert_df_matches_duckdb(df, duck_correct, sql)
