from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = "/root/testdata"
SF_SMOKE = os.path.join(TESTDATA, "sf0.001")
SF_CORRECT = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    from open_source_search_engine_spark.session import get_spark

    s = get_spark(app="tests", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


def _duck_for(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{p}')"
            )
    return con


@pytest.fixture(scope="session")
def duck():
    """DuckDB over sf0.001 (smoke tier), driver-style plain view names."""
    con = _duck_for(SF_SMOKE)
    yield con
    con.close()


@pytest.fixture(scope="session")
def duck_correct():
    """DuckDB over sf0.01 — the tier the driver's correctness gate uses."""
    con = _duck_for(SF_CORRECT)
    yield con
    con.close()


def query_and_oracle(name: str):
    """(query_fn, oracle_sql) for ``name``, searching BOTH registry
    tiers — tests keep their oracle checks when a query is
    consolidated out of the driver's 50-slot primary tier."""
    from open_source_search_engine_spark.operators import registry

    q = registry.spark_queries()
    q.update(registry.extended_queries())
    o = registry.oracle_queries()
    o.update(registry.extended_oracles())
    return q[name], o.get(name)


def assert_df_matches_duckdb(sdf, duck_con, sql: str, float_round: int = 4):
    """Emulates the driver's correctness gate: row-count + schema-name +
    order-insensitive value comparison between a Spark DF and DuckDB SQL.

    The DuckDB side materializes through ``fetchdf()`` (pandas), NOT
    ``fetchall()``: the driver hashes pandas values, where e.g. a
    HUGEINT ``sum()`` becomes float64 — a type bug ``fetchall()``'s
    Python ints would mask (round-1 ``term_stats`` regression). Values
    are compared type-sensitively (int vs float is a mismatch) for the
    same reason.
    """
    import math

    spark_rows = [tuple(r) for r in sdf.collect()]
    ddf = duck_con.execute(sql).fetchdf()
    duck_rows = [tuple(r) for r in ddf.itertuples(index=False)]
    assert len(spark_rows) == len(duck_rows), (
        f"row count: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_cols = sorted(sdf.columns)
    d_cols = sorted(ddf.columns)
    assert s_cols == d_cols, f"schema: spark={s_cols} duck={d_cols}"

    def canon(rows, cols_in_order, want_cols):
        idx = [cols_in_order.index(c) for c in want_cols]
        out = []
        for r in rows:
            vals = []
            for i in idx:
                v = r[i]
                if hasattr(v, "to_pydatetime"):  # pd.Timestamp
                    v = v.to_pydatetime()
                elif hasattr(v, "item"):  # numpy scalar
                    v = v.item()
                if isinstance(v, float):
                    v = round(v, float_round)
                    if v == -0.0:
                        v = 0.0
                    if math.isnan(v):
                        v = "NaN"
                    v = ("f", v)
                elif isinstance(v, int) and not isinstance(v, bool):
                    v = ("i", v)
                vals.append(v)
            out.append(tuple(vals))
        return sorted(out, key=repr)

    s = canon(spark_rows, sdf.columns, s_cols)
    d = canon(duck_rows, list(ddf.columns), s_cols)
    assert s == d, f"value mismatch; first spark={s[:3]} duck={d[:3]}"
