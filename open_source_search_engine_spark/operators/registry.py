"""Central registry binding each implemented operator (SURVEY.md §2) to
a driver-checkable (Spark query, DuckDB oracle SQL) pair.

Conventions (driver contract):
- every callable takes (spark, sf_dir) and returns a DataFrame;
- column names identical on both sides; numeric outputs cast to long
  or rounded double(4) on both sides;
- where an op is not SQL-expressible (packed codecs, WAND internals,
  streaming state) there is no oracle entry — the driver records a
  rows-only check and the pytest suite carries the equivalence proof.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bm25 import bm25_oracle_sql, bm25_topk
from .index_build import cached_index

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}

# DuckDB CTE fragment shared by index-shaped oracles: tokenize the
# driver documents table exactly like tokenizer.tokens_col does
# (corpus is lowercase space-separated — verified in tests).
TOK_CTE = """
tok AS (
  SELECT doc_id AS docid, t.tokk AS term
  FROM documents, LATERAL unnest(string_split(lower(text), ' ')) AS t(tokk)
  WHERE t.tokk <> ''
),
postings AS (
  SELECT docid, term, count(*) AS tf FROM tok GROUP BY docid, term
),
doclen AS (SELECT docid, count(*) AS dl FROM tok GROUP BY docid)
"""


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _with_shipping(fn: Callable) -> Callable:
    """The driver calls queries() with its OWN SparkSession, possibly
    from any cwd — ship the package to its Python workers first."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..session import ensure_shipped

        ensure_shipped(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    return wrapped


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # import for registration side effects (modules append via register())
    from . import (  # noqa: F401
        queries_ir,
        queries_ir2,
        queries_ir3,
        queries_pipeline,
        queries_search,
        queries_streaming,
        queries_web,
    )
    return {name: _with_shipping(fn) for name, fn in _QUERIES.items()}


def oracle_queries() -> dict[str, str]:
    spark_queries()
    return dict(_ORACLES)
