"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 query on sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2, each checked against DuckDB at sf0.01.

Column-name discipline: every computed column is aliased identically in
the Spark plan and the oracle SQL; float scores are rounded to 4
decimals on both sides and ordering ties are broken on exact integer
columns so the driver's order-insensitive value-hash is stable.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from open_source_search_engine_spark.operators import registry  # noqa: E402
from open_source_search_engine_spark.operators.bm25 import bm25_topk  # noqa: E402
from open_source_search_engine_spark.operators.index_build import (  # noqa: E402
    cached_index,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: two-term AND BM25 top-10 over sf0.001 documents."""
    from open_source_search_engine_spark.session import ensure_shipped

    ensure_shipped(spark)
    idx = cached_index(spark, "/root/testdata/sf0.001")
    return bm25_topk(idx, ["join", "filter"], k=10, mode="and")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.spark_queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_queries()
