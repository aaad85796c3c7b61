"""Index build + relational BM25 path vs DuckDB oracle (SURVEY.md §5.1)."""

from __future__ import annotations

import math

import pytest
from conftest import SF_SMOKE, assert_df_matches_duckdb
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators.bm25 import bm25_oracle_sql, bm25_topk
from open_source_search_engine_spark.operators.index_build import (
    build_index_from_table,
)


@pytest.fixture(scope="module")
def index(spark):
    return build_index_from_table(spark, SF_SMOKE, cache=True)


def test_doc_stats(index, spark, duck):
    sdf = index.doc_stats.select("docid", F.col("doclen").cast("long").alias("doclen"))
    assert_df_matches_duckdb(
        sdf,
        duck,
        """SELECT doc_id AS docid, count(*) AS doclen
           FROM documents, LATERAL unnest(string_split(lower(text),' ')) t(tokk)
           WHERE t.tokk <> '' GROUP BY doc_id""",
    )


def test_term_stats(index, spark, duck):
    sdf = index.term_stats.select(
        "term", "df", "cf", F.col("max_tf").cast("long").alias("max_tf")
    )
    assert_df_matches_duckdb(
        sdf,
        duck,
        """WITH tok AS (
             SELECT doc_id AS docid, t.tokk AS term
             FROM documents, LATERAL unnest(string_split(lower(text),' ')) t(tokk)
             WHERE t.tokk <> ''),
           p AS (SELECT docid, term, count(*) tf FROM tok GROUP BY 1,2)
           SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf,
                  max(tf) AS max_tf
           FROM p GROUP BY term""",
    )


def test_avgdl_and_n(index, duck):
    n, avgdl = duck.execute(
        """WITH dl AS (
             SELECT doc_id, count(*) c FROM documents,
             LATERAL unnest(string_split(lower(text),' ')) t(tokk)
             WHERE t.tokk <> '' GROUP BY doc_id)
           SELECT count(*), avg(c) FROM dl"""
    ).fetchone()
    assert index.n_docs == n
    assert math.isclose(index.avgdl, avgdl, rel_tol=1e-12)


@pytest.mark.parametrize(
    "terms,mode,neg",
    [
        (["join"], "and", None),
        (["join", "filter"], "and", None),
        (["join", "filter", "window"], "and", None),
        (["join", "filter"], "or", None),
        (["join"], "and", ["window"]),
        (["nosuchterm"], "and", None),
    ],
)
def test_bm25_vs_oracle(index, duck, terms, mode, neg):
    sdf = bm25_topk(index, terms, k=10, mode=mode, neg_terms=neg)
    sql = bm25_oracle_sql(terms, k=10, mode=mode, neg_terms=neg)
    assert_df_matches_duckdb(sdf, duck, sql)


def test_topk_is_take_ordered(index):
    """The physical plan must be TakeOrderedAndProject (bounded per-
    partition heap + driver merge — the TopTree/Msg3a shape), not a
    global sort."""
    plan = bm25_topk(index, ["join"], k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_positional_build_tokenless_docs(spark):
    """Token-less docs (empty/punctuation-only text) must not emit
    phantom NULL-term postings in the positional build, and both
    build modes must agree on n_docs/avgdl (review-found bug: the
    NULL-padded nxts array zipped to length 1 for empty toks)."""
    from open_source_search_engine_spark.operators.index_build import (
        build_index,
    )

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, ""), (3, "!!!")], "docid long, text string"
    )
    pos = build_index(docs, with_positions=True)
    plain = build_index(docs)
    assert pos.postings.filter("term IS NULL").count() == 0
    assert pos.postings.count() == plain.postings.count() == 2
    assert pos.n_docs == plain.n_docs == 1
    assert pos.avgdl == plain.avgdl == 3.0
