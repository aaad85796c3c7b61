"""North-rule rank-identity over the reference query set (FIXTURES.md
§3): all 50 generated queries — head/tail singles, AND, OR, NOT,
quoted phrases — return rank-identical (docid, score) from the packed
block-max WAND path and the relational BM25 baseline, on the webtext
corpus (the input_hint table shape, html included)."""

from __future__ import annotations

import pytest

from open_source_search_engine_spark.operators.bm25 import bm25_topk
from open_source_search_engine_spark.operators.index_build import build_index
from open_source_search_engine_spark.operators.search import (
    parse_query,
    phrase_docids,
)
from open_source_search_engine_spark.operators.segments import (
    SegmentStore,
    build_segments,
)
from open_source_search_engine_spark.operators.wand import PackedIndex
from open_source_search_engine_spark.sources.webtext import (
    generate_queries,
    webtext_path,
)
from open_source_search_engine_spark.tokenizer import doc_id_from_url

N_DOCS = 1200


@pytest.fixture(scope="module")
def web(spark, tmp_path_factory):
    path = webtext_path(N_DOCS)
    docs = (
        spark.read.parquet(path)
        .withColumn("docid", doc_id_from_url("url"))
        .select("docid", "text")
        .cache()
    )
    docs.count()
    idx = build_index(docs, with_positions=True, cache=True)
    idx.postings.count()
    root = str(tmp_path_factory.mktemp("qs_store"))
    store = build_segments(
        spark, docs, SegmentStore(root), n_segments=2, n_buckets=8
    )
    pidx = PackedIndex(spark, store)
    yield docs, idx, pidx
    docs.unpersist()
    idx.postings.unpersist()


def _run_query(spark, idx, pidx, qtext: str, k: int):
    pq = parse_query(qtext)
    terms, mode, neg = pq.terms, pq.mode, pq.negated or None
    rel = bm25_topk(idx, terms, k=k, mode=mode, neg_terms=neg)
    wand = pidx.wand_topk(terms, k=k, mode=mode, neg_terms=neg)
    rel_rows = [(r["docid"], r["score"]) for r in rel.collect()]
    wand_rows = [(r["docid"], r["score"]) for r in wand.collect()]
    if pq.phrases:
        # phrase post-filter applies identically to both paths
        allowed = {
            r["docid"]
            for words in pq.phrases
            for r in phrase_docids(idx, words).collect()
        }
        rel_rows = [x for x in rel_rows if x[0] in allowed]
        wand_rows = [x for x in wand_rows if x[0] in allowed]
    return rel_rows, wand_rows


def test_query_set_rank_identical(spark, web):
    docs, idx, pidx = web
    queries = generate_queries()
    assert len(queries) == 50
    n_nonempty = 0
    for q in queries:
        rel, wand = _run_query(spark, idx, pidx, q["qtext"], q["k"])
        assert rel == wand, f"qid={q['qid']} {q['qtext']!r}: {rel} != {wand}"
        n_nonempty += bool(rel)
    # the fixture is built so most queries hit something
    assert n_nonempty >= 25, f"only {n_nonempty}/50 queries matched"
