"""IR-operator registry entries: index build + BM25 query surface
(SURVEY.md §2 rows C3/C6, E1/E2, D4–D6, D8, D14). Each entry pairs the
Spark implementation with its DuckDB oracle over the driver's
``documents(doc_id, text, …)`` view."""

from __future__ import annotations

from pyspark.sql import functions as F

from .bm25 import bm25_oracle_sql, bm25_topk
from .index_build import cached_index
from .registry import TOK_CTE, register

# --- C3/C6: exploded posting build ---------------------------------------


@register(
    "postings_build",
    f"""WITH {TOK_CTE}
SELECT p.docid, p.term, p.tf, d.dl AS doclen
FROM postings p JOIN doclen d USING (docid)""",
)
def postings_build(spark, sf_dir):
    idx = cached_index(spark, sf_dir)
    return idx.postings.select(
        "docid",
        "term",
        F.col("tf").cast("long").alias("tf"),
        F.col("doclen").cast("long").alias("doclen"),
    )


# --- E1: per-term stats (ref: Posdb::getTermFreq) ------------------------


@register(
    "term_stats",
    f"""WITH {TOK_CTE}
SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf, max(tf) AS max_tf
FROM postings GROUP BY term""",
)
def term_stats(spark, sf_dir):
    idx = cached_index(spark, sf_dir)
    return idx.term_stats.select(
        "term",
        "df",
        "cf",
        F.col("max_tf").cast("long").alias("max_tf"),
    )


# --- E2: per-doc length --------------------------------------------------


@register(
    "doc_stats",
    f"WITH {TOK_CTE} SELECT docid, dl AS doclen FROM doclen",
)
def doc_stats(spark, sf_dir):
    idx = cached_index(spark, sf_dir)
    return idx.doc_stats.select(
        "docid", F.col("doclen").cast("long").alias("doclen")
    )


# --- D4/D5/D6/D8: BM25 retrieval modes -----------------------------------


def _bm25(terms, mode="and", neg=None, k=10):
    def run(spark, sf_dir):
        idx = cached_index(spark, sf_dir)
        return bm25_topk(idx, terms, k=k, mode=mode, neg_terms=neg)

    return run


# Driver slots (D4/D5/D6/D8 need 3 rows across the two code paths):
# bm25_not exercises the relational scorer + negative termlists;
# wand_and / wand_or exercise the packed path's intersection and
# union. The other six mode variants are EXTENDED — same oracles,
# pytest-gated (see registry.py tier note).
register("bm25_single", bm25_oracle_sql(["join"]), extended=True)(
    _bm25(["join"])
)
register("bm25_and", bm25_oracle_sql(["join", "filter"]), extended=True)(
    _bm25(["join", "filter"])
)
register(
    "bm25_and3",
    bm25_oracle_sql(["join", "filter", "window"]),
    extended=True,
)(_bm25(["join", "filter", "window"]))
register(
    "bm25_or", bm25_oracle_sql(["join", "filter"], mode="or"), extended=True
)(_bm25(["join", "filter"], mode="or"))
register(
    "bm25_not", bm25_oracle_sql(["join"], neg_terms=["window"])
)(_bm25(["join"], neg=["window"]))


# --- D4b/O1: packed block-max WAND path ----------------------------------
# Checked against the *same* BM25 SQL oracle as the relational path —
# the packed codec + WAND pruning must reproduce identical top-k.

_PACKED: dict = {}


def _packed_index(spark, sf_dir):
    import tempfile

    from .segments import SegmentStore, build_segments
    from .wand import PackedIndex

    # keyed like cached_index/ensure_shipped: (applicationId, startTime)
    # cannot be recycled by a later context after GC, unlike id(sc).
    sc = spark.sparkContext
    key = (sc.applicationId, sc.startTime, sf_dir)
    if key not in _PACKED:
        root = tempfile.mkdtemp(prefix="sfx_packed_")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumnRenamed(
            "doc_id", "docid"
        )
        store = build_segments(
            spark, docs, SegmentStore(root), n_segments=2, n_buckets=8
        )
        _PACKED[key] = PackedIndex(spark, store)
    return _PACKED[key]


def _wand(terms, mode="and", neg=None, k=10):
    def run(spark, sf_dir):
        return _packed_index(spark, sf_dir).wand_topk(
            terms, k=k, mode=mode, neg_terms=neg
        )

    return run


register("wand_single", bm25_oracle_sql(["join"]), extended=True)(
    _wand(["join"])
)
register("wand_and", bm25_oracle_sql(["join", "filter"]))(
    _wand(["join", "filter"])
)
register("wand_or", bm25_oracle_sql(["join", "filter"], mode="or"))(
    _wand(["join", "filter"], mode="or")
)
register(
    "wand_not",
    bm25_oracle_sql(["join"], neg_terms=["window"]),
    extended=True,
)(_wand(["join"], neg=["window"]))


# --- D14: hit-count estimation ("about N results") -----------------------


@register(
    "match_count",
    f"""WITH {TOK_CTE}
SELECT count(DISTINCT docid) AS n_hits FROM postings WHERE term = 'join'""",
    extended=True,  # D14's driver row is match_count_sampled
)
def match_count(spark, sf_dir):
    idx = cached_index(spark, sf_dir)
    return (
        idx.postings.filter(F.col("term") == "join")
        .agg(F.countDistinct("docid").alias("n_hits"))
    )
