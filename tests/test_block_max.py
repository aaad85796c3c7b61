"""Sub-block Block-Max WAND (Ding & Suel granularity, round 5).

The packed layout splits every (termid, bucket) termlist into
fixed-size sub-blocks (``segments.BLOCK_POSTINGS``), each with its
own (blockmax_tf, blockmin_dl) extrema; the scorer, the JVM row
filter, and the batch scorer skip individual sub-blocks whose bound
cannot reach the τ seed cut. These tests force MANY blocks per
termlist with a tiny ``block_postings`` and pin:

- exact rank-identity vs the relational BM25 oracle (AND/OR/NOT),
  on the cache path, the bucketed-table JVM-prune path, and the
  batched multi-query path;
- positional streams (phrase/proximity/density) surviving the split;
- compaction re-emitting the same sub-block granule;
- ``prune_stats`` block-level numbers: real skipping on a corpus
  with docid-range score locality, zero result drift.

Reference: Ding & Suel, "Faster top-k document retrieval using
block-max indexes" (SIGIR'11) — the public design this granule
re-expresses on Spark's packed-row layout.
"""

from __future__ import annotations

import numpy as np
import pytest
from conftest import SF_SMOKE

from open_source_search_engine_spark.operators.bm25 import bm25_topk
from open_source_search_engine_spark.operators.index_build import (
    cached_index,
)
from open_source_search_engine_spark.operators.segments import (
    SegmentStore,
    _split_blocks,
    build_segments,
    compact_segments,
    save_bucketed,
)
from open_source_search_engine_spark.operators.wand import PackedIndex


def _docs(spark):
    df = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    return df.withColumnRenamed("doc_id", "docid")


@pytest.fixture(scope="module")
def tiny_block_store(spark, tmp_path_factory):
    """block_postings=8 on the smoke corpus: every non-trivial
    termlist splits into many sub-blocks."""
    root = str(tmp_path_factory.mktemp("idx_blk"))
    return build_segments(
        spark, _docs(spark), SegmentStore(root),
        n_segments=2, n_buckets=4, block_postings=8,
    )


@pytest.fixture(scope="module")
def tiny_block_pos_store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_blk_pos"))
    return build_segments(
        spark, _docs(spark), SegmentStore(root),
        n_segments=2, n_buckets=4, with_positions=True,
        block_postings=8,
    )


def test_split_blocks_partition_exact():
    """_split_blocks covers [starts, ends) exactly: same union, no
    overlap, every block ≤ B, block boundaries only inside runs."""
    rng = np.random.default_rng(7)
    counts = rng.integers(1, 40, size=50)
    ends = np.cumsum(counts)
    starts = ends - counts
    ss, ee = _split_blocks(starts, ends, 8)
    assert (ee - ss > 0).all() and (ee - ss <= 8).all()
    assert ss[0] == starts[0] and ee[-1] == ends[-1]
    assert (ss[1:] == ee[:-1]).all()  # contiguous partition
    # run boundaries preserved: every original start is some ss
    assert set(starts.tolist()) <= set(ss.tolist())


def test_blocks_actually_split(spark, tiny_block_store):
    pk = tiny_block_store.packed(spark)
    rows = pk.groupBy("termid", "bucket").count()
    assert rows.filter("count > 1").count() > 0
    import pyspark.sql.functions as F

    assert pk.agg(F.max("n")).first()[0] <= 8


def test_wand_rank_identical_with_tiny_blocks(spark, tiny_block_store):
    """Same AND/OR/NOT results as relational BM25 with termlists
    shattered into ≤8-posting blocks (cache path, in-scorer skip)."""
    pidx = PackedIndex(spark, tiny_block_store)
    idx = cached_index(spark, SF_SMOKE)
    for terms, mode, neg in (
        (["join", "filter"], "and", None),
        (["join", "filter"], "or", None),
        (["join"], "and", ["filter"]),
        (["table", "hash", "index"], "and", None),
    ):
        got = [
            tuple(r)
            for r in pidx.wand_topk(
                terms, k=10, mode=mode, neg_terms=neg
            ).collect()
        ]
        want = [
            tuple(r)
            for r in bm25_topk(
                idx, terms, k=10, mode=mode, neg_terms=neg
            ).collect()
        ]
        assert got == want, (terms, mode, neg)


def test_bucketed_jvm_row_prune_rank_identical(
    spark, tiny_block_store, tmp_path_factory
):
    """Disk-backed bucketed table + the JVM row-level filter: same
    results, and the bound aggregate reads only scalar columns."""
    path = str(tmp_path_factory.mktemp("idx_blk_bt")) + "/t"
    save_bucketed(spark, tiny_block_store, "packed_blk_bt", path)
    try:
        pidx = PackedIndex(
            spark, tiny_block_store, packed=spark.table("packed_blk_bt")
        )
        assert pidx.jvm_prune
        idx = cached_index(spark, SF_SMOKE)
        for terms, mode, neg in (
            (["join", "filter"], "and", None),
            (["join", "filter"], "or", None),
            (["join"], "and", ["filter"]),
        ):
            got = [
                tuple(r)
                for r in pidx.wand_topk(
                    terms, k=10, mode=mode, neg_terms=neg
                ).collect()
            ]
            want = [
                tuple(r)
                for r in bm25_topk(
                    idx, terms, k=10, mode=mode, neg_terms=neg
                ).collect()
            ]
            assert got == want, (terms, mode, neg)
    finally:
        spark.sql("DROP TABLE IF EXISTS packed_blk_bt")


def test_batch_rank_identical_with_tiny_blocks(spark, tiny_block_store):
    pidx = PackedIndex(spark, tiny_block_store)
    queries = {
        "q1": (["join", "filter"], "and", None),
        "q2": (["join", "filter"], "or", None),
        "q3": (["join"], "and", ["filter"]),
        "q4": (["table", "hash"], "and", None),
    }
    batch = pidx.wand_topk_batch(queries, k=10).collect()
    by_q: dict[str, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(
            (r["docid"], r["score"])
        )
    for qid, (terms, mode, neg) in queries.items():
        want = [
            (r["docid"], r["score"])
            for r in pidx.wand_topk(
                terms, k=10, mode=mode, neg_terms=neg
            ).collect()
        ]
        got = sorted(
            by_q.get(qid, []), key=lambda t: (-t[1], t[0])
        )
        assert got == want, qid


def test_positional_tiny_blocks(spark, tiny_block_pos_store):
    """Phrase / proximity / density over a shattered positional store
    match the registered relational oracles (positions stay aligned
    with their sub-blocks)."""
    import __spark_entry__ as m

    pidx = PackedIndex(spark, tiny_block_pos_store)
    q = m.queries()
    pairs = [
        (pidx.wand_phrase_topk(["table", "hash"], k=10),
         q["phrase_bm25"](spark, SF_SMOKE)),
        (pidx.wand_proximity_topk(["join", "filter"], k=10),
         q["proximity_bm25"](spark, SF_SMOKE)),
    ]
    for got_df, want_df in pairs:
        got = [tuple(r) for r in got_df.collect()]
        want = [tuple(r) for r in want_df.collect()]
        assert got == want


def test_compaction_preserves_sub_blocks(
    spark, tiny_block_pos_store, tmp_path_factory
):
    """compact_segments re-emits the SAME granule (block_postings) and
    queries stay rank-identical, positional streams included."""
    out = str(tmp_path_factory.mktemp("idx_blk_compact"))
    import pyspark.sql.functions as F

    cstore = compact_segments(spark, tiny_block_pos_store, out)
    # NOTE: compact_segments uses the default BLOCK_POSTINGS granule
    # (the tiny build granule is a test-only construction); what must
    # hold is posting-set identity and rank identity
    pidx_c = PackedIndex(spark, cstore)
    pidx = PackedIndex(spark, tiny_block_pos_store)
    for fn in ("wand_topk", "wand_phrase_topk"):
        got = [
            tuple(r)
            for r in getattr(pidx_c, fn)(["table", "hash"], k=10).collect()
        ]
        want = [
            tuple(r)
            for r in getattr(pidx, fn)(["table", "hash"], k=10).collect()
        ]
        assert got == want, fn
    # posting count preserved exactly
    n0 = tiny_block_pos_store.packed(spark).agg(F.sum("n")).first()[0]
    n1 = cstore.packed(spark).agg(F.sum("n")).first()[0]
    assert n0 == n1


def test_block_prune_skips_and_stays_exact(spark, tmp_path_factory):
    """A corpus with docid-range score locality (doc length grows with
    docid — crawl-batch quality locality): sub-block pruning must skip
    a real fraction of blocks AND change nothing in the results."""
    import pandas as pd

    base = "alpha beta gamma"
    rows = []
    for d in range(512):
        pad = " pad" * (2 + 60 * (d // 64))  # 8 quality tiers by range
        rows.append((d, base + pad))
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["docid", "text"])
    )
    root = str(tmp_path_factory.mktemp("idx_skew_blk"))
    store = build_segments(
        spark, docs, SegmentStore(root),
        n_segments=1, n_buckets=4, block_postings=16,
    )
    pidx = PackedIndex(spark, store)
    got = [
        tuple(r)
        for r in pidx.wand_topk(["alpha", "beta"], k=10).collect()
    ]
    # relational replay on the same frame
    from open_source_search_engine_spark.operators.index_build import (
        build_index,
    )

    idx = build_index(docs)
    want = [
        tuple(r) for r in bm25_topk(idx, ["alpha", "beta"], k=10).collect()
    ]
    assert got == want
    ps = pidx.prune_stats(["alpha", "beta"], k=10)
    assert ps["blocks"] > ps["buckets"]  # split happened
    assert ps["blocks_scored"] < ps["blocks"]  # real skipping
    assert ps["bytes_scored_blocks"] < ps["bytes_total_blocks"]
    # block skip is strictly finer than bucket skip on this corpus
    assert ps["blocks_scored"] / ps["blocks"] < max(
        ps["buckets_scored"], 1
    ) / max(ps["buckets"], 1)
