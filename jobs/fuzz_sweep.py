"""Offline multi-seed sweep of the differential fuzz modules.

Re-runs the committed fuzz logic (tests/test_wand_fuzz_*.py) under
FRESH seeds — the CI tests stay fixed-seed so failures replay
exactly; this job answers "did the fixed draw just get lucky?".
Any mismatch against the relational ground truth is a real ranking
bug. Round-5 close: 14 seeds (8 relational x 24 queries x 3 paths
{cache, bucketed JVM-prune, fused batch} + 6 positional x
{phrase, proximity, fused positional batch}), ~800 comparisons,
zero drift.

Usage: python jobs/fuzz_sweep.py   (~7 min at 16 cores; exits 1 on
any mismatch and prints the replay tuple)
"""
import importlib.util
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402

from open_source_search_engine_spark.operators.bm25 import (  # noqa: E402
    bm25_topk,
)
from open_source_search_engine_spark.operators.index_build import (  # noqa: E402
    build_index,
)
from open_source_search_engine_spark.operators.search import (  # noqa: E402
    phrase_bm25,
)
from open_source_search_engine_spark.operators.segments import (  # noqa: E402
    SegmentStore,
    build_segments,
    save_bucketed,
)
from open_source_search_engine_spark.operators.wand import (  # noqa: E402
    PackedIndex,
)
from open_source_search_engine_spark.session import get_spark  # noqa: E402


def load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


fz = load("fz", os.path.join(_REPO, "tests/test_wand_fuzz_differential.py"))
pz = load("pz", os.path.join(_REPO, "tests/test_wand_fuzz_positional.py"))

spark = get_spark(app="fuzz-sweep", cores=16)
fails = []


def sweep_relational(seed, tag):
    rng = np.random.default_rng(seed)
    docs = spark.createDataFrame(
        fz._draw_corpus(rng), "docid long, text string"
    )
    idx = build_index(docs, cache=True)
    root = tempfile.mkdtemp(prefix=f"fzswp_{seed}_")
    store = build_segments(
        spark, docs, SegmentStore(root),
        n_segments=3, n_buckets=4, block_postings=8,
    )
    trials = fz._draw_queries(rng)
    pidx = PackedIndex(spark, store)
    # cache path
    for terms, mode, neg, k in trials:
        got = [tuple(r) for r in pidx.wand_topk(
            terms, k=k, mode=mode, neg_terms=neg).collect()]
        want = fz._want(idx, terms, mode, neg, k)
        if got != want:
            fails.append((tag, seed, "cache", terms, mode, neg, k))
    # bucketed JVM-prune path
    tname = f"fzswp_bt_{seed}"
    save_bucketed(spark, store, tname, root + "/bt")
    pidx_b = PackedIndex(spark, store, packed=spark.table(tname))
    assert pidx_b.jvm_prune
    for terms, mode, neg, k in trials:
        got = [tuple(r) for r in pidx_b.wand_topk(
            terms, k=k, mode=mode, neg_terms=neg).collect()]
        want = fz._want(idx, terms, mode, neg, k)
        if got != want:
            fails.append((tag, seed, "bucketed", terms, mode, neg, k))
    spark.sql(f"DROP TABLE IF EXISTS {tname}")
    # batch path
    by_k = {}
    for i, (terms, mode, neg, k) in enumerate(trials):
        by_k.setdefault(k, {})[f"q{i}"] = (terms, mode, neg)
    for k, queries in by_k.items():
        rows = pidx.wand_topk_batch(queries, k=k).collect()
        got_by_q = {}
        for r in rows:
            got_by_q.setdefault(r["query_id"], []).append(
                (r["docid"], r["score"]))
        for qid, (terms, mode, neg) in queries.items():
            want = [(r["docid"], r["score"]) for r in pidx.wand_topk(
                terms, k=k, mode=mode, neg_terms=neg).collect()]
            got = sorted(got_by_q.get(qid, []),
                         key=lambda t: (-t[1], t[0]))
            if got != want:
                fails.append((tag, seed, "batch", qid, terms, mode, neg, k))
    idx.postings.unpersist()


def sweep_positional(seed, tag):
    rng = np.random.default_rng(seed)
    rows = pz._corpus(rng)
    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in rows], "docid long, text string"
    )
    idx = build_index(docs, with_positions=True, cache=True)
    root = tempfile.mkdtemp(prefix=f"pzswp_{seed}_")
    store = build_segments(
        spark, docs, SegmentStore(root),
        n_segments=2, n_buckets=4, with_positions=True,
        block_postings=8,
    )
    pidx = PackedIndex(spark, store)
    phrases = pz._draw_phrases(rng, rows)
    prox = pz._draw_prox(rng)
    for words, k in phrases:
        got = [(r["docid"], r["score"])
               for r in pidx.wand_phrase_topk(words, k=k).collect()]
        want = [(r["docid"], r["score"])
                for r in phrase_bm25(idx, words, k=k).collect()]
        if got != want:
            fails.append((tag, seed, "phrase", words, k))
    for t1, t2, w, k in prox:
        got = [(r["docid"], r["score"])
               for r in pidx.wand_proximity_topk(
                   [t1, t2], k=k, prox_w=w).collect()]
        want = pz._prox_want(idx, t1, t2, w, k)
        if got != want:
            fails.append((tag, seed, "prox", t1, t2, w, k))
    # fused positional batch
    k = 10
    queries, singles = {}, {}
    for i, (words, _) in enumerate(phrases):
        queries[f"ph{i}"] = (words, "phrase", None)
        singles[f"ph{i}"] = [
            (r["docid"], r["score"])
            for r in pidx.wand_phrase_topk(words, k=k).collect()]
    for i, (t1, t2, w, _) in enumerate(prox):
        queries[f"px{i}"] = ([t1, t2], "proximity", None, w)
        singles[f"px{i}"] = [
            (r["docid"], r["score"])
            for r in pidx.wand_proximity_topk(
                [t1, t2], k=k, prox_w=w).collect()]
    rowsb = pidx.wand_topk_batch(queries, k=k).collect()
    got_by_q = {}
    for r in rowsb:
        got_by_q.setdefault(r["query_id"], []).append(
            (r["docid"], r["score"]))
    for qid, want in singles.items():
        got = sorted(got_by_q.get(qid, []), key=lambda t: (-t[1], t[0]))
        if got != want:
            fails.append((tag, seed, "batch_pos", qid))
    idx.postings.unpersist()


t0 = time.time()
for seed in (11, 22, 33, 44, 55, 66, 77, 88):
    sweep_relational(seed, "rel")
    print(f"rel seed {seed} done ({time.time()-t0:.0f}s), "
          f"fails so far: {len(fails)}", flush=True)
for seed in (101, 202, 303, 404, 505, 606):
    sweep_positional(seed, "pos")
    print(f"pos seed {seed} done ({time.time()-t0:.0f}s), "
          f"fails so far: {len(fails)}", flush=True)

print("TOTAL FAILS:", len(fails))
for f in fails[:20]:
    print("FAIL:", f)
spark.stop()
sys.exit(1 if fails else 0)
