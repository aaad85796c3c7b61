"""Query latency vs corpus size (round-4 verdict task #2 — "the
missing 100× evidence"): every round's latency numbers came from the
5k-doc sf0.1 corpus; this job builds the SHIPPING configuration
(positional index × write-time bucketed store, JVM block-max prune)
at 5k docs AND at the 3M-doc scaling corpus, runs the standard WAND
query set plus the positional modes over both, and reports per-query
p50 alongside ``prune_stats`` bytes-skipped — the sublinear-latency /
rising-prune-fraction evidence.

Corpus: the deterministic ×mult replication the scaling bench uses,
PLUS a per-replica doclen perturbation (replica r appends r % 97
filler tokens) so scores spread instead of forming giant exact-tie
classes — replicas of one source doc otherwise share (tf, dl) and the
kth-score tie class would be ~mult docs wide, which both distorts τ
and balloons the tie-inclusive top-k truncation. Same vocabulary,
600× longer termlists — the dimension block-max pruning must absorb.

Usage: python jobs/latency_vs_corpus.py [--mult 600] [--cores 8]
One JSON line to stdout; BENCH/latency_vs_corpus.md narrates.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

QUERY_SET = [
    ("and2", ["join", "filter"], "and", None),
    ("and3", ["join", "filter", "window"], "and", None),
    ("or2", ["join", "filter"], "or", None),
    ("single", ["aggregate"], "and", None),
    ("not", ["join"], "and", ["window"]),
]


def _perturbed_replicate(docs, mult: int):
    from pyspark.sql import functions as F

    reps = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("rep")
    return docs.select("docid", "text", reps).select(
        (F.col("docid") * mult + F.col("rep")).alias("docid"),
        F.concat(
            F.col("text"),
            F.repeat(F.lit(" zzfill"), F.pmod("rep", F.lit(97)).cast("int")),
        ).alias("text"),
    )


def build_shipping_store(spark, docs, label: str):
    from open_source_search_engine_spark.operators.segments import (
        SegmentStore,
        build_segments,
        save_bucketed,
    )
    from open_source_search_engine_spark.operators.wand import PackedIndex

    n_docs = docs.count()
    root = tempfile.mkdtemp(prefix=f"latcorpus_{label}_")
    t0 = time.time()
    store = build_segments(
        spark, docs, SegmentStore(root),
        n_segments=max(1, n_docs // 2_000_000), n_buckets=16,
        with_positions=True,
    )
    t_build = time.time() - t0
    t0 = time.time()
    table = save_bucketed(
        spark, store, f"latcorpus_{label}",
        path=tempfile.mkdtemp(prefix=f"latcorpus_bt_{label}_"),
    )
    t_bucketed = time.time() - t0
    t0 = time.time()
    pidx = PackedIndex(spark, store, packed=spark.table(table))
    t_warm = time.time() - t0
    return pidx, {
        "n_docs": n_docs,
        "t_build_s": round(t_build, 1),
        "t_bucketed_write_s": round(t_bucketed, 1),
        "t_warm_s": round(t_warm, 1),
    }


def measure(pidx) -> dict:
    out: dict = {}
    lat = []
    for name, terms, mode, neg in QUERY_SET:
        runs = []
        for _ in range(4):  # first run warms the literal-filter codegen
            t0 = time.time()
            pidx.wand_topk(terms, k=10, mode=mode, neg_terms=neg).collect()
            runs.append(time.time() - t0)
        dt = statistics.median(runs[1:])
        out[f"q_{name}_ms"] = round(dt * 1000, 1)
        lat.append(dt)
    out["wand_p50_ms"] = round(statistics.median(lat) * 1000, 1)
    for name, fn in (
        ("phrase", lambda: pidx.wand_phrase_topk(["join", "filter"], k=10)),
        ("proximity",
         lambda: pidx.wand_proximity_topk(["join", "filter"], k=10)),
    ):
        runs = []
        for _ in range(4):
            t0 = time.time()
            fn().collect()
            runs.append(time.time() - t0)
        out[f"q_{name}_ms"] = round(statistics.median(runs[1:]) * 1000, 1)
    for name, terms, mode, neg in (QUERY_SET[0], QUERY_SET[3]):
        ps = pidx.prune_stats(terms, k=10, mode=mode, neg_terms=neg)
        out[f"prune_{name}"] = {
            "buckets_scored": ps["buckets_scored"],
            "buckets": ps["buckets"],
            "bytes_total": ps["bytes_total"],
            "bytes_scored": ps["bytes_scored"],
            "bytes_skipped_frac": round(
                1.0 - ps["bytes_scored"] / max(1, ps["bytes_total"]), 4
            ),
        }
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=600)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import functions as F

    from open_source_search_engine_spark.session import get_spark

    spark = get_spark(app="latency-vs-corpus", cores=args.cores)
    docs = (
        spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
        .withColumnRenamed("doc_id", "docid")
        .select("docid", "text")
    )
    out = {"sf_dir": args.sf_dir, "mult": args.mult, "cores": args.cores}
    small = docs.cache()
    pidx, meta = build_shipping_store(spark, small, "small")
    out["small"] = {**meta, **measure(pidx)}
    small.unpersist()

    big = (
        _perturbed_replicate(docs, args.mult)
        .repartition(4 * spark.sparkContext.defaultParallelism)
        .cache()
    )
    pidx, meta = build_shipping_store(spark, big, "big")
    out["big"] = {**meta, **measure(pidx)}
    out["docs_ratio"] = round(out["big"]["n_docs"] / out["small"]["n_docs"], 1)
    out["p50_ratio"] = round(
        out["big"]["wand_p50_ms"] / out["small"]["wand_p50_ms"], 2
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
