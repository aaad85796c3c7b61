"""Query latency vs corpus size (round-4 verdict task #2 — "the
missing 100× evidence"): every round's latency numbers came from the
5k-doc sf0.1 corpus; this job builds the SHIPPING configuration
(positional index × write-time bucketed store, JVM block-max prune)
at 5k docs AND at the 3M-doc scaling corpus, runs the standard WAND
query set plus the positional modes over both, and reports per-query
p50 alongside ``prune_stats`` bytes-skipped — the sublinear-latency /
rising-prune-fraction evidence.

Corpus: deterministic ×mult replication with CRAWL-BATCH quality
locality — replica (batch) r of the corpus gets docids ``r<<32 | d``
(batch-major: contiguous docid ranges = ingest batches, exactly how
a crawler assigns ids) and a per-batch-tier doclen pad
(``30·(r//75)²`` filler tokens, 8 tiers): document length/quality
varies BY CRAWL BATCH, the locality every real crawl has (a batch
from a template-heavy or spam site is uniformly long/low-score).
This is the structure sub-block block-max pruning exists to exploit:
within a (termid, bucket) termlist, docid-sorted fixed-size blocks
fall inside single tiers, their (max tf, min dl) bounds separate,
and the τ cut skips the low-score tiers' blocks without decoding —
a skip fraction that GROWS with corpus size (more blocks per
termlist; τ rises with n). The flat-perturbation variant (replica
pad ``r % 97``, doc-major ids — NO docid locality, score ties
broken but ranges homogeneous) is the adversarial worst case where
no block-granular index can prune; run it with ``--flat`` for the
comparison number.

Bucket fan-out scales with the corpus (``--buckets-small`` /
``--buckets-big``, default 16 → 128): the docid-salt bucket is BOTH
the scorer's unit of parallelism AND the block-max prune granule
(SURVEY §4 O14 — it tracks cluster width, exactly like reference
shards). Pinning 16 buckets under 600× more docs would measure a
deliberately under-provisioned layout no 100 TB deployment would
run; at 128 buckets each bucket still holds 75× more docs than a
small-corpus bucket, so the per-bucket termlists grow hard either
way.

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
    # bench.py continuity: "aggregate" is absent from the sf0.1
    # vocabulary, so q_single times the provably-empty path (τ has
    # nothing to prune); "single2" adds a REAL single-term datapoint
    ("single", ["aggregate"], "and", None),
    ("single2", ["window"], "and", None),
    ("not", ["join"], "and", ["window"]),
]


def _batch_replicate(docs, mult: int):
    """Batch-major ids + tiered per-batch doclen (see module doc)."""
    from pyspark.sql import functions as F

    reps = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("rep")
    tier = (F.col("rep") / F.lit(75)).cast("int")
    return docs.select("docid", "text", reps).select(
        (
            F.shiftleft(F.col("rep").cast("long"), 32)
            + F.col("docid")
        ).alias("docid"),
        F.concat(
            F.col("text"),
            F.repeat(F.lit(" zzfill"), (30 * tier * tier).cast("int")),
        ).alias("text"),
    )


def _flat_replicate(docs, mult: int):
    """Doc-major ids, r % 97 pad — score spread without any docid
    locality (the no-structure worst case)."""
    from pyspark.sql import functions as F

    reps = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("rep")
    return docs.select("docid", "text", reps).select(
        (F.col("docid") * mult + F.col("rep")).alias("docid"),
        F.concat(
            F.col("text"),
            F.repeat(F.lit(" zzfill"), F.pmod("rep", F.lit(97)).cast("int")),
        ).alias("text"),
    )


def build_shipping_store(spark, docs, label: str, n_buckets: int = 16):
    from bench import _title_field_postings
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
        n_segments=max(1, n_docs // 2_000_000), n_buckets=n_buckets,
        with_positions=True,
        field_postings=_title_field_postings(docs),
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
        "n_buckets": n_buckets,
        "t_build_s": round(t_build, 1),
        "build_docs_per_sec": round(n_docs / t_build, 1),
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
    tot = scr = 0
    for name, terms, mode, neg in QUERY_SET:
        ps = pidx.prune_stats(terms, k=10, mode=mode, neg_terms=neg)
        tot += ps["bytes_total_blocks"]
        scr += ps["bytes_scored_blocks"]
        out[f"prune_{name}"] = {
            "buckets_scored": ps["buckets_scored"],
            "buckets": ps["buckets"],
            "blocks_scored": ps["blocks_scored"],
            "blocks": ps["blocks"],
            "bytes_total": ps["bytes_total_blocks"],
            "bytes_scored": ps["bytes_scored_blocks"],
            "bytes_skipped_frac": (
                round(
                    1.0
                    - ps["bytes_scored_blocks"] / ps["bytes_total_blocks"],
                    4,
                )
                if ps["bytes_total_blocks"]
                else None  # term absent from corpus: nothing to prune
            ),
        }
    out["bytes_skipped_frac_all"] = round(1.0 - scr / max(1, tot), 4)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=600)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--buckets-small", type=int, default=16)
    ap.add_argument("--buckets-big", type=int, default=128)
    ap.add_argument(
        "--flat", action="store_true",
        help="no-locality worst-case corpus instead of batch-tiered",
    )
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
    out = {
        "sf_dir": args.sf_dir,
        "mult": args.mult,
        "cores": args.cores,
        "corpus": "flat_no_locality" if args.flat else "batch_tiered",
    }
    small = docs.cache()
    pidx, meta = build_shipping_store(
        spark, small, "small", n_buckets=args.buckets_small
    )
    out["small"] = {**meta, **measure(pidx)}
    small.unpersist()

    rep = _flat_replicate if args.flat else _batch_replicate
    big = (
        rep(docs, args.mult)
        .repartition(4 * spark.sparkContext.defaultParallelism)
        .cache()
    )
    pidx, meta = build_shipping_store(
        spark, big, "big", n_buckets=args.buckets_big
    )
    out["big"] = {**meta, **measure(pidx)}
    out["docs_ratio"] = round(out["big"]["n_docs"] / out["small"]["n_docs"], 1)
    out["p50_ratio"] = round(
        out["big"]["wand_p50_ms"] / out["small"]["wand_p50_ms"], 2
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
