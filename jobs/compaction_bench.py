"""Read-amplification measurement for the auto-compaction policy
(round-4 verdict task #1 "Done" criterion: a BENCH/ note measuring
files touched per query before/after compaction).

Drives the SAME ingest twice — N micro-batches of the sf0.01 corpus
through ``start_incremental_index`` — once with the policy off
(round-4 behavior: one segment per epoch forever) and once with
``min_files_to_merge`` armed, then reports, for each store:

- live segment dirs + parquet files a query scan touches
  (``packed().inputFiles()`` — the literal file fan-out)
- packed blocks per (termid, bucket) termlist (block fragmentation:
  more, smaller blocks = looser block maxima = weaker WAND pruning)
- warm per-query WAND p50 over the standard query set

Usage: python jobs/compaction_bench.py [--batches 24] [--min-merge 8]
Writes JSON to stdout; BENCH/compaction.md narrates the numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time


def ingest(spark, docs, root, ck, n_batches, min_merge):
    from pyspark.sql import functions as F

    from open_source_search_engine_spark.operators.segments import (
        SegmentStore,
        finalize_term_stats,
    )
    from open_source_search_engine_spark.streaming.incremental import (
        start_incremental_index,
    )

    in_dir = os.path.join(root, "incoming")
    os.makedirs(in_dir)
    for i in range(n_batches):
        docs.filter(F.col("docid") % n_batches == i).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
    store = SegmentStore(os.path.join(root, "store"))
    t0 = time.time()
    q = start_incremental_index(
        spark,
        in_dir,
        store,
        ck,
        min_files_to_merge=min_merge,
        max_files_per_trigger=1,
    )
    q.awaitTermination(1800)
    wall = time.time() - t0
    finalize_term_stats(spark, store)
    return store, wall


def measure(spark, store, queries):
    from pyspark.sql import functions as F

    from open_source_search_engine_spark.operators.wand import PackedIndex

    packed = store.packed(spark)
    n_files = len(packed.inputFiles())
    live = (
        store.manifest_current(spark)
        .filter(F.col("status") == "committed")
        .count()
    )
    frag = packed.groupBy("termid", "bucket").count()
    blocks = frag.agg(
        F.avg("count").alias("mean"), F.max("count").alias("max")
    ).first()
    pidx = PackedIndex(spark, store)
    lat = {}
    for name, terms in queries:
        pidx.wand_topk(terms, k=10).collect()  # warm
        runs = []
        for _ in range(3):
            t0 = time.time()
            pidx.wand_topk(terms, k=10).collect()
            runs.append(time.time() - t0)
        lat[name] = round(statistics.median(runs) * 1000, 1)
    return {
        "live_segments": live,
        "files_touched_per_query": n_files,
        "blocks_per_termlist_mean": round(float(blocks["mean"]), 2),
        "blocks_per_termlist_max": int(blocks["max"]),
        "wand_ms": lat,
        "wand_p50_ms": round(statistics.median(lat.values()), 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--min-merge", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from open_source_search_engine_spark.session import get_spark

    spark = get_spark(app="compaction-bench", cores=args.cores)
    docs = (
        spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
        .withColumnRenamed("doc_id", "docid")
        .select("docid", "text")
    )
    queries = [
        ("and2", ["join", "filter"]),
        ("and3", ["query", "index", "data"]),
        ("single", ["database"]),
    ]
    out = {
        "sf_dir": args.sf_dir,
        "n_docs": docs.count(),
        "batches": args.batches,
        "min_files_to_merge": args.min_merge,
    }
    work = tempfile.mkdtemp(prefix="compact_bench_")
    try:
        for label, mm in (("no_policy", None), ("policy", args.min_merge)):
            root = os.path.join(work, label)
            os.makedirs(root)
            store, wall = ingest(
                spark, docs, root, os.path.join(root, "ck"),
                args.batches, mm,
            )
            out[label] = measure(spark, store, queries)
            out[label]["ingest_wall_s"] = round(wall, 1)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
