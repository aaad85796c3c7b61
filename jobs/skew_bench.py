"""Adversarial skew bench (round-4 verdict task #5).

The salted build is DESIGNED for zipf-skewed term frequencies
(SURVEY §4 O14: ``bucket = pmod(docid, n_buckets)`` splits every
head termlist across buckets, so no single pack group or scorer task
owns a whole stopword posting list) — but no measurement showed it.
This job constructs the adversarial fixture the verdict asks for — a
stopword planted in ~50% of all documents — runs the pack stage and
an AND query CONTAINING that stopword over the bucketed store, and
reports per-task wall-time spread from Spark's own task metrics
(REST API, ``spark.ui.enabled`` on for this job only):

- salted leg (n_buckets=16, the shipping shape): pass criterion is
  no straggler task > 2x the stage median in the pack and scorer
  stages;
- unsalted control (n_buckets=1 — "salting off", the layout a naive
  groupBy(termid) pack degrades to): shows the straggler the salt
  exists to prevent, proving the measurement can detect one.

Per-stage task times come from /api/v1/applications/{app}/stages
with ?details=true (per-task executorRunTime), attributed to build
vs query via job groups. The work stage per phase = the stage with
the largest summed task time in its group.

Usage: python jobs/skew_bench.py [--mult 40] [--cores 8]
One JSON line to stdout; BENCH/skew.md narrates.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time
import urllib.request


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return json.loads(r.read())


def _stage_tasks(base: str, app_id: str, group: str) -> list[dict]:
    """Per-stage task-time distributions for every COMPLETE stage of
    the jobs tagged with ``group``; sorted by summed task time desc."""
    jobs = _rest(base, f"/api/v1/applications/{app_id}/jobs")
    stage_ids = sorted(
        {
            s
            for j in jobs
            if j.get("jobGroup") == group
            for s in j["stageIds"]
        }
    )
    out = []
    for sid in stage_ids:
        try:
            stages = _rest(
                base,
                f"/api/v1/applications/{app_id}/stages/{sid}"
                f"?details=true&taskStatus=SUCCESS",
            )
        except Exception:
            continue  # skipped stage (no attempt ran)
        for st in stages:
            if st.get("status") != "COMPLETE" or not st.get("tasks"):
                continue
            ms = sorted(
                t["taskMetrics"]["executorRunTime"]
                for t in st["tasks"].values()
                if t.get("taskMetrics")
            )
            if not ms:
                continue
            med = statistics.median(ms)
            # "loaded" = tasks that actually received data. The cache
            # is hash-partitioned into shuffle_partitions slots but
            # holds only n_buckets groups, so some tasks get nothing
            # and finish in scheduler noise (<20 ms) — they're idle,
            # not evidence about skew (stage wall = the max task), and
            # counting them halves the median artificially.
            loaded = [m for m in ms if m >= 20] or ms
            medl = statistics.median(loaded)
            out.append(
                {
                    "stage_id": sid,
                    "name": st["name"].split("\n")[0][:80],
                    "num_tasks": len(ms),
                    "num_tasks_loaded": len(loaded),
                    "task_ms_min": ms[0],
                    "task_ms_p50": round(med, 1),
                    "task_ms_p50_loaded": round(medl, 1),
                    "task_ms_max": ms[-1],
                    "max_over_median": (
                        round(ms[-1] / med, 2) if med > 0 else None
                    ),
                    "max_over_median_loaded": (
                        round(ms[-1] / medl, 2) if medl > 0 else None
                    ),
                    "sum_task_ms": sum(ms),
                }
            )
    return sorted(out, key=lambda s: -s["sum_task_ms"])


def run_leg(spark, docs, n_buckets: int, label: str, base, app_id) -> dict:
    from open_source_search_engine_spark.operators.segments import (
        SegmentStore,
        build_segments,
    )
    from open_source_search_engine_spark.operators.wand import PackedIndex

    sc = spark.sparkContext
    root = tempfile.mkdtemp(prefix=f"skew_{label}_")
    sc.setJobGroup(f"pack_{label}", f"segment build n_buckets={n_buckets}")
    t0 = time.time()
    store = build_segments(
        spark, docs, SegmentStore(root), n_segments=1, n_buckets=n_buckets
    )
    t_build = time.time() - t0

    sc.setJobGroup(f"warm_{label}", "index warm (untimed)")
    pidx = PackedIndex(spark, store)
    terms = ["thecommon", "filter"]
    pidx.wand_topk(terms, k=10).collect()  # warm codegen, untimed

    sc.setJobGroup(f"query_{label}", "AND query containing the stopword")
    runs = []
    for _ in range(3):
        t0 = time.time()
        pidx.wand_topk(terms, k=10).collect()
        runs.append(time.time() - t0)
    sc.setJobGroup("idle", "")

    ps = pidx.prune_stats(terms, k=10)
    pack_stages = _stage_tasks(base, app_id, f"pack_{label}")
    query_stages = _stage_tasks(base, app_id, f"query_{label}")
    return {
        "n_buckets": n_buckets,
        "t_build_s": round(t_build, 1),
        "query_ms_runs": [round(r * 1000, 1) for r in runs],
        "query_ms_p50": round(statistics.median(runs) * 1000, 1),
        "prune": {
            "buckets_scored": ps["buckets_scored"],
            "buckets": ps["buckets"],
            "bytes_skipped_frac": (
                round(1.0 - ps["bytes_scored"] / ps["bytes_total"], 4)
                if ps["bytes_total"]
                else None
            ),
        },
        # the work stage (largest summed task time) + the next one,
        # with full per-task spread
        "pack_stages": pack_stages[:2],
        "scorer_stages": query_stages[:2],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=40)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import functions as F

    from open_source_search_engine_spark.session import get_spark

    spark = get_spark(
        app="skew-bench",
        cores=args.cores,
        shuffle_partitions=4 * args.cores,
        extra_conf={"spark.ui.enabled": "true"},
    )
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    docs = (
        spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
        .withColumnRenamed("doc_id", "docid")
        .select("docid", "text")
    )
    reps = F.explode(
        F.sequence(F.lit(0), F.lit(args.mult - 1))
    ).alias("rep")
    # plant the stopword in every even docid (~50% df — the zipf head
    # no real web corpus lacks); deterministic, same text otherwise
    skewed = (
        docs.select("docid", "text", reps)
        .select(
            (F.col("docid") * args.mult + F.col("rep")).alias("docid"),
            "text",
        )
        .withColumn(
            "text",
            F.when(
                F.col("docid") % 2 == 0,
                F.concat(F.col("text"), F.lit(" thecommon")),
            ).otherwise(F.col("text")),
        )
        .repartition(4 * spark.sparkContext.defaultParallelism)
        .cache()
    )
    n_docs = skewed.count()

    # untimed warm pass (bench.py rationale): daemon fork + codegen +
    # Arrow plumbing otherwise ride inside the first pack wave and
    # read as a fake straggler
    from bench import _warmup

    spark.sparkContext.setJobGroup("warmup", "untimed engine warm-up")
    _warmup(spark)

    out = {
        "sf_dir": args.sf_dir,
        "mult": args.mult,
        "cores": args.cores,
        "n_docs": n_docs,
        "stopword_df_frac": 0.5,
        "salted": run_leg(spark, skewed, 16, "salted", base, app_id),
        "unsalted_control": run_leg(
            spark, skewed, 1, "unsalted", base, app_id
        ),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
