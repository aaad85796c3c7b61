"""Benchmark harness (driver contract).

Default mode: runs the headline index-build + BM25 query benchmarks at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total benchmark wall seconds; the queries dict carries the
per-query seconds plus derived throughput numbers
(``build_docs_per_sec``, ``bm25_p50_ms``) the judge compares against
BASELINE.md.

Scaling mode (north rule: throughput scaling efficiency >= 0.8 between
N and 4N parallelism)::

    python bench.py --scaling          # runs build at local[8] and local[32]
                                       # in fresh JVMs, writes BENCH/BASELINE.md

Child mode (used by --scaling; fresh process per parallelism level)::

    python bench.py --cores 8 --build-only
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _docs(spark, sf_dir):
    return (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .withColumnRenamed("doc_id", "docid")
    )


def bench_build(spark, sf_dir: str) -> dict:
    """Index-build throughput: exploded index + packed segments,
    materialized end-to-end (count / parquet write forces the job)."""
    from open_source_search_engine_spark.operators.index_build import build_index
    from open_source_search_engine_spark.operators.segments import (
        SegmentStore,
        build_segments,
    )

    docs = _docs(spark, sf_dir).cache()
    n_docs = docs.count()  # cache + count so build timing excludes read

    t0 = time.time()
    idx = build_index(docs, cache=False)
    n_postings = idx.postings.count()
    t_exploded = time.time() - t0

    t0 = time.time()
    root = tempfile.mkdtemp(prefix="bench_packed_")
    store = build_segments(
        spark, docs, SegmentStore(root), n_segments=2, n_buckets=8
    )
    t_packed = time.time() - t0
    docs.unpersist()
    return {
        "n_docs": n_docs,
        "n_postings": n_postings,
        "t_build_exploded": t_exploded,
        "t_build_packed": t_packed,
        "build_docs_per_sec": n_docs / t_packed if t_packed else 0.0,
        "_store_root": root,
    }


# Query mix: head (frequent terms), tail, AND/OR/NOT — the reference
# query-set shape (SURVEY.md §5).
QUERY_SET = [
    ("and2", ["join", "filter"], "and", None),
    ("and3", ["join", "filter", "window"], "and", None),
    ("or2", ["join", "filter"], "or", None),
    ("single", ["aggregate"], "and", None),
    ("not", ["join"], "and", ["window"]),
]


def bench_queries(spark, sf_dir: str, store_root: str) -> dict:
    from open_source_search_engine_spark.operators.bm25 import bm25_topk
    from open_source_search_engine_spark.operators.index_build import cached_index
    from open_source_search_engine_spark.operators.segments import SegmentStore
    from open_source_search_engine_spark.operators.wand import PackedIndex

    idx = cached_index(spark, sf_dir)
    idx.postings.count()  # warm the cache before timing queries
    pidx = PackedIndex(spark, SegmentStore(store_root))

    out: dict[str, float] = {}
    rel_lat, wand_lat = [], []
    for name, terms, mode, neg in QUERY_SET:
        t0 = time.time()
        bm25_topk(idx, terms, k=10, mode=mode, neg_terms=neg).collect()
        dt = time.time() - t0
        out[f"q_bm25_{name}"] = round(dt, 4)
        rel_lat.append(dt)

        t0 = time.time()
        pidx.wand_topk(terms, k=10, mode=mode, neg_terms=neg).collect()
        dt = time.time() - t0
        out[f"q_wand_{name}"] = round(dt, 4)
        wand_lat.append(dt)

    out["bm25_p50_ms"] = round(statistics.median(rel_lat) * 1000, 1)
    out["wand_p50_ms"] = round(statistics.median(wand_lat) * 1000, 1)
    return out


def run_bench(cores: int, sf_dir: str, build_only: bool = False) -> dict:
    from open_source_search_engine_spark.session import get_spark

    spark = get_spark("bench", cores=cores)
    t_all = time.time()
    build = bench_build(spark, sf_dir)
    store_root = build.pop("_store_root")
    queries = {} if build_only else bench_queries(spark, sf_dir, store_root)
    total = time.time() - t_all

    q = {k: round(v, 4) if isinstance(v, float) else v for k, v in build.items()}
    q.update(queries)
    return {
        "metric": "fulltext index build + BM25 topk (packed/WAND) wall time",
        "value": round(total, 2),
        "unit": "sec",
        "queries": q,
        "sf": _sf_of(sf_dir),
        "cores": cores,
    }


def run_scaling(sf_dir: str, lo: int = 8, hi: int = 32) -> None:
    """North-rule evidence: same build job at local[lo] and local[hi]
    (fresh JVM each), throughput at both + scaling efficiency.

    Fixed-work scaling: efficiency = (rate_hi / rate_lo) / (hi / lo).
    """
    results = {}
    for cores in (lo, hi):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cores", str(cores),
             "--build-only"],
            capture_output=True, text=True, env=env, timeout=1800,
        )
        line = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")][-1]
        results[cores] = json.loads(line)

    r_lo = results[lo]["queries"]["build_docs_per_sec"]
    r_hi = results[hi]["queries"]["build_docs_per_sec"]
    eff = (r_hi / r_lo) / (hi / lo)
    report = {
        "sf": _sf_of(sf_dir),
        "cores_lo": lo,
        "cores_hi": hi,
        "docs_per_sec_lo": round(r_lo, 2),
        "docs_per_sec_hi": round(r_hi, 2),
        "scaling_efficiency": round(eff, 3),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


def main() -> None:
    args = sys.argv[1:]
    if "--scaling" in args:
        run_scaling(SF_DIR)
        return
    cores = CPUS
    if "--cores" in args:
        cores = int(args[args.index("--cores") + 1])
    out = run_bench(cores, SF_DIR, build_only="--build-only" in args)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
