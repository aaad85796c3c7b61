"""The spark-submit --py-files path (north rule: the build runs via
spark-submit on a cluster): package zip + job script run in a real
spark-submit subprocess, and the store it writes is query-identical
to the in-process build."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from conftest import SF_SMOKE

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_build_job(spark, tmp_path):
    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "make_pyfiles_zip.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    assert zip_path.endswith(".zip") and os.path.exists(zip_path)

    out_store = str(tmp_path / "store")
    p = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "build_index_job.py"),
            "--input", os.path.join(SF_SMOKE, "documents.parquet"),
            "--output", out_store,
            "--segments", "2", "--buckets", "8",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
    info = json.loads(line)
    assert info["n_docs"] == 500
    assert info["segments"] == [0, 1]

    # the submitted build serves rank-identical top-k
    from open_source_search_engine_spark.operators.bm25 import bm25_topk
    from open_source_search_engine_spark.operators.index_build import (
        cached_index,
    )
    from open_source_search_engine_spark.operators.segments import SegmentStore
    from open_source_search_engine_spark.operators.wand import PackedIndex

    pidx = PackedIndex(spark, SegmentStore(out_store))
    got = [tuple(r) for r in pidx.wand_topk(["join"], k=10).collect()]
    idx = cached_index(spark, SF_SMOKE)
    want = [tuple(r) for r in bm25_topk(idx, ["join"], k=10).collect()]
    assert got == want
