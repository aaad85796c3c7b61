"""spark-submit entrypoint for the packed-index build (north rule:
"run via spark-submit --py-files on multi-executor clusters").

Usage (local sandbox stand-in for a cluster):

    python jobs/make_pyfiles_zip.py          # -> dist/spark_fulltext.zip
    spark-submit --master local[8] \
        --py-files dist/spark_fulltext.zip \
        jobs/build_index_job.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --doc-col doc_id --text-col text \
        --output /tmp/idx_store --segments 4 --buckets 16

On a real cluster only ``--master``/deploy-mode change: every stage is
partition-parallel (one shuffle to build, salted pack groups,
per-segment independence), the manifest makes a killed run resume at
the last committed segment, and the same zip ships to executors.

The script creates its own SparkSession from the ambient spark-submit
conf (it does NOT call the sandbox-tuned session factory — cluster
memory/shuffle sizing belongs to submit-time conf).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path of documents")
    ap.add_argument("--doc-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--html-col", default=None,
                    help="extract text from this binary html column first")
    ap.add_argument("--url-col", default=None,
                    help="derive 63-bit docids from this url column")
    ap.add_argument("--output", required=True, help="segment-store root")
    ap.add_argument("--segments", type=int, default=4)
    ap.add_argument("--buckets", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("spark-fulltext-build").getOrCreate()

    from open_source_search_engine_spark.operators.segments import (
        SegmentStore,
        build_segments,
    )

    docs = spark.read.parquet(args.input)
    doc_col = args.doc_col
    if args.html_col:
        from open_source_search_engine_spark.extraction import (
            with_extracted_text,
        )

        docs = with_extracted_text(docs, args.html_col, args.text_col)
    if args.url_col:
        from open_source_search_engine_spark.tokenizer import doc_id_from_url

        docs = docs.withColumn("docid", doc_id_from_url(args.url_col))
        doc_col = "docid"

    t0 = time.time()
    store = build_segments(
        spark,
        docs,
        SegmentStore(args.output),
        doc_col=doc_col,
        text_col=args.text_col,
        n_segments=args.segments,
        n_buckets=args.buckets,
    )
    n_docs, avgdl = store.globals_(spark)
    print(
        json.dumps(
            {
                "store": args.output,
                "n_docs": n_docs,
                "avgdl": round(avgdl, 2),
                "wall_sec": round(time.time() - t0, 1),
                "segments": sorted(store.committed_segments(spark)),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
