"""Block-max WAND top-k over packed postings (SURVEY.md §4 O1/O2, §2 D4b).

Reference anchor: ``Posdb.cpp: PosdbTable::intersectLists10_r`` with
``getMaxPossibleScore()`` upper-bound pruning + ``TopTree`` bounded
top-k, upgraded to block-max WAND (Ding & Suel, SIGIR'11) per the
north rule.

Distributed shape
-----------------
Blocks are keyed by (termid, bucket) where bucket = pmod(docid, B) —
so *all query terms' postings for a docid range are co-located by the
bucket key*. WAND then runs in two driver-orchestrated passes:

1. **Seed pass** — score only the bucket with the highest upper bound
   ``ub(bucket) = Σ_t idf_t · blockmax_tfnorm_{t,bucket}`` exactly →
   threshold τ = k-th best score found.
2. **Pruned pass** — process only buckets with ub > τ (for AND mode,
   also only buckets containing *all* query terms). Every skipped
   bucket is provably unable to beat the current top-k: this is
   block-max pruning with block = bucket, exact by construction.

Inside a bucket the scorer is numpy-vectorized over the decoded blobs
(one `np.add.at` scatter per bucket — no per-posting Python). Local
top-k per bucket, global merge via ORDER BY LIMIT k
(TakeOrderedAndProject — the Msg3a merge shape).

Scale: at 10^12 docs with 64k buckets the seed pass reads a few blocks;
the metadata aggregate (one row per candidate bucket) is tiny; the
pruned pass reads only surviving buckets' blobs. Head queries prune
little (dense scores) but buckets bound memory (the reference's
docid-range splits, ``Msg39::m_numDocIdSplits``); tail queries prune
almost everything.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.varbyte import unpack_docids, unpack_ints
from .segments import SegmentStore

SCORE_SCHEMA = "docid long, score double"


def _make_bucket_scorer(
    idf_by_termid: dict[int, float],
    required: set[int],
    neg_termids: set[int],
    k: int,
):
    n_required = len(required)

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        docid_parts, score_parts, req_parts = [], [], []
        neg_docids = []
        for row in pdf.itertuples(index=False):
            docids = unpack_docids(row.docids).astype(np.int64)
            if row.termid in neg_termids:
                neg_docids.append(docids)
                continue
            tfs = unpack_ints(row.tfs).astype(np.float64)
            dls = unpack_ints(row.dls).astype(np.float64)
            tfnorm = (tfs * 2.2) / (tfs + 1.2 * (0.25 + 0.75 * dls * row.inv_avgdl))
            docid_parts.append(docids)
            score_parts.append(idf_by_termid[row.termid] * tfnorm)
            req_parts.append(
                np.full(docids.size, row.termid in required, dtype=np.int64)
            )
        if not docid_parts:
            return pd.DataFrame({"docid": [], "score": []}).astype(
                {"docid": np.int64, "score": np.float64}
            )
        all_docids = np.concatenate(docid_parts)
        all_scores = np.concatenate(score_parts)
        all_req = np.concatenate(req_parts)
        uniq, inv = np.unique(all_docids, return_inverse=True)
        scores = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(scores, inv, all_scores)
        if n_required:
            reqcnt = np.zeros(uniq.size, dtype=np.int64)
            np.add.at(reqcnt, inv, all_req)
            keep = reqcnt == n_required
            uniq, scores = uniq[keep], scores[keep]
        if neg_docids:
            bad = np.unique(np.concatenate(neg_docids))
            keep = ~np.isin(uniq, bad)
            uniq, scores = uniq[keep], scores[keep]
        if uniq.size > k:
            top = np.argpartition(-scores, k - 1)[:k]
            uniq, scores = uniq[top], scores[top]
        return pd.DataFrame({"docid": uniq, "score": scores})

    return score_bucket


class PackedIndex:
    """Query handle over a SegmentStore (or any packed DataFrame)."""

    def __init__(self, spark: SparkSession, store: SegmentStore):
        self.spark = spark
        self.store = store
        # cache both tables: every query prunes the SAME packed table
        # (by termid) and probes term_stats — without the cache each
        # query re-reads parquet (ref: RdbCache's termlist cache)
        self.packed = store.packed(spark).cache()
        self.term_stats = store.term_stats(spark).cache()
        self.n_docs, self.avgdl = store.globals_(spark)
        self._term_cache: dict[str, tuple] = {}

    def _term_rows(self, terms: list[str]) -> list:
        """term_stats rows for query terms, memoized across queries —
        the driver-side analogue of the reference's termFreq cache
        (Posdb::getTermFreq hits RdbMap counts, not the lists)."""
        missing = [t for t in terms if t not in self._term_cache]
        if missing:
            rows = (
                self.term_stats.filter(F.col("term").isin(missing))
                .select("termid", "term", "df")
                .collect()
            )
            for r in rows:
                self._term_cache[r["term"]] = r
            for t in missing:
                self._term_cache.setdefault(t, None)
        return [self._term_cache[t] for t in terms
                if self._term_cache[t] is not None]

    def wand_topk(
        self,
        terms: list[str],
        k: int = 10,
        mode: str = "and",
        neg_terms: list[str] | None = None,
        round_to: int | None = 4,
    ) -> DataFrame:
        terms = list(dict.fromkeys(terms))
        rows = self._term_rows(terms)
        found = {r["term"]: r for r in rows}
        if mode == "and" and len(found) < len(terms):
            return self.spark.createDataFrame([], SCORE_SCHEMA)
        if not found:
            return self.spark.createDataFrame([], SCORE_SCHEMA)

        n = float(self.n_docs)
        idf = {
            int(r["termid"]): float(
                np.log((n - r["df"] + 0.5) / (r["df"] + 0.5) + 1.0)
            )
            for r in rows
        }
        termids = list(idf)
        neg_rows = self._term_rows(list(neg_terms)) if neg_terms else []
        neg_ids = {int(r["termid"]) for r in neg_rows}
        required = set(termids) if mode == "and" else set()

        blocks = self.packed.filter(
            F.col("termid").isin(termids + list(neg_ids))
        ).withColumn("inv_avgdl", F.lit(1.0 / self.avgdl))

        # --- bucket metadata: upper bounds (blob-free, tiny) ----------
        idf_map = F.create_map(
            *[x for t, v in idf.items() for x in (F.lit(t), F.lit(v))]
        )
        pos_blocks = blocks.filter(F.col("termid").isin(termids))
        meta = (
            pos_blocks.groupBy("bucket")
            .agg(
                F.sum(
                    idf_map[F.col("termid")] * F.col("blockmax_tfnorm")
                ).alias("ub"),
                F.countDistinct("termid").alias("nterms"),
            )
        )
        if mode == "and":
            meta = meta.filter(F.col("nterms") == len(termids))
        meta_rows = sorted(
            meta.collect(), key=lambda r: -float(r["ub"])
        )
        if not meta_rows:
            return self.spark.createDataFrame([], SCORE_SCHEMA)

        scorer = _make_bucket_scorer(idf, required, neg_ids, k)

        def score_buckets(bucket_ids: list[int]) -> DataFrame:
            return (
                blocks.filter(F.col("bucket").isin(bucket_ids))
                .groupBy("bucket")
                .applyInPandas(scorer, schema=SCORE_SCHEMA)
            )

        # Pass 1: seed threshold from the best-upper-bound bucket.
        seed_bucket = int(meta_rows[0]["bucket"])
        seed = score_buckets([seed_bucket]).orderBy(
            F.desc("score"), F.asc("docid")
        ).take(k)
        tau = float(seed[k - 1]["score"]) if len(seed) == k else float("-inf")

        # Pass 2: only buckets whose upper bound can beat τ.
        survivors = [
            int(r["bucket"])
            for r in meta_rows[1:]
            if float(r["ub"]) > tau
        ]
        result = score_buckets(survivors).unionAll(
            self.spark.createDataFrame(seed, SCORE_SCHEMA)
        ) if survivors else self.spark.createDataFrame(seed, SCORE_SCHEMA)

        score = F.round(F.col("score"), round_to) if round_to else F.col("score")
        return (
            result.select("docid", score.alias("score"))
            .orderBy(F.desc("score"), F.asc("docid"))
            .limit(k)
        )
