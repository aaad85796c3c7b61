"""Block-max WAND top-k over packed postings (SURVEY.md §4 O1/O2, §2 D4b).

Reference anchor: ``Posdb.cpp: PosdbTable::intersectLists10_r`` with
``getMaxPossibleScore()`` upper-bound pruning + ``TopTree`` bounded
top-k, upgraded to block-max WAND (Ding & Suel, SIGIR'11) per the
north rule.

Distributed shape
-----------------
Blocks are keyed by (termid, bucket) where bucket = pmod(docid, B) —
so *all query terms' postings for a docid range are co-located by the
bucket key*. WAND is ONE DataFrame plan (a single action, no driver
round-trips):

1. **Seed branch** — a sampled bucket is scored exactly driver-side;
   τ = its k-th best score. ub(bucket) = Σ_t idf_t ·
   tfnorm(blockmax_tf, blockmin_dl) with the exact corpus avgdl.
2. **Pruned branch** — buckets with ub ≥ τ' (τ in the rounded-score
   domain minus one grid ulp, so round-equal ties survive; for AND
   mode, only buckets containing *all* query terms) are selected via
   a broadcast semi-join of the tiny metadata aggregate — never a
   driver-collected bucket list. Every skipped bucket is provably
   unable to place a doc in the top-k: block-max pruning with
   block = bucket, exact by construction.

Inside a bucket the scorer is numpy-vectorized over the decoded blobs
(one `np.add.at` scatter per bucket — no per-posting Python). Local
top-k per bucket, global merge via ORDER BY LIMIT k
(TakeOrderedAndProject — the Msg3a merge shape).

Scale: at 10^12 docs with 64k buckets the seed branch reads a few
blocks; the metadata aggregate (one row per candidate bucket) stays
distributed and is broadcast (64k rows ≈ 1 MB), never collect()ed;
the pruned branch reads only surviving buckets' blobs. Head queries
prune little (dense scores) but buckets bound memory (the reference's
docid-range splits, ``Msg39::m_numDocIdSplits``); tail queries prune
almost everything.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.varbyte import unpack_docids, unpack_ints, unpack_positions
from .index_build import B, K1
from .segments import MAX_DENSITY_RANK, MAX_DIVERSITY_RANK, SegmentStore

SCORE_SCHEMA = "docid long, score double"

# BM25 constants shared with the relational path (index_build.K1/B) —
# precomputed once so the block-max upper bound and the scorer can
# never silently diverge from bm25_topk if K1/B change (an invalid
# upper bound would DROP true top-k docs, not just mis-score them).
_K1P1 = K1 + 1.0
_K1_1MB = K1 * (1.0 - B)
_K1B = K1 * B

# one grid ulp of the 4-decimal score rounding used by every top-k
# path (round_to=4); shared by all three bucket scorers so the tie
# rule cannot drift between them
_TIE_GRID_EPS = 1e-4

# Columns each bucket-scorer kind actually reads. FlatMapGroupsInPandas
# is OPAQUE to Catalyst column pruning — without an explicit select,
# every packed column of the store (on a positional store that means
# the positions/dens/spam/divs blobs, the LARGEST columns) is read off
# parquet and Arrow-transferred into Python for a plain-BM25 query
# that never touches them. The projection is applied AFTER the JVM
# prune so the pruned plan keeps its helper columns until filtered.
_SCORER_BASE_COLS = [
    "bucket", "termid", "docids", "tfs", "dls",
    "blockmax_tf", "blockmin_dl", "inv_avgdl",
]
_SCORER_EXTRA_COLS = {
    "density": ["dens", "spam"],
    "diversity": ["divs"],
    "phrase": ["positions"],
    "proximity": ["positions"],
}


def _project_scorer_cols(blocks: DataFrame, kind: str | None = None):
    """Project ``blocks`` down to the columns the ``kind`` scorer
    reads (plain BM25 when kind is None). On a disk-backed store this
    prunes the parquet ReadSchema — a pruned stream's bytes never
    leave disk; on the cached store it cuts the Arrow transfer."""
    have = set(blocks.columns)
    cols = _SCORER_BASE_COLS + _SCORER_EXTRA_COLS.get(kind, [])
    return blocks.select(*[c for c in cols if c in have])


def _scatter_scores(docid_parts: list, score_parts: list):
    """Concatenate per-block (docids, partial-score) arrays and
    scatter-add into (uniq docids, inverse index, summed scores) —
    the shared accumulation step of all three bucket scorers."""
    all_docids = np.concatenate(docid_parts)
    uniq, inv = np.unique(all_docids, return_inverse=True)
    scores = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(scores, inv, np.concatenate(score_parts))
    return uniq, inv, scores


def _topk_truncate(uniq: np.ndarray, scores: np.ndarray, k: int):
    """Tie-INCLUSIVE per-bucket top-k keep: retain everything within
    one rounding-grid ulp of the kth score. A raw argpartition could
    drop a doc that ties at the 4-decimal grid with a smaller docid,
    which the global orderBy(round(score), docid) tie-break must see.
    Shared by all three scorers so truncation semantics can't drift."""
    if uniq.size <= k:
        return uniq, scores
    kth = np.partition(scores, uniq.size - k)[uniq.size - k]
    keep = scores >= round(float(kth), 4) - _TIE_GRID_EPS
    return uniq[keep], scores[keep]


def _tfnorm_ub_col():
    """JVM expression for a block's tfnorm upper bound from its
    scalar extrema — tfnorm is increasing in tf and decreasing in dl,
    so the (blockmax_tf, blockmin_dl) corner bounds every posting in
    the block. ONE definition shared by the per-(bucket, termid)
    aggregate, the row-level (sub-block) prune filter, and
    ``prune_stats`` — drift between them would make the query path
    prune differently from what the diagnostic reports."""
    bm_tf = F.col("blockmax_tf").cast("double")
    bm_dl = F.col("blockmin_dl").cast("double")
    return (bm_tf * _K1P1) / (
        bm_tf + _K1_1MB + _K1B * bm_dl * F.col("inv_avgdl")
    )


def _idf_map_expr(idf: dict):
    return F.create_map(
        *[x for t, v in idf.items() for x in (F.lit(t), F.lit(v))]
    )


def _bucket_term_bounds(blocks, idf: dict, with_bytes: bool = False):
    """Per-(bucket, termid) WAND bound contribution: the max block
    ``idf · tfnorm_ub`` — the first aggregate both the per-bucket
    bound (``_bucket_upper_bounds``) and the multi-query batch prune
    (``wand_topk_batch``) build on. Returns (bucket, termid,
    t_ub[, nb])."""
    idf_map = _idf_map_expr(idf)
    tfnorm_ub = _tfnorm_ub_col()
    first = [F.max(idf_map[F.col("termid")] * tfnorm_ub).alias("t_ub")]
    if with_bytes:
        nbytes = (
            F.octet_length("docids")
            + F.octet_length("tfs")
            + F.octet_length("dls")
        )
        first.append(F.sum(nbytes).alias("nb"))
    return (
        blocks.filter(F.col("termid").isin(list(idf)))
        .groupBy("bucket", "termid")
        .agg(*first)
    )


def _bucket_upper_bounds(blocks, idf: dict, with_bytes: bool = False):
    """Per-bucket WAND upper bound (JVM-side): for each (bucket,
    termid) the max block ``idf · tfnorm_ub``, summed over terms —
    THE bound both the disk-store prune semi-join and ``prune_stats``
    apply. One definition on purpose: a K1/B or bound change applied
    to one copy but not the other would make the diagnostic report
    pruning the query path doesn't do (or worse, vice versa).
    ``with_bytes`` additionally carries the blob byte sums the
    diagnostic reports. Returns (bucket, ub, nterms[, nb])."""
    second = [
        F.sum("t_ub").alias("ub"),
        F.countDistinct("termid").alias("nterms"),
    ]
    if with_bytes:
        second.append(F.sum("nb").alias("nb"))
    return (
        _bucket_term_bounds(blocks, idf, with_bytes)
        .groupBy("bucket")
        .agg(*second)
    )


def _block_survivors(blocks, idf: dict, cut: float):
    """Row-level (sub-block) Ding & Suel survivor set, pure JVM.

    A block row of term t bounds every doc in its docid range by
    ``idf_t · tfnorm_ub(row) + Σ_{t'≠t} tmax(bucket, t')``; below the
    τ seed cut, no doc in that range can reach the top-k (its total
    score is provably < cut, and cut is the k-th score of REAL seed
    docs, so ≥ k docs beat it — see _make_bucket_scorer for the same
    argument at bucket granularity). Negative-term rows never prune:
    their docid sets must stay complete for the anti-filter.

    This is the REFERENCE implementation (in-plan aggregates over the
    scalar blockmax columns) used by the ``prune_stats`` diagnostic.
    The query path (``_prune_buckets_jvm``) evaluates the SAME bound
    formula from the driver bound cache as pushed-down literals — both
    sides evaluate ``_tfnorm_ub_col`` per (termid, bucket), so the
    per-term bounds are bit-identical; only the per-bucket Σ can
    differ by float summation order (last-ulp), and the survivor-set
    parity is pinned in tests/test_segments_wand.py.

    It is also the query path's size-capped fallback
    (``_prune_buckets_joined``): past ``_LITERAL_PRUNE_MAX_CELLS``
    the in-plan aggregates here cost two sub-scans per query, but in
    that regime (huge bucket fan-out × many terms) they are
    negligible against the blob scan they prune, and they never move
    the bound set through the driver.

    Returns ``blocks`` + helper columns ``bucket_ub`` / ``nterms`` /
    ``row_keep``; callers filter on bucket survival + row_keep and
    drop the helpers — including the AND-mode constraint (``nterms ==
    |required|``), which this function deliberately does NOT apply:
    ``prune_stats`` needs the unfiltered rows to count what the filter
    would drop.
    """
    tb = _bucket_term_bounds(blocks, idf)
    agg = tb.groupBy("bucket").agg(
        F.sum("t_ub").alias("bucket_ub"),
        F.countDistinct("termid").alias("nterms"),
    )
    row_ub = _idf_map_expr(idf)[F.col("termid")] * _tfnorm_ub_col()
    return (
        blocks.join(F.broadcast(tb), ["bucket", "termid"], "left")
        .join(F.broadcast(agg), "bucket", "left")
        .withColumn(
            "row_keep",
            F.col("t_ub").isNull()  # neg/field rows: always decode
            | (
                row_ub + (F.col("bucket_ub") - F.col("t_ub"))
                >= F.lit(cut)
            ),
        )
        .drop("t_ub")
    )


def _make_bucket_scorer(
    idf_by_termid: dict[int, float],
    required: set[int],
    neg_termids: set[int],
    k: int,
    cut: float = float("-inf"),
):
    n_required = len(required)

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"docid": [], "score": []}).astype(
            {"docid": np.int64, "score": np.float64}
        )
        # Block-max pruning BEFORE any blob decode: the bucket's upper
        # bound is Σ_t idf_t · tfnorm(blockmax_tf, blockmin_dl) over
        # its per-term blocks — a handful of scalar rows. tfnorm is
        # increasing in tf and decreasing in dl, so the (max tf,
        # min dl) corner bounds every doc in the block, with the EXACT
        # avgdl (inv_avgdl rides on the rows) — no build-time global.
        # Buckets that cannot place a doc in the top-k (ub < τ′)
        # return without touching a blob, and AND-mode buckets missing
        # a required term likewise.
        tids = pdf["termid"].to_numpy()
        if n_required and not required.issubset(set(tids.tolist())):
            return empty
        pos_mask = ~np.isin(tids, list(neg_termids)) if neg_termids else (
            np.ones(len(tids), dtype=bool)
        )
        row_keep = None
        if cut > float("-inf"):
            bm_tf = pdf["blockmax_tf"].to_numpy(np.float64)
            bm_dl = pdf["blockmin_dl"].to_numpy(np.float64)
            inv_avgdl = float(pdf["inv_avgdl"].iloc[0])
            bm = (bm_tf * _K1P1) / (
                bm_tf + _K1_1MB + _K1B * bm_dl * inv_avgdl
            )
            idfs = np.array([idf_by_termid.get(int(t), 0.0) for t in tids])
            row_ub = idfs * bm
            per_term = {}
            for t, v in zip(tids[pos_mask], row_ub[pos_mask]):
                per_term[t] = max(per_term.get(t, 0.0), v)
            total_ub = sum(per_term.values())
            if total_ub < cut:
                return empty
            # Sub-block skip (Ding & Suel block-max granularity): a
            # block of term t bounds every doc in its docid range by
            # row_ub + Σ_{t'≠t} tmax(t'); below the τ seed no doc in
            # it can reach the top-k (cut is the k-th score of REAL
            # seed docs), so its blobs are never varbyte-decoded.
            # Negative-term rows always decode — their docid sets
            # must stay complete for the anti-filter.
            tmax = np.array(
                [per_term.get(int(t), 0.0) for t in tids]
            )
            row_keep = (row_ub + (total_ub - tmax) >= cut) | ~pos_mask

        docid_parts, score_parts, req_parts = [], [], []
        neg_docids = []
        for i, row in enumerate(pdf.itertuples(index=False)):
            if row_keep is not None and not row_keep[i]:
                continue
            docids = unpack_docids(row.docids).astype(np.int64)
            if row.termid in neg_termids:
                neg_docids.append(docids)
                continue
            tfs = unpack_ints(row.tfs).astype(np.float64)
            dls = unpack_ints(row.dls).astype(np.float64)
            tfnorm = (tfs * _K1P1) / (
                tfs + _K1_1MB + _K1B * dls * row.inv_avgdl
            )
            docid_parts.append(docids)
            score_parts.append(idf_by_termid[row.termid] * tfnorm)
            req_parts.append(
                np.full(docids.size, row.termid in required, dtype=np.int64)
            )
        if not docid_parts:
            return empty
        all_req = np.concatenate(req_parts)
        uniq, inv, scores = _scatter_scores(docid_parts, score_parts)
        if n_required:
            reqcnt = np.zeros(uniq.size, dtype=np.int64)
            np.add.at(reqcnt, inv, all_req)
            keep = reqcnt == n_required
            uniq, scores = uniq[keep], scores[keep]
        if neg_docids:
            bad = np.unique(np.concatenate(neg_docids))
            keep = ~np.isin(uniq, bad)
            uniq, scores = uniq[keep], scores[keep]
        uniq, scores = _topk_truncate(uniq, scores, k)
        return pd.DataFrame({"docid": uniq, "score": scores})

    return score_bucket


BATCH_SCORE_SCHEMA = "query_id string, docid long, score double"

# Ceiling on the batch-prune bound matrix (buckets × batch terms
# cells) the driver will collect and fold. ~8 MB of float64 per
# matrix copy at the cap; past it wand_topk_batch skips the
# plan-level prune instead of OOMing the driver — with that many
# live (bucket, term) pairs the min-over-queries threshold decays
# toward keep-everything and the broadcast would dominate anyway.
_BATCH_PRUNE_MAX_CELLS = 1_000_000

# |terms| × n_buckets above which the single-query prune stops
# embedding bounds as literals (a 64k-bucket store would put ~10^5
# F.lit calls and a multi-MB filter expression in the plan — minutes
# of driver-side construction and codegen fallback) and uses the
# broadcast-join form instead, which handles any size.
_LITERAL_PRUNE_MAX_CELLS = 8_192

# cell budget for pre-warming the bound cache in _warm_popular: at
# 16-128 sandbox buckets this warms all 256 popular terms; at a 64k-
# bucket production layout it warms only the very head, keeping the
# warm collect bounded.
_BOUND_WARM_MAX_CELLS = 65_536

# default proximity boost weight for batched proximity queries when
# the spec omits the optional 4th element — matches
# wand_proximity_topk's default so the common case stays
# rank-identical without spelling the weight out per query.
_BATCH_PROX_W = 0.5


def _make_batch_scorer(qspecs: list[tuple], k: int):
    """Multi-query bucket scorer: scores Q queries against ONE pass
    over the bucket's blocks (round-4 verdict #3 — thread-level query
    overlap saturates at ~3.3 QPS because each query is its own job;
    a training-data pipeline issuing thousands of eval/hard-negative
    queries wants them batched into one job).

    ``qspecs``: [(query_id, idf_by_termid, required, neg_ids, cut,
    kind, word_tids, prox_w)] with kind ∈ {"plain", "phrase",
    "proximity"}. Semantics per query are IDENTICAL to
    ``_make_bucket_scorer`` (plain) / ``_make_pos_scorer``
    (positional kinds — same span kernels, same per-kind bound
    adjustments) — same block-max bucket prune against the per-query
    τ cut, same scatter-add scoring, same tie-inclusive top-k
    truncation — but blocks shared between queries DECODE ONCE
    (including the positions blobs: a phrase term shared by many
    queries gathers from one decode), and the whole batch is one
    FlatMapGroupsInPandas stage instead of Q job submissions."""
    pos_tids: set[int] = set()
    for _qid, idf, _r, _n, _c, kind, _wt, _pw in qspecs:
        if kind in ("phrase", "proximity"):
            pos_tids.update(idf)

    def score_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"query_id": [], "docid": [], "score": []}
        ).astype({"query_id": object, "docid": np.int64,
                  "score": np.float64})
        tids = pdf["termid"].to_numpy()
        tid_set = set(tids.tolist())
        inv_avgdl = float(pdf["inv_avgdl"].iloc[0])
        # per-term bucket bound from the scalar blockmax columns —
        # computed once, reused by every query's prune check
        bm_tf = pdf["blockmax_tf"].to_numpy(np.float64)
        bm_dl = pdf["blockmin_dl"].to_numpy(np.float64)
        bm = (bm_tf * _K1P1) / (bm_tf + _K1_1MB + _K1B * bm_dl * inv_avgdl)
        tub: dict[int, float] = {}
        for t, v in zip(tids, bm):
            ti = int(t)
            if v > tub.get(ti, 0.0):
                tub[ti] = v
        survivors, needed = [], set()
        keep_rows = np.zeros(len(tids), dtype=bool)
        for qid, idf, required, neg_ids, cut, kind, word_tids, pw in (
            qspecs
        ):
            # per-kind cut adjustment (same as _make_pos_scorer's
            # bucket check): proximity bound = plain + prox_w; phrase
            # matches ⊆ plain matches so the plain bound dominates
            if kind == "proximity" and cut > float("-inf"):
                cut = cut - pw
            if required and not required.issubset(tid_set):
                continue
            pos_here = [t for t in idf if t in tid_set]
            if not pos_here:
                continue
            total_q = sum(idf[t] * tub[t] for t in pos_here)
            if cut > float("-inf") and total_q < cut:
                continue
            survivors.append((qid, idf, required, neg_ids, kind,
                              word_tids, pw))
            needed.update(pos_here)
            needed.update(t for t in neg_ids if t in tid_set)
            # sub-block skip, per query (same bound as the single-
            # query scorer): a row of term t is needed by q only if
            # idf_q[t]·bm_row + Σ_{t'≠t} tmax_q(t') can reach cut_q.
            # A row survives the batch when ANY query needs it; a
            # query scoring a block another query kept only adds true
            # sub-cut contributions that the top-k then drops, so
            # per-query results stay rank-identical to wand_topk.
            member = np.isin(tids, pos_here)
            if cut > float("-inf"):
                idf_arr = np.array(
                    [idf.get(int(t), 0.0) for t in tids]
                )
                tmax_arr = np.array(
                    [
                        idf.get(int(t), 0.0) * tub.get(int(t), 0.0)
                        for t in tids
                    ]
                )
                keep_rows |= member & (
                    idf_arr * bm + (total_q - tmax_arr) >= cut
                )
            else:
                keep_rows |= member
            if neg_ids:
                keep_rows |= np.isin(tids, list(neg_ids))
        if not survivors:
            return empty
        # decode each needed block ONCE (the batch win: a term shared
        # by 20 queries pays one varbyte decode, not 20); positions
        # stay ENCODED — positional queries gather them lazily per
        # candidate set, from the same one pass
        dec: dict[int, list] = {}
        pos_blobs: dict[int, list] = {}
        for i, row in enumerate(pdf.itertuples(index=False)):
            ti = int(row.termid)
            if ti not in needed or not keep_rows[i]:
                continue
            docids = unpack_docids(row.docids).astype(np.int64)
            tfs_int = unpack_ints(row.tfs).astype(np.int64)
            tfs = tfs_int.astype(np.float64)
            dls = unpack_ints(row.dls).astype(np.float64)
            tfnorm = (tfs * _K1P1) / (
                tfs + _K1_1MB + _K1B * dls * inv_avgdl
            )
            dec.setdefault(ti, []).append((docids, tfnorm))
            if ti in pos_tids:
                pos_blobs.setdefault(ti, []).append(
                    (docids, tfs_int, row.positions)
                )
        out = []
        # one positions-decode cache per bucket: a blob touched by
        # many queries' candidate sets unpacks once (the shared-decode
        # promise of the batch, extended to the positional streams)
        pos_dec_cache: dict[int, tuple] = {}
        for qid, idf, required, neg_ids, kind, word_tids, pw in (
            survivors
        ):
            docid_parts, score_parts, req_parts = [], [], []
            for t, w in idf.items():
                for d, tf in dec.get(t, []):
                    docid_parts.append(d)
                    score_parts.append(w * tf)
                    req_parts.append(
                        np.full(d.size, t in required, dtype=np.int64)
                    )
            if not docid_parts:
                continue
            uniq, inv, scores = _scatter_scores(docid_parts, score_parts)
            if required:
                reqcnt = np.zeros(uniq.size, dtype=np.int64)
                np.add.at(reqcnt, inv, np.concatenate(req_parts))
                keep = reqcnt == len(required)
                uniq, scores = uniq[keep], scores[keep]
            negs = [d for t in neg_ids for d, _tf in dec.get(t, [])]
            if negs:
                bad = np.unique(np.concatenate(negs))
                keep = ~np.isin(uniq, bad)
                uniq, scores = uniq[keep], scores[keep]
            if kind in ("phrase", "proximity") and uniq.size:
                # the SAME batched span kernels as _make_pos_scorer —
                # candidates are AND survivors, so every (term, doc)
                # posting row was kept above and its positions are
                # gatherable from the shared decode pass
                keys_by_tid = {
                    tid: _gather_positions(
                        pos_blobs.get(tid, []), uniq,
                        dec_cache=pos_dec_cache,
                    )
                    for tid in set(word_tids)
                }
                if kind == "phrase":
                    pk = _phrase_keep_mask(
                        keys_by_tid, word_tids, uniq.size
                    )
                    uniq, scores = uniq[pk], scores[pk]
                else:
                    best = _prox_min_gap(
                        keys_by_tid[word_tids[0]],
                        keys_by_tid[word_tids[1]],
                        uniq.size,
                    )
                    boosted = best < np.iinfo(np.int64).max
                    scores = scores + np.where(
                        boosted, pw / np.maximum(best, 1), 0.0
                    )
            uniq, scores = _topk_truncate(uniq, scores, k)
            if uniq.size:
                out.append(
                    pd.DataFrame(
                        {"query_id": qid, "docid": uniq, "score": scores}
                    )
                )
        return pd.concat(out, ignore_index=True) if out else empty

    return score_batch


# Per-posting rank multipliers (Posdb.h densityRank/wordSpamRank
# analogue, SURVEY.md C4). Division by 16 is exact in binary, so the
# SQL oracle replays the multiplier bit-for-bit from raw text:
#   mult = ((8 + density_rank)/16) * ((16 - spam_rank)/16)
_DENS_MULT_MAX = (8.0 + MAX_DENSITY_RANK) / 16.0  # spam 0, dens max
_DIV_MULT_MAX = (8.0 + MAX_DIVERSITY_RANK) / 16.0


_POS_BITS = 32  # key layout: (candidate_doc_idx << 32) | word_position
#                 positions are in-document word ordinals (≪ 2^32) and
#                 doc_idx indexes the bucket's candidate set, so the
#                 packed key orders by (doc, pos) with room to spare


def _gather_positions(blks, uniq: np.ndarray, dec_cache=None) -> np.ndarray:
    """One term's positions across ALL candidate docs as a SORTED
    int64 key array ``(doc_idx << 32) | pos`` (doc_idx = index into
    ``uniq``, which is sorted ascending). The whole gather is numpy
    segment arithmetic — blocks holding no candidate are never
    varbyte-decoded, and no Python statement runs per doc.

    ``dec_cache`` (dict) memoizes the per-blob varbyte decode across
    calls — the batch scorer passes one per bucket so a positions
    blob shared by many queries' candidate sets decodes ONCE (keys
    are ``id(blob)``: the blobs live in the caller's pandas frame for
    the cache's whole lifetime, so ids are stable)."""
    parts = []
    for docids, tfs_int, blob in blks:
        ii = np.searchsorted(docids, uniq)
        ok = ii < docids.size
        ok[ok] = docids[ii[ok]] == uniq[ok]
        if not ok.any():
            continue  # no candidate in this block: skip decode
        if dec_cache is None:
            flat, off = unpack_positions(blob, tfs_int)
        else:
            hit = dec_cache.get(id(blob))
            if hit is None:
                hit = unpack_positions(blob, tfs_int)
                dec_cache[id(blob)] = hit
            flat, off = hit
        mi = ii[ok]  # posting index per matched candidate
        ci = np.nonzero(ok)[0].astype(np.int64)  # candidate index
        starts = off[mi].astype(np.int64)
        lens = (off[mi + 1] - off[mi]).astype(np.int64)
        tot = int(lens.sum())
        if tot == 0:
            continue
        # segment-gather: output[s_j : s_j + len_j] = flat[start_j : …]
        out_start = np.cumsum(lens) - lens
        idx = (
            np.arange(tot, dtype=np.int64)
            - np.repeat(out_start, lens)
            + np.repeat(starts, lens)
        )
        parts.append(
            (np.repeat(ci, lens) << _POS_BITS)
            | flat[idx].astype(np.int64)
        )
    if not parts:
        return np.empty(0, np.int64)
    out = np.concatenate(parts)
    out.sort()
    return out


def _sorted_member(haystack: np.ndarray, needles: np.ndarray) -> np.ndarray:
    """Boolean membership of ``needles`` in SORTED ``haystack`` via
    searchsorted — O((n+m)·log m), no hashing, no Python loop."""
    pos = np.searchsorted(haystack, needles)
    hit = pos < haystack.size
    hit[hit] = haystack[pos[hit]] == needles[hit]
    return hit


def _phrase_keep_mask(
    keys_by_tid: dict, word_tids: list, n_cand: int
) -> np.ndarray:
    """Candidate-doc mask for exact phrase adjacency: valid start keys
    are intersected term by term (``start + j`` stays inside its doc's
    key range because positions ≪ 2^32), batched across every
    candidate doc at once."""
    empty = np.empty(0, np.int64)
    starts = keys_by_tid.get(word_tids[0], empty)
    for j, t in enumerate(word_tids[1:], start=1):
        if starts.size == 0:
            break
        starts = starts[
            _sorted_member(keys_by_tid.get(t, empty), starts + j)
        ]
    keep = np.zeros(n_cand, dtype=bool)
    if starts.size:
        keep[np.unique(starts >> _POS_BITS)] = True
    return keep


def _prox_min_gap(
    ka: np.ndarray, kb: np.ndarray, n_cand: int
) -> np.ndarray:
    """Per-candidate-doc min |pos_a − pos_b| between two terms' sorted
    key arrays (int64 max where a doc lacks positions on either side).
    Nearest-neighbour via ONE searchsorted over the packed keys; the
    left/right neighbours are validated to be in the SAME doc, then
    per-doc minima reduce with ``np.minimum.at``."""
    best = np.full(n_cand, np.iinfo(np.int64).max)
    if ka.size == 0 or kb.size == 0:
        return best
    da, pa = ka >> _POS_BITS, ka & 0xFFFFFFFF
    db, pb = kb >> _POS_BITS, kb & 0xFFFFFFFF
    ii = np.searchsorted(kb, ka)
    left = ii > 0
    left[left] = db[ii[left] - 1] == da[left]
    if left.any():
        np.minimum.at(best, da[left], pa[left] - pb[ii[left] - 1])
    right = ii < kb.size
    right[right] = db[ii[right]] == da[right]
    if right.any():
        np.minimum.at(best, da[right], pb[ii[right]] - pa[right])
    return best


def _make_pos_scorer(
    idf_by_termid: dict[int, float],
    required: set[int],
    k: int,
    kind: str,
    cut: float = float("-inf"),
    word_tids: list[int] | None = None,
    prox_w: float = 0.5,
):
    """Positional bucket scorer over packed blocks WITH the positions/
    dens/spam streams (the ``PosdbTable::intersectLists10_r`` span
    loop, numpy form). Kinds:

    - ``density``: score = Σ idf·tfnorm·densMult·spamMult — fully
      vectorized scatter-add, no positions decoded.
    - ``diversity``: score = Σ idf·tfnorm·divMult with divMult =
      (8+diversityRank)/16 from the divs stream — same shape.
    - ``phrase``: AND + adjacency over decoded positions (valid start
      positions intersected term by term); plain BM25 score.
    - ``proximity``: AND + W/mindist boost from the two terms'
      position lists (searchsorted nearest-neighbour, no n² join).

    Block-max pruning stays upper-bound-valid per kind: density scales
    the bound by the max multiplier, proximity adds W (mindist ≥ 1),
    phrase restricts matches so the plain bound already dominates.
    Positions are decoded ONLY for docs that survive the AND + ub
    filters (the candidate set), like the reference scoring positions
    inside the intersect loop."""
    n_required = len(required)

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"docid": [], "score": []}).astype(
            {"docid": np.int64, "score": np.float64}
        )
        tids = pdf["termid"].to_numpy()
        if n_required and not required.issubset(set(tids.tolist())):
            return empty
        if cut > float("-inf"):
            bm_tf = pdf["blockmax_tf"].to_numpy(np.float64)
            bm_dl = pdf["blockmin_dl"].to_numpy(np.float64)
            inv_avgdl = float(pdf["inv_avgdl"].iloc[0])
            bm = (bm_tf * _K1P1) / (
                bm_tf + _K1_1MB + _K1B * bm_dl * inv_avgdl
            )
            idfs = np.array([idf_by_termid.get(int(t), 0.0) for t in tids])
            per_term: dict[int, float] = {}
            for t, v in zip(tids, idfs * bm):
                per_term[t] = max(per_term.get(t, 0.0), v)
            ub = sum(per_term.values())
            if kind == "density":
                ub *= _DENS_MULT_MAX
            elif kind == "diversity":
                ub *= _DIV_MULT_MAX
            elif kind == "proximity":
                ub += prox_w
            if ub < cut:
                return empty

        docid_parts, score_parts, req_parts = [], [], []
        pos_blobs: dict[int, list] = {}
        for row in pdf.itertuples(index=False):
            docids = unpack_docids(row.docids).astype(np.int64)
            tfs_int = unpack_ints(row.tfs).astype(np.int64)
            tfs = tfs_int.astype(np.float64)
            dls = unpack_ints(row.dls).astype(np.float64)
            tfnorm = (tfs * _K1P1) / (
                tfs + _K1_1MB + _K1B * dls * row.inv_avgdl
            )
            part = idf_by_termid[row.termid] * tfnorm
            if kind == "density":
                dens = unpack_ints(row.dens).astype(np.float64)
                spam = unpack_ints(row.spam).astype(np.float64)
                part = part * ((8.0 + dens) / 16.0) * ((16.0 - spam) / 16.0)
            elif kind == "diversity":
                divs = unpack_ints(row.divs).astype(np.float64)
                part = part * ((8.0 + divs) / 16.0)
            docid_parts.append(docids)
            score_parts.append(part)
            req_parts.append(
                np.full(docids.size, row.termid in required, dtype=np.int64)
            )
            if kind in ("phrase", "proximity"):
                # positions stay ENCODED until the AND filter has
                # produced the candidate set — only blocks holding a
                # surviving doc pay the varbyte decode (the docstring's
                # candidate-only promise; tfs_int reused, not re-read)
                pos_blobs.setdefault(int(row.termid), []).append(
                    (docids, tfs_int, row.positions)
                )
        if not docid_parts:
            return empty
        all_req = np.concatenate(req_parts)
        uniq, inv, scores = _scatter_scores(docid_parts, score_parts)
        if n_required:
            reqcnt = np.zeros(uniq.size, dtype=np.int64)
            np.add.at(reqcnt, inv, all_req)
            keep = reqcnt == n_required
            uniq, scores = uniq[keep], scores[keep]

        if kind in ("phrase", "proximity") and uniq.size:
            # BATCHED span kernel (round-4 verdict #2): candidate
            # docs' positions are gathered term-by-term into ONE flat
            # (doc_idx, pos) key array and the adjacency / min-gap
            # tests run as sorted-array operations over the whole
            # bucket — no Python statement executes per candidate doc
            # (the r3 per-doc loop + repeated np.isin paid Python-loop
            # cost per AND survivor; cf. the reference's C++ span loop
            # in PosdbTable::intersectLists10_r).
            keys_by_tid = {
                tid: _gather_positions(blks, uniq)
                for tid, blks in pos_blobs.items()
            }
            if kind == "phrase":
                keep = _phrase_keep_mask(keys_by_tid, word_tids, uniq.size)
                uniq, scores = uniq[keep], scores[keep]
            else:  # proximity: per-doc min |a-b| over two terms
                best = _prox_min_gap(
                    keys_by_tid[word_tids[0]],
                    keys_by_tid[word_tids[1]],
                    uniq.size,
                )
                boosted = best < np.iinfo(np.int64).max
                scores = scores + np.where(
                    boosted, prox_w / np.maximum(best, 1), 0.0
                )
        uniq, scores = _topk_truncate(uniq, scores, k)
        return pd.DataFrame({"docid": uniq, "score": scores})

    return score_bucket


def _make_field_scorer(
    body_idf: dict[int, float],
    field_widf: dict[int, float],
    k: int,
    cut: float = float("-inf"),
):
    """Hashgroup-weighted bucket scorer (``Posdb.cpp``
    HASHGROUP_INLINKTEXT / HASHGROUP_TITLE weighting, SURVEY.md §2
    C4/D16): body termids score idf·tfnorm (full BM25), field termids
    (``title:``/``anchor:`` prefixed at build time) score
    weight·idf·tf·(k1+1)/(tf+k1) — saturation with no length norm,
    the same formula as the relational ``linkextract.
    field_boosted_topk``. OR semantics (scatter-add, no required set).

    Per-bucket truncation is TIE-INCLUSIVE at the rounding grid
    (keep score ≥ round(kth)−1e-4): the caller's final order may
    tie-break on a label (url) the scorer can't see, so every doc
    that could round into the global top-k must survive the bucket.
    """

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"docid": [], "score": []}).astype(
            {"docid": np.int64, "score": np.float64}
        )
        tids = pdf["termid"].to_numpy()
        if cut > float("-inf"):
            bm_tf = pdf["blockmax_tf"].to_numpy(np.float64)
            bm_dl = pdf["blockmin_dl"].to_numpy(np.float64)
            inv_avgdl = float(pdf["inv_avgdl"].iloc[0])
            per_term: dict[int, float] = {}
            for t, mtf, mdl in zip(tids, bm_tf, bm_dl):
                t = int(t)
                if t in body_idf:
                    v = body_idf[t] * (mtf * _K1P1) / (
                        mtf + _K1_1MB + _K1B * mdl * inv_avgdl
                    )
                else:
                    v = field_widf[t] * (mtf * _K1P1) / (mtf + K1)
                per_term[t] = max(per_term.get(t, 0.0), v)
            if sum(per_term.values()) < cut:
                return empty

        docid_parts, score_parts = [], []
        for row in pdf.itertuples(index=False):
            docids = unpack_docids(row.docids).astype(np.int64)
            tfs = unpack_ints(row.tfs).astype(np.float64)
            t = int(row.termid)
            if t in body_idf:
                dls = unpack_ints(row.dls).astype(np.float64)
                part = body_idf[t] * (tfs * _K1P1) / (
                    tfs + _K1_1MB + _K1B * dls * row.inv_avgdl
                )
            else:
                part = field_widf[t] * (tfs * _K1P1) / (tfs + K1)
            docid_parts.append(docids)
            score_parts.append(part)
        if not docid_parts:
            return empty
        uniq, _inv, scores = _scatter_scores(docid_parts, score_parts)
        uniq, scores = _topk_truncate(uniq, scores, k)
        return pd.DataFrame({"docid": uniq, "score": scores})

    return score_bucket


class PackedIndex:
    """Query handle over a SegmentStore (or any packed DataFrame)."""

    def __init__(
        self,
        spark: SparkSession,
        store: SegmentStore,
        packed: DataFrame | None = None,
    ):
        self.spark = spark
        self.store = store
        # cache both tables: every query prunes the SAME packed table
        # (by termid) and probes term_stats — without the cache each
        # query re-reads parquet (ref: RdbCache's termlist cache).
        # Hash-partitioned by bucket so the per-bucket scorer's
        # ClusteredDistribution(bucket) is already satisfied — the
        # applyInPandas stage runs WITHOUT a blob shuffle.
        # ``packed`` overrides with a WRITE-TIME bucketed table
        # (``segments.save_bucketed``): its scan already reports
        # HashPartitioning(bucket), so no repartition and no cache
        # warm shuffle are needed — queries never move blobs at all,
        # the layout the cache path stands in for at 100 TB.
        # disk-backed stores (write-time bucketed table) default to the
        # JVM-side bucket prune: a pre-aggregate over the scalar
        # blockmax columns semi-joins the surviving buckets, so pruned
        # buckets' BLOBS are never read off disk or shipped across
        # Arrow. The in-memory cache path keeps the in-scorer prune
        # only — there the blob column is already resident and the
        # extra aggregate+broadcast round costs more than it saves
        # (measured; BENCH/wand_prune.md).
        self.jvm_prune = packed is not None
        if packed is not None:
            self.packed = packed
        else:
            n_part = spark.conf.get("spark.sql.shuffle.partitions", "32")
            self.packed = (
                store.packed(spark).repartition(int(n_part), "bucket").cache()
            )
        self.term_stats = store.term_stats(spark).cache()
        self.n_docs, self.avgdl = store.globals_(spark)
        self._term_cache: dict[str, tuple] = {}
        self._seed_cache: dict[int, list] = {}
        # termid -> {bucket: max tfnorm_ub} — static per store snapshot
        # (like term_stats above; a PackedIndex is bound to the store
        # state at construction). Feeds _survivor_bounds.
        self._bound_cache: dict[int, dict[int, float]] = {}
        self._n_buckets: int | None = None
        self._warm_popular()

    def _nb(self) -> int:
        """Bucket fan-out of the store, probed lazily (one scalar
        min/max-stats aggregate over the bucket column, once per
        index) — sizes the literal-vs-broadcast prune decision and
        the bound-warm budget."""
        if self._n_buckets is None:
            mx = self.packed.agg(F.max("bucket")).first()[0]
            self._n_buckets = int(mx) + 1 if mx is not None else 1
        return self._n_buckets

    def _warm_popular(self, top_n: int = 256) -> None:
        """Pre-fetch the highest-df terms' stats + seed blocks in one
        action (the reference warms RdbCache with popular termlists
        the same way) — head-term queries then pay zero cold
        round-trips. top_n rows ≈ a few hundred KB regardless of
        corpus size."""
        ts = (
            self.term_stats.orderBy(F.desc("df"), F.asc("term"))
            .limit(top_n)
            .select("termid", "term", "df")
        )
        rows = ts.join(
            self.packed.filter(F.col("bucket") == 0), "termid", "left"
        ).collect()
        for r in rows:
            if self._term_cache.get(r["term"]) is None:
                self._term_cache[r["term"]] = r
            seeds = self._seed_cache.setdefault(int(r["termid"]), [])
            if r["docids"] is not None:
                seeds.append(r)
        if self.jvm_prune and rows:
            # pre-warm block bounds for the head terms too, so their
            # first pruned query runs ONE job (the query) instead of a
            # bounds collect + the query. Budgeted by cell count: at
            # sandbox bucket fan-outs this covers all top_n terms; at
            # a 64k-bucket layout it warms only the very head.
            budget = max(0, _BOUND_WARM_MAX_CELLS // max(self._nb(), 1))
            tids = list(dict.fromkeys(
                int(r["termid"])
                for r in sorted(
                    rows, key=lambda r: (-int(r["df"]), r["term"])
                )
            ))[:budget]
            if tids:
                self._bounds_for(tids)

    def _term_rows(self, terms: list[str]) -> list:
        """term_stats rows for query terms, memoized across queries —
        the driver-side analogue of the reference's termFreq cache
        (Posdb::getTermFreq hits RdbMap counts, not the lists).

        The SAME collect also fetches each term's bucket-0 packed
        blocks (the τ seed sample — see ``_seed_rows``) via a left
        join, so a cold query pays ONE driver round-trip, not two.
        """
        missing = [t for t in terms if t not in self._term_cache]
        if missing:
            ts = self.term_stats.filter(F.col("term").isin(missing)).select(
                "termid", "term", "df"
            )
            rows = ts.join(
                self.packed.filter(F.col("bucket") == 0), "termid", "left"
            ).collect()
            for t in missing:
                self._term_cache.setdefault(t, None)
            for r in rows:
                if self._term_cache[r["term"]] is None:
                    self._term_cache[r["term"]] = r
                seeds = self._seed_cache.setdefault(int(r["termid"]), [])
                if r["docids"] is not None:
                    seeds.append(r)
        return [self._term_cache[t] for t in terms
                if self._term_cache[t] is not None]

    def _seed_rows(self, termids: list[int]) -> list:
        """Bucket-0 blocks for the given termids (the τ seed sample),
        memoized per termid — populated by ``_term_rows``'s combined
        fetch; one row per (term, segment), a few KB each."""
        out: list = []
        for t in termids:
            out.extend(self._seed_cache.get(t, []))
        return out

    def _bounds_for(self, termids: list[int]) -> dict[int, dict[int, float]]:
        """Per-(termid, bucket) block-bound maxima (``max tfnorm_ub``),
        memoized per termid — the driver-side analogue of
        ``_term_rows``. These are STATIC store metadata (extrema of
        scalar columns), so aggregating them per QUERY was paying two
        full scalar-column scans of the store in every disk-backed
        plan; now a cold term pays one aggregate collect (termid
        pushdown, scalar columns only — ≤ n_buckets rows per term) and
        every later query builds its bound tables as literals."""
        missing = [t for t in termids if t not in self._bound_cache]
        if missing:
            rows = (
                self.packed.filter(F.col("termid").isin(missing))
                .withColumn("inv_avgdl", F.lit(1.0 / self.avgdl))
                .groupBy("bucket", "termid")
                .agg(F.max(_tfnorm_ub_col()).alias("raw_ub"))
                .collect()
            )
            for t in missing:
                self._bound_cache.setdefault(t, {})
            for r in rows:
                self._bound_cache[int(r["termid"])][int(r["bucket"])] = (
                    float(r["raw_ub"])
                )
        return {t: self._bound_cache[t] for t in termids}

    def _survivor_bounds(self, idf: dict[int, float]):
        """Driver-side survivor inputs for ``_prune_buckets_jvm`` —
        the per-(termid, bucket) bound ``t_ub = idf_t · max
        tfnorm_ub`` and its per-bucket rollup (Σ t_ub, count of terms
        present), computed from the driver bound cache (tiny:
        |terms| × n_buckets values). The per-term bounds are the SAME
        numbers ``_block_survivors``' in-plan aggregates produce
        (both sides evaluate ``_tfnorm_ub_col``, and ``idf·max(x) =
        max(idf·x)`` exactly for the non-negative idf ``_query_ctx``
        enforces); the per-bucket Σ can differ from Spark's
        partition-order sum by a last ulp — survivor-set parity is
        pinned in tests/test_segments_wand.py. Returned as plain
        dicts, so the query plan folds them in as literals instead of
        broadcast-joining per-query frames."""
        bounds = self._bounds_for(list(idf))
        t_ub: dict[int, dict[int, float]] = {}
        bucket_ub: dict[int, float] = {}
        nterms: dict[int, int] = {}
        for t, by_bucket in bounds.items():
            w = idf[t]
            for b, raw in by_bucket.items():
                v = w * raw
                t_ub.setdefault(t, {})[b] = v
                bucket_ub[b] = bucket_ub.get(b, 0.0) + v
                nterms[b] = nterms.get(b, 0) + 1
        return t_ub, bucket_ub, nterms

    def _query_ctx(
        self,
        terms: list[str],
        k: int = 10,
        mode: str = "and",
        neg_terms: list[str] | None = None,
        round_to: int | None = 4,
        weights: dict[str, float] | None = None,
        with_blocks: bool = True,
    ) -> dict | None:
        """Shared query prologue: term stats, idf, pruned block scan,
        and the seed-sampled τ cut. None = provably empty result.

        ``with_blocks=False`` skips building the per-query blocks
        frame (two py4j plan-construction calls) — ``wand_topk_batch``
        calls this once per query only for (idf, required, neg_ids,
        cut) and builds ONE fused scan itself; at thousands of batch
        queries the unused frames were pure driver latency.

        ``weights`` (term → multiplier; ref: QueryTerm::m_synonymOf —
        synonym termlists score at reduced weight) folds into the idf
        map: a weight scales the term's partial w·idf·tfnorm linearly,
        so every downstream consumer — the bucket scorer, the block-max
        upper bound, the JVM prune, and the seed-τ — stays a valid
        bound/score with zero changes. Unlisted terms weigh 1.0."""
        # (seed-τ mechanics live in _seed_cut — ONE implementation
        # shared by the plain, positional, and field-boost paths)
        if weights and min(weights.values()) <= 0:
            # the block-max machinery factors bounds as w·idf·max(x),
            # which upper-bounds max(w·idf·x) only for w > 0 — a
            # non-positive weight would silently flip the bound's
            # direction and prune true top-k docs
            raise ValueError(
                "term weights must be positive (got "
                f"{ {t: w for t, w in weights.items() if w <= 0} })"
            )
        terms = list(dict.fromkeys(terms))
        rows = self._term_rows(terms)
        found = {r["term"]: r for r in rows}
        if mode == "and" and len(found) < len(terms):
            return None
        if not found:
            return None

        n = float(self.n_docs)
        idf = {
            int(r["termid"]): float(
                np.log((n - r["df"] + 0.5) / (r["df"] + 0.5) + 1.0)
            )
            * (weights.get(r["term"], 1.0) if weights else 1.0)
            for r in rows
        }
        termids = list(idf)
        neg_rows = self._term_rows(list(neg_terms)) if neg_terms else []
        neg_ids = {int(r["termid"]) for r in neg_rows}
        required = set(termids) if mode == "and" else set()

        # termid prune as an isin() literal filter. Trade-off,
        # measured: the literals embed in the whole-stage-codegen
        # source of the cached-scan stage, so the FIRST query with a
        # given term set pays a ~1 s JIT compile; a broadcast-join
        # prune avoids the compile but adds a per-query broadcast
        # round (+0.3-0.5 s on EVERY execution). Steady-state wins:
        # literal plans are compiled once per query shape and repeat
        # executions run ~2-3× faster than the join form.
        blocks = None
        if with_blocks:
            blocks = self.packed.filter(
                F.col("termid").isin(termids + list(neg_ids))
            ).withColumn("inv_avgdl", F.lit(1.0 / self.avgdl))

        cut = self._seed_cut(
            termids + list(neg_ids),
            _make_bucket_scorer(idf, required, neg_ids, k),
            k,
            round_to,
        )
        return {
            "blocks": blocks,
            "idf": idf,
            "required": required,
            "neg_ids": neg_ids,
            "cut": cut,
            "k": k,
        }

    def _seed_cut(self, termids, scorer, k, round_to=4) -> float:
        """τ from a SAMPLED seed bucket, scored driver-side — the ONE
        tau/cut implementation shared by the plain, positional, and
        field-boost query paths (drift here invalidates block-max
        pruning, so it must not be re-implemented per path).

        docids are uniform 63-bit hashes, so every bucket is a fair
        sample of the score distribution: bucket 0's k-th best score
        is a valid τ (any subset's k-th score lower-bounds the global
        k-th) and, by uniformity, a near-tight one. Its blocks are one
        row per (term, segment), fetched via the memoized pure-JVM
        collect and scored with the SAME numpy kernel as the
        distributed branch — the reference's per-shard TopTree seed
        (Msg39), far cheaper than a distributed stage just for τ.

        The returned cut compares against τ in the ROUNDED domain
        minus one ulp of the rounding grid: final ranking is on
        round(score, round_to), so a doc whose exact score is below
        unrounded-τ but rounds equal (and ties by smaller docid) must
        still be scored — ``ub > τ(unrounded)`` would drop it."""
        seed_rows = self._seed_rows(termids)
        tau = float("-inf")
        if seed_rows:
            pdf = pd.DataFrame([r.asDict() for r in seed_rows])
            pdf["inv_avgdl"] = 1.0 / self.avgdl
            seed_scored = scorer(pdf).sort_values(
                ["score", "docid"], ascending=[False, True]
            )
            if len(seed_scored) >= k:
                tau = float(seed_scored["score"].iloc[k - 1])
        if tau > float("-inf") and round_to:
            return round(tau, round_to) - 10.0 ** -round_to
        return tau

    def _prune_buckets_jvm(self, ctx: dict) -> DataFrame:
        """Block-max prune IN THE QUERY PLAN, join-free: both granules
        are decided from the driver bound cache and folded into the
        scan as LITERALS. Bucket survival (``Σ t_ub ≥ cut``, AND-mode
        term-presence) is resolved entirely driver-side and becomes a
        ``bucket IN (...)`` predicate that pushes down to the parquet
        scan — a pruned bucket's files are skipped by row-group stats,
        so its docids/tfs/dls bytes are never read at all (the Ding &
        Suel skip realized as I/O pruning). The sub-block row test
        (``row_ub + (bucket_ub − t_ub) ≥ cut``) keeps its per-row half
        in-plan but takes the per-(termid, bucket) constants from a
        nested map literal, so the whole prune is ONE codegen'd filter
        stage: zero joins, zero Exchanges, zero per-query frames
        (the broadcast-join form this replaces cost two exchanges per
        query — the dominant small-corpus overhead after the aggregate
        sub-scans were removed). ``prune_stats`` keeps the in-plan
        ``_block_survivors`` aggregates as the reference
        implementation; parity between the two is pinned in
        tests/test_segments_wand.py."""
        blocks, idf, cut = ctx["blocks"], ctx["idf"], ctx["cut"]
        if cut == float("-inf"):
            return blocks
        if len(idf) * self._nb() > _LITERAL_PRUNE_MAX_CELLS:
            return self._prune_buckets_joined(ctx)
        t_ub, bucket_ub, nterms = self._survivor_bounds(idf)
        need = len(ctx["required"]) if ctx.get("required") else 0
        surv = sorted(
            b for b, ub in bucket_ub.items()
            if ub >= cut and (not need or nterms[b] == need)
        )
        # buckets with positive-term rows that fail the bound — or, for
        # neg-term rows, buckets with NO positive rows at all (absent
        # from bucket_ub; such a bucket can't produce a match) — drop
        # at the scan via the isin pushdown.
        if not surv:
            return blocks.filter(F.lit(False))
        pruned = blocks.filter(F.col("bucket").isin(surv))
        surv_set = set(surv)
        # rest(t, b) = bucket_ub[b] − t_ub[t][b]; lookups missing from
        # the map (neg-term rows) yield NULL → keep unconditionally,
        # matching _block_survivors' t_ub-isNull semantics.
        rest_entries = [
            x
            for t, by_b in t_ub.items()
            # a term whose buckets all failed survival has no rows
            # left after the isin — skip it (an empty create_map()
            # would type-conflict with the int→double inner maps)
            if any(b in surv_set for b in by_b)
            for x in (
                F.lit(t),
                F.create_map(*[
                    y
                    for b, v in by_b.items()
                    if b in surv_set
                    for y in (F.lit(b), F.lit(bucket_ub[b] - v))
                ]),
            )
        ]
        rest = F.create_map(*rest_entries)[F.col("termid")][
            F.col("bucket")
        ]
        row_ub = _idf_map_expr(idf)[F.col("termid")] * _tfnorm_ub_col()
        return pruned.filter(
            rest.isNull() | (row_ub + rest >= F.lit(cut))
        )

    def _prune_buckets_joined(self, ctx: dict) -> DataFrame:
        """Size-capped fallback for ``_prune_buckets_jvm``: past
        ``_LITERAL_PRUNE_MAX_CELLS`` (|terms| × n_buckets) a literal
        plan would mean ~10^5 ``F.lit`` py4j calls and a multi-MB
        filter expression, and shipping the bound set through the
        driver cache would be a memory hazard of its own — so apply
        ``_block_survivors``' in-plan aggregates + broadcast joins
        instead (two scalar sub-scans per query, negligible against
        the blob scan they prune at that bucket fan-out). Same bound
        formula, same survivor set."""
        blocks, idf, cut = ctx["blocks"], ctx["idf"], ctx["cut"]
        flagged = _block_survivors(blocks, idf, cut)
        keep = (F.col("bucket_ub") >= F.lit(cut)) & F.col("row_keep")
        if ctx.get("required"):
            keep = keep & (F.col("nterms") == len(ctx["required"]))
        # neg-term rows carry a null bucket_ub only when their bucket
        # has NO positive-term rows — such a bucket can't match, so
        # null-kills-it is right; inside a live bucket they survive
        # via row_keep.
        return flagged.filter(keep).drop("bucket_ub", "nterms", "row_keep")

    def wand_topk(
        self,
        terms: list[str],
        k: int = 10,
        mode: str = "and",
        neg_terms: list[str] | None = None,
        round_to: int | None = 4,
        weights: dict[str, float] | None = None,
    ) -> DataFrame:
        ctx = self._query_ctx(terms, k, mode, neg_terms, round_to, weights)
        if ctx is None:
            return self.spark.createDataFrame([], SCORE_SCHEMA)
        if self.jvm_prune:
            ctx["blocks"] = self._prune_buckets_jvm(ctx)

        # ONE action mirroring the relational path's shape: termid
        # prune at the (cached, bucket-partitioned) scan → per-bucket
        # scorer → TakeOrderedAndProject. No shuffle: the cache is
        # hash-partitioned by bucket, so FlatMapGroupsInPandas's
        # ClusteredDistribution is already satisfied. Block-max
        # pruning happens INSIDE the scorer from the blockmax column
        # (see _make_bucket_scorer) — skipped buckets never decode a
        # blob. On a real cluster the packed table is additionally
        # bucket-partitioned on disk, so a broadcast semi-join on the
        # survivor buckets would also prune the I/O; in-cache here,
        # the column read is the whole cost and the in-scorer check
        # avoids a second aggregate+broadcast round over the table.
        scorer = _make_bucket_scorer(
            ctx["idf"], ctx["required"], ctx["neg_ids"], k, cut=ctx["cut"]
        )
        result = (
            _project_scorer_cols(ctx["blocks"])
            .groupBy("bucket")
            .applyInPandas(scorer, schema=SCORE_SCHEMA)
        )

        score = F.round(F.col("score"), round_to) if round_to else F.col("score")
        return (
            result.select("docid", score.alias("score"))
            .orderBy(F.desc("score"), F.asc("docid"))
            .limit(k)
        )

    def _fold_batch_thresholds(
        self, idf_all: dict[int, float], qspecs: list
    ):
        """Fold per-(bucket, termid) bounds into the weakest row-level
        threshold any batch query still needs — the multi-query form
        of ``_block_survivors``'s row bound, as a pandas DataFrame
        (bucket, termid, thr) ready to broadcast; thr is NA where the
        row must be kept unconditionally (neg terms, no-seed queries).
        Bounds come from the driver cache (``_bounds_for``) — cold
        batch terms pay one shared aggregate collect; a warm batch
        builds the matrix without touching the cluster.

        Returns None when the bound matrix exceeds
        ``_BATCH_PRUNE_MAX_CELLS`` (caller skips the plan-level prune:
        a thr table that size couldn't broadcast, and with that many
        live (bucket, term) pairs the min-over-queries threshold
        decays toward keep-everything anyway) and an EMPTY frame when
        no bucket can serve any query (caller returns no rows).

        The fold is vectorized per QUERY over the dense buckets ×
        terms matrix — O(Σ_q buckets·|q|) numpy work, never a Python
        loop over buckets (a 64k-bucket × 2000-query batch would be
        billions of interpreted iterations)."""
        ninf = float("-inf")
        # gate on the WORST-CASE cell count BEFORE _bounds_for runs:
        # the cache collect itself materializes up to |terms| ×
        # n_buckets rows driver-side (and retains them), so checking
        # len(rows) after the fact would OOM the driver first on the
        # wide batches the cap exists for.
        if len(idf_all) * self._nb() > _BATCH_PRUNE_MAX_CELLS:
            return None
        bounds = self._bounds_for(list(idf_all))
        rows = [
            (b, t, idf_all[t] * raw)
            for t, by_bucket in bounds.items()
            for b, raw in by_bucket.items()
        ]
        if len(rows) > _BATCH_PRUNE_MAX_CELLS:
            return None
        bpdf = pd.DataFrame(rows, columns=["bucket", "termid", "t_ub"])
        if bpdf.empty:
            return bpdf.assign(thr=[])[["bucket", "termid", "thr"]]
        # Check the DENSE size before materializing the pivot: a sparse
        # bound table (row count under the cap) can still span a
        # buckets × terms rectangle far over it, and pivot() allocates
        # that rectangle NaN-filled — the exact driver OOM the cap
        # exists to prevent.
        nb = bpdf["bucket"].nunique()
        nt = bpdf["termid"].nunique()
        if nb * nt > _BATCH_PRUNE_MAX_CELLS:
            return None
        piv = bpdf.pivot(index="bucket", columns="termid", values="t_ub")
        nb, nt = piv.shape
        buckets = piv.index.to_numpy(np.int64)
        tids = piv.columns.to_numpy(np.int64)
        M = piv.to_numpy(np.float64)  # NaN where (bucket, term) absent
        present = ~np.isnan(M)
        col_of = {int(t): j for j, t in enumerate(tids)}
        # thr[i, j]: min over surviving queries of the row bound that
        # could still reach that query's cut (same bound as
        # _block_survivors' row_keep: row_ub ≥ cut − (bucket_ub −
        # t_ub); the max row per (b, t) always survives its own
        # threshold, so every surviving query still sees all its
        # termids). +inf = untouched, −inf = keep unconditionally.
        thr = np.full((nb, nt), np.inf)
        touched = np.zeros((nb, nt), dtype=bool)
        # neg termids absent from idf_all have no matrix column; their
        # keep-rows are accumulated per live bucket separately
        neg_extra: dict[int, np.ndarray] = {}
        for _qid, idf, required, neg, cut, kind, _wt, prox_w in qspecs:
            # per-kind bound adjustment, same as the single-query
            # positional prune (_wand_pos): proximity scores ≤ plain +
            # prox_w (subtract it from the cut); phrase matches are a
            # SUBSET of plain matches, so the plain bound dominates
            if kind == "proximity" and cut > ninf:
                cut = cut - prox_w
            cols = [col_of[t] for t in idf if t in col_of]
            if not cols:
                continue
            if required:
                rcols = [col_of[t] for t in required if t in col_of]
                if len(rcols) < len(required):
                    continue  # a required term has no blocks at all
                alive = present[:, rcols].all(axis=1)
            else:
                alive = np.ones(nb, dtype=bool)
            sub = M[:, cols]
            # bounds already carry idf (t_ub = idf·tfnorm_ub from
            # _bucket_term_bounds) — do NOT multiply idf again: idf²
            # UNDERSTATES the bound for idf<1 terms (df ≳ 0.37·N
            # stopwords) and would prune buckets holding true top-k
            bucket_ub = np.nansum(sub, axis=1)
            if cut > ninf:
                alive = alive & (bucket_ub >= cut)
            if not alive.any():
                continue
            ix = np.ix_(alive, cols)
            if cut == ninf:
                need = np.full((int(alive.sum()), len(cols)), -np.inf)
            else:
                need = cut - (bucket_ub[alive, None] - sub[alive])
                need = np.where(np.isnan(need), np.inf, need)
            pm = present[ix]
            thr[ix] = np.where(pm, np.minimum(thr[ix], need), thr[ix])
            touched[ix] |= pm
            for t in neg:
                # neg docid sets must stay complete for the
                # anti-filter wherever q is evaluated
                j = col_of.get(t)
                if j is not None:
                    thr[alive, j] = -np.inf
                    touched[alive, j] = True
                else:
                    m = neg_extra.get(t)
                    neg_extra[t] = alive | m if m is not None else alive
        bi, tj = np.nonzero(touched)
        vals = thr[bi, tj]
        out_b = [buckets[bi].astype(np.int32)]
        out_t = [tids[tj]]
        out_v = [np.where(np.isneginf(vals), np.nan, vals)]
        for t, mask in neg_extra.items():
            nbm = int(mask.sum())
            out_b.append(buckets[mask].astype(np.int32))
            out_t.append(np.full(nbm, t, dtype=np.int64))
            out_v.append(np.full(nbm, np.nan))
        return pd.DataFrame(
            {
                "bucket": np.concatenate(out_b),
                "termid": np.concatenate(out_t),
                # nullable Float64: NaN must reach Spark as NULL (the
                # plan filter tests isNull; a float NaN would not be)
                "thr": pd.array(np.concatenate(out_v), dtype="Float64"),
            }
        )

    def wand_topk_batch(
        self,
        queries: dict[str, list[str] | tuple],
        k: int = 10,
        round_to: int | None = 4,
    ) -> DataFrame:
        """Score MANY queries in ONE Spark job (round-4 verdict #3).

        ``queries``: {query_id: terms} for AND queries, or
        {query_id: (terms, mode, neg_terms[, prox_w])} for the full
        shape set — mode ∈ {"and", "or", "phrase", "proximity"}; the
        optional 4th element is a per-query proximity weight
        (default 0.5, wand_proximity_topk's default). The positional
        modes need a ``with_positions`` store, take no neg_terms, and
        mirror ``wand_phrase_topk`` / ``wand_proximity_topk`` exactly
        (kind-specific seed-τ, proximity cut adjusted by prox_w,
        positions gathered only for AND-surviving candidates); a
        training-data pipeline mining phrase duplicates or
        co-occurrence pairs issues thousands of these. Returns
        (query_id, docid, score) — per query RANK-IDENTICAL to
        ``wand_topk`` / ``wand_phrase_topk`` / ``wand_proximity_topk``
        (pinned in tests/test_wand_batch.py): same per-query seed-τ
        cuts, same block-max prune, same scoring and tie rules; only
        the execution is fused. The thread-overlap
        route saturates at ~3.3 QPS on 8 cores because each query
        pays its own job submission and its narrow stages idle cores
        (BENCH/concurrency.md); batching carries a query_id through
        the bucket scorer instead — one FlatMapGroupsInPandas pass
        decodes shared term blocks once and fills every core, then
        one rank-per-query top-k (a window over ≤ Q·buckets·k rows)
        replaces Q TakeOrderedAndProjects.

        Scale shape: Q queries' termids union into ONE scan filter;
        on a disk-backed bucketed store the JVM prune generalizes to
        SUB-BLOCK granularity by collecting the per-(bucket, termid)
        scalar bounds once (buckets × |terms| rows, Arrow transfer,
        vectorized numpy fold, capped at _BATCH_PRUNE_MAX_CELLS —
        past the cap the plan filter is skipped, see
        ``_fold_batch_thresholds``) and folding them driver-side into
        the weakest row-level threshold any query still needs per
        (bucket, termid) — a block row below every interested query's
        threshold is dropped in the JVM plan and never crosses Arrow
        into the Python scorer (same row-level guarantee as the
        single-query ``_block_survivors`` path; the bound aggregate
        itself reads only scalar columns).
        """
        from pyspark.sql.window import Window

        norm: list[tuple] = []
        for qid, spec in queries.items():
            if isinstance(spec, (list,)):
                norm.append((str(qid), list(spec), "and", None, 0.0))
            else:
                # (terms, mode, neg) or (terms, "proximity", None,
                # prox_w) — the 4th element carries a per-query
                # proximity weight so batch results stay rank-
                # identical to wand_proximity_topk at ANY weight, not
                # just the 0.5 default
                terms, mode, neg = spec[0], spec[1], spec[2]
                pw = (
                    float(spec[3])
                    if len(spec) > 3 and spec[3] is not None
                    else _BATCH_PROX_W
                )
                if mode in ("phrase", "proximity"):
                    if neg:
                        raise ValueError(
                            f"{mode} batch queries take no neg_terms "
                            f"(query {qid!r})"
                        )
                    if "positions" not in self.packed.columns:
                        raise ValueError(
                            f"{mode} batch queries need a positional "
                            "store (build_segments(with_positions="
                            f"True)) — query {qid!r}"
                        )
                    if (
                        mode == "proximity"
                        and len(dict.fromkeys(terms)) != 2
                    ):
                        raise ValueError(
                            "proximity takes exactly two distinct "
                            f"terms (query {qid!r})"
                        )
                norm.append((str(qid), list(terms), mode, neg, pw))
        # ONE driver round-trip for every term in the batch (the
        # per-query ctx calls below then hit the memoized cache)
        all_terms = list(
            dict.fromkeys(
                t
                for _qid, terms, _m, neg, _pw in norm
                for t in list(terms) + list(neg or [])
            )
        )
        self._term_rows(all_terms)
        qspecs: list[tuple] = []
        for qid, terms, mode, neg, pw in norm:
            if mode in ("phrase", "proximity"):
                # the SAME prologue as the per-query positional path —
                # phrase keeps the original word list (repeats and
                # order matter for adjacency, exactly like
                # wand_phrase_topk); proximity uses the deduped pair
                ctx = self._pos_query_ctx(
                    terms, mode, k,
                    words=terms if mode == "phrase" else None,
                    prox_w=pw, round_to=round_to,
                )
                if ctx is None:
                    continue  # a phrase word the corpus lacks
                qspecs.append(
                    (qid, ctx["idf"], ctx["required"], set(),
                     ctx["cut"], mode, ctx["word_tids"], pw)
                )
                continue
            ctx = self._query_ctx(
                terms, k, mode, neg, round_to, None, with_blocks=False
            )
            if ctx is None:
                continue  # AND query with a term the corpus lacks
            qspecs.append(
                (qid, ctx["idf"], ctx["required"], ctx["neg_ids"],
                 ctx["cut"], "plain", None, 0.0)
            )
        if not qspecs:
            return self.spark.createDataFrame([], BATCH_SCORE_SCHEMA)
        has_pos_q = any(s[5] in ("phrase", "proximity") for s in qspecs)
        idf_all: dict[int, float] = {}
        for _qid, idf, _req, _neg, _cut, _kind, _wt, _pw in qspecs:
            idf_all.update(idf)  # idf is term-global (no weights here)
        all_tids = sorted(
            set(idf_all)
            | {t for s in qspecs for t in s[3]}
        )
        blocks = self.packed.filter(
            F.col("termid").isin(all_tids)
        ).withColumn("inv_avgdl", F.lit(1.0 / self.avgdl))

        if self.jvm_prune:
            # batch form of _block_survivors: ONE scalar aggregate
            # over (bucket, termid) bounds (buckets × |batch terms|
            # rows), then a driver-side fold into the weakest
            # row-level threshold any query still needs per (bucket,
            # termid). Rows below EVERY interested query's threshold
            # are dropped by a broadcast inner join + filter in the
            # JVM plan, so — exactly like the single-query path — a
            # pruned sub-block's blob bytes never cross Arrow into
            # the batch scorer (which would re-derive the same skip
            # per query and drop them at decode time anyway; see
            # keep_rows in _make_batch_scorer — that check stays,
            # making the plan-level filter a pure transfer/decode
            # win, not a semantics change).
            #
            # The fold's working set is the buckets × terms bound
            # matrix, which grows with BOTH corpus size and batch
            # width; past _BATCH_PRUNE_MAX_CELLS the prune is skipped
            # outright rather than collected: with thousands of
            # queries nearly every block serves SOMEONE (thr = min
            # over queries decays toward keep-everything), so the
            # plan filter stops paying for its own broadcast — and a
            # thr table that size could not broadcast anyway. The
            # in-scorer per-query prune still applies either way.
            thr_pdf = self._fold_batch_thresholds(idf_all, qspecs)
            if thr_pdf is not None and thr_pdf.empty:
                return self.spark.createDataFrame([], BATCH_SCORE_SCHEMA)
            if thr_pdf is not None:
                thr_df = self.spark.createDataFrame(
                    thr_pdf, schema="bucket int, termid long, thr double"
                )
                row_ub = (
                    _idf_map_expr(idf_all)[F.col("termid")]
                    * _tfnorm_ub_col()
                )
                # inner join doubles as the bucket prune (thr only
                # holds surviving buckets) AND drops terms no
                # surviving query needs in that bucket; NULL thr (neg
                # rows — row_ub is NULL there too — and no-seed
                # queries) keeps the row
                blocks = (
                    blocks.join(
                        F.broadcast(thr_df), ["bucket", "termid"], "inner"
                    )
                    .filter(
                        F.col("thr").isNull() | (row_ub >= F.col("thr"))
                    )
                    .drop("thr")
                )

        result = (
            # positions ride along only when some query gathers them
            _project_scorer_cols(
                blocks, "phrase" if has_pos_q else None
            )
            .groupBy("bucket")
            .applyInPandas(
                _make_batch_scorer(qspecs, k), schema=BATCH_SCORE_SCHEMA
            )
        )
        score = (
            F.round(F.col("score"), round_to) if round_to else F.col("score")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("docid")
        )
        return (
            result.select("query_id", "docid", score.alias("score"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )

    # --- positional query modes (need a with_positions store) -----------

    def _pos_query_ctx(
        self,
        terms: list[str],
        kind: str,
        k: int,
        words: list[str] | None = None,
        prox_w: float = 0.5,
        round_to: int | None = 4,
    ) -> dict | None:
        """Positional query prologue — the ONE copy shared by
        ``_wand_pos`` and ``wand_topk_batch`` (a hand-copied batch
        prologue once dropped repeated phrase words by building
        word_tids from the DEDUPED terms; pinned by the duplicate-word
        parity test in tests/test_wand_batch.py). ``words`` defaults
        to ``terms`` AS GIVEN — order and repeats preserved for
        adjacency — while term stats/idf resolve over the deduped set.
        The KIND-specific scorer seeds τ (a plain-scorer τ would
        over-prune: phrase restricts matches, density rescales).
        None = a term the corpus lacks (AND semantics: empty)."""
        terms_u = list(dict.fromkeys(terms))
        # default words = the DEDUPED terms (what proximity/density
        # callers always used); phrase callers pass the original word
        # list explicitly to keep repeats
        words = list(words) if words is not None else terms_u
        rows = self._term_rows(terms_u)
        if len({r["term"] for r in rows}) < len(terms_u):
            return None
        n = float(self.n_docs)
        idf = {
            int(r["termid"]): float(
                np.log((n - r["df"] + 0.5) / (r["df"] + 0.5) + 1.0)
            )
            for r in rows
        }
        tid_of = {r["term"]: int(r["termid"]) for r in rows}
        word_tids = [tid_of[w] for w in words]
        required = set(idf)
        cut = self._seed_cut(
            list(idf),
            _make_pos_scorer(
                idf, required, k, kind, float("-inf"), word_tids, prox_w
            ),
            k,
            round_to,
        )
        return {
            "idf": idf,
            "required": required,
            "word_tids": word_tids,
            "cut": cut,
        }

    def _wand_pos(
        self,
        terms: list[str],
        kind: str,
        k: int = 10,
        words: list[str] | None = None,
        prox_w: float = 0.5,
        round_to: int | None = 4,
    ) -> DataFrame:
        """Shared driver for density/phrase/proximity over the packed
        positional store — same single-action shape as wand_topk, with
        the kind-specific scorer applied to BOTH the τ seed and the
        pruned branch (a plain-scorer τ would over-prune: phrase
        restricts matches and density rescales scores, so the seed
        must rank with the final semantics)."""
        assert "positions" in self.packed.columns, (
            "store was built without positions "
            "(build_segments(with_positions=True))"
        )
        if kind == "diversity" and "divs" not in self.packed.columns:
            raise ValueError(
                "positional store lacks the 'divs' stream "
                "(pre-diversity layout); rebuild with "
                "build_segments(with_positions=True) to score "
                "diversity"
            )
        ctx = self._pos_query_ctx(
            terms, kind, k, words=words, prox_w=prox_w, round_to=round_to
        )
        if ctx is None:
            return self.spark.createDataFrame([], SCORE_SCHEMA)
        idf, required, word_tids, cut = (
            ctx["idf"], ctx["required"], ctx["word_tids"], ctx["cut"]
        )
        termids = list(idf)

        def scorer(cut: float):
            return _make_pos_scorer(
                idf, required, k, kind, cut, word_tids, prox_w
            )

        blocks = self.packed.filter(
            F.col("termid").isin(termids)
        ).withColumn("inv_avgdl", F.lit(1.0 / self.avgdl))

        if self.jvm_prune and cut > float("-inf"):
            # disk-backed stores get the same JVM-side bucket prune as
            # wand_topk so pruned buckets' POSITIONAL blobs (the
            # largest in the store) never leave disk (review fix). The
            # plain bound stays upper-bound-valid per kind with the
            # exact adjustments the in-scorer check applies: density/
            # diversity scores ≤ plain × MULT_MAX (divide the cut),
            # proximity ≤ plain + prox_w (subtract it), phrase scores
            # a SUBSET of matches so the plain bound already dominates.
            if kind == "density":
                cut_eff = cut / _DENS_MULT_MAX
            elif kind == "diversity":
                cut_eff = cut / _DIV_MULT_MAX
            elif kind == "proximity":
                cut_eff = cut - prox_w
            else:
                cut_eff = cut
            blocks = self._prune_buckets_jvm(
                {"blocks": blocks, "idf": idf, "cut": cut_eff,
                 "required": required}
            )

        result = (
            _project_scorer_cols(blocks, kind)
            .groupBy("bucket")
            .applyInPandas(scorer(cut), schema=SCORE_SCHEMA)
        )
        score = (
            F.round(F.col("score"), round_to) if round_to else F.col("score")
        )
        return (
            result.select("docid", score.alias("score"))
            .orderBy(F.desc("score"), F.asc("docid"))
            .limit(k)
        )

    def wand_density_topk(self, terms: list[str], k: int = 10) -> DataFrame:
        """BM25 × per-posting density/spam rank multipliers decoded
        from the packed dens/spam streams (C4; ``Posdb.h``
        densityRank/wordSpamRank damping)."""
        return self._wand_pos(terms, "density", k)

    def wand_diversity_topk(self, terms: list[str], k: int = 10) -> DataFrame:
        """BM25 × per-posting diversityRank multiplier decoded from the
        packed divs stream (C4; ``Posdb.h`` diversityRank bits /
        ``XmlDoc::getDiversityVec`` — context-variety damping: a term
        always followed by the same word scores lower than one used in
        varied contexts)."""
        return self._wand_pos(terms, "diversity", k)

    def wand_phrase_topk(self, words: list[str], k: int = 10) -> DataFrame:
        """Exact-phrase top-k ON THE PACKED PATH: adjacency from the
        positions stream inside the bucket scorer (the
        intersectLists10_r span loop) — rank-identical to the
        relational phrase_bm25 (same oracle SQL)."""
        return self._wand_pos(
            list(dict.fromkeys(words)), "phrase", k, words=words
        )

    def wand_proximity_topk(
        self, terms: list[str], k: int = 10, prox_w: float = 0.5
    ) -> DataFrame:
        """Proximity-boosted BM25 on the packed path: score =
        BM25_AND + W/mindist with mindist from the positions stream
        (PosdbTable sliding-window analogue); same oracle as the
        relational proximity_bm25."""
        if len(dict.fromkeys(terms)) != 2:
            raise ValueError(
                "proximity requires exactly two distinct terms "
                f"(got {terms!r})"
            )
        return self._wand_pos(
            terms, "proximity", k, words=terms, prox_w=prox_w
        )

    def field_boosted_topk(
        self,
        terms: list[str],
        field: str,
        weight: float,
        k: int = 10,
        label_map: DataFrame | None = None,
        round_to: int | None = 4,
    ) -> DataFrame:
        """Hashgroup-boosted top-k FROM THE ONE INDEX: body BM25 +
        weight·saturation over the build-time ``{field}:term``
        postings (``XmlDoc::hashIncomingLinkText`` / ``hashTitle`` —
        the reference indexes inlink-text/title keys at build time and
        scores them as weighted hashgroups in the same intersect).

        idf always comes from the BODY df (one termFreq source); a
        term with no body presence contributes nothing, matching the
        relational ``linkextract.field_boosted_topk``. ``label_map``
        (docid, label) — e.g. the docid↔url map for a web store —
        re-labels output docids and makes the final tie-break run on
        the label, identical to the relational/oracle ordering.
        """
        terms = list(dict.fromkeys(terms))
        body_rows = self._term_rows(terms)
        if not body_rows:
            # match the non-empty path's schema: label_map outputs
            # re-label docid as a string (review fix — an empty
            # bigint frame broke unions with labelled results)
            return self.spark.createDataFrame(
                [],
                "docid string, score double"
                if label_map is not None else SCORE_SCHEMA,
            )
        n = float(self.n_docs)
        idf_of_term = {
            r["term"]: float(
                np.log((n - r["df"] + 0.5) / (r["df"] + 0.5) + 1.0)
            )
            for r in body_rows
        }
        body_idf = {
            int(r["termid"]): idf_of_term[r["term"]] for r in body_rows
        }
        f_rows = self._term_rows(
            [f"{field}:{t}" for t in terms if t in idf_of_term]
        )
        field_widf = {
            int(r["termid"]): weight
            * idf_of_term[r["term"].split(":", 1)[1]]
            for r in f_rows
        }
        termids = list(body_idf) + list(field_widf)
        blocks = self.packed.filter(
            F.col("termid").isin(termids)
        ).withColumn("inv_avgdl", F.lit(1.0 / self.avgdl))

        cut = self._seed_cut(
            termids, _make_field_scorer(body_idf, field_widf, k), k, round_to
        )

        result = (
            _project_scorer_cols(blocks)
            .groupBy("bucket")
            .applyInPandas(
                _make_field_scorer(body_idf, field_widf, k, cut),
                schema=SCORE_SCHEMA,
            )
        )
        score = (
            F.round(F.col("score"), round_to) if round_to else F.col("score")
        )
        if label_map is not None:
            return (
                result.join(F.broadcast(label_map), "docid")
                .select(F.col("label").alias("docid"), score.alias("score"))
                .orderBy(F.desc("score"), F.asc("docid"))
                .limit(k)
            )
        return (
            result.select("docid", score.alias("score"))
            .orderBy(F.desc("score"), F.asc("docid"))
            .limit(k)
        )

    def prune_stats(
        self,
        terms: list[str],
        k: int = 10,
        mode: str = "and",
        neg_terms: list[str] | None = None,
    ) -> dict:
        """Diagnostic: block-max pruning effectiveness for a query at
        BOTH granules — buckets (the semi-join / partition granule)
        and sub-block rows (the Ding & Suel granule the scorer and
        the JVM row filter actually skip at). Pure-JVM aggregates over
        the scalar blockmax columns via the SAME ``_block_survivors``
        test the query path applies — shared so the diagnostic can't
        drift from the plan."""
        ctx = self._query_ctx(terms, k, mode, neg_terms)
        if ctx is None:
            return {"buckets": 0, "buckets_scored": 0,
                    "blocks": 0, "blocks_scored": 0,
                    "bytes_total": 0, "bytes_scored": 0,
                    "bytes_total_blocks": 0,
                    "bytes_scored_blocks": 0, "cut": None}
        per_bucket = _bucket_upper_bounds(
            ctx["blocks"], ctx["idf"], with_bytes=True
        )
        need = len(ctx["required"]) or None
        rows = per_bucket.collect()
        cut = ctx["cut"]
        scored = [
            r for r in rows
            if float(r["ub"]) >= cut and (need is None or r["nterms"] == need)
        ]
        nb = (
            F.octet_length("docids")
            + F.octet_length("tfs")
            + F.octet_length("dls")
        )
        if cut == float("-inf"):
            blk = ctx["blocks"].agg(
                F.count(F.lit(1)).alias("blocks"),
                F.count(F.lit(1)).alias("blocks_scored"),
                F.sum(nb).alias("bytes_total_blocks"),
                F.sum(nb).alias("bytes_scored_blocks"),
            ).first()
        else:
            keep = (F.col("bucket_ub") >= F.lit(cut)) & F.col("row_keep")
            if need is not None:
                keep = keep & (F.col("nterms") == need)
            keep = F.coalesce(keep, F.lit(False))
            blk = (
                _block_survivors(ctx["blocks"], ctx["idf"], cut)
                .agg(
                    F.count(F.lit(1)).alias("blocks"),
                    F.sum(keep.cast("long")).alias("blocks_scored"),
                    F.sum(nb).alias("bytes_total_blocks"),
                    F.sum(
                        F.when(keep, nb).otherwise(F.lit(0))
                    ).alias("bytes_scored_blocks"),
                )
                .first()
            )
        return {
            "buckets": len(rows),
            "buckets_scored": len(scored),
            "blocks": int(blk["blocks"] or 0),
            "blocks_scored": int(blk["blocks_scored"] or 0),
            "bytes_total": int(sum(r["nb"] for r in rows)),
            "bytes_scored": int(sum(r["nb"] for r in scored)),
            # block-level totals span ALL fetched rows (incl. negative
            # terms, which always decode) — the bucket-level pair above
            # spans positive-term rows only, so use matching pairs when
            # computing skip fractions
            "bytes_total_blocks": int(blk["bytes_total_blocks"] or 0),
            "bytes_scored_blocks": int(blk["bytes_scored_blocks"] or 0),
            "cut": cut,
        }
