"""Streaming surface (SURVEY.md §2 I1-I7): incremental index builds
via Structured Streaming ``foreachBatch``, watermarked event-time
windows, and session windows.

Reference anchors: the reference's crawl loop continuously injects
documents (``Spider.cpp: SpiderLoop::spiderDoledUrls`` →
``Msg4::addMetaList`` → live RdbTree inserts, searchable immediately;
``Msg5`` merges tree + disk files). The Spark-native shape is
micro-batch appends: each batch becomes a packed postings segment +
manifest row (the RdbDump analogue), visible to queries at the next
snapshot — eventual, not live-tree (documented divergence, SURVEY.md
I4). The reference has NO event-time semantics (I5); watermarked
windows are included because the engine's `events` surface needs
them at 100 TB scale.

Scale notes:
- each micro-batch writes its own segment dir keyed by (epoch) —
  idempotent on replay (Msg4 replay idempotence, I7): reprocessing an
  epoch overwrites the same path.
- state for windowed aggs is bounded by the watermark; without it the
  state store grows unboundedly at 10^12-event scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.segments import SegmentStore, _append_manifest_row
from ..tokenizer import tokens_col


def start_incremental_index(
    spark: SparkSession,
    input_dir: str,
    store: SegmentStore,
    checkpoint_dir: str,
    n_buckets: int = 8,
    schema: str = "docid long, text string",
    with_positions: bool = False,
    min_files_to_merge: int | None = None,
    merge_width: int | None = None,
    max_files_per_trigger: int | None = None,
):
    """Continuously index documents dropped into ``input_dir``
    (parquet files): each micro-batch -> one packed segment + manifest
    row. Returns the StreamingQuery; stop() it when done.

    Checkpointing (I6): Spark's checkpoint tracks consumed files; the
    segment write is idempotent per epoch (overwrite-by-name), so a
    crash between segment write and checkpoint commit replays into the
    same path — exactly-once-ish (I7).

    ``with_positions`` must match the store's batch segments: a
    positional store (positions/dens/spam streams) appended with
    non-positional epochs would leave the unioned read with mixed
    schemas.

    ``min_files_to_merge`` arms the auto-compaction policy (the
    ``RdbBase::attemptMerge`` analogue — round-4 verdict's remaining
    scale-killer): after each committed epoch,
    ``segments.maybe_compact`` merges the smallest ``merge_width``
    segments whenever the store holds ≥ min_files_to_merge, keeping
    the per-query file fan-out bounded on an unbounded ingest. Off
    (None) by default — batch-built stores don't accrete segments.
    """
    import time as _time

    from ..operators.index_build import build_index
    from ..operators.segments import maybe_compact, pack_postings

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        # bounds per-epoch work on a backlog (and lets tests drive
        # many epochs through one availableNow run)
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(input_dir)

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        t0 = _time.time()
        if batch_df.isEmpty():
            return
        # replay guard: a crash AFTER this epoch's manifest commit but
        # BEFORE the checkpoint commit replays the epoch. Plain
        # replays are idempotent (overwrite-by-name), but if auto-
        # compaction already RETIRED this epoch's segment (merged its
        # postings into a compact-*), re-writing the dir + a fresh
        # 'committed' row would resurrect it alongside its compacted
        # copy — double-counting every doc it held. Skip: the data is
        # already in the store. Only possible — and only paid for —
        # when the compaction policy is armed: with it off nothing can
        # ever mark an epoch 'compacted', so the manifest read + window
        # + collect would be a per-epoch Spark job spent on a status
        # that cannot occur.
        if min_files_to_merge and os.path.exists(store.manifest_path):
            sid = f"stream-{epoch_id:06d}"
            st = (
                store.manifest_current(batch_df.sparkSession)
                .filter(F.col("segment_id") == sid)
                .select("status")
                .collect()
            )
            if st and st[0]["status"] == "compacted":
                return
        idx = build_index(
            batch_df, "docid", "text",
            compute_globals=False, with_positions=with_positions,
        )
        idx.postings.cache()
        packed = pack_postings(
            idx.postings, n_buckets, with_positions=with_positions
        )
        # Same partition-column name as the batch builder (segment=…):
        # a store holding batch segments AND streaming epochs reads as
        # one table; mixed segment= values would otherwise raise
        # Spark's conflicting-partition-columns error.
        seg_name = f"stream-{epoch_id:06d}"
        packed.write.mode("overwrite").parquet(store.segment_dir(seg_name))
        idx.term_stats.write.mode("overwrite").parquet(
            os.path.join(store.root, f"term_stats_partial/segment={seg_name}")
        )
        stats = idx.doc_stats.agg(
            F.count(F.lit(1)).alias("docs"), F.sum("doclen").alias("s")
        ).first()
        idx.postings.unpersist()
        _append_manifest_row(
            store.manifest_path,
            segment_id=f"stream-{epoch_id:06d}",
            part_lo=int(epoch_id),
            part_hi=int(epoch_id),
            status="committed",
            rows=-1,
            docs=int(stats["docs"]),
            # sum over an EMPTY doc_stats is NULL (a non-empty batch
            # of token-less docs produces zero postings) — a zero row
            # beats a TypeError that kills the StreamingQuery
            sum_doclen=int(stats["s"] or 0),
            wall_ms=int((_time.time() - t0) * 1000),
        )
        if min_files_to_merge:
            maybe_compact(
                batch_df.sparkSession,
                store,
                min_files_to_merge=min_files_to_merge,
                merge_width=merge_width,
            )

    return (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# event-time windows (I5) — streaming AND batch forms share the plan
# ---------------------------------------------------------------------------


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    streaming: bool = False,
) -> DataFrame:
    """Tumbling-window counts/sums per event_type. In streaming mode
    the watermark bounds state and admits late data up to its horizon;
    the batch form (same expression tree) is the DuckDB-checkable
    oracle surface."""
    if streaming:
        # watermarks require TIMESTAMP (LTZ); parquet event times load
        # as NTZ. The session is pinned UTC, so the cast is value-
        # preserving.
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
        src = events.withWatermark("ts", watermark)
    else:
        src = events
    return (
        src.groupBy(
            F.window("ts", window).alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("wstart"),
            "event_type",
            "n",
            "sum_value",
        )
    )


WINDOWED_EVENTS_SQL = """
SELECT date_trunc('hour', ts) AS wstart,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
"""


def sessionized_events(
    events: DataFrame,
    gap: str = "10 minutes",
    streaming: bool = False,
) -> DataFrame:
    """Session windows per user (gap-based). Spark-native
    ``session_window``; the batch oracle expresses the same semantics
    with the classic lag/cumsum session-id assignment."""
    if streaming:
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
        src = events.withWatermark("ts", "1 hour")
    else:
        src = events
    return (
        src.groupBy(
            F.session_window("ts", gap).alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
        )
    )


SESSIONIZED_SQL = """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 10 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered
)
SELECT min(ts) AS session_start, user_id,
       CAST(count(*) AS BIGINT) AS n_events
FROM sessions
GROUP BY user_id, sid
"""
