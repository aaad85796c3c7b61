"""Streaming ingest-time exact deduplication (the training-data
pipeline's front gate, run continuously).

Reference anchor: the reference dedups at index time from
``clusterdb``'s content hashes (``XmlDoc::getContentHash32`` checked
by ``Msg51``/``Dedup``); a training-data pipeline wants the same gate
at INGEST so duplicate documents never reach storage. Spark-native
shape: Structured Streaming ``foreachBatch`` where each micro-batch

1. hashes content (md5 — same 128-bit hash as the batch
   ``dedup_exact``, so 10^12 docs don't birthday-collide),
2. dedups WITHIN the batch (smallest docid wins — the batch
   operator's pinned rule),
3. anti-joins against the accumulated SEEN-HASH store (cross-batch
   dedup; first batch to present a hash wins, later duplicates drop),
4. appends survivors to the output and their hashes to the store,
   both under epoch-keyed dirs overwritten on replay (idempotent,
   the I7 contract the incremental indexer pins).

Scale notes:
- the seen store holds (h) only — 16-byte hashes, never text; the
  anti-join shuffles hashes and ids. At 10^12 docs, bucket the store
  by a hash prefix so the anti-join co-locates (same layout note as
  ``segments.save_bucketed``).
- state lives in PARQUET, not the streaming state store: exact-dedup
  state never expires (no watermark can bound "every hash ever
  seen"), so it must live somewhere compactable and restart-safe —
  the same reasoning the reference uses clusterdb (an Rdb) instead
  of memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _hadoop_fs(spark: SparkSession, root: str):
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(root)
    return path.getFileSystem(spark._jsc.hadoopConfiguration()), path


def _ensure_dir(spark: SparkSession, root: str) -> None:
    fs, path = _hadoop_fs(spark, root)
    fs.mkdirs(path)


def _epoch_dirs(spark: SparkSession, root: str, exclude: str) -> list:
    """Epoch subdirs of a store via the Hadoop FS API — works on any
    Spark filesystem (local, HDFS, S3A). A driver-local os.listdir
    would silently break the cross-batch gate the moment the store
    moves off the driver's disk (round-4 review fix)."""
    fs, path = _hadoop_fs(spark, root)
    if not fs.exists(path):
        return []
    out = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if name.startswith("epoch=") and name != exclude:
            out.append(st.getPath().toString())
    return out


def _hashed(batch: DataFrame) -> DataFrame:
    # NULL text hashes to NULL, and NULL never equi-joins: within a
    # batch the row_number window would collapse all NULL-h docs to
    # one survivor while the cross-batch left_anti join would never
    # drop them — inconsistent. Map NULL to a sentinel AFTER hashing
    # so both gates agree AND the grouping matches batch dedup_exact,
    # where groupBy puts NULL text in its own group, distinct from ''
    # (md5 output is 32 hex chars, so "null-text" cannot collide).
    return batch.withColumn(
        "h",
        F.coalesce(F.md5(F.col("text").cast("string")), F.lit("null-text")),
    )


def start_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    seen_dir: str,
    checkpoint_dir: str,
    schema: str = "docid long, text string",
):
    """Continuously dedup documents dropped into ``input_dir``;
    unique survivors land in ``out_dir`` (epoch-keyed parquet), the
    hash store accumulates under ``seen_dir``. Returns the
    StreamingQuery (availableNow trigger; stop() when drained)."""
    _ensure_dir(spark, seen_dir)
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def handle_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        hashed = _hashed(batch)
        # within-batch: smallest docid per hash (dedup_exact's rule)
        w = Window.partitionBy("h").orderBy(F.asc("docid"))
        firsts = (
            hashed.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        # cross-batch: drop hashes any EARLIER epoch admitted
        seen_files = _epoch_dirs(spark, seen_dir, f"epoch={epoch_id:06d}")
        if seen_files:
            seen = spark.read.parquet(*seen_files).select("h")
            firsts = firsts.join(seen, "h", "left_anti")
        firsts = firsts.cache()
        # epoch-keyed overwrite on both writes → replay-idempotent
        firsts.drop("h").write.mode("overwrite").parquet(
            out_dir + f"/epoch={epoch_id:06d}"
        )
        firsts.select("h").write.mode("overwrite").parquet(
            seen_dir + f"/epoch={epoch_id:06d}"
        )
        firsts.unpersist()

    return (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def deduped_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """The accumulated unique-document table (all epochs)."""
    return spark.read.parquet(out_dir)


def start_neardup_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    seen_dir: str,
    checkpoint_dir: str,
    max_hamming: int = 3,
    schema: str = "docid long, text string",
):
    """NEAR-dup gate at ingest: SimHash fingerprints + Manku banding
    against a persistent signature store. Policy (pinned): a document
    within Hamming ``max_hamming`` of a smaller-docid doc in its own
    batch, or of ANY signature an earlier epoch admitted, is dropped
    (first content in wins — same precedence as the exact gate).
    Within a batch a transitive chain collapses toward its smallest
    member (the batch ``dedup_clusters`` canonical-min rule); ACROSS
    epochs only ADMITTED docs' signatures are stored, so a chain
    A—B—C arriving over separate epochs keeps C when its only link
    into the component was the dropped B — streaming first-wins
    diverges from a batch re-cluster there by design (dropped docs'
    signatures would make the store grow with rejections, not with
    admitted content). Zero-token docs carry no signature and pass
    through untouched.

    Why this state shape: the store holds (docid, simhash) — 8-byte
    fingerprints, never text or shingles — so the cross-batch check
    is a band-bucket join + XOR popcount with NO re-read of admitted
    documents (a MinHash gate would need stored shingle sets for its
    verify; SimHash's verify IS the fingerprint distance)."""
    from ..operators.pipeline import (
        SIMHASH_BITS,
        hamming_pairs,
        simhash_bands,
        simhash_col_docs,
    )

    _ensure_dir(spark, seen_dir)
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def handle_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        sh = simhash_col_docs(batch).cache()
        # within-batch: any doc pairing with a smaller docid drops
        losers = (
            hamming_pairs(sh, max_hamming, nbits=SIMHASH_BITS)
            .select(F.col("doc_b").alias("docid"))
            .distinct()
        )
        keep = sh.join(losers, "docid", "left_anti")
        seen_files = _epoch_dirs(spark, seen_dir, f"epoch={epoch_id:06d}")
        if seen_files:
            seen = spark.read.parquet(*seen_files).select(
                "docid", "simhash"
            )
            nb = simhash_bands(keep, max_hamming, SIMHASH_BITS)
            sb = simhash_bands(seen, max_hamming, SIMHASH_BITS)
            hits = (
                nb.alias("x")
                .join(sb.alias("y"), ["q", "qval"])
                .filter(
                    F.bit_count(
                        F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
                    )
                    <= max_hamming
                )
                .select(F.col("x.docid").alias("docid"))
                .distinct()
            )
            keep = keep.join(hits, "docid", "left_anti")
        keep = keep.cache()
        # zero-token docs (NULL/empty/punctuation-only text) carry no
        # SimHash row at all — they near-duplicate nothing, so they
        # PASS this gate rather than silently vanishing (round-4
        # review fix; the EXACT gate is where empty-text dedup policy
        # lives). They contribute no signatures to the store.
        admitted = batch.join(
            keep.select("docid"), "docid", "left_semi"
        ).unionByName(
            batch.join(sh.select("docid"), "docid", "left_anti")
        )
        admitted.write.mode("overwrite").parquet(
            out_dir + f"/epoch={epoch_id:06d}"
        )
        keep.select("docid", "simhash").write.mode("overwrite").parquet(
            seen_dir + f"/epoch={epoch_id:06d}"
        )
        keep.unpersist()
        sh.unpersist()

    return (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
