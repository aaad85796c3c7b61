"""Inverted-index construction — the core ETL (SURVEY.md §2 C3/C6, E1/E2).

Reference anchors: ``Posdb.cpp: Posdb::makeKey`` (posting key build),
``XmlDoc.cpp: XmlDoc::hashAll`` (per-doc term hashing loop),
``Posdb::getTermFreq`` (E1 df stats), density ranks (E2 doc length).

Spark-first design: the whole exploded build is builtin exprs
(posexplode + two hash aggregations) — no Python in the hot path,
full whole-stage codegen. The *packed* (delta+varbyte) segment build
with salted skew handling lives in ``segments.py``; this module
produces the exploded relational form that Catalyst can optimize
freely, which is also the oracle-checkable form.

Scale notes (100 TB / 10^12 docs):
- ``explode`` multiplies rows ~300× (avgdl); the groupBy(docid, term)
  partial-aggregates map-side before shuffling, so the shuffle carries
  (docid, term, tf) not raw positions unless positions are requested.
- doclen = size(token array), computed *before* the explode and
  carried on each posting row (``first(doclen)`` in the agg), so the
  whole build is ONE shuffle and the query path never joins
  doc_stats at scale.
- final postings are repartitioned by termid — queries prune to the
  few partitions holding their terms (the Spark-native analogue of
  the reference's term-routed ``shardByTermId`` keys;
  ``Hostdb::getShardNum``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tokenizer import term_id

K1 = 1.2
B = 0.75


@dataclass
class InvertedIndex:
    """The queryable index: exploded postings + stats (+ global consts).

    postings:   termid, term, docid, tf, doclen[, positions, div]
    term_stats: termid, term, df, cf, max_tf   (ref: Posdb::getTermFreq)
    doc_stats:  docid, doclen
    """

    postings: DataFrame
    term_stats: DataFrame
    doc_stats: DataFrame
    n_docs: int
    avgdl: float

    def idf_col(self, df_col="df"):
        """BM25 idf = ln((N - df + 0.5)/(df + 0.5) + 1) (Robertson/Zaragoza '09)."""
        n = F.lit(float(self.n_docs))
        d = F.col(df_col)
        return F.log((n - d + 0.5) / (d + 0.5) + 1.0)

    def tfnorm_col(self, tf_col="tf", doclen_col="doclen"):
        tf = F.col(tf_col).cast("double")
        dl = F.col(doclen_col).cast("double")
        return (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / F.lit(self.avgdl)))


def build_index(
    docs: DataFrame,
    doc_col: str = "docid",
    text_col: str = "text",
    with_positions: bool = False,
    n_partitions: int | None = None,
    cache: bool = False,
    compute_globals: bool = True,
) -> InvertedIndex:
    """documents(doc_col, text_col) → InvertedIndex.

    One explode + groupBy(docid, term) (map-side combined) + window for
    doclen + groupBy(term) for stats. All JVM-side.
    """
    from ..tokenizer import tokens_col

    # doclen = token count = size of the token array — computed BEFORE
    # the explode, so it rides along each posting row and no second
    # shuffle (window over docid) is needed. One shuffle total.
    base = docs.select(
        F.col(doc_col).alias("docid"), tokens_col(text_col).alias("toks")
    )
    aggs = [
        F.count(F.lit(1)).cast("int").alias("tf"),
        F.first("doclen").alias("doclen"),
    ]
    if with_positions:
        # next-term per occurrence, derived from the token ARRAY
        # (zip with its shifted self) — a window lead() would cost a
        # second shuffle on docid before the (docid, term) agg; the
        # zip keeps the build at ONE shuffle. Feeds diversityRank:
        # div = distinct following-term count per posting (C4;
        # ``XmlDoc::getDiversityVec``). collect_set drops the NULL
        # that pads the last token, matching SQL count(DISTINCT).
        toks = (
            base.withColumn(
                "nxts",
                F.concat(
                    F.expr("slice(toks, 2, greatest(size(toks) - 1, 0))"),
                    F.array(F.lit(None).cast("string")),
                ),
            )
            .select(
                "docid",
                F.size("toks").cast("int").alias("doclen"),
                F.posexplode(F.arrays_zip("toks", "nxts")).alias("pos0", "z"),
            )
            .select(
                "docid",
                "doclen",
                (F.col("pos0") + 1).alias("pos"),
                F.col("z.toks").alias("term"),
                F.col("z.nxts").alias("nxt"),
            )
            # a token-LESS doc has toks=[] but nxts=[NULL]; arrays_zip
            # pads, so posexplode would emit one phantom term=NULL row
            # that skews n_docs/avgdl vs the non-positional build and
            # every oracle's consts CTE. Real tokens are never NULL.
            .filter(F.col("term").isNotNull())
        )
        aggs.append(F.sort_array(F.collect_list("pos")).alias("positions"))
        aggs.append(
            F.least(F.lit(15), F.size(F.collect_set("nxt")))
            .cast("int")
            .alias("div")
        )
    else:
        toks = base.select(
            "docid",
            F.size("toks").cast("int").alias("doclen"),
            F.posexplode("toks").alias("pos0", "term"),
        ).select(
            "docid", "doclen", (F.col("pos0") + 1).alias("pos"), "term"
        )
    postings = toks.groupBy("docid", "term").agg(*aggs)
    postings = postings.withColumn("termid", term_id("term"))
    if n_partitions:
        postings = postings.repartition(n_partitions, "termid")
    if cache:
        postings = postings.cache()

    term_stats = postings.groupBy("termid", "term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").cast("long").alias("cf"),
        F.max("tf").alias("max_tf"),
    )
    doc_stats = postings.groupBy("docid").agg(F.max("doclen").alias("doclen"))
    if cache:
        term_stats = term_stats.cache()
        doc_stats = doc_stats.cache()

    # The globals agg EXECUTES the whole build once. Callers that
    # supply avgdl externally (segmented builds use one corpus-wide
    # constant) skip it — n_docs/avgdl stay unset (0) and the caller
    # must not score through this index's idf/tfnorm columns.
    n_docs, avgdl = 0, 0.0
    if compute_globals:
        row = doc_stats.agg(
            F.count(F.lit(1)).alias("n"), F.avg("doclen").alias("avgdl")
        ).first()
        n_docs, avgdl = int(row["n"]), float(row["avgdl"])
    return InvertedIndex(
        postings=postings,
        term_stats=term_stats,
        doc_stats=doc_stats,
        n_docs=n_docs,
        avgdl=avgdl,
    )


def build_index_from_table(
    spark: SparkSession,
    sf_dir: str,
    table: str = "documents",
    doc_col: str = "doc_id",
    text_col: str = "text",
    **kw,
) -> InvertedIndex:
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
    return build_index(
        docs.withColumnRenamed(doc_col, "docid"), "docid", text_col, **kw
    )


_INDEX_CACHE: dict[tuple, InvertedIndex] = {}


def cached_index(spark: SparkSession, sf_dir: str, **kw) -> InvertedIndex:
    """Session-lifetime cache so the driver's many queries() calls reuse
    one built (and .cache()'d) index per sf_dir."""
    sc = spark.sparkContext
    key = (sc.applicationId, sc.startTime, sf_dir, tuple(sorted(kw.items())))
    if key not in _INDEX_CACHE:
        _INDEX_CACHE[key] = build_index_from_table(spark, sf_dir, cache=True, **kw)
    return _INDEX_CACHE[key]
