"""Link-graph operators (SURVEY.md §2 C13/C14, E3): link extraction,
per-site unique-inlinker counts, siteRank.

Reference anchors: ``Links.cpp: Links::set`` (outlink extraction),
``Linkdb.h: Linkdb::makeKey_uk`` (link records keyed by linkee),
``Msg25.cpp: getLinkInfo`` (count distinct c-class inlinkers per
site), ``Posdb.h: getSiteRank`` (rank = f(#inlinks), folded into the
scoring multiplier).

The driver's ``documents`` table has no html/outlinks, so the edge
set is DERIVED DETERMINISTICALLY from doc ids (each doc "links to"
k pseudo-random targets via modular arithmetic) — a pure function
both Spark and the DuckDB oracle compute identically, which keeps the
graph ops (the part under test) oracle-checkable end to end.

Scale notes: inlink counting is one groupBy per linkee site over an
edge table that at web scale is ~20x the doc count; the count-
distinct uses ``approx_count_distinct`` in the scale path (exact in
the oracle-paired op — the approx variant can't hash-match a DuckDB
oracle). siteRank joins back to documents via broadcast of the small
per-site table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_FANOUT = 3


def synth_links(docs: DataFrame, fanout: int = N_FANOUT) -> DataFrame:
    """(src_docid, dst_docid, src_site): deterministic pseudo-edges —
    doc d links to (d*31 + 7*j + 1) mod n_docs for j in [0, fanout).
    Self-links dropped. n_docs is injected via a cross-joined count so
    the construction is a single deterministic expression tree."""
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    e = docs.select("docid", "source").crossJoin(F.broadcast(n))
    out = None
    for j in range(fanout):
        part = e.select(
            F.col("docid").alias("src_docid"),
            ((F.col("docid") * 31 + 7 * j + 1) % F.col("n_docs")).alias(
                "dst_docid"
            ),
            F.col("source").alias("src_site"),
        )
        out = part if out is None else out.unionAll(part)
    return out.filter(F.col("src_docid") != F.col("dst_docid"))


LINKS_CTE = """
links AS (
  SELECT d.doc_id AS src_docid,
         (d.doc_id * 31 + 7 * j.j + 1) % (SELECT count(*) FROM documents)
           AS dst_docid,
         d.source AS src_site
  FROM documents d, (SELECT unnest([0, 1, 2]) AS j) j
  WHERE d.doc_id <> (d.doc_id * 31 + 7 * j.j + 1)
                    % (SELECT count(*) FROM documents)
)
"""


def inlink_counts(docs: DataFrame, links: DataFrame) -> DataFrame:
    """Per linkee-site: total inlinks + distinct linker sites (the
    Msg25 'unique c-class inlinkers' count — linker site plays the
    c-class role here). Exact counts for the oracle; swap
    ``countDistinct`` -> ``approx_count_distinct`` at 10^12-edge
    scale."""
    linkee = docs.select(
        F.col("docid").alias("dst_docid"), F.col("source").alias("dst_site")
    )
    return (
        links.join(linkee, "dst_docid")
        .groupBy("dst_site")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_inlinks"),
            F.countDistinct("src_site").cast("long").alias("n_linker_sites"),
        )
    )


def site_rank(docs: DataFrame, links: DataFrame) -> DataFrame:
    """(docid, site_rank): log-bucketed rank from the doc's site
    inlinker count (ref: ``getSiteRank()`` maps #inlinks -> 0..15).
    rank = least(15, floor(log2(1 + n_linker_sites)))."""
    per_site = inlink_counts(docs, links).select(
        F.col("dst_site").alias("source"),
        F.least(
            F.lit(15),
            F.floor(F.log2(1 + F.col("n_linker_sites"))),
        )
        .cast("int")
        .alias("site_rank"),
    )
    return docs.select("docid", "source").join(
        F.broadcast(per_site), "source", "left"
    ).select(
        "docid", F.coalesce("site_rank", F.lit(0)).alias("site_rank")
    )


INLINK_SQL = f"""
WITH {LINKS_CTE.strip()},
linkee AS (SELECT doc_id AS dst_docid, source AS dst_site FROM documents)
SELECT e.dst_site,
       CAST(count(*) AS BIGINT) AS n_inlinks,
       CAST(count(DISTINCT l.src_site) AS BIGINT) AS n_linker_sites
FROM links l JOIN linkee e USING (dst_docid)
GROUP BY e.dst_site
"""

SITE_RANK_SQL = f"""
WITH {LINKS_CTE.strip()},
linkee AS (SELECT doc_id AS dst_docid, source AS dst_site FROM documents),
per_site AS (
  SELECT e.dst_site AS source,
         CAST(least(15, floor(log2(1 + count(DISTINCT l.src_site)))) AS INT)
           AS site_rank
  FROM links l JOIN linkee e USING (dst_docid)
  GROUP BY e.dst_site
)
SELECT d.doc_id AS docid, coalesce(p.site_rank, 0) AS site_rank
FROM documents d LEFT JOIN per_site p ON d.source = p.source
"""
