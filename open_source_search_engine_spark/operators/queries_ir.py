"""IR-operator registry entries: index build + BM25 query surface
(SURVEY.md §2 rows C3/C6, E1/E2, D4–D6, D8, D14). Each entry pairs the
Spark implementation with its DuckDB oracle over the driver's
``documents(doc_id, text, …)`` view."""

from __future__ import annotations

from pyspark.sql import functions as F

from .bm25 import bm25_oracle_sql, bm25_topk
from .index_build import cached_index
from .registry import TOK_CTE, register

# --- C3/C6: exploded posting build ---------------------------------------


@register(
    "postings_build",
    f"""WITH {TOK_CTE}
SELECT p.docid, p.term, p.tf, d.dl AS doclen
FROM postings p JOIN doclen d USING (docid)""",
)
def postings_build(spark, sf_dir):
    idx = cached_index(spark, sf_dir)
    return idx.postings.select(
        "docid",
        "term",
        F.col("tf").cast("long").alias("tf"),
        F.col("doclen").cast("long").alias("doclen"),
    )


# --- E1: per-term stats (ref: Posdb::getTermFreq) ------------------------


@register(
    "term_stats",
    f"""WITH {TOK_CTE}
SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf, max(tf) AS max_tf
FROM postings GROUP BY term""",
)
def term_stats(spark, sf_dir):
    idx = cached_index(spark, sf_dir)
    return idx.term_stats.select(
        "term",
        "df",
        "cf",
        F.col("max_tf").cast("long").alias("max_tf"),
    )


# --- E2: per-doc length --------------------------------------------------


@register(
    "doc_stats",
    f"WITH {TOK_CTE} SELECT docid, dl AS doclen FROM doclen",
)
def doc_stats(spark, sf_dir):
    idx = cached_index(spark, sf_dir)
    return idx.doc_stats.select(
        "docid", F.col("doclen").cast("long").alias("doclen")
    )


# --- D4/D5/D6/D8: BM25 retrieval modes -----------------------------------


def _bm25(terms, mode="and", neg=None, k=10):
    def run(spark, sf_dir):
        idx = cached_index(spark, sf_dir)
        return bm25_topk(idx, terms, k=k, mode=mode, neg_terms=neg)

    return run


# Driver slots (D4/D5/D6/D8 need 3 rows across the two code paths):
# bm25_not exercises the relational scorer + negative termlists;
# wand_and / wand_or exercise the packed path's intersection and
# union. The other six mode variants are EXTENDED — same oracles,
# pytest-gated (see registry.py tier note).
register("bm25_single", bm25_oracle_sql(["join"]), extended=True)(
    _bm25(["join"])
)
register("bm25_and", bm25_oracle_sql(["join", "filter"]), extended=True)(
    _bm25(["join", "filter"])
)
register(
    "bm25_and3",
    bm25_oracle_sql(["join", "filter", "window"]),
    extended=True,
)(_bm25(["join", "filter", "window"]))
register(
    "bm25_or", bm25_oracle_sql(["join", "filter"], mode="or"), extended=True
)(_bm25(["join", "filter"], mode="or"))
register(
    "bm25_not", bm25_oracle_sql(["join"], neg_terms=["window"])
)(_bm25(["join"], neg=["window"]))


# --- D4b/O1: packed block-max WAND path ----------------------------------
# Checked against the *same* BM25 SQL oracle as the relational path —
# the packed codec + WAND pruning must reproduce identical top-k.

_PACKED: dict = {}


def _packed_index(spark, sf_dir, with_positions: bool = False):
    import tempfile

    from .segments import SegmentStore, build_segments
    from .wand import PackedIndex

    # keyed like cached_index/ensure_shipped: (applicationId, startTime)
    # cannot be recycled by a later context after GC, unlike id(sc).
    sc = spark.sparkContext
    key = (sc.applicationId, sc.startTime, sf_dir, with_positions)
    if key not in _PACKED:
        root = tempfile.mkdtemp(prefix="sfx_packed_")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumnRenamed(
            "doc_id", "docid"
        )
        store = build_segments(
            spark, docs, SegmentStore(root), n_segments=2, n_buckets=8,
            with_positions=with_positions,
        )
        _PACKED[key] = PackedIndex(spark, store)
    return _PACKED[key]


def _wand(terms, mode="and", neg=None, k=10):
    def run(spark, sf_dir):
        return _packed_index(spark, sf_dir).wand_topk(
            terms, k=k, mode=mode, neg_terms=neg
        )

    return run


register("wand_single", bm25_oracle_sql(["join"]), extended=True)(
    _wand(["join"])
)
register("wand_and", bm25_oracle_sql(["join", "filter"]))(
    _wand(["join", "filter"])
)
# wand_or → EXTENDED in r3: wand_and already drivers the packed
# intersection path and bm25_or/wand_or stay oracle-gated in pytest;
# the freed slot drivers redirect_resolve (A1).
register(
    "wand_or", bm25_oracle_sql(["join", "filter"], mode="or"), extended=True
)(_wand(["join", "filter"], mode="or"))
register(
    "wand_not",
    bm25_oracle_sql(["join"], neg_terms=["window"]),
    extended=True,
)(_wand(["join"], neg=["window"]))


# --- D4/D8 batched: multi-query WAND in ONE job (round-4 verdict #3) ------
# wand_topk_batch fuses Q queries into one scan + one bucket-scorer
# pass + one rank-per-query top-k; per query it is rank-identical to
# wand_topk (pinned in tests/test_wand_batch.py). The oracle is the
# UNION ALL of the same per-query BM25 SQL each single-query row uses
# — so the fused execution is held to exactly the per-query contract.

_BATCH_QSET: dict[str, list | tuple] = {
    "and2": ["join", "filter"],
    "or2": (["join", "window"], "or", None),
    "not1": (["join"], "and", ["window"]),
}


def _wand_batch(spark, sf_dir):
    return _packed_index(spark, sf_dir).wand_topk_batch(_BATCH_QSET, k=10)


def _batch_oracle(qset: dict) -> str:
    legs = []
    for qid, spec in qset.items():
        terms, mode, neg = (
            (spec, "and", None) if isinstance(spec, list) else spec
        )
        sql = bm25_oracle_sql(terms, mode=mode, neg_terms=neg)
        legs.append(
            f"SELECT '{qid}' AS query_id, docid, score FROM ({sql})"
        )
    return " UNION ALL ".join(legs)


register("wand_batch", _batch_oracle(_BATCH_QSET), extended=True)(
    _wand_batch
)


# --- C4: per-posting density/spam rank scoring (packed path) --------------
# The packed dens/spam streams (segments.py) carry one rank byte per
# posting; the scorer multiplies BM25 by ((8+dens)/16)·((16-spam)/16).
# Both ranks are integer-exact functions of (tf, doclen, adjacent
# repeats), so the oracle replays them from raw text.

DENSITY_TERMS = ["join", "filter"]

# positional tokenization + BM25-stats prologue shared by BOTH
# positional-rank oracles (the non-positional analogue is
# registry.TOK_CTE) — ONE copy so a token-spec change cannot
# desynchronize density from diversity
POS_TOK_CTE = """ptok AS (
  SELECT docid, unnest(t) AS term, generate_subscripts(t, 1) AS pos
  FROM (SELECT doc_id AS docid,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        FROM documents)
),
postings AS (SELECT docid, term, count(*) AS tf FROM ptok GROUP BY 1, 2),
doclen AS (SELECT docid, count(*) AS dl FROM ptok GROUP BY 1),
consts AS (
  SELECT (SELECT count(*) FROM doclen) AS n,
         (SELECT avg(dl) FROM doclen) AS avgdl
),
ts AS (SELECT term, count(*) AS df FROM postings GROUP BY term),"""

DENSITY_SQL = f"""
WITH {POS_TOK_CTE}
reps AS (
  SELECT docid, term, count(*) AS repeats
  FROM (SELECT docid, term, pos,
               lag(pos) OVER (PARTITION BY docid, term ORDER BY pos) AS pp
        FROM ptok)
  WHERE pos = pp + 1
  GROUP BY docid, term
),
ranks AS (
  SELECT p.docid, p.term, p.tf, d.dl,
         least(15, CAST(floor(log2(1 + (255 * p.tf) // d.dl)) AS BIGINT))
           AS dens,
         least(7, (8 * coalesce(r.repeats, 0)) // p.tf) AS spam
  FROM postings p
  JOIN doclen d USING (docid)
  LEFT JOIN reps r ON r.docid = p.docid AND r.term = p.term
),
scored AS (
  SELECT k.docid,
         sum( ln((c.n - t.df + 0.5)/(t.df + 0.5) + 1.0)
              * (k.tf * (1.2 + 1.0))
                / (k.tf + 1.2 * (1.0 - 0.75 + 0.75 * k.dl / c.avgdl))
              * ((8 + k.dens) / 16.0)
              * ((16 - k.spam) / 16.0) ) AS score
  FROM ranks k
  JOIN ts t ON k.term = t.term
  CROSS JOIN consts c
  WHERE k.term IN ({", ".join(f"'{t}'" for t in DENSITY_TERMS)})
  GROUP BY k.docid
  HAVING count(DISTINCT k.term) = {len(DENSITY_TERMS)}
)
SELECT docid, round(score, 4) AS score FROM scored
ORDER BY round(score, 4) DESC, docid ASC
LIMIT 10
"""


@register("density_bm25", DENSITY_SQL)
def density_bm25(spark, sf_dir):
    """C4 — per-posting rank metadata in scoring, served from the
    PACKED positional store (dens/spam varbyte streams decoded inside
    the WAND bucket scorer; ref: ``Posdb.h`` densityRank /
    wordSpamRank bits, ``XmlDoc::getDensityRanks`` /
    ``getWordSpamVec``)."""
    return _packed_index(spark, sf_dir, with_positions=True).wand_density_topk(
        DENSITY_TERMS, k=10
    )


# diversityRank (the third Posdb.h rank byte): div = distinct
# following-term count per posting, capped at 15 — context-variety
# damping (``XmlDoc::getDiversityVec``). Integer-exact, so the oracle
# replays it with a lead() window + count(DISTINCT).
DIVERSITY_SQL = f"""
WITH {POS_TOK_CTE}
nexts AS (
  SELECT docid, term,
         lead(term) OVER (PARTITION BY docid ORDER BY pos) AS nxt
  FROM ptok
),
divr AS (
  SELECT docid, term, least(15, count(DISTINCT nxt)) AS divrank
  FROM nexts GROUP BY docid, term
),
scored AS (
  SELECT p.docid,
         sum( ln((c.n - t.df + 0.5)/(t.df + 0.5) + 1.0)
              * (p.tf * (1.2 + 1.0))
                / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / c.avgdl))
              * ((8 + v.divrank) / 16.0) ) AS score
  FROM postings p
  JOIN ts t ON p.term = t.term
  JOIN doclen d ON p.docid = d.docid
  JOIN divr v ON v.docid = p.docid AND v.term = p.term
  CROSS JOIN consts c
  WHERE p.term IN ({", ".join(f"'{t}'" for t in DENSITY_TERMS)})
  GROUP BY p.docid
  HAVING count(DISTINCT p.term) = {len(DENSITY_TERMS)}
)
SELECT docid, round(score, 4) AS score FROM scored
ORDER BY round(score, 4) DESC, docid ASC
LIMIT 10
"""


@register("diversity_bm25", DIVERSITY_SQL, extended=True)
def diversity_bm25(spark, sf_dir):
    """C4 — the third per-posting rank byte (diversityRank) in
    scoring, from the packed divs stream (ref: ``Posdb.h``
    diversityRank bits, ``XmlDoc::getDiversityVec``)."""
    return _packed_index(
        spark, sf_dir, with_positions=True
    ).wand_diversity_topk(DENSITY_TERMS, k=10)


@register(
    "match_count",
    f"""WITH {TOK_CTE}
SELECT count(DISTINCT docid) AS n_hits FROM postings WHERE term = 'join'""",
    extended=True,  # D14's driver row is match_count_sampled
)
def match_count(spark, sf_dir):
    idx = cached_index(spark, sf_dir)
    return (
        idx.postings.filter(F.col("term") == "join")
        .agg(F.countDistinct("docid").alias("n_hits"))
    )
