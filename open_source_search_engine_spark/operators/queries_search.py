"""Registry entries for the query-side surface (SURVEY.md §2 D1, D7,
D10-D16, B3/B7): phrase match, parsed queries, site clustering,
facets, range filter, sort-by-field, snippets.

Metadata-dependent ops use the driver ``documents`` columns directly:
``source`` plays the site role (B3 site:), ``n_chars`` the numeric
field (B7 gbmin:/gbmax:, D13 gbsortby:), ``lang`` the language filter
(B5)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from . import search as S
from .bm25 import bm25_oracle_sql
from .index_build import cached_index
from .registry import register

def _docs_meta(spark, sf_dir):
    return (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .withColumnRenamed("doc_id", "docid")
    )


def _pos_index(spark, sf_dir):
    return cached_index(spark, sf_dir, with_positions=True)


# --- D7: phrase query ------------------------------------------------------

PHRASE = ["table", "hash"]


def phrase_restrict_cte(w1: str, w2: str) -> str:
    """Bare CTE body selecting docids where w2 directly follows w1 —
    the positional tokenization inlined as subqueries."""
    return f"""
SELECT DISTINCT a.docid
FROM (SELECT docid, unnest(t) AS term, generate_subscripts(t, 1) AS pos
      FROM (SELECT doc_id AS docid,
                   regexp_extract_all(lower(text), '[a-z0-9]+') AS t
            FROM documents)) a
JOIN (SELECT docid, unnest(t) AS term, generate_subscripts(t, 1) AS pos
      FROM (SELECT doc_id AS docid,
                   regexp_extract_all(lower(text), '[a-z0-9]+') AS t
            FROM documents)) b
  ON a.docid = b.docid AND b.pos = a.pos + 1
WHERE a.term = '{w1}' AND b.term = '{w2}'
"""


PHRASE_RESTRICT_CTE = phrase_restrict_cte(*PHRASE)


@register(
    "phrase_bm25",
    bm25_oracle_sql(PHRASE, restrict_cte=PHRASE_RESTRICT_CTE),
)
def phrase_bm25(spark, sf_dir):
    return S.phrase_bm25(_pos_index(spark, sf_dir), PHRASE, k=10)


@register(
    "phrase_bm25_bigram",
    bm25_oracle_sql(PHRASE, restrict_cte=PHRASE_RESTRICT_CTE),
    extended=True,
)
def phrase_bm25_bigram(spark, sf_dir):
    """The same quoted query via the reference's bigram-termlist
    shortcut (Phrases::set): a 2-word phrase hit-set is ONE bigram
    termlist scan, zero positional work — same oracle, rank-identical
    to the positional phrase_bm25."""
    from .queries_ir2 import cached_bigrams

    return S.phrase_bm25(
        _pos_index(spark, sf_dir),
        PHRASE,
        k=10,
        bigrams=cached_bigrams(spark, sf_dir),
    )


@register(
    "wand_phrase",
    bm25_oracle_sql(PHRASE, restrict_cte=PHRASE_RESTRICT_CTE),
    extended=True,  # packed-path twin of phrase_bm25, same oracle
)
def wand_phrase(spark, sf_dir):
    """D7 on the PACKED path: adjacency from the positions varbyte
    stream inside the WAND bucket scorer — rank-identical to the
    relational phrase_bm25 (checked against the SAME oracle)."""
    from .queries_ir import _packed_index

    return _packed_index(spark, sf_dir, with_positions=True).wand_phrase_topk(
        PHRASE, k=10
    )


# --- D1: parsed end-to-end queries ----------------------------------------


@register(
    "search_parsed_phrase_not",
    bm25_oracle_sql(
        PHRASE,
        neg_terms=["slow"],
        restrict_cte=PHRASE_RESTRICT_CTE,
    ),
    extended=True,  # D1/D7 driver rows: phrase_bm25 + search_parsed_lang
)
def search_parsed_phrase_not(spark, sf_dir):
    return S.search(
        _pos_index(spark, sf_dir),
        _docs_meta(spark, sf_dir),
        '"table hash" -slow',
        k=10,
    )


@register(
    "search_parsed_lang",
    bm25_oracle_sql(
        ["join", "filter"],
        restrict_cte="SELECT doc_id AS docid FROM documents WHERE lang = 'en'",
    ),
)
def search_parsed_lang(spark, sf_dir):
    return S.search(
        cached_index(spark, sf_dir),
        _docs_meta(spark, sf_dir),
        "join filter lang:en",
        k=10,
    )


@register("search_parsed_or", bm25_oracle_sql(["join", "window"], mode="or"),
          extended=True)
def search_parsed_or(spark, sf_dir):
    return S.search(
        cached_index(spark, sf_dir),
        _docs_meta(spark, sf_dir),
        "join | window",
        k=10,
    )


def _syngroup_oracle():
    from .queries_ir2 import syngroup_sql

    return syngroup_sql(["join", "filter"])


@register("search_parsed_syn", _syngroup_oracle(), extended=True)
def search_parsed_syn(spark, sf_dir):
    """D1+D2 through the parser: ``syn:1`` turns on synonym-group
    expansion inside the boolean retrieval (ref: Synonyms.cpp —
    expansion widens recall, synonyms score at reduced weight but
    satisfy their base term's requiredness)."""
    return S.search(
        cached_index(spark, sf_dir),
        _docs_meta(spark, sf_dir),
        "join filter syn:1",
        k=10,
    )


# --- D10/F2: site clustering ----------------------------------------------

SITE_CLUSTER_SQL = f"""
WITH tok AS (
  SELECT doc_id AS docid, t.tokk AS term
  FROM documents, LATERAL unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(tokk)
  WHERE t.tokk <> ''
),
postings AS (
  SELECT docid, term, count(*) AS tf FROM tok GROUP BY docid, term
),
doclen AS (SELECT docid, count(*) AS dl FROM tok GROUP BY docid),
consts AS (
  SELECT (SELECT count(*) FROM doclen) AS n,
         (SELECT avg(dl) FROM doclen) AS avgdl
),
ts AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
scored AS (
  SELECT p.docid,
         round(sum( ln((c.n - t.df + 0.5)/(t.df + 0.5) + 1.0)
              * (p.tf * (1.2 + 1.0))
                / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / c.avgdl)) ), 4)
           AS score
  FROM postings p
  JOIN ts t ON p.term = t.term
  JOIN doclen d ON p.docid = d.docid
  CROSS JOIN consts c
  WHERE p.term IN ('join', 'filter')
  GROUP BY p.docid
  HAVING count(DISTINCT p.term) = 2
),
ranked AS (
  SELECT s.docid, s.score, d.source,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY s.score DESC, s.docid ASC) AS rn
  FROM scored s JOIN documents d ON d.doc_id = s.docid
)
SELECT docid, score, source AS site
FROM ranked WHERE rn <= 2
ORDER BY score DESC, docid ASC
LIMIT 10
"""


@register("site_cluster_topk", SITE_CLUSTER_SQL)
def site_cluster_topk(spark, sf_dir):
    return S.site_clustered_topk(
        cached_index(spark, sf_dir),
        _docs_meta(spark, sf_dir),
        ["join", "filter"],
        site_col="source",
        per_site=2,
        k=10,
    )


# --- D12: facets -----------------------------------------------------------

FACET_SQL = """
WITH tok AS (
  SELECT doc_id AS docid, t.tokk AS term
  FROM documents, LATERAL unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(tokk)
  WHERE t.tokk <> ''
),
hits AS (SELECT DISTINCT docid FROM tok WHERE term = 'join')
SELECT d.source AS facet_value, CAST(count(*) AS BIGINT) AS n
FROM hits h JOIN documents d ON d.doc_id = h.docid
GROUP BY d.source
"""


@register("facet_by_source", FACET_SQL, extended=True)
def facet_by_source(spark, sf_dir):
    return S.facet_counts(
        cached_index(spark, sf_dir), _docs_meta(spark, sf_dir), "join", "source"
    )


FACET_LANG_SQL = FACET_SQL.replace("d.source", "d.lang")


@register("facet_by_lang", FACET_LANG_SQL, extended=True)
def facet_by_lang(spark, sf_dir):
    return S.facet_counts(
        cached_index(spark, sf_dir), _docs_meta(spark, sf_dir), "join", "lang"
    )


# --- B7: numeric range + D13 sort-by --------------------------------------

RANGE_SQL = (
    bm25_oracle_sql(
        ["join"],
        restrict_cte=(
            "SELECT doc_id AS docid FROM documents "
            "WHERE n_chars >= 150 AND n_chars <= 300"
        ),
    )
    .replace(
        "SELECT s.docid, round(s.score, 4) AS score",
        "SELECT s.docid, round(s.score, 4) AS score, "
        "CAST(d2.n_chars AS BIGINT) AS nval",
    )
    .replace(
        "FROM scored s",
        "FROM scored s JOIN documents d2 ON d2.doc_id = s.docid",
    )
)


@register("range_filter_topk", RANGE_SQL)
def range_filter_topk(spark, sf_dir):
    return S.range_filter_topk(
        cached_index(spark, sf_dir),
        _docs_meta(spark, sf_dir),
        "join",
        "n_chars",
        150,
        300,
        k=10,
    )


SORTBY_SQL = """
WITH tok AS (
  SELECT doc_id AS docid, t.tokk AS term
  FROM documents, LATERAL unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(tokk)
  WHERE t.tokk <> ''
),
hits AS (SELECT DISTINCT docid FROM tok WHERE term = 'join')
SELECT h.docid, CAST(d.n_chars AS BIGINT) AS sval
FROM hits h JOIN documents d ON d.doc_id = h.docid
ORDER BY d.n_chars DESC, h.docid ASC
LIMIT 10
"""


@register("sortby_topk", SORTBY_SQL)
def sortby_topk(spark, sf_dir):
    return S.sortby_topk(
        cached_index(spark, sf_dir),
        _docs_meta(spark, sf_dir),
        "join",
        "n_chars",
        desc=True,
        k=10,
    )


SORTBY_FILTERED_SQL = """
WITH tok AS (
  SELECT doc_id AS docid, t.tokk AS term
  FROM documents, LATERAL unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(tokk)
  WHERE t.tokk <> ''
),
hits AS (SELECT DISTINCT docid FROM tok WHERE term = 'join'),
neg AS (SELECT DISTINCT docid FROM tok WHERE term = 'slow')
SELECT h.docid, CAST(d.n_chars AS BIGINT) AS sval
FROM hits h JOIN documents d ON d.doc_id = h.docid
WHERE d.lang = 'en' AND h.docid NOT IN (SELECT docid FROM neg)
ORDER BY d.n_chars DESC, h.docid ASC
LIMIT 10
"""


@register("search_sortby_filtered", SORTBY_FILTERED_SQL, extended=True)
def search_sortby_filtered(spark, sf_dir):
    """gbsortby: through the FULL parsed-search path — negation and
    metadata constraints apply before the field ordering (the round-1
    sortby path dropped them)."""
    return S.search(
        cached_index(spark, sf_dir),
        _docs_meta(spark, sf_dir),
        "join -slow lang:en sortby:n_chars",
        k=10,
    )


# --- D3: wiki-title phrase weighting ---------------------------------------


def load_wiki_titles() -> frozenset[str]:
    """Known-title phrase list from the packaged data file (ref:
    Wiki.cpp loads titledb's wikipedia-title hash table at startup;
    query bigrams that match a known title score as a unit)."""
    from importlib import resources

    text = (
        resources.files("open_source_search_engine_spark")
        .joinpath("data/wiki_titles.tsv")
        .read_text()
    )
    return frozenset(
        ln.strip() for ln in text.splitlines() if ln.strip()
    )


WIKI_TITLES = load_wiki_titles()
WIKI_W = 1.0


def wiki_title_boosted(idx, terms: list[str], k: int = 10):
    """BM25 (OR) + WIKI_W per query bigram that is a KNOWN title and
    appears adjacently in the doc (ref: Query.cpp m_inTitles /
    Posdb's wiki-bigram proximity weighting — 'hash table' as a
    title-phrase outranks scattered 'hash … table')."""
    from pyspark.sql import functions as FF

    from .bm25 import bm25_topk
    from .search import phrase_docids

    base = bm25_topk(idx, terms, k=None, mode="or", round_to=None)
    boosts = None
    for i in range(len(terms) - 1):
        if f"{terms[i]} {terms[i + 1]}" in WIKI_TITLES:
            ph = phrase_docids(idx, [terms[i], terms[i + 1]]).withColumn(
                "b", FF.lit(WIKI_W)
            )
            boosts = ph if boosts is None else boosts.unionAll(ph)
    if boosts is not None:
        boosts = boosts.groupBy("docid").agg(FF.sum("b").alias("b"))
        base = base.join(boosts, "docid", "left").select(
            "docid",
            (FF.col("score") + FF.coalesce("b", FF.lit(0.0))).alias("score"),
        )
    return (
        base.select("docid", FF.round("score", 4).alias("score"))
        .orderBy(FF.desc("score"), FF.asc("docid"))
        .limit(k)
    )


WIKI_TITLE_SQL = f"""
WITH tok AS (
  SELECT doc_id AS docid, t.tokk AS term
  FROM documents, LATERAL unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(tokk)
  WHERE t.tokk <> ''
),
postings AS (
  SELECT docid, term, count(*) AS tf FROM tok GROUP BY docid, term
),
doclen AS (SELECT docid, count(*) AS dl FROM tok GROUP BY docid),
consts AS (
  SELECT (SELECT count(*) FROM doclen) AS n,
         (SELECT avg(dl) FROM doclen) AS avgdl
),
ts AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
scored AS (
  SELECT p.docid,
         sum( ln((c.n - t.df + 0.5)/(t.df + 0.5) + 1.0)
              * (p.tf * (1.2 + 1.0))
                / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / c.avgdl)) )
           AS score
  FROM postings p
  JOIN ts t ON p.term = t.term
  JOIN doclen d ON p.docid = d.docid
  CROSS JOIN consts c
  WHERE p.term IN ('hash', 'table')
  GROUP BY p.docid
),
ph AS ({phrase_restrict_cte("hash", "table")})
SELECT s.docid,
       round(s.score + CASE WHEN s.docid IN (SELECT docid FROM ph)
                            THEN 1.0 ELSE 0 END, 4) AS score
FROM scored s
ORDER BY round(s.score + CASE WHEN s.docid IN (SELECT docid FROM ph)
                              THEN 1.0 ELSE 0 END, 4) DESC, s.docid ASC
LIMIT 10
"""


@register("wiki_title_bm25", WIKI_TITLE_SQL)
def wiki_title_bm25(spark, sf_dir):
    return wiki_title_boosted(_pos_index(spark, sf_dir), ["hash", "table"])


# --- G1/G2: nested boolean query ------------------------------------------

BOOL_RESTRICT_CTE = """
(SELECT docid FROM postings WHERE term = 'join')
INTERSECT
(SELECT docid FROM postings WHERE term IN ('window', 'merge'))
EXCEPT
(SELECT docid FROM postings WHERE term = 'slow')
"""


@register(
    "bool_search",
    bm25_oracle_sql(
        ["join", "window", "merge"],
        mode="or",
        restrict_cte=BOOL_RESTRICT_CTE,
    ),
)
def bool_search(spark, sf_dir):
    return S.bool_search(
        cached_index(spark, sf_dir),
        "join AND (window OR merge) AND NOT slow",
        k=10,
    )


# --- D15/D16: snippets — oracle-paired -------------------------------------
# The pinned snippet spec (search._best_snippet + extraction.
# highlight_terms) is SQL-expressible over canonical tokens: windows
# are list slices, the best window is the FIRST max of the per-window
# distinct-hit list (list_position returns the first occurrence), and
# the highlight wraps in-term tokens in <b>…</b>.

SNIP_TERMS = ["join", "filter"]
_SNIP_TLIST = ", ".join(f"'{t}'" for t in SNIP_TERMS)

SNIPPETS_SQL = f"""
WITH tok AS (
  SELECT doc_id AS docid, t.tokk AS term
  FROM documents, LATERAL unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(tokk)
  WHERE t.tokk <> ''
),
postings AS (
  SELECT docid, term, count(*) AS tf FROM tok GROUP BY docid, term
),
doclen AS (SELECT docid, count(*) AS dl FROM tok GROUP BY docid),
consts AS (
  SELECT (SELECT count(*) FROM doclen) AS n,
         (SELECT avg(dl) FROM doclen) AS avgdl
),
ts AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
scored AS (
  SELECT p.docid,
         round(sum( ln((c.n - t.df + 0.5)/(t.df + 0.5) + 1.0)
              * (p.tf * (1.2 + 1.0))
                / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / c.avgdl)) ), 4)
           AS score
  FROM postings p
  JOIN ts t ON p.term = t.term
  JOIN doclen d ON p.docid = d.docid
  CROSS JOIN consts c
  WHERE p.term IN ({_SNIP_TLIST})
  GROUP BY p.docid
  HAVING count(DISTINCT p.term) = {len(SNIP_TERMS)}
),
topk AS (
  SELECT docid, score FROM scored
  ORDER BY score DESC, docid ASC LIMIT 10
),
win AS (
  SELECT k.docid, k.score,
         regexp_extract_all(lower(d.text), '[a-z0-9]+') AS t
  FROM topk k JOIN documents d ON d.doc_id = k.docid
),
hits AS (
  SELECT docid, score, t,
         list_transform(range(0, greatest(1, len(t) - 9)),
           i -> len(list_distinct(list_filter(t[i+1:i+10],
                x -> x IN ({_SNIP_TLIST}))))) AS h
  FROM win
),
best AS (
  SELECT docid, score, t,
         list_max(h) AS n_hits,
         list_position(h, list_max(h)) - 1 AS best_i
  FROM hits
)
SELECT docid, score,
       array_to_string(t[best_i+1:best_i+10], ' ') AS snippet,
       array_to_string(list_transform(t[best_i+1:best_i+10],
           x -> CASE WHEN x IN ({_SNIP_TLIST})
                THEN '<b>' || x || '</b>' ELSE x END), ' ') AS snippet_hl,
       CAST(n_hits AS BIGINT) AS n_hits
FROM best
"""


@register("snippets_topk", SNIPPETS_SQL)
def snippets_topk(spark, sf_dir):
    idx = cached_index(spark, sf_dir)
    topk = S.bm25_topk(idx, SNIP_TERMS, k=10, mode="and")
    out = S.add_snippets(topk, _docs_meta(spark, sf_dir), SNIP_TERMS)
    return out.withColumn("n_hits", F.col("n_hits").cast("long"))
