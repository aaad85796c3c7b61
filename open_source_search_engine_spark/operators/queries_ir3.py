"""Third operator-coverage batch (SURVEY.md §2 D14 approx counts,
B4/H5 ip: filter + ip↔int, B6 family filter, B8 filetype filter,
H7 JSON field indexing, F3 proximity scoring).

Reference anchors: ``Msg39`` docid-range-sampled hit estimation,
``Query.cpp`` FIELD_IP / ``ip.h: atoip`` (B4/H5),
``SearchInput::m_familyFilter`` + ``Speller``-adjacent content flags
(B6), ``Url::getExtension`` filetype terms (B8),
``Json.cpp``/``XmlDoc::hashJSONFields`` (H7), ``PosdbTable``
sliding-window proximity scoring (F3).

The driver ``documents`` table carries no ip/url/json columns, so the
fielded inputs are DERIVED DETERMINISTICALLY from doc ids on BOTH
sides (the established url_normalize pattern) — the operator under
test is the parsing/conversion/filter/scoring expression itself,
which runs on real strings in both engines.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from .bm25 import bm25_oracle_sql, bm25_topk
from .index_build import cached_index
from .registry import TOK_CTE, register


def _docs(spark, sf_dir):
    return (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .withColumnRenamed("doc_id", "docid")
    )


# --- D14: count estimation by docid-range sampling ------------------------

SAMPLE_MOD = 16

MATCH_COUNT_SAMPLED_SQL = f"""
WITH {TOK_CTE},
hits AS (
  SELECT DISTINCT docid FROM postings
  WHERE term = 'join' AND docid % {SAMPLE_MOD} = 0
)
SELECT CAST({SAMPLE_MOD} * count(*) AS BIGINT) AS est_matches FROM hits
"""


@register("match_count_sampled", MATCH_COUNT_SAMPLED_SQL)
def match_count_sampled(spark, sf_dir):
    """Estimated hit count from a 1/{mod} docid-range sample — the
    Msg39 shape: each docid split reports its count, the estimate
    extrapolates without reading the remaining ranges. Deterministic
    (modulus sampling), so oracle-checkable, unlike an HLL sketch."""
    idx = cached_index(spark, sf_dir)
    hits = (
        idx.postings.filter(
            (F.col("term") == "join") & (F.col("docid") % SAMPLE_MOD == 0)
        )
        .select("docid")
        .distinct()
    )
    return hits.agg(
        (F.lit(SAMPLE_MOD) * F.count(F.lit(1))).cast("long").alias(
            "est_matches"
        )
    )


# --- B4/H5: ip: filter + ip<->int conversion ------------------------------
# Deterministic ip per doc (both sides): 10.(docid%16).(docid%256).((docid*7)%256)

IP_EXPR_SPARK = (
    "concat('10.', CAST(docid % 16 AS STRING), '.', "
    "CAST(docid % 256 AS STRING), '.', CAST((docid * 7) % 256 AS STRING))"
)

IP_FILTER_SQL = """
WITH ips AS (
  SELECT doc_id AS docid,
         concat('10.', CAST(doc_id % 16 AS VARCHAR), '.',
                CAST(doc_id % 256 AS VARCHAR), '.',
                CAST((doc_id * 7) % 256 AS VARCHAR)) AS ip
  FROM documents
),
parsed AS (
  SELECT docid, ip,
         CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
       + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
       + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
       + CAST(string_split(ip, '.')[4] AS BIGINT) AS ip_int
  FROM ips
)
SELECT docid, ip, ip_int
FROM parsed
WHERE ip_int >= 167968768 AND ip_int < 168034304
"""


@register("ip_filter", IP_FILTER_SQL)
def ip_filter(spark, sf_dir):
    """ip: range filter (B4) through a REAL string→int conversion
    (H5, ref ``atoip``): the ip string is parsed back with split()
    — never shortcut from docid — then range-filtered on the int
    form (10.3.0.0/16 here: [167968768, 168034304))."""
    docs = _docs(spark, sf_dir).withColumn("ip", F.expr(IP_EXPR_SPARK))
    parts = F.split("ip", r"\.")
    ip_int = (
        parts.getItem(0).cast("long") * 16777216
        + parts.getItem(1).cast("long") * 65536
        + parts.getItem(2).cast("long") * 256
        + parts.getItem(3).cast("long")
    )
    return (
        docs.withColumn("ip_int", ip_int)
        .filter((F.col("ip_int") >= 167968768) & (F.col("ip_int") < 168034304))
        .select("docid", "ip", "ip_int")
    )


# --- B6: adult/family filter ----------------------------------------------

BLOCKED_TERMS = ["casino", "slow"]  # blocklist-file stand-in

FAMILY_FILTER_SQL = f"""
WITH {TOK_CTE},
flagged AS (
  SELECT DISTINCT docid FROM postings
  WHERE term IN ({", ".join(f"'{t}'" for t in BLOCKED_TERMS)})
)
SELECT d.doc_id AS docid,
       (d.doc_id IN (SELECT docid FROM flagged)) AS is_flagged
FROM documents d
"""


@register("family_filter", FAMILY_FILTER_SQL, extended=True)
def family_filter(spark, sf_dir):
    """Content flag from a blocked-term list (B6; ref:
    SearchInput::m_familyFilter — the reference flags docs at INDEX
    time and filters at query time; here the flag column is the
    indexed artifact and any query can anti-join it)."""
    idx = cached_index(spark, sf_dir)
    flagged = (
        idx.postings.filter(F.col("term").isin(BLOCKED_TERMS))
        .select("docid")
        .distinct()
        .withColumn("is_flagged", F.lit(True))
    )
    return (
        _docs(spark, sf_dir)
        .select("docid")
        .join(flagged, "docid", "left")
        .select(
            "docid", F.coalesce("is_flagged", F.lit(False)).alias("is_flagged")
        )
    )


# --- B8: filetype filter ---------------------------------------------------

EXTS = ["html", "pdf", "txt"]
URL_EXT_SPARK = (
    "concat('https://docs.example.com/f/', CAST(docid AS STRING), '.', "
    "element_at(array('html', 'pdf', 'txt'), CAST(docid % 3 AS INT) + 1))"
)

FILETYPE_SQL = """
WITH urls AS (
  SELECT doc_id AS docid,
         concat('https://docs.example.com/f/', CAST(doc_id AS VARCHAR), '.',
                ['html', 'pdf', 'txt'][(doc_id % 3) + 1]) AS url
  FROM documents
)
SELECT docid, url, regexp_extract(url, '\\.([a-z0-9]+)$', 1) AS filetype
FROM urls
WHERE regexp_extract(url, '\\.([a-z0-9]+)$', 1) = 'pdf'
"""


@register("filetype_filter", FILETYPE_SQL, extended=True)
def filetype_filter(spark, sf_dir):
    """filetype: constraint (B8; ref: Url::getExtension indexed as a
    synthetic term). The extension is parsed from the URL STRING with
    the pinned regex on both sides, then filtered."""
    docs = _docs(spark, sf_dir).withColumn("url", F.expr(URL_EXT_SPARK))
    ftype = F.regexp_extract("url", r"\.([a-z0-9]+)$", 1)
    return (
        docs.withColumn("filetype", ftype)
        .filter(F.col("filetype") == "pdf")
        .select("docid", "url", "filetype")
    )


# --- B6+B8 consolidated driver row -----------------------------------------
# One driver slot verifies BOTH metadata filters (same value-hash
# rigor — each source query's rows ride in under a kind tag); the
# standalone family_filter / filetype_filter variants stay
# oracle-paired in the extended (pytest) tier.

# Composes the standalone oracles as CTE subqueries (one source of
# truth — the DOC_ENRICH_SQL pattern): any change to the family or
# filetype oracle flows into this consolidated row automatically.
META_FILTERS_SQL = f"""
WITH fam AS ({FAMILY_FILTER_SQL}),
ft AS ({FILETYPE_SQL})
SELECT docid, 'family' AS kind,
       CASE WHEN is_flagged THEN 'flagged' ELSE 'ok' END AS val
FROM fam
UNION ALL
SELECT docid, 'filetype' AS kind, filetype AS val FROM ft
"""


@register("meta_filters", META_FILTERS_SQL)
def meta_filters(spark, sf_dir):
    """B6 family filter + B8 filetype filter in one driver row: the
    union of both filters' outputs under a kind tag (each branch is
    the same plan as its standalone extended variant)."""
    fam = family_filter(spark, sf_dir).select(
        "docid",
        F.lit("family").alias("kind"),
        F.when(F.col("is_flagged"), F.lit("flagged"))
        .otherwise(F.lit("ok"))
        .alias("val"),
    )
    ft = filetype_filter(spark, sf_dir).select(
        "docid", F.lit("filetype").alias("kind"), F.col("filetype").alias("val")
    )
    return fam.unionAll(ft)


# --- H7: JSON field indexing ----------------------------------------------

JSON_FIELD_SQL = """
SELECT doc_id AS docid,
       concat('lang:', lang) AS fterm_lang,
       concat('source:', source) AS fterm_source
FROM documents
WHERE lang = 'en' AND source IN ('src3', 'src7')
"""


@register("json_field_search", JSON_FIELD_SQL)
def json_field_search(spark, sf_dir):
    """JSON field:value synthetic terms (H7; ref: Json.cpp +
    XmlDoc::hashJSONFields — each JSON scalar becomes a field:value
    term). The Spark side serializes the doc metadata to a REAL JSON
    document and re-extracts the fields with get_json_object (the
    actual H7 operator); the oracle reads the same values from the
    columns the JSON was built from."""
    docs = _docs(spark, sf_dir).withColumn(
        "js", F.to_json(F.struct("lang", "source", "n_chars"))
    )
    lang = F.get_json_object("js", "$.lang")
    source = F.get_json_object("js", "$.source")
    return (
        docs.filter((lang == "en") & source.isin("src3", "src7"))
        .select(
            "docid",
            F.concat(F.lit("lang:"), lang).alias("fterm_lang"),
            F.concat(F.lit("source:"), source).alias("fterm_source"),
        )
    )


# --- E5: grouping sets / rollup -------------------------------------------

ROLLUP_SQL = """
SELECT coalesce(source, 'ALL') AS source,
       coalesce(lang, 'ALL') AS lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY ROLLUP (source, lang)
"""


@register("facet_rollup", ROLLUP_SQL)
def facet_rollup(spark, sf_dir):
    """Hierarchical facet rollup (E5 — absent in the reference, which
    accumulates one facet level at a time in PosdbTable; ROLLUP gives
    the (source), (source, lang) and grand-total tiers in ONE pass
    with partial aggregation, the Spark-native upgrade)."""
    return (
        _docs(spark, sf_dir)
        .rollup("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .select(
            F.coalesce("source", F.lit("ALL")).alias("source"),
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            "n_docs",
            "total_chars",
        )
    )


# --- D17: spell suggestion -------------------------------------------------

SPELL_INPUT = "fitler"  # classic transposition of 'filter'

SPELL_SQL = f"""
WITH {TOK_CTE},
ts AS (SELECT term, count(*) AS df FROM postings GROUP BY term)
SELECT term, CAST(df AS BIGINT) AS df,
       CAST(levenshtein(term, '{SPELL_INPUT}') AS BIGINT) AS dist
FROM ts
WHERE levenshtein(term, '{SPELL_INPUT}') <= 2
ORDER BY dist ASC, df DESC, term ASC
LIMIT 5
"""


@register("spell_suggest", SPELL_SQL, extended=True)
def spell_suggest(spark, sf_dir):
    """Spelling suggestion (D17; ref: ``Speller.cpp: getRecommendation``
    — candidates from the indexed dictionary ranked by popularity).
    Edit-distance ≤ 2 against the term dictionary, ranked by
    (distance, df).

    Round-4 verdict #7: the O(|vocab|·|q|²) full-DP levenshtein over
    EVERY dictionary row was the cost at a 10⁸-term web vocabulary.
    Now two cheap codegen prefilters run first, both IMPLIED by
    dist ≤ 2 so the answer set cannot change (pinned by the unchanged
    oracle):
    - length band: dist ≥ |len(t) − len(q)|, so |Δlen| ≤ 2;
    - missing-character count: a distinct char of q entirely absent
      from t costs ≥ 1 edit each (edits touch one occurrence apiece,
      and different absent chars need disjoint edits), so at most 2
      of q's distinct chars may be absent. (A first/last-character
      test is NOT implied — "coins"/"join" differ at both ends at
      dist 2 — so it is deliberately not used.)
    The survivors then pay a THRESHOLD levenshtein (banded DP, -1
    past the bound — O(|q|·threshold) per row instead of O(|q|²)).
    """
    idx = cached_index(spark, sf_dir)
    return (
        _spell_candidates(idx, SPELL_INPUT, 2)
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(5)
    )


def _spell_candidates(idx, q: str, max_dist: int):
    """Shared D17 candidate generator: (term, df, dist) rows within
    ``max_dist`` edits of ``q``, prefiltered as spell_suggest's
    docstring derives. The missing-character filter is skipped when q
    has ≤ max_dist distinct characters — it would be a tautology
    (every term trivially misses ≤ max_dist of them) paying per-row
    instr() work for zero pruning."""
    band = F.abs(F.length("term") - F.lit(len(q))) <= max_dist
    cand = idx.term_stats.filter(band)
    if len(set(q)) > max_dist:
        missing = None
        for c in sorted(set(q)):
            m = F.when(F.instr("term", c) == 0, 1).otherwise(0)
            missing = m if missing is None else missing + m
        cand = cand.filter(missing <= max_dist)
    dist = F.levenshtein(F.col("term"), F.lit(q), max_dist)
    return (
        cand.select(
            "term",
            F.col("df").cast("long").alias("df"),
            dist.cast("long").alias("dist"),
        )
        # threshold levenshtein returns -1 past max_dist
        .filter(F.col("dist") >= 0)
    )


# --- D18: scroll / deep pagination ----------------------------------------

SCROLL_SQL = f"""
WITH {TOK_CTE},
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
  WHERE p.term = 'join'
  GROUP BY p.docid
)
SELECT docid, score FROM scored
ORDER BY score DESC, docid ASC
LIMIT 10 OFFSET 10
"""


@register("scroll_page2", SCROLL_SQL, extended=True)
def scroll_page2(spark, sf_dir):
    """Deep pagination (D18; ref: ``Msg40`` re-query with a larger
    firstResultNum). Page 2 = top-20 minus top-10 by docid anti-join:
    two TakeOrderedAndProject passes, never a global single-partition
    window — the scale-safe scroll shape (each page costs one bounded
    top-k, like the reference's re-query-with-offset)."""
    idx = cached_index(spark, sf_dir)
    top20 = bm25_topk(idx, ["join"], k=20)
    top10 = bm25_topk(idx, ["join"], k=10)
    return (
        top20.join(top10.select("docid"), "docid", "left_anti")
        .orderBy(F.desc("score"), F.asc("docid"))
    )


# --- D17+D18 combined family slot ------------------------------------------

SUGGEST_PAGED_INPUT = "stat"  # 11 dist≤3 candidates at sf0.01 — page 2
#                               is non-trivial for the driver's hash gate

SUGGEST_PAGED_SQL = f"""
WITH {TOK_CTE},
ts AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
cand AS (
  SELECT term, CAST(df AS BIGINT) AS df,
         CAST(levenshtein(term, '{SUGGEST_PAGED_INPUT}') AS BIGINT) AS dist
  FROM ts
  WHERE levenshtein(term, '{SUGGEST_PAGED_INPUT}') <= 3
)
SELECT term, df, dist FROM cand
ORDER BY dist ASC, df DESC, term ASC
LIMIT 3 OFFSET 3
"""


@register("suggest_paged", SUGGEST_PAGED_SQL)
def suggest_paged(spark, sf_dir):
    """Combined D17+D18 driver slot (round-4 verdict #4: rotate the
    2.x fringe subsystems into the primary tier by consolidating this
    pair the way the bm25/wand matrix was folded): page 2 of the
    spelling suggestions for a misspelled query.

    Exercises BOTH family code paths in one oracle-paired query —
    D17's dictionary suggestion machinery via the shared
    ``_spell_candidates`` prefilter+threshold-levenshtein pipeline
    (for this input the missing-character filter is correctly elided:
    'stat' has only 3 distinct chars, so "≤ 3 missing" would pass
    every row; ``Speller.cpp: getRecommendation``) and D18's
    scale-safe paging shape (two bounded TakeOrderedAndProject
    passes + anti-join — never a global single-partition window;
    ``Msg40`` re-query-with-offset). The single-behavior variants
    stay oracle-paired in the extended tier (``spell_suggest``,
    ``scroll_page2``)."""
    idx = cached_index(spark, sf_dir)
    cand = _spell_candidates(idx, SUGGEST_PAGED_INPUT, 3)
    order = [F.asc("dist"), F.desc("df"), F.asc("term")]
    top6 = cand.orderBy(*order).limit(6)
    top3 = cand.orderBy(*order).limit(3)
    return top6.join(top3.select("term"), "term", "left_anti").select(
        "term", "df", "dist"
    )


# --- E4: build-stats table (Statsdb analogue) -----------------------------

BUILD_STATS_SQL = """
WITH toks AS (
  SELECT doc_id AS docid,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents
),
per_doc AS (
  -- only docs with >=1 token: the Spark side derives docs from
  -- doc_stats (postings-bearing docs), and a token-less doc has no
  -- posting row; counting it here would diverge
  SELECT docid, doc_id_seg, len(t) AS dl,
         len(list_distinct(t)) AS n_terms
  FROM (SELECT docid, docid % 3 AS doc_id_seg, t FROM toks)
  WHERE len(t) > 0
)
SELECT concat('seg-', lpad(CAST(doc_id_seg AS VARCHAR), 5, '0'))
         AS segment_id,
       'committed' AS status,
       CAST(sum(n_terms) AS BIGINT) AS rows,
       CAST(count(*) AS BIGINT) AS docs,
       CAST(sum(dl) AS BIGINT) AS sum_doclen
FROM per_doc
GROUP BY doc_id_seg
"""

_STORE_CACHE: dict[tuple, object] = {}


@register("build_stats", BUILD_STATS_SQL)
def build_stats(spark, sf_dir):
    """E4 stats table (ref: ``Statsdb`` — per-period build/ops metrics
    queryable like any table). Runs a real segmented build (modulo
    split so the oracle reproduces the segment assignment) and reads
    the manifest back: per segment, committed posting rows, docs and
    doclen mass — the lineage record that makes a killed 10^12-doc
    build resumable and auditable."""
    import tempfile

    from .segments import SegmentStore, build_segments

    sc = spark.sparkContext
    key = (sc.applicationId, sc.startTime, sf_dir)
    if key not in _STORE_CACHE:
        root = tempfile.mkdtemp(prefix="build_stats_")
        docs = _docs(spark, sf_dir)
        _STORE_CACHE[key] = build_segments(
            spark,
            docs,
            SegmentStore(root),
            n_segments=3,
            segment_col=F.pmod(F.col("docid"), F.lit(3)),
        )
    store = _STORE_CACHE[key]
    return store.manifest(spark).select(
        "segment_id",
        "status",
        F.col("rows").cast("long").alias("rows"),
        F.col("docs").cast("long").alias("docs"),
        F.col("sum_doclen").cast("long").alias("sum_doclen"),
    )


JSON_PROPS_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
GROUP BY event_type
"""


@register("json_props_rollup", JSON_PROPS_SQL, extended=True)
def json_props_rollup(spark, sf_dir):
    """JSON extraction over a REAL json column (H7; the events.props
    payload): filter + rollup on an extracted field — both engines
    parse the same JSON strings."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
        )
    )


# --- I3: priority scheduling ----------------------------------------------

PRIORITY_SQL = """
WITH ranked AS (
  SELECT event_id, user_id, value AS priority,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id ASC) AS r
  FROM events
)
SELECT event_id, user_id, round(priority, 4) AS priority,
       CAST(r AS BIGINT) AS site_seq
FROM ranked
ORDER BY r ASC, priority DESC, event_id ASC
LIMIT 20
"""


@register("priority_schedule", PRIORITY_SQL)
def priority_schedule(spark, sf_dir):
    """Priority scheduling with per-source fairness (I3; ref:
    Spiderdb priority queues + SpiderLoop's per-IP round-robin doling:
    highest-priority item per site first, sites interleaved). Window
    rank within site, then global order by (site_seq, priority) —
    the doled-out order; one window shuffle keyed by site."""
    from pyspark.sql import Window

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    w = Window.partitionBy("user_id").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.round(F.col("value"), 4).alias("priority"),
            F.row_number().over(w).cast("long").alias("site_seq"),
        )
        .orderBy(F.asc("site_seq"), F.desc("priority"), F.asc("event_id"))
        .limit(20)
    )


# --- F3: proximity scoring -------------------------------------------------

PROX_TERMS = ["join", "filter"]
PROX_W = 0.5

# positional tokenization CTE (DuckDB): 1-based token ordinals, the
# pinned position spec (tokenizer.py).
POS_TOK_CTE = """
ptok AS (
  SELECT docid, unnest(t) AS term, generate_subscripts(t, 1) AS pos
  FROM (SELECT doc_id AS docid,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        FROM documents)
)"""

PROXIMITY_SQL = f"""WITH {TOK_CTE},
{POS_TOK_CTE.strip()},
consts AS (
  SELECT (SELECT count(*) FROM doclen) AS n,
         (SELECT avg(dl) FROM doclen) AS avgdl
),
ts AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
base AS (
  SELECT p.docid,
         sum( ln((c.n - t.df + 0.5)/(t.df + 0.5) + 1.0)
              * (p.tf * (1.2 + 1.0))
                / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / c.avgdl)) )
           AS score
  FROM postings p
  JOIN ts t ON p.term = t.term
  JOIN doclen d ON p.docid = d.docid
  CROSS JOIN consts c
  WHERE p.term IN ('{PROX_TERMS[0]}', '{PROX_TERMS[1]}')
  GROUP BY p.docid
  HAVING count(DISTINCT p.term) = 2
),
spans AS (
  SELECT a.docid, min(abs(a.pos - b.pos)) AS mindist
  FROM ptok a JOIN ptok b ON a.docid = b.docid
  WHERE a.term = '{PROX_TERMS[0]}' AND b.term = '{PROX_TERMS[1]}'
  GROUP BY a.docid
)
SELECT b.docid,
       round(b.score + {PROX_W} / s.mindist, 4) AS score
FROM base b JOIN spans s ON b.docid = s.docid
ORDER BY round(b.score + {PROX_W} / s.mindist, 4) DESC, b.docid ASC
LIMIT 10
"""


@register("proximity_bm25", PROXIMITY_SQL)
def proximity_bm25(spark, sf_dir):
    """Proximity-boosted BM25 (F3; ref: PosdbTable's sliding-window
    span scoring — closer query terms score higher). Pinned spec:
    score = BM25_AND + {W}/mindist where mindist is the minimum token
    distance between any occurrence pair of the two terms. The span
    join runs only over the two terms' position lists (pruned at the
    scan), grouped per doc — one shuffle keyed by docid."""
    idx = cached_index(spark, sf_dir, with_positions=True)
    base = bm25_topk(idx, PROX_TERMS, k=None, mode="and", round_to=None)
    p1 = idx.postings.filter(F.col("term") == PROX_TERMS[0]).select(
        "docid", F.explode("positions").alias("p1")
    )
    p2 = idx.postings.filter(F.col("term") == PROX_TERMS[1]).select(
        "docid", F.explode("positions").alias("p2")
    )
    spans = (
        p1.join(p2, "docid")
        .groupBy("docid")
        .agg(F.min(F.abs(F.col("p1") - F.col("p2"))).alias("mindist"))
    )
    boosted = base.join(spans, "docid").select(
        "docid",
        F.round(
            F.col("score") + F.lit(PROX_W) / F.col("mindist"), 4
        ).alias("score"),
    )
    return boosted.orderBy(F.desc("score"), F.asc("docid")).limit(10)


@register("wand_proximity", PROXIMITY_SQL, extended=True)
def wand_proximity(spark, sf_dir):
    """F3 on the PACKED path: mindist computed from the positions
    varbyte stream inside the WAND bucket scorer (searchsorted
    nearest-neighbour, the PosdbTable span loop) — same oracle as the
    relational proximity_bm25."""
    from .queries_ir import _packed_index

    return _packed_index(
        spark, sf_dir, with_positions=True
    ).wand_proximity_topk(PROX_TERMS, k=10, prox_w=PROX_W)


# --- D7/F3 batched: phrase + proximity + plain shapes in ONE job ----------
# wand_topk_batch's positional modes (round-5): a training-data
# pipeline mining phrase duplicates / co-occurrence pairs issues
# thousands of these; the batch fuses them with plain queries into one
# FlatMapGroupsInPandas pass. Oracle = UNION ALL of the SAME per-query
# SQL each single-query row uses, so the fusion is held to exactly the
# per-query contract (like wand_batch).

from .queries_search import (  # noqa: E402 — canonical D7 constants
    PHRASE,
    PHRASE_RESTRICT_CTE,
)

# built from the canonical single-query constants (PHRASE, PROX_TERMS,
# PROX_W) so batch specs cannot drift from the single-query rows whose
# oracles they reuse; the explicit prox_w entry exercises the
# per-query-weight spec element against the PROX_W-parameterized
# oracle.
_BATCH_POS_QSET: dict[str, tuple] = {
    "phrase": (list(PHRASE), "phrase", None),
    "prox": (list(PROX_TERMS), "proximity", None, PROX_W),
    "and2": (["join", "filter"], "and", None),
}

_BATCH_POS_ORACLE = " UNION ALL ".join(
    f"SELECT '{qid}' AS query_id, docid, score FROM ({sql})"
    for qid, sql in [
        (
            "phrase",
            bm25_oracle_sql(PHRASE, restrict_cte=PHRASE_RESTRICT_CTE),
        ),
        ("prox", PROXIMITY_SQL),
        ("and2", bm25_oracle_sql(["join", "filter"])),
    ]
)


@register("wand_batch_pos", _BATCH_POS_ORACLE, extended=True)
def wand_batch_pos(spark, sf_dir):
    from .queries_ir import _packed_index

    return _packed_index(
        spark, sf_dir, with_positions=True
    ).wand_topk_batch(_BATCH_POS_QSET, k=10)
