"""Real link extraction + anchor-text indexing over the webtext html
(SURVEY.md §2 C13/C14/E3, B3, D16).

Reference anchors: ``Links.cpp: Links::set`` (outlink extraction from
the parsed page), ``Msg25.cpp: getLinkInfo`` (per-site unique-inlinker
counts), ``XmlDoc::hashIncomingLinkText`` (anchor terms indexed into
the LINKEE), ``XmlDoc::hashUrl`` (site:/inurl: synthetic terms),
``Posdb.h: getSiteRank``, ``Title.cpp: Title::setTitle``.

Everything here runs over the input_hint-shaped webtext table
(url, warc_ts, html, text, lang) and is oracle-paired: the DuckDB
side regexes the SAME html with the SAME pinned patterns, so the
whole path — href extraction, relative-url resolution, host parsing,
anchor tokenization, BM25 math — is hash-checked end to end.

Pinned specs (v1):
- link     = ``<a href="([^"]*)">([^<]*)</a>`` (the generator's exact
  markup shape; a production crawler widens the pattern in both
  places at once).
- resolve  = absolute hrefs pass through; hrefs starting with '/'
  get the source page's ``scheme://host`` prefix.
- host(u)  = ``^https?://([^/]+)``.
- anchor tokens = ``[a-z0-9]+`` runs of the lowercased anchor text
  (the corpus tokenizer).

Scale notes: link extraction is embarrassingly parallel JVM regex
(whole-stage codegen, no Python). The inlink aggregation shuffles
(host, host) string pairs — at 10^12 edges swap the exact
countDistinct for approx_count_distinct (Msg25 itself approximates).
Anchor postings shuffle (url, term) — same salted-build shape as the
body index. The anchor-boost join is a broadcast of the query-term
rows, so the only data-scale shuffle is the per-doc score aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_webtext
from .index_build import InvertedIndex, build_index

LINK_RE = '<a href="([^"]*)">([^<]*)</a>'
HOST_RE = "^https?://([^/]+)"
SITE_RE = "^(https?://[^/]+)"
TOKEN_RE = "[a-z0-9]+"


def extract_links(web: DataFrame) -> DataFrame:
    """webtext(url, html, …) → (src_url, dst_url, anchor) edges.

    JVM-only: regexp_extract_all over the decoded html, one struct per
    match, exploded. Relative hrefs resolve against the source host.
    """
    h = F.col("html").cast("string")
    matches = F.regexp_extract_all(h, F.lit(LINK_RE), F.lit(0))
    pair = F.transform(
        matches,
        lambda m: F.struct(
            F.regexp_extract(m, LINK_RE, 1).alias("href"),
            F.regexp_extract(m, LINK_RE, 2).alias("anchor"),
        ),
    )
    exploded = web.select(
        F.col("url").alias("src_url"), F.explode(pair).alias("lk")
    ).select("src_url", F.col("lk.href").alias("href"),
             F.col("lk.anchor").alias("anchor"))
    prefix = F.regexp_extract("src_url", SITE_RE, 1)
    dst = F.when(
        F.col("href").startswith("http"), F.col("href")
    ).otherwise(F.concat(prefix, F.col("href")))
    return exploded.select(
        "src_url", dst.alias("dst_url"), "anchor"
    )


LINKS_SQL_CTE = f"""
pages AS (SELECT url, decode(html) AS h, text FROM read_parquet('{{path}}')),
rawlinks AS (
  SELECT url AS src_url,
         unnest(regexp_extract_all(h, '{LINK_RE}', 1)) AS href,
         unnest(regexp_extract_all(h, '{LINK_RE}', 2)) AS anchor
  FROM pages
),
links AS (
  SELECT src_url,
         CASE WHEN href LIKE 'http%' THEN href
              ELSE regexp_extract(src_url, '{SITE_RE}', 1) || href END
           AS dst_url,
         anchor
  FROM rawlinks
)"""


def inlink_counts_web(links: DataFrame) -> DataFrame:
    """Per linkee host: total inlinks + distinct linker hosts (the
    Msg25 unique c-class inlinker count over REAL extracted edges)."""
    return (
        links.select(
            F.regexp_extract("dst_url", HOST_RE, 1).alias("dst_host"),
            F.regexp_extract("src_url", HOST_RE, 1).alias("src_host"),
        )
        .groupBy("dst_host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_inlinks"),
            F.countDistinct("src_host").cast("long").alias("n_linker_hosts"),
        )
    )


def site_rank_web(links: DataFrame) -> DataFrame:
    """(dst_host, site_rank): log-bucketed 0..15 rank from the host's
    distinct-linker count (ref: getSiteRank). Derived from
    ``site_inlink_rank`` so the rank formula exists exactly once."""
    return site_inlink_rank(links).select("dst_host", "site_rank")


def site_inlink_rank(links: DataFrame) -> DataFrame:
    """(dst_host, n_inlinks, n_linker_hosts, site_rank): the E3 inlink
    aggregation AND its C14 siteRank derivation in one row — one
    driver slot hash-verifies both (the standalone forms stay in the
    extended pytest tier)."""
    return inlink_counts_web(links).select(
        "dst_host",
        "n_inlinks",
        "n_linker_hosts",
        F.least(
            F.lit(15), F.floor(F.log2(1 + F.col("n_linker_hosts")))
        ).cast("int").alias("site_rank"),
    )


def anchor_postings(links: DataFrame) -> DataFrame:
    """(docid=dst_url, term, ftf): anchor terms indexed into the
    LINKEE (ref: XmlDoc::hashIncomingLinkText — the anchor text
    scores the page it points AT, the signal a web engine runs on)."""
    toks = F.expr(f"regexp_extract_all(lower(anchor), '{TOKEN_RE}', 0)")
    return (
        links.select(F.col("dst_url").alias("docid"),
                     F.explode(toks).alias("term"))
        .groupBy("docid", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("ftf"))
    )


ANCHOR_W = 0.5  # anchor-component weight (ref: link-text weighting)
TITLE_W = 1.0   # title-component weight (ref: title hashgroup weight)
K1 = 1.2


def field_boosted_topk(
    idx: InvertedIndex,
    field_postings: DataFrame,
    terms: list[str],
    weight: float,
    k: int = 10,
) -> DataFrame:
    """BM25 body score + weight · field component, OR semantics.

    field component per (doc, term) = idf_t · (ftf·(k1+1))/(ftf+k1) —
    BM25 saturation with no length norm (anchor/title streams are
    short). idf comes from the BODY df (one stats table, the
    reference's single termFreq source). Docs matching only via the
    field still rank (full outer merge of the two component
    aggregates). This is the hashgroup-weighting shape
    (``Posdb.cpp`` HASHGROUP_INLINKTEXT / HASHGROUP_TITLE scores).
    """
    terms = list(dict.fromkeys(terms))
    qt = idx.term_stats.filter(F.col("term").isin(terms)).select(
        "term", idx.idf_col().alias("idf")
    )
    body = (
        idx.postings.join(F.broadcast(qt), "term")
        .withColumn("part", F.col("idf") * idx.tfnorm_col())
        .groupBy("docid")
        .agg(F.sum("part").alias("bscore"))
    )
    ftf = F.col("ftf").cast("double")
    fld = (
        field_postings.join(F.broadcast(qt), "term")
        .withColumn(
            "part",
            F.lit(weight) * F.col("idf") * (ftf * (K1 + 1.0)) / (ftf + K1),
        )
        .groupBy("docid")
        .agg(F.sum("part").alias("fscore"))
    )
    merged = body.join(fld, "docid", "full_outer").select(
        "docid",
        F.round(
            F.coalesce("bscore", F.lit(0.0))
            + F.coalesce("fscore", F.lit(0.0)),
            4,
        ).alias("score"),
    )
    return merged.orderBy(F.desc("score"), F.asc("docid")).limit(k)


def anchor_boosted_topk(
    idx: InvertedIndex, anchors: DataFrame, terms: list[str], k: int = 10
) -> DataFrame:
    """Anchor-text boost (XmlDoc::hashIncomingLinkText)."""
    return field_boosted_topk(idx, anchors, terms, ANCHOR_W, k)


def title_postings(web: DataFrame) -> DataFrame:
    """(docid=url, term, ftf) from the extracted <title> text — the
    title hashgroup (``XmlDoc::hashTitle``)."""
    toks = F.expr(f"regexp_extract_all(lower(title), '{TOKEN_RE}', 0)")
    return (
        titles(web)
        .select(F.col("url").alias("docid"), F.explode(toks).alias("term"))
        .groupBy("docid", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("ftf"))
    )


def title_boosted_topk(
    idx: InvertedIndex, web: DataFrame, terms: list[str], k: int = 10
) -> DataFrame:
    """Title-term boost (title hashgroup weighting)."""
    return field_boosted_topk(idx, title_postings(web), terms, TITLE_W, k)


def titles(web: DataFrame) -> DataFrame:
    """(url, title): pinned <title> extraction, JVM regex form (the
    python ``extraction.extract_title`` is the spec owner; equality on
    entity-free titles is pinned in pytest)."""
    h = F.col("html").cast("string")
    raw = F.regexp_extract(h, "<title[^>]*>(.*?)</title>", 1)
    return web.select(
        "url",
        F.trim(F.regexp_replace(raw, r"\s+", " ")).alias("title"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL builders (same pinned regexes over the same parquet)
# ---------------------------------------------------------------------------


def links_sql(path: str) -> str:
    return f"""WITH {LINKS_SQL_CTE.format(path=path)}
SELECT src_url, dst_url, anchor FROM links"""


def inlink_counts_sql(path: str) -> str:
    return f"""WITH {LINKS_SQL_CTE.format(path=path)}
SELECT regexp_extract(dst_url, '{HOST_RE}', 1) AS dst_host,
       CAST(count(*) AS BIGINT) AS n_inlinks,
       CAST(count(DISTINCT regexp_extract(src_url, '{HOST_RE}', 1)) AS BIGINT)
         AS n_linker_hosts
FROM links GROUP BY 1"""


def site_rank_sql(path: str) -> str:
    return f"""WITH {LINKS_SQL_CTE.format(path=path)}
SELECT regexp_extract(dst_url, '{HOST_RE}', 1) AS dst_host,
       CAST(least(15, floor(log2(1 + count(DISTINCT
            regexp_extract(src_url, '{HOST_RE}', 1))))) AS INT) AS site_rank
FROM links GROUP BY 1"""


def site_inlink_rank_sql(path: str) -> str:
    return f"""WITH {LINKS_SQL_CTE.format(path=path)}
SELECT regexp_extract(dst_url, '{HOST_RE}', 1) AS dst_host,
       CAST(count(*) AS BIGINT) AS n_inlinks,
       CAST(count(DISTINCT regexp_extract(src_url, '{HOST_RE}', 1)) AS BIGINT)
         AS n_linker_hosts,
       CAST(least(15, floor(log2(1 + count(DISTINCT
            regexp_extract(src_url, '{HOST_RE}', 1))))) AS INT) AS site_rank
FROM links GROUP BY 1"""


WEB_BM25_CTE = f"""
tok AS (
  SELECT url AS docid, t.tokk AS term
  FROM pages, LATERAL unnest(regexp_extract_all(lower(text), '{TOKEN_RE}'))
       AS t(tokk)
),
postings AS (
  SELECT docid, term, count(*) AS tf FROM tok GROUP BY docid, term
),
doclen AS (SELECT docid, count(*) AS dl FROM tok GROUP BY docid),
consts AS (
  SELECT (SELECT count(*) FROM doclen) AS n,
         (SELECT avg(dl) FROM doclen) AS avgdl
),
ts AS (SELECT term, count(*) AS df FROM postings GROUP BY term)"""


def anchor_bm25_sql(path: str, terms: list[str], k: int = 10) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""WITH {LINKS_SQL_CTE.format(path=path)},
{WEB_BM25_CTE},
apost AS (
  SELECT dst_url AS docid, t.tokk AS term, count(*) AS atf
  FROM links, LATERAL unnest(regexp_extract_all(lower(anchor), '{TOKEN_RE}'))
       AS t(tokk)
  GROUP BY 1, 2
),
idf AS (
  SELECT t.term, ln((c.n - t.df + 0.5)/(t.df + 0.5) + 1.0) AS idf
  FROM ts t CROSS JOIN consts c WHERE t.term IN ({tlist})
),
body AS (
  SELECT p.docid,
         sum(i.idf * (p.tf * ({K1} + 1.0))
             / (p.tf + {K1} * (1.0 - 0.75 + 0.75 * d.dl / c.avgdl)))
           AS bscore
  FROM postings p
  JOIN idf i ON p.term = i.term
  JOIN doclen d ON p.docid = d.docid
  CROSS JOIN consts c
  GROUP BY p.docid
),
anch AS (
  SELECT a.docid,
         sum({ANCHOR_W} * i.idf * (a.atf * ({K1} + 1.0)) / (a.atf + {K1}))
           AS ascore
  FROM apost a JOIN idf i ON a.term = i.term
  GROUP BY a.docid
)
SELECT coalesce(b.docid, a.docid) AS docid,
       round(coalesce(b.bscore, 0) + coalesce(a.ascore, 0), 4) AS score
FROM body b FULL JOIN anch a ON b.docid = a.docid
ORDER BY score DESC, docid ASC
LIMIT {k}"""


def site_filter_bm25_sql(
    path: str, terms: list[str], host: str, k: int = 10
) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""WITH pages AS (
  SELECT url, decode(html) AS h, text FROM read_parquet('{path}')
),
{WEB_BM25_CTE},
allowed AS (
  SELECT url AS docid FROM pages
  WHERE regexp_extract(url, '{HOST_RE}', 1) = '{host}'
),
scored AS (
  SELECT p.docid,
         sum(ln((c.n - t.df + 0.5)/(t.df + 0.5) + 1.0)
             * (p.tf * ({K1} + 1.0))
               / (p.tf + {K1} * (1.0 - 0.75 + 0.75 * d.dl / c.avgdl)))
           AS score
  FROM postings p
  JOIN ts t ON p.term = t.term
  JOIN doclen d ON p.docid = d.docid
  CROSS JOIN consts c
  WHERE p.term IN ({tlist})
  GROUP BY p.docid
  HAVING count(DISTINCT p.term) = {len(terms)}
)
SELECT s.docid, round(s.score, 4) AS score
FROM scored s JOIN allowed w ON s.docid = w.docid
ORDER BY round(s.score, 4) DESC, s.docid ASC
LIMIT {k}"""


def title_bm25_sql(path: str, terms: list[str], k: int = 10) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""WITH pages AS (
  SELECT url, decode(html) AS h, text FROM read_parquet('{path}')
),
{WEB_BM25_CTE},
tpost AS (
  SELECT url AS docid, t.tokk AS term, count(*) AS ftf
  FROM (SELECT url,
               trim(regexp_replace(
                    regexp_extract(h, '<title[^>]*>(.*?)</title>', 1),
                    '\\s+', ' ', 'g')) AS title
        FROM pages),
       LATERAL unnest(regexp_extract_all(lower(title), '{TOKEN_RE}'))
       AS t(tokk)
  GROUP BY 1, 2
),
idf AS (
  SELECT t.term, ln((c.n - t.df + 0.5)/(t.df + 0.5) + 1.0) AS idf
  FROM ts t CROSS JOIN consts c WHERE t.term IN ({tlist})
),
body AS (
  SELECT p.docid,
         sum(i.idf * (p.tf * ({K1} + 1.0))
             / (p.tf + {K1} * (1.0 - 0.75 + 0.75 * d.dl / c.avgdl)))
           AS bscore
  FROM postings p
  JOIN idf i ON p.term = i.term
  JOIN doclen d ON p.docid = d.docid
  CROSS JOIN consts c
  GROUP BY p.docid
),
fld AS (
  SELECT a.docid,
         sum({TITLE_W} * i.idf * (a.ftf * ({K1} + 1.0)) / (a.ftf + {K1}))
           AS fscore
  FROM tpost a JOIN idf i ON a.term = i.term
  GROUP BY a.docid
)
SELECT coalesce(b.docid, f.docid) AS docid,
       round(coalesce(b.bscore, 0) + coalesce(f.fscore, 0), 4) AS score
FROM body b FULL JOIN fld f ON b.docid = f.docid
ORDER BY score DESC, docid ASC
LIMIT {k}"""


def inurl_bm25_sql(
    path: str, terms: list[str], urltok: str, k: int = 10
) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""WITH pages AS (
  SELECT url, decode(html) AS h, text FROM read_parquet('{path}')
),
{WEB_BM25_CTE},
allowed AS (
  SELECT url AS docid FROM pages
  WHERE list_contains(regexp_extract_all(lower(url), '{TOKEN_RE}'),
                      '{urltok}')
),
scored AS (
  SELECT p.docid,
         sum(ln((c.n - t.df + 0.5)/(t.df + 0.5) + 1.0)
             * (p.tf * ({K1} + 1.0))
               / (p.tf + {K1} * (1.0 - 0.75 + 0.75 * d.dl / c.avgdl)))
           AS score
  FROM postings p
  JOIN ts t ON p.term = t.term
  JOIN doclen d ON p.docid = d.docid
  CROSS JOIN consts c
  WHERE p.term IN ({tlist})
  GROUP BY p.docid
  HAVING count(DISTINCT p.term) = {len(terms)}
)
SELECT s.docid, round(s.score, 4) AS score
FROM scored s JOIN allowed w ON s.docid = w.docid
ORDER BY round(s.score, 4) DESC, s.docid ASC
LIMIT {k}"""


def titles_sql(path: str) -> str:
    return f"""SELECT url,
       trim(regexp_replace(
            regexp_extract(decode(html), '<title[^>]*>(.*?)</title>', 1),
            '\\s+', ' ', 'g')) AS title
FROM read_parquet('{path}')"""


# ---------------------------------------------------------------------------
# session-scoped webtext index cache (mirrors index_build.cached_index)
# ---------------------------------------------------------------------------

_WEB_CACHE: dict[tuple, tuple] = {}


def cached_web(spark: SparkSession, n_docs: int):
    """(web_df, InvertedIndex keyed by url, links_df) — built once per
    session; every webtext query reuses the same cached tables."""
    sc = spark.sparkContext
    key = (sc.applicationId, sc.startTime, n_docs)
    if key not in _WEB_CACHE:
        web = load_webtext(spark, n_docs).cache()
        idx = build_index(
            web.select(F.col("url").alias("docid"), "text"), cache=True
        )
        links = extract_links(web).cache()
        _WEB_CACHE[key] = (web, idx, links)
    return _WEB_CACHE[key]


_WEB_STORE: dict[tuple, tuple] = {}


def cached_web_store(spark: SparkSession, n_docs: int):
    """(PackedIndex, label_map) over the webtext corpus with
    BUILD-TIME ``title:`` / ``anchor:`` field streams packed into the
    same segments as the body (ref: the reference hashes
    HASHGROUP_TITLE / HASHGROUP_INLINKTEXT posdb keys at index-build
    time — ``XmlDoc::hashTitle`` / ``hashIncomingLinkText`` — so
    field-boosted queries run from the ONE index, no per-query
    rebuild). label_map maps the 63-bit url-hash docids back to urls
    (covers link targets outside the corpus too: anchors score the
    page they point AT, which may be undiscovered)."""
    import tempfile

    from ..tokenizer import doc_id_from_url
    from .segments import SegmentStore, build_segments
    from .wand import PackedIndex

    sc = spark.sparkContext
    key = (sc.applicationId, sc.startTime, n_docs)
    if key not in _WEB_STORE:
        web, _, links = cached_web(spark, n_docs)
        docs = web.select(doc_id_from_url("url").alias("docid"), "text")
        fp = (
            title_postings(web)
            .select(
                doc_id_from_url("docid").alias("docid"),
                F.concat(F.lit("title:"), "term").alias("term"),
                F.col("ftf").alias("tf"),
            )
            .unionByName(
                anchor_postings(links).select(
                    doc_id_from_url("docid").alias("docid"),
                    F.concat(F.lit("anchor:"), "term").alias("term"),
                    F.col("ftf").alias("tf"),
                )
            )
        )
        store = build_segments(
            spark,
            docs,
            SegmentStore(tempfile.mkdtemp(prefix="sfx_webstore_")),
            n_segments=2,
            n_buckets=8,
            field_postings=fp,
        )
        label_map = (
            web.select("url")
            .unionByName(links.select(F.col("dst_url").alias("url")))
            .distinct()
            .select(
                doc_id_from_url("url").alias("docid"),
                F.col("url").alias("label"),
            )
            .cache()
        )
        _WEB_STORE[key] = (PackedIndex(spark, store), label_map)
    return _WEB_STORE[key]


# ---------------------------------------------------------------------------
# I1: crawl-frontier expansion (the crawl loop, minus the fetch)
# ---------------------------------------------------------------------------


def crawl_frontier(
    links: DataFrame, seeds: DataFrame, max_depth: int = 3
) -> DataFrame:
    """(url, depth): BFS min-hop distance from ``seeds`` over the
    extracted link graph, bounded by ``max_depth`` — the reference's
    crawl loop (``Spider.cpp``: seed → fetch → extract → enqueue
    unseen) with the fetch replaced by the already-extracted edges
    (A1/A2 need network; the LOOP itself is pure dataflow).

    Iterative frontier joins, one per depth level: frontier ⨝ links →
    unseen targets, union into visited. Each wave is a hash join on
    url; ``visited`` stays (url, depth) — no payloads ride the loop.
    Scale: identical shape to the iterative min-label CC in
    pipeline.py; depth is bounded (a real crawl bounds hops), each
    wave's anti-join prunes re-enqueues, and caching the frontier
    keeps waves O(new edges). Oracle: DuckDB WITH RECURSIVE replays
    min-hop BFS exactly.
    """
    edges = links.select(
        F.col("src_url").alias("src"), F.col("dst_url").alias("dst")
    ).distinct().cache()
    visited = seeds.select(
        F.col("url").cast("string").alias("url"), F.lit(0).alias("depth")
    ).distinct().cache()
    # cache edges too: every wave joins it, and via spider_cycle the
    # uncached plan re-ran the whole robots/redirect gating join chain
    # per wave (max_depth-1 redundant distinct shuffles per call)
    caches = [visited, edges]
    frontier = visited
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(edges, frontier.url == edges.src)
            .select(F.col("dst").alias("url"))
            .distinct()
            .join(visited.select("url"), "url", "left_anti")
            .withColumn("depth", F.lit(d))
            .cache()
        )
        caches.append(nxt)
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).cache()
        caches.append(visited)
        frontier = nxt
    # the wave caches exist to keep each anti-join from recomputing
    # the whole prefix; eagerly checkpoint the (small) result and
    # release them so repeated calls never accumulate executor storage
    out = visited.localCheckpoint()
    for c in caches:
        c.unpersist()
    return out


def spider_cycle(
    links: DataFrame,
    seeds: DataFrame,
    allowed: DataFrame,
    resolved: DataFrame,
    max_depth: int = 3,
) -> DataFrame:
    """The FULL spider admission cycle (SURVEY §3.2/§3.3: SpiderLoop →
    robots gate → Msg13 fetch/redirects → XmlDoc link extraction →
    enqueue): BFS where a url expands only if it is CRAWLABLE —
    robots-allowed AND its redirect chain terminates in 200 — and a
    crawlable url's outlinks are those of its redirect TARGET's page
    (the reference indexes the final doc's content, and its outlinks
    come from that content). Discovered-but-uncrawlable urls stay in
    the output (the reference keeps them in spiderdb with an error
    reply) flagged ``crawled = false``.

    Inputs: ``allowed(url, allowed)`` from robots.robots_allowed,
    ``resolved(url, final_url, …, final_status)`` from
    fetch.resolve_redirects, ``links(src_url, dst_url, …)`` from the
    extraction. The gates pre-shrink the edge set BEFORE the loop
    (one join each, hash on url, no payloads); the BFS itself IS
    ``crawl_frontier`` over the gated edges — one wave-loop
    implementation, not two.
    """
    ok = (
        allowed.filter(F.col("allowed"))
        .join(resolved.filter(F.col("final_status") == 200), "url")
        .select("url", "final_url")
    )
    edges = links.select(
        F.col("src_url").alias("src"), F.col("dst_url").alias("dst")
    ).distinct()
    # crawlable url u emits the edges of its CONTENT page final_url(u)
    cedges = ok.join(edges, ok.final_url == edges.src).select(
        F.col("url").alias("src_url"), F.col("dst").alias("dst_url")
    )
    visited = crawl_frontier(cedges, seeds, max_depth=max_depth)
    return visited.join(
        ok.select("url").withColumn("crawled", F.lit(True)), "url", "left"
    ).fillna(False, ["crawled"])


def crawl_frontier_sql(path: str, seed_mod: int, max_depth: int = 3) -> str:
    """DuckDB recursive-CTE oracle: min-hop BFS over the same pinned
    link extraction (composes LINKS_SQL_CTE — the ONE source of truth
    for href resolution, shared with every other link oracle), seeds =
    every url whose trailing page number ≡ 0 (mod seed_mod)."""
    return f"""
WITH RECURSIVE {LINKS_SQL_CTE.format(path=path)},
edges AS (SELECT DISTINCT src_url AS src, dst_url AS dst FROM links),
seeds AS (
  SELECT url FROM pages
  WHERE CAST(regexp_extract(url, '/p/([0-9]+)$', 1) AS BIGINT)
        % {seed_mod} = 0
),
bfs AS (
  SELECT url, 0 AS depth FROM seeds
  UNION
  SELECT e.dst AS url, b.depth + 1 AS depth
  FROM bfs b JOIN edges e ON e.src = b.url
  WHERE b.depth < {max_depth}
)
SELECT url, CAST(min(depth) AS INT) AS depth FROM bfs GROUP BY url
"""
