"""Registry entries for the webtext-html surface (SURVEY.md §2 C13/
C14/E3 real link graph, B3 site: over real URLs, D16 titles): link
extraction, inlink counts, siteRank, anchor-boosted BM25, site-
filtered BM25, title extraction.

These run over the input_hint-shaped webtext fixture (url, warc_ts,
html, text, lang — sources/webtext.py, deterministic), NOT the driver
``documents`` table: the whole point is extracting edges/anchors/
sites/titles from real html. The DuckDB oracles read the SAME parquet
via read_parquet() and apply the SAME pinned regexes, so every op
here is hash-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.webtext import webtext_path
from . import linkextract as L
from .bm25 import bm25_topk
from .registry import register

N_WEB = 1200
_PATH = webtext_path(N_WEB)

ANCHOR_TERMS = ["w1", "w2"]
SITE_TERMS = ["w0"]
SITE_HOST = "host3.example.com"


@register("links_extract", L.links_sql(_PATH))
def links_extract(spark, sf_dir):
    _, _, links = L.cached_web(spark, N_WEB)
    return links


@register("site_inlink_rank", L.site_inlink_rank_sql(_PATH))
def site_inlink_rank(spark, sf_dir):
    """E3 (inlink/unique-linker counts) + C14 (siteRank) over the real
    extracted link graph, one driver row for both."""
    _, _, links = L.cached_web(spark, N_WEB)
    return L.site_inlink_rank(links)


@register("inlink_counts_web", L.inlink_counts_sql(_PATH), extended=True)
def inlink_counts_web(spark, sf_dir):
    _, _, links = L.cached_web(spark, N_WEB)
    return L.inlink_counts_web(links)


@register("site_rank_web", L.site_rank_sql(_PATH), extended=True)
def site_rank_web(spark, sf_dir):
    _, _, links = L.cached_web(spark, N_WEB)
    return L.site_rank_web(links)


@register("anchor_bm25", L.anchor_bm25_sql(_PATH, ANCHOR_TERMS))
def anchor_bm25(spark, sf_dir):
    """Anchor-hashgroup boost served FROM SEGMENTS: the ``anchor:``
    stream is packed at build time next to the body index (ref:
    XmlDoc::hashIncomingLinkText posdb keys), not rebuilt per query."""
    pidx, label_map = L.cached_web_store(spark, N_WEB)
    return pidx.field_boosted_topk(
        ANCHOR_TERMS, "anchor", L.ANCHOR_W, k=10, label_map=label_map
    )


@register(
    "anchor_bm25_rel", L.anchor_bm25_sql(_PATH, ANCHOR_TERMS), extended=True
)
def anchor_bm25_rel(spark, sf_dir):
    """Relational twin of anchor_bm25 (same oracle): per-query field
    join over the exploded index."""
    _, idx, links = L.cached_web(spark, N_WEB)
    return L.anchor_boosted_topk(
        idx, L.anchor_postings(links), ANCHOR_TERMS, k=10
    )


@register(
    "search_site_filter",
    L.site_filter_bm25_sql(_PATH, SITE_TERMS, SITE_HOST),
)
def search_site_filter(spark, sf_dir):
    """site: over real URLs (B3; ref XmlDoc::hashUrl FIELD_SITE) —
    BM25 restricted to docs whose url host matches."""
    web, idx, _ = L.cached_web(spark, N_WEB)
    allowed = web.filter(
        F.regexp_extract("url", L.HOST_RE, 1) == SITE_HOST
    ).select(F.col("url").alias("docid"))
    return bm25_topk(idx, SITE_TERMS, k=10, mode="and", restrict=allowed)


@register("titles_web", L.titles_sql(_PATH), extended=True)
def titles_web(spark, sf_dir):
    web, _, _ = L.cached_web(spark, N_WEB)
    return L.titles(web)


TITLE_TERMS = ["w3", "w5"]


@register("title_bm25", L.title_bm25_sql(_PATH, TITLE_TERMS))
def title_bm25(spark, sf_dir):
    """Title-hashgroup boost (ref: XmlDoc::hashTitle weighting — a
    query term in the <title> outranks the same term buried in the
    body), served FROM SEGMENTS via the build-time ``title:``
    stream."""
    pidx, label_map = L.cached_web_store(spark, N_WEB)
    return pidx.field_boosted_topk(
        TITLE_TERMS, "title", L.TITLE_W, k=10, label_map=label_map
    )


@register(
    "title_bm25_rel", L.title_bm25_sql(_PATH, TITLE_TERMS), extended=True
)
def title_bm25_rel(spark, sf_dir):
    """Relational twin of title_bm25 (same oracle)."""
    web, idx, _ = L.cached_web(spark, N_WEB)
    return L.title_boosted_topk(idx, web, TITLE_TERMS, k=10)


from ..sources.webtext import ROBOTS_UA, robots_path
from . import robots as R

_ROBOTS_PATH = robots_path()


@register(
    "robots_allowed",
    R.robots_oracle_sql(_ROBOTS_PATH, _PATH, ROBOTS_UA),
)
def robots_allowed(spark, sf_dir):
    """A3 — robots.txt admission (ref: Robots.cpp Robots::isAllowed):
    parse per-host robots.txt (user-agent groups, comments, mixed
    case), longest-prefix-match rules with Allow-wins-ties, and the
    crawler-specific group replacing '*'. Pure Catalyst; the oracle
    replays the pinned v1 semantics in DuckDB over the same parquet."""
    web, _, _ = L.cached_web(spark, N_WEB)
    rules = R.parse_robots(spark.read.parquet(_ROBOTS_PATH))
    return R.robots_allowed(web.select("url"), rules, ROBOTS_UA)


SEED_MOD = 200
CRAWL_DEPTH = 3


@register(
    "crawl_frontier", L.crawl_frontier_sql(_PATH, SEED_MOD, CRAWL_DEPTH)
)
def crawl_frontier(spark, sf_dir):
    """I1 — the crawl loop minus the fetch (ref: Spider.cpp seed →
    extract → enqueue-unseen): bounded BFS min-hop frontier expansion
    over the REAL extracted link graph; oracle is a DuckDB recursive
    CTE over the same pinned extraction."""
    web, _, links = L.cached_web(spark, N_WEB)
    seeds = web.select("url").filter(
        F.regexp_extract("url", "/p/([0-9]+)$", 1).cast("long")
        % SEED_MOD == 0
    )
    return L.crawl_frontier(links, seeds, max_depth=CRAWL_DEPTH)


INURL_TOK = "host7"


# search_inurl_filter → EXTENDED in r3: search_site_filter already
# drivers the B3 url-restrict path (same bm25_topk restrict= shape);
# the freed slot drivers dns_cache (A2).
@register(
    "search_inurl_filter",
    L.inurl_bm25_sql(_PATH, SITE_TERMS, INURL_TOK),
    extended=True,
)
def search_inurl_filter(spark, sf_dir):
    """inurl: constraint (B3; ref: Query.cpp FIELD_URL — url words
    are indexed as synthetic terms; here the url token-set filter)."""
    web, idx, _ = L.cached_web(spark, N_WEB)
    toks = F.expr(f"regexp_extract_all(lower(url), '{L.TOKEN_RE}', 0)")
    allowed = web.filter(
        F.array_contains(toks, INURL_TOK)
    ).select(F.col("url").alias("docid"))
    return bm25_topk(idx, SITE_TERMS, k=10, mode="and", restrict=allowed)


from ..sources.webtext import N_HOSTS
from . import dnscache as D
from . import fetch as FE


@register(
    "redirect_resolve",
    FE.redirect_resolve_sql(_PATH, N_WEB, N_HOSTS),
)
def redirect_resolve(spark, sf_dir):
    """A1's computation half (ref: Msg13::getDoc redirect loop):
    resolve every page's redirect chain over the deterministic
    md5-derived fetch log — bounded iterative equi-joins, sentinels
    for too-many-redirects / broken Location; oracle = DuckDB
    recursive CTE over the same pinned log."""
    web, _, _ = L.cached_web(spark, N_WEB)
    fetches = FE.fetch_log(web.select("url"), N_WEB, N_HOSTS)
    return FE.resolve_redirects(fetches)


def spider_cycle_sql(max_depth: int) -> str:
    """Composed oracle: robots admission + redirect resolution as
    derived tables (each component's own pinned replay, unchanged —
    ONE source of truth per gate), link CTE shared with every link
    oracle, BFS over the gated edge set."""
    alw = R.robots_oracle_sql(_ROBOTS_PATH, _PATH, ROBOTS_UA, ordered=False)
    res = FE.redirect_resolve_sql(_PATH, N_WEB, N_HOSTS, ordered=False)
    return f"""
WITH RECURSIVE {L.LINKS_SQL_CTE.format(path=_PATH)},
alw AS (SELECT * FROM ({alw}) t),
res AS (SELECT * FROM ({res}) t),
ok AS (
  SELECT a.url, r.final_url
  FROM alw a JOIN res r ON a.url = r.url
  WHERE a.allowed AND r.final_status = 200
),
edges AS (SELECT DISTINCT src_url AS src, dst_url AS dst FROM links),
cedges AS (
  SELECT DISTINCT o.url AS src, e.dst
  FROM ok o JOIN edges e ON e.src = o.final_url
),
seeds AS (
  SELECT url FROM pages
  WHERE CAST(regexp_extract(url, '/p/([0-9]+)$', 1) AS BIGINT)
        % {SEED_MOD} = 0
),
bfs AS (
  SELECT url, 0 AS depth FROM seeds
  UNION
  SELECT c.dst AS url, b.depth + 1 AS depth
  FROM bfs b JOIN cedges c ON c.src = b.url
  WHERE b.depth < {max_depth}
),
vis AS (SELECT url, CAST(min(depth) AS INT) AS depth FROM bfs GROUP BY url)
SELECT v.url, v.depth, (o.url IS NOT NULL) AS crawled
FROM vis v LEFT JOIN ok o ON v.url = o.url
ORDER BY v.url
"""


@register("spider_cycle", spider_cycle_sql(CRAWL_DEPTH), extended=True)
def spider_cycle(spark, sf_dir):
    """I1+A1+A2+A3+C13 integrated — the reference's complete spider
    admission cycle (SpiderLoop → robots gate → fetch w/ redirects →
    extract → enqueue) as ONE bounded-BFS dataflow: only
    robots-allowed urls whose redirect chain lands on a 200 expand,
    and they expand with their redirect TARGET's extracted links."""
    web, _, links = L.cached_web(spark, N_WEB)
    urls = web.select("url")
    rules = R.parse_robots(spark.read.parquet(_ROBOTS_PATH))
    allowed = R.robots_allowed(urls, rules, ROBOTS_UA)
    resolved = FE.resolve_redirects(FE.fetch_log(urls, N_WEB, N_HOSTS))
    seeds = urls.filter(
        F.regexp_extract("url", "/p/([0-9]+)$", 1).cast("long")
        % SEED_MOD == 0
    )
    return L.spider_cycle(
        links, seeds, allowed, resolved, max_depth=CRAWL_DEPTH
    )


@register("dns_cache", D.dns_cache_sql(_PATH))
def dns_cache(spark, sf_dir):
    """A2's computation half (ref: Dns.cpp RdbCache-fronted resolver):
    TTL-cache replay of the per-host lookup log (one lookup per fetch
    at warc_ts) + deterministic md5 resolver — hit/miss accounting the
    reference exposes on its stats page. applyInPandas per host (the
    carried-expiry recurrence no window expresses); oracle = linear
    recursive CTE."""
    web, _, _ = L.cached_web(spark, N_WEB)
    return D.dns_cache_stats(D.dns_lookup_log(web))
