"""A3 robots.txt admission + I1 crawl-frontier expansion
(ref: Robots.cpp Robots::isAllowed, Spider.cpp crawl loop)."""

from __future__ import annotations

from open_source_search_engine_spark.operators import robots as R


def test_robots_semantics(spark):
    """Pinned v1 semantics on a hand-built file: group binding,
    longest-match, Allow-wins-ties, specific group replaces '*',
    comments/case/no-rules defaults."""
    txt = "\n".join(
        [
            "# comment line",
            "User-agent: *",
            "Disallow: /a",
            "Allow: /a/b",  # longer allow carve-out
            "Disallow: /c",
            "Allow: /c",  # equal length → allow wins
            "",
            "User-Agent: gigabot",
            "disallow: /g",
        ]
    )
    robots = spark.createDataFrame(
        [("h1.com", txt), ("h2.com", "User-agent: *\nDisallow:\n")],
        "host string, robots_txt string",
    )
    rules = R.parse_robots(robots)
    # empty-value Disallow is an allow-everything NO-OP that still
    # marks the group as present (round-4 review fix): h2 contributes
    # exactly one weakest-possible allow marker row
    h2 = rules.filter("host = 'h2.com'").collect()
    assert len(h2) == 1
    assert h2[0]["directive"] == "allow" and h2[0]["prefix"] == ""

    urls = spark.createDataFrame(
        [
            ("https://h1.com/a/x",),      # * group would deny; gigabot
            ("https://h1.com/g/x",),      # gigabot denies
            ("https://h1.com/c",),        # (star) allow ties win — but
            ("https://h2.com/anything",),  # no-op rules → allowed
            ("https://h3.com/no/robots",),  # no rules at all → allowed
        ],
        "url string",
    )
    got = {
        r["url"]: r["allowed"]
        for r in R.robots_allowed(urls, rules, "gigabot").collect()
    }
    # h1 has a gigabot group → it REPLACES '*': /a and /c are allowed,
    # only /g is denied for gigabot
    assert got["https://h1.com/a/x"] is True
    assert got["https://h1.com/g/x"] is False
    assert got["https://h1.com/c"] is True
    assert got["https://h2.com/anything"] is True
    assert got["https://h3.com/no/robots"] is True

    # for a generic agent the '*' group applies
    got_star = {
        r["url"]: r["allowed"]
        for r in R.robots_allowed(urls, rules, "otherbot").collect()
    }
    assert got_star["https://h1.com/a/x"] is False   # /a denies, /a/b n/a
    assert got_star["https://h1.com/c"] is True      # equal-length allow wins
    assert got_star["https://h1.com/g/x"] is True    # /g only binds gigabot

    longer = spark.createDataFrame(
        [("https://h1.com/a/b/deep",)], "url string"
    )
    assert R.robots_allowed(longer, rules, "otherbot").first()["allowed"]


def test_robots_stacked_user_agents(spark):
    """Consecutive User-agent lines form ONE group: the rules below
    bind to every listed agent (standard REP; a rule after a stacked
    block must not bind only to the last agent)."""
    txt = "\n".join(
        [
            "User-agent: alphabot",
            "User-agent: betabot",
            "Disallow: /x",
            "",
            "User-agent: *",
            "Disallow: /y",
        ]
    )
    robots = spark.createDataFrame(
        [("s.com", txt)], "host string, robots_txt string"
    )
    rules = R.parse_robots(robots)
    # the /x rule fans out to both stacked agents
    assert {
        r["ua"] for r in rules.filter("prefix = '/x'").collect()
    } == {"alphabot", "betabot"}
    urls = spark.createDataFrame(
        [("https://s.com/x/1",), ("https://s.com/y/1",)], "url string"
    )
    for agent in ("alphabot", "betabot"):
        got = {
            r["url"]: r["allowed"]
            for r in R.robots_allowed(urls, rules, agent).collect()
        }
        # specific group replaces '*': /x denied, /y NOT denied
        assert got["https://s.com/x/1"] is False, agent
        assert got["https://s.com/y/1"] is True, agent
    got = {
        r["url"]: r["allowed"]
        for r in R.robots_allowed(urls, rules, "otherbot").collect()
    }
    assert got["https://s.com/x/1"] is True
    assert got["https://s.com/y/1"] is False


def test_crawl_frontier_min_depth(spark):
    """BFS assigns MIN hop depth; bounded by max_depth; unseen-only
    enqueue (a node reachable at depths 1 and 2 reports 1)."""
    from open_source_search_engine_spark.operators.linkextract import (
        crawl_frontier,
    )

    links = spark.createDataFrame(
        [
            ("s", "a", ""),
            ("a", "b", ""),
            ("s", "b", ""),   # b reachable at 1 (direct) and 2 (via a)
            ("b", "c", ""),
            ("c", "d", ""),
            ("d", "e", ""),   # e is 4 hops — beyond max_depth 3
        ],
        "src_url string, dst_url string, anchor string",
    )
    seeds = spark.createDataFrame([("s",)], "url string")
    got = {
        r["url"]: r["depth"]
        for r in crawl_frontier(links, seeds, max_depth=3).collect()
    }
    assert got == {"s": 0, "a": 1, "b": 1, "c": 2, "d": 3}


def test_spider_cycle_gates_and_redirect_content(spark):
    """Full-cycle semantics on a hand-built graph: a robots-blocked
    url never expands, a 404 url never expands, and a redirecting url
    expands with its TARGET page's links under its own name."""
    from pyspark.sql import functions as F

    from open_source_search_engine_spark.operators import fetch as FE
    from open_source_search_engine_spark.operators import linkextract as L

    # s -> a (allowed, 301 -> t), a's target t links to x;
    # s -> b (robots-blocked, 200) links to y — y must NOT appear;
    # s -> c (allowed, 404) links to z — z must NOT appear.
    links = spark.createDataFrame(
        [("s", "a"), ("s", "b"), ("s", "c"),
         ("t", "x"), ("b", "y"), ("c", "z")],
        "src_url string, dst_url string",
    )
    seeds = spark.createDataFrame([("s",)], "url string")
    allowed = spark.createDataFrame(
        [("s", True), ("a", True), ("b", False), ("c", True),
         ("t", True), ("x", True)],
        "url string, allowed boolean",
    )
    fetches = spark.createDataFrame(
        [("s", 200, None), ("a", 301, "t"), ("b", 200, None),
         ("c", 404, None), ("t", 200, None), ("x", 200, None)],
        "url string, status int, location string",
    )
    resolved = FE.resolve_redirects(fetches)
    out = {r["url"]: (r["depth"], r["crawled"]) for r in
           L.spider_cycle(links, seeds, allowed, resolved,
                          max_depth=3).collect()}
    # s expands (its own links); a expands via t's links; b, c do not
    assert out == {
        "s": (0, True),
        "a": (1, True),   # crawlable: 301 chain ends at t (200)
        "b": (1, False),  # discovered but robots-blocked
        "c": (1, False),  # discovered but 404
        "x": (2, True),   # reached THROUGH a via t's content links
    }


def test_robots_empty_specific_group_replaces_star(spark):
    """A specific-agent group whose only rule is an empty Disallow
    (i.e. 'this bot may crawl everything') must REPLACE the '*'
    group — before the round-4 fix the empty rule was dropped, the
    group became invisible, and '*' Disallow:/ wrongly blocked the
    whitelisted bot. Duplicate input urls also collapse to one
    verdict row (matching the oracle's SELECT DISTINCT)."""
    txt = "\n".join(
        [
            "User-agent: mybot",
            "Disallow:",
            "",
            "User-agent: *",
            "Disallow: /",
        ]
    )
    robots = spark.createDataFrame(
        [("w.com", txt)], "host string, robots_txt string"
    )
    rules = R.parse_robots(robots)
    urls = spark.createDataFrame(
        [("https://w.com/page",), ("https://w.com/page",)], "url string"
    )
    mine = R.robots_allowed(urls, rules, "mybot").collect()
    assert len(mine) == 1 and mine[0]["allowed"] is True
    other = R.robots_allowed(urls, rules, "otherbot").collect()
    assert len(other) == 1 and other[0]["allowed"] is False


def test_robots_crlf_case_and_bare_host(spark):
    """Round-4 review fixes pinned on fixtures: CRLF robots.txt lines
    parse (comment-only CRLF lines don't change group stacking),
    scheme/host matching is case-insensitive, and a bare-host URL is
    a fetch of '/' so 'Disallow: /' blocks the root page."""
    txt = "User-Agent: *\r\n# comment\r\nDisallow: /\r\n"
    robots = spark.createDataFrame(
        [("Host.COM", txt)], "host string, robots_txt string"
    )
    rules = R.parse_robots(robots)
    rows = rules.collect()
    # exactly one rule row: the CRLF comment line vanished, the
    # Disallow parsed with a clean '/' prefix (no trailing \r)
    assert len(rows) == 1
    assert rows[0]["host"] == "host.com"
    assert rows[0]["directive"] == "disallow"
    assert rows[0]["prefix"] == "/"

    urls = spark.createDataFrame(
        [
            ("HTTP://HOST.com",),        # bare host, shouty scheme+host
            ("https://host.com/x",),     # normal path
            ("https://other.com",),      # no rules → allowed
        ],
        "url string",
    )
    got = {
        r["url"]: r["allowed"]
        for r in R.robots_allowed(urls, rules, "gigabot").collect()
    }
    assert got["HTTP://HOST.com"] is False
    assert got["https://host.com/x"] is False
    assert got["https://other.com"] is True
