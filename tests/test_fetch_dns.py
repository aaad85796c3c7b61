"""A1 redirect resolution + gzip decode, A2 DNS TTL-cache replay
(ref: Msg13.cpp Msg13::getDoc redirect loop; Dns.cpp cache-fronted
resolver)."""

from __future__ import annotations

import gzip

from open_source_search_engine_spark.operators import dnscache as D
from open_source_search_engine_spark.operators import fetch as FE


def _resolved(spark, rows, max_hops=FE.MAX_HOPS):
    fetches = spark.createDataFrame(
        rows, "url string, status int, location string"
    )
    out = FE.resolve_redirects(fetches, max_hops=max_hops)
    return {r["url"]: (r["final_url"], r["hops"], r["final_status"])
            for r in out.collect()}


def test_redirect_chain_walk(spark):
    """a→b→c(200): both chain members settle at c; direct statuses
    settle at hop 0; 404/503 are terminal as-is."""
    got = _resolved(spark, [
        ("a", 301, "b"),
        ("b", 302, "c"),
        ("c", 200, None),
        ("d", 404, None),
        ("e", 503, None),
    ])
    assert got["a"] == ("c", 2, 200)
    assert got["b"] == ("c", 1, 200)
    assert got["c"] == ("c", 0, 200)
    assert got["d"] == ("d", 0, 404)
    assert got["e"] == ("e", 0, 503)
    # every seed settles exactly once
    assert len(got) == 5


def test_redirect_sentinels(spark):
    """Broken Location → 0; a cycle runs to the hop cap → 599."""
    got = _resolved(spark, [
        ("broken", 301, None),
        ("x", 301, "y"),
        ("y", 301, "x"),  # 2-cycle, never terminates
    ], max_hops=4)
    assert got["broken"] == ("broken", 0, 0)
    # at the cap the chain is still on a redirect row → 599
    assert got["x"][1:] == (4, 599)
    assert got["y"][1:] == (4, 599)


def test_admitted_only_200(spark):
    fetches = spark.createDataFrame(
        [("a", 301, "b"), ("b", 200, None), ("c", 404, None)],
        "url string, status int, location string",
    )
    ok = {r["url"] for r in
          FE.admitted(FE.resolve_redirects(fetches)).collect()}
    assert ok == {"a", "b"}


def test_gunzip_bodies(spark):
    raw = b"<html>hello fetch</html>"
    df = spark.createDataFrame(
        [
            ("u1", gzip.compress(raw), "gzip"),
            ("u2", b"plain bytes", None),
            ("u3", None, "gzip"),
        ],
        "url string, body binary, content_encoding string",
    )
    out = FE.gunzip_bodies(df)
    assert out.columns == ["url", "body"]
    got = {r["url"]: r["body"] for r in out.collect()}
    assert bytes(got["u1"]) == raw
    assert bytes(got["u2"]) == b"plain bytes"
    assert got["u3"] is None


def test_redirect_resolution_random_graph(spark):
    """Seeded-random fetch graph (self-loops, cycles, dead ends,
    broken Locations) vs a pure-Python chain walker — one Spark run
    per seed, the per-example cost hypothesis can't afford here."""
    import random

    for seed in (7, 23):
        rng = random.Random(seed)
        urls = [f"u{i}" for i in range(60)]
        rows = []
        for u in urls:
            r = rng.random()
            if r < 0.45:
                status, loc = 301, rng.choice(urls + [None, u])
            elif r < 0.6:
                status, loc = 404, None
            else:
                status, loc = 200, None
            rows.append((u, status, loc))
        fetch = {u: (s, l) for u, s, l in rows}

        def walk(seed_url, max_hops=FE.MAX_HOPS):
            cur, hops = seed_url, 0
            while True:
                s, l = fetch[cur]
                if s in (301, 302) and l is not None and hops < max_hops:
                    cur, hops = l, hops + 1
                    continue
                if s in (301, 302):
                    return (cur, hops, 0 if l is None else 599)
                return (cur, hops, s)

        want = {u: walk(u) for u in urls}
        got = _resolved(spark, rows)
        assert got == want, f"seed={seed}"


def test_dns_cache_replay_random(spark):
    """Seeded-random lookup logs (duplicate timestamps, boundary
    hits) vs a brute-force Python replay."""
    import random

    rng = random.Random(11)
    rows = []
    for h in range(12):
        ts0 = rng.randrange(0, 1000)
        rows += [
            (f"h{h}", ts0 + rng.randrange(0, 900))
            for _ in range(rng.randrange(1, 25))
        ]
    ttl = 100

    def replay(ts_list):
        misses, expiry = 0, None
        for t in sorted(ts_list):
            if expiry is None or t >= expiry:
                misses, expiry = misses + 1, t + ttl
        return misses

    by_host: dict[str, list[int]] = {}
    for h, t in rows:
        by_host.setdefault(h, []).append(t)
    lookups = spark.createDataFrame(rows, "host string, ts long")
    got = {r["host"]: r for r in
           D.dns_cache_stats(lookups, ttl_s=ttl).collect()}
    for h, ts_list in by_host.items():
        m = replay(ts_list)
        assert got[h]["lookups"] == len(ts_list)
        assert got[h]["misses"] == m, h
        assert got[h]["hits"] == len(ts_list) - m


def test_dns_cache_replay(spark):
    """Per-host TTL recurrence: expiry carries from the last MISS, not
    the last lookup — t=0 miss, t=200 hit, t=310 miss (NOT 200+ttl)."""
    rows = [("h", t) for t in (0, 200, 310, 400, 700)] + [
        ("k", 0), ("k", 299), ("k", 300)
    ]
    lookups = spark.createDataFrame(rows, "host string, ts long")
    got = {r["host"]: r.asDict()
           for r in D.dns_cache_stats(lookups, ttl_s=300).collect()}
    # h: misses at 0, 310, 700 (400 < 310+300=610 is a hit)
    assert (got["h"]["lookups"], got["h"]["misses"], got["h"]["hits"]) \
        == (5, 3, 2)
    # k: boundary — ts == expiry is a miss (>= in the recurrence)
    assert (got["k"]["lookups"], got["k"]["misses"], got["k"]["hits"]) \
        == (3, 2, 1)
    # resolver is a pure md5 function: 10.x.y.z with hex-pair octets
    import hashlib
    h = hashlib.md5(b"h").hexdigest()
    want = "10.%d.%d.%d" % (int(h[0:2], 16), int(h[2:4], 16),
                            int(h[4:6], 16))
    assert got["h"]["ip"] == want


def test_redirect_dangling_location_settles(spark):
    """A Location pointing OUTSIDE the fetch log settles at the
    dangling url with sentinel 0 — never silently dropped (every seed
    settles exactly once)."""
    got = _resolved(spark, [
        ("a", 301, "zzz"),      # zzz has no fetch row
        ("b", 301, "a"),        # chain crossing the dangling hop
        ("c", 200, None),
    ])
    assert got["a"] == ("zzz", 1, 0)
    assert got["b"] == ("zzz", 2, 0)
    assert got["c"] == ("c", 0, 200)
    assert len(got) == 3
