"""DNS resolution with a TTL cache (SURVEY.md §2 A2, minus the
socket).

Reference anchor: ``Dns.cpp`` (~3k LoC: an async resolver fronted by
an ``RdbCache`` keyed on hostname, entries valid for a TTL from the
moment they are stored; a lookup inside the TTL is served from cache,
the first lookup after expiry goes back to the wire). The wire call
needs a network; everything else — the cache replay, the hit/miss
accounting the reference exposes on its stats page, and a
deterministic resolver function — is pure computation and lives here.

Model: every page fetch triggers a lookup of its url's host at the
page's ``warc_ts`` (the crawl time). The cache replay is the
inherently sequential recurrence

    miss(1) = true,  expiry(1) = ts(1) + TTL
    miss(k) = ts(k) >= expiry(k-1)
    expiry(k) = ts(k) + TTL         if miss(k)
              = expiry(k-1)         otherwise

which no window function expresses (the carried expiry resets only on
a miss), so it runs as one ``applyInPandas`` pass partitioned by host
— the per-key stateful shape of the streaming throttle (I2), here over
a bounded log. Scale: groups are per-host lookup logs (bounded by
crawl politeness — the reference fetches a host serially), state is
two scalars, nothing but (host, ts) ever shuffles.

The resolver is a pure md5 function of the host (three octets under
``10.``), so the whole operator — replay AND resolution — is
oracle-paired: DuckDB replays the recurrence with a linear recursive
CTE over per-host row numbers.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .robots import HOST_RE

DNS_TTL_S = 300  # seconds an entry stays valid (reference default-ish)


def dns_lookup_log(web: DataFrame) -> DataFrame:
    """(host, ts) — one lookup per page fetch at its crawl time."""
    # warc_ts is TIMESTAMP_NTZ; session tz is pinned UTC, so the
    # NTZ→LTZ→long cast chain is the UTC epoch DuckDB's epoch() gives.
    return web.select(
        F.regexp_extract("url", HOST_RE, 1).alias("host"),
        F.col("warc_ts").cast("timestamp").cast("long").alias("ts"),
    )


def resolver_ip(host_col: str = "host") -> Column:
    """Deterministic fake resolver: 10.x.y.z with octets from md5
    hex pairs — the pinned-md5 idiom, replayable in DuckDB."""
    def octet(pos: int) -> Column:
        return F.conv(
            F.substring(F.md5(F.col(host_col)), pos, 2), 16, 10
        )

    return F.concat_ws(".", F.lit("10"), octet(1), octet(3), octet(5))


def dns_cache_stats(
    lookups: DataFrame, ttl_s: int = DNS_TTL_S
) -> DataFrame:
    """lookups(host, ts) → (host, ip, lookups, misses, hits): the TTL
    cache replayed per host, plus the resolved address. ``misses`` is
    the number of wire resolutions the cache-fronted resolver would
    actually perform."""

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = pdf["ts"].sort_values().to_numpy()
        misses = 0
        expiry = None
        for t in ts:
            if expiry is None or t >= expiry:
                misses += 1
                expiry = t + ttl_s
        return pd.DataFrame(
            {
                "host": [pdf["host"].iloc[0]],
                "lookups": [len(ts)],
                "misses": [misses],
                "hits": [len(ts) - misses],
            }
        )

    out = lookups.groupBy("host").applyInPandas(
        replay, schema="host string, lookups long, misses long, hits long"
    )
    return out.select(
        "host", resolver_ip().alias("ip"), "lookups", "misses", "hits"
    )


def dns_cache_sql(path: str, ttl_s: int = DNS_TTL_S) -> str:
    """DuckDB replay: the same recurrence as a linear recursive CTE
    stepping per-host row numbers (depth = max lookups per host)."""
    return f"""
WITH RECURSIVE look AS (
  SELECT host, ts,
         row_number() OVER (PARTITION BY host ORDER BY ts) AS rn
  FROM (
    SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
           CAST(epoch(warc_ts) AS BIGINT) AS ts
    FROM read_parquet('{path}')
  )
),
replay AS (
  SELECT host, ts, rn, TRUE AS miss, ts + {ttl_s} AS expiry
  FROM look WHERE rn = 1
  UNION ALL
  SELECT l.host, l.ts, l.rn, l.ts >= r.expiry AS miss,
         CASE WHEN l.ts >= r.expiry THEN l.ts + {ttl_s}
              ELSE r.expiry END AS expiry
  FROM replay r JOIN look l ON l.host = r.host AND l.rn = r.rn + 1
)
SELECT host,
       '10.' || ('0x' || substr(md5(host), 1, 2))::BIGINT
       || '.' || ('0x' || substr(md5(host), 3, 2))::BIGINT
       || '.' || ('0x' || substr(md5(host), 5, 2))::BIGINT AS ip,
       count(*) AS lookups,
       CAST(sum(CASE WHEN miss THEN 1 ELSE 0 END) AS BIGINT) AS misses,
       CAST(sum(CASE WHEN miss THEN 0 ELSE 1 END) AS BIGINT) AS hits
FROM replay
GROUP BY host
ORDER BY host
"""
