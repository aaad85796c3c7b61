"""robots.txt parsing + URL admission (SURVEY.md §2 A3).

Reference anchor: ``Robots.cpp`` (``Robots::isAllowed``, user-agent
group selection and path-prefix rules) — the one crawl-side component
that is pure computation, so it is in scope without network access.

Pinned semantics (v1, the original REP as the reference implements it
— no ``*``/``$`` wildcards):

- a rule is ``Allow:``/``Disallow:`` + a path PREFIX; empty-value
  rules are no-ops;
- directives are case-insensitive, ``#`` starts a comment, rules bind
  to the most recent ``User-agent:`` line above them;
- if a host has a group for the crawler's own agent token, that group
  REPLACES the ``*`` group entirely (it is not merged);
- the longest matching prefix wins; on equal length ``Allow`` wins;
- no matching rule (or no robots.txt at all) → allowed.

Everything is JVM-side Catalyst: split+posexplode for lines, a
last-ignorenulls window for group assignment, an equi-join on host
with a prefix filter for matching, one row_number window for the
winning rule. Scale: rules are ~10 rows/host — the urls⨝rules join is
host-equi (shuffle on host, or broadcast when the rules table fits),
candidate matches per url stay O(rules-per-host). No Python in the
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HOST_RE = "^https?://([^/]+)"


def parse_robots(robots: DataFrame) -> DataFrame:
    """robots(host, robots_txt) → rules(host, ua, directive, prefix,
    rule_len). One row per non-empty Allow/Disallow bound to its
    user-agent group."""
    lines = robots.select(
        "host",
        F.posexplode(F.split("robots_txt", "\n")).alias("line_no", "raw"),
    ).withColumn(
        "line", F.trim(F.regexp_replace("raw", "#.*", ""))
    )
    ua = F.regexp_extract("line", r"(?i)^user-agent:\s*(\S+)", 1)
    w = (
        Window.partitionBy("host")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = lines.withColumn(
        "ua_raw", F.when(ua != "", F.lower(ua))
    ).withColumn("ua", F.last("ua_raw", ignorenulls=True).over(w))
    rule = F.regexp_extract("line", r"(?i)^(allow|disallow):\s*(\S*)", 1)
    prefix = F.regexp_extract("line", r"(?i)^(allow|disallow):\s*(\S*)", 2)
    return (
        tagged.withColumn("directive", F.lower(rule))
        .withColumn("prefix", prefix)
        .filter(
            (F.col("directive") != "")
            & (F.col("prefix") != "")
            & F.col("ua").isNotNull()
        )
        .select(
            "host",
            "ua",
            "directive",
            "prefix",
            F.length("prefix").alias("rule_len"),
        )
    )


def robots_allowed(
    urls: DataFrame, rules: DataFrame, agent: str
) -> DataFrame:
    """urls(url) × rules → (url, allowed). ``agent`` is the crawler's
    user-agent token (lowercased for matching)."""
    agent = agent.lower()
    u = urls.select(
        "url",
        F.regexp_extract("url", HOST_RE, 1).alias("host"),
        F.regexp_replace("url", HOST_RE, "").alias("path"),
    )
    r = rules.filter(F.col("ua").isin(agent, "*")).withColumn(
        "is_specific", (F.col("ua") == agent).cast("int")
    )
    host_flag = r.groupBy("host").agg(
        F.max("is_specific").alias("has_specific")
    )
    applicable = r.join(host_flag, "host").filter(
        F.col("is_specific") == F.col("has_specific")
    )
    cand = u.join(applicable, "host", "left").filter(
        F.col("prefix").isNull() | F.col("path").startswith(F.col("prefix"))
    )
    # winning rule per url: longest prefix, Allow wins length ties
    win = Window.partitionBy("url").orderBy(
        F.desc_nulls_last("rule_len"), F.asc("directive")
    )
    best = (
        cand.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select(
            "url",
            (
                F.col("directive").isNull()
                | (F.col("directive") == "allow")
            ).alias("allowed"),
        )
    )
    # urls whose every rule failed the prefix filter drop out of the
    # left join entirely only when the host HAS rules but none match —
    # those were kept above via the null-prefix branch of the left
    # join; re-attach any url lost to the filter as allowed
    return (
        urls.select("url")
        .join(best, "url", "left")
        .select("url", F.coalesce("allowed", F.lit(True)).alias("allowed"))
    )


def robots_oracle_sql(robots_parquet: str, web_parquet: str, agent: str) -> str:
    """DuckDB replay of the same pinned semantics over the same
    parquet fixtures."""
    agent = agent.lower()
    return f"""
WITH raw0 AS (
  SELECT host, unnest(ls) AS line0, generate_subscripts(ls, 1) AS line_no
  FROM (SELECT host, string_split(robots_txt, chr(10)) AS ls
        FROM read_parquet('{robots_parquet}'))
),
raw AS (
  SELECT host, line_no,
         trim(regexp_replace(line0, '#.*', '')) AS line
  FROM raw0
),
tagged AS (
  SELECT host, line_no, line,
         last_value(
           CASE WHEN regexp_extract(line, '(?i)^user-agent:\\s*(\\S+)', 1) <> ''
                THEN lower(regexp_extract(line, '(?i)^user-agent:\\s*(\\S+)', 1))
           END IGNORE NULLS
         ) OVER (PARTITION BY host ORDER BY line_no
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ua
  FROM raw
),
rules AS (
  SELECT host, ua,
         lower(regexp_extract(line, '(?i)^(allow|disallow):\\s*(\\S*)', 1))
           AS directive,
         regexp_extract(line, '(?i)^(allow|disallow):\\s*(\\S*)', 2) AS prefix
  FROM tagged
  WHERE regexp_extract(line, '(?i)^(allow|disallow):\\s*(\\S*)', 1) <> ''
    AND regexp_extract(line, '(?i)^(allow|disallow):\\s*(\\S*)', 2) <> ''
    AND ua IS NOT NULL
),
r2 AS (
  SELECT *, CASE WHEN ua = '{agent}' THEN 1 ELSE 0 END AS is_specific
  FROM rules WHERE ua IN ('{agent}', '*')
),
hf AS (SELECT host, max(is_specific) AS has_specific FROM r2 GROUP BY host),
applicable AS (
  SELECT r2.* FROM r2 JOIN hf USING (host)
  WHERE r2.is_specific = hf.has_specific
),
u AS (
  SELECT url,
         regexp_extract(url, '^https?://([^/]+)', 1) AS host,
         regexp_replace(url, '^https?://[^/]+', '') AS path
  FROM (SELECT DISTINCT url FROM read_parquet('{web_parquet}'))
),
cand AS (
  SELECT u.url, a.directive, length(a.prefix) AS rule_len
  FROM u LEFT JOIN applicable a
    ON u.host = a.host AND starts_with(u.path, a.prefix)
),
best AS (
  SELECT url, directive,
         row_number() OVER (
           PARTITION BY url
           ORDER BY rule_len DESC NULLS LAST, directive ASC
         ) AS rn
  FROM cand
)
SELECT u.url AS url,
       coalesce(b.directive IS NULL OR b.directive = 'allow', TRUE)
         AS allowed
FROM u
LEFT JOIN (SELECT url, directive FROM best WHERE rn = 1) b USING (url)
ORDER BY url
"""
