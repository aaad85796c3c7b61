"""robots.txt parsing + URL admission (SURVEY.md §2 A3).

Reference anchor: ``Robots.cpp`` (``Robots::isAllowed``, user-agent
group selection and path-prefix rules) — the one crawl-side component
that is pure computation, so it is in scope without network access.

Pinned semantics (v1, the original REP as the reference implements it
— no ``*``/``$`` wildcards):

- a rule is ``Allow:``/``Disallow:`` + a path PREFIX; empty-value
  rules are no-ops;
- directives are case-insensitive, ``#`` starts a comment, blank and
  comment-only lines are ignored entirely; rules bind to the most
  recent ``User-agent:`` BLOCK above them — consecutive
  ``User-agent:`` lines (after dropping ignored lines) stack into one
  group whose rules apply to every listed agent, the standard REP
  grouping;
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

# scheme and host are case-insensitive per RFC 3986 — the (?i) plus a
# lower() on the captured host keep 'HTTP://Host.com/x' from bypassing
# the rules join (round-4 review fix)
HOST_RE = "(?i)^https?://([^/]+)"
# robots.txt line separator: real-world files are frequently CRLF; a
# plain '\n' split leaves '\r' on every line, which Java's '.' (in the
# comment-strip regex) does NOT match but DuckDB's RE2 '.' DOES —
# comment-only CRLF lines then survive on one engine and not the
# other, changing user-agent block stacking (round-4 review fix).
LINE_SEP_RE = "\r\n|\r|\n"


def parse_robots(robots: DataFrame) -> DataFrame:
    """robots(host, robots_txt) → rules(host, ua, directive, prefix,
    rule_len). One row per (agent, non-empty Allow/Disallow) pair:
    consecutive ``User-agent:`` lines stack into one group, and every
    agent in the block gets a copy of the block's rules (standard REP
    grouping; a rule row fans out over the block's agents via an
    equi-join on the block id)."""
    lines = (
        robots.select(
            F.lower("host").alias("host"),
            F.posexplode(F.split("robots_txt", LINE_SEP_RE)).alias(
                "line_no", "raw"
            ),
        )
        .withColumn("line", F.trim(F.regexp_replace("raw", "#.*", "")))
        .filter(F.col("line") != "")
    )
    ua = F.regexp_extract("line", r"(?i)^user-agent:\s*(\S+)", 1)
    lines = lines.withColumn("is_ua", ua != "")
    w = Window.partitionBy("host").orderBy("line_no")
    # block id: +1 at each UA line whose previous non-blank line is
    # NOT a UA line (a UA directly after another UA stacks instead)
    blocked = lines.withColumn(
        "block_start",
        (
            F.col("is_ua")
            & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False))
        ).cast("int"),
    ).withColumn(
        "block",
        F.sum("block_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    agents = blocked.filter("is_ua").select(
        "host", "block", F.lower(ua).alias("ua")
    )
    rule = F.regexp_extract("line", r"(?i)^(allow|disallow):\s*(\S*)", 1)
    prefix = F.regexp_extract("line", r"(?i)^(allow|disallow):\s*(\S*)", 2)
    rules = (
        blocked.filter(~F.col("is_ua"))
        .withColumn("directive", F.lower(rule))
        .withColumn("prefix", prefix)
        .filter(F.col("directive") != "")
        # empty rule value: 'Disallow:' means NO restriction (RFC 9309
        # §2.2.2 — an empty pattern matches nothing to disallow), and
        # the group still EXISTS for specific-group replacement. Keep
        # the row as a weakest-possible allow-everything rule (prefix
        # '', rule_len 0, loses every tie) instead of dropping it —
        # dropping made the group invisible to has_specific, so '*'
        # wrongly applied to an agent with an all-allowing own group
        # (round-4 review fix).
        .withColumn(
            "directive",
            F.when(F.col("prefix") == "", F.lit("allow")).otherwise(
                F.col("directive")
            ),
        )
        .select("host", "block", "directive", "prefix")
    )
    return rules.join(agents, ["host", "block"]).select(
        "host",
        "ua",
        "directive",
        "prefix",
        F.length("prefix").alias("rule_len"),
    )


def robots_allowed(
    urls: DataFrame, rules: DataFrame, agent: str
) -> DataFrame:
    """urls(url) × rules → (url, allowed). ``agent`` is the crawler's
    user-agent token (lowercased for matching)."""
    agent = agent.lower()
    # one verdict per DISTINCT url — the oracle's SELECT DISTINCT and
    # this side must pin the same contract for duplicate inputs
    urls = urls.select("url").distinct()
    path0 = F.regexp_replace("url", HOST_RE, "")
    u = urls.select(
        "url",
        F.lower(F.regexp_extract("url", HOST_RE, 1)).alias("host"),
        # a bare-host url ('http://h.com') is a fetch of '/' — with
        # path '' no prefix rule matched, so even 'Disallow: /' hosts
        # admitted their root page (round-4 review fix)
        F.when(path0 == "", F.lit("/")).otherwise(path0).alias("path"),
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


def robots_oracle_sql(
    robots_parquet: str, web_parquet: str, agent: str, ordered: bool = True
) -> str:
    """DuckDB replay of the same pinned semantics over the same
    parquet fixtures. ``ordered=False`` drops the trailing ORDER BY so
    the query composes as a derived table (spider_cycle oracle)."""
    agent = agent.lower()
    return f"""
WITH raw0 AS (
  -- CRLF/CR/LF all split (matching the Spark side's LINE_SEP_RE) and
  -- host lowercased (round-4 review fix)
  SELECT host, unnest(ls) AS line0, generate_subscripts(ls, 1) AS line_no
  FROM (SELECT lower(host) AS host,
               regexp_split_to_array(robots_txt,
                                     chr(13) || chr(10) ||
                                     '|' || chr(13) || '|' || chr(10))
                 AS ls
        FROM read_parquet('{robots_parquet}'))
),
raw AS (
  SELECT host, line_no,
         trim(regexp_replace(line0, '#.*', '')) AS line
  FROM raw0
  WHERE trim(regexp_replace(line0, '#.*', '')) <> ''
),
flagged AS (
  SELECT host, line_no, line,
         regexp_extract(line, '(?i)^user-agent:\\s*(\\S+)', 1) <> '' AS is_ua
  FROM raw
),
lagged AS (
  SELECT host, line_no, line, is_ua,
         coalesce(lag(is_ua) OVER (PARTITION BY host ORDER BY line_no),
                  FALSE) AS prev_is_ua
  FROM flagged
),
blocked AS (
  SELECT host, line_no, line, is_ua,
         sum(CASE WHEN is_ua AND NOT prev_is_ua THEN 1 ELSE 0 END)
           OVER (PARTITION BY host ORDER BY line_no
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS block
  FROM lagged
),
agents AS (
  SELECT host, block,
         lower(regexp_extract(line, '(?i)^user-agent:\\s*(\\S+)', 1)) AS ua
  FROM blocked WHERE is_ua
),
rules AS (
  -- empty rule value ('Disallow:') = allow-everything no-op row, kept
  -- so the group stays visible to has_specific (same as the Spark
  -- side)
  SELECT b.host, a.ua,
         CASE WHEN regexp_extract(b.line,
                     '(?i)^(allow|disallow):\\s*(\\S*)', 2) = ''
              THEN 'allow'
              ELSE lower(regexp_extract(b.line,
                     '(?i)^(allow|disallow):\\s*(\\S*)', 1)) END
           AS directive,
         regexp_extract(b.line, '(?i)^(allow|disallow):\\s*(\\S*)', 2)
           AS prefix
  FROM blocked b JOIN agents a ON b.host = a.host AND b.block = a.block
  WHERE NOT b.is_ua
    AND regexp_extract(b.line, '(?i)^(allow|disallow):\\s*(\\S*)', 1) <> ''
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
  -- (?i) scheme/host + lowercased host + bare-host url treated as a
  -- fetch of '/', all matching the Spark side (round-4 review fix)
  SELECT url,
         lower(regexp_extract(url, '(?i)^https?://([^/]+)', 1)) AS host,
         coalesce(nullif(
           regexp_replace(url, '(?i)^https?://[^/]+', ''), ''), '/')
           AS path
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
{"ORDER BY url" if ordered else ""}
"""
