"""Directory taxonomy (ref: Catdb.cpp / Categories.cpp — the DMOZ
directory: urls map to hierarchical topic categories; the directory
pages browse per-category doc counts including all descendants, and
``gbcatid:`` restricts a search to a category subtree).

No DMOZ dump ships with this sandbox, so the taxonomy is a small
deterministic tree and the doc→leaf assignment is a pure function of
docid — both replayable in the DuckDB oracle (the driver brief's
"synthesise deterministically" rule). The OPERATORS are the real
thing:

- ``category_assign``: docid → leaf category path. A literal-array
  lookup (no join at all); with a real catdb this is a broadcast join
  against the url→category dim.
- ``category_rollup``: per-category direct + subtree doc counts. The
  scalable shape is ANCESTOR-EXPLODE (each doc emits its leaf's
  ancestor chain, one groupBy(path) shuffle of tiny rows) — NOT a
  prefix-LIKE non-equi join, which would be a nested-loop against the
  whole corpus at 100 TB. Depth is bounded (DMOZ ≈ 14 levels), so the
  explode fan-out is a small constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deterministic stand-in taxonomy (paths, '/'-separated). Leaves are
# the assignable categories; inner nodes exist for rollup.
TAXONOMY_LEAVES = [
    "top/arts/music",
    "top/arts/film",
    "top/science/physics",
    "top/science/biology",
    "top/science/math",
    "top/computers/spark",
    "top/computers/databases",
]


def category_assign(docs: DataFrame) -> DataFrame:
    """(docid, cat): leaf category per doc — docid % n_leaves into the
    literal taxonomy (ref: Catdb.cpp url→catid lookup; here a pure
    function so the oracle replays it)."""
    leaves = F.array(*[F.lit(p) for p in TAXONOMY_LEAVES])
    return docs.select(
        "docid",
        F.element_at(
            leaves,
            (F.col("docid") % len(TAXONOMY_LEAVES)).cast("int") + 1,
        ).alias("cat"),
    )


def category_rollup(docs: DataFrame) -> DataFrame:
    """(cat, n_direct, n_subtree): directory-browse counts — n_direct
    is docs assigned exactly this category, n_subtree includes every
    descendant (ref: Categories.cpp directory page counts).

    Each doc explodes to its leaf's ancestor prefixes ("top",
    "top/arts", "top/arts/music"), then ONE groupBy(cat) counts both
    measures (direct = rows where the ancestor IS the leaf) with
    map-side partial aggregation. Rows shuffled are (path, flag) only.
    """
    assigned = category_assign(docs)
    parts = F.split(F.col("cat"), "/")
    ancestors = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(F.slice(parts, 1, i), "/"),
    )
    return (
        assigned.select(
            F.col("cat").alias("leaf"), F.explode(ancestors).alias("anc")
        )
        .groupBy(F.col("anc").alias("cat"))
        .agg(
            F.sum(
                F.when(F.col("anc") == F.col("leaf"), 1).otherwise(0)
            ).cast("long").alias("n_direct"),
            F.count(F.lit(1)).alias("n_subtree"),
        )
        .orderBy("cat")
    )


CATEGORY_ROLLUP_SQL = f"""
WITH leaves(i, cat) AS (
  SELECT * FROM (VALUES {", ".join(
      f"({i}, '{p}')" for i, p in enumerate(TAXONOMY_LEAVES)
  )})
), assigned AS (
  SELECT d.doc_id AS docid, l.cat
  FROM documents d JOIN leaves l
    ON l.i = d.doc_id % {len(TAXONOMY_LEAVES)}
), anc AS (
  SELECT a.cat AS leaf,
         array_to_string((string_split(a.cat, '/'))[1:CAST(j AS INT)],
                         '/') AS ancp
  FROM assigned a, LATERAL (
    SELECT unnest(range(1, len(string_split(a.cat, '/')) + 1)) AS j
  ) s
)
SELECT ancp AS cat,
       CAST(sum(CASE WHEN ancp = leaf THEN 1 ELSE 0 END) AS BIGINT)
         AS n_direct,
       count(*) AS n_subtree
FROM anc
GROUP BY ancp
ORDER BY cat
"""
