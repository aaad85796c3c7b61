"""Query-side surface: parser, phrase match, fielded filters, site
clustering, facets, sort-by-field, snippets (SURVEY.md §2 D1, D7,
D10-D16, B3/B7, F2).

Reference anchors: ``Query.cpp: Query::set2/setQWords/setQTerms``
(parser: AND default, '|' OR, '-' NOT, quoted phrases, field:term),
``Matches.cpp`` (phrase adjacency), ``Msg40.cpp``/``Msg51.cpp`` (site
clustering <=2 per site), ``Posdb.cpp`` facet accumulation,
``PosdbTable`` min/max sort mode (gbsortby:), ``Summary.cpp:
Summary::setSummary`` + ``Highlight.cpp`` (snippets).

Spark-first: the parser is driver-side Python emitting a DataFrame
plan — filters/joins/windows are Catalyst ops; only the snippet
generator is a (top-k-only) pandas UDF.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tokenizer import tokenize
from .bm25 import bm25_topk
from .index_build import InvertedIndex

# ---------------------------------------------------------------------------
# D1: query parser
# ---------------------------------------------------------------------------

_QTOK_RE = re.compile(
    r"""
    (?P<negquote>-"[^"]*")      # negated quoted phrase (before term:
                                # [^\s|]+ would otherwise eat -"a and
                                # silently turn it into NOT a AND b)
  | (?P<quote>"[^"]*")          # quoted phrase
  | (?P<or>\|)                  # OR separator
  | (?P<term>[^\s|]+)           # bare term / -term / field:term
    """,
    re.VERBOSE,
)


@dataclass
class ParsedQuery:
    """required: AND terms; optional: OR terms; negated: NOT terms;
    phrases: quoted token sequences (also contribute their terms to
    required); neg_phrases: ``-"a b"`` exclusions (the PHRASE is
    excluded, not its words); opt_standalone: the optional words that
    came from bare terms, not phrases — in OR mode the operands are
    phrases + standalone words, so a doc matching a phrase word alone
    matches no operand; fields: {field: value} constraints (site:,
    lang:, minlen:, maxlen:, sortby:)."""

    required: list[str] = field(default_factory=list)
    optional: list[str] = field(default_factory=list)
    negated: list[str] = field(default_factory=list)
    phrases: list[list[str]] = field(default_factory=list)
    neg_phrases: list[list[str]] = field(default_factory=list)
    opt_standalone: list[str] = field(default_factory=list)
    fields: dict[str, str] = field(default_factory=dict)

    @property
    def mode(self) -> str:
        return "or" if self.optional else "and"

    @property
    def terms(self) -> list[str]:
        seen = dict.fromkeys(self.required + self.optional)
        return list(seen)


FIELD_NAMES = {"site", "lang", "source", "minlen", "maxlen", "sortby", "syn"}


def parse_query(q: str) -> ParsedQuery:
    """Gigablast-style syntax: space = AND, ``|`` = OR, ``-term`` =
    NOT, ``"a b"`` = phrase, ``field:value`` = constraint
    (ref: Query::set2 field ops — site:, url:, gbsortby:, …)."""
    out = ParsedQuery()
    toks = list(_QTOK_RE.finditer(q))
    has_or = any(m.lastgroup == "or" for m in toks)
    for m in toks:
        kind = m.lastgroup
        if kind == "or":
            continue
        if kind == "negquote":
            words = tokenize(m.group("negquote"))
            if words:
                # exclude the PHRASE (adjacent sequence), not its
                # words — a doc using both words separately stays in
                out.neg_phrases.append(words)
            continue
        if kind == "quote":
            words = tokenize(m.group("quote"))
            if words:
                out.phrases.append(words)
                out.required.extend(words)
            continue
        raw = m.group("term")
        neg = raw.startswith("-")
        if neg:
            raw = raw[1:]
        if ":" in raw:
            fname, _, fval = raw.partition(":")
            if fname.lower() in FIELD_NAMES and fval:
                if neg:
                    # Negated field constraints are rejected rather
                    # than silently inverted into a POSITIVE filter
                    # (exclusion semantics are not implemented).
                    raise ValueError(
                        f"negated field constraint unsupported: -{raw}"
                    )
                out.fields[fname.lower()] = fval
                continue
        words = tokenize(raw)
        if not words:
            continue
        if neg:
            out.negated.extend(words)
        elif has_or:
            out.optional.extend(words)
        else:
            out.required.extend(words)
    if has_or:
        # in OR mode everything non-negated is optional for SCORING,
        # but the match operands are phrases + standalone words only
        # (opt_standalone) — phrase words alone satisfy no operand
        out.opt_standalone = list(dict.fromkeys(out.optional))
        out.optional = list(dict.fromkeys(out.required + out.optional))
        out.required = []
    return out


# ---------------------------------------------------------------------------
# G1/G2: nested boolean queries (Query.cpp Expression/Operand trees)
# ---------------------------------------------------------------------------


def parse_bool(q: str):
    """Recursive-descent parser for nested boolean queries:
    ``a AND (b OR c) AND NOT d`` (ref: ``Query.cpp`` boolean
    ``Expression``/``Operand`` classes; operators are the reference's
    explicit AND/OR/NOT keywords). Returns a tree of
    ('term', w) | ('and'|'or', [children]) | ('not', child)."""
    toks = re.findall(r"[()]|[^\s()]+", q)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        if pos >= len(toks):
            # trailing operator / dangling '(' — reject like every
            # other malformed input, not with a raw IndexError
            raise ValueError(f"unexpected end of query: {q!r}")
        t = toks[pos]
        pos += 1
        return t

    def parse_or():
        left = parse_and()
        while peek() and peek().upper() == "OR":
            take()
            left = ("or", [left, parse_and()])
        return left

    def parse_and():
        left = parse_not()
        while peek() and (
            peek().upper() == "AND"
            or (peek() not in (")", None) and peek().upper() != "OR")
        ):
            if peek().upper() == "AND":
                take()
            left = ("and", [left, parse_not()])
        return left

    def parse_not():
        if peek() and peek().upper() == "NOT":
            take()
            return ("not", parse_not())
        return parse_atom()

    def parse_atom():
        t = take()
        if t == "(":
            node = parse_or()
            if take() != ")":
                raise ValueError(f"unbalanced parens in query: {q!r}")
            return node
        words = tokenize(t)
        if not words:
            raise ValueError(f"empty term in query: {q!r}")
        return ("term", words[0])

    tree = parse_or()
    if pos != len(toks):
        raise ValueError(f"trailing tokens in query: {q!r}")
    return tree


def eval_bool(index: InvertedIndex, tree, _all_docs=None) -> DataFrame:
    """Compile a boolean tree to docid-set algebra: AND -> join,
    OR -> union+distinct, NOT -> anti-join against the enclosing
    AND's other side (top-level bare NOT is rejected — same as the
    reference, which requires at least one positive term)."""
    kind = tree[0]
    if kind == "term":
        return (
            index.postings.filter(F.col("term") == tree[1])
            .select("docid")
            .distinct()
        )
    if kind == "or":
        parts = [eval_bool(index, c) for c in tree[1]]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return out.distinct()
    if kind == "and":
        pos_children = [c for c in tree[1] if c[0] != "not"]
        neg_children = [c for c in tree[1] if c[0] == "not"]
        if not pos_children:
            raise ValueError("pure-negative AND branch is unbounded")
        out = eval_bool(index, pos_children[0])
        for c in pos_children[1:]:
            out = out.join(eval_bool(index, c), "docid")
        for c in neg_children:
            out = out.join(eval_bool(index, c[1]), "docid", "left_anti")
        return out
    if kind == "not":
        raise ValueError("top-level NOT requires a positive sibling")
    raise AssertionError(kind)


def bool_search(
    index: InvertedIndex, q: str, k: int = 10
) -> DataFrame:
    """Boolean retrieval + BM25 ranking: the matched docid set is
    scored over the query's positive terms (the reference scores
    boolean matches through the same PosdbTable path)."""
    tree = parse_bool(q)
    terms = []

    def collect(t, under_not=False):
        if t[0] == "term" and not under_not:
            terms.append(t[1])
        elif t[0] == "not":
            collect(t[1], True)
        elif t[0] in ("and", "or"):
            for c in t[1]:
                collect(c, under_not)

    collect(tree)
    hits = eval_bool(index, tree)
    return bm25_topk(
        index, list(dict.fromkeys(terms)), k=k, mode="or", restrict=hits
    )


# ---------------------------------------------------------------------------
# D7: phrase match via positions
# ---------------------------------------------------------------------------


def phrase_docids(
    index: InvertedIndex,
    words: list[str],
    restrict: DataFrame | None = None,
) -> DataFrame:
    """Docids containing the exact token sequence ``words`` (adjacent
    positions). Requires an index built with_positions=True.

    Plan: per-word postings pruned by a broadcast of the phrase terms,
    positions exploded with offset correction (pos - i), then a
    groupBy(docid, startpos) counting distinct matched offsets == len
    — the n-way adjacency join expressed as one aggregation instead of
    n-1 self-joins (one shuffle, scales with postings of the rarest
    word after Catalyst prunes). ``restrict`` semi-joins the postings
    to a candidate docid set BEFORE the position explode (the
    bigram-acceleration verify path).
    """
    n = len(words)
    if n == 1:
        out = (
            index.postings.filter(F.col("term") == words[0])
            .select("docid")
            .distinct()
        )
        if restrict is not None:
            out = out.join(restrict, "docid", "left_semi")
        return out
    parts = []
    for i, w in enumerate(words):
        src = index.postings.filter(F.col("term") == w)
        if restrict is not None:
            # prune BEFORE the explode — only candidates' positions
            # are ever expanded
            src = src.join(restrict, "docid", "left_semi")
        parts.append(
            src.select("docid", F.explode("positions").alias("pos"))
            .select(
                "docid",
                (F.col("pos") - F.lit(i)).alias("start"),
                F.lit(i).alias("off"),
            )
        )
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionAll(p)
    return (
        unioned.groupBy("docid", "start")
        .agg(F.countDistinct("off").alias("nmatch"))
        .filter(F.col("nmatch") == n)
        .select("docid")
        .distinct()
    )


def phrase_docids_bigram(
    index: InvertedIndex, bigrams: DataFrame, words: list[str]
) -> DataFrame:
    """Bigram-termlist phrase acceleration (ref: Phrases::set +
    PosdbTable's bigram termlists — the reference indexes two-word
    phrase terms precisely so quoted queries can skip the positional
    intersect). ``bigrams`` is the (docid, bigram, tf) table built by
    the C5 pipeline (space-joined 2-shingles).

    Exact for 2-word phrases: the bigram termlist IS the phrase
    hit-set — one termlist scan, ZERO positional work. For longer
    phrases the AND of adjacent bigrams is a candidate superset
    ("a b" ∧ "b c" somewhere ≠ "a b c" contiguous), verified by the
    positional path restricted to the candidates — at scale the
    verify touches only the candidates' positions instead of every
    posting of every phrase word. A single-word "phrase" has no
    bigram — it delegates to the plain termlist path."""
    if len(words) < 2:
        return phrase_docids(index, words)
    grams = [f"{words[i]} {words[i + 1]}" for i in range(len(words) - 1)]
    uniq = list(dict.fromkeys(grams))
    cand = (
        bigrams.filter(F.col("bigram").isin(uniq))
        .groupBy("docid")
        .agg(F.countDistinct("bigram").alias("ng"))
        .filter(F.col("ng") == len(uniq))
        .select("docid")
    )
    if len(words) == 2:
        return cand
    return phrase_docids(index, words, restrict=cand)


def phrase_bm25(
    index: InvertedIndex,
    words: list[str],
    k: int = 10,
    bigrams: DataFrame | None = None,
) -> DataFrame:
    """BM25 top-k restricted to docs containing the exact phrase
    (ref: quoted-query path — termlists intersected, then adjacency
    from positions; Matches.cpp). The phrase hit-set restricts the
    candidate aggregation BEFORE the top-k cut. Pass ``bigrams`` to
    take the reference's bigram-termlist shortcut instead of the
    positional intersect (rank-identical; see phrase_docids_bigram)."""
    hits = (
        phrase_docids_bigram(index, bigrams, words)
        if bigrams is not None
        else phrase_docids(index, words)
    )
    return bm25_topk(index, words, k=k, mode="and", restrict=hits)


# ---------------------------------------------------------------------------
# D10/F2: site clustering; D12 facets; B7/D13 fielded ops
# ---------------------------------------------------------------------------


def site_clustered_topk(
    index: InvertedIndex,
    docs_meta: DataFrame,
    terms: list[str],
    site_col: str = "source",
    per_site: int = 2,
    k: int = 10,
) -> DataFrame:
    """Top-k with at most ``per_site`` results per site (ref: Msg40/
    Msg51 clusterdb site clustering; SearchInput::m_doSiteClustering).

    Window over site partitions ranked by (score desc, docid) — the
    clusterdb lookup becomes a broadcast-joined metadata column.
    """
    cand = bm25_topk(index, terms, k=None, mode="and")
    joined = cand.join(docs_meta.select("docid", site_col), "docid")
    w = Window.partitionBy(site_col).orderBy(F.desc("score"), F.asc("docid"))
    return (
        joined.withColumn("site_rank", F.row_number().over(w))
        .filter(F.col("site_rank") <= per_site)
        .select("docid", "score", F.col(site_col).alias("site"))
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
    )


def facet_counts(
    index: InvertedIndex,
    docs_meta: DataFrame,
    term: str,
    facet_col: str,
) -> DataFrame:
    """Facet value counts over docs matching ``term`` (ref: Msg39/
    PosdbTable gbfacetstr accumulation → FacetEntry tables). One
    semi-join + hash agg; the facet column arrives via broadcast-able
    metadata join."""
    hits = (
        index.postings.filter(F.col("term") == term).select("docid").distinct()
    )
    return (
        hits.join(docs_meta, "docid")
        .groupBy(facet_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.col(facet_col).alias("facet_value"), "n")
    )


def range_filter_topk(
    index: InvertedIndex,
    docs_meta: DataFrame,
    term: str,
    num_col: str,
    lo: int,
    hi: int,
    k: int = 10,
) -> DataFrame:
    """gbmin:/gbmax: numeric range constraint + relevance order (ref:
    Query.cpp FIELD_GBNUMBERMIN/MAX over float-payload posdb keys;
    here a plain metadata-column range filter Catalyst pushes to the
    scan)."""
    meta = docs_meta.filter(
        (F.col(num_col) >= lo) & (F.col(num_col) <= hi)
    ).select("docid", num_col)
    scored = bm25_topk(index, [term], k=k, restrict=meta)
    # re-apply the relevance order AFTER the meta join: a hash join
    # re-plans without any ordering guarantee, so the docstring's
    # 'relevance order' contract would otherwise be partition-luck
    return (
        scored.join(meta, "docid")
        .select(
            "docid", "score", F.col(num_col).cast("long").alias("nval")
        )
        .orderBy(F.desc("score"), F.asc("docid"))
    )


def sortby_topk(
    index: InvertedIndex,
    docs_meta: DataFrame,
    term: str,
    sort_col: str,
    desc: bool = True,
    k: int = 10,
) -> DataFrame:
    """gbsortby: — matching docs ordered by a numeric field instead of
    relevance (ref: PosdbTable min/max mode over float-payload
    termlists). ORDER BY field LIMIT k = TakeOrderedAndProject."""
    hits = (
        index.postings.filter(F.col("term") == term).select("docid").distinct()
    )
    joined = hits.join(docs_meta.select("docid", sort_col), "docid")
    order = F.desc(sort_col) if desc else F.asc(sort_col)
    return (
        joined.orderBy(order, F.asc("docid"))
        .limit(k)
        .select("docid", F.col(sort_col).cast("long").alias("sval"))
    )


# ---------------------------------------------------------------------------
# D15/D16: snippets
# ---------------------------------------------------------------------------

SNIPPET_WINDOW = 10


def _best_snippet(text: str, qterms: set[str], window: int = SNIPPET_WINDOW):
    toks = tokenize(text)
    if not toks:
        return "", 0
    best_i, best_hits = 0, -1
    # deterministic: first window with max distinct query-term hits
    for i in range(0, max(1, len(toks) - window + 1)):
        hits = len(qterms & set(toks[i : i + window]))
        if hits > best_hits:
            best_i, best_hits = i, hits
    return " ".join(toks[best_i : best_i + window]), best_hits


def add_snippets(
    topk: DataFrame, docs: DataFrame, terms: list[str]
) -> DataFrame:
    """Join top-k docids back to the forward store and generate a
    best-window snippet plus its term-highlighted form (ref: Msg20 →
    Summary::setSummary; Highlight.cpp; the TitleRec join is
    A10/Msg22). Broadcast the top-k side — it is k rows; the pandas
    UDF touches only k documents."""
    from ..extraction import highlight_terms

    qset = frozenset(terms)

    @F.pandas_udf(T.StructType([
        T.StructField("snippet", T.StringType()),
        T.StructField("snippet_hl", T.StringType()),
        T.StructField("n_hits", T.IntegerType()),
    ]))
    def snip(texts: pd.Series) -> pd.DataFrame:
        vals = [_best_snippet(t or "", qset) for t in texts]
        return pd.DataFrame(
            {"snippet": [v[0] for v in vals],
             "snippet_hl": [highlight_terms(v[0], qset) for v in vals],
             "n_hits": pd.array([v[1] for v in vals], dtype="int32")}
        )

    joined = docs.join(F.broadcast(topk), "docid")
    return joined.withColumn("s", snip("text")).select(
        "docid", "score", F.col("s.snippet").alias("snippet"),
        F.col("s.snippet_hl").alias("snippet_hl"),
        F.col("s.n_hits").alias("n_hits"),
    )


def _markup_escape(col: Column) -> Column:
    """HTML/XML-encode a field value (ref: PageResults.cpp HTML-encodes
    every doc-derived string before emit). NULLs render as the empty
    string so one NULL column can't null-propagate through ``concat``
    and erase the whole row. `&` is escaped first so later entities
    aren't double-escaped."""
    out = F.coalesce(col.cast("string"), F.lit(""))
    for raw, ent in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
                     ('"', "&quot;"), ("'", "&#39;")):
        out = F.replace(out, F.lit(raw), F.lit(ent))
    return out


def render_serp(results: DataFrame, fmt: str = "json") -> DataFrame:
    """Presentation tail of the §3.1 lifecycle (ref: PageResults.cpp
    render via ``&format=html/json/xml``): serialize each result row
    to one string per rank. Pure ``to_json``/``concat`` column
    expressions — rendering stays JVM-side and distributed; the
    driver collects strings, never re-serializes. Rank is assigned by
    the global (score desc, docid asc) contract. xml/html field values
    are markup-escaped (NULL → '')."""
    w = Window.orderBy(F.desc("score"), F.asc("docid"))
    ranked = results.withColumn("rank", F.row_number().over(w))
    payload = F.struct(*[F.col(c) for c in ranked.columns])
    if fmt == "json":
        rendered = F.to_json(payload)
    elif fmt == "xml":
        inner = F.concat(*[
            F.concat(F.lit(f"<{c}>"), _markup_escape(F.col(c)),
                     F.lit(f"</{c}>"))
            for c in results.columns
        ])
        rendered = F.concat(F.lit("<result>"), inner, F.lit("</result>"))
    elif fmt == "html":
        # snippet_hl wraps RAW doc text in our <b> markup; escape the
        # WHOLE string, then restore only <b>/</b>. This is a b-tag
        # WHITELIST, not full isolation: doc text that literally
        # contains '<b>' is indistinguishable from our markers after
        # the fact and comes back as real bold (styling leak only —
        # nothing outside b-tags can render, so no script/attribute
        # injection). Full isolation needs sentinel markers end to
        # end, which the oracle-paired '<b>' snippet format pins away.
        if "snippet_hl" in results.columns:
            body = _markup_escape(F.col("snippet_hl"))
            for esc, raw in (("&lt;b&gt;", "<b>"), ("&lt;/b&gt;", "</b>")):
                body = F.replace(body, F.lit(esc), F.lit(raw))
        else:
            body = _markup_escape(F.col(results.columns[0]))
        rendered = F.concat(
            F.lit('<li class="result">'), body, F.lit("</li>")
        )
    else:
        raise ValueError(f"unknown format {fmt!r}")
    return ranked.select("rank", rendered.alias("rendered")).orderBy("rank")


# ---------------------------------------------------------------------------
# end-to-end: parse + plan + execute
# ---------------------------------------------------------------------------


def search(
    index: InvertedIndex,
    docs_meta: DataFrame,
    qtext: str,
    k: int = 10,
    bigrams: DataFrame | None = None,
) -> DataFrame:
    """Full query path: parse → candidate retrieval (AND/OR/NOT) →
    phrase post-filter → field constraints → top-k (the §3.1 lifecycle
    as one DataFrame plan). Pass the C5 ``bigrams`` table to serve
    quoted phrases via the bigram-termlist shortcut."""
    pq = parse_query(qtext)
    if not pq.terms and not pq.fields.get("sortby"):
        # a sortby query may be metadata-only ("lang:en sortby:n_chars"
        # — round-1 behavior, restored): the restrict set is ordered
        # directly. Everything else needs at least one scoring term.
        raise ValueError(f"no searchable terms in query: {qtext!r}")
    def _phrase_hits(words):
        return (
            phrase_docids_bigram(index, bigrams, words)
            if bigrams is not None and len(words) > 1
            else phrase_docids(index, words)
        )

    restrict = None
    if pq.phrases and pq.mode == "or":
        # OR operands are phrases + STANDALONE words: '"a b" | c'
        # matches phrase-docs ∪ c-docs. A doc holding only 'a' matches
        # no operand; a doc holding only 'c' must not be dropped by a
        # phrase semi-join (round-4 review fix — the phrase restrict
        # used to apply unconditionally, making OR mean 'phrase AND
        # any term').
        allowed = None
        for words in pq.phrases:
            h = _phrase_hits(words).select("docid")
            allowed = h if allowed is None else allowed.unionByName(h)
        if pq.opt_standalone:
            wh = (
                index.postings.filter(
                    F.col("term").isin(list(pq.opt_standalone))
                ).select("docid")
            )
            allowed = allowed.unionByName(wh)
        restrict = allowed.distinct()
    else:
        for words in pq.phrases:
            hits = _phrase_hits(words)
            restrict = (
                hits if restrict is None else restrict.join(hits, "docid")
            )
    neg_docids = None
    for words in pq.neg_phrases:
        h = _phrase_hits(words).select("docid")
        neg_docids = (
            h if neg_docids is None else neg_docids.unionByName(h)
        )
    meta_filters = []
    if "lang" in pq.fields:
        meta_filters.append(F.col("lang") == pq.fields["lang"])
    if "site" in pq.fields or "source" in pq.fields:
        v = pq.fields.get("site", pq.fields.get("source"))
        meta_filters.append(F.col("source") == v)
    if "minlen" in pq.fields:
        meta_filters.append(F.col("n_chars") >= int(pq.fields["minlen"]))
    if "maxlen" in pq.fields:
        meta_filters.append(F.col("n_chars") <= int(pq.fields["maxlen"]))
    if meta_filters:
        cond = meta_filters[0]
        for c in meta_filters[1:]:
            cond = cond & c
        meta_ok = docs_meta.filter(cond).select("docid")
        restrict = meta_ok if restrict is None else restrict.join(meta_ok, "docid")
    sortby = pq.fields.get("sortby")
    if sortby:
        # gbsortby: keeps the FULL match semantics (AND/OR, phrases,
        # negation, metadata constraints) and only swaps the ranking
        # key — the round-1 form scored just the first term and
        # silently dropped every other constraint. A TERM-LESS sortby
        # ("lang:en sortby:n_chars") orders the restrict set directly.
        if pq.terms:
            if pq.fields.get("syn") == "1":
                # syn:1 + sortby: the MATCH set must still be
                # synonym-expanded (the ranking key swap doesn't
                # change requiredness semantics) — round-3 silently
                # matched unexpanded here.
                from .queries_ir2 import bm25_groups_topk, synonym_groups

                matched = bm25_groups_topk(
                    index,
                    synonym_groups(pq.terms),
                    k=None,
                    mode=pq.mode,
                    restrict=restrict,
                    neg_terms=pq.negated or None,
                    neg_docids=neg_docids,
                ).select("docid")
            else:
                matched = bm25_topk(
                    index,
                    pq.terms,
                    k=None,
                    mode=pq.mode,
                    neg_terms=pq.negated or None,
                    restrict=restrict,
                    neg_docids=neg_docids,
                ).select("docid")
        elif restrict is not None:
            matched = restrict.select("docid").distinct()
            for w in pq.negated:
                bad = (
                    index.postings.filter(F.col("term") == w)
                    .select("docid")
                    .distinct()
                )
                matched = matched.join(bad, "docid", "left_anti")
            if neg_docids is not None:
                matched = matched.join(neg_docids, "docid", "left_anti")
        else:
            raise ValueError(
                f"sortby query needs terms or constraints: {qtext!r}"
            )
        joined = matched.join(docs_meta.select("docid", sortby), "docid")
        return (
            joined.orderBy(F.desc(sortby), F.asc("docid"))
            .limit(k)
            .select("docid", F.col(sortby).cast("long").alias("sval"))
        )
    if pq.fields.get("syn") == "1" and pq.terms:
        # syn:1 — synonym expansion INSIDE the boolean retrieval
        # (ref: Synonyms.cpp + QueryTerm::m_synonymOf: a synonym
        # termlist satisfies its base term's requiredness at reduced
        # weight). Each term becomes a group {term:1.0, syns:0.5};
        # groups are AND/OR-ed per query mode. Negation stays exact
        # (the reference never expands negative terms).
        from .queries_ir2 import bm25_groups_topk, synonym_groups

        return bm25_groups_topk(
            index,
            synonym_groups(pq.terms),
            k=k,
            mode=pq.mode,
            restrict=restrict,
            neg_terms=pq.negated or None,
            neg_docids=neg_docids,
        )
    return bm25_topk(
        index,
        pq.terms,
        k=k,
        mode=pq.mode,
        neg_terms=pq.negated or None,
        restrict=restrict,
        neg_docids=neg_docids,
    )
