"""Query-side surface: parser, phrase match, site clustering, facets,
range filter, sort-by, snippets, end-to-end search()."""

from __future__ import annotations

import pytest
from conftest import SF_CORRECT, assert_df_matches_duckdb

from open_source_search_engine_spark.operators import search as S
from open_source_search_engine_spark.tokenizer import tokenize


# --- D1: parser ------------------------------------------------------------


def test_parse_plain_and():
    pq = S.parse_query("join filter")
    assert pq.required == ["join", "filter"]
    assert pq.mode == "and" and not pq.negated and not pq.phrases


def test_parse_or():
    pq = S.parse_query("join | window")
    assert pq.mode == "or"
    assert pq.optional == ["join", "window"]
    assert pq.required == []


def test_parse_not_and_phrase():
    pq = S.parse_query('"table hash" -slow')
    assert pq.phrases == [["table", "hash"]]
    assert pq.required == ["table", "hash"]
    assert pq.negated == ["slow"]


def test_parse_fields():
    pq = S.parse_query("join lang:en minlen:100 sortby:n_chars")
    assert pq.fields == {
        "lang": "en",
        "minlen": "100",
        "sortby": "n_chars",
    }
    assert pq.required == ["join"]


def test_parse_unknown_field_is_term():
    pq = S.parse_query("foo:bar join")
    # unknown field prefixes degrade to plain terms (tokenized)
    assert "join" in pq.required
    assert "foo" in pq.required and "bar" in pq.required


def test_parse_bool_tree():
    t = S.parse_bool("join AND (window OR merge) AND NOT slow")
    assert t == (
        "and",
        [
            ("and", [("term", "join"),
                     ("or", [("term", "window"), ("term", "merge")])]),
            ("not", ("term", "slow")),
        ],
    )
    # implicit AND binds tighter than OR (reference default-op semantics)
    assert S.parse_bool("a b OR c") == (
        "or",
        [("and", [("term", "a"), ("term", "b")]), ("term", "c")],
    )


def test_bool_search_matches_setalgebra(spark):
    from open_source_search_engine_spark.operators.index_build import (
        cached_index,
    )

    idx = cached_index(spark, SF_CORRECT)
    got = {r["docid"] for r in S.bool_search(
        idx, "join AND (window OR merge) AND NOT slow", k=1000
    ).collect()}

    def docids(term):
        from pyspark.sql import functions as F

        return {
            r["docid"]
            for r in idx.postings.filter(F.col("term") == term)
            .select("docid").distinct().collect()
        }

    want = (docids("join") & (docids("window") | docids("merge"))) - docids(
        "slow"
    )
    assert got == want and want


# --- oracle-paired surface ops (driver-style comparison) ------------------


@pytest.mark.parametrize(
    "name",
    [
        "phrase_bm25",
        "search_parsed_phrase_not",
        "search_parsed_lang",
        "search_parsed_or",
        "site_cluster_topk",
        "facet_by_source",
        "facet_by_lang",
        "range_filter_topk",
        "sortby_topk",
        "bool_search",
    ],
)
def test_oracle_paired_search(spark, duck_correct, name):
    from conftest import query_and_oracle

    fn, sql = query_and_oracle(name)
    assert_df_matches_duckdb(fn(spark, SF_CORRECT), duck_correct, sql)


# --- phrase semantics ------------------------------------------------------


def test_phrase_docids_matches_python(spark):
    from open_source_search_engine_spark.operators.index_build import (
        cached_index,
    )

    idx = cached_index(spark, SF_CORRECT, with_positions=True)
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").collect()
    words = ["table", "hash"]
    want = set()
    for r in docs:
        toks = tokenize(r["text"])
        for i in range(len(toks) - 1):
            if toks[i] == words[0] and toks[i + 1] == words[1]:
                want.add(r["doc_id"])
                break
    got = {r["docid"] for r in S.phrase_docids(idx, words).collect()}
    assert got == want and want, f"{len(got)} vs {len(want)}"


def test_phrase_three_words(spark):
    from open_source_search_engine_spark.operators.index_build import (
        cached_index,
    )

    idx = cached_index(spark, SF_CORRECT, with_positions=True)
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").collect()
    # find any 3-token sequence present in the corpus
    toks0 = tokenize(docs[0]["text"])
    words = toks0[:3]
    want = set()
    for r in docs:
        toks = tokenize(r["text"])
        for i in range(len(toks) - 2):
            if toks[i : i + 3] == words:
                want.add(r["doc_id"])
                break
    got = {r["docid"] for r in S.phrase_docids(idx, words).collect()}
    assert got == want and docs[0]["doc_id"] in got


# --- snippets --------------------------------------------------------------


def test_snippets_match_pure_python(spark):
    import __spark_entry__ as m

    rows = m.queries()["snippets_topk"](spark, SF_CORRECT).collect()
    assert len(rows) == 10
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_CORRECT}/documents.parquet").collect()
    }
    for r in rows:
        want_snip, want_hits = S._best_snippet(
            docs[r["docid"]], {"join", "filter"}
        )
        assert r["snippet"] == want_snip
        assert r["n_hits"] == want_hits
        assert want_hits >= 1  # AND query: both terms in doc


# --- end-to-end search with field constraints ------------------------------


def test_search_minlen_maxlen(spark, duck_correct):
    from open_source_search_engine_spark.operators.index_build import (
        cached_index,
    )
    from pyspark.sql import functions as F

    docs_meta = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .withColumnRenamed("doc_id", "docid")
    )
    out = S.search(
        cached_index(spark, SF_CORRECT),
        docs_meta,
        "join minlen:150 maxlen:300",
        k=10,
    ).collect()
    assert out
    lens = {
        r["docid"]: r["n_chars"] for r in docs_meta.collect()
    }
    for r in out:
        assert 150 <= lens[r["docid"]] <= 300


def test_search_sortby(spark):
    from open_source_search_engine_spark.operators.index_build import (
        cached_index,
    )

    docs_meta = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .withColumnRenamed("doc_id", "docid")
    )
    out = S.search(
        cached_index(spark, SF_CORRECT), docs_meta, "join sortby:n_chars", k=5
    ).collect()
    svals = [r["sval"] for r in out]
    assert svals == sorted(svals, reverse=True) and len(out) == 5


# --- D2: synonym-group expansion through the parser (syn:1) ---------------


def test_parse_syn_flag():
    pq = S.parse_query("join filter syn:1")
    assert pq.fields == {"syn": "1"}
    assert pq.required == ["join", "filter"]


def test_search_syn_groups(spark):
    """A doc holding only a SYNONYM of a required term still matches
    under syn:1 (it satisfies the group), never under plain AND;
    negation stays exact (not expanded)."""
    from pyspark.sql import functions as F

    from open_source_search_engine_spark.operators.index_build import (
        build_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "join filter speed"),       # literal AND match
            (2, "merge filter speed"),      # synonym-of-join + filter
            (3, "merge where speed"),       # synonyms only
            (4, "join speed"),              # missing filter group
            (5, "merge filter sluggish"),   # group match but negated
        ],
        "docid long, text string",
    )
    idx = build_index(docs)
    meta = docs.select("docid")

    plain = {r["docid"] for r in
             S.search(idx, meta, "join filter", k=10).collect()}
    assert plain == {1}

    syn = {r["docid"] for r in
           S.search(idx, meta, "join filter syn:1", k=10).collect()}
    assert syn == {1, 2, 3, 5}

    syn_neg = {r["docid"] for r in
               S.search(idx, meta, "join filter syn:1 -sluggish",
                        k=10).collect()}
    assert syn_neg == {1, 2, 3}

    # the all-literal match outscores its synonym-substituted twin
    # (weight 1.0 > 0.5, and the rarer literal has >= idf) — doc 2/3
    # relative order is idf-dependent, so only 1-vs-2 and 1-vs-3 are
    # corpus-independent
    scores = {r["docid"]: r["score"] for r in
              S.search(idx, meta, "join filter syn:1", k=10).collect()}
    assert scores[1] > scores[2] and scores[1] > scores[3]


def test_parse_negated_phrase():
    """-"a b" excludes the PHRASE, not its words (round-4 review fix:
    the term regex used to eat -"a and silently parse NOT a AND b)."""
    pq = S.parse_query('-"alpha beta" gamma')
    assert pq.neg_phrases == [["alpha", "beta"]]
    assert pq.required == ["gamma"]
    assert pq.negated == []  # the words are NOT negated individually


def test_search_negated_phrase(spark):
    """Docs using the phrase words SEPARATELY survive a -"a b"
    exclusion; only adjacent-sequence docs are dropped."""
    from open_source_search_engine_spark.operators.index_build import (
        build_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),   # has the phrase -> excluded
            (2, "beta alpha gamma"),   # words separate -> stays
            (3, "gamma delta"),        # no phrase words -> stays
            (4, "alpha delta"),        # no gamma -> not a candidate
        ],
        "docid long, text string",
    )
    idx = build_index(docs, with_positions=True)
    meta = docs.select("docid")
    got = {r["docid"] for r in
           S.search(idx, meta, 'gamma -"alpha beta"', k=10).collect()}
    assert got == {2, 3}


def test_search_or_with_phrase_operands(spark):
    """'"a b" | c' matches phrase-docs UNION c-docs (round-4 review
    fix: the phrase restrict used to apply unconditionally, silently
    turning OR into 'phrase AND any-term'); a doc holding only a
    phrase WORD matches no operand."""
    from open_source_search_engine_spark.operators.index_build import (
        build_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),  # phrase operand
            (2, "beta alpha gamma"),  # words separate: NO operand
            (3, "gamma delta"),       # delta operand
            (4, "alpha delta"),       # delta operand (alpha alone no)
            (5, "gamma epsilon"),     # neither
        ],
        "docid long, text string",
    )
    idx = build_index(docs, with_positions=True)
    meta = docs.select("docid")
    got = {r["docid"] for r in
           S.search(idx, meta, '"alpha beta" | delta', k=10).collect()}
    assert got == {1, 3, 4}


def test_parse_bool_malformed_raises_valueerror():
    """Trailing operators and dangling parens reject with ValueError
    like every other malformed input — not a raw IndexError."""
    for bad in ("a AND", "a OR", "(a", "a AND (b OR"):
        with pytest.raises(ValueError):
            S.parse_bool(bad)


def test_search_syn_with_sortby(spark):
    """syn:1 combined with sortby: must keep the synonym-EXPANDED
    match set (round-3 silently matched unexpanded here; the round-4
    fix routes the match set through bm25_groups_topk k=None) while
    ranking by the sort key, with negation still exact."""
    from pyspark.sql import functions as F

    from open_source_search_engine_spark.operators.index_build import (
        build_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "join filter speed"),       # literal AND match
            (2, "merge filter speed now"),  # synonym-of-join + filter
            (3, "merge where speed and then some more text"),
            (4, "join speed"),              # missing filter group
            (5, "merge filter sluggish"),   # group match but negated
        ],
        "docid long, text string",
    )
    idx = build_index(docs)
    meta = docs.select(
        "docid", F.length("text").alias("n_chars")
    )

    out = S.search(idx, meta, "join filter syn:1 sortby:n_chars",
                   k=10).collect()
    # expanded match set, NOT the unexpanded {1}
    assert {r["docid"] for r in out} == {1, 2, 3, 5}
    svals = [r["sval"] for r in out]
    assert svals == sorted(svals, reverse=True)

    # negation stays exact under the syn+sortby branch
    neg = S.search(idx, meta, "join filter syn:1 sortby:n_chars "
                   "-sluggish", k=10).collect()
    assert {r["docid"] for r in neg} == {1, 2, 3}

    # plain sortby (no syn) still matches literally
    plain = S.search(idx, meta, "join filter sortby:n_chars",
                     k=10).collect()
    assert {r["docid"] for r in plain} == {1}


# --- D7: bigram-termlist phrase acceleration ------------------------------


def test_phrase_bigram_acceleration(spark):
    """2-word phrases are served exactly from the bigram termlist;
    3-word phrases AND adjacent bigrams then verify positionally — a
    doc with both bigrams NON-contiguously must be rejected by the
    verify."""
    from pyspark.sql import functions as F

    from open_source_search_engine_spark.operators.index_build import (
        build_index,
    )
    from open_source_search_engine_spark.operators.pipeline import (
        shingles_col,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox"),
         (2, "quick brown elsewhere then brown fox here"),  # superset trap
         (3, "a quick brown fox b quick brown fox"),
         (4, "quick brown fox"),
         (5, "nothing relevant")],
        "docid long, text string",
    )
    idx = build_index(docs, with_positions=True)
    bg = (
        docs.select(
            "docid", F.explode(shingles_col("text", 2)).alias("bigram")
        )
        .groupBy("docid", "bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )

    two = {r["docid"] for r in
           S.phrase_docids_bigram(idx, bg, ["brown", "fox"]).collect()}
    assert two == {1, 2, 3, 4}

    words = ["quick", "brown", "fox"]
    pos = {r["docid"] for r in S.phrase_docids(idx, words).collect()}
    fast = {r["docid"] for r in
            S.phrase_docids_bigram(idx, bg, words).collect()}
    assert pos == fast == {1, 3, 4}  # doc 2 rejected by the verify


def test_phrase_bigram_single_word_delegates(spark):
    """A 1-word 'phrase' with a bigram table must behave like the
    plain termlist path, not return empty."""
    from pyspark.sql import functions as F

    from open_source_search_engine_spark.operators.index_build import (
        build_index,
    )
    from open_source_search_engine_spark.operators.pipeline import (
        shingles_col,
    )

    docs = spark.createDataFrame(
        [(1, "fox runs"), (2, "no match")], "docid long, text string"
    )
    idx = build_index(docs, with_positions=True)
    bg = (
        docs.select(
            "docid", F.explode(shingles_col("text", 2)).alias("bigram")
        )
        .groupBy("docid", "bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    got = {r["docid"] for r in
           S.phrase_docids_bigram(idx, bg, ["fox"]).collect()}
    assert got == {1}


# --- §3.1 render tail (&format=) ------------------------------------------


def test_render_serp_formats(spark):
    """JSON rows parse back to the exact result fields with dense
    ranks in (score desc, docid asc) order; xml/html render; unknown
    format rejected."""
    import json

    import pytest as _pytest

    from open_source_search_engine_spark.operators.index_build import (
        cached_index,
    )

    docs_meta = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .withColumnRenamed("doc_id", "docid")
    )
    idx = cached_index(spark, SF_CORRECT)
    topk = S.bm25_topk(idx, ["join", "filter"], k=5, mode="and")
    serp = S.add_snippets(topk, docs_meta, ["join", "filter"])

    rows = S.render_serp(serp, "json").collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    parsed = [json.loads(r["rendered"]) for r in rows]
    want = {r["docid"]: r for r in serp.collect()}
    assert [p["score"] for p in parsed] == sorted(
        (r["score"] for r in want.values()), reverse=True
    )
    for p in parsed:
        w = want[p["docid"]]
        assert p["snippet"] == w["snippet"]
        assert p["n_hits"] == w["n_hits"]

    xml = S.render_serp(serp, "xml").first()["rendered"]
    assert xml.startswith("<result><docid>") and xml.endswith("</result>")
    html = S.render_serp(serp, "html").first()["rendered"]
    assert html.startswith('<li class="result">') and "<b>" in html
    with _pytest.raises(ValueError):
        S.render_serp(serp, "csv")


def test_render_serp_escapes_and_null_safe(spark):
    """Doc-derived markup is entity-escaped in xml/html (no HTML
    injection — ref: PageResults.cpp HTML-encodes) and a NULL column
    renders as '' instead of nulling the whole concat row."""
    rows = [
        (1, 2.0, '<script>alert("x")</script> & more',
         'see <b>join</b> & <script>'),
        (2, 1.0, None, None),  # NULL snippet must not null the row
    ]
    serp = spark.createDataFrame(
        rows, "docid long, score double, snippet string, snippet_hl string"
    )
    xml = {r["rank"]: r["rendered"] for r in S.render_serp(serp, "xml").collect()}
    assert "&lt;script&gt;" in xml[1] and "<script>" not in xml[1]
    assert "&amp; more" in xml[1]
    assert xml[2] is not None and "<snippet></snippet>" in xml[2]
    html = {r["rank"]: r["rendered"] for r in S.render_serp(serp, "html").collect()}
    # our own highlight markup survives; doc-embedded <script> doesn't
    assert "<b>join</b>" in html[1] and "<script>" not in html[1]
    assert html[2] == '<li class="result"></li>'
