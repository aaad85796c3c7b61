"""Tokenization + termids.

Reference anchors (SURVEY.md §2 C3/H1): ``Words.cpp: Words::set``
(alnum-run tokens), ``hash.h``/``fctypes.cpp: hash64Lower_utf8``
(term hashing), ``Phrases.cpp: Phrases::set`` (bigram terms).

Pinned token spec (v1): tokens are maximal runs of ``[a-z0-9]`` over
the lowercased text. This matches the reference's "alnum runs,
case-folded" behaviour for ASCII; non-ASCII letters are treated as
separators (documented deviation — the reference uses UTF-8 alnum
classes; our corpora are ASCII-term so the oracle comparison is
exact, and the spec can widen to \\p{L}\\p{N} in both places at once).

Positions are 1-based token ordinals (like the reference's wordPos,
which counts positions, not bytes).

Termids: Spark's builtin ``xxhash64`` (JVM-side, codegen'd,
deterministic across sessions/clusters) replaces the reference's
``hash64Lower_utf8`` table hash. Termids never cross an oracle
boundary — oracle-checked outputs key on the term *string*.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = "[a-z0-9]+"
_TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokenize(text: str) -> list[str]:
    """Pinned pure-Python tokenizer (the test oracle)."""
    return _TOKEN_RE.findall(text.lower())


def tokens_col(text_col: str = "text") -> Column:
    """array<string> of tokens — JVM-side, whole-stage-codegen'd."""
    return F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)")


def term_id(term: Column | str) -> Column:
    """Deterministic 64-bit termid (ref: hash64Lower_utf8; here xxhash64)."""
    return F.xxhash64(F.col(term) if isinstance(term, str) else term)


def doc_id_from_url(url: Column | str) -> Column:
    """Non-negative 63-bit docid from the url.

    Deviation from the reference's 38-bit probable-docid
    (``Titledb::getProbableDocId`` + Msg22 collision probe): at 10^12
    docs a 38-bit space collides badly (SURVEY.md §7); 63 bits makes
    collisions negligible and removes the probe round-trip.
    """
    c = F.col(url) if isinstance(url, str) else url
    return F.shiftrightunsigned(F.xxhash64(c), 1)


def explode_tokens(
    df: DataFrame, doc_col: str = "docid", text_col: str = "text"
) -> DataFrame:
    """documents → one row per (docid, pos, term). The system's UDTF
    (SURVEY.md §2-J) — expressed with builtin posexplode, so it stays
    inside whole-stage codegen; no Python in the hot path."""
    return (
        df.select(F.col(doc_col).alias("docid"), tokens_col(text_col).alias("toks"))
        .select("docid", F.posexplode("toks").alias("pos0", "term"))
        .select("docid", (F.col("pos0") + 1).alias("pos"), "term")
    )
