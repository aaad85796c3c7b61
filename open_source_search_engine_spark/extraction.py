"""HTML → text extraction: the pinned per-row invariant.

Reference anchors (SURVEY.md §2 C1/C2): ``Xml.cpp: Xml::set`` (tag
scanner), ``XmlNode.cpp`` (tag table), ``XmlDoc.cpp:
XmlDoc::getUtf8Content`` (text filter), ``Entities.cpp: getEntity``
(entity decode). The reference is a hand-rolled C++ tag scanner; this
is a hand-rolled Python tag scanner with a *pinned spec* — the
BASELINE.json input_hint requires byte-identical extracted text per
url, and both the Spark UDF and the test oracle call this exact
function, so the invariant holds by construction and is locked by the
golden fixtures in tests/golden/.

Pinned spec (v1 — changing any rule is a breaking change; regenerate
goldens if you do):

1. Input bytes are decoded as UTF-8 with ``errors='replace'``.
2. A linear scan splits markup from text. ``<!-- -->`` comments,
   ``<![CDATA[ ]]>``, ``<!DOCTYPE>``/``<? ?>`` declarations are
   dropped wholesale.
3. Content of ``<script>`` and ``<style>`` elements is dropped up to
   the matching close tag (case-insensitive, no nesting — as in
   HTML5).
4. Content of ``<nav>`` elements and of any element whose ``class``
   attribute contains the token ``nav`` is dropped (nesting of the
   same tag name is tracked).
5. Block-level tags (open or close) flush the current text block:
   p div br hr h1-h6 li title tr td th table ul ol dl dt dd
   blockquote pre section article aside header footer main form.
   Inline tags (a, b, span, …) do not break blocks.
6. Each block is entity-decoded (``html.unescape`` — full HTML5
   table, handles bare ``&`` and numeric refs), then
   whitespace-normalized: any run of Unicode whitespace collapses to
   a single ASCII space, leading/trailing stripped.
7. Non-empty blocks are joined with a single ``\\n``. The result is a
   ``str``; "byte-identical" means identical UTF-8 encoding.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOCK_TAGS = frozenset(
    "p div br hr h1 h2 h3 h4 h5 h6 li title tr td th table ul ol dl dt dd "
    "blockquote pre section article aside header footer main form".split()
)
SKIP_CONTENT_TAGS = frozenset({"script", "style"})

_TAG_NAME_RE = re.compile(r"(/?)([a-zA-Z][a-zA-Z0-9:-]*)")
_CLASS_ATTR_RE = re.compile(
    r"""class\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE
)


def _find_tag_end(s: str, i: int) -> int:
    """Index just past the '>' closing the tag that starts at s[i]=='<',
    honouring quoted attribute values. Returns len(s) if unterminated."""
    n = len(s)
    j = i + 1
    quote = ""
    while j < n:
        c = s[j]
        if quote:
            if c == quote:
                quote = ""
        elif c in "\"'":
            quote = c
        elif c == ">":
            return j + 1
        j += 1
    return n


def extract_text(html_in: bytes | bytearray | memoryview | str | None) -> str:
    """Pinned HTML → text function. See module docstring for the spec."""
    if html_in is None:
        return ""
    if isinstance(html_in, (bytes, bytearray, memoryview)):
        s = bytes(html_in).decode("utf-8", "replace")
    else:
        s = str(html_in)

    n = len(s)
    i = 0
    blocks: list[str] = []
    buf: list[str] = []
    # Exclusion stack for rule 4: list of [tagname, same-tag nesting depth].
    excl: list[list] = []

    def flush() -> None:
        if not buf:
            return
        text = " ".join(_html.unescape("".join(buf)).split())
        buf.clear()
        if text:
            blocks.append(text)

    while i < n:
        lt = s.find("<", i)
        if lt == -1:
            if not excl:
                buf.append(s[i:])
            break
        if lt > i and not excl:
            buf.append(s[i:lt])
        i = lt
        # Comments / CDATA / declarations.
        if s.startswith("<!--", i):
            end = s.find("-->", i + 4)
            i = n if end == -1 else end + 3
            continue
        if s.startswith("<![CDATA[", i):
            end = s.find("]]>", i + 9)
            i = n if end == -1 else end + 3
            continue
        if s.startswith("<!", i) or s.startswith("<?", i):
            i = _find_tag_end(s, i)
            continue
        m = _TAG_NAME_RE.match(s, i + 1)
        if not m:
            # Bare '<' that opens no tag: literal text.
            if not excl:
                buf.append("<")
            i += 1
            continue
        closing = m.group(1) == "/"
        tag = m.group(2).lower()
        tag_end = _find_tag_end(s, i)
        inner = s[m.end() : tag_end - 1]
        self_closing = inner.rstrip().endswith("/")
        i = tag_end

        if tag in BLOCK_TAGS:
            flush()

        if not closing and tag in SKIP_CONTENT_TAGS and not self_closing:
            close = re.compile(r"</" + tag + r"\s*>", re.IGNORECASE)
            cm = close.search(s, i)
            i = n if cm is None else cm.end()
            continue

        if excl:
            top = excl[-1]
            if tag == top[0] and not self_closing:
                top[1] += -1 if closing else 1
                if top[1] == 0:
                    excl.pop()
            continue

        if not closing and not self_closing:
            is_nav = tag == "nav"
            if not is_nav:
                cm = _CLASS_ATTR_RE.search(inner)
                if cm:
                    classes = (cm.group(1) or cm.group(2) or cm.group(3) or "").split()
                    is_nav = "nav" in classes
            if is_nav:
                excl.append([tag, 1])

    flush()
    return "\n".join(blocks)


_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL)


def extract_title(html_in: bytes | bytearray | memoryview | str | None) -> str:
    """Pinned title extraction (SURVEY.md §2 D16; ref: ``Title.cpp:
    Title::setTitle`` — prefers the <title> element). Spec (v1):
    content of the FIRST ``<title>`` element (case-insensitive,
    non-greedy to the first close tag), entity-decoded, whitespace-
    normalized like rule 6 of the text spec. Empty string if absent.
    """
    if html_in is None:
        return ""
    if isinstance(html_in, (bytes, bytearray, memoryview)):
        s = bytes(html_in).decode("utf-8", "replace")
    else:
        s = str(html_in)
    m = _TITLE_RE.search(s)
    if not m:
        return ""
    return " ".join(_html.unescape(m.group(1)).split())


_ALNUM_RUN_RE = re.compile(r"[A-Za-z0-9]+")


def highlight_terms(text: str, terms: set[str] | frozenset[str]) -> str:
    """Pinned term highlighting (ref: ``Highlight.cpp`` — wraps query
    matches in the summary). Spec (v1): every maximal ``[A-Za-z0-9]+``
    run whose lowercase form is in ``terms`` is wrapped in
    ``<b>…</b>``; everything else passes through byte-identical."""
    if not terms:
        return text

    def repl(m: re.Match) -> str:
        tok = m.group(0)
        return f"<b>{tok}</b>" if tok.lower() in terms else tok

    return _ALNUM_RUN_RE.sub(repl, text)


EXTRACT_SCHEMA = T.StringType()


@F.pandas_udf(EXTRACT_SCHEMA)
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched extraction UDF — wraps the pinned `extract_text`.

    Scale note: parsing is inherently per-document; the Arrow batch
    transport (65k rows/batch) amortizes serde, and the stage is
    embarrassingly parallel — it scales linearly with executors and
    is the dominant CPU cost of the index build (as ``XmlDoc::indexDoc``
    is in the reference).
    """
    return html.map(extract_text)


def with_extracted_text(df, html_col: str = "html", out_col: str = "text"):
    """documents(html binary) → + text column via the pinned UDF."""
    return df.withColumn(out_col, extract_text_udf(F.col(html_col)))
