"""Deterministic synthetic Common-Crawl-style webtext (FIXTURES.md §2).

The BASELINE.json ``input_hint`` table shape:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Everything is a pure function of ``(seed, n_docs)`` via numpy PCG64 —
no wall clock, no external data. ``text`` is *defined* as
``extract_text(html)`` (the pinned spec), so the byte-identity
invariant is testable by construction; the generator asserts it on a
sample at build time.

Head-term skew is real here (Zipf s=1.07 over a 50k-term vocabulary +
30 stopwords), so the salted posting build (SURVEY.md §2 C6 / §4 O14)
has genuine skew to defuse.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..extraction import extract_text

VOCAB_SIZE = 50_000
STOPWORDS = (
    "the of and to a in is it you that he was for on are with as i his they "
    "be at one have this".split()
)
LANGS = ["en", "es", "de", "zh", "fr"]
LANG_P = [0.55, 0.20, 0.12, 0.08, 0.05]
ZIPF_S = 1.07
EPOCH_2024 = 1_704_067_200  # 2024-01-01T00:00:00Z
PARA_WORDS = 60

SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


N_HOSTS = 97  # ~12 docs/host at n=1200: sites are real clusters
_TLDS = [".com", ".org", ".net"]


def url_of(i: int) -> str:
    """Deterministic page url; host is stable per (i mod N_HOSTS)."""
    h = i % N_HOSTS
    return f"https://host{h}.example{_TLDS[h % 3]}/p/{i}"


def _vocab() -> list[str]:
    return STOPWORDS + [f"w{k}" for k in range(VOCAB_SIZE)]


def _zipf_probs(v: int) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, v + 1, dtype=np.float64), ZIPF_S)
    return p / p.sum()


def _build_html(
    title_words: list[str],
    paragraphs: list[list[str]],
    i: int,
    links: list[tuple[str, str]] | None = None,
) -> str:
    parts = [
        "<html><head><title>",
        " ".join(title_words),
        '</title><script type="text/javascript">var q = 1 && 2; if (q < 3) { q++; }</script>',
        '</head><body><div class="nav">Home &amp; About | <a href="/c">Contact</a></div>',
    ]
    for j, para in enumerate(paragraphs):
        words = list(para)
        # Weave entities into some paragraphs; they decode to '&' / "'"
        # which the tokenizer treats as separators.
        if (i + j) % 7 == 0 and len(words) > 2:
            words[1] = words[1] + " &amp; " + words[2] + "&#39;s"
        parts.append("<p>" + " ".join(words) + "</p>")
        if j == 0:
            parts.append("<!-- boilerplate comment -->")
    for href, anchor in links or []:
        parts.append(f'<p>See <a href="{href}">{anchor}</a> for details</p>')
    parts.append("</body></html>")
    return "".join(parts)


def generate_webtext(
    n_docs: int, seed: int = 42, verify_sample: int = 25
) -> pa.Table:
    """Build the documents_web table as an Arrow table."""
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = np.array(_vocab())
    probs = _zipf_probs(len(vocab))

    doclens = np.clip(
        rng.lognormal(mean=5.6, sigma=0.6, size=n_docs), 20, 4000
    ).astype(np.int64)
    total = int(doclens.sum())
    draws = rng.choice(len(vocab), size=total, p=probs)
    words_flat = vocab[draws]
    offsets = np.concatenate([[0], np.cumsum(doclens)])
    lang_idx = rng.choice(len(LANGS), size=n_docs, p=LANG_P)

    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in range(n_docs):
        words = words_flat[offsets[i] : offsets[i + 1]].tolist()
        title = words[:5]
        body = words[5:] or words
        paragraphs = [
            body[p : p + PARA_WORDS] for p in range(0, len(body), PARA_WORDS)
        ]
        # Real cross-document link graph: doc i links to 2-4 pseudo-
        # random targets; the anchor text is the TARGET's first title
        # words (so anchor-term indexing into the linkee is
        # exercised with on-topic anchors, the Gigablast
        # hashIncomingLinkText shape).
        targets = [
            (i * 31 + 7 * j + 1) % n_docs for j in range(2 + i % 3)
        ]
        links = [
            (
                url_of(t),
                " ".join(
                    words_flat[offsets[t] : offsets[t] + 2].tolist()
                ),
            )
            for t in targets
            if t != i
        ]
        html = _build_html(title, paragraphs, i, links)
        urls.append(url_of(i))
        tss.append((EPOCH_2024 + i) * 1_000_000)
        htmls.append(html.encode("utf-8"))
        texts.append(extract_text(html))
        langs.append(LANGS[lang_idx[i]])

    for i in range(0, n_docs, max(1, n_docs // max(verify_sample, 1))):
        assert extract_text(htmls[i]) == texts[i], f"extraction drift at doc {i}"

    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(tss, pa.timestamp("us")),
            pa.array(htmls, pa.binary()),
            pa.array(texts, pa.string()),
            pa.array(langs, pa.string()),
        ],
        schema=SCHEMA,
    )


def webtext_path(n_docs: int, seed: int = 42, base: str | None = None) -> str:
    """Generate-once cache under the repo (gitignored)."""
    base = base or os.path.join(os.path.dirname(__file__), "..", "..", ".data")
    path = os.path.abspath(
        os.path.join(base, f"webtext_n{n_docs}_s{seed}_v2.parquet")
    )
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(generate_webtext(n_docs, seed), tmp, compression="zstd")
        os.replace(tmp, path)
    return path


# --- robots.txt fixture (SURVEY.md §2 A3) ---------------------------------
# One robots.txt per host, a pure function of the host number. Exercises
# the parser: comments, blank lines, mixed-case directives, multiple
# user-agent groups, empty Disallow (allow-all no-op), and overlapping
# prefixes of different lengths (longest-match + Allow-wins-ties).

ROBOTS_UA = "gigabot"  # the reference crawler's own agent token


def _robots_txt(h: int) -> str:
    lines = [f"# robots for host{h}", "User-agent: *"]
    if h % 5 == 0:
        lines.append("Disallow:")  # explicit allow-all (no-op rule)
    else:
        lines.append(f"Disallow: /p/{h % 10}")
        if h % 2 == 0:
            # longer Allow carves an exception out of the Disallow
            lines.append(f"Allow: /p/{h % 10}{h % 7}")
        if h % 4 == 1:
            lines.append("disallow: /c")  # lowercase directive
    if h % 3 == 0:
        lines += [
            "",
            "# crawler-specific group replaces * entirely",
            f"User-Agent: {ROBOTS_UA}",
            f"Disallow: /p/{(h + 1) % 10}",
            f"Allow: /p/{(h + 1) % 10}0",
        ]
    if h % 7 == 2:
        # stacked User-agent lines: one block, rules bind to BOTH
        lines += [
            "",
            "User-agent: mirrorbot",
            f"User-agent: {ROBOTS_UA}",
            f"Disallow: /p/{(h + 2) % 10}",
        ]
    return "\n".join(lines) + "\n"


def generate_robots() -> pa.Table:
    hosts, txts = [], []
    for h in range(N_HOSTS):
        hosts.append(f"host{h}.example{_TLDS[h % 3]}")
        txts.append(_robots_txt(h))
    return pa.Table.from_arrays(
        [pa.array(hosts, pa.string()), pa.array(txts, pa.string())],
        names=["host", "robots_txt"],
    )


def robots_path(base: str | None = None) -> str:
    base = base or os.path.join(os.path.dirname(__file__), "..", "..", ".data")
    # v2: stacked-User-agent blocks added (pinned fixture — version
    # bump invalidates the cached v1 file)
    path = os.path.abspath(os.path.join(base, "robots_v2.parquet"))
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(generate_robots(), tmp, compression="zstd")
        os.replace(tmp, path)
    return path


# --- query fixture (FIXTURES.md §3) -------------------------------------

def generate_queries(seed: int = 42) -> list[dict]:
    """50 deterministic queries over the webtext vocabulary:
    20 single-term (10 head / 10 tail), 15 two-term AND, 5 OR,
    5 negation, 5 quoted bigram phrases."""
    rng = np.random.Generator(np.random.PCG64(seed + 1))
    vocab = _vocab()
    head = [vocab[int(i)] for i in rng.integers(0, 200, size=30)]
    tail = [vocab[int(i)] for i in rng.integers(2000, 20_000, size=40)]
    out: list[dict] = []
    qid = 0

    def add(qtext: str) -> None:
        nonlocal qid
        out.append({"qid": qid, "qtext": qtext, "k": 10})
        qid += 1

    for i in range(10):
        add(head[i])
    for i in range(10):
        add(tail[i])
    for i in range(15):
        add(f"{head[10 + i]} {tail[10 + i]}")
    for i in range(5):
        add(f"{head[25 + i]} | {tail[25 + i]}")
    for i in range(5):
        add(f"{head[i]} -{tail[30 + i]}")
    for i in range(5):
        add(f'"{head[10 + i]} {tail[10 + i]}"')
    return out
