"""Distributed BPE subword-vocabulary learning and segmentation
(Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
Words with Subword Units" — the public byte-pair-encoding recipe every
modern tokenizer pipeline derives from).

Why it belongs in this engine: the training-data pipeline already
counts tokens (``token_counts`` approximates subword counts with a
regex); a 100 TB corpus pipeline also needs to LEARN the subword
vocabulary itself and report exact subword budgets per document. Both
steps are implemented scale-first:

- **Learning runs on the word-frequency table, not the corpus.** One
  explode→groupBy builds (word, count) — the only corpus-sized
  shuffle. Every merge round is then a pair-count aggregation over the
  VOCABULARY (≪ corpus; bounded by distinct words), exactly the
  classic dictionary-based formulation. The argmax pair per round is
  a 1-row driver collect (bounded).
- **Merging is a JVM fold** (``aggregate`` over the symbol array) —
  left-to-right non-overlapping replacement of the winning pair, no
  Python in the loop. The logical plan grows per round, so the vocab
  frame is localCheckpoint'ed every few rounds to keep planning cost
  bounded (same pattern as connected_components).
- **Segmentation encodes each DISTINCT word once**, then
  broadcast-joins the (word → n_subwords) dictionary back to the
  exploded corpus — at web scale the per-doc cost is a join, not a
  per-token BPE walk.

Correctness: pinned against an independent pure-Python reference
implementation of the published algorithm in tests/test_bpe.py
(identical merge sequence, identical per-word segmentations,
identical per-doc subword counts). Not SQL-expressible in one
statement (iterative argmax), so this family is pytest-tier like the
codecs — no driver registry entry, disclosed in COVERAGE.md.

Determinism: ties on pair count break by lexicographic (a, b) —
pinned here AND in the reference implementation (the paper leaves
tie-breaks unspecified).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenizer import tokens_col

# end-of-word sentinel (paper's </w>); '$' cannot appear in the
# [a-z0-9]+ token alphabet, so a BARE '$' symbol is always the
# sentinel and a merged symbol can only carry it as a suffix
EOW = "$"

# localCheckpoint the vocab frame every N merge rounds: keeps the
# fold-expression plan depth bounded (each round nests one aggregate)
_CKPT_EVERY = 8


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, c): corpus word-frequency table — the single
    corpus-sized aggregation of the whole BPE pipeline."""
    return (
        docs.select(F.explode(tokens_col(text_col)).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    )


def _initial_symbols():
    """word → array of single-char symbols with the EOW sentinel
    appended (paper form: the final symbol is distinct so merges
    cannot cross word boundaries)."""
    return F.expr(
        f"concat(split(word, ''), array('{EOW}'))"
    )


def _merge_expr(col: str, a: str, b: str):
    """JVM fold replacing adjacent (a, b) with a||b, left-to-right
    non-overlapping: the accumulator's last element is compared
    against ``a`` AFTER earlier merges in the same word, which is
    exactly the sequential semantics of the reference algorithm."""
    qa, qb = a.replace("'", "\\'"), b.replace("'", "\\'")
    return F.expr(
        f"aggregate({col}, CAST(array() AS array<string>), "
        f"(acc, x) -> CASE WHEN size(acc) > 0 "
        f"AND element_at(acc, -1) = '{qa}' AND x = '{qb}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), "
        f"array('{qa}{qb}')) "
        f"ELSE concat(acc, array(x)) END)"
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, n): adjacent-symbol pair counts over the vocabulary,
    weighted by word frequency. Overlap semantics match the reference
    dictionary algorithm: every adjacent position counts."""
    pairs = F.expr(
        "CASE WHEN size(syms) >= 2 THEN "
        "transform(sequence(1, size(syms) - 1), "
        "i -> struct(syms[i - 1] AS a, syms[i] AS b)) "
        "ELSE CAST(array() AS array<struct<a:string,b:string>>) END"
    )
    return (
        vocab.select("c", F.explode(pairs).alias("p"))
        .groupBy("p.a", "p.b").agg(F.sum("c").alias("n"))
    )


def bpe_learn(
    docs: DataFrame, n_merges: int = 20, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges over the corpus. Returns the
    ordered merge list [(a, b), ...] — a driver-side artifact of
    n_merges rows (bounded), like a centroid matrix.

    Stops early when no pair occurs at least twice (merging a
    count-1 pair is meaningless and the reference stops there too).
    """
    vocab = (
        word_freqs(docs, text_col)
        .select(_initial_symbols().alias("syms"), "c")
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    for r in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = vocab.select(
            _merge_expr("syms", a, b).alias("syms"), "c"
        )
        if (r + 1) % _CKPT_EVERY == 0:
            vocab = vocab.localCheckpoint()
    return merges


def segment_words(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(word, subwords): apply the ordered merge list to each distinct
    word — the encode path, one chained JVM fold per merge (plan depth
    = len(merges); encode runs once per DISTINCT word, so the frame
    this operates on is vocabulary-sized)."""
    out = words.select(
        "word", _initial_symbols().alias("syms")
    )
    for i, (a, b) in enumerate(merges):
        out = out.select(
            "word", _merge_expr("syms", a, b).alias("syms")
        )
        if (i + 1) % _CKPT_EVERY == 0:
            out = out.localCheckpoint()
    return out.select(
        "word",
        # strip the sentinel back off: a bare EOW symbol drops, a
        # merged '<chars>EOW' symbol loses its suffix
        F.expr(
            f"filter(transform(syms, s -> "
            f"CASE WHEN s = '{EOW}' THEN '' "
            f"WHEN endswith(s, '{EOW}') THEN "
            f"substring(s, 1, length(s) - 1) "
            f"ELSE s END), s -> s <> '')"
        ).alias("subwords"),
    )


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """(docid, n_tokens, n_bpe): exact learned-vocabulary subword
    budget per document. Each distinct word is encoded ONCE
    (vocabulary-sized frame), then the (word → n_sub) dictionary
    broadcast-joins the exploded corpus — no BPE walk ever touches a
    document twice, and the corpus-side plan is explode + join +
    one docid groupBy."""
    toks = (
        docs.select("docid", F.explode(tokens_col(text_col)).alias("word"))
    )
    dic = segment_words(
        toks.select("word").distinct(), merges
    ).select("word", F.size("subwords").alias("n_sub"))
    return (
        toks.join(F.broadcast(dic), "word")
        .groupBy("docid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("n_sub").cast("long").alias("n_bpe"),
        )
    )
