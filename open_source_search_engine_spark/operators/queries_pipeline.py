"""Registry entries for the training-data pipeline operators
(dedup / similarity search / text analysis) over the driver's
``documents`` and ``embeddings`` tables.

Oracle-paired where exactly SQL-expressible (md5-based hashes exist in
both engines; Jaccard and token math are exact integers); LSH-based
ops (MinHash banding, SimHash buckets, hyperplane ANN) are registered
rows-only — their correctness proof is the pytest suite, which checks
them against the exact oracle-paired baselines (recall/precision).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from . import pipeline as P
from .catdir import CATEGORY_ROLLUP_SQL
from .registry import register


def _docs(spark, sf_dir):
    return (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .withColumnRenamed("doc_id", "docid")
    )


def _emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


# --- dedup -----------------------------------------------------------------


@register(
    "dedup_exact",
    """SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY md5(text)""",
)
def dedup_exact(spark, sf_dir):
    return P.dedup_exact(_docs(spark, sf_dir))


@register("dedup_substring_spans", P.SUBSTRING_SPANS_SQL,
          extended=True)
def dedup_substring_spans(spark, sf_dir):
    """Span-level exact-substring dedup (Lee et al. 2022 ExactSubstr,
    distributed shingle-df form): per-doc duplicated-span statistics.
    Extended tier (the primary 50 are capped); same comparator in
    pytest. The Spark side shuffles 8-byte xxhash64 shingle hashes;
    the oracle recomputes with the shingle STRINGS — counts agree
    unless xxhash64 collides (P ~ 1e-8 at this corpus size)."""
    return P.substring_dup_spans(_docs(spark, sf_dir))


@register("training_mix", P.TRAINING_MIX_SQL, extended=True)
def training_mix(spark, sf_dir):
    """Capstone: the full training-data prep pipeline (exact dedup →
    quality gate → language gate → repetition cap → eval-set
    decontamination) as ONE declarative plan, oracle-paired end to
    end. Eval set = every 50th doc (the decontaminate stand-in)."""
    docs = _docs(spark, sf_dir)
    eval_docs = docs.filter(F.col("docid") % 50 == 0)
    return P.training_mix(docs, eval_docs)


@register("training_mix_full", P.training_mix_full_sql(),
          extended=True)
def training_mix_full(spark, sf_dir):
    """All seven gates (training_mix's five + Gopher repetition +
    CCNet LM-perplexity ceiling) in one plan, oracle-paired end to
    end. Same every-50th-doc eval split as training_mix."""
    docs = _docs(spark, sf_dir)
    eval_docs = docs.filter(F.col("docid") % 50 == 0)
    return P.training_mix_full(docs, eval_docs)


@register("decontaminate", P.DECONTAMINATE_SQL, extended=True)
def decontaminate(spark, sf_dir):
    """Eval-set decontamination demoed on a deterministic split: every
    50th document plays the benchmark set, the rest are the training
    corpus (disclosed stand-in — the sandbox ships no benchmark
    table; the operator takes any (docid, text) eval DataFrame). The
    eval shingle dictionary is broadcast; training data never
    shuffles."""
    docs = _docs(spark, sf_dir)
    eval_docs = docs.filter(F.col("docid") % 50 == 0)
    train = docs.filter(F.col("docid") % 50 != 0)
    return P.decontaminate(train, eval_docs)


@register("dedup_ngram_jaccard", P.NGRAM_JACCARD_SQL)
def dedup_ngram_jaccard(spark, sf_dir):
    # df-cap ON in the registered path (the 100 TB form): candidate
    # generation skips boilerplate shingles; emitted Jaccards stay
    # exact, so the uncapped oracle still matches (pinned in pytest
    # and checked at both driver tiers).
    return P.ngram_jaccard_pairs(_docs(spark, sf_dir), max_shingle_df=50)


# Oracle-paired against the EXACT Jaccard SQL: banding at r=2, b=128
# puts P(missed pair at J>=0.4) ≈ 2e-10 — far below 1/corpus² — and the
# verify step is exact, so LSH output == exact output deterministically.
@register("dedup_minhash_lsh", P.NGRAM_JACCARD_SQL)
def dedup_minhash_lsh(spark, sf_dir):
    return P.minhash_lsh_pairs(_docs(spark, sf_dir))


@register("dedup_clusters", P.DEDUP_CLUSTERS_SQL)
def dedup_clusters(spark, sf_dir):
    """Duplicate clusters (Clusterdb shape): connected components over
    the near-dup pair set via iterative min-label propagation; the
    oracle recomputes them with a recursive CTE. Candidate generation
    carries the same head-shingle df-cap as dedup_ngram_jaccard (the
    100 TB form); emitted pairs stay exact so the uncapped oracle
    still matches."""
    return P.dedup_clusters(_docs(spark, sf_dir), max_shingle_df=50)


# Oracle-paired: the pinned md5-60 token hash is computable in BOTH
# engines, so DuckDB rebuilds the fingerprints bit-for-bit and checks
# the banded pair search against its brute-force Hamming join.
@register("dedup_simhash", P.SIMHASH_SQL)
def dedup_simhash(spark, sf_dir):
    # radius 3 = the classic Manku web-dedup operating point; the
    # banding is radius-complete for any max_hamming (pipeline.py
    # hamming_pairs), but wider radii widen buckets — keep the
    # registered default scale-honest.
    return P.simhash_pairs(_docs(spark, sf_dir), max_hamming=3)


# --- similarity search -----------------------------------------------------

ANN_ORACLE_SQL = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       round(
         list_sum(list_transform(range(1, len(e.embedding) + 1),
                  i -> CAST(e.embedding[i] AS DOUBLE) * q.qe[i]))
         / (sqrt(list_sum(list_transform(e.embedding,
                  x -> CAST(x AS DOUBLE) * x)))
            * sqrt(list_sum(list_transform(q.qe,
                  x -> CAST(x AS DOUBLE) * x)))),
         4) AS cosine
FROM embeddings e CROSS JOIN q
ORDER BY cosine DESC, e.vec_id ASC
LIMIT 10
"""


def _query_vec(spark, sf_dir):
    row = _emb(spark, sf_dir).filter(F.col("vec_id") == 0).first()
    return [float(x) for x in row["embedding"]]


@register("ann_bruteforce", ANN_ORACLE_SQL)
def ann_bruteforce(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return P.ann_bruteforce(emb, _query_vec(spark, sf_dir), k=10)


@register(
    "ann_lsh",
    P.ann_lsh_sql("(SELECT embedding FROM embeddings WHERE vec_id = 0)"),
)
def ann_lsh(spark, sf_dir):
    """Hyperplane-LSH ANN, oracle-paired: the plane matrix rides into
    the SQL as double literals so DuckDB replays signatures, the
    ANY-table candidate match and the exact-cosine top-k bit-for-bit
    (pytest additionally measures recall vs ann_bruteforce)."""
    emb = _emb(spark, sf_dir)
    return P.ann_lsh(emb, _query_vec(spark, sf_dir), k=10)


_LSH_STORES: dict[tuple, str] = {}
_LSH_STORES_LOCK = __import__("threading").Lock()


def _cleanup_lsh_stores() -> None:
    import shutil

    for root in _LSH_STORES.values():
        shutil.rmtree(root, ignore_errors=True)
    _LSH_STORES.clear()


__import__("atexit").register(_cleanup_lsh_stores)


def _lsh_store(spark, sf_dir):
    """Session-cached write-time LSH store (written once per
    (session, sf_dir) — on a cluster this is the build-time artifact
    every query probes). Lock-guarded so concurrent driver threads
    (bench.py --concurrency) build it exactly once; dirs are removed
    at interpreter exit."""
    import tempfile

    sc = spark.sparkContext
    key = (sc.applicationId, sc.startTime, sf_dir)
    with _LSH_STORES_LOCK:
        if key not in _LSH_STORES:
            root = tempfile.mkdtemp(prefix="sfx_lshstore_")
            P.lsh_write(_emb(spark, sf_dir), root)
            _LSH_STORES[key] = root
        return _LSH_STORES[key]


@register(
    "ann_lsh_store",
    P.ann_lsh_sql("(SELECT embedding FROM embeddings WHERE vec_id = 0)"),
    extended=True,
)
def ann_lsh_store(spark, sf_dir):
    """The SCALE form of ann_lsh (round-4 verdict #3): signatures are
    computed ONCE at write time into a (t, sig)-partitioned id-only
    store; the probe reads n_tables partition directories (Parquet
    partition pruning — BENCH/plans.md §lsh_partition_pruned) and
    re-joins candidates to the embedding table for the exact-cosine
    top-k. Same planes + same ANY-table match as ann_lsh, so the same
    SQL oracle hash-checks it."""
    emb = _emb(spark, sf_dir)
    return P.ann_lsh_from_store(
        spark, emb, _lsh_store(spark, sf_dir), _query_vec(spark, sf_dir),
        k=10,
    )


@register(
    "ann_ivf",
    P.ann_ivf_sql("(SELECT embedding FROM embeddings WHERE vec_id = 0)"),
)
def ann_ivf(spark, sf_dir):
    """IVF coarse-quantizer ANN (the scale path the training-data
    brief names alongside LSH): probe n nearest centroids, scan only
    their inverted lists; oracle-paired — the deterministic centroid
    sample makes assignment + probing SQL-expressible."""
    emb = _emb(spark, sf_dir)
    return P.ann_ivf(emb, _query_vec(spark, sf_dir), k=10)


@register(
    "ann_ivf_kmeans",
    P.ann_ivf_kmeans_sql("(SELECT embedding FROM embeddings WHERE vec_id = 0)"),
    extended=True,
)
def ann_ivf_kmeans(spark, sf_dir):
    """IVF with a REAL distributed k-means coarse quantizer: spherical
    Lloyd's iterations where assignment is a Pandas UDF (centroid
    matrix in the closure, O(C·dim) driver state) and per-dimension
    means come from posexplode + groupBy — the corpus never reaches
    the driver. Oracle-paired by UNROLLING the pinned iteration count
    as CTE pairs with rounded centroids/dots, so even the iterative
    fit is hash-checked against DuckDB."""
    emb = _emb(spark, sf_dir)
    return P.ann_ivf_kmeans(emb, _query_vec(spark, sf_dir), k=10)


@register("embedding_dups", P.embedding_dups_sql(threshold=0.4))
def embedding_dups(spark, sf_dir):
    """Embedding near-dup pairs, oracle-paired via the same literal-
    planes replay as ann_lsh; the banding join shuffles ids only and
    re-joins embeddings for the exact-cosine verify."""
    return P.embedding_dup_pairs(_emb(spark, sf_dir), threshold=0.4)


# --- text analysis ---------------------------------------------------------


@register("lang_id", P.LANG_ID_SQL, extended=True)
def lang_id(spark, sf_dir):
    return P.lang_id(_docs(spark, sf_dir))


@register("quality_score", P.QUALITY_SQL, extended=True)
def quality_score(spark, sf_dir):
    return P.quality_score(_docs(spark, sf_dir))


@register("token_counts", P.TOKEN_COUNTS_SQL, extended=True)
def token_counts(spark, sf_dir):
    return P.token_counts(_docs(spark, sf_dir))


@register("doc_fingerprint", P.FINGERPRINT_SQL, extended=True)
def doc_fingerprint(spark, sf_dir):
    return P.doc_fingerprint(_docs(spark, sf_dir))


@register("repetition_stats", P.repetition_stats_sql(), extended=True)
def repetition_stats(spark, sf_dir):
    """Gopher repetition filters (Rae et al. 2021) — token-fraction
    form, exact-rational, hash-checked against the DuckDB replay."""
    return P.repetition_stats(_docs(spark, sf_dir))


@register("lm_perplexity", P.lm_perplexity_sql(), extended=True)
def lm_perplexity(spark, sf_dir):
    """CCNet-style quality LM (Wenzek et al. 2020): Stupid-Backoff
    bigram LM (Brants et al. 2007) trained on the lang='en' reference
    slice, scoring every doc — off-reference docs back off constantly
    and surface with high ppl."""
    return P.lm_perplexity(_docs(spark, sf_dir))


@register("pii_redact", P.pii_redact_sql(), extended=True)
def pii_redact(spark, sf_dir):
    """PII count+mask over the driver corpus. The synthetic documents
    table contains no PII-shaped strings, so this row verifies exact
    pass-through (counts 0, text unchanged) through both engines'
    regex stacks; the redaction semantics themselves are pinned on a
    crafted PII fixture in tests/test_pipeline.py with the same
    DuckDB comparator."""
    return P.pii_redact(_docs(spark, sf_dir))


# One driver row verifies all four per-doc text-analysis operators
# (language ID, quality scoring, token accounting, fingerprinting):
# their outputs join on docid into one wide enrichment row — the shape
# a training-data pipeline actually materializes — and the oracle
# joins the four standalone SQLs identically. The singles stay
# oracle-paired in the extended (pytest) tier.

DOC_ENRICH_SQL = f"""
WITH lang AS ({P.LANG_ID_SQL}),
qual AS ({P.QUALITY_SQL}),
tc AS ({P.TOKEN_COUNTS_SQL}),
fp AS ({P.FINGERPRINT_SQL}),
rep AS ({P.repetition_stats_sql()}),
lm AS ({P.lm_perplexity_sql()})
SELECT lang.docid, lang.lang_pred, lang.n_hits,
       qual.mean_tok_len, qual.stopword_ratio, qual.alnum_ratio,
       qual.quality,
       tc.n_tokens, tc.n_subtokens, tc.n_distinct, tc.n_chars,
       fp.fingerprint, fp.n_shingles,
       rep.max_word_frac, rep.top_2gram_frac, rep.dup_3gram_frac,
       rep.keep AS rep_keep,
       lm.avg_logprob, lm.ppl
FROM lang
JOIN qual ON qual.docid = lang.docid
JOIN tc ON tc.docid = lang.docid
JOIN fp ON fp.docid = lang.docid
JOIN rep ON rep.docid = lang.docid
JOIN lm ON lm.docid = lang.docid
"""


@register("doc_enrich", DOC_ENRICH_SQL)
def doc_enrich(spark, sf_dir):
    # since r5 continuation this primary row also carries the Gopher
    # repetition signals and the CCNet LM score, so the new quality
    # family lands a green DRIVER row (not just the extended tier) —
    # the same consolidation move the r4 verdict asked for the 2.x
    # subsystems
    docs = _docs(spark, sf_dir)
    return (
        P.lang_id(docs)
        .join(P.quality_score(docs).drop("n_tokens"), "docid")
        .join(P.token_counts(docs), "docid")
        .join(P.doc_fingerprint(docs), "docid")
        .join(
            P.repetition_stats(docs)
            .withColumnRenamed("keep", "rep_keep")
            .drop("n_tokens"),
            "docid",
        )
        .join(
            P.lm_perplexity(docs).select("docid", "avg_logprob", "ppl"),
            "docid",
        )
        .select(
            "docid", "lang_pred", "n_hits",
            "mean_tok_len", "stopword_ratio", "alnum_ratio", "quality",
            "n_tokens", "n_subtokens", "n_distinct", "n_chars",
            "fingerprint", "n_shingles",
            "max_word_frac", "top_2gram_frac", "dup_3gram_frac",
            "rep_keep", "avg_logprob", "ppl",
        )
    )


# --- repeated-section vote dedup (Sections.cpp analogue) --------------------


@register(
    "section_boilerplate",
    P.section_boilerplate_sql(block=2, min_docs=3),
)
def section_boilerplate(spark, sf_dir):
    """Per-site repeated-section voting (ref: Sections.cpp SEC_DUP) —
    sections seen in >= 3 distinct docs of a site are template
    content; reports each doc's boilerplate share. block=2 here
    because the synthetic corpus is word salad (real pages repeat
    16-token nav/footer blocks; 2-token windows make the vote fire at
    sf0.01 so the oracle checks non-trivial output)."""
    return P.boilerplate_stats(
        _docs(spark, sf_dir), block=2, min_docs=3
    )


# --- directory taxonomy (Catdb.cpp / Categories.cpp analogue) ---------------


@register("category_rollup", CATEGORY_ROLLUP_SQL)
def category_rollup(spark, sf_dir):
    """DMOZ-style directory browse: per-category direct + subtree doc
    counts via ancestor-explode + one groupBy shuffle (ref: Catdb.cpp
    url->catid lookup, Categories.cpp directory page counts)."""
    from .catdir import category_rollup as _rollup

    return _rollup(_docs(spark, sf_dir))
