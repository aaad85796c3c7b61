"""spark-fulltext: PySpark-native full-text index + BM25/WAND query engine.

A from-scratch, Spark-first rebuild of the core capabilities of the
Gigablast open-source search engine (reference:
``Acidburn0zzz/open-source-search-engine``, a fork of
``gigablast/open-source-search-engine``; see SURVEY.md §0 for the
provenance caveat — citations are symbol anchors, e.g. ``Posdb.cpp:
Posdb::makeKey``, not verified line numbers).

Layout
------
- ``session``        SparkSession factory tuned for the sandbox/local mode
- ``extraction``     pinned HTML → text spec + Arrow UDF (ref: Xml.cpp/XmlDoc.cpp)
- ``tokenizer``      tokenization + termids (ref: Words.cpp, hash.h)
- ``functions/``     scalar/vector function library (varbyte codec, hashing,
                     text-quality, simhash/minhash primitives)
- ``operators/``     index build, BM25, block-max WAND, dedup, similarity,
                     facets, top-k
- ``plans/``         query parser + planner (ref: Query.cpp)
- ``sources/``       catalog of driver testdata + synthetic webtext tables
- ``streaming/``     incremental index ingest (ref: Msg4.cpp/Rdb.cpp LSM path)
"""

__version__ = "0.1.0"
