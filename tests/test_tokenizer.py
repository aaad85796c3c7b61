"""Tokenizer parity: pinned Python fn == Spark JVM expression
(ref: Words.cpp alnum-run tokens)."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_source_search_engine_spark.sources.webtext import generate_webtext
from open_source_search_engine_spark.tokenizer import tokenize, tokens_col


def test_pure_tokenizer():
    assert tokenize("Hello, World! 42x") == ["hello", "world", "42x"]
    assert tokenize("a&b c's") == ["a", "b", "c", "s"]
    assert tokenize("") == []
    assert tokenize("  \n ") == []


def test_spark_tokens_match_pinned(spark):
    t = generate_webtext(100, seed=42)
    df = spark.createDataFrame(t.to_pandas()[["url", "text"]])
    rows = df.select("url", "text", tokens_col("text").alias("toks")).collect()
    assert len(rows) == 100
    for r in rows:
        assert list(r["toks"]) == tokenize(r["text"]), r["url"]


def test_spark_tokens_on_driver_documents(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = df.select("text", tokens_col("text").alias("toks")).limit(100).collect()
    for r in rows:
        assert list(r["toks"]) == tokenize(r["text"])
        # driver corpus is space-separated lowercase → split == regex
        assert list(r["toks"]) == [w for w in r["text"].split(" ") if w]


def test_termid_deterministic(spark):
    a = spark.createDataFrame([("spark",), ("join",)], ["term"])
    got = {
        r["term"]: r["tid"]
        for r in a.select("term", F.xxhash64("term").alias("tid")).collect()
    }
    again = {
        r["term"]: r["tid"]
        for r in a.select("term", F.xxhash64("term").alias("tid")).collect()
    }
    assert got == again and len(set(got.values())) == 2
