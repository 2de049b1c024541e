"""Tokenizer goldens (FIXTURES.md §4) + normalizer parity
(README-EN.org:190-196: trim + lowercase)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mysql2es_spark.functions.analyze import (
    normalize_keyword,
    tokenize_code,
    tokenize_code_py,
    tokenize_simple,
    tokenize_simple_py,
)

GOLDENS = [
    (
        "def getUserName(user_id): return x",
        ["def", "get", "user", "name", "user", "id", "return", "x"],
    ),
    ("HTTPServer2", ["http", "server", "2"]),
    ("snake_case camelCase PascalCase", ["snake", "case", "camel", "case", "pascal", "case"]),
    ("  TRIM me  ", ["trim", "me"]),
    ("", []),
    ("x+=1; y-=2", ["x", "1", "y", "2"]),
    ("__init__", ["init"]),
]


@pytest.mark.parametrize("text,expected", GOLDENS)
def test_tokenize_code_py_goldens(text, expected):
    assert tokenize_code_py(text) == expected


def test_tokenize_code_py_none():
    assert tokenize_code_py(None) == []


def test_pandas_udf_matches_py_twin(spark):
    """Query analysis (driver, _py) and index analysis (pandas UDF) must
    agree token-for-token — rank identity depends on it."""
    texts = [g[0] for g in GOLDENS] + [None, "a_bC dE2f"]
    df = spark.createDataFrame([(t,) for t in texts], "content string")
    got = [
        r["toks"]
        for r in df.select(tokenize_code(F.col("content")).alias("toks")).collect()
    ]
    assert got == [tokenize_code_py(t) for t in texts]


def test_tokenize_simple_matches_py_twin(spark):
    texts = ["Foo-BAR baz_9  ", "a,b;C", "", "hello"]
    df = spark.createDataFrame([(t,) for t in texts], "content string")
    got = [
        r["toks"]
        for r in df.select(tokenize_simple("content").alias("toks")).collect()
    ]
    assert got == [tokenize_simple_py(t) for t in texts]


def test_fused_tf_matches_tokenizer(spark):
    """The fused tokenize+count hot path must agree with
    explode(tokenize_code) + groupBy — same regex, same lowering."""
    from pyspark.sql import functions as F

    from mysql2es_spark.functions.analyze import tokenize_to_tf
    from mysql2es_spark.sources.corpus import generate_corpus

    docs = generate_corpus(spark, 50).select(
        F.monotonically_increasing_id().alias("doc_id"), "content"
    )
    fused = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"])
        for r in tokenize_to_tf(docs).collect()
    }
    ref = (
        docs.select(
            "doc_id", tokenize_code(F.col("content")).alias("ts")
        )
        .select("doc_id", F.size("ts").alias("dl"), F.explode("ts").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
        .collect()
    )
    expected = {(r["doc_id"], r["term"]): (r["tf"], r["dl"]) for r in ref}
    assert fused == expected


def test_normalizer_parity(spark):
    """lower(trim(x)) — byte-for-byte the reference's custom normalizer."""
    df = spark.createDataFrame([("  MiXeD Case  ",)], "s string")
    assert df.select(normalize_keyword("s")).head()[0] == "mixed case"
