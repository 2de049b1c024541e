"""Correctness invariants from BASELINE.json input_hint:

- per-row sha256(content) equality between the source table and the doc
  store,
- no per-row Python UDFs anywhere in the engine (vectorized-only).
"""

import pathlib
import re

from pyspark.sql import functions as F

from mysql2es_spark.plans.build import SearchIndex


def test_content_sha256_invariant(spark, fixture_index):
    """Every doc-store row's content_sha equals sha256 of the source
    row's content, recomputed independently from the raw snapshot log."""
    idx = SearchIndex(spark, fixture_index["root"])
    src = (
        fixture_index["log"]
        .read_all(spark)
        .withColumn(
            "doc_key",
            F.concat_ws("-", F.col("repo"), F.col("path"), F.col("commit")),
        )
        .select("doc_key", F.sha2(F.col("content"), 256).alias("src_sha"))
    )
    store = idx.docstore().select("doc_key", "content_sha")
    joined = store.join(src, "doc_key", "left")
    assert joined.filter(F.col("src_sha").isNull()).count() == 0
    assert joined.filter(F.col("src_sha") != F.col("content_sha")).count() == 0
    # and every source doc is in the store exactly once
    assert store.count() == src.distinct().count()


ENGINE_DIR = pathlib.Path(__file__).resolve().parent.parent / "mysql2es_spark"

# Per-row Python escape hatches that must not appear in the engine
# (BASELINE.json input_hint: vectorized pandas/Arrow UDFs only).
FORBIDDEN = [
    re.compile(r"@F\.udf"),
    re.compile(r"(?<![\w.])udf\("),      # F.udf( / udf( — row-at-a-time UDF
    re.compile(r"\.rdd\b"),
    re.compile(r"sc\.parallelize"),
    re.compile(r"\.foreach\("),
    re.compile(r"\.toLocalIterator"),
]


def test_no_row_at_a_time_python():
    offenders = []
    for py in ENGINE_DIR.rglob("*.py"):
        text = py.read_text()
        for pat in FORBIDDEN:
            for m in pat.finditer(text):
                line = text[: m.start()].count("\n") + 1
                offenders.append(f"{py.relative_to(ENGINE_DIR)}:{line} {pat.pattern}")
    assert offenders == [], offenders
