"""Salting equivalence (SURVEY §5.2-1, FIXTURES §4): a fully-salted build
must produce the same postings and the same search results as an
unsalted build — salting is a physical-plan choice, never a semantic one."""

import pytest
from pyspark.sql import functions as F

from mysql2es_spark.operators.index import IndexConfig
from mysql2es_spark.plans.build import SearchIndex, full_build
from mysql2es_spark.sources.corpus import generate_corpus


@pytest.fixture(scope="module")
def two_builds(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("salt")
    corpus = generate_corpus(spark, 300)
    salted_cfg = IndexConfig(
        n_buckets=4, block_size=32, salt_threshold=1, n_salts=4,
        chunk_span=128, id_partitions=4,
    )  # threshold 1 => every term with df>1 is salted
    plain_cfg = IndexConfig(
        n_buckets=4, block_size=32, salt_threshold=10**9, n_salts=4,
        chunk_span=128, id_partitions=4,
    )  # threshold huge => nothing salted
    salted_root, plain_root = str(base / "salted"), str(base / "plain")
    full_build(spark, corpus, salted_root, salted_cfg, snapshot_id=1)
    full_build(spark, corpus, plain_root, plain_cfg, snapshot_id=1)
    return salted_root, plain_root


def _postings_set(spark, root):
    idx = SearchIndex(spark, root)
    return {
        (r["term"], r["doc_id"], r["tf"], r["dl"])
        for r in idx.tf_table().collect()
    }


def test_salted_postings_identical(spark, two_builds):
    salted_root, plain_root = two_builds
    assert _postings_set(spark, salted_root) == _postings_set(spark, plain_root)


def test_salted_blocks_chunk_aligned(spark, two_builds):
    """Every block must lie inside one chunk regardless of salting —
    parallel per-chunk scoring depends on it."""
    salted_root, _ = two_builds
    idx = SearchIndex(spark, salted_root)
    span = idx.manifest.chunk_span
    bad = idx.postings().filter(
        (F.expr(f"first_doc div {span}") != F.col("chunk"))
        | (F.expr(f"last_doc div {span}") != F.col("chunk"))
    )
    assert bad.count() == 0


def test_salted_search_identical(spark, two_builds):
    salted_root, plain_root = two_builds
    a = SearchIndex(spark, salted_root)
    b = SearchIndex(spark, plain_root)
    for q in ["import return", "getUserName parse", "import import class"]:
        ra = [(r["doc_id"], r["score"]) for r in a.search(q, k=20).collect()]
        rb = [(r["doc_id"], r["score"]) for r in b.search(q, k=20).collect()]
        assert ra == rb, q
