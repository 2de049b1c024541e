"""Per-field analyzers (VERDICT r2 #7; README-EN.org:188-241): a
document with several analyzed text fields, each with its own analyzer,
searchable per field with per-field BM25 length norms — the reference's
`desc` (text+code analyzer) + `sku_desc` (simple) mapping surface."""

import pytest
from pyspark.sql import functions as F

from conftest import TEST_CFG
from mysql2es_spark.plans.build import SearchIndex, apply_delta, full_build
from mysql2es_spark.sources.corpus import generate_corpus

FIELDS = {"content": "code", "summary": "simple"}


def _two_field_corpus(spark, n=120, snap_ordinal=0, id_start=0):
    return generate_corpus(
        spark, n, snap_ordinal=snap_ordinal, id_start=id_start
    ).withColumn(
        "summary",
        F.concat_ws(" ", F.col("path"), F.col("lang"),
                    F.substring("content", 1, 200)),
    )


@pytest.fixture(scope="module")
def multi_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mf") / "idx")
    full_build(spark, _two_field_corpus(spark), root, TEST_CFG,
               snapshot_id=1, text_fields=FIELDS)
    return root


def test_manifest_records_fields_and_stats(spark, multi_index):
    idx = SearchIndex(spark, multi_index)
    m = idx.manifest
    assert m.text_fields == FIELDS
    seg = m.segments[0]
    assert seg.field_stats is not None
    assert set(seg.field_stats) == {"content", "summary"}
    assert seg.field_stats["content"] == seg.sum_dl  # primary
    assert seg.field_stats["summary"] > 0
    # the derived schema records each field's analyzer
    props = m.schema["properties"]
    assert props["content"] == {"type": "text", "analyzer": "code"}
    assert props["summary"] == {"type": "text", "analyzer": "simple"}


def test_per_field_rank_identity(spark, multi_index):
    idx = SearchIndex(spark, multi_index)
    for fld in ("content", "summary"):
        for q in ["import return", "src py user"]:
            a = [(r["doc_id"], r["score"])
                 for r in idx.search(q, 10, field=fld).collect()]
            b = [(r["doc_id"], r["score"])
                 for r in idx.search(q, 10, field=fld, exact=True).collect()]
            assert a == b and a, (fld, q)


def test_field_scores_match_single_field_index(spark, multi_index, tmp_path):
    """search(field='summary') on the multi-field index must score
    bit-identically to a single-field simple-analyzer index built over
    summary as the content — per-field df/dl/avgdl are fully isolated."""
    single_root = str(tmp_path / "single")
    single = _two_field_corpus(spark).drop("content").withColumnRenamed(
        "summary", "content"
    )
    full_build(spark, single, single_root, TEST_CFG, snapshot_id=1,
               text_fields={"content": "simple"})
    multi = SearchIndex(spark, multi_index)
    ref = SearchIndex(spark, single_root)
    for q in ["src py user", "import getUserName", "go parse token"]:
        a = [(r["doc_key"], r["score"])
             for r in multi.search(q, 10, field="summary").collect()]
        b = [(r["doc_key"], r["score"]) for r in ref.search(q, 10).collect()]
        assert a == b and a, q


def test_fields_are_isolated(spark, multi_index):
    """camelCase identifiers split under the code analyzer but not under
    simple — the same query hits different docs per field, and a term
    found only in summaries never matches a content search."""
    idx = SearchIndex(spark, multi_index)
    # 'src' appears in every summary (path prefix) but rarely in content
    n_sum = idx.search("src", 200, field="summary").count()
    n_con = idx.search("src", 200, field="content").count()
    assert n_sum > n_con
    with pytest.raises(ValueError):
        idx.search("x", field="nope")


def test_multifield_incremental_and_compact(spark, multi_index):
    delta = _two_field_corpus(spark, n=20, snap_ordinal=1, id_start=500)
    m2 = apply_delta(
        spark, delta.withColumn("snapshot_id", F.lit(2).cast("long")),
        multi_index, TEST_CFG, target_snap=2,
    )
    assert m2.text_fields == FIELDS
    assert all(s.field_stats for s in m2.segments)
    idx = SearchIndex(spark, multi_index)
    for fld in ("content", "summary"):
        a = [(r["doc_id"], r["score"])
             for r in idx.search("import return", 10, field=fld).collect()]
        b = [(r["doc_id"], r["score"])
             for r in idx.search("import return", 10, field=fld,
                                 exact=True).collect()]
        assert a == b and a, fld

    from mysql2es_spark.plans.build import compact

    m3 = compact(spark, multi_index, TEST_CFG)
    assert len(m3.segments) == 1
    seg = m3.segments[0]
    assert seg.field_stats and set(seg.field_stats) == {"content", "summary"}
    # no tombstones were involved, so per-field sums survive exactly
    assert seg.field_stats["summary"] == sum(
        s.field_stats["summary"] for s in m2.segments
    )
    idx3 = SearchIndex(spark, multi_index)
    for fld in ("content", "summary"):
        a = [(r["doc_id"], r["score"])
             for r in idx3.search("import return", 10, field=fld).collect()]
        b = [(r["doc_id"], r["score"])
             for r in idx3.search("import return", 10, field=fld,
                                  exact=True).collect()]
        assert a == b and a, fld
