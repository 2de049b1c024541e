"""Tiered/partial compaction (VERDICT r2 #6) + flat query-planning cost
in segment count (VERDICT r2 #9)."""

import time

import pytest
from pyspark.sql import functions as F

from conftest import TEST_CFG
from mysql2es_spark.plans.build import (
    SearchIndex,
    apply_delta,
    compact,
    full_build,
)
from mysql2es_spark.plans.manifest import load_current
from mysql2es_spark.sources.corpus import generate_corpus

QUERIES = ["import return", "getUserName", "parse token"]


def _assert_rank_identity(idx):
    for q in QUERIES:
        a = [(r["doc_id"], r["score"]) for r in idx.search(q, 10).collect()]
        b = [(r["doc_id"], r["score"])
             for r in idx.search(q, 10, exact=True).collect()]
        assert a == b and a, q


@pytest.fixture(scope="module")
def many_segments(spark, tmp_path_factory):
    """60-doc base + 10 micro-batches (odd ones update existing docs, so
    old segments accumulate tombstones) => 11 segments."""
    root = str(tmp_path_factory.mktemp("tiered") / "idx")
    full_build(spark, generate_corpus(spark, 60, snap_ordinal=0), root,
               TEST_CFG, snapshot_id=1)
    for i in range(10):
        if i % 2 == 0:
            delta = generate_corpus(spark, 6, snap_ordinal=i + 1,
                                    id_start=100 + 6 * i)
        else:
            delta = generate_corpus(spark, 6, snap_ordinal=i + 1, id_start=0)
        apply_delta(
            spark,
            delta.withColumn("snapshot_id", F.lit(i + 2).cast("long")),
            root, TEST_CFG, target_snap=i + 2,
        )
    return root


def test_tiered_compaction_bounds_segment_count(spark, many_segments):
    root = many_segments
    m = load_current(root)
    assert len(m.segments) == 11
    n_live_before = (
        SearchIndex(spark, root).docstore().count()
        - sum(s.n_tombstones for s in m.segments)
    )

    m2 = compact(spark, root, TEST_CFG, max_segments=4)
    assert len(m2.segments) <= 4
    # untouched survivors keep their exact files (largest segment is the
    # base — it must have survived a pure width-bounding compact)
    surviving = {s.name for s in m2.segments}
    assert "seg-000001" in surviving
    idx = SearchIndex(spark, root)
    _assert_rank_identity(idx)
    # live doc set unchanged by compaction
    m2_live = idx.docstore().count() - sum(
        s.n_tombstones for s in m2.segments
    )
    assert m2_live == n_live_before

    # full compact still collapses to one tombstone-free segment
    m3 = compact(spark, root, TEST_CFG)
    assert len(m3.segments) == 1
    assert m3.tombstones is None
    assert sum(s.n_tombstones for s in m3.segments) == 0
    idx3 = SearchIndex(spark, root)
    assert idx3.docstore().count() == n_live_before
    _assert_rank_identity(idx3)


def test_min_tombstone_ratio_selects_churned_segments(spark, tmp_path):
    root = str(tmp_path / "idx")
    full_build(spark, generate_corpus(spark, 40, snap_ordinal=0), root,
               TEST_CFG, snapshot_id=1)
    # update 10 of the 40 -> base segment tombstone ratio 0.25
    apply_delta(
        spark,
        generate_corpus(spark, 10, snap_ordinal=1, id_start=0)
        .withColumn("snapshot_id", F.lit(2).cast("long")),
        root, TEST_CFG, target_snap=2,
    )
    m = load_current(root)
    base_seg = next(s for s in m.segments if s.name == "seg-000001")
    assert base_seg.n_tombstones == 10
    m2 = compact(spark, root, TEST_CFG, min_tombstone_ratio=0.2)
    # base segment rewritten (victim), delta segment untouched
    names = {s.name for s in m2.segments}
    assert "seg-000001" not in names
    assert any("compact" in n for n in names)
    assert any(s.n_tombstones == 0 for s in m2.segments)
    assert m2.tombstones is None  # all tombstones lived in the victim
    idx = SearchIndex(spark, root)
    assert idx.docstore().count() == 40  # 30 live base + 10 new versions
    _assert_rank_identity(idx)


def test_query_job_count_flat_in_segments(spark, many_segments, tmp_path):
    """VERDICT r2 #9 done-criterion: planning/execution job count of a
    search must not grow with segment count (one multi-path posting read
    instead of a read per segment)."""
    few_root = str(tmp_path / "few")
    full_build(spark, generate_corpus(spark, 60, snap_ordinal=0), few_root,
               TEST_CFG, snapshot_id=1)

    def jobs_for_search(root, tag):
        idx = SearchIndex(spark, root)
        idx.search(QUERIES[0], k=10).collect()  # warm dict cache etc.
        sc = spark.sparkContext
        sc.setJobGroup(tag, tag)
        idx.search(QUERIES[1], k=10).collect()
        sc.setJobGroup("", "")
        return len(sc.statusTracker().getJobIdsForGroup(tag))

    few = jobs_for_search(few_root, f"few-{time.time()}")
    many = jobs_for_search(many_segments, f"many-{time.time()}")
    assert many <= few + 1, (few, many)
