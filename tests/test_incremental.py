"""E2E incremental semantics (SURVEY §5.2-4/5): incremental build ≡ full
rebuild, resume-from-checkpoint, deterministic doc ids, compensation +
version guard."""

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from mysql2es_spark.operators.index import IndexConfig, assign_doc_ids
from mysql2es_spark.plans.build import (
    SearchIndex,
    build_segment,
    compact,
    compensate,
    full_build,
    incremental_build,
)
from mysql2es_spark.plans.manifest import load_current
from mysql2es_spark.sources.corpus import (
    SnapshotLog,
    generate_corpus,
    with_doc_columns,
)

CFG = IndexConfig(n_buckets=4, block_size=32, salt_threshold=100, n_salts=4,
                  chunk_span=128, id_partitions=4)


def _live_postings_by_key(spark, root):
    """(term, doc_key, tf) set over live docs — doc_id-independent index
    content, comparable across different build histories."""
    idx = SearchIndex(spark, root)
    tf = idx.tf_table()
    store = idx.docstore().select("doc_id", "doc_key")
    tomb = idx.tombstones()
    if tomb is not None:
        store = store.join(tomb, "doc_id", "left_anti")
    rows = tf.join(store, "doc_id").select("term", "doc_key", "tf").collect()
    return {(r["term"], r["doc_key"], r["tf"]) for r in rows}


def test_incremental_equals_full_rebuild(spark, tmp_path):
    log = SnapshotLog(str(tmp_path / "log"))
    now = int(time.time())
    log.append(generate_corpus(spark, 200, snap_ordinal=0), commit_ts=now - 30)
    log.append(
        generate_corpus(spark, 60, snap_ordinal=1, id_start=200), commit_ts=now - 20
    )

    inc_root = str(tmp_path / "inc")
    incremental_build(spark, log, inc_root, CFG, up_to=1)
    incremental_build(spark, log, inc_root, CFG, up_to=2)

    full_root = str(tmp_path / "full")
    full_build(spark, log.read_all(spark), full_root, CFG, snapshot_id=2)

    assert _live_postings_by_key(spark, inc_root) == _live_postings_by_key(
        spark, full_root
    )


def test_upsert_version_guard_and_compaction(spark, tmp_path):
    log = SnapshotLog(str(tmp_path / "log"))
    now = int(time.time())
    log.append(generate_corpus(spark, 100, snap_ordinal=0), commit_ts=now - 30)
    root = str(tmp_path / "idx")
    incremental_build(spark, log, root, CFG)
    # snapshot 2 updates logical files 0..9
    upd = generate_corpus(spark, 10, snap_ordinal=1, id_start=0)
    log.append(upd, commit_ts=now - 10)
    m = incremental_build(spark, log, root, CFG)
    assert sum(s.n_tombstones for s in m.segments) == 10

    idx = SearchIndex(spark, root)
    new_keys = {
        r["doc_key"] for r in with_doc_columns(upd).select("doc_key").collect()
    }
    res = idx.search("import return def class", k=200).collect()
    keys = {r["doc_key"] for r in res}
    # all 10 new versions present, no superseded version returned
    assert new_keys <= keys
    logical_new = {k[: k.rfind("-")] for k in new_keys}
    stale = [
        r for r in res
        if f"{r['repo']}-{r['path']}" in logical_new and r["doc_key"] not in new_keys
    ]
    assert stale == []

    # stale replay must NOT regress: re-appending the OLD content at an
    # older version is skipped (idempotent doc_key anti-join keeps the
    # original rows out; version guard protects the rest)
    before = _live_postings_by_key(spark, root)
    m2 = compensate(spark, log, root, CFG, compensate_second=10**6,
                    begin_interval_second=10**6)
    assert _live_postings_by_key(spark, root) == before

    # compaction physically drops the 10 dead docs, stats shrink
    n_before = m2.n_docs_total
    mc = compact(spark, root, CFG)
    assert mc.n_docs_total == n_before - 10
    assert sum(s.n_tombstones for s in mc.segments) == 0
    assert _live_postings_by_key(spark, root) == before


def test_out_of_order_stale_batch_never_resurfaces(spark, tmp_path):
    """A micro-batch carrying an OLDER version of an already-indexed
    logical file (out-of-order streaming delivery / stale replay) must be
    tombstoned on arrival — version-check semantics (README-EN.org:78-79)."""
    from pyspark.sql import functions as F

    from mysql2es_spark.plans.build import apply_delta

    log = SnapshotLog(str(tmp_path / "log"))
    log.append(generate_corpus(spark, 50, snap_ordinal=5), commit_ts=100)
    root = str(tmp_path / "idx")
    incremental_build(spark, log, root, CFG)  # indexed at version 1

    stale = generate_corpus(spark, 5, snap_ordinal=0).withColumn(
        "snapshot_id", F.lit(0).cast("long")
    )  # same (repo, path) as ids 0..4, older version, different commit
    m = apply_delta(spark, stale, root, CFG, target_snap=1)
    seg_new = m.segments[-1]
    assert seg_new.n_tombstones == 5  # dead on arrival

    idx = SearchIndex(spark, root)
    stale_keys = {
        r["doc_key"]
        for r in with_doc_columns(stale).select("doc_key").collect()
    }
    res = {r["doc_key"] for r in idx.search("import return def class", k=100).collect()}
    assert res.isdisjoint(stale_keys)
    # and the current (newer) versions are still served
    assert len(res) > 0


def test_resume_from_partial_build(spark, tmp_path):
    """Kill-and-resume: if the postings stage is missing but the docstore
    stage completed, a re-run rebuilds only postings and the final index
    equals a clean build (deterministic doc ids make partial work valid)."""
    corpus = generate_corpus(spark, 120)
    clean_root = str(tmp_path / "clean")
    full_build(spark, corpus, clean_root, CFG, snapshot_id=1)

    crash_root = str(tmp_path / "crash")
    # simulate a crash: build, then delete the postings dir + manifest
    full_build(spark, corpus, crash_root, CFG, snapshot_id=1)
    shutil.rmtree(os.path.join(crash_root, "segments", "seg-000001", "postings"))
    os.remove(os.path.join(crash_root, "CURRENT"))
    # resume: docstore stage is detected as done and skipped
    full_build(spark, corpus, crash_root, CFG, snapshot_id=1)

    assert _live_postings_by_key(spark, crash_root) == _live_postings_by_key(
        spark, clean_root
    )


def test_doc_ids_deterministic_under_input_partitioning(spark):
    """doc_id assignment must not depend on how the input was split
    (protects the N-vs-4N scaling comparison, SURVEY §7 hard part 3)."""
    corpus = with_doc_columns(generate_corpus(spark, 300))
    a, _ = assign_doc_ids(corpus.repartition(3), 0, CFG)
    b, _ = assign_doc_ids(corpus.repartition(17).sortWithinPartitions("lang"), 0, CFG)
    ma = {r["doc_key"]: r["doc_id"] for r in a.select("doc_key", "doc_id").collect()}
    mb = {r["doc_key"]: r["doc_id"] for r in b.select("doc_key", "doc_id").collect()}
    assert ma == mb
    assert len(set(ma.values())) == 300  # dense + unique


def test_work_avoidance_guard(spark, tmp_path):
    log = SnapshotLog(str(tmp_path / "log"))
    log.append(generate_corpus(spark, 50), commit_ts=100)
    root = str(tmp_path / "idx")
    m1 = incremental_build(spark, log, root, CFG)
    m2 = incremental_build(spark, log, root, CFG)
    assert m2.version == m1.version  # no new snapshot => true no-op


def test_compensation_window_guard(spark, tmp_path):
    """Compensation only runs while now - last_handle <= begin-interval
    (README-EN.org:74-75); outside the window it must not touch the index."""
    log = SnapshotLog(str(tmp_path / "log"))
    log.append(generate_corpus(spark, 50), commit_ts=100)
    root = str(tmp_path / "idx")
    m1 = incremental_build(spark, log, root, CFG)
    m_out = compensate(
        spark, log, root, CFG,
        begin_interval_second=1200,
        now_ts=m1.last_handle_ts + 5000,  # outside window
    )
    assert m_out.version == m1.version


def test_lineage_recorded(spark, tmp_path, fixture_index):
    from mysql2es_spark.sources.checkpoint import LineageStore

    lin = LineageStore(fixture_index["root"]).read(spark)
    phases = {r["phase"] for r in lin.select("phase").distinct().collect()}
    assert {"postings", "docstore"} <= phases
    # per-partition (bucket) posting metrics exist
    assert lin.filter(
        (F.col("phase") == "postings") & (F.col("partition") >= 0)
    ).count() > 0
    assert lin.filter(F.col("rows") <= 0).count() == 0
