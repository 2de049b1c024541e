"""Regression tests for ADVICE r2: duplicate-row handling in builds.

1. (high) a delta replaying the same doc_key under two snapshot_ids must
   index ONE docstore row per doc with correct sum_dl — previously both
   rows joined one doc_id, doubling sum_dl (skewing avgdl/BM25) and
   duplicating search meta-join hits.
2. (medium) a bootstrap corpus with duplicate doc_keys must mint one
   doc_id per key (build_doc_id_map used to assign one id per ROW).
3. byte-identical replays (same key AND version twice) are also collapsed.
4. (medium) pre-root-level-layout indexes keep tombstones per segment;
   they must not be silently ignored.
"""

import os
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
from mysql2es_spark.plans.manifest import load_current, publish
from mysql2es_spark.sources.corpus import generate_corpus, with_doc_key


def _true_sum_dl(spark, df):
    """Independent token-count oracle over a (deduped) corpus df."""
    from mysql2es_spark.functions.analyze import tokenize_code

    return (
        df.withColumn("dl", F.size(tokenize_code(F.col("content"))))
        .agg(F.sum("dl"))
        .collect()[0][0]
    )


def test_delta_replay_two_snapshots_one_doc(spark, tmp_path):
    """ADVICE r2 high repro: same doc_key under two snapshot_ids in one
    delta -> exactly one docstore row per doc, sum_dl not doubled, and
    the max version wins."""
    root = str(tmp_path / "idx")
    full_build(spark, generate_corpus(spark, 50, snap_ordinal=0), root,
               TEST_CFG, snapshot_id=1)
    fresh = generate_corpus(spark, 20, snap_ordinal=1, id_start=100)
    delta = (
        fresh.withColumn("snapshot_id", F.lit(2).cast("long"))
        .unionByName(fresh.withColumn("snapshot_id", F.lit(3).cast("long")))
    )
    m = apply_delta(spark, delta, root, TEST_CFG, target_snap=3)
    idx = SearchIndex(spark, root)
    store = idx.docstore()
    # one row per doc_key and per doc_id
    assert store.count() == 70
    assert store.select("doc_key").distinct().count() == 70
    assert store.select("doc_id").distinct().count() == 70
    # the replayed docs carry the WINNING (max) version
    vers = store.filter(F.col("snapshot_id") > 1).select("version").distinct().collect()
    assert [int(r[0]) for r in vers] == [3]
    # sum_dl must equal the independent token count of the deduped corpus
    expect = _true_sum_dl(spark, generate_corpus(spark, 50, snap_ordinal=0)) \
        + _true_sum_dl(spark, fresh)
    assert sum(s.sum_dl for s in m.segments) == expect


def test_bootstrap_duplicate_keys_single_doc_id(spark, tmp_path):
    """ADVICE r2 medium: full_build over a corpus carrying the same
    doc_key twice (two snapshot_ids) must not mint two doc_ids."""
    root = str(tmp_path / "idx")
    base = generate_corpus(spark, 40, snap_ordinal=0)
    dup = (
        base.withColumn("snapshot_id", F.lit(1).cast("long"))
        .unionByName(base.withColumn("snapshot_id", F.lit(2).cast("long")))
    )
    m = full_build(spark, dup, root, TEST_CFG, snapshot_id=2)
    assert m.n_docs_total == 40
    store = SearchIndex(spark, root).docstore()
    assert store.count() == 40
    assert store.select("doc_id").distinct().count() == 40
    assert sum(s.sum_dl for s in m.segments) == _true_sum_dl(spark, base)


def test_byte_identical_replay_collapsed(spark, tmp_path):
    """Same key AND version twice (a batch unioned with itself): the
    docstore/sum_dl replay guards collapse it."""
    root = str(tmp_path / "idx")
    base = generate_corpus(spark, 30, snap_ordinal=0)
    m = full_build(spark, base.unionByName(base), root, TEST_CFG, snapshot_id=1)
    assert m.n_docs_total == 30
    store = SearchIndex(spark, root).docstore()
    assert store.count() == 30
    assert sum(s.sum_dl for s in m.segments) == _true_sum_dl(spark, base)


def test_replay_rank_identity_vs_clean_build(spark, tmp_path):
    """End-to-end: the index built from a replayed delta ranks exactly
    like one built from the clean corpus (scores depend on avgdl, which
    the dup bug skewed)."""
    dirty_root = str(tmp_path / "dirty")
    clean_root = str(tmp_path / "clean")
    base = generate_corpus(spark, 50, snap_ordinal=0)
    fresh = generate_corpus(spark, 20, snap_ordinal=1, id_start=100)

    full_build(spark, base, dirty_root, TEST_CFG, snapshot_id=1)
    delta = (
        fresh.withColumn("snapshot_id", F.lit(2).cast("long"))
        .unionByName(fresh.withColumn("snapshot_id", F.lit(3).cast("long")))
    )
    apply_delta(spark, delta, dirty_root, TEST_CFG, target_snap=3)

    full_build(spark, base, clean_root, TEST_CFG, snapshot_id=1)
    apply_delta(
        spark, fresh.withColumn("snapshot_id", F.lit(3).cast("long")),
        clean_root, TEST_CFG, target_snap=3,
    )

    d = SearchIndex(spark, dirty_root)
    c = SearchIndex(spark, clean_root)
    assert d.manifest.n_docs_total == c.manifest.n_docs_total
    assert abs(d.stats().avgdl - c.stats().avgdl) < 1e-12
    for q in ["import user", "getUserName", "parse token query"]:
        rd = [(r["doc_key"], round(r["score"], 9))
              for r in d.search(q, k=10).collect()]
        rc = [(r["doc_key"], round(r["score"], 9))
              for r in c.search(q, k=10).collect()]
        assert rd == rc, q


@pytest.mark.parametrize("mega", [False, True])
def test_validate_replays_catches_nonidentical_content(spark, tmp_path, mega):
    """ADVICE r3: the engine assumes a replayed (doc_key, version) is
    byte-identical.  With ``validate_replays`` on, a batch violating
    that (same repo/path/commit/snapshot, DIFFERENT bytes) must fail the
    build BEFORE publishing — on both the broadcast-id and mega-build
    join paths; a clean batch must build normally under the guard."""
    import dataclasses

    cfg = dataclasses.replace(
        TEST_CFG, validate_replays=True,
        **({"broadcast_id_threshold": 0} if mega else {}),
    )
    bad_root = str(tmp_path / "bad")
    rows = [
        ("r0", "a.py", "aaa111", "py", "loserToken alpha beta", 1),
        ("r0", "a.py", "aaa111", "py", "winnerToken gamma delta", 1),
        ("r0", "b.py", "ccc333", "py", "other content here", 1),
    ]
    schema = ("repo string, path string, commit string, lang string, "
              "content string, snapshot_id long")
    with pytest.raises(ValueError, match="non-identical"):
        full_build(spark, spark.createDataFrame(rows, schema), bad_root,
                   cfg, snapshot_id=1)
    from mysql2es_spark.plans.manifest import load_current

    assert load_current(bad_root) is None  # nothing was published

    good_root = str(tmp_path / "good")
    good = [rows[0], rows[0], rows[2]]  # byte-identical replay: fine
    m = full_build(spark, spark.createDataFrame(good, schema), good_root,
                   cfg, snapshot_id=1)
    assert m.n_docs_total == 2
    assert SearchIndex(spark, good_root, cfg).search("alpha", k=5).count() == 1


def test_legacy_per_segment_tombstones_honoured(spark, tmp_path):
    """ADVICE r2 medium: an index written before the root-level tombstone
    layout (per-segment tombstones-N dirs, manifest.tombstones=None but
    n_tombstones>0) must still hide dead docs in search, feed compact,
    and be migrated into the root-level set by the next apply_delta."""
    root = str(tmp_path / "idx")
    full_build(spark, generate_corpus(spark, 30, snap_ordinal=0), root,
               TEST_CFG, snapshot_id=1)
    upd = generate_corpus(spark, 10, snap_ordinal=1, id_start=0)  # updates
    apply_delta(spark, upd.withColumn("snapshot_id", F.lit(2).cast("long")),
                root, TEST_CFG, target_snap=2)
    m = load_current(root)
    assert m.tombstones is not None
    modern = spark.read.parquet(os.path.join(root, m.tombstones))
    dead = {(r["segment"], int(r["doc_id"])) for r in modern.collect()}
    assert dead  # the update really tombstoned the old docs

    # rewrite history: move the set into legacy per-segment dirs and
    # publish a manifest that predates the root-level layout
    for seg in {s for s, _ in dead}:
        (
            modern.filter(F.col("segment") == seg).select("doc_id")
            .coalesce(1).write.mode("overwrite")
            .parquet(os.path.join(root, "segments", seg, "tombstones-000002"))
        )
    import shutil

    shutil.rmtree(os.path.join(root, m.tombstones))
    m.tombstones = None
    m.version += 1
    publish(root, m)

    from mysql2es_spark.plans import build as build_mod

    idx = SearchIndex(spark, root)
    got = {
        (r["segment"], int(r["doc_id"]))
        for r in build_mod._load_tombstones(
            spark, root, idx.manifest
        ).collect()
    }
    assert got == dead
    # search never surfaces a tombstoned doc_id
    hits = idx.search("import return", k=50).collect()
    dead_ids = {d for _, d in dead}
    assert not (dead_ids & {int(r["doc_id"]) for r in hits})

    # next delta migrates legacy -> root-level
    m2 = apply_delta(
        spark,
        generate_corpus(spark, 5, snap_ordinal=2, id_start=200)
        .withColumn("snapshot_id", F.lit(3).cast("long")),
        root, TEST_CFG, target_snap=3,
    )
    assert m2.tombstones is not None
    migrated = {
        (r["segment"], int(r["doc_id"]))
        for r in spark.read.parquet(
            os.path.join(root, m2.tombstones)
        ).collect()
    }
    assert dead <= migrated

    # compact drops them physically
    compact(spark, root, TEST_CFG)
    store = SearchIndex(spark, root).docstore()
    assert not (dead_ids & {int(r["doc_id"]) for r in store.collect()})


def test_mega_build_path_rank_identical(spark, tmp_path):
    """The mega-build shuffle-join path (id map too big to broadcast —
    the initial 10^12-file regime) must produce a search-identical index
    to the broadcast fast path over the same corpus: same docstore,
    bit-identical scores."""
    import dataclasses

    from mysql2es_spark.sources.corpus import generate_corpus

    corpus = generate_corpus(spark, 120, snap_ordinal=0)
    fast_root = str(tmp_path / "fast")
    mega_root = str(tmp_path / "mega")
    full_build(spark, corpus, fast_root, TEST_CFG, snapshot_id=1)
    full_build(
        spark, corpus, mega_root,
        dataclasses.replace(TEST_CFG, broadcast_id_threshold=0),
        snapshot_id=1,
    )
    fast = SearchIndex(spark, fast_root)
    mega = SearchIndex(spark, mega_root)
    assert fast.manifest.n_docs_total == mega.manifest.n_docs_total
    fstore = {(r["doc_key"], r["doc_id"], r["dl"], r["content_sha"])
              for r in fast.docstore().collect()}
    mstore = {(r["doc_key"], r["doc_id"], r["dl"], r["content_sha"])
              for r in mega.docstore().collect()}
    assert fstore == mstore  # deterministic ids => identical stores
    for q in ["import return", "getUserName parse", "scan byte path"]:
        a = [(r["doc_id"], r["score"]) for r in fast.search(q, 10).collect()]
        b = [(r["doc_id"], r["score"]) for r in mega.search(q, 10).collect()]
        assert a == b and a, q
